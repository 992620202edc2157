"""RepoProfile: the whole extension surface as data (SURVEY §2.10).

1. A default profile reproduces kg_pipeline's triple set exactly.
2. A custom profile — new grammar family, tightened required
   predicates — changes behavior with zero engine edits.
"""

import pyarrow as pa
import pytest

from ferenda_ray.pipelines import corpus
from ferenda_ray.pipelines.kg import kg_pipeline
from ferenda_ray.pipelines.profile import RepoProfile, kg_pipeline_profiled
from ferenda_ray.stages.mentions import CitationGrammar, default_grammars

SF = "/root/testdata/sf0.001"


def _triple_set(ds):
    df = ds.to_pandas()
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_lang",
            "obj_datatype", "source_url"]
    return set(map(tuple, df[cols].itertuples(index=False, name=None)))


@pytest.mark.usefixtures("ray_session")
def test_default_profile_equals_kg_pipeline():
    a = kg_pipeline_profiled(corpus.pages_dataset(SF))
    b = kg_pipeline(pages=corpus.pages_dataset(SF))
    assert _triple_set(a["triples"]) == _triple_set(b["triples"])
    # the whole corpus passes the default required-predicate check
    assert a["validation"].count() == 0


@pytest.mark.usefixtures("ray_session")
def test_custom_profile_changes_behavior_without_engine_edits():
    # novel citation family registered as DATA, highest priority
    novel = CitationGrammar(
        "isostd", r"ISO (\d{4,5})",
        lambda m, ctx: "https://iso.example.org/std/" + m.group(1))
    profile = RepoProfile(
        grammars=(novel,) + default_grammars(),
        # a predicate the corpus never emits → every doc must be flagged
        required_predicates=("dcterms:title", "dcterms:abstract"),
    )
    pages = corpus.pages_dataset(SF)

    # plant an ISO citation inside an existing section paragraph
    # (every page's section-2 text contains " project ships")
    def plant(t: pa.Table) -> pa.Table:
        htmls = [h if isinstance(h, bytes) else h.encode()
                 for h in t["html"].to_pylist()]
        htmls = [h.replace(b" project ships",
                           b" project ISO 9001 ships", 1) for h in htmls]
        return t.set_column(t.schema.get_field_index("html"), "html",
                            pa.array(htmls, pa.binary()))

    res = kg_pipeline_profiled(pages.map_batches(plant,
                                                 batch_format="pyarrow"),
                               profile)
    ment = res["mentions"].to_pandas()
    iso = ment[ment["kind"] == "isostd"]
    assert len(iso) >= 1
    assert (iso["linked_uri"] == "https://iso.example.org/std/9001").all()
    # tightened validation flags every document for the absent predicate
    val = res["validation"].to_pandas()
    missing_abstract = val[val["missing_pred"] == "dcterms:abstract"]
    n_docs = res["sections"].to_pandas()
    n_docs = n_docs[n_docs["kind"] == "body"]["url"].nunique()
    assert len(missing_abstract) == n_docs


@pytest.mark.usefixtures("ray_session")
def test_profile_embed_linker_fallback():
    # north star: linker actor pools hold gazetteer tries AND
    # embedding linkers. A word-swapped entity surface ("Spark
    # Apache") that difflib-fuzzy misses is linked by the
    # RepoProfile-configured embedding fallback; with the default
    # profile the surface stays unlinked.
    entities = {l: corpus.KB + str(i)
                for i, l in enumerate(corpus.ENTITY_LABELS)}

    def plant(t: pa.Table) -> pa.Table:
        htmls = [h if isinstance(h, bytes) else h.encode()
                 for h in t["html"].to_pylist()]
        htmls = [h.replace(b" project ships",
                           b" project Spark Apache ships", 1)
                 for h in htmls]
        return t.set_column(t.schema.get_field_index("html"), "html",
                            pa.array(htmls, pa.binary()))

    pages = corpus.pages_dataset(SF).map_batches(plant,
                                                 batch_format="pyarrow")
    base = kg_pipeline_profiled(pages)["mentions"].to_pandas()
    assert (base["surface"] == "Spark Apache").sum() == 0

    prof = RepoProfile(embed_entities=entities)
    ment = kg_pipeline_profiled(pages, prof)["mentions"].to_pandas()
    hits = ment[ment["kind"] == "entity_embed"]
    assert len(hits) >= 1
    assert (hits["surface"] == "Spark Apache").all()
    assert (hits["linked_uri"] == corpus.KB + "0").all()
