"""End-to-end flagship pipeline: pages → triples, compared as a SET
against the generator oracle (graph-compare semantics of the
reference's assertEqualGraphs, testutil.py:58-116). Target P/R ≥ 0.95
(north rule) — the synthetic corpus is fully deterministic so we
actually require exact match and report P/R on failure."""

import pyarrow.parquet as pq
import pytest

from ferenda_ray.pipelines import corpus
from ferenda_ray.pipelines.kg import kg_pipeline


@pytest.fixture(scope="module")
def result(ray_session, sf_smoke):
    return kg_pipeline(sf_dir=sf_smoke, linker_concurrency=2)


@pytest.fixture(scope="module")
def expected(sf_smoke):
    docs = pq.read_table(sf_smoke + "/documents.parquet")
    canon = corpus.expected_canonical()
    exp = set()
    for did, text, lang, source in zip(
        docs["doc_id"].to_pylist(),
        docs["text"].to_pylist(),
        docs["lang"].to_pylist(),
        docs["source"].to_pylist(),
    ):
        plan = corpus.plan_document(did, text, lang, source)
        for s, p, o, lit, olang in corpus.expected_triples(plan, canon):
            exp.add((s, p, o, lit, olang))
    # owl:sameAs assertions for every non-representative node
    for u, c in canon.items():
        if u != c:
            exp.add((u, "owl:sameAs", c, False, ""))
    return exp


def test_triples_match_oracle(result, expected):
    got_df = result["triples"].to_pandas()
    got = set(zip(got_df["subj"], got_df["pred"], got_df["obj"],
                  got_df["obj_is_literal"], got_df["obj_lang"]))
    tp = len(got & expected)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(expected))
    extra = list(got - expected)[:5]
    missing = list(expected - got)[:5]
    assert precision >= 0.95 and recall >= 0.95, (
        "P=%.4f R=%.4f\nextra: %s\nmissing: %s" % (precision, recall, extra, missing))
    # the corpus is deterministic — demand exactness, not just 0.95
    assert got == expected, (
        "P=%.4f R=%.4f\nextra: %s\nmissing: %s" % (precision, recall, extra, missing))


def test_triples_are_deduped(result):
    df = result["triples"].to_pandas()
    assert not df.duplicated(subset=["subj", "pred", "obj"]).any()


def test_mentions_table(result):
    df = result["mentions"].to_pandas()
    assert set(df["kind"]) <= {"rfc", "sec_rfc", "sec", "url", "entity", "entity_fuzzy"}
    assert (df["start"] < df["end"]).all()
    # every mention links somewhere
    assert df["linked_uri"].notna().all()


def test_entity_links_canonicalized(result):
    df = result["triples"].to_pandas()
    subj_links = df[df["pred"] == "dcterms:subject"]
    canon = corpus.expected_canonical()
    # every linked entity must be a component representative
    for obj in subj_links["obj"]:
        assert canon.get(obj, obj) == obj, "non-canonical entity %s" % obj
