"""Embedding entity linker (stages/embed_link.py).

The exhaustive variant sweep here is what licenses the arithmetic SQL
oracle of ``embed_link_entities``: if every one-char-deletion variant
of every authority label links back to its source entity above the
threshold, the planted-variant query's expected output is exactly the
doc_id-arithmetic recomputation.
"""

import numpy as np
import pyarrow as pa

from ferenda_ray.pipelines import corpus
from ferenda_ray.stages.embed_link import EmbedLinker, trigram_embed


def test_trigram_embed_shape_and_norm():
    m = trigram_embed(["Apache Spark", "", "x"], dim=32)
    assert m.shape == (3, 32)
    # non-degenerate rows are unit-norm; too-short rows are zero
    assert abs(np.linalg.norm(m[0]) - 1.0) < 1e-9
    assert np.linalg.norm(m[1]) == 0.0


def test_trigram_embed_matches_rowwise():
    # the masked one-big-array path must equal embedding each surface
    # separately (no cross-surface trigram leakage)
    surfaces = ["Hash Join", "Ray Data", "a", "", "Columnar Store"]
    batched = trigram_embed(surfaces)
    single = np.vstack([trigram_embed([s]) for s in surfaces])
    assert np.allclose(batched, single)


def test_every_deletion_variant_links_to_source():
    labels = corpus.ENTITY_LABELS
    mat = trigram_embed(labels)
    for e, label in enumerate(labels):
        for p in range(1, len(label) - 1):
            variant = label[:p] + label[p + 1:]
            sims = trigram_embed([variant]) @ mat.T
            assert int(sims.argmax()) == e, (label, p, variant)
            assert sims[0, sims.argmax()] >= 0.5


def test_mention_linker_embed_fallback():
    # a word-swapped surface the fuzzy pass (difflib cutoff 0.8)
    # misses gets linked by the embedding fallback; default-off keeps
    # the output unchanged
    from ferenda_ray.stages.mentions import MentionLinker

    entities = {l: corpus.KB + str(i)
                for i, l in enumerate(corpus.ENTITY_LABELS)}
    batch = pa.table({
        "kind": pa.array(["section"], pa.string()),
        "url": pa.array(["https://x.example.org/d1"], pa.string()),
        "section_uri": pa.array(["https://x.example.org/d1#S1"],
                                pa.string()),
        "text": pa.array(["An engine called Spark Apache is fast."],
                         pa.string()),
    })
    gaz = {"Columnar Store": corpus.KB + "99"}
    plain = MentionLinker(gaz)(batch)
    assert "entity_embed" not in plain["kind"].to_pylist()

    linked = MentionLinker(gaz, embed_entities=entities)(batch)
    rows = linked.to_pylist()
    embed_rows = [r for r in rows if r["kind"] == "entity_embed"]
    assert len(embed_rows) == 1
    r = embed_rows[0]
    assert r["surface"] == "Spark Apache"
    assert r["linked_uri"] == corpus.KB + "0"      # -> Apache Spark
    assert r["predicate"] == "dcterms:subject"
    # all non-embed rows are identical to the default-off output
    others = [tuple(r.values()) for r in rows if r["kind"] != "entity_embed"]
    assert others == [tuple(r.values()) for r in plain.to_pylist()]


def test_embed_linker_actor_contract():
    entities = {l: corpus.KB + str(i)
                for i, l in enumerate(corpus.ENTITY_LABELS)}
    linker = EmbedLinker(entities)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "surface": pa.array(["Apche Spark", "Ray Data", "zzzz qqqq"],
                            pa.string()),
    })
    out = linker(batch)
    assert out.column_names == ["doc_id", "surface", "linked_uri",
                                "link_score_milli"]
    uris = out["linked_uri"].to_pylist()
    assert uris[0] == corpus.KB + "0"       # deletion variant links
    assert uris[1] == corpus.KB + "1"       # exact label links
    assert uris[2] == ""                    # garbage stays unlinked
    milli = out["link_score_milli"].to_pylist()
    assert milli[1] == 1000 and milli[2] == 0
