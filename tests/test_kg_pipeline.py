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


def test_negative_samples_deterministic(ray_session):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from ferenda_ray.stages.triples import negative_samples

    ents = ["e%d" % i for i in range(7)]
    rows = [{"subj": "s%d" % i, "pred": "dcterms:subject",
             "obj": ents[i % 7]} for i in range(30)]
    rows.append({"subj": "s0", "pred": "other:pred", "obj": "ignored"})
    ds = rd.from_pandas(pd.DataFrame(rows))

    got = negative_samples(ds, k_neg=2).to_pandas()
    assert set(got["pred"]) == {"dcterms:subject"}
    assert set(got["neg_obj"]) <= set(ents)  # never the ignored pred's obj
    # no negative equals its positive's true object
    true_obj = {r["subj"]: r["obj"] for r in rows[:-1]}
    for s, o in zip(got["subj"], got["neg_obj"]):
        assert o != true_obj[s]
    # every draw is the md5 address resolved over the ranked entities
    B = 8
    by_b = {}
    for e in ents:
        b = int(hashlib.md5(e.encode()).hexdigest()[:15], 16) % B
        by_b.setdefault(b, []).append(e)
    for b in by_b:
        by_b[b].sort(key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e))
    expect = set()
    for r in rows[:-1]:
        for i in (1, 2):
            h = int(hashlib.md5(("%s|%s|%d" % (r["subj"], r["obj"], i))
                                .encode()).hexdigest()[:15], 16)
            bucket = by_b.get(h % B)
            if not bucket:
                continue
            neg = bucket[(h // B) % len(bucket)]
            if neg != r["obj"]:
                expect.add((r["subj"], neg, i))
    assert set(zip(got["subj"], got["neg_obj"],
                   got["neg_ix"])) == expect
