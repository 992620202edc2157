"""Sink round-trips: partitioned triple parquet, pipeline write_outputs,
fulltext table projection."""

import os

import duckdb
import pytest

from ferenda_ray.pipelines.facets import fulltext_table
from ferenda_ray.pipelines.kg import kg_pipeline, write_outputs
from ferenda_ray.sources.nt import write_triples_partitioned


@pytest.fixture(scope="module")
def result(ray_session, sf_smoke):
    return kg_pipeline(sf_dir=sf_smoke)


def test_write_outputs_roundtrip(result, tmp_path):
    out = str(tmp_path / "out")
    paths = write_outputs(result, out)
    con = duckdb.connect()
    n_triples = con.sql(
        "select count(*) from read_parquet('%s/*.parquet')" % paths["triples"]
    ).fetchone()[0]
    assert n_triples == result["triples"].count()
    n_sections = con.sql(
        "select count(*) from read_parquet('%s/*.parquet')" % paths["sections"]
    ).fetchone()[0]
    assert n_sections == result["sections"].count()


def test_partitioned_triple_sink(result, tmp_path):
    out = str(tmp_path / "buckets")
    write_triples_partitioned(result["triples"], out, num_buckets=8)
    buckets = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert 1 < len(buckets) <= 8
    con = duckdb.connect()
    n = con.sql(
        "select count(*) from read_parquet('%s/*/*.parquet')" % out
    ).fetchone()[0]
    assert n == result["triples"].count()
    # same subject always lands in the same bucket (resume contract)
    per_subj = con.sql(
        "select count(distinct bucket) m from ("
        " select subj, bucket from read_parquet('%s/*/*.parquet', hive_partitioning=1))"
        " group by subj order by m desc limit 1" % out
    ).fetchone()[0]
    assert per_subj == 1


def test_fulltext_table(result):
    ft = fulltext_table(result["sections"]).to_pandas()
    assert set(ft.columns) == {"url", "section_uri", "kind", "title",
                               "text", "lang", "basefile"}
    # one row per addressable resource, doc rows included
    assert (ft["kind"] == "body").sum() > 0
    assert ft["section_uri"].is_unique


def test_inverted_index_build_and_search(ray_session, tmp_path):
    """sources/ftindex: hive-partitioned postings, pruned-read term
    query with AND semantics vs a brute-force reference."""
    import os

    import pandas as pd
    import ray

    from ferenda_ray.sources import ftindex

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a c", "a c c", "b c", ""],
    })
    idx = str(tmp_path / "ftidx")
    ftindex.build_inverted_index(
        ray.data.from_pandas(docs), idx, num_buckets=4)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    # every partition dir matches the term_bucket convention
    dirs = sorted(d for d in os.listdir(idx) if d.startswith("bucket="))
    want = sorted({"bucket=%d" % ftindex.term_bucket(t, 4)
                   for t in ("a", "b", "c")})
    assert dirs == want

    got = ftindex.indexed_term_search(
        idx, ("a", "c"), k=10, num_buckets=4).to_pandas()
    # brute force: docs containing BOTH a and c, score = tf(a)+tf(c)
    exp = []
    for _, r in docs.iterrows():
        toks = r["text"].split()
        ca, cc = toks.count("a"), toks.count("c")
        if ca > 0 and cc > 0:
            exp.append((r["doc_id"], ca + cc))
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert list(map(tuple, got[["doc_id", "score"]].values.tolist())) == exp
    # idempotent rebuild: marker short-circuits
    assert ftindex.build_inverted_index(None, idx, num_buckets=4) == idx


def test_index_delta_merge_upsert(ray_session, tmp_path):
    """sources/ftindex.merge_index_delta: superseded keys drop their
    OLD postings, new keys appear, the base version stays immutable,
    and the merge is idempotent."""
    import os

    import pandas as pd
    import ray

    from ferenda_ray.sources import ftindex

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b", "a c c", "b c"],
    })
    base = str(tmp_path / "base")
    ftindex.build_inverted_index(
        ray.data.from_pandas(docs), base, num_buckets=4)

    # delta: doc 2 re-crawled WITHOUT 'c' (upsert), doc 9 brand-new
    delta = pd.DataFrame({
        "doc_id": [2, 9],
        "text": ["a a b", "c c c"],
    })
    merged = str(tmp_path / "merged")
    ftindex.merge_index_delta(base, ray.data.from_pandas(delta),
                              merged, replaced_keys=[2], num_buckets=4)

    def search(idx, terms):
        return list(map(tuple, ftindex.indexed_term_search(
            idx, terms, k=10, num_buckets=4).to_pandas()
            [["doc_id", "score"]].values.tolist()))

    # doc 2's old 'c' postings are GONE: only 3 and the new 9 match c
    assert search(merged, ("c",)) == [(9, 3), (3, 1)]
    # upserted doc 2 reflects the NEW text: tf(a)=2
    assert (2, 3) in search(merged, ("a", "b"))
    # the base version is untouched (immutable snapshot)
    assert search(base, ("c",)) == [(2, 2), (3, 1)]
    # idempotent: marker short-circuits a re-merge
    assert ftindex.merge_index_delta(base, None, merged,
                                     num_buckets=4) == merged


# ---------------------------------------------------------------------
# external push sink (actor-held client, idempotent bulk, kill/resume)
# ---------------------------------------------------------------------

def _push_docs():
    import pandas as pd
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "url": ["http://x.test/doc/%d" % i for i in range(20)],
        "text": ["body %d" % i for i in range(20)]}))


def _store_state(store):
    import json

    out = {}
    for fn in sorted(os.listdir(store)):
        if fn.endswith(".json"):
            with open(os.path.join(store, fn)) as f:
                out[fn] = json.load(f)
    return out


def test_push_bulk_basic_and_replay_idempotent(ray_session, tmp_path):
    from ferenda_ray.sources.pushsink import FileBulkClient, push_bulk

    store = str(tmp_path / "store")
    mk = lambda: FileBulkClient(store)  # noqa: E731
    m1 = push_bulk(_push_docs(), mk, id_col="url",
                   batch_size=6).to_pandas()
    assert m1["n_docs"].sum() == 20
    assert set(m1["status"]) == {"pushed"}
    assert all(m1["attempts"] == 1)
    first = _store_state(store)
    assert len(first) == 20
    # full replay (the kill-before-manifest-durable case): keyed
    # upserts converge — store byte-identical, nothing duplicated
    push_bulk(_push_docs(), mk, id_col="url",
              batch_size=6).materialize()
    assert _store_state(store) == first


def test_push_bulk_retry_and_exhaustion(ray_session, tmp_path):
    import pytest as _pytest

    from ferenda_ray.sources.pushsink import FileBulkClient, push_bulk

    store = str(tmp_path / "store2")
    marker = str(tmp_path / "fails")
    # injected response-level errors on the first 2 bulk calls →
    # retries absorb them (attempts > 1 somewhere, all pushed)
    mk = lambda: FileBulkClient(store, fail_first=2,  # noqa: E731
                                fail_marker=marker)
    m = push_bulk(_push_docs(), mk, id_col="url", batch_size=6,
                  backoff_s=0.001).to_pandas()
    assert m["n_docs"].sum() == 20
    assert set(m["status"]) == {"pushed"}
    assert m["attempts"].max() > 1
    assert len(_store_state(store)) == 20

    # permanently failing store → IndexingError surfaces (task fails,
    # the fulltextindex.py commit contract)
    from ferenda_ray.sources import pushsink

    always_bad = lambda: FileBulkClient(  # noqa: E731
        str(tmp_path / "store3"), fail_first=10 ** 9)
    with _pytest.raises(Exception) as ei:
        push_bulk(_push_docs(), always_bad, id_col="url",
                  batch_size=6, max_retries=1,
                  backoff_s=0.001).materialize()
    assert "IndexingError" in str(ei.value) or isinstance(
        ei.value, pushsink.IndexingError)


def test_push_bulk_kill_resume_manifest(ray_session, tmp_path):
    """Kill/resume: run 1 'dies' after pushing a prefix (simulated by
    pushing only half the corpus); run 2 passes run 1's manifest —
    already-durable batches are SKIPPED (attempts == 0), the rest
    push, and the store ends complete and exactly-once."""
    import ray

    from ferenda_ray.sources.pushsink import (
        FileBulkClient,
        acked_ids,
        push_bulk,
    )

    store = str(tmp_path / "store4")
    mk = lambda: FileBulkClient(store)  # noqa: E731
    half = _push_docs().limit(12)
    m1 = push_bulk(half, mk, id_col="url", batch_size=6).materialize()
    acked = acked_ids(m1)
    # acked is keyed on DOC ids (12 pushed docs), not batch hashes,
    # so resume survives different batch boundaries on run 2
    assert len(acked) == 12
    assert len(_store_state(store)) == 12

    m2 = push_bulk(_push_docs(), mk, id_col="url", batch_size=6,
                   acked=ray.put(acked)).to_pandas()
    assert m2["n_docs"].sum() == 20
    # exactly the 8 not-yet-durable docs re-serialize, whatever the
    # batch boundaries of run 2 turned out to be
    assert m2["n_pushed"].sum() == 8
    skipped = m2[m2["status"] == "skipped"]
    assert len(skipped) == 2 and (skipped["attempts"] == 0).all()
    assert (m2[m2["status"] == "pushed"]["attempts"] >= 1).all()
    state = _store_state(store)
    assert len(state) == 20
    # doc content is the latest write, exactly one file per url
    assert state["http%3A%2F%2Fx.test%2Fdoc%2F7.json"]["text"] == "body 7"
