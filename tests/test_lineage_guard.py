"""Exchange-depth lineage guard (stages/lineage.py).

The guarded hazard (CLAUDE.md, observed on Ray 2.49): a lineage
``(exchangeA → union → exchangeB) → union → exchangeC`` — a third
bucketed groupby consuming the union of a two-exchange subtree with
another branch of the same upstream — returned wrong results. These
tests build exactly that shape through the guard and assert that

- depth bookkeeping counts exchanges across derives and unions,
- ``on_limit="assert"`` raises before the forbidden shape forms,
- the default materialize fallback produces CORRECT results (the
  sum survives three chained exchanges) and resets the lineage, and
- the migrated scrub/decontaminate family still works end-to-end.
"""

import numpy as np
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")

from ferenda_ray.stages import lineage  # noqa: E402
from ferenda_ray.stages.lineage import (  # noqa: E402
    ExchangeDepthError,
    derive,
    exchange,
    exchange_depth,
    union_tracked,
)


def _items(n):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "k": np.arange(n, dtype=np.int64) % 7,
        "v": np.arange(n, dtype=np.int64)}))


def _bucket_sum(d):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False)["v"].sum()
        out["k"] = out["k"].astype("int64")
        out["v"] = out["v"].astype("int64")
        return out
    return d.groupby("k").map_groups(fn, batch_format="pandas")


def test_depth_bookkeeping(ray_session):
    src = _items(100)
    assert exchange_depth(src) == 0
    e1 = exchange(src, _bucket_sum)
    assert exchange_depth(e1) == 1
    m = derive(e1.map_batches(lambda df: df, batch_format="pandas"), e1)
    assert exchange_depth(m) == 1
    u = union_tracked(m, _items(10))
    assert exchange_depth(u) == 1
    e2 = exchange(u, _bucket_sum)
    assert exchange_depth(e2) == 2


def test_third_exchange_asserts(ray_session):
    src = _items(100)
    e1 = exchange(src, _bucket_sum)
    u1 = union_tracked(e1, _items(10))
    e2 = exchange(u1, _bucket_sum)
    # the forbidden shape: exchange over (two-exchange subtree ∪ branch)
    u2 = union_tracked(e2, _items(10))
    assert exchange_depth(u2) == 2
    with pytest.raises(ExchangeDepthError):
        exchange(u2, _bucket_sum, on_limit="assert")


def test_third_exchange_materializes_and_is_correct(ray_session):
    # exact hazard DAG from CLAUDE.md: exchangeA → union → exchangeB,
    # then union with ANOTHER branch of the same upstream, then a
    # third exchange. The guard materializes the subtree, so the
    # final sums must be exact.
    src = _items(100)
    e1 = exchange(src, _bucket_sum)
    u1 = union_tracked(e1, src)
    e2 = exchange(u1, _bucket_sum)
    u2 = union_tracked(e2, src)
    e3 = exchange(u2, _bucket_sum)
    assert exchange_depth(e3) == 1  # fresh lineage after materialize
    got = (e3.to_pandas().sort_values("k").reset_index(drop=True))
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64) % 7,
                         "v": np.arange(100, dtype=np.int64)})
    s = base.groupby("k", as_index=False)["v"].sum()
    exp = s.copy()
    exp["v"] = s["v"] * 3  # e2 sums (e1 ∪ src) = 2s; u2 adds s more
    exp = exp.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["v"].tolist() == exp["v"].tolist()


def test_migrated_scrub_family_depths(ray_session):
    """scrub_duplicated_passages / decontaminate end-to-end through
    the guard: outputs are depth-2 lineages (the proven shape), and a
    caller chaining one more exchange gets the materialize fallback
    rather than the forbidden DAG."""
    import ray.data as rd

    from ferenda_ray.stages.dedup import (
        decontaminate,
        scrub_duplicated_passages,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog now",
                 "the quick brown fox jumps over the lazy dog again",
                 "completely different words in this one here",
                 "another unique document with its own words",
                 "the quick brown fox jumps over the lazy dog too",
                 "yet more unrelated content for padding out"]}))
    scrubbed = scrub_duplicated_passages(docs, n=6)
    assert exchange_depth(scrubbed) == 2
    out = scrubbed.to_pandas()
    assert len(out) == 6
    # the shared 9-gram's covered positions are gone from every dup
    for t in out.loc[out["key"].isin([0, 1, 4]), "clean_text"]:
        assert "quick brown fox" not in t

    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([100], dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog"]}))
    clean = decontaminate(docs, bench, n=8)
    assert exchange_depth(clean) == 2
    kept = sorted(clean.to_pandas()["key"])
    assert kept == [2, 3, 5]

    # chaining one more exchange on the depth-2 output is safe: the
    # guard cuts the lineage instead of forming the hazard shape
    nxt = exchange(
        derive(clean.map_batches(
            lambda df: pd.DataFrame(
                {"k": df["key"].astype("int64"),
                 "v": df["key"].astype("int64")}),
            batch_format="pandas"), clean),
        _bucket_sum)
    assert exchange_depth(nxt) == 1
    assert sorted(nxt.to_pandas()["k"]) == [2, 3, 5]


def test_composed_operators_propagate_depth(ray_session):
    """Composition regression (review finding): feeding one guarded
    operator's depth-2 output into another must NOT restart depth at
    0 on the primary arm — the second operator's exchanges see the
    true depth and the guard cuts the lineage instead of silently
    forming the forbidden DAG."""
    import ray.data as rd

    from ferenda_ray.stages.dedup import (
        decontaminate,
        scrub_duplicated_passages,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog now",
                 "the quick brown fox jumps over the lazy dog again",
                 "completely different words in this one here",
                 "another unique document with its own words",
                 "the quick brown fox jumps over the lazy dog too",
                 "yet more unrelated content for padding out"]}))
    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([100], dtype=np.int64),
        "text": ["completely different words in this one here"]}))
    clean = decontaminate(docs, bench, n=7)  # bench doc is 7 words
    assert exchange_depth(clean) == 2
    # scrub over the depth-2 output: its internal exchanges would
    # chain to depth 3-4 — the guard must materialize, and the
    # composed RESULT must be correct
    renamed = derive(clean.map_batches(
        lambda df: df.rename(columns={"key": "doc_id"}),
        batch_format="pandas"), clean)
    scrubbed = scrub_duplicated_passages(renamed, n=6)
    assert 1 <= exchange_depth(scrubbed) <= 2
    out = scrubbed.to_pandas().sort_values("key")
    assert sorted(out["key"]) == [0, 1, 3, 4, 5]  # doc 2 decontaminated
    for t in out.loc[out["key"].isin([0, 1, 4]), "clean_text"]:
        assert "quick brown fox" not in t
