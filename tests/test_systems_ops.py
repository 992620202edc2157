"""Invariant tests for the session-10 systems primitives — properties
the SQL-parity harness can't express (it proves engine equality, not
that the CONTRACT itself holds):

- rendezvous_rebalance: HRW minimal movement — every doc that moves
  on a scale-out lands on the NEW node, and stayers dominate.
- source_compaction_plan: the cumulative-quota rule's geometry —
  contiguous bins per source, byte completeness, and every cumulative
  bin prefix meeting its quota boundary.
- user_value_twa: the distributed LAG pipeline equals a per-user
  brute-force recomputation from the raw rows.
- orders_winsorized_mean: clip bounds are true order statistics and
  the clipped mean lies within them.
"""

import duckdb
import numpy as np
import pandas as pd

import ferenda_ray.pipelines.queries as q

SF = "/root/testdata/sf0.001"


def _df(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()


def test_rendezvous_minimal_movement(ray_session):
    out = _df(q.rendezvous_rebalance(SF))
    total = int(out["n_docs"].sum())
    moved = out[out["node_before"] != out["node_after"]]
    # HRW's defining property: a doc only ever moves TO the new node
    assert (moved["node_after"] == q.RDV_NODES_AFTER - 1).all()
    # expected movement fraction is 1/9; allow a wide band for small N
    frac = moved["n_docs"].sum() / total
    assert 0.02 < frac < 0.30, frac
    # every original node keeps a diagonal (stayers dominate)
    stay = out[out["node_before"] == out["node_after"]]
    assert set(stay["node_before"]) == set(range(q.RDV_NODES_BEFORE))


def test_compaction_plan_geometry(ray_session):
    plan = _df(q.source_compaction_plan(SF))
    docs = duckdb.sql(
        "SELECT source, sum(n_chars) AS total, max(n_chars) AS mx "
        "FROM read_parquet('%s/documents.parquet') GROUP BY 1"
        % SF).fetchdf().set_index("source")
    T = q.COMPACT_TARGET_CHARS
    for src, g in plan.groupby("source"):
        g = g.sort_values("bin").reset_index(drop=True)
        # bins are contiguous from 0
        assert list(g["bin"]) == list(range(len(g))), src
        # byte completeness: the plan covers exactly the source
        assert int(g["bytes_total"].sum()) == int(docs.loc[src, "total"])
        # quota geometry: after bin k closes, cumulative bytes have
        # crossed the (k+1)·T boundary (true for every non-last bin
        # by the before//T rule)
        cum = g["bytes_total"].cumsum().to_numpy()
        for k in range(len(g) - 1):
            assert cum[k] >= (k + 1) * T, (src, k, cum[k])


def test_user_twa_matches_bruteforce(ray_session):
    got = _df(q.user_value_twa(SF)).set_index("user_id")
    raw = duckdb.sql(
        "SELECT user_id, epoch_us(ts) AS t, event_id, "
        "CAST(round(value*1000) AS BIGINT) AS mv "
        "FROM read_parquet('%s/events.parquet')" % SF).fetchdf()
    for uid, g in raw.groupby("user_id"):
        g = g.sort_values(["t", "event_id"]).reset_index(drop=True)
        if len(g) < 2:
            assert uid not in got.index
            continue
        t = g["t"].to_numpy(np.int64)
        mv = g["mv"].to_numpy(np.int64)
        dt = t[1:] - t[:-1]
        num, den = int((mv[:-1] * dt).sum()), int(dt.sum())
        assert int(got.loc[uid, "twa_milli"]) == num // den
        assert int(got.loc[uid, "span_us"]) == den


def test_winsorized_bounds_are_order_statistics(ray_session):
    out = _df(q.orders_winsorized_mean(SF)).iloc[0]
    v = np.sort(duckdb.sql(
        "SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v "
        "FROM read_parquet('%s/orders.parquet')" % SF)
        .fetchdf()["v"].to_numpy(np.int64))
    n = len(v)
    lo_k = (q.WINSOR_PERMILLES[0] * n + 999) // 1000
    hi_k = (q.WINSOR_PERMILLES[1] * n + 999) // 1000
    assert int(out["lo_cents"]) == int(v[lo_k - 1])
    assert int(out["hi_cents"]) == int(v[hi_k - 1])
    clipped = np.clip(v, out["lo_cents"], out["hi_cents"])
    assert int(out["mean_milli"]) == (int(clipped.sum()) * 1000) // n
    assert (out["lo_cents"] * 1000 <= out["mean_milli"]
            <= out["hi_cents"] * 1000)


def test_ivf_add_hardlink_versioning(ray_session, tmp_path):
    """similarity.add_to_ivf_index: the new version hardlinks the
    base segments (O(files) versioning, st_nlink > 1), the base dir
    is byte-untouched, delta vectors land in centroid buckets, and
    the merge is idempotent."""
    import os

    import numpy as np
    import pandas as pd
    import ray

    from ferenda_ray.stages import similarity

    rng = [[float(i % 7) - 3.0, float(i % 5) - 2.0, 1.0]
           for i in range(40)]
    base_df = pd.DataFrame({"vec_id": list(range(40)),
                            "embedding": rng})
    base = str(tmp_path / "ivf_base")
    similarity.build_ivf_index(ray.data.from_pandas(base_df), base,
                               n_centroids=4)
    base_files = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(base) for f in fs
        if f.endswith(".parquet"))
    base_sig = [(p, os.stat(p).st_mtime_ns, os.stat(p).st_size)
                for p in base_files]

    delta_df = pd.DataFrame({"vec_id": [100, 101],
                             "embedding": [[1.0, 0.0, 0.0],
                                           [0.0, 1.0, 0.0]]})
    merged = str(tmp_path / "ivf_merged")
    similarity.add_to_ivf_index(base, ray.data.from_pandas(delta_df),
                                merged)
    assert os.path.exists(os.path.join(merged, "_SUCCESS"))
    # base segments are hardlinked, not copied, and base untouched
    linked = [os.path.join(d, f)
              for d, _, fs in os.walk(merged) for f in fs
              if f.startswith("base_")]
    assert linked and all(os.stat(p).st_nlink >= 2 for p in linked)
    assert base_sig == [(p, os.stat(p).st_mtime_ns, os.stat(p).st_size)
                        for p in base_files]
    # the merged index serves base + delta: full probe finds vec 100
    # as the exact match for its own direction
    out = similarity.knn_ivf_indexed(merged,
                                     np.array([[1.0, 0.0, 0.0]]),
                                     k=1, n_probe=4)
    assert list(out["vec_id"]) == [100]
    # idempotent: marker short-circuits
    assert similarity.add_to_ivf_index(base, None, merged) == merged
