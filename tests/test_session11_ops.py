"""Property tests for the session-11 governance/audit operators:
each distributed result is pinned against an independent brute-force
recomputation on the same sf0.001 input (the SQL-parity harness
checks engine agreement; these check the MATH)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _orders_cents():
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"])
    k = t["o_orderkey"].to_numpy()
    p = t["o_totalprice"].to_numpy() * 100.0
    cents = (np.floor(np.abs(p) + 0.5) * np.sign(p)).astype(np.int64)
    return k, cents


def test_weighted_median_is_true_weight_rank(ray_session):
    """Repeat every price by its quantity weight: the operator's
    answer must be the (W+1)//2-th of the expanded multiset."""
    from ferenda_ray.pipelines.queries import lineitem_weighted_median

    out = lineitem_weighted_median(SF).set_index("l_returnflag")
    t = pq.read_table(SF + "/lineitem.parquet",
                      columns=["l_returnflag", "l_extendedprice",
                               "l_quantity"])
    df = pd.DataFrame({
        "f": t["l_returnflag"].to_pylist(),
        "v": (np.floor(t["l_extendedprice"].to_numpy() * 100.0 + 0.5)
              ).astype(np.int64),
        "w": np.round(t["l_quantity"].to_numpy()).astype(np.int64)})
    for f, g in df.groupby("f"):
        expanded = np.sort(np.repeat(g["v"].to_numpy(),
                                     g["w"].to_numpy()))
        tgt = (len(expanded) + 1) // 2
        assert int(out.loc[f, "median_cents"]) == int(expanded[tgt - 1])
        assert int(out.loc[f, "w_total"]) == len(expanded)


def test_mad_is_true_median_absolute_deviation(ray_session):
    from ferenda_ray.pipelines.queries import orders_price_mad

    out = orders_price_mad(SF).iloc[0]
    _, cents = _orders_cents()
    s = np.sort(cents)
    med = int(s[(len(s) + 1) // 2 - 1])
    dev = np.sort(np.abs(cents - med))
    mad = int(dev[(len(dev) + 1) // 2 - 1])
    assert int(out["median_cents"]) == med
    assert int(out["mad_cents"]) == mad


def test_bloom_has_no_false_negatives(ray_session):
    """Probe the MEMBER keys through the audit's own bit arithmetic:
    every member must pass (the Bloom contract the FPR audit
    assumes)."""
    import hashlib

    from ferenda_ray.pipelines.queries import (BLOOM_AUDIT_K,
                                               BLOOM_AUDIT_M)

    k, _ = _orders_cents()

    def bits(key):
        return {int(hashlib.md5(b"bf:%d:%d" % (key, i)).hexdigest()
                    [:15], 16) % BLOOM_AUDIT_M
                for i in range(BLOOM_AUDIT_K)}

    member_bits = set()
    for key in k:
        member_bits |= bits(int(key))
    for key in k[:200]:
        assert bits(int(key)) <= member_bits


def test_peak_concurrency_matches_brute_force(ray_session):
    from ferenda_ray.pipelines.queries import (CONC_INTERVAL_US,
                                               events_peak_concurrency)

    out = events_peak_concurrency(SF).to_pandas().iloc[0]
    ts = (pq.read_table(SF + "/events.parquet", columns=["ts"])["ts"]
          .to_numpy().astype("datetime64[us]").astype(np.int64))
    t = np.concatenate([ts, ts + CONC_INTERVAL_US])
    d = np.concatenate([np.ones(len(ts), np.int64),
                        np.full(len(ts), -1, np.int64)])
    order = np.lexsort((d, t))  # -1 before +1 at equal t
    cum = np.cumsum(d[order])
    peak = int(cum.max())
    first = int(np.argmax(cum == peak))
    assert int(out["peak"]) == peak
    assert int(out["t_peak_us"]) == int(t[order][first])


def test_pit_join_differs_from_current_version(ray_session):
    """The point of the PIT join: reading the CURRENT dimension
    version gives a different rollup (label leakage would be
    invisible if they matched)."""
    import duckdb

    from ferenda_ray.pipelines.queries import orders_pit_dimension_join

    pit = (orders_pit_dimension_join(SF).to_pandas()
           .set_index("segment")["cents"])
    con = duckdb.connect()
    cur = con.execute("""
        SELECT c_mktsegment, CAST(sum(CAST(round(o_totalprice * 100)
               AS BIGINT)) AS BIGINT)
        FROM read_parquet('%s/orders.parquet') o
        JOIN read_parquet('%s/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1""" % (SF, SF)).fetchall()
    cur = {s: v for s, v in cur}
    assert dict(pit) != cur
    assert sum(pit) == sum(cur.values())  # revenue conserved


def test_sequence_audit_partitions_all_orders(ray_session):
    import duckdb

    from ferenda_ray.pipelines.queries import lineitem_sequence_audit

    out = lineitem_sequence_audit(SF).to_pandas()
    n_orders = duckdb.connect().execute(
        "SELECT count(DISTINCT l_orderkey) FROM read_parquet('%s')"
        % (SF + "/lineitem.parquet")).fetchone()[0]
    assert set(out["class"]) == {"ok", "dup", "gap"}
    assert int(out["n_orders"].sum()) == int(n_orders)


def test_median_of_means_bounds(ray_session):
    """MoM must lie between the min and max group mean and equal the
    brute-force lower median of the group means."""
    import hashlib

    from ferenda_ray.pipelines.queries import (MOM_GROUPS,
                                               orders_median_of_means)

    out = orders_median_of_means(SF).to_pandas().iloc[0]
    k, cents = _orders_cents()
    grp = np.fromiter(
        (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16)
         % MOM_GROUPS for x in k), np.int64, len(k))
    df = pd.DataFrame({"g": grp, "c": cents}).groupby("g").agg(
        s=("c", "sum"), n=("c", "size"))
    means = np.sort((1000 * df["s"].to_numpy(np.int64))
                    // df["n"].to_numpy(np.int64))
    assert int(out["mom_millicents"]) == int(
        means[(len(means) + 1) // 2 - 1])
    assert means.min() <= out["mom_millicents"] <= means.max()


def test_time_travel_versions_are_monotone_consistent(ray_session):
    """v1 row count = v0 − deletes + inserts; v2 = v1 − deletes2 —
    recomputed from the key arithmetic directly."""
    from ferenda_ray.pipelines.queries import (CDC_DEL_MOD,
                                               CDC_INS_MOD,
                                               CDC_INS_OFF,
                                               TT_DEL2_MOD,
                                               orders_time_travel)

    out = (orders_time_travel(SF).to_pandas()
           .set_index("version")["n_rows"])
    k, _ = _orders_cents()
    alive1 = k[k % CDC_DEL_MOD != 0]
    ins = k[k % CDC_INS_MOD == 0] + CDC_INS_OFF
    keys1 = np.concatenate([alive1, ins])
    assert int(out.loc[0]) == len(k)
    assert int(out.loc[1]) == len(keys1)
    assert int(out.loc[2]) == int((keys1 % TT_DEL2_MOD != 0).sum())
