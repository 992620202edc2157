"""Property tests for the session-12/13 customer-analytics and
supervised-label operators: each distributed result is pinned against
an independent brute-force recomputation on the same sf0.001 input
(the SQL-parity harness checks engine agreement; these check the
MATH). The brute forces deliberately use different algorithms from
both engines — full sorts and per-user Python loops — so a shared
algorithmic mistake cannot pass."""

import bisect

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _to_pd(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


def _orders_rfm():
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_custkey", "o_orderdate",
                               "o_totalprice"])
    ck = t["o_custkey"].to_numpy()
    day = t["o_orderdate"].to_numpy().astype("datetime64[D]") \
        .astype(np.int64)
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    df = pd.DataFrame({"ck": ck, "day": day, "cents": cents})
    cust = (df.groupby("ck")
            .agg(f=("ck", "size"), m=("cents", "sum"),
                 last=("day", "max")))
    close = int(cust["last"].max())
    cust["r"] = close - cust["last"]
    return cust


def _quintile_scores(values):
    """1 + #edges strictly below v, edges = order statistics at
    rank ceil(q*N/5) — recomputed by FULL SORT (neither engine
    sorts)."""
    s = np.sort(np.asarray(values, dtype=np.int64))
    n = len(s)
    edges = [int(s[(q * n + 4) // 5 - 1]) for q in (1, 2, 3, 4)]
    return np.asarray([1 + sum(e < v for e in edges)
                       for v in values], dtype=np.int64)


def test_rfm_census_matches_brute_force(ray_session):
    from ferenda_ray.pipelines.queries import customer_rfm_segments

    out = _to_pd(customer_rfm_segments(SF))
    cust = _orders_rfm()
    exp = pd.DataFrame({
        "r_score": _quintile_scores(cust["r"].to_numpy()),
        "f_score": _quintile_scores(cust["f"].to_numpy()),
        "m_score": _quintile_scores(cust["m"].to_numpy())})
    exp = (exp.groupby(["r_score", "f_score", "m_score"])
           .size().rename("n_customers").reset_index())
    got = out.sort_values(["r_score", "f_score", "m_score"]) \
        .reset_index(drop=True)
    exp = exp.sort_values(["r_score", "f_score", "m_score"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
    # census conserves the customer population
    assert int(out["n_customers"].sum()) == len(cust)


def test_rfm_quintiles_cover_at_least_their_rank(ray_session):
    """Scores ≤ q must cover at least ceil(q·N/5) customers on every
    dimension (ties can only ENLARGE a lower quintile, never
    shrink it)."""
    cust = _orders_rfm()
    n = len(cust)
    for dim in ("r", "f", "m"):
        scores = _quintile_scores(cust[dim].to_numpy())
        for q in (1, 2, 3, 4):
            assert (scores <= q).sum() >= (q * n + 4) // 5


def test_pareto_topk_is_minimal_cover(ray_session):
    from ferenda_ray.pipelines.queries import (
        customer_pareto_concentration)

    out = _to_pd(customer_pareto_concentration(SF)).iloc[0]
    cust = _orders_rfm()
    m = np.sort(cust["m"].to_numpy(np.int64))[::-1]
    total = int(m.sum())
    target = (4 * total + 4) // 5
    cum = m.cumsum()
    k = int(np.searchsorted(cum, target)) + 1
    assert int(out["top_k"]) == k
    assert int(out["covered_cents"]) == int(cum[k - 1])
    assert int(out["n_customers"]) == len(cust)
    # minimality: k covers the target, k-1 does not
    assert int(cum[k - 1]) >= target
    if k > 1:
        assert int(cum[k - 2]) < target
    assert int(out["covered_permille"]) == 1000 * int(cum[k - 1]) \
        // total


def _sessions_brute():
    t = pq.read_table(SF + "/events.parquet",
                      columns=["event_id", "user_id", "ts"])
    df = pd.DataFrame({
        "u": t["user_id"].to_numpy(),
        "e": t["event_id"].to_numpy(),
        "ts": t["ts"].to_numpy().astype("datetime64[us]")
        .astype(np.int64)})
    durs = []
    for _, g in df.groupby("u"):
        ts = g.sort_values(["ts", "e"])["ts"].to_numpy()
        start = ts[0]
        prev = ts[0]
        for x in ts[1:]:
            if x - prev > 30 * 60_000_000:
                durs.append((prev - start) // 60_000_000)
                start = x
            prev = x
        durs.append((prev - start) // 60_000_000)
    return np.asarray(durs, dtype=np.int64)


def test_lifetable_matches_brute_force_sessions(ray_session):
    from ferenda_ray.pipelines.queries import events_session_lifetable

    out = _to_pd(events_session_lifetable(SF)) \
        .sort_values("dur_min").reset_index(drop=True)
    durs = _sessions_brute()
    exp = (pd.Series(durs).value_counts().sort_index()
           .rename("n_ending").rename_axis("dur_min").reset_index())
    assert list(out["dur_min"]) == list(exp["dur_min"])
    assert list(out["n_ending"]) == list(exp["n_ending"])
    # n_at_risk is the suffix sum: risk(t) = sessions lasting ≥ t
    for _, row in out.iterrows():
        assert int(row["n_at_risk"]) == int(
            (durs >= int(row["dur_min"])).sum())
    # the table starts with every session at risk
    assert int(out["n_at_risk"].iloc[0]) == len(durs)
    # durations are non-degenerate (the datetime64[us] regression:
    # a ns-assuming divisor floors every duration to 0)
    assert int(out["dur_min"].max()) > 0


def _events_ut():
    t = pq.read_table(SF + "/events.parquet",
                      columns=["user_id", "ts", "event_type"])
    return pd.DataFrame({
        "u": t["user_id"].to_numpy(),
        "ts": t["ts"].to_numpy().astype("datetime64[us]")
        .astype(np.int64),
        "kind": t["event_type"].to_pylist()})


def test_churn_labels_match_brute_force(ray_session):
    from ferenda_ray.pipelines.queries import (
        user_churn_labels, CHURN_WINDOW_HOURS)

    out = _to_pd(user_churn_labels(SF))
    df = _events_ut()
    cutoff = int(df["ts"].max()) - CHURN_WINDOW_HOURS * 3_600_000_000
    rows = []
    for _, g in df.groupby("u"):
        nb = int((g["ts"] < cutoff).sum())
        na = int((g["ts"] >= cutoff).sum())
        if nb > 0:
            rows.append((int(nb).bit_length() - 1, int(na == 0)))
    exp = (pd.DataFrame(rows, columns=["band", "churned"])
           .groupby(["band", "churned"]).size()
           .rename("n_users").reset_index()
           .sort_values(["band", "churned"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.sort_values(["band", "churned"]).reset_index(drop=True)
        .astype("int64"), exp.astype("int64"))
    # both label classes must be populated — a window that labels
    # nobody churned is a degenerate training set
    assert set(out["churned"]) == {0, 1}
    # label-leakage guard: users born inside the window are excluded
    n_labeled = int(out["n_users"].sum())
    n_with_history = sum(
        1 for _, g in df.groupby("u") if (g["ts"] < cutoff).any())
    assert n_labeled == n_with_history


def test_funnel_latency_matches_per_user_scan(ray_session):
    from ferenda_ray.pipelines.queries import funnel_latency_median

    out = _to_pd(funnel_latency_median(SF)).iloc[0]
    df = _events_ut()
    lats = []
    for _, g in df.groupby("u"):
        g = g.sort_values("ts", kind="mergesort")
        buys = g.loc[g["kind"] == "purchase", "ts"].to_numpy()
        for c in g.loc[g["kind"] == "click", "ts"].to_numpy():
            i = bisect.bisect_left(buys.tolist(), int(c))
            if i < len(buys):
                lats.append((int(buys[i]) - int(c)) // 1_000_000)
    lats.sort()
    assert int(out["n_pairs"]) == len(lats)
    assert int(out["median_latency_sec"]) == lats[(len(lats) + 1)
                                                  // 2 - 1]
    # pairing never matches backwards in time
    assert min(lats) >= 0
