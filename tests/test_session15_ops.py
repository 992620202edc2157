"""Session-15 operators: Fellegi–Sunter linkage scoring, exact
two-sample KS, Mann–Whitney U — property tests against brute-force
recomputation on the raw sf0.001 tables (the oracle-parity suite
covers the SQL side)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def lineitem(sf_smoke):
    return pq.read_table(
        sf_smoke + "/lineitem.parquet",
        columns=["l_extendedprice", "l_returnflag"]).to_pandas()


def test_fellegi_sunter_weights_ordered():
    from ferenda_ray.pipelines.queries import sessions as S

    # agreement must always add evidence, disagreement subtract
    for wa, wd in zip(S.FS_AGREE, S.FS_DISAGREE):
        assert wa > 0 > wd


def test_fellegi_sunter_matches_bruteforce(ray_session, sf_smoke):
    from ferenda_ray.pipelines.queries import er_fellegi_sunter
    from ferenda_ray.pipelines.queries import sessions as S

    got = er_fellegi_sunter(sf_smoke).to_pandas()
    c = pq.read_table(sf_smoke + "/customer.parquet").to_pandas()
    c["bal"] = np.round(c["c_acctbal"] * 100).astype("int64")
    c["blk"] = c["c_custkey"] // S.FS_BLOCK
    c["lc"] = [n[-1] for n in c["c_name"]]
    j = c.merge(c, on="blk")
    j = j[j["c_custkey_x"] < j["c_custkey_y"]]
    bits = ((j["c_nationkey_x"].to_numpy()
             == j["c_nationkey_y"].to_numpy()).astype(int)
            | ((j["c_mktsegment_x"].to_numpy()
                == j["c_mktsegment_y"].to_numpy()).astype(int) << 1)
            | ((np.abs(j["bal_x"].to_numpy() - j["bal_y"].to_numpy())
                <= S.FS_BAL_CENTS).astype(int) << 2)
            | ((j["lc_x"].to_numpy()
                == j["lc_y"].to_numpy()).astype(int) << 3))
    exp = (pd.Series(bits).value_counts().sort_index())
    got_counts = dict(zip(got["pattern"], got["n_pairs"]))
    assert got_counts == {int(k): int(v) for k, v in exp.items()}
    # decision boundary honors the declared thresholds
    for _, row in got.iterrows():
        if row["score_milli"] >= S.FS_UPPER:
            assert row["decision"] == "match"
        elif row["score_milli"] >= S.FS_LOWER:
            assert row["decision"] == "possible"
        else:
            assert row["decision"] == "non_match"


def _cents_split(lineitem):
    v = np.round(lineitem["l_extendedprice"].to_numpy() * 100) \
        .astype("int64")
    r = (lineitem["l_returnflag"] == "R").to_numpy()
    return v[r], v[~r]


def test_ks_matches_bruteforce(ray_session, sf_smoke, lineitem):
    from ferenda_ray.pipelines.queries import lineitem_ks_test

    got = lineitem_ks_test(sf_smoke)
    a, b = _cents_split(lineitem)
    support = np.unique(np.concatenate([a, b]))
    cr = np.searchsorted(np.sort(a), support, side="right")
    co = np.searchsorted(np.sort(b), support, side="right")
    diff = np.abs(cr.astype(object) * len(b)
                  - co.astype(object) * len(a))
    i = int(np.argmax(diff))
    assert int(got["n_returned"][0]) == len(a)
    assert int(got["n_other"][0]) == len(b)
    assert int(got["d_ppm"][0]) == \
        10**6 * int(diff[i]) // (len(a) * len(b))
    assert int(got["at_cents"][0]) == int(support[i])


def test_mann_whitney_matches_rank_identity(ray_session, sf_smoke,
                                            lineitem):
    from ferenda_ray.pipelines.queries import lineitem_mann_whitney

    got = lineitem_mann_whitney(sf_smoke)
    a, b = _cents_split(lineitem)
    # brute force via midranks over the pooled sample
    pooled = np.concatenate([a, b])
    order = pd.Series(pooled).rank(method="average").to_numpy()
    r1_twice = int(np.round(2 * order[: len(a)].sum()))
    u1_twice = r1_twice - len(a) * (len(a) + 1)
    assert int(got["u1_twice"][0]) == u1_twice
    assert (int(got["u1_twice"][0]) + int(got["u2_twice"][0])
            == 2 * len(a) * len(b))
    # U identity: U1 counts (a>b) pairs + half the ties, doubled
    u_direct = 0
    sb = np.sort(b)
    gt = np.searchsorted(sb, a, side="left")
    ge = np.searchsorted(sb, a, side="right")
    u_direct = int(2 * gt.astype(object).sum()
                   + (ge - gt).astype(object).sum())
    assert u1_twice == u_direct


def test_kendall_tau_matches_bruteforce(ray_session, sf_smoke):
    from ferenda_ray.pipelines.queries import part_kendall_tau

    got = part_kendall_tau(sf_smoke)
    p = pq.read_table(sf_smoke + "/part.parquet",
                      columns=["p_size", "p_retailprice"]).to_pandas()
    sz = p["p_size"].to_numpy()
    v = np.round(p["p_retailprice"].to_numpy() * 100).astype("int64")
    n = len(p)
    conc = disc = 0
    for i in range(n):
        ds_ = sz[i + 1:] - sz[i]
        dv = v[i + 1:] - v[i]
        prod = np.sign(ds_) * np.sign(dv)
        conc += int((prod > 0).sum())
        disc += int((prod < 0).sum())
    assert int(got["n_concordant"][0]) == conc
    assert int(got["n_discordant"][0]) == disc
    import math
    n0 = n * (n - 1) // 2
    tx = int(got["ties_size"][0])
    ty = int(got["ties_price"][0])
    den = math.isqrt((n0 - tx) * (n0 - ty))
    num = conc - disc
    assert int(got["tau_b_ppm"][0]) == \
        (1 if num >= 0 else -1) * (10**6 * abs(num) // max(den, 1))
    # sanity: tau in [-1, 1] ppm grid
    assert -10**6 <= int(got["tau_b_ppm"][0]) <= 10**6


def test_sprt_decision_matches_bruteforce(ray_session, sf_smoke):
    from ferenda_ray.pipelines.queries import events_sprt_decision
    from ferenda_ray.pipelines.queries import sessions as S

    got = events_sprt_decision(sf_smoke)
    e = pq.read_table(sf_smoke + "/events.parquet",
                      columns=["ts", "event_type"]).to_pandas()
    day = (e["ts"].to_numpy().astype("datetime64[us]")
           .astype("int64") // 86_400_000_000)
    err = (e["event_type"] == "error").to_numpy()
    d = (pd.DataFrame({"day": day, "err": err.astype(int)})
         .groupby("day").agg(n=("err", "size"), ne=("err", "sum"))
         .sort_index())
    cum = 0
    decision, cross = "continue", -1
    for dy, row in d.iterrows():
        cum += int(row["ne"]) * S.SPRT_LLR_ERR \
            + int(row["n"] - row["ne"]) * S.SPRT_LLR_OK
        if decision == "continue" and abs(cum) >= S.SPRT_BOUND_MILLI:
            decision = ("accept_h1" if cum >= S.SPRT_BOUND_MILLI
                        else "accept_h0")
            cross = int(dy)
    assert got["decision"][0] == decision
    assert int(got["crossing_day"][0]) == cross
    assert int(got["llr_final_milli"][0]) == cum
    # with the synthetic ~20% error share the evidence favors H1
    assert decision == "accept_h1"


def test_fs_em_weights_replay(ray_session, sf_smoke):
    """EM query == driver replay of _fs_em_step from the same census;
    all outputs clamped milli probabilities."""
    from ferenda_ray.pipelines.queries import (er_fellegi_sunter,
                                               er_fs_em_weights)
    from ferenda_ray.pipelines.queries import sessions as S

    got = er_fs_em_weights(sf_smoke)
    census = [(int(r["pattern"]), int(r["n_pairs"]))
              for _, r in er_fellegi_sunter(sf_smoke)
              .to_pandas().iterrows()]
    p, m, u = S.FS_EM_P0, [S.FS_EM_M0] * 4, [S.FS_EM_U0] * 4
    for _ in range(S.FS_EM_ITERS):
        p, m, u = S._fs_em_step(census, p, m, u)
    assert int(got["p_milli"][0]) == p
    for i, f in enumerate(S.FS_FIELDS):
        assert int(got["m_%s" % f[0]][0]) == m[i]
        assert int(got["u_%s" % f[0]][0]) == u[i]
    for c in got.columns:
        assert 1 <= int(got[c][0]) <= 999


def test_good_turing_bruteforce(ray_session, sf_smoke):
    from collections import Counter

    from ferenda_ray.pipelines.queries import vocab_good_turing

    got = vocab_good_turing(sf_smoke).to_pandas()
    docs = pq.read_table(sf_smoke + "/documents.parquet",
                         columns=["text"]).to_pandas()
    c = Counter()
    for t in docs["text"].fillna(""):
        c.update(t.split())
    n_tokens = sum(c.values())
    n1 = sum(1 for v in c.values() if v == 1)
    n2 = sum(1 for v in c.values() if v == 2)
    assert int(got["n_tokens"][0]) == n_tokens
    assert int(got["vocab_size"][0]) == len(c)
    assert int(got["n_singletons"][0]) == n1
    assert int(got["n_doubletons"][0]) == n2
    assert int(got["p_unseen_ppm"][0]) == 10**6 * n1 // n_tokens


def test_xbar_flags_bruteforce(ray_session, sf_smoke):
    from ferenda_ray.pipelines.queries import orders_xbar_control

    got = orders_xbar_control(sf_smoke).to_pandas()
    o = pq.read_table(sf_smoke + "/orders.parquet",
                      columns=["o_orderdate",
                               "o_totalprice"]).to_pandas()
    day = (o["o_orderdate"].to_numpy().astype("datetime64[us]")
           .astype("int64") // 86_400_000_000)
    cents = np.round(o["o_totalprice"].to_numpy() * 100) \
        .astype("int64")
    df = pd.DataFrame({"day": day, "c": cents})
    n_tot = len(df)
    s_tot = int(df["c"].sum())
    s2_tot = int(sum(int(x) ** 2 for x in df["c"]))
    var_num = n_tot * s2_tot - s_tot * s_tot
    flags = {}
    for d, g in df.groupby("day"):
        nd, sd = len(g), int(g["c"].sum())
        flags[int(d)] = int(
            (sd * n_tot - s_tot * nd) ** 2 > 9 * var_num * nd)
    assert dict(zip(got["day"], got["out_of_control"])) == flags
    assert len(got) == len(flags)


def test_mattr_bruteforce(ray_session, sf_smoke):
    from ferenda_ray.pipelines.queries import doc_mattr
    from ferenda_ray.pipelines.queries.sessions import MATTR_WINDOW

    got = doc_mattr(sf_smoke).to_pandas()
    docs = pq.read_table(sf_smoke + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    by_id = dict(zip(got["doc_id"], got["mattr_milli"]))
    for _, row in docs.head(40).iterrows():
        toks = (row["text"] or "").split()
        L = len(toks)
        if L == 0:
            exp = 0
        elif L <= MATTR_WINDOW:
            exp = 1000 * len(set(toks)) // L
        else:
            acc = sum(len(set(toks[i:i + MATTR_WINDOW]))
                      for i in range(L - MATTR_WINDOW + 1))
            exp = 1000 * acc // ((L - MATTR_WINDOW + 1)
                                 * MATTR_WINDOW)
        assert by_id[row["doc_id"]] == exp, row["doc_id"]


def test_burstiness_bruteforce(ray_session, sf_smoke):
    import math

    from ferenda_ray.pipelines.queries import events_burstiness_gb

    got = events_burstiness_gb(sf_smoke).to_pandas()
    e = pq.read_table(sf_smoke + "/events.parquet",
                      columns=["user_id", "ts"]).to_pandas()
    n = s = s2 = 0
    for _, g in e.groupby("user_id"):
        tss = np.sort(g["ts"].to_numpy().astype("datetime64[us]")
                      .astype("int64"))
        gaps = np.diff(tss) // 1_000_000
        n += len(gaps)
        s += int(gaps.sum())
        s2 += int(sum(int(x) ** 2 for x in gaps))
    d = math.isqrt(max(n * s2 - s * s, 0))
    assert int(got["n_gaps"][0]) == n
    assert int(got["mean_gap_s_milli"][0]) == 1000 * s // n
    assert int(got["burstiness_milli"][0]) == \
        1000 * (d - s) // max(d + s, 1)
    # gaps of a uniform-ish synthetic stream should be near-Poisson:
    # B in (-1000, 1000) by construction
    assert -1000 < int(got["burstiness_milli"][0]) < 1000
