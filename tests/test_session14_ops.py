"""Property tests for the session-14 evaluation/statistics operators:
each distributed result is pinned against an independent brute-force
recomputation on the same sf0.001 input (the SQL-parity harness checks
engine agreement; these check the MATH). The brute forces deliberately
use different algorithms from both engines — O(n²) pairwise loops,
per-row Python iteration, set-based triangle enumeration — so a shared
algorithmic mistake cannot pass."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _to_pd(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


def _scores_labels():
    t = pq.read_table(SF + "/lineitem.parquet",
                      columns=["l_orderkey", "l_returnflag"])
    y = (np.asarray(t["l_returnflag"].to_pylist()) == "R").astype(int)
    s = 8 * y + t["l_orderkey"].to_numpy() % 20
    return s, y


def test_auc_matches_pairwise_brute_force(ray_session):
    """AUC == the literal definition: over ALL (pos, neg) pairs,
    count score_pos > score_neg as 1 and ties as ½ (doubled to stay
    integer) — an O(n_pos·n_neg) loop via bincount comparison neither
    engine runs."""
    from ferenda_ray.pipelines.queries import lineitem_model_auc

    out = _to_pd(lineitem_model_auc(SF)).iloc[0]
    s, y = _scores_labels()
    pos, neg = s[y == 1], s[y == 0]
    u2 = 0
    for p in pos:  # per-positive Python loop
        u2 += 2 * int((neg < p).sum()) + int((neg == p).sum())
    auc = 1_000_000 * u2 // (2 * len(pos) * len(neg))
    assert int(out["auc_ppm"]) == auc
    assert int(out["n_pos"]) == len(pos)
    assert int(out["gini_ppm"]) == 2 * auc - 1_000_000
    # the planted signal must be visible and imperfect
    assert 700_000 < auc < 950_000


def test_pr_curve_matches_per_threshold_loop(ray_session):
    from ferenda_ray.pipelines.queries import lineitem_pr_curve

    out = _to_pd(lineitem_pr_curve(SF)).set_index("threshold")
    s, y = _scores_labels()
    for t in sorted(set(s)):
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        fn = int((~pred & (y == 1)).sum())
        row = out.loc[t]
        assert (int(row["tp"]), int(row["fp"]), int(row["fn"])) == \
            (tp, fp, fn)
        assert int(row["f1_permille"]) == 2000 * tp // (2 * tp + fp + fn)
    # monotone: recall non-increasing in threshold
    rec = out.sort_index()["recall_permille"].to_numpy()
    assert (np.diff(rec) <= 0).all()


def test_chi2_matches_dense_contingency(ray_session):
    """Per-type chi² == a dict-based dense-margin recomputation, and
    the conservation property: every (type, hour) cell of the cross
    appears exactly once including zero-observed cells."""
    from ferenda_ray.pipelines.queries import events_chi2_independence

    out = _to_pd(events_chi2_independence(SF)).set_index("event_type")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["ts", "event_type"])
    hrs = (t["ts"].to_numpy().astype("datetime64[us]")
           .astype(np.int64) // 3_600_000_000) % 24
    types = t["event_type"].to_pylist()
    obs = {}
    for ty, h in zip(types, hrs):  # per-row loop
        obs[(ty, int(h))] = obs.get((ty, int(h)), 0) + 1
    rm, cm = {}, {}
    for (ty, h), n in obs.items():
        rm[ty] = rm.get(ty, 0) + n
        cm[h] = cm.get(h, 0) + n
    N = sum(rm.values())
    for ty, rn in rm.items():
        chi = 0
        for h, cn in cm.items():
            n = obs.get((ty, h), 0)
            dev = N * n - rn * cn
            chi += 1000 * dev * dev // (N * rn * cn)
        assert int(out.loc[ty, "chi2_milli"]) == chi
        assert int(out.loc[ty, "n_events"]) == rn


def test_jackknife_matches_group_loop(ray_session):
    from ferenda_ray.pipelines.queries import (MOM_GROUPS,
                                               orders_jackknife_variance)

    out = _to_pd(orders_jackknife_variance(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"])
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    groups = [int(hashlib.md5(str(int(k)).encode()).hexdigest()[:15],
                  16) % MOM_GROUPS
              for k in t["o_orderkey"].to_pylist()]
    sums = [0] * MOM_GROUPS
    ns = [0] * MOM_GROUPS
    for g, c in zip(groups, cents):
        sums[g] += int(c)
        ns[g] += 1
    N, S = sum(ns), sum(sums)
    thetas = [1000 * (S - s) // (N - n) for s, n in zip(sums, ns)]
    g = len(thetas)
    st, st2 = sum(thetas), sum(v * v for v in thetas)
    var = (g - 1) * (g * st2 - st * st) // (g * g)
    assert int(out["jk_var"]) == var
    assert int(out["jk_se_milli"]) == math.isqrt(var)
    assert int(out["max_influence_milli"]) == \
        max(abs(v - 1000 * S // N) for v in thetas)


def test_backtest_matches_daily_loop(ray_session):
    from ferenda_ray.pipelines.queries import orders_forecast_backtest

    out = _to_pd(orders_forecast_backtest(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    daily = {}
    for d, c in zip(days, cents):
        daily[int(d)] = daily.get(int(d), 0) + int(c)
    lo, hi = min(daily), max(daily)
    xs = [daily.get(d, 0) for d in range(lo, hi + 1)]
    e7 = sum(abs(xs[i] - xs[i - 7]) for i in range(7, len(xs)))
    e1 = sum(abs(xs[i] - xs[i - 1]) for i in range(7, len(xs)))
    n = len(xs) - 7
    assert int(out["n_days"]) == n
    assert int(out["mae7_cents"]) == e7 // n
    assert int(out["mae1_cents"]) == e1 // n
    assert int(out["skill_permille"]) == 1000 * e7 // max(e1, 1)


def test_transitivity_matches_set_enumeration(ray_session):
    """Transitivity == set-based triangle/wedge enumeration over the
    co-citation pairs recomputed from the planted citation arithmetic
    (doc_id % 3 / % 7 / % 5 families), and 0 ≤ C ≤ 1000."""
    from ferenda_ray.pipelines.queries import kg_transitivity

    out = _to_pd(kg_transitivity(SF)).iloc[0]
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id"])["doc_id"].to_pylist()
    targets = {}
    for did in docs:
        tg = set()
        if did % 3 == 0:
            tg.add("rfc/%d" % (100 + did % 900))
        if did % 7 == 0:
            tg.add("rfc/2616")
        if did % 5 == 1:
            tg.add("s/%d" % (did % 50))
        if tg:
            targets[did] = tg
    pairs = set()
    for tg in targets.values():
        st = sorted(tg)
        for i in range(len(st)):
            for j in range(i + 1, len(st)):
                pairs.add((st[i], st[j]))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tri = 0
    for a, b in pairs:
        tri += len(adj[a] & adj[b])  # each triangle counted 3× (per edge)
    tri //= 3
    assert int(out["n_edges"]) == len(pairs)
    assert int(out["n_nodes"]) == len(adj)
    assert int(out["n_wedges"]) == wedges
    assert int(out["n_triangles"]) == tri
    assert int(out["transitivity_permille"]) == \
        1000 * 3 * tri // max(wedges, 1)
    assert 0 <= int(out["transitivity_permille"]) <= 1000


def test_fano_matches_daily_dict_loop(ray_session):
    """Fano == the textbook Var/Mean over the dense calendar, computed
    per type with a per-row dict loop and float variance compared via
    the same floored-milli grid."""
    from ferenda_ray.pipelines.queries import events_fano_overdispersion

    out = _to_pd(events_fano_overdispersion(SF)).set_index("event_type")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["ts", "event_type"])
    days = (t["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64) // 86_400_000_000)
    per = {}
    for ty, d in zip(t["event_type"].to_pylist(), days):
        per.setdefault(ty, {})
        per[ty][int(d)] = per[ty].get(int(d), 0) + 1
    lo = int(days.min())
    hi = int(days.max())
    D = hi - lo + 1
    for ty, dd in per.items():
        xs = [dd.get(d, 0) for d in range(lo, hi + 1)]
        s, s2 = sum(xs), sum(v * v for v in xs)
        assert int(out.loc[ty, "fano_milli"]) == \
            1000 * (D * s2 - s * s) // (D * s)
        assert int(out.loc[ty, "n_days"]) == D
        assert int(out.loc[ty, "n_events"]) == s


def _cocite_pairs_brute():
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id"])["doc_id"].to_pylist()
    pairs = set()
    for did in docs:
        tg = set()
        if did % 3 == 0:
            tg.add("rfc/%d" % (100 + did % 900))
        if did % 7 == 0:
            tg.add("rfc/2616")
        if did % 5 == 1:
            tg.add("s/%d" % (did % 50))
        st = sorted(tg)
        for i in range(len(st)):
            for j in range(i + 1, len(st)):
                pairs.add((st[i], st[j]))
    return pairs


def test_assortativity_matches_edge_loop(ray_session):
    """Assortativity == a per-edge Python loop accumulating the five
    sufficient statistics, with the sanity bound |r²| ≤ 10⁶."""
    from ferenda_ray.pipelines.queries import kg_degree_assortativity

    out = _to_pd(kg_degree_assortativity(SF)).iloc[0]
    pairs = _cocite_pairs_brute()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n = sx = sxy = sx2 = 0
    for a, b in pairs:
        for x, y in ((deg[a], deg[b]), (deg[b], deg[a])):
            n += 1
            sx += x
            sxy += x * y
            sx2 += x * x
    num = n * sxy - sx * sx
    var = n * sx2 - sx * sx
    sgn = 1 if num >= 0 else -1
    assert int(out["n_endpoints"]) == n
    assert int(out["num"]) == num
    assert int(out["var"]) == var
    r2 = sgn * (1_000_000 * num * num // max(var * var, 1))
    assert int(out["assort_r2_ppm_signed"]) == r2
    assert abs(r2) <= 1_000_000


def test_cohort_ltv_matches_per_customer_loop(ray_session):
    """LTV cells == a per-order Python loop over dict state, plus the
    conservation property: Σ cents over cells == Σ order cents, and
    cum_cents is the within-cohort prefix sum."""
    from ferenda_ray.pipelines.queries import (LTV_MONTH_DAYS,
                                               customer_cohort_ltv)

    out = _to_pd(customer_cohort_ltv(SF))
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_custkey", "o_orderdate",
                               "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    cust = t["o_custkey"].to_pylist()
    first = {}
    for c, d in zip(cust, days):
        first[c] = min(first.get(c, 1 << 60), int(d))
    cells = {}
    for c, d, v in zip(cust, days, cents):
        y = int(np.int64(first[c]).astype("datetime64[D]")
                .astype("datetime64[Y]").astype(np.int64)) + 1970
        age = (int(d) - first[c]) // LTV_MONTH_DAYS
        k = (y, age)
        n, s = cells.get(k, (0, 0))
        cells[k] = (n + 1, s + int(v))
    sizes = {}
    for c, fd in first.items():
        y = int(np.int64(fd).astype("datetime64[D]")
                .astype("datetime64[Y]").astype(np.int64)) + 1970
        sizes[y] = sizes.get(y, 0) + 1
    assert len(out) == len(cells)
    assert int(out["cents"].sum()) == int(cents.sum())
    cum = {}
    for row in out.sort_values(["cohort_year", "age_month"]) \
                  .itertuples():
        k = (int(row.cohort_year), int(row.age_month))
        assert (int(row.n_orders), int(row.cents)) == cells[k]
        cum[k[0]] = cum.get(k[0], 0) + cells[k][1]
        assert int(row.cum_cents) == cum[k[0]]
        assert int(row.n_customers) == sizes[k[0]]
        assert int(row.ltv_cents) == cum[k[0]] // sizes[k[0]]


def test_price_index_matches_matched_basket_loop(ray_session):
    """Laspeyres/Paasche == a per-part dict recomputation on the same
    milli-price grid, and the identity: if every matched part's price
    ratio is r, both indices equal r (checked on the real data only
    via the Laspeyres-between-Paasche±spread sanity bound)."""
    from ferenda_ray.pipelines.queries import part_price_index

    out = _to_pd(part_price_index(SF)).iloc[0]
    t = pq.read_table(SF + "/lineitem.parquet",
                      columns=["l_partkey", "l_shipdate",
                               "l_quantity", "l_extendedprice"])
    days = (t["l_shipdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    mid = (int(days.min()) + int(days.max())) // 2
    cents = np.floor(t["l_extendedprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    acc = {}
    for k, d, c, q in zip(t["l_partkey"].to_pylist(), days,
                          cents, qty):
        h = 1 if int(d) > mid else 0
        cc, qq = acc.get((k, h), (0, 0))
        acc[(k, h)] = (cc + int(c), qq + int(q))
    parts = {k for (k, h) in acc if (k, 0) in acc and (k, 1) in acc}
    ln = ld = pn = pdn = 0
    for k in parts:
        c0, q0 = acc[(k, 0)]
        c1, q1 = acc[(k, 1)]
        p0, p1 = 1000 * c0 // q0, 1000 * c1 // q1
        ln += p1 * q0
        ld += p0 * q0
        pn += p1 * q1
        pdn += p0 * q1
    assert int(out["n_parts_both"]) == len(parts)
    assert int(out["laspeyres_milli"]) == 1000 * ln // max(ld, 1)
    assert int(out["paasche_milli"]) == 1000 * pn // max(pdn, 1)
    # prices are drawn stationary → both indices near 1000
    assert 800 < int(out["laspeyres_milli"]) < 1200


def test_rich_club_matches_set_recount(ray_session):
    """φ(k) ladder == a per-k set recount over the planted-arithmetic
    pairs, plus the structural property E_k ≤ C(N_k, 2)."""
    from ferenda_ray.pipelines.queries import kg_rich_club

    out = _to_pd(kg_rich_club(SF))
    pairs = _cocite_pairs_brute()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for row in out.itertuples():
        k = int(row.k)
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in pairs if a in club and b in club)
        assert int(row.n_nodes) == len(club)
        assert int(row.n_edges) == ek
        assert ek <= len(club) * (len(club) - 1) // 2
        assert int(row.phi_permille) == \
            1000 * 2 * ek // (len(club) * (len(club) - 1))


def test_blocking_quality_matches_direct_count(ray_session):
    """Recall/reduction == direct recounts: truth pairs from the
    zero-padded-name structure (edit-1 on equal-length names ==
    single-digit substitution == |a−b| a power-of-ten digit swap),
    candidates from the //1000 block census."""
    from ferenda_ray.pipelines.queries import er_blocking_quality

    out = _to_pd(er_blocking_quality(SF)).iloc[0]
    keys = pq.read_table(SF + "/customer.parquet",
                         columns=["c_custkey"])["c_custkey"] \
        .to_pylist()
    names = {k: "Customer#%09d" % k for k in keys}
    truth = []
    ks = sorted(keys)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            diff = sum(x != y for x, y in zip(names[a], names[b]))
            if diff <= 1:
                truth.append((a, b))
    cap = sum(1 for a, b in truth if a // 1000 == b // 1000)
    assert int(out["n_truth_pairs"]) == len(truth)
    assert int(out["n_captured"]) == cap
    assert int(out["recall_permille"]) == 1000 * cap // len(truth)
    blocks = {}
    for k in keys:
        blocks[k // 1000] = blocks.get(k // 1000, 0) + 1
    cand = sum(n * (n - 1) // 2 for n in blocks.values())
    assert int(out["n_candidates"]) == cand
    n = len(keys)
    assert int(out["reduction_permille"]) == \
        1000 * (n * (n - 1) // 2 - cand) // (n * (n - 1) // 2)


def test_touch_attribution_matches_per_purchase_loop(ray_session):
    """Attribution == a per-purchase Python loop with bisect windows,
    plus conservation: Σ first_touch == Σ last_touch == n_purchases
    (every purchase lands in exactly one first/last channel or
    '(none)')."""
    from ferenda_ray.pipelines.queries import (ATTR_WINDOW_US,
                                               events_touch_attribution)

    out = _to_pd(events_touch_attribution(SF)).set_index("channel")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["event_id", "ts", "user_id",
                               "event_type"])
    ts = (t["ts"].to_numpy().astype("datetime64[us]")
          .astype(np.int64))
    rows = sorted(zip(t["user_id"].to_pylist(), ts,
                      t["event_id"].to_pylist(),
                      t["event_type"].to_pylist()),
                  key=lambda r: (r[0], int(r[1]), r[2]))
    touches = {}
    purchases = []
    for u, tt, eid, ch in rows:
        if ch in ("view", "click"):
            touches.setdefault(u, []).append((int(tt), eid, ch))
        elif ch == "purchase":
            purchases.append((u, int(tt)))
    cells = {}

    def bump(ch, col, v=1):
        cells.setdefault(ch, [0, 0, 0])[col] += v

    for u, pt in purchases:
        win = [x for x in touches.get(u, [])
               if pt - ATTR_WINDOW_US <= x[0] < pt]
        if not win:
            bump("(none)", 0)
            bump("(none)", 1)
            continue
        win.sort()
        bump(win[0][2], 0)
        bump(win[-1][2], 1)
        for _, _, ch in win:
            bump(ch, 2, 1000 // len(win))
    for ch, (f, l, s) in cells.items():
        assert int(out.loc[ch, "first_touch"]) == f
        assert int(out.loc[ch, "last_touch"]) == l
        assert int(out.loc[ch, "linear_permille"]) == s
    assert int(out["first_touch"].sum()) == len(purchases)
    assert int(out["last_touch"].sum()) == len(purchases)


def test_fairness_audit_matches_per_row_loop(ray_session):
    """Per-group rates == a per-row dict loop, plus conservation:
    group sizes sum to the table size and every rate ∈ [0, 1000]."""
    from ferenda_ray.pipelines.queries import (FAIR_THRESHOLD,
                                               lineitem_fairness_audit)

    out = _to_pd(lineitem_fairness_audit(SF)).set_index("grp")
    t = pq.read_table(SF + "/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey",
                               "l_returnflag"])
    agg = {}
    for ok, sk, rf in zip(t["l_orderkey"].to_pylist(),
                          t["l_suppkey"].to_pylist(),
                          t["l_returnflag"].to_pylist()):
        g = sk % 5
        y = 1 if rf == "R" else 0
        yh = 1 if 8 * y + ok % 20 >= FAIR_THRESHOLD else 0
        n, sel, tp, pos, fp = agg.get(g, (0, 0, 0, 0, 0))
        agg[g] = (n + 1, sel + yh, tp + y * yh, pos + y,
                  fp + (1 - y) * yh)
    for g, (n, sel, tp, pos, fp) in agg.items():
        row = out.loc[g]
        assert int(row["n"]) == n
        assert int(row["selection_permille"]) == 1000 * sel // n
        assert int(row["tpr_permille"]) == 1000 * tp // pos
        assert int(row["fpr_permille"]) == 1000 * fp // (n - pos)
    assert int(out["n"].sum()) == len(t)
    for c in ("selection_permille", "tpr_permille", "fpr_permille"):
        assert out[c].between(0, 1000).all()


def test_conformal_guarantee_holds(ray_session):
    """The conformal threshold == a full-sort order statistic over
    the calibration positives, and the marginal guarantee holds on
    the exchangeable eval set: coverage ≥ 1000 − α (up to the
    discrete-grid step, checked exactly via the recount)."""
    from ferenda_ray.pipelines.queries import (
        CONFORMAL_ALPHA_PERMILLE, lineitem_conformal_threshold)

    out = _to_pd(lineitem_conformal_threshold(SF)).iloc[0]
    t = pq.read_table(SF + "/lineitem.parquet",
                      columns=["l_orderkey", "l_returnflag"])
    cal_u, ev_pos_u, ev_neg_u = [], [], []
    for ok, rf in zip(t["l_orderkey"].to_pylist(),
                      t["l_returnflag"].to_pylist()):
        y = 1 if rf == "R" else 0
        u = 27 - (8 * y + ok % 20)
        if ok // 20 % 4 == 0:
            if y:
                cal_u.append(u)
        elif y:
            ev_pos_u.append(u)
        else:
            ev_neg_u.append(u)
    cal_u.sort()
    n = len(cal_u)
    rank = -(-(n + 1) * (1000 - CONFORMAL_ALPHA_PERMILLE) // 1000)
    q = cal_u[min(rank, n) - 1]
    assert int(out["n_cal"]) == n
    assert int(out["q_hat"]) == q
    cov = 1000 * sum(1 for u in ev_pos_u if u <= q) // len(ev_pos_u)
    assert int(out["coverage_permille"]) == cov
    assert cov >= 1000 - CONFORMAL_ALPHA_PERMILLE  # the guarantee
    cap = 1000 * sum(1 for u in ev_neg_u if u <= q) // len(ev_neg_u)
    assert int(out["neg_capture_permille"]) == cap
    assert cap < cov  # the set is informative, not vacuous


def test_cuped_matches_per_user_loop(ray_session):
    """CUPED statistics == a per-event dict loop, with the Cauchy-
    Schwarz bound var_reduction ≤ 10⁶ and θ_den > 0."""
    from ferenda_ray.pipelines.queries import events_cuped_reduction

    out = _to_pd(events_cuped_reduction(SF)).iloc[0]
    t = pq.read_table(SF + "/events.parquet",
                      columns=["ts", "user_id", "value"])
    ts = (t["ts"].to_numpy().astype("datetime64[us]")
          .astype(np.int64))
    mid = (int(ts.min()) + int(ts.max())) // 2
    vals = np.floor(t["value"].to_numpy() + 0.5).astype(np.int64)
    acc = {}
    for u, tt, v in zip(t["user_id"].to_pylist(), ts, vals):
        x, y = acc.get(u, (0, 0))
        if int(tt) <= mid:
            x += int(v)
        else:
            y += int(v)
        acc[u] = (x, y)
    n = len(acc)
    sx = sum(x for x, _ in acc.values())
    sy = sum(y for _, y in acc.values())
    sxy = sum(x * y for x, y in acc.values())
    sx2 = sum(x * x for x, _ in acc.values())
    sy2 = sum(y * y for _, y in acc.values())
    num = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    assert int(out["n_users"]) == n
    assert int(out["theta_num"]) == num
    assert int(out["theta_den"]) == vx
    r2 = 1_000_000 * num * num // max(vx * vy, 1)
    assert int(out["var_reduction_ppm"]) == r2
    assert 0 <= r2 <= 1_000_000 and vx > 0


def test_srm_matches_direct_assignment(ray_session):
    """SRM == the direct md5 assignment recount; on an honest
    assignment the flag must be 0 (the audit passing IS the
    result)."""
    from ferenda_ray.pipelines.queries import events_srm_check

    out = _to_pd(events_srm_check(SF)).iloc[0]
    users = set(pq.read_table(SF + "/events.parquet",
                              columns=["user_id"])["user_id"]
                .to_pylist())
    arms = [int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15],
                16) % 2 for u in users]
    n1 = sum(arms)
    n0 = len(arms) - n1
    assert (int(out["n_arm0"]), int(out["n_arm1"])) == (n0, n1)
    chi2 = 1000 * (n0 - n1) ** 2 // (n0 + n1)
    assert int(out["srm_chi2_milli"]) == chi2
    assert int(out["srm_flag"]) == (1 if chi2 > 3841 else 0)
    assert int(out["srm_flag"]) == 0


def test_duplicate_payments_recall_is_total(ray_session):
    """Every planted clone differs from its original by exactly
    (key +10⁹, day +1) with identical custkey/cents, so the detector
    must reach recall ≥ 1000‰ (clone pairs ≥ planted; natural pairs
    measured zero on this synthesizer)."""
    from ferenda_ray.pipelines.queries import (DUP_PAY_PLANT_MOD,
                                               orders_duplicate_payments)

    out = _to_pd(orders_duplicate_payments(SF)).iloc[0]
    keys = pq.read_table(SF + "/orders.parquet",
                         columns=["o_orderkey"])["o_orderkey"] \
        .to_pylist()
    planted = sum(1 for k in keys if k % DUP_PAY_PLANT_MOD == 0)
    assert int(out["n_planted"]) == planted
    assert int(out["recall_permille"]) >= 1000
    assert int(out["n_natural_pairs"]) == 0
    assert int(out["n_pairs"]) >= planted


def test_sketch_audit_matches_full_sort(ray_session):
    """Exact quantiles == full-sort order statistics; the sketch
    estimate must sit inside the crossing bin (|est − exact| <
    bin width) and err_ppm must replay from the two columns."""
    from ferenda_ray.pipelines.queries import (
        SKETCH_BINS, orders_quantile_sketch_audit)

    out = _to_pd(orders_quantile_sketch_audit(SF))
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_totalprice"])
    cents = np.sort(np.floor(t["o_totalprice"].to_numpy() * 100.0
                             + 0.5).astype(np.int64))
    n = len(cents)
    lo, hi = int(cents[0]), int(cents[-1])
    width = max((hi - lo + SKETCH_BINS) // SKETCH_BINS, 1)
    for row in out.itertuples():
        rank = -(-int(row.q_permille) * n // 1000)
        assert int(row.exact_cents) == int(cents[rank - 1])
        assert abs(int(row.sketch_cents) - int(row.exact_cents)) \
            <= width
        assert int(row.err_ppm) == 1_000_000 * abs(
            int(row.sketch_cents) - int(row.exact_cents)) \
            // int(row.exact_cents)


def test_theil_sen_matches_pairwise_median(ray_session):
    """The grid median == an O(D²) per-pair Python recomputation,
    and robustness: Theil-Sen of the zero-densified daily series
    ignores a single planted spike that moves the mean slope."""
    from ferenda_ray.pipelines.queries import (TS_GRID_SHIFT,
                                               orders_theil_sen_trend)

    out = _to_pd(orders_theil_sen_trend(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    daily = {}
    for d, c in zip(days, cents):
        daily[int(d)] = daily.get(int(d), 0) + int(c)
    lo, hi = min(daily), max(daily)
    xs = [daily.get(d, 0) for d in range(lo, hi + 1)]
    keys = []
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            dc = xs[j] - xs[i]
            sgn = 1 if dc >= 0 else -1
            keys.append(sgn * ((abs(dc) << TS_GRID_SHIFT)
                               // (j - i)))
    keys.sort()
    m = len(keys)
    assert int(out["n_days"]) == len(xs)
    assert int(out["n_pairs"]) == m
    assert int(out["slope_q20"]) == keys[(m + 1) // 2 - 1]


def test_leadtime_matches_full_sort(ray_session):
    """Per-priority lead stats == full-sort order statistics over a
    per-order dict recomputation, plus p90 ≥ median and conservation:
    Σ n_orders == orders with ≥1 lineitem."""
    from ferenda_ray.pipelines.queries import orders_fulfillment_leadtime

    out = _to_pd(orders_fulfillment_leadtime(SF)).set_index("priority")
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"])
    od = pq.read_table(SF + "/orders.parquet",
                       columns=["o_orderkey", "o_orderdate",
                                "o_orderpriority"])
    ship = {}
    sdays = (li["l_shipdate"].to_numpy().astype("datetime64[D]")
             .astype(np.int64))
    for k, d in zip(li["l_orderkey"].to_pylist(), sdays):
        ship[k] = min(ship.get(k, 1 << 60), int(d))
    odays = (od["o_orderdate"].to_numpy().astype("datetime64[D]")
             .astype(np.int64))
    per_pri = {}
    for k, d, p in zip(od["o_orderkey"].to_pylist(), odays,
                       od["o_orderpriority"].to_pylist()):
        if k in ship:
            per_pri.setdefault(p, []).append(ship[k] - int(d))
    for p, leads in per_pri.items():
        leads.sort()
        n = len(leads)
        row = out.loc[p]
        assert int(row["n_orders"]) == n
        assert int(row["median_days"]) == leads[(n + 1) // 2 - 1]
        assert int(row["p90_days"]) == leads[(9 * n + 9) // 10 - 1]
        assert int(row["max_days"]) == leads[-1]
        assert int(row["p90_days"]) >= int(row["median_days"])
    assert int(out["n_orders"].sum()) == len(ship)


def test_l_diversity_matches_dict_census(ray_session):
    """l-diversity census == a per-row dict recount, plus the
    subset property: rows_at_risk ≤ total rows and min_diversity ≥ 1."""
    from ferenda_ray.pipelines.queries import (KANON_BAND, LDIV_L,
                                               doc_l_diversity)

    out = _to_pd(doc_l_diversity(SF)).iloc[0]
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["source", "lang", "n_chars"])
    groups = {}
    for s, l, nc in zip(t["source"].to_pylist(),
                        t["lang"].to_pylist(),
                        t["n_chars"].to_pylist()):
        k = (s, nc // KANON_BAND)
        langs, n = groups.get(k, (set(), 0))
        langs.add(l)
        groups[k] = (langs, n + 1)
    low = [(len(ls), n) for ls, n in groups.values()
           if len(ls) < LDIV_L]
    assert int(out["n_groups"]) == len(groups)
    assert int(out["low_div_groups"]) == len(low)
    assert int(out["rows_at_risk"]) == sum(n for _, n in low)
    assert int(out["min_diversity"]) == \
        min(len(ls) for ls, _ in groups.values())
    assert int(out["rows_at_risk"]) <= len(t)
    assert int(out["min_diversity"]) >= 1


def test_dow_anova_matches_moment_loop(ray_session):
    """η² == a per-row Python-int moment recomputation, bounded in
    [0, 1000]; on this uniform synthesizer the weekday explains
    ~nothing (η² ≤ 10‰)."""
    from ferenda_ray.pipelines.queries import orders_dow_anova

    out = _to_pd(orders_dow_anova(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    acc = {}
    for d, c in zip(days, cents):
        a = acc.setdefault(int(d) % 7, [0, 0, 0])
        a[0] += 1
        a[1] += int(c)
        a[2] += int(c) * int(c)
    N = sum(a[0] for a in acc.values())
    S = sum(a[1] for a in acc.values())
    sx2 = sum(a[2] for a in acc.values())
    num = sum(N * a[1] * a[1] // a[0] for a in acc.values()) - S * S
    den = N * sx2 - S * S
    eta = 1000 * num // den
    assert int(out["n_orders"]) == N
    assert int(out["eta2_permille"]) == eta
    assert 0 <= eta <= 10


def test_runs_test_matches_sequential_loop(ray_session):
    """Runs count == a day-by-day Python loop over the dense series,
    with the partition identity n_pos + n_neg == days not at the
    median and 1 ≤ R ≤ n."""
    from ferenda_ray.pipelines.queries import orders_runs_test

    out = _to_pd(orders_runs_test(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    daily = {}
    for d, c in zip(days, cents):
        daily[int(d)] = daily.get(int(d), 0) + int(c)
    lo, hi = min(daily), max(daily)
    xs = [daily.get(d, 0) for d in range(lo, hi + 1)]
    med = sorted(xs)[(len(xs) + 1) // 2 - 1]
    signs = [1 if v > med else 0 for v in xs if v != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    npos = sum(signs)
    n = len(signs)
    assert int(out["n_days_used"]) == n
    assert int(out["n_runs"]) == runs
    assert int(out["n_pos"]) == npos
    assert int(out["n_neg"]) == n - npos
    e = runs * n - (n + 2 * npos * (n - npos))
    den = 2 * npos * (n - npos) * (2 * npos * (n - npos) - n)
    # sf0.001's sparse calendar has median day = 0 revenue, so one
    # sign class can be empty — the query guards den with max(.., 1)
    assert int(out["z2_milli"]) == \
        1000 * e * e * (n - 1) // max(den, 1)
    assert 1 <= runs <= n


def test_power_analysis_matches_moment_loop(ray_session):
    """Sample size == a Python-int moment recomputation, plus the
    scaling law: doubling the MDE must cut n_required ~4× (checked
    via the closed form on the same moments)."""
    from ferenda_ray.pipelines.queries import (POWER_Z_SUM_MILLI,
                                               events_power_analysis)

    out = _to_pd(events_power_analysis(SF)).iloc[0]
    t = pq.read_table(SF + "/events.parquet", columns=["value"])
    v = np.floor(t["value"].to_numpy() + 0.5).astype(np.int64)
    n = len(v)
    s = int(v.sum())
    s2 = sum(int(x) * int(x) for x in v)
    mean_milli = 1000 * s // n
    var_milli2 = 1_000_000 * (n * s2 - s * s) // (n * n)
    delta = mean_milli // 20
    den = 1_000_000 * delta * delta
    num = 2 * POWER_Z_SUM_MILLI ** 2 * var_milli2
    assert int(out["n_events"]) == n
    assert int(out["mean_milli"]) == mean_milli
    assert int(out["var_milli2"]) == var_milli2
    assert int(out["delta_milli"]) == delta
    assert int(out["n_required_per_arm"]) == (num + den - 1) // den
    n2 = (num + 1_000_000 * (2 * delta) ** 2 - 1) \
        // (1_000_000 * (2 * delta) ** 2)
    assert 3 * n2 <= int(out["n_required_per_arm"]) <= 4 * n2 + 4


def test_bot_census_matches_per_user_loop(ray_session):
    """CV² census == a per-user Python loop over sorted gaps, with
    conservation: Σ n_users == users with ≥2 positive-sum gaps."""
    from ferenda_ray.pipelines.queries import (BOT_CV2_FLAG_MILLI,
                                               user_bot_score_census)

    out = _to_pd(user_bot_score_census(SF)).set_index("band")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["user_id", "ts"])
    ts = (t["ts"].to_numpy().astype("datetime64[us]")
          .astype(np.int64))
    per = {}
    for u, x in zip(t["user_id"].to_pylist(), ts):
        per.setdefault(u, []).append(int(x))
    cells = {}
    scored = 0
    for u, xs in per.items():
        xs.sort()
        gaps = [(b - a) // 1_000_000
                for a, b in zip(xs, xs[1:])]
        k = len(gaps)
        s = sum(gaps)
        if k < 2 or s <= 0:
            continue
        scored += 1
        s2 = sum(g * g for g in gaps)
        cv2 = 1000 * (k * s2 - s * s) // (s * s)
        band = min(cv2 // 100, 50)
        n, f = cells.get(band, (0, 0))
        cells[band] = (n + 1, f + (1 if cv2 < BOT_CV2_FLAG_MILLI
                                   else 0))
    for band, (n, f) in cells.items():
        assert int(out.loc[band, "n_users"]) == n
        assert int(out.loc[band, "n_flagged"]) == f
    assert int(out["n_users"].sum()) == scored


def test_brand_shift_matches_dict_loop(ray_session):
    """Share shift == a per-row dict recomputation, with the
    zero-sum property: Σ shares per half ≈ 1000 (floor slack < #brands)
    and Σ shift ∈ (−25, 25)."""
    from ferenda_ray.pipelines.queries import brand_share_shift

    out = _to_pd(brand_share_shift(SF)).set_index("brand")
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_partkey", "l_shipdate",
                                "l_extendedprice"])
    part = pq.read_table(SF + "/part.parquet",
                         columns=["p_partkey", "p_brand"])
    bm = dict(zip(part["p_partkey"].to_pylist(),
                  part["p_brand"].to_pylist()))
    days = (li["l_shipdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    mid = (int(days.min()) + int(days.max())) // 2
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    acc = {}
    tot = [0, 0]
    for k, d, c in zip(li["l_partkey"].to_pylist(), days, cents):
        h = 1 if int(d) > mid else 0
        b = bm[k]
        cur = acc.setdefault(b, [0, 0])
        cur[h] += int(c)
        tot[h] += int(c)
    for b, (c0, c1) in acc.items():
        s0 = 1000 * c0 // tot[0]
        s1 = 1000 * c1 // tot[1]
        row = out.loc[b]
        assert int(row["share_before_permille"]) == s0
        assert int(row["share_after_permille"]) == s1
        assert int(row["shift_permille"]) == s1 - s0
    for col in ("share_before_permille", "share_after_permille"):
        assert 1000 - len(out) < int(out[col].sum()) <= 1000
    assert abs(int(out["shift_permille"].sum())) < len(out)


def test_gini_matches_pairwise_brute_force(ray_session):
    """Binned Gini == the O(n²) pairwise |x_a − x_b| definition over
    the banded per-customer revenues (neither engine touches pairs)."""
    from ferenda_ray.pipelines.queries import (GINI_BAND_CENTS,
                                               customer_revenue_gini)

    out = _to_pd(customer_revenue_gini(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_custkey", "o_totalprice"])
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    rev = {}
    for k, c in zip(t["o_custkey"].to_pylist(), cents):
        rev[k] = rev.get(k, 0) + int(c)
    bands = [v // GINI_BAND_CENTS for v in rev.values()]
    n = len(bands)
    num = 0
    for i in range(n):
        for j in range(n):
            num += abs(bands[i] - bands[j])
    num //= 2
    gini = 1000 * num // max(n * sum(bands), 1)
    assert int(out["n_customers"]) == n
    assert int(out["gini_permille"]) == gini
    assert 0 < gini < 1000  # non-degenerate inequality


def test_fertility_structural_properties(ray_session):
    """Fertility bounds and conservation (the SQL oracle already
    replays BPE independently; this pins the invariants): every
    lang's fertility ∈ [1000, 1000·max_word_len], token count ≥ word
    count, and Σ n_words == the corpus whitespace-token count."""
    import re

    from ferenda_ray.pipelines.queries import lang_tokenizer_fertility

    out = _to_pd(lang_tokenizer_fertility(SF))
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["text", "lang"])
    words = {}
    maxlen = 0
    for lang, text in zip(t["lang"].to_pylist(),
                          t["text"].to_pylist()):
        ws = re.findall(r"\S+", text or "")
        words[lang] = words.get(lang, 0) + len(ws)
        maxlen = max([maxlen] + [len(w) for w in ws])
    for row in out.itertuples():
        assert int(row.n_words) == words[row.lang]
        assert int(row.n_bpe_tokens) >= int(row.n_words)
        assert 1000 <= int(row.fertility_milli) <= 1000 * maxlen
    assert int(out["n_words"].sum()) == sum(words.values())


def test_stl_strength_matches_sequential_decomposition(ray_session):
    """The decomposition == a day-by-day Python recomputation of
    trend → seasonal → remainder on the same declared grids, and
    0 ≤ F_s ≤ 1000."""
    from ferenda_ray.pipelines.queries import orders_stl_strength

    out = _to_pd(orders_stl_strength(SF)).iloc[0]
    t = pq.read_table(SF + "/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])
    days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    daily = {}
    for d, c in zip(days, cents):
        daily[int(d)] = daily.get(int(d), 0) + int(c)
    lo, hi = min(daily), max(daily)
    xs = [daily.get(d, 0) for d in range(lo, hi + 1)]
    rs, dows = [], []
    for i in range(3, len(xs) - 3):
        trend = sum(xs[i - 3:i + 4]) // 7
        rs.append(xs[i] - trend)
        dows.append((lo + i) % 7)
    sw = {}
    for w in range(7):
        vals = [r for r, d in zip(rs, dows) if d == w]
        tot = sum(vals)
        sgn = 1 if tot >= 0 else -1
        sw[w] = sgn * (abs(tot) // len(vals)) if vals else 0
    es = [r - sw[d] for r, d in zip(rs, dows)]
    n = len(rs)
    vr = n * sum(v * v for v in rs) - sum(rs) ** 2
    ve = n * sum(v * v for v in es) - sum(es) ** 2
    strength = max(0, 1000 - 1000 * ve // max(vr, 1))
    assert int(out["n_days_used"]) == n
    assert int(out["strength_permille"]) == strength
    assert int(out["seasonal_amplitude_cents"]) == \
        max(sw.values()) - min(sw.values())
    assert 0 <= strength <= 1000


def test_component_census_matches_union_find(ray_session):
    """Census == a plain union-find over the planted-arithmetic
    pairs (an algorithm neither engine uses), plus the HHI bound:
    giant_share² ≤ HHI ≤ giant_share·1000 (in ppm terms)."""
    from ferenda_ray.pipelines.queries import kg_component_census

    out = _to_pd(kg_component_census(SF)).iloc[0]
    pairs = _cocite_pairs_brute()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    deg = {}
    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        parent[find(a)] = find(b)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    comp = {}
    for n, d in deg.items():
        comp[find(n)] = comp.get(find(n), 0) + d
    total = sum(comp.values())
    mx = max(comp.values())
    hhi = 1_000_000 * sum(v * v for v in comp.values()) \
        // (total * total)
    assert int(out["n_components"]) == len(comp)
    assert int(out["giant_share_permille"]) == 1000 * mx // total
    assert int(out["fragmentation_hhi_ppm"]) == hhi
    gs = int(out["giant_share_permille"])
    assert gs * gs <= hhi + 1 and hhi <= gs * 1000 + 1000


def test_purchase_dispersion_matches_dict_loop(ray_session):
    """Histogram + dispersion == a per-order dict recount, with the
    customer-count conservation and the over-dispersion check the
    statistic exists for."""
    from ferenda_ray.pipelines.queries import customer_purchase_dispersion

    out = _to_pd(customer_purchase_dispersion(SF))
    t = pq.read_table(SF + "/orders.parquet", columns=["o_custkey"])
    counts = {}
    for c in t["o_custkey"].to_pylist():
        counts[c] = counts.get(c, 0) + 1
    hist = {}
    for k in counts.values():
        hist[k] = hist.get(k, 0) + 1
    n = len(counts)
    s = sum(counts.values())
    s2 = sum(k * k for k in counts.values())
    d = 1000 * (n * s2 - s * s) // (n * s)
    assert len(out) == len(hist)
    for row in out.itertuples():
        assert hist[int(row.k)] == int(row.n_customers)
        assert int(row.dispersion_milli) == d
    assert int(out["n_customers"].sum()) == n


def test_markup_census_matches_per_line_loop(ray_session):
    """Band census == a per-line recomputation on the same grids,
    with line-count conservation."""
    from ferenda_ray.pipelines.queries import (MARKUP_BAND_PERMILLE,
                                               part_markup_census)

    out = _to_pd(part_markup_census(SF)).set_index("band")
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_partkey", "l_quantity",
                                "l_extendedprice"])
    part = pq.read_table(SF + "/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    rp = {k: int(round(v * 1000))
          for k, v in zip(part["p_partkey"].to_pylist(),
                          part["p_retailprice"].to_pylist())}
    cells = {}
    for k, q, e in zip(li["l_partkey"].to_pylist(),
                       li["l_quantity"].to_pylist(),
                       li["l_extendedprice"].to_pylist()):
        unit = 10 * int(np.floor(e * 100 + 0.5)) \
            // max(int(np.floor(q + 0.5)), 1)
        band = min(1000 * unit // max(rp[k], 1)
                   // MARKUP_BAND_PERMILLE, 30)
        cells[band] = cells.get(band, 0) + 1
    for band, nl in cells.items():
        assert int(out.loc[band, "n_lines"]) == nl
    assert int(out["n_lines"].sum()) == len(li)


def test_sla_compliance_matches_dict_join(ray_session):
    """Band census == a dict-join recount per line, with supplier
    and line conservation across bands."""
    from ferenda_ray.pipelines.queries import (SLA_BAND_PERMILLE,
                                               SLA_DAYS,
                                               supplier_sla_compliance)

    out = _to_pd(supplier_sla_compliance(SF)).set_index("band")
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey",
                                "l_shipdate"])
    od = pq.read_table(SF + "/orders.parquet",
                       columns=["o_orderkey", "o_orderdate"])
    odays = dict(zip(od["o_orderkey"].to_pylist(),
                     od["o_orderdate"].to_numpy()
                     .astype("datetime64[D]").astype(np.int64)))
    ship = (li["l_shipdate"].to_numpy().astype("datetime64[D]")
            .astype(np.int64))
    per = {}
    for k, s, d in zip(li["l_orderkey"].to_pylist(),
                       li["l_suppkey"].to_pylist(), ship):
        n, ok = per.get(s, (0, 0))
        per[s] = (n + 1,
                  ok + (1 if int(d) - int(odays[k]) <= SLA_DAYS
                        else 0))
    cells = {}
    for s, (n, ok) in per.items():
        band = min(1000 * ok // n // SLA_BAND_PERMILLE, 10)
        ns, nl = cells.get(band, (0, 0))
        cells[band] = (ns + 1, nl + n)
    for band, (ns, nl) in cells.items():
        assert int(out.loc[band, "n_suppliers"]) == ns
        assert int(out.loc[band, "n_lines"]) == nl
    assert int(out["n_suppliers"].sum()) == len(per)
    assert int(out["n_lines"].sum()) == len(li)


def test_cm_error_audit_one_sided_and_exact(ray_session):
    """Count-Min's contract: every error ≥ 0 (a negative error means
    the sketch is broken), and the histogram == a dict rebuild of the
    sketch probed per user (sf0.001's 15 users over width 64 collide
    nowhere, so the audit must report ALL-exact there — the scale
    where it bites is sf0.01, covered by the oracle)."""
    from ferenda_ray.pipelines.queries import (CM_DEPTH, _cm_col,
                                               cm_error_audit)

    out = _to_pd(cm_error_audit(SF))
    t = pq.read_table(SF + "/events.parquet", columns=["user_id"])
    truth = {}
    for u in t["user_id"].to_pylist():
        truth[u] = truth.get(u, 0) + 1
    cells = {}
    for u, n in truth.items():
        for r in range(CM_DEPTH):
            k = (r, _cm_col(r, u))
            cells[k] = cells.get(k, 0) + n
    hist = {}
    for u, n in truth.items():
        est = min(cells[(r, _cm_col(r, u))] for r in range(CM_DEPTH))
        hist[est - n] = hist.get(est - n, 0) + 1
    assert (out["err"] >= 0).all()
    assert len(out) == len(hist)
    for row in out.itertuples():
        assert hist[int(row.err)] == int(row.n_users)
    assert int(out["n_users"].sum()) == len(truth)


def test_gap_audit_matches_full_sort(ray_session):
    """Gap audit == a full-sort diff recount (the machinery the
    distributed range-bucket decomposition exists to avoid), plus
    span conservation n_keys + n_missing == span."""
    from ferenda_ray.pipelines.queries import orderkey_gap_audit

    out = _to_pd(orderkey_gap_audit(SF)).iloc[0]
    keys = sorted(set(pq.read_table(SF + "/orders.parquet",
                                    columns=["o_orderkey"])
                      ["o_orderkey"].to_pylist()))
    diffs = [b - a for a, b in zip(keys, keys[1:])]
    assert int(out["n_keys"]) == len(keys)
    assert int(out["span"]) == keys[-1] - keys[0] + 1
    assert int(out["n_missing"]) == \
        keys[-1] - keys[0] + 1 - len(keys)
    assert int(out["max_gap"]) == (max(diffs) if diffs else 0)
    assert int(out["n_gaps"]) == sum(1 for d in diffs if d > 1)
    assert int(out["n_keys"]) + int(out["n_missing"]) == \
        int(out["span"])


def test_stickiness_matches_set_loop(ray_session):
    """DAU/WAU == per-day set recomputation, with the structural
    bounds DAU ≤ WAU and 0 < stickiness ≤ 1000."""
    from ferenda_ray.pipelines.queries import events_stickiness_ratio

    out = _to_pd(events_stickiness_ratio(SF)).set_index("day")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["user_id", "ts"])
    days = (t["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64) // 86_400_000_000)
    by_day = {}
    for u, d in zip(t["user_id"].to_pylist(), days):
        by_day.setdefault(int(d), set()).add(u)
    lo = min(by_day)
    for day, row in out.iterrows():
        dau = len(by_day.get(day, set()))
        wau = len(set().union(*(by_day.get(d, set())
                                for d in range(day - 6, day + 1))))
        assert int(row["dau"]) == dau
        assert int(row["wau"]) == wau
        assert int(row["stickiness_permille"]) == 1000 * dau // wau
        assert dau <= wau
        assert 0 < int(row["stickiness_permille"]) <= 1000
    assert out.index.min() == lo + 6


def test_slo_burn_matches_daily_loop(ray_session):
    """Burn rates == a per-day dict recount; the cumulative column
    is monotone-smoothing (ends at the all-time rate) and the error
    type's ~20% share makes the audit read ~20x budget — asserted."""
    from ferenda_ray.pipelines.queries import (
        SLO_ERROR_BUDGET_PERMILLE, events_slo_burn_rate)

    out = _to_pd(events_slo_burn_rate(SF))
    t = pq.read_table(SF + "/events.parquet",
                      columns=["ts", "event_type"])
    days = (t["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64) // 86_400_000_000)
    acc = {}
    for d, ty in zip(days, t["event_type"].to_pylist()):
        n, e = acc.get(int(d), (0, 0))
        acc[int(d)] = (n + 1, e + (1 if ty == "error" else 0))
    b = SLO_ERROR_BUDGET_PERMILLE
    cum_n = cum_e = 0
    for row in out.sort_values("day").itertuples():
        n, e = acc[int(row.day)]
        assert (int(row.n), int(row.n_err)) == (n, e)
        assert int(row.burn_milli) == 1_000_000 * e // (n * b)
        cum_n += n
        cum_e += e
        assert int(row.cum_budget_used_milli) == \
            1_000_000 * cum_e // (cum_n * b)
    # the synthetic ~20% error share burns ~20x the 1% budget
    assert int(out["cum_budget_used_milli"].iloc[-1]) > 10_000
    assert len(out) == len(acc)


def test_brand_return_rate_matches_dict_loop(ray_session):
    """Rates == a per-line dict recount; deltas sum near zero and
    line counts conserve."""
    from ferenda_ray.pipelines.queries import brand_return_rate

    out = _to_pd(brand_return_rate(SF)).set_index("brand")
    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_partkey", "l_returnflag"])
    part = pq.read_table(SF + "/part.parquet",
                         columns=["p_partkey", "p_brand"])
    bm = dict(zip(part["p_partkey"].to_pylist(),
                  part["p_brand"].to_pylist()))
    acc = {}
    for k, rf in zip(li["l_partkey"].to_pylist(),
                     li["l_returnflag"].to_pylist()):
        n, r = acc.get(bm[k], (0, 0))
        acc[bm[k]] = (n + 1, r + (1 if rf == "R" else 0))
    tot_n = sum(n for n, _ in acc.values())
    tot_r = sum(r for _, r in acc.values())
    glob = 1000 * tot_r // tot_n
    for b, (n, r) in acc.items():
        row = out.loc[b]
        assert (int(row["n"]), int(row["n_ret"])) == (n, r)
        assert int(row["rate_permille"]) == 1000 * r // n
        assert int(row["delta_permille"]) == 1000 * r // n - glob
    assert int(out["n"].sum()) == len(li)
    # per-brand deltas are UNWEIGHTED deviations from the global
    # rate, so they need not sum to zero across unequal brand sizes;
    # binomial noise stays well inside +-100 permille at these n
    assert out["delta_permille"].abs().max() < 100


def test_bounce_rate_matches_per_user_loop(ray_session):
    """Sessions/bounces == a per-user sequential loop with the same
    30-min rule; bounce rate bounded and session-count conservation
    against the sequential recount."""
    from ferenda_ray.pipelines.queries import (BOUNCE_GAP_US,
                                               events_bounce_rate)

    out = _to_pd(events_bounce_rate(SF)).set_index("day")
    t = pq.read_table(SF + "/events.parquet",
                      columns=["user_id", "ts"])
    ts = (t["ts"].to_numpy().astype("datetime64[us]")
          .astype(np.int64))
    per = {}
    for u, x in zip(t["user_id"].to_pylist(), ts):
        per.setdefault(u, []).append(int(x))
    cells = {}
    for u, xs in per.items():
        xs.sort()
        sess = []
        for i, x in enumerate(xs):
            if i == 0 or x - xs[i - 1] > BOUNCE_GAP_US:
                sess.append([x])
            else:
                sess[-1].append(x)
        for s in sess:
            day = s[0] // 86_400_000_000
            n, bcount = cells.get(day, (0, 0))
            cells[day] = (n + 1, bcount + (1 if len(s) == 1 else 0))
    for day, (n, bc) in cells.items():
        row = out.loc[day]
        assert (int(row["n_sessions"]), int(row["n_bounces"])) == \
            (n, bc)
        assert int(row["bounce_permille"]) == 1000 * bc // n
    assert int(out["n_sessions"].sum()) == \
        sum(n for n, _ in cells.values())
