"""Later-session operator families: dispersion, attribution, fairness,
conformal, SLO burn, scorecards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ...functions import firstletter
from ...stages import text_analysis
from ...stages.dedup import (
    embedding_neardup_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from ...stages.similarity import knn_brute_force
from ...stages.canonicalize import connected_components_distributed
from ...stages import joins
from .. import corpus, facets
from ..kg import kg_pipeline
from ._shared import _exchange_buckets, _merge_partials, _read
from .relational import CM_DEPTH, _cm_col
from .kg_fullsql import KG_SECTIONS_SQL
from .graph import BPE_MERGES, DOC_BPE_SQL, _CITE_EDGES_SQL, _kg_edges
from .tpch_extra import KANON_BAND


def events_fano_overdispersion(sf_dir):
    """Fano factor (variance-to-mean ratio) of daily event counts per
    type — the overdispersion audit that decides whether arrivals are
    Poisson (F≈1), bursty (F>1) or regularized (F<1) before anyone
    fits a Poisson rate model (Fano '47; the burstiness companion to
    user_interarrival_histogram). Exact via the integer-moment
    identity: F_milli = 1000·(D·Σx² − S²) // (D·S) over the DENSIFIED
    calendar — missing days are real zero-count days (the
    orders_daily_acf1 rule) and silently dropping them inflates the
    mean and deflates the variance.

    Scale shape: bounded (type, day) count partials — lossless
    per-batch combiner, zero shuffle (≤ types × calendar-days cells);
    the single merge densifies per type and runs the moment
    arithmetic in Python ints (D·Σx² outgrows int64 past ~10⁷ daily
    events over decades)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        out = (pd.DataFrame({"t": t["event_type"].to_pylist(),
                             "d": days, "n": 1})
               .groupby(["t", "d"], as_index=False)["n"].sum())
        return out.astype({"d": "int64", "n": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby(["t", "d"], as_index=False)["n"].sum()
        lo, hi = int(b["d"].min()), int(b["d"].max())
        D = hi - lo + 1
        rows = []
        for ty, g in b.groupby("t"):
            ns = [int(v) for v in g["n"]]
            s = sum(ns)
            s2 = sum(v * v for v in ns)  # zero days add 0 to both
            fano = 1000 * (D * s2 - s * s) // (D * s)
            rows.append((ty, D, s, fano))
        out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                          "n_events", "fano_milli"])
        return out.sort_values("event_type").reset_index(drop=True) \
            .astype({"n_days": "int64", "n_events": "int64",
                     "fano_milli": "int64"})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FANO_SQL = """
WITH b AS (
  SELECT event_type AS t,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
cal AS (SELECT max(d) - min(d) + 1 AS nd FROM b),
m AS (SELECT t, CAST(sum(n) AS HUGEINT) AS s,
             CAST(sum(n * n) AS HUGEINT) AS s2
      FROM b GROUP BY 1)
SELECT t AS event_type,
       CAST(cal.nd AS BIGINT) AS n_days,
       CAST(m.s AS BIGINT) AS n_events,
       CAST(1000 * (cal.nd * m.s2 - m.s * m.s)
            // (cal.nd * m.s) AS BIGINT) AS fano_milli
FROM m, cal ORDER BY t
"""


def kg_degree_assortativity(sf_dir):
    """Degree assortativity of the co-citation graph — do hubs attach
    to hubs (r>0, social networks) or to leaves (r<0, technological
    graphs; Newman '02)? Pearson r over edge-endpoint degree pairs is
    kept cross-engine exact by NEVER taking the square root: each
    undirected edge contributes both directions, the five integer
    sufficient statistics (n, Σx, Σy=Σx, Σxy, Σx²) reduce to
    num = n·Σxy − (Σx)² and var = n·Σx² − (Σx)², and the report is
    the SIGNED r² ppm sign(num)·(10⁶·num² // var²) next to the raw
    (num, var) pair — the events_value_trend exact-pair discipline
    (r = num/var here because x and y are exchangeable, so
    r² = num²/var²).

    Scale shape: degrees ride one node-bucketed exchange
    (graph.degrees); endpoint degrees join onto the pair list by two
    hash-bucketed joins (stages.joins.bucket_join — the a-side and
    b-side each co-locate once); the joined batches reduce to the
    bounded five-statistic partial, zero further shuffle, Python-int
    finalize (num² outgrows int64 immediately)."""
    from ...stages import graph
    from ...stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()

    ja = bucket_join(pairs, deg, left_on="a", right_on="node",
                     suffix="_da")
    jb = bucket_join(ja, deg, left_on="b", right_on="node",
                     suffix="_db")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        da = df["deg"].to_numpy(np.int64)
        db = df["deg_db"].to_numpy(np.int64)
        # both directions of every undirected edge
        sx = int(da.sum() + db.sum())
        sxy = 2 * int((da * db).sum())
        sx2 = int((da * da).sum() + (db * db).sum())
        return pd.DataFrame({"n": [2 * len(df)], "sx": [sx],
                             "sxy": [sxy], "sx2": [sx2]}
                            ).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        sx = int(df["sx"].sum())
        sxy = int(df["sxy"].sum())
        sx2 = int(df["sx2"].sum())
        num = n * sxy - sx * sx
        var = n * sx2 - sx * sx
        sgn = 1 if num >= 0 else -1
        r2 = sgn * (1_000_000 * num * num // max(var * var, 1))
        return pd.DataFrame({
            "n_endpoints": pd.Series([n], dtype="int64"),
            "num": pd.Series([num], dtype="int64"),
            "var": pd.Series([var], dtype="int64"),
            "assort_r2_ppm_signed": pd.Series([r2], dtype="int64")})

    return _merge_partials(
        jb.map_batches(stats, batch_format="pandas"), merge)


KG_ASSORTATIVITY_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
ep AS (
  SELECT da.d AS x, db.d AS y
  FROM pairs JOIN deg da ON da.node = pairs.a
             JOIN deg db ON db.node = pairs.b
  UNION ALL
  SELECT db.d, da.d
  FROM pairs JOIN deg da ON da.node = pairs.a
             JOIN deg db ON db.node = pairs.b),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sx2
      FROM ep),
f AS (SELECT n, n * sxy - sx * sx AS num,
             n * sx2 - sx * sx AS var
      FROM s)
SELECT CAST(n AS BIGINT) AS n_endpoints,
       CAST(num AS BIGINT) AS num,
       CAST(var AS BIGINT) AS var,
       CAST((CASE WHEN num >= 0 THEN 1 ELSE -1 END)
            * (1000000 * num * num
               // greatest(var * var, 1)) AS BIGINT)
         AS assort_r2_ppm_signed
FROM f
"""


LTV_MONTH_DAYS = 30  # account-age month = 30-day grid (documented)


def customer_cohort_ltv(sf_dir):
    """Cohort LTV curves — the growth-analytics staple: customers
    cohorted by the calendar YEAR of their first order, every later
    order assigned to its account-age month ((day − first_day) // 30,
    a deterministic grid both engines share), and each (cohort,
    age_month) cell reports order count, revenue cents, the running
    cumulative revenue and the per-customer LTV cum_cents //
    cohort_size — the curve a finance team reads payback periods
    from. Calendar year via datetime64[Y] arithmetic (no locale).

    Scale shape: the customer dimension is the small side — per-batch
    (custkey → min day) partials ride ONE custkey-bucketed exchange
    and the narrow (custkey, first_day) table materializes once (4
    int64s/customer, the RFM precedent) and BROADCASTS as the
    first-order lookup; orders then tag map-side into bounded
    (cohort_year, age_month) cells (≤ years × ~90 months), zero
    further shuffle; the single merge runs the within-cohort
    cumsum."""
    import ray

    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(),
                           "d": days})
             .groupby("c", as_index=False)["d"].min())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "d": "int64",
                         "_bucket": "int32"})

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("c", as_index=False)["d"].min()
                .astype("int64"))

    first = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(bucket_first, batch_format="pandas")
             .to_pandas())
    first_day = dict(zip(first["c"].astype(int),
                         first["d"].astype(int)))
    # cohort sizes from the same narrow table
    fy = (np.asarray(list(first_day.values()), np.int64)
          .astype("datetime64[D]").astype("datetime64[Y]")
          .astype(np.int64) + 1970)
    cohort_size = pd.Series(fy).value_counts().to_dict()
    lookup = ray.put(first_day)

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        fd = _ray.get(lookup)
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        firsts = np.asarray([fd[int(c)] for c in
                             t["o_custkey"].to_pylist()], np.int64)
        years = (firsts.astype("datetime64[D]")
                 .astype("datetime64[Y]").astype(np.int64) + 1970)
        age = (days - firsts) // LTV_MONTH_DAYS
        out = (pd.DataFrame({"cohort_year": years, "age_month": age,
                             "n": 1, "cents": cents})
               .groupby(["cohort_year", "age_month"], as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cohort_year", "age_month"], as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values(["cohort_year", "age_month"])
             .reset_index(drop=True))
        g["cum_cents"] = g.groupby("cohort_year")["cents"].cumsum()
        sizes = g["cohort_year"].map(cohort_size).astype("int64")
        g["n_customers"] = sizes
        g["ltv_cents"] = g["cum_cents"] // sizes
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


COHORT_LTV_SQL = """
WITH f AS (
  SELECT o_custkey,
         CAST(min(epoch_us(o_orderdate)) // 86400000000 AS BIGINT)
           AS fd
  FROM orders GROUP BY 1),
cs AS (
  SELECT CAST(year(CAST(to_timestamp(fd * 86400) AS DATE))
              AS BIGINT) AS cohort_year,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM f GROUP BY 1),
o AS (
  SELECT CAST(year(CAST(to_timestamp(f.fd * 86400) AS DATE))
              AS BIGINT) AS cohort_year,
         (CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000
          - f.fd) // %d AS age_month,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN f ON f.o_custkey = o.o_custkey),
g AS (
  SELECT cohort_year, age_month,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM o GROUP BY 1, 2)
SELECT g.cohort_year, g.age_month, g.n_orders, g.cents,
       CAST(sum(g.cents) OVER (PARTITION BY g.cohort_year
              ORDER BY g.age_month) AS BIGINT) AS cum_cents,
       cs.n_customers,
       CAST(sum(g.cents) OVER (PARTITION BY g.cohort_year
              ORDER BY g.age_month) // cs.n_customers AS BIGINT)
         AS ltv_cents
FROM g JOIN cs ON cs.cohort_year = g.cohort_year
ORDER BY g.cohort_year, g.age_month
""" % LTV_MONTH_DAYS


def part_price_index(sf_dir):
    """Laspeyres and Paasche price indices between the two halves of
    the shipdate range — the econometrics primitive (CPI arithmetic)
    asking 'did prices rise, holding the BASKET fixed?': per part and
    period, unit price is the floored milli-grid 1000·cents // qty
    (a documented grid — per-row prices are ratios, so a grid is the
    only way integer arithmetic crosses engines), Laspeyres weights
    by base-period quantities (1000·Σp₁q₀ // Σp₀q₀) and Paasche by
    current (1000·Σp₁q₁ // Σp₀q₁), over parts traded in BOTH halves
    (the matched-basket rule).

    Scale shape: one zero-shuffle min/max pre-pass pins the midpoint
    (the orders_price_drift discipline); (part, half → cents, qty)
    partials ride ONE partkey-bucketed exchange; each bucket
    finalizes its parts' per-period prices and emits ONE bounded
    five-number partial (a part lives in exactly one bucket, so the
    basket sums are additive); Python-int merge, HUGEINT oracle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity",
                        "l_extendedprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["l_shipdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = pc.cast(pc.round(t["l_quantity"],
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        p = (pd.DataFrame({"k": t["l_partkey"].to_numpy(),
                           "h": (days > mid).astype(np.int64),
                           "cents": cents, "qty": qty})
             .groupby(["k", "h"], as_index=False)
             .agg(cents=("cents", "sum"), qty=("qty", "sum")))
        hh = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (hh % np.uint64(buckets)).astype("int32")
        return p.astype({"k": "int64", "h": "int64", "cents": "int64",
                         "qty": "int64", "_bucket": "int32"})

    def bucket_sums(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby(["k", "h"], as_index=False)
             .agg(cents=("cents", "sum"), qty=("qty", "sum")))
        w = a.pivot_table(index="k", columns="h",
                          values=["cents", "qty"], aggfunc="sum")
        w = w.reindex(columns=pd.MultiIndex.from_product(
            [["cents", "qty"], [0, 1]]))
        both = w.dropna()
        if len(both) == 0:
            z = [0] * 5
        else:
            c0 = both[("cents", 0)].to_numpy(np.int64)
            c1 = both[("cents", 1)].to_numpy(np.int64)
            q0 = both[("qty", 0)].to_numpy(np.int64)
            q1 = both[("qty", 1)].to_numpy(np.int64)
            p0 = 1000 * c0 // q0
            p1 = 1000 * c1 // q1
            z = [len(both), int((p1 * q0).sum()),
                 int((p0 * q0).sum()), int((p1 * q1).sum()),
                 int((p0 * q1).sum())]
        return pd.DataFrame({"n_parts": [z[0]], "l_num": [z[1]],
                             "l_den": [z[2]], "p_num": [z[3]],
                             "p_den": [z[4]]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_sums, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ln, ld = int(df["l_num"].sum()), int(df["l_den"].sum())
        pn, pdn = int(df["p_num"].sum()), int(df["p_den"].sum())
        return pd.DataFrame({
            "n_parts_both": pd.Series([int(df["n_parts"].sum())],
                                      dtype="int64"),
            "laspeyres_milli": pd.Series([1000 * ln // max(ld, 1)],
                                         dtype="int64"),
            "paasche_milli": pd.Series([1000 * pn // max(pdn, 1)],
                                       dtype="int64")})

    return _merge_partials(per_bucket, merge)


PRICE_INDEX_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000)
          + max(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000))
         // 2 AS mid
  FROM lineitem),
b AS (
  SELECT l_partkey AS k,
         CASE WHEN CAST(epoch_us(l_shipdate) AS BIGINT)
                   // 86400000000 > rng.mid
              THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           AS qty
  FROM lineitem, rng GROUP BY 1, 2),
w AS (
  SELECT b0.k,
         1000 * b0.cents // b0.qty AS p0,
         1000 * b1.cents // b1.qty AS p1,
         b0.qty AS q0, b1.qty AS q1
  FROM b b0 JOIN b b1 ON b1.k = b0.k AND b0.h = 0 AND b1.h = 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p1 * q0) AS HUGEINT) AS ln_,
             CAST(sum(p0 * q0) AS HUGEINT) AS ld,
             CAST(sum(p1 * q1) AS HUGEINT) AS pn,
             CAST(sum(p0 * q1) AS HUGEINT) AS pd_
      FROM w)
SELECT n AS n_parts_both,
       CAST(1000 * ln_ // greatest(ld, 1) AS BIGINT)
         AS laspeyres_milli,
       CAST(1000 * pn // greatest(pd_, 1) AS BIGINT)
         AS paasche_milli
FROM s
"""


def kg_rich_club(sf_dir):
    """Rich-club coefficient ladder of the co-citation graph — for
    every degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k
    counts nodes of degree > k and E_k edges whose BOTH endpoints
    have degree > k (Colizza et al. '06): do the hubs form a club
    denser than the graph at large? Reported as floored permille per
    k over every k with N_k ≥ 2.

    Scale shape: reuses the assortativity join plan — degrees ride
    one node-bucketed exchange and attach to the pair list via two
    bucket_joins over materialized inputs; per-batch census of
    min(da, db) plus the bounded degree histogram are both suffix-
    cumsummable, so E_k and N_k for EVERY k fall out of one merge
    block with no per-k passes. Python-int quotients (N_k² outgrows
    int64 past ~3·10⁹ hub nodes)."""
    from ...stages import graph
    from ...stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()

    # bounded degree histogram (distinct degree values)
    def deg_hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("deg", as_index=False).size()
               .rename(columns={"size": "n_nodes"}))
        return out.astype("int64")

    hist = (deg.map_batches(deg_hist, batch_format="pandas")
            .to_pandas().groupby("deg", as_index=False)["n_nodes"]
            .sum())

    ja = bucket_join(pairs, deg, left_on="a", right_on="node",
                     suffix="_da")
    jb = bucket_join(ja, deg, left_on="b", right_on="node",
                     suffix="_db")

    def edge_census(df: pd.DataFrame) -> pd.DataFrame:
        m = np.minimum(df["deg"].to_numpy(np.int64),
                       df["deg_db"].to_numpy(np.int64))
        out = (pd.DataFrame({"mindeg": m})
               .groupby("mindeg", as_index=False).size()
               .rename(columns={"size": "n_edges"}))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ec = (df.groupby("mindeg", as_index=False)["n_edges"].sum()
              .sort_values("mindeg").reset_index(drop=True))
        degs = hist.sort_values("deg").reset_index(drop=True)
        max_deg = int(degs["deg"].max())
        rows = []
        for k in range(1, max_deg):
            nk = int(degs.loc[degs["deg"] > k, "n_nodes"].sum())
            if nk < 2:
                continue
            ek = int(ec.loc[ec["mindeg"] > k, "n_edges"].sum())
            rows.append((k, nk, ek,
                         1000 * 2 * ek // (nk * (nk - 1))))
        return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges",
                                           "phi_permille"]
                            ).astype("int64")

    return _merge_partials(
        jb.map_batches(edge_census, batch_format="pandas"), merge)


KG_RICH_CLUB_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
ks AS (
  SELECT unnest(generate_series(1,
           (SELECT CAST(max(d) AS BIGINT) FROM deg) - 1)) AS k),
nk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
ek AS (SELECT ks.k, CAST(count(e.mindeg) AS BIGINT) AS n_edges
       FROM ks LEFT JOIN (
         SELECT least(da.d, db.d) AS mindeg
         FROM pairs JOIN deg da ON da.node = pairs.a
                    JOIN deg db ON db.node = pairs.b) e
         ON e.mindeg > ks.k
       GROUP BY 1)
SELECT nk.k, nk.n_nodes,
       coalesce(ek.n_edges, 0) AS n_edges,
       CAST(1000 * 2 * CAST(coalesce(ek.n_edges, 0) AS HUGEINT)
            // (CAST(nk.n_nodes AS HUGEINT) * (nk.n_nodes - 1))
            AS BIGINT) AS phi_permille
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes >= 2
ORDER BY nk.k
"""


def er_blocking_quality(sf_dir):
    """Blocking-scheme evaluation (Christen '12's two standard
    metrics) — before trusting a cheap blocking key at 10⁹ records,
    measure what it buys and what it loses against ground truth:
    PAIRS COMPLETENESS (recall: fraction of true edit-distance-1
    name pairs whose two records share a block) and REDUCTION RATIO
    (fraction of the N·(N−1)/2 comparison space the blocking prunes).
    The audited scheme is prefix-15 blocking (drop the last 3 name
    chars) over the zero-padded customer names, whose block key is
    provably custkey // 1000 — so a truth pair is captured iff its
    keys agree on //1000, evaluable map-side with no name join.

    Scale shape: the truth pairs reuse the FastSS deletion-
    neighborhood machinery (dedup.edit1_join_pairs — signature
    explode, bucketed verify); capture tagging and the pair census
    are per-batch count partials, zero further shuffle; block sizes
    for the reduction ratio are a bounded (block → n) combiner
    (≤ N/1000 blocks). C(N,2) arithmetic in Python ints."""
    from ...stages.dedup import edit1_join_pairs

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    n_cust = ds.count()

    pairs = edit1_join_pairs(ds, text_col="c_name",
                             key_col="c_custkey")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        a = df["key_a"].to_numpy(np.int64)
        b = df["key_b"].to_numpy(np.int64)
        cap = (a // 1000 == b // 1000).astype(np.int64)
        return pd.DataFrame({"n_truth": [len(df)],
                             "n_captured": [int(cap.sum())]}
                            ).astype("int64")

    truth = pairs.map_batches(tag, batch_format="pandas").to_pandas()
    n_truth = int(truth["n_truth"].sum())
    n_cap = int(truth["n_captured"].sum())

    def block_sizes(t: pa.Table) -> pd.DataFrame:
        blk = t["c_custkey"].to_numpy() // 1000
        out = (pd.DataFrame({"blk": blk})
               .groupby("blk", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    blocks = (_read(sf_dir, "customer", columns=["c_custkey"])
              .map_batches(block_sizes, batch_format="pyarrow")
              .to_pandas().groupby("blk")["n"].sum())
    candidates = sum(int(n) * (int(n) - 1) // 2 for n in blocks)
    possible = n_cust * (n_cust - 1) // 2

    return pd.DataFrame({
        "n_truth_pairs": pd.Series([n_truth], dtype="int64"),
        "n_captured": pd.Series([n_cap], dtype="int64"),
        "recall_permille": pd.Series(
            [1000 * n_cap // max(n_truth, 1)], dtype="int64"),
        "n_candidates": pd.Series([candidates], dtype="int64"),
        "reduction_permille": pd.Series(
            [1000 * (possible - candidates) // max(possible, 1)],
            dtype="int64")})


ER_BLOCKING_SQL = """
WITH truth AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb
  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
cap AS (
  SELECT CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN ka // 1000 = kb // 1000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cap
  FROM truth),
blk AS (SELECT c_custkey // 1000 AS b, count(*) AS n
        FROM customer GROUP BY 1),
cand AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS c FROM blk),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM customer)
SELECT cap.n_truth AS n_truth_pairs,
       cap.n_cap AS n_captured,
       CAST(1000 * cap.n_cap // greatest(cap.n_truth, 1) AS BIGINT)
         AS recall_permille,
       cand.c AS n_candidates,
       CAST(1000 * (tot.n * (tot.n - 1) // 2 - cand.c)
            // greatest(tot.n * (tot.n - 1) // 2, 1) AS BIGINT)
         AS reduction_permille
FROM cap, cand, tot
"""


ATTR_WINDOW_US = 48 * 3600 * 1_000_000  # 48-hour lookback


def events_touch_attribution(sf_dir):
    """Multi-touch attribution — the marketing-analytics question
    'which channel gets credit for the purchase?', answered under the
    three standard models at once: per channel (view/click), the
    count of purchases whose FIRST touch in the 48 h lookback was
    this channel, whose LAST touch was, and the LINEAR credit sum
    (each of a purchase's k touches earns the floored 1000//k
    permille — the floor is the defined grid, so credits sum to ≤1000
    per purchase identically in both engines). Window is half-open
    [t_p − W, t_p): a touch AT the purchase microsecond is the
    purchase's own page-render, not a cause. Purchases with no touch
    in window report as the '(none)' channel — the orphan rate a
    media team reads before trusting the model. Ties on equal ts
    break by event_id in both engines.

    Scale shape: one user-bucketed exchange co-locates each user's
    events; per bucket the purchases×touches window join is a
    vectorized same-user merge (per-user event counts are bounded —
    the basket self-join discipline), first/last fall out of one
    (pid, ts, eid) sort, and the bucket emits a bounded ≤3-channel
    census partial (a purchase lives in exactly one bucket)."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        kinds = t["event_type"].to_pylist()
        keep = [i for i, k in enumerate(kinds)
                if k in ("purchase", "view", "click")]
        tt = t.take(keep)
        df = pd.DataFrame({
            "u": tt["user_id"].to_numpy(),
            "ts": (tt["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64)),
            "eid": tt["event_id"].to_numpy(),
            "ch": tt["event_type"].to_pylist()})
        h = pd.util.hash_pandas_object(df["u"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_census(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["ch"] == "purchase"][["u", "ts", "eid"]] \
            .rename(columns={"ts": "pts", "eid": "pid"})
        t = g[g["ch"] != "purchase"][["u", "ts", "eid", "ch"]]
        j = p.merge(t, on="u")
        j = j[(j["ts"] >= j["pts"] - ATTR_WINDOW_US)
              & (j["ts"] < j["pts"])]
        cells = {}

        def bump(ch, col, val=1):
            key = ch
            if key not in cells:
                cells[key] = [0, 0, 0]
            cells[key][col] += val

        if len(j):
            j = j.sort_values(["pid", "ts", "eid"], kind="mergesort")
            kk = j.groupby("pid")["eid"].transform("size") \
                .to_numpy(np.int64)
            for ch, n in (j.groupby("pid").head(1)["ch"]
                          .value_counts().items()):
                bump(ch, 0, int(n))
            for ch, n in (j.groupby("pid").tail(1)["ch"]
                          .value_counts().items()):
                bump(ch, 1, int(n))
            lin = pd.DataFrame({"ch": j["ch"].to_numpy(),
                                "w": 1000 // kk})
            for ch, s in lin.groupby("ch")["w"].sum().items():
                bump(ch, 2, int(s))
        orphans = len(p) - j["pid"].nunique() if len(j) else len(p)
        if orphans:
            bump("(none)", 0, orphans)
            bump("(none)", 1, orphans)
        out = pd.DataFrame(
            [(ch, v[0], v[1], v[2]) for ch, v in cells.items()],
            columns=["channel", "first_touch", "last_touch",
                     "linear_permille"])
        return out.astype({"first_touch": "int64",
                           "last_touch": "int64",
                           "linear_permille": "int64"})

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_census, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("channel", as_index=False)
               .agg(first_touch=("first_touch", "sum"),
                    last_touch=("last_touch", "sum"),
                    linear_permille=("linear_permille", "sum"))
               .sort_values("channel").reset_index(drop=True))
        return out.astype({"first_touch": "int64",
                           "last_touch": "int64",
                           "linear_permille": "int64"})

    return _merge_partials(per_bucket, merge)


TOUCH_ATTR_SQL = """
WITH p AS (
  SELECT event_id AS pid, user_id AS u,
         CAST(epoch_us(ts) AS BIGINT) AS pts
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts,
         event_id AS eid, event_type AS ch
  FROM events WHERE event_type IN ('view', 'click')),
j AS (
  SELECT p.pid, t.ch, t.ts, t.eid
  FROM p JOIN t ON t.u = p.u
    AND t.ts >= p.pts - %d AND t.ts < p.pts),
r AS (
  SELECT pid, ch,
         row_number() OVER (PARTITION BY pid
                            ORDER BY ts, eid) AS rn_a,
         row_number() OVER (PARTITION BY pid
                            ORDER BY ts DESC, eid DESC) AS rn_d,
         CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS k
  FROM j),
ft AS (SELECT ch, CAST(count(*) AS BIGINT) AS n
       FROM r WHERE rn_a = 1 GROUP BY 1),
lt AS (SELECT ch, CAST(count(*) AS BIGINT) AS n
       FROM r WHERE rn_d = 1 GROUP BY 1),
lin AS (SELECT ch, CAST(sum(1000 // k) AS BIGINT) AS s
        FROM r GROUP BY 1),
orph AS (SELECT (SELECT count(*) FROM p)
                - (SELECT count(DISTINCT pid) FROM j) AS n),
chans AS (SELECT DISTINCT ch FROM j)
SELECT ch AS channel,
       coalesce(ft.n, 0) AS first_touch,
       coalesce(lt.n, 0) AS last_touch,
       coalesce(lin.s, 0) AS linear_permille
FROM chans LEFT JOIN ft USING (ch) LEFT JOIN lt USING (ch)
           LEFT JOIN lin USING (ch)
UNION ALL
SELECT '(none)', CAST(orph.n AS BIGINT), CAST(orph.n AS BIGINT),
       CAST(0 AS BIGINT)
FROM orph WHERE orph.n > 0
ORDER BY channel
""" % ATTR_WINDOW_US


FAIR_THRESHOLD = 14  # classify positive at planted score >= 14


def lineitem_fairness_audit(sf_dir):
    """Group-fairness audit of a classifier — the responsible-AI
    release gate: per protected group (supplier cohort l_suppkey % 5,
    a synthetic protected attribute on a real column), the three
    quantities every fairness review reads: SELECTION RATE
    (demographic parity), TPR and FPR (equalized odds, Hardt et al.
    '16), each as exact floored permille. The classifier is the
    planted scorer thresholded at ≥14 (the lineitem_model_auc rule);
    score and group are independent by construction, so the audit
    correctly reports near-equal rates — the exact per-group values
    and their gaps are the data a dashboard plots.

    Scale shape: bounded (group, y, ŷ) count partials — ≤20 cells,
    lossless per-batch combiner, zero shuffle, one merge block of
    integer divisions."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        s = 8 * y + okey % 20
        out = (pd.DataFrame({"g": t["l_suppkey"].to_numpy() % 5,
                             "y": y,
                             "yh": (s >= FAIR_THRESHOLD)
                             .astype(np.int64),
                             "n": 1})
               .groupby(["g", "y", "yh"], as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["g", "y", "yh"])["n"].sum()
        rows = []
        for g in sorted({k[0] for k in c.index}):
            def n(y, yh):
                return int(c.get((g, y, yh), 0))
            tot = n(0, 0) + n(0, 1) + n(1, 0) + n(1, 1)
            pos = n(1, 0) + n(1, 1)
            neg = n(0, 0) + n(0, 1)
            rows.append((int(g), tot,
                         1000 * (n(0, 1) + n(1, 1)) // max(tot, 1),
                         1000 * n(1, 1) // max(pos, 1),
                         1000 * n(0, 1) // max(neg, 1)))
        return pd.DataFrame(rows, columns=[
            "grp", "n", "selection_permille", "tpr_permille",
            "fpr_permille"]).astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FAIRNESS_SQL = """
WITH s AS (
  SELECT l_suppkey %% 5 AS grp,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CASE WHEN 8 * (CASE WHEN l_returnflag = 'R'
                             THEN 1 ELSE 0 END)
                   + l_orderkey %% 20 >= %d
              THEN 1 ELSE 0 END AS yh
  FROM lineitem),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yh) AS BIGINT) AS sel,
         CAST(sum(y * yh) AS BIGINT) AS tp,
         CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum((1 - y) * yh) AS BIGINT) AS fp
  FROM s GROUP BY 1)
SELECT CAST(grp AS BIGINT) AS grp, n,
       CAST(1000 * sel // greatest(n, 1) AS BIGINT)
         AS selection_permille,
       CAST(1000 * tp // greatest(pos, 1) AS BIGINT)
         AS tpr_permille,
       CAST(1000 * fp // greatest(n - pos, 1) AS BIGINT)
         AS fpr_permille
FROM g ORDER BY grp
""" % FAIR_THRESHOLD


CONFORMAL_ALPHA_PERMILLE = 100  # target 90% coverage


def lineitem_conformal_threshold(sf_dir):
    """Split-conformal calibration (Vovk '05 / Angelopoulos-Bates
    '21) — the distribution-free coverage guarantee every deployed
    scorer should ship with: a deterministic calibration split
    (l_orderkey % 4 = 0, both engines replay it), nonconformity
    u = 27 − score over calibration POSITIVES, threshold q̂ = the
    ⌈(n+1)(1−α)⌉-th smallest u (the finite-sample corrected order
    statistic — an off-by-one here silently voids the guarantee),
    then the EMPIRICAL eval-set check: positive coverage (must
    concentrate near ≥900‰) and the negative capture rate — the
    efficiency price of the guarantee.

    Scale shape: nonconformity lives on the bounded ≤28-value score
    grid, so calibration is a zero-shuffle (u, split, y) count
    histogram; the order statistic reads off a cumsum and the
    coverage recount is the same histogram's other half — one pass,
    one merge block."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        u = 27 - (8 * y + okey % 20)
        out = (pd.DataFrame({"u": u, "cal": (okey // 20 % 4 == 0)
                             .astype(np.int64), "y": y, "n": 1})
               .groupby(["u", "cal", "y"], as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["u", "cal", "y"])["n"].sum()
        cal = sorted((int(u), int(n)) for (u, cl, y), n in c.items()
                     if cl == 1 and y == 1)
        n_cal = sum(n for _, n in cal)
        rank = -(-(n_cal + 1) * (1000 - CONFORMAL_ALPHA_PERMILLE)
                 // 1000)  # ceil((n+1)(1-alpha))
        rank = min(rank, n_cal)
        cum, q = 0, max(u for u, _ in cal) if cal else 0
        for u, n in cal:
            cum += n
            if cum >= rank:
                q = u
                break
        ev_pos = sum(int(n) for (u, cl, y), n in c.items()
                     if cl == 0 and y == 1)
        ev_pos_cov = sum(int(n) for (u, cl, y), n in c.items()
                         if cl == 0 and y == 1 and int(u) <= q)
        ev_neg = sum(int(n) for (u, cl, y), n in c.items()
                     if cl == 0 and y == 0)
        # negatives scored by the same rule: u = 27 - s
        ev_neg_cap = sum(int(n) for (u, cl, y), n in c.items()
                         if cl == 0 and y == 0 and int(u) <= q)
        return pd.DataFrame({
            "n_cal": pd.Series([n_cal], dtype="int64"),
            "q_hat": pd.Series([q], dtype="int64"),
            "coverage_permille": pd.Series(
                [1000 * ev_pos_cov // max(ev_pos, 1)], dtype="int64"),
            "neg_capture_permille": pd.Series(
                [1000 * ev_neg_cap // max(ev_neg, 1)],
                dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


CONFORMAL_SQL = """
WITH s AS (
  SELECT 27 - (8 * (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               + l_orderkey %% 20) AS u,
         CASE WHEN (l_orderkey // 20) %% 4 = 0 THEN 1 ELSE 0 END
           AS cal,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
calpos AS (SELECT u, CAST(count(*) AS BIGINT) AS n
           FROM s WHERE cal = 1 AND y = 1 GROUP BY 1),
nc AS (SELECT CAST(sum(n) AS BIGINT) AS n_cal FROM calpos),
rk AS (SELECT least(((n_cal + 1) * (1000 - %d) + 999) // 1000,
                    n_cal) AS r, n_cal FROM nc),
q AS (SELECT min(u) AS q_hat FROM
        (SELECT u, sum(n) OVER (ORDER BY u) AS cum FROM calpos),
        rk
      WHERE cum >= rk.r),
ev AS (SELECT
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS pos,
         CAST(sum(CASE WHEN y = 1 AND u <= q.q_hat
                       THEN 1 ELSE 0 END) AS BIGINT) AS pos_cov,
         CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS neg,
         CAST(sum(CASE WHEN y = 0 AND u <= q.q_hat
                       THEN 1 ELSE 0 END) AS BIGINT) AS neg_cap
       FROM s, q WHERE cal = 0)
SELECT rk.n_cal AS n_cal,
       CAST(q.q_hat AS BIGINT) AS q_hat,
       CAST(1000 * ev.pos_cov // greatest(ev.pos, 1) AS BIGINT)
         AS coverage_permille,
       CAST(1000 * ev.neg_cap // greatest(ev.neg, 1) AS BIGINT)
         AS neg_capture_permille
FROM rk, q, ev
""" % CONFORMAL_ALPHA_PERMILLE


def events_cuped_reduction(sf_dir):
    """CUPED variance-reduction audit (Deng et al. WSDM'13) — the
    experimentation-platform question 'how much experiment runtime
    does the pre-period covariate buy?': per user, X = pre-midpoint
    value sum and Y = post-midpoint value sum (whole-unit integer
    grid), θ = cov/var reported as the exact integer pair
    (θ_num, θ_den) = (n·Σxy − ΣxΣy, n·Σx² − (Σx)²) — the
    events_value_trend discipline — and the headline variance
    reduction r² in ppm, 10⁶·num² // (varx·vary), all Python-int
    (num² reaches ~10²⁹ at sf0.01; HUGEINT oracle). Here the only
    X↔Y link is per-user activity rate, so the audit honestly reports
    a few-permille reduction — the number that tells a team CUPED is
    NOT worth it for this metric.

    Scale shape: one zero-shuffle min/max pre-pass pins the midpoint;
    per-batch (user → x, y) sum partials (lossless combiner) ride ONE
    user-bucketed exchange; each bucket reduces its finalized users
    to a bounded six-statistic partial, single Python-int merge."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def ts_range(t: pa.Table) -> pd.DataFrame:
        x = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(x.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(x.max())],
                                             dtype="int64")})

    r = ds.map_batches(ts_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        v = pc.cast(pc.round(t["value"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        pre = ts <= mid
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "x": np.where(pre, v, 0),
                           "y": np.where(pre, 0, v)})
             .groupby("u", as_index=False).agg(x=("x", "sum"),
                                               y=("y", "sum")))
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "x": "int64", "y": "int64",
                         "_bucket": "int32"})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("u", as_index=False).agg(x=("x", "sum"),
                                               y=("y", "sum"))
        x = a["x"].to_numpy(np.int64)
        y = a["y"].to_numpy(np.int64)
        return pd.DataFrame({"n": [len(a)], "sx": [int(x.sum())],
                             "sy": [int(y.sum())],
                             "sxy": [int((x * y).sum())],
                             "sx2": [int((x * x).sum())],
                             "sy2": [int((y * y).sum())]}
                            ).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        sx, sy = int(df["sx"].sum()), int(df["sy"].sum())
        sxy = int(df["sxy"].sum())
        sx2, sy2 = int(df["sx2"].sum()), int(df["sy2"].sum())
        num = n * sxy - sx * sy
        vx = n * sx2 - sx * sx
        vy = n * sy2 - sy * sy
        r2 = 1_000_000 * num * num // max(vx * vy, 1)
        return pd.DataFrame({
            "n_users": pd.Series([n], dtype="int64"),
            "theta_num": pd.Series([num], dtype="int64"),
            "theta_den": pd.Series([vx], dtype="int64"),
            "var_reduction_ppm": pd.Series([r2], dtype="int64")})

    return _merge_partials(per_bucket, merge)


CUPED_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(ts) AS BIGINT))
          + max(CAST(epoch_us(ts) AS BIGINT))) // 2 AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) <= rng.mid
                       THEN CAST(round(value) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) > rng.mid
                       THEN CAST(round(value) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events, rng GROUP BY 1),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sx2,
             CAST(sum(y * y) AS HUGEINT) AS sy2
      FROM u),
f AS (SELECT n, n * sxy - sx * sy AS num,
             n * sx2 - sx * sx AS vx,
             n * sy2 - sy * sy AS vy
      FROM s)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(num AS BIGINT) AS theta_num,
       CAST(vx AS BIGINT) AS theta_den,
       CAST(1000000 * num * num // greatest(vx * vy, 1) AS BIGINT)
         AS var_reduction_ppm
FROM f
"""


def events_srm_check(sf_dir):
    """Sample-ratio-mismatch check — the first gate every experiment
    readout runs (Fabijan et al. '19: an SRM invalidates everything
    downstream): users md5-hash into two arms (the deterministic
    assignment discipline — a modulo on sequential ids is EXACTLY
    balanced by construction and tests nothing), and the 1-dof χ²
    against the 50/50 design is the exact integer
    1000·(n₀−n₁)² // (n₀+n₁), flagged at the 3.841 critical value.
    On an honest assignment the statistic is binomial noise — the
    audit passing IS the result.

    Scale shape: distinct users need one user-bucketed exchange
    (batch-local distinct is not a user census); each bucket emits
    its two arm counts (a user lives in one bucket), bounded 2-cell
    merge."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"u": t["user_id"].to_numpy()}) \
            .drop_duplicates()
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "_bucket": "int32"})

    def bucket_arms(g: pd.DataFrame) -> pd.DataFrame:
        us = g["u"].drop_duplicates()
        arms = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15],
                 16) % 2 for u in us), np.int64, len(us))
        return pd.DataFrame({"n0": [int((arms == 0).sum())],
                             "n1": [int((arms == 1).sum())]}
                            ).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_arms, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n0, n1 = int(df["n0"].sum()), int(df["n1"].sum())
        chi2 = 1000 * (n0 - n1) * (n0 - n1) // max(n0 + n1, 1)
        return pd.DataFrame({
            "n_arm0": pd.Series([n0], dtype="int64"),
            "n_arm1": pd.Series([n1], dtype="int64"),
            "srm_chi2_milli": pd.Series([chi2], dtype="int64"),
            "srm_flag": pd.Series([1 if chi2 > 3841 else 0],
                                  dtype="int64")})

    return _merge_partials(per_bucket, merge)


SRM_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
a AS (SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                 1, 15) AS BIGINT) % 2 AS arm
      FROM u),
c AS (SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n0,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n1
      FROM a)
SELECT n0 AS n_arm0, n1 AS n_arm1,
       CAST(1000 * (n0 - n1) * (n0 - n1)
            // greatest(n0 + n1, 1) AS BIGINT) AS srm_chi2_milli,
       CAST(CASE WHEN 1000 * (n0 - n1) * (n0 - n1)
                      // greatest(n0 + n1, 1) > 3841
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM c
"""


DUP_PAY_PLANT_MOD = 37      # every 37th order double-submits
DUP_PAY_CLONE_BASE = 10 ** 9
DUP_PAY_WINDOW_DAYS = 7


def orders_duplicate_payments(sf_dir):
    """Duplicate-payment detector with a planted validation set — the
    AP/fraud audit 'same payer, same amount, days apart' cannot be
    demonstrated on this synthesizer (continuous prices: measured 0
    natural collisions even on a $100 grid), so every 37th order
    PLANTS a double-submission (clone key +10⁹, same customer and
    cents, next day — the bloom_fpr_audit detector-validation
    discipline) and the detector's recall against the plant is the
    reported result, next to the natural-pair count (0 here; >0 in
    production is the finding).

    Scale shape: plants are map-side row emission; candidate pairs
    ride ONE custkey-bucketed exchange and each bucket self-merges on
    (custkey, cents) — the same-key join is tiny because amounts
    collide rarely (that rarity is WHY the detector works) — then
    filters the ±7-day window; bounded count partials, single
    merge."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        c = t["o_custkey"].to_numpy()
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"k": k, "c": c, "d": d, "cents": cents})
        plant = df[df["k"] % DUP_PAY_PLANT_MOD == 0].copy()
        plant["k"] = plant["k"] + DUP_PAY_CLONE_BASE
        plant["d"] = plant["d"] + 1
        df = pd.concat([df, plant], ignore_index=True)
        h = pd.util.hash_pandas_object(df["c"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df.astype({"k": "int64", "c": "int64", "d": "int64",
                          "cents": "int64", "_bucket": "int32"})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        j = g.merge(g, on=["c", "cents"])
        j = j[(j["k_x"] < j["k_y"])
              & ((j["d_x"] - j["d_y"]).abs()
                 <= DUP_PAY_WINDOW_DAYS)]
        clone = (j["k_y"] >= DUP_PAY_CLONE_BASE) \
            | (j["k_x"] >= DUP_PAY_CLONE_BASE)
        n_plant = int((g.loc[g["k"] < DUP_PAY_CLONE_BASE, "k"]
                       % DUP_PAY_PLANT_MOD == 0).sum())
        return pd.DataFrame({
            "n_pairs": [len(j)],
            "n_clone_pairs": [int(clone.sum())],
            "n_natural_pairs": [int((~clone).sum())],
            "n_planted": [n_plant]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_pairs, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        pairs = int(df["n_pairs"].sum())
        clones = int(df["n_clone_pairs"].sum())
        nat = int(df["n_natural_pairs"].sum())
        planted = int(df["n_planted"].sum())
        return pd.DataFrame({
            "n_planted": pd.Series([planted], dtype="int64"),
            "n_pairs": pd.Series([pairs], dtype="int64"),
            "n_natural_pairs": pd.Series([nat], dtype="int64"),
            "recall_permille": pd.Series(
                [1000 * clones // max(planted, 1)], dtype="int64")})

    return _merge_partials(per_bucket, merge)


DUP_PAY_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
o AS (
  SELECT * FROM base
  UNION ALL
  SELECT k + %d, c, d + 1, cents FROM base WHERE k %% %d = 0),
p AS (
  SELECT a.k AS ka, b.k AS kb
  FROM o a JOIN o b
    ON a.c = b.c AND a.cents = b.cents AND a.k < b.k
   AND abs(a.d - b.d) <= %d),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN ka >= %d OR kb >= %d
                       THEN 1 ELSE 0 END) AS BIGINT) AS clones
  FROM p),
pl AS (SELECT CAST(count(*) AS BIGINT) AS n
       FROM base WHERE k %% %d = 0)
SELECT pl.n AS n_planted,
       agg.n_pairs,
       CAST(agg.n_pairs - agg.clones AS BIGINT) AS n_natural_pairs,
       CAST(1000 * agg.clones // greatest(pl.n, 1) AS BIGINT)
         AS recall_permille
FROM agg, pl
""" % (DUP_PAY_CLONE_BASE, DUP_PAY_PLANT_MOD, DUP_PAY_WINDOW_DAYS,
       DUP_PAY_CLONE_BASE, DUP_PAY_CLONE_BASE, DUP_PAY_PLANT_MOD)


SKETCH_BINS = 256


def orders_quantile_sketch_audit(sf_dir):
    """Quantile-sketch accuracy audit — before trusting an
    equi-width-histogram quantile estimator (the shape every
    approximate engine ships), measure its error against the exact
    order statistics ON THIS DISTRIBUTION: p50/p90/p99 of order
    cents, estimate = linear interpolation inside the crossing
    256-bin cell (all integer: lo + width·(rank−cum_below) //
    bin_count), exact = the true rank-⌈qN⌉ value, error reported in
    ppm of the exact (measured ~240 ppm at p50 — permille floors a
    256-bin sketch's error to zero). The join_sample_estimate /
    embed_squant_recall discipline: the estimator's deviation IS the
    data.

    Scale shape: one zero-shuffle min/max pre-pass sizes the bins;
    per-batch partials carry BOTH the bounded 256-cell sketch and the
    distinct-cents exact histogram (price-domain bounded, the
    orders_price_drift argument); single merge reads both off
    cumsums."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def rng(t: pa.Table) -> pd.DataFrame:
        x = cents_of(t)
        return pd.DataFrame({"lo": pd.Series([int(x.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(x.max())],
                                             dtype="int64")})

    r = ds.map_batches(rng, batch_format="pyarrow").to_pandas()
    lo, hi = int(r["lo"].min()), int(r["hi"].max())
    width = max((hi - lo + SKETCH_BINS) // SKETCH_BINS, 1)

    def partial(t: pa.Table) -> pd.DataFrame:
        x = cents_of(t)
        out = (pd.DataFrame({"cents": x, "n": 1})
               .groupby("cents", as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("cents", as_index=False)["n"].sum()
             .sort_values("cents").reset_index(drop=True))
        vals = g["cents"].to_numpy(np.int64)
        cnts = g["n"].to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])
        bins = (vals - lo) // width
        bdf = (pd.DataFrame({"b": bins, "n": cnts})
               .groupby("b", as_index=False)["n"].sum())
        bb = bdf["b"].to_numpy(np.int64)
        bn = bdf["n"].to_numpy(np.int64)
        bcum = bn.cumsum()
        rows = []
        for qpm in (500, 900, 990):
            rank = -(-qpm * n // 1000)  # ceil(q*N)
            exact = int(vals[np.searchsorted(cum, rank)])
            i = int(np.searchsorted(bcum, rank))
            below = int(bcum[i - 1]) if i else 0
            blo = lo + int(bb[i]) * width
            est = blo + width * (rank - below) // int(bn[i])
            rows.append((qpm, exact, est,
                         1_000_000 * abs(est - exact) // exact))
        return pd.DataFrame(rows, columns=[
            "q_permille", "exact_cents", "sketch_cents",
            "err_ppm"]).astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


SKETCH_AUDIT_SQL = """
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
           FROM orders),
rng AS (SELECT min(v) AS lo, max(v) AS hi,
               CAST(count(*) AS BIGINT) AS n FROM c),
w AS (SELECT greatest((hi - lo + %d) // %d, 1) AS width FROM rng),
q AS (SELECT unnest([500, 900, 990]) AS qpm),
rk AS (SELECT qpm, (qpm * rng.n + 999) // 1000 AS rank
       FROM q, rng),
ex AS (
  SELECT rk.qpm, min(t.v) AS exact_cents
  FROM rk JOIN (SELECT v, sum(1) OVER (ORDER BY v) AS cum
                FROM c) t ON t.cum >= rk.rank
  GROUP BY 1),
bh AS (SELECT (v - rng.lo) // w.width AS b,
              CAST(count(*) AS BIGINT) AS n
       FROM c, rng, w GROUP BY 1),
bc AS (SELECT b, n, sum(n) OVER (ORDER BY b) AS cum,
              coalesce(sum(n) OVER (ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS below
       FROM bh),
est AS (
  SELECT rk.qpm,
         min(rng.lo + bc.b * w.width
             + w.width * (rk.rank - bc.below) // bc.n)
           AS sketch_cents
  FROM rk, rng, w, bc
  WHERE bc.cum >= rk.rank AND bc.below < rk.rank
  GROUP BY 1)
SELECT ex.qpm AS q_permille, ex.exact_cents,
       CAST(est.sketch_cents AS BIGINT) AS sketch_cents,
       CAST(1000000 * abs(est.sketch_cents - ex.exact_cents)
            // ex.exact_cents AS BIGINT) AS err_ppm
FROM ex JOIN est ON est.qpm = ex.qpm
ORDER BY 1
""" % (SKETCH_BINS, SKETCH_BINS)


TS_GRID_SHIFT = 20  # Theil-Sen slopes on the 2^-20 grid


def orders_theil_sen_trend(sf_dir):
    """Theil-Sen robust trend of daily revenue (Theil '50 / Sen '68)
    — the median of all C(D,2) pairwise slopes, the trend estimate a
    single outlier day cannot move (the robust companion to
    events_value_trend's OLS and the CUSUM detector). Slopes are
    ratios, so the statistic is DEFINED on the 2⁻²⁰ grid with the
    sign peeled before flooring (sign·((|Δc| << 20) // Δd) —
    toward-zero in both engines; Python floors negatives where DuckDB
    truncates, the repo's recorded division hazard), and the median
    is the exact rank-(M+1)//2 order statistic of the grid values.

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner — zero shuffle; the single merge densifies the calendar
    and builds all pairwise slopes vectorized (D² int64 for this
    corpus' ~6½ years ≈ 46 MB — past ~10⁴ days switch to the
    two-pass radix selection over the slope grid)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        d = len(x)
        i, j = np.triu_indices(d, k=1)
        dc = x[j] - x[i]
        dd = (j - i).astype(np.int64)
        key = np.sign(dc) * ((np.abs(dc) << TS_GRID_SHIFT) // dd)
        key.sort()
        m = len(key)
        med = int(key[(m + 1) // 2 - 1])
        return pd.DataFrame({
            "n_days": pd.Series([d], dtype="int64"),
            "n_pairs": pd.Series([m], dtype="int64"),
            "slope_q20": pd.Series([med], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


THEIL_SEN_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
p AS (
  SELECT CASE WHEN b.c - a.c >= 0 THEN 1 ELSE -1 END
           * ((abs(b.c - a.c) * %d) // (b.d - a.d)) AS key
  FROM x a JOIN x b ON b.d > a.d),
r AS (SELECT key, row_number() OVER (ORDER BY key) AS rn,
             count(*) OVER () AS m
      FROM p)
SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_days,
       CAST(m AS BIGINT) AS n_pairs,
       CAST(key AS BIGINT) AS slope_q20
FROM r WHERE rn = (m + 1) // 2
""" % (1 << TS_GRID_SHIFT)


def orders_fulfillment_leadtime(sf_dir):
    """Order-to-first-ship lead time per priority — the fulfillment
    SLA report (does URGENT actually ship faster?): per order, lead =
    first shipdate − order date in days; per priority, the order
    count, EXACT median and p90 lead (rank (n+1)//2 and ⌈0.9·n⌉ order
    statistics read off the bounded day histogram — lead times live
    on a ~hundreds-of-days domain, so no radix pass is needed) and
    the max. Orders with no lineitems are out of scope by definition
    (nothing shipped), stated not hidden.

    Scale shape: both sides ride ONE orderkey-bucketed exchange —
    lineitem batches pre-combine to (okey → min ship day) partials
    (min is idempotent, the lossless combiner), orders rows carry
    (okey, order day, priority); an order finalizes in exactly one
    bucket, so each bucket joins locally and emits additive
    (priority, lead_days) cells; single bounded merge."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def prep_li(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = (pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "ship": d})
             .groupby("okey", as_index=False)["ship"].min())
        p["oday"] = np.int64(-1)
        p["pri"] = ""
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p[["okey", "ship", "oday", "pri", "_bucket"]].astype(
            {"okey": "int64", "ship": "int64", "oday": "int64",
             "_bucket": "int32"})

    def prep_od(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["o_orderkey"].to_numpy(),
                          "ship": np.int64(-1), "oday": d,
                          "pri": t["o_orderpriority"].to_pylist()})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "ship": "int64",
                         "oday": "int64", "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        ship = (g[g["ship"] >= 0]
                .groupby("okey", as_index=False)["ship"].min())
        orders = g[g["oday"] >= 0][["okey", "oday", "pri"]]
        j = orders.merge(ship, on="okey")
        if not len(j):
            return pd.DataFrame({"pri": pd.Series([], dtype=object),
                                 "lead": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        j["lead"] = j["ship"] - j["oday"]
        out = (j.groupby(["pri", "lead"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype({"lead": "int64", "n": "int64"})

    per_bucket = (li.map_batches(prep_li, batch_format="pyarrow")
                  .union(od.map_batches(prep_od,
                                        batch_format="pyarrow"))
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cells = df.groupby(["pri", "lead"], as_index=False)["n"].sum()
        rows = []
        for pri, g in cells.groupby("pri"):
            g = g.sort_values("lead")
            leads = g["lead"].to_numpy(np.int64)
            ns = g["n"].to_numpy(np.int64)
            cum = ns.cumsum()
            n = int(cum[-1])
            med = int(leads[np.searchsorted(cum, (n + 1) // 2)])
            # ceil(0.9n) written POSITIVELY: -(-9n//10) floors in
            # Python but truncates in DuckDB once negated
            p90 = int(leads[np.searchsorted(cum, (9 * n + 9) // 10)])
            rows.append((pri, n, med, p90, int(leads[-1])))
        return (pd.DataFrame(rows, columns=[
            "priority", "n_orders", "median_days", "p90_days",
            "max_days"]).sort_values("priority")
            .reset_index(drop=True)
            .astype({"n_orders": "int64", "median_days": "int64",
                     "p90_days": "int64", "max_days": "int64"}))

    return _merge_partials(per_bucket, merge)


LEADTIME_SQL = """
WITH s AS (
  SELECT l_orderkey AS okey,
         CAST(min(epoch_us(l_shipdate)) // 86400000000 AS BIGINT)
           AS ship
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o.o_orderpriority AS priority,
         s.ship - CAST(epoch_us(o.o_orderdate) // 86400000000
                       AS BIGINT) AS lead
  FROM orders o JOIN s ON s.okey = o.o_orderkey),
c AS (SELECT priority, lead, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY 1, 2),
w AS (SELECT priority, lead, n,
             sum(n) OVER (PARTITION BY priority ORDER BY lead)
               AS cum,
             sum(n) OVER (PARTITION BY priority) AS tot,
             max(lead) OVER (PARTITION BY priority) AS mx
      FROM c)
SELECT priority,
       CAST(max(tot) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN cum >= (tot + 1) // 2
                     THEN lead END) AS BIGINT) AS median_days,
       CAST(min(CASE WHEN cum >= (9 * tot + 9) // 10
                     THEN lead END) AS BIGINT) AS p90_days,
       CAST(max(mx) AS BIGINT) AS max_days
FROM w GROUP BY 1 ORDER BY 1
"""


LDIV_L = 3  # required distinct sensitive values per QI group


def doc_l_diversity(sf_dir):
    """l-diversity audit (Machanavajjhala '07) — the governance screen
    k-anonymity misses: a group can be large yet leak its SENSITIVE
    attribute if every member shares it (the homogeneity attack).
    QI = (source, length band), sensitive = lang; a group is safe iff
    it contains ≥ l distinct langs. Reports the census (groups,
    below-l groups, rows at risk, minimum diversity) plus the
    diversity histogram n_groups per distinct-lang count — the figure
    a privacy review plots.

    Scale shape: the (QI, lang) space is bounded (sources × bands ×
    5 langs), so per-batch count partials are a lossless combiner —
    zero shuffle; distinct-lang counts per QI finalize in the one
    merge block. Unbounded QIs ride one QI-bucketed exchange, the
    doc_k_anonymity contract."""
    ds = _read(sf_dir, "documents",
               columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "band": t["n_chars"].to_numpy() // KANON_BAND,
            "lang": t["lang"].to_pandas().astype(object)})
        out = (df.groupby(["source", "band", "lang"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return out.astype({"band": "int64", "n": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "band", "lang"], as_index=False)
             ["n"].sum())
        per_qi = (g.groupby(["source", "band"])
                  .agg(div=("lang", "nunique"), rows=("n", "sum")))
        low = per_qi[per_qi["div"] < LDIV_L]
        return pd.DataFrame({
            "n_groups": pd.Series([len(per_qi)], dtype="int64"),
            "low_div_groups": pd.Series([len(low)], dtype="int64"),
            "rows_at_risk": pd.Series([int(low["rows"].sum())],
                                      dtype="int64"),
            "min_diversity": pd.Series([int(per_qi["div"].min())],
                                       dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


L_DIVERSITY_SQL = """
WITH g AS (
  SELECT source, n_chars // %d AS band,
         CAST(count(DISTINCT lang) AS BIGINT) AS div,
         CAST(count(*) AS BIGINT) AS rows_
  FROM documents GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN div < %d THEN 1 ELSE 0 END) AS BIGINT)
         AS low_div_groups,
       CAST(coalesce(sum(CASE WHEN div < %d THEN rows_ END), 0)
            AS BIGINT) AS rows_at_risk,
       CAST(min(div) AS BIGINT) AS min_diversity
FROM g
""" % (KANON_BAND, LDIV_L, LDIV_L)


def orders_dow_anova(sf_dir):
    """One-way ANOVA effect size (η²) of weekday on order value —
    does the calendar EXPLAIN revenue variance, or merely wiggle it?
    η² = SS_between/SS_total, kept cross-engine exact by the
    declared per-term floor: num = Σ_d (N·S_d² // n_d) − S²,
    den = N·Σx² − S², η²_permille = 1000·num // den (sum-of-floors
    is the defined statistic — the events_chi2_independence
    discipline). The inferential companion to
    orders_dow_seasonality's descriptive index: a big index with
    η² ≈ 0 means the weekday 'pattern' is noise.

    Scale shape: bounded 7-cell (dow → n, Σx, Σx²) moment combiner —
    zero shuffle; Python-int merge (N·S_d² reaches ~10²⁷ at sf0.01),
    HUGEINT oracle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        s2 = cents * cents  # ≤ 3.6·10¹⁵ per row — fits int64
        # Σs2 per batch does NOT safely fit int64 (overflows past
        # ~2500 max-price rows), so the partial carries it split into
        # 26-bit-shifted halves whose per-batch sums stay bounded
        out = (pd.DataFrame({"dow": days % 7, "n": 1, "s": cents,
                             "s2h": s2 >> 26,
                             "s2l": s2 & ((1 << 26) - 1)})
               .groupby("dow", as_index=False)
               .agg(n=("n", "sum"), s=("s", "sum"),
                    s2h=("s2h", "sum"), s2l=("s2l", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # fold partials in Python ints: Σx² crosses 9.2·10¹⁸ (int64
        # max) already at sf0.01, so a pandas int64 groupby-sum wraps
        # silently (caught by the oracle at sf0.01, green at sf0.001)
        acc: dict[int, list[int]] = {}
        for dow, n, s, s2h, s2l in df[
                ["dow", "n", "s", "s2h", "s2l"]].itertuples(
                index=False):
            a = acc.setdefault(int(dow), [0, 0, 0])
            a[0] += int(n)
            a[1] += int(s)
            a[2] += (int(s2h) << 26) + int(s2l)
        ns = [a[0] for a in acc.values()]
        ss = [a[1] for a in acc.values()]
        N = sum(ns)
        S = sum(ss)
        sx2 = sum(a[2] for a in acc.values())
        num = sum(N * s * s // n for n, s in zip(ns, ss)) - S * S
        den = N * sx2 - S * S
        return pd.DataFrame({
            "n_orders": pd.Series([N], dtype="int64"),
            "eta2_permille": pd.Series([1000 * num // max(den, 1)],
                                       dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


DOW_ANOVA_SQL = """
WITH d AS (
  SELECT (CAST(epoch_us(o_orderdate) AS BIGINT)
          // 86400000000) % 7 AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
g AS (SELECT dow, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS s2
      FROM d GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(s) AS HUGEINT) AS st,
               CAST(sum(s2) AS HUGEINT) AS sx2 FROM g),
f AS (SELECT (SELECT sum(tot.nt * g.s * g.s // g.n)
              FROM g, tot) - tot.st * tot.st AS num,
             tot.nt * tot.sx2 - tot.st * tot.st AS den,
             tot.nt AS nt
      FROM tot)
SELECT CAST(nt AS BIGINT) AS n_orders,
       CAST(1000 * num // greatest(den, 1) AS BIGINT)
         AS eta2_permille
FROM f
"""


def orders_runs_test(sf_dir):
    """Wald-Wolfowitz runs test on daily revenue — the randomness
    audit that catches serial dependence a mean/variance summary
    hides (too FEW runs = trending/sticky days, too MANY =
    oscillation): days sign as above/below the exact daily-revenue
    median (equal-to-median days drop, the textbook rule), R = runs
    counted over the DENSE calendar, and the z² statistic kept
    integer by cross-multiplication: with e = R·n − (n + 2·n₊·n₋),
    z²_milli = 1000·e²·(n−1) // (2·n₊·n₋·(2·n₊·n₋ − n)) — no float
    mean/variance of R ever exists. The randomness sibling of
    orders_daily_acf1 (ACF measures linear lag-1; runs catch any
    sign-level stickiness).

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner — zero shuffle; the single merge densifies, takes the
    exact median by full sort of the ≤calendar-size daily array, and
    counts runs vectorized; Python-int statistic (e²·n outgrows int64
    past ~10⁶ days)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        s = np.sort(x)
        med = int(s[(len(s) + 1) // 2 - 1])  # lower median, exact
        signs = x[x != med] > med
        npos = int(signs.sum())
        nneg = len(signs) - npos
        n = npos + nneg
        runs = 1 + int((signs[1:] != signs[:-1]).sum()) if n else 0
        e = runs * n - (n + 2 * npos * nneg)
        den = 2 * npos * nneg * (2 * npos * nneg - n)
        z2 = 1000 * e * e * (n - 1) // max(den, 1)
        return pd.DataFrame({
            "n_days_used": pd.Series([n], dtype="int64"),
            "n_runs": pd.Series([runs], dtype="int64"),
            "n_pos": pd.Series([npos], dtype="int64"),
            "n_neg": pd.Series([nneg], dtype="int64"),
            "z2_milli": pd.Series([z2], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


RUNS_TEST_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
med AS (
  SELECT c AS m FROM
    (SELECT c, row_number() OVER (ORDER BY c) AS rn,
            count(*) OVER () AS n FROM x)
  WHERE rn = (n + 1) // 2),
s AS (SELECT d, CASE WHEN c > med.m THEN 1 ELSE 0 END AS sgn
      FROM x, med WHERE c <> med.m),
r AS (SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev FROM s),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sgn) AS BIGINT) AS npos,
         CAST(sum(CASE WHEN prev IS NULL OR sgn <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM r),
f AS (SELECT n, runs, npos, n - npos AS nneg,
             CAST(runs AS HUGEINT) * n
               - (n + 2 * CAST(npos AS HUGEINT) * (n - npos)) AS e,
             2 * CAST(npos AS HUGEINT) * (n - npos)
               * (2 * CAST(npos AS HUGEINT) * (n - npos) - n)
               AS den
      FROM agg)
SELECT n AS n_days_used, runs AS n_runs, npos AS n_pos,
       CAST(nneg AS BIGINT) AS n_neg,
       CAST(1000 * e * e * (n - 1) // greatest(den, 1) AS BIGINT)
         AS z2_milli
FROM f
"""


POWER_Z_SUM_MILLI = 2802  # z_{alpha/2}=1.960 + z_{beta}=0.842 (80% @ 5%)
POWER_MDE_PCT = 5         # detect a 5% lift


def events_power_analysis(sf_dir):
    """Experiment power analysis — the 'how long must this test run'
    number every platform computes before launch: required sample
    size per arm n = 2·(z_{α/2}+z_β)²·σ²/δ² for 80% power at 5%
    significance against a 5%-of-mean MDE, every term on a declared
    integer grid (z-sum 2802 milli; σ² = floor(10⁶·(N·Σx²−S²)/N²)
    milli²; δ = mean_milli // 20; ceil division for n). Closes the
    experimentation family: SRM gates validity, CUPED buys variance,
    this prices the runtime.

    Scale shape: one bounded three-moment combiner (n, Σx, Σx²) with
    the Σx² int64-split of orders_dow_anova — zero shuffle,
    Python-int merge, HUGEINT oracle."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        v = pc.cast(pc.round(t["value"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        v2 = v * v
        return pd.DataFrame({
            "n": [len(v)], "s": [int(v.sum())],
            "s2h": [int((v2 >> 26).sum())],
            "s2l": [int((v2 & ((1 << 26) - 1)).sum())]}
            ).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        s = int(df["s"].sum())
        s2 = (int(df["s2h"].sum()) << 26) + int(df["s2l"].sum())
        mean_milli = 1000 * s // n
        var_milli2 = 1_000_000 * (n * s2 - s * s) // (n * n)
        delta_milli = mean_milli // (100 // POWER_MDE_PCT)
        num = 2 * POWER_Z_SUM_MILLI * POWER_Z_SUM_MILLI * var_milli2
        den = max(1_000_000 * delta_milli * delta_milli, 1)
        # ceil written POSITIVELY: -(-a//b) floors in Python but
        # truncates in DuckDB (the recorded division hazard)
        n_req = (num + den - 1) // den
        return pd.DataFrame({
            "n_events": pd.Series([n], dtype="int64"),
            "mean_milli": pd.Series([mean_milli], dtype="int64"),
            "var_milli2": pd.Series([var_milli2], dtype="int64"),
            "delta_milli": pd.Series([delta_milli], dtype="int64"),
            "n_required_per_arm": pd.Series([n_req], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


POWER_SQL = """
WITH v AS (SELECT CAST(round(value) AS BIGINT) AS x FROM events),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS s2
      FROM v),
m AS (SELECT n, 1000 * s // n AS mean_milli,
             1000000 * (n * s2 - s * s) // (n * n) AS var_milli2
      FROM s),
f AS (SELECT n, mean_milli, var_milli2,
             mean_milli // %d AS delta_milli
      FROM m)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(mean_milli AS BIGINT) AS mean_milli,
       CAST(var_milli2 AS BIGINT) AS var_milli2,
       CAST(delta_milli AS BIGINT) AS delta_milli,
       CAST((2 * %d * %d * var_milli2
             + greatest(1000000 * delta_milli * delta_milli, 1) - 1)
            // greatest(1000000 * delta_milli * delta_milli, 1)
            AS BIGINT) AS n_required_per_arm
FROM f
""" % (100 // POWER_MDE_PCT, POWER_Z_SUM_MILLI, POWER_Z_SUM_MILLI)


BOT_CV2_FLAG_MILLI = 200  # CV² below this = suspiciously regular


def user_bot_score_census(sf_dir):
    """Bot/automation detection census — the abuse-team heuristic
    that a HUMAN's inter-event gaps are bursty (exponential gaps have
    CV² = 1) while scripted traffic is metronomic (CV² → 0): per user
    with ≥2 gaps, CV² of second-grid gaps as the exact integer
    cv2_milli = 1000·(k·Σg² − S²) // S², flagged below 200‰, and the
    output is the ≤51-cell histogram of 100‰ CV² bands plus the flag
    count — the census a rate-limiting review reads, never a
    per-user dump.

    Scale shape: (user, ts) rides the user_interarrival_histogram
    exchange; each bucket sorts within user, diffs, and reduces its
    users vectorized to bounded band cells (a user lives in one
    bucket, so cells are additive); single merge. Σg² fits int64 to
    ~10⁶ month-scale gaps per user."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same] // 1_000_000
        gu = u[1:][same]
        df = pd.DataFrame({"u": gu, "g": gaps, "g2": gaps * gaps})
        agg = (df.groupby("u")
               .agg(k=("g", "size"), s=("g", "sum"),
                    s2=("g2", "sum")))
        agg = agg[(agg["k"] >= 2) & (agg["s"] > 0)]
        k = agg["k"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        s2 = agg["s2"].to_numpy(np.int64)
        cv2 = 1000 * (k * s2 - s * s) // (s * s)
        band = np.minimum(cv2 // 100, 50)
        out = (pd.DataFrame({"band": band,
                             "flag": (cv2 < BOT_CV2_FLAG_MILLI)
                             .astype(np.int64)})
               .groupby("band", as_index=False)
               .agg(n_users=("band", "size"),
                    n_flagged=("flag", "sum")))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("band", as_index=False)
               .agg(n_users=("n_users", "sum"),
                    n_flagged=("n_flagged", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


BOT_CENSUS_SQL = """
WITH e AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts
  FROM events),
g AS (
  SELECT u, (ts - lag(ts) OVER (PARTITION BY u ORDER BY ts))
            // 1000000 AS gap
  FROM e),
a AS (
  SELECT u, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(gap) AS BIGINT) AS s,
         CAST(sum(gap * gap) AS BIGINT) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY 1),
c AS (
  SELECT least(CAST(1000 * (k * s2 - s * s) // (s * s) AS BIGINT)
               // 100, 50) AS band,
         CASE WHEN 1000 * (k * s2 - s * s) // (s * s) < %d
              THEN 1 ELSE 0 END AS flag
  FROM a WHERE k >= 2 AND s > 0)
SELECT band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(flag) AS BIGINT) AS n_flagged
FROM c GROUP BY 1 ORDER BY 1
""" % BOT_CV2_FLAG_MILLI


def brand_share_shift(sf_dir):
    """Brand share-shift report — the BI staple behind every 'who is
    winning the category' review: per brand, revenue share (permille)
    in the first vs second half of the shipdate range and the signed
    shift, computed on exact cents so ranking and signs replay
    bit-for-bit. The drift detector's per-dimension sibling:
    orders_price_drift says THAT the distribution moved; this says
    WHO gained.

    Scale shape: the part→brand map is the small dimension —
    materialized once and broadcast (the PIT-join discipline);
    lineitem then reduces map-side to bounded (brand, half) cent
    cells (≤ 25×2), zero shuffle, one merge block of permille
    arithmetic."""
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    brand_map = dict(zip(part["p_partkey"].astype(int),
                         part["p_brand"]))
    lookup = ray.put(brand_map)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        bm = _ray.get(lookup)
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        brands = [bm[int(k)] for k in t["l_partkey"].to_pylist()]
        out = (pd.DataFrame({"brand": brands,
                             "h": (d > mid).astype(np.int64),
                             "cents": cents})
               .groupby(["brand", "h"], as_index=False)["cents"]
               .sum())
        return out.astype({"h": "int64", "cents": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["brand", "h"])["cents"].sum()
        tot = {0: int(g.xs(0, level="h").sum()),
               1: int(g.xs(1, level="h").sum())}
        rows = []
        for brand in sorted({k[0] for k in g.index}):
            b0 = int(g.get((brand, 0), 0))
            b1 = int(g.get((brand, 1), 0))
            s0 = 1000 * b0 // max(tot[0], 1)
            s1 = 1000 * b1 // max(tot[1], 1)
            rows.append((brand, s0, s1, s1 - s0))
        return pd.DataFrame(rows, columns=[
            "brand", "share_before_permille", "share_after_permille",
            "shift_permille"]).astype(
            {"share_before_permille": "int64",
             "share_after_permille": "int64",
             "shift_permille": "int64"})

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


BRAND_SHIFT_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000)
          + max(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000))
         // 2 AS mid
  FROM lineitem),
b AS (
  SELECT p.p_brand AS brand,
         CASE WHEN CAST(epoch_us(l.l_shipdate) AS BIGINT)
                   // 86400000000 > rng.mid THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey, rng
  GROUP BY 1, 2),
tot AS (SELECT h, CAST(sum(cents) AS BIGINT) AS t FROM b GROUP BY 1),
w AS (
  SELECT br.brand,
         CAST(1000 * coalesce(b0.cents, 0)
              // greatest(t0.t, 1) AS BIGINT) AS s0,
         CAST(1000 * coalesce(b1.cents, 0)
              // greatest(t1.t, 1) AS BIGINT) AS s1
  FROM (SELECT DISTINCT brand FROM b) br
  LEFT JOIN b b0 ON b0.brand = br.brand AND b0.h = 0
  LEFT JOIN b b1 ON b1.brand = br.brand AND b1.h = 1
  CROSS JOIN (SELECT t FROM tot WHERE h = 0) t0
  CROSS JOIN (SELECT t FROM tot WHERE h = 1) t1)
SELECT brand, s0 AS share_before_permille,
       s1 AS share_after_permille,
       CAST(s1 - s0 AS BIGINT) AS shift_permille
FROM w ORDER BY brand
"""


def lang_tokenizer_fertility(sf_dir):
    """Tokenizer fertility per language — the LLM-pipeline statistic
    (tokens emitted per whitespace word) that decides whether a
    tokenizer taxes some languages more than others (the compression
    disparity every multilingual training report tables): the
    distributed-BPE tokenizer trains once on the corpus (bounded
    word-count exchange, the doc_bpe_tokens machinery), and fertility
    = 1000·Σ bpe_tokens // Σ words per lang, exact on the permille
    grid. The SQL oracle replays BPE training AND encoding through
    the unrolled-CTE oracle and aggregates the same ratio.

    Scale shape: merges broadcast once; the scoring pass is a
    per-actor-cached zero-shuffle encode that reduces map-side to
    bounded (lang → words, tokens) cells — text never leaves the map
    task; single merge block."""
    import ray

    from ...stages import bpe as bpestage

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"])
    merges = bpestage.train_bpe(docs, BPE_MERGES)
    ref = ray.put(merges)

    class Fertility:
        def __init__(self):
            self.merges = ray.get(ref)
            self._cache: dict = {}

        def _n(self, w: str) -> int:
            n = self._cache.get(w)
            if n is None:
                n = len(bpestage.apply_merges(w, self.merges))
                self._cache[w] = n
            return n

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cells: dict = {}
            for lang, text in zip(t["lang"].to_pylist(),
                                  t["text"].to_pylist()):
                words = bpestage._WORD_RE.findall(text or "")
                a = cells.setdefault(lang, [0, 0])
                a[0] += len(words)
                a[1] += sum(self._n(w) for w in words)
            return pd.DataFrame(
                [(k, v[0], v[1]) for k, v in cells.items()],
                columns=["lang", "w", "t"]).astype({"w": "int64",
                                                    "t": "int64"})

    per_batch = docs.map_batches(
        Fertility, batch_format="pyarrow",
        concurrency=bpestage._pool_size())

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("lang", as_index=False)
             .agg(n_words=("w", "sum"), n_bpe_tokens=("t", "sum"))
             .sort_values("lang").reset_index(drop=True))
        g["fertility_milli"] = (1000 * g["n_bpe_tokens"]
                                // g["n_words"].clip(lower=1))
        return g.astype({"n_words": "int64", "n_bpe_tokens": "int64",
                         "fertility_milli": "int64"})

    return _merge_partials(per_batch, merge)


FERTILITY_SQL = """
SELECT d.lang,
       CAST(sum(len(regexp_extract_all(d.text, '\\S+')))
            AS BIGINT) AS n_words,
       CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(1000 * sum(b.n_bpe_tokens)
            // greatest(sum(len(regexp_extract_all(d.text,
                                                   '\\S+'))), 1)
            AS BIGINT) AS fertility_milli
FROM documents d JOIN (%s) b ON b.doc_id = d.doc_id
GROUP BY 1 ORDER BY 1
""" % DOC_BPE_SQL


def orders_stl_strength(sf_dir):
    """Seasonality-strength decomposition (the STL-shaped measure
    Hyndman-Athanasopoulos ch. 3 popularized: F_s = 1 −
    Var(remainder)/Var(detrended)) of daily revenue — the one number
    that says whether the weekly pattern is STRUCTURE or noise,
    capping the time-series family (trend slope → CUSUM → ACF → runs
    → this). Every step is a declared integer grid: trend = the
    7-day centered moving average floored (edges dropped), seasonal
    s_w = the per-weekday mean of the detrended series with the SIGN
    PEELED before flooring (detrended values go negative — Python
    floors, DuckDB truncates, the recorded hazard), remainder =
    detrended − s_w, and F_s in permille from the two integer
    variance forms (n·Σe²−(Σe)² over n·Σr²−(Σr)²), clipped at 0.
    Also reports the seasonal amplitude max(s_w) − min(s_w) in cents.

    Scale shape: the bounded (day, cents) combiner — zero shuffle;
    the single merge densifies and runs the decomposition vectorized
    over the ≤calendar-size array; Python-int variances (Σe²
    outgrows int64 past ~10⁵ high-revenue days)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        if len(x) < 8:
            return pd.DataFrame({"n_days_used": [0],
                                 "strength_permille": [0],
                                 "seasonal_amplitude_cents": [0]}
                                ).astype("int64")
        k = np.ones(7, np.int64)
        trend = np.convolve(x, k, mode="valid") // 7  # x>=0: floor ok
        days = np.arange(lo + 3, hi - 2, dtype=np.int64)
        r = x[3:-3] - trend
        dows = days % 7
        s = {}
        for w in range(7):
            vals = r[dows == w]
            tot = int(vals.sum())
            n = len(vals)
            if n:
                sgn = 1 if tot >= 0 else -1
                s[w] = sgn * (abs(tot) // n)  # toward-zero, declared
            else:
                s[w] = 0
        e = r - np.asarray([s[int(w)] for w in dows], np.int64)
        n = len(r)
        sr = [int(v) for v in r]
        se = [int(v) for v in e]
        vr = n * sum(v * v for v in sr) - sum(sr) ** 2
        ve = n * sum(v * v for v in se) - sum(se) ** 2
        strength = max(0, 1000 - 1000 * ve // max(vr, 1))
        amp = max(s.values()) - min(s.values())
        return pd.DataFrame({
            "n_days_used": pd.Series([n], dtype="int64"),
            "strength_permille": pd.Series([strength], dtype="int64"),
            "seasonal_amplitude_cents": pd.Series([amp],
                                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


STL_STRENGTH_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
w AS (SELECT d, c,
             sum(c) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS k7
      FROM x),
r AS (SELECT d, d % 7 AS dow, c - s7 // 7 AS r
      FROM w WHERE k7 = 7),
s AS (SELECT dow,
             CASE WHEN sum(r) >= 0
                  THEN sum(r) // count(*)
                  ELSE -((-sum(r)) // count(*)) END AS sw
      FROM r GROUP BY 1),
e AS (SELECT r.r, r.r - s.sw AS e
      FROM r JOIN s ON s.dow = r.dow),
agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(r) AS HUGEINT) AS sr,
               CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sr2,
               CAST(sum(e) AS HUGEINT) AS se,
               CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS se2
        FROM e),
f AS (SELECT n, n * sr2 - sr * sr AS vr,
             n * se2 - se * se AS ve
      FROM agg)
SELECT CAST(n AS BIGINT) AS n_days_used,
       CAST(greatest(0, 1000 - 1000 * ve // greatest(vr, 1))
            AS BIGINT) AS strength_permille,
       CAST((SELECT max(sw) - min(sw) FROM s) AS BIGINT)
         AS seasonal_amplitude_cents
FROM f
"""


def kg_component_census(sf_dir):
    """Connectivity-health dashboard of the co-citation graph — the
    two numbers a web-graph report leads with: the GIANT-COMPONENT
    share (what fraction of total degree mass the largest connected
    component holds — the Broder-bowtie headline) and the
    fragmentation HHI of per-component degree mass (10⁶·Σ(d_c)² //
    (2m)² ppm — 10⁶ = one monolithic component, →0 = dust), plus the
    component count. Degree mass rather than node count weights
    components by their actual linkage.

    Scale shape: CC labels come from the existing hash-to-min
    distributed machinery; degrees join onto labels via bucket_join
    over materialized inputs; per-component degree sums finalize in
    ONE label-bucketed exchange whose buckets emit bounded partials
    (Σ(d_c)², max d_c, count — each additive/max-combinable because a
    component lives in exactly one bucket); Python-int merge
    (Σ(d_c)² outgrows int64 immediately at web scale)."""
    from ...stages import graph
    from ...stages.canonicalize import connected_components_distributed
    from ...stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"uri_a": t["a"], "uri_b": t["b"]})

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow")) \
        .materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()
    j = bucket_join(deg, labels, left_on="node", right_on="node",
                    suffix="_l")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        p = (df.groupby("label", as_index=False)["deg"].sum())
        from ...stages.graph import _hash64
        p["_bucket"] = (_hash64(p["label"].astype(str))
                        % np.uint64(64)).astype("int32")
        return p

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("label")["deg"].sum()
        vals = [int(v) for v in c]
        return pd.DataFrame({
            "sumsq_h": [sum(v * v for v in vals) >> 62],
            "sumsq_l": [sum(v * v for v in vals) & ((1 << 62) - 1)],
            "mx": [max(vals)], "nc": [len(vals)],
            "total": [sum(vals)]}).astype("int64")

    per_bucket = (j.map_batches(prep, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        sumsq = sum((int(h) << 62) + int(l) for h, l in
                    zip(df["sumsq_h"], df["sumsq_l"]))
        mx = int(df["mx"].max())
        nc = int(df["nc"].sum())
        total = int(df["total"].sum())  # = 2m
        return pd.DataFrame({
            "n_components": pd.Series([nc], dtype="int64"),
            "giant_share_permille": pd.Series(
                [1000 * mx // max(total, 1)], dtype="int64"),
            "fragmentation_hhi_ppm": pd.Series(
                [1_000_000 * sumsq // max(total * total, 1)],
                dtype="int64")})

    return _merge_partials(per_bucket, merge)


KG_COMPONENT_CENSUS_SQL = f"""
WITH RECURSIVE edges AS ({_CITE_EDGES_SQL}),
pairs AS (SELECT DISTINCT e1.dst AS a, e2.dst AS b
          FROM edges e1 JOIN edges e2
            ON e1.src = e2.src AND e1.dst < e2.dst),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
nds AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nds
  UNION
  SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
comp AS (
  SELECT cc.component, CAST(sum(deg.d) AS HUGEINT) AS dc
  FROM cc JOIN deg ON deg.node = cc.node
  GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS nc,
               CAST(max(dc) AS HUGEINT) AS mx,
               CAST(sum(dc * dc) AS HUGEINT) AS sumsq,
               CAST(sum(dc) AS HUGEINT) AS total
        FROM comp)
SELECT nc AS n_components,
       CAST(1000 * mx // greatest(total, 1) AS BIGINT)
         AS giant_share_permille,
       CAST(1000000 * sumsq // greatest(total * total, 1) AS BIGINT)
         AS fragmentation_hhi_ppm
FROM agg
"""


def customer_purchase_dispersion(sf_dir):
    """Purchase-count dispersion — the model-selection audit run
    before fitting a buy-till-you-die CLV model (BG/NBD assumes
    per-customer Poisson purchasing with Gamma heterogeneity, i.e.
    OVER-dispersed counts): the orders-per-customer histogram plus
    the exact dispersion index D_milli = 1000·(n·Σk² − (Σk)²) //
    (n·Σk) (Poisson ⇒ 1000; >1000 ⇒ the Gamma mixing NBD needs;
    <1000 ⇒ regular buyers, use a different model). The
    customer-side sibling of events_fano_overdispersion.

    Scale shape: per-batch (custkey → count) partials ride ONE
    custkey-bucketed exchange; buckets emit the bounded count
    histogram plus three moment cells (additive — a customer
    finalizes in one bucket); Python-int merge."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(), "n": 1})
             .groupby("c", as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        k = g.groupby("c")["n"].sum().to_numpy(np.int64)
        hist = (pd.DataFrame({"k": k})
                .groupby("k", as_index=False).size()
                .rename(columns={"size": "n_customers"}))
        hist["s"] = hist["k"] * hist["n_customers"]
        hist["s2"] = hist["k"] * hist["k"] * hist["n_customers"]
        return hist.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.groupby("k", as_index=False)
             .agg(n_customers=("n_customers", "sum"),
                  s=("s", "sum"), s2=("s2", "sum"))
             .sort_values("k").reset_index(drop=True))
        n = int(h["n_customers"].sum())
        s = int(h["s"].sum())
        s2 = int(h["s2"].sum())
        d = 1000 * (n * s2 - s * s) // max(n * s, 1)
        out = h[["k", "n_customers"]].copy()
        out["dispersion_milli"] = d
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


PURCHASE_DISPERSION_SQL = """
WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
           FROM orders GROUP BY 1),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(k) AS HUGEINT) AS s,
             CAST(sum(k * k) AS HUGEINT) AS s2
      FROM c)
SELECT c.k, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(1000 * (m.n * m.s2 - m.s * m.s)
            // greatest(m.n * m.s, 1) AS BIGINT)
         AS dispersion_milli
FROM c, m GROUP BY 1, 3 ORDER BY 1
"""


MARKUP_BAND_PERMILLE = 100  # 10%-wide markup bands


def part_markup_census(sf_dir):
    """Markup-vs-list-price audit — the procurement screen for lines
    sold off list: per lineitem, unit price on the exact milli grid
    (1000·cents // qty) against the part's retail list price, markup
    = 1000·unit_milli // retail_milli banded in 10% cells (band =
    markup // 100, capped at 30) — the census that surfaces both
    systematic underpricing and the fat tail of list-busting lines.

    Scale shape: the part→retail map is the small dimension,
    broadcast once (the brand_share_shift discipline); everything
    else is a zero-shuffle bounded ≤31-cell band census."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_retailprice"]).to_pandas()
    retail_milli = pc.cast(
        pc.round(pc.multiply(pa.array(part["p_retailprice"],
                                      type=pa.float64()),
                             pa.scalar(1000.0)),
                 round_mode="half_towards_infinity"),
        pa.int64()).to_numpy()
    retail = {int(k): int(v)
              for k, v in zip(part["p_partkey"], retail_milli)}
    lookup = ray.put(retail)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        rp = _ray.get(lookup)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = pc.cast(pc.round(t["l_quantity"],
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        unit_milli = 10 * cents // np.maximum(qty, 1)
        rr = np.asarray([rp[int(k)] for k in
                         t["l_partkey"].to_pylist()], np.int64)
        markup = 1000 * unit_milli // np.maximum(rr, 1)
        band = np.minimum(markup // MARKUP_BAND_PERMILLE, 30)
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n_lines"}))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("band", as_index=False)["n_lines"].sum()
                .sort_values("band").reset_index(drop=True)
                .astype("int64"))

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


MARKUP_CENSUS_SQL = """
WITH l AS (
  SELECT 10 * CAST(round(l_extendedprice * 100) AS BIGINT)
           // greatest(CAST(round(l_quantity) AS BIGINT), 1)
           AS unit_milli,
         CAST(round(p.p_retailprice * 1000) AS BIGINT) AS retail
  FROM lineitem JOIN part p ON p.p_partkey = lineitem.l_partkey),
b AS (SELECT least(1000 * unit_milli // greatest(retail, 1)
                   // %d, 30) AS band
      FROM l)
SELECT band, CAST(count(*) AS BIGINT) AS n_lines
FROM b GROUP BY 1 ORDER BY 1
""" % MARKUP_BAND_PERMILLE


SLA_DAYS = 365          # a line is compliant if shipped within a year
SLA_BAND_PERMILLE = 100  # 10%-wide compliance bands


def supplier_sla_compliance(sf_dir):
    """Per-supplier ship-SLA compliance census — the vendor-scorecard
    question (which suppliers actually ship inside the contracted
    window?) answered as a census, never a per-supplier dump: each
    line's lead = ship day − order day, compliant iff ≤ 365 days,
    per-supplier compliance = 1000·n_ok // n floored, and the output
    is the supplier count per 10%-compliance band plus each band's
    total line volume (so a review sees whether the laggards are
    low-volume noise or real exposure).

    Scale shape: lines join their order date through ONE
    orderkey-bucketed exchange (orders side carries (okey, day),
    lineitem side (okey, suppkey, ship day) — an order finalizes in
    one bucket); per-supplier (n, n_ok) partials are additive ACROSS
    okey buckets (the dimension is the bounded supplier table), so
    the second exchange is unnecessary — buckets emit supplier cells
    and the single merge scores and bands."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def prep_li(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                          "supp": t["l_suppkey"].to_numpy(),
                          "ship": d, "oday": np.int64(-1)})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "supp": "int64",
                         "ship": "int64", "oday": "int64",
                         "_bucket": "int32"})

    def prep_od(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["o_orderkey"].to_numpy(),
                          "supp": np.int64(-1),
                          "ship": np.int64(-1), "oday": d})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "supp": "int64",
                         "ship": "int64", "oday": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["oday"] >= 0][["okey", "oday"]]
        lines = g[g["supp"] >= 0][["okey", "supp", "ship"]]
        j = lines.merge(orders, on="okey")
        if not len(j):
            return pd.DataFrame({"supp": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "n_ok": pd.Series([], dtype="int64")})
        ok = ((j["ship"] - j["oday"]) <= SLA_DAYS).astype(np.int64)
        out = (pd.DataFrame({"supp": j["supp"].to_numpy(), "n": 1,
                             "n_ok": ok})
               .groupby("supp", as_index=False)
               .agg(n=("n", "sum"), n_ok=("n_ok", "sum")))
        return out.astype("int64")

    per_bucket = (li.map_batches(prep_li, batch_format="pyarrow")
                  .union(od.map_batches(prep_od,
                                        batch_format="pyarrow"))
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.groupby("supp", as_index=False)
             .agg(n=("n", "sum"), n_ok=("n_ok", "sum")))
        comp = 1000 * s["n_ok"].to_numpy(np.int64) \
            // s["n"].to_numpy(np.int64)
        band = np.minimum(comp // SLA_BAND_PERMILLE, 10)
        out = (pd.DataFrame({"band": band,
                             "n_lines": s["n"].to_numpy(np.int64)})
               .groupby("band", as_index=False)
               .agg(n_suppliers=("band", "size"),
                    n_lines=("n_lines", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


SLA_COMPLIANCE_SQL = """
WITH j AS (
  SELECT l.l_suppkey AS supp,
         CASE WHEN CAST(epoch_us(l.l_shipdate) AS BIGINT)
                   // 86400000000
                 - CAST(epoch_us(o.o_orderdate) AS BIGINT)
                   // 86400000000 <= %d
              THEN 1 ELSE 0 END AS ok
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
s AS (SELECT supp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ok) AS BIGINT) AS n_ok
      FROM j GROUP BY 1),
b AS (SELECT least(1000 * n_ok // n // %d, 10) AS band, n FROM s)
SELECT band, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(n) AS BIGINT) AS n_lines
FROM b GROUP BY 1 ORDER BY 1
""" % (SLA_DAYS, SLA_BAND_PERMILLE)


def cm_error_audit(sf_dir):
    """Count-Min point-query error audit — the measurement that
    completes the sketch-audit family (bloom_fpr_audit for
    membership, orderkey_join_sample_estimate for sampling,
    orders_quantile_sketch_audit for quantiles, this for
    frequencies): every user's CM estimate (min over the 4 hash
    rows) against the true count, error = est − true (one-sided ≥ 0
    by construction — a NEGATIVE error anywhere means the sketch is
    broken), reported as the error histogram in absolute counts plus
    n_exact and the max overestimate. The 64-wide sketch is
    deliberately small so collisions bite at test scales — the ε
    tradeoff as data, the bloom_fpr discipline.

    Scale shape: pass 1 builds the bounded 4×64 cell table (fixed
    size at any input) and broadcasts it; pass 2 computes true
    per-user counts through ONE user-bucketed exchange and probes the
    broadcast sketch map-side of the merge, emitting bounded error
    cells (a user finalizes in one bucket)."""
    import ray

    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["user_id"].value_counts()
        rows, cols, cnts = [], [], []
        for u, n in vc.items():
            for r in range(CM_DEPTH):
                rows.append(r)
                cols.append(_cm_col(r, u))
                cnts.append(int(n))
        return (pd.DataFrame({"row_id": rows, "col_id": cols,
                              "cnt": cnts})
                .groupby(["row_id", "col_id"], as_index=False)
                ["cnt"].sum().astype("int64"))

    cells_df = (ds.map_batches(cell_partial, batch_format="pandas")
                .to_pandas()
                .groupby(["row_id", "col_id"])["cnt"].sum())
    cells = {(int(r), int(c)): int(v)
             for (r, c), v in cells_df.items()}
    ref = ray.put(cells)

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(), "n": 1})
             .groupby("u", as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_errors(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        cm = _ray.get(ref)
        per = g.groupby("u", as_index=False)["n"].sum()
        errs = []
        for u, true in per.itertuples(index=False):
            est = min(cm.get((r, _cm_col(r, int(u))), 0)
                      for r in range(CM_DEPTH))
            errs.append(int(est) - int(true))
        out = (pd.DataFrame({"err": errs})
               .groupby("err", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_errors, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.groupby("err", as_index=False)["n_users"].sum()
             .sort_values("err").reset_index(drop=True))
        return h.astype("int64")

    return _merge_partials(per_bucket, merge)


CM_ERROR_SQL = """
WITH cells AS (
  SELECT r.row_id,
         CAST(concat('0x', substr(md5(concat(r.row_id, ':',
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT)
           %% 64 AS col_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(0, %d)) AS row_id) r
  GROUP BY 1, 2),
truth AS (SELECT user_id AS u, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
est AS (
  SELECT t.u, t.n,
         min(c.cnt) AS est
  FROM truth t
  CROSS JOIN (SELECT unnest(generate_series(0, %d)) AS row_id) r
  JOIN cells c ON c.row_id = r.row_id
    AND c.col_id = CAST(concat('0x', substr(md5(concat(r.row_id,
          ':', CAST(t.u AS VARCHAR))), 1, 15)) AS BIGINT) %% 64
  GROUP BY 1, 2)
SELECT CAST(est - n AS BIGINT) AS err,
       CAST(count(*) AS BIGINT) AS n_users
FROM est GROUP BY 1 ORDER BY 1
""" % (CM_DEPTH - 1, CM_DEPTH - 1)


def orderkey_gap_audit(sf_dir):
    """Keyspace-fragmentation audit — the sequence-health check an
    ingest pipeline runs on a supposedly-dense surrogate key (gaps =
    lost batches, compaction debt, or deliberate sharded allocators):
    key count, span, missing-key count, the LARGEST gap and the gap
    COUNT, all without a global sort — the distributed max-gap
    decomposition: keys hash into fixed-width RANGE buckets
    (key // W), each bucket sorts locally and emits (min, max, n,
    max internal gap, internal gap count); the bounded merge splices
    consecutive buckets' boundary gaps (range bucketing makes bucket
    order == key order, the orders_zorder locality argument). The
    ordinal sibling of lineitem_sequence_audit's per-order taxonomy.

    Scale shape: one min/max pre-pass sizes W; ONE range-bucketed
    exchange of batch-local distinct keys; bounded per-bucket summary
    rows; single merge."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def rng(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        return pd.DataFrame({"lo": pd.Series([int(k.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(k.max())],
                                             dtype="int64")})

    r = ds.map_batches(rng, batch_format="pyarrow").to_pandas()
    lo, hi = int(r["lo"].min()), int(r["hi"].max())
    width = max((hi - lo) // 64 + 1, 1)

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"k": t["o_orderkey"].to_numpy()}) \
            .drop_duplicates()
        p["_bucket"] = ((p["k"] - lo) // width).astype("int32")
        return p.astype({"k": "int64", "_bucket": "int32"})

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(g["k"].drop_duplicates().to_numpy(np.int64))
        d = np.diff(k)
        return pd.DataFrame({
            "bmin": [int(k[0])], "bmax": [int(k[-1])],
            "n": [len(k)],
            "mx_gap": [int(d.max()) if len(d) else 0],
            "n_gaps": [int((d > 1).sum())]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_summary, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values("bmin").reset_index(drop=True)
        n = int(s["n"].sum())
        mx = int(s["mx_gap"].max())
        ng = int(s["n_gaps"].sum())
        bmax = s["bmax"].to_numpy(np.int64)
        bmin = s["bmin"].to_numpy(np.int64)
        if len(s) > 1:
            bound = bmin[1:] - bmax[:-1]
            mx = max(mx, int(bound.max()))
            ng += int((bound > 1).sum())
        span = int(bmax[-1]) - int(bmin[0]) + 1
        return pd.DataFrame({
            "n_keys": pd.Series([n], dtype="int64"),
            "span": pd.Series([span], dtype="int64"),
            "n_missing": pd.Series([span - n], dtype="int64"),
            "max_gap": pd.Series([mx], dtype="int64"),
            "n_gaps": pd.Series([ng], dtype="int64")})

    return _merge_partials(per_bucket, merge)


ORDERKEY_GAP_SQL = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
d AS (SELECT k, k - lag(k) OVER (ORDER BY k) AS gap FROM k),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(max(k) - min(k) + 1 AS BIGINT) AS span,
               CAST(coalesce(max(gap), 0) AS BIGINT) AS mx,
               CAST(sum(CASE WHEN gap > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ng
        FROM d)
SELECT n AS n_keys, span,
       CAST(span - n AS BIGINT) AS n_missing,
       mx AS max_gap, ng AS n_gaps
FROM agg
"""


def events_stickiness_ratio(sf_dir):
    """DAU/WAU stickiness — the product-health headline (what share
    of the weekly audience shows up on a given day; ~1000 = a daily
    habit, ~143 = once-a-week usage): per day, the exact distinct
    daily actives, the exact trailing-7-day distinct actives, and
    1000·DAU // WAU, reported for every day with a full 7-day
    history. Distinct counts are not additive across days, so WAU is
    computed by the events_sliding_dau expansion: a user-day
    contributes to exactly 7 trailing windows — bounded 7×, dedup per
    (user, window) restores exactness.

    Scale shape: batch-local distinct (user, day) pairs ride ONE
    user-bucketed exchange; each bucket dedups exactly (a user lives
    in one bucket), emits (day, dau) partials and the 7-window
    expansion's (window, wau) partials — both additive across
    buckets; one bounded merge joins the two calendars."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "d": (t["ts"].to_numpy().astype("datetime64[us]")
                  .astype(np.int64) // 86_400_000_000)})
        p = p.drop_duplicates()
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "d": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["u", "d"]].drop_duplicates()
        dau = (g.groupby("d", as_index=False).size()
               .rename(columns={"d": "day", "size": "n"}))
        dau["kind"] = 0
        u = np.repeat(g["u"].to_numpy(np.int64), 7)
        w = (np.repeat(g["d"].to_numpy(np.int64), 7)
             + np.tile(np.arange(7, dtype=np.int64), len(g)))
        wau = (pd.DataFrame({"u": u, "day": w}).drop_duplicates()
               .groupby("day", as_index=False).size()
               .rename(columns={"size": "n"}))
        wau["kind"] = 1
        out = pd.concat([dau[["day", "kind", "n"]],
                         wau[["day", "kind", "n"]]],
                        ignore_index=True)
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["day", "kind"], as_index=False)["n"].sum())
        dau = g[g["kind"] == 0].set_index("day")["n"]
        wau = g[g["kind"] == 1].set_index("day")["n"]
        lo = int(dau.index.min())
        rows = []
        for day in sorted(dau.index):
            if day < lo + 6:
                continue  # no full 7-day history
            d = int(dau[day])
            w = int(wau.get(day, 0))
            rows.append((int(day), d, w, 1000 * d // max(w, 1)))
        return pd.DataFrame(rows, columns=[
            "day", "dau", "wau", "stickiness_permille"]
            ).astype("int64")

    return _merge_partials(per_bucket, merge)


STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
  FROM events),
dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        FROM ud GROUP BY 1),
wexp AS (
  SELECT DISTINCT ud.u, ud.d + off.o AS day
  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)
    off),
wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
        FROM wexp GROUP BY 1),
lo AS (SELECT min(d) AS lo FROM ud)
SELECT dau.day, dau.dau, wau.wau,
       CAST(1000 * dau.dau // greatest(wau.wau, 1) AS BIGINT)
         AS stickiness_permille
FROM dau JOIN wau ON wau.day = dau.day, lo
WHERE dau.day >= lo.lo + 6
ORDER BY dau.day
"""


SLO_ERROR_BUDGET_PERMILLE = 10  # 99% success SLO


def events_slo_burn_rate(sf_dir):
    """SLO error-budget burn rate — the SRE alerting primitive
    (Google SRE workbook ch. 5): against a 99% success objective,
    each day's burn rate = (error share) / (budget share), exact as
    burn_milli = 1000·1000·n_err // (n·B) with B = 10‰ — 1000 means
    burning budget exactly at the sustainable rate, 14,000 is the
    classic page-now threshold. Reports every day plus the
    cumulative budget consumed month-to-date (window = the data's
    calendar), so both fast-burn and slow-burn alerts read off one
    table.

    Scale shape: bounded (day → n, n_err) count partials — lossless
    per-batch combiner, zero shuffle; the single merge computes
    rates and the running cumulative."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        err = (pc.equal(t["event_type"], pa.scalar("error"))
               .to_numpy(zero_copy_only=False).astype(np.int64))
        out = (pd.DataFrame({"day": days, "n": 1, "n_err": err})
               .groupby("day", as_index=False)
               .agg(n=("n", "sum"), n_err=("n_err", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)
             .agg(n=("n", "sum"), n_err=("n_err", "sum"))
             .sort_values("day").reset_index(drop=True))
        b = SLO_ERROR_BUDGET_PERMILLE
        g["burn_milli"] = (1_000_000 * g["n_err"]
                           // (g["n"].clip(lower=1) * b))
        cum_err = g["n_err"].cumsum()
        cum_n = g["n"].cumsum()
        g["cum_budget_used_milli"] = (1_000_000 * cum_err
                                      // (cum_n.clip(lower=1) * b))
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


SLO_BURN_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM events GROUP BY 1)
SELECT day, n, n_err,
       CAST(1000000 * n_err // (greatest(n, 1) * %d) AS BIGINT)
         AS burn_milli,
       CAST(1000000 * sum(n_err) OVER (ORDER BY day)
            // (greatest(sum(n) OVER (ORDER BY day), 1) * %d)
            AS BIGINT) AS cum_budget_used_milli
FROM d ORDER BY day
""" % (SLO_ERROR_BUDGET_PERMILLE, SLO_ERROR_BUDGET_PERMILLE)


def brand_return_rate(sf_dir):
    """Return rate by brand — the vendor-quality scorecard (which
    brands come back?): per brand, line count, returned-line count
    (l_returnflag = 'R') and the exact permille rate, plus the rate's
    delta from the global rate so over/under-performers read
    directly. Returns are drawn independently of brand in this
    synthesizer, so deltas are binomial noise — the exact noise is
    the data (the fairness-audit stance).

    Scale shape: part→brand broadcast once (the brand_share_shift
    discipline); bounded (brand → n, n_ret) cells, zero shuffle, one
    merge block."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    brand_map = dict(zip(part["p_partkey"].astype(int),
                         part["p_brand"]))
    lookup = ray.put(brand_map)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_returnflag"])

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        bm = _ray.get(lookup)
        ret = (pc.equal(t["l_returnflag"], pa.scalar("R"))
               .to_numpy(zero_copy_only=False).astype(np.int64))
        brands = [bm[int(k)] for k in t["l_partkey"].to_pylist()]
        out = (pd.DataFrame({"brand": brands, "n": 1, "n_ret": ret})
               .groupby("brand", as_index=False)
               .agg(n=("n", "sum"), n_ret=("n_ret", "sum")))
        return out.astype({"n": "int64", "n_ret": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("brand", as_index=False)
             .agg(n=("n", "sum"), n_ret=("n_ret", "sum"))
             .sort_values("brand").reset_index(drop=True))
        glob = 1000 * int(g["n_ret"].sum()) // int(g["n"].sum())
        g["rate_permille"] = 1000 * g["n_ret"] // g["n"]
        g["delta_permille"] = g["rate_permille"] - glob
        return g.astype({"n": "int64", "n_ret": "int64",
                         "rate_permille": "int64",
                         "delta_permille": "int64"})

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


BRAND_RETURN_SQL = """
WITH b AS (
  SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l.l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ret
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1),
g AS (SELECT CAST(1000 * sum(n_ret) // sum(n) AS BIGINT) AS glob
      FROM b)
SELECT brand, n, n_ret,
       CAST(1000 * n_ret // n AS BIGINT) AS rate_permille,
       CAST(1000 * n_ret // n - g.glob AS BIGINT) AS delta_permille
FROM b, g ORDER BY brand
"""


BOUNCE_GAP_US = 1_800_000_000  # the 30-min session rule


def events_bounce_rate(sf_dir):
    """Session bounce rate per day — the engagement headline next to
    stickiness: sessions under the 30-minute-gap rule (the
    events_sessions contract), a BOUNCE is a single-event session,
    each session dated by its first event's day, and the report is
    per-day sessions, bounces and the exact permille rate.

    Scale shape: (user, ts) rides the interarrival user-bucketed
    exchange; each bucket sorts within user, marks session starts
    vectorized (gap > 30 min), derives per-session lengths from
    consecutive start indices (a user's events co-locate, so session
    boundaries never cross buckets) and emits bounded (day →
    sessions, bounces) cells; single merge."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gap = np.ones(len(g), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > BOUNCE_GAP_US
        start = new_user | gap
        idx = np.flatnonzero(start)
        lengths = np.diff(np.append(idx, len(g)))
        days = ts[idx] // 86_400_000_000
        out = (pd.DataFrame({"day": days,
                             "n_sessions": 1,
                             "n_bounces": (lengths == 1)
                             .astype(np.int64)})
               .groupby("day", as_index=False)
               .agg(n_sessions=("n_sessions", "sum"),
                    n_bounces=("n_bounces", "sum")))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)
             .agg(n_sessions=("n_sessions", "sum"),
                  n_bounces=("n_bounces", "sum"))
             .sort_values("day").reset_index(drop=True))
        g["bounce_permille"] = (1000 * g["n_bounces"]
                                // g["n_sessions"].clip(lower=1))
        return g.astype("int64")

    return _merge_partials(per_bucket, merge)


BOUNCE_RATE_SQL = """
WITH e AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts
  FROM events),
m AS (
  SELECT u, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY u ORDER BY ts)
                   IS NULL
                OR ts - lag(ts) OVER (PARTITION BY u ORDER BY ts)
                   > %d
              THEN 1 ELSE 0 END AS start
  FROM e),
s AS (SELECT u, ts, sum(start) OVER (PARTITION BY u ORDER BY ts)
             AS sid
      FROM m),
sess AS (
  SELECT u, sid, min(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS len
  FROM s GROUP BY 1, 2),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bounces
      FROM sess GROUP BY 1)
SELECT day, n_sessions, n_bounces,
       CAST(1000 * n_bounces // greatest(n_sessions, 1) AS BIGINT)
         AS bounce_permille
FROM d ORDER BY day
""" % BOUNCE_GAP_US


# --- probabilistic record linkage + nonparametric two-sample tests ---

# Fellegi–Sunter field weights (Fellegi & Sunter '69): agreement
# weight 1000·log2(m/u), disagreement 1000·log2((1−m)/(1−u)), with
# DECLARED (m, u) per comparator — the standard deterministic
# scorecard configuration (weight *estimation* via EM is a separate
# operator family). Integer milli-bits so both engines share literals.
import math as _math

FS_FIELDS = (
    # (field, m, u)
    ("nation", 0.95, 0.04),
    ("segment", 0.90, 0.20),
    ("acctbal", 0.80, 0.02),
    ("namechar", 0.85, 0.10),
)
FS_AGREE = tuple(int(_math.floor(1000 * _math.log2(m / u) + 0.5))
                 for _, m, u in FS_FIELDS)
FS_DISAGREE = tuple(
    int(_math.floor(1000 * _math.log2((1 - m) / (1 - u)) - 0.5) + 1)
    for _, m, u in FS_FIELDS)
FS_BLOCK = 1000          # er_blocking_quality's custkey // 1000 scheme
FS_BAL_CENTS = 10_000    # acctbal comparator: within 100 dollars
FS_UPPER, FS_LOWER = 2000, 0   # match / possible thresholds (milli)


def er_fellegi_sunter(sf_dir):
    """Fellegi–Sunter probabilistic record linkage over the blocked
    customer comparison space — THE classical ER decision model
    (Fellegi & Sunter '69; Christen '12 ch.6): every candidate pair
    (same custkey // 1000 block, the audited er_blocking_quality
    scheme) scores the sum of per-field agreement/disagreement
    log-odds weights, and the three-way decision (match ≥ upper,
    possible in between, non-match < lower) censuses by the 4-bit
    agreement PATTERN — so the output is the bounded 2⁴-row pattern
    table (pattern, score, decision, n_pairs), not the pair list.

    Comparators: nation-key equality, market-segment equality,
    account balance within ±100.00, and last-name-char equality.
    Weights are integer milli-bits (shared literals with SQL).

    Scale shape: pairs enumerate INSIDE block-bucketed groups (a
    block lives in one bucket; block size is capped by the scheme at
    FS_BLOCK, so per-bucket work is C(1000,2) vectorized comparisons
    max per block — never the N² space); each bucket emits bounded
    ≤16-cell pattern partials, one coalesced merge."""
    buckets = _exchange_buckets(sf_dir, "customer")

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["c_acctbal"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        names = t["c_name"].to_pylist()
        df = pd.DataFrame({
            "ck": t["c_custkey"].to_numpy().astype(np.int64),
            "nat": t["c_nationkey"].to_numpy().astype(np.int64),
            "seg": pd.Series(t["c_mktsegment"].to_pylist(),
                             dtype=object),
            "bal": cents,
            "lc": pd.Series([n[-1] for n in names], dtype=object)})
        df["blk"] = df["ck"] // FS_BLOCK
        h = pd.util.hash_pandas_object(df["blk"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    # pattern census WITHOUT materializing the pair frame: for every
    # subset S of the three EQUALITY comparators (nat, seg, lastchar),
    # count A_S = pairs agreeing on all of S (Σ C(group,2) over the
    # S-projection — pure value_counts) and B_S = those pairs ALSO
    # within the balance band (one global searchsorted over a
    # group-offset-keyed sorted balance array — the groups can't
    # overlap because the offset spacing exceeds any balance span);
    # inclusion–exclusion (Möbius over the subset lattice) then
    # yields the exact 16-cell census. Replaces the per-block
    # C(1000,2)-row pandas merge (measured 1.5 s → sub-second at
    # sf0.1); equality is pinned by the brute-force pair test.
    _EQ_BITS = (0, 1, 3)        # nat, seg, lastchar pattern bits
    _BAND_SPACING = np.int64(1) << 40  # >> any balance span

    def _band_pairs_grouped(grp_ids: np.ndarray,
                            bal: np.ndarray) -> int:
        """# unordered pairs within one grp sharing |Δbal| ≤ cap."""
        # int64 packing headroom: gid * 2^40 + bal overflows (and
        # silently corrupts counts) once gid ≥ 2^23 — fail loudly
        # instead (a census batch never holds that many groups; if
        # one ever does, widen the packing or drop to object dtype).
        if len(grp_ids) and int(grp_ids.max()) >= (1 << 23):
            raise OverflowError(
                "FS band census: %d composite groups exceeds the "
                "int64 packing headroom (2^23)" % (int(grp_ids.max()) + 1))
        order = np.lexsort((bal, grp_ids))
        keyed = (grp_ids[order].astype(np.int64) * _BAND_SPACING
                 + bal[order])
        lo = np.searchsorted(keyed, keyed - FS_BAL_CENTS, side="left")
        return int((np.arange(len(keyed)) - lo).sum())

    def pattern_census(g: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        nat = g["nat"].to_numpy(np.int64)
        seg = pd.factorize(g["seg"])[0].astype(np.int64)
        lc = pd.factorize(g["lc"])[0].astype(np.int64)
        blk = pd.factorize(g["blk"])[0].astype(np.int64)
        bal = g["bal"].to_numpy(np.int64)
        eq = (nat, seg, lc)
        counts = np.zeros(16, dtype=object)

        A = {}
        B = {}
        for r in range(4):
            for S in combinations(range(3), r):
                # composite group id: block + the S fields
                gid = blk.copy()
                for f in S:
                    col = eq[f]
                    gid = gid * np.int64(col.max() + 2) + col
                _, gid = np.unique(gid, return_inverse=True)
                sizes = np.bincount(gid)
                A[S] = int((sizes.astype(object)
                            * (sizes - 1) // 2).sum())
                B[S] = _band_pairs_grouped(gid, bal)

        for r in range(4):
            for P in combinations(range(3), r):
                pset = set(P)
                e_p = b_p = 0
                for rr in range(len(P), 4):
                    for T in combinations(range(3), rr):
                        if pset <= set(T):
                            sign = (-1) ** (len(T) - len(P))
                            e_p += sign * A[T]
                            b_p += sign * B[T]
                bits = sum(1 << _EQ_BITS[f] for f in P)
                counts[bits | 4] += b_p
                counts[bits] += e_p - b_p

        mask = np.array([int(c) > 0 for c in counts])
        return pd.DataFrame({
            "pattern": pd.Series(np.arange(16)[mask], dtype="int64"),
            "n_pairs": pd.Series([int(c) for c in counts[mask]],
                                 dtype="int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("pattern", as_index=False)["n_pairs"].sum()
             .sort_values("pattern").reset_index(drop=True))
        pat = g["pattern"].to_numpy(np.int64)
        score = np.zeros(len(g), np.int64)
        for i in range(len(FS_FIELDS)):
            agree = (pat >> i) & 1
            score += np.where(agree, FS_AGREE[i], FS_DISAGREE[i])
        decision = np.where(
            score >= FS_UPPER, "match",
            np.where(score >= FS_LOWER, "possible", "non_match"))
        return pd.DataFrame({
            "pattern": pat,
            "score_milli": score.astype("int64"),
            "decision": pd.Series(decision, dtype=object),
            "n_pairs": g["n_pairs"].astype("int64")})

    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_nationkey",
                        "c_acctbal", "c_mktsegment"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(pattern_census, batch_format="pandas"))
    return _merge_partials(per_bucket, final)


FELLEGI_SUNTER_SQL = """
WITH c AS (
  SELECT c_custkey AS ck, c_custkey // %d AS blk,
         c_nationkey AS nat, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         substr(c_name, length(c_name), 1) AS lc
  FROM customer),
p AS (
  SELECT (CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END)
         + (CASE WHEN a.seg = b.seg THEN 2 ELSE 0 END)
         + (CASE WHEN abs(a.bal - b.bal) <= %d THEN 4 ELSE 0 END)
         + (CASE WHEN a.lc = b.lc THEN 8 ELSE 0 END) AS pattern
  FROM c a JOIN c b ON a.blk = b.blk AND a.ck < b.ck),
g AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n_pairs
      FROM p GROUP BY 1),
s AS (
  SELECT pattern,
         (CASE WHEN pattern %% 2 = 1 THEN %d ELSE %d END)
         + (CASE WHEN (pattern // 2) %% 2 = 1 THEN %d ELSE %d END)
         + (CASE WHEN (pattern // 4) %% 2 = 1 THEN %d ELSE %d END)
         + (CASE WHEN (pattern // 8) %% 2 = 1 THEN %d ELSE %d END)
           AS score_milli,
         n_pairs
  FROM g)
SELECT CAST(pattern AS BIGINT) AS pattern,
       CAST(score_milli AS BIGINT) AS score_milli,
       CASE WHEN score_milli >= %d THEN 'match'
            WHEN score_milli >= %d THEN 'possible'
            ELSE 'non_match' END AS decision,
       n_pairs
FROM s ORDER BY pattern
""" % (FS_BLOCK, FS_BAL_CENTS,
       FS_AGREE[0], FS_DISAGREE[0], FS_AGREE[1], FS_DISAGREE[1],
       FS_AGREE[2], FS_DISAGREE[2], FS_AGREE[3], FS_DISAGREE[3],
       FS_UPPER, FS_LOWER)


def _two_sample_hist(sf_dir):
    """Shared combiner for the nonparametric two-sample tests:
    full-value histogram of lineitem extendedprice cents split by
    returnflag = 'R' vs not — per-batch (value → n_r, n_o) partials,
    folded driver-side (bounded by the price grid's distinct cents,
    the orders_quantile_sketch_audit domain argument)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        is_r = pc.equal(t["l_returnflag"], pa.scalar("R")).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"v": cents,
                           "n_r": is_r.astype(np.int64),
                           "n_o": (~is_r).astype(np.int64)})
        return (df.groupby("v", as_index=False)[["n_r", "n_o"]].sum()
                .astype("int64"))

    h = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("v", as_index=False)[["n_r", "n_o"]].sum()
         .sort_values("v").reset_index(drop=True))
    return h


def lineitem_ks_test(sf_dir):
    """Exact two-sample Kolmogorov–Smirnov statistic — returned
    ('R') vs non-returned lineitem price distributions, the
    distribution-shift gate every data-quality and drift system
    runs before trusting a comparison (Smirnov '39). D is computed
    on the integer grid with NO floats: D_num = max over the merged
    support of |cum_r·n_o − cum_o·n_r| (the CDF difference
    cross-multiplied), reported as d_ppm = 10⁶·D_num // (n_r·n_o)
    plus the smallest cents value attaining the max — every quantity
    replayable by SQL window cumulative sums.

    Scale shape: one zero-shuffle pass of (value → n_r, n_o)
    per-batch partials over a bounded price-grid domain; the walk is
    a driver-side vectorized cumsum over the folded histogram."""
    h = _two_sample_hist(sf_dir)
    n_r = int(h["n_r"].sum())
    n_o = int(h["n_o"].sum())
    cum_r = h["n_r"].cumsum().to_numpy()
    cum_o = h["n_o"].cumsum().to_numpy()
    # Python-int object arithmetic: cum·n products near 2^63 at
    # ~10^9-row samples
    diff = np.abs(cum_r.astype(object) * n_o
                  - cum_o.astype(object) * n_r)
    i = int(np.argmax(diff))
    d_num = int(diff[i])
    return pd.DataFrame({
        "n_returned": pd.Series([n_r], dtype="int64"),
        "n_other": pd.Series([n_o], dtype="int64"),
        "d_ppm": pd.Series([10**6 * d_num // (n_r * n_o)],
                           dtype="int64"),
        "at_cents": pd.Series([int(h["v"].iloc[i])], dtype="int64")})


KS_TEST_SQL = """
WITH x AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem),
h AS (SELECT v, CAST(sum(r) AS BIGINT) AS n_r,
             CAST(sum(1 - r) AS BIGINT) AS n_o
      FROM x GROUP BY 1),
n AS (SELECT CAST(sum(n_r) AS HUGEINT) AS nr,
             CAST(sum(n_o) AS HUGEINT) AS no FROM h),
c AS (SELECT v,
             sum(n_r) OVER (ORDER BY v) AS cr,
             sum(n_o) OVER (ORDER BY v) AS co
      FROM h),
d AS (SELECT v, abs(CAST(cr AS HUGEINT) * n.no
                    - CAST(co AS HUGEINT) * n.nr) AS dn
      FROM c, n),
best AS (SELECT v, dn FROM d ORDER BY dn DESC, v ASC LIMIT 1)
SELECT CAST(n.nr AS BIGINT) AS n_returned,
       CAST(n.no AS BIGINT) AS n_other,
       CAST(1000000 * best.dn // (n.nr * n.no) AS BIGINT) AS d_ppm,
       best.v AS at_cents
FROM n, best
"""


def lineitem_mann_whitney(sf_dir):
    """Exact Mann–Whitney U (Wilcoxon rank-sum) for the same two
    samples — the rank-based location test that, unlike KS, targets
    stochastic dominance. Midranks handle the heavy price-grid ties
    exactly by keeping DOUBLED rank sums integer: for a value with
    cum_before items and n_v ties, 2·midrank = 2·cum_before + n_v +
    1, so R1_twice = Σ (2·cum_before + n_v + 1)·n_r(v) and
    U1_twice = R1_twice − n₁(n₁+1) — all integers, SQL-replayable
    with one window pass. Output: both U's (doubled), and the
    rank-biserial effect size in exact ppm
    (r = 1 − 2U1/(n₁n₂) → ppm on doubled U's).

    Scale shape: identical zero-shuffle bounded-domain histogram
    combiner as lineitem_ks_test."""
    h = _two_sample_hist(sf_dir)
    n_r = int(h["n_r"].sum())
    n_o = int(h["n_o"].sum())
    n_v = (h["n_r"] + h["n_o"]).to_numpy()
    cum_before = np.concatenate(([0], n_v.cumsum()[:-1]))
    two_mid = (2 * cum_before.astype(object) + n_v.astype(object) + 1)
    r1_twice = int((two_mid * h["n_r"].to_numpy().astype(object)).sum())
    u1_twice = r1_twice - n_r * (n_r + 1)
    u2_twice = 2 * n_r * n_o - u1_twice
    rb_ppm = 10**6 - 10**6 * u1_twice // (n_r * n_o)
    return pd.DataFrame({
        "n_returned": pd.Series([n_r], dtype="int64"),
        "n_other": pd.Series([n_o], dtype="int64"),
        "u1_twice": pd.Series([u1_twice], dtype="int64"),
        "u2_twice": pd.Series([u2_twice], dtype="int64"),
        "rank_biserial_ppm": pd.Series([rb_ppm], dtype="int64")})


MANN_WHITNEY_SQL = """
WITH x AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem),
h AS (SELECT v, CAST(sum(r) AS BIGINT) AS n_r,
             CAST(sum(1 - r) AS BIGINT) AS n_o
      FROM x GROUP BY 1),
n AS (SELECT CAST(sum(n_r) AS HUGEINT) AS nr,
             CAST(sum(n_o) AS HUGEINT) AS no FROM h),
c AS (SELECT v, n_r, n_o,
             coalesce(sum(n_r + n_o) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cb
      FROM h),
r1 AS (SELECT CAST(sum((2 * CAST(cb AS HUGEINT) + n_r + n_o + 1)
                       * n_r) AS HUGEINT) AS r1t FROM c),
u AS (SELECT r1.r1t - n.nr * (n.nr + 1) AS u1t,
             2 * n.nr * n.no - (r1.r1t - n.nr * (n.nr + 1)) AS u2t
      FROM r1, n)
SELECT CAST(n.nr AS BIGINT) AS n_returned,
       CAST(n.no AS BIGINT) AS n_other,
       CAST(u.u1t AS BIGINT) AS u1_twice,
       CAST(u.u2t AS BIGINT) AS u2_twice,
       CAST(1000000 - 1000000 * u.u1t // (n.nr * n.no) AS BIGINT)
         AS rank_biserial_ppm
FROM n, u
"""


# --- rank correlation + sequential testing ---------------------------

def part_kendall_tau(sf_dir):
    """Exact Kendall τ-b between part size and retail price — the
    rank-correlation audit (Kendall '38) that, unlike Pearson/Theil-
    Sen's slope, is invariant to any monotone transform of either
    axis and handles the heavy size-grid ties via the τ-b
    tie-correction. Computed WITHOUT the O(N²) pair join: the joint
    (size, price-cents) histogram is a sufficient statistic, and
    concordant/discordant/tie counts read off its 2-D prefix sums —
    all exact Python-int arithmetic (pair counts reach N² long
    before 100 TB). τ-b's denominator √((N₀−Tx)(N₀−Ty)) uses
    isqrt; SQL replays with floor(sqrt()) (exact below 2^53, the
    orders_jackknife_variance precedent) over a cells×cells
    inequality join (cells ≈ distinct sizes × prices — bounded by
    the catalog grid, never by row count).

    Scale shape: per-batch (size, cents) → count partials — a
    bounded-domain lossless combiner, zero shuffle; the prefix-sum
    walk is driver-side vectorized over the folded cells."""
    import math

    ds = _read(sf_dir, "part", columns=["p_size", "p_retailprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["p_retailprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"sz": t["p_size"].to_numpy()
                           .astype(np.int64), "v": cents})
        return (df.groupby(["sz", "v"], as_index=False).size()
                .rename(columns={"size": "n"}).astype("int64"))

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby(["sz", "v"], as_index=False)["n"]
             .sum().sort_values(["sz", "v"]).reset_index(drop=True))
    n_total = int(cells["n"].sum())
    n0 = n_total * (n_total - 1) // 2
    # ties per axis
    tx = sum(int(g) * (int(g) - 1) // 2
             for g in cells.groupby("sz")["n"].sum())
    ty = sum(int(g) * (int(g) - 1) // 2
             for g in cells.groupby("v")["n"].sum())
    # concordant/discordant via the strictly-less prefix walk:
    # iterate size groups in order, maintaining per-value cumulative
    # counts of all SMALLER sizes
    conc = disc = 0
    seen = {}           # value -> count over smaller sizes
    seen_vals = []      # sorted distinct values seen
    seen_counts = []
    for sz, g in cells.groupby("sz", sort=True):
        vs = g["v"].to_numpy()
        ns = g["n"].to_numpy()
        if seen_vals:
            sv = np.asarray(seen_vals, dtype=np.int64)
            sc = np.asarray(seen_counts, dtype=object)
            cum = np.cumsum(sc)
            total_seen = int(cum[-1])
            lo = np.searchsorted(sv, vs, side="left")
            hi = np.searchsorted(sv, vs, side="right")
            below = np.where(lo > 0, cum[lo - 1], 0)
            upto = np.where(hi > 0, cum[hi - 1], 0)
            for i in range(len(vs)):
                conc += int(ns[i]) * int(below[i])
                disc += int(ns[i]) * (total_seen - int(upto[i]))
        for v, n in zip(vs, ns):
            if v in seen:
                seen[v] += int(n)
            else:
                seen[v] = int(n)
        seen_vals = sorted(seen)
        seen_counts = [seen[v] for v in seen_vals]
    num = conc - disc
    den = math.isqrt((n0 - tx) * (n0 - ty))
    tau_ppm = (1 if num >= 0 else -1) * (10**6 * abs(num) // max(den, 1))
    return pd.DataFrame({
        "n_parts": pd.Series([n_total], dtype="int64"),
        "n_concordant": pd.Series([conc], dtype="int64"),
        "n_discordant": pd.Series([disc], dtype="int64"),
        "ties_size": pd.Series([tx], dtype="int64"),
        "ties_price": pd.Series([ty], dtype="int64"),
        "tau_b_ppm": pd.Series([tau_ppm], dtype="int64")})


KENDALL_TAU_SQL = """
WITH cells AS (
  SELECT p_size AS sz,
         CAST(round(p_retailprice * 100) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2),
n AS (SELECT CAST(sum(n) AS HUGEINT) AS nt FROM cells),
cd AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN (a.sz < b.sz AND a.v < b.v)
                           THEN CAST(a.n AS HUGEINT) * b.n END), 0)
         AS HUGEINT) AS conc,
    CAST(coalesce(sum(CASE WHEN (a.sz < b.sz AND a.v > b.v)
                           THEN CAST(a.n AS HUGEINT) * b.n END), 0)
         AS HUGEINT) AS disc
  FROM cells a JOIN cells b
    ON a.sz < b.sz),
tx AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1) // 2) AS HUGEINT)
         AS t FROM (SELECT sum(n) AS s FROM cells GROUP BY sz)),
ty AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1) // 2) AS HUGEINT)
         AS t FROM (SELECT sum(n) AS s FROM cells GROUP BY v)),
z AS (
  SELECT n.nt, cd.conc, cd.disc, tx.t AS tx, ty.t AS ty,
         n.nt * (n.nt - 1) // 2 AS n0
  FROM n, cd, tx, ty),
z2 AS (
  SELECT *, (n0 - tx) * (n0 - ty) AS x,
         CAST(floor(sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)))
              AS HUGEINT) AS r
  FROM z),
z3 AS (
  -- exact isqrt past 2^53: correct the double sqrt within +/-2
  SELECT *, r + (CASE WHEN (r + 2) * (r + 2) <= x THEN 2
                      WHEN (r + 1) * (r + 1) <= x THEN 1
                      WHEN r * r <= x THEN 0
                      WHEN (r - 1) * (r - 1) <= x THEN -1
                      ELSE -2 END) AS den
  FROM z2)
SELECT CAST(nt AS BIGINT) AS n_parts,
       CAST(conc AS BIGINT) AS n_concordant,
       CAST(disc AS BIGINT) AS n_discordant,
       CAST(tx AS BIGINT) AS ties_size,
       CAST(ty AS BIGINT) AS ties_price,
       CAST((CASE WHEN conc >= disc THEN 1 ELSE -1 END)
            * (1000000 * abs(conc - disc) // greatest(den, 1))
            AS BIGINT) AS tau_b_ppm
FROM z3
"""


# Wald SPRT (Wald '45): H0 error-rate p0 vs H1 p1, alpha = beta =
# 0.05 — per-event log-likelihood ratios and the decision bound as
# integer milli-nats (literals shared with SQL).
SPRT_P0_PERMILLE, SPRT_P1_PERMILLE = 100, 250
import math as _m

SPRT_LLR_ERR = int(_m.floor(
    1000 * _m.log(SPRT_P1_PERMILLE / SPRT_P0_PERMILLE) + 0.5))
SPRT_LLR_OK = -int(_m.floor(
    1000 * _m.log((1000 - SPRT_P0_PERMILLE)
                  / (1000 - SPRT_P1_PERMILLE)) + 0.5))
SPRT_BOUND_MILLI = int(_m.floor(1000 * _m.log(0.95 / 0.05) + 0.5))


def events_sprt_decision(sf_dir):
    """Wald's Sequential Probability Ratio Test over the event
    stream's daily error rate — the OPTIMAL sequential test (Wald
    '45: fewest expected samples at fixed α, β), i.e. the math under
    every modern 'stop the experiment early' system: cumulative
    log-likelihood ratio of H1 (error rate 25%) vs H0 (10%) in exact
    integer milli-nats (per-event LLR literals shared with SQL),
    walked day by day until it crosses ±ln((1−β)/α) ≈ ±2944 milli.
    Output: the decision, the crossing day, days observed, and the
    final cumulative LLR.

    Scale shape: bounded (day → n, n_err) count partials — zero
    shuffle; the sequential walk is a driver-side cumsum over the
    bounded daily table (sequential tests are inherently ordered —
    the DATA pass is still one streaming scan)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        err = (pc.equal(t["event_type"], pa.scalar("error"))
               .to_numpy(zero_copy_only=False).astype(np.int64))
        out = (pd.DataFrame({"day": days, "n": 1, "n_err": err})
               .groupby("day", as_index=False)
               .agg(n=("n", "sum"), n_err=("n_err", "sum")))
        return out.astype("int64")

    d = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("day", as_index=False)
         .agg(n=("n", "sum"), n_err=("n_err", "sum"))
         .sort_values("day").reset_index(drop=True))
    llr = (d["n_err"].to_numpy(np.int64) * SPRT_LLR_ERR
           + (d["n"] - d["n_err"]).to_numpy(np.int64) * SPRT_LLR_OK)
    cum = np.cumsum(llr.astype(object))
    crossing = np.where((cum >= SPRT_BOUND_MILLI)
                        | (cum <= -SPRT_BOUND_MILLI))[0]
    if len(crossing):
        i = int(crossing[0])
        decision = ("accept_h1" if int(cum[i]) >= SPRT_BOUND_MILLI
                    else "accept_h0")
        cross_day = int(d["day"].iloc[i])
    else:
        decision, cross_day = "continue", -1
    return pd.DataFrame({
        "decision": pd.Series([decision], dtype=object),
        "crossing_day": pd.Series([cross_day], dtype="int64"),
        "days_observed": pd.Series([len(d)], dtype="int64"),
        "llr_final_milli": pd.Series([int(cum[-1]) if len(cum) else 0],
                                     dtype="int64")})


SPRT_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM events GROUP BY 1),
c AS (
  SELECT day,
         sum(n_err * %d + (n - n_err) * %d)
           OVER (ORDER BY day) AS cum
  FROM d),
x AS (SELECT min(day) AS cross_day FROM c
      WHERE cum >= %d OR cum <= -%d),
f AS (SELECT cum AS final_cum FROM c ORDER BY day DESC LIMIT 1),
cc AS (SELECT c.cum AS cross_cum FROM c, x WHERE c.day = x.cross_day)
SELECT CASE WHEN x.cross_day IS NULL THEN 'continue'
            WHEN (SELECT cross_cum FROM cc) >= %d THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(coalesce(x.cross_day, -1) AS BIGINT) AS crossing_day,
       CAST((SELECT count(*) FROM d) AS BIGINT) AS days_observed,
       CAST(f.final_cum AS BIGINT) AS llr_final_milli
FROM x, f
""" % (SPRT_LLR_ERR, SPRT_LLR_OK, SPRT_BOUND_MILLI, SPRT_BOUND_MILLI,
       SPRT_BOUND_MILLI)


# Gopher quality rules (Rae et al. '21 appendix A1.1, the four rules
# evaluable on a single-line corpus; the bullet/ellipsis line-ratio
# rules are trivially satisfied by line-free synthetic text and are
# documented out of scope here).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3, 10      # mean word length bounds
GOPHER_SYM_PERMILLE = 100                  # '#'/'...' per word <= 10%
GOPHER_STOPWORDS = ("the", "and", "of", "to", "in")
GOPHER_MIN_STOPWORDS = 2


def doc_gopher_rules(sf_dir):
    """Gopher's document-quality rule set (Rae et al. '21 — the
    named heuristic filter most pretraining pipelines start from),
    per document with a per-rule FLAG MASK so the census of failure
    modes is auditable, not just the surviving set:

    bit 1 — word count in [50, 100k];
    bit 2 — mean word length in [3, 10] (exact integer grid:
            lo·n_words ≤ n_chars ≤ hi·n_words, chars = non-space);
    bit 4 — symbol-to-word ratio ('#' plus '...') ≤ 10% (exact
            permille cross-multiply);
    bit 8 — ≥ 2 distinct required stopwords present (word-boundary
            match, the Gopher "stop word" guard).

    pass = all four bits set. Zero shuffle: a stateless vectorized
    map; output one row per document."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stop_res = [(w, _re.compile(r"\b%s\b" % w))
                for w in GOPHER_STOPWORDS]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        texts = df["text"].fillna("").tolist()
        n_words = np.asarray([len(t.split()) for t in texts],
                             dtype=np.int64)
        n_chars = np.asarray(
            [len(t) - sum(map(t.count, (" ", "\t", "\n", "\r")))
             for t in texts], dtype=np.int64)
        n_sym = np.asarray(
            [t.count("#") + t.count("...") for t in texts],
            dtype=np.int64)
        n_stop = np.asarray(
            [sum(1 for _, rx in stop_res if rx.search(t))
             for t in texts], dtype=np.int64)
        b1 = ((n_words >= GOPHER_MIN_WORDS)
              & (n_words <= GOPHER_MAX_WORDS))
        b2 = ((GOPHER_MWL_LO * n_words <= n_chars)
              & (n_chars <= GOPHER_MWL_HI * n_words))
        b4 = 1000 * n_sym <= GOPHER_SYM_PERMILLE * n_words
        b8 = n_stop >= GOPHER_MIN_STOPWORDS
        mask = (b1.astype(np.int64) | (b2.astype(np.int64) << 1)
                | (b4.astype(np.int64) << 2)
                | (b8.astype(np.int64) << 3))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": n_words,
            "rule_mask": mask.astype("int64"),
            "passes": (mask == 15).astype("int64")})

    return ds.map_batches(score, batch_format="pandas")


GOPHER_SQL = """
WITH x AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
           AS n_words,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
           AS n_chars,
         CAST((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', '')))
                // 3 AS BIGINT) AS n_sym,
         CAST((CASE WHEN regexp_matches(text, '\\bthe\\b')
                    THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(text, '\\band\\b')
                    THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(text, '\\bof\\b')
                    THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(text, '\\bto\\b')
                    THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(text, '\\bin\\b')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM documents),
m AS (
  SELECT doc_id, n_words,
         (CASE WHEN n_words >= %d AND n_words <= %d
               THEN 1 ELSE 0 END)
         + (CASE WHEN %d * n_words <= n_chars
                  AND n_chars <= %d * n_words THEN 2 ELSE 0 END)
         + (CASE WHEN 1000 * n_sym <= %d * n_words
               THEN 4 ELSE 0 END)
         + (CASE WHEN n_stop >= %d THEN 8 ELSE 0 END) AS rule_mask
  FROM x)
SELECT doc_id, n_words, CAST(rule_mask AS BIGINT) AS rule_mask,
       CAST(CASE WHEN rule_mask = 15 THEN 1 ELSE 0 END AS BIGINT)
         AS passes
FROM m
""" % (GOPHER_MIN_WORDS, GOPHER_MAX_WORDS, GOPHER_MWL_LO,
       GOPHER_MWL_HI, GOPHER_SYM_PERMILLE, GOPHER_MIN_STOPWORDS)


# EM estimation init + schedule (Winkler '88 / Herzog et al. '07
# ch. 9: EM over the agreement-pattern census under conditional
# independence). Fixed-point milli probabilities, floor division —
# deterministic and SQL-replayable by unrolling.
FS_EM_ITERS = 3
FS_EM_P0 = 100                       # initial match proportion (milli)
FS_EM_M0, FS_EM_U0 = 800, 200        # initial per-field m / u (milli)


def _fs_em_step(census, p, m, u):
    """One EM iteration over the 16-cell census. All quantities are
    integer milli probabilities; weights scale to 1000^5 (< 2^63 per
    term, Python ints regardless)."""
    nfields = len(m)
    gs = []
    for pattern, n in census:
        wm, wu = p, 1000 - p
        for i in range(nfields):
            bit = (pattern >> i) & 1
            wm *= m[i] if bit else 1000 - m[i]
            wu *= u[i] if bit else 1000 - u[i]
        g = 1000 * wm // max(wm + wu, 1)
        gs.append((pattern, n, g))
    n_total = sum(n for _, n in census)
    ng = sum(n * g for _, n, g in gs)
    nu = sum(n * (1000 - g) for _, n, g in gs)
    p_new = min(max(ng // max(n_total, 1), 1), 999)
    m_new, u_new = [], []
    for i in range(nfields):
        num_m = sum(n * g for pat, n, g in gs if (pat >> i) & 1)
        num_u = sum(n * (1000 - g) for pat, n, g in gs
                    if (pat >> i) & 1)
        m_new.append(min(max(1000 * num_m // max(ng, 1), 1), 999))
        u_new.append(min(max(1000 * num_u // max(nu, 1), 1), 999))
    return p_new, m_new, u_new


_FS_CENSUS_CACHE: dict = {}


def _fs_census(sf_dir):
    """(pattern, n_pairs) list, computed once per sf_dir — the
    blocked pattern pass is the expensive part and both
    er_fellegi_sunter's decision table and the EM estimator consume
    the same sufficient statistic (the _KG_CACHE discipline)."""
    if sf_dir not in _FS_CENSUS_CACHE:
        census_df = er_fellegi_sunter(sf_dir).to_pandas()
        _FS_CENSUS_CACHE[sf_dir] = [
            (int(r["pattern"]), int(r["n_pairs"]))
            for _, r in census_df.iterrows()]
    return _FS_CENSUS_CACHE[sf_dir]


def er_fs_em_weights(sf_dir):
    """EM ESTIMATION of the Fellegi–Sunter parameters (Winkler '88;
    Herzog/Scheuren/Winkler '07 ch. 9) — the companion to
    ``er_fellegi_sunter``'s fixed scorecard: the (match proportion p,
    per-field m- and u-probabilities) that maximize the likelihood of
    the observed 4-bit agreement-pattern census under conditional
    independence, via FS_EM_ITERS deterministic fixed-point EM steps
    (integer milli probabilities, floor division, [1, 999] clamps) —
    so both engines land on identical integers and the SQL oracle
    simply unrolls the iterations over the 16-row census.

    Scale shape: the pattern census is the SUFFICIENT STATISTIC —
    the only thing EM ever touches — so the distributed work is
    exactly er_fellegi_sunter's block-bucketed pattern pass; the EM
    loop is driver arithmetic over ≤16 rows."""
    census = _fs_census(sf_dir)
    p, m, u = FS_EM_P0, [FS_EM_M0] * 4, [FS_EM_U0] * 4
    for _ in range(FS_EM_ITERS):
        p, m, u = _fs_em_step(census, p, m, u)
    cols = {"p_milli": p}
    for i, f in enumerate(FS_FIELDS):
        cols["m_%s" % f[0]] = m[i]
        cols["u_%s" % f[0]] = u[i]
    return pd.DataFrame({k: pd.Series([v], dtype="int64")
                         for k, v in cols.items()})


def _fs_em_sql(iters: int = FS_EM_ITERS) -> str:
    """Unrolled EM over the census — one CTE pair (gK: per-pattern
    posterior; pK: single-row params) per iteration, every division a
    floor over non-negative HUGEINTs so DuckDB's // matches Python."""
    # the census CTEs come from FELLEGI_SUNTER_SQL's c/p/g chain
    base = """
WITH c AS (
  SELECT c_custkey AS ck, c_custkey // %d AS blk,
         c_nationkey AS nat, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         substr(c_name, length(c_name), 1) AS lc
  FROM customer),
pairs AS (
  SELECT (CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END)
         + (CASE WHEN a.seg = b.seg THEN 2 ELSE 0 END)
         + (CASE WHEN abs(a.bal - b.bal) <= %d THEN 4 ELSE 0 END)
         + (CASE WHEN a.lc = b.lc THEN 8 ELSE 0 END) AS pattern
  FROM c a JOIN c b ON a.blk = b.blk AND a.ck < b.ck),
cen AS (SELECT pattern, CAST(count(*) AS HUGEINT) AS n
        FROM pairs GROUP BY 1),
p0 AS (SELECT CAST(%d AS HUGEINT) AS p,
              CAST(%d AS HUGEINT) AS m0, CAST(%d AS HUGEINT) AS m1,
              CAST(%d AS HUGEINT) AS m2, CAST(%d AS HUGEINT) AS m3,
              CAST(%d AS HUGEINT) AS u0, CAST(%d AS HUGEINT) AS u1,
              CAST(%d AS HUGEINT) AS u2, CAST(%d AS HUGEINT) AS u3)
""" % (FS_BLOCK, FS_BAL_CENTS, FS_EM_P0,
       FS_EM_M0, FS_EM_M0, FS_EM_M0, FS_EM_M0,
       FS_EM_U0, FS_EM_U0, FS_EM_U0, FS_EM_U0)
    ctes = []
    for k in range(1, iters + 1):
        prev = "p%d" % (k - 1)
        factors_m = " * ".join(
            "(CASE WHEN (cen.pattern // %d) %% 2 = 1 THEN %s.m%d"
            " ELSE 1000 - %s.m%d END)" % (1 << i, prev, i, prev, i)
            for i in range(4))
        factors_u = " * ".join(
            "(CASE WHEN (cen.pattern // %d) %% 2 = 1 THEN %s.u%d"
            " ELSE 1000 - %s.u%d END)" % (1 << i, prev, i, prev, i)
            for i in range(4))
        ctes.append(
            "g%d AS (SELECT cen.pattern, cen.n,\n"
            "  1000 * (%s.p * %s)\n"
            "  // greatest(%s.p * %s + (1000 - %s.p) * %s, 1) AS g\n"
            "  FROM cen, %s)"
            % (k, prev, factors_m, prev, factors_m, prev, factors_u,
               prev))
        m_exprs = []
        for i in range(4):
            m_exprs.append(
                "least(greatest(1000 * sum(CASE WHEN (pattern // %d)"
                " %% 2 = 1 THEN n * g ELSE 0 END)"
                " // greatest(sum(n * g), 1), 1), 999) AS m%d"
                % (1 << i, i))
            m_exprs.append(
                "least(greatest(1000 * sum(CASE WHEN (pattern // %d)"
                " %% 2 = 1 THEN n * (1000 - g) ELSE 0 END)"
                " // greatest(sum(n * (1000 - g)), 1), 1), 999) AS u%d"
                % (1 << i, i))
        ctes.append(
            "p%d AS (SELECT least(greatest(sum(n * g)"
            " // greatest(sum(n), 1), 1), 999) AS p,\n  %s\n  FROM g%d)"
            % (k, ",\n  ".join(m_exprs), k))
    names = [f[0] for f in FS_FIELDS]
    sel = ["CAST(p AS BIGINT) AS p_milli"]
    for i, nm in enumerate(names):
        sel.append("CAST(m%d AS BIGINT) AS m_%s" % (i, nm))
        sel.append("CAST(u%d AS BIGINT) AS u_%s" % (i, nm))
    return (base + ",\n" + ",\n".join(ctes)
            + "\nSELECT %s FROM p%d" % (", ".join(sel), iters))


FS_EM_SQL = _fs_em_sql()


# --- forecasting / vocabulary / SPC ----------------------------------

CROSTON_ALPHA_DEN = 8  # smoothing alpha = 1/8, fixed-point


def orders_croston_demand(sf_dir):
    """Croston's method for INTERMITTENT demand (Croston '72 — the
    named forecaster for sparse series where SES over zeros
    systematically under-forecasts): separate exponential smoothing
    of the nonzero demand SIZES and of the INTER-DEMAND intervals,
    forecast = size / interval. Fixed-point integer recursions
    (alpha = 1/CROSTON_ALPHA_DEN, toward-zero adjustment division so
    DuckDB's // agrees on negative deltas), initialized z = first
    demand, p = 1 — so both engines replay the identical state
    sequence and the SQL oracle is a linear recursive CTE over the
    demand-day rows.

    Scale shape: the daily demand series is a bounded (day → cents)
    combiner — zero shuffle; the recursion is inherently sequential
    and runs driver-side over the bounded day table (the SPRT
    precedent)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"day": days, "cents": cents})
               .groupby("day", as_index=False)["cents"].sum())
        return out.astype("int64")

    d = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("day", as_index=False)["cents"].sum()
         .sort_values("day").reset_index(drop=True))
    d = d[d["cents"] > 0].reset_index(drop=True)

    def tz_div(delta: int, den: int) -> int:
        return delta // den if delta >= 0 else -((-delta) // den)

    days = d["day"].to_numpy(np.int64)
    xs = d["cents"].to_numpy(np.int64)
    z = int(xs[0])
    p = 1
    for k in range(1, len(xs)):
        gap = int(days[k] - days[k - 1])
        z = z + tz_div(int(xs[k]) - z, CROSTON_ALPHA_DEN)
        p = p + tz_div(gap - p, CROSTON_ALPHA_DEN)
    return pd.DataFrame({
        "n_demand_days": pd.Series([len(xs)], dtype="int64"),
        "z_cents": pd.Series([z], dtype="int64"),
        "p_days": pd.Series([p], dtype="int64"),
        "forecast_milli_cents_per_day": pd.Series(
            [1000 * z // max(p, 1)], dtype="int64")})


CROSTON_SQL = """
WITH RECURSIVE d AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1 HAVING sum(round(o_totalprice * 100)) > 0),
r AS (SELECT day, cents,
             row_number() OVER (ORDER BY day) AS rn,
             lag(day) OVER (ORDER BY day) AS prev_day
      FROM d),
it(rn, z, p) AS (
  SELECT 1, CAST(cents AS HUGEINT), CAST(1 AS HUGEINT)
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.rn,
         it.z + (CASE WHEN r.cents - it.z >= 0
                      THEN (r.cents - it.z) // %d
                      ELSE -((it.z - r.cents) // %d) END),
         it.p + (CASE WHEN (r.day - r.prev_day) - it.p >= 0
                      THEN ((r.day - r.prev_day) - it.p) // %d
                      ELSE -((it.p - (r.day - r.prev_day)) // %d) END)
  FROM it JOIN r ON r.rn = it.rn + 1)
SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_demand_days,
       CAST(z AS BIGINT) AS z_cents,
       CAST(p AS BIGINT) AS p_days,
       CAST(1000 * z // greatest(p, 1) AS BIGINT)
         AS forecast_milli_cents_per_day
FROM it ORDER BY rn DESC LIMIT 1
""" % ((CROSTON_ALPHA_DEN,) * 4)


def vocab_good_turing(sf_dir):
    """Good–Turing estimate of the UNSEEN vocabulary mass (Good '53;
    the missing-mass estimator under every smoothed LM and species-
    richness audit): P(next token is a new type) ≈ n₁/N where n₁ =
    singleton types — plus the GT-adjusted count for singletons
    r* = 2·n₂/n₁, all on exact integer ppm/milli grids.

    Scale shape: per-batch word-count partials ride ONE word-hash
    bucketed exchange (the collocation/vocabulary discipline); each
    bucket's type-frequency histogram (count → n_types) is a bounded
    combiner (counts ≤ N), merged in one block."""
    buckets = _exchange_buckets(sf_dir)
    ds = _read(sf_dir, "documents", columns=["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for t in df["text"].fillna(""):
            c.update(t.split())
        out = pd.DataFrame({"w": list(c.keys()),
                            "n": list(c.values())})
        h = pd.util.hash_pandas_object(out["w"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        out["n"] = out["n"].astype("int64")
        return out

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("w", as_index=False)["n"].sum()
        out = (tot.groupby("n", as_index=False).size()
               .rename(columns={"n": "r", "size": "n_types"}))
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("r", as_index=False)["n_types"].sum()
        n_tokens = int((h["r"] * h["n_types"]).sum())
        vocab = int(h["n_types"].sum())
        n1 = int(h.loc[h["r"] == 1, "n_types"].sum())
        n2 = int(h.loc[h["r"] == 2, "n_types"].sum())
        return pd.DataFrame({
            "n_tokens": pd.Series([n_tokens], dtype="int64"),
            "vocab_size": pd.Series([vocab], dtype="int64"),
            "n_singletons": pd.Series([n1], dtype="int64"),
            "n_doubletons": pd.Series([n2], dtype="int64"),
            "p_unseen_ppm": pd.Series(
                [10**6 * n1 // max(n_tokens, 1)], dtype="int64"),
            "r_star_singleton_milli": pd.Series(
                [2000 * n2 // max(n1, 1)], dtype="int64")})

    per_bucket = (ds.map_batches(counts, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))
    return _merge_partials(per_bucket, final)


GOOD_TURING_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
h AS (SELECT n AS r, CAST(count(*) AS BIGINT) AS n_types
      FROM wc GROUP BY 1),
a AS (SELECT CAST(sum(r * n_types) AS BIGINT) AS n_tokens,
             CAST(sum(n_types) AS BIGINT) AS vocab_size,
             CAST(coalesce(sum(CASE WHEN r = 1 THEN n_types END), 0)
                  AS BIGINT) AS n1,
             CAST(coalesce(sum(CASE WHEN r = 2 THEN n_types END), 0)
                  AS BIGINT) AS n2
      FROM h)
SELECT n_tokens, vocab_size, n1 AS n_singletons, n2 AS n_doubletons,
       CAST(1000000 * n1 // greatest(n_tokens, 1) AS BIGINT)
         AS p_unseen_ppm,
       CAST(2000 * n2 // greatest(n1, 1) AS BIGINT)
         AS r_star_singleton_milli
FROM a
"""


def orders_xbar_control(sf_dir):
    """Shewhart X̄ control chart over daily order prices (Shewhart
    '31 — THE classical SPC chart; the cusum/ewma family's baseline):
    a day is out of control when its mean deviates from the grand
    mean by more than 3σ/√n_d. Exact integers by cross-multiplying:
    flag ⇔ (S_d·N − S·n_d)² > 9·(N·ΣX² − S²)·n_d·N — no square roots,
    no floats, HUGEINT in SQL, Python ints here.

    Scale shape: per-batch (day → n, S, ΣX²) partials — bounded
    lossless combiner, zero shuffle; one merge flags all days."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"day": days, "n": 1, "s": cents,
                           "s2": cents.astype(object) ** 2})
        out = (df.groupby("day", as_index=False)
               .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")))
        out["day"] = out["day"].astype("int64")
        out["n"] = out["n"].astype("int64")
        out["s"] = out["s"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)
             .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
             .sort_values("day").reset_index(drop=True))
        n_tot = int(g["n"].sum())
        s_tot = int(g["s"].sum())
        s2_tot = int(sum(int(x) for x in g["s2"]))
        var_num = n_tot * s2_tot - s_tot * s_tot  # N²·σ²
        rows = []
        for _, r in g.iterrows():
            nd, sd = int(r["n"]), int(r["s"])
            dev2 = (sd * n_tot - s_tot * nd) ** 2
            out_flag = int(dev2 > 9 * var_num * nd)
            rows.append((int(r["day"]), nd, 1000 * sd // nd,
                         out_flag))
        out = pd.DataFrame(rows, columns=["day", "n_orders",
                                          "mean_milli",
                                          "out_of_control"])
        return out.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


XBAR_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS s,
         CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                  * CAST(round(o_totalprice * 100) AS HUGEINT))
              AS HUGEINT) AS s2
  FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
             CAST(sum(s) AS HUGEINT) AS st,
             CAST(sum(s2) AS HUGEINT) AS s2t FROM d)
SELECT d.day, CAST(d.n AS BIGINT) AS n_orders,
       CAST(1000 * d.s // d.n AS BIGINT) AS mean_milli,
       CAST(CASE WHEN (d.s * t.nt - t.st * d.n)
                      * (d.s * t.nt - t.st * d.n)
                 > 9 * (t.nt * t.s2t - t.st * t.st) * d.n
            THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM d, t ORDER BY d.day
"""


def doc_readability_fk(sf_dir):
    """Flesch–Kincaid readability (Kincaid et al. '75 / Flesch '48 —
    the standard readability pair every document-quality stack
    reports): per document, words, sentences ([.!?]+ runs, floor 1),
    syllables (vowel-group runs [aeiouy]+ over the lowercased text —
    the classic heuristic, identical regex both engines), and the two
    scores on exact integer milli grids with floor division:

        fk_grade_milli    = 390·W//S + 11800·Y//W − 15590
        reading_ease_milli = 206835 − 1015·W//S − 84600·Y//W

    Zero shuffle: stateless vectorized map, one row per document
    (compiled regexes shared per process)."""
    import re as _re

    vowel_re = _re.compile(r"[aeiouy]+")
    sent_re = _re.compile(r"[.!?]+")
    word_re = _re.compile(r"\S+")

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        rows_w, rows_s, rows_y = [], [], []
        for t in df["text"].fillna(""):
            rows_w.append(len(word_re.findall(t)))
            rows_s.append(max(len(sent_re.findall(t)), 1))
            rows_y.append(len(vowel_re.findall(t.lower())))
        w = np.asarray(rows_w, dtype=np.int64)
        s = np.asarray(rows_s, dtype=np.int64)
        y = np.asarray(rows_y, dtype=np.int64)
        wg = np.maximum(w, 1)
        fk = 390 * w // s + 11800 * y // wg - 15590
        ease = 206835 - 1015 * w // s - 84600 * y // wg
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": w, "n_sentences": s, "n_syllables": y,
            "fk_grade_milli": fk.astype("int64"),
            "reading_ease_milli": ease.astype("int64")})

    return ds.map_batches(score, batch_format="pandas")


READABILITY_SQL = """
WITH x AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS y
  FROM documents)
SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
       CAST(390 * w // s + 11800 * y // greatest(w, 1) - 15590
            AS BIGINT) AS fk_grade_milli,
       CAST(206835 - 1015 * w // s - 84600 * y // greatest(w, 1)
            AS BIGINT) AS reading_ease_milli
FROM x
"""


ATTACK_K = 5


def kg_attack_robustness(sf_dir):
    """Targeted-attack robustness of the co-citation graph (Albert,
    Jeong & Barabási '00 — scale-free networks shatter under hub
    removal while surviving random failure): remove the ATTACK_K
    highest-degree nodes (degree desc, node asc tie-break) and
    compare the component census before vs after — the giant-
    component share drop is the robustness headline.

    Scale shape: everything reuses the distributed census machinery
    (hash-to-min CC labels, degree join, bounded per-component
    partials); the hub set is a top-k (local heads + one coalesced
    merge — never a full degree collect), broadcast as a closure of
    K names for the map-side edge filter; the attacked census rides
    the same machinery over the filtered pairs."""
    from ...stages import graph
    from ...stages.canonicalize import connected_components_distributed
    from ...stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    def census(p) -> tuple:
        """(n_components, giant_share_permille) for a pairs Dataset.

        Degree-mass census WITHOUT a degree table (r5 execution
        shave): every edge is intra-component by construction, so a
        component's degree sum dc = 2·(its edge count) and the
        permille share 1000·max(dc)//Σdc = 1000·max(m)//Σm — the 2s
        cancel exactly under floor division (2000a//2b = 1000a//b).
        One bucketed edges⋈labels join on endpoint ``a``'s label
        replaces the old degrees + deg⋈labels subtree, and every
        component owns ≥1 edge (pairs nodes come from edges), so the
        distinct-label count is unchanged."""
        def as_edges(t: pa.Table) -> pa.Table:
            return pa.table({"uri_a": t["a"], "uri_b": t["b"]})

        labels = connected_components_distributed(
            p.map_batches(as_edges, batch_format="pyarrow"))
        edge_a = p.map_batches(
            lambda t: pa.table({"node": t["a"]}),
            batch_format="pyarrow")
        j = bucket_join(edge_a, labels, left_on="node",
                        right_on="node", suffix="_l")

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("label", as_index=False).size()
            return pd.DataFrame({
                "component": g["label"].astype(object),
                "m": g["size"].astype("int64")})

        comp = (j.map_batches(partial, batch_format="pandas")
                .to_pandas()
                .groupby("component", as_index=False)["m"].sum())
        total = int(comp["m"].sum())
        return (len(comp),
                1000 * int(comp["m"].max()) // max(total, 1))

    # hub selection: degree partials → local top-k → one coalesced
    # merge, chained as a SINGLE execution (the census no longer
    # consumes degrees, so nothing else needs the full table)
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["deg", "node"],
                               ascending=[False, True])
                .head(ATTACK_K).reset_index(drop=True))

    hubs_df = (graph.degrees(
        pairs.map_batches(flat_nodes, batch_format="pyarrow"),
        "node")
        .map_batches(local_top, batch_format="pandas")
        .repartition(1)
        .map_batches(local_top, batch_format="pandas")
        .to_pandas())
    hubs = frozenset(hubs_df["node"])

    hub_arr = pa.array(sorted(hubs), pa.string())

    def remove_hubs(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.is_in(t["a"], value_set=hub_arr)),
            pc.invert(pc.is_in(t["b"], value_set=hub_arr)))
        return t.filter(keep)

    base_nc, base_giant = census(pairs)
    att_nc, att_giant = census(
        pairs.map_batches(remove_hubs, batch_format="pyarrow")
        .materialize())
    return pd.DataFrame({
        "n_removed": pd.Series([ATTACK_K], dtype="int64"),
        "base_components": pd.Series([base_nc], dtype="int64"),
        "base_giant_permille": pd.Series([base_giant],
                                         dtype="int64"),
        "attacked_components": pd.Series([att_nc], dtype="int64"),
        "attacked_giant_permille": pd.Series([att_giant],
                                             dtype="int64")})


KG_ATTACK_SQL = f"""
WITH RECURSIVE edges AS ({_CITE_EDGES_SQL}),
pairs AS (SELECT DISTINCT e1.dst AS a, e2.dst AS b
          FROM edges e1 JOIN edges e2
            ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
hubs AS (SELECT node FROM deg ORDER BY d DESC, node ASC LIMIT {ATTACK_K}),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
nds AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nds
  UNION
  SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
comp AS (SELECT cc.component, CAST(sum(deg.d) AS HUGEINT) AS dc
         FROM cc JOIN deg ON deg.node = cc.node GROUP BY 1),
base AS (SELECT CAST(count(*) AS BIGINT) AS nc,
                CAST(1000 * max(dc) // greatest(sum(dc), 1)
                     AS BIGINT) AS giant
         FROM comp),
p2 AS (SELECT a, b FROM pairs
       WHERE a NOT IN (SELECT node FROM hubs)
         AND b NOT IN (SELECT node FROM hubs)),
deg2 AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM p2 UNION ALL SELECT b FROM p2)
  GROUP BY node),
sym2 AS (SELECT a, b FROM p2 UNION SELECT b, a FROM p2),
nds2 AS (SELECT a AS node FROM sym2 UNION SELECT b FROM sym2),
reach2(node, lab) AS (
  SELECT node, node FROM nds2
  UNION
  SELECT s.b, r.lab FROM reach2 r JOIN sym2 s ON s.a = r.node),
cc2 AS (SELECT node, min(lab) AS component FROM reach2
        GROUP BY node),
comp2 AS (SELECT cc2.component, CAST(sum(deg2.d) AS HUGEINT) AS dc
          FROM cc2 JOIN deg2 ON deg2.node = cc2.node GROUP BY 1),
att AS (SELECT CAST(count(*) AS BIGINT) AS nc,
               CAST(1000 * max(dc) // greatest(sum(dc), 1)
                    AS BIGINT) AS giant
        FROM comp2)
SELECT CAST({ATTACK_K} AS BIGINT) AS n_removed,
       base.nc AS base_components,
       base.giant AS base_giant_permille,
       att.nc AS attacked_components,
       att.giant AS attacked_giant_permille
FROM base, att
"""


MATTR_WINDOW = 100


def doc_mattr(sf_dir):
    """Moving-Average Type-Token Ratio (Covington & McFall '10 —
    the length-robust lexical-diversity metric; raw TTR falls with
    document length, MATTR doesn't): per document, the mean distinct
    count over every 100-token sliding window, exact integer milli
    (1000·Σ distinct_i // (n_windows·W)); documents shorter than the
    window fall back to whole-document TTR (1000·distinct // L).

    Scale shape: zero shuffle, one row per doc; the sliding distinct
    count is the O(L) add/evict counter walk, never the O(L·W)
    recount."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        out = []
        for t in df["text"].fillna(""):
            toks = t.split()
            L = len(toks)
            if L == 0:
                out.append((0, 0))
                continue
            if L <= MATTR_WINDOW:
                out.append((L, 1000 * len(set(toks)) // L))
                continue
            counts: dict = {}
            distinct = 0
            acc = 0
            for i, w in enumerate(toks):
                c = counts.get(w, 0)
                if c == 0:
                    distinct += 1
                counts[w] = c + 1
                if i >= MATTR_WINDOW:
                    old = toks[i - MATTR_WINDOW]
                    counts[old] -= 1
                    if counts[old] == 0:
                        distinct -= 1
                if i >= MATTR_WINDOW - 1:
                    acc += distinct
            n_win = L - MATTR_WINDOW + 1
            out.append((L, 1000 * acc // (n_win * MATTR_WINDOW)))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": pd.Series([a for a, _ in out],
                                  dtype="int64"),
            "mattr_milli": pd.Series([b for _, b in out],
                                     dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")


MATTR_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
base AS (SELECT doc_id, w, len(w) AS l FROM toks),
short AS (
  SELECT doc_id, CAST(l AS BIGINT) AS n_tokens,
         CAST(CASE WHEN l = 0 THEN 0
              ELSE 1000 * len(list_distinct(w)) // l END AS BIGINT)
           AS mattr_milli
  FROM base WHERE l <= %(w)d),
wins AS (
  SELECT doc_id, l,
         len(list_distinct(w[i:i + %(wm1)d])) AS d
  FROM (SELECT doc_id, w, l,
               unnest(generate_series(1, l - %(wm1)d)) AS i
        FROM base WHERE l > %(w)d)),
lng AS (
  SELECT doc_id, CAST(max(l) AS BIGINT) AS n_tokens,
         CAST(1000 * sum(d) // (count(*) * %(w)d) AS BIGINT)
           AS mattr_milli
  FROM wins GROUP BY doc_id)
SELECT * FROM short UNION ALL SELECT * FROM lng
""" % {"w": MATTR_WINDOW, "wm1": MATTR_WINDOW - 1}


def events_burstiness_gb(sf_dir):
    """The Goh–Barabási burstiness parameter (Goh & Barabási '08:
    B = (σ−μ)/(σ+μ) over inter-event gaps; −1 = metronome, 0 =
    Poisson, →1 = extreme bursts) for the whole event stream's
    per-user gaps — the one-number summary next to
    user_interarrival_histogram's spectrum. Exact integers: with
    M = Σgaps and S² ≈ var via the moment identity, B_milli =
    1000·(D − M) // (D + M) where D = isqrt(n·Σg² − M²) ≈ n·σ and
    M = n·μ — the same cross-multiplied isqrt discipline as the
    jackknife (SQL floor(sqrt()) exact below 2^53).

    Scale shape: gaps are doc-local per user, so (n, Σg, Σg²)
    partials come off ONE user-bucketed exchange; merge is three
    Python ints."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": t["ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)})
        h = pd.util.hash_pandas_object(df["u"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_moments(g: pd.DataFrame) -> pd.DataFrame:
        n = 0
        s = 0
        s2 = 0
        for _, grp in g.groupby("u", sort=False):
            tss = np.sort(grp["ts"].to_numpy(np.int64))
            gaps = np.diff(tss) // 1_000_000  # whole seconds
            n += len(gaps)
            s += int(gaps.sum())
            s2 += int(sum(int(x) * int(x) for x in gaps))
        return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                             "s": pd.Series([s], dtype="int64"),
                             "s2_h": pd.Series([s2 >> 62],
                                               dtype="int64"),
                             "s2_l": pd.Series([s2 & ((1 << 62) - 1)],
                                               dtype="int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        import math
        n = int(df["n"].sum())
        s = int(df["s"].sum())
        s2 = sum((int(h) << 62) + int(l)
                 for h, l in zip(df["s2_h"], df["s2_l"]))
        d = math.isqrt(max(n * s2 - s * s, 0))
        b = 1000 * (d - s) // max(d + s, 1)
        return pd.DataFrame({
            "n_gaps": pd.Series([n], dtype="int64"),
            "mean_gap_s_milli": pd.Series(
                [1000 * s // max(n, 1)], dtype="int64"),
            "burstiness_milli": pd.Series([b], dtype="int64")})

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_moments, batch_format="pandas"))
    return _merge_partials(per_bucket, final)


BURSTINESS_SQL = """
WITH g AS (
  SELECT user_id,
         (CAST(epoch_us(ts) AS BIGINT)
          - lag(CAST(epoch_us(ts) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id))
         // 1000000 AS gap
  FROM events),
m AS (SELECT CAST(count(gap) AS HUGEINT) AS n,
             CAST(sum(gap) AS HUGEINT) AS s,
             CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS s2
      FROM g WHERE gap IS NOT NULL),
d0 AS (SELECT n, s, greatest(n * s2 - s * s, 0) AS x,
              CAST(floor(sqrt(CAST(greatest(n * s2 - s * s, 0)
                                   AS DOUBLE))) AS HUGEINT) AS r
       FROM m),
d AS (SELECT n, s,
             -- exact isqrt at ANY magnitude: the double sqrt can be
             -- off once x exceeds 2^53; correct within +/-2 ulps
             r + (CASE WHEN (r + 2) * (r + 2) <= x THEN 2
                       WHEN (r + 1) * (r + 1) <= x THEN 1
                       WHEN r * r <= x THEN 0
                       WHEN (r - 1) * (r - 1) <= x THEN -1
                       ELSE -2 END) AS dd
      FROM d0)
SELECT CAST(n AS BIGINT) AS n_gaps,
       CAST(1000 * s // greatest(n, 1) AS BIGINT)
         AS mean_gap_s_milli,
       CAST(1000 * (dd - s) // greatest(dd + s, 1) AS BIGINT)
         AS burstiness_milli
FROM d
"""


# DCG rank discounts: round(10^6 / log2(i+1)) for i = 1..10 —
# precomputed literals shared verbatim with the SQL oracle (the
# FS-weights discipline for transcendental constants).
NDCG_K = 10
NDCG_DISCOUNTS = (1000000, 630930, 500000, 430677, 386853,
                  356207, 333333, 315465, 301030, 289065)


def bm25_ndcg_eval(sf_dir):
    """Ranking-quality evaluation of the BM25 retrieval leg —
    nDCG@10 (Järvelin & Kekäläinen '02, the standard graded-
    relevance IR metric): graded judgments are EXACT and data-derived
    (rel(doc) = total occurrences of the two query terms — the
    oracle-computable stand-in for human grades), the system ranking
    is bm25_search's (score desc, doc_id asc) top-10, and the ideal
    ranking is the global top-10 relevance multiset. All integer:
    DCG = Σ rel_i·D_i over the literal micro-discount table,
    ndcg_ppm = 10⁶·DCG // IDCG.

    Scale shape: the system leg reuses _bm25_scored (two streaming
    passes, one bounded exchange) + a 10-row driver collect; per-doc
    relevance for those 10 docs and the ideal top-10 relevances come
    from one more zero-shuffle pass with per-batch local top-k
    partials — never a global sort."""
    from .relational import _bm25_scored

    top = (_bm25_scored(sf_dir)
           .sort(["score", "doc_id"], descending=[True, False])
           .limit(NDCG_K).to_pandas())
    top_ids = [int(i) for i in top["doc_id"]]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idset = frozenset(top_ids)

    def rels(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        picked, grades = [], []
        local = []
        for i, txt in zip(ids, texts):
            toks = (txt or "").split()
            r = toks.count("merge") + toks.count("join")
            if i in idset:
                picked.append(int(i))
                grades.append(r)
            if r > 0:
                local.append(r)
        local.sort(reverse=True)
        pad = NDCG_K - len(local)
        return pd.DataFrame({
            "kind": ["sys"] * len(picked) + ["ideal"] * min(
                len(local), NDCG_K),
            "key": picked + list(range(min(len(local), NDCG_K))),
            "rel": grades + local[:NDCG_K]}).astype(
                {"key": "int64", "rel": "int64"}) if picked or local \
            else pd.DataFrame({"kind": pd.Series(dtype=object),
                               "key": pd.Series(dtype="int64"),
                               "rel": pd.Series(dtype="int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        sys_rel = dict(zip(df.loc[df["kind"] == "sys", "key"],
                           df.loc[df["kind"] == "sys", "rel"]))
        ideal = sorted(df.loc[df["kind"] == "ideal", "rel"],
                       reverse=True)[:NDCG_K]
        dcg = sum(int(sys_rel.get(d, 0)) * NDCG_DISCOUNTS[i]
                  for i, d in enumerate(top_ids))
        idcg = sum(int(r) * NDCG_DISCOUNTS[i]
                   for i, r in enumerate(ideal))
        return pd.DataFrame({
            "dcg_micro": pd.Series([dcg], dtype="int64"),
            "idcg_micro": pd.Series([idcg], dtype="int64"),
            "ndcg_ppm": pd.Series([10**6 * dcg // max(idcg, 1)],
                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(rels, batch_format="pyarrow"), final)


def _ndcg_sql() -> str:
    disc_cases = " ".join(
        "WHEN %d THEN %d" % (i + 1, d)
        for i, d in enumerate(NDCG_DISCOUNTS))
    return """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
),
d AS (
  SELECT doc_id, len(w) AS dl,
         len(list_filter(w, t -> t = 'merge')) AS tf1,
         len(list_filter(w, t -> t = 'join'))  AS tf2
  FROM toks
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(dl) AS HUGEINT) AS s,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS HUGEINT) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS HUGEINT) AS df2
  FROM d
),
idf AS (
  SELECT ((2 * n - 2 * df1 + 1) * 1000000) // (2 * df1 + 1) AS idf1,
         ((2 * n - 2 * df2 + 1) * 1000000) // (2 * df2 + 1) AS idf2,
         n, s FROM g
),
scored AS (
  SELECT d.doc_id, d.tf1 + d.tf2 AS rel,
         (CASE WHEN d.tf1 > 0 THEN
            (idf.idf1 * (22 * d.tf1 * idf.s))
            // (10 * d.tf1 * idf.s + 3 * idf.s + 9 * d.dl * idf.n)
          ELSE 0 END)
         + (CASE WHEN d.tf2 > 0 THEN
            (idf.idf2 * (22 * d.tf2 * idf.s))
            // (10 * d.tf2 * idf.s + 3 * idf.s + 9 * d.dl * idf.n)
          ELSE 0 END) AS score
  FROM d, idf
),
sys AS (
  SELECT rel, row_number() OVER (ORDER BY score DESC, doc_id ASC)
           AS rk
  FROM scored WHERE score > 0
  ORDER BY score DESC, doc_id ASC LIMIT %(k)d
),
ideal AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC)
           AS rk
  FROM scored WHERE rel > 0
  ORDER BY rel DESC LIMIT %(k)d
),
dc AS (
  SELECT CAST(coalesce(sum(rel * (CASE rk %(cases)s END)), 0)
              AS HUGEINT) AS dcg
  FROM sys),
ic AS (
  SELECT CAST(coalesce(sum(rel * (CASE rk %(cases)s END)), 0)
              AS HUGEINT) AS idcg
  FROM ideal)
SELECT CAST(dc.dcg AS BIGINT) AS dcg_micro,
       CAST(ic.idcg AS BIGINT) AS idcg_micro,
       CAST(1000000 * dc.dcg // greatest(ic.idcg, 1) AS BIGINT)
         AS ndcg_ppm
FROM dc, ic
""" % {"k": NDCG_K, "cases": disc_cases}


BM25_NDCG_SQL = _ndcg_sql()


def doc_readability_lix(sf_dir):
    """LIX readability (Björnsson '68 — the Swedish läsbarhetsindex,
    the readability measure of the reference engine's home domain and
    the standard one for Swedish legal text): LIX = W/S + 100·L₇/W
    with L₇ = words of ≥7 characters, on the exact integer milli grid
    (1000·W//S + 100000·L7//W, floor division both engines; sentence
    runs [.!?]+ with floor 1, the doc_readability_fk conventions).
    Zero shuffle, one row per document."""
    import re as _re

    sent_re = _re.compile(r"[.!?]+")

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        w_out, s_out, l7_out = [], [], []
        for t in df["text"].fillna(""):
            toks = t.split()
            w_out.append(len(toks))
            s_out.append(max(len(sent_re.findall(t)), 1))
            l7_out.append(sum(1 for w in toks if len(w) >= 7))
        w = np.asarray(w_out, dtype=np.int64)
        s = np.asarray(s_out, dtype=np.int64)
        l7 = np.asarray(l7_out, dtype=np.int64)
        lix = 1000 * w // s + 100000 * l7 // np.maximum(w, 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": w, "n_sentences": s, "n_long_words": l7,
            "lix_milli": lix.astype("int64")})

    return ds.map_batches(score, batch_format="pandas")


LIX_SQL = """
WITH x AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(text, '\\S{7,}')) AS BIGINT)
           AS l7
  FROM documents)
SELECT doc_id, w AS n_words, s AS n_sentences, l7 AS n_long_words,
       CAST(1000 * w // s + 100000 * l7 // greatest(w, 1)
            AS BIGINT) AS lix_milli
FROM x
"""


BOILER_DF_CAP = 2  # a trigram in > 2 documents is boilerplate here

from .sketches import _shingle_cte as _sess_shingle_cte

_SESS_SHINGLE_CTE = _sess_shingle_cte("documents")


def doc_boilerplate_share(sf_dir):
    """Per-document BOILERPLATE DENSITY — the share of a document's
    distinct word-trigram shingles that are corpus-frequent
    (document frequency > BOILER_DF_CAP): the curation signal behind
    boilerplate stripping (navigation chrome, license footers,
    templated headers repeat across pages; CCNet/RefinedWeb drop
    high-df lines for the same reason). Shingle grammar identical to
    the dedup family (_shingle_cte's 3-word windows).

    Scale shape: per-doc distinct postings (doc_id, gram) ride ONE
    gram-hash bucketed exchange — a gram's df finalizes entirely in
    its bucket, so each bucket marks df > cap and emits additive
    (doc_id, n_grams, n_boiler) partials; a second doc-keyed
    exchange folds them (two exchanges, no union — within the DAG
    budget). Exact integer permille."""
    buckets = _exchange_buckets(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, t in zip(df["doc_id"], df["text"].fillna("")):
            toks = t.split()
            L = len(toks)
            sh = {" ".join(toks[j:j + 3])
                  for j in range(max(L - 2, 1))} if L else set()
            for g in sh:
                ids.append(int(i))
                grams.append(g)
        out = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "g": pd.Series(grams, dtype=object)})
        if not len(out):
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        h = pd.util.hash_pandas_object(out["g"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_mark(g: pd.DataFrame) -> pd.DataFrame:
        dfreq = g.groupby("g")["doc_id"].transform("size")
        boil = (dfreq > BOILER_DF_CAP).astype(np.int64)
        p = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                          "n_grams": 1, "n_boiler": boil})
        out = (p.groupby("doc_id", as_index=False)
               .agg(n_grams=("n_grams", "sum"),
                    n_boiler=("n_boiler", "sum")))
        h = pd.util.hash_pandas_object(out["doc_id"],
                                       index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out.astype({"doc_id": "int64", "n_grams": "int64",
                           "n_boiler": "int64", "_b2": "int32"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", as_index=False)
               .agg(n_grams=("n_grams", "sum"),
                    n_boiler=("n_boiler", "sum")))
        out["boiler_permille"] = (1000 * out["n_boiler"]
                                  // out["n_grams"].clip(lower=1))
        return out.astype("int64")

    return (ds.map_batches(postings, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(bucket_mark, batch_format="pandas")
            .groupby("_b2")
            .map_groups(fold, batch_format="pandas"))


BOILER_SQL = """
WITH s AS (%s
),
gr AS (SELECT doc_id, unnest(sh) AS g FROM s),
df AS (SELECT g, CAST(count(*) AS BIGINT) AS dfreq
       FROM gr GROUP BY 1),
per AS (
  SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN df.dfreq > %d THEN 1 ELSE 0 END)
              AS BIGINT) AS n_boiler
  FROM gr JOIN df USING (g) GROUP BY 1)
SELECT doc_id, n_grams, n_boiler,
       CAST(1000 * n_boiler // greatest(n_grams, 1) AS BIGINT)
         AS boiler_permille
FROM per
""" % (_SESS_SHINGLE_CTE, BOILER_DF_CAP)


def doc_novelty_share(sf_dir):
    """Per-document n-gram NOVELTY — the share of a document's
    distinct trigram shingles whose FIRST corpus occurrence (minimum
    doc_id) is this document: the per-document decomposition of the
    Heaps vocabulary-growth curve and the standard memorization /
    content-freshness proxy (a near-duplicate of earlier material
    scores ≈ 0; genuinely new text scores ≈ 1000‰).

    Scale shape: identical to doc_boilerplate_share — postings ride
    ONE gram-hash exchange where each bucket owns its grams entirely
    and can compute min(doc_id) per gram, emitting additive
    (doc_id, n_grams, n_novel) partials; one doc-keyed fold."""
    buckets = _exchange_buckets(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, t in zip(df["doc_id"], df["text"].fillna("")):
            toks = t.split()
            L = len(toks)
            sh = {" ".join(toks[j:j + 3])
                  for j in range(max(L - 2, 1))} if L else set()
            for g in sh:
                ids.append(int(i))
                grams.append(g)
        out = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "g": pd.Series(grams, dtype=object)})
        if not len(out):
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        h = pd.util.hash_pandas_object(out["g"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_mark(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("g")["doc_id"].transform("min")
        novel = (g["doc_id"].to_numpy(np.int64)
                 == first.to_numpy(np.int64)).astype(np.int64)
        p = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                          "n_grams": 1, "n_novel": novel})
        out = (p.groupby("doc_id", as_index=False)
               .agg(n_grams=("n_grams", "sum"),
                    n_novel=("n_novel", "sum")))
        h = pd.util.hash_pandas_object(out["doc_id"],
                                       index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out.astype({"doc_id": "int64", "n_grams": "int64",
                           "n_novel": "int64", "_b2": "int32"})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", as_index=False)
               .agg(n_grams=("n_grams", "sum"),
                    n_novel=("n_novel", "sum")))
        out["novelty_permille"] = (1000 * out["n_novel"]
                                   // out["n_grams"].clip(lower=1))
        return out.astype("int64")

    return (ds.map_batches(postings, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(bucket_mark, batch_format="pandas")
            .groupby("_b2")
            .map_groups(fold, batch_format="pandas"))


NOVELTY_SQL = """
WITH s AS (%s
),
gr AS (SELECT doc_id, unnest(sh) AS g FROM s),
fo AS (SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc
       FROM gr GROUP BY 1),
per AS (
  SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN fo.first_doc = gr.doc_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM gr JOIN fo USING (g) GROUP BY 1)
SELECT doc_id, n_grams, n_novel,
       CAST(1000 * n_novel // greatest(n_grams, 1) AS BIGINT)
         AS novelty_permille
FROM per
""" % _SESS_SHINGLE_CTE


def curation_funnel_census(sf_dir):
    """The curation FUNNEL table — the stage-by-stage survivor counts
    every dataset paper publishes (C4, RefinedWeb, FineWeb all lead
    with one): documents in → after the PII-redact + C4 quality gate
    → after exact dedup → after MinHash near-dup removal, each with
    its exact retention permille (of the input). Runs the REAL
    curation stages (pipelines/curation semantics) and counts the
    surviving Datasets — the bounded 1-row census, not the survivor
    list (curation_pipeline carries that).

    Scale shape: identical to curate() — the quality prefix
    materializes once and each count is a streaming count over it;
    the near-dup removal count comes from the cluster label table
    (non-canonical keys), never a second anti-join."""
    import ray.data as rd

    from ...stages.dedup import exact_dedup, minhash_dedup
    from ...stages.pii import pii_scan
    from ...stages.text_analysis import quality_filter, quality_metrics

    def redact(t: pa.Table) -> pa.Table:
        df = pii_scan(t, redact=True)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "text": pa.array(df["clean"], pa.string())})

    def gate(t: pa.Table) -> pa.Table:
        t = quality_metrics(t)
        t = quality_filter(t, min_tokens=5, min_mean_token_len=2.0,
                           max_mean_token_len=12.0)
        return t.select(["doc_id", "text"])

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_input = docs.count()
    q = (docs.map_batches(redact, batch_format="pyarrow")
         .map_batches(gate, batch_format="pyarrow").materialize())
    n_quality = q.count()
    ex = exact_dedup(q, text_col="text", key_col="doc_id") \
        .materialize()
    n_exact = ex.count()
    labels = minhash_dedup(ex, text_col="text", key_col="doc_id",
                           threshold=0.5)
    if isinstance(labels, pd.DataFrame):
        n_removed = int((labels["key"]
                         != labels["canonical_key"]).sum())
    else:
        n_removed = int(labels.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int((df["key"] != df["canonical_key"]).sum())]}),
            batch_format="pandas").to_pandas()["n"].sum())
    n_final = n_exact - n_removed

    def pm(n):
        return 1000 * n // max(n_input, 1)

    return pd.DataFrame({
        "n_input": pd.Series([n_input], dtype="int64"),
        "n_after_quality": pd.Series([n_quality], dtype="int64"),
        "n_after_exact": pd.Series([n_exact], dtype="int64"),
        "n_after_neardup": pd.Series([n_final], dtype="int64"),
        "quality_permille": pd.Series([pm(n_quality)], dtype="int64"),
        "exact_permille": pd.Series([pm(n_exact)], dtype="int64"),
        "final_permille": pd.Series([pm(n_final)], dtype="int64")})


def _funnel_sql() -> str:
    from ...stages.pii import PII_PATTERNS
    from .sketches import (_CC_CTES, _jaccard_pair_select,
                           _shingle_cte)

    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = "regexp_replace(%s, '%s', '%s', 'g')" % (
            clean, pat.replace("'", "''"), token)
    return f"""
WITH RECURSIVE clean AS (
  SELECT doc_id, {clean} AS text FROM documents),
m AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g')) AS alpha_len
  FROM clean),
q AS (
  SELECT doc_id, text FROM m
  WHERE n_tokens >= 5 AND alpha_len >= 2.0 * n_tokens
    AND alpha_len <= 12.0 * n_tokens),
ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
qq AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)),
s AS ({_shingle_cte("qq")}),
p AS ({_jaccard_pair_select("ka", "kb")}),
{_CC_CTES},
canon AS (SELECT node AS doc_id, min(lbl) AS canonical
          FROM reach GROUP BY node),
kept AS (
  SELECT qq.doc_id FROM qq LEFT JOIN canon USING (doc_id)
  WHERE canonical IS NULL OR canonical = qq.doc_id),
c AS (SELECT
        CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_input,
        CAST((SELECT count(*) FROM q) AS BIGINT) AS n_q,
        CAST((SELECT count(*) FROM qq) AS BIGINT) AS n_ex,
        CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_f)
SELECT n_input, n_q AS n_after_quality, n_ex AS n_after_exact,
       n_f AS n_after_neardup,
       CAST(1000 * n_q // greatest(n_input, 1) AS BIGINT)
         AS quality_permille,
       CAST(1000 * n_ex // greatest(n_input, 1) AS BIGINT)
         AS exact_permille,
       CAST(1000 * n_f // greatest(n_input, 1) AS BIGINT)
         AS final_permille
FROM c
"""


FUNNEL_SQL = _funnel_sql()


def orders_mann_kendall(sf_dir):
    """Mann–Kendall trend test over daily revenue (Mann '45 /
    Kendall '75 — the standard nonparametric monotone-trend test;
    the significance companion to orders_theil_sen_trend's slope):
    S = Σ_{i<j} sign(x_j − x_i) over day-ordered daily cents; the
    tie-corrected variance stays integer as 18·Var(S) =
    n(n−1)(2n+5) − Σ_t t(t−1)(2t+5); and the continuity-corrected
    normal score is reported on a shared integer grid,
    z_milli_x4 = sign(S) · 1000·(|S|−1)·4 // isqrt(18·VarS)
    (4 = isqrt(18), so the column is a fixed monotone multiple
    ≈ 0.943·1000·z — a floor convention both engines replay
    exactly, never the float z).

    Scale shape: the daily series is a bounded (day → cents)
    combiner; the O(days²) pair walk is driver-side over the bounded
    day table (the SPRT/Croston precedent). SQL replays with a
    day self-join + the same integer conventions."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        return (pd.DataFrame({"day": days, "cents": cents})
                .groupby("day", as_index=False)["cents"].sum()
                .astype("int64"))

    d = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("day", as_index=False)["cents"].sum()
         .sort_values("day").reset_index(drop=True))
    x = d["cents"].to_numpy(np.int64)
    n = len(x)
    s_stat = 0
    for i in range(n - 1):
        diff = x[i + 1:] - x[i]
        s_stat += int((diff > 0).sum()) - int((diff < 0).sum())
    ties = pd.Series(x).value_counts()
    tie_term = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
                   for t in ties if int(t) > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    denom = math.isqrt(var18)
    mag = max(abs(s_stat) - 1, 0)  # continuity correction
    sign = 1 if s_stat > 0 else (-1 if s_stat < 0 else 0)
    z_milli = sign * (1000 * mag * 4) // max(denom, 1)  # isqrt(18)=4
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "s_stat": pd.Series([s_stat], dtype="int64"),
        "var18": pd.Series([var18], dtype="int64"),
        "z_milli_x4": pd.Series([z_milli], dtype="int64")})


MANN_KENDALL_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM d),
s AS (
  SELECT CAST(coalesce(sum(CASE WHEN b.cents > a.cents THEN 1
                                WHEN b.cents < a.cents THEN -1
                                ELSE 0 END), 0) AS HUGEINT) AS s_stat
  FROM d a JOIN d b ON b.day > a.day),
t AS (
  SELECT CAST(coalesce(sum(CASE WHEN c > 1
                                THEN c * (c - 1) * (2 * c + 5)
                                ELSE 0 END), 0) AS HUGEINT) AS tt
  FROM (SELECT CAST(count(*) AS HUGEINT) AS c FROM d
        GROUP BY cents)),
v AS (SELECT n.n * (n.n - 1) * (2 * n.n + 5) - t.tt AS var18,
             s.s_stat, n.n
      FROM n, s, t),
r0 AS (SELECT *, CAST(floor(sqrt(CAST(var18 AS DOUBLE)))
                      AS HUGEINT) AS r FROM v),
rr AS (SELECT *, r + (CASE WHEN (r + 2) * (r + 2) <= var18 THEN 2
                           WHEN (r + 1) * (r + 1) <= var18 THEN 1
                           WHEN r * r <= var18 THEN 0
                           WHEN (r - 1) * (r - 1) <= var18 THEN -1
                           ELSE -2 END) AS denom
       FROM r0)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(s_stat AS BIGINT) AS s_stat,
       CAST(var18 AS BIGINT) AS var18,
       CAST((CASE WHEN s_stat > 0 THEN 1
                  WHEN s_stat < 0 THEN -1 ELSE 0 END)
            * (1000 * greatest(abs(s_stat) - 1, 0) * 4)
            // greatest(denom, 1) AS BIGINT) AS z_milli_x4
FROM rr
"""


# ---------------------------------------------------------------------
# round-4 surfaces through the correctness gate: XSLT + push sink
# ---------------------------------------------------------------------

_XSLT_TOC_SHEET = """\
<xsl:stylesheet version="1.0"
    xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:xhtml="http://www.w3.org/1999/xhtml">
  <xsl:template match="/">
    <xsl:for-each select="//xhtml:div[@about]">
      <xsl:value-of select="substring-after(@about, '#')"/>
      <xsl:text>\t</xsl:text>
      <xsl:value-of select="@content"/>
      <xsl:text>\n</xsl:text>
    </xsl:for-each>
  </xsl:template>
</xsl:stylesheet>
"""


def xslt_toc_extract(sf_dir):
    """The XSLT interpreter through the exact-correctness gate: the
    flagship sections render to XHTML (``render_xhtml``) and the
    reference-shaped presentation step (transformer.py:25-330,
    ``ferenda_ray.xslt``) extracts each document's TOC — one row per
    section div via apply/for-each + substring-after + attribute
    reads. The stylesheet emits TSV lines which split back into rows,
    so every (url, sec_id, title) the XSLT engine sees is compared
    against the SQL-reconstructed section table: a match proves the
    XML parse, the XPath descendant walk, the attribute access and
    the string functions are all exact over the whole corpus.

    Scale shape: render is the proven hash-bucketed group render;
    the XSLT pass is a zero-shuffle actor-pool map (stylesheet parsed
    once per actor); the line split is map-side."""
    from ...sources.xhtml import render_xhtml
    from ...xslt import transform_dataset
    from ._shared import _kg

    xhtml = render_xhtml(_kg(sf_dir)["sections"])
    toc = transform_dataset(xhtml, _XSLT_TOC_SHEET,
                            col="xhtml", out_col="toc")

    def split_rows(df: pd.DataFrame) -> pd.DataFrame:
        urls, sids, titles = [], [], []
        for url, tsv in zip(df["url"], df["toc"]):
            for line in tsv.split("\n"):
                if not line:
                    continue
                sid, title = line.split("\t", 1)
                urls.append(url)
                sids.append(sid)
                titles.append(title)
        return pd.DataFrame({
            "url": pd.Series(urls, dtype=object),
            "sec_id": pd.Series(sids, dtype=object),
            "title": pd.Series(titles, dtype=object)})

    return toc.map_batches(split_rows, batch_format="pandas")


XSLT_TOC_SQL = """
WITH s AS (%s)
SELECT url, substr(section_uri, strpos(section_uri, '#') + 1) AS sec_id,
       title
FROM s WHERE kind <> 'body'
""" % KG_SECTIONS_SQL


def push_roundtrip(sf_dir):
    """External push sink round-trip through the exact-correctness
    gate: the documents table streams through ``pushsink.push_bulk``
    (actor-held client, keyed-upsert bulk batches — the ES-bulk
    semantics of fulltextindex.py:685-1178) into a file-backed store,
    then the STORE is read back distributed (read_binary_files →
    JSON parse) and compared against the table itself. Equality
    proves the sink wrote every document exactly once with exact
    content — the store IS the assertion, not the manifest (whose
    batch boundaries are engine-dependent).

    Scale shape: push is a zero-shuffle actor-pool map emitting
    bounded manifest rows; the read-back is one binary-files read
    fanned over the store directory."""
    import os
    import shutil

    import ray.data as rd

    from ...sources.pushsink import FileBulkClient, push_bulk

    # pid-scoped store: two concurrent sessions (the documented
    # local-pytest-vs-driver pattern) must not rmtree each other's
    # in-flight pushes; within one process the rmtree keeps reruns
    # deterministic
    store = "/tmp/ferenda_ray_push/%s_%d" % (
        os.path.basename(sf_dir.rstrip("/")), os.getpid())
    shutil.rmtree(store, ignore_errors=True)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    push_bulk(docs, lambda: FileBulkClient(store),
              id_col="doc_id", batch_size=256).materialize()

    def parse(t: pa.Table) -> pa.Table:
        import json

        ids, texts = [], []
        for payload in t["bytes"]:
            doc = json.loads(bytes(payload.as_py()).decode("utf-8"))
            ids.append(int(doc["doc_id"]))
            texts.append(doc["text"])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.read_binary_files(store).map_batches(
        parse, batch_format="pyarrow")


PUSH_ROUNDTRIP_SQL = """
SELECT doc_id, text FROM documents
"""


# ---------------------------------------------------------------------
# PDF / Word ingestion oracles (round 5 — the reference's PDFReader /
# WordReader surfaces, sources/pdf.py + sources/docx.py)
# ---------------------------------------------------------------------

PDF_WORDS_PER_LINE = 6
PDF_TOP0, PDF_LINE_STEP, PDF_PARA_GAP = 72, 15, 15
PDF_LEFT, PDF_BOX_W, PDF_BOX_H, PDF_SIZE = 72, 400, 12, 12


def _pdf_lpp(doc_id: int) -> int:
    return 2 + doc_id % 3


def pdf_textboxes(sf_dir):
    """PDF layout parse + line glue through the REAL code path
    (sources/pdf.py: parse_pdf2xml = pdfreader.py:522-905 _parse_xml,
    glue_page_boxes = pdfreader.py:961-1071 textboxes() +
    _default_glue): every document renders to a deterministic pdf2xml
    intermediate (6-word lines at left=72, 15px line step, 2+doc_id%3
    lines per paragraph with a 15px paragraph gap — inside the
    1.5-linespacing glue window within a paragraph, outside it
    across), the real parser+glue runs, and the SQL oracle recomputes
    every glued paragraph box (top/bottom/text) from the same
    arithmetic. Zero shuffle: synthesis+parse+glue are one map pass."""
    from ...sources.pdf import glue_page_boxes, parse_pdf2xml

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def run(t: pa.Table) -> pa.Table:
        out_id, out_para, out_top, out_bot, out_text = \
            [], [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            words = (text or "").split()
            if not words:
                continue
            lpp = _pdf_lpp(did)
            lines = [words[i:i + PDF_WORDS_PER_LINE]
                     for i in range(0, len(words), PDF_WORDS_PER_LINE)]
            parts = ['<pdf2xml><page number="1" width="612" '
                     'height="100000">',
                     '<fontspec id="0" size="%d" family="Times" '
                     'color="#000"/>' % PDF_SIZE]
            for i, ws in enumerate(lines):
                para = i // lpp
                top = PDF_TOP0 + PDF_LINE_STEP * i + PDF_PARA_GAP * para
                parts.append(
                    '<text top="%d" left="%d" width="%d" height="%d" '
                    'font="0">%s </text>'
                    % (top, PDF_LEFT, PDF_BOX_W, PDF_BOX_H,
                       esc(" ".join(ws))))
            parts.append("</page></pdf2xml>")
            pages = parse_pdf2xml("".join(parts))
            for p in pages:
                for seq, box in enumerate(glue_page_boxes(p["boxes"])):
                    out_id.append(did)
                    out_para.append(seq)
                    out_top.append(box["top"])
                    out_bot.append(box["top"] + box["height"])
                    out_text.append(box["text"])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "para": pa.array(out_para, pa.int64()),
            "top": pa.array(out_top, pa.int64()),
            "bottom": pa.array(out_bot, pa.int64()),
            "text": pa.array(out_text, pa.string())})

    return ds.map_batches(run, batch_format="pyarrow")


PDF_TEXTBOXES_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
           FROM documents),
p AS (SELECT doc_id, w, len(w) AS nw,
             (len(w) + %(WPL)d - 1) // %(WPL)d AS nlines,
             2 + doc_id %% 3 AS lpp
      FROM t WHERE len(w) > 0),
paras AS (SELECT doc_id, w, nw, nlines, lpp,
                 CAST(unnest(range((nlines + lpp - 1) // lpp))
                      AS BIGINT) AS para
          FROM p)
SELECT doc_id, para,
       CAST(%(TOP0)d + %(STEP)d * (para * lpp)
            + %(GAP)d * para AS BIGINT) AS top,
       CAST(%(TOP0)d + %(STEP)d * least(nlines - 1, (para+1)*lpp - 1)
            + %(GAP)d * para + %(H)d AS BIGINT) AS bottom,
       array_to_string(
           w[para*lpp*%(WPL)d + 1 :
             least(nw, (least(nlines - 1, (para+1)*lpp - 1) + 1)
                   * %(WPL)d)], ' ') || ' ' AS text
FROM paras
""" % {"WPL": PDF_WORDS_PER_LINE, "TOP0": PDF_TOP0,
       "STEP": PDF_LINE_STEP, "GAP": PDF_PARA_GAP, "H": PDF_BOX_H}


PDF_CHUNK = 64


def pdf_roundtrip(sf_dir):
    """REAL-PDF round-trip through the exact-correctness gate: every
    document is written as an actual %%PDF file (sources/pdf.py
    build_pdf — FlateDecode streams, valid xref) with its text in
    64-char chunks as Tj show operations, then the content streams
    are decoded and interpreted back (extract_pdf_text: zlib +
    BT/ET Tf/Tm/Tj tokenizer) and the chunks reassembled. Equality
    with the documents table proves the binary writer+parser pair on
    real bytes — the push_roundtrip discipline applied to PDF. The
    reference needs poppler's pdftohtml for this step
    (pdfreader.py:332-404); here decode runs inside map_batches on
    binary payloads (the multimodal-column contract)."""
    from ...sources.pdf import build_pdf, extract_pdf_text

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            text = text or ""
            shows = [(72, 720 - 15 * j, 12,
                      text[j * PDF_CHUNK:(j + 1) * PDF_CHUNK])
                     for j in range((len(text) + PDF_CHUNK - 1)
                                    // PDF_CHUNK)] or [(72, 720, 12, "")]
            data = build_pdf([shows])
            back = "".join(s for _, _, _, _, s in
                           ((p, x, y, sz, txt) for p, x, y, sz, txt
                            in extract_pdf_text(data)))
            ids.append(did)
            texts.append(back)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(run, batch_format="pyarrow")


PDF_ROUNDTRIP_SQL = """
SELECT doc_id, text FROM documents
"""


def docx_roundtrip(sf_dir):
    """Word (.docx) round-trip: every document written as a REAL docx
    zip (sources/docx.py build_docx — [Content_Types].xml, rels,
    document.xml with each paragraph's runs deliberately SPLIT) and
    read back through parse_docx, which must merge the
    identically-formatted adjacent runs (the _merge_ooxml rule,
    wordreader.py:149-180) to reconstruct the exact text. Paragraphs
    = the document's sentences (split on '. ' — deterministic, SQL-
    replicable); equality of the rejoined text with the documents
    table proves zip + OOXML writer/parser and the merge rule."""
    from ...sources.docx import build_docx, parse_docx

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            paras = (text or "").split(". ")
            data = build_docx(paras)
            back = ". ".join(p["text"] for p in parse_docx(data))
            ids.append(did)
            texts.append(back)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(run, batch_format="pyarrow")


DOCX_ROUNDTRIP_SQL = """
SELECT doc_id, text FROM documents
"""


PDF_M_TITLE_SIZE, PDF_M_BODY_W = 16, 350


def pdf_margins(sf_dir):
    """PDFAnalyzer layout metrics (pdfanalyze.py:325-549) per source,
    through the REAL analysis code (sources/pdf.py margins_from_counts
    + styles_from_counts): every document lays out as a title line
    (Times-Bold 16 at top 36+2·(doc_id%3)), 6-word body lines
    (Times 12, left 72 — or 108 for every 5th doc —, right
    422+10·(doc_id%7)) and a small page-number footer; the analyzer's
    mode left margin, ceil-binned right margin with the 80%-candidate
    rule, 0.2% char-weighted header/footer walks and charcount style
    roles are recomputed by the SQL oracle from the same arithmetic.

    Scale shape: one map pass reduces the corpus to bounded
    (source, kind, coord, family, size) → charcount histograms
    (coordinate space ≤ pageheight), one tiny merge block, then an
    O(sources × pageheight) driver walk — the census discipline."""
    from ...sources.pdf import margins_from_counts, styles_from_counts

    PAGE_W, PAGE_H = 612, 4000
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "source"])

    def boxes_of(did: int, text: str):
        words = (text or "").split()
        if not words:
            return
        title = " ".join(words[:5])
        yield (36 + 2 * (did % 3), 72, 72 + 300, PDF_M_TITLE_SIZE,
               "Times-Bold", PDF_M_TITLE_SIZE, title)
        left = 108 if did % 5 == 0 else 72
        right = left + PDF_M_BODY_W + 10 * (did % 7)
        lpp = _pdf_lpp(did)
        n_lines = (len(words) + PDF_WORDS_PER_LINE - 1) \
            // PDF_WORDS_PER_LINE
        for i in range(n_lines):
            para = i // lpp
            top = PDF_TOP0 + PDF_LINE_STEP * i + PDF_PARA_GAP * para
            line = " ".join(
                words[i * PDF_WORDS_PER_LINE:
                      (i + 1) * PDF_WORDS_PER_LINE])
            yield (top, left, right, PDF_BOX_H, "Times", PDF_SIZE,
                   line)
        yield (3980, 300, 312, 10, "Times", 6, str(did % 100))

    def part(t: pa.Table) -> pd.DataFrame:
        rows: dict = {}
        for did, text, src in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["source"].to_pylist()):
            for top, left, right, h, fam, size, txt in \
                    boxes_of(did, text):
                n = len(txt.strip())
                for kind, coord in (("left", left), ("right", right),
                                    ("top", top),
                                    ("bottom", top + h)):
                    w = 1 if kind in ("left", "right") else n
                    key = (src, kind, coord, "", 0)
                    rows[key] = rows.get(key, 0) + w
                key = (src, "style", 0, fam, size)
                rows[key] = rows.get(key, 0) + n
        if not rows:
            return pd.DataFrame({"source": pd.Series(dtype=object),
                                 "kind": pd.Series(dtype=object),
                                 "coord": pd.Series(dtype="int64"),
                                 "family": pd.Series(dtype=object),
                                 "size": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        ks = list(rows)
        return pd.DataFrame({
            "source": [k[0] for k in ks],
            "kind": [k[1] for k in ks],
            "coord": pd.Series([k[2] for k in ks], dtype="int64"),
            "family": [k[3] for k in ks],
            "size": pd.Series([k[4] for k in ks], dtype="int64"),
            "n": pd.Series([rows[k] for k in ks], dtype="int64")})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["source", "kind", "coord", "family", "size"],
                       as_index=False)["n"].sum())
        out = []
        for src, sg in g.groupby("source"):
            def counter(kind):
                k = sg[sg["kind"] == kind]
                return dict(zip(k["coord"].astype(int),
                                k["n"].astype(int)))
            m = margins_from_counts(counter("left"), counter("right"),
                                    counter("top"), counter("bottom"),
                                    PAGE_W, PAGE_H)
            st = sg[sg["kind"] == "style"]
            sc = {(f, int(s)): int(n) for f, s, n in
                  zip(st["family"], st["size"], st["n"])}
            roles = styles_from_counts(sc)
            out.append({
                "source": src,
                "leftmargin": m["leftmargin"],
                "rightmargin": m["rightmargin"],
                "topmargin": m["topmargin"],
                "bottommargin": m["bottommargin"],
                "default_family": roles["default"][0],
                "default_size": roles["default"][1],
                "h1_family": roles.get("h1", ("", 0))[0],
                "h1_size": roles.get("h1", ("", 0))[1]})
        df = pd.DataFrame(out).sort_values("source") \
            .reset_index(drop=True)
        for c in ("leftmargin", "rightmargin", "topmargin",
                  "bottommargin", "default_size", "h1_size"):
            df[c] = df[c].astype("int64")
        return df

    return _merge_partials(
        ds.map_batches(part, batch_format="pyarrow"), finish)


PDF_MARGINS_SQL = """
WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS w
           FROM documents),
d AS (SELECT doc_id, source, w, len(w) AS nw,
             (len(w) + 5) // 6 AS nlines, 2 + doc_id % 3 AS lpp,
             CASE WHEN doc_id % 5 = 0 THEN 108 ELSE 72 END AS bleft,
             CASE WHEN doc_id % 5 = 0 THEN 108 ELSE 72 END
               + 350 + 10 * (doc_id % 7) AS bright
      FROM t WHERE len(w) > 0),
-- every box: (source, left, right, top, bottom, family, size, chars)
boxes AS (
  SELECT source, 72 AS l, 372 AS r, 36 + 2 * (doc_id % 3) AS top,
         36 + 2 * (doc_id % 3) + 16 AS bottom,
         'Times-Bold' AS family, 16 AS size,
         length(trim(array_to_string(w[1:least(nw,5)], ' '))) AS chars
  FROM d
  UNION ALL
  SELECT source, bleft, bright,
         72 + 15 * i + 15 * (i // lpp),
         72 + 15 * i + 15 * (i // lpp) + 12,
         'Times', 12,
         length(trim(array_to_string(
             w[i*6 + 1:least(nw, (i+1)*6)], ' ')))
  FROM d, LATERAL (SELECT CAST(unnest(range(nlines)) AS BIGINT) AS i)
  UNION ALL
  SELECT source, 300, 312, 3980, 3990, 'Times', 6,
         length(CAST(doc_id % 100 AS VARCHAR))
  FROM d),
-- left margin: mode of left edges below midpage (ties: smaller)
lm AS (
  SELECT source, l AS leftmargin FROM (
    SELECT source, l, count(*) AS n,
           row_number() OVER (PARTITION BY source
                              ORDER BY count(*) DESC, l ASC) AS rk
    FROM boxes WHERE 2 * l < 612 GROUP BY source, l)
  WHERE rk = 1),
-- right margin: ceil-10 bins above midpage, candidates 5n>=4top, max
rbins AS (
  SELECT source, ((r + 9) // 10) * 10 AS bin, count(*) AS n
  FROM boxes WHERE 2 * r > 612 GROUP BY source, ((r + 9) // 10) * 10),
rm AS (
  SELECT b.source, max(b.bin) AS rightmargin
  FROM rbins b JOIN (SELECT source, max(n) AS top FROM rbins
                     GROUP BY source) m ON b.source = m.source
  WHERE 5 * b.n >= 4 * m.top GROUP BY b.source),
-- header / footer: 0.2% char-weighted cumulative walks
tots AS (SELECT source, sum(chars) AS total FROM boxes
         GROUP BY source),
tcum AS (
  SELECT source, top AS coord,
         sum(sum(chars)) OVER (PARTITION BY source ORDER BY top)
           AS cum
  FROM boxes GROUP BY source, top),
hm AS (
  SELECT t.source, min(t.coord) - 1 AS topmargin
  FROM tcum t JOIN tots ON t.source = tots.source
  WHERE 1000 * t.cum > 2 * tots.total GROUP BY t.source),
bcum AS (
  SELECT source, bottom AS coord,
         sum(sum(chars)) OVER (PARTITION BY source
                               ORDER BY bottom DESC) AS cum
  FROM boxes GROUP BY source, bottom),
fm AS (
  SELECT b.source, max(b.coord) + 1 AS bottommargin
  FROM bcum b JOIN tots ON b.source = tots.source
  WHERE 1000 * b.cum > 2 * tots.total GROUP BY b.source),
-- styles: charcount mode (ties: smaller fontsize_key, family)
styles AS (SELECT source, family, size, sum(chars) AS n
           FROM boxes GROUP BY source, family, size),
defs AS (
  SELECT source, family AS default_family, size AS default_size
  FROM (SELECT source, family, size, n,
               row_number() OVER (PARTITION BY source
                 ORDER BY n DESC, size ASC,
                 CASE WHEN family LIKE '%Bold%' THEN 2
                      WHEN family LIKE '%Italic%' THEN 1
                      ELSE 0 END ASC, family ASC) AS rk
        FROM styles)
  WHERE rk = 1),
h1s AS (
  SELECT s.source, s.family AS h1_family, s.size AS h1_size
  FROM (SELECT st.source, st.family, st.size, st.n,
               row_number() OVER (PARTITION BY st.source
                 ORDER BY st.size DESC,
                 CASE WHEN st.family LIKE '%Bold%' THEN 2
                      WHEN st.family LIKE '%Italic%' THEN 1
                      ELSE 0 END DESC, st.family DESC) AS rk
        FROM styles st
        JOIN defs ON st.source = defs.source
        JOIN tots ON st.source = tots.source
        WHERE 1000 * st.n > 5 * tots.total
          AND (st.size > defs.default_size
               OR (st.size = defs.default_size
                   AND (CASE WHEN st.family LIKE '%Bold%' THEN 2
                             WHEN st.family LIKE '%Italic%' THEN 1
                             ELSE 0 END)
                     > (CASE WHEN defs.default_family
                               LIKE '%Bold%' THEN 2
                             WHEN defs.default_family
                               LIKE '%Italic%' THEN 1
                             ELSE 0 END)))) s
  WHERE s.rk = 1)
SELECT lm.source, CAST(lm.leftmargin AS BIGINT) AS leftmargin,
       CAST(rm.rightmargin AS BIGINT) AS rightmargin,
       CAST(hm.topmargin AS BIGINT) AS topmargin,
       CAST(fm.bottommargin AS BIGINT) AS bottommargin,
       defs.default_family, CAST(defs.default_size AS BIGINT)
         AS default_size,
       coalesce(h1s.h1_family, '') AS h1_family,
       CAST(coalesce(h1s.h1_size, 0) AS BIGINT) AS h1_size
FROM lm JOIN rm ON lm.source = rm.source
JOIN hm ON lm.source = hm.source
JOIN fm ON lm.source = fm.source
JOIN defs ON lm.source = defs.source
LEFT JOIN h1s ON lm.source = h1s.source
ORDER BY lm.source
"""


PDF_SEC_PARAS = 4   # body paragraphs per section


def pdf_sections(sf_dir):
    """PDF → structured document: the reference's
    PDFReader-feeds-sectionizer composition (pdfreader textboxes →
    FSM/style-driven section split, the repo pattern of e.g.
    ferenda/sources/tech — headings recognized BY STYLE ROLE, not by
    markup): documents render as pdf2xml with a Times-Bold-16 heading
    before every 4 body paragraphs, the real parse+glue runs, the
    heading ROLE is derived from the analyzer's style census (the h1
    of styles_from_counts per source — not hardcoded), and glued
    boxes fold into (doc_id, sec, title, n_paras, top) sections.

    Two bounded passes: the style census (map partials → tiny merge →
    20 driver rows, broadcast back by closure) and the per-doc
    parse+glue+fold map. SQL replays both — including deriving h1
    from the same census arithmetic."""
    from ...sources.pdf import (
        glue_page_boxes,
        parse_pdf2xml,
        styles_from_counts,
    )

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "source"])

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def synth(did: int, text: str) -> str | None:
        words = (text or "").split()
        if not words:
            return None
        lpp = _pdf_lpp(did)
        nlines = (len(words) + PDF_WORDS_PER_LINE - 1) \
            // PDF_WORDS_PER_LINE
        parts = ['<pdf2xml><page number="1" width="612" '
                 'height="100000">',
                 '<fontspec id="0" size="%d" family="Times" '
                 'color="#000"/>' % PDF_SIZE,
                 '<fontspec id="1" size="%d" family="Times-Bold" '
                 'color="#000"/>' % PDF_M_TITLE_SIZE]
        for i in range(nlines):
            para = i // lpp
            if i % (lpp * PDF_SEC_PARAS) == 0:
                k = para // PDF_SEC_PARAS
                gl = i + k
                pidx = para + k
                top = PDF_TOP0 + PDF_LINE_STEP * gl \
                    + PDF_PARA_GAP * pidx
                parts.append(
                    '<text top="%d" left="%d" width="300" '
                    'height="%d" font="1">Part %d</text>'
                    % (top, PDF_LEFT, PDF_M_TITLE_SIZE, k + 1))
            nheads = para // PDF_SEC_PARAS + 1
            gl = i + nheads
            pidx = para + nheads
            top = PDF_TOP0 + PDF_LINE_STEP * gl + PDF_PARA_GAP * pidx
            line = " ".join(words[i * PDF_WORDS_PER_LINE:
                                  (i + 1) * PDF_WORDS_PER_LINE])
            parts.append(
                '<text top="%d" left="%d" width="%d" height="%d" '
                'font="0">%s </text>'
                % (top, PDF_LEFT, PDF_BOX_W, PDF_BOX_H, esc(line)))
        parts.append("</page></pdf2xml>")
        return "".join(parts)

    # pass 1: style census per source → h1 role (the analyzer's)
    def style_part(t: pa.Table) -> pd.DataFrame:
        rows: dict = {}
        for did, text, src in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["source"].to_pylist()):
            xml = synth(did, text)
            if xml is None:
                continue
            for page in parse_pdf2xml(xml):
                for b in page["boxes"]:
                    key = (src, b["family"], b["size"])
                    rows[key] = rows.get(key, 0) \
                        + len(b["text"].strip())
        ks = list(rows)
        return pd.DataFrame({
            "source": [k[0] for k in ks],
            "family": [k[1] for k in ks],
            "size": pd.Series([k[2] for k in ks], dtype="int64"),
            "n": pd.Series([rows[k] for k in ks], dtype="int64")})

    census = _merge_partials(
        ds.map_batches(style_part, batch_format="pyarrow"),
        lambda g: g.groupby(["source", "family", "size"],
                            as_index=False)["n"].sum()).to_pandas()
    h1_by_source = {}
    for src, sg in census.groupby("source"):
        sc = {(f, int(s)): int(n) for f, s, n in
              zip(sg["family"], sg["size"], sg["n"])}
        roles = styles_from_counts(sc)
        if "h1" in roles:
            h1_by_source[src] = roles["h1"]

    # pass 2: parse + glue + fold into sections under h1-role boxes
    def fold(t: pa.Table) -> pa.Table:
        out = {k: [] for k in
               ("doc_id", "sec", "title", "n_paras", "top")}
        for did, text, src in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["source"].to_pylist()):
            xml = synth(did, text)
            if xml is None:
                continue
            h1 = h1_by_source.get(src)
            sec = -1
            for page in parse_pdf2xml(xml):
                for box in glue_page_boxes(page["boxes"]):
                    if (box["family"], box["size"]) == h1:
                        sec += 1
                        out["doc_id"].append(did)
                        out["sec"].append(sec)
                        out["title"].append(box["text"])
                        out["n_paras"].append(0)
                        out["top"].append(box["top"])
                    elif sec >= 0:
                        out["n_paras"][-1] += 1
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "sec": pa.array(out["sec"], pa.int64()),
            "title": pa.array(out["title"], pa.string()),
            "n_paras": pa.array(out["n_paras"], pa.int64()),
            "top": pa.array(out["top"], pa.int64())})

    return ds.map_batches(fold, batch_format="pyarrow")


PDF_SECTIONS_SQL = """
WITH t AS (SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS w
           FROM documents),
d AS (SELECT doc_id, source, len(w) AS nw,
             (len(w) + 5) // 6 AS nlines, 2 + doc_id %% 3 AS lpp
      FROM t WHERE len(w) > 0),
dd AS (SELECT *, (nlines + lpp - 1) // lpp AS nparas FROM d),
-- the style census the analyzer derives h1 from: headings carry
-- 'Part N' (len 6 for N<10, 7 for N<100, ...), body carries the
-- line chars — h1 = largest significant non-default style
chars AS (
  SELECT source, 'Times-Bold' AS family, 16 AS size,
         sum(length('Part ' || CAST(k + 1 AS VARCHAR)))
           AS n
  FROM dd, LATERAL (SELECT CAST(unnest(range((nparas + %(SP)d - 1)
                                             // %(SP)d)) AS BIGINT)
                    AS k)
  GROUP BY source
  UNION ALL
  SELECT d2.source, 'Times', 12,
         sum(length(trim(array_to_string(
             t2.w[i*6 + 1:least(d2.nw, (i+1)*6)], ' '))))
  FROM dd d2 JOIN t t2 USING (doc_id),
       LATERAL (SELECT CAST(unnest(range(d2.nlines)) AS BIGINT)
                AS i)
  GROUP BY d2.source),
tots AS (SELECT source, sum(n) AS total FROM chars GROUP BY source),
defs AS (
  SELECT source, family AS dfam, size AS dsize FROM (
    SELECT source, family, size, n,
           row_number() OVER (PARTITION BY source
             ORDER BY n DESC, size ASC,
             CASE WHEN family LIKE '%%Bold%%' THEN 2
                  WHEN family LIKE '%%Italic%%' THEN 1
                  ELSE 0 END ASC, family ASC) AS rk
    FROM chars) WHERE rk = 1),
h1s AS (
  SELECT source, family AS h1fam, size AS h1size FROM (
    SELECT c.source, c.family, c.size,
           row_number() OVER (PARTITION BY c.source
             ORDER BY c.size DESC, c.family DESC) AS rk
    FROM chars c JOIN defs ON c.source = defs.source
    JOIN tots ON c.source = tots.source
    WHERE 1000 * c.n > 5 * tots.total AND c.size > defs.dsize)
  WHERE rk = 1)
-- sections: heading k sits before body paragraph 4k; its glued-box
-- top replays the slot arithmetic (gl = body lines before + k,
-- paragraph index = body paras before + k)
SELECT dd.doc_id, CAST(k AS BIGINT) AS sec,
       'Part ' || CAST(k + 1 AS VARCHAR) AS title,
       CAST(least(dd.nparas - k * %(SP)d, %(SP)d) AS BIGINT)
         AS n_paras,
       CAST(%(T0)d + %(ST)d * (least(k * %(SP)d * dd.lpp, dd.nlines)
                               + k)
            + %(GAP)d * (least(k * %(SP)d, dd.nparas) + k)
            AS BIGINT) AS top
FROM dd JOIN h1s ON dd.source = h1s.source
     AND h1s.h1fam = 'Times-Bold' AND h1s.h1size = 16,
     LATERAL (SELECT CAST(unnest(range((dd.nparas + %(SP)d - 1)
                                       // %(SP)d)) AS BIGINT) AS k)
""" % {"SP": PDF_SEC_PARAS, "T0": PDF_TOP0, "ST": PDF_LINE_STEP,
       "GAP": PDF_PARA_GAP}


def pdf_pagination(sf_dir):
    """Physical→printed page-number mapping (pdfanalyze.py:114-236
    paginate / guess_pagenumber family) through the REAL code path
    (sources/pdf.py paginate_pages): every document renders as a
    multi-page pdf2xml — doc_id%3 roman front-matter pages ('i',
    'ii'), then arabic body pages restarting at 1, every page also
    carrying a '2013' header (the year guard must ignore it), and
    every 5th document OMITS its page-3 number box (the walk must
    carry the expectation forward). The strict-arabic rule, the
    roman-only-on-page-1-or-roman-expectation rule, the
    probable-first/smallest-≥/TypeError-fallback selection and
    util.increment's roman carry all execute for real; the SQL
    oracle recomputes the printed string per physical page from the
    same arithmetic. One map pass, zero shuffle."""
    from ...sources.pdf import paginate_pages, parse_pdf2xml

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def run(t: pa.Table) -> pa.Table:
        from ...functions import to_roman

        out_id, out_phys, out_printed = [], [], []
        for did in t["doc_id"].to_pylist():
            front = did % 3
            total = 3 + did % 4
            parts = ["<pdf2xml>"]
            for k in range(1, total + 1):
                parts.append(
                    '<page number="%d" width="612" height="792">' % k)
                parts.append(
                    '<fontspec id="0" size="10" family="Times" '
                    'color="#000"/>' if k == 1 else "")
                parts.append(
                    '<text top="20" left="400" width="40" '
                    'height="10" font="0">2013</text>')
                parts.append(
                    '<text top="60" left="72" width="300" '
                    'height="10" font="0">body of page %d</text>' % k)
                # omit page 3's number only for all-arabic docs:
                # an omission AT the roman→arabic switch would keep
                # the roman expectation (walk-correct, but then the
                # printed value is genuinely path-dependent)
                if not (k == 3 and did % 5 == 0 and front == 0):
                    num = to_roman(k, lower=True) if k <= front \
                        else str(k - front)
                    parts.append(
                        '<text top="770" left="300" width="20" '
                        'height="10" font="0">%s</text>' % num)
                parts.append("</page>")
            parts.append("</pdf2xml>")
            pages = parse_pdf2xml("".join(parts),
                                  detect_footnotes=False)
            mapping = paginate_pages(
                [(p["number"], p["boxes"]) for p in pages])
            for phys, printed in mapping:
                out_id.append(did)
                out_phys.append(phys)
                out_printed.append(str(printed))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "physical": pa.array(out_phys, pa.int64()),
            "printed": pa.array(out_printed, pa.string())})

    return ds.map_batches(run, batch_format="pyarrow")


PDF_PAGINATION_SQL = """
WITH d AS (SELECT doc_id, doc_id % 3 AS front,
                  3 + doc_id % 4 AS total FROM documents)
SELECT doc_id, CAST(k AS BIGINT) AS physical,
       CASE WHEN k <= front THEN (CASE k WHEN 1 THEN 'i'
                                         WHEN 2 THEN 'ii' END)
            ELSE CAST(k - front AS VARCHAR) END AS printed
FROM d, LATERAL (SELECT CAST(unnest(range(1, total + 1)) AS BIGINT)
                 AS k)
"""
