"""Time travel, data-quality audits, weighted selection, ER blocking,
forecast backtests."""

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
from ._shared import (
    RADIX_SHIFT,
    _exchange_buckets,
    _merge_partials,
    _read,
    _tag_bucket,
)
from .relational import CDC_DEL_MOD, CDC_INS_MOD, CDC_INS_OFF, CDC_UPD_MOD
from .embeddings import EMB_DIM, EMB_QUANT
from .graph import _CITE_EDGES_SQL, _kg_edges
from .tpch_extra import BASKET_MINSUP, BASKET_TOPK


# --- time travel / data-quality / weighted selection -----------------
# Second CDC delta (version 2) on top of orders_cdc_merge's delta —
# pure key arithmetic so both engines replay it. Applies to whatever
# key is ALIVE at v1 (including inserted keys k + CDC_INS_OFF).
TT_UPD2_MOD, TT_DEL2_MOD, TT_UPD2_CENTS = 21, 29, 50


def orders_time_travel(sf_dir):
    """Time-travel reads over a versioned table (Delta Lake /
    Iceberg `AS OF` — Armbrust VLDB'20): the table has a version
    ladder v0 (base orders) → v1 (the orders_cdc_merge delta:
    +100-cent updates %10, deletes %17, inserts %23 under
    key+10⁷) → v2 (a second delta: +50-cent updates on keys %21
    alive at v1, deletes %29), and a reader must see EXACTLY the
    state as of its pinned version — later deltas invisible.

    Scale shape: each version's aggregate folds by the SIGNED
    Delta-law (orders_ivm_counts): agg(v) = agg(v0) + Σ_{i≤v}
    signed_agg(δᵢ), and because every delta is key arithmetic the
    map side derives all three versions' (n, cents) partials from
    each base batch directly — ZERO shuffle, bounded 3-row merge.
    A file-borne delta would ride orders_cdc_merge's key-bucketed
    exchange instead; the aggregate fold is the same."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        n0, c0 = len(k), int(cents.sum())
        # v1: surviving base rows (+100 on %10 survivors) + inserts
        alive1 = k % CDC_DEL_MOD != 0
        c1b = cents + 100 * ((k % CDC_UPD_MOD == 0) & alive1)
        ins = k % CDC_INS_MOD == 0
        keys1 = np.concatenate([k[alive1], k[ins] + CDC_INS_OFF])
        cents1 = np.concatenate([c1b[alive1], cents[ins]])
        n1, c1 = len(keys1), int(cents1.sum())
        # v2: delta 2 applied to the v1 state
        alive2 = keys1 % TT_DEL2_MOD != 0
        c2v = cents1[alive2] + TT_UPD2_CENTS * (
            keys1[alive2] % TT_UPD2_MOD == 0)
        n2, c2 = int(alive2.sum()), int(c2v.sum())
        return pd.DataFrame({
            "version": pd.Series([0, 1, 2], dtype="int64"),
            "n_rows": pd.Series([n0, n1, n2], dtype="int64"),
            "total_cents": pd.Series([c0, c1, c2], dtype="int64")})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("version", as_index=False)
               .agg(n_rows=("n_rows", "sum"),
                    total_cents=("total_cents", "sum"))
               .sort_values("version").reset_index(drop=True))
        return out.astype("int64")

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_partials(partials, merge)


ORDERS_TIME_TRAVEL_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
v1 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN 100 ELSE 0 END AS c
  FROM base WHERE k %% %d <> 0
  UNION ALL
  SELECT k + %d, c FROM base WHERE k %% %d = 0),
v2 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN %d ELSE 0 END AS c
  FROM v1 WHERE k %% %d <> 0)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT)
         AS n_rows, CAST(sum(c) AS BIGINT) AS total_cents FROM base
  UNION ALL
  SELECT 1, count(*), CAST(sum(c) AS BIGINT) FROM v1
  UNION ALL
  SELECT 2, count(*), CAST(sum(c) AS BIGINT) FROM v2)
ORDER BY version
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_OFF, CDC_INS_MOD,
       TT_UPD2_MOD, TT_UPD2_CENTS, TT_DEL2_MOD)


DQ_CHECKS = ("not_null:o_orderkey", "unique:o_orderkey",
             "accepted_values:o_orderstatus",
             "domain:o_orderkey_lt_ins_off", "absent:cdc_deleted_keys",
             "non_negative:total_cents")


def orders_dq_expectations(sf_dir):
    """Declarative data-quality expectation suite (deequ — Schelter
    VLDB'18; Great Expectations) validated against a PIPELINE OUTPUT
    — the post-CDC-merge orders table — not the pristine input, so
    the suite actually bites: the delta's inserted rows carry status
    'N' (violates accepted_values {F,O,P}) and keys ≥ 10⁷ (violates
    the key-domain bound), while uniqueness / not-null / no-deleted-
    keys / non-negative pass, proving the merge. Output = one row
    per check: (check, total, violations, passed).

    Scale shape: five of the six checks are per-batch count
    partials (lossless combiner, zero shuffle); uniqueness is the
    one genuinely distributed check — batch-local (key, cnt)
    distinct partials through ONE key-bucketed exchange, per-bucket
    violations = Σ(cnt−1) additive because a key lives in exactly
    one bucket. The union of both partial streams meets in a single
    bounded 6-row merge."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def v1_rows(t: pa.Table):
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        alive1 = k % CDC_DEL_MOD != 0
        c1b = cents + 100 * ((k % CDC_UPD_MOD == 0) & alive1)
        ins = k % CDC_INS_MOD == 0
        keys1 = np.concatenate([k[alive1], k[ins] + CDC_INS_OFF])
        cents1 = np.concatenate([c1b[alive1], cents[ins]])
        st1 = np.concatenate(
            [st[alive1], np.full(int(ins.sum()), "N", dtype=object)])
        return keys1, cents1, st1

    def scan_checks(t: pa.Table) -> pd.DataFrame:
        keys1, cents1, st1 = v1_rows(t)
        n = len(keys1)
        viol = [
            0,  # not_null: synthesized keys are never null
            0,  # unique: measured by the exchange branch below
            int((~np.isin(st1, ("F", "O", "P"))).sum()),
            int((keys1 >= CDC_INS_OFF).sum()),
            int(((keys1 < CDC_INS_OFF)
                 & (keys1 % CDC_DEL_MOD == 0)).sum()),
            int((cents1 < 0).sum()),
        ]
        tot = [n, 0, n, n, n, n]  # unique totals ride the exchange
        return pd.DataFrame({
            "ci": pd.Series(range(len(DQ_CHECKS)), dtype="int64"),
            "total": pd.Series(tot, dtype="int64"),
            "violations": pd.Series(viol, dtype="int64")})

    def key_partial(t: pa.Table) -> pd.DataFrame:
        keys1, _, _ = v1_rows(t)
        p = (pd.DataFrame({"k": keys1})
             .groupby("k", as_index=False).size()
             .rename(columns={"size": "cnt"}))
        h = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        p["cnt"] = p["cnt"].astype("int64")
        p["k"] = p["k"].astype("int64")
        return p

    def bucket_unique(g: pd.DataFrame) -> pd.DataFrame:
        per_key = g.groupby("k")["cnt"].sum()
        return pd.DataFrame({
            "ci": pd.Series([1], dtype="int64"),
            "total": pd.Series([int(per_key.sum())], dtype="int64"),
            "violations": pd.Series([int((per_key - 1).sum())],
                                    dtype="int64")})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    scans = ds.map_batches(scan_checks, batch_format="pyarrow")
    uniq = (ds.map_batches(key_partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_unique, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("ci", as_index=False)
             .agg(total=("total", "sum"),
                  violations=("violations", "sum"))
             .sort_values("ci").reset_index(drop=True))
        return pd.DataFrame({
            "check": pd.Series([DQ_CHECKS[int(i)] for i in g["ci"]],
                               dtype=object),
            "total": g["total"].astype("int64"),
            "violations": g["violations"].astype("int64"),
            "passed": (g["violations"] == 0).astype("int64")})

    return _merge_partials(scans.union(uniq), merge)


ORDERS_DQ_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         o_orderstatus AS st
  FROM orders),
v1 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN 100 ELSE 0 END AS c, st
  FROM base WHERE k %% %d <> 0
  UNION ALL
  SELECT k + %d, c, 'N' FROM base WHERE k %% %d = 0),
checks AS (
  SELECT 'not_null:o_orderkey' AS chk, count(*) AS total,
         count(*) - count(k) AS violations FROM v1
  UNION ALL
  SELECT 'unique:o_orderkey', count(*),
         count(*) - count(DISTINCT k) FROM v1
  UNION ALL
  SELECT 'accepted_values:o_orderstatus', count(*),
         sum(CASE WHEN st NOT IN ('F','O','P') THEN 1 ELSE 0 END)
  FROM v1
  UNION ALL
  SELECT 'domain:o_orderkey_lt_ins_off', count(*),
         sum(CASE WHEN k >= %d THEN 1 ELSE 0 END) FROM v1
  UNION ALL
  SELECT 'absent:cdc_deleted_keys', count(*),
         sum(CASE WHEN k < %d AND k %% %d = 0 THEN 1 ELSE 0 END)
  FROM v1
  UNION ALL
  SELECT 'non_negative:total_cents', count(*),
         sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) FROM v1)
SELECT chk AS "check", CAST(total AS BIGINT) AS total,
       CAST(violations AS BIGINT) AS violations,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT)
       AS passed
FROM checks ORDER BY chk
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_OFF, CDC_INS_MOD,
       CDC_INS_OFF, CDC_INS_OFF, CDC_DEL_MOD)


def lineitem_weighted_median(sf_dir):
    """Per-returnflag WEIGHTED median: the exact weighted order
    statistic (50% of shipped QUANTITY lies at or below the answer
    price) — the statistic behind weighted percentile SLAs and
    cost-weighted histogram equalization; quantity-weighted, so a
    10-unit line counts ten times a 1-unit line. Same grouped
    two-pass radix selection as segment_price_median, with weight
    sums replacing row counts in both histogram passes: no sort at
    any scale, ranks are weight ranks.

    Pass 1 histograms Σw per (flag, cents>>RADIX_SHIFT) — bounded
    |flags|×2^14 cells, a lossless combiner; the per-flag cumulative
    walk pins target = (W+1)//2 to one high bucket + residual weight
    rank. Pass 2 histograms Σw per full value inside only the
    selected cells (pruned map-side) and walks to the smallest value
    whose cumulative weight reaches the residual — the rule SQL
    replays via a window cumsum, engine-independent because ties are
    value ties."""

    def wv_of(t: pa.Table):
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        w = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        f = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        return f, v, w

    wm_schema = pa.schema([("f", pa.string()), ("k", pa.int64()),
                           ("w", pa.int64())])

    def hist_hi(t: pa.Table) -> pa.Table:
        f, v, w = wv_of(t)
        out = (pd.DataFrame({"f": f, "k": v >> RADIX_SHIFT, "w": w})
               .groupby(["f", "k"], as_index=False)["w"].sum())
        return pa.Table.from_arrays(
            [pa.array(out["f"], pa.string()),
             pa.array(out["k"].to_numpy(np.int64)),
             pa.array(out["w"].to_numpy(np.int64))], schema=wm_schema)

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice",
                        "l_quantity"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby(["f", "k"], as_index=False)["w"].sum())
    targets = {}   # flag -> (hi_bucket, residual_weight_rank, W)
    for flag, grp in h1.groupby("f"):
        grp = grp.sort_values("k")
        W = int(grp["w"].sum())
        tgt = (W + 1) // 2
        cum = grp["w"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, tgt))
        prev = int(cum[i - 1]) if i else 0
        targets[flag] = (int(grp["k"].iloc[i]), tgt - prev, W)
    wanted = {(flag, hi) for flag, (hi, _, _) in targets.items()}

    def hist_lo(t: pa.Table) -> pa.Table:
        f, v, w = wv_of(t)
        hi = v >> RADIX_SHIFT
        m = np.zeros(len(f), dtype=bool)  # |wanted| = |flags| passes,
        for flag, hi_sel in wanted:       # each one vectorized
            m |= (f == flag) & (hi == hi_sel)
        out = (pd.DataFrame({"f": f[m], "k": v[m], "w": w[m]})
               .groupby(["f", "k"], as_index=False)["w"].sum())
        return pa.Table.from_arrays(
            [pa.array(out["f"], pa.string()),
             pa.array(out["k"].to_numpy(np.int64)),
             pa.array(out["w"].to_numpy(np.int64))], schema=wm_schema)

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby(["f", "k"], as_index=False)["w"].sum())
    rows = []
    for flag in sorted(targets):
        hi_sel, resid, W = targets[flag]
        grp = h2[h2["f"] == flag].sort_values("k")
        cum = grp["w"].cumsum().to_numpy()
        j = int(np.searchsorted(cum, resid))
        rows.append((flag, W, int(grp["k"].iloc[j])))
    return pd.DataFrame({
        "l_returnflag": pd.Series([r[0] for r in rows], dtype=object),
        "w_total": pd.Series([r[1] for r in rows], dtype="int64"),
        "median_cents": pd.Series([r[2] for r in rows],
                                  dtype="int64")})


# Bloom audit constants: m deliberately small so the audit is
# non-degenerate at test scales (sf0.001 fill ≈ 17% → measurable FPs;
# sf0.01 saturates the filter, SHOWING the m-sizing tradeoff the
# membership_join bloom_fp parameter governs).
BLOOM_AUDIT_M = 1 << 14
BLOOM_AUDIT_K = 2
BLOOM_PROBE_OFF = 100_000_000


def bloom_fpr_audit(sf_dir):
    """Bloom-filter false-positive-rate audit — the measurement that
    validates ``joins.membership_join``'s Bloom pre-filter contract
    (no false negatives; FPR governed by fill ratio) before trusting
    it at 100 TB (Bloom '70; Broder & Mitzenmacher '04 survey).
    Members = order keys; probes = keys + 10⁸ (guaranteed
    non-members); filter bits use the repo's md5-hex discipline so
    DuckDB replays the EXACT bit arithmetic — the audit is fully
    oracled, unlike the production filter's siphash.

    Scale shape: pass 1 emits batch-local DISTINCT bit positions (a
    bounded ≤2^14 domain → lossless combiner), driver-merged and
    broadcast once via ray.put; pass 2 probes map-side with two
    np.isin checks per batch and emits (n, fp) count partials —
    both passes zero shuffle, single bounded merge row. Per-key md5
    is the audit's honest cost (the same per-row loop as
    orders_checksum)."""
    import hashlib
    import ray

    def bitpos(key: int, i: int) -> int:
        h = hashlib.md5(b"bf:%d:%d" % (key, i)).hexdigest()
        return int(h[:15], 16) % BLOOM_AUDIT_M

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def member_bits(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        bits = {bitpos(int(key), i)
                for key in k for i in range(BLOOM_AUDIT_K)}
        return pd.DataFrame({"bit": pd.Series(sorted(bits),
                                              dtype="int64")})

    bits = np.sort(ds.map_batches(member_bits, batch_format="pyarrow")
                   .to_pandas()["bit"].drop_duplicates()
                   .to_numpy(np.int64))
    bits_ref = ray.put(bits)
    bits_set = len(bits)

    def probe(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        b = _ray.get(bits_ref)
        k = t["o_orderkey"].to_numpy()
        cols = [np.fromiter((bitpos(int(key) + BLOOM_PROBE_OFF, i)
                             for key in k), np.int64, len(k))
                for i in range(BLOOM_AUDIT_K)]
        maybe = np.ones(len(k), dtype=bool)
        for c in cols:
            maybe &= np.isin(c, b)
        return pd.DataFrame({"n": pd.Series([len(k)], dtype="int64"),
                             "fp": pd.Series([int(maybe.sum())],
                                             dtype="int64")})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n, fp = int(df["n"].sum()), int(df["fp"].sum())
        return pd.DataFrame({
            "n_keys": pd.Series([n], dtype="int64"),
            "bits_set": pd.Series([bits_set], dtype="int64"),
            "measured_fp": pd.Series([fp], dtype="int64"),
            "fill_permille": pd.Series(
                [1000 * bits_set // BLOOM_AUDIT_M], dtype="int64")})

    partials = ds.map_batches(probe, batch_format="pyarrow")
    return _merge_partials(partials, merge)


BLOOM_FPR_SQL = """
WITH keys AS (SELECT o_orderkey AS k FROM orders),
hs AS (SELECT 0 AS i UNION ALL SELECT 1),
mb AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5('bf:' || CAST(k AS VARCHAR) || ':'
              || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) %% %d AS bit
  FROM keys, hs),
pb AS (
  SELECT k,
         bool_and(
           CAST('0x' || substr(md5('bf:'
                || CAST(k + %d AS VARCHAR) || ':'
                || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) %% %d
           IN (SELECT bit FROM mb)) AS maybe
  FROM keys, hs GROUP BY k)
SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
       CAST((SELECT count(*) FROM mb) AS BIGINT) AS bits_set,
       CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         AS measured_fp,
       CAST(1000 * (SELECT count(*) FROM mb) // %d AS BIGINT)
         AS fill_permille
FROM pb
""" % (BLOOM_AUDIT_M, BLOOM_PROBE_OFF, BLOOM_AUDIT_M, BLOOM_AUDIT_M)


WEIGHTED_MEDIAN_SQL = """
WITH wv AS (
  SELECT l_returnflag AS f,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem),
g AS (SELECT f, v, CAST(sum(w) AS BIGINT) AS w FROM wv GROUP BY 1, 2),
c AS (SELECT f, v, sum(w) OVER (PARTITION BY f ORDER BY v) AS cw,
             (sum(w) OVER (PARTITION BY f) + 1) // 2 AS tgt
      FROM g),
m AS (SELECT f, min(v) AS median_cents FROM c WHERE cw >= tgt
      GROUP BY f),
t AS (SELECT f, CAST(sum(w) AS BIGINT) AS w_total FROM wv GROUP BY f)
SELECT t.f AS l_returnflag, t.w_total,
       CAST(m.median_cents AS BIGINT) AS median_cents
FROM t JOIN m ON m.f = t.f ORDER BY 1
"""


def orders_price_mad(sf_dir):
    """Median absolute deviation of the order price — the robust
    scale estimator (Hampel '74; the statistic behind robust z-score
    outlier fences, pairing orders_winsorized_mean's robust
    location): MAD = median(|x − median(x)|), both medians EXACT
    order statistics found by the two-pass radix selection — four
    zero-shuffle histogram passes total, no sort at any scale.

    Selection rule everywhere: rank (N+1)//2, answer = smallest
    value whose cumulative count reaches it (ties are value ties, so
    rank→value is engine-independent; SQL replays via row_number).
    The deviation pass re-reads the column and subtracts the
    broadcast median map-side — deviations never materialize as a
    table."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def select_median(value_fn) -> tuple[int, int]:
        """Two-pass radix selection of rank (N+1)//2 over
        ``value_fn(batch) -> int64 array``. Returns (N, value)."""
        def hist_hi(t: pa.Table) -> pd.DataFrame:
            out = (pd.DataFrame({"hi": value_fn(t) >> RADIX_SHIFT})
                   .groupby("hi", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")

        h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
              .to_pandas()
              .groupby("hi", as_index=False)["n"].sum()
              .sort_values("hi").reset_index(drop=True))
        n_total = int(h1["n"].sum())
        tgt = (n_total + 1) // 2
        cum = h1["n"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, tgt))
        hi_sel = int(h1["hi"].iloc[i])
        resid = tgt - (int(cum[i - 1]) if i else 0)

        def hist_lo(t: pa.Table) -> pd.DataFrame:
            v = value_fn(t)
            v = v[(v >> RADIX_SHIFT) == hi_sel]
            out = (pd.DataFrame({"v": v})
                   .groupby("v", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")

        h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
              .to_pandas()
              .groupby("v", as_index=False)["n"].sum()
              .sort_values("v").reset_index(drop=True))
        c2 = h2["n"].cumsum().to_numpy()
        j = int(np.searchsorted(c2, resid))
        return n_total, int(h2["v"].iloc[j])

    n, med = select_median(cents_of)
    _, mad = select_median(lambda t: np.abs(cents_of(t) - med))
    return pd.DataFrame({
        "n_orders": pd.Series([n], dtype="int64"),
        "median_cents": pd.Series([med], dtype="int64"),
        "mad_cents": pd.Series([mad], dtype="int64")})


ORDERS_MAD_SQL = """
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
cnt AS (SELECT count(*) AS n FROM v),
m AS (
  SELECT c AS med FROM
    (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v), cnt
  WHERE rn = (n + 1) // 2),
d AS (SELECT abs(c - (SELECT med FROM m)) AS dv FROM v),
md AS (
  SELECT dv FROM
    (SELECT dv, row_number() OVER (ORDER BY dv) AS rn FROM d), cnt
  WHERE rn = (n + 1) // 2)
SELECT CAST((SELECT n FROM cnt) AS BIGINT) AS n_orders,
       CAST((SELECT med FROM m) AS BIGINT) AS median_cents,
       CAST((SELECT dv FROM md) AS BIGINT) AS mad_cents
"""


JOIN_SAMPLE_HEX = "0"  # md5 first hex char → sampling rate 1/16
JOIN_SAMPLE_RATE = 16


def orderkey_join_sample_estimate(sf_dir):
    """Sampled join-size estimation vs exact truth — the optimizer's
    actual workflow (sample keys, scale up) audited against the
    exact answer orderkey_join_stats computes, in ONE pass: keys
    whose md5 hex starts with '0' (a deterministic 1/16 KEY sample —
    seedless-shuffle discipline, so both engines draw the SAME
    sample) contribute cnt_li·cnt_od to the estimate, scaled ×16;
    the same bucket pass sums the unscaled products for the truth.
    Output = (true_pairs, est_pairs, err_permille) — the error the
    estimator actually made, as data.

    Scale shape: per-batch (key, side) count partials (lossless
    combiner) ride the ONE key-bucketed tagged exchange of
    orderkey_join_stats; each bucket multiplies vectorized, md5-tags
    its distinct keys once, and emits a 2-integer partial; single
    bounded merge."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["k", "n", "_bucket", "_side"]

    def prep(table: str, col: str, side: int):
        def fn(t: pa.Table) -> pd.DataFrame:
            p = (pd.DataFrame({"k": t[col].to_numpy()})
                 .groupby("k", as_index=False).size()
                 .rename(columns={"size": "n"}))
            p["n"] = p["n"].astype("int64")
            return _tag_bucket(p, buckets, side, COLS, key="k")
        return _read(sf_dir, table, columns=[col]).map_batches(
            fn, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0].groupby("k")["n"].sum())
        od_ = (g[g["_side"] == 1].groupby("k")["n"].sum())
        j = pd.DataFrame({"a": li_, "b": od_}).dropna()
        a = j["a"].to_numpy(np.int64)
        b = j["b"].to_numpy(np.int64)
        prod = a * b
        sampled = np.fromiter(
            (hashlib.md5(str(int(k)).encode()).hexdigest()[0]
             == JOIN_SAMPLE_HEX for k in j.index),
            dtype=bool, count=len(j))
        return pd.DataFrame({
            "true_pairs": pd.Series([int(prod.sum())], dtype="int64"),
            "sampled_pairs": pd.Series([int(prod[sampled].sum())],
                                       dtype="int64")})

    tagged = prep("lineitem", "l_orderkey", 0).union(
        prep("orders", "o_orderkey", 1))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_pairs, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        true = int(df["true_pairs"].sum())
        est = JOIN_SAMPLE_RATE * int(df["sampled_pairs"].sum())
        err = 1000 * abs(est - true) // max(true, 1)
        return pd.DataFrame({
            "true_pairs": pd.Series([true], dtype="int64"),
            "est_pairs": pd.Series([est], dtype="int64"),
            "err_permille": pd.Series([err], dtype="int64")})

    return _merge_partials(per_bucket, merge)


JOIN_SAMPLE_SQL = """
WITH li AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem
            GROUP BY 1),
od AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1),
j AS (
  SELECT li.k, li.n * od.n AS prod,
         CASE WHEN substr(md5(CAST(li.k AS VARCHAR)), 1, 1) = '%s'
              THEN 1 ELSE 0 END AS s
  FROM li JOIN od ON od.k = li.k),
t AS (SELECT CAST(sum(prod) AS BIGINT) AS true_pairs,
             CAST(%d * sum(prod * s) AS BIGINT) AS est_pairs
      FROM j)
SELECT true_pairs, est_pairs,
       CAST(1000 * abs(est_pairs - true_pairs)
            // greatest(true_pairs, 1) AS BIGINT) AS err_permille
FROM t
""" % (JOIN_SAMPLE_HEX, JOIN_SAMPLE_RATE)


SQ8_DIV, SQ8_CLIP, SQ8_K = 64, 15, 10  # int4-style signed grid


def embed_squant_recall(sf_dir):
    """Scalar-quantization recall audit (the FAISS SQ8 tradeoff —
    Jégou et al. TPAMI'11 §III discuss the coarse-quantizer loss):
    rank the corpus against query vec 0 on a coarse int4-style
    grid (clip(milli//64, ±15) — toward-zero division, the
    engine-shared rule) vs the exact milli grid, and report the per-rank top-10
    comparison with a hit flag — the measurement a vector store runs
    before shipping 8× memory compression (recall 8/10 at sf0.001,
    6/10 at sf0.01 — the grid is deliberately coarse so the audit
    bites; int8 at these dims is lossless and degenerate). Both scorers are INTEGER
    dot products, so ranking and ties (score desc, vec_id asc)
    replay bit-for-bit in SQL; no float ulp ever crosses engines.

    Scale shape: both query vectors broadcast once (tiny); each
    batch quantizes map-side, does two integer matvecs, and emits
    its local top-k for each scorer — an admissible partial (any
    global top-k member is in its batch's top-k) — into one bounded
    driver merge. Zero shuffle; the embedding column never enters an
    exchange."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def milli_of(vs) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) * EMB_QUANT
                      for v in vs])
        return (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)

    def sq8_of(m: np.ndarray) -> np.ndarray:
        return np.clip(np.sign(m) * (np.abs(m) // SQ8_DIV),
                       -SQ8_CLIP, SQ8_CLIP)

    qrow = (emb.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow").to_pandas())
    qm = milli_of([np.asarray(list(qrow["embedding"])[0],
                              dtype=np.float64)])[0]
    qs = sq8_of(qm.reshape(1, -1))[0]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "scorer": pd.Series(dtype="int64")})
        m = milli_of(df["embedding"])
        vid = df["vec_id"].to_numpy(np.int64)
        outs = []
        for scorer, (mat, qv) in enumerate(
                [(m, qm), (sq8_of(m), qs)]):
            s = mat @ qv
            order = np.lexsort((vid, -s))[:SQ8_K]
            outs.append(pd.DataFrame({
                "vec_id": vid[order], "s": s[order],
                "scorer": np.full(len(order), scorer, np.int64)}))
        return pd.concat(outs, ignore_index=True).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        tops = {}
        for scorer, g in df.groupby("scorer"):
            g = g.sort_values(["s", "vec_id"],
                              ascending=[False, True]).head(SQ8_K)
            tops[int(scorer)] = g["vec_id"].to_numpy(np.int64)
        exact, sq8 = tops[0], tops[1]
        exact_set = set(exact.tolist())
        return pd.DataFrame({
            "rank": pd.Series(range(SQ8_K), dtype="int64"),
            "vec_exact": pd.Series(exact, dtype="int64"),
            "vec_sq8": pd.Series(sq8, dtype="int64"),
            "hit": pd.Series([1 if v in exact_set else 0
                              for v in sq8], dtype="int64")})

    return _merge_partials(
        emb.map_batches(partial, batch_format="pandas"), merge)


EMBED_SQ8_SQL = """
WITH m AS (
  SELECT e.vec_id, s.i,
         CAST(round(e.embedding[s.i] * 1000) AS BIGINT) AS q
  FROM embeddings e, generate_series(1, %d) s(i)),
q8 AS (
  SELECT vec_id, i,
         greatest(-%d, least(%d, q // %d)) AS q
  FROM m),
qm AS (SELECT i, q FROM m WHERE vec_id = 0),
qq AS (SELECT i, q FROM q8 WHERE vec_id = 0),
xs AS (SELECT m.vec_id, CAST(sum(m.q * qm.q) AS BIGINT) AS s
       FROM m JOIN qm USING (i) GROUP BY 1),
ss AS (SELECT q8.vec_id, CAST(sum(q8.q * qq.q) AS BIGINT) AS s
       FROM q8 JOIN qq USING (i) GROUP BY 1),
rx AS (SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id)
         AS rn FROM xs QUALIFY rn <= %d),
rs AS (SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id)
         AS rn FROM ss QUALIFY rn <= %d)
SELECT CAST(rx.rn - 1 AS BIGINT) AS rank,
       rx.vec_id AS vec_exact, rs.vec_id AS vec_sq8,
       CAST(CASE WHEN rs.vec_id IN (SELECT vec_id FROM rx)
            THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM rx JOIN rs USING (rn) ORDER BY rank
""" % (EMB_DIM, SQ8_CLIP, SQ8_CLIP, SQ8_DIV, SQ8_K, SQ8_K)


def orders_dow_seasonality(sf_dir):
    """Day-of-week seasonality index of order revenue — the calendar
    companion to the time-series audit triad (trend slope → CUSUM
    shift → ACF persistence): per weekday, order count, revenue
    cents and the seasonality index 7000·cents_d // total (1000 =
    flat week), the statistic capacity planners read before sizing
    ingestion for weekday peaks. Weekday = epoch-days % 7 — pure
    integer arithmetic both engines share, no locale-dependent
    DAYNAME ever crosses.

    Scale shape: the (dow, count, cents) table is a bounded 7-cell
    partial — a lossless per-batch combiner, zero shuffle, one merge
    block computing the exact integer permille index."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"dow": days % 7, "n": 1, "cents": cents})
               .groupby("dow", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dow", as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values("dow").reset_index(drop=True))
        total = int(g["cents"].sum())
        g["index_permille"] = (7000 * g["cents"]) // max(total, 1)
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


ORDERS_DOW_SQL = """
WITH d AS (
  SELECT (CAST(epoch_us(o_orderdate) AS BIGINT)
          // 86400000000) % 7 AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
g AS (SELECT dow, count(*) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM d GROUP BY 1)
SELECT dow, CAST(n_orders AS BIGINT) AS n_orders, cents,
       CAST(7000 * CAST(cents AS HUGEINT)
            // greatest((SELECT sum(cents) FROM g), 1) AS BIGINT)
         AS index_permille
FROM g ORDER BY dow
"""


CONC_INTERVAL_US = 600_000_000   # each event holds a 10-min slot
CONC_PANE_US = 600_000_000       # sweep-line pane width


def events_peak_concurrency(sf_dir):
    """Peak interval concurrency by DISTRIBUTED SWEEP-LINE — the
    capacity question (max simultaneous sessions/connections) solved
    without a global sort: every event holds a half-open 10-minute
    slot [ts, ts+600s), concurrency is the running sum of +1/−1
    deltas in (t, delta) order (−1 first at equal t, so a slot ending
    exactly when another starts frees first — the half-open rule),
    and the answer is the global max plus the FIRST microsecond it is
    reached.

    Scale shape: the prefix decomposition of events_late_arrivals /
    events_cusum_alarms applied to the sweep: delta rows ride ONE
    pane-bucketed exchange (10-min panes); each pane reduces
    vectorized to (net, internal prefix max, t of its first internal
    argmax) — within a run of equal (t, delta) the prefix max is
    order-independent, so the pane statistic is well-defined; the
    bounded merge derives each pane's exclusive carry and reads off
    max(carry + mx) with the first achieving pane's stored t. No
    global sort ever happens."""
    buckets = _exchange_buckets(sf_dir, "events")

    def deltas(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        tt = np.concatenate([ts, ts + CONC_INTERVAL_US])
        dd = np.concatenate([np.ones(len(ts), np.int64),
                             np.full(len(ts), -1, np.int64)])
        df = pd.DataFrame({"t": tt, "d": dd})
        # batch-local pre-reduction: collapse equal (t, d) runs
        p = df.groupby(["t", "d"], as_index=False).agg(
            n=("d", "size"))
        p["pane"] = p["t"] // CONC_PANE_US
        h = pd.util.hash_pandas_object(p["pane"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"t": "int64", "d": "int64", "n": "int64",
                         "pane": "int64"})

    def pane_stats(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across ALL panes of the bucket: one groupby-sum,
        # one sort, one cumsum with per-pane exclusive offsets, one
        # grouped first-argmax — no per-pane Python loop (measured
        # 1.66 s -> 0.27 s on the full query at sf0.1/32 CPUs)
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("pane", "net", "mx",
                                           "t_first")})
        gg = (g.groupby(["pane", "t", "d"], as_index=False)["n"].sum()
              .sort_values(["pane", "t", "d"], kind="mergesort")
              .reset_index(drop=True))  # -1 sorts before +1
        pane = gg["pane"].to_numpy()
        csum = np.cumsum((gg["d"] * gg["n"]).to_numpy())
        starts = np.flatnonzero(np.r_[True, pane[1:] != pane[:-1]])
        sizes = np.diff(np.r_[starts, len(gg)])
        offs = np.repeat(np.r_[0, csum[starts[1:] - 1]], sizes)
        cum = csum - offs
        idx = (pd.Series(cum).groupby(pd.Series(pane), sort=False)
               .idxmax().to_numpy())  # FIRST index achieving each max
        ends = np.r_[starts[1:], len(gg)] - 1
        return pd.DataFrame({
            "pane": pane[starts], "net": cum[ends],
            "mx": cum[idx],
            "t_first": gg["t"].to_numpy()[idx]}).astype("int64")

    ds = _read(sf_dir, "events", columns=["ts"])
    per_pane = (ds.map_batches(deltas, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(pane_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("pane").reset_index(drop=True)
        carry = g["net"].cumsum().shift(1, fill_value=0).to_numpy()
        tot = carry + g["mx"].to_numpy()
        peak = int(tot.max())
        first = int(np.argmax(tot == peak))
        return pd.DataFrame({
            "peak": pd.Series([peak], dtype="int64"),
            "t_peak_us": pd.Series([int(g["t_first"].iloc[first])],
                                   dtype="int64")})

    return _merge_partials(per_pane, merge)


EVENTS_PEAK_SQL = """
WITH iv AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS s FROM events),
d AS (
  SELECT s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT s + %d, -1 FROM iv),
c AS (
  SELECT t, sum(d) OVER (ORDER BY t, d
         ROWS UNBOUNDED PRECEDING) AS cum
  FROM d),
p AS (SELECT max(cum) AS peak FROM c)
SELECT CAST((SELECT peak FROM p) AS BIGINT) AS peak,
       CAST(min(t) AS BIGINT) AS t_peak_us
FROM c WHERE cum = (SELECT peak FROM p)
""" % CONC_INTERVAL_US


def lineitem_sequence_audit(sf_dir):
    """Ordinal-sequence integrity audit — per order, classify the
    line-number sequence into a failure taxonomy: ``ok`` (exactly
    1..n), ``dup`` (a line number repeats — double-ingest), ``gap``
    (no duplicate but numbers are not a dense 1..n prefix — rows
    lost in transit). The billing/ledger completeness check every
    warehouse runs after an at-least-once ingest; on this corpus the
    synthesizer draws line numbers with replacement, so all three
    classes are populated at every scale (37 ok / 833 dup / 603 gap
    at sf0.001) and the taxonomy carries real signal.

    Scale shape: (okey, linenumber) pairs ride ONE okey-bucketed
    exchange (an order's lines co-locate); each bucket classifies
    vectorized from four per-order aggregates (count, max, min,
    distinct) and emits bounded (class, n) partials; single 3-row
    merge."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    CLASSES = ("dup", "gap", "ok")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"k": t["l_orderkey"].to_numpy(),
                          "ln": t["l_linenumber"].to_numpy()})
        h = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"k": "int64", "ln": "int64"})

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("k")["ln"].agg(["size", "max", "min",
                                      "nunique"])
        dup = a["nunique"] < a["size"]
        ok = (~dup) & (a["min"] == 1) & (a["max"] == a["size"])
        counts = [int(dup.sum()), int((~dup & ~ok).sum()),
                  int(ok.sum())]
        return pd.DataFrame({
            "class": pd.Series(CLASSES, dtype=object),
            "n_orders": pd.Series(counts, dtype="int64")})

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_audit, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("class", as_index=False)["n_orders"].sum()
               .sort_values("class").reset_index(drop=True))
        out["class"] = out["class"].astype(object)
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return _merge_partials(per_bucket, merge)


LINEITEM_SEQ_SQL = """
WITH a AS (
  SELECT l_orderkey AS k, count(*) AS n, max(l_linenumber) AS mx,
         min(l_linenumber) AS mn,
         count(DISTINCT l_linenumber) AS nd
  FROM lineitem GROUP BY 1)
SELECT CASE WHEN nd < n THEN 'dup'
            WHEN mn = 1 AND mx = n THEN 'ok'
            ELSE 'gap' END AS "class",
       CAST(count(*) AS BIGINT) AS n_orders
FROM a GROUP BY 1 ORDER BY 1
"""


# SCD2 version boundaries for the point-in-time dimension join:
# customers with custkey % PIT_MOD == 0 rotate their market segment
# at each boundary (pure arithmetic — both engines replay it).
PIT_BOUNDS = ("1994-01-01", "1996-01-01")
PIT_MOD = 5


def orders_pit_dimension_join(sf_dir):
    """Point-in-time dimension join — the feature-store / SCD2
    correctness primitive (Kimball type-2 dimensions; every feature
    platform's 'as-of the event, not as-of today' rule): each order
    must see the customer-segment VERSION valid at its order date,
    never the current one (that is label leakage). The versioned
    dimension derives by rule: customers with custkey % 5 == 0
    rotate one segment forward at 1994-01-01 and again at
    1996-01-01; effective segment = rotate(base, versions passed).
    Output = revenue rollup by EFFECTIVE segment — provably
    different from the current-version rollup.

    Scale shape: the segment VOCABULARY (bounded, ≤ segments) comes
    from a per-batch distinct pre-pass; the per-customer base segment
    attaches through ``joins.attach_dim`` (broadcast ≤ threshold,
    bucketed hash join at 10⁹ customers — forced-path tested); the
    version lookup is a map-side searchsorted against the closure's
    boundary array, so everything past the attach is ZERO shuffle;
    bounded (segment, n, cents) combiner, one merge."""
    cust_ds = _read(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"])
    # ONE capped scan doubles as dispatch probe, broadcast collect
    # AND segment vocabulary; only the distributed path pays the
    # separate distinct pre-pass
    cust_df = joins.collect_dim_small(cust_ds)
    if cust_df is not None:
        segs = sorted(cust_df["c_mktsegment"].unique().tolist())
    else:
        seg_vocab = (cust_ds.map_batches(
            lambda t: pa.table(
                {"s": pc.unique(t["c_mktsegment"])}),
            batch_format="pyarrow").to_pandas())
        segs = sorted(seg_vocab["s"].unique().tolist())
    seg_idx = {s: i for i, s in enumerate(segs)}
    bounds = np.array([np.datetime64(b, "D").astype(np.int64)
                       for b in PIT_BOUNDS], dtype=np.int64)
    nseg = len(segs)

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = t["o_custkey"].to_numpy()
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        # vocab position via the arrow index_in kernel (segs is the
        # sorted vocabulary, so index == seg_idx[s]) — no Python loop
        base = pc.index_in(
            t["seg"], value_set=pa.array(segs, pa.string())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        shift = np.where(ck % PIT_MOD == 0,
                         np.searchsorted(bounds, days, side="right"),
                         0)
        eff = (base + shift) % nseg
        out = (pd.DataFrame({"ei": eff, "n": 1, "cents": cents})
               .groupby("ei", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("ei", as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values("ei").reset_index(drop=True))
        return pd.DataFrame({
            "segment": pd.Series([segs[int(i)] for i in g["ei"]],
                                 dtype=object),
            "n_orders": g["n_orders"].astype("int64"),
            "cents": g["cents"].astype("int64")})

    ds = joins.attach_dim(
        _read(sf_dir, "orders",
              columns=["o_custkey", "o_orderdate", "o_totalprice"]),
        cust_ds, "o_custkey", "c_custkey", "c_mktsegment",
        out_col="seg", how="inner", dim_df=cust_df)
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


PIT_JOIN_SQL = """
WITH segs AS (
  SELECT s, row_number() OVER (ORDER BY s) - 1 AS i
  FROM (SELECT DISTINCT c_mktsegment AS s FROM customer)),
nseg AS (SELECT count(*) AS n FROM segs),
cust AS (
  SELECT c_custkey AS ck, i AS base
  FROM customer JOIN segs ON s = c_mktsegment),
eff AS (
  SELECT (base + CASE WHEN ck %% %d = 0 THEN
            (CASE WHEN o_orderdate >= TIMESTAMP '%s'
                  THEN 1 ELSE 0 END
           + CASE WHEN o_orderdate >= TIMESTAMP '%s'
                  THEN 1 ELSE 0 END)
          ELSE 0 END) %% (SELECT n FROM nseg) AS ei,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN cust ON ck = o_custkey)
SELECT s.s AS segment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(e.cents) AS BIGINT) AS cents
FROM eff e JOIN segs s ON s.i = e.ei
GROUP BY 1 ORDER BY 1
""" % (PIT_MOD, PIT_BOUNDS[0], PIT_BOUNDS[1])


def user_interarrival_histogram(sf_dir):
    """Inter-arrival-time histogram per log₂ band — the traffic-
    model statistic (burstiness vs Poisson; the tail tells you
    session-timeout and cache-TTL budgets): for every user, the gaps
    between consecutive events in microseconds, bucketed by
    floor(log₂ gap) exactly (frexp exponent — an integer, so SQL
    replays via binary-string length, the key_skew_profile
    discipline; zero-gaps get bucket −1).

    Scale shape: (user, ts) pairs ride ONE user-bucketed exchange
    (a user's events co-locate); each bucket sorts within user
    vectorized (mergesort on the narrow pair columns only), diffs,
    and emits bounded ≤64-cell (bucket, n) partials; single merge.
    The gap multiset is tie-order-independent (equal timestamps gap
    to zero), so no tiebreak ever crosses engines."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        b = np.full(len(gaps), -1, np.int64)
        nz = gaps > 0
        b[nz] = np.frexp(gaps[nz].astype(np.float64))[1] - 1
        out = (pd.DataFrame({"log2_bucket": b})
               .groupby("log2_bucket", as_index=False).size()
               .rename(columns={"size": "n_gaps"}))
        return out.astype("int64")

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("log2_bucket", as_index=False)
               ["n_gaps"].sum()
               .sort_values("log2_bucket").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT CAST(epoch_us(ts) AS BIGINT)
         - lag(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events),
b AS (
  SELECT CASE WHEN gap = 0 THEN -1
         ELSE length(format('{:b}', gap)) - 1 END AS log2_bucket
  FROM g WHERE gap IS NOT NULL)
SELECT CAST(log2_bucket AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY 1 ORDER BY 1
"""


ZIPF_J = 11  # planted power-law family z_0..z_10


def vocab_zipf_spectrum(sf_dir):
    """Zipf frequency-spectrum audit of the corpus vocabulary — the
    corpus-linguistics health check (Zipf '49; a natural-language
    corpus shows a near-linear log-log frequency spectrum, while
    boilerplate floods single bands): the number of distinct terms
    whose total frequency falls in each log₂ band, plus the OLS
    slope of floor(log₂ n_terms) over the band index as an exact
    integer milli-value (the events_value_trend five-statistic
    identity; toward-zero division pinned in both engines). All
    integers — log₂ via frexp / binary-string length, never a float
    log.

    Scale shape: per-batch term→count partials (lossless combiner)
    ride ONE term-hash-bucketed exchange; a term's total finalizes
    in exactly one bucket, so per-bucket (band, n_terms) cells are
    additive; the ≤64-row band histogram merges in one block where
    the slope is plain integer arithmetic.

    The synthetic corpus has a ~31-term vocabulary (degenerate
    2-band spectrum), so a power-law token family is planted (the
    dup_passages precedent): each doc carries z_j = "z{j}_{doc_id
    mod 2^j}" for j in 0..10 — ~2^j distinct terms at frequency
    ≈N/2^j, a true s≈1 Zipf law both engines replay by
    arithmetic."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W = _exchange_buckets(sf_dir)

    def term_partial(t: pa.Table) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            c.update((txt or "").split(" "))
            c.update("z%d_%d" % (j, did % (1 << j))
                     for j in range(ZIPF_J))
        df = pd.DataFrame({"term": list(c.keys()),
                           "n": np.fromiter(c.values(), np.int64,
                                            len(c))})
        h = pd.util.hash_pandas_object(df["term"], index=False).values
        df["_bucket"] = (h % np.uint64(W)).astype("int32")
        return df

    def bucket_bands(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("term")["n"].sum().to_numpy(np.int64)
        band = np.frexp(tot.astype(np.float64))[1] - 1
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n_terms"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(term_partial, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_bands, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("band", as_index=False)["n_terms"].sum()
             .sort_values("band").reset_index(drop=True))
        x = g["band"].to_numpy(np.int64)
        y = (np.frexp(g["n_terms"].to_numpy(np.float64))[1] - 1)
        n = len(x)
        num = int(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
        den = int(n * int((x * x).sum()) - int(x.sum()) ** 2)
        s = 1000 * num
        milli = (abs(s) // abs(den)) * (1 if (s >= 0) == (den > 0)
                                        else -1) if den else 0
        out = g.astype("int64")
        out["slope_milli"] = np.int64(milli)
        return out

    return _merge_partials(per_bucket, merge)


VOCAB_ZIPF_SQL = """
WITH aug AS (
  SELECT text || ' z0_' || CAST(doc_id % 1 AS VARCHAR) || ' z1_' || CAST(doc_id % 2 AS VARCHAR) || ' z2_' || CAST(doc_id % 4 AS VARCHAR) || ' z3_' || CAST(doc_id % 8 AS VARCHAR) || ' z4_' || CAST(doc_id % 16 AS VARCHAR) || ' z5_' || CAST(doc_id % 32 AS VARCHAR) || ' z6_' || CAST(doc_id % 64 AS VARCHAR) || ' z7_' || CAST(doc_id % 128 AS VARCHAR) || ' z8_' || CAST(doc_id % 256 AS VARCHAR) || ' z9_' || CAST(doc_id % 512 AS VARCHAR) || ' z10_' || CAST(doc_id % 1024 AS VARCHAR) AS text FROM documents),
tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM aug),
tc AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
bands AS (
  SELECT length(format('{:b}', n)) - 1 AS band,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM tc GROUP BY 1),
pts AS (
  SELECT CAST(band AS BIGINT) AS x,
         CAST(length(format('{:b}', n_terms)) - 1 AS BIGINT) AS y
  FROM bands),
ols AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts),
s AS (
  SELECT 1000 * (n * sxy - sx * sy) AS num,
         n * sxx - sx * sx AS den
  FROM ols)
SELECT b.band, b.n_terms,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE num // den END AS BIGINT) AS slope_milli
FROM bands b, s ORDER BY b.band
"""


MOM_GROUPS = 32  # median-of-means partition count


def orders_median_of_means(sf_dir):
    """Median-of-means estimator audit — the heavy-tail-robust mean
    every streaming system reaches for when a plain average can be
    wrecked by outliers (Alon-Matias-Szegedy '96 uses exactly this
    shape; Lugosi-Mendelson '19 surveys the theory): rows are
    deterministically md5-assigned to 32 groups, each group's exact
    integer milli-mean is computed, and the estimator is the median
    of those 32 means — reported NEXT TO the true milli-mean so the
    estimator's deviation is data, like orderkey_join_sample_estimate.

    Scale shape: the (group → sum, n) table is a bounded 32-cell
    per-batch combiner — zero shuffle at any scale; the merge block
    finalizes 32 exact means (toward-zero irrelevant: all positive),
    sorts 32 values, and takes the lower median (rank (g+1)//2, the
    radix-selection rule). SQL replays the assignment, the means and
    the rank."""
    import hashlib

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        grp = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                 16) % MOM_GROUPS for x in k), np.int64, len(k))
        out = (pd.DataFrame({"g": grp, "n": 1, "cents": cents})
               .groupby("g", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("g", as_index=False)
             .agg(n=("n", "sum"), cents=("cents", "sum")))
        means = np.sort((1000 * g["cents"].to_numpy(np.int64))
                        // g["n"].to_numpy(np.int64))
        mom = int(means[(len(means) + 1) // 2 - 1])
        true = (1000 * int(g["cents"].sum())) // int(g["n"].sum())
        return pd.DataFrame({
            "n_groups": pd.Series([len(means)], dtype="int64"),
            "mom_millicents": pd.Series([mom], dtype="int64"),
            "true_millicents": pd.Series([int(true)], dtype="int64"),
            "abs_diff": pd.Series([abs(mom - int(true))],
                                  dtype="int64")})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


MOM_SQL = """
WITH r AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
              AS BIGINT) %% %d AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
gm AS (
  SELECT g, CAST(1000 * sum(cents) // count(*) AS BIGINT) AS mean_m
  FROM r GROUP BY 1),
mom AS (
  SELECT mean_m FROM
    (SELECT mean_m, row_number() OVER (ORDER BY mean_m) AS rn
     FROM gm),
    (SELECT count(*) AS c FROM gm)
  WHERE rn = (c + 1) // 2),
tr AS (
  SELECT CAST(1000 * sum(cents) // count(*) AS BIGINT) AS true_m
  FROM r)
SELECT CAST((SELECT count(*) FROM gm) AS BIGINT) AS n_groups,
       CAST((SELECT mean_m FROM mom) AS BIGINT) AS mom_millicents,
       CAST((SELECT true_m FROM tr) AS BIGINT) AS true_millicents,
       CAST(abs((SELECT mean_m FROM mom) - (SELECT true_m FROM tr))
            AS BIGINT) AS abs_diff
""" % MOM_GROUPS


AGING_BANDS = (30, 90, 365)  # days: 0-30 / 31-90 / 91-365 / 365+


def orders_backlog_aging(sf_dir):
    """Open-order backlog aging report — the accounts-receivable /
    fulfillment-SLA staple: orders still OPEN (status 'O') bucketed
    by age at the ledger close, where the close date is the maximum
    order date in the data (derived, so every scale is
    non-degenerate and both engines pin the same instant). Bands
    0–30 / 31–90 / 91–365 / 365+ days; per band the open-order count
    and exposure cents.

    Scale shape: pass 1 is a zero-shuffle max-date combiner (one
    scalar); pass 2 buckets map-side against the broadcast close
    date and emits bounded 4-cell (band, n, cents) partials — zero
    shuffle, single merge."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderdate", "o_totalprice"])

    def max_day(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mx": pd.Series([int(days.max())],
                                             dtype="int64")})

    close = int(ds.map_batches(max_day, batch_format="pyarrow")
                .to_pandas()["mx"].max())
    edges = np.array(AGING_BANDS, dtype=np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        m = st == "O"
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))[m]
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()[m]
        age = close - days
        band = np.searchsorted(edges, age, side="left")
        out = (pd.DataFrame({"band": band, "n": 1, "cents": cents})
               .groupby("band", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("band", as_index=False)
               .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


AGING_SQL = """
WITH close AS (
  SELECT max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
    AS c FROM orders),
o AS (
  SELECT (SELECT c FROM close)
         - CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
           AS age,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O')
SELECT CAST(CASE WHEN age <= 30 THEN 0 WHEN age <= 90 THEN 1
            WHEN age <= 365 THEN 2 ELSE 3 END AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
FROM o GROUP BY 1 ORDER BY 1
"""


def customer_rfm_segments(sf_dir):
    """RFM segmentation (Hughes '94 — the marketing-analytics
    staple): every customer scored 1–5 on Recency (days since last
    order at the ledger close = the data's max order date),
    Frequency (order count) and Monetary (lifetime cents) by EXACT
    quintile rank, then the 5×5×5 segment census. Quintile edges are
    TRUE order statistics (rank ceil(q·N/5)); a value's score is
    1 + the number of edges strictly below it (the decile-report
    tie rule — rows equal to an edge belong to that edge's
    quintile), so heavy ties (shared last-order days) resolve
    identically in both engines.

    Scale shape: order partials (custkey → n, cents, last_day — a
    lossless combiner) ride ONE custkey-bucketed exchange; the
    per-customer (r, f, m) table materializes ONCE (narrow: 4
    int64/customer — the checkpointed-vocabulary precedent; ~32 GB
    at 10⁹ customers, spread across the cluster store). R and F have
    bounded domains (days, order counts) so their edge histograms
    are zero-shuffle full-value combiners; M uses the two-pass radix
    selection. Scoring is map-side against broadcast edge arrays
    into a bounded ≤125-cell combiner."""
    buckets = _exchange_buckets(sf_dir, "orders")
    COLS = ["ck", "n", "cents", "last_day", "_bucket"]

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"ck": t["o_custkey"].to_numpy(),
                           "n": 1, "cents": cents, "last_day": days})
             .groupby("ck", as_index=False)
             .agg(n=("n", "sum"), cents=("cents", "sum"),
                  last_day=("last_day", "max")))
        h = pd.util.hash_pandas_object(p["ck"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype("int64")[COLS].astype({"_bucket": "int32"})

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby("ck", as_index=False)
             .agg(f=("n", "sum"), m=("cents", "sum"),
                  last_day=("last_day", "max")))
        return a.astype("int64")

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_customer, batch_format="pandas")
            .materialize())
    close = int(cust.map_batches(
        lambda df: pd.DataFrame(
            {"mx": pd.Series([int(df["last_day"].max())],
                             dtype="int64")}),
        batch_format="pandas").to_pandas()["mx"].max())
    n_cust = cust.count()
    ranks = [(q * n_cust + 4) // 5 for q in (1, 2, 3, 4)]

    def exact_edges(hist: pd.DataFrame) -> np.ndarray:
        """hist: (v, n) full-value histogram → 4 quintile edges."""
        hist = hist.sort_values("v").reset_index(drop=True)
        cum = hist["n"].cumsum().to_numpy()
        return np.asarray(
            [int(hist["v"].iloc[int(np.searchsorted(cum, k))])
             for k in ranks], dtype=np.int64)

    def hist_of(expr) -> pd.DataFrame:
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = (pd.DataFrame({"v": expr(df)})
                   .groupby("v", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")
        return (cust.map_batches(fn, batch_format="pandas")
                .to_pandas().groupby("v", as_index=False)["n"].sum())

    r_edges = exact_edges(hist_of(
        lambda df: close - df["last_day"].to_numpy(np.int64)))
    f_edges = exact_edges(hist_of(
        lambda df: df["f"].to_numpy(np.int64)))
    # M: two-pass radix (cents totals are unbounded)
    m_hi = hist_of(lambda df: df["m"].to_numpy(np.int64)
                   >> RADIX_SHIFT).sort_values("v")
    cum = m_hi["n"].cumsum().to_numpy()
    m_targets = []
    for k in ranks:
        i = int(np.searchsorted(cum, k))
        m_targets.append((int(m_hi["v"].iloc[i]),
                          k - (int(cum[i - 1]) if i else 0)))
    m_wanted = frozenset(hi for hi, _ in m_targets)

    def m_lo(df: pd.DataFrame) -> pd.DataFrame:
        v = df["m"].to_numpy(np.int64)
        v = v[np.isin(v >> RADIX_SHIFT, list(m_wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (cust.map_batches(m_lo, batch_format="pandas")
          .to_pandas().groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    m_edges = []
    for hi, resid in m_targets:
        msk = (vals >> RADIX_SHIFT) == hi
        c = counts[msk].cumsum()
        m_edges.append(int(vals[msk][int(np.searchsorted(c, resid))]))
    m_edges = np.asarray(m_edges, dtype=np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        r = close - df["last_day"].to_numpy(np.int64)
        f = df["f"].to_numpy(np.int64)
        m = df["m"].to_numpy(np.int64)
        out = pd.DataFrame({
            "r_score": 1 + np.searchsorted(r_edges, r, side="left"),
            "f_score": 1 + np.searchsorted(f_edges, f, side="left"),
            "m_score": 1 + np.searchsorted(m_edges, m, side="left"),
            "n": 1})
        return (out.groupby(["r_score", "f_score", "m_score"],
                            as_index=False)["n"].sum()
                .astype("int64"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["r_score", "f_score", "m_score"],
                          as_index=False)["n"].sum()
               .rename(columns={"n": "n_customers"})
               .sort_values(["r_score", "f_score", "m_score"])
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(
        cust.map_batches(score, batch_format="pandas"), merge)


RFM_SQL = """
WITH close AS (
  SELECT max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
    AS c FROM orders),
cust AS (
  SELECT o_custkey AS ck,
         (SELECT c FROM close)
         - max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
           AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1),
n AS (SELECT count(*) AS n FROM cust),
re AS (SELECT r AS v, row_number() OVER (ORDER BY r) AS rn FROM cust),
fe AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM cust),
me AS (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn FROM cust),
qr AS (SELECT unnest([1, 2, 3, 4]) AS q),
redge AS (SELECT v FROM re, n, qr WHERE rn = (q * n + 4) // 5),
fedge AS (SELECT v FROM fe, n, qr WHERE rn = (q * n + 4) // 5),
medge AS (SELECT v FROM me, n, qr WHERE rn = (q * n + 4) // 5),
scored AS (
  SELECT 1 + (SELECT count(*) FROM redge WHERE redge.v < cust.r)
           AS r_score,
         1 + (SELECT count(*) FROM fedge WHERE fedge.v < cust.f)
           AS f_score,
         1 + (SELECT count(*) FROM medge WHERE medge.v < cust.m)
           AS m_score
  FROM cust)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def customer_pareto_concentration(sf_dir):
    """Pareto 80/20 revenue-concentration audit — the SMALLEST number
    of top customers whose lifetime revenue covers 80% of the total,
    found WITHOUT ranking 10⁹ customers: a descending two-pass radix
    walk (the selection machinery run top-down on mass instead of
    bottom-up on count). Ties are value ties — within a tier of
    equal lifetime revenue the crossing count is order-independent,
    so SQL's row_number cumsum replays it exactly.

    Scale shape: per-batch (custkey → cents) partials ride ONE
    custkey-bucketed exchange; pass 2 histograms per-customer totals
    into bounded high-bit bands (count + mass per band — a lossless
    combiner), the driver walks bands top-down to the crossing band,
    pass 3 histograms full values inside only that band; the final
    tier arithmetic (j = ceil((target − mass_above)/v)) is exact
    integers."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"ck": t["o_custkey"].to_numpy(),
                           "m": cents})
             .groupby("ck", as_index=False)["m"].sum())
        h = pd.util.hash_pandas_object(p["ck"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"ck": "int64", "m": "int64"})

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("ck", as_index=False)["m"].sum()
                .astype("int64"))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_customer, batch_format="pandas")
            .materialize())

    def band_hist(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy(np.int64)
        out = (pd.DataFrame({"band": m >> RADIX_SHIFT, "n": 1,
                             "mass": m})
               .groupby("band", as_index=False)
               .agg(n=("n", "sum"), mass=("mass", "sum")))
        return out.astype("int64")

    h1 = (cust.map_batches(band_hist, batch_format="pandas")
          .to_pandas()
          .groupby("band", as_index=False)
          .agg(n=("n", "sum"), mass=("mass", "sum"))
          .sort_values("band", ascending=False)
          .reset_index(drop=True))
    total = int(h1["mass"].sum())
    n_cust = int(h1["n"].sum())
    target = (4 * total + 4) // 5  # ceil(0.8·T)
    cum = h1["mass"].cumsum().to_numpy()
    i = int(np.searchsorted(cum, target))
    mass_above = int(cum[i - 1]) if i else 0
    count_above = int(h1["n"].iloc[:i].sum())
    band_sel = int(h1["band"].iloc[i])

    def val_hist(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy(np.int64)
        m = m[(m >> RADIX_SHIFT) == band_sel]
        out = (pd.DataFrame({"v": m, "n": 1})
               .groupby("v", as_index=False)["n"].sum())
        return out.astype("int64")

    h2 = (cust.map_batches(val_hist, batch_format="pandas")
          .to_pandas().groupby("v", as_index=False)["n"].sum()
          .sort_values("v", ascending=False).reset_index(drop=True))
    k, covered = count_above, mass_above
    for v, n in zip(h2["v"].to_numpy(np.int64),
                    h2["n"].to_numpy(np.int64)):
        tier = int(v) * int(n)
        if covered + tier >= target:
            j = (target - covered + int(v) - 1) // int(v)
            k += int(j)
            covered += int(j) * int(v)
            break
        covered += tier
        k += int(n)
    return pd.DataFrame({
        "n_customers": pd.Series([n_cust], dtype="int64"),
        "top_k": pd.Series([k], dtype="int64"),
        "covered_cents": pd.Series([covered], dtype="int64"),
        "covered_permille": pd.Series([1000 * covered // total],
                                      dtype="int64")})


PARETO_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(m) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n FROM cust),
r AS (
  SELECT m, row_number() OVER (ORDER BY m DESC) AS rn,
         sum(m) OVER (ORDER BY m DESC ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM cust),
x AS (
  SELECT min(rn) AS k FROM r, t
  WHERE cum >= (4 * total + 4) // 5)
SELECT (SELECT n FROM t) AS n_customers,
       CAST((SELECT k FROM x) AS BIGINT) AS top_k,
       CAST((SELECT cum FROM r WHERE rn = (SELECT k FROM x))
            AS BIGINT) AS covered_cents,
       CAST(1000 * (SELECT cum FROM r WHERE rn = (SELECT k FROM x))
            // (SELECT total FROM t) AS BIGINT) AS covered_permille
"""


def events_session_lifetable(sf_dir):
    """Survival-analysis life table of session durations — the
    Kaplan-Meier INPUT (t, n_at_risk, n_ending): for every observed
    duration (whole minutes), how many sessions last at least that
    long and how many end exactly there. Retention teams read the
    hazard d/n off this table; keeping it integer (counts, not the
    KM product) is what lets both engines agree exactly.

    Scale shape: sessions form in the events_sessions user-bucketed
    exchange (same 30-min-gap, (ts, event_id) ordering convention);
    each bucket emits its duration histogram (bounded: distinct
    whole-minute durations) as additive partials, and the single
    merge derives n_at_risk as the descending suffix cumsum — no
    second pass, no sort exchange."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    GAP = pd.Timedelta(minutes=30)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def dur_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        d = g.groupby("user_id")["ts"].diff()
        sid = (d.isna() | (d > GAP)).cumsum()
        s = g.groupby(sid)["ts"].agg(["min", "max"])
        # normalize to µs explicitly — Ray pandas blocks carry
        # datetime64[us], a ns assumption silently floors to 0
        lo = s["min"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hi = s["max"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dur = (hi - lo) // 60_000_000
        out = (pd.DataFrame({"dur_min": dur})
               .groupby("dur_min", as_index=False).size()
               .rename(columns={"size": "n_ending"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(add_bucket, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(dur_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dur_min", as_index=False)["n_ending"].sum()
             .sort_values("dur_min", ascending=False)
             .reset_index(drop=True))
        g["n_at_risk"] = g["n_ending"].cumsum()
        g = g.sort_values("dur_min").reset_index(drop=True)
        return g[["dur_min", "n_at_risk", "n_ending"]].astype("int64")

    return _merge_partials(per_bucket, merge)


LIFETABLE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING)
           AS session_no
  FROM o),
d AS (
  SELECT (CAST(epoch_us(max(ts)) AS BIGINT)
          - CAST(epoch_us(min(ts)) AS BIGINT)) // 60000000
           AS dur_min
  FROM s GROUP BY user_id, session_no),
h AS (SELECT dur_min, CAST(count(*) AS BIGINT) AS n_ending
      FROM d GROUP BY 1)
SELECT dur_min,
       CAST(sum(n_ending) OVER (ORDER BY dur_min DESC
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk,
       n_ending
FROM h ORDER BY dur_min
"""


CHURN_WINDOW_HOURS = 12  # events span 30 days @ ~10 h/user gap —
# a day-scale window labels nobody churned; 12 h gives 5/15 (sf0.001)
# and 40/150 (sf0.01) churned, a usable class balance at every scale


def user_churn_labels(sf_dir):
    """Leakage-safe churn-label generation — the supervised-training
    primitive every behavioral model needs (and the temporal twin of
    orders_pit_dimension_join's rule): pin a cutoff at max(ts) − W,
    build FEATURES strictly from events before the cutoff and
    the LABEL strictly from the W window after it; a user is
    churned iff active before and silent after. Output = the label
    census per activity band (feature = floor(log₂ events-before),
    the frexp/binary-length discipline) — the class-balance table a
    trainer reads before sampling.

    Scale shape: pass 1 is the zero-shuffle max-ts combiner; pass 2
    emits per-batch (user → n_before, n_after) count partials
    (lossless combiner) through ONE user-bucketed exchange, where
    each bucket finalizes labels vectorized and emits bounded
    (band, churned, n_users) cells; single merge."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def max_ts(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pd.DataFrame({"mx": pd.Series([int(ts.max())],
                                             dtype="int64")})

    cutoff = (int(ds.map_batches(max_ts, batch_format="pyarrow")
                  .to_pandas()["mx"].max())
              - CHURN_WINDOW_HOURS * 3_600_000_000)

    def prep(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        before = ts < cutoff
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "nb": before.astype(np.int64),
                           "na": (~before).astype(np.int64)})
             .groupby("u", as_index=False)
             .agg(nb=("nb", "sum"), na=("na", "sum")))
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "nb": "int64", "na": "int64"})

    def bucket_labels(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby("u", as_index=False)
             .agg(nb=("nb", "sum"), na=("na", "sum")))
        a = a[a["nb"] > 0]  # users born inside the label window
        nb = a["nb"].to_numpy(np.int64)  # have no feature history
        band = np.frexp(nb.astype(np.float64))[1] - 1
        churned = (a["na"].to_numpy(np.int64) == 0).astype(np.int64)
        out = (pd.DataFrame({"band": band, "churned": churned,
                             "n": 1})
               .groupby(["band", "churned"], as_index=False)
               ["n"].sum())
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_labels, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["band", "churned"], as_index=False)
               ["n"].sum().rename(columns={"n": "n_users"})
               .sort_values(["band", "churned"])
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


CHURN_SQL = """
WITH cut AS (
  SELECT max(CAST(epoch_us(ts) AS BIGINT)) - %d AS c FROM events),
u AS (
  SELECT user_id,
         sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                  < (SELECT c FROM cut) THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                  >= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS na
  FROM events GROUP BY 1),
l AS (
  SELECT length(bin(CAST(nb AS BIGINT))) - 1 AS band,
         CASE WHEN na = 0 THEN 1 ELSE 0 END AS churned
  FROM u WHERE nb > 0)
SELECT CAST(band AS BIGINT) AS band,
       CAST(churned AS BIGINT) AS churned,
       CAST(count(*) AS BIGINT) AS n_users
FROM l GROUP BY 1, 2 ORDER BY 1, 2
""" % (CHURN_WINDOW_HOURS * 3_600_000_000)


def funnel_latency_median(sf_dir):
    """Funnel step latency — the EXACT median seconds from a click
    to the SAME user's next purchase (the as-of pairing of
    events_asof_click_view, then the radix selection instead of a
    percentile sort): product analytics' time-to-convert number.
    Pairs = every click matched to the first purchase at or after it
    (unmatched clicks drop out); latency floor-seconds; median by
    rank (N+1)//2 — the engine-shared selection rule throughout.

    Scale shape: (user, ts, kind) rows ride ONE user-bucketed
    exchange; each bucket pairs vectorized (searchsorted of click
    times into the user-offset purchase timeline — no per-user loop)
    and emits its bounded latency histogram in SECONDS bands
    directly (latencies ≤ the data span, so the full-value histogram
    is the bounded combiner; no second radix pass needed); the merge
    walks the histogram to the exact median and reports n_pairs."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        kind = np.asarray(t["event_type"].to_pylist(), dtype=object)
        m = (kind == "click") | (kind == "purchase")
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy()[m],
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))[m],
            "is_click": (kind[m] == "click").astype(np.int64)})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64",
                         "is_click": "int64"})

    # ONE reversed minimum.accumulate pairs every user at once with
    # no compound-key arithmetic (a u*2^52+ts axis overflows int64
    # once user_id ≥ 2^11): sort by (u, ts, purchase-last) so user
    # segments are contiguous, take each position's nearest purchase
    # position at-or-after it GLOBALLY — contiguity guarantees that
    # position is the same user's iff the user has a later purchase,
    # so one same-user mask finishes the as-of join exactly.
    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        isp = 1 - g["is_click"].to_numpy(np.int64)
        order = np.lexsort((isp, ts, u))  # same-ts click before buy
        u, ts, isp = u[order], ts[order], isp[order]
        n = len(u)
        pos = np.where(isp == 1, np.arange(n), n)
        nxt = np.minimum.accumulate(pos[::-1])[::-1]
        ick = isp == 0
        j = nxt[ick]
        ok = j < n
        same = u[j[ok]] == u[ick][ok]
        sec = (ts[j[ok]][same] - ts[ick][ok][same]) // 1_000_000
        out = (pd.DataFrame({"sec": sec})
               .groupby("sec", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("sec", as_index=False)["n"].sum()
             .sort_values("sec").reset_index(drop=True))
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        med = int(g["sec"].iloc[int(np.searchsorted(
            cum, (n + 1) // 2))])
        return pd.DataFrame({
            "n_pairs": pd.Series([n], dtype="int64"),
            "median_latency_sec": pd.Series([med], dtype="int64")})

    return _merge_partials(per_bucket, merge)


FUNNEL_LATENCY_SQL = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
  FROM events WHERE event_type IN ('click', 'purchase')),
pairs AS (
  SELECT c.t AS ct,
         (SELECT min(p.t) FROM e p
          WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            AND p.t >= c.t) AS pt
  FROM e c WHERE c.event_type = 'click'),
lat AS (
  SELECT (pt - ct) // 1000000 AS sec FROM pairs WHERE pt IS NOT NULL),
n AS (SELECT count(*) AS n FROM lat)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_pairs,
       CAST((SELECT sec FROM
              (SELECT sec, row_number() OVER (ORDER BY sec) AS rn
               FROM lat), n
             WHERE rn = (n + 1) // 2) AS BIGINT)
         AS median_latency_sec
"""


def orders_price_drift(sf_dir):
    """Two-sample distribution-drift detector — the check a training
    pipeline runs before trusting a new data window: split orders at
    the midpoint date and compare the price distributions of the two
    halves by Kolmogorov–Smirnov distance AND total-variation
    distance, both EXACT via cross-multiplication (|cum₁·n₂ −
    cum₂·n₁| never divides, so engines can't drift on floats; the
    final permille division happens in Python ints because 1000·D
    exceeds int64 once n₁·n₂ > 9·10¹⁵). KS runs on raw cents (CDFs
    are binning-free); TV needs overlapping supports — on all-
    distinct raw prices point-mass TV is trivially 1000‰ — so it
    bins at $10k (50 cells over the price domain; measured 141‰ →
    38‰ from sf0.001 → sf0.01, the √n noise shrink a real statistic
    shows).

    Scale shape: one zero-shuffle min/max-day pre-pass pins the
    midpoint; per-batch (cents, half) count partials form a bounded
    combiner (distinct cents ≤ the price domain, ~10⁷ cells at any
    input size); the single merge block sorts once and walks the two
    cumsums. Cross-products cum·n fit int64 up to ~7.5·10⁸ rows per
    half (√(int64max) split) — beyond that carry the comparison in
    Python ints inside the merge too."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max()) + 1) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        lo = (d < mid).astype(np.int64)
        out = (pd.DataFrame({"v": cents, "c_lo": lo, "c_hi": 1 - lo})
               .groupby("v", as_index=False)
               .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("v", as_index=False)
             .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum"))
             .sort_values("v").reset_index(drop=True))
        c1 = g["c_lo"].to_numpy(np.int64)
        c2 = g["c_hi"].to_numpy(np.int64)
        n1, n2 = int(c1.sum()), int(c2.sum())
        cross = c1.cumsum() * n2 - c2.cumsum() * n1
        d_num = int(np.abs(cross).max())
        binned = (g.assign(b=g["v"] // 1_000_000)
                  .groupby("b", as_index=False)
                  .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum")))
        tv_num = int(np.abs(
            binned["c_lo"].to_numpy(np.int64) * n2
            - binned["c_hi"].to_numpy(np.int64) * n1).sum())
        return pd.DataFrame({
            "n_lo": pd.Series([n1], dtype="int64"),
            "n_hi": pd.Series([n2], dtype="int64"),
            "ks_permille": pd.Series([1000 * d_num // (n1 * n2)],
                                     dtype="int64"),
            "tv_permille": pd.Series(
                [1000 * tv_num // (2 * n1 * n2)], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


DRIFT_SQL = """
WITH b AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders),
m AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM b),
h AS (
  SELECT v,
         sum(CASE WHEN d < (SELECT mid FROM m) THEN 1 ELSE 0 END)
           AS c1,
         sum(CASE WHEN d >= (SELECT mid FROM m) THEN 1 ELSE 0 END)
           AS c2
  FROM b GROUP BY 1),
n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h),
c AS (
  SELECT sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
         sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
  FROM h),
tb AS (
  SELECT v // 1000000 AS b, sum(c1) AS c1, sum(c2) AS c2
  FROM h GROUP BY 1),
ks AS (SELECT max(abs(cum1 * n2 - cum2 * n1)) AS d_num
       FROM c, n GROUP BY n1, n2),
tv AS (SELECT sum(abs(c1 * n2 - c2 * n1)) AS tv_num
       FROM tb, n GROUP BY n1, n2)
SELECT CAST(n1 AS BIGINT) AS n_lo, CAST(n2 AS BIGINT) AS n_hi,
       CAST(1000 * (SELECT d_num FROM ks) // (n1 * n2)
            AS BIGINT) AS ks_permille,
       CAST(1000 * (SELECT tv_num FROM tv) // (2 * n1 * n2)
            AS BIGINT) AS tv_permille
FROM n
"""


NEYMAN_BUDGET = 50


def part_neyman_allocation(sf_dir):
    """Neyman optimal sample allocation (Neyman '34 — the survey-
    sampling design primitive): split a budget of 50 samples across
    the 25 brand strata proportional to N_h·σ_h, minimizing the
    stratified-mean variance. The identity N_h·σ_h =
    √(N_h·Σv² − (Σv)²) keeps the weight computable from the three
    integer moments a combiner carries; IEEE-754 sqrt is correctly
    rounded, so floor(sqrt(D)) agrees across engines whenever D <
    2⁵³. Integer seats come from largest-remainder (Hamilton)
    apportionment — floor quotas, then +1 to the largest remainders,
    ties broken by brand — so the allocation is exact arithmetic,
    not a float rounding convention.

    Scale shape: per-batch (brand → n, Σv, Σv²) moment partials are
    a bounded 25-cell zero-shuffle combiner; the apportionment walks
    the 25-row merge block. Σv² fits int64 to ~2·10⁸ rows/stratum at
    max-price 2·10⁵ cents — past that the combiner must carry a
    two-limb (hi, lo) sum (documented, not built)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["p_retailprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"brand": t["p_brand"].to_pylist(),
                             "n": 1, "sv": cents,
                             "sq": cents * cents})
               .groupby("brand", as_index=False)
               .agg(n=("n", "sum"), sv=("sv", "sum"),
                    sq=("sq", "sum")))
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("brand", as_index=False)
             .agg(n=("n", "sum"), sv=("sv", "sum"), sq=("sq", "sum"))
             .sort_values("brand").reset_index(drop=True))
        disc = (g["n"].to_numpy(np.int64) * g["sq"].to_numpy(np.int64)
                - g["sv"].to_numpy(np.int64) ** 2)
        w = np.floor(np.sqrt(disc.astype(np.float64))).astype(np.int64)
        W = int(w.sum())
        base = NEYMAN_BUDGET * w // W
        rem = NEYMAN_BUDGET * w % W
        leftover = NEYMAN_BUDGET - int(base.sum())
        # +1 to the `leftover` largest remainders, brand-asc ties
        order = np.lexsort((np.arange(len(g)), -rem))
        extra = np.zeros(len(g), dtype=np.int64)
        extra[order[:leftover]] = 1
        return pd.DataFrame({
            "brand": g["brand"],
            "n_parts": g["n"].astype("int64"),
            "neyman_weight": w,
            "alloc": base + extra})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


NEYMAN_SQL = """
WITH s AS (
  SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sv,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(round(p_retailprice * 100) AS BIGINT)) AS sq
  FROM part GROUP BY 1),
w AS (
  SELECT brand, n,
         CAST(floor(sqrt(CAST(n * sq - sv * sv AS DOUBLE)))
              AS BIGINT) AS w
  FROM s),
t AS (SELECT sum(w) AS tw FROM w),
a AS (
  SELECT brand, n, w,
         CAST((%d * w) // tw AS BIGINT) AS base,
         CAST((%d * w) %% tw AS BIGINT) AS rem
  FROM w, t),
l AS (SELECT %d - sum(base) AS leftover FROM a),
r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, brand) AS rk
  FROM a)
SELECT brand, n AS n_parts, w AS neyman_weight,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY brand
""" % (NEYMAN_BUDGET, NEYMAN_BUDGET, NEYMAN_BUDGET)


def vocab_heaps_curve(sf_dir):
    """Heaps'-law vocabulary-growth curve (Heaps '78 — the corpus-
    scaling companion to vocab_zipf_spectrum's frequency spectrum):
    distinct-vocabulary size after the first k documents, for k on a
    power-of-two ladder plus N. The sequential-looking "distinct so
    far" is really first-occurrence arithmetic — a term counts
    toward vocab(k) iff min(doc_id) < k — so the curve distributes
    as a min-combiner, not a scan. Uses the zipf query's augmented
    token stream (doc tokens + the planted z_j power-law family) so
    the curve is non-degenerate: z_j contributes min(2^j, k) terms
    at prefix k, a true sublinear growth both engines replay.

    Scale shape: per-batch term→min(doc_id) partials (idempotent
    min combiner) ride ONE term-hash-bucketed exchange; each bucket
    compares its finalized first-occurrences against the ≤64-rung
    broadcast ladder and emits bounded (k, n) cells; single merge."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W = _exchange_buckets(sf_dir)

    def mx(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"mx": pd.Series(
            [int(t["doc_id"].to_numpy().max())], dtype="int64")})

    n_docs = int(ds.map_batches(mx, batch_format="pyarrow")
                 .to_pandas()["mx"].max()) + 1
    ladder = sorted({1 << i for i in range(64) if (1 << i) < n_docs}
                    | {n_docs})

    def term_first(t: pa.Table) -> pd.DataFrame:
        firsts: dict = {}
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            for tok in (txt or "").split(" "):
                if firsts.get(tok, n_docs) > did:
                    firsts[tok] = did
            for j in range(ZIPF_J):
                tok = "z%d_%d" % (j, did % (1 << j))
                if firsts.get(tok, n_docs) > did:
                    firsts[tok] = did
        df = pd.DataFrame({"term": list(firsts.keys()),
                           "fd": np.fromiter(firsts.values(),
                                             np.int64, len(firsts))})
        h = pd.util.hash_pandas_object(df["term"], index=False).values
        df["_bucket"] = (h % np.uint64(W)).astype("int32")
        return df

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("term")["fd"].min().to_numpy(np.int64)
        return pd.DataFrame({
            "prefix_docs": np.asarray(ladder, dtype=np.int64),
            "n": [int((fd < k).sum()) for k in ladder]}).astype(
                "int64")

    per_bucket = (ds.map_batches(term_first, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_counts, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("prefix_docs", as_index=False)["n"].sum()
               .rename(columns={"n": "vocab_size"})
               .sort_values("prefix_docs").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


_HEAPS_AUG = "text || " + " || ".join(
    "' z%d_' || CAST(doc_id %% %d AS VARCHAR)" % (j, 1 << j)
    for j in range(ZIPF_J))

HEAPS_SQL = """
WITH aug AS (SELECT doc_id, %s AS text FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM aug),
tf AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
nd AS (SELECT max(doc_id) + 1 AS n FROM documents),
lad AS (
  SELECT DISTINCT k FROM (
    SELECT CAST(power(2, i) AS BIGINT) AS k
    FROM (SELECT unnest(generate_series(0, 50)) AS i), nd
    WHERE power(2, i) < n
    UNION ALL SELECT n FROM nd))
SELECT CAST(k AS BIGINT) AS prefix_docs,
       CAST((SELECT count(*) FROM tf WHERE fd < lad.k) AS BIGINT)
         AS vocab_size
FROM lad ORDER BY 1
""" % _HEAPS_AUG


def user_event_gini_impurity(sf_dir):
    """Behavioral-diversity census — Gini impurity of each user's
    event-type mix, kept EXACT as the rational 1 − Σ(cᵢ/n)² reported
    in floored permille: impurity = (1000·(n² − Σcᵢ²)) // n². The
    segmentation complement to customer_rfm_segments: 0‰ = single-
    minded users, →800‰ = uniform over the 5 event types. Output is
    the n_users histogram per distinct impurity value (≤1001 cells).

    Scale shape: per-batch (user, type → n) count partials (lossless
    combiner) ride ONE user-bucketed exchange; each bucket finalizes
    Σcᵢ² per user vectorized (sort-free: groupby-sum of squares) and
    emits bounded impurity-cell partials; single merge. n² fits
    int64 to 3·10⁹ events per user."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "k": t["event_type"].to_pylist(), "n": 1})
             .groupby(["u", "k"], as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["u", "k"], as_index=False)["n"].sum()
        per_u = (a.assign(sq=a["n"] * a["n"])
                 .groupby("u", as_index=False)
                 .agg(n=("n", "sum"), sq=("sq", "sum")))
        n = per_u["n"].to_numpy(np.int64)
        sq = per_u["sq"].to_numpy(np.int64)
        imp = 1000 * (n * n - sq) // (n * n)
        out = (pd.DataFrame({"impurity_permille": imp})
               .groupby("impurity_permille", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("impurity_permille", as_index=False)
               ["n_users"].sum()
               .sort_values("impurity_permille")
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


GINI_IMPURITY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id, sum(n) AS n, sum(n * n) AS sq
  FROM c GROUP BY 1),
i AS (
  SELECT CAST(1000 * (n * n - sq) // (n * n) AS BIGINT)
           AS impurity_permille
  FROM u)
SELECT impurity_permille, CAST(count(*) AS BIGINT) AS n_users
FROM i GROUP BY 1 ORDER BY 1
"""


def _auc_score_hist(sf_dir):
    """Shared bounded (score, label) histogram for the model-eval
    operators: a PLANTED noisy scorer s = 8·[returnflag='R'] +
    orderkey%20 over lineitem (the synthesizer draws returnflag
    independently of every numeric column — measured corr ≈ 0 — so a
    non-degenerate evaluation needs a planted signal, the
    vocab_zipf_spectrum / dup_passages precedent; in production the
    score column is a real model output and this stage is a pruned
    two-column read). Score domain is bounded (0..27), so the
    histogram is a ≤56-cell lossless per-batch combiner — zero
    shuffle, one merge block."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        s = 8 * y + okey % 20
        out = (pd.DataFrame({"s": s, "y": y, "n": 1})
               .groupby(["s", "y"], as_index=False)["n"].sum())
        return out.astype("int64")

    return ds.map_batches(partial, batch_format="pyarrow")


def _auc_cells(df: pd.DataFrame) -> pd.DataFrame:
    """Fold histogram partials into one ascending-score frame with
    (np_, nn, cum_nn_below, cum_np_from) columns."""
    g = (df.groupby(["s", "y"], as_index=False)["n"].sum()
         .pivot_table(index="s", columns="y", values="n",
                      fill_value=0, aggfunc="sum")
         .reindex(columns=[0, 1], fill_value=0)
         .rename(columns={0: "nn", 1: "np_"})
         .reset_index().sort_values("s").reset_index(drop=True))
    return g.astype("int64")


def lineitem_model_auc(sf_dir):
    """Exact ROC-AUC of a scorer against a binary label — the
    model-evaluation primitive, computed as the Mann-Whitney U
    statistic with MIDRANK tie handling kept integer by doubling:
    2U = Σ_s n_pos(s)·(2·n_neg(<s) + n_neg(s)), AUC = U/(n_pos·n_neg)
    reported as the floored ppm 10⁶·2U // (2·n_pos·n_neg), plus the
    Gini coefficient 2·AUC−1 in the same grid. Ties matter: the
    planted scorer has heavy overlap (score 8..19 reachable from both
    classes), so an implementation that ignores midranks is visibly
    wrong. Final arithmetic runs in Python ints (2U outgrows int64
    near 10¹⁰ rows); SQL replays in HUGEINT.

    Scale shape: bounded ≤56-cell (score, label) count partials —
    lossless combiner, zero shuffle, one merge block; the score
    column never enters an exchange."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = _auc_cells(df)
        npos = [int(v) for v in g["np_"]]
        nneg = [int(v) for v in g["nn"]]
        tp, tn = sum(npos), sum(nneg)
        u2, below = 0, 0
        for p, q in zip(npos, nneg):
            u2 += p * (2 * below + q)
            below += q
        auc = 1_000_000 * u2 // max(2 * tp * tn, 1)
        return pd.DataFrame({"auc_ppm": [auc],
                             "gini_ppm": [2 * auc - 1_000_000],
                             "n_pos": [tp], "n_neg": [tn]}
                            ).astype("int64")

    return _merge_partials(_auc_score_hist(sf_dir), merge)


MODEL_AUC_SQL = """
WITH s AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         8 * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
           + l_orderkey % 20 AS s
  FROM lineitem),
h AS (SELECT s, CAST(sum(y) AS BIGINT) AS np_,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
      FROM s GROUP BY 1),
w AS (SELECT s, np_, nn,
             coalesce(sum(nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS below
      FROM h),
t AS (SELECT CAST(sum(np_ * (2 * below + nn)) AS HUGEINT) AS u2,
             CAST(sum(np_) AS HUGEINT) AS tp,
             CAST(sum(nn) AS HUGEINT) AS tn
      FROM w)
SELECT CAST(1000000 * u2 // greatest(2 * tp * tn, 1) AS BIGINT)
         AS auc_ppm,
       CAST(2 * (1000000 * u2 // greatest(2 * tp * tn, 1))
            - 1000000 AS BIGINT) AS gini_ppm,
       CAST(tp AS BIGINT) AS n_pos, CAST(tn AS BIGINT) AS n_neg
FROM t
"""


def lineitem_pr_curve(sf_dir):
    """Precision-recall / F1 threshold sweep — the operating-point
    table a deployment reads to pick its classification threshold:
    for every threshold t in the bounded score domain, predict
    positive iff score ≥ t and report the exact confusion counts plus
    floored-permille precision, recall and F1 (F1 = 2000·tp //
    (2·tp + fp + fn) — the harmonic mean kept in one integer
    division). Same planted scorer as lineitem_model_auc, so the
    sweep shows the full tradeoff: t=0 is recall 1000‰, t=20 is
    precision 1000‰ (scores ≥20 are reachable only via the +8 class
    shift).

    Scale shape: the same ≤56-cell zero-shuffle histogram; the sweep
    is suffix cumsums over ≤28 thresholds in the single merge
    block."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = _auc_cells(df)
        tp_tot, tn_tot = int(g["np_"].sum()), int(g["nn"].sum())
        # suffix sums: predictions positive at threshold t are rows
        # with score >= t
        np_arr = g["np_"].to_numpy(np.int64)
        nn_arr = g["nn"].to_numpy(np.int64)
        tp = np_arr[::-1].cumsum()[::-1]
        fp = nn_arr[::-1].cumsum()[::-1]
        fn = tp_tot - tp
        tn = tn_tot - fp
        prec = 1000 * tp // np.maximum(tp + fp, 1)
        rec = 1000 * tp // max(tp_tot, 1)
        f1 = 2000 * tp // np.maximum(2 * tp + fp + fn, 1)
        out = pd.DataFrame({"threshold": g["s"], "tp": tp, "fp": fp,
                            "fn": fn, "tn": tn,
                            "precision_permille": prec,
                            "recall_permille": rec,
                            "f1_permille": f1})
        return out.sort_values("threshold").reset_index(drop=True) \
                  .astype("int64")

    return _merge_partials(_auc_score_hist(sf_dir), merge)


PR_CURVE_SQL = """
WITH s AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         8 * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
           + l_orderkey % 20 AS s
  FROM lineitem),
h AS (SELECT s, CAST(sum(y) AS BIGINT) AS np_,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
      FROM s GROUP BY 1),
t AS (SELECT CAST(sum(np_) AS BIGINT) AS tp_tot,
             CAST(sum(nn) AS BIGINT) AS tn_tot FROM h),
w AS (SELECT s AS threshold,
             CAST(sum(np_) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(sum(nn) OVER (ORDER BY s DESC) AS BIGINT) AS fp
      FROM h)
SELECT threshold, tp, fp,
       CAST(t.tp_tot - tp AS BIGINT) AS fn,
       CAST(t.tn_tot - fp AS BIGINT) AS tn,
       CAST(1000 * tp // greatest(tp + fp, 1) AS BIGINT)
         AS precision_permille,
       CAST(1000 * tp // greatest(t.tp_tot, 1) AS BIGINT)
         AS recall_permille,
       CAST(2000 * tp // greatest(2 * tp + fp + (t.tp_tot - tp), 1)
            AS BIGINT) AS f1_permille
FROM w, t ORDER BY threshold
"""


def events_chi2_independence(sf_dir):
    """Chi-square independence audit of event type × hour-of-day —
    the feature-independence check run before treating a categorical
    pair as uncorrelated (and the contingency companion to
    orders_price_drift's two-sample tests). The statistic is kept
    cross-engine exact by DEFINING it cell-floored: each of the
    (observed-type × observed-hour) cells contributes
    floor(1000·(N·n_ij − r_i·c_j)² / (N·r_i·c_j)) — the classic
    (O−E)²/E with both sides multiplied through by N so no float
    expected-count ever exists — and the report is each type's milli
    contribution summed over its 24 hour cells (the per-feature-value
    attribution a drift dashboard plots). Zero-observed cells of the
    dense margin cross DO contribute (n=0 ⇒ 1000·r·c // N), the
    textbook requirement a sparse groupby silently violates. On this
    synthesizer types and hours are independent by construction, so
    the audit correctly reports noise-level values — the exact noise
    is the data.

    Scale shape: bounded ≤120-cell (type, hour) count partials —
    lossless per-batch combiner, zero shuffle; the single merge block
    densifies the margin cross and runs the quadratic arithmetic in
    Python ints ((N·n)² outgrows int64 past ~3·10⁹ events; SQL
    replays in HUGEINT)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        hrs = (t["ts"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 3_600_000_000) % 24
        out = (pd.DataFrame({"t": t["event_type"].to_pylist(),
                             "h": hrs, "n": 1})
               .groupby(["t", "h"], as_index=False)["n"].sum())
        return out.astype({"h": "int64", "n": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby(["t", "h"], as_index=False)["n"].sum()
        obs = {(r.t, int(r.h)): int(r.n) for r in b.itertuples()}
        rmarg = b.groupby("t")["n"].sum().to_dict()
        cmarg = b.groupby("h")["n"].sum().to_dict()
        N = int(b["n"].sum())
        rows = []
        for t, rn in sorted(rmarg.items()):
            chi = 0
            for h, cn in cmarg.items():
                n = obs.get((t, int(h)), 0)
                dev = N * n - int(rn) * int(cn)
                chi += 1000 * dev * dev // (N * int(rn) * int(cn))
            rows.append((t, int(rn), chi))
        return pd.DataFrame(rows, columns=["event_type", "n_events",
                                           "chi2_milli"]
                            ).astype({"n_events": "int64",
                                      "chi2_milli": "int64"})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


EVENTS_CHI2_SQL = """
WITH b AS (
  SELECT event_type AS t,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT t, CAST(sum(n) AS BIGINT) AS rn FROM b GROUP BY 1),
c AS (SELECT h, CAST(sum(n) AS BIGINT) AS cn FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt FROM b),
d AS (SELECT r.t, r.rn, c.cn, coalesce(b.n, 0) AS n
      FROM r CROSS JOIN c
      LEFT JOIN b ON b.t = r.t AND b.h = c.h),
cell AS (
  SELECT t, rn,
         1000 * (tot.nt * n - CAST(rn AS HUGEINT) * cn)
              * (tot.nt * n - CAST(rn AS HUGEINT) * cn)
           // (tot.nt * rn * cn) AS chi
  FROM d, tot)
SELECT t AS event_type, rn AS n_events,
       CAST(sum(chi) AS BIGINT) AS chi2_milli
FROM cell GROUP BY 1, 2 ORDER BY 1
"""


def basket_rule_lift(sf_dir):
    """Association-rule strength mining — the step AFTER
    basket_part_pairs's support counting: the top-20 part pairs by
    exact LIFT (T·n_ab / (n_a·n_b), >1 = bought together more than
    independence predicts), reported with both directed confidences,
    everything in floored integer grids (lift_ppm = 10⁶·T·n_ab //
    (n_a·n_b); conf = 1000·n_ab // n_a) so ranking and ties replay
    bit-for-bit in SQL. Raw lift explodes on singleton pairs, so the
    rule universe is support ≥ BASKET_MINSUP — the standard A-Priori
    pruning.

    Scale shape: item supports n_a and the basket count T come off
    the okey-bucketed exchange (batch-local distinct combiner; an
    order lives in exactly one bucket, so per-bucket item counts are
    additive) and DISPATCH on size: ≤ joins.DIM_BROADCAST_THRESHOLD
    they fold driver-side and broadcast into the pair ranking; above
    it they total in a bucketed second exchange and join onto the
    pruned pairs via attach_dim (forced-path tested). Pairs ride the
    basket_part_pairs two-exchange shape — okey buckets self-join
    baskets, a second pair-hash exchange totals support, prunes
    minsup and scores lift map-side of the merge (a pair finalizes in
    exactly one bucket, so per-bucket top-k is exact); the bounded
    merge takes the global top-20 by (lift_ppm desc, p1, p2).
    10⁶·T·n_ab outgrows int64 near 10¹³ baskets — Python ints in the
    scorer, HUGEINT in SQL."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy()})
        df = df.drop_duplicates()
        h = pd.util.hash_pandas_object(df["okey"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    # pass 1: the small dimension — per-item basket counts + T,
    # additive over okey buckets because a basket lives in one bucket
    def bucket_items(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["okey", "pkey"]].drop_duplicates()
        out = (g.groupby("pkey", as_index=False).size()
               .rename(columns={"size": "n"}))
        out = pd.concat(
            [out, pd.DataFrame({"pkey": [-1],
                                "n": [g["okey"].nunique()]})],
            ignore_index=True)
        return out.astype("int64")

    # per-bucket partials are additive (a basket lives in one okey
    # bucket). Threshold dispatch (the verify_jaccard contract):
    # partial rows ≤ joins.DIM_BROADCAST_THRESHOLD → driver-side
    # pandas fold + broadcast counts dict (a second Ray-native
    # groupby measured 44 s of pure exchange overhead on 0.8 MB of
    # partials); above → bucketed second exchange + attach_dim joins
    # for n_a/n_b, so 10⁹ parts never materialize on the driver.
    partial_items = (li.map_batches(prep, batch_format="pyarrow")
                     .groupby("_bucket")
                     .map_groups(bucket_items, batch_format="pandas")
                     .materialize())
    driver_fold = (partial_items.count()
                   <= joins.DIM_BROADCAST_THRESHOLD)
    counts: dict = {}
    n_baskets = 0
    counts_ds = None
    if driver_fold:
        folded = partial_items.to_pandas().groupby("pkey")["n"].sum()
        counts = {int(k): int(v) for k, v in folded.items()}
        n_baskets = counts.pop(-1)
    else:
        def tag_pkey(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            h = pd.util.hash_pandas_object(df["pkey"],
                                           index=False).values
            df["_b3"] = (h % np.uint64(buckets)).astype("int32")
            return df

        def sum_items(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("pkey", as_index=False)["n"].sum()
            return out.astype("int64")

        counts_all = (partial_items
                      .map_batches(tag_pkey, batch_format="pandas")
                      .groupby("_b3")
                      .map_groups(sum_items, batch_format="pandas")
                      .materialize())
        n_baskets = int(counts_all.map_batches(
            lambda df: df[df["pkey"] == -1],
            batch_format="pandas").to_pandas()["n"].sum())
        counts_ds = counts_all.map_batches(
            lambda df: df[df["pkey"] != -1], batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["okey", "pkey"]].drop_duplicates()
        j = g.merge(g, on="okey")
        j = j[j["pkey_x"] < j["pkey_y"]]
        out = (j.groupby(["pkey_x", "pkey_y"], as_index=False).size()
               .rename(columns={"pkey_x": "p1", "pkey_y": "p2",
                                "size": "support"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(
            out["p1"] * np.int64(1_000_003) + out["p2"],
            index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        """(p1, p2, support, na, nb) → scored local top-k."""
        sup = g["support"].to_numpy(np.int64)
        na = g["na"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        if (len(sup) == 0
                or (1_000_000 * n_baskets * int(sup.max()) < 2 ** 63
                    and int(na.max()) * int(nb.max()) < 2 ** 63)):
            lift = 1_000_000 * n_baskets * sup // (na * nb)
            c12 = 1000 * sup // na
            c21 = 1000 * sup // nb
        else:  # Python-int path past ~9·10¹² basket·support products
            lift = [1_000_000 * n_baskets * int(s) // (int(a) * int(b))
                    for s, a, b in zip(sup, na, nb)]
            c12 = [1000 * int(s) // int(a) for s, a in zip(sup, na)]
            c21 = [1000 * int(s) // int(b) for s, b in zip(sup, nb)]
        out = pd.DataFrame({"p1": g["p1"].to_numpy(np.int64),
                            "p2": g["p2"].to_numpy(np.int64),
                            "support": sup, "lift_ppm": lift,
                            "conf12_permille": c12,
                            "conf21_permille": c21})
        out = (out.sort_values(["lift_ppm", "p1", "p2"],
                               ascending=[False, True, True])
               .head(BASKET_TOPK))
        return out.astype("int64")

    def bucket_totals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p1", "p2"], as_index=False)["support"].sum()
        g = g[g["support"] >= BASKET_MINSUP]
        return g.astype("int64")[["p1", "p2", "support"]]

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        g = bucket_totals(g)
        g = g.assign(na=g["p1"].map(counts).astype("int64"),
                     nb=g["p2"].map(counts).astype("int64"))
        return _score(g)

    if driver_fold:
        per_pair = (li.map_batches(prep, batch_format="pyarrow")
                    .groupby("_bucket")
                    .map_groups(bucket_pairs, batch_format="pandas")
                    .groupby("_b2")
                    .map_groups(bucket_score, batch_format="pandas"))
    else:
        # two-exchange pair subtree materializes (pruned by minsup —
        # bounded) before the attach_dim exchanges: the documented
        # three-exchange DAG-shape mitigation
        pair_totals = (li.map_batches(prep, batch_format="pyarrow")
                       .groupby("_bucket")
                       .map_groups(bucket_pairs, batch_format="pandas")
                       .groupby("_b2")
                       .map_groups(bucket_totals,
                                   batch_format="pandas")
                       .materialize())
        with_na = joins.attach_dim(pair_totals, counts_ds, "p1",
                                   "pkey", "n", out_col="na",
                                   how="inner")
        with_nb = joins.attach_dim(with_na, counts_ds, "p2",
                                   "pkey", "n", out_col="nb",
                                   how="inner")
        per_pair = with_nb.map_batches(_score, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["lift_ppm", "p1", "p2"],
                               ascending=[False, True, True])
                .head(BASKET_TOPK).reset_index(drop=True)
                .astype("int64"))

    return _merge_partials(per_pair, final)


BASKET_LIFT_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS nb
      FROM b),
i AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1),
p AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS support
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= %d)
SELECT CAST(p.p1 AS BIGINT) AS p1, CAST(p.p2 AS BIGINT) AS p2,
       p.support,
       CAST(1000000 * t.nb * p.support
            // (CAST(ia.n AS HUGEINT) * ib.n) AS BIGINT) AS lift_ppm,
       CAST(1000 * p.support // ia.n AS BIGINT) AS conf12_permille,
       CAST(1000 * p.support // ib.n AS BIGINT) AS conf21_permille
FROM p, t
JOIN i ia ON ia.l_partkey = p.p1
JOIN i ib ON ib.l_partkey = p.p2
ORDER BY lift_ppm DESC, p1, p2 LIMIT %d
""" % (BASKET_MINSUP, BASKET_TOPK)


def orders_jackknife_variance(sf_dir):
    """Delete-one-GROUP jackknife (Quenouille '56 / Tukey '58, the
    block-jackknife form every survey system uses) — the standard
    error of the mean estimated WITHOUT distributional assumptions,
    pairing orders_median_of_means's robust location with a
    stability/precision audit: rows md5-assign to the same 32
    deterministic groups, each leave-one-group-out milli-mean is
    θ_i = 1000·(S−s_i) // (N−n_i), and the jackknife variance is
    v = (g−1)·(g·Σθ² − (Σθ)²) // g² with se = isqrt(v) — all floored
    integer grids (isqrt is exact in Python; SQL floor(sqrt()) agrees
    below 2^53, the part_neyman_allocation precedent). The max
    |θ_i − θ̂| influence column is the one-bad-shard diagnostic.

    Scale shape: the (group → n, sum) table is a bounded 32-cell
    lossless per-batch combiner — zero shuffle; merge arithmetic in
    Python ints (g·Σθ² nears int64 at milli-means ~10⁸), HUGEINT in
    SQL."""
    import hashlib
    import math

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        grp = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                 16) % MOM_GROUPS for x in k), np.int64, len(k))
        out = (pd.DataFrame({"g": grp, "n": 1, "cents": cents})
               .groupby("g", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        gt = (df.groupby("g", as_index=False)
              .agg(n=("n", "sum"), cents=("cents", "sum")))
        ns = [int(v) for v in gt["n"]]
        ss = [int(v) for v in gt["cents"]]
        N, S, g = sum(ns), sum(ss), len(ns)
        thetas = [1000 * (S - s) // (N - n) for n, s in zip(ns, ss)]
        st, st2 = sum(thetas), sum(t * t for t in thetas)
        var = (g - 1) * (g * st2 - st * st) // (g * g)
        theta_hat = 1000 * S // N
        infl = max(abs(t - theta_hat) for t in thetas)
        return pd.DataFrame({
            "n_groups": pd.Series([g], dtype="int64"),
            "true_millicents": pd.Series([theta_hat], dtype="int64"),
            "jk_var": pd.Series([var], dtype="int64"),
            "jk_se_milli": pd.Series([math.isqrt(var)],
                                     dtype="int64"),
            "max_influence_milli": pd.Series([infl], dtype="int64")})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


JACKKNIFE_SQL = """
WITH r AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
              AS BIGINT) %% %d AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
gm AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(cents) AS HUGEINT) AS s
       FROM r GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(s) AS HUGEINT) AS st,
               CAST(count(*) AS HUGEINT) AS g FROM gm),
th AS (SELECT 1000 * (tot.st - gm.s) // (tot.nt - gm.n) AS theta
       FROM gm, tot),
agg AS (SELECT CAST(sum(theta) AS HUGEINT) AS s1,
               CAST(sum(theta * theta) AS HUGEINT) AS s2
        FROM th),
fin AS (SELECT tot.g AS g,
               1000 * tot.st // tot.nt AS theta_hat,
               (tot.g - 1) * (tot.g * agg.s2 - agg.s1 * agg.s1)
                 // (tot.g * tot.g) AS var
        FROM tot, agg)
SELECT CAST(fin.g AS BIGINT) AS n_groups,
       CAST(fin.theta_hat AS BIGINT) AS true_millicents,
       CAST(fin.var AS BIGINT) AS jk_var,
       -- exact isqrt past 2^53 (the +/-2 double-sqrt correction)
       CAST((SELECT r + (CASE WHEN (r + 2) * (r + 2) <= fin.var
                              THEN 2
                              WHEN (r + 1) * (r + 1) <= fin.var
                              THEN 1
                              WHEN r * r <= fin.var THEN 0
                              WHEN (r - 1) * (r - 1) <= fin.var
                              THEN -1 ELSE -2 END)
             FROM (SELECT CAST(floor(sqrt(CAST(fin.var AS DOUBLE)))
                               AS HUGEINT) AS r))
            AS BIGINT) AS jk_se_milli,
       CAST((SELECT max(abs(theta - fin.theta_hat)) FROM th)
            AS BIGINT) AS max_influence_milli
FROM fin
""" % MOM_GROUPS


def orders_forecast_backtest(sf_dir):
    """Walk-forward backtest of the seasonal-naive forecaster — the
    evaluation discipline behind every demand-forecast deployment
    (and the honest companion to q6_forecast_revenue's point
    forecast): daily revenue densified to the full calendar (missing
    days are real zero-revenue days, the orders_daily_acf1 rule),
    forecast f_d = x_{d−7} scored against actuals over every day
    with a 7-back history, next to the persistence baseline
    f_d = x_{d−1}. Reported: exact floored MAE cents for both and
    the skill ratio 1000·mae7 // mae1 (<1000 = weekly seasonality
    carries signal beyond persistence). All integer — no float error
    metric ever crosses engines.

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner (~2.4k cells for this corpus' 6½ calendar years) — zero
    shuffle; the single merge block densifies and shifts
    vectorized."""
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
        x[g["d"].to_numpy(np.int64) - lo] = g["cents"].to_numpy(np.int64)
        act, f7, f1 = x[7:], x[:-7], x[6:-1]
        n = len(act)
        e7 = int(np.abs(act - f7).sum())
        e1 = int(np.abs(act - f1).sum())
        return pd.DataFrame({
            "n_days": pd.Series([n], dtype="int64"),
            "mae7_cents": pd.Series([e7 // n], dtype="int64"),
            "mae1_cents": pd.Series([e1 // n], dtype="int64"),
            "skill_permille": pd.Series([1000 * e7 // max(e1, 1)],
                                        dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FORECAST_BACKTEST_SQL = """
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
l AS (SELECT c, lag(c, 7) OVER (ORDER BY d) AS f7,
             lag(c, 1) OVER (ORDER BY d) AS f1
      FROM x),
e AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(abs(c - f7)) AS HUGEINT) AS e7,
             CAST(sum(abs(c - f1)) AS HUGEINT) AS e1
      FROM l WHERE f7 IS NOT NULL)
SELECT n AS n_days,
       CAST(e7 // n AS BIGINT) AS mae7_cents,
       CAST(e1 // n AS BIGINT) AS mae1_cents,
       CAST(1000 * e7 // greatest(e1, 1) AS BIGINT)
         AS skill_permille
FROM e
"""


def kg_transitivity(sf_dir):
    """Global clustering coefficient (transitivity) of the
    co-citation graph — the one-number cohesion summary next to
    kg_cocite_triangles' per-node counts: C = 3·triangles / wedges,
    wedges = Σ_v d_v(d_v−1)/2, reported as the floored permille
    1000·Σ_v tri_v // wedges (Σ_v tri_v is already 3T because each
    triangle is counted at its three corners). A bibliometric
    network's transitivity >> a random graph's is the small-world
    signature (Watts-Strogatz '98).

    Scale shape: rides the existing distributed machinery whole —
    cocitation_pairs (two bucketed exchanges, hub-capped),
    triangle_counts (wedge join + closing-edge semi-join),
    graph.degrees (node-bucketed exchange of count partials); each
    side reduces to a bounded scalar partial and only those scalars
    reach the driver. Final quotient in Python ints (Σd² outgrows
    int64 past ~10⁹-degree hubs)."""
    from ...stages import graph

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node")

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64)
        return pd.DataFrame({"n_nodes": [len(d)],
                             "wedges2": [int((d * (d - 1)).sum())]}
                            ).astype("int64")

    deg_tot = (deg.map_batches(deg_partial, batch_format="pandas")
               .to_pandas().sum())
    n_nodes, wedges = int(deg_tot["n_nodes"]), int(deg_tot["wedges2"]) // 2

    tri_tot = (graph.triangle_counts(pairs)
               .map_batches(lambda df: pd.DataFrame(
                   {"t3": [int(df["n_triangles"].sum())]}),
                   batch_format="pandas")
               .to_pandas()["t3"].sum())
    n_edges = pairs.count()

    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_edges": pd.Series([int(n_edges)], dtype="int64"),
        "n_wedges": pd.Series([wedges], dtype="int64"),
        "n_triangles": pd.Series([int(tri_tot) // 3], dtype="int64"),
        "transitivity_permille": pd.Series(
            [1000 * int(tri_tot) // max(wedges, 1)], dtype="int64")})


KG_TRANSITIVITY_SQL = f"""
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
tri AS (
  SELECT p1.a, p1.b, p2.b AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.a = p1.b
  JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
agg AS (
  SELECT (SELECT count(*) FROM deg) AS n_nodes,
         (SELECT count(*) FROM pairs) AS n_edges,
         (SELECT CAST(sum(d * (d - 1)) AS HUGEINT) // 2 FROM deg)
           AS n_wedges,
         (SELECT count(*) FROM tri) AS n_triangles)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(1000 * 3 * CAST(n_triangles AS HUGEINT)
            // greatest(n_wedges, 1) AS BIGINT)
         AS transitivity_permille
FROM agg
"""


GINI_BAND_CENTS = 100_000  # $1,000 revenue bins


def customer_revenue_gini(sf_dir):
    """Gini coefficient of customer revenue — the Lorenz-curve
    inequality number completing the concentration triad
    (customer_pareto_concentration = smallest 80% cover,
    brand_revenue_hhi = Herfindahl, this = Gini). Exact Gini needs
    every rank, so the statistic is DEFINED on $1,000-binned revenue
    (the orders_price_drift binning precedent — binned Gini is the
    exact Gini of the banded values, well-defined identically in both
    engines): G = Σ_{i<j} n_i·n_j·(b_j−b_i) / (N·Σ n_b·b), computed
    from ascending-band cumsums and floored to permille. Only
    ordering customers exist in the fact table, so the population is
    'customers with ≥1 order' — stated, not hidden.

    Scale shape: per-batch (custkey → cents) partials (lossless
    combiner) ride ONE custkey-bucketed exchange; each bucket bands
    its finalized customers into bounded (band, n) cells (a customer
    lives in one bucket, so cells are additive); the single merge
    runs the pairwise-difference cumsum in Python ints (n_i·n_j·Δb
    outgrows int64 past ~10⁹ customers)."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(),
                           "cents": cents})
             .groupby("c", as_index=False)["cents"].sum())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "cents": "int64",
                         "_bucket": "int32"})

    def bucket_bands(g: pd.DataFrame) -> pd.DataFrame:
        per_c = g.groupby("c", as_index=False)["cents"].sum()
        band = per_c["cents"].to_numpy(np.int64) // GINI_BAND_CENTS
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_bands, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = (df.groupby("band", as_index=False)["n"].sum()
             .sort_values("band").reset_index(drop=True))
        bands = [int(v) for v in b["band"]]
        ns = [int(v) for v in b["n"]]
        num, cn, cs = 0, 0, 0
        for band, n in zip(bands, ns):
            num += n * (band * cn - cs)
            cn += n
            cs += band * n
        return pd.DataFrame({
            "n_customers": pd.Series([cn], dtype="int64"),
            "n_bands": pd.Series([len(bands)], dtype="int64"),
            "gini_permille": pd.Series(
                [1000 * num // max(cn * cs, 1)], dtype="int64")})

    return _merge_partials(per_bucket, merge)


CUSTOMER_GINI_SQL = """
WITH r AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
b AS (SELECT cents // %d AS band, CAST(count(*) AS BIGINT) AS n
      FROM r GROUP BY 1),
w AS (SELECT band, n,
             coalesce(sum(n) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cn,
             coalesce(sum(band * n) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cs
      FROM b),
agg AS (SELECT CAST(sum(n * (band * cn - cs)) AS HUGEINT) AS num,
               CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(band * n) AS HUGEINT) AS sb,
               CAST(count(*) AS BIGINT) AS nb
        FROM w)
SELECT CAST(nt AS BIGINT) AS n_customers,
       nb AS n_bands,
       CAST(1000 * num // greatest(nt * sb, 1) AS BIGINT)
         AS gini_permille
FROM agg
""" % GINI_BAND_CENTS
