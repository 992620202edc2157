"""TPC-H fill-ins (Q6/Q14/Q19/Q16/Q8 et al.) and percentile / CDC / window
operator families."""

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
    EVENT_TYPE_BITS,
    RADIX_SHIFT,
    _exchange_buckets,
    _merge_partials,
    _read,
    _tag_bucket,
)
from .relational import CDC_DEL_MOD, CDC_INS_MOD, CDC_UPD_MOD


# ---------------------------------------------------------------------
# TPC-H fill-ins: Q6 / Q14 / Q19 / Q16 / Q8 shapes
# ---------------------------------------------------------------------
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): a pure
    filter-and-sum over the fact table — the zero-shuffle baseline
    every scan-heavy stage should degenerate to.

    Scale shape: predicate + per-batch cents partial entirely
    map-side (only 4 of 11 lineitem columns leave storage), one
    bounded single-row merge. The float discount crosses engines as
    round(l_discount*100) integer percent, so the BETWEEN 3 AND 7 is
    exact; revenue units are extprice-cents × discount-percent
    (1e-4 dollars), an integer product of two per-row roundings —
    no float sum exists on either side."""
    lo = np.datetime64(Q6_LO, "us").astype(np.int64)
    hi = np.datetime64(Q6_HI, "us").astype(np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        ship = (t["l_shipdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64))
        pct = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                           pa.scalar(100.0)),
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = t["l_quantity"].to_numpy()
        m = ((ship >= lo) & (ship < hi)
             & (pct >= 3) & (pct <= 7) & (qty < 25))
        return pd.DataFrame(
            {"revenue_e4": pd.Series([int((cents[m] * pct[m]).sum())],
                                     dtype="int64"),
             "n_items": pd.Series([int(m.sum())], dtype="int64")})

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount",
                        "l_extendedprice", "l_quantity"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"revenue_e4": pd.Series([int(df["revenue_e4"].sum())],
                                     dtype="int64"),
             "n_items": pd.Series([int(df["n_items"].sum())],
                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


Q6_SQL = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_e4,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '%s' AND l_shipdate < DATE '%s'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
  AND l_quantity < 25
""" % (Q6_LO, Q6_HI)


Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"


def q14_promo_revenue(sf_dir):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue that came from PROMO-type parts — a fact ⋈ dimension join
    whose output is a single ratio.

    Scale shape: the month filter + per-row cents land map-side, and
    each lineitem batch pre-reduces to (partkey → cents) partials (a
    lossless combiner) before ONE partkey-hash-bucketed tagged
    exchange against the part side's (partkey, is_promo) rows — the
    part table is NOT broadcast (every part matters here, unlike a
    filtered dimension leg, so at 10⁹ parts a broadcast dict would be
    the skeleton_entities anti-pattern). Each bucket inner-joins and
    emits one (promo_cents, total_cents) partial; the ratio is exact
    integer permille in the single-block merge, so no float division
    crosses engines."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    lo, hi = np.datetime64(Q14_LO), np.datetime64(Q14_HI)
    COLS = ["pkey", "cents", "promo", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        ship = t["l_shipdate"].to_numpy()
        m = (ship >= lo) & (ship < hi)
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy()[m],
                           "cents": cents[m]})
        p = df.groupby("pkey", as_index=False)["cents"].sum()
        p["cents"] = p["cents"].astype("int64")
        p["promo"] = np.int64(-1)
        return _tag_bucket(p, buckets, 0, COLS, key="pkey")

    def prep_pt(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "pkey": t["p_partkey"].to_numpy(),
            "cents": np.zeros(t.num_rows, np.int64),
            "promo": (t["p_type"].to_numpy(zero_copy_only=False)
                      == "PROMO").astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS, key="pkey")

    def bucket_sums(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0][["pkey", "cents"]]
        pt_ = g[g["_side"] == 1][["pkey", "promo"]]
        j = li_.merge(pt_, on="pkey", how="inner")
        c = j["cents"].to_numpy()
        return pd.DataFrame(
            {"promo_cents": pd.Series(
                [int(c[j["promo"].to_numpy() == 1].sum())],
                dtype="int64"),
             "total_cents": pd.Series([int(c.sum())], dtype="int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])
    pt = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(pt.map_batches(prep_pt, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_sums, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        promo = int(df["promo_cents"].sum())
        total = int(df["total_cents"].sum())
        return pd.DataFrame(
            {"promo_cents": pd.Series([promo], dtype="int64"),
             "total_cents": pd.Series([total], dtype="int64"),
             "promo_permille": pd.Series(
                 [(1000 * promo) // max(total, 1)], dtype="int64")})

    return _merge_partials(per_bucket, final)


Q14_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS c
  FROM lineitem
  WHERE l_shipdate >= DATE '%s' AND l_shipdate < DATE '%s')
SELECT CAST(coalesce(sum(CASE WHEN p.p_type = 'PROMO' THEN li.c END), 0)
            AS BIGINT) AS promo_cents,
       CAST(coalesce(sum(li.c), 0) AS BIGINT) AS total_cents,
       CAST((1000 * coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN li.c END), 0))
            // greatest(coalesce(sum(li.c), 0), 1) AS BIGINT)
         AS promo_permille
FROM li JOIN part p ON p.p_partkey = li.l_partkey
""" % (Q14_LO, Q14_HI)


# (brand, size_lo..size_hi, qty_lo..qty_hi) — brands are disjoint so a
# part matches at most one bracket
Q19_BRACKETS = (("Brand#12", 1, 5, 1, 11),
                ("Brand#23", 1, 10, 10, 20),
                ("Brand#15", 1, 15, 20, 30))


def q19_bracket_revenue(sf_dir):
    """TPC-H Q19 shape (discounted revenue): a disjunction of
    three (brand, size-range, quantity-range) brackets spanning BOTH
    join sides — the predicate that defeats naive pushdown because
    no single conjunct applies to either table alone.

    Scale shape: the bracket predicates prune the part scan MAP-SIDE
    (pruned 3-column read, vectorized brand+size masks) down to
    partkey → packed quantity range; ``joins.attach_dim`` then
    inner-attaches the range onto lineitem — broadcast dict below the
    threshold, bucketed hash join above (the 10⁹-part contract,
    forced-path tested — nothing part-sized ever reaches the driver).
    The lineitem pass stays a lossless combiner: range-check the
    attached bounds, sum cents per batch, merge one bounded block.

    The two range bounds pack into ONE int64 (qlo·1000 + qhi; TPC-H
    quantities are < 1000) because attach_dim carries a single value
    column; both sides unpack with exact integer arithmetic."""
    def part_brackets(t: pa.Table) -> pa.Table:
        brand = np.asarray(t["p_brand"].to_pylist(), dtype=object)
        size = t["p_size"].to_numpy()
        keep = np.zeros(len(brand), dtype=bool)
        qrange = np.zeros(len(brand), dtype=np.int64)
        for b, slo, shi, qlo, qhi in Q19_BRACKETS:  # disjoint brands
            m = (brand == b) & (size >= slo) & (size <= shi)
            keep |= m
            qrange[m] = qlo * 1000 + qhi
        return pa.table({
            "p_partkey": pa.array(
                t["p_partkey"].to_numpy()[keep].astype(np.int64),
                pa.int64()),
            "qrange": pa.array(qrange[keep], pa.int64())})

    part_ds = (_read(sf_dir, "part",
                     columns=["p_partkey", "p_brand", "p_size"])
               .map_batches(part_brackets, batch_format="pyarrow"))

    def partial(t: pa.Table) -> pd.DataFrame:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        qr = t["qrange"].to_numpy()
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        m = (qty >= qr // 1000) & (qty <= qr % 1000)
        return pd.DataFrame(
            {"revenue_cents": pd.Series([int(cents[m].sum())],
                                        dtype="int64"),
             "n_items": pd.Series([int(m.sum())], dtype="int64")})

    ds = joins.attach_dim(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity",
                       "l_extendedprice", "l_discount"]),
        part_ds, "l_partkey", "p_partkey", "qrange", how="inner")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"revenue_cents": pd.Series([int(df["revenue_cents"].sum())],
                                        dtype="int64"),
             "n_items": pd.Series([int(df["n_items"].sum())],
                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


Q19_SQL = """
SELECT CAST(coalesce(sum(
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE %s
""" % " OR ".join(
    "(p.p_brand = '%s' AND p.p_size BETWEEN %d AND %d "
    "AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN %d AND %d)"
    % b for b in Q19_BRACKETS)


Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
Q16_EXCL_BRAND = "Brand#5"
Q16_MIN_BAL = 2000  # suppliers below this are excluded ("complaints")


def q16_supplier_count(sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    suppliers per (brand, type, size) for a filtered part family,
    excluding a supplier blocklist — COUNT(DISTINCT) whose groups
    span the whole fact table, with lineitem standing in for
    partsupp as the part↔supplier association.

    Scale shape: the size/brand filter prunes the part scan MAP-SIDE,
    the surviving (brand, type, size) attributes pack into one string
    column and ``joins.attach_dim`` inner-attaches it onto lineitem
    (broadcast ≤ threshold, bucketed hash join above); the supplier
    blocklist derives from a map-side acctbal filter and applies via
    ``joins.membership_join`` (keyset broadcast ≤ threshold, Bloom +
    exact hash-partitioned recheck above) — NEITHER dimension ever
    materializes unfiltered on the driver (the 10⁹-row contract,
    forced-path tested). Each lineitem batch then projects to
    batch-locally-deduped (suppkey, attrs) rows — the dedup is the
    combiner — before ONE suppkey-hash-bucketed exchange. A
    supplier's rows land in exactly one bucket, so the per-bucket
    global dedup makes per-group distinct-counts additive across
    buckets; the ≤ brands×types×sizes merge is bounded."""
    SEP = "\x1f"
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def part_filtered(t: pa.Table) -> pa.Table:
        size = t["p_size"].to_numpy()
        brand = np.asarray(t["p_brand"].to_pylist(), dtype=object)
        keep = (np.isin(size, Q16_SIZES)
                & (brand != Q16_EXCL_BRAND))
        df = pd.DataFrame({
            "brand": brand[keep],
            "type": np.asarray(t["p_type"].to_pylist(),
                               dtype=object)[keep],
            "size": size[keep].astype(np.int64)})
        attr = (df["brand"] + SEP + df["type"] + SEP
                + df["size"].astype(str))
        return pa.table({
            "p_partkey": pa.array(
                t["p_partkey"].to_numpy()[keep].astype(np.int64),
                pa.int64()),
            "pattr": pa.array(attr.tolist(), pa.string())})

    part_ds = (_read(sf_dir, "part",
                     columns=["p_partkey", "p_brand", "p_type",
                              "p_size"])
               .map_batches(part_filtered, batch_format="pyarrow"))

    bad_ds = (_read(sf_dir, "supplier",
                    columns=["s_suppkey", "s_acctbal"])
              .map_batches(
                  lambda t: t.filter(
                      pc.less(t["s_acctbal"],
                              pa.scalar(float(Q16_MIN_BAL))))
                  .select(["s_suppkey"]),
                  batch_format="pyarrow"))

    li = joins.attach_dim(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]),
        part_ds, "l_partkey", "p_partkey", "pattr", how="inner")
    li = joins.membership_join(li, "l_suppkey", bad_ds, "s_suppkey",
                               mode="anti")

    _EMPTY = {"skey": "int64", "p_brand": object, "p_type": object,
              "p_size": "int64", "_bucket": "int32"}

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "skey": t["l_suppkey"].to_numpy().astype(np.int64),
            "pattr": pd.Series(t["pattr"].to_pylist(), dtype=object)})
        df = df.drop_duplicates()  # batch-local combiner
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in _EMPTY.items()})
        attrs = df["pattr"].str.split(SEP, expand=True)
        out = pd.DataFrame({
            "skey": df["skey"].to_numpy(),
            "p_brand": attrs[0].to_numpy(),
            "p_type": attrs[1].to_numpy(),
            "p_size": attrs[2].astype(np.int64).to_numpy()})
        h = pd.util.hash_pandas_object(out["skey"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["skey", "p_brand", "p_type", "p_size"])
        out = (g.groupby(["p_brand", "p_type", "p_size"],
                         as_index=False).size()
               .rename(columns={"size": "supplier_cnt"}))
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    per_bucket = (li.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_counts, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["p_brand", "p_type", "p_size"],
                          as_index=False)["supplier_cnt"].sum()
               .sort_values(["supplier_cnt", "p_brand",
                             "p_type", "p_size"],
                            ascending=[False, True, True, True])
               .reset_index(drop=True))
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


Q16_SQL = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (%s) AND p.p_brand <> '%s'
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < %d)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""" % (", ".join(str(s) for s in Q16_SIZES), Q16_EXCL_BRAND, Q16_MIN_BAL)


Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"


def q8_market_share(sf_dir):
    """TPC-H Q8 shape (national market share): per order-year, the
    permille of region-ASIA customers' ECONOMY-part revenue supplied
    by one target nation — a ratio whose numerator and denominator
    share the same join tree. The target nation derives from the
    data (nation of the lowest-suppkey supplier), so every scale
    factor is non-degenerate and the SQL oracle replays the rule.

    Scale shape: part-type filter and supplier→nation map broadcast
    (filtered-dimension / q5 contract); the customer arm is a
    SEMI-join of orders against the region's customers through
    ``joins.membership_join`` (keyset broadcast ≤ threshold, Bloom +
    exact hash-partitioned recheck above — forced-path tested);
    lineitem pre-reduces per batch to
    (okey → total_cents, nation_cents) — a lossless combiner —
    before the single orderkey-bucketed tagged exchange against
    region+window-filtered orders (okey, year). Each bucket joins
    and emits bounded per-year (num, den) partials; the permille is
    exact integer division in the one-block merge."""
    import ray

    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"])
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region_nk = set(nat.loc[nat["n_regionkey"].isin(rk),
                            "n_nationkey"].astype(int))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = dict(zip(sup["s_suppkey"].astype(int),
                   sup["s_nationkey"].astype(int)))
    target_nk = s2n[min(s2n)]  # data-derived: nation of supplier #min
    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_type"]).to_pandas()
    pkeys = set(pt.loc[pt["p_type"] == Q8_TYPE, "p_partkey"].astype(int))
    ref = ray.put((pkeys, s2n, target_nk))
    buckets = _exchange_buckets(sf_dir, "lineitem")
    lo, hi = np.datetime64(Q8_LO), np.datetime64(Q8_HI)
    COLS = ["okey", "cents", "nat_cents", "year", "_bucket", "_side"]

    region_list = sorted(region_nk)

    def cust_region(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(
            t["c_nationkey"],
            value_set=pa.array(region_list,
                               type=t.schema.field("c_nationkey").type)))
        return t.select(["c_custkey"])

    cust_keys = (_read(sf_dir, "customer",
                       columns=["c_custkey", "c_nationkey"])
                 .map_batches(cust_region, batch_format="pyarrow"))

    def od_window(t: pa.Table) -> pa.Table:
        od_np = t["o_orderdate"].to_numpy()
        keep = (od_np >= lo) & (od_np < hi)
        return t.filter(pa.array(keep))

    od_member = joins.membership_join(
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(od_window, batch_format="pyarrow"),
        "o_custkey", cust_keys, keys_col="c_custkey", mode="semi")

    def prep_li(t: pa.Table) -> pd.DataFrame:
        pkeys_, s2n_, tnk = ray.get(ref)
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy(),
                           "cents": cents})
        df = df[df["pkey"].isin(pkeys_)]
        isn = df["skey"].map(s2n_).to_numpy() == tnk
        df = df.assign(nat_cents=np.where(isn, df["cents"], 0))
        p = df.groupby("okey", as_index=False)[
            ["cents", "nat_cents"]].sum()
        p["cents"] = p["cents"].astype("int64")
        p["nat_cents"] = p["nat_cents"].astype("int64")
        p["year"] = np.int64(0)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        od = t["o_orderdate"].to_numpy()
        okey = t["o_orderkey"].to_numpy()
        yr = (od.astype("datetime64[Y]").astype(np.int64) + 1970)
        p = pd.DataFrame({"okey": okey,
                          "cents": np.zeros(len(okey), np.int64),
                          "nat_cents": np.zeros(len(okey), np.int64),
                          "year": yr.astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_share(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0][["okey", "cents", "nat_cents"]]
        od_ = g[g["_side"] == 1][["okey", "year"]]
        j = li_.merge(od_, on="okey", how="inner")
        out = j.groupby("year", as_index=False)[
            ["cents", "nat_cents"]].sum()
        return pd.DataFrame({
            "o_year": out["year"].astype("int64"),
            "nation_cents": out["nat_cents"].astype("int64"),
            "total_cents": out["cents"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_partkey",
                        "l_extendedprice", "l_discount"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od_member.map_batches(prep_od,
                                           batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_share, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("o_year", as_index=False)[
            ["nation_cents", "total_cents"]].sum()
               .sort_values("o_year").reset_index(drop=True))
        num = out["nation_cents"].to_numpy()
        den = np.maximum(out["total_cents"].to_numpy(), 1)
        out["share_permille"] = (1000 * num) // den
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


QUANTILE_PERMILLES = (500, 950, 990)


def orders_price_percentiles(sf_dir):
    """Exact order statistics without a sort: P50/P95/P99 of the
    order price by TWO-PASS RADIX SELECTION — the primitive that
    replaces `ds.sort` + offset when only ranks are wanted (a global
    sort of 100 TB is an all-to-all; this is two zero-shuffle
    histogram passes).

    Pass 1 histograms the high bits (cents >> 12 — a bounded-domain
    combiner, ≤2^14 cells at any data scale for this column; widen
    the shift for wider domains), the cumulative walk pins each
    target rank to one high-bucket + residual rank; pass 2
    histograms full values inside only the ≤3 selected buckets
    (pruned map-side) and walks to the exact value. Ranks are
    ceil(q·N) so the SQL row_number oracle replays them; ties are
    value-ties, so rank→value is engine-independent."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        hi = cents_of(t) >> RADIX_SHIFT
        out = (pd.DataFrame({"hi": hi})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["hi"] = out["hi"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []  # (q_permille, hi_bucket, residual_rank)
    for q in QUANTILE_PERMILLES:
        k = (q * n_total + 999) // 1000  # ceil(q·N)
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((q, int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for _, hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["v"] = out["v"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    out_rows = []
    for q, hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        j = int(np.searchsorted(c, resid))
        out_rows.append((q, int(vals[m][j])))
    return pd.DataFrame({
        "q_permille": pd.Series([r[0] for r in out_rows],
                                dtype="int64"),
        "cents": pd.Series([r[1] for r in out_rows], dtype="int64")})


ORDERS_PCTL_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
ks AS (
  SELECT q, (q * n.n + 999) // 1000 AS k
  FROM (VALUES (%s)) qs(q), n)
SELECT CAST(ks.q AS BIGINT) AS q_permille,
       CAST(r.v AS BIGINT) AS cents
FROM ks JOIN r ON r.rn = ks.k
ORDER BY 1
""" % "), (".join(str(q) for q in QUANTILE_PERMILLES)


WINSOR_PERMILLES = (50, 950)  # clip bounds for the robust mean


def orders_winsorized_mean(sf_dir):
    """Winsorized (clipped) robust mean of the order price — the
    outlier-resistant aggregate a billing/metrics pipeline reports
    when heavy tails would swamp a plain mean: values are CLIPPED to
    the exact [P05, P95] before averaging. Reuses the two-pass radix
    selection of ``orders_price_percentiles`` for the exact bounds
    (rank = ceil(q·N), value-ties engine-independent), then one more
    zero-shuffle pass sums the clipped values as integer cents —
    three streaming passes total, no sort, no exchange anywhere.

    Output: the bounds and mean_milli = 1000·Σclip // N, all exact
    integers; SQL replays the ranks via row_number and the clip via
    greatest/least."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        hi = cents_of(t) >> RADIX_SHIFT
        out = (pd.DataFrame({"hi": hi})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []
    for q in WINSOR_PERMILLES:
        k = (q * n_total + 999) // 1000
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    bounds = []
    for hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        bounds.append(int(vals[m][int(np.searchsorted(c, resid))]))
    lo_c, hi_c = bounds

    def clipped_sum(t: pa.Table) -> pd.DataFrame:
        v = np.clip(cents_of(t), lo_c, hi_c)
        return pd.DataFrame({"s": [int(v.sum())],
                             "n": [len(v)]}).astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        s, n = int(df["s"].sum()), int(df["n"].sum())
        return pd.DataFrame({
            "lo_cents": pd.Series([lo_c], dtype="int64"),
            "hi_cents": pd.Series([hi_c], dtype="int64"),
            "n": pd.Series([n], dtype="int64"),
            "mean_milli": pd.Series([(s * 1000) // n],
                                    dtype="int64")})

    return _merge_partials(
        ds.map_batches(clipped_sum, batch_format="pyarrow"), final)


ORDERS_WINSOR_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
b AS (
  SELECT min(v) FILTER (rn = (%d * n.n + 999) // 1000) AS lo,
         min(v) FILTER (rn = (%d * n.n + 999) // 1000) AS hi
  FROM r, n GROUP BY n.n)
SELECT CAST(b.lo AS BIGINT) AS lo_cents,
       CAST(b.hi AS BIGINT) AS hi_cents,
       CAST(n.n AS BIGINT) AS n,
       CAST(sum(greatest(b.lo, least(b.hi, c.v))) * 1000 // n.n
            AS BIGINT) AS mean_milli
FROM c, b, n GROUP BY b.lo, b.hi, n.n
""" % WINSOR_PERMILLES


def key_skew_profile(sf_dir):
    """Partition-skew diagnosis (the pre-shuffle audit that decides
    whether a key needs salting BEFORE a 100-TB groupby is launched):
    the distribution of per-key row counts, reported as a log₂-bucket
    histogram — bucket k holds keys with 2^k ≤ count < 2^(k+1), with
    key- and row-mass per bucket. A heavy tail at high buckets means
    hot keys (salt them, q.v. salted_source_counts); a flat profile
    licenses plain hash partitioning.

    Scale shape: per-batch (key → count) partials (lossless combiner)
    feed ONE key-bucketed exchange; each bucket finalizes its keys'
    counts, takes the frexp exponent vectorized (exact — no float
    log₂ at engine boundaries; SQL replays via the binary-string
    length), and emits bounded ≤64-cell histogram partials; one merge
    block sums."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy()})
             .groupby("u", as_index=False).size()
             .rename(columns={"size": "cnt"}))
        p["cnt"] = p["cnt"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby("u", as_index=False)["cnt"].sum()
             ["cnt"].to_numpy(np.int64))
        lb = np.frexp(c.astype(np.float64))[1] - 1  # floor(log2), exact
        out = (pd.DataFrame({"log2_bucket": lb, "cnt": c})
               .groupby("log2_bucket", as_index=False)
               .agg(n_keys=("cnt", "size"), n_rows=("cnt", "sum")))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("log2_bucket", as_index=False)
               [["n_keys", "n_rows"]].sum()
               .sort_values("log2_bucket").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, final)


KEY_SKEW_SQL = """
WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
SELECT CAST(length(format('{:b}', c)) - 1 AS BIGINT) AS log2_bucket,
       count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows
FROM c GROUP BY 1 ORDER BY 1
"""


def orders_benford_audit(sf_dir):
    """Benford's-law first-digit audit of the order totals — the
    fraud/data-quality screen an ingest pipeline runs on any
    money-like column (fabricated values flatten the leading-digit
    curve; Benford '38, Nigrini '96 — public literature). Reports
    per leading digit the count and the exact milli-share, plus the
    Benford expectation in milli (floor(1000·log10(1+1/d)) — a
    CONSTANT table, so no float computed from data crosses engines).

    Scale shape: the 9-cell digit histogram is a bounded-domain
    per-batch combiner — zero shuffle at any scale; the leading
    digit comes off the integer cents' decimal string in both
    engines."""
    benford_milli = {d: int(np.floor(1000 * np.log10(1 + 1 / d)))
                     for d in range(1, 10)}

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        first = (pd.Series(cents).astype(str).str[0]
                 .astype(np.int64))
        out = (pd.DataFrame({"digit": first})
               .groupby("digit", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("digit", as_index=False)["n"].sum()
               .sort_values("digit").reset_index(drop=True))
        total = int(out["n"].sum())
        out["share_milli"] = (out["n"] * 1000) // total
        out["benford_milli"] = out["digit"].map(benford_milli)
        return out.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_BENFORD_SQL = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
h AS (SELECT digit, count(*) AS n FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
SELECT h.digit, CAST(h.n AS BIGINT) AS n,
       CAST(h.n * 1000 // t.total AS BIGINT) AS share_milli,
       CAST(floor(1000 * log10(1 + 1.0 / h.digit)) AS BIGINT)
         AS benford_milli
FROM h, t ORDER BY h.digit
"""


def orderkey_join_stats(sf_dir):
    """EXACT join-cardinality statistics for lineitem ⋈ orders on
    orderkey — the question every optimizer answers with a sketch,
    answered exactly in one pass: |join| = Σ_k cnt_li(k)·cnt_od(k),
    plus distinct keys on each side and in the intersection. This is
    the pre-flight a 100-TB join runs to choose broadcast vs shuffle
    vs salt (pairs with key_skew_profile).

    Scale shape: per-batch (key, side) → count partials (lossless
    combiner) ride ONE key-bucketed tagged exchange; each bucket
    finalizes both sides' counts, multiplies vectorized, and emits a
    single 5-integer partial row; one merge block sums. Nothing but
    narrow count rows ever crosses the wire."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["k", "n", "_bucket", "_side"]

    def prep(col):
        def f(t: pa.Table) -> pd.DataFrame:
            p = (pd.DataFrame({"k": t[col].to_numpy()})
                 .groupby("k", as_index=False).size()
                 .rename(columns={"size": "n"}))
            p["n"] = p["n"].astype("int64")
            return _tag_bucket(p, buckets, 0 if col[0] == "l" else 1,
                               COLS, key="k")
        return f

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0].groupby("k", as_index=False)
               ["n"].sum())
        od_ = (g[g["_side"] == 1].groupby("k", as_index=False)
               ["n"].sum())
        j = li_.merge(od_, on="k", how="outer",
                      suffixes=("_l", "_o"))
        # outer-merge NaNs upcast to float64 — restore exact int64
        # before any product (the >2^53 exactness discipline)
        j["n_l"] = j["n_l"].fillna(0).astype("int64")
        j["n_o"] = j["n_o"].fillna(0).astype("int64")
        both = (j["n_l"] > 0) & (j["n_o"] > 0)
        return pd.DataFrame({
            "join_rows": [int((j["n_l"] * j["n_o"]).sum())],
            "li_keys": [int((j["n_l"] > 0).sum())],
            "od_keys": [int((j["n_o"] > 0).sum())],
            "both_keys": [int(both.sum())],
            "max_key_rows": [int((j["n_l"] * j["n_o"]).max())
                             if len(j) else 0]}).astype("int64")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    od = _read(sf_dir, "orders", columns=["o_orderkey"])
    tagged = (li.map_batches(prep("l_orderkey"),
                             batch_format="pyarrow")
              .union(od.map_batches(prep("o_orderkey"),
                                    batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "join_rows": [int(df["join_rows"].sum())],
            "li_keys": [int(df["li_keys"].sum())],
            "od_keys": [int(df["od_keys"].sum())],
            "both_keys": [int(df["both_keys"].sum())],
            "max_key_rows": [int(df["max_key_rows"].max())
                             if len(df) else 0]}).astype("int64")

    return _merge_partials(per_bucket, final)


JOIN_STATS_SQL = """
WITH l AS (SELECT l_orderkey AS k, count(*) AS n
           FROM lineitem GROUP BY 1),
o AS (SELECT o_orderkey AS k, count(*) AS n
      FROM orders GROUP BY 1),
j AS (SELECT coalesce(l.k, o.k) AS k,
             coalesce(l.n, 0) AS nl, coalesce(o.n, 0) AS no
      FROM l FULL OUTER JOIN o ON l.k = o.k)
SELECT CAST(sum(nl * no) AS BIGINT) AS join_rows,
       CAST(count(*) FILTER (nl > 0) AS BIGINT) AS li_keys,
       CAST(count(*) FILTER (no > 0) AS BIGINT) AS od_keys,
       CAST(count(*) FILTER (nl > 0 AND no > 0) AS BIGINT)
         AS both_keys,
       CAST(max(nl * no) AS BIGINT) AS max_key_rows
FROM j
"""


def brand_revenue_hhi(sf_dir):
    """Market-concentration audit: the Herfindahl–Hirschman index of
    brand revenue shares in exact integer units — HHI_micro =
    (10⁶·Σc_b²) // (Σc_b)², the regulator's concentration screen and
    the curation pipeline's source-dominance check (one brand owning
    the corpus is a sampling hazard; pairs with source_lang_gini,
    which is the same rational family as impurity rather than
    concentration). Revenue in per-row-rounded integer cents — the
    q1 discipline — so the squared sums replay exactly.

    Scale shape: brand revenue is a bounded-domain per-batch combiner
    (the brand dimension rides a bucket_join in brand_revenue; here
    only (brand, cents) partials move), the squared-share arithmetic
    happens in the one coalesced merge block — zero data shuffle."""
    from ...stages.joins import bucket_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "cents": c})

    joined = bucket_join(li.map_batches(cents, batch_format="pyarrow"),
                         part, left_on="l_partkey",
                         right_on="p_partkey")

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "brand": t["p_brand"].to_pandas().astype(object),
            "cents": t["cents"].to_numpy()})
        out = df.groupby("brand", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby("brand", as_index=False)["cents"].sum()
        total = int(b["cents"].sum())
        sumsq = int((b["cents"].astype(object) ** 2).sum())
        hhi = (1_000_000 * sumsq) // (total * total)
        top = b.sort_values(["cents", "brand"],
                            ascending=[False, True]).iloc[0]
        return pd.DataFrame({
            "n_brands": pd.Series([len(b)], dtype="int64"),
            "hhi_micro": pd.Series([hhi], dtype="int64"),
            "top_brand": pd.Series([top["brand"]], dtype=object),
            "top_share_milli": pd.Series(
                [(int(top["cents"]) * 1000) // total], dtype="int64")})

    return _merge_partials(
        joined.map_batches(partial, batch_format="pyarrow"), final)


BRAND_HHI_SQL = """
WITH b AS (
  SELECT p_brand AS brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT)
               AS sumsq,
             count(*) AS n_brands
      FROM b),
top AS (SELECT brand, cents FROM b
        ORDER BY cents DESC, brand LIMIT 1)
SELECT t.n_brands,
       CAST(1000000 * t.sumsq
            // (CAST(t.total AS HUGEINT) * t.total) AS BIGINT)
         AS hhi_micro,
       top.brand AS top_brand,
       CAST(top.cents * 1000 // t.total AS BIGINT) AS top_share_milli
FROM t, top
"""


ANALYZE_COLS = ("o_orderkey", "o_custkey", "o_totalprice",
                "o_orderdate")


def orders_analyze_stats(sf_dir):
    """ANALYZE TABLE — the catalog-statistics pass every optimizer
    (and every zone-map builder) runs: per numeric/date column, the
    EXACT distinct-value count, null count, min and max, normalized
    to int64 (cents for money, µs for dates) so one uniform schema
    carries every column.

    Scale shape: min/max/nulls are per-batch combiners (exact, zero
    shuffle); exact NDV is the one statistic that needs an exchange,
    and ALL columns share a single (col, value)-bucketed exchange of
    batch-local DISTINCT pairs (the dedup-combiner discipline:
    batch-distinct bounds the exchange by distinct-per-batch, and
    per-bucket nunique is additive because a (col, value) pair lives
    in exactly one bucket). Compare approximate twins: hll_user
    registers trade this exactness for fixed memory at 10¹² keys."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def to_i64(t: pa.Table, col: str) -> np.ndarray:
        a = t[col]
        if pa.types.is_timestamp(a.type):
            return a.to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
        if pa.types.is_floating(a.type):
            return pc.cast(pc.round(pc.multiply(a, pa.scalar(100.0)),
                                    round_mode="half_towards_infinity"),
                           pa.int64()).to_numpy()
        return a.to_numpy().astype(np.int64)

    def prep_pairs(t: pa.Table) -> pd.DataFrame:
        outs = []
        for ci, col in enumerate(ANALYZE_COLS):
            v = np.unique(to_i64(t, col))
            outs.append(pd.DataFrame({
                "ci": np.full(len(v), ci, np.int64), "v": v}))
        p = pd.concat(outs, ignore_index=True)
        h = pd.util.hash_pandas_object(
            p["ci"] * np.int64(1_000_003) + p["v"],
            index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_ndv(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates(["ci", "v"])
               .groupby("ci", as_index=False).size()
               .rename(columns={"size": "ndv"}))
        return out.astype("int64")

    def prep_minmax(t: pa.Table) -> pd.DataFrame:
        rows = []
        for ci, col in enumerate(ANALYZE_COLS):
            nulls = int(pc.sum(pc.is_null(t[col])).as_py() or 0)
            v = to_i64(t.filter(pc.is_valid(t[col])), col) \
                if nulls else to_i64(t, col)
            rows.append((ci, nulls,
                         int(v.min()) if len(v) else np.iinfo(np.int64).max,
                         int(v.max()) if len(v) else np.iinfo(np.int64).min))
        return pd.DataFrame(rows, columns=["ci", "nulls", "mn", "mx"]) \
            .astype("int64")

    ds = _read(sf_dir, "orders", columns=list(ANALYZE_COLS))
    ndv = (ds.map_batches(prep_pairs, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(bucket_ndv, batch_format="pandas")
           .to_pandas()
           .groupby("ci", as_index=False)["ndv"].sum())
    mm = (ds.map_batches(prep_minmax, batch_format="pyarrow")
          .to_pandas()
          .groupby("ci", as_index=False)
          .agg(nulls=("nulls", "sum"), mn=("mn", "min"),
               mx=("mx", "max")))
    out = mm.merge(ndv, on="ci").sort_values("ci")
    return pd.DataFrame({
        "column": pd.Series([ANALYZE_COLS[int(i)]
                             for i in out["ci"]], dtype=object),
        "ndv": out["ndv"].astype("int64").reset_index(drop=True),
        "nulls": out["nulls"].astype("int64").reset_index(drop=True),
        "min_i64": out["mn"].astype("int64").reset_index(drop=True),
        "max_i64": out["mx"].astype("int64").reset_index(drop=True)})


ORDERS_ANALYZE_SQL = """
WITH n AS (
  SELECT 'o_orderkey' AS col, 0 AS ci,
         count(DISTINCT o_orderkey) AS ndv,
         count(*) - count(o_orderkey) AS nulls,
         CAST(min(o_orderkey) AS BIGINT) AS min_i64,
         CAST(max(o_orderkey) AS BIGINT) AS max_i64
  FROM orders
  UNION ALL
  SELECT 'o_custkey', 1, count(DISTINCT o_custkey),
         count(*) - count(o_custkey),
         CAST(min(o_custkey) AS BIGINT),
         CAST(max(o_custkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', 2,
         count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)),
         count(*) - count(o_totalprice),
         CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT),
         CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate', 3, count(DISTINCT o_orderdate),
         count(*) - count(o_orderdate),
         CAST(epoch_us(min(o_orderdate)) AS BIGINT),
         CAST(epoch_us(max(o_orderdate)) AS BIGINT)
  FROM orders)
SELECT col AS "column", CAST(ndv AS BIGINT) AS ndv,
       CAST(nulls AS BIGINT) AS nulls, min_i64, max_i64
FROM n ORDER BY ci
"""


def q20_excess_suppliers(sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped quantity of some widget part EXCEEDS half that part's
    stock — the doubly-nested EXISTS (partsupp ⋈ agg-subquery on
    lineitem) restated over the available tables: stock derives
    deterministically from the part dimension (avail = (p_size+5)·4,
    pure arithmetic both engines replay), and the output ranks
    suppliers by how many parts they overshipped. Completes the
    TPC-H sweep (q9/q12 live as brand_revenue/priority_lineitems).

    Scale shape: lineitem pre-reduces to (pkey, skey) → Σqty partials
    (lossless combiner); the widget-filtered part arm rides the SAME
    pkey-bucketed tagged exchange (the q14 discipline — every part
    matters, so no broadcast); each bucket finalizes sums, applies
    the exact integer 2·Σqty > avail predicate and emits (skey,
    n_excess) partials — additive because a (pkey, skey) pair lives
    in exactly one bucket; names resolve for EXACTLY the result's
    suppkeys via ``joins.resolve_keys`` (the key set is the output
    itself — never the whole dimension)."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["pkey", "skey", "q", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy(),
                           "q": qty})
        p = df.groupby(["pkey", "skey"], as_index=False)["q"].sum()
        p["q"] = p["q"].astype("int64")
        return _tag_bucket(p, buckets, 0, COLS, key="pkey")

    def prep_part(t: pa.Table) -> pd.DataFrame:
        m = pc.match_substring(t["p_name"], "widget").to_numpy(
            zero_copy_only=False)
        keys = t["p_partkey"].to_numpy()[m]
        size = t["p_size"].to_numpy()[m].astype(np.int64)
        p = pd.DataFrame({"pkey": keys,
                          "skey": np.zeros(len(keys), np.int64),
                          "q": (size + 5) * 4})  # q carries avail
        return _tag_bucket(p, buckets, 1, COLS, key="pkey")

    def bucket_excess(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0]
               .groupby(["pkey", "skey"], as_index=False)["q"].sum())
        pa_ = g[g["_side"] == 1][["pkey", "q"]] \
            .rename(columns={"q": "avail"})
        j = li_.merge(pa_, on="pkey", how="inner")
        j = j[2 * j["q"].to_numpy() > j["avail"].to_numpy()]
        out = (j.groupby("skey", as_index=False)
               .agg(excess_parts=("pkey", "nunique")))
        return out.astype("int64")

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_name", "p_size"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(part.map_batches(prep_part,
                                      batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_excess, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("skey", as_index=False)
               ["excess_parts"].sum()
               .sort_values(["excess_parts", "skey"],
                            ascending=[False, True])
               .reset_index(drop=True))
        return out.astype("int64")

    out = _merge_partials(per_bucket, final).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", out["skey"], "s_name")
    return pd.DataFrame({
        "s_suppkey": out["skey"].astype("int64"),
        "s_name": out["skey"].map(names).astype(object),
        "excess_parts": out["excess_parts"].astype("int64")})


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
pa AS (
  SELECT p_partkey, (p_size + 5) * 4 AS avail
  FROM part WHERE p_name LIKE '%widget%'),
x AS (
  SELECT sk, count(DISTINCT pk) AS excess_parts
  FROM ps JOIN pa ON pk = p_partkey
  WHERE 2 * q > avail GROUP BY 1)
SELECT s.s_suppkey, s.s_name,
       CAST(x.excess_parts AS BIGINT) AS excess_parts
FROM x JOIN supplier s ON s.s_suppkey = x.sk
ORDER BY excess_parts DESC, s.s_suppkey
"""


def audience_overlap_matrix(sf_dir):
    """Audience overlap — |users(A) ∩ users(B)| for every event-type
    pair, the segmentation cross-tab ad/analytics systems compute
    with per-segment bitmap indexes: a user's type SET is one ≤2^5
    mask, the mask HISTOGRAM is a bounded sufficient statistic, and
    every pairwise intersection reads off it by popcount arithmetic —
    no per-pair distinct-count pass, no |types|² scans.

    Scale shape: batch-local (user, bit) dedup+sum partials (the
    events_daily_type_mask OR-combiner, without the day axis) feed
    ONE user-bucketed exchange; buckets OR partial masks and emit the
    bounded ≤2^|types| histogram; the merge derives all pairs from
    the histogram in one vectorized pass. SQL replays via per-user
    bool flags and sum-of-products."""
    buckets = _exchange_buckets(sf_dir, "events")
    nbits = len(EVENT_TYPE_BITS)
    types = sorted(EVENT_TYPE_BITS)  # bit i = types[i] (1,2,4,8,16)

    def prep(t: pa.Table) -> pd.DataFrame:
        bit = (pd.Series(t["event_type"].to_pylist())
               .map(EVENT_TYPE_BITS).to_numpy(np.int64))
        df = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                            "bit": bit}).drop_duplicates())
        p = df.groupby("u", as_index=False)["bit"].sum()
        p = p.rename(columns={"bit": "mask"})
        p["mask"] = p["mask"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        m = g["mask"].to_numpy()
        bits = pd.DataFrame({"u": g["u"].to_numpy()})
        for i in range(nbits):
            bits["b%d" % i] = (m >> i) & 1
        mx = bits.groupby("u", as_index=False).max()
        mask = np.zeros(len(mx), np.int64)
        for i in range(nbits):
            mask += mx["b%d" % i].to_numpy(np.int64) << i
        out = (pd.DataFrame({"mask": mask})
               .groupby("mask", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("mask", as_index=False)["n"].sum()
        masks = h["mask"].to_numpy(np.int64)
        counts = h["n"].to_numpy(np.int64)
        rows = []
        for i, ta in enumerate(types):
            for k, tb in enumerate(types):
                if i > k:
                    continue
                sel = ((masks >> i) & 1) & ((masks >> k) & 1)
                rows.append((ta, tb, int(counts[sel == 1].sum())))
        out = pd.DataFrame(rows, columns=["type_a", "type_b",
                                          "n_users"])
        out["type_a"] = out["type_a"].astype(object)
        out["type_b"] = out["type_b"].astype(object)
        out["n_users"] = out["n_users"].astype("int64")
        return out.sort_values(["type_a", "type_b"]) \
            .reset_index(drop=True)

    return _merge_partials(per_bucket, final)


AUDIENCE_OVERLAP_SQL = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchase,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           AS signup,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_
  FROM events GROUP BY 1),
p AS (
  SELECT a.type_a, b.type_b FROM
    (VALUES ('click'), ('error'), ('purchase'), ('signup'),
            ('view')) a(type_a),
    (VALUES ('click'), ('error'), ('purchase'), ('signup'),
            ('view')) b(type_b)
  WHERE a.type_a <= b.type_b)
SELECT p.type_a, p.type_b,
       CAST(sum((CASE p.type_a WHEN 'click' THEN click
                 WHEN 'error' THEN error WHEN 'purchase' THEN purchase
                 WHEN 'signup' THEN signup ELSE view_ END)
                * (CASE p.type_b WHEN 'click' THEN click
                   WHEN 'error' THEN error
                   WHEN 'purchase' THEN purchase
                   WHEN 'signup' THEN signup ELSE view_ END))
            AS BIGINT) AS n_users
FROM f, p GROUP BY 1, 2 ORDER BY 1, 2
"""


TREND_EPOCH_H = 473_352  # 2024-01-01 UTC in epoch-hours — x origin


def events_value_trend(sf_dir):
    """Grouped OLS trend via sufficient statistics — per event type,
    the least-squares slope of value over time from the classic
    closed form slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), computed
    in ONE streaming pass: the five sufficient statistics (n, Σx,
    Σy, Σxy, Σx²) are per-batch integer partials (x = seconds since
    a fixed epoch, y = milli-value — every term exact), and the
    numerator/denominator finalize as arbitrary-precision Python
    ints in the bounded merge (HUGEINT in the oracle). The result
    IS the (num, den) integer pair — no float division, no
    floor-vs-truncate sign hazard crosses engines; consumers divide.

    This is the trend-detection primitive every metrics pipeline
    wants per segment, in the same one-pass family as
    source_embedding_coherence (variance identity) and the IVM
    Δ-law: aggregates maintained from mergeable statistics."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        # HOUR ticks: x ≤ ~10³ keeps n²·Var(x) (the denominator)
        # inside int64 through sf0.1 and beyond — the tick unit is
        # the overflow knob (seconds blow int64 at n ≈ 2·10⁴)
        x = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 3_600_000_000) - TREND_EPOCH_H
        y = pc.cast(pc.round(pc.multiply(t["value"],
                                         pa.scalar(1000.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(object),
            "n": np.ones(len(x), np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        out = df.groupby("event_type", as_index=False).sum()
        out["event_type"] = out["event_type"].astype(object)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).sum()
        rows = []
        for r in g.itertuples(index=False):
            n, sx, sy = int(r.n), int(r.sx), int(r.sy)
            num = n * int(r.sxy) - sx * sy
            den = n * int(r.sxx) - sx * sx
            rows.append((r.event_type, n, num, den))
        out = pd.DataFrame(rows, columns=["event_type", "n",
                                          "slope_num", "slope_den"])
        out = out.sort_values("event_type").reset_index(drop=True)
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n", "slope_num", "slope_den"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


EVENTS_TREND_SQL = """
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 - %d AS x,
         CAST(round(value * 1000) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM e GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM s ORDER BY event_type
""" % TREND_EPOCH_H


WM_DELAY_MOD = 600            # synthetic network delay: 0..599 s
WM_ALLOWED_US = 300_000_000   # watermark lag: 5 minutes
WM_PANE_US = 600_000_000      # 10-minute arrival panes


def events_late_arrivals(sf_dir):
    """Watermark / late-data accounting — the correctness ledger of
    every streaming engine (Flink/Beam allowed-lateness semantics):
    events ARRIVE out of order (arrival = event time + a seedless
    md5-derived 0..599 s delay, deterministic in both engines), the
    watermark trails the maximum event time SEEN so far by 5 minutes,
    and an event is LATE iff its event time is below the watermark at
    its arrival. Reports per type: events, late count, worst lateness.

    Scale shape: the watermark is a PREFIX MAX over arrival order —
    decomposable exactly like a running total: pass 1 reduces each
    10-minute arrival pane to its max event time (bounded-domain
    per-batch combiner, zero shuffle) and the coalesced merge derives
    each pane's EXCLUSIVE carry (max over all earlier panes),
    broadcast by closure; pass 2 is ONE pane-bucketed exchange whose
    buckets sort their panes locally, take the within-pane exclusive
    cummax, splice the carry, flag lateness vectorized and emit
    bounded per-type partials. No global sort ever happens — the
    pane decomposition IS the distributed watermark."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")
    SENT = np.int64(np.iinfo(np.int64).min)

    def base(t: pa.Table) -> pd.DataFrame:
        ids = t["event_id"].to_numpy()
        delay = np.array(
            [int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8],
                 16) % WM_DELAY_MOD for i in ids],
            dtype=np.int64) * 1_000_000
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pd.DataFrame({
            "eid": ids, "t": ts, "a": ts + delay,
            "et": t["event_type"].to_pandas().astype(object)})

    def pane_max(t: pa.Table) -> pd.DataFrame:
        df = base(t)
        df["pane"] = df["a"].to_numpy() // WM_PANE_US
        out = df.groupby("pane", as_index=False)["t"].max()
        out["pane"] = out["pane"].astype("int64")
        out["t"] = out["t"].astype("int64")
        return out

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type"])
    pm = (ev.map_batches(pane_max, batch_format="pyarrow")
          .to_pandas()
          .groupby("pane", as_index=False)["t"].max()
          .sort_values("pane").reset_index(drop=True))
    # exclusive carry: max event time of all STRICTLY earlier panes
    run = pm["t"].cummax().shift(1)
    carry = {int(p): (SENT if pd.isna(c) else np.int64(c))
             for p, c in zip(pm["pane"], run)}

    def prep(t: pa.Table) -> pd.DataFrame:
        df = base(t)
        df["pane"] = df["a"].to_numpy() // WM_PANE_US
        h = pd.util.hash_pandas_object(df["pane"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_flags(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["pane", "a", "eid"], kind="mergesort")
             .reset_index(drop=True))
        run = g.groupby("pane")["t"].cummax()
        prev = run.groupby(g["pane"]).shift(1)
        pane_carry = g["pane"].map(carry).astype("int64")
        t = g["t"].to_numpy(np.int64)
        seen = np.maximum(prev.fillna(SENT).to_numpy(np.int64),
                          pane_carry.to_numpy(np.int64))
        late = (seen != SENT) & (t < seen - WM_ALLOWED_US)
        late_s = np.where(late, (seen - WM_ALLOWED_US - t)
                          // 1_000_000, 0)
        out = pd.DataFrame({"et": g["et"], "late": late.astype(np.int64),
                            "late_s": late_s.astype(np.int64)})
        p = out.groupby("et", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_late_s=("late_s", "max"))
        p["et"] = p["et"].astype(object)
        for c in ("n_events", "n_late", "max_late_s"):
            p[c] = p[c].astype("int64")
        return p

    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_flags, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("et", as_index=False)
               .agg(n_events=("n_events", "sum"),
                    n_late=("n_late", "sum"),
                    max_late_s=("max_late_s", "max"))
               .rename(columns={"et": "event_type"})
               .sort_values("event_type").reset_index(drop=True))
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n_events", "n_late", "max_late_s"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


LATE_ARRIVALS_SQL = """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS t,
         epoch_us(ts)
           + CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                      1, 8) AS BIGINT) %% %d
                  AS BIGINT) * 1000000 AS a
  FROM events),
w AS (
  SELECT event_type, t,
         max(t) OVER (ORDER BY a, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS seen
  FROM e)
SELECT event_type, count(*) AS n_events,
       CAST(count(*) FILTER (seen IS NOT NULL
                             AND t < seen - %d) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN seen IS NOT NULL
                               AND t < seen - %d
                              THEN (seen - %d - t) // 1000000 END),
                     0) AS BIGINT) AS max_late_s
FROM w GROUP BY 1 ORDER BY 1
""" % (WM_DELAY_MOD, WM_ALLOWED_US, WM_ALLOWED_US, WM_ALLOWED_US)


SLIDING_WINDOW_HOURS = 6


def events_sliding_dau(sf_dir):
    """EXACT sliding-window distinct users — active users over the
    trailing 6 hours, reported hourly (the ops dashboard's DAU/MAU
    shape at window grain). Distinct counts are NOT additive across
    subwindows (per-hour distincts cannot be summed), which is what
    makes this a real operator: a user-hour contributes to exactly 6
    overlapping windows, so the expansion is BOUNDED (6×) and
    deduplication per (user, window) restores exactness.

    Scale shape: batch-local distinct (user, hour) pairs (a lossless
    combiner for this expansion) ride ONE user-bucketed exchange;
    each bucket dedups its users' hours exactly (a user lives in one
    bucket), expands hour→6 windows vectorized (np.repeat/tile),
    dedups (user, window) and emits bounded (window, count) partials
    — additive across buckets; one merge block sums over the ~10³
    window cells. SQL replays via the same 6-way range expansion."""
    buckets = _exchange_buckets(sf_dir, "events")
    W = SLIDING_WINDOW_HOURS

    def prep(t: pa.Table) -> pd.DataFrame:
        h = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 3_600_000_000)
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(), "h": h})
             .drop_duplicates())
        hh = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (hh % np.uint64(buckets)).astype("int32")
        return p.reset_index(drop=True)

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "h"])
        u = np.repeat(g["u"].to_numpy(np.int64), W)
        w = (np.repeat(g["h"].to_numpy(np.int64), W)
             + np.tile(np.arange(W, dtype=np.int64), len(g)))
        uw = pd.DataFrame({"u": u, "w": w}).drop_duplicates()
        out = (uw.groupby("w", as_index=False).size()
               .rename(columns={"size": "active_users"}))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_count, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("w", as_index=False)["active_users"].sum()
               .rename(columns={"w": "window_end_hour"})
               .sort_values("window_end_hour")
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, final)


SLIDING_DAU_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 3600000000 AS h
  FROM events),
uw AS (
  SELECT DISTINCT user_id, h + k.k AS w
  FROM uh, range(%d) k(k))
SELECT CAST(w AS BIGINT) AS window_end_hour,
       count(*) AS active_users
FROM uw GROUP BY 1 ORDER BY 1
""" % SLIDING_WINDOW_HOURS


def region_revenue_share(sf_dir):
    """Hierarchical ratio-to-parent rollup (the OLAP share-of-segment
    report): revenue per supplier nation with each nation's exact
    permille share OF ITS REGION — the two-level rollup where the
    child metric divides by the parent aggregate. Exercises the full
    region→nation→supplier dimension chain over the fact table.

    Scale shape: region/nation are genuinely bounded (25/5 rows) and
    broadcast as dicts; the supplier arm goes through
    ``joins.attach_dim`` (broadcast ≤ threshold, bucketed hash join
    at 10⁹ suppliers — forced-path tested); fact batches emit
    bounded (nation) cents partials — a lossless combiner — and the
    parent totals + shares derive in the one coalesced merge block.
    Exact integer permille."""
    nat = {int(r["n_nationkey"]): (r["n_name"], int(r["n_regionkey"]))
           for r in _read(sf_dir, "nation").take_all()}
    reg = {int(r["r_regionkey"]): r["r_name"]
           for r in _read(sf_dir, "region").take_all()}
    nk2name = {nk: name for nk, (name, _) in nat.items()}
    n2r = {name: reg[rk] for name, rk in nat.values()}

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({
            "nation": pd.Series([nk2name[int(k)] for k in
                                 t["snat"].to_pylist()],
                                dtype=object),
            "cents": cents})
        out = df.groupby("nation", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    li = joins.attach_dim(
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice"]),
        _read(sf_dir, "supplier",
              columns=["s_suppkey", "s_nationkey"]),
        "l_suppkey", "s_suppkey", "s_nationkey", out_col="snat",
        how="inner")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("nation", as_index=False)["cents"].sum()
        n["region"] = n["nation"].map(n2r).astype(object)
        rc = n.groupby("region")["cents"].transform("sum")
        n["share_permille"] = (n["cents"] * 1000) // rc
        out = (n[["region", "nation", "cents", "share_permille"]]
               .sort_values(["region", "nation"])
               .reset_index(drop=True))
        out["cents"] = out["cents"].astype("int64")
        out["share_permille"] = out["share_permille"].astype("int64")
        return out

    return _merge_partials(
        li.map_batches(partial, batch_format="pyarrow"), final)


REGION_SHARE_SQL = """
WITH nrev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2),
rr AS (SELECT region, CAST(sum(cents) AS BIGINT) AS rc
       FROM nrev GROUP BY 1)
SELECT nrev.region, nrev.nation, nrev.cents,
       CAST(nrev.cents * 1000 // rr.rc AS BIGINT) AS share_permille
FROM nrev JOIN rr USING (region)
ORDER BY 1, 2
"""


def orders_decile_report(sf_dir):
    """Exact equi-depth histogram — decile boundaries plus per-decile
    row counts and cents mass over the order price: the statistic a
    cost-based optimizer keeps per column (equi-depth beats equi-width
    under skew) and a billing pipeline reports as the decile table.
    Boundaries are TRUE order statistics (rank ceil(d·N/10) via the
    two-pass radix selection of orders_price_percentiles — no sort),
    and a third zero-shuffle pass assigns each row to its decile by
    searchsorted against the broadcast 9-edge array and emits bounded
    10-cell (count, cents) partials. Three streaming passes total.

    Decile rule pinned for both engines: decile d (1..10) holds rows
    with v ≤ edge_d and v > edge_{d-1}, edges being the ceil-rank
    values — SQL replays via the same edge values from row_number."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        out = (pd.DataFrame({"hi": cents_of(t) >> RADIX_SHIFT})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []
    for d in range(1, 10):  # the 9 interior edges
        k = (d * n_total + 9) // 10  # ceil(d·N/10)
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    edges = []
    for hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        edges.append(int(vals[m][int(np.searchsorted(c, resid))]))
    edges_arr = np.asarray(edges, dtype=np.int64)

    def decile_partial(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        # decile = 1 + #edges strictly below v  (v ≤ edge_d rule)
        d = 1 + np.searchsorted(edges_arr, v, side="left")
        # rows equal to an edge belong to that edge's decile
        out = (pd.DataFrame({"decile": d, "n": 1, "cents": v})
               .groupby("decile", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("decile", as_index=False)
             [["n", "cents"]].sum()
             .sort_values("decile").reset_index(drop=True))
        hi_edges = edges + [None]
        g["hi_cents"] = [hi_edges[int(d) - 1] if int(d) <= 9 else -1
                         for d in g["decile"]]
        g.loc[g["decile"] == 10, "hi_cents"] = -1  # open top bucket
        for c in ("decile", "n", "cents", "hi_cents"):
            g[c] = g[c].astype("int64")
        return g[["decile", "hi_cents", "n", "cents"]]

    return _merge_partials(
        ds.map_batches(decile_partial, batch_format="pyarrow"), final)


ORDERS_DECILE_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
e AS (
  SELECT d, min(r.v) AS edge
  FROM generate_series(1, 9) g(d), n, r
  WHERE r.rn = (g.d * n.n + 9) // 10
  GROUP BY d),
a AS (
  SELECT c.v,
         1 + (SELECT count(*) FROM e WHERE e.edge < c.v) AS decile
  FROM c)
SELECT decile,
       CAST(coalesce((SELECT edge FROM e WHERE e.d = a.decile), -1)
            AS BIGINT) AS hi_cents,
       count(*) AS n, CAST(sum(v) AS BIGINT) AS cents
FROM a GROUP BY decile ORDER BY decile
"""


KANON_K, KANON_BAND = 5, 100


def doc_k_anonymity(sf_dir):
    """k-anonymity audit — the data-governance screen a release
    pipeline runs before publishing: rows whose QUASI-IDENTIFIER
    tuple (source, lang, length band) is shared by fewer than k
    records are re-identifiable (Sweeney '02 — public literature).
    Reports the group census: total groups, groups below k, rows at
    risk, and the smallest group size.

    Scale shape: the QI space is bounded (sources × langs × bands),
    so per-batch (QI → count) partials are a lossless combiner and
    the census finalizes in the one coalesced merge block — zero
    shuffle. With an unbounded QI (e.g. raw zip×birthdate) the same
    op rides one QI-bucketed exchange; the census stays bounded."""
    ds = _read(sf_dir, "documents",
               columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "lang": t["lang"].to_pandas().astype(object),
            "band": t["n_chars"].to_numpy() // KANON_BAND})
        out = (df.groupby(["source", "lang", "band"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["band"] = out["band"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "lang", "band"], as_index=False)
             ["n"].sum())
        small = g[g["n"] < KANON_K]
        return pd.DataFrame({
            "n_groups": pd.Series([len(g)], dtype="int64"),
            "small_groups": pd.Series([len(small)], dtype="int64"),
            "rows_at_risk": pd.Series([int(small["n"].sum())],
                                      dtype="int64"),
            "min_group": pd.Series([int(g["n"].min())],
                                   dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


KANON_SQL = """
WITH g AS (
  SELECT source, lang, n_chars // %d AS band, count(*) AS n
  FROM documents GROUP BY 1, 2, 3)
SELECT count(*) AS n_groups,
       CAST(count(*) FILTER (n < %d) AS BIGINT) AS small_groups,
       CAST(coalesce(sum(n) FILTER (n < %d), 0) AS BIGINT)
         AS rows_at_risk,
       CAST(min(n) AS BIGINT) AS min_group
FROM g
""" % (KANON_BAND, KANON_K, KANON_K)


CUSUM_H = (1, 2)  # alarm when 2·S_t > total (count·days units)


def events_cusum_alarms(sf_dir):
    """CUSUM change-point detection (Page '54 — public literature)
    over the per-type daily event counts: the sequential recursion
    S_t = max(0, S_{t−1} + (x_t − k)) looks unparallelizable, but it
    EQUALS P_t − min_{j≤t} P_j for the prefix sums P of (x − k) —
    the same prefix-decomposition as the events_late_arrivals
    watermark (pane minima + carries), here finalized in one block
    because the (type, day) table is bounded. All integer: deviations
    live in count·days units (x_i·D − total, so k = mean needs no
    division), and the alarm threshold h = total/2 cross-multiplies
    the same way. Reports per type the alarm-day count and the first
    alarm day.

    Scale shape: bounded (type, day) count partials (lossless
    combiner, zero shuffle); prefix sums, running minima and alarm
    flags all vectorize in the single coalesced merge block. SQL
    replays P and min-over-preceding with window functions."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (t["ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        out = (pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(object),
            "day": day}).groupby(["event_type", "day"],
                                 as_index=False).size()
            .rename(columns={"size": "n"}))
        out["day"] = out["day"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "day"], as_index=False)
             ["n"].sum())
        rows = []
        for et, grp in g.groupby("event_type"):
            grp = grp.sort_values("day").reset_index(drop=True)
            x = grp["n"].to_numpy(np.int64)
            D = np.int64(len(x))
            total = np.int64(x.sum())
            dev = x * D - total              # (x_i − mean)·D exactly
            P = np.cumsum(dev)
            minp = np.minimum.accumulate(np.concatenate(
                ([np.int64(0)], P)))[:-1]    # min over j < t, floor 0
            S = P - minp
            alarm = S * CUSUM_H[1] > CUSUM_H[0] * total
            first = (int(grp["day"].iloc[int(np.argmax(alarm))])
                     if alarm.any() else -1)
            rows.append((et, int(D), int(alarm.sum()), first))
        out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                          "alarm_days",
                                          "first_alarm_day"])
        out = out.sort_values("event_type").reset_index(drop=True)
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n_days", "alarm_days", "first_alarm_day"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


EVENTS_CUSUM_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('day', ts)) // 86400000000
              AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(n) AS BIGINT) AS total
  FROM c GROUP BY 1),
p AS (
  SELECT c.event_type, c.day, tot.total,
         CAST(sum(c.n * tot.d - tot.total) OVER (
           PARTITION BY c.event_type ORDER BY c.day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
  FROM c JOIN tot USING (event_type)),
s AS (
  SELECT event_type, day, total, pf,
         pf - least(coalesce(min(pf) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0), 0) AS cusum
  FROM p)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(count(*) FILTER (cusum * %d > %d * total) AS BIGINT)
         AS alarm_days,
       CAST(coalesce(min(day) FILTER (cusum * %d > %d * total), -1)
            AS BIGINT) AS first_alarm_day
FROM s GROUP BY 1 ORDER BY 1
""" % (CUSUM_H[1], CUSUM_H[0], CUSUM_H[1], CUSUM_H[0])


def orders_daily_acf1(sf_dir):
    """Lag-1 autocorrelation of the daily order-revenue series — the
    seasonality/momentum screen that closes the time-series audit
    triad (trend slope → CUSUM shift → ACF persistence). With
    deviations d_t = x_t·D − T (the mean needs no division; D days,
    T total cents), num = Σ d_t·d_{t+1} and den = Σ d_t² live in
    128-bit/Python-int space (d² passes int64 already at sf0.01),
    and the result is acf1_milli = (1000·num) ÷ den with division
    EXPLICITLY toward zero on both sides — num can be negative, and
    Python floors where DuckDB truncates, so the sign is peeled
    first. Missing calendar days count as zero-revenue days (the
    dense-axis rule of events_daily_dense), so "consecutive" is
    well-defined.

    Scale shape: the (day → cents) table is bounded, so per-batch
    partials are a lossless combiner; densification, deviations and
    both sums run in the one coalesced merge block — zero shuffle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (t["o_orderdate"].to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"day": day, "cents": cents})
               .groupby("day", as_index=False)["cents"].sum())
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)["cents"].sum()
             .sort_values("day").reset_index(drop=True))
        lo, hi = int(g["day"].min()), int(g["day"].max())
        dense = np.zeros(hi - lo + 1, dtype=object)  # Python ints
        for d, c in zip(g["day"].to_numpy(), g["cents"].to_numpy()):
            dense[int(d) - lo] = int(c)
        D, T = len(dense), int(sum(dense))
        dev = [int(x) * D - T for x in dense]
        num = sum(a * b for a, b in zip(dev[:-1], dev[1:]))
        den = sum(a * a for a in dev)
        # toward-zero division (DuckDB's //), sign peeled first —
        # Python's // floors negatives
        milli = ((1000 * num) // den if num >= 0
                 else -((1000 * -num) // den)) if den else 0
        return pd.DataFrame({
            "n_days": pd.Series([D], dtype="int64"),
            "acf1_milli": pd.Series([milli], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_ACF1_SQL = """
WITH c AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
dense AS (
  SELECT g.day, coalesce(c.cents, 0) AS cents
  FROM (SELECT unnest(generate_series(span.lo, span.hi)) AS day
        FROM span) g
  LEFT JOIN c USING (day)),
s AS (SELECT count(*) AS d, CAST(sum(cents) AS HUGEINT) AS t
      FROM dense),
dev AS (
  SELECT day, CAST(cents AS HUGEINT) * s.d - s.t AS dv
  FROM dense, s),
pair AS (
  SELECT dv, lead(dv) OVER (ORDER BY day) AS dv1 FROM dev),
nd AS (
  SELECT sum(CASE WHEN dv1 IS NULL THEN 0 ELSE dv * dv1 END) AS num,
         sum(dv * dv) AS den
  FROM pair)
SELECT CAST(s.d AS BIGINT) AS n_days,
       CAST(CASE WHEN nd.den = 0 THEN 0
                 WHEN nd.num >= 0 THEN (1000 * nd.num) // nd.den
                 ELSE -((1000 * -nd.num) // nd.den) END
            AS BIGINT) AS acf1_milli
FROM nd, s
"""


def events_daily_type_mask(sf_dir):
    """Bitmap-index audience segmentation (the roaring-bitmap OLAP
    shape): per (user, day), the bitwise-OR mask of event types seen,
    then the audience-size histogram over masks — how many user-days
    were view-only, how many purchased without erroring, etc.

    Scale shape: a type's bit is a power of two, so the batch-local
    (user, day, bit) drop_duplicates + sum IS the OR — a lossless
    combiner into the single (user, day)-bucketed exchange. Buckets
    OR their mask partials vectorized (decompose → per-bit max →
    recompose; bitwise OR is associative so any partial grouping is
    exact) and emit bounded ≤2^types histogram partials; one merge
    block sums. DuckDB's bit_or replays the mask directly."""
    buckets = _exchange_buckets(sf_dir, "events")
    nbits = len(EVENT_TYPE_BITS)

    def prep(t: pa.Table) -> pd.DataFrame:
        day = (t["ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        bit = (pd.Series(t["event_type"].to_pylist())
               .map(EVENT_TYPE_BITS).to_numpy(np.int64))
        df = pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "d": day, "bit": bit}).drop_duplicates()
        p = df.groupby(["u", "d"], as_index=False)["bit"].sum()
        p = p.rename(columns={"bit": "mask"})
        p["mask"] = p["mask"].astype("int64")
        h = pd.util.hash_pandas_object(
            p["u"] * np.int64(1_000_003) + p["d"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        m = g["mask"].to_numpy()
        bits = pd.DataFrame({"u": g["u"].to_numpy(),
                             "d": g["d"].to_numpy()})
        for i in range(nbits):  # decompose → per-bit max == OR
            bits["b%d" % i] = (m >> i) & 1
        mx = bits.groupby(["u", "d"], as_index=False).max()
        mask = np.zeros(len(mx), np.int64)
        for i in range(nbits):
            mask += mx["b%d" % i].to_numpy(np.int64) << i
        hist = (pd.DataFrame({"mask": mask})
                .groupby("mask", as_index=False).size()
                .rename(columns={"size": "n_user_days"}))
        hist["mask"] = hist["mask"].astype("int64")
        hist["n_user_days"] = hist["n_user_days"].astype("int64")
        return hist

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("mask", as_index=False)["n_user_days"].sum()
               .sort_values("mask").reset_index(drop=True))
        out["mask"] = out["mask"].astype("int64")
        out["n_user_days"] = out["n_user_days"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


EVENTS_MASK_SQL = """
WITH m AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         bit_or(CASE event_type
                  WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                  ELSE 16 END) AS mask
  FROM events GROUP BY 1, 2)
SELECT CAST(mask AS BIGINT) AS mask, count(*) AS n_user_days
FROM m GROUP BY 1 ORDER BY 1
"""


def lineitem_fk_orphans(sf_dir):
    """Referential-integrity audit (the FK-violation scan a warehouse
    runs after a non-cascading delete): the same CDC delta as
    ``orders_cdc_merge`` deletes orders (keys %%17) WITHOUT cascading
    to lineitem, so surviving lineitems whose l_orderkey no longer
    resolves are orphans — reported per returnflag as orphan row
    count + distinct orphaned orders.

    Scale shape: the deleted-key side comes from the ORDERS SCAN (a
    membership problem — the audit must not assume the delete rule is
    recomputable from the fact side), riding the q3/q4 orderkey-
    bucketed tagged exchange: lineitem batches pre-reduce to
    (okey, flag) → row-count partials (lossless combiner; distinct-
    order counting stays exact because an order's rows land in one
    bucket), the orders side contributes one row per dead key, each
    bucket semi-joins vectorized and emits bounded ≤|flags| partials;
    one merge block sums. Neither side broadcasts."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "flag", "rows", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(),
            "flag": t["l_returnflag"].to_pandas().astype(object)})
        p = (df.groupby(["okey", "flag"], as_index=False).size()
             .rename(columns={"size": "rows"}))
        p["rows"] = p["rows"].astype("int64")
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_dead(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        k = k[k % CDC_DEL_MOD == 0]
        p = pd.DataFrame({"okey": k,
                          "flag": pd.Series([""] * len(k),
                                            dtype=object),
                          "rows": np.zeros(len(k), np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        dead = g.loc[g["_side"] == 1, "okey"].to_numpy()
        li_ = g[g["_side"] == 0]
        j = li_[li_["okey"].isin(dead)]
        out = j.groupby("flag", as_index=False).agg(
            orphan_rows=("rows", "sum"),
            orphan_orders=("okey", "nunique"))
        return pd.DataFrame({
            "l_returnflag": out["flag"].astype(object),
            "orphan_rows": out["orphan_rows"].astype("int64"),
            "orphan_orders": out["orphan_orders"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])
    od = _read(sf_dir, "orders", columns=["o_orderkey"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_dead, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_audit, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("l_returnflag", as_index=False)
               [["orphan_rows", "orphan_orders"]].sum()
               .sort_values("l_returnflag").reset_index(drop=True))
        out["orphan_rows"] = out["orphan_rows"].astype("int64")
        out["orphan_orders"] = out["orphan_orders"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


FK_ORPHANS_SQL = """
WITH dead AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey %% %d = 0)
SELECT l_returnflag,
       count(*) AS orphan_rows,
       count(DISTINCT l_orderkey) AS orphan_orders
FROM lineitem JOIN dead ON l_orderkey = dead.o_orderkey
GROUP BY 1 ORDER BY 1
""" % CDC_DEL_MOD


def events_ab_metrics(sf_dir):
    """A/B experiment readout: users are assigned a variant by
    md5(user_id) parity (the seedless hash assignment every
    experimentation platform uses — stable across engines, runs and
    partitions; the training_shards convention), and the readout
    reports per (variant, event_type) the user count, total events,
    and the EXACT integer sufficient statistics a t-test needs
    (Σx, Σx²) plus milli-mean = 1000·Σx // n. No float crosses the
    engine boundary; significance tests derive from the integers.

    Scale shape: batch-local (user, type) count partials (lossless
    combiner) feed ONE user-bucketed exchange; each bucket finalizes
    per-user counts, hashes each DISTINCT user once for its variant,
    and emits bounded ≤2·|types| (variant, type, n, Σx, Σx²)
    partials — additive across buckets because a user lives in
    exactly one bucket; one merge block sums and derives the
    milli-mean."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "et": t["event_type"].to_pandas().astype(object)})
        p = (df.groupby(["u", "et"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        p["cnt"] = p["cnt"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        pu = g.groupby(["u", "et"], as_index=False)["cnt"].sum()
        variant = {
            int(u): int(hashlib.md5(str(int(u)).encode())
                        .hexdigest()[:8], 16) % 2
            for u in pu["u"].unique()}
        pu["variant"] = pu["u"].map(variant).astype("int64")
        pu["sq"] = pu["cnt"] * pu["cnt"]
        out = pu.groupby(["variant", "et"], as_index=False).agg(
            n_users=("u", "size"),
            total_events=("cnt", "sum"),
            sumsq_events=("sq", "sum"))
        return pd.DataFrame({
            "variant": out["variant"].astype("int64"),
            "event_type": out["et"].astype(object),
            "n_users": out["n_users"].astype("int64"),
            "total_events": out["total_events"].astype("int64"),
            "sumsq_events": out["sumsq_events"].astype("int64")})

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["variant", "event_type"], as_index=False)
               [["n_users", "total_events", "sumsq_events"]].sum())
        out["mean_milli"] = ((out["total_events"] * 1000)
                             // out["n_users"])
        out = (out.sort_values(["variant", "event_type"])
               .reset_index(drop=True))
        for c in ("variant", "n_users", "total_events",
                  "sumsq_events", "mean_milli"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


EVENTS_AB_SQL = """
WITH pu AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2),
v AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2 AS BIGINT) AS variant
  FROM (SELECT DISTINCT user_id FROM events))
SELECT v.variant, pu.event_type,
       count(*) AS n_users,
       CAST(sum(pu.cnt) AS BIGINT) AS total_events,
       CAST(sum(pu.cnt * pu.cnt) AS BIGINT) AS sumsq_events,
       CAST(sum(pu.cnt) * 1000 // count(*) AS BIGINT) AS mean_milli
FROM pu JOIN v USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


COMPACT_TARGET_CHARS = 2000


def source_compaction_plan(sf_dir):
    """Small-files compaction planning (the Delta/Iceberg OPTIMIZE
    bin-packing step): per source, pack document "files" into
    target-size output bins by the deterministic size-descending
    cumulative-quota rule — order by (bytes DESC, doc_id), bin =
    floor(running_bytes_before / TARGET) — and emit the per-bin
    manifest (file count, bytes). The rule is a pure function of the
    sorted order, so SQL's window cumsum replays it bit-for-bit, and
    every bin except a source's last lands within one max-file-size
    of the target.

    Scale shape: planning consumes only the FILE MANIFEST (source,
    id, bytes — one narrow row per file; ~10⁶ rows at 100 TB, not
    the data); ONE source-bucketed exchange co-locates each source's
    manifest (the plan needs its files totally ordered), the
    per-bucket plan is one vectorized sort + cumsum + floor-div, and
    the bounded (source, bin) rows are FINAL per bucket (a source
    lives in exactly one bucket) — the merge block only sorts. The
    rewrite pass the plan drives is embarrassingly parallel per
    bin."""
    buckets = _exchange_buckets(sf_dir, "documents")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "doc_id": t["doc_id"].to_numpy(),
            "bytes": t["n_chars"].to_numpy()})
        h = pd.util.hash_pandas_object(p["source"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_plan(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, f in g.groupby("source", sort=False):
            f = f.sort_values(["bytes", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort")
            b = f["bytes"].to_numpy(np.int64)
            before = np.cumsum(b) - b
            bins = before // COMPACT_TARGET_CHARS
            plan = (pd.DataFrame({"bin": bins, "bytes": b})
                    .groupby("bin", as_index=False)
                    .agg(n_files=("bytes", "size"),
                         bytes_total=("bytes", "sum")))
            plan.insert(0, "source", src)
            outs.append(plan)
        out = (pd.concat(outs, ignore_index=True) if outs else
               pd.DataFrame({"source": pd.Series(dtype=object),
                             "bin": pd.Series(dtype="int64"),
                             "n_files": pd.Series(dtype="int64"),
                             "bytes_total": pd.Series(dtype="int64")}))
        for c in ("bin", "n_files", "bytes_total"):
            out[c] = out[c].astype("int64")
        return out[["source", "bin", "n_files", "bytes_total"]]

    ds = _read(sf_dir, "documents",
               columns=["source", "doc_id", "n_chars"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_plan, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["source", "bin"])
                .reset_index(drop=True))

    return _merge_partials(per_bucket, final)


COMPACTION_SQL = """
WITH f AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING)
           - n_chars AS before
  FROM documents)
SELECT source, CAST(before // %d AS BIGINT) AS bin,
       count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes_total
FROM f GROUP BY 1, 2 ORDER BY 1, 2
""" % COMPACT_TARGET_CHARS


def source_lang_gini(sf_dir):
    """Label-distribution audit: per-source Gini impurity of the
    language labels in exact integer milli-units — the class-balance
    check a curation pipeline runs before trusting per-source
    sampling weights (a source whose labels collapsed to one class is
    a labeler failure, not a signal). Gini = 1 − Σp² is RATIONAL, so
    milli-gini = (1000·(n² − Σc²)) // n² replays bit-for-bit in SQL —
    no log/entropy float crosses the engine boundary.

    Scale shape: the (source, lang) count table is bounded, so
    per-batch count partials are a lossless combiner and the whole
    statistic finalizes in the one coalesced merge block — zero
    shuffle at any data scale."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "lang": t["lang"].to_pandas().astype(object)})
        out = (df.groupby(["source", "lang"], as_index=False).size()
               .rename(columns={"size": "c"}))
        out["c"] = out["c"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cell = df.groupby(["source", "lang"], as_index=False)["c"].sum()
        cell["sq"] = cell["c"] * cell["c"]
        s = cell.groupby("source", as_index=False).agg(
            n=("c", "sum"), sumsq=("sq", "sum"),
            n_langs=("lang", "size"))
        nn = s["n"] * s["n"]
        s["gini_milli"] = (1000 * (nn - s["sumsq"])) // nn
        out = (s[["source", "n_langs", "n", "gini_milli"]]
               .rename(columns={"n": "n_docs"})
               .sort_values("source").reset_index(drop=True))
        for c in ("n_langs", "n_docs", "gini_milli"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


SOURCE_GINI_SQL = """
WITH cell AS (
  SELECT source, lang, count(*) AS c
  FROM documents GROUP BY 1, 2),
s AS (
  SELECT source, count(*) AS n_langs,
         CAST(sum(c) AS BIGINT) AS n_docs,
         CAST(sum(c * c) AS BIGINT) AS sumsq
  FROM cell GROUP BY 1)
SELECT source, n_langs, n_docs,
       CAST((1000 * (n_docs * n_docs - sumsq))
            // (n_docs * n_docs) AS BIGINT) AS gini_milli
FROM s ORDER BY source
"""


RDV_NODES_BEFORE, RDV_NODES_AFTER = 8, 9


def rendezvous_rebalance(sf_dir):
    """Consistent-hashing shard rebalance audit (rendezvous / HRW
    hashing, Thaler-Ravishankar '98): every doc is assigned to the
    node maximizing md5(doc:node), before (8 nodes) and after (9
    nodes) a scale-out, and the movement matrix (node_before,
    node_after) → count is the proof of HRW's minimal-movement
    property — every off-diagonal row must land on the NEW node,
    and ~1/9 of each node moves. This is how a 100-TB engine grows
    its cache/shard tier without reshuffling the world.

    Scale shape: both assignments are pure map-side hashing (9 md5s
    per doc, the training_shards seedless discipline; argmax
    tie-breaks to the lower node id), the movement matrix is bounded
    ≤8·9 cells so per-batch partials are a lossless combiner — zero
    shuffle."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(doc_id: int, n_nodes: int) -> int:
        best, best_h = 0, -1
        for n in range(n_nodes):
            h = int(hashlib.md5(("%d:%d" % (doc_id, n)).encode())
                    .hexdigest()[:8], 16)
            if h > best_h:  # strict > == lower-node tie-break
                best, best_h = n, h
        return best

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = [int(i) for i in t["doc_id"].to_pylist()]
        b = [assign(i, RDV_NODES_BEFORE) for i in ids]
        a = [assign(i, RDV_NODES_AFTER) for i in ids]
        out = (pd.DataFrame({"node_before": b, "node_after": a})
               .groupby(["node_before", "node_after"], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["node_before", "node_after"],
                          as_index=False)["n_docs"].sum()
               .sort_values(["node_before", "node_after"])
               .reset_index(drop=True))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


RENDEZVOUS_SQL = """
WITH h AS (
  SELECT doc_id, CAST(t.n AS BIGINT) AS node,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                      || CAST(t.n AS VARCHAR)), 1, 8)
                   AS BIGINT) AS BIGINT) AS hv
  FROM documents, range(%d) t(n)),
p8 AS (
  SELECT doc_id, node FROM (
    SELECT doc_id, node, row_number() OVER (
      PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
    FROM h WHERE node < %d) WHERE rk = 1),
p9 AS (
  SELECT doc_id, node FROM (
    SELECT doc_id, node, row_number() OVER (
      PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
    FROM h) WHERE rk = 1)
SELECT p8.node AS node_before, p9.node AS node_after,
       count(*) AS n_docs
FROM p8 JOIN p9 USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""" % (RDV_NODES_AFTER, RDV_NODES_BEFORE)


def user_value_twa(sf_dir):
    """Time-weighted average of the event value per user (the
    monitoring/billing primitive: a gauge sampled at irregular
    times is averaged by HOLDING each value until the next sample —
    last-observation-carried-forward — not by the naive mean that
    over-weights bursts). All integer: µs timestamps × milli-values,
    twa_milli = Σ(mv·Δt) // ΣΔt; users with one event have no
    holding interval and are excluded by rule.

    Scale shape: one user-bucketed exchange co-locates each user's
    events (the events_debounce LAG discipline), the per-bucket pass
    is one vectorized sort + shift + two grouped sums, and one
    (user) row per user streams out — no driver loop, no global
    sort. Bounds: Σmv·Δt ≤ max_mv · span_us ≈ 10¹⁸ here; at wider
    spans drop to ms ticks (divide Δt by a fixed 10³ in BOTH
    engines) before the product."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        mv = pc.cast(pc.round(pc.multiply(t["value"],
                                          pa.scalar(1000.0)),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy()
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": t["ts"].to_numpy()
                  .astype("datetime64[us]").astype(np.int64),
            "eid": t["event_id"].to_numpy(),
            "mv": mv})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_twa(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["u", "ts", "eid"], kind="mergesort")
             .reset_index(drop=True))
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        mv = g["mv"].to_numpy(np.int64)
        # pair i with its successor WITHIN the same user — all int64
        # (a float64 detour via .shift() would lose exactness >2^53)
        i = np.flatnonzero(u[:-1] == u[1:]) if len(u) > 1 else \
            np.empty(0, np.intp)
        v = pd.DataFrame({"u": u[i], "num": mv[i] * (ts[i + 1] - ts[i]),
                          "dt": ts[i + 1] - ts[i]})
        s = v.groupby("u", as_index=False).agg(
            num=("num", "sum"), den=("dt", "sum"))
        s = s[s["den"] > 0]
        return pd.DataFrame({
            "user_id": s["u"].astype("int64"),
            "twa_milli": (s["num"].astype("int64")
                          // s["den"].astype("int64")),
            "span_us": s["den"].astype("int64")})

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_twa, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values("user_id").reset_index(drop=True)
        for c in ("user_id", "twa_milli", "span_us"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


USER_TWA_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CAST(round(value * 1000) AS BIGINT) AS mv
  FROM events),
p AS (
  SELECT user_id, mv,
         lead(t) OVER (PARTITION BY user_id
                       ORDER BY t, event_id) - t AS dt
  FROM e)
SELECT user_id,
       CAST(sum(mv * dt) // sum(dt) AS BIGINT) AS twa_milli,
       CAST(sum(dt) AS BIGINT) AS span_us
FROM p WHERE dt IS NOT NULL
GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1
"""


def langid_agreement(sf_dir):
    """Inter-rater agreement (Cohen's kappa) between an "annotator"
    label and the REAL LangId actor-pool prediction — the
    label-quality audit every weakly-supervised training-data
    pipeline runs before trusting a heuristic labeler.

    Rater A is the planted language langs[doc_id % 4]; rater B is
    the LangId stage run end-to-end on a probe whose stopword
    profile is deliberately wrong for doc_id % 7 == 0 (a planted
    ~1/7 disagreement — kappa stays strongly positive, so the
    floor-divided milli-kappa never hits the Python-floor vs
    DuckDB-truncate sign divergence). Scale shape: probes and
    predictions are map-side (actor pool sized to the cluster),
    each batch emits a bounded ≤16-cell confusion partial, and
    kappa = (N·D − Σrᵢcᵢ)·1000 // (N² − Σrᵢcᵢ) — exact
    cross-multiplied integers — finalizes in one merge block."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    langs = sorted(text_analysis._STOP)  # ["de", "en", "es", "fr"]

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        a, texts = [], []
        for did in ids:
            a.append(langs[did % 4])
            b_lang = langs[(did + (1 if did % 7 == 0 else 0)) % 4]
            texts.append(" ".join(sorted(text_analysis._STOP[b_lang]) * 3))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "a_lang": pa.array(a, pa.string()),
                         "text": pa.array(texts, pa.string())})

    def confusion(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"a": t["a_lang"].to_pylist(),
                           "b": t["detected_lang"].to_pylist()})
        out = df.groupby(["a", "b"], as_index=False).size()
        out["size"] = out["size"].astype("int64")
        return out.rename(columns={"size": "n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cm = df.groupby(["a", "b"])["n"].sum()
        n = int(cm.sum())
        d = int(cm[[k for k in cm.index if k[0] == k[1]]].sum())
        rows = cm.groupby("a").sum()
        cols = cm.groupby("b").sum()
        s = int(sum(int(rows.get(l, 0)) * int(cols.get(l, 0))
                    for l in set(rows.index) | set(cols.index)))
        kappa_milli = (1000 * (n * d - s)) // max(n * n - s, 1)
        return pd.DataFrame(
            {"n_docs": pd.Series([n], dtype="int64"),
             "n_agree": pd.Series([d], dtype="int64"),
             "kappa_milli": pd.Series([kappa_milli], dtype="int64")})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    preds = (ds.map_batches(probe, batch_format="pyarrow")
             .map_batches(text_analysis.LangId,
                          concurrency=(max(2, ncpu // 4),
                                       max(4, ncpu - 2)),
                          batch_format="pyarrow"))
    return _merge_partials(
        preds.map_batches(confusion, batch_format="pyarrow"), final)


LANGID_AGREEMENT_SQL = """
WITH r AS (
  SELECT CASE doc_id % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
                          WHEN 2 THEN 'es' ELSE 'fr' END AS a,
         CASE (doc_id + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
              % 4
           WHEN 0 THEN 'de' WHEN 1 THEN 'en'
           WHEN 2 THEN 'es' ELSE 'fr' END AS b
  FROM documents),
cm AS (SELECT a, b, count(*) AS n FROM r GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(coalesce(sum(n) FILTER (a = b), 0) AS BIGINT) AS d
        FROM cm),
marg AS (
  SELECT CAST(coalesce(sum(ra.rn * cb.cn), 0) AS BIGINT) AS s
  FROM (SELECT a AS l, sum(n) AS rn FROM cm GROUP BY 1) ra
  JOIN (SELECT b AS l, sum(n) AS cn FROM cm GROUP BY 1) cb
    ON ra.l = cb.l)
SELECT tot.n AS n_docs, tot.d AS n_agree,
       CAST((1000 * (tot.n * tot.d - marg.s))
            // greatest(tot.n * tot.n - marg.s, 1) AS BIGINT)
         AS kappa_milli
FROM tot, marg
"""


def orders_ivm_counts(sf_dir):
    """Incremental view maintenance: keep the per-status
    (count, cents) aggregate current under the SAME CDC delta
    orders_cdc_merge applies — by folding SIGNED delta partials into
    the base aggregate instead of re-aggregating the merged table
    (the Δ-law agg(apply(base, δ)) = agg(base) ⊕ signed_agg(δ);
    at 100 TB the delta is MBs while the rescan is the table).

    Scale shape: fully zero-shuffle — one pass emits, per batch, the
    base (+1, +cents) partials AND the delta's signed partials
    (update: (0, +100) on surviving keys; delete: (−1, −cents);
    insert: (+1, +cents) under status 'N'), all bounded by the ≤5
    statuses; one merge block sums. The oracle re-aggregates the
    merged table from the same delta CTEs, so equality IS the IVM
    correctness proof."""

    def signed(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        upd = (k % CDC_UPD_MOD == 0) & (k % CDC_DEL_MOD != 0)
        dl = k % CDC_DEL_MOD == 0
        ins = k % CDC_INS_MOD == 0
        parts = [
            pd.DataFrame({"st": st, "dn": np.ones(len(k), np.int64),
                          "dc": c}),                       # base
            pd.DataFrame({"st": st[upd],
                          "dn": np.zeros(int(upd.sum()), np.int64),
                          "dc": np.full(int(upd.sum()), 100,
                                        np.int64)}),       # updates
            pd.DataFrame({"st": st[dl],
                          "dn": np.full(int(dl.sum()), -1, np.int64),
                          "dc": -c[dl]}),                  # deletes
            pd.DataFrame({"st": np.full(int(ins.sum()), "N",
                                        dtype=object),
                          "dn": np.ones(int(ins.sum()), np.int64),
                          "dc": c[ins]}),                  # inserts
        ]
        df = pd.concat(parts, ignore_index=True)
        out = df.groupby("st", as_index=False)[["dn", "dc"]].sum()
        out["dn"] = out["dn"].astype("int64")
        out["dc"] = out["dc"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("st", as_index=False)[["dn", "dc"]].sum()
               .rename(columns={"st": "o_orderstatus",
                                "dn": "n_orders",
                                "dc": "total_cents"}))
        out = out[out["n_orders"] > 0]
        out = out.sort_values("o_orderstatus").reset_index(drop=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["total_cents"] = out["total_cents"].astype("int64")
        return out

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(signed, batch_format="pyarrow"), final)


ORDERS_IVM_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
merged AS (
  SELECT CASE WHEN k %% %d = 0 THEN c + 100 ELSE c END AS c, st
  FROM base WHERE k %% %d != 0
  UNION ALL
  SELECT c, 'N' AS st FROM base WHERE k %% %d = 0)
SELECT st AS o_orderstatus, count(*) AS n_orders,
       CAST(sum(c) AS BIGINT) AS total_cents
FROM merged GROUP BY 1 ORDER BY 1
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_MOD)


BASKET_MINSUP = 2
BASKET_TOPK = 20


def basket_part_pairs(sf_dir):
    """Market-basket pair mining (the A-Priori pair-counting shape,
    MMDS ch.6): the top-20 part pairs by the number of orders whose
    basket contains both — the co-occurrence primitive behind
    recommenders and feature co-selection.

    Scale shape: baskets are unbounded and span input blocks, so the
    okey-bucketed exchange is required; batch-local distinct
    (okey, pkey) is the combiner into it. Each bucket self-joins its
    baskets vectorized (p1 < p2) and emits LOCAL pair counts — a
    lossless partial because an order lives in exactly one bucket.
    Pair support finalizes in a SECOND pair-hash-bucketed exchange
    (two chained exchanges, no union — within the DAG discipline)
    that prunes support < minsup map-side of the merge and keeps a
    local top-k; the global top-20 orders by (support desc, p1, p2)
    so ties never cross engines."""
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy()})
        df = df.drop_duplicates()  # batch-local combiner
        h = pd.util.hash_pandas_object(df["okey"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

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

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p1", "p2"], as_index=False)["support"].sum()
        g = g[g["support"] >= BASKET_MINSUP]
        g = (g.sort_values(["support", "p1", "p2"],
                           ascending=[False, True, True])
             .head(BASKET_TOPK))
        for c in ("p1", "p2", "support"):
            g[c] = g[c].astype("int64")
        return g[["p1", "p2", "support"]]

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    per_pair = (li.map_batches(prep, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_pairs, batch_format="pandas")
                .groupby("_b2")
                .map_groups(bucket_topk, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["support", "p1", "p2"],
                               ascending=[False, True, True])
                .head(BASKET_TOPK).reset_index(drop=True))

    return _merge_partials(per_pair, final)


BASKET_PAIRS_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, count(*) AS support
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2)
SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
       CAST(support AS BIGINT) AS support
FROM p WHERE support >= %d
ORDER BY support DESC, p1, p2 LIMIT %d
""" % (BASKET_MINSUP, BASKET_TOPK)


RANGE_SHARDS = 16


def doc_range_layout(sf_dir):
    """Balanced range partitioning by sampled splitters — the
    terasort primitive, and the scale path that replaces
    ``ds.sort`` on the full table: a global sort of 100 TB is an
    all-to-all of every byte, while the sampled-splitter layout moves
    only a key sample, then assigns shards map-side. Documents are
    ranged over the composite key n_chars·1e8 + doc_id (skewed first
    dimension, unique tiebreaker), the layout a length-bucketed
    curriculum/packing reader would want.

    Scale shape: the sample is deterministic (md5(doc_id) hex prefix
    '0', ~1/16 — seedless-shuffle discipline; at 100 TB deepen the
    prefix so ~1k keys/shard survive) and is a pruned 2-column read;
    splitter selection happens in ONE coalesced sample block and only
    the S-1 splitters reach the driver for broadcast. Assignment is a
    zero-shuffle searchsorted pass emitting bounded per-shard
    (count, min, max) partials; the merge is one ≤S-row block. The
    oracle replays sample, splitter ranks and the splitters≤key rule
    exactly."""
    import hashlib

    import ray

    def sample_keys(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        nch = t["n_chars"].to_numpy().astype(np.int64)
        keep = np.array(
            [hashlib.md5(str(int(i)).encode()).hexdigest()[0] == "0"
             for i in ids])
        key = nch * np.int64(100_000_000) + np.asarray(ids, np.int64)
        return pd.DataFrame({"key": key[keep]})

    def to_splitters(df: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(df["key"].to_numpy())
        m = len(k)
        pos = sorted({(i * m) // RANGE_SHARDS
                      for i in range(1, RANGE_SHARDS)} - {0})
        return pd.DataFrame(
            {"key": k[[p - 1 for p in pos]].astype(np.int64)})

    cols = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    spl = (cols.map_batches(sample_keys, batch_format="pyarrow")
           .repartition(1)
           .map_batches(to_splitters, batch_format="pandas",
                        batch_size=None)
           .to_pandas())  # bounded: ≤ S-1 splitter rows
    splitters = np.sort(spl["key"].to_numpy().astype(np.int64))
    ref = ray.put(splitters)

    def assign(t: pa.Table) -> pd.DataFrame:
        spl_ = ray.get(ref)
        key = (t["n_chars"].to_numpy().astype(np.int64)
               * np.int64(100_000_000)
               + t["doc_id"].to_numpy().astype(np.int64))
        shard = np.searchsorted(spl_, key, side="right")
        df = pd.DataFrame({"shard": shard.astype(np.int64),
                           "key": key})
        out = df.groupby("shard", as_index=False).agg(
            n_docs=("key", "size"), lo_key=("key", "min"),
            hi_key=("key", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            n_docs=("n_docs", "sum"), lo_key=("lo_key", "min"),
            hi_key=("hi_key", "max")).sort_values("shard")
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.reset_index(drop=True)

    return _merge_partials(
        cols.map_batches(assign, batch_format="pyarrow"), final)


DOC_RANGE_LAYOUT_SQL = """
WITH k AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) * 100000000 + doc_id AS key
  FROM documents),
samp AS (
  SELECT key FROM k
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
ordered AS (
  SELECT key, row_number() OVER (ORDER BY key) AS rn,
         count(*) OVER () AS m
  FROM samp),
pos AS (
  SELECT DISTINCT (i * mm.m) // %d AS p
  FROM generate_series(1, %d) g(i),
       (SELECT DISTINCT m FROM ordered) mm(m)
  WHERE (i * mm.m) // %d >= 1),
spl AS (SELECT o.key FROM ordered o JOIN pos ON o.rn = pos.p),
assigned AS (
  SELECT k.key,
         (SELECT count(*) FROM spl WHERE spl.key <= k.key) AS shard
  FROM k)
SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       CAST(min(key) AS BIGINT) AS lo_key,
       CAST(max(key) AS BIGINT) AS hi_key
FROM assigned GROUP BY 1 ORDER BY 1
""" % (RANGE_SHARDS, RANGE_SHARDS - 1, RANGE_SHARDS)


CHECKSUM_BUCKETS = 16
CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: sums never overflow


def orders_checksum(sf_dir):
    """Anti-entropy table checksum (the Merkle/Cassandra repair
    primitive, and the CDC-apply verifier for orders_cdc_merge):
    per key-range bucket, an order-independent checksum — the sum
    mod 2⁶¹-1 of each row's md5-derived integer over its FULL
    canonical content. Two replicas (or a table before/after a
    botched migration) compare 16 small rows to localize which key
    ranges diverge, instead of diffing 100 TB.

    Scale shape: zero shuffle — the per-row hash and the per-bucket
    (count, sum-mod-p) partial are map-side (sums are associative
    mod p, so the partial is a lossless combiner), and the ≤16-row
    partials coalesce in one merge block. The canonical row string
    (okey|status|cents|iso-date) is engine-neutral, so the SQL
    oracle recomputes every row hash bit-for-bit."""
    import hashlib

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["o_orderkey"].to_numpy().astype(np.int64)
        status = t["o_orderstatus"].to_pylist()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        dates = t["o_orderdate"].to_numpy().astype("datetime64[D]")
        dstr = np.datetime_as_string(dates)
        rows = [int(hashlib.md5(
            ("%d|%s|%d|%s" % (k, s, c, d)).encode())
            .hexdigest()[:15], 16)
            for k, s, c, d in zip(okey, status, cents, dstr)]
        df = pd.DataFrame({"bucket": (okey % CHECKSUM_BUCKETS),
                           "h": pd.Series(rows, dtype=object)})
        out = df.groupby("bucket", as_index=False).agg(
            n_rows=("h", "size"),
            checksum=("h", lambda s: int(sum(s) % CHECKSUM_MOD)))
        out["bucket"] = out["bucket"].astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["checksum"] = out["checksum"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("bucket", as_index=False)
               .agg(n_rows=("n_rows", "sum"),
                    checksum=("checksum",
                              lambda s: int(sum(int(v) for v in s)
                                            % CHECKSUM_MOD)))
               .sort_values("bucket").reset_index(drop=True))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_CHECKSUM_SQL = """
WITH h AS (
  SELECT o_orderkey %% %d AS bucket,
         CAST('0x' || substr(md5(concat_ws('|',
                CAST(o_orderkey AS VARCHAR),
                o_orderstatus,
                CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR),
                strftime(o_orderdate, '%%Y-%%m-%%d'))), 1, 15)
              AS BIGINT) AS hv
  FROM orders)
SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
       CAST(sum(CAST(hv AS HUGEINT)) %% %d AS BIGINT) AS checksum
FROM h GROUP BY 1 ORDER BY 1
""" % (CHECKSUM_BUCKETS, CHECKSUM_MOD)


Q8_SQL = """
WITH tgt AS (
  SELECT s_nationkey AS nk FROM supplier ORDER BY s_suppkey LIMIT 1),
region_cust AS (
  SELECT c_custkey FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE n.n_regionkey =
        (SELECT r_regionkey FROM region WHERE r_name = '%s')),
li AS (
  SELECT l.l_orderkey AS okey,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS c,
         CASE WHEN s.s_nationkey = (SELECT nk FROM tgt)
              THEN 1 ELSE 0 END AS isn
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '%s'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey)
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(li.c * li.isn) AS BIGINT) AS nation_cents,
       CAST(sum(li.c) AS BIGINT) AS total_cents,
       CAST((1000 * sum(li.c * li.isn)) // greatest(sum(li.c), 1)
            AS BIGINT) AS share_permille
FROM li
JOIN orders o ON o.o_orderkey = li.okey
JOIN region_cust rc ON rc.c_custkey = o.o_custkey
WHERE o.o_orderdate >= DATE '%s' AND o.o_orderdate < DATE '%s'
GROUP BY 1 ORDER BY 1
""" % (Q8_REGION, Q8_TYPE, Q8_LO, Q8_HI)
