"""Distributed join / semi-join / anti-join building blocks.

Reference semantics served here:

- skeleton anti-join (sources/general/skeleton.py:99-120): URIs
  occurring as objects but never as subjects;
- annotation CONSTRUCT joins (documentrepository.py:2633-2688);
- ``Facet.resourcelabel`` label-resolution lookups (facet.py:259-281).

Scale design: the small-side broadcast (ray.put a Python set / dict)
is the fast path, but a 10^9-key side is tens of GB — above
``broadcast_threshold`` the anti/semi join switches to a **Bloom
filter + exact recheck**:

1. the driver streams the key side once through ``iter_batches`` into
   a numpy bit-array Bloom filter (~1.2 GB per 10^9 keys at 1% fp) —
   one ``ray.put``, read once per map task;
2. rows the filter rejects are DEFINITE non-members (Bloom has no
   false negatives) → anti-join keeps them immediately with zero
   shuffle;
3. "maybe" rows (true members + the fp-rate sliver) go through an
   exact hash-partitioned recheck against the key side, so the final
   result is EXACT, never approximate.

``bucket_join`` is the general two-sided hash-equi-join used when
neither side fits a broadcast: both sides carry an int hash bucket of
the key and meet in ONE groupby(bucket) with a vectorized pandas
merge per bucket (the measured-fast shape from memory
ray-data-perf-pitfalls — never one Ray group per key).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# Dimension rows at or below this count broadcast as a Python dict
# (ray.put once, read per task); above it the lookup switches to a
# bucketed hash join. Tests monkeypatch this to 0 to force the
# distributed path (mirrors dedup.driver_threshold).
DIM_BROADCAST_THRESHOLD = 5_000_000


def _hash64(series: pd.Series) -> np.ndarray:
    """Deterministic vectorized uint64 hash of an arbitrary key column
    (pandas C siphash; join composite keys with \\x1f, never NUL)."""
    return pd.util.hash_pandas_object(series, index=False).values


class BloomFilter:
    """Numpy bit-array Bloom filter with double hashing (Kirsch &
    Mitzenmacher 2006, public). Deterministic; picklable (rides a
    single ``ray.put``)."""

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        n = max(1, int(n_items))
        m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = np.uint64(max(64, m))
        self.k = max(1, round(int(self.m) / n * math.log(2)))
        self.words = np.zeros((int(self.m) + 63) // 64, dtype=np.uint64)

    def _positions(self, series: pd.Series):
        h1 = _hash64(series)
        h2 = (h1 ^ (h1 >> np.uint64(33))) * _GOLDEN | np.uint64(1)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) % self.m

    def add(self, series: pd.Series):
        for idx in self._positions(series):
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, series: pd.Series) -> np.ndarray:
        """Boolean maybe-member mask (no false negatives)."""
        out = np.ones(len(series), dtype=bool)
        for idx in self._positions(series):
            w = self.words[(idx >> np.uint64(6)).astype(np.int64)]
            out &= ((w >> (idx & np.uint64(63))) & np.uint64(1)) == 1
        return out


def _exact_membership_filter(rows_ds, key_col: str, keys_ds, keys_col: str,
                             keep_members: bool, num_buckets: int):
    """Exact distributed membership filter: hash-partition rows and
    keys by the key's bucket, decide per bucket. Returns the surviving
    rows with their original schema."""
    schema = rows_ds.schema()  # ray.data Schema wrapper
    col_types = list(zip(schema.names, schema.types))

    def prep_rows(t: pa.Table) -> pa.Table:
        key = t[key_col].to_pandas()
        bucket = (_hash64(key) % np.uint64(num_buckets)).astype("int32")
        t = t.append_column("_bucket", pa.array(bucket))
        return t.append_column("_is_key", pa.array([False] * t.num_rows))

    def prep_keys(t: pa.Table) -> pa.Table:
        keys = t[keys_col].to_pandas()
        n = t.num_rows
        cols = {}
        for name, typ in col_types:
            if name == key_col:
                cols[name] = pa.array(keys, typ)
            else:
                cols[name] = pa.nulls(n, typ)
        out = pa.table(cols)
        bucket = (_hash64(keys) % np.uint64(num_buckets)).astype("int32")
        out = out.append_column("_bucket", pa.array(bucket))
        return out.append_column("_is_key", pa.array([True] * n))

    tagged = (rows_ds.map_batches(prep_rows, batch_format="pyarrow")
              .union(keys_ds.map_batches(prep_keys, batch_format="pyarrow")))

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        keys = set(g.loc[g["_is_key"], key_col])
        rows = g[~g["_is_key"]]
        member = rows[key_col].isin(keys)
        out = rows[member] if keep_members else rows[~member]
        return out.drop(columns=["_bucket", "_is_key"])

    out = tagged.groupby("_bucket").map_groups(decide, batch_format="pandas")
    # normalize back to arrow blocks with the ORIGINAL dtypes —
    # callers union this with arrow-block datasets (mixed block types
    # break downstream builders), and the pandas decide() pass upcasts
    # int columns to float64 (the tagged key rows carry nulls in every
    # non-key column), which must not leak into the result schema
    target = pa.schema(col_types)

    def restore(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return target.empty_table()
        return t.select(target.names).cast(target)

    return out.map_batches(restore, batch_format="pyarrow")


def membership_join(rows_ds, key_col: str, keys_ds, keys_col: str | None = None,
                    mode: str = "anti",
                    broadcast_threshold: int | None = None,
                    bloom_fp: float = 0.01, force_bloom: bool = False,
                    num_buckets: int = 64):
    """Anti/semi join of ``rows_ds`` against the key side.

    mode="anti": keep rows whose key is NOT in keys_ds;
    mode="semi": keep rows whose key IS in keys_ds.

    Key side ≤ ``broadcast_threshold``: broadcast a Python set
    (ray.put once), filter map-side — zero shuffle. Above it (or
    ``force_bloom``): Bloom pre-filter + exact hash-partitioned
    recheck of only the maybe-member rows; Bloom false positives are
    re-checked exactly, so both paths return identical results.
    """
    import ray

    if broadcast_threshold is None:
        broadcast_threshold = DIM_BROADCAST_THRESHOLD
    keys_col = keys_col or key_col
    keep_members = (mode == "semi")
    n_keys = keys_ds.count()

    if not force_bloom and n_keys <= broadcast_threshold:
        keyset = set(keys_ds.to_pandas()[keys_col])
        # scalar keys probe vectorized with pc.is_in (whose default
        # null semantics — null matches null in the value set, else
        # false — are exactly the Python `k in keys` behavior); the
        # Python-set loop stays only as the non-scalar fallback
        keys_arr = None
        try:
            arr = pa.array(list(keyset))
            if not (pa.types.is_nested(arr.type)
                    or pa.types.is_null(arr.type)):
                keys_arr = arr
        except (pa.ArrowInvalid, pa.ArrowTypeError,
                pa.ArrowNotImplementedError):
            pass
        ref = ray.put(keyset if keys_arr is None else keys_arr)

        def flt(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            keys = ray.get(ref)
            col = t[key_col]
            if keys_arr is not None:
                vs = keys if keys.type.equals(col.type) \
                    else keys.cast(col.type)
                member = pc.is_in(col, value_set=vs)
                keep = member if keep_members \
                    else pc.invert(member)
                return t.filter(keep)
            member = np.array([k in keys for k in col.to_pylist()])
            return t.filter(pa.array(member if keep_members else ~member))

        return rows_ds.map_batches(flt, batch_format="pyarrow")

    bloom = BloomFilter(n_keys, bloom_fp)
    for batch in keys_ds.iter_batches(batch_format="pandas",
                                      batch_size=65536):
        bloom.add(batch[keys_col])
    bloom_ref = ray.put(bloom)

    def split(maybe: bool):
        def flt(t: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            mask = bf.contains(t[key_col].to_pandas())
            return t.filter(pa.array(mask if maybe else ~mask))
        return flt

    if keep_members:
        # semi: bloom-absent rows are definite non-members → dropped;
        # maybe rows need the exact check
        maybe_rows = rows_ds.map_batches(split(True), batch_format="pyarrow")
        return _exact_membership_filter(maybe_rows, key_col, keys_ds,
                                        keys_col, True, num_buckets)
    definite_keep = rows_ds.map_batches(split(False), batch_format="pyarrow")
    maybe_rows = rows_ds.map_batches(split(True), batch_format="pyarrow")
    rechecked = _exact_membership_filter(maybe_rows, key_col, keys_ds,
                                         keys_col, False, num_buckets)
    return definite_keep.union(rechecked)


def asof_join(left_ds, right_ds, on: str = "ts", by: str = "user_id",
              direction: str = "backward", how: str = "inner",
              suffix: str = "_r", num_buckets: int = 64):
    """As-of join: for each left row, the single right row of the same
    ``by`` group with the greatest right.``on`` <= left.``on``
    (direction="backward"; "forward" = smallest right.on >= left.on).
    Ray Data has no native as-of join — this is the composition the
    brief calls for: tag both sides, hash-bucket by the ``by`` key,
    ONE groupby(bucket), vectorized ``pd.merge_asof`` per bucket.

    Partitioning assumption (documented per the brief): every row of
    one ``by`` group lands in one bucket. Unlike an equi-join a
    skewed group cannot blow up the output — as-of emits at most
    |left| rows — so the only skew cost is one big sort per hot
    bucket. Right columns colliding with left names (including ``on``,
    which both sides carry) get ``suffix``. how: "inner" drops left
    rows with no match; "left" keeps them with nulls.
    """
    lschema, rschema = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != by]
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}
    out_rcols = [rename[c] for c in rcols]
    on_r = rename.get(on, on)
    # one combined arrow schema: typed nulls (NOT pandas None columns,
    # which degrade datetimes to object and ints to float across the
    # union) so each bucket's frame keeps real dtypes for merge_asof
    combined = ([(c, ltypes[c]) for c in lcols]
                + [(rename[c], rtypes[c]) for c in rcols])
    int_cols = [c for c, t in combined if pa.types.is_integer(t)]

    inv = {v: k for k, v in rename.items()}  # output name → right name
    src_left = {name: (name if name in ltypes else None)
                for name, _ in combined}
    src_right = {name: (by if name == by else inv.get(name))
                 for name, _ in combined}

    def prep(side: int, src: dict):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {name: (t[src[name]] if src[name] is not None
                           else pa.nulls(n, typ))
                    for name, typ in combined}
            out = pa.table(cols)
            bucket = (_hash64(out[by].to_pandas())
                      % np.uint64(num_buckets)).astype("int32")
            out = out.append_column("_bucket", pa.array(bucket))
            return out.append_column(
                "_side", pa.array(np.full(n, side, dtype=np.int8)))
        return fn

    tagged = (left_ds.map_batches(prep(0, src_left), batch_format="pyarrow")
              .union(right_ds.map_batches(prep(1, src_right),
                                          batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        right = (g[g["_side"] == 1][[by] + out_rcols]
                 .sort_values(on_r, kind="mergesort"))
        # nullable side of the union turns int64 into float64 — restore
        right = right.astype({c: "int64" for c in int_cols
                              if c in right.columns and c != by})
        left = left.astype({c: "int64" for c in int_cols if c in lcols})
        out = pd.merge_asof(left, right, left_on=on, right_on=on_r,
                            by=by, direction=direction)
        if how == "inner":
            out = out[out[on_r].notna()]
            out = out.astype({c: "int64" for c in int_cols
                              if c in out.columns})
        return out

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")


def range_join_pairs(ds, on: str = "ts", by: str = "user_id",
                     window=None, key_col: str = "event_id",
                     num_buckets: int = 64):
    """Band/range self-join: all ordered pairs (a, b) of rows sharing
    a ``by`` key with 0 < b.on - a.on <= window. Hash-bucket by the
    ``by`` key, one groupby(bucket); inside a bucket the scan is a
    vectorized sorted two-pointer (np.searchsorted per row block),
    never an |n|^2 cross product. Output:
    (by, key_a, key_b, on_a, on_b)."""
    if window is None:
        window = pd.Timedelta(seconds=60)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (_hash64(df[by])
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, on, key_col], kind="mergesort")
        by_out, a_out, b_out, ta_out, tb_out = [], [], [], [], []
        for bval, grp in g.groupby(by, sort=False):
            ts = grp[on].values
            keys = grp[key_col].values
            hi = np.searchsorted(ts, ts + window, side="right")
            for i in range(len(ts)):
                for j in range(i + 1, hi[i]):
                    if ts[j] > ts[i]:  # strict: equal-ts rows not paired
                        by_out.append(bval)
                        a_out.append(keys[i])
                        b_out.append(keys[j])
                        ta_out.append(ts[i])
                        tb_out.append(ts[j])
        return pd.DataFrame({
            by: pd.Series(by_out, dtype=g[by].dtype),
            "key_a": pd.Series(a_out, dtype=g[key_col].dtype),
            "key_b": pd.Series(b_out, dtype=g[key_col].dtype),
            "on_a": pd.Series(ta_out, dtype=g[on].dtype),
            "on_b": pd.Series(tb_out, dtype=g[on].dtype)})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(pairs, batch_format="pandas"))


def bucket_join(left_ds, right_ds, left_on: str, right_on: str | None = None,
                how: str = "inner", num_buckets: int = 64,
                suffix: str = "_r"):
    """General hash-equi-join: both sides bucketed by key hash, ONE
    groupby(bucket), vectorized ``pd.merge`` per bucket. Use when
    neither side fits a broadcast dict. Right-side columns colliding
    with left names get ``suffix``. how: "inner" or "left"."""
    right_on = right_on or left_on
    lcols = list(left_ds.schema().names)
    rcols = [c for c in right_ds.schema().names if c != right_on]
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}
    out_rcols = [rename[c] for c in rcols]
    all_cols = lcols + out_rcols + ["_bucket", "_side"]

    def prep_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (_hash64(df[left_on])
                         % np.uint64(num_buckets)).astype("int32")
        df["_side"] = np.int8(0)
        for c in out_rcols:
            df[c] = None
        return df[all_cols]

    def prep_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=rename)
        if right_on != left_on:
            df = df.rename(columns={right_on: left_on})
        df = df.copy()
        df["_bucket"] = (_hash64(df[left_on])
                         % np.uint64(num_buckets)).astype("int32")
        df["_side"] = np.int8(1)
        for c in lcols:
            if c not in df.columns:
                df[c] = None
        return df[all_cols]

    tagged = (left_ds.map_batches(prep_left, batch_format="pandas")
              .union(right_ds.map_batches(prep_right, batch_format="pandas")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][lcols]
        right = g[g["_side"] == 1][[left_on] + out_rcols]
        return left.merge(right, on=left_on,
                          how="inner" if how == "inner" else "left")

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")


def resolve_keys(dim_ds, key_col: str, keys, value_col: str) -> dict:
    """Resolve a SMALL key set (a top-k result, O(100) keys) against
    an arbitrarily large dimension table WITHOUT collecting the
    dimension: the k keys broadcast once (``ray.put``), the dimension
    streams through a map-side ``pc.is_in`` semi-filter (zero
    shuffle), and only the <=k matching rows return to the driver.

    This replaces the ``{key: name for r in dim.take_all()}``
    whole-dimension collect (a ~100 GB driver materialization at 10^9
    customers) for post-top-k name decoration (reference shape: the
    label-resolution lookups of facet.py:259-281 applied after the
    ranking, not before): at any dimension size the cost is one
    pruned two-column scan that moves k rows.
    """
    import ray

    keylist = list(dict.fromkeys(keys))
    if not keylist:
        return {}
    ref = ray.put(keylist)

    def flt(t: pa.Table) -> pa.Table:
        t = t.select([key_col, value_col])
        if t.num_rows == 0:
            return t
        vs = pa.array(ray.get(ref), type=t.schema.field(key_col).type)
        return t.filter(pc.is_in(t[key_col], value_set=vs))

    rows = dim_ds.map_batches(flt, batch_format="pyarrow").take_all()
    return {r[key_col]: r[value_col] for r in rows}


def collect_dim_small(dim_ds, threshold: int | None = None,
                      batch_size: int = 65536):
    """ONE capped driver scan of a dimension: stream batches until
    either the dataset ends (→ the concatenated DataFrame) or the row
    count exceeds ``threshold`` (→ None, caller takes the distributed
    path). This is the dispatch probe AND the collect in a single
    pass — a separate ``count()`` would execute the dimension
    pipeline twice (measured +0.3-0.5 s per query at sf0.1)."""
    if threshold is None:
        threshold = DIM_BROADCAST_THRESHOLD
    if threshold <= 0:
        return None
    frames = []
    total = 0
    for b in dim_ds.iter_batches(batch_format="pandas",
                                 batch_size=batch_size):
        total += len(b)
        if total > threshold:
            return None
        frames.append(b)
    if not frames:
        cols = dim_ds.schema().names
        return pd.DataFrame({c: [] for c in cols})
    return pd.concat(frames, ignore_index=True)


def attach_dim(fact_ds, dim_ds, fact_key: str, dim_key: str,
               dim_val: str, out_col: str | None = None,
               how: str = "inner", broadcast_threshold: int | None = None,
               num_buckets: int = 64, dim_df=None):
    """Attach ONE dimension attribute column to fact rows, dispatching
    on dimension size (the ``verify_jaccard`` threshold contract):

    - dim rows <= threshold (default ``DIM_BROADCAST_THRESHOLD``):
      collect ``{key: value}`` once, ``ray.put``, tag map-side —
      zero shuffle, the broadcast-dimension fast path;
    - above (or threshold forced to 0 in tests): ``bucket_join`` —
      both sides hash-bucket on the key and meet in ONE exchange;
      nothing materializes on the driver.

    how="inner" drops fact rows without a dimension match (the
    filtering lookup the q5/q7 star arms use); how="left" keeps them
    with a null attribute. Both paths return identical rows — the
    forced-path tests assert it. ``dim_df``: a caller-supplied
    already-collected dimension frame (skips the probe scan when the
    caller needed the dimension driver-side anyway).
    """
    import ray

    if broadcast_threshold is None:
        broadcast_threshold = DIM_BROADCAST_THRESHOLD
    out_col = out_col or dim_val

    def _arrow_type(t):
        # pandas-block datasets report numpy dtypes / object here
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    fact_schema = fact_ds.schema()
    fact_cols = list(fact_schema.names)
    dim_schema = dim_ds.schema()
    val_type = _arrow_type(
        dict(zip(dim_schema.names, dim_schema.types))[dim_val])
    target = pa.schema(
        [(n, _arrow_type(t)) for n, t in zip(fact_schema.names,
                                             fact_schema.types)]
        + [(out_col, val_type)])

    if dim_df is None:
        dim_df = collect_dim_small(dim_ds, broadcast_threshold)
    if dim_df is not None:
        ref = ray.put(dict(zip(dim_df[dim_key], dim_df[dim_val])))

        def tag(df: pd.DataFrame) -> pa.Table:
            df = df.reset_index(drop=True)
            lut = ray.get(ref)
            vals = df[fact_key].map(lut)
            if how == "inner":
                keep = vals.notna().to_numpy()
                df = df[keep].reset_index(drop=True)
                vals = vals[keep].reset_index(drop=True)
            cols = {c: df[c] for c in fact_cols}
            cols[out_col] = vals
            out = pd.DataFrame(cols)
            return pa.Table.from_pandas(out, schema=target,
                                        preserve_index=False)

        return fact_ds.map_batches(tag, batch_format="pandas")

    dim_narrow = dim_ds.select_columns([dim_key, dim_val])
    joined = bucket_join(fact_ds, dim_narrow, left_on=fact_key,
                         right_on=dim_key, how=how,
                         num_buckets=num_buckets)
    joined_val = dim_val + "_r" if dim_val in fact_cols else dim_val

    def restore(df: pd.DataFrame) -> pa.Table:
        df = df.reset_index(drop=True)
        cols = {c: df[c] for c in fact_cols}
        cols[out_col] = df[joined_val]
        out = pd.DataFrame(cols)
        if len(out) == 0:
            return target.empty_table()
        return pa.Table.from_pandas(out, schema=target,
                                    preserve_index=False)

    return joined.map_batches(restore, batch_format="pandas")
