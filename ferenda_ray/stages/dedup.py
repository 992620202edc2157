"""Deduplication family for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard verification,
embedding-cosine near-dup.

The reference is exact-only (SURVEY §2.7); the sketch-based operators
are new design required at 10^12-doc scale, built from the public
MinHash/LSH literature (Broder 1997; Leskovec-Rajaraman-Ullman,
"Mining of Massive Datasets" ch.3 — public) on Ray Data primitives:

    shingle+minhash per batch (vectorized numpy)
      → explode to (band_id, band_hash, key) rows
      → groupby(band) → candidate pairs (bucket-capped against skew)
      → hash-partitioned exact-Jaccard verification (NO driver
        materialization — pairs and doc shingles meet in hash buckets)
      → connected components (driver union-find below a threshold,
        distributed hash-to-min above it) → canonical representative

All hash seeds are fixed constants — results are deterministic across
runs and cluster sizes. Every per-group stage routes through an int
hash-bucket column + one groupby on the bucket + vectorized pandas
inside the bucket (measured ~10x faster than one-pandas-frame-per-
group map_groups at per-document group cardinality).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import lineage

# --- deterministic minhash permutation parameters -----------------------
# Standard 31-bit universal hashing: h_i(x) = (a_i*x + b_i) mod p with
# p = 2^31 - 1 (Mersenne prime), shingles masked to 31 bits, a,b < p.
# Two constraints must BOTH hold:
#  - a*x + b < 2^62 < 2^64, so the uint64 product never silently wraps
#    (a 64-bit x with 61-bit a overflowed and broke the hash family);
#  - a*x + b >> p, so the mod genuinely permutes — if the product
#    stays below p the map is monotonic and every h_i picks the same
#    minimum element, degenerating minhash entirely.
_MERSENNE = (1 << 31) - 1
_RNG = np.random.RandomState(42)
_N_PERM = 64
_A = _RNG.randint(1, _MERSENNE, size=_N_PERM).astype(np.uint64)
_B = _RNG.randint(0, _MERSENNE, size=_N_PERM).astype(np.uint64)
_SHINGLE_MASK = np.uint64((1 << 31) - 1)

# Driver-vs-distributed dispatch knobs (resolved at CALL time so the
# forced-distributed sweep can zero them globally): candidate-pair /
# verify steps collect driver-side below PAIR_DRIVER_THRESHOLD pairs;
# minhash cluster union-find below CLUSTER_DRIVER_THRESHOLD.
PAIR_DRIVER_THRESHOLD = 500_000
CLUSTER_DRIVER_THRESHOLD = 5_000_000
# polynomial-combine / finalizer constants (splitmix64 family — public)
_POLY_MULT = np.uint64(0x100000001B3)  # FNV prime
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _hash_text(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _hash_words(words: list[str]) -> np.ndarray:
    """Vectorized word → uint64 hash (pandas' C siphash over the whole
    array at once — replaces the per-shingle blake2b Python loop that
    was the minhash inner-loop bottleneck). ``categorize=True`` (the
    default) factorizes first, so repeated words hash once."""
    if not words:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(words, dtype=object))


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer so the low 31 bits of the rolling
    polynomial are well-distributed before masking."""
    h = h ^ (h >> np.uint64(33))
    h = h * _GOLDEN
    return h ^ (h >> np.uint64(29))


def _bucket_of(series: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic int32 hash bucket of an arbitrary key column.
    String keys are hashed via pandas' C hashing — join composite keys
    with \\x1f, never \\x00 (C string hashing truncates at NULs)."""
    h = pd.util.hash_pandas_object(series, index=False).values
    return (h % np.uint64(num_buckets)).astype("int32")


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep one representative (min key) per identical text.
    Map-side md5, int hash-bucket shuffle (only the bucket column is
    the groupby key — never one Ray group per distinct text), then a
    vectorized per-bucket drop_duplicates."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = df[text_col].map(_hash_text)
        df["_bucket"] = _bucket_of(df["_h"], num_buckets)
        return df

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", key_col], kind="mergesort")
        g = g.drop_duplicates(subset=["_h"])
        return g.drop(columns=["_h", "_bucket"])

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------
# shingles + minhash (vectorized)
# ---------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → 31-bit hashes, fully vectorized:
    hash every word once (C siphash), then a rolling polynomial over
    k consecutive word hashes + a splitmix finalizer. No per-gram
    Python loop (the previous blake2b-per-shingle loop made minhash
    the second-slowest bench query)."""
    words = text.split()
    wh = _hash_words(words)
    if len(wh) == 0:
        return np.empty(0, dtype=np.uint64)
    n = max(1, len(wh) - k + 1)
    kk = min(k, len(wh))
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(kk):  # k tiny → k vectorized passes
        acc = acc * _POLY_MULT + wh[j:j + n]
    return _mix(acc) & _SHINGLE_MASK


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(n_shingles,) → (_N_PERM,) signature via (a*x+b) mod p."""
    if len(sh) == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    prod = (sh[:, None] * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return prod.min(axis=0)


def minhash_bands(ds, text_col: str = "text", key_col: str = "doc_id",
                  bands: int = 16, shingle_k: int = 3):
    """docs → (band_id, band_hash, key) rows: the LSH explode stage.
    Band hashes are int64 (polynomial over the band's signature rows,
    vectorized across the whole batch) — ints shuffle cheaper than
    hex strings and any rare collision is removed by exact verify."""
    rows_per_band = _N_PERM // bands

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "band_id": pd.Series(dtype="int32"),
                "band_hash": pd.Series(dtype="int64"),
                "key": df[key_col]})
        sigs = np.stack([
            minhash_signature(shingle_hashes(t, shingle_k))
            for t in df[text_col]])  # (n_docs, _N_PERM)
        band_hash = np.empty((len(df), bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            acc = np.full(len(df), np.uint64(b + 1), dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * _POLY_MULT + chunk[:, j]
            band_hash[:, b] = _mix(acc)
        return pd.DataFrame({
            "band_id": np.tile(np.arange(bands, dtype=np.int32), len(df)),
            "band_hash": band_hash.reshape(-1).view("int64"),
            "key": np.repeat(df[key_col].values, bands),
        })

    return ds.map_batches(explode, batch_format="pandas")


def _dedup_pairs(pairs_ds, extra_cols=(), num_buckets: int = 64):
    """Distinct (key_a, key_b) rows — bucket-hash shuffle + vectorized
    per-bucket drop_duplicates (first row wins, deterministic because
    every stage upstream emits pairs in sorted-key order)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            out = {"key_a": [], "key_b": []}
            out.update({c: [] for c in extra_cols})
            out["_bucket"] = pd.Series(dtype="int32")
            return pd.DataFrame(out)
        df = df.copy()
        joined = df["key_a"].astype(str) + "\x1f" + df["key_b"].astype(str)
        df["_bucket"] = _bucket_of(joined, num_buckets)
        return df

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["key_a", "key_b"], kind="mergesort")
                .drop_duplicates(subset=["key_a", "key_b"])
                .drop(columns=["_bucket"]))

    return (pairs_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(bucket_dedup, batch_format="pandas"))


def lsh_candidate_pairs(band_ds, max_bucket: int = 64,
                        num_buckets: int = 64, dedup: bool = True):
    """groupby hash-bucket of (band_id, band_hash) → unordered
    candidate key pairs. LSH buckets larger than ``max_bucket`` are
    truncated after sorting (deterministic) — the documented skew
    guard: a degenerate bucket (e.g. boilerplate pages) would
    otherwise emit |bucket|² pairs.

    ``dedup=False`` skips the cross-band pair dedup exchange — callers
    whose downstream stage already groups by (key_a, key_b) (the
    verify step does) get dedup for free and save a full shuffle."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (
            (df["band_hash"].values.view("uint64")
             + df["band_id"].values.astype("uint64") * _GOLDEN)
            % np.uint64(num_buckets)).astype("int32")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            keys = sorted(set(grp["key"]))[:max_bucket]
            for i in range(len(keys)):
                for j in range(i + 1, len(keys)):
                    a_out.append(keys[i])
                    b_out.append(keys[j])
        return pd.DataFrame({"key_a": pd.Series(a_out, dtype=g["key"].dtype),
                             "key_b": pd.Series(b_out, dtype=g["key"].dtype)})

    cand = (band_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(pairs, batch_format="pandas"))
    if not dedup:
        return cand
    # dedup pairs found in multiple bands
    return _dedup_pairs(cand, num_buckets=num_buckets)


def verify_jaccard(pairs_ds, docs_ds, text_col: str = "text",
                   key_col: str = "doc_id", threshold: float = 0.8,
                   shingle_k: int = 3, num_buckets: int = 64,
                   driver_threshold: int | None = None):
    """Exact n-gram Jaccard over candidate pairs. Always returns a
    Dataset(key_a, key_b, jaccard) with distinct pairs.

    Two paths, mirroring canonicalize.canonical_map's threshold
    dispatch: candidate sets are orders of magnitude smaller than the
    corpus, so below ``driver_threshold`` pairs the shingle sets of
    ONLY the candidate keys are collected and verified driver-side
    (2 executions, no extra exchange — measured ~2s faster at bench
    scale). Above it — the 100-TB crawl whose candidate set does not
    fit one machine — the fully distributed two-sided hash-partitioned
    tag join runs:

    1. pairs explode to one row per SIDE, keyed by that side's doc
       key; docs project to (key, sorted unique shingle array). Both
       carry the same int hash-bucket of the key, meet in ONE
       groupby(bucket), and each pair-side row picks up its doc's
       shingles via a vectorized in-bucket merge.
    2. the two enriched sides of each pair meet in a second
       groupby(pair-hash bucket); exact Jaccard per pair, threshold
       filter.
    """
    import ray
    import ray.data as rd

    if driver_threshold is None:
        driver_threshold = PAIR_DRIVER_THRESHOLD
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= driver_threshold:
        pairs_df = pairs_ds.to_pandas()
        if len(pairs_df) == 0 or "key_a" not in pairs_df.columns:
            return rd.from_pandas(pd.DataFrame(
                {"key_a": pd.Series(dtype="int64"),
                 "key_b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}))
        pairs_df = pairs_df.drop_duplicates(subset=["key_a", "key_b"])
        keys_ref = ray.put(set(pairs_df["key_a"]) | set(pairs_df["key_b"]))

        def collect(df: pd.DataFrame) -> pa.Table:
            # Arrow list<uint64> out: pandas object columns of ndarrays
            # get ragged-tensor-typed on non-empty batches but stay
            # object on empty ones — mixed block schemas that trip
            # Ray's consistency check and its size estimator
            needed = ray.get(keys_ref)
            sel = df[df[key_col].isin(needed)]
            return pa.table({
                "key": pa.array(sel[key_col].to_numpy(dtype="int64"),
                                pa.int64()),
                "sh": pa.array(
                    [np.unique(shingle_hashes(t or "", shingle_k))
                     for t in sel[text_col]],
                    pa.list_(pa.uint64()))})

        sh_df = docs_ds.map_batches(collect, batch_format="pandas").to_pandas()
        sh = {k: np.asarray(v, dtype=np.uint64)
              for k, v in zip(sh_df["key"], sh_df["sh"])}
        empty = np.empty(0, dtype=np.uint64)
        out = []
        for a, b in zip(pairs_df["key_a"], pairs_df["key_b"]):
            sa, sb = sh.get(a, empty), sh.get(b, empty)
            union = len(np.union1d(sa, sb))
            j = (len(np.intersect1d(sa, sb)) / union) if union else 0.0
            if j >= threshold:
                out.append((a, b, j))
        return rd.from_pandas(pd.DataFrame(
            out, columns=["key_a", "key_b", "jaccard"]).astype(
            {"jaccard": "float64"}) if out else pd.DataFrame(
            {"key_a": pd.Series(dtype=pairs_df["key_a"].dtype),
             "key_b": pd.Series(dtype=pairs_df["key_b"].dtype),
             "jaccard": pd.Series(dtype="float64")}))

    def explode_sides(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            return pd.DataFrame({
                "_k": [], "key_a": [], "key_b": [],
                "_side": pd.Series(dtype="int8"),
                "_sh": pd.Series(dtype=object),
                "_bucket": pd.Series(dtype="int32")})
        both = pd.concat([
            pd.DataFrame({"_k": df["key_a"], "key_a": df["key_a"],
                          "key_b": df["key_b"],
                          "_side": np.int8(0)}),
            pd.DataFrame({"_k": df["key_b"], "key_a": df["key_a"],
                          "key_b": df["key_b"],
                          "_side": np.int8(1)}),
        ], ignore_index=True)
        # placeholder with the SAME Arrow type (list<int64>) as the doc
        # side — a None column would type as null and break the union
        both["_sh"] = [np.empty(0, dtype="int64")] * len(both)
        both["_bucket"] = _bucket_of(both["_k"], num_buckets)
        return both

    def doc_shingles(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "_k": df[key_col],
            "key_a": df[key_col],  # schema-aligned with pair rows
            "key_b": df[key_col],
            "_side": np.int8(-1),
            "_sh": [np.unique(shingle_hashes(t or "", shingle_k))
                    .astype("int64") for t in df[text_col]],
        })
        out["_bucket"] = _bucket_of(out["_k"], num_buckets)
        return out

    sides = pairs_ds.map_batches(explode_sides, batch_format="pandas")
    docs = docs_ds.map_batches(doc_shingles, batch_format="pandas")

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["_side"] == -1
        sh = dict(zip(g.loc[is_doc, "_k"], g.loc[is_doc, "_sh"]))
        p = g[~is_doc]
        if len(p) == 0:
            return pd.DataFrame({
                "key_a": pd.Series(dtype=g["key_a"].dtype),
                "key_b": pd.Series(dtype=g["key_b"].dtype),
                "_side": pd.Series(dtype="int8"),
                "_sh": pd.Series(dtype=object),
                "_bucket": pd.Series(dtype="int32")})
        out = p[["key_a", "key_b", "_side"]].copy()
        empty = np.empty(0, dtype="int64")
        out["_sh"] = [sh.get(k, empty) for k in p["_k"]]
        joined = out["key_a"].astype(str) + "\x1f" + out["key_b"].astype(str)
        out["_bucket"] = _bucket_of(joined, num_buckets)
        return out

    enriched = sides.union(docs).groupby("_bucket").map_groups(
        attach, batch_format="pandas")

    def jaccard(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, j_out = [], [], []
        for (ka, kb), grp in g.groupby(["key_a", "key_b"], sort=False):
            sh_by_side = {s: v for s, v in zip(grp["_side"], grp["_sh"])}
            sa = np.asarray(sh_by_side.get(0, ()), dtype="int64")
            sb = np.asarray(sh_by_side.get(1, ()), dtype="int64")
            union = len(np.union1d(sa, sb))
            j = (len(np.intersect1d(sa, sb)) / union) if union else 0.0
            if j >= threshold:
                a_out.append(ka)
                b_out.append(kb)
                j_out.append(j)
        return pd.DataFrame({
            "key_a": pd.Series(a_out, dtype=g["key_a"].dtype),
            "key_b": pd.Series(b_out, dtype=g["key_b"].dtype),
            "jaccard": pd.Series(j_out, dtype="float64")})

    return enriched.groupby("_bucket").map_groups(
        jaccard, batch_format="pandas")


def minhash_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                  threshold: float = 0.8, bands: int = 16,
                  shingle_k: int = 3, driver_threshold: int | None = None):
    """Full near-dup pipeline → (key, canonical_key) for every doc in
    a near-dup cluster (canonical = min key over the verified pair
    graph).

    Clustering mirrors canonicalize.canonical_map: verified pairs
    below ``driver_threshold`` run exact driver union-find (pairs are
    orders of magnitude smaller than the corpus); above it the
    distributed hash-to-min connected components take over and the
    result stays a Dataset end to end.
    """
    from .canonicalize import connected_components_distributed, union_find

    if driver_threshold is None:
        driver_threshold = CLUSTER_DRIVER_THRESHOLD
    bands_ds = minhash_bands(ds, text_col, key_col, bands, shingle_k)
    # dedup=False: verify_jaccard's (key_a, key_b) grouping dedups
    # multi-band hits for free — one whole exchange saved
    cand = lsh_candidate_pairs(bands_ds, dedup=False)
    verified = verify_jaccard(cand, ds, text_col, key_col, threshold,
                              shingle_k, driver_threshold=driver_threshold)
    verified = verified.materialize()
    n_pairs = verified.count()
    if n_pairs <= driver_threshold:
        pairs_df = verified.to_pandas()
        if len(pairs_df) == 0:
            return pd.DataFrame(columns=["key", "canonical_key"])
        # native key types (ints order numerically; str() would make
        # "101" < "5" and pick the wrong canonical representative)
        canon = union_find(list(zip(pairs_df["key_a"], pairs_df["key_b"])))
        return pd.DataFrame(
            [(k, c) for k, c in sorted(canon.items())],
            columns=["key", "canonical_key"],
        )
    edges = verified.map_batches(
        lambda df: pd.DataFrame({"uri_a": df["key_a"],
                                 "uri_b": df["key_b"]}),
        batch_format="pandas")
    labels = connected_components_distributed(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({"key": df["node"],
                                 "canonical_key": df["label"]}),
        batch_format="pandas")


# ---------------------------------------------------------------------
# exact n-gram Jaccard similarity self-join (no LSH approximation)
# ---------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str = "text", key_col: str = "doc_id",
                        threshold: float = 0.5, shingle_k: int = 3,
                        num_buckets: int = 64, max_posting: int = 1024,
                        driver_threshold: int | None = None):
    """EXACT n-gram Jaccard similarity self-join — the deterministic
    sibling of minhash_dedup (no LSH false negatives), via the
    prefix-filtering principle of AllPairs / PPJoin (Bayardo, Ma &
    Srikant, WWW'07; Xiao et al., WWW'08 — public): under one global
    total order on shingles (numeric hash value here), any two sets
    with Jaccard >= t share at least one shingle inside each one's
    prefix of length |S| - ceil(t*|S|) + 1. So exploding ONLY prefix
    shingles to (shingle, key) rows and pairing within equal shingles
    yields a complete candidate set — orders of magnitude smaller than
    a full inverted index — which exact verify_jaccard then filters.

    Returns Dataset(key_a, key_b, jaccard) with key_a < key_b.

    Scale notes: the shuffle key is an int hash bucket of the shingle,
    never one Ray group per shingle; a posting list longer than
    ``max_posting`` keys is truncated after a deterministic sort (a
    shingle shared by >1024 doc PREFIXES is boilerplate — same skew
    guard and caveat as lsh_candidate_pairs' max_bucket). Prefixes
    shrink as the threshold rises, so the explode stage emits
    ~(1-t)·|shingles| rows, not |shingles|.
    """
    import math

    def explode_prefix(df: pd.DataFrame) -> pd.DataFrame:
        sh_out, key_out = [], []
        for k, t in zip(df[key_col], df[text_col]):
            sh = np.unique(shingle_hashes(t or "", shingle_k))
            n = len(sh)
            if n == 0:
                continue
            p = n - int(math.ceil(threshold * n)) + 1
            sh_out.append(sh[:p])
            key_out.append(np.full(p, k))
        if not sh_out:
            return pd.DataFrame({
                "shingle": pd.Series(dtype="int64"),
                "key": pd.Series(dtype=df[key_col].dtype),
                "_bucket": pd.Series(dtype="int32")})
        out = pd.DataFrame({
            "shingle": np.concatenate(sh_out).astype("int64"),
            "key": np.concatenate(key_out)})
        out["_bucket"] = (
            (out["shingle"].values.view("uint64") * _GOLDEN)
            % np.uint64(num_buckets)).astype("int32")
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("shingle", sort=False):
            if len(grp) < 2:
                continue
            keys = sorted(set(grp["key"]))[:max_posting]
            for i in range(len(keys)):
                for j in range(i + 1, len(keys)):
                    a_out.append(keys[i])
                    b_out.append(keys[j])
        return pd.DataFrame({"key_a": pd.Series(a_out, dtype=g["key"].dtype),
                             "key_b": pd.Series(b_out, dtype=g["key"].dtype)})

    # dedup of multi-shingle hits is free inside verify_jaccard's
    # (key_a, key_b) grouping — no separate pair-dedup exchange
    cand = (ds.map_batches(explode_prefix, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(pairs, batch_format="pandas"))
    return verify_jaccard(cand, ds, text_col, key_col, threshold,
                          shingle_k, num_buckets=num_buckets,
                          driver_threshold=driver_threshold)


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash63(text: str) -> int:
    """63-bit SimHash over word features (Charikar 2002, public).
    63 bits (not 64) so the value fits a signed int64 column and
    survives Arrow/pandas round-trips without float degradation.
    Vectorized: hash all words in one pass, unpack bit matrix, sum."""
    wh = _hash_words(text.split())
    if len(wh) == 0:
        return 0
    bits = np.unpackbits(
        wh.view(np.uint8).reshape(len(wh), 8), axis=1,
        bitorder="little")[:, :63]  # (n_words, 63)
    acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
    val = np.uint64(0)
    for j in range(63):
        if acc[j] > 0:
            val |= np.uint64(1) << np.uint64(j)
    return int(val)


simhash64 = simhash63  # historical alias


def simhash63_md5(text: str) -> int:
    """SQL-replicable sibling of :func:`simhash63`: the word feature
    hash is the low 63 bits of the md5-prefix integer
    (``int(md5(w)[:16 hex], 16)`` — the transform.hash_split
    convention), so a DuckDB oracle recomputes every simhash AND every
    Hamming distance bit-exactly (bit_count(xor(a, b))). Word
    multiplicity weights the bit votes, same as simhash63. md5 runs
    once per DISTINCT word (factorize); prefer simhash63's C siphash
    for pure-throughput paths."""
    import hashlib

    words = text.split()
    if not words:
        return 0
    codes, uniq = pd.factorize(np.asarray(words, dtype=object))
    h = np.array(
        [int(hashlib.md5(str(w).encode("utf-8")).hexdigest()[:16], 16)
         for w in uniq], dtype=np.uint64)
    h &= np.uint64((1 << 63) - 1)
    counts = np.bincount(codes).astype(np.int64)
    bits = np.unpackbits(
        h.view(np.uint8).reshape(len(h), 8), axis=1,
        bitorder="little")[:, :63]
    acc = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
    val = np.uint64(0)
    for j in range(63):
        if acc[j] > 0:
            val |= np.uint64(1) << np.uint64(j)
    return int(val)


def simhash_candidates(ds, text_col: str = "text", key_col: str = "doc_id",
                       n_tables: int = 4, hasher=simhash63):
    """Split the 63-bit simhash into ``n_tables`` sub-keys — docs
    within Hamming distance n_tables-1 share at least one
    (pigeonhole). Emits (table_id, sub_key, key, simhash)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        width = 63 // n_tables
        mask = (1 << width) - 1
        hashes = np.array([hasher(t or "") for t in df[text_col]],
                          dtype=np.int64)
        tids = np.tile(np.arange(n_tables, dtype=np.int32), len(df))
        rep = np.repeat(hashes, n_tables)
        shifts = np.tile(np.arange(n_tables) * width, len(df))
        subs = (rep.view(np.uint64) >> shifts.astype(np.uint64)) \
            & np.uint64(mask)
        return pd.DataFrame({
            "table_id": tids,
            "sub_key": subs.view(np.int64),
            "key": np.repeat(df[key_col].values, n_tables),
            "simhash": rep,
        })

    return ds.map_batches(explode, batch_format="pandas")


def simhash_dedup_pairs(ds, text_col: str = "text", key_col: str = "doc_id",
                        max_hamming: int = 3, n_tables: int = 4,
                        max_bucket: int = 64, num_buckets: int = 64,
                        hasher=simhash63):
    """(key_a, key_b, hamming) pairs within the Hamming threshold.
    Pigeonhole-EXACT for max_hamming <= n_tables - 1 (up to the
    max_bucket skew cap): <= n_tables-1 differing bits can touch at
    most n_tables-1 of the sub-keys, so some table still collides."""
    cand = simhash_candidates(ds, text_col, key_col, n_tables, hasher)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (
            (df["sub_key"].values.view("uint64")
             + df["table_id"].values.astype("uint64") * _GOLDEN)
            % np.uint64(num_buckets)).astype("int32")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, d = [], [], []
        for _, grp in g.groupby(["table_id", "sub_key"], sort=False):
            if len(grp) < 2:
                continue
            rows = sorted(set(zip(grp["key"], grp["simhash"])))[:max_bucket]
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                    if ham <= max_hamming and rows[i][0] != rows[j][0]:
                        a.append(rows[i][0])
                        b.append(rows[j][0])
                        d.append(ham)
        return pd.DataFrame({"key_a": pd.Series(a, dtype=g["key"].dtype),
                             "key_b": pd.Series(b, dtype=g["key"].dtype),
                             "hamming": pd.Series(d, dtype="int64")})

    found = (cand.map_batches(add_bucket, batch_format="pandas")
             .groupby("_bucket")
             .map_groups(pairs, batch_format="pandas"))
    return _dedup_pairs(found, extra_cols=("hamming",),
                        num_buckets=num_buckets)


# ---------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------

def embedding_neardup_pairs(ds, vec_col: str = "embedding",
                            key_col: str = "vec_id",
                            threshold: float = 0.95,
                            n_planes: int = 12,
                            num_buckets: int = 64):
    """Random-hyperplane LSH bucketing (deterministic seed) →
    in-bucket exact cosine verification. Returns
    (key_a, key_b, cosine ≥ threshold)."""
    planes_by_dim: dict[int, np.ndarray] = {}

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "key": [], "unit": []})
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        dim = vecs.shape[1]
        if dim not in planes_by_dim:
            planes_by_dim[dim] = np.random.RandomState(1234).randn(dim, n_planes)
        proj = vecs @ planes_by_dim[dim]
        sig = (proj > 0).astype(np.uint64)
        bucket = np.zeros(len(df), dtype=np.uint64)
        for i in range(n_planes):
            bucket = (bucket << np.uint64(1)) | sig[:, i]
        norm = np.linalg.norm(vecs, axis=1)
        norm[norm == 0] = 1.0
        unit = vecs / norm[:, None]
        return pd.DataFrame({
            "bucket": bucket.astype("int64"),
            "key": list(df[key_col]),
            # lists (not ndarrays) so the column Arrow-serializes as
            # list<double> across the shuffle
            "unit": [u.tolist() for u in unit],
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = list(g["key"])
        units = np.stack(list(g["unit"]))
        sims = units @ units.T
        a, b, c = [], [], []
        order = np.argsort(keys, kind="mergesort")
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if sims[i, j] >= threshold:
                    a.append(keys[i])
                    b.append(keys[j])
                    c.append(float(sims[i, j]))
        return pd.DataFrame({"key_a": a, "key_b": b, "cosine": c})

    found = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return _dedup_pairs(found, extra_cols=("cosine",),
                        num_buckets=num_buckets)


# ---------------------------------------------------------------------
# edit-distance-1 similarity self-join (FastSS deletion neighborhood)
# ---------------------------------------------------------------------

def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check in O(len) (no DP table)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_join_pairs(ds, text_col: str = "name", key_col: str = "key",
                     num_buckets: int = 256):
    """All unordered key pairs whose strings are within edit distance
    1 — EXACT, via the FastSS deletion-neighborhood principle (Bocek
    et al. 2007, public): ed(a, b) <= 1 implies a and b share a
    signature in {s} ∪ single-deletions(s). Scale shape: signatures
    explode map-side (len+1 short rows per string — the only thing
    that grows), signature-HASH buckets co-locate candidates (never
    one Ray group per signature), exact O(len) verify per in-bucket
    signature group, then the bucketed ``_dedup_pairs`` exchange
    collapses pairs found under several signatures. No candidate cap:
    a signature's group is exactly the ed<=1 neighborhood that must
    be enumerated anyway, so truncation would trade exactness for
    nothing."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        keys, names, sigs = [], [], []
        for k, s in zip(df[key_col], df[text_col]):
            s = s or ""
            for sig in {s} | {s[:i] + s[i + 1:] for i in range(len(s))}:
                keys.append(k)
                names.append(s)
                sigs.append(sig)
        out = pd.DataFrame({"key": pd.Series(keys, dtype="int64"),
                            "name": pd.Series(names, dtype="object"),
                            "sig": pd.Series(sigs, dtype="object")})
        out["_bucket"] = _bucket_of(out["sig"], num_buckets)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("sig", sort=False):
            if len(grp) < 2:
                continue
            rows = sorted(set(zip(grp["key"], grp["name"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if (rows[i][0] != rows[j][0]
                            and _ed_le1(rows[i][1], rows[j][1])):
                        a_out.append(rows[i][0])
                        b_out.append(rows[j][0])
        return pd.DataFrame({"key_a": pd.Series(a_out, dtype="int64"),
                             "key_b": pd.Series(b_out, dtype="int64")})

    found = (ds.map_batches(explode, batch_format="pandas")
             .groupby("_bucket")
             .map_groups(pairs, batch_format="pandas"))
    return _dedup_pairs(found, num_buckets=num_buckets)


# ---------------------------------------------------------------------
# duplicated passages (exact substring dedup at word-n-gram grain)
# ---------------------------------------------------------------------

def duplicated_passages(ds, n: int = 6, text_col: str = "text",
                        key_col: str = "doc_id", min_docs: int = 2,
                        num_buckets: int = 64):
    """Cross-document exact duplicated-passage detector: every word
    n-gram that occurs in >= min_docs DISTINCT documents, with its
    document frequency. The passage-granularity counterpart of
    ``exact_dedup`` (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22 — exact-substring dedup, here at
    fixed n-gram grain instead of suffix arrays).

    Scale shape: each doc emits its DISTINCT grams once (doc-local
    combiner — repeats inside a doc never reach the exchange); grams
    are hash-bucketed into ``num_buckets`` Ray groups (never one group
    per gram); the per-bucket pandas nunique filter ships only
    (gram, key) pairs, never full text. At 100 TB you would exchange a
    64-bit gram hash and re-derive the passage text from one
    representative doc; the gram string is kept here because it makes
    the output directly SQL-comparable.

    Tokenization is a single-space split (``text.split(" ")``) —
    pinned to match SQL ``string_split(text, ' ')`` exactly.
    """

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        keys_out, grams_out = [], []
        for k, txt in zip(df[key_col], df[text_col]):
            words = (txt or "").split(" ")
            seen = {" ".join(words[i:i + n])
                    for i in range(len(words) - n + 1)}
            keys_out.extend([k] * len(seen))
            grams_out.extend(seen)
        out = pd.DataFrame({"gram": pd.Series(grams_out, dtype="object"),
                            "key": pd.Series(keys_out, dtype="int64")})
        out["_bucket"] = _bucket_of(out["gram"], num_buckets)
        return out

    def dups(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("gram", sort=False)["key"].nunique()
        cnt = cnt[cnt >= min_docs]
        return pd.DataFrame({"gram": cnt.index.to_numpy(dtype=object),
                             "n_docs": cnt.to_numpy(dtype="int64")})

    return (ds.map_batches(grams, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(dups, batch_format="pandas"))


def _restore_int64(g: pd.DataFrame, cols) -> pd.DataFrame:
    """Undo a float64 upcast at group entry. Ray's sort exchange can
    concatenate a typed pandas block with an EMPTY default-float
    frame (phantom blocks emitted for empty sort partitions bypass
    upstream UDFs — see the RefBundle schema note in CLAUDE.md);
    ``pd.concat`` then upcasts every int64 column of the whole group
    to float64. Observed only when a ``map_groups`` OUTPUT feeds a
    second exchange (the two-chained-exchange family). The cast back
    is exact for values < 2^53 — doc keys and word offsets here — and
    asserts rather than corrupt beyond that."""
    if len(g) == 0:
        return g
    fix = {}
    for c in cols:
        if str(g[c].dtype) != "int64":
            v = g[c].to_numpy()
            assert not np.isnan(v).any() and np.abs(v).max() < 2 ** 53, (
                "int64 column %r upcast with un-restorable values "
                "(dtypes=%s) — an upstream prep fn is index-misaligned?"
                % (c, dict(g.dtypes)))
            fix[c] = "int64"
    return g.astype(fix) if fix else g


def scrub_duplicated_passages(ds, n: int = 6, text_col: str = "text",
                              key_col: str = "doc_id", min_docs: int = 2,
                              num_buckets: int = 64):
    """Exact-substring SCRUBBING — the removal counterpart of
    :func:`duplicated_passages` (Lee et al. ACL'22 exact-substring
    dedup at fixed word-n-gram grain): every word position covered by
    an n-gram that occurs in >= ``min_docs`` DISTINCT documents is
    dropped; returns (key, clean_text) for EVERY input doc, surviving
    words joined by single spaces (whitespace is normalized by the
    same ``split(" ")`` / SQL ``string_split(text, ' ')`` convention
    as the detector).

    Scale shape — two exchanges, text crosses only the second:

    1. all n-gram OCCURRENCES (gram, key, start) hash-bucketed by
       gram; the per-bucket nunique(key) filter emits only duplicated
       grams' (key, start) pairs — narrow ints;
    2. those pairs union the (key, text) docs into ONE key-hash-bucket
       exchange; the per-bucket rebuild masks covered spans and joins
       survivors — doc-local, vectorized mask per doc.

    At 100 TB the gram exchange would carry a 64-bit gram hash
    instead of the string (the detector's documented variant).
    """

    def occurrences(df: pd.DataFrame) -> pd.DataFrame:
        keys, starts, grams_ = [], [], []
        for k, txt in zip(df[key_col], df[text_col]):
            words = (txt or "").split(" ")
            for i in range(len(words) - n + 1):
                grams_.append(" ".join(words[i:i + n]))
                starts.append(i)
                keys.append(k)
        out = pd.DataFrame({
            "gram": pd.Series(grams_, dtype="object"),
            "key": pd.Series(keys, dtype="int64"),
            "start": pd.Series(starts, dtype="int64"),
        })
        out["_bucket"] = _bucket_of(out["gram"], num_buckets)
        return out

    def covered(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="int64")})
        nun = g.groupby("gram", sort=False)["key"].transform("nunique")
        d = g[nun >= min_docs]
        return pd.DataFrame({"key": d["key"].astype("int64"),
                             "start": d["start"].astype("int64")})

    cov = lineage.exchange(
        lineage.derive(
            ds.map_batches(occurrences, batch_format="pandas"), ds),
        lambda d: d.groupby("_bucket").map_groups(
            covered, batch_format="pandas"))

    def _key_bucket(s: pd.Series) -> np.ndarray:
        h = s.to_numpy(dtype="int64").astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_buckets)).astype("int32")

    def prep_docs(df: pd.DataFrame) -> pd.DataFrame:
        # batches sliced out of large blocks carry a NON-zero-based
        # index; mixing df-indexed columns with fresh positional
        # Series in one constructor would index-align into NaN rows
        df = df.reset_index(drop=True)
        out = pd.DataFrame({
            "key": df[key_col].astype("int64"),
            "text": df[text_col].astype("object"),
            "start": pd.Series(np.full(len(df), -1, dtype="int64")),
        })
        out["_b"] = _key_bucket(out["key"])
        return out

    def prep_cov(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # see prep_docs
        out = pd.DataFrame({
            "key": df["key"].astype("int64"),
            "text": pd.Series([None] * len(df), dtype="object"),
            "start": df["start"].astype("int64"),
        })
        out["_b"] = _key_bucket(out["key"])
        return out

    both = lineage.union_tracked(
        lineage.derive(
            ds.map_batches(prep_docs, batch_format="pandas"), ds),
        lineage.derive(cov.map_batches(prep_cov, batch_format="pandas"),
                       cov))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = _restore_int64(g, ("key", "start"))
        docs = g[g["start"] < 0]
        starts_by_key = (g[g["start"] >= 0]
                         .groupby("key")["start"].apply(list).to_dict())
        keys_out, texts_out = [], []
        for k, txt in zip(docs["key"], docs["text"]):
            words = (txt or "").split(" ")
            starts = starts_by_key.get(k)
            if starts:
                mask = np.zeros(len(words), dtype=bool)
                for i in starts:
                    mask[i:i + n] = True
                kept = [w for w, m in zip(words, mask) if not m]
            else:
                kept = words
            keys_out.append(k)
            texts_out.append(" ".join(kept))
        return pd.DataFrame({
            "key": pd.Series(keys_out, dtype="int64"),
            "clean_text": pd.Series(texts_out, dtype="object"),
        })

    return lineage.exchange(
        both, lambda d: d.groupby("_b").map_groups(
            rebuild, batch_format="pandas"))


# ---------------------------------------------------------------------
# winnowing fingerprints (MOSS-style local fingerprinting)
# ---------------------------------------------------------------------

def winnow_fingerprints(ds, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        key_col: str = "doc_id"):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm; the LOCAL-fingerprint
    counterpart of text_analysis.fingerprint's whole-doc hashes):
    hash every word k-gram, slide a w-wide window over the hash
    sequence, and in each window select the minimum hash — rightmost
    occurrence on ties — recording each selected (position, hash)
    once. Guarantees every shared substring of >= w+k-1 words yields a
    shared fingerprint, with ~2/(w+1) density.

    Doc-local, zero-shuffle map (fuses with the read); the window
    minimum is one vectorized sliding_window_view pass per doc with
    the rightmost-tie rule done by reversed argmin. Returns
    Dataset(key, pos, fp) where pos is the 1-based k-gram start.

    Gram hash = the md5-prefix convention (int(md5(gram)[:15hex],16))
    so a SQL oracle recomputes every fingerprint exactly; a 100-TB
    deployment would swap in shingle_hashes' vectorized rolling
    polynomial (documented trade: SQL parity vs per-gram throughput).
    Short docs (fewer than w grams) are one truncated window, per the
    paper's convention.
    """
    import hashlib

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        keys_out, pos_out, fp_out = [], [], []
        for key, txt in zip(df[key_col], df[text_col]):
            words = (txt or "").split(" ")
            n = len(words) - k + 1
            if n < 1:
                continue
            grams = [" ".join(words[i:i + k]) for i in range(n)]
            h = np.array(
                [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                 for g in grams], dtype=np.int64)
            if n <= w:
                # single truncated window: rightmost global min
                mn = h.min()
                pos = int(np.flatnonzero(h == mn)[-1])
                sel = {(pos, int(mn))}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, w)
                rev_arg = np.argmin(sw[:, ::-1], axis=1)
                idx = np.arange(len(sw)) + (w - 1 - rev_arg)
                sel = set(zip(idx.tolist(), h[idx].tolist()))
            for p, fp in sorted(sel):
                keys_out.append(key)
                pos_out.append(p + 1)  # 1-based, matches SQL series
                fp_out.append(fp)
        return pd.DataFrame({
            "key": pd.Series(keys_out, dtype="int64"),
            "pos": pd.Series(pos_out, dtype="int64"),
            "fp": pd.Series(fp_out, dtype="int64"),
        })

    return ds.map_batches(per_batch, batch_format="pandas")


# ---------------------------------------------------------------------
# benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------

def _contamination_hits(docs_ds, bench_ds, n: int,
                        text_col: str, key_col: str, num_buckets: int):
    """Contaminated-key detector shared by :func:`contamination_flags`
    and :func:`decontaminate`: every training key sharing >= 1 word
    n-gram with the bench side, as a (key) Dataset. A key matching in
    several gram buckets appears once PER BUCKET — consumers treat the
    output as a set. ONE gram-hash-bucketed exchange; text never
    crosses (each side ships only its distinct grams — doc-local
    combiner — plus the train key)."""

    # the exchange carries the md5-prefix int64 of each gram, never
    # the gram string — ~8 bytes/gram instead of n words. The oracle
    # stays exact because SQL computes the IDENTICAL hash on both
    # sides of its join (a shared collision flags the same pair in
    # both engines; at 60 bits over a benchmark-sized gram set the
    # collision odds are negligible AND parity-neutral).
    import hashlib

    def grams_of(side: int, with_key: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keys_out, grams_out = [], []
            for k, txt in zip(df[key_col], df[text_col]):
                words = (txt or "").split(" ")
                seen = {" ".join(words[i:i + n])
                        for i in range(len(words) - n + 1)}
                keys_out.extend([int(k) if with_key else -1] * len(seen))
                grams_out.extend(seen)
            gh = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                 for g in grams_out], dtype=np.int64)
            out = pd.DataFrame({
                "gram": pd.Series(gh, dtype="int64"),
                "key": pd.Series(keys_out, dtype="int64"),
                "side": pd.Series(np.full(len(grams_out), side,
                                          dtype="int64")),
            })
            out["_bucket"] = ((gh.view(np.uint64))
                              % np.uint64(num_buckets)).astype("int32")
            return out
        return fn

    both = lineage.union_tracked(
        lineage.derive(
            docs_ds.map_batches(grams_of(0, True),
                                batch_format="pandas"), docs_ds),
        lineage.derive(
            bench_ds.map_batches(grams_of(1, False),
                                 batch_format="pandas"), bench_ds))

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"key": pd.Series(dtype="int64")})
        bench = g.loc[g["side"] == 1, "gram"]
        d = g[(g["side"] == 0) & g["gram"].isin(set(bench))]
        return pd.DataFrame({"key": d["key"].unique().astype("int64")})

    return lineage.exchange(
        both, lambda d: d.repartition(num_buckets).groupby("_bucket")
        .map_groups(hits, batch_format="pandas"))


def contamination_flags(docs_ds, bench_ds, n: int = 8,
                        text_col: str = "text", key_col: str = "doc_id",
                        num_buckets: int = 64):
    """Benchmark-decontamination detector: flag every training document
    that shares at least one word n-gram with any document of a
    held-out benchmark set (the GPT-3 / Pile 13-gram decontamination
    recipe — Brown et al. 2020 appendix C; Gao et al. 2021 — at a
    configurable n). Returns (key, contaminated ∈ {0,1}) for EVERY
    input doc.

    Scale shape — two narrow exchanges, text crosses neither:

    1. :func:`_contamination_hits` (gram-bucketed overlap detection);
    2. contaminated keys union the full doc key list into ONE
       key-hash-bucketed exchange that materializes the 0/1 flag.

    The bench side is NOT broadcast: a real benchmark suite is small,
    but the same operator decontaminates split-vs-split (both sides
    corpus-scale), so both travel the bucketed path. Tokenization is
    the pinned ``split(" ")`` / SQL ``string_split(text, ' ')``
    convention shared with :func:`duplicated_passages`.
    """
    contaminated = _contamination_hits(docs_ds, bench_ds, n,
                                       text_col, key_col, num_buckets)

    def _key_bucket(s: pd.Series) -> np.ndarray:
        h = s.to_numpy(dtype="int64").astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_buckets)).astype("int32")

    def all_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df[key_col].astype("int64"),
                            "hit": np.zeros(len(df), dtype="int64")})
        out["_b"] = _key_bucket(out["key"])
        return out

    def hit_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["key"].astype("int64"),
                            "hit": np.ones(len(df), dtype="int64")})
        out["_b"] = _key_bucket(out["key"])
        return out

    tagged = lineage.union_tracked(
        lineage.derive(
            docs_ds.map_batches(all_keys, batch_format="pandas"),
            docs_ds),
        lineage.derive(
            contaminated.map_batches(hit_keys, batch_format="pandas"),
            contaminated))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = _restore_int64(g, ("key", "hit"))
        out = g.groupby("key", as_index=False)["hit"].max()
        return pd.DataFrame({"key": out["key"].astype("int64"),
                             "contaminated": out["hit"].astype("int64")})

    return lineage.exchange(
        tagged, lambda d: d.repartition(num_buckets).groupby("_b")
        .map_groups(flag, batch_format="pandas"))


def decontaminate(docs_ds, bench_ds, n: int = 8,
                  text_col: str = "text", key_col: str = "doc_id",
                  num_buckets: int = 64):
    """Removal counterpart of :func:`contamination_flags`: returns
    (key, text) for every surviving (unflagged) training document.
    EXACTLY two chained exchanges (the proven
    scrub_duplicated_passages shape — narrow detection exchange, then
    one key-bucketed union where text crosses once): the detector's
    raw contaminated keys feed the drop set directly — their
    per-gram-bucket duplicates are harmless to a set-drop, and
    skipping the flag-table exchange keeps the DAG one union
    shallower."""

    hits = _contamination_hits(docs_ds, bench_ds, n,
                               text_col, key_col, num_buckets)

    def _key_bucket(s: pd.Series) -> np.ndarray:
        h = s.to_numpy(dtype="int64").astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_buckets)).astype("int32")

    def prep_docs(df: pd.DataFrame) -> pd.DataFrame:
        # reset: sliced batches are not zero-based (scrub prep_docs)
        df = df.reset_index(drop=True)
        out = pd.DataFrame({
            "key": df[key_col].astype("int64"),
            "text": df[text_col].astype("object"),
            "_drop": pd.Series(np.full(len(df), -1, dtype="int64")),
        })
        out["_b"] = _key_bucket(out["key"])
        return out

    def prep_hits(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # see scrub prep_docs
        out = pd.DataFrame({
            "key": df["key"].astype("int64"),
            # "" not None: an all-None object column Arrow-types as
            # null and the union's blocks stop sharing one schema
            "text": pd.Series([""] * len(df), dtype="object"),
            "_drop": pd.Series(np.ones(len(df), dtype="int64")),
        })
        out["_b"] = _key_bucket(out["key"])
        return out

    both = lineage.union_tracked(
        lineage.derive(
            docs_ds.map_batches(prep_docs, batch_format="pandas"),
            docs_ds),
        lineage.derive(
            hits.map_batches(prep_hits, batch_format="pandas"), hits))

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = _restore_int64(g, ("key", "_drop"))
        dropped = set(g.loc[g["_drop"] == 1, "key"])
        d = g[g["_drop"] == -1]
        d = d[~d["key"].isin(dropped)]
        return pd.DataFrame({"key": d["key"].astype("int64"),
                             "text": d["text"].astype("object")})

    return lineage.exchange(
        both, lambda d: d.repartition(num_buckets).groupby("_b")
        .map_groups(keep, batch_format="pandas"))


# ---------------------------------------------------------------------
# near-dup cluster representative selection
# ---------------------------------------------------------------------

def cluster_representatives(clusters_ds, docs_ds, score_col: str,
                            key_col: str = "doc_id",
                            num_buckets: int = 64):
    """Pick ONE representative per near-dup cluster by quality instead
    of by min key — the production curation policy ("keep the best
    copy", e.g. the longest / highest-quality doc, rather than the
    arbitrary id-min): argmax of ``score_col`` per canonical cluster,
    ties to the smallest key. ``clusters_ds`` is minhash_dedup's
    (key, canonical_key) map; docs NOT in any cluster represent
    themselves.

    Scale shape: docs union the cluster map in ONE key-hash-bucketed
    exchange (attach canonical to each doc — a doc missing from the
    map is its own cluster), then the per-cluster argmax runs as a
    second canonical-bucketed exchange with a per-batch partial argmax
    combiner. Only (key, canonical, score) rows move. Returns
    Dataset(canonical_key, rep_key, n_members).
    """

    def _kb(s: pd.Series) -> np.ndarray:
        h = s.to_numpy(dtype="int64").astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_buckets)).astype("int32")

    def prep_docs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # see scrub prep_docs
        out = pd.DataFrame({
            "key": df[key_col].astype("int64"),
            "score": df[score_col].astype("int64"),
            "canon": pd.Series(np.full(len(df), -1, dtype="int64")),
        })
        out["_b"] = _kb(out["key"])
        return out

    def prep_clusters(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # see scrub prep_docs
        out = pd.DataFrame({
            "key": df["key"].astype("int64"),
            "score": pd.Series(np.full(len(df), -1, dtype="int64")),
            "canon": df["canonical_key"].astype("int64"),
        })
        out["_b"] = _kb(out["key"])
        return out

    both = lineage.union_tracked(
        lineage.derive(
            docs_ds.map_batches(prep_docs, batch_format="pandas"),
            docs_ds),
        lineage.derive(
            clusters_ds.map_batches(prep_clusters,
                                    batch_format="pandas"),
            clusters_ds))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        canon = dict(zip(g.loc[g["score"] < 0, "key"],
                         g.loc[g["score"] < 0, "canon"]))
        d = g[g["score"] >= 0]
        keys = d["key"].to_numpy(dtype="int64")
        out = pd.DataFrame({
            "canon": pd.Series([canon.get(k, k) for k in keys],
                               dtype="int64"),
            "key": keys,
            "score": d["score"].to_numpy(dtype="int64"),
        })
        out["_b2"] = _kb(out["canon"])
        return out

    def argmax_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["canon", "score", "key"],
                           ascending=[True, False, True],
                           kind="mergesort")
        best = d.drop_duplicates("canon")
        n = df.groupby("canon").size()
        return pd.DataFrame({
            "canon": best["canon"].to_numpy(dtype="int64"),
            "key": best["key"].to_numpy(dtype="int64"),
            "score": best["score"].to_numpy(dtype="int64"),
            "n": n.loc[best["canon"]].to_numpy(dtype="int64"),
            "_b2": best["_b2"].to_numpy(dtype="int32"),
        })

    def argmax_merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["canon", "score", "key"],
                          ascending=[True, False, True],
                          kind="mergesort")
        best = d.drop_duplicates("canon")
        n = g.groupby("canon")["n"].sum()
        return pd.DataFrame({
            "canonical_key": best["canon"].to_numpy(dtype="int64"),
            "rep_key": best["key"].to_numpy(dtype="int64"),
            "n_members": n.loc[best["canon"]].to_numpy(dtype="int64"),
        })

    attached = lineage.exchange(
        both, lambda d: d.repartition(num_buckets).groupby("_b")
        .map_groups(attach, batch_format="pandas"))
    parts = lineage.derive(
        attached.map_batches(argmax_part, batch_format="pandas"),
        attached)
    # a depth-2 lineage here is the allowed shape; a caller feeding a
    # deeper clusters_ds lineage gets the materialize fallback instead
    # of the forbidden third-exchange DAG
    return lineage.exchange(
        parts, lambda d: d.groupby("_b2").map_groups(
            argmax_merge, batch_format="pandas"))


# --- materialized LSH index for incremental (delta-crawl) near-dup ------

def build_minhash_index(docs_ds, out_dir: str, bands: int = 16,
                        shingle_k: int = 3, num_partitions: int = 16,
                        text_col: str = "text",
                        key_col: str = "doc_id") -> str:
    """Materialize the corpus's LSH band table as a persistent index:
    ``(band_id, band_hash, key)`` rows hive-partitioned by
    ``band_hash % num_partitions``, with an idempotent _SUCCESS +
    tmp-dir swap (the sources/ftindex discipline).

    This is what makes incremental near-dup affordable at crawl
    scale: the corpus is shingled + minhashed ONCE, and every later
    delta probes the index (``neardup_vs_index``) instead of
    re-sketching 100 TB per crawl. The expensive artifact is built
    once, partitioned (so a failed build resumes per directory), and
    the probe's read is planned over only the partitions the delta's
    band hashes land in."""
    import os

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir

    rows = minhash_bands(docs_ds, text_col=text_col, key_col=key_col,
                         bands=bands, shingle_k=shingle_k)

    def tag_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["band_hash"].values.view("uint64")
                      % np.uint64(num_partitions)).astype("int32")
        return df

    tmp = "%s.tmp.%d" % (out_dir.rstrip("/"), os.getpid())
    (rows.map_batches(tag_part, batch_format="pandas")
     .write_parquet(tmp, partition_cols=["part"]))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def neardup_vs_index(delta_ds, index_dir: str, verify_docs_ds,
                     bands: int = 16, shingle_k: int = 3,
                     num_partitions: int = 16, threshold: float = 0.5,
                     text_col: str = "text", key_col: str = "doc_id",
                     num_buckets: int = 64,
                     driver_threshold: int | None = None,
                     max_bucket: int = 64):
    """Incremental near-dup: probe a DELTA of documents against the
    materialized LSH index (``build_minhash_index``) — the rolling
    100-TB-crawl shape where only the new snapshot pays sketching
    cost and the indexed corpus never leaves storage except for the
    partitions the delta's band hashes actually land in.

    1. delta docs → band rows (map-side, the only sketching work);
    2. the touched partition set (≤ num_partitions ints) plans a
       PRUNED read of the index;
    3. delta and index band rows meet in one (band_id, band_hash)
       hash-bucketed exchange; equal bands emit candidate
       (delta_key, indexed_key) pairs, per-band bucket capped
       deterministically against degenerate boilerplate buckets;
    4. exact shingle-Jaccard verification over ``verify_docs_ds``
       (``verify_jaccard`` — hash-partitioned above
       ``driver_threshold``), threshold filter.

    Returns Dataset(delta_key, indexed_key) of verified near-dups."""
    import os

    import ray.data as rd

    delta_bands = minhash_bands(
        delta_ds, text_col=text_col, key_col=key_col, bands=bands,
        shingle_k=shingle_k).materialize()

    def parts_of(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["band_hash"].values.view("uint64")
                      % np.uint64(num_partitions))
        return pd.DataFrame({"part": u.astype("int64")})

    touched = sorted({
        int(r["part"])
        for r in delta_bands.map_batches(
            parts_of, batch_format="pandas").take_all()})
    paths = []
    for p in touched:
        d = "%s/part=%d" % (index_dir.rstrip("/"), p)
        if os.path.isdir(d):
            paths.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    if not paths:
        return rd.from_arrow(pa.table(
            {"delta_key": pa.array([], pa.int64()),
             "indexed_key": pa.array([], pa.int64())}))
    idx_bands = rd.read_parquet(
        paths, columns=["band_id", "band_hash", "key"])

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_side"] = np.int8(side)
            df["_bucket"] = (
                (df["band_hash"].values.view("uint64")
                 + df["band_id"].values.astype("uint64") * _GOLDEN)
                % np.uint64(num_buckets)).astype("int32")
            return df[["band_id", "band_hash", "key", "_side", "_bucket"]]
        return fn

    def cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d_ = g[g["_side"] == 0][["band_id", "band_hash", "key"]]
        i_ = g[g["_side"] == 1][["band_id", "band_hash", "key"]]
        if d_.empty or i_.empty:
            return pd.DataFrame({"key_a": pd.Series(dtype="int64"),
                                 "key_b": pd.Series(dtype="int64")})
        # deterministic skew cap per (band_id, band_hash) on each side
        d_ = (d_.sort_values(["band_id", "band_hash", "key"])
              .groupby(["band_id", "band_hash"]).head(max_bucket))
        i_ = (i_.sort_values(["band_id", "band_hash", "key"])
              .groupby(["band_id", "band_hash"]).head(max_bucket))
        m = d_.merge(i_, on=["band_id", "band_hash"],
                     suffixes=("_d", "_i"))
        m = m[m["key_d"] != m["key_i"]]
        out = pd.DataFrame({"key_a": m["key_d"].astype("int64"),
                            "key_b": m["key_i"].astype("int64")})
        return out.drop_duplicates()

    tagged = lineage.union_tracked(
        delta_bands.map_batches(tag(0), batch_format="pandas"),
        idx_bands.map_batches(tag(1), batch_format="pandas"))
    cands = lineage.exchange(
        tagged, lambda d: d.groupby("_bucket")
        .map_groups(cand_pairs, batch_format="pandas"))

    verified = verify_jaccard(
        cands, verify_docs_ds, text_col=text_col, key_col=key_col,
        threshold=threshold, shingle_k=shingle_k,
        num_buckets=num_buckets, driver_threshold=driver_threshold)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"delta_key": t["key_a"],
                         "indexed_key": t["key_b"]})

    return verified.map_batches(rename, batch_format="pyarrow")


# --- asymmetric containment near-dup (excerpt/quotation detection) ------

def containment_pairs(delta_ds, corpus_ds, cont_num: int = 4,
                      cont_den: int = 5, df_cap: int = 256,
                      shingle_k: int = 3, text_col: str = "text",
                      key_col: str = "doc_id", num_buckets: int = 64):
    """Asymmetric near-dup by shingle CONTAINMENT (Broder '97's
    resemblance/containment pair): delta docs A whose rare-gram set
    is ≥ cont_num/cont_den contained in a corpus doc B —
    |A_r ∩ B_r| · den ≥ num · |A_r| — catching excerpts/quotations
    that symmetric Jaccard misses (a 2/3 excerpt has J ≈ 2/3 but
    containment ≈ 1).

    ``A_r`` restricts both sides to INFORMATIVE grams: grams whose
    corpus document frequency exceeds ``df_cap`` (boilerplate) are
    excluded from numerator AND denominator — an exact, SQL-replicable
    rule that simultaneously bounds the per-gram pair explode (a gram
    pairs ≤ df_cap corpus docs with each delta holder).

    Scale shape: both sides reduce doc-locally to distinct
    (gram, key) rows (combiner); exchange 1 co-locates each gram's
    postings (hash(gram) bucket) — df, the cap and the per-gram
    (a, b) intersection partials plus per-a rare-size partials all
    compute inside the bucket; exchange 2 co-locates everything of
    one delta key (hash(a)) to finalize inter sums, |A_r| and the
    exact cross-multiplied threshold. Returns
    Dataset(delta_key, corpus_key)."""

    def explode(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g_out, k_out = [], []
            for k, t in zip(df[key_col], df[text_col]):
                sh = np.unique(shingle_hashes(t or "", shingle_k))
                g_out.append(sh)
                k_out.append(np.full(len(sh), k))
            if not g_out:
                return pd.DataFrame({
                    "g": pd.Series(dtype="int64"),
                    "key": pd.Series(dtype="int64"),
                    "_side": pd.Series(dtype="int8"),
                    "_bucket": pd.Series(dtype="int32")})
            out = pd.DataFrame({
                "g": np.concatenate(g_out).astype("int64"),
                "key": np.concatenate(k_out).astype("int64")})
            out["_side"] = np.int8(side)
            out["_bucket"] = (
                (out["g"].values.view("uint64") * _GOLDEN)
                % np.uint64(num_buckets)).astype("int32")
            return out
        return fn

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        d_ = g[g["_side"] == 0][["g", "key"]]
        c_ = g[g["_side"] == 1][["g", "key"]]
        if d_.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        # corpus df per gram; drop boilerplate grams entirely
        dfreq = c_.groupby("g")["key"].transform("size")
        c_ok = c_[dfreq <= df_cap]
        ok_grams = set(c_ok["g"].unique())
        # rarity is CORPUS df: a delta gram absent from the corpus has
        # df 0 <= cap and counts toward |A_r|; only grams the corpus
        # marks as boilerplate (df > cap) are excluded from the size
        c_all_grams = set(c_["g"].unique())
        d_rare = d_[~d_["g"].isin(c_all_grams - ok_grams)]
        sizes = d_rare.groupby("key", as_index=False).size()
        size_rows = pd.DataFrame({"a": sizes["key"].astype("int64"),
                                  "b": np.int64(-1),
                                  "n": sizes["size"].astype("int64")})
        m = d_rare.merge(c_ok, on="g", suffixes=("_a", "_b"))
        inter = (m.groupby(["key_a", "key_b"], as_index=False).size()
                 if len(m) else
                 pd.DataFrame({"key_a": pd.Series(dtype="int64"),
                               "key_b": pd.Series(dtype="int64"),
                               "size": pd.Series(dtype="int64")}))
        inter_rows = pd.DataFrame({"a": inter["key_a"].astype("int64"),
                                   "b": inter["key_b"].astype("int64"),
                                   "n": inter["size"].astype("int64")})
        return pd.concat([size_rows, inter_rows], ignore_index=True)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        sizes = (g[g["b"] == -1].groupby("a", as_index=False)["n"].sum()
                 .rename(columns={"n": "asize"}))
        pairs = (g[g["b"] != -1]
                 .groupby(["a", "b"], as_index=False)["n"].sum())
        j = pairs.merge(sizes, on="a")
        keep = j["n"] * cont_den >= cont_num * j["asize"]
        out = j[keep]
        return pd.DataFrame({
            "delta_key": out["a"].astype("int64"),
            "corpus_key": out["b"].astype("int64")}).reset_index(drop=True)

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["a"], index=False).values
        df["_bucket"] = (h % np.uint64(num_buckets)).astype("int32")
        return df

    tagged = lineage.union_tracked(
        delta_ds.map_batches(explode(0), batch_format="pandas"),
        corpus_ds.map_batches(explode(1), batch_format="pandas"))
    partials = lineage.exchange(
        tagged, lambda d: d.groupby("_bucket")
        .map_groups(per_gram, batch_format="pandas"))
    return lineage.exchange(
        lineage.derive(partials.map_batches(rebucket,
                                            batch_format="pandas"),
                       partials),
        lambda d: d.groupby("_bucket")
        .map_groups(finalize, batch_format="pandas"))
