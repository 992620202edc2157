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
      → verify true Jaccard / cosine
      → connected components → keep canonical representative

All hash seeds are fixed constants — results are deterministic across
runs and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

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


def _hash_text(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Keep one representative (min key) per identical text.
    hash-partition + per-group first: md5 computed map-side, shuffle
    carries only (hash → full row), groupby picks min key."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = df[text_col].map(_hash_text)
        return df

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_col, kind="mergesort").head(1)

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("_h")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["_h"])
    )


# ---------------------------------------------------------------------
# shingles + minhash (vectorized)
# ---------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (crc-free, stable)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                           "big"))
    return out & _SHINGLE_MASK


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(n_shingles,) → (_N_PERM,) signature via (a*x+b) mod p."""
    if len(sh) == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    prod = (sh[:, None] * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return prod.min(axis=0)


def minhash_bands(ds, text_col: str = "text", key_col: str = "doc_id",
                  bands: int = 16, shingle_k: int = 3):
    """docs → (band_id, band_hash, key) rows: the LSH explode stage."""
    rows_per_band = _N_PERM // bands

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        band_ids, band_hashes, keys = [], [], []
        for key, text in zip(df[key_col], df[text_col]):
            sig = minhash_signature(shingle_hashes(text, shingle_k))
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(b)
                band_hashes.append(h)
                keys.append(key)
        return pd.DataFrame(
            {"band_id": band_ids, "band_hash": band_hashes, "key": keys})

    return ds.map_batches(explode, batch_format="pandas")


def lsh_candidate_pairs(band_ds, max_bucket: int = 64):
    """groupby(band_id, band_hash) → unordered candidate key pairs.
    Buckets larger than ``max_bucket`` are truncated after sorting
    (deterministic) — the documented skew guard: a degenerate bucket
    (e.g. boilerplate pages) would otherwise emit |bucket|² pairs."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = sorted(set(g["key"]))[:max_bucket]
        a, b = [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                a.append(keys[i])
                b.append(keys[j])
        return pd.DataFrame({"key_a": a, "key_b": b})

    cand = band_ds.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # dedup pairs found in multiple bands
    return cand.groupby(["key_a", "key_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def verify_jaccard(pairs_ds, docs_ds, text_col: str = "text",
                   key_col: str = "doc_id", threshold: float = 0.8,
                   shingle_k: int = 3):
    """Exact n-gram Jaccard over candidate pairs.

    Small-side strategy: the candidate pair set is orders of magnitude
    smaller than the corpus; broadcast the shingle sets of ONLY the
    keys that appear in candidates (ray.put once), verify map-side.
    (Scale path when even that is large: hash-partition pairs and docs
    by key and verify per bucket.)
    """
    import ray

    pairs_df = pairs_ds.to_pandas()
    if pairs_df.empty or "key_a" not in pairs_df.columns:
        # zero candidates → empty Dataset may come back column-less
        return pd.DataFrame(columns=["key_a", "key_b", "jaccard"])
    keys_needed = set(pairs_df["key_a"]) | set(pairs_df["key_b"])
    keys_ref = ray.put(keys_needed)  # broadcast once, not per-task closure

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        needed = ray.get(keys_ref)
        sel = df[df[key_col].isin(needed)]
        return pd.DataFrame({
            "key": sel[key_col],
            "shingles": [set(map(int, shingle_hashes(t, shingle_k)))
                         for t in sel[text_col]],
        })

    sh_df = docs_ds.map_batches(collect, batch_format="pandas").to_pandas()
    sh = dict(zip(sh_df["key"], sh_df["shingles"]))

    out = []
    for a, b in zip(pairs_df["key_a"], pairs_df["key_b"]):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["key_a", "key_b", "jaccard"])


def minhash_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                  threshold: float = 0.8, bands: int = 16,
                  shingle_k: int = 3):
    """Full near-dup pipeline → (key, canonical_key) for every doc in
    a near-dup cluster (canonical = min key via union-find over the
    verified pair graph)."""
    from .canonicalize import union_find

    bands_ds = minhash_bands(ds, text_col, key_col, bands, shingle_k)
    cand = lsh_candidate_pairs(bands_ds)
    verified = verify_jaccard(cand, ds, text_col, key_col, threshold, shingle_k)
    # native key types (ints order numerically; str() would make
    # "101" < "5" and pick the wrong canonical representative)
    canon = union_find(list(zip(verified["key_a"], verified["key_b"])))
    return pd.DataFrame(
        [(k, c) for k, c in sorted(canon.items())],
        columns=["key", "canonical_key"],
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash64(text: str) -> int:
    """63-bit SimHash over word features (Charikar 2002, public).
    63 bits (not 64) so the value fits a signed int64 column and
    survives Arrow/pandas round-trips without float degradation."""
    acc = np.zeros(63, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))[:63]
        acc += bits.astype(np.int64) * 2 - 1
    return int("".join("1" if x > 0 else "0" for x in acc), 2)


def simhash_candidates(ds, text_col: str = "text", key_col: str = "doc_id",
                       n_tables: int = 4):
    """Split the 64-bit simhash into ``n_tables`` 16-bit sub-keys —
    docs within Hamming distance n_tables-1 share at least one
    (pigeonhole). Emits (table_id, sub_key, key, simhash)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        tids, subs, keys, hashes = [], [], [], []
        width = 63 // n_tables
        mask = (1 << width) - 1
        for key, text in zip(df[key_col], df[text_col]):
            h = simhash64(text)
            for t in range(n_tables):
                tids.append(t)
                subs.append((h >> (t * width)) & mask)
                keys.append(key)
                hashes.append(h)
        return pd.DataFrame({"table_id": tids, "sub_key": subs,
                             "key": keys, "simhash": hashes})

    return ds.map_batches(explode, batch_format="pandas")


def simhash_dedup_pairs(ds, text_col: str = "text", key_col: str = "doc_id",
                        max_hamming: int = 3, n_tables: int = 4,
                        max_bucket: int = 64):
    """(key_a, key_b, hamming) pairs within the Hamming threshold."""
    cand = simhash_candidates(ds, text_col, key_col, n_tables)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["key"], g["simhash"])))[:max_bucket]
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= max_hamming and rows[i][0] != rows[j][0]:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pd.DataFrame({"key_a": a, "key_b": b, "hamming": d})

    found = cand.groupby(["table_id", "sub_key"]).map_groups(
        pairs, batch_format="pandas")
    return found.groupby(["key_a", "key_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------

def embedding_neardup_pairs(ds, vec_col: str = "embedding",
                            key_col: str = "vec_id",
                            threshold: float = 0.95,
                            n_planes: int = 12):
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
    return found.groupby(["key_a", "key_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
