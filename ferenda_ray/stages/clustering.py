"""Distributed clustering over embedding columns: integer k-means
(Lloyd's) and SemDeDup-style within-cluster semantic dedup
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — cluster the embedding space, then
remove near-identical items inside each cluster, so the pairwise
comparison never crosses cluster boundaries).

INTEGER fixed-point arithmetic throughout: vectors are quantized once
to int64 units ``floor(x * scale)``, distances are exact integer
squared-L2, centroid updates are elementwise ``floor(sum / count)``,
and the cosine test is the cross-multiplied integer predicate
``dot > 0 AND dot² · thr_den ≥ thr_num · |a|² · |b|²`` — so a SQL
oracle replays every iteration bit-exactly (the same discipline as
``graph.pagerank``): no float accumulation drift, no tolerance
windows.

Scale notes (100-TB target):
- The quantized vector table is materialized ONCE and re-read each
  Lloyd pass (k-means is inherently multi-pass; at production scale
  this is the checkpointed feature table).
- Each iteration is one map-only pass: assignment happens map-side
  against the broadcast centroid matrix (``ray.put`` once — k × d
  int64s), each batch emits at most k partial rows
  (cluster, count, sum-vector), and the merge coalesces
  blocks × k bounded rows — no per-vector exchange, ever.
- SemDeDup's within-cluster pass groups by cluster id. One group =
  one cluster; the O(|cluster|²) comparison is a single int64 matmul.
  k must scale with the corpus (SemDeDup uses 10k–100k clusters at
  web scale) so clusters stay worker-sized — pass ``num_buckets``-
  scale k, not this module's test default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["quantize_vectors", "kmeans_int", "assign_clusters",
           "semdedup_flags"]


def _qmatrix(col) -> np.ndarray:
    """(n, d) int64 matrix from a list<int64> / fixed_size_list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.FixedSizeListArray, pa.LargeListArray)):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), -1).astype(np.int64, copy=False)
    return np.stack([np.asarray(v, dtype=np.int64) for v in col])


def _qv_column(mat: np.ndarray) -> pa.Array:
    d = mat.shape[1] if mat.ndim == 2 else 0
    return pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.int64()), d)


def quantize_vectors(ds, vec_col: str = "embedding",
                     key_col: str = "vec_id", scale: int = 1000):
    """(key, qv) with qv[i] = floor(float64(x[i]) · scale) as int64 —
    the ONLY float→int crossing; everything downstream is exact.
    Matches SQL ``FLOOR(CAST(x AS DOUBLE) * scale)`` element-wise."""

    def q(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(col), -1).astype(np.float64)
        qmat = np.floor(mat * scale).astype(np.int64)
        return pa.table({key_col: t[key_col], "qv": _qv_column(qmat)})

    return ds.map_batches(q, batch_format="pyarrow")


def _assign(qmat: np.ndarray, ids: np.ndarray, cmat: np.ndarray):
    """Exact integer argmin_c ‖q − c‖²; ties → smallest cluster id
    (ids ascending + argmin-first-match). Returns (cluster, dist)."""
    dots = qmat @ cmat.T
    nn = np.einsum("ij,ij->i", qmat, qmat)
    cn = np.einsum("ij,ij->i", cmat, cmat)
    dist = nn[:, None] + cn[None, :] - 2 * dots
    j = np.argmin(dist, axis=1)
    return ids[j], dist[np.arange(len(qmat)), j]


def _init_centroids(qds, k: int, key_col: str):
    """Default init: the vectors whose key < k (a documented, seedless
    convention the SQL oracle states identically)."""
    import pyarrow.compute as pc

    rows = (qds.map_batches(
        lambda t: t.filter(pc.less(t[key_col], pa.scalar(k))),
        batch_format="pyarrow").to_pandas().sort_values(key_col))
    ids = rows[key_col].to_numpy().astype(np.int64)
    return ids, np.stack([np.asarray(v, dtype=np.int64)
                          for v in rows["qv"]])


def kmeans_int(qds, k: int = 8, iterations: int = 2,
               key_col: str = "vec_id"):
    """Lloyd's k-means on quantized vectors. Returns (ids, centroids)
    — the cluster-id vector (ascending) and the (k', d) int64 centroid
    matrix after ``iterations`` assign+update rounds. Clusters that
    lose all members are dropped (k' ≤ k), exactly as the SQL oracle's
    per-iteration GROUP BY drops them."""
    import ray

    ids, cmat = _init_centroids(qds, k, key_col)
    for _ in range(iterations):
        ref = ray.put((ids, cmat))

        def part(t: pa.Table) -> pa.Table:
            cids, cm = ray.get(ref)
            qmat = _qmatrix(t["qv"])
            if len(qmat) == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sumv": _qv_column(np.zeros((0, cm.shape[1]),
                                                dtype=np.int64)),
                })
            assign, _ = _assign(qmat, cids, cm)
            present = np.unique(assign)
            sums = np.zeros((len(present), qmat.shape[1]), dtype=np.int64)
            counts = np.zeros(len(present), dtype=np.int64)
            pos = np.searchsorted(present, assign)
            np.add.at(sums, pos, qmat)
            np.add.at(counts, pos, 1)
            return pa.table({
                "cluster": pa.array(present, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "sumv": _qv_column(sums),
            })

        merged = (qds.map_batches(part, batch_format="pyarrow")
                  .repartition(1)
                  .map_batches(_merge_centroid_partials,
                               batch_format="pyarrow")
                  .to_pandas())
        merged = merged.sort_values("cluster")
        ids = merged["cluster"].to_numpy().astype(np.int64)
        sums = np.stack([np.asarray(v, dtype=np.int64)
                         for v in merged["sumv"]])
        counts = merged["n"].to_numpy().astype(np.int64)
        cmat = np.floor_divide(sums, counts[:, None])
    return ids, cmat


def _merge_centroid_partials(t: pa.Table) -> pa.Table:
    clusters = t["cluster"].to_numpy()
    counts = t["n"].to_numpy()
    sums = _qmatrix(t["sumv"])
    present = np.unique(clusters)
    pos = np.searchsorted(present, clusters)
    out_sums = np.zeros((len(present), sums.shape[1]), dtype=np.int64)
    out_n = np.zeros(len(present), dtype=np.int64)
    np.add.at(out_sums, pos, sums)
    np.add.at(out_n, pos, counts)
    return pa.table({
        "cluster": pa.array(present, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
        "sumv": _qv_column(out_sums),
    })


def assign_clusters(qds, ids: np.ndarray, cmat: np.ndarray,
                    key_col: str = "vec_id", carry_qv: bool = False):
    """Map-side final assignment against the broadcast centroids:
    (key, cluster, dist[, qv]) — zero shuffle."""
    import ray

    ref = ray.put((ids, cmat))

    def fn(t: pa.Table) -> pa.Table:
        cids, cm = ray.get(ref)
        qmat = _qmatrix(t["qv"])
        if len(qmat) == 0:
            cols = {key_col: t[key_col],
                    "cluster": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64())}
            if carry_qv:
                cols["qv"] = t["qv"]
            return pa.table(cols)
        assign, dist = _assign(qmat, cids, cm)
        cols = {key_col: t[key_col],
                "cluster": pa.array(assign, pa.int64()),
                "dist": pa.array(dist, pa.int64())}
        if carry_qv:
            cols["qv"] = t["qv"]
        return pa.table(cols)

    return qds.map_batches(fn, batch_format="pyarrow")


def semdedup_flags(assigned_ds, key_col: str = "vec_id",
                   thr_num: int = 9025, thr_den: int = 10000):
    """SemDeDup keep/remove flags: within each cluster, row b is
    removed iff some row a with a smaller key satisfies
    cos(a, b) ≥ √(thr_num/thr_den) — evaluated as the EXACT integer
    predicate dot>0 ∧ dot²·thr_den ≥ thr_num·|a|²·|b|² (defaults:
    τ = 0.95). Input must carry (key, cluster, qv) — use
    ``assign_clusters(..., carry_qv=True)``. One groupby(cluster)
    exchange; the per-cluster comparison is a single int64 matmul.

    int64 bound: requires dot²·thr_den < 2⁶³, i.e. |dot| ≤ ~9.6e8
    with the default thr_den — comfortably true for quantized unit-ish
    embeddings (|qv|∞ ≤ scale ⇒ dot ≤ d·scale²); asserted per group.
    """

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        qmat = np.stack([np.asarray(v, dtype=np.int64) for v in g["qv"]])
        dots = qmat @ qmat.T
        assert int(np.abs(dots).max(initial=0)) ** 2 * thr_den < 2 ** 63
        nn = np.diag(dots).copy()
        lhs = dots.astype(np.int64) ** 2 * thr_den
        rhs = thr_num * np.multiply.outer(nn, nn)
        cond = (dots > 0) & (lhs >= rhs)
        removed = np.triu(cond, 1).any(axis=0)
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "kept": ~removed,
        })

    return assigned_ds.groupby("cluster").map_groups(
        per_cluster, batch_format="pandas")
