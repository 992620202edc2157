"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once; each task reads it, never
re-shipped per batch), partial top-k per batch, tiny driver merge.

Scale path: IVF-style coarse quantization — deterministic k-means-lite
centroids (seeded sample + Lloyd iterations on the driver over a
sample), assign each vector to its nearest centroid map-side, search
only the ``n_probe`` closest centroid buckets per query.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def knn_brute_force(ds, queries: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", key_col: str = "vec_id"):
    """Exact cosine top-k per query.

    Returns a pandas DataFrame (query_idx, vec_id, cosine, rank) —
    rank 0 = best; ties broken by key for determinism.
    """
    import ray

    q = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # empty block after upstream filter
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        qm = ray.get(q_ref)
        vecs = _unit(_as_matrix(df[vec_col]))
        sims = vecs @ qm.T  # (n, n_queries)
        keys = np.asarray(df[key_col])
        out_q, out_key, out_sim = [], [], []
        topn = min(k, len(keys))
        for qi in range(qm.shape[0]):
            idx = np.argpartition(-sims[:, qi], topn - 1)[:topn]
            for i in idx:
                out_q.append(qi)
                out_key.append(keys[i])
                out_sim.append(float(sims[i, qi]))
        return pd.DataFrame(
            {"query_idx": out_q, "vec_id": out_key, "cosine": out_sim})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for qi, g in partials.groupby("query_idx"):
        best = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id))
        for rank, r in enumerate(best):
            rows.append((qi, r.vec_id, r.cosine, rank))
    return pd.DataFrame(rows, columns=["query_idx", "vec_id", "cosine", "rank"])


def train_centroids(ds, n_centroids: int = 16, sample_frac: float = 0.1,
                    iters: int = 5, vec_col: str = "embedding",
                    seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd iterations over a seeded sample (driver-side
    — the sample is small by construction)."""
    sample = ds.random_sample(sample_frac, seed=seed).to_pandas()
    m = _unit(_as_matrix(sample[vec_col]))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, vec_col: str = "embedding",
            key_col: str = "vec_id", centroids: np.ndarray | None = None,
            round_dp: int | None = None):
    """IVF-bucketed ANN: assign vectors to centroid buckets map-side,
    scan only the ``n_probe`` nearest buckets per query.

    ``round_dp``: round cosines to this many decimals BEFORE every
    selection and break ties on the key — required whenever the
    ranking boundary can hold ties, because bitwise-identical vectors
    dot to 1.0 vs 0.9999999999999999 depending on the BLAS kernel a
    batch's shape selects (the repo's recorded float-tie rule; the
    embed_ivf_add_knn precedent rounds at 12 dp)."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col=vec_col)
    q = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    cent_ref = ray.put(centroids)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        cent = ray.get(cent_ref)
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        vecs = _unit(_as_matrix(df[vec_col]))
        keys = np.asarray(df[key_col])
        assign = np.argmax(vecs @ cent.T, axis=1)
        out_q, out_key, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ qm[qi]
            if round_dp is not None:
                sims = np.round(sims, round_dp)
            sel_keys = keys[mask]
            topn = min(k, len(sel_keys))
            if round_dp is not None:
                # deterministic batch-local top-k: key-ascending
                # within a rounded-cosine tie (argpartition picks
                # arbitrarily among exact ties)
                idx = np.lexsort((sel_keys, -sims))[:topn]
            else:
                idx = np.argpartition(-sims, topn - 1)[:topn]
            for i in idx:
                out_q.append(qi)
                out_key.append(sel_keys[i])
                out_sim.append(float(sims[i]))
        return pd.DataFrame(
            {"query_idx": out_q, "vec_id": out_key, "cosine": out_sim})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for qi, g in partials.groupby("query_idx"):
        best = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id))
        for rank, r in enumerate(best):
            rows.append((qi, r.vec_id, r.cosine, rank))
    return pd.DataFrame(rows, columns=["query_idx", "vec_id", "cosine", "rank"])


def build_ivf_index(ds, out_dir: str, n_centroids: int = 16,
                    vec_col: str = "embedding", key_col: str = "vec_id",
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """Materialize the IVF index: vectors written as hive-partitioned
    parquet keyed by nearest-centroid bucket (one directory per
    bucket) + the centroid matrix beside it. At corpus scale this is
    what makes IVF an *index*: a query probes ``n_probe`` buckets and
    the read plans ONLY those directories — the other
    ``n_centroids - n_probe`` shares of the corpus never leave
    storage (vs ``knn_ivf``, which re-scans and re-assigns every
    block per query batch). Partitioned output is also resumable: a
    failed build re-runs only missing bucket dirs' rows.

    Returns the centroid matrix (also saved to
    ``out_dir/centroids.npy``)."""
    import os

    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col=vec_col)
    import ray

    cent_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(bucket=pd.Series(dtype="int32"))
        cent = ray.get(cent_ref)
        vecs = _unit(_as_matrix(df[vec_col]))
        df = df.copy()
        df["bucket"] = np.argmax(vecs @ cent.T, axis=1).astype("int32")
        return df

    os.makedirs(out_dir, exist_ok=True)
    (ds.map_batches(assign, batch_format="pandas")
       .write_parquet(out_dir, partition_cols=["bucket"]))
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return centroids


def knn_ivf_indexed(index_dir: str, queries: np.ndarray, k: int = 10,
                    n_probe: int = 4, vec_col: str = "embedding",
                    key_col: str = "vec_id"):
    """ANN over a materialized IVF index (``build_ivf_index`` output):
    plan the read over ONLY the probed bucket directories, brute-force
    within them, per-query masked to its own probe set. Same result
    contract as ``knn_ivf``."""
    import os

    import ray
    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    needed = sorted({int(b) for row in probe for b in row})
    # ONE pruned read over exactly the probed buckets' files; the
    # row's bucket is RECOMPUTED from its vector (the same argmax the
    # build used — deterministic), which kills the former
    # one-dataset-per-bucket union (8 datasets × per-dataset fixed
    # cost measured ~20 s at sf0.1, now one streaming read)
    paths = []
    for b in needed:
        d = os.path.join(index_dir, "bucket=%d" % b)
        if os.path.isdir(d):
            paths.extend(sorted(os.path.join(d, f)
                                for f in os.listdir(d)
                                if f.endswith(".parquet")))
    if not paths:
        return pd.DataFrame(columns=["query_idx", "vec_id", "cosine",
                                     "rank"])
    ds = rd.read_parquet(paths, columns=[key_col, vec_col])

    q_ref = ray.put(q)
    probe_ref = ray.put(probe)
    cent_ref = ray.put(centroids)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_idx": [], "vec_id": [],
                                 "cosine": []})
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        cent = ray.get(cent_ref)
        vecs = _unit(_as_matrix(df[vec_col]))
        keys = np.asarray(df[key_col])
        buckets = np.argmax(vecs @ cent.T, axis=1)
        out_q, out_key, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(buckets, pr[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ qm[qi]
            sel_keys = keys[mask]
            topn = min(k, len(sel_keys))
            idx = np.argpartition(-sims, topn - 1)[:topn]
            for i in idx:
                out_q.append(qi)
                out_key.append(sel_keys[i])
                out_sim.append(float(sims[i]))
        return pd.DataFrame(
            {"query_idx": out_q, "vec_id": out_key, "cosine": out_sim})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for qi, g in partials.groupby("query_idx"):
        best = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, r.vec_id))
        for rank, r in enumerate(best):
            rows.append((qi, r.vec_id, r.cosine, rank))
    return pd.DataFrame(rows,
                        columns=["query_idx", "vec_id", "cosine", "rank"])


def add_to_ivf_index(index_dir: str, delta_ds, out_dir: str,
                     vec_col: str = "embedding",
                     key_col: str = "vec_id") -> str:
    """Incremental IVF maintenance — FAISS's ``IndexIVF.add`` shape:
    new vectors are assigned to the EXISTING (fixed) centroids
    map-side and land as fresh segment files; the new index version
    at ``out_dir`` is hardlinked base segments + delta segments, so
    versioning costs O(files), not O(bytes), and the base snapshot
    stays immutable for concurrent readers (the ftindex
    merge_index_delta discipline; centroids are NOT retrained — the
    standard drift trade-off, rebuild when recall decays).

    Scale shape: the delta pays one broadcast-centroid assignment
    pass (zero shuffle) and a partitioned write into its buckets;
    the base corpus is never read, moved or rewritten."""
    import os
    import shutil

    import ray

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    cent_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(bucket=pd.Series(dtype="int32"))
        cent = ray.get(cent_ref)
        vecs = _unit(_as_matrix(df[vec_col]))
        df = df.copy()
        df["bucket"] = np.argmax(vecs @ cent.T, axis=1).astype("int32")
        return df

    tmp_delta = "%s.tmpdelta.%d" % (out_dir.rstrip("/"), os.getpid())
    (delta_ds.map_batches(assign, batch_format="pandas")
     .write_parquet(tmp_delta, partition_cols=["bucket"]))

    tmp = "%s.tmp.%d" % (out_dir.rstrip("/"), os.getpid())
    os.makedirs(tmp, exist_ok=True)
    for src, pref in ((index_dir, "base_"), (tmp_delta, "delta_")):
        for d in os.listdir(src):
            if not d.startswith("bucket="):
                continue
            os.makedirs(os.path.join(tmp, d), exist_ok=True)
            for f in os.listdir(os.path.join(src, d)):
                if f.endswith(".parquet"):
                    os.link(os.path.join(src, d, f),
                            os.path.join(tmp, d, pref + f))
    shutil.rmtree(tmp_delta)
    np.save(os.path.join(tmp, "centroids.npy"), centroids)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir
