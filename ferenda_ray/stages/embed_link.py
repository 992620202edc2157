"""Embedding-based entity linking (the "embedding linker" actor pool).

Complements the fuzzy-gazetteer linker (``mentions.MentionLinker``,
documentrepository.py:500-547 semantics) with a vector-similarity
path: surfaces and entity labels are embedded with a deterministic
feature-hashed character-trigram embedding (the standard hashing-trick
/ n-gram profile construction — public technique, e.g. Weinberger et
al., ICML'09 feature hashing; no model weights, no network), and a
surface links to the entity whose embedding has the highest cosine
similarity above a threshold.

Ray shape: ``ds.map_batches(EmbedLinker, concurrency=N,
batch_format="pyarrow")`` — an actor pool. The entity label matrix is
built ONCE per actor in ``__init__`` from a ``ray.put`` broadcast of
the authority dict (never re-shipped per batch); per-batch work is one
vectorized embed + one numpy matmul (surfaces x entities), which is
exactly the brute-force-cosine building block `similarity.embed_knn`
uses, applied to linking. At 100 TB the entity side is the SMALL side
(an authority list), so broadcast + matmul beats any shuffle join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# same mix/poly family as stages/dedup.py (shared public constants)
_POLY_MULT = np.uint64(0x100000001B3)  # FNV prime
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix(h: np.ndarray) -> np.ndarray:
    h = (h + _GOLDEN) * _POLY_MULT
    h = h ^ (h >> np.uint64(33))
    h = h * _POLY_MULT
    return h ^ (h >> np.uint64(29))


def trigram_embed(surfaces, dim: int = 64) -> np.ndarray:
    """Feature-hashed char-trigram embeddings, L2-normalized, fully
    vectorized: all surfaces are concatenated into ONE codepoint
    array, a width-3 rolling polynomial hash runs over it in 3
    vectorized passes (the `dedup.shingle_hashes` pattern), boundary
    positions that straddle two surfaces are masked out, and signed
    counts are scattered into the (n_surfaces x dim) matrix with one
    ``np.add.at``. No per-trigram Python loop.
    """
    n_rows = len(surfaces)
    if n_rows == 0:
        return np.zeros((0, dim), dtype=np.float64)
    # '^'/'$' padding makes prefix/suffix trigrams positional
    padded = ["^" + (s or "").lower() + "$" for s in surfaces]
    lens = np.fromiter((len(p) for p in padded), dtype=np.int64,
                       count=n_rows)
    big = np.frombuffer("".join(padded).encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    total = len(big)
    n = total - 2  # candidate trigram start positions
    mat = np.zeros((n_rows, dim), dtype=np.float64)
    if n > 0:
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(3):  # 3 vectorized passes
            acc = acc * _POLY_MULT + big[j:j + n]
        h = _mix(acc)
        starts = np.cumsum(lens) - lens
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), lens)[:n]
        pos_in_row = np.arange(n, dtype=np.int64) - starts[rows]
        valid = pos_in_row <= lens[rows] - 3  # trigram fully inside its row
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(16)) & np.uint64(1), 1.0, -1.0)
        np.add.at(mat, (rows[valid], idx[valid]), sign[valid])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    return mat


class EmbedLinker:
    """Actor-pool stage: rows with a ``surface`` column → same rows +
    ``linked_uri`` (top-1 cosine entity above ``threshold``, else "")
    and ``link_score_milli`` (cosine in integer milli-units — integer
    so downstream aggregates stay order-independent).

    ``entities``: dict label → entity URI, or a ``ray.ObjectRef`` to
    one (broadcast once with ``ray.put``).
    """

    def __init__(self, entities, dim: int = 64, threshold: float = 0.5,
                 surface_col: str = "surface"):
        import ray

        if isinstance(entities, ray.ObjectRef):
            entities = ray.get(entities)
        self.labels = list(entities)
        self.uris = np.asarray([entities[l] for l in self.labels],
                               dtype=object)
        self.dim = dim
        self.threshold = threshold
        self.surface_col = surface_col
        # entity matrix built once per actor (E x dim, rows unit-norm)
        self.mat = trigram_embed(self.labels, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch[self.surface_col].to_pylist()
        q = trigram_embed(surfaces, self.dim)        # (B, dim)
        sims = q @ self.mat.T                        # (B, E) one matmul
        best = sims.argmax(axis=1)
        score = sims[np.arange(len(surfaces)), best]
        hit = score >= self.threshold
        linked = np.where(hit, self.uris[best], "")
        milli = np.where(hit, np.rint(score * 1000).astype(np.int64), 0)
        return (batch
                .append_column("linked_uri",
                               pa.array(linked.tolist(), pa.string()))
                .append_column("link_score_milli",
                               pa.array(milli, pa.int64())))
