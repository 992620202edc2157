"""Embedding queries: similarity search, IVF index, entity linking, distributed
connected components."""

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
from ._shared import RADIX_SHIFT, _merge_partials, _read
from .relational import EMB_ITERS, EMB_K, EMB_SCALE


# ---------------------------------------------------------------------
# embeddings: similarity + distributed connected components
# ---------------------------------------------------------------------

def embed_knn(sf_dir):
    """brute-force cosine top-10 for the vec_id=0 query vector."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    out = knn_brute_force(ds, qv[None, :], k=10)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


EMBED_KNN_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) AS sim
  FROM embeddings, q
)
SELECT vec_id, cast(row_number() OVER (ORDER BY sim DESC, vec_id ASC) - 1 AS BIGINT) AS rank
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


IVF_ADD_MOD, IVF_ADD_OFF = 13, 10_000_000


def embed_ivf_add_knn(sf_dir):
    """ANN served from an INCREMENTALLY GROWN materialized IVF index
    (similarity.add_to_ivf_index — FAISS's IndexIVF.add shape): the
    base index is built once, a delta of re-keyed vector copies
    (vec_id %% 13 → key+10⁷, identical embedding) is ADDED against the
    FIXED centroids (hardlinked base segments + delta segments — the
    base corpus is never read or rewritten), and the query probes the
    merged version with n_probe = ALL buckets, which makes IVF exact
    — so a plain brute-force SQL oracle over the post-delta vector
    set proves add(index, δ) == index(corpus ∪ δ) end to end. This
    gives the ANN-index family its fully-oracled member
    (embed_knn_ivf stays the honest approximate path)."""
    import os

    from ...stages.similarity import (add_to_ivf_index, build_ivf_index,
                                     knn_ivf_indexed)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = "/tmp/ferenda_ray_ivf/%s_c8_v1" % os.path.basename(
        sf_dir.rstrip("/"))
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        build_ivf_index(ds, base, n_centroids=8)
        with open(os.path.join(base, "_SUCCESS"), "w") as fh:
            fh.write("ok")

    def delta_rows(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        keep = ids % IVF_ADD_MOD == 0
        return pa.table({
            "vec_id": pa.array(ids[keep] + IVF_ADD_OFF, pa.int64()),
            "embedding": t["embedding"].filter(
                pa.array(keep, pa.bool_()))})

    delta = ds.map_batches(delta_rows, batch_format="pyarrow")
    merged = "%s_add_v1" % base
    add_to_ivf_index(base, delta, merged)

    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    out = knn_ivf_indexed(merged, qv[None, :], k=10, n_probe=8)
    # rank on cosine rounded to 12 dp: the planted exact-duplicate
    # tie must break on vec_id in BOTH engines — raw float64 dots
    # drift a final ulp with BLAS kernel/segment-size choice, which
    # would otherwise flip the (0, 0+10⁷) pair nondeterministically
    out = out.copy()
    out["c12"] = out["cosine"].round(12)
    out = (out.sort_values(["c12", "vec_id"],
                           ascending=[False, True], kind="mergesort")
           .reset_index(drop=True))
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return (out[["vec_id", "rank"]]
            .astype({"vec_id": "int64", "rank": "int64"}))


IVF_ADD_SQL = """
WITH allv AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + %d, embedding FROM embeddings
  WHERE vec_id %% %d = 0),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[])
           AS sim
  FROM allv, q)
SELECT vec_id,
       CAST(row_number() OVER (ORDER BY round(sim, 12) DESC,
                               vec_id ASC) - 1
            AS BIGINT) AS rank
FROM s ORDER BY round(sim, 12) DESC, vec_id ASC LIMIT 10
""" % (IVF_ADD_OFF, IVF_ADD_MOD)


def segment_price_median(sf_dir):
    """GROUPED radix selection: the exact median order price PER
    customer market segment — the per-group generalization of
    ``orders_price_percentiles``. A grouped exact median over a wide
    value domain normally means a per-group sort; here BOTH passes
    stay zero-shuffle because the histogram key is (segment,
    bucket): pass 1 histograms high bits per segment (bounded
    |segments|·2^14 cells — still a lossless combiner), one walk per
    segment pins its ceil(N_g/2) rank to a bucket + residual, pass 2
    histograms full values inside only the selected (segment,
    bucket) cells. The segment dimension attaches through
    ``joins.attach_dim`` (broadcast ≤ threshold, bucketed hash join
    at 10⁹ customers — forced-path tested).

    Ranks are ceil(N/2) with value-ties, so SQL's per-partition
    row_number replays rank→value engine-independently."""
    def seg_cents(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        return pd.DataFrame({
            "seg": pd.Series(t["seg"].to_pylist(), dtype=object),
            "v": cents})

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        df = seg_cents(t)
        df["hi"] = df["v"].to_numpy() >> RADIX_SHIFT
        out = (df.groupby(["seg", "hi"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["hi"] = out["hi"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    # materialize the tagged narrow table ONCE -- both histogram
    # passes scan it, and re-running the attach (and on the large
    # path, its exchange) per pass doubles the cost (measured
    # 0.6 -> 0.95 s at sf0.1 before this)
    ds = joins.attach_dim(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_mktsegment"]),
        "o_custkey", "c_custkey", "c_mktsegment", out_col="seg",
        how="inner").materialize()
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby(["seg", "hi"], as_index=False)["n"].sum())
    targets = {}  # seg -> (hi_bucket, residual_rank)
    for seg, g in h1.groupby("seg"):
        g = g.sort_values("hi").reset_index(drop=True)
        n = int(g["n"].sum())
        k = (n + 1) // 2  # ceil(N/2) — the lower median
        cum = g["n"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets[seg] = (int(g["hi"].iloc[i]), k - prev)
    wanted = {s: hi for s, (hi, _) in targets.items()}

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        df = seg_cents(t)
        hi = df["v"].to_numpy() >> RADIX_SHIFT
        keep = hi == df["seg"].map(wanted).to_numpy()
        df = df[keep]
        out = (df.groupby(["seg", "v"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["v"] = out["v"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby(["seg", "v"], as_index=False)["n"].sum())
    rows = []
    for seg, (hi, resid) in sorted(targets.items()):
        g = h2[h2["seg"] == seg].sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        j = int(np.searchsorted(cum, resid))
        rows.append((seg, int(g["v"].iloc[j])))
    return pd.DataFrame({
        "c_mktsegment": pd.Series([r[0] for r in rows], dtype=object),
        "median_cents": pd.Series([r[1] for r in rows],
                                  dtype="int64")})


SEGMENT_MEDIAN_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders JOIN customer c ON o_custkey = c.c_custkey),
r AS (
  SELECT seg, v,
         row_number() OVER (PARTITION BY seg ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM j)
SELECT seg AS c_mktsegment, CAST(v AS BIGINT) AS median_cents
FROM r WHERE rn = (n + 1) // 2
ORDER BY seg
"""


EMB_DIM, EMB_QUANT = 64, 1000.0


def source_embedding_coherence(sf_dir):
    """Exact within-group embedding coherence in ONE streaming pass —
    the cluster-quality statistic (within-cluster sum of squared
    pairwise distances) computed WITHOUT the pairwise join, via the
    sufficient-statistics identity Σ_{i<j}|vᵢ−vⱼ|² = n·Σ|vᵢ|² − |Σvᵢ|².
    A naive implementation shuffles O(n²) pairs per group; this moves
    exactly (n_groups × (2 + dim)) integers — the same decomposition
    that makes distributed variance/k-means updates one-pass.

    Exactness: embeddings quantize to integer milli-units with
    half-away rounding (the cents discipline) so every sum, square
    and the final cross-multiplied milli-average replay bit-for-bit
    in SQL. Scale shape: per-batch per-source partials (n, Σ|q|²,
    Σq as DIM int columns) are a lossless combiner; the bounded
    merge block squares the summed vector and divides exactly —
    zero shuffle at any corpus size."""
    import ray

    # dimension dispatch (the verify_jaccard contract): the
    # (doc_id → source) arm broadcasts as a dict ≤ threshold; above
    # it, each embedding row first QUANTIZES to flat int64 scalar
    # columns (vec_id, s2, c0..cD) — a carrier that CAN ride the
    # bucketed exchange (object-ndarray columns can't, the
    # ragged-TensorArray pitfall) — then attach_dim joins the source
    # on, and a downstream per-batch combiner re-bounds the rows.
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    docs_dim = _read(sf_dir, "documents",
                     columns=["doc_id", "source"])

    def _quant(df: pd.DataFrame) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) * EMB_QUANT
                      for v in df["embedding"]])
        return (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)

    def _empty_partial() -> pd.DataFrame:
        cols = {"source": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "s2": pd.Series(dtype="int64")}
        cols.update({"c%d" % d: pd.Series(dtype="int64")
                     for d in range(EMB_DIM)})
        return pd.DataFrame(cols)

    docs_df = joins.collect_dim_small(docs_dim)
    if docs_df is not None:
        src_ref = ray.put(dict(zip(docs_df["doc_id"].astype(int),
                                   docs_df["source"])))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray
            if len(df) == 0:
                return _empty_partial()
            s2n = _ray.get(src_ref)
            q = _quant(df)
            out = pd.DataFrame({
                "source": [s2n[int(k)] for k in df["vec_id"]],
                "n": np.ones(len(df), np.int64),
                "s2": (q * q).sum(axis=1)})
            for d in range(EMB_DIM):
                out["c%d" % d] = q[:, d]
            p = out.groupby("source", as_index=False).sum()
            p["source"] = p["source"].astype(object)
            return p

        partials = emb.map_batches(partial, batch_format="pandas")
    else:
        def quantize(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                cols = {"vec_id": pd.Series(dtype="int64"),
                        "n": pd.Series(dtype="int64"),
                        "s2": pd.Series(dtype="int64")}
                cols.update({"c%d" % d: pd.Series(dtype="int64")
                             for d in range(EMB_DIM)})
                return pd.DataFrame(cols)
            q = _quant(df)
            out = pd.DataFrame({
                "vec_id": df["vec_id"].to_numpy().astype("int64"),
                "n": np.ones(len(df), np.int64),
                "s2": (q * q).sum(axis=1)})
            for d in range(EMB_DIM):
                out["c%d" % d] = q[:, d]
            return out

        flat = emb.map_batches(quantize, batch_format="pandas")
        tagged = joins.attach_dim(flat, docs_dim, "vec_id", "doc_id",
                                  "source", out_col="source",
                                  how="inner")

        def by_source(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return _empty_partial()
            p = (df.drop(columns=["vec_id"])
                 .groupby("source", as_index=False).sum())
            p["source"] = p["source"].astype(object)
            cols = ["source", "n", "s2"] + ["c%d" % d
                                            for d in range(EMB_DIM)]
            return p[cols]

        partials = tagged.map_batches(by_source, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).sum()
        cvec = g[["c%d" % d for d in range(EMB_DIM)]].to_numpy()
        n = g["n"].to_numpy(np.int64)
        S = g["s2"].to_numpy(np.int64)
        # Python ints: n·S and |Σq|² exceed int64 long before 100 TB
        rows = []
        for i, src in enumerate(g["source"]):
            T = sum(int(x) * int(x) for x in cvec[i])
            tot = int(n[i]) * int(S[i]) - T  # = Σ_{i<j} d²
            pairs = int(n[i]) * (int(n[i]) - 1)
            rows.append((src, int(n[i]),
                         (tot * 2000) // pairs if pairs else 0))
        out = pd.DataFrame(rows, columns=["source", "n_docs",
                                          "coherence_milli"])
        out = out.sort_values("source").reset_index(drop=True)
        out["source"] = out["source"].astype(object)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["coherence_milli"] = out["coherence_milli"].astype("int64")
        return out

    return _merge_partials(partials, final)


SOURCE_COHERENCE_SQL = """
WITH x AS (
  SELECT d.source, e.vec_id, s.i,
         CAST(round(e.embedding[s.i] * 1000) AS BIGINT) AS q
  FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id,
  generate_series(1, %d) s(i)),
per_vec AS (
  SELECT source, vec_id, CAST(sum(q * q) AS BIGINT) AS s2
  FROM x GROUP BY 1, 2),
dims AS (
  SELECT source, i, CAST(sum(q) AS BIGINT) AS sq
  FROM x GROUP BY 1, 2),
a AS (
  SELECT source, count(*) AS n, CAST(sum(s2) AS HUGEINT) AS S
  FROM per_vec GROUP BY 1),
t AS (
  SELECT source, CAST(sum(CAST(sq AS HUGEINT) * sq) AS HUGEINT) AS T
  FROM dims GROUP BY 1)
SELECT a.source, CAST(a.n AS BIGINT) AS n_docs,
       CAST((CAST(a.n AS HUGEINT) * a.S - t.T) * 2000
            // (a.n * (a.n - 1)) AS BIGINT) AS coherence_milli
FROM a JOIN t USING (source)
ORDER BY a.source
""" % EMB_DIM


SEMDEDUP_OFFSET = 10_000_000
SEMDEDUP_THR = (9025, 10000)  # τ=0.95 → τ² as an exact integer ratio

MMR_POOL, MMR_K = 50, 5
MMR_LAM = (7, 10)  # λ = 7/10 relevance weight, cross-multiplied


def mmr_search(sf_dir):
    """Maximal Marginal Relevance diversified top-k retrieval
    (Carbonell & Goldstein, SIGIR'98): greedily pick MMR_K results
    that balance closeness to the query (vec_id = 0's embedding)
    against redundancy with the already-selected set —
    argmax over candidates of  λ·(−d²(q,c)) + (1−λ)·min_{s∈S} d²(c,s),
    i.e. score = (den−num)·min_sel_dist − num·query_dist with
    λ = num/den kept as the exact integer cross-multiplication.

    Scale shape: relevance distances are exact integer squared-L2
    computed MAP-SIDE against the broadcast quantized query vector
    (zero shuffle); each batch emits only its partial top-MMR_POOL
    rows, so the single merge block holds blocks × MMR_POOL rows and
    the O(MMR_POOL · MMR_K) greedy runs once there. Integer
    fixed-point throughout (clustering.quantize_vectors, scale 1000)
    so the SQL oracle replays every greedy step bit-exactly.
    Reference parity: the reranking counterpart of fulltextindex
    query()'s relevance-ordered hits (fulltextindex.py:159-170) —
    diversification is a new-design training-data/RAG operator."""
    from ...stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrow = (ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow").to_pandas())
    qv = np.floor(np.asarray(list(qrow["embedding"])[0], dtype=np.float64)
                  * EMB_SCALE).astype(np.int64)
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE)
    num, den = MMR_LAM

    def part(t: pa.Table) -> pa.Table:
        m = clustering._qmatrix(t["qv"])
        ids = t["vec_id"].to_numpy().astype(np.int64)
        keep = ids != 0
        m, ids = m[keep], ids[keep]
        diff = m - qv[None, :]
        qd = np.einsum("ij,ij->i", diff, diff)
        order = np.lexsort((ids, qd))[:MMR_POOL]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "qd": pa.array(qd[order], pa.int64()),
                         "qv": clustering._qv_column(m[order])})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["qd", "vec_id"], kind="mergesort")
              .head(MMR_POOL).reset_index(drop=True))
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in df["qv"]])
        ids = df["vec_id"].to_numpy(np.int64)
        qd = df["qd"].to_numpy(np.int64)
        sel = [0]  # first pick = nearest to the query (ties: vec_id)
        while len(sel) < min(MMR_K, len(df)):
            rem = np.setdiff1d(np.arange(len(df)), sel)
            d = ((mat[rem][:, None, :] - mat[sel][None, :, :]) ** 2
                 ).sum(axis=2).min(axis=1)
            score = (den - num) * d - num * qd[rem]
            best = rem[np.lexsort((ids[rem], -score))[0]]
            sel.append(int(best))
        return pd.DataFrame({
            "rank": pd.Series(range(len(sel)), dtype="int64"),
            "vec_id": pd.Series(ids[sel], dtype="int64"),
            "qd": pd.Series(qd[sel], dtype="int64")})

    return _merge_partials(qds.map_batches(part, batch_format="pyarrow"),
                           merge)


def _mmr_sql() -> str:
    """Unrolled greedy replay of mmr_search (same discipline as
    _kmeans_ctes): candidate pool by (qd, vec_id), then MMR_K − 1
    steps of min-distance-to-selected + cross-multiplied argmax."""
    num, den = MMR_LAM
    li = "CAST(list_inner_product(%s, %s) AS BIGINT)"
    dist = ("(" + li % ("c.v", "c.v") + " + " + li % ("s.v", "s.v")
            + " - 2 * " + li % ("c.v", "s.v") + ")")
    ctes = [
        "b AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % EMB_SCALE,
        "q AS (SELECT v AS qv FROM b WHERE vec_id = 0)",
        "d AS (SELECT vec_id, v, " + li % ("v", "v") + " + "
        + li % ("qv", "qv") + " - 2 * " + li % ("v", "qv")
        + " AS qd FROM b, q WHERE vec_id <> 0)",
        "cand AS (SELECT * FROM d ORDER BY qd, vec_id LIMIT %d)" % MMR_POOL,
        "p0 AS (SELECT vec_id, v, qd FROM cand ORDER BY qd, vec_id LIMIT 1)",
        "sel0 AS (SELECT vec_id, v FROM p0)",
    ]
    for i in range(1, MMR_K):
        ctes.append(
            "m%d AS (SELECT c.vec_id, min(%s) AS md FROM cand c, sel%d s"
            " WHERE c.vec_id NOT IN (SELECT vec_id FROM sel%d)"
            " GROUP BY c.vec_id)" % (i, dist, i - 1, i - 1))
        ctes.append(
            "p%d AS (SELECT c.vec_id, c.v, c.qd FROM cand c"
            " JOIN m%d m ON m.vec_id = c.vec_id"
            " ORDER BY (%d * m.md - %d * c.qd) DESC, c.vec_id LIMIT 1)"
            % (i, i, den - num, num))
        ctes.append(
            "sel%d AS (SELECT * FROM sel%d"
            " UNION ALL SELECT vec_id, v FROM p%d)" % (i, i - 1, i))
    picks = " UNION ALL ".join(
        "SELECT CAST(%d AS BIGINT) AS rank, vec_id, CAST(qd AS BIGINT)"
        " AS qd FROM p%d" % (i, i) for i in range(MMR_K))
    return "WITH " + ",\n".join(ctes) + "\n" + picks


MMR_SQL = _mmr_sql()


def embed_kmeans(sf_dir):
    """Distributed integer k-means (Lloyd's, k=8, 2 iterations) over
    the embeddings table — stages/clustering.kmeans_int: quantized
    int64 vectors, map-side assignment against broadcast centroids,
    bounded (cluster, count, sumvec) partials per pass. Output =
    per-cluster size + exact integer inertia. The SQL oracle unrolls
    both Lloyd iterations (list_inner_product distances are exact:
    every intermediate stays < 2⁵³)."""
    from ...stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat)

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"cluster": t["cluster"].to_numpy(),
                           "dist": t["dist"].to_numpy()})
        g = df.groupby("cluster", as_index=False).agg(
            n=("dist", "size"), inertia=("dist", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", as_index=False)[["n", "inertia"]].sum()
        for c in ("cluster", "n", "inertia"):
            g[c] = g[c].astype("int64")
        return g

    return _merge_partials(
        ads.map_batches(part, batch_format="pyarrow"), merge)


def _kmeans_ctes(k: int, iterations: int, scale: int,
                 base: str) -> tuple[str, int]:
    """Shared CTE chain replaying kmeans_int bit-exactly. ``base`` is
    the SQL for the quantized vector table b(vec_id, v). Returns
    (ctes, final_assignment_index)."""
    ctes = [
        "q0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % scale,
        "b AS (%s)" % base,
        "n AS (SELECT vec_id, v,"
        " CAST(list_inner_product(v, v) AS BIGINT) AS nn FROM b)",
        "c0 AS (SELECT vec_id AS c, v, nn FROM n WHERE vec_id < %d)" % k,
    ]
    for i in range(1, iterations + 2):
        ctes.append(
            "d%d AS (SELECT n.vec_id, c.c, n.nn + c.nn"
            " - 2 * CAST(list_inner_product(n.v, c.v) AS BIGINT) AS dist"
            " FROM n, c%d c)" % (i, i - 1))
        ctes.append(
            "a%d AS (SELECT vec_id, c, dist FROM"
            " (SELECT vec_id, c, dist, row_number() OVER"
            " (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM d%d)"
            " WHERE rn = 1)" % (i, i))
        if i <= iterations:
            ctes.append(
                "u%d AS (SELECT a.c, UNNEST(range(1, len(n.v) + 1)) AS dim,"
                " UNNEST(n.v) AS val FROM a%d a"
                " JOIN n ON n.vec_id = a.vec_id)" % (i, i))
            ctes.append(
                "m%d AS (SELECT c, dim, FLOOR(SUM(val) / COUNT(*)) AS val"
                " FROM u%d GROUP BY c, dim)" % (i, i))
            ctes.append(
                "c%dl AS (SELECT c, list(val ORDER BY dim) AS v"
                " FROM m%d GROUP BY c)" % (i, i))
            ctes.append(
                "c%d AS (SELECT c, v,"
                " CAST(list_inner_product(v, v) AS BIGINT) AS nn"
                " FROM c%dl)" % (i, i))
    return ",\n".join(ctes), iterations + 1


_KM_CTES, _KM_FINAL = _kmeans_ctes(
    EMB_K, EMB_ITERS, EMB_SCALE, "SELECT vec_id, v FROM q0")

EMBED_KMEANS_SQL = """
WITH %s
SELECT c AS cluster, count(*) AS n, CAST(sum(dist) AS BIGINT) AS inertia
FROM a%d GROUP BY c
""" % (_KM_CTES, _KM_FINAL)


def topic_shards(sf_dir):
    """Topic sharding — the 'partition the corpus by embedding
    cluster' curation step (cluster-balanced training shards): k-means
    cluster each embedding, bucket-hash-join the cluster ids to the
    documents table (neither side broadcast), count docs per
    (cluster, source). The count is a bounded two-phase aggregate
    (k × sources cells)."""
    from ...stages import clustering
    from ...stages.joins import bucket_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(emb, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"], "cluster": t["cluster"]}),
        batch_format="pyarrow")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    joined = bucket_join(docs, ads, left_on="doc_id")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "source"]).size().reset_index(
            name="n_docs")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "source"], as_index=False)[
            "n_docs"].sum()
        g["cluster"] = g["cluster"].astype("int64")
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    return _merge_partials(
        joined.map_batches(part, batch_format="pandas"), merge)


TOPIC_SHARDS_SQL = """
WITH %s
SELECT a.c AS cluster, d.source, count(*) AS n_docs
FROM a%d a JOIN documents d ON d.doc_id = a.vec_id
GROUP BY a.c, d.source
""" % (_KM_CTES, _KM_FINAL)


def cluster_pseudo_labels(sf_dir):
    """Cluster-majority auto-labeling (pseudo-labeling / weak
    supervision for training-data curation): k-means the embedding
    space, take each cluster's majority gold label (ties → smallest
    label), stamp it on every member. Scale shape: the (cluster,
    label) vote is a BOUNDED k × L two-phase partial aggregate; the
    k-row majority map is a driver pull the size of the centroid set,
    broadcast back map-side — per-vector rows never shuffle after the
    one label bucket-join."""
    import ray

    from ...stages import clustering
    from ...stages.joins import bucket_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(emb, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"],
                            "cluster": t["cluster"]}),
        batch_format="pyarrow")
    labels = _read(sf_dir, "embeddings", columns=["vec_id", "label"])
    joined = bucket_join(labels, ads, left_on="vec_id").materialize()

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "label"]).size().reset_index(name="n")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "label"], as_index=False)["n"].sum()
        return g

    votes = _merge_partials(
        joined.map_batches(part, batch_format="pandas"),
        merge).take_all()  # ≤ k × L rows — bounded like the centroids
    best: dict[int, int] = {}
    for r in sorted(votes, key=lambda r: (r["cluster"], -r["n"],
                                          r["label"])):
        best.setdefault(int(r["cluster"]), int(r["label"]))
    ref = ray.put(best)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = df[["vec_id", "cluster"]].copy()
        out["cluster"] = out["cluster"].astype("int64")
        out["pseudo_label"] = (
            out["cluster"].map(m).astype("int64"))
        return out

    return joined.map_batches(attach, batch_format="pandas")


CLUSTER_PSEUDO_SQL = """
WITH %s,
lab AS (SELECT a.vec_id, a.c, e.label FROM a%d a
        JOIN embeddings e ON e.vec_id = a.vec_id),
cnt AS (SELECT c, label, count(*) AS n FROM lab GROUP BY c, label),
maj AS (SELECT c, label AS pseudo_label FROM
        (SELECT c, label, row_number() OVER
         (PARTITION BY c ORDER BY n DESC, label) AS rn FROM cnt)
        WHERE rn = 1)
SELECT l.vec_id, l.c AS cluster, m.pseudo_label
FROM lab l JOIN maj m ON m.c = l.c
""" % (_KM_CTES, _KM_FINAL)


PCA_ITERS = 2
PCA_NORM = 1000  # per-iteration max-abs renormalization target


def embed_pca_power(sf_dir):
    """Distributed EXACT-integer PCA (top principal direction of the
    uncentered second-moment matrix, power iteration): each batch
    reduces to the d×d partial Gram matrix qmatᵀ·qmat — the exchange
    carries d² = 4096 int64 cells regardless of row count, the
    canonical 'distributed linear algebra as a bounded partial
    aggregate' shape. The merged matrix is a driver pull the size of
    the centroid set (same contract as kmeans_int); the p=2 power
    iterations renormalize by max-abs to %d with TRUNCATING division
    (DuckDB's `//`), so every intermediate is an int64 the SQL oracle
    replays bit-exactly. Output: (dim, component) — the unnormalized
    top eigenvector direction."""
    from ...stages import clustering
    from ...stages.clustering import _qmatrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE)

    def cov_part(t: pa.Table) -> pa.Table:
        qmat = _qmatrix(t["qv"])
        if len(qmat) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        c = qmat.T @ qmat  # int64; |cells| ≤ rows·scale² ≪ 2⁶³
        d = c.shape[0]
        return pa.table({
            "i": pa.array(np.repeat(np.arange(1, d + 1), d), pa.int64()),
            "j": pa.array(np.tile(np.arange(1, d + 1), d), pa.int64()),
            "s": pa.array(c.reshape(-1), pa.int64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["i", "j"], as_index=False)["s"].sum()
        for c in ("i", "j", "s"):
            g[c] = g[c].astype("int64")
        return g

    cells = _merge_partials(
        qds.map_batches(cov_part, batch_format="pyarrow"), merge).take_all()
    d = max(r["i"] for r in cells)
    cov = np.zeros((d, d), np.int64)
    for r in cells:
        cov[r["i"] - 1, r["j"] - 1] = r["s"]

    v = np.ones(d, np.int64)
    for _ in range(PCA_ITERS):
        w = cov @ v
        m = np.abs(w).max()
        # DuckDB // truncates toward zero; mirror it exactly
        v = (np.sign(w) * ((np.abs(w) * PCA_NORM) // m)).astype(np.int64)

    return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                     "component": pa.array(v, pa.int64())})


def _pca_sql(iters: int, scale: int, norm: int, dim: int) -> str:
    ctes = [
        "q0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % scale,
        "u AS (SELECT vec_id, UNNEST(range(1, %d)) AS i, UNNEST(v) AS x"
        " FROM q0)" % (dim + 1),
        "cov AS (SELECT a.i AS i, b.i AS j,"
        " CAST(SUM(CAST(a.x AS BIGINT) * b.x) AS BIGINT) AS s"
        " FROM u a JOIN u b USING (vec_id) GROUP BY a.i, b.i)",
        "r0 AS (SELECT DISTINCT i, CAST(1 AS BIGINT) AS v FROM cov)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            "w%d AS (SELECT c.i, CAST(SUM(c.s * r.v) AS BIGINT) AS w"
            " FROM cov c JOIN r%d r ON r.i = c.j GROUP BY c.i)" % (k, k - 1))
        ctes.append("m%d AS (SELECT MAX(ABS(w)) AS m FROM w%d)" % (k, k))
        ctes.append(
            "r%d AS (SELECT i, (w * %d) // m AS v FROM w%d, m%d)"
            % (k, norm, k, k))
    return ("WITH %s\nSELECT i AS dim, CAST(v AS BIGINT) AS component"
            " FROM r%d" % (",\n".join(ctes), iters))


EMBED_PCA_SQL = _pca_sql(PCA_ITERS, EMB_SCALE, PCA_NORM, 64)


PROTO_DQ = 1 << 12  # distance-quantization step for the median:
# unit-norm embeddings × EMB_SCALE=1000 put ‖a−c‖² in [0, ~4·10⁶],
# so //2¹² gives a bounded ~10³-bucket histogram domain


def prototype_prune(sf_dir):
    """SSL-prototypes data pruning (Sorscher et al., 'Beyond neural
    scaling laws', 2022): drop the EASY half of each cluster — the
    examples closest to their prototype (centroid) — and keep the
    informative far half. The per-cluster median distance is read off
    a bounded (cluster, dist//2¹²) histogram (same cumulative-pick
    convention as source_token_quantiles), broadcast back, and the
    prune itself is a zero-shuffle map-side filter; distances are the
    exact integer k-means distances, so the SQL oracle replays the
    whole decision."""
    import ray

    from ...stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"], "cluster": t["cluster"],
            "dist_bucket": pc.divide(t["dist"], PROTO_DQ)}),
        batch_format="pyarrow").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cluster", "dist_bucket"]).size()
             .reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cluster", "dist_bucket"],
                          as_index=False)["cnt"].sum()

    rows = _merge_partials(
        ads.map_batches(hist, batch_format="pandas"), merge).take_all()
    med: dict[int, int] = {}
    by_c: dict[int, list] = {}
    for r in rows:
        by_c.setdefault(int(r["cluster"]), []).append(
            (int(r["dist_bucket"]), int(r["cnt"])))
    for c, h in by_c.items():
        h.sort()
        n = sum(cnt for _, cnt in h)
        idx0, cum = (n - 1) // 2, 0
        for db, cnt in h:
            cum += cnt
            if cum > idx0:
                med[c] = db
                break
    ref = ray.put(med)

    def prune(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        cl = t["cluster"].to_numpy()
        db = t["dist_bucket"].to_numpy()
        thr = np.array([m[int(c)] for c in cl], np.int64)
        return t.filter(pa.array(db > thr))

    return ads.map_batches(prune, batch_format="pyarrow")


PROTO_PRUNE_SQL = """
WITH %s,
pb AS (SELECT vec_id, c, dist // %d AS db FROM a%d),
pr AS (SELECT c, db,
              row_number() OVER (PARTITION BY c ORDER BY db, vec_id) AS rn,
              count(*) OVER (PARTITION BY c) AS n
       FROM pb),
pmed AS (SELECT c, max(CASE WHEN rn = 1 + (n - 1) // 2 THEN db END) AS mdb
         FROM pr GROUP BY c)
SELECT pb.vec_id, pb.c AS cluster, pb.db AS dist_bucket
FROM pb JOIN pmed ON pmed.c = pb.c WHERE pb.db > pmed.mdb
""" % (_KM_CTES, PROTO_DQ, _KM_FINAL)


def semantic_dedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    flag within-cluster near-identical vectors (cos ≥ 0.95 via the
    exact cross-multiplied integer predicate; the smaller key is
    kept). Clones are PLANTED in integer space (vec_id%%10 → clone at
    +10⁷ with dim-0 + 1) so the expected duplicates exist and the SQL
    oracle derives the clone vectors from the originals exactly
    (floor(x)+1 == floor(x+1))."""
    from ...stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        from ...stages.clustering import _qmatrix, _qv_column

        keys = t["vec_id"].to_numpy()
        qmat = _qmatrix(t["qv"])
        mask = keys % 10 == 0
        clones = qmat[mask].copy()
        if len(clones):
            clones[:, 0] += 1
        return pa.table({
            "vec_id": pa.array(
                np.concatenate([keys, keys[mask] + SEMDEDUP_OFFSET]),
                pa.int64()),
            "qv": _qv_column(np.concatenate([qmat, clones])),
        })

    qds = (clustering.quantize_vectors(ds, scale=EMB_SCALE)
           .map_batches(plant, batch_format="pyarrow").materialize())
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat, carry_qv=True)
    return clustering.semdedup_flags(ads, thr_num=SEMDEDUP_THR[0],
                                     thr_den=SEMDEDUP_THR[1])


_SD_CTES, _SD_FINAL = _kmeans_ctes(
    EMB_K, EMB_ITERS, EMB_SCALE,
    "SELECT vec_id, v FROM q0 UNION ALL "
    "SELECT vec_id + %d, list_concat([v[1] + 1], list_slice(v, 2, len(v)))"
    " FROM q0 WHERE vec_id %% 10 = 0" % SEMDEDUP_OFFSET)

SEMANTIC_DEDUP_SQL = """
WITH %s,
p AS (
  SELECT y.vec_id AS kb,
         CAST(list_inner_product(nx.v, ny.v) AS BIGINT) AS dot,
         nx.nn AS na, ny.nn AS nb
  FROM a%d x JOIN a%d y ON x.c = y.c AND x.vec_id < y.vec_id
  JOIN n nx ON nx.vec_id = x.vec_id
  JOIN n ny ON ny.vec_id = y.vec_id
),
dup AS (SELECT DISTINCT kb FROM p
        WHERE dot > 0 AND dot * dot * %d >= %d * na * nb)
SELECT n.vec_id, (dup.kb IS NULL) AS kept
FROM n LEFT JOIN dup ON dup.kb = n.vec_id
""" % (_SD_CTES, _SD_FINAL, _SD_FINAL,
       SEMDEDUP_THR[1], SEMDEDUP_THR[0])


def canonicalize_cc(sf_dir):
    """distributed connected components over a chain graph derived from
    embeddings labels (edges = consecutive vec_ids within a label) —
    component representative must equal min vec_id per label."""
    import ray.data as rd

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(v) for v in g["vec_id"])
        a = ["v%08d" % ids[i] for i in range(len(ids) - 1)]
        b = ["v%08d" % ids[i + 1] for i in range(len(ids) - 1)]
        return pd.DataFrame({"uri_a": a, "uri_b": b})

    edges = ds.groupby("label").map_groups(chain, batch_format="pandas")
    labels = connected_components_distributed(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["node"].str[1:].astype("int64"),
            "canonical": df["label"].str[1:].astype("int64"),
        }),
        batch_format="pandas",
    )


CANON_CC_SQL = """
SELECT vec_id, min(vec_id) OVER (PARTITION BY label) AS canonical
FROM embeddings
"""


def canonicalize_cc_star(sf_dir):
    """Same component problem as canonicalize_cc, solved by the
    giant-component-safe alternating large-star/small-star contraction
    (flat pair state, vectorized per-bucket min — no member sets on
    any reducer). Same oracle: both algorithms must agree exactly."""
    import ray.data as rd

    from ...stages.canonicalize import connected_components_starcontract

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(v) for v in g["vec_id"])
        a = ["v%08d" % ids[i] for i in range(len(ids) - 1)]
        b = ["v%08d" % ids[i + 1] for i in range(len(ids) - 1)]
        return pd.DataFrame({"uri_a": a, "uri_b": b})

    edges = ds.groupby("label").map_groups(chain, batch_format="pandas")
    labels = connected_components_starcontract(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["node"].str[1:].astype("int64"),
            "canonical": df["label"].str[1:].astype("int64"),
        }),
        batch_format="pandas",
    )
