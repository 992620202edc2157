"""N-gram language-model quality scoring (CCNet-style, Wenzek et al.
LREC 2020: score web documents by a reference LM's likelihood and use
the score as a curation signal — public literature; the reference
engine has no LM stage, this is part of the training-data surface the
brief adds on top).

Two-phase operator, both phases distributed:

1. **train** — bigram counts over the corpus with a vectorized
   per-batch partial count (combiner) before ONE bucketed exchange
   keyed on the bigram hash; the model is pruned to the global top-K
   bigrams
   (deterministic ``count DESC, w1 ASC, w2 ASC`` order — every global
   top-K row is in its bucket's top-K, so a per-bucket top-K followed
   by one bounded merge is exact). Prefix totals ``C(w1)`` are
   computed over the FULL bigram table (not just survivors), so
   pruning only drops lookups, never skews probabilities.
2. **score** — the pruned model (≤K entries, int credits) rides ONE
   ``ray.put``; scoring is a stateless per-batch pass that never
   shuffles text.

INTEGER arithmetic end to end so a SQL oracle replicates scores
bit-exactly:

    credit(w1,w2) = (C(w1,w2) * scale) // C(w1)   if (w1,w2) kept
                    0                              otherwise (OOV)
    lm_score(doc) = Σ credit(pairs) // max(n_tokens - 1, 1)

Higher = more in-distribution. Tokens = whitespace split (the same
``\\S+`` convention as token_counts / the oracles).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import _hash64

__all__ = ["train_bigram_model", "LMScorer", "lm_score",
           "hashed_feature_counts", "dsir_weights", "dsir_score",
           "train_centroid_classifier", "CentroidScorer",
           "centroid_quality"]

SCALE = 10 ** 6


def _pool_size() -> tuple:
    """Cluster-sized autoscaling actor-pool bounds (the kg.py linker
    idiom — a fixed small cap starves a 32-CPU box when scoring is
    the only running stage)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (max(2, ncpu // 4), max(4, ncpu - 2))

# --- DSIR-style hashed-feature importance weighting -------------------
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling" — public literature: estimate importance weights from
# hashed n-gram feature counts of a raw corpus vs a target-domain
# sample, score every raw doc by its tokens' weights. Feature hashing
# bounds the model at N_FEATURES buckets BY CONSTRUCTION, so the
# weight table always fits one ray.put broadcast no matter the corpus
# size — that bound is the whole point of the hashing trick.)
#
# INTEGER weights so a SQL oracle replicates scores bit-exactly:
#     w(b)          = ((target_count(b) + 1) * SCALE)
#                     // (source_count(b) + 1)        (add-1 smoothing)
#     dsir_score(d) = Σ_{tokens t of d} w(bucket(t))  (multiplicity)
# bucket(t) = int(md5(t)[:15 hex], 16) % N_FEATURES — the same
# md5-prefix convention as transform.hash_split, SQL-replicable via
# CAST('0x' || substr(md5(t), 1, 15) AS BIGINT). Tokens are the
# pinned split(" ") / string_split(text, ' ') convention.

N_FEATURES = 1 << 16


def _md5_feature(words: np.ndarray) -> np.ndarray:
    """unique word array → int64 feature bucket (md5-prefix mod)."""
    import hashlib

    return np.array(
        [int(hashlib.md5(str(w).encode("utf-8")).hexdigest()[:15], 16)
         % N_FEATURES for w in words],
        dtype=np.int64)


def _batch_feature_codes(texts) -> np.ndarray:
    """All token feature buckets of a batch (multiplicity kept);
    md5 runs once per DISTINCT word via factorize."""
    words: list = []
    for t in texts:
        words.extend((t or "").split(" "))
    if not words:
        return np.empty(0, dtype=np.int64)
    codes, uniq = pd.factorize(np.asarray(words, dtype=object))
    return _md5_feature(uniq)[codes]


def hashed_feature_counts(docs_ds, text_col: str = "text",
                          num_buckets: int = 64):
    """Distributed token-count over the hashed feature space:
    Dataset(b, c) with one row per occupied bucket (≤ N_FEATURES rows
    total by construction). Per-batch bincount combiner → ONE bucketed
    merge exchange carrying narrow (b, c) rows."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        f = _batch_feature_codes(df[text_col])
        c = np.bincount(f, minlength=N_FEATURES)
        nz = np.nonzero(c)[0]
        out = pd.DataFrame({"b": nz.astype("int64"),
                            "c": c[nz].astype("int64")})
        out["_bucket"] = (out["b"] % num_buckets).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("b", as_index=False)["c"].sum()
        return pd.DataFrame({"b": out["b"].astype("int64"),
                             "c": out["c"].astype("int64")})

    return (docs_ds.map_batches(part, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def dsir_weights(source_ds, target_ds, text_col: str = "text",
                 num_buckets: int = 64) -> np.ndarray:
    """(N_FEATURES,) int64 weight vector from the two corpora's hashed
    feature counts. The driver touches only the two ≤N_FEATURES-row
    count tables (bounded by construction — see module comment), never
    a document."""
    src = np.zeros(N_FEATURES, dtype=np.int64)
    for row in hashed_feature_counts(source_ds, text_col,
                                     num_buckets).iter_rows():
        src[row["b"]] = row["c"]
    tgt = np.zeros(N_FEATURES, dtype=np.int64)
    for row in hashed_feature_counts(target_ds, text_col,
                                     num_buckets).iter_rows():
        tgt[row["b"]] = row["c"]
    return ((tgt + 1) * SCALE) // (src + 1)


class DSIRScorer:
    """Actor-pool scoring stage: resolves the broadcast weight vector
    once per actor, then scores batches with one vectorized gather —
    no shuffle, text never leaves the map task."""

    def __init__(self, weights_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self.w = (ray.get(weights_ref)
                  if not isinstance(weights_ref, np.ndarray)
                  else weights_ref)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-wide: ONE factorize+md5 over all words, then per-doc
        # segment sums via np.add.reduceat (every doc yields >= 1
        # word because split(" ") of "" is [""], so no empty segment)
        texts = batch[self.text_col].to_pylist()
        words: list = []
        lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = (t or "").split(" ")
            lens[i] = len(ws)
            words.extend(ws)
        if words:
            codes, uniq = pd.factorize(np.asarray(words, dtype=object))
            vals = self.w[_md5_feature(uniq)[codes]]
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            scores = np.add.reduceat(vals, offs).astype(np.int64)
        else:
            scores = np.empty(0, dtype=np.int64)
        return pa.table({self.id_col: batch[self.id_col],
                         "dsir_score": pa.array(scores, pa.int64())})


def dsir_score(source_ds, target_ds, id_col: str = "doc_id",
               text_col: str = "text", num_buckets: int = 64,
               concurrency: tuple | int | None = None):
    """Score every document of ``source_ds`` by its DSIR importance
    weight against ``target_ds``'s feature distribution. Returns
    Dataset(id_col, dsir_score). Two bounded count exchanges to train,
    one broadcast, zero shuffles to score."""
    import ray

    w = dsir_weights(source_ds, target_ds, text_col, num_buckets)
    ref = ray.put(w)
    return source_ds.map_batches(
        DSIRScorer,
        fn_constructor_kwargs={"weights_ref": ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or _pool_size(),
    )


def _doc_words(texts):
    """Concatenated token stream + per-doc lengths (shared by the
    bigram combiner and the scorer)."""
    words: list = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = (t or "").split()
        lens[i] = len(ws)
        words.extend(ws)
    return words, lens


def _pair_codes(words, lens):
    """(codes a*V+b for adjacent pairs, valid mask, uniq vocab, V).
    Pairs straddling a document boundary are masked out — exactly
    the per-doc zip(toks, toks[1:]) semantics, vectorized."""
    codes, uniq = pd.factorize(np.asarray(words, dtype=object))
    V = np.int64(len(uniq))
    a = codes[:-1].astype(np.int64) * V + codes[1:]
    valid = np.ones(len(a), dtype=bool)
    ends = np.cumsum(lens)
    idx = ends[:-1] - 1
    idx = idx[(idx >= 0) & (idx < len(a))]
    valid[idx] = False
    return a, valid, uniq, V


def _bigram_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch combiner: one factorize + np.unique over the packed
    pair codes → narrow (w1, w2, c) rows; no Python loop over pairs
    and the exchange never sees text."""
    words, lens = _doc_words(batch[text_col].to_pylist())
    if len(words) < 2:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    a, valid, uniq, V = _pair_codes(words, lens)
    upair, cnt = np.unique(a[valid], return_counts=True)
    if not len(upair):
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    return pa.table({
        "w1": pa.array(uniq[(upair // V)], pa.string()),
        "w2": pa.array(uniq[(upair % V)], pa.string()),
        "c": pa.array(cnt.astype(np.int64), pa.int64())})


def train_bigram_model(docs_ds, text_col: str = "text",
                       k_bigrams: int = 50_000,
                       num_buckets: int = 64) -> dict:
    """Train the pruned bigram model. Returns a plain dict
    ``{(w1, w2): credit}`` with ``credit = (c * SCALE) // C(w1)`` —
    bounded at ``k_bigrams`` entries, ready for one ``ray.put``.

    The driver touches only (a) the per-bucket top-K candidate rows
    (≤ num_buckets * K) and (b) the ≤K surviving rows — never the
    full vocabulary."""

    partials = docs_ds.map_batches(
        lambda t: _bigram_partials(t, text_col), batch_format="pyarrow")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df["w1"].astype(str) + "\x1f" + df["w2"].astype(str)
        df["_bucket"] = (_hash64(key)
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    # full bigram table, each (w1,w2) exactly once — materialized so
    # the top-K pass and the prefix-total pass share one execution
    big = (partials.map_batches(bucketize, batch_format="pandas")
           .groupby("_bucket").map_groups(merge, batch_format="pandas")
           ).materialize()

    # prefix totals over the FULL table: partial per batch, merged on
    # the driver only for the ≤K prefixes the kept bigrams need
    def prefix_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("w1", as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    def topk_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c", "w1", "w2"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k_bigrams)

    kept = (big.map_batches(topk_part, batch_format="pandas")
            .to_pandas()
            .sort_values(["c", "w1", "w2"],
                         ascending=[False, True, True], kind="mergesort")
            .head(k_bigrams))

    prefixes = set(kept["w1"])
    pref_parts = big.map_batches(prefix_part, batch_format="pandas")

    def keep_needed(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["w1"].isin(prefixes)]

    pref = (pref_parts.map_batches(keep_needed, batch_format="pandas")
            .to_pandas().groupby("w1")["c"].sum())

    return {
        (w1, w2): int((c * SCALE) // int(pref[w1]))
        for w1, w2, c in kept.itertuples(index=False)
    }


class LMScorer:
    """Actor-pool scoring stage: resolves the broadcast model ref once
    per actor in ``__init__``, then scores batches with dict lookups —
    no shuffle, text never leaves the map task."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self.model = (ray.get(model_ref)
                      if not isinstance(model_ref, dict) else model_ref)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: factorize the batch's words once, project the
        # (bounded, broadcast) model onto the batch vocabulary as
        # sorted packed pair codes, gather credits via searchsorted,
        # and read per-doc totals off one prefix sum — no per-pair
        # Python loop (the DSIRScorer discipline)
        model = self.model
        texts = batch[self.text_col].to_pylist()
        words, lens = _doc_words(texts)
        if len(words) < 2:
            scores = np.zeros(len(texts), dtype=np.int64)
        else:
            a, valid, uniq, V = _pair_codes(words, lens)
            index = {w: np.int64(i) for i, w in enumerate(uniq)}
            mk, mv = [], []
            for (w1, w2), credit in model.items():
                i1 = index.get(w1)
                if i1 is None:
                    continue
                i2 = index.get(w2)
                if i2 is None:
                    continue
                mk.append(i1 * V + i2)
                mv.append(credit)
            credits = np.zeros(len(a), dtype=np.int64)
            if mk:
                order = np.argsort(mk)
                mk_s = np.asarray(mk, dtype=np.int64)[order]
                mv_s = np.asarray(mv, dtype=np.int64)[order]
                pos = np.clip(np.searchsorted(mk_s, a), 0,
                              len(mk_s) - 1)
                hit = (mk_s[pos] == a) & valid
                credits[hit] = mv_s[pos[hit]]
            cum = np.concatenate([[0], np.cumsum(credits)])
            off = np.concatenate([[0], np.cumsum(lens)[:-1]])
            start = np.minimum(off, len(credits))
            stop = np.minimum(off + np.maximum(lens - 1, 0),
                              len(credits))
            scores = ((cum[stop] - cum[start])
                      // np.maximum(lens - 1, 1)).astype(np.int64)
        return pa.table({self.id_col: batch[self.id_col],
                         "lm_score": pa.array(scores, pa.int64())})


def lm_score(docs_ds, id_col: str = "doc_id", text_col: str = "text",
             k_bigrams: int = 50_000, num_buckets: int = 64,
             concurrency: tuple | int | None = None):
    """Train on ``docs_ds`` and score every document with the pruned
    model (self-scoring is the CCNet in-distribution signal when no
    external reference corpus is available; pass any other Dataset to
    ``train_bigram_model`` to score against a reference corpus).
    Returns Dataset(id_col, lm_score)."""
    import ray

    model = train_bigram_model(docs_ds, text_col, k_bigrams, num_buckets)
    ref = ray.put(model)
    return docs_ds.map_batches(
        LMScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or _pool_size(),
    )


# --- trained quality classifier (exact-integer nearest centroid) -------
# The GPT-3 data-curation recipe trains a linear quality classifier on
# hashed bag-of-words features (Brown et al. 2020, appendix A: a
# classifier over hashed features separating curated from raw text;
# fastText's linear classifier is the same shape). Here the linear
# model is the Rocchio / nearest-centroid rule in EXACT integers —
# cross-multiplied class centroids, midpoint threshold — so a SQL
# oracle (HUGEINT arithmetic) replays training and scoring
# bit-exactly:
#
#   w_f    = N·S⁺_f − P·S⁻_f          (∝ C⁺ − C⁻, scale P·N)
#   proj_i = Σ_f x_if · w_f
#   pred_i = +1  iff  2·P·N·proj_i ≥ N·A + P·B
#            (A = Σ_f S⁺_f w_f, B = Σ_f S⁻_f w_f — the centroid
#             projections' midpoint, cross-multiplied)
#
# Training is ONE bounded exchange: per-batch class-sum bincounts →
# ≤ d merged (b, s_pos, s_neg) rows + one (P, N) row; the driver
# pulls ≤ d+1 rows (the bounded-centroid contract), forms w and the
# threshold in arbitrary-precision Python ints, and broadcasts.
# Scoring is a zero-shuffle actor pool. Magnitude bound: |w_f| ≤
# N_docs · S_f, so int64 projections are safe to ~10^12 token
# occurrences per feature bucket; the threshold comparison runs in
# Python ints (never wraps) and the SQL twin in HUGEINT.

PERC_D = 4096


def _perc_codes(text: str, d: int) -> np.ndarray:
    toks = (text or "").split(" ")
    codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
    import hashlib

    u = np.array(
        [int(hashlib.md5(str(w).encode("utf-8")).hexdigest()[:15], 16) % d
         for w in uniq], dtype=np.int64)
    return u[codes]


def train_centroid_classifier(docs_ds, label_col: str = "label",
                              text_col: str = "text", d: int = PERC_D,
                              num_buckets: int = 64):
    """Train the integer nearest-centroid model. Returns
    (w: np.int64[d], thr_lhs_mult: int, thr_rhs: int) with the
    decision rule ``thr_lhs_mult * proj >= thr_rhs``."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        sp = np.zeros(d, dtype=np.int64)
        sn = np.zeros(d, dtype=np.int64)
        p = n = 0
        for t, lab in zip(df[text_col], df[label_col]):
            cnt = np.bincount(_perc_codes(t, d), minlength=d)
            if int(lab) == 1:
                sp += cnt
                p += 1
            else:
                sn += cnt
                n += 1
        nz = np.nonzero(sp | sn)[0]
        out = pd.DataFrame({"b": nz.astype("int64"),
                            "sp": sp[nz].astype("int64"),
                            "sn": sn[nz].astype("int64")})
        # b = -1 carries the class-size partial through the same merge
        out = pd.concat([out, pd.DataFrame(
            {"b": [-1], "sp": [p], "sn": [n]})], ignore_index=True)
        out["_bucket"] = (out["b"] % num_buckets).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("b", as_index=False)[["sp", "sn"]].sum()
        return out.astype({"b": "int64", "sp": "int64", "sn": "int64"})

    rows = (docs_ds.map_batches(part, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas")
            .to_pandas())  # <= d+1 rows by construction
    sizes = rows[rows["b"] < 0]
    p, n = int(sizes["sp"].sum()), int(sizes["sn"].sum())
    assert p > 0 and n > 0, "both classes must be non-empty"
    feat = rows[rows["b"] >= 0]
    w = np.zeros(d, dtype=np.int64)
    a_sum = b_sum = 0
    for b, sp, sn in zip(feat["b"], feat["sp"], feat["sn"]):
        wv = n * int(sp) - p * int(sn)  # python ints: never wraps
        w[int(b)] = wv
        a_sum += int(sp) * wv
        b_sum += int(sn) * wv
    return w, 2 * p * n, n * a_sum + p * b_sum


class CentroidScorer:
    """Actor-pool scorer: broadcast model read once per actor."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text", d: int = PERC_D):
        import ray

        self.w, self.lhs_mult, self.rhs = (
            ray.get(model_ref) if not isinstance(model_ref, tuple)
            else model_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.d = d

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        scores, preds = [], []
        for t in batch[self.text_col].to_pylist():
            cnt = np.bincount(_perc_codes(t, self.d), minlength=self.d)
            sc = int(self.w @ cnt)
            scores.append(sc)
            preds.append(1 if self.lhs_mult * sc >= self.rhs else -1)
        return pa.table({self.id_col: pa.array(ids),
                         "score": pa.array(scores, pa.int64()),
                         "pred": pa.array(preds, pa.int64())})


def centroid_quality(docs_ds, id_col: str = "doc_id",
                     label_col: str = "label", text_col: str = "text",
                     d: int = PERC_D, num_buckets: int = 64,
                     concurrency: tuple | int | None = None):
    """Train on (text, label), then score EVERY doc under the model:
    Dataset(id, score, pred). One bounded exchange to train, one
    broadcast, zero shuffles to score."""
    import ray

    model = train_centroid_classifier(docs_ds, label_col, text_col, d,
                                      num_buckets)
    ref = ray.put(model)
    return docs_ds.map_batches(
        CentroidScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col,
                               "text_col": text_col, "d": d},
        batch_format="pyarrow",
        concurrency=concurrency or _pool_size(),
    )
