"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public literature; the engine's real-subword upgrade over
text_analysis.token_counts' BPE-ish regex).

Training follows the standard word-frequency factoring: BPE statistics
depend on the corpus only through the (word, count) table, so ONE
distributed word-count exchange (per-batch Counter combiner →
gram-hash-bucketed merge, optionally pruned by ``min_count``) reduces
10^12 documents to a bounded vocabulary, and the merge loop runs on
that table alone. This is how production trainers work (word-count
pass + table-local merges); the table is bounded by the corpus'
distinct-word count after pruning — set ``min_count`` so it fits the
driver (a 100-TB crawl at min_count≈50 lands in the tens of millions
of rows; the merge loop is O(K · vocab)).

DETERMINISTIC + SQL-replicable by construction:

- symbols start as the word's characters;
- each round merges the pair with the highest total count, ties
  broken by (pair_left ASC, pair_right ASC);
- a merge applies greedily left-to-right (non-overlapping leftmost),
  which equals non-overlapping leftmost string replace on the
  ``|a||b|``-delimited symbol string — the exact representation the
  unrolled-CTE SQL oracle uses (queries.DOC_BPE_SQL), so Python and
  SQL agree bit-exactly at every round.

Words are ``\\S+`` tokens (the token_counts convention) and must not
contain ``|`` (true of \\S+ output on this corpus; asserted during
training).

Encoding broadcasts the merge list once (``ray.put``); the encoder
actor pool caches per-word segmentations, so each DISTINCT word per
actor is segmented once and batches are a vectorized dict lookup.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _bucket_of
from .lm import _pool_size

__all__ = ["word_counts", "train_bpe", "apply_merges", "BPEEncoder",
           "bpe_token_counts"]

_WORD_RE = re.compile(r"\S+")


def word_counts(docs_ds, text_col: str = "text",
                min_count: int = 1, num_buckets: int = 64):
    """Dataset(word, c) over ``\\S+`` tokens: per-batch Counter
    combiner (repeats inside a batch never reach the exchange), ONE
    word-hash-bucketed merge, ``min_count`` pruning applied AFTER the
    global merge so the cut is exact."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        words: list = []
        for t in df[text_col]:
            words.extend(_WORD_RE.findall(t or ""))
        if not words:
            return pd.DataFrame({
                "word": pd.Series([], dtype="object"),
                "c": pd.Series([], dtype="int64"),
                "_bucket": pd.Series([], dtype="int32")})
        codes, uniq = pd.factorize(np.asarray(words, dtype=object))
        out = pd.DataFrame({
            "word": pd.Series(uniq, dtype="object"),
            "c": np.bincount(codes).astype("int64"),
        })
        out["_bucket"] = _bucket_of(out["word"], num_buckets)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False)["c"].sum()
        out = out[out["c"] >= min_count]
        return pd.DataFrame({"word": out["word"].astype("object"),
                             "c": out["c"].astype("int64")})

    return (docs_ds.map_batches(part, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def _merge_once(syms: tuple, a: str, b: str) -> tuple:
    """Greedy leftmost non-overlapping application of merge (a, b)."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(docs_ds, num_merges: int = 12, text_col: str = "text",
              min_count: int = 1, num_buckets: int = 64) -> list:
    """Learn ``num_merges`` merges from the distributed word-count
    table. Returns ``[(left, right), ...]`` in application order."""
    vocab = {}
    for row in word_counts(docs_ds, text_col, min_count,
                           num_buckets).iter_rows():
        w = row["word"]
        assert "|" not in w, "BPE delimiter '|' inside token %r" % w
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + row["c"]

    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _merge_once(syms, *best): c for syms, c in vocab.items()
        }
    return merges


def apply_merges(word: str, merges: list) -> tuple:
    """Segment one word with the learned merges, in order."""
    syms = tuple(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_once(syms, a, b)
    return syms


class BPEEncoder:
    """Actor-pool encoding stage: resolves the broadcast merge list
    once per actor and caches per-word segmentations across batches
    (__init__ once per actor; __call__ per batch). Emits one
    (id, n_bpe_tokens) row per doc — no shuffle, text never leaves
    the map task."""

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self.merges = (ray.get(merges_ref)
                       if not isinstance(merges_ref, list) else merges_ref)
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict = {}

    def _n_tokens(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(apply_merges(word, self.merges))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        # segment only DISTINCT words (cache + factorize); per-doc
        # totals gather + prefix-sum — no per-occurrence Python sum
        texts = batch[self.text_col].to_pylist()
        words: list = []
        lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = _WORD_RE.findall(t or "")
            lens[i] = len(ws)
            words.extend(ws)
        if words:
            codes, uniq = pd.factorize(np.asarray(words, dtype=object))
            per_uniq = np.fromiter(
                (self._n_tokens(w) for w in uniq), np.int64, len(uniq))
            cum = np.concatenate([[0], np.cumsum(per_uniq[codes])])
            ends = np.cumsum(lens)
            counts = (cum[ends] - cum[ends - lens]).astype(np.int64)
        else:
            counts = np.zeros(len(texts), dtype=np.int64)
        return pa.table({self.id_col: batch[self.id_col],
                         "n_bpe_tokens": pa.array(counts, pa.int64())})


def bpe_token_counts(docs_ds, num_merges: int = 12,
                     id_col: str = "doc_id", text_col: str = "text",
                     min_count: int = 1, num_buckets: int = 64,
                     concurrency: tuple | int | None = None):
    """Train on ``docs_ds`` and count every document's BPE tokens.
    Returns Dataset(id_col, n_bpe_tokens). One bounded word-count
    exchange to train, one broadcast, zero shuffles to encode."""
    import ray

    merges = train_bpe(docs_ds, num_merges, text_col, min_count,
                       num_buckets)
    ref = ray.put(merges)
    return docs_ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or _pool_size(),
    )
