"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All stateless ``map_batches`` transforms with vectorized or
cheap-per-row bodies; every scoring rule is deterministic and
documented so DuckDB oracles can recompute the SQL-expressible ones
(token counts, char metrics, fingerprints).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import normalize_space

# --- language id --------------------------------------------------------

# tiny per-language stopword profiles (public common-word lists)
_STOP = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "que"},
}
_CJK = re.compile("[一-鿿]")
_WORD = re.compile(r"[a-zA-ZÀ-ÿ]+")


def detect_lang(text: str, default: str = "und") -> str:
    """N-gram/stopword heuristic: CJK-char ratio → zh; else the
    language whose stopword profile matches most tokens; ties and
    no-evidence → default."""
    if not text:
        return default
    cjk = len(_CJK.findall(text))
    if cjk and cjk / max(1, len(text)) > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD.findall(text)]
    if not words:
        return default
    best, best_score = default, 0
    for lang in sorted(_STOP):
        score = sum(1 for w in words if w in _STOP[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


class LangId:
    """Actor-pool stage (profiles + regexes compiled once per actor)."""

    def __init__(self, text_col: str = "text", default: str = "und"):
        self.text_col = text_col
        self.default = default

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [detect_lang(t or "", self.default)
                 for t in batch[self.text_col].to_pylist()]
        return batch.append_column("detected_lang", pa.array(langs, pa.string()))


# --- quality scoring ----------------------------------------------------

def quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality signals (C4/Gopher-style public heuristics):
    n_chars, n_tokens, mean token length, alpha ratio, digit ratio,
    punct ratio, stopword ratio, max line length.  Vectorized where
    Arrow kernels exist; token passes are one python loop per doc."""
    texts = batch[text_col].to_pylist()
    n_chars, n_tokens, mean_tok, alpha_r, digit_r, punct_r, stop_r = \
        [], [], [], [], [], [], []
    en_stop = _STOP["en"]
    for t in texts:
        t = t or ""
        toks = t.split()
        n = len(t)
        n_chars.append(n)
        n_tokens.append(len(toks))
        mean_tok.append(sum(map(len, toks)) / len(toks) if toks else 0.0)
        alpha = sum(c.isalpha() for c in t)
        digit = sum(c.isdigit() for c in t)
        punct = sum(c in ".,;:!?()[]{}\"'" for c in t)
        alpha_r.append(alpha / n if n else 0.0)
        digit_r.append(digit / n if n else 0.0)
        punct_r.append(punct / n if n else 0.0)
        stop_r.append(
            sum(1 for w in toks if w.lower() in en_stop) / len(toks)
            if toks else 0.0)
    out = batch
    for name, vals, typ in (
        ("n_chars", n_chars, pa.int64()),
        ("n_tokens", n_tokens, pa.int64()),
        ("mean_token_len", mean_tok, pa.float64()),
        ("alpha_ratio", alpha_r, pa.float64()),
        ("digit_ratio", digit_r, pa.float64()),
        ("punct_ratio", punct_r, pa.float64()),
        ("stopword_ratio", stop_r, pa.float64()),
    ):
        out = out.append_column(name, pa.array(vals, typ))
    return out


def quality_filter(batch: pa.Table, min_tokens: int = 5,
                   min_mean_token_len: float = 2.0,
                   max_mean_token_len: float = 12.0) -> pa.Table:
    """Keep documents passing the quality gates (applied after
    quality_metrics)."""
    keep = pc.and_(
        pc.greater_equal(batch["n_tokens"], min_tokens),
        pc.and_(
            pc.greater_equal(batch["mean_token_len"], min_mean_token_len),
            pc.less_equal(batch["mean_token_len"], max_mean_token_len),
        ),
    )
    return batch.filter(keep)


# --- token counting -----------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
# (the GPT-2 pre-tokenizer regex family — public)
_BPEISH = re.compile(r"\w+|[^\w\s]+", re.UNICODE)


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """whitespace + BPE-ish token counts per doc (both emitted so the
    whitespace count stays SQL-verifiable)."""
    texts = batch[text_col].to_pylist()
    ws = [len((t or "").split()) for t in texts]
    bpe = [len(_BPEISH.findall(t or "")) for t in texts]
    return (batch
            .append_column("ws_tokens", pa.array(ws, pa.int64()))
            .append_column("bpeish_tokens", pa.array(bpe, pa.int64())))


# --- fingerprinting -----------------------------------------------------

def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic doc fingerprints:
    - ``fp_md5``: md5 of whitespace-normalized text (SQL-verifiable:
      md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))));
    - ``fp_roll``: 64-bit polynomial rolling hash of the normalized
      text (Rabin-Karp style, base 257 mod 2^61-1)."""
    texts = batch[text_col].to_pylist()
    md5s, rolls = [], []
    mod = (1 << 61) - 1
    for t in texts:
        norm = normalize_space(t or "")
        md5s.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        h = 0
        for ch in norm:
            h = (h * 257 + ord(ch)) % mod
        rolls.append(h)
    return (batch
            .append_column("fp_md5", pa.array(md5s, pa.string()))
            .append_column("fp_roll", pa.array(rolls, pa.int64())))


# --- overlapping window chunking (RAG / context-window prep) ------------

def chunk_windows(batch: pa.Table, text_col: str = "text",
                  key_col: str = "doc_id", size: int = 64,
                  stride: int = 48) -> pa.Table:
    """Split each document into overlapping word windows (``size``
    words every ``stride`` — the RAG / embedding-input chunking
    recipe). Doc-local explode: fuses with the read, nothing shuffles,
    and output chunks are independent rows ready for downstream
    embedding / packing stages. Start positions are
    range(0, max(n_words - overlap, 1), stride) so the tail is always
    covered exactly once and no chunk is a subset of its predecessor.
    Tokenization pinned to whitespace split (== regexp '\\S+'), chunk
    text re-joined with single spaces — both SQL-recomputable."""
    overlap = size - stride
    keys, cids, nw, texts = [], [], [], []
    for key, txt in zip(batch[key_col].to_pylist(),
                        batch[text_col].to_pylist()):
        words = (txt or "").split()
        n = len(words)
        for s in range(0, max(n - overlap, 1), stride):
            keys.append(key)
            cids.append(s // stride)
            nw.append(min(s + size, n) - s)
            texts.append(" ".join(words[s:s + size]))
    return pa.table({
        key_col: pa.array(keys, batch[key_col].type),
        "chunk_id": pa.array(cids, pa.int64()),
        "n_words": pa.array(nw, pa.int64()),
        "chunk_text": pa.array(texts, pa.string()),
    })


# --- repetition metrics (Gopher-style quality rules) --------------------

def repetition_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document duplicate-n-gram statistics — the Gopher repetition
    filters (Rae et al. 2021, "Scaling Language Models", App. A1.1)
    with integer outputs so a SQL oracle hashes exactly: word counts,
    distinct-vs-total 2-/3-gram counts, and the top single-word
    frequency. The filter thresholds (e.g. drop when
    1 - distinct_2/ngrams_2 > 0.2) stay caller-side so one scan serves
    any policy. Doc-local — fuses with the read, never shuffles.
    Tokenization pinned to single-space split == string_split(text,' ')."""
    from collections import Counter

    n_words, top_word = [], []
    tot2, dis2, tot3, dis3 = [], [], [], []
    for txt in batch[text_col].to_pylist():
        words = (txt or "").split(" ")
        n = len(words)
        n_words.append(n)
        top_word.append(max(Counter(words).values()))
        g2 = [" ".join(words[i:i + 2]) for i in range(n - 1)]
        g3 = [" ".join(words[i:i + 3]) for i in range(n - 2)]
        tot2.append(len(g2)); dis2.append(len(set(g2)))
        tot3.append(len(g3)); dis3.append(len(set(g3)))
    out = batch.drop_columns([text_col])
    for name, vals in (("n_words", n_words), ("top_word", top_word),
                       ("ngrams_2", tot2), ("distinct_2", dis2),
                       ("ngrams_3", tot3), ("distinct_3", dis3)):
        out = out.append_column(name, pa.array(vals, pa.int64()))
    return out
