"""Distributed BPE trainer/encoder vs a straightforward reference
implementation (Sennrich et al. 2016 semantics: char symbols,
highest-count pair per round with (count DESC, pair ASC) tie-break,
greedy leftmost application)."""

import pandas as pd
import pytest

from ferenda_ray.stages.bpe import (apply_merges, bpe_token_counts,
                                    train_bpe, word_counts)


def _ref_train(word_count_pairs, k):
    vocab = {tuple(w): c for w, c in word_count_pairs}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


CORPUS = ["low lower lowest low low",
          "new newer newest new",
          "wide wider widest bid bids",
          "aaaa aa a aaa aaaa"]  # overlap stress for greedy merges


def test_train_matches_reference(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(CORPUS)), "text": CORPUS}))
    wc = {}
    for t in CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1

    got_wc = word_counts(docs).to_pandas()
    assert dict(zip(got_wc["word"], got_wc["c"])) == wc

    for k in (1, 4, 10):
        assert train_bpe(docs, num_merges=k) == _ref_train(wc.items(), k)


def test_encode_counts(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(CORPUS)), "text": CORPUS}))
    merges = train_bpe(docs, num_merges=6)
    got = (bpe_token_counts(docs, num_merges=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(CORPUS):
        expect = sum(len(apply_merges(w, merges)) for w in t.split())
        assert int(got.loc[i, "n_bpe_tokens"]) == expect
    # merged tokens must compress vs raw chars
    raw = sum(len(w) for t in CORPUS for w in t.split())
    assert got["n_bpe_tokens"].sum() < raw


def test_greedy_overlap():
    assert apply_merges("aaaa", [("a", "a")]) == ("aa", "aa")
    assert apply_merges("aaaaa", [("a", "a")]) == ("aa", "aa", "a")
    assert apply_merges("aaaa", [("a", "a"), ("aa", "aa")]) == ("aaaa",)


def test_delimiter_guard(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["bad|token here"]}))
    with pytest.raises(AssertionError):
        train_bpe(docs, num_merges=1)
