"""stages/lm: pruned bigram model training + integer scoring vs
hand-computed expectations (pruning, OOV, prefix totals over the
full table, short/empty docs)."""

import pandas as pd
import ray

from ferenda_ray.stages import lm

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "text": [
        "a b a b a c",      # bigrams: ab x2, ba x2, ac x1
        "a b x y",          # ab, bx, xy
        "a c a c",          # ac x2, ca x1
        "z",                # single token → score 0
        "",                 # empty → score 0
    ],
})
# full bigram counts: ab:3 ba:2 ac:3 bx:1 xy:1 ca:1
# prefix totals:      a: ab+ac = 6... wait: a-prefixed = ab(3)+ac(3) = 6
#                     b: ba(2)+bx(1) = 3;  x: 1;  c: 1 (ca)


def _ds():
    return ray.data.from_pandas(DOCS)


def test_model_full(ray_session):
    m = lm.train_bigram_model(_ds(), k_bigrams=100, num_buckets=4)
    S = lm.SCALE
    assert m == {
        ("a", "b"): (3 * S) // 6, ("a", "c"): (3 * S) // 6,
        ("b", "a"): (2 * S) // 3, ("b", "x"): (1 * S) // 3,
        ("x", "y"): S // 1, ("c", "a"): S // 1,
    }


def test_model_pruned_deterministic(ray_session):
    # top-3 by (c DESC, w1, w2): ab(3), ac(3), ba(2)
    m = lm.train_bigram_model(_ds(), k_bigrams=3, num_buckets=4)
    assert set(m) == {("a", "b"), ("a", "c"), ("b", "a")}
    # prefix totals still over the FULL table: C(b) = 3, not 2
    assert m[("b", "a")] == (2 * lm.SCALE) // 3


def test_scores(ray_session):
    got = lm.lm_score(_ds(), k_bigrams=3, num_buckets=4).to_pandas()
    got = dict(zip(got["doc_id"], got["lm_score"]))
    S = lm.SCALE
    ab, ac, ba = (3 * S) // 6, (3 * S) // 6, (2 * S) // 3
    assert got[0] == (ab + ba + ab + ba + ac) // 5
    assert got[1] == (ab + 0 + 0) // 3          # bx, xy pruned → OOV
    assert got[2] == (ac + 0 + ac) // 3          # ca pruned
    assert got[3] == 0 and got[4] == 0


def test_dsir_weights_and_score(ray_session):
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.stages.lm import (N_FEATURES, SCALE, dsir_score,
                                       dsir_weights)

    rows = [{"doc_id": i,
             "text": " ".join(["alpha", "beta", "gamma", "delta"]
                              [: (i % 4) + 1] * (i + 1))}
            for i in range(12)]
    docs = rd.from_pandas(pd.DataFrame(rows))
    target = rd.from_pandas(pd.DataFrame([r for r in rows
                                          if r["doc_id"] % 3 == 0]))

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % N_FEATURES

    src_c = np.zeros(N_FEATURES, dtype=np.int64)
    tgt_c = np.zeros(N_FEATURES, dtype=np.int64)
    for r in rows:
        for w in r["text"].split(" "):
            src_c[bucket(w)] += 1
            if r["doc_id"] % 3 == 0:
                tgt_c[bucket(w)] += 1
    expect_w = ((tgt_c + 1) * SCALE) // (src_c + 1)

    got_w = dsir_weights(docs, target)
    assert (got_w == expect_w).all()

    got = (dsir_score(docs, target).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for r in rows:
        expect = sum(int(expect_w[bucket(w)])
                     for w in r["text"].split(" "))
        assert int(got.loc[got["doc_id"] == r["doc_id"],
                           "dsir_score"].iloc[0]) == expect
