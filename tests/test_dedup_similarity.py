"""Dedup family + similarity search: planted near-dups must be found,
exact brute-force KNN agrees with a numpy reference, IVF recall is
reasonable, multimodal plumbing round-trips."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ferenda_ray.stages import dedup, multimodal, similarity, text_analysis


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    """20 base docs + planted exact and near duplicates."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    rows = []
    for i in range(20):
        words = [vocab[rng.randint(len(vocab))] for _ in range(60)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # exact dup of doc 3
    rows.append({"doc_id": 100, "text": rows[3]["text"]})
    # near dup of doc 5: change 3 of 60 words
    w = rows[5]["text"].split()
    w[10], w[30], w[50] = "changed", "words", "here"
    rows.append({"doc_id": 101, "text": " ".join(w)})
    return rd.from_items(rows), rows


def test_exact_dedup(docs_with_dups):
    ds, rows = docs_with_dups
    out = dedup.exact_dedup(ds).to_pandas()
    assert len(out) == 21  # 22 rows - 1 exact dup
    assert 100 not in set(out["doc_id"])  # doc 3 (min key) survives
    assert 3 in set(out["doc_id"])


def test_minhash_finds_planted_neardup(docs_with_dups):
    ds, rows = docs_with_dups
    canon = dedup.minhash_dedup(ds, threshold=0.5)
    m = dict(zip(canon["key"].astype(str), canon["canonical_key"].astype(str)))
    # near-dup pair (5, 101) must share a canonical representative
    assert m.get("5") == m.get("101") == "5"
    # exact pair (3, 100) certainly shares one
    assert m.get("3") == m.get("100") == "3"


def test_minhash_distributed_path_matches_driver(docs_with_dups):
    """driver_threshold=0 forces the distributed clustering path
    (hash-partitioned verify + hash-to-min CC); its output must equal
    the driver union-find path exactly."""
    ds, rows = docs_with_dups
    small = dedup.minhash_dedup(ds, threshold=0.5)
    dist = dedup.minhash_dedup(ds, threshold=0.5, driver_threshold=0)
    dist_df = dist.to_pandas() if not isinstance(dist, pd.DataFrame) else dist
    a = small.sort_values("key").reset_index(drop=True)
    b = (dist_df.sort_values("key").reset_index(drop=True)
         .astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)


def test_verify_jaccard_distributed_path(docs_with_dups):
    """driver_threshold=0 forces the hash-partitioned verify (no
    driver materialization); pairs carry exact Jaccard values —
    spot-check the planted near-dup pair."""
    ds, rows = docs_with_dups
    bands = dedup.minhash_bands(ds)
    cand = dedup.lsh_candidate_pairs(bands)
    verified = dedup.verify_jaccard(cand, ds, threshold=0.5,
                                    driver_threshold=0)
    assert not isinstance(verified, pd.DataFrame)  # stays distributed
    got = verified.to_pandas()
    row = got[(got["key_a"] == 5) & (got["key_b"] == 101)]
    assert len(row) == 1
    # 3 of 60 words changed → 9 of ~58 trigram shingles differ
    sa = set(dedup.shingle_hashes(rows[5]["text"]).tolist())
    sb = set(dedup.shingle_hashes(rows[21]["text"]).tolist())
    expect = len(sa & sb) / len(sa | sb)
    assert row["jaccard"].iloc[0] == pytest.approx(expect)


def test_minhash_estimates_jaccard():
    """Signature agreement must estimate true Jaccard (would catch a
    degenerate permutation family where every h_i picks the same
    minimum and agreement collapses to 0/1)."""
    words_a = ["w%d" % i for i in range(100)]
    words_b = ["w%d" % i for i in range(50, 150)]  # ~1/3 Jaccard on words
    text_a, text_b = " ".join(words_a), " ".join(words_b)
    sa = dedup.shingle_hashes(text_a)
    sb = dedup.shingle_hashes(text_b)
    true_j = len(set(map(int, sa)) & set(map(int, sb))) / len(
        set(map(int, sa)) | set(map(int, sb)))
    siga = dedup.minhash_signature(sa)
    sigb = dedup.minhash_signature(sb)
    est = float((siga == sigb).mean())
    assert abs(est - true_j) < 0.2, "est %.2f vs true %.2f" % (est, true_j)
    # identical sets → identical signatures
    assert (dedup.minhash_signature(sa) == siga).all()


def test_simhash_finds_exact_dup(docs_with_dups):
    ds, rows = docs_with_dups
    pairs = ds and dedup.simhash_dedup_pairs(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["key_a", "key_b"]].astype(int).values))
    assert (3, 100) in got


@pytest.fixture(scope="module")
def vectors(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 16)
    vecs[150] = vecs[20] + 0.001 * rng.randn(16)  # planted near-identical
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    return rd.from_items(rows), vecs


def test_knn_matches_numpy(vectors):
    ds, vecs = vectors
    q = vecs[0]
    out = similarity.knn_brute_force(ds, q[None, :], k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ (q / np.linalg.norm(q))
    expected = list(np.argsort(-sims)[:5])
    assert list(out["vec_id"]) == expected
    assert list(out["rank"]) == [0, 1, 2, 3, 4]


def test_ivf_finds_top1(vectors):
    ds, vecs = vectors
    q = vecs[7]
    out = similarity.knn_ivf(ds, q[None, :], k=5, n_centroids=8, n_probe=4)
    # the query vector itself must always be recalled as rank 0
    assert out.iloc[0]["vec_id"] == 7


def test_ivf_recall_bound(ray_session):
    """IVF is approximate by design (its queries() entry is rows-only);
    bound its recall@10 against brute force on the real testdata."""
    from ferenda_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    brute = set(Q.embed_knn(sf)["vec_id"])
    ivf = set(Q.embed_knn_ivf(sf)["vec_id"])
    assert len(brute & ivf) / len(brute) >= 0.6


def test_embedding_neardup(vectors):
    ds, vecs = vectors
    pairs = dedup.embedding_neardup_pairs(ds, threshold=0.999).to_pandas()
    got = set(map(tuple, pairs[["key_a", "key_b"]].astype(int).values))
    assert (20, 150) in got


def test_langid():
    assert text_analysis.detect_lang("the cat and the dog sat in the house") == "en"
    assert text_analysis.detect_lang("der hund und die katze ist nicht da") == "de"
    assert text_analysis.detect_lang("le chat est dans la maison pour un jour") == "fr"
    assert text_analysis.detect_lang("el gato es un animal para la casa") == "es"
    assert text_analysis.detect_lang("这是一个中文句子这是一个中文句子") == "zh"
    assert text_analysis.detect_lang("") == "und"


def test_quality_and_tokens():
    batch = pa.table({"text": ["the quick brown fox jumps over the lazy dog",
                               "x", ""]})
    out = text_analysis.quality_metrics(batch)
    assert out["n_tokens"].to_pylist() == [9, 1, 0]
    assert out["stopword_ratio"][0].as_py() == pytest.approx(2 / 9)
    out2 = text_analysis.token_counts(batch)
    assert out2["ws_tokens"].to_pylist() == [9, 1, 0]
    assert out2["bpeish_tokens"].to_pylist() == [9, 1, 0]
    filt = text_analysis.quality_filter(out, min_tokens=2)
    assert filt.num_rows == 1


def test_fingerprint_stable():
    batch = pa.table({"text": ["a  b\nc", "a b c"]})
    out = text_analysis.fingerprint(batch)
    # whitespace-normalized → identical fingerprints
    assert out["fp_md5"][0].as_py() == out["fp_md5"][1].as_py()
    assert out["fp_roll"][0].as_py() == out["fp_roll"][1].as_py()


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    rows = [{"media_id": i, "url": "http://m/%d" % i, "media_type": "image",
             "payload": bytes([i]) * 100, "meta_json": "{}"} for i in range(8)]
    ds = rd.from_items(rows)
    out = multimodal.decode_stage(ds, multimodal.DecodeImage,
                                  concurrency=2, batch_size=4).to_pandas()
    assert set(out.columns) >= {"media_id", "width", "height", "phash"}
    assert len(out) == 8
    # deterministic: same payload → same features
    out2 = multimodal.decode_stage(rd.from_items(rows), multimodal.DecodeImage,
                                   concurrency=2, batch_size=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True))


def _ppm(w, h, value_fn):
    header = b"P6\n%d %d\n255\n" % (w, h)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = value_fn(x, y)
            px += bytes([v, v, v])
    return header + bytes(px)


def test_real_image_decode_ppm_and_bmp():
    """BMP/PPM payloads run the REAL decode path: exact dimensions and
    a content-derived average hash (not a payload-bytes hash)."""
    import struct

    # 8x8 PPM, left half dark / right half bright
    ppm = _ppm(8, 8, lambda x, y: 30 if x < 4 else 220)
    dec = multimodal.DecodeImage(strict=True)  # strict: fake path forbidden
    batch = pa.table({"media_id": [1], "url": ["u"], "media_type": ["image"],
                      "payload": [ppm], "meta_json": ["{}"]})
    out = dec(batch)
    assert out["width"].to_pylist() == [8]
    assert out["height"].to_pylist() == [8]
    assert out["decoded"].to_pylist() == [True]
    # ahash: right half above mean → alternating 0000 1111 rows
    got = out["phash"].to_pylist()[0]
    expected_bits = ("00001111" * 8)[:63]
    assert got == int(expected_bits, 2)

    # 4x2 bottom-up 24bpp BMP, all-bright row then all-dark row
    w, h = 4, 2
    row_dark = bytes([20, 20, 20] * w) + b"\0" * ((4 - (w * 3) % 4) % 4)
    row_bright = bytes([240, 240, 240] * w) + b"\0" * ((4 - (w * 3) % 4) % 4)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(row_dark) * 2, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(row_dark) * 2, 0, 0, 0, 0))
    bmp = header + row_dark + row_bright  # bottom-up: dark stored first
    out2 = dec(pa.table({"media_id": [2], "url": ["u"],
                         "media_type": ["image"], "payload": [bmp],
                         "meta_json": ["{}"]}))
    assert out2["width"].to_pylist() == [4]
    assert out2["height"].to_pylist() == [2]
    assert out2["decoded"].to_pylist() == [True]
    # top half bright (1s), bottom dark (0s) after bottom-up flip
    assert out2["phash"].to_pylist()[0] == int(("1" * 32 + "0" * 31), 2)


def test_real_wav_decode():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        t = np.arange(16000)
        samples = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype("<i2")
        w.writeframes(samples.tobytes())
    payload = buf.getvalue()
    dec = multimodal.ExtractAudioFeatures(strict=True)
    out = dec(pa.table({"media_id": [1], "url": ["u"],
                        "media_type": ["audio"], "payload": [payload],
                        "meta_json": ["{}"]}))
    assert out["n_samples"].to_pylist() == [16000]
    assert out["duration_s"].to_pylist() == [1.0]
    # sine RMS = A/sqrt(2) → 20*log10(10000/32768/sqrt(2)) ≈ -13.3 dB
    assert out["loudness_db"].to_pylist()[0] == pytest.approx(-13.31, abs=0.1)
    assert out["decoded"].to_pylist() == [True]


def test_real_video_frame_sampling():
    """A concatenated-PPM stream samples every_n-th real frame."""
    frames = b"".join(_ppm(4, 4, lambda x, y, v=v: v)
                      for v in (0, 60, 120, 180, 240))
    dec = multimodal.SampleVideoFrames(every_n=2, strict=True)
    out = dec(pa.table({"media_id": [7], "url": ["u"],
                        "media_type": ["video"], "payload": [frames],
                        "meta_json": ["{}"]}))
    assert out["frame_idx"].to_pylist() == [0, 2, 4]
    # uniform frames: no pixel exceeds the mean → ahash 0
    assert out["frame_phash"].to_pylist() == [0, 0, 0]


def test_multimodal_strict_raises():
    """Codecs we cannot really decode (here: a JPEG-ish blob) must
    raise under strict instead of silently faking."""
    dec = multimodal.DecodeImage(strict=True)
    if dec.pil is None:
        batch = pa.table({"media_id": [1], "url": ["u"],
                          "media_type": ["image"],
                          "payload": [b"\xff\xd8\xff\xe0notajpeg"],
                          "meta_json": ["{}"]})
        with pytest.raises(NotImplementedError):
            dec(batch)


def test_video_frame_sampling(ray_session):
    import ray.data as rd

    rows = [{"media_id": i, "url": "http://v/%d" % i, "media_type": "video",
             "payload": bytes([i]) * 64, "meta_json": "{}"} for i in range(4)]
    out = multimodal.decode_stage(
        rd.from_items(rows), multimodal.SampleVideoFrames,
        concurrency=2, batch_size=2).to_pandas()
    assert set(out.columns) == {"media_id", "url", "frame_idx", "frame_phash"}
    assert out.groupby("media_id").size().min() >= 1


def test_ngram_jaccard_exact_vs_brute_force(ray_session):
    """Prefix-filtered AllPairs must find EVERY pair >= threshold (no
    LSH-style misses) — compared against the O(n^2) truth."""
    import itertools

    import ray.data as rd

    from ferenda_ray.stages.dedup import ngram_jaccard_pairs, shingle_hashes

    rng = np.random.RandomState(3)
    vocab = ["w%d" % i for i in range(40)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    docs = list(base)
    for i in range(0, 40, 5):  # planted near-dups: one word changed
        words = base[i].split()
        words[3] = "EDIT"
        docs.append(" ".join(words))
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype="int64"),
                       "text": docs})
    got = ngram_jaccard_pairs(
        rd.from_pandas(df), threshold=0.5).to_pandas()
    got_pairs = set(zip(got["key_a"], got["key_b"]))
    sh = {k: set(np.unique(shingle_hashes(t)).tolist())
          for k, t in zip(df["doc_id"], df["text"])}
    exp_pairs = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        u = sh[a] | sh[b]
        if u and len(sh[a] & sh[b]) / len(u) >= 0.5:
            exp_pairs.add((a, b))
    assert got_pairs == exp_pairs
    assert len(exp_pairs) >= 8  # the planted clones are found


def test_ngram_jaccard_distributed_path(ray_session):
    """driver_threshold=0 forces the hash-partitioned verify path —
    must equal the driver fast path exactly."""
    import ray.data as rd

    from ferenda_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.DataFrame({
        "doc_id": np.arange(20, dtype="int64"),
        "text": ["alpha beta gamma delta epsilon zeta %d" % (i % 4)
                 for i in range(20)]})
    fast = ngram_jaccard_pairs(rd.from_pandas(df),
                               threshold=0.5).to_pandas()
    dist = ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.5,
                               driver_threshold=0).to_pandas()
    key = ["key_a", "key_b"]
    assert (set(zip(fast["key_a"], fast["key_b"]))
            == set(zip(dist["key_a"], dist["key_b"])))
    assert len(fast) == len(fast.drop_duplicates(key))


def test_ivf_indexed_matches_online(vectors, tmp_path):
    """The materialized IVF index (partitioned parquet + stored
    centroids, probed buckets pruned at the read) must return exactly
    what the online knn_ivf returns for the same centroids."""
    ds, vecs = vectors
    idx = str(tmp_path / "ivf")
    cent = similarity.build_ivf_index(ds, idx, n_centroids=8)
    q = vecs[[7, 42]]
    online = similarity.knn_ivf(ds, q, k=5, n_probe=4, centroids=cent)
    indexed = similarity.knn_ivf_indexed(idx, q, k=5, n_probe=4)
    key = ["query_idx", "rank"]
    a = online.sort_values(key).reset_index(drop=True)
    b = indexed.sort_values(key).reset_index(drop=True)
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert np.allclose(a["cosine"], b["cosine"])
    # the index prunes at the read: only probed bucket dirs exist/read
    import os
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    assert any(d.startswith("bucket=") for d in os.listdir(idx))


def test_ed_le1_predicate_exhaustive():
    # O(len) predicate == DP Levenshtein <= 1 for ALL string pairs up
    # to length 3 over a 2-letter alphabet (1296 pairs)
    import itertools

    from ferenda_ray.stages.dedup import _ed_le1

    def dp(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb] <= 1

    strs = ["".join(t) for n in range(4)
            for t in itertools.product("ab", repeat=n)]
    for a in strs:
        for b in strs:
            assert _ed_le1(a, b) == dp(a, b), (a, b)


def test_edit1_join_matches_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from ferenda_ray.stages.dedup import _ed_le1, edit1_join_pairs

    names = (["item-%03d" % i for i in range(40)]        # digit edits
             + ["item-0%02d" % i for i in range(0, 40, 7)]  # len-8 vs 8
             + ["widget", "widgets", "gadget", "gidget", "midget"])
    df = pd.DataFrame({"key": range(len(names)), "name": names})
    got = (edit1_join_pairs(rd.from_pandas(df), text_col="name",
                            key_col="key")
           .to_pandas().sort_values(["key_a", "key_b"])
           .reset_index(drop=True))
    expect = sorted(
        (a, b) for (a, na), (b, nb) in
        itertools.combinations(zip(df["key"], df["name"]), 2)
        if _ed_le1(na, nb))
    assert list(zip(got["key_a"], got["key_b"])) == expect
    assert len(expect) > 50  # the planted set is non-trivial


def test_contamination_matches_brute_force(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.dedup import contamination_flags, decontaminate

    # 20 train docs, 4 bench docs; overlap planted via shared trigrams
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    train_rows = []
    for i in range(20):
        txt = " ".join(words[(i + j) % len(words)] for j in range(6))
        if i % 4 == 0:  # plant the bench passage
            txt += " shared eval passage one two three"
        train_rows.append({"doc_id": i, "text": txt})
    bench_rows = [
        {"doc_id": 100, "text": "shared eval passage one two three tail"},
        {"doc_id": 101, "text": "completely different benchmark words here"},
    ]
    train = rd.from_pandas(pd.DataFrame(train_rows))
    bench = rd.from_pandas(pd.DataFrame(bench_rows))

    n = 6

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench_grams = set().union(*(grams(r["text"]) for r in bench_rows))
    expect_cont = {r["doc_id"] for r in train_rows
                   if grams(r["text"]) & bench_grams}
    assert expect_cont  # the plant must trigger

    flags = (contamination_flags(train, bench, n=n)
             .to_pandas().sort_values("key").reset_index(drop=True))
    assert len(flags) == len(train_rows)
    got_cont = set(flags.loc[flags["contaminated"] == 1, "key"])
    assert got_cont == expect_cont

    surv = decontaminate(train, bench, n=n).to_pandas()
    assert set(surv["key"]) == {r["doc_id"] for r in train_rows} - expect_cont
    by_key = {r["doc_id"]: r["text"] for r in train_rows}
    for k, t in zip(surv["key"], surv["text"]):
        assert t == by_key[k]


def test_winnow_fingerprints(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.dedup import winnow_fingerprints

    shared = "one two three four five six seven eight nine ten"
    rows = [
        {"doc_id": 0, "text": "aa bb cc " + shared + " dd ee"},
        {"doc_id": 1, "text": shared + " zz yy xx ww vv"},
        {"doc_id": 2, "text": "totally different words in this doc"},
        {"doc_id": 3, "text": "too short"},  # < k words: no grams
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = winnow_fingerprints(ds, k=5, w=4).to_pandas()

    assert set(got["key"]) == {0, 1, 2}  # doc 3 emits nothing
    # winnowing guarantee: a shared substring of >= w+k-1 = 8 words
    # must produce at least one common fingerprint
    f0 = set(got.loc[got["key"] == 0, "fp"])
    f1 = set(got.loc[got["key"] == 1, "fp"])
    f2 = set(got.loc[got["key"] == 2, "fp"])
    assert f0 & f1
    assert not (f0 & f2) and not (f1 & f2)
    # density ~2/(w+1): far fewer fingerprints than grams
    n_grams0 = len(rows[0]["text"].split(" ")) - 4
    assert len(got[got["key"] == 0]) < n_grams0
    # determinism
    again = winnow_fingerprints(ds, k=5, w=4).to_pandas()
    a = got.sort_values(["key", "pos"]).reset_index(drop=True)
    b = again.sort_values(["key", "pos"]).reset_index(drop=True)
    assert a.equals(b)


def test_scrub_and_decontaminate_sliced_batches(ray_session):
    """Regression: batches sliced out of a block larger than the
    1024-row batch size carry a NON-zero-based index; the exchange
    prep fns used to index-align fresh positional Series against it,
    exploding into NaN rows / float64 upcast (crash in scrub's
    rebuild, silent drift elsewhere). One 3,000-row block forces the
    slicing path; outputs must match brute force exactly."""
    import ray.data as rd

    from ferenda_ray.stages.dedup import (contamination_flags,
                                          decontaminate,
                                          scrub_duplicated_passages)

    words = "alpha beta gamma delta epsilon zeta eta theta iota".split()
    n_docs, n = 3000, 6
    rows = []
    for i in range(n_docs):
        txt = " ".join(words[(i * 3 + j) % len(words)] for j in range(8))
        if i % 10 == 0:  # cross-doc duplicated passage
            txt += " shared passage marker one two three"
        rows.append({"doc_id": i, "text": txt})
    docs = rd.from_pandas(pd.DataFrame(rows)).repartition(1)

    def grams_of(t):
        w = t.split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    # brute-force scrub reference
    from collections import Counter, defaultdict
    df_count = Counter()
    for r in rows:
        for g in set(grams_of(r["text"])):
            df_count[g] += 1
    expect_clean = {}
    for r in rows:
        w = r["text"].split(" ")
        covered = set()
        for i, g in enumerate(grams_of(r["text"])):
            if df_count[g] >= 2:
                covered.update(range(i, i + n))
        expect_clean[r["doc_id"]] = " ".join(
            t for j, t in enumerate(w) if j not in covered)

    got = (scrub_duplicated_passages(docs, n=n, num_buckets=8)
           .to_pandas())
    assert len(got) == n_docs
    assert got["key"].dtype == np.int64
    for k, t in zip(got["key"], got["clean_text"]):
        assert t == expect_clean[k], k

    # decontaminate against a bench slice, same forced-slicing shape
    bench = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 10 ** 6, "text": "shared passage marker one two three"}]))
    cont_expect = {r["doc_id"] for r in rows
                   if set(grams_of(r["text"]))
                   & set(grams_of("shared passage marker one two three"))}
    surv = decontaminate(docs, bench, n=n, num_buckets=8).to_pandas()
    assert set(surv["key"]) == {r["doc_id"] for r in rows} - cont_expect
    flags = contamination_flags(docs, bench, n=n, num_buckets=8).to_pandas()
    assert set(flags.loc[flags["contaminated"] == 1, "key"]) == cont_expect


def test_minhash_index_incremental(ray_session, tmp_path):
    """build_minhash_index + neardup_vs_index: exact clones under new
    ids must match their source (and only true >=0.5-Jaccard pairs
    survive verify); novel docs match nothing; forced-distributed
    verify path (driver_threshold=0) agrees."""
    import pandas as pd
    import ray

    from ferenda_ray.stages import dedup

    base = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta epsilon zeta",
                 "one two three four five six seven",
                 "alpha beta gamma delta epsilon eta"],
    })
    delta = pd.DataFrame({
        "doc_id": [101, 102],
        "text": ["alpha beta gamma delta epsilon zeta",  # clone of 1
                 "totally unrelated fresh content here"],
    })
    idx = str(tmp_path / "mhidx")
    dedup.build_minhash_index(ray.data.from_pandas(base), idx,
                              num_partitions=4)
    verify = ray.data.from_pandas(pd.concat([base, delta],
                                            ignore_index=True))
    for thr in (None, 0):
        kwargs = {} if thr is None else {"driver_threshold": 0}
        got = dedup.neardup_vs_index(
            ray.data.from_pandas(delta), idx, verify,
            num_partitions=4, threshold=0.5, **kwargs).to_pandas()
        rows = sorted(map(tuple,
                          got[["delta_key", "indexed_key"]]
                          .values.tolist()))
        # the byte-identical clone must hit its source; whether it
        # also hits doc 3 (1's near neighbour) is decided by the same
        # exact >=0.5 trigram-Jaccard rule on both paths
        assert (101, 1) in rows
        assert all(k != 102 for k, _ in rows)
        assert all(k == 101 for k, _ in rows)


def test_containment_pairs_asymmetry_and_dfcap(ray_session):
    """dedup.containment_pairs: an excerpt is contained in its source
    (but not Jaccard-similar); the corpus-df cap removes boilerplate
    grams from BOTH numerator and denominator."""
    import pandas as pd
    import ray

    from ferenda_ray.stages import dedup

    corpus = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["w1 w2 w3 w4 w5 w6 w7 w8 w9",
                 "x1 x2 x3 x4 x5 x6 x7 x8 x9"],
    })
    delta = pd.DataFrame({
        "doc_id": [10, 11],
        "text": ["w1 w2 w3 w4 w5 w6",       # first 2/3 of doc 1
                 "z1 z2 z3 z4 z5 z6"],      # matches nothing
    })
    got = dedup.containment_pairs(
        ray.data.from_pandas(delta), ray.data.from_pandas(corpus),
        cont_num=4, cont_den=5, df_cap=256, num_buckets=4).to_pandas()
    rows = sorted(map(tuple,
                      got[["delta_key", "corpus_key"]].values.tolist()))
    assert rows == [(10, 1)]
    # df_cap=0 marks EVERY corpus gram boilerplate -> no pairs at all
    got0 = dedup.containment_pairs(
        ray.data.from_pandas(delta), ray.data.from_pandas(corpus),
        cont_num=4, cont_den=5, df_cap=0, num_buckets=4).materialize()
    assert got0.count() == 0
