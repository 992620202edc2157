"""Unit tests for stages/pii.py, stages/profiling.py and
dedup.duplicated_passages."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ferenda_ray.stages.pii import PII_PATTERNS, PIIScrubber, pii_scan
from ferenda_ray.stages.profiling import profile_columns
from ferenda_ray.stages.dedup import duplicated_passages


def _t(rows):
    return pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                     "text": pa.array(rows, pa.string())})


def test_pii_scan_counts_and_redaction():
    batch = _t([
        "mail a@b.org and c.d+x@e-f.co twice",
        "call +1 555-123-4567 now",
        "ssn 123-45-6789 ip 10.0.0.1",
        "clean text only",
    ])
    out = pii_scan(batch)
    assert list(out["n_email"]) == [2, 0, 0, 0]
    assert list(out["n_phone"]) == [0, 1, 0, 0]
    assert list(out["n_ssn"]) == [0, 0, 1, 0]
    assert list(out["n_ipv4"]) == [0, 0, 1, 0]
    assert out["clean"][0] == "mail <EMAIL> and <EMAIL> twice"
    assert out["clean"][1] == "call <PHONE> now"
    assert out["clean"][2] == "ssn <SSN> ip <IP>"
    assert out["clean"][3] == "clean text only"


def test_pii_redaction_order_no_cross_match():
    # counts are independent per class on the RAW text (the IP-shaped
    # local part IS detected), but redaction applies email first, so
    # the digits are consumed and never re-redacted as an IP
    batch = _t(["x 10.1.2.3@mail4.com y", "p +1 555-123-4567 q"])
    out = pii_scan(batch)
    assert out["clean"][0] == "x <EMAIL> y"
    assert int(out["n_ipv4"][0]) == 1  # detection sees it; scrub wins
    assert out["clean"][1] == "p <PHONE> q"
    assert int(out["n_ssn"][1]) == 0


def test_pii_scrubber_actor_matches_stateless():
    batch = _t(["a@b.org", "+1 555-000-1111 and 1.2.3.4", ""])
    a = pii_scan(batch).reset_index(drop=True)
    b = PIIScrubber()(batch).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pii_patterns_re2_compatible():
    # no lookaround / backreference constructs (RE2 = DuckDB oracle)
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat \
            and "(?<" not in pat and "\\1" not in pat


def test_duplicated_passages(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f tail one",
            "x y a b c d e f",     # shares gram "a b c d e f" with 1
            "u v w p q r",          # too short for any shared gram
            "a b c d e f a b c d e f",  # internal repeat: counts once
        ], pa.string())}))
    out = duplicated_passages(docs, n=6).to_pandas()
    got = dict(zip(out["gram"], out["n_docs"]))
    assert got["a b c d e f"] == 3  # docs 1, 2, 4 — not 4 (doc 4 repeat)
    # every reported gram occurs in >= 2 distinct docs
    assert (out["n_docs"] >= 2).all()


def test_profile_columns_native_minmax_and_nulls(ray_session):
    # two blocks whose per-block numeric minima (5, 41) would compare
    # wrongly as strings ("41" < "5"): native-typed merge must win
    t1 = pa.table({"k": pa.array([41, 100], pa.int64()),
                   "s": pa.array(["b", None], pa.string())})
    t2 = pa.table({"k": pa.array([5, 900], pa.int64()),
                   "s": pa.array(["a", "b"], pa.string())})
    ds = rd.from_arrow_refs([__import__("ray").put(t1),
                             __import__("ray").put(t2)])
    out = profile_columns(ds).set_index("col")
    assert out.loc["k", "min_val"] == "5"
    assert out.loc["k", "max_val"] == "900"
    assert out.loc["k", "n_distinct"] == 4
    assert out.loc["k", "n_null"] == 0
    assert out.loc["s", "n_null"] == 1
    assert out.loc["s", "n_distinct"] == 2
    assert out.loc["s", "min_val"] == "a"
    assert int(out.loc["s", "n_rows"]) == 4


def test_repetition_metrics():
    from ferenda_ray.stages.text_analysis import repetition_metrics

    out = repetition_metrics(_t([
        "a b a b a b",     # 5 bigrams, 2 distinct; 4 trigrams, 2 distinct
        "x",                # no bigrams at all
        "",                 # one empty word
    ])).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_words"] == 6 and out.loc[0, "top_word"] == 3
    assert out.loc[0, "ngrams_2"] == 5 and out.loc[0, "distinct_2"] == 2
    assert out.loc[0, "ngrams_3"] == 4 and out.loc[0, "distinct_3"] == 2
    assert out.loc[1, "ngrams_2"] == 0 and out.loc[1, "top_word"] == 1
    assert out.loc[2, "n_words"] == 1  # "" splits to one empty token


def test_hash_split_deterministic_and_proportioned(ray_session):
    import hashlib as hl

    from ferenda_ray.stages.transform import hash_split

    keys = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    out = hash_split(rd.from_arrow(keys)).to_pandas()
    # membership is a pure function of the key: recompute independently
    for k, s in zip(out["doc_id"], out["split"]):
        b = int(hl.md5(str(k).encode()).hexdigest()[:15], 16) % 100
        assert s == ("train" if b < 80 else "val" if b < 90 else "test")
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15 and 0.05 < frac["test"] < 0.15
