"""stages/transform.heavy_hitters: the two-phase pigeonhole /
Misra–Gries exact φ-heavy-hitter operator.

Planted Zipf-ish skew with a key space much larger than ``cap`` so the
per-block candidate pruning is ACTIVE (not the degenerate
everything-is-a-candidate small-batch regime), then the result is
compared against the brute-force exact answer — completeness (no
heavy key missed) and exactness (no false positive, exact counts)."""

import collections

import pandas as pd
import pytest


def _planted_keys():
    # key i appears 2000 // (i + 1) times (harmonic skew) for the 40
    # hot keys, plus a 5000-key uniform tail of singletons: vocabulary
    # 5040 ≫ cap, total ~12.8k rows.
    keys = []
    for i in range(40):
        keys.extend(["hot%03d" % i] * (2000 // (i + 1)))
    keys.extend("tail%04d" % i for i in range(5000))
    return keys


@pytest.mark.parametrize("cap", [50, 400])
def test_exact_vs_bruteforce(ray_session, cap):
    import ray.data as rd

    from ferenda_ray.stages.transform import heavy_hitters

    keys = _planted_keys()
    n = len(keys)
    counts = collections.Counter(keys)
    expected = sorted((k, c) for k, c in counts.items() if c * cap > n)

    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    got = heavy_hitters(ds, "k", cap=cap).to_pandas()
    assert sorted(zip(got["k"], got["cnt"])) == expected
    assert len(expected) > 0  # the test must discriminate


def test_no_heavy_keys_is_empty(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.transform import heavy_hitters

    # uniform: nobody exceeds N/cap for cap < vocabulary size
    ds = rd.from_pandas(
        pd.DataFrame({"k": ["u%04d" % i for i in range(4000)]}))
    got = heavy_hitters(ds, "k", cap=100).to_pandas()
    assert len(got) == 0


def test_pruning_active(ray_session):
    """With block rows ≫ cap the per-block candidate set must be a
    strict subset of the vocabulary (the whole point of the
    pattern)."""
    import ray.data as rd

    from ferenda_ray.stages.transform import heavy_hitters

    keys = _planted_keys()
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))  # one block
    n = len(keys)
    counts = collections.Counter(keys)
    cap = 50
    # the candidate rule per single block IS the global rule here, so
    # the result equals brute force and the candidate set equals the
    # answer set — far smaller than the 5040-key vocabulary.
    got = heavy_hitters(ds, "k", cap=cap).to_pandas()
    expected = {k for k, c in counts.items() if c * cap > n}
    assert set(got["k"]) == expected
    assert 0 < len(expected) < 100
