"""Bloom anti/semi-join fallback must be exactly equal to the
broadcast path; bucket_join agrees with pandas merge."""

import numpy as np
import pandas as pd
import pytest

from ferenda_ray.stages import joins


def test_bloom_filter_no_false_negatives():
    bf = joins.BloomFilter(1000, fp_rate=0.01)
    members = pd.Series(["k%d" % i for i in range(1000)])
    others = pd.Series(["x%d" % i for i in range(5000)])
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 0.05  # ~1% target, generous bound


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    rows = [{"k": i, "v": "row%d" % i} for i in range(500)]
    keys = [{"key": i} for i in range(0, 500, 3)]  # every third key
    return rd.from_items(rows), rd.from_items(keys)


def _sorted(df):
    return df.sort_values("k", kind="mergesort").reset_index(drop=True)


def test_anti_join_bloom_equals_broadcast(sides):
    rows, keys = sides
    bc = _sorted(joins.membership_join(
        rows, "k", keys, "key", mode="anti").to_pandas())
    bl = _sorted(joins.membership_join(
        rows, "k", keys, "key", mode="anti", force_bloom=True).to_pandas())
    pd.testing.assert_frame_equal(bc, bl.astype(bc.dtypes.to_dict()))
    assert set(bc["k"]) == {i for i in range(500) if i % 3 != 0}


def test_semi_join_bloom_equals_broadcast(sides):
    rows, keys = sides
    bc = _sorted(joins.membership_join(
        rows, "k", keys, "key", mode="semi").to_pandas())
    bl = _sorted(joins.membership_join(
        rows, "k", keys, "key", mode="semi", force_bloom=True).to_pandas())
    pd.testing.assert_frame_equal(bc, bl.astype(bc.dtypes.to_dict()))
    assert set(bc["k"]) == set(range(0, 500, 3))


def test_anti_join_query_forced_bloom(ray_session, sf_smoke):
    """The registered anti-join query must produce identical rows on
    both paths over the real testdata."""
    from ferenda_ray.pipelines.queries import anti_join_empty_orders

    a = anti_join_empty_orders(sf_smoke).to_pandas().sort_values(
        "o_orderkey").reset_index(drop=True)
    b = anti_join_empty_orders(sf_smoke, force_bloom=True).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_skeleton_forced_bloom(ray_session, sf_smoke):
    from ferenda_ray.pipelines import facets
    from ferenda_ray.pipelines.queries import _kg

    triples = _kg(sf_smoke)["triples"]
    a = facets.skeleton_entities(triples).to_pandas().sort_values(
        "uri").reset_index(drop=True)
    b = facets.skeleton_entities(triples, force_bloom=True).to_pandas() \
        .sort_values("uri").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bucket_join_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 50, 300),
                         "a": np.arange(300)})
    right = pd.DataFrame({"kk": np.arange(0, 60, 2),
                          "b": ["v%d" % i for i in range(0, 60, 2)],
                          "a": np.arange(30)})  # name collision → a_r
    got = joins.bucket_join(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "kk").to_pandas()
    exp = left.merge(right.rename(columns={"kk": "k", "a": "a_r"}), on="k")
    key = ["k", "a", "a_r", "b"]
    got = got[key].sort_values(key).reset_index(drop=True)
    exp = exp[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_asof_join_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "lid": np.arange(300, dtype="int64"),
        "ts": rng.randint(0, 10_000, 300).astype("int64"),
        "uid": rng.randint(0, 20, 300).astype("int64")})
    right = pd.DataFrame({
        "rid": np.arange(200, dtype="int64"),
        "ts": rng.randint(0, 10_000, 200).astype("int64"),
        "uid": rng.randint(0, 25, 200).astype("int64")})
    got = joins.asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="ts", by="uid", how="inner").to_pandas()
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="uid", direction="backward", suffixes=("", "_r"))
    exp = exp[exp["rid"].notna()].astype({"rid": "int64"})
    exp = exp.rename(columns={"rid": "rid"})
    exp["ts_r"] = exp["ts"]  # pandas collapses the key; ours keeps both
    key = ["lid", "rid"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["lid"].values == exp["lid"].values).all()
    assert (got["rid"].values == exp["rid"].values).all()
    assert (got["ts_r"].values <= got["ts"].values).all()


def test_asof_join_forward_and_left(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"lid": [0, 1, 2], "ts": [10, 50, 90],
                         "uid": [1, 1, 1]})
    right = pd.DataFrame({"rid": [0, 1], "ts": [40, 60], "uid": [1, 1]})
    fwd = joins.asof_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="ts", by="uid", direction="forward",
                          how="inner").to_pandas().sort_values("lid")
    # 10→40 (rid 0), 50→60 (rid 1), 90→none
    assert list(fwd["lid"]) == [0, 1]
    assert list(fwd["rid"]) == [0, 1]
    lj = joins.asof_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="ts", by="uid", how="left").to_pandas()
    assert len(lj) == 3  # unmatched left row retained


def test_range_join_pairs_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "eid": np.arange(200, dtype="int64"),
        "ts": rng.randint(0, 500, 200).astype("int64"),
        "uid": rng.randint(0, 8, 200).astype("int64")})
    got = joins.range_join_pairs(
        rd.from_pandas(df), on="ts", by="uid", window=np.int64(30),
        key_col="eid").to_pandas()
    exp = df.merge(df, on="uid", suffixes=("_a", "_b"))
    exp = exp[(exp["ts_b"] > exp["ts_a"])
              & (exp["ts_b"] <= exp["ts_a"] + 30)]
    assert len(got) == len(exp)
    assert (set(zip(got["key_a"], got["key_b"]))
            == set(zip(exp["eid_a"], exp["eid_b"])))
