"""Forced-path equality for the dimension-lookup threshold dispatch.

``joins.attach_dim`` broadcasts a ``{key: value}`` dict below
``joins.DIM_BROADCAST_THRESHOLD`` and switches to a bucketed hash
join above it. These tests monkeypatch the threshold to 0 so EVERY
attach_dim call takes the distributed path, then assert the affected
queries still match their DuckDB oracles exactly — the same
forced-path discipline as test_dedup_similarity's driver_threshold=0
cases. ``resolve_keys`` (post-top-k decoration) has no threshold —
it is exercised by the normal parity suite — but its unit semantics
are pinned here too.
"""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402
from ferenda_ray.stages import joins  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# every query whose dimension arm goes through attach_dim
DISPATCHED = [
    "q5_local_suppliers",
    "q7_nation_volume",
    "q8_market_share",
    "q16_supplier_count",
    "q19_bracket_revenue",
    "orders_pit_dimension_join",
    "source_embedding_coherence",
    "split_leakage_safe",
    "lang_ppl_buckets",
    "region_revenue_share",
    "segment_price_median",
    "basket_rule_lift",
]


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, sf_smoke, t))
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def _hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name",
                         [n for n in DISPATCHED
                          if n in entrymod.queries()])
def test_forced_bucket_join_path(name, ray_session, sf_smoke, con,
                                 monkeypatch):
    monkeypatch.setattr(joins, "DIM_BROADCAST_THRESHOLD", 0)
    got = _canon(entrymod.queries()[name](sf_smoke))
    sql = entrymod.oracle_sql()[name]
    exp = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), "row count %d vs %d" % (len(got), len(exp))
    assert _hash(got) == _hash(exp), (
        "forced bucket-join path diverged for %s\nray:\n%s\noracle:\n%s"
        % (name, got.head(10), exp.head(10)))


def test_attach_dim_both_paths_equal(ray_session):
    """attach_dim unit: broadcast path == bucket-join path == pandas
    merge, for inner and left, including an unmatched fact key."""
    import ray.data as rd

    fact = pd.DataFrame({"k": [1, 2, 3, 4, 2, 9],
                         "v": [10, 20, 30, 40, 21, 90]})
    dim = pd.DataFrame({"dk": [1, 2, 3, 4, 5],
                        "name": ["a", "b", "c", "d", "e"]})
    for how in ("inner", "left"):
        exp = fact.merge(dim, left_on="k", right_on="dk", how=how) \
                  .drop(columns=["dk"])
        outs = []
        for thresh in (1000, 0):
            got = joins.attach_dim(
                rd.from_pandas(fact), rd.from_pandas(dim),
                "k", "dk", "name", how=how,
                broadcast_threshold=thresh).to_pandas()
            outs.append(got.sort_values(["k", "v"])
                        .reset_index(drop=True))
        expc = (exp.sort_values(["k", "v"]).reset_index(drop=True)
                [["k", "v", "name"]])
        for got in outs:
            assert list(got.columns) == ["k", "v", "name"]
            assert got["k"].tolist() == expc["k"].tolist()
            assert got["v"].tolist() == expc["v"].tolist()
            assert ([None if pd.isna(x) else x
                     for x in got["name"]] ==
                    [None if pd.isna(x) else x
                     for x in expc["name"]]), (how, got, expc)


def test_resolve_keys_streams_only_matches(ray_session):
    import ray.data as rd

    dim = pd.DataFrame({"sk": list(range(100)),
                        "nm": ["s%03d" % i for i in range(100)]})
    out = joins.resolve_keys(rd.from_pandas(dim), "sk",
                             [7, 42, 42, 99, 12345], "nm")
    assert out == {7: "s007", 42: "s042", 99: "s099"}
    assert joins.resolve_keys(rd.from_pandas(dim), "sk", [], "nm") == {}
