"""Local mirror of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and compare to its ``oracle_sql()``
via DuckDB — row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted)."""

import hashlib

import duckdb
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in TABLES:
        c.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                  % (t, sf_smoke, t))
    return c


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        # ints: normalize width
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False).encode()
    return hashlib.md5(payload).hexdigest()


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_parity(name, ray_session, sf_smoke, con):
    fn = entrymod.queries()[name]
    got = _canon(_to_pandas(fn(sf_smoke)))
    assert got is not None
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (driver's weaker path): result materializes
        # with a stable schema
        assert got.shape[0] >= 0
        return
    exp = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        "column mismatch: %s vs %s" % (list(got.columns), list(exp.columns)))
    assert len(got) == len(exp), "row count %d vs %d" % (len(got), len(exp))
    if _value_hash(got) != _value_hash(exp):
        merged = got.compare(exp) if got.shape == exp.shape else None
        raise AssertionError(
            "value hash mismatch for %s\nray:\n%s\noracle:\n%s\ndiff:\n%s"
            % (name, got.head(10), exp.head(10),
               merged.head(20) if merged is not None else "shape diff"))


def test_registry_consistency():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 40
    assert len(sqls) >= 30


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    n = ds.count()
    assert n > 0
    assert "subj" in ds.schema().names
