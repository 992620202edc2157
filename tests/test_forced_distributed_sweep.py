"""Forced-distributed FULL-REGISTRY parity sweep (VERDICT r4 #1).

Every registry query runs at sf0.001 with EVERY driver/broadcast
dispatch knob pinned to 0, so the code path that would execute on a
100-TB corpus — bloom + bucketed-exchange dim joins instead of
broadcast sets, distributed hash-to-min connected components instead
of driver union-find, hash-partitioned Jaccard verify instead of the
driver pair scan, bucketed-iteration graph algorithms instead of the
width-1 small-graph path, full-shuffle recrawl dedup instead of the
{url: max_ts} broadcast — is the code path the oracle checks, for all
queries rather than the ~20 covered by test_dim_dispatch /
test_dedup_similarity's spot forcings.

Reference anchor: the broadcast-vs-shuffle contract of SURVEY §2.4
(documentrepository.py:500-547) — both sides of every dual-path
operator must return identical results.

Queries that legitimately cannot run distributed get a documented
EXEMPT entry (none today).
"""

import importlib
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402
from test_query_oracle_parity import (  # noqa: E402
    TABLES,
    _canon,
    _to_pandas,
    _value_hash,
)

# (module, attribute) of every driver-vs-distributed dispatch knob;
# all resolve at CALL time (None-sentinel signature defaults), so
# setting the module global forces the distributed arm everywhere
KNOBS = (
    ("ferenda_ray.stages.joins", "DIM_BROADCAST_THRESHOLD"),
    ("ferenda_ray.stages.graph", "SMALL_GRAPH_EDGES"),
    ("ferenda_ray.stages.dedup", "PAIR_DRIVER_THRESHOLD"),
    ("ferenda_ray.stages.dedup", "CLUSTER_DRIVER_THRESHOLD"),
    ("ferenda_ray.stages.canonicalize", "DRIVER_THRESHOLD"),
    ("ferenda_ray.stages.parse_html", "DUP_BROADCAST_THRESHOLD"),
)

# query name -> reason it cannot run with every knob forced to 0
EXEMPT: dict = {}


@pytest.fixture(scope="module", autouse=True)
def forced_knobs(ray_session):
    saved = []
    for mod, name in KNOBS:
        m = importlib.import_module(mod)
        saved.append((m, name, getattr(m, name)))
        setattr(m, name, 0)
    # result caches built under the un-forced knobs must not leak in
    # (and forced results must not leak out to later test modules)
    from ferenda_ray.pipelines.queries import _shared, sessions

    _shared._KG_CACHE.clear()
    sessions._FS_CENSUS_CACHE.clear()
    yield
    for m, name, v in saved:
        setattr(m, name, v)
    _shared._KG_CACHE.clear()
    sessions._FS_CENSUS_CACHE.clear()


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, sf_smoke, t))
    return c


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_forced_distributed_parity(name, ray_session, sf_smoke, con):
    if name in EXEMPT:
        pytest.skip("documented exemption: %s" % EXEMPT[name])
    fn = entrymod.queries()[name]
    got = _canon(_to_pandas(fn(sf_smoke)))
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert got.shape[0] >= 0
        return
    exp = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        "column mismatch: %s vs %s"
        % (list(got.columns), list(exp.columns)))
    assert len(got) == len(exp), "row count %d vs %d" % (
        len(got), len(exp))
    if _value_hash(got) != _value_hash(exp):
        merged = got.compare(exp) if got.shape == exp.shape else None
        raise AssertionError(
            "forced-distributed value mismatch for %s\nray:\n%s\n"
            "oracle:\n%s\ndiff:\n%s"
            % (name, got.head(10), exp.head(10),
               merged.head(20) if merged is not None else "shape diff"))
