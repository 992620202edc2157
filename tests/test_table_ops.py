"""Invariant tests for the at-scale table primitives beyond the
SQL-parity gate: range-layout shard geometry and checksum
sensitivity (parity proves value equality; these prove the
*contracts* the operators exist to provide)."""

import hashlib

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_range_layout_shards_are_disjoint_and_complete(ray_session):
    from ferenda_ray.pipelines.queries import (RANGE_SHARDS,
                                               doc_range_layout)

    out = doc_range_layout(SF_SMOKE).to_pandas()
    n_docs = pq.read_metadata(SF_SMOKE + "/documents.parquet").num_rows
    # every document landed in exactly one shard
    assert int(out["n_docs"].sum()) == n_docs
    assert out["shard"].between(0, RANGE_SHARDS - 1).all()
    assert out["shard"].is_unique
    # key ranges are totally ordered and non-overlapping
    o = out.sort_values("shard")
    assert (o["lo_key"] <= o["hi_key"]).all()
    his = o["hi_key"].to_numpy()[:-1]
    los = o["lo_key"].to_numpy()[1:]
    assert (his < los).all()
    # splitters balanced the skewed key: no empty shards, and the
    # biggest shard is within a small factor of the mean (the whole
    # point of sampling vs fixed-width ranges)
    assert (out["n_docs"] > 0).all()
    assert out["n_docs"].max() <= 4 * max(1, n_docs // RANGE_SHARDS)


def _row_hash(okey, status, cents, date_str):
    return int(hashlib.md5(
        ("%d|%s|%d|%s" % (okey, status, cents, date_str)).encode())
        .hexdigest()[:15], 16)


def test_orders_checksum_matches_serial_recompute_and_is_sensitive(
        ray_session):
    from ferenda_ray.pipelines.queries import (CHECKSUM_BUCKETS,
                                               CHECKSUM_MOD,
                                               orders_checksum)

    out = (orders_checksum(SF_SMOKE).to_pandas()
           .set_index("bucket"))
    t = pq.read_table(SF_SMOKE + "/orders.parquet",
                      columns=["o_orderkey", "o_orderstatus",
                               "o_totalprice", "o_orderdate"])
    okey = t["o_orderkey"].to_numpy()
    status = t["o_orderstatus"].to_pylist()
    cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    dates = np.datetime_as_string(
        t["o_orderdate"].to_numpy().astype("datetime64[D]"))
    acc = {}
    for k, s, c, d in zip(okey, status, cents, dates):
        b = int(k) % CHECKSUM_BUCKETS
        n, h = acc.get(b, (0, 0))
        acc[b] = (n + 1, (h + _row_hash(int(k), s, int(c), d))
                  % CHECKSUM_MOD)
    assert set(acc) == set(out.index)
    for b, (n, h) in acc.items():
        assert out.loc[b, "n_rows"] == n
        assert out.loc[b, "checksum"] == h
    # sensitivity: a 1-cent corruption in one row moves exactly its
    # bucket's checksum (the anti-entropy localization contract)
    b0 = int(okey[0]) % CHECKSUM_BUCKETS
    h_good = _row_hash(int(okey[0]), status[0], int(cents[0]), dates[0])
    h_bad = _row_hash(int(okey[0]), status[0], int(cents[0]) + 1,
                      dates[0])
    assert h_good != h_bad
    corrupted = (acc[b0][1] - h_good + h_bad) % CHECKSUM_MOD
    assert corrupted != acc[b0][1]
