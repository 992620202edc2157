"""Z-order layout + zone-map pruned scan: pruning must actually skip
shards, the pruned answer must equal the brute-force filter, and the
build must be idempotent (second call reuses the _SUCCESS'd dir)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from ferenda_ray.sources.zlayout import (build_zorder_layout,
                                         zorder_pruned_scan)

OUT = "/tmp/ferenda_ray_test_zlayout"


@pytest.fixture(scope="module")
def layout(ray_session):
    import ray.data as rd

    shutil.rmtree(OUT, ignore_errors=True)
    # deterministic 2-D grid with both dimensions spanning wide ranges
    n = 4000
    key = np.arange(n, dtype=np.int64)
    x = (key * 7919) % 100_000          # spread, co-prime stride
    y = (key * 104729) % 50_000
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"key": key, "x": x, "y": y}))
    d = build_zorder_layout(ds, OUT)
    yield d, pd.DataFrame({"key": key, "x": x, "y": y})
    shutil.rmtree(OUT, ignore_errors=True)


def test_pruned_scan_exact_and_skipping(layout):
    d, df = layout
    x_hi, y_hi = 9_999, 12_499  # lowest ~10% x and ~25% y
    rows, read_n, total = zorder_pruned_scan(d, x_hi, y_hi)
    got = rows.to_pandas().sort_values("key").reset_index(drop=True)
    want = (df[(df["x"] <= x_hi) & (df["y"] <= y_hi)]
            .sort_values("key").reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got["key"].to_numpy() == want["key"].to_numpy()).all()
    assert (got["x"].to_numpy() == want["x"].to_numpy()).all()
    assert (got["y"].to_numpy() == want["y"].to_numpy()).all()
    # the layout must let the planner skip real bytes
    assert 0 < read_n < total


def test_zonemap_covers_all_rows(layout):
    d, df = layout
    zm = pd.read_parquet(os.path.join(d, "_zonemap.parquet"))
    assert int(zm["n"].sum()) == len(df)
    assert int(zm["x_min"].min()) == int(df["x"].min())
    assert int(zm["y_max"].max()) == int(df["y"].max())


def test_build_idempotent(layout):
    d, _df = layout
    marker = os.path.join(d, "_SUCCESS")
    before = os.stat(marker).st_mtime_ns
    # a second build with a DIFFERENT (empty would error) dataset must
    # be a no-op because the marker exists
    d2 = build_zorder_layout(None, d)  # ds never touched on the hit
    assert d2 == d
    assert os.stat(marker).st_mtime_ns == before
