"""Materialized Z-order data layout + zone-map pruned scan.

Closes the loop on the ``orders_zorder`` zone-map artifact: the
clustered layout is WRITTEN (hive-partitioned parquet, one directory
per Morton shard, rows carrying the raw dimensions) together with its
zone map and quantization bounds, and a range predicate is then
answered by planning the read over ONLY the shards whose zone map
intersects the predicate — the other shards never leave storage. This
is the Delta/Iceberg "OPTIMIZE ZORDER BY → data-skipping scan" pair
(reference analogue: the repo-wide "index = partitioned parquet +
pruned read" discipline of ``sources/ftindex`` and
``similarity.build_ivf_index``).

Scale shape: bounds are one bounded min/max combiner pre-pass (4
ints); shard assignment is a vectorized numpy bit-spread per batch;
the partitioned write is the only exchange (Ray routes rows to one
directory per shard). Zone-map pruning is sound because it selects a
SUPERSET of the shards that can hold matching rows (shard min ≤
predicate upper bound on both dimensions) and the scan re-applies the
exact predicate to the surviving rows — pruning can only skip
non-matching bytes, never change the answer. Build is idempotent
(_SUCCESS marker + tmp-dir swap, the state/manifest discipline).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["build_zorder_layout", "zorder_pruned_scan"]

SHARD_BITS = 6  # 64 layout shards from the top Morton bits


def _spread16(v: np.ndarray) -> np.ndarray:
    """16-bit values -> even bit positions of a 32-bit word."""
    v = v.astype(np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def build_zorder_layout(ds, out_dir: str,
                        shard_bits: int = SHARD_BITS) -> str:
    """Cluster ``ds`` — rows (key, x, y) with int64 dimensions x/y —
    by the Morton interleave of the range-quantized dimensions and
    persist it at ``out_dir`` as ``shard=NN/`` parquet plus
    ``_meta.json`` (quantization bounds) and ``_zonemap.parquet``
    (per-shard count + min/max of both dimensions).

    The bounds pass is a bounded combiner (4 integers); quantization
    is the exact integer ((v−lo)·65535)//max(rng,1) shared with
    ``orders_zorder``'s SQL so any engine can replay shard
    assignment."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir

    def bounds_partial(t: pa.Table) -> pd.DataFrame:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        return pd.DataFrame({
            "x_min": [int(x.min())], "x_max": [int(x.max())],
            "y_min": [int(y.min())], "y_max": [int(y.max())]})

    def bounds_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "x_min": [int(df["x_min"].min())],
            "x_max": [int(df["x_max"].max())],
            "y_min": [int(df["y_min"].min())],
            "y_max": [int(df["y_max"].max())]})

    b = (ds.map_batches(bounds_partial, batch_format="pyarrow")
         .repartition(1)
         .map_batches(bounds_merge, batch_format="pandas",
                      batch_size=None).take_all())[0]
    x_lo, x_rng = b["x_min"], max(b["x_max"] - b["x_min"], 1)
    y_lo, y_rng = b["y_min"], max(b["y_max"] - b["y_min"], 1)

    def assign(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy().astype(np.int64)
        y = t["y"].to_numpy().astype(np.int64)
        qx = ((x - x_lo) * 65535) // x_rng
        qy = ((y - y_lo) * 65535) // y_rng
        z = _spread16(qx) | (_spread16(qy) << 1)
        shard = (z >> (32 - shard_bits)).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    tmp = "%s.tmp.%d" % (out_dir.rstrip("/"), os.getpid())
    clustered = ds.map_batches(assign, batch_format="pyarrow")
    clustered.write_parquet(tmp, partition_cols=["shard"])

    # zone map from the WRITTEN files (columnar read of 2 narrow
    # columns + the partition key), not by re-executing the whole
    # upstream pipeline a second time — at 100 TB the re-scan would
    # double the build cost.
    import ray.data as rd

    written = rd.read_parquet(tmp, columns=["shard", "x", "y"])

    # zone map: bounded (≤ 2^shard_bits keys) → lossless combiner
    def zm_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"shard": t["shard"].to_numpy(),
                           "x": t["x"].to_numpy(),
                           "y": t["y"].to_numpy()})
        out = df.groupby("shard", as_index=False).agg(
            n=("x", "size"), x_min=("x", "min"), x_max=("x", "max"),
            y_min=("y", "min"), y_max=("y", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def zm_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            n=("n", "sum"), x_min=("x_min", "min"),
            x_max=("x_max", "max"), y_min=("y_min", "min"),
            y_max=("y_max", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    zm = (written.map_batches(zm_partial, batch_format="pyarrow")
          .repartition(1)
          .map_batches(zm_merge, batch_format="pandas",
                       batch_size=None).to_pandas())
    zm.to_parquet(os.path.join(tmp, "_zonemap.parquet"), index=False)
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump({"x_lo": int(x_lo), "x_rng": int(x_rng),
                   "y_lo": int(y_lo), "y_rng": int(y_rng),
                   "shard_bits": shard_bits}, fh)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok")
    if os.path.exists(out_dir):  # losing racer / stale partial
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def zorder_pruned_scan(layout_dir: str, x_hi: int, y_hi: int):
    """Answer ``x <= x_hi AND y <= y_hi`` from the layout, reading
    ONLY shards whose zone map can hold matching rows.

    Returns ``(dataset, shards_read, shards_total)`` — the counters
    let callers (tests, a planner log) verify bytes were actually
    skipped. The exact predicate re-applies to the surviving rows, so
    the answer is independent of how aggressive the pruning was."""
    import ray.data as rd

    zm = pd.read_parquet(os.path.join(layout_dir, "_zonemap.parquet"))
    keep = zm[(zm["x_min"] <= x_hi) & (zm["y_min"] <= y_hi)]
    total = len(zm)
    paths = []
    for s in sorted(int(v) for v in keep["shard"]):
        d = "%s/shard=%d" % (layout_dir.rstrip("/"), s)
        if os.path.isdir(d):
            paths.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    if not paths:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        return rd.from_arrow(empty), 0, total

    ds = rd.read_parquet(paths, columns=["key", "x", "y"])

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.less_equal(t["x"], pa.scalar(x_hi)),
                    pc.less_equal(t["y"], pa.scalar(y_hi)))
        return t.filter(m)

    return (ds.map_batches(exact, batch_format="pyarrow"),
            len(keep), total)
