"""Lineage manifest + resumable stage checkpoints (FIXTURES.md §6).

Reference analogue: per-document ``DocumentEntry`` status records +
mtime-based ``needed()`` skip (documentstore.py:400-470,
documententry.py:266-342) and atomic write-if-changed
(documentstore.py:53-158). Ray translation:

- a stage boundary = a parquet directory written ATOMICALLY (write to
  ``<stage>.tmp``, fsync-free ``os.replace`` rename, then a
  ``_SUCCESS`` marker) — a crashed run can never leave a half-visible
  stage;
- one manifest row per output partition file: (partition_id, stage,
  url_min, url_max, rows_in, rows_out, errors, duration_s, status) —
  derived from parquet footer metadata (row counts, column min/max
  stats) so producing lineage costs no extra data pass;
- resume = ``checkpointed_stage`` sees the marker and re-reads the
  parquet instead of recomputing (whole-stage skip, the
  ``needed()``/dump.nt-mtime short-circuit analogue).
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _file_manifest_rows(stage_dir: str, stage: str, duration_s: float,
                        url_col: str = "url") -> list[dict]:
    rows = []
    files = sorted(glob.glob(os.path.join(stage_dir, "*.parquet")))
    for i, f in enumerate(files):
        md = pq.ParquetFile(f)
        n = md.metadata.num_rows
        schema_names = md.schema_arrow.names
        url_min = url_max = None
        errors = 0
        if url_col in schema_names and n:
            col = pq.read_table(f, columns=[url_col])[url_col]
            import pyarrow.compute as pc

            url_min = pc.min(col).as_py()
            url_max = pc.max(col).as_py()
        if "error" in schema_names and n:
            col = pq.read_table(f, columns=["error"])["error"]
            errors = n - col.null_count
        rows.append({
            "partition_id": i,
            "stage": stage,
            "url_min": url_min,
            "url_max": url_max,
            "rows_in": -1,  # rows_in tracked at the pipeline level
            "rows_out": n,
            "errors": errors,
            "duration_s": round(duration_s, 3),
            "status": "ok",
        })
    return rows


def append_manifest(checkpoint_dir: str, rows: list[dict]):
    mdir = os.path.join(checkpoint_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    if not rows:
        return
    stage = rows[0]["stage"]
    path = os.path.join(mdir, "%s.json" % stage)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1, default=str)


def read_manifest(checkpoint_dir: str) -> list[dict]:
    rows: list[dict] = []
    for path in sorted(glob.glob(os.path.join(checkpoint_dir, "_manifest", "*.json"))):
        with open(path) as f:
            rows.extend(json.load(f))
    return rows


def _marker_path(checkpoint_dir: str, stage: str) -> str:
    return os.path.join(checkpoint_dir, stage, "_SUCCESS")


def _read_marker(checkpoint_dir: str, stage: str) -> dict | None:
    path = _marker_path(checkpoint_dir, stage)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        body = f.read()
    try:
        return json.loads(body)
    except ValueError:  # legacy "ok" marker (pre-fingerprint)
        return {"fingerprint": body, "upstream": {}}


def stage_fingerprint(checkpoint_dir: str, stage: str) -> str | None:
    """The stage's write-identity: changes on every (re)write, so a
    downstream stage can detect that its input was regenerated (the
    reference's ``needed()`` infile-vs-outfile mtime comparison,
    documentstore.py:400-470, at stage granularity)."""
    marker = _read_marker(checkpoint_dir, stage)
    return marker["fingerprint"] if marker else None


def stage_complete(checkpoint_dir: str, stage: str,
                   upstream=()) -> bool:
    """Marker present AND every upstream stage's current fingerprint
    matches the one recorded when this stage was written. A rewritten
    (or deleted) upstream therefore invalidates all descendants —
    markers alone are not trusted."""
    marker = _read_marker(checkpoint_dir, stage)
    if marker is None:
        return False
    recorded = marker.get("upstream", {})
    for up in upstream:
        if recorded.get(up) != stage_fingerprint(checkpoint_dir, up):
            return False
    return True


def checkpointed_stage(ds, checkpoint_dir: str, stage: str,
                       url_col: str = "url", upstream=()):
    """Execute-or-skip a stage boundary.

    Completed (marker present and, when ``upstream`` stage names are
    given, their recorded fingerprints still current) → re-read the
    parquet, NO recompute. Otherwise: write to ``<stage>.tmp``, derive
    manifest rows from the parquet footers, atomically rename, mark
    complete with a fresh fingerprint + the upstream fingerprints it
    was built from. Returns a Dataset reading from the checkpoint
    (downstream stages consume the durable artifact, like the
    reference's parsed/ files).
    """
    import ray.data as rd
    import shutil

    from ..stages.transform import strip_schema_metadata

    final = os.path.join(checkpoint_dir, stage)
    if stage_complete(checkpoint_dir, stage, upstream):
        return strip_schema_metadata(rd.read_parquet(final))

    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    t0 = time.time()
    ds.write_parquet(tmp)
    duration = time.time() - t0
    rows = _file_manifest_rows(tmp, stage, duration, url_col)
    os.replace(tmp, final)
    append_manifest(checkpoint_dir, rows)
    marker = {
        # unique per write: wall-clock ns + row count — any rewrite of
        # this stage yields a new fingerprint, invalidating descendants
        "fingerprint": "%d:%d" % (time.time_ns(),
                                  sum(r["rows_out"] for r in rows)),
        "upstream": {up: stage_fingerprint(checkpoint_dir, up)
                     for up in upstream},
    }
    with open(_marker_path(checkpoint_dir, stage), "w") as f:
        json.dump(marker, f)
    return strip_schema_metadata(rd.read_parquet(final))


def manifest_stats(checkpoint_dir: str):
    """get_status / statusreport analogue: per-stage rollup
    (documentrepository.py:3692-3749, devel.py:1419-1520)."""
    import pandas as pd

    rows = read_manifest(checkpoint_dir)
    if not rows:
        return pd.DataFrame(
            columns=["stage", "partitions", "rows_out", "errors", "duration_s"])
    df = pd.DataFrame(rows)
    return df.groupby("stage", as_index=False).agg(
        partitions=("partition_id", "count"),
        rows_out=("rows_out", "sum"),
        errors=("errors", "sum"),
        duration_s=("duration_s", "max"),
    )
