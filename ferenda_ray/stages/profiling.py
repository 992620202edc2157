"""Dataset profiling: per-column null counts, exact distinct counts,
and min/max — the schema-survey pass a training-data pipeline runs
before trusting a new 100-TB drop.

Two partial-aggregate passes, both mergeable:

* stats — each batch emits one (col, n, n_null, min, max) row with
  min/max kept NATIVE-typed (numeric min of an int column, not the
  lexicographic min of its string form); the merge is a bounded
  driver reduce over n_blocks x n_cols rows (same contract as the
  brute-force kNN partial-top-k merge). Stringification happens once,
  after the merge, so it matches SQL ``CAST(min(col) AS VARCHAR)``.
* distinct — each batch emits its DISTINCT (col, value) pairs
  (batch-local combiner), hash-bucketed into a bounded number of Ray
  groups; each bucket re-dedups and counts, and a final tiny groupby
  sums per column. Only distinct values reach the exchange — for
  high-cardinality columns that is inherently O(distinct); swap in the
  HyperLogLog register pipeline (pipelines/queries.hll_user_registers)
  when an approximate count is acceptable.

String min/max uses binary collation on both sides (Python code-point
compare == DuckDB default VARCHAR collation for ASCII). Integer
columns stringify as ``str(int)`` == ``CAST(BIGINT AS VARCHAR)``.
Float columns are excluded from the min/max contract (repr drift);
their stats still compute, but a SQL oracle should not hash them.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .dedup import _bucket_of


def profile_columns(ds, columns: list[str] | None = None,
                    num_buckets: int = 16) -> pd.DataFrame:
    """Profile ``columns`` (default: all) of a Dataset; returns one
    pandas row per column: col, n_rows, n_null, n_distinct, min_val,
    max_val (stringified). Everything wide stays in Ray; the driver
    only ever sees per-block partial rows and the final column-count
    sized frame."""
    if columns is None:
        columns = ds.schema().names
    columns = list(columns)

    def partial_stats(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rows = []
        for c in columns:
            s = df[c]
            nn = s.notna()
            vals = s[nn]
            rows.append({"col": c, "n_rows": len(s),
                         "n_null": int((~nn).sum()),
                         "mn": vals.min() if len(vals) else None,
                         "mx": vals.max() if len(vals) else None})
        return pd.DataFrame(rows)

    def _str(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return str(v)

    # bounded driver merge: n_blocks x n_cols native-typed rows
    partials = ds.map_batches(partial_stats,
                              batch_format="pyarrow").to_pandas()
    stats_rows = []
    for c, g in partials.groupby("col", sort=False):
        mn = [v for v in g["mn"] if v is not None]
        mx = [v for v in g["mx"] if v is not None]
        stats_rows.append({"col": c,
                           "n_rows": int(g["n_rows"].sum()),
                           "n_null": int(g["n_null"].sum()),
                           "min_val": _str(min(mn)) if mn else None,
                           "max_val": _str(max(mx)) if mx else None})
    stats = pd.DataFrame(stats_rows)

    def partial_distinct(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        frames = []
        for c in columns:
            s = df[c].dropna().drop_duplicates()
            if s.dtype != object:
                s = s.astype("string").astype(object)
            frames.append(pd.DataFrame({"col": c, "v": s}))
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"col": pd.Series(dtype="object"),
                          "v": pd.Series(dtype="object")})
        out["_bucket"] = _bucket_of(out["col"].str.cat(out["v"],
                                                       sep="\x1f"),
                                    num_buckets)
        return out

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.drop_duplicates(["col", "v"]).groupby(
            "col", sort=False).size()
        return pd.DataFrame({"col": cnt.index.to_numpy(dtype=object),
                             "nd": cnt.to_numpy(dtype="int64")})

    distinct = (ds.map_batches(partial_distinct, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_count, batch_format="pandas")
                .to_pandas())
    distinct = distinct.groupby("col", as_index=False)["nd"].sum() \
        .rename(columns={"nd": "n_distinct"})

    out = stats.merge(distinct, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return out[["col", "n_rows", "n_null", "n_distinct",
                "min_val", "max_val"]].sort_values("col") \
        .reset_index(drop=True)
