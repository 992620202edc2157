"""JSONL / CSV sources and sinks — the interchange formats every
engine user eventually needs next to parquet (exports to labeling
tools, ingests from crawler dumps). Thin wrappers over Ray Data's
native readers/writers, but with the two pitfalls this repo has
already paid for handled at the boundary:

- schema metadata stripped on read (pandas-written files carry a
  metadata dict that makes ``hash(schema)`` raise and defeats Ray's
  schema-dedup fast path — the ``strip_schema_metadata`` contract
  applied at every read entry point), and
- an explicit column projection + dtype normalization on read, because
  JSON/CSV infer per-block: a column that is all-null in one file
  chunk otherwise comes back with a different Arrow type per block
  and poisons the first downstream union (the one-block-schema
  invariant in CLAUDE.md).

Reference surface: the reference ingests file trees and emits JSON
body serializations (documentrepository.py's serialized JSON body;
``ferenda/documentstore.py`` path layout); here both directions are
Dataset-native and partitioned, never single-file driver writes.
"""

from __future__ import annotations

import pyarrow as pa


def _normalize(ds, schema: pa.Schema | None):
    from ..stages.transform import strip_schema_metadata

    ds = strip_schema_metadata(ds)
    if schema is None:
        return ds

    def cast(t: pa.Table) -> pa.Table:
        cols = [t[f.name].combine_chunks().cast(f.type)
                if f.name in t.column_names
                else pa.nulls(len(t), f.type)
                for f in schema]
        return pa.table(cols, schema=schema)

    return ds.map_batches(cast, batch_format="pyarrow")


def read_jsonl(path: str, schema: pa.Schema | None = None):
    """Read newline-delimited JSON into a Dataset. Pass ``schema`` to
    pin dtypes across blocks (all-null chunks otherwise infer a
    different type per block)."""
    import ray.data as rd

    return _normalize(rd.read_json(path), schema)


def write_jsonl(ds, out_dir: str):
    """Partitioned JSONL sink — one file per block (resumable-output
    contract: never one giant file)."""
    ds.write_json(out_dir)
    return out_dir


def read_csv(path: str, schema: pa.Schema | None = None):
    import ray.data as rd

    return _normalize(rd.read_csv(path), schema)


def write_csv(ds, out_dir: str):
    ds.write_csv(out_dir)
    return out_dir
