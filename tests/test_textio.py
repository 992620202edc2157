"""JSONL / CSV source+sink roundtrips through the real testdata
tables: values survive byte-exactly where the format can carry them,
the schema pin forces one block schema, and the sinks write
partitioned directories (never a single giant file)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ferenda_ray.sources.textio import (read_csv, read_jsonl,
                                        write_csv, write_jsonl)

SF = "/root/testdata/sf0.001"


def _docs_ds():
    import ray.data as rd

    from ferenda_ray.stages.transform import strip_schema_metadata

    return strip_schema_metadata(
        rd.read_parquet(SF + "/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"]))


def test_jsonl_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "jsonl")
    write_jsonl(_docs_ds(), out)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(files) >= 1
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string())])
    back = read_jsonl(out, schema=schema)
    a = (back.to_pandas().sort_values("doc_id")
         .reset_index(drop=True))
    b = (pq.read_table(SF + "/documents.parquet",
                       columns=["doc_id", "text", "lang", "source"])
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a[["doc_id", "text", "lang", "source"]].equals(
        b[["doc_id", "text", "lang", "source"]])


def test_csv_roundtrip_orders(ray_session, tmp_path):
    import ray.data as rd

    from ferenda_ray.stages.transform import strip_schema_metadata

    out = str(tmp_path / "csv")
    ds = strip_schema_metadata(
        rd.read_parquet(SF + "/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderstatus"]))
    write_csv(ds, out)
    schema = pa.schema([("o_orderkey", pa.int64()),
                        ("o_custkey", pa.int64()),
                        ("o_orderstatus", pa.string())])
    back = read_csv(out, schema=schema)
    a = (back.to_pandas().sort_values("o_orderkey")
         .reset_index(drop=True))
    b = (pq.read_table(SF + "/orders.parquet",
                       columns=["o_orderkey", "o_custkey",
                                "o_orderstatus"])
         .to_pandas().sort_values("o_orderkey")
         .reset_index(drop=True))
    assert a.equals(b)


def test_schema_pin_fills_missing_column(ray_session, tmp_path):
    """A column absent from the file comes back as typed nulls — the
    all-null-chunk poison case the schema pin exists for."""
    import json

    p = tmp_path / "in"
    p.mkdir()
    with open(p / "a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "y"}) + "\n")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])
    ds = read_jsonl(str(p), schema=schema)
    df = ds.to_pandas()
    assert list(df.columns) == ["doc_id", "text", "lang"]
    assert df["lang"].isna().all()
    assert ds.schema().base_schema.field("lang").type == pa.string()
