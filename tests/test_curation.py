"""End-to-end curation DAG (pipelines/curation.curate): planted PII,
junk, exact dups and near-dups must each be handled by the right
stage, and the surviving (doc_id, split) set must be exactly the
deterministic md5 assignment."""

import hashlib

import pandas as pd
import pytest

from ferenda_ray.pipelines.curation import curate


def _split_of(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    import ray.data as rd

    a = " ".join("apple%d" % i for i in range(60))
    b = " ".join("berry%d" % i for i in range(60))
    c = " ".join("cedar%d" % i for i in range(60))
    rows = [
        # 10/11 become byte-identical after email redaction -> exact
        # dedup keeps the min key (10)
        {"doc_id": 10, "text": "contact bob@example.com please " + a},
        {"doc_id": 11, "text": "contact <EMAIL> please " + a},
        # 21 is a near-dup of 20 (one appended word, trigram J≈0.98)
        {"doc_id": 20, "text": b},
        {"doc_id": 21, "text": b + " extraword"},
        # junk: too few tokens / degenerate mean token length
        {"doc_id": 30, "text": "tiny doc"},
        {"doc_id": 31, "text": ("x" * 70) + " bbbb cccc dddd eeee"},
        # clean unique survivor
        {"doc_id": 40, "text": c},
    ]
    return rd.from_items(rows)


def test_curate_survivors_and_splits(planted_docs):
    out = curate(planted_docs, threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"], out["split"]))
    assert set(got) == {10, 20, 40}
    for doc_id, split in got.items():
        assert split == _split_of(doc_id)


def test_curate_forced_distributed_path(planted_docs):
    """driver_threshold=0 forces the Dataset labels branch (distributed
    CC clustering + Dataset-side near-dup filter + membership_join with
    a Dataset key side) — output must equal the driver branch."""
    base = curate(planted_docs, threshold=0.5).to_pandas()
    dist = curate(planted_docs, threshold=0.5,
                  driver_threshold=0).to_pandas()
    assert (sorted(zip(base["doc_id"], base["split"]))
            == sorted(zip(dist["doc_id"], dist["split"])))


def test_curate_partitioned_write_is_rerunnable(planted_docs, tmp_path):
    import ray.data as rd

    out_dir = str(tmp_path / "curated")
    first = curate(planted_docs, threshold=0.5,
                   out_dir=out_dir).to_pandas()
    # rerun overwrites per-split dirs without error (resumable claim)
    second = curate(planted_docs, threshold=0.5,
                    out_dir=out_dir).to_pandas()
    back = rd.read_parquet(out_dir).to_pandas()
    for df in (first, second, back):
        assert (sorted(zip(df["doc_id"], df["split"]))
                == sorted(zip(first["doc_id"], first["split"])))
    # every written row landed in the directory matching its split col
    for split in set(back["split"]):
        part = rd.read_parquet("%s/split=%s" % (out_dir, split)).to_pandas()
        assert set(part["split"]) <= {split}
