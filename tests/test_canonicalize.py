"""Connected components / canonical remap / exact dedup tests,
including the giant hot-domain chain (skew fixture)."""

import pandas as pd
import pyarrow as pa
import pytest

from ferenda_ray.pipelines import corpus
from ferenda_ray.stages.canonicalize import (
    connected_components_distributed,
    dedup_exact_triples,
    remap_triples,
    sameas_triples,
    union_find,
)


def test_union_find_basic():
    canon = union_find([("b", "a"), ("c", "b"), ("e", "d")])
    assert canon == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_union_find_matches_expected_canonical():
    canon = union_find(corpus.sameas_edges())
    assert canon == corpus.expected_canonical()
    # giant chain collapses onto its min member together with entity 0
    assert canon[corpus.KB + "0"] == corpus.HOT_DOMAIN + "0"
    assert canon[corpus.HOT_DOMAIN + "199"] == corpus.HOT_DOMAIN + "0"
    # independent entity keeps kb uri as representative
    assert canon[corpus.variant_uri(5, 0)] == corpus.KB + "5"


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_matches_union_find():
    import ray.data as rd

    edges = corpus.sameas_edges()
    ds = rd.from_arrow(pa.table({
        "uri_a": [a for a, _ in edges],
        "uri_b": [b for _, b in edges],
    }))
    labels = connected_components_distributed(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == corpus.expected_canonical()


@pytest.mark.usefixtures("ray_session")
def test_remap_and_dedup():
    import ray.data as rd

    canon = {"http://v0/e": "http://kb/E", "http://v1/e": "http://kb/E"}
    t = pa.table({
        "subj": ["http://d/1#S2", "http://d/1#S2", "http://v0/e"],
        "pred": ["dcterms:subject", "dcterms:subject", "rdf:type"],
        "obj": ["http://v0/e", "http://v1/e", "lit"],
        "obj_is_literal": [False, False, True],
        "obj_lang": ["", "", ""],
        "obj_datatype": ["", "", ""],
        "source_url": ["http://d/1", "http://d/1", "http://d/1"],
    })
    ds = remap_triples(rd.from_arrow(t), canon)
    out = ds.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    # both variant objects → canonical; literal obj untouched; subj remapped
    assert list(out["obj"]) == ["http://kb/E", "http://kb/E", "lit"]
    assert out["subj"].iloc[2] == "http://kb/E"

    deduped = dedup_exact_triples(rd.from_arrow(pa.Table.from_pandas(out))).to_pandas()
    assert len(deduped) == 2  # the two identical subject triples collapsed


def test_sameas_triples():
    t = sameas_triples({"a": "a", "b": "a"})
    assert t.num_rows == 1
    assert t["subj"][0].as_py() == "b"
    assert t["pred"][0].as_py() == "owl:sameAs"
    assert t["obj"][0].as_py() == "a"
