"""Distributed CC must converge through MULTIPLE hash-to-min rounds —
edges scattered across many tiny blocks so batch-local contraction
cannot collapse components in one pass. Also covers
validate_required_predicates (previously untested)."""

import pandas as pd
import pyarrow as pa
import pytest

from ferenda_ray.pipelines import corpus
from ferenda_ray.stages.canonicalize import (
    connected_components_distributed,
    union_find,
)
from ferenda_ray.stages.triples import validate_required_predicates


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_across_scattered_blocks():
    import ray.data as rd

    edges = corpus.sameas_edges()
    ds = rd.from_arrow(pa.table({
        "uri_a": [a for a, _ in edges],
        "uri_b": [b for _, b in edges],
    })).repartition(40)  # ~7 edges per block: chains span many blocks
    labels = connected_components_distributed(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == corpus.expected_canonical()


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_random_graph_scattered():
    """Random spanning forests over 300 nodes, shuffled edge order,
    many blocks — result must equal exact union-find."""
    import random

    import ray.data as rd

    rng = random.Random(7)
    edges = []
    for comp in range(12):
        nodes = ["n%02d_%03d" % (comp, i) for i in range(25)]
        rng.shuffle(nodes)
        for i in range(1, len(nodes)):
            edges.append((nodes[i], nodes[rng.randrange(i)]))
    rng.shuffle(edges)
    ds = rd.from_arrow(pa.table({
        "uri_a": [a for a, _ in edges],
        "uri_b": [b for _, b in edges],
    })).repartition(30)
    labels = connected_components_distributed(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == union_find(edges)


@pytest.mark.usefixtures("ray_session")
def test_validate_required_predicates():
    import ray.data as rd

    def t(subj, pred, obj, src):
        return {"subj": subj, "pred": pred, "obj": obj,
                "obj_is_literal": True, "obj_lang": "",
                "obj_datatype": "", "source_url": src}

    rows = [
        t("http://d/1", "rdf:type", "bibo:Document", "http://d/1"),
        t("http://d/1", "dcterms:title", "T", "http://d/1"),
        t("http://d/1", "dcterms:identifier", "1", "http://d/1"),
        # doc 2 misses title + identifier
        t("http://d/2", "rdf:type", "bibo:Document", "http://d/2"),
        # section-level title must NOT satisfy the doc-level check
        t("http://d/2#S1", "dcterms:title", "S", "http://d/2"),
    ]
    missing = validate_required_predicates(rd.from_items(rows))
    got = set(zip(missing["url"], missing["missing_pred"]))
    assert got == {("http://d/2", "dcterms:title"),
                   ("http://d/2", "dcterms:identifier")}


@pytest.mark.usefixtures("ray_session")
def test_starcontract_cc_matches_union_find():
    """large-star/small-star (the giant-component-safe CC) must agree
    with exact union-find on the corpus sameAs graph — including the
    200-node giant chain — and on random forests."""
    import random

    import ray.data as rd

    from ferenda_ray.stages.canonicalize import (
        connected_components_starcontract,
    )

    edges = corpus.sameas_edges()
    ds = rd.from_arrow(pa.table({
        "uri_a": [a for a, _ in edges],
        "uri_b": [b for _, b in edges],
    })).repartition(40)
    labels = connected_components_starcontract(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == corpus.expected_canonical()

    rng = random.Random(13)
    edges = []
    for comp in range(8):
        nodes = ["m%02d_%03d" % (comp, i) for i in range(20)]
        rng.shuffle(nodes)
        for i in range(1, len(nodes)):
            edges.append((nodes[i], nodes[rng.randrange(i)]))
    rng.shuffle(edges)
    ds = rd.from_arrow(pa.table({
        "uri_a": [a for a, _ in edges],
        "uri_b": [b for _, b in edges],
    })).repartition(25)
    labels = connected_components_starcontract(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == union_find(edges)
