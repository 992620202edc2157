"""Plain-text sectionizer, XHTML render/distill round-trip,
patches/link-rewrite/salting transforms, JSON serialize round-trip,
N-Triples formatting, date helpers."""

from datetime import date, datetime

import pandas as pd
import pyarrow as pa
import pytest

from ferenda_ray.functions.dates import (
    parse_gyearmonth,
    parse_month_year,
    parse_rfc822_date,
    rfc_3339_timestamp,
)
from ferenda_ray.sources.nt import format_triple, write_nt
from ferenda_ray.sources.xhtml import distill_rdfa, render_xhtml
from ferenda_ray.stages import transform
from ferenda_ray.stages.textparse import paragraphs, sectionize_text

RFC_TEXT = """Network Working Group

Status of This Memo

   This memo provides information.

1. Introduction

This is the intro paragraph.

1.1 Scope

Scope text here.

2. Terminology

   preformatted block
   stays   intact

Closing paragraph.
"""


def test_paragraphs():
    assert paragraphs("a\n\nb\n\n\nc") == ["a", "b", "c"]
    assert paragraphs("a\fb") == ["a", "b"]


def test_sectionize_text():
    rows = sectionize_text(RFC_TEXT, "http://d/rfc1")
    got = [(r["kind"], r["ordinal"], r["title"]) for r in rows]
    assert got == [
        ("body", None, None),
        ("section", "1", "Introduction"),
        ("subsection", "1.1", "Scope"),
        ("section", "2", "Terminology"),
    ]
    assert rows[1]["text"] == "This is the intro paragraph."
    # preformatted chunk keeps its whitespace inside section 2
    assert "preformatted block\n   stays   intact" in rows[3]["text"]
    # header-less preamble chunks land in body
    assert "Network Working Group" in rows[0]["text"]
    assert rows[2]["section_uri"] == "http://d/rfc1#S1.1"


def _sections_df():
    return pd.DataFrame({
        "url": ["http://d/1"] * 2,
        "section_uri": ["http://d/1", "http://d/1#S1"],
        "kind": ["body", "section"],
        "ordinal": [None, "1"],
        "title": ["Doc Title", "Intro"],
        "parent_uri": [None, "http://d/1"],
        "text": ["full text", "intro text"],
        "position": [0, 1],
        "lang": ["en", "en"],
        "basefile": ["1", "1"],
        "error": [None, None],
    })


def test_render_xhtml_and_distill(ray_session):
    import ray.data as rd

    out = render_xhtml(rd.from_pandas(_sections_df())).to_pandas()
    assert len(out) == 1
    xhtml = out["xhtml"].iloc[0]
    assert 'about="http://d/1#S1"' in xhtml
    assert "<title>Doc Title</title>" in xhtml
    triples = set(distill_rdfa(xhtml))
    assert ("http://d/1#S1", "dcterms:title", "Intro", True) in triples
    assert ("http://d/1#S1", "rdf:type", "bibo:DocumentPart", False) in triples
    assert ("http://d/1#S1", "dcterms:isPartOf", "http://d/1", False) in triples
    assert ("http://d/1#S1", "bibo:chapter", "1", True) in triples


def test_render_xhtml_with_annotations(ray_session):
    """Annotated render (prep_annotation_file → generate shape): the
    doc-to-doc inbound citations appear as distillable RDFa spans."""
    import ray.data as rd

    ann = rd.from_items([
        {"target_url": "http://d/1", "citing_url": "http://d/9",
         "citing_title": "Citing Doc"},
    ])
    out = render_xhtml(rd.from_pandas(_sections_df()),
                       annotations_ds=ann).to_pandas()
    xhtml = out["xhtml"].iloc[0]
    assert '<aside class="annotations">' in xhtml
    assert ('rel="dcterms:isReferencedBy" href="http://d/9" '
            'title="Citing Doc"' in xhtml)
    # plain render unchanged when no annotations exist for the doc
    out2 = render_xhtml(rd.from_pandas(_sections_df())).to_pandas()
    assert "<aside" not in out2["xhtml"].iloc[0]


def test_apply_patches(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"url": "http://d/1", "text": "teh typo here"},
        {"url": "http://d/2", "text": "clean"},
    ])
    out = transform.apply_patches(
        ds, {"http://d/1": [("teh", "the")]}).to_pandas()
    by_url = dict(zip(out["url"], out["text"]))
    assert by_url["http://d/1"] == "the typo here"
    assert by_url["http://d/2"] == "clean"


def test_transform_links(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"url": "http://localhost:8000/res/1"},
        {"url": "https://other.org/x"},
    ])
    out = transform.transform_links(
        ds, {"http://localhost:8000/": "https://example.org/"}).to_pandas()
    assert set(out["url"]) == {"https://example.org/res/1",
                               "https://other.org/x"}


def test_salted_counts(ray_session):
    import ray.data as rd

    rows = [{"k": "hot"}] * 500 + [{"k": "cold"}] * 3
    out = transform.salted_counts(rd.from_items(rows), "k", salt_n=8).to_pandas()
    got = dict(zip(out["k"], out["n"]))
    assert got == {"hot": 500, "cold": 3}


def test_sections_json_roundtrip(ray_session):
    import ray.data as rd

    df = _sections_df()[["url", "section_uri", "kind", "ordinal", "title",
                         "parent_uri", "text", "position"]]
    ser = transform.serialize_sections_json(rd.from_pandas(df))
    back = transform.deserialize_sections(ser).to_pandas()
    back = back.sort_values("position").reset_index(drop=True)
    exp = df.sort_values("position").reset_index(drop=True)
    assert back[["url", "section_uri", "kind", "title", "text"]].equals(
        exp[["url", "section_uri", "kind", "title", "text"]])


def test_format_triple():
    assert format_triple("http://s", "dcterms:title", 'say "hi"\n', True, "en") == (
        '<http://s> <http://purl.org/dc/terms/title> "say \\"hi\\"\\n"@en .')
    assert format_triple("http://s", "rdf:type", "bibo:Document", False) == (
        "<http://s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://purl.org/ontology/bibo/Document> .")


def test_write_nt(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "subj": ["http://b", "http://a"],
        "pred": ["rdf:type", "rdf:type"],
        "obj": ["bibo:Document", "bibo:Document"],
        "obj_is_literal": [False, False],
        "obj_lang": ["", ""],
        "source_url": ["", ""],
    })
    path = str(tmp_path / "dump.nt")
    n = write_nt(rd.from_arrow(t), path)
    assert n == 2
    lines = open(path).read().splitlines()
    assert lines[0].startswith("<http://a>")  # sorted
    assert all(line.endswith(" .") for line in lines)


def test_dates():
    assert rfc_3339_timestamp(datetime(2013, 8, 4, 12, 3, 10)) == (
        "2013-08-04T12:03:10Z")
    assert parse_rfc822_date("Mon, 4 Aug 2013 12:03:10") == (
        datetime(2013, 8, 4, 12, 3, 10))
    assert parse_rfc822_date("4 Aug 13") == datetime(2013, 8, 4)
    assert parse_gyearmonth(" 2004-08") == date(2004, 8, 1)
    assert parse_month_year("August 2013") == date(2013, 8, 1)
    assert parse_month_year("Aug 2013") == date(2013, 8, 1)
    with pytest.raises(ValueError):
        parse_gyearmonth("2004")
