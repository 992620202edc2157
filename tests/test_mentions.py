"""Citation scanning + entity linking semantics
(citationparser.py:65-96 priority/non-overlap; rfc.py:430-452 URI
formatting; documentrepository.py:500-547 fuzzy lookup)."""

import pyarrow as pa

from ferenda_ray.stages.mentions import (
    MentionLinker,
    RFC_BASE,
    rfc_uri,
    scan_citations,
)


def _kinds(text):
    matches, _ = scan_citations(text, "http://d/1")
    return [(m[2], m[3], m[4]) for m in matches]


def test_rfc_citation():
    assert _kinds("defined in RFC 822 here") == [
        ("RFC 822", "rfc", RFC_BASE + "822")]
    # leading zeros stripped (rfc.py:434 lstrip("0"))
    assert _kinds("see RFC 0822") == [("RFC 0822", "rfc", RFC_BASE + "822")]
    # brackets included in the match
    assert _kinds("x [RFC 2616] y") == [("[RFC 2616]", "rfc", RFC_BASE + "2616")]


def test_section_rfc_citation():
    got = _kinds("see section 2.2 of [RFC 2616] for details")
    assert got == [("section 2.2 of [RFC 2616]", "sec_rfc", RFC_BASE + "2616#S2.2")]
    # trailing dot on section ordinal stripped (rfc.py:436 rstrip("."))
    assert rfc_uri(RFC_BASE, "2616", "2.2.", "http://d/1") == RFC_BASE + "2616#S2.2"


def test_section_only_citation_resolves_against_doc():
    got = _kinds("as section 3.1 explains")
    assert got == [("section 3.1", "sec", "http://d/1#S3.1")]


def test_priority_non_overlap():
    # the sec_rfc grammar claims its whole span; the bare-RFC grammar
    # must not re-match "[RFC 2616]" inside it, but still matches the
    # second citation outside the claimed span
    got = _kinds("section 2.2 of [RFC 2616] and RFC 822")
    assert got == [
        ("section 2.2 of [RFC 2616]", "sec_rfc", RFC_BASE + "2616#S2.2"),
        ("RFC 822", "rfc", RFC_BASE + "822"),
    ]


def test_url_citation_trailing_punctuation():
    # citationpatterns.py:21-22: trailing ",)." excluded from the match
    assert _kinds("see https://foo.org/bar.") == [
        ("https://foo.org/bar.", "url", "https://foo.org/bar")]
    got = _kinds("(see http://foo.org/x) end")
    assert got == [("http://foo.org/x)", "url", "http://foo.org/x")]
    got = _kinds("ftp://files.example.com/a/b today")
    assert got == [("ftp://files.example.com/a/b", "url",
                    "ftp://files.example.com/a/b")]


def test_eu_law_grammars():
    got = _kinds("pursuant to Directive 2007/42/EC as amended")
    assert got == [("Directive 2007/42/EC", "eu_directive",
                    "https://eurlex.example.org/dir/2007/42/EC")]
    got = _kinds("under Regulation (EC) No 45/2001 today")
    assert got == [("Regulation (EC) No 45/2001", "eu_regulation",
                    "https://eurlex.example.org/reg/EC/45/2001")]
    # compound article-of-directive (highest EU priority) with
    # fragment-style article URI
    got = _kinds("per Article 6(1) of Directive 2007/42/EC here")
    assert got == [("Article 6(1) of Directive 2007/42/EC", "eu_article",
                    "https://eurlex.example.org/dir/2007/42/EC#A6.1")]
    got = _kinds("per Article 9 of Directive 1999/5/EU done")
    assert got == [("Article 9 of Directive 1999/5/EU", "eu_article",
                    "https://eurlex.example.org/dir/1999/5/EU#A9")]
    # no overlap with the RFC family
    got = _kinds("RFC 822 and Directive 1999/5/EC")
    assert [g[1] for g in got] == ["rfc", "eu_directive"]


def _link_batch(texts, gaz):
    linker = MentionLinker(gaz)
    batch = pa.table({
        "kind": pa.array(["section"] * len(texts)),
        "url": pa.array(["http://d/%d" % i for i in range(len(texts))]),
        "section_uri": pa.array(["http://d/%d#S1" % i for i in range(len(texts))]),
        "text": pa.array(texts),
    })
    out = linker(batch)
    return [
        (s, k, u)
        for s, k, u in zip(out["surface"].to_pylist(), out["kind"].to_pylist(),
                           out["linked_uri"].to_pylist())
    ]


GAZ = {"Apache Spark": "http://e/spark", "Ray Data": "http://e/ray",
       "Apache Spark System": "http://e/spark-sys"}


def test_entity_exact_match():
    got = _link_batch(["the Apache Spark project ships"], GAZ)
    assert got == [("Apache Spark", "entity", "http://e/spark")]


def test_entity_longest_surface_wins():
    got = _link_batch(["uses Apache Spark System daily"], GAZ)
    assert got == [("Apache Spark System", "entity", "http://e/spark-sys")]


def test_entity_fuzzy_match():
    # misspelling within difflib cutoff 0.8 → linked to closest label
    got = _link_batch(["the Apache Sparx project"], GAZ)
    assert got == [("Apache Sparx", "entity_fuzzy", "http://e/spark")]


def test_entity_fuzzy_rejects_distant():
    got = _link_batch(["the Quantum Banana project"], GAZ)
    assert got == []


def test_body_rows_not_scanned():
    linker = MentionLinker(GAZ)
    batch = pa.table({
        "kind": pa.array(["body"]),
        "url": pa.array(["http://d/9"]),
        "section_uri": pa.array(["http://d/9"]),
        "text": pa.array(["Apache Spark everywhere"]),
    })
    assert linker(batch).num_rows == 0
