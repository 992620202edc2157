"""Sectionizer FSM-semantics tests (w3c.py:84-207 decision procedure)."""

from ferenda_ray.htmltree import parse_html
from ferenda_ray.sectionize import analyze_sectionstart, sectionize


def _sections(html: bytes, url="http://ex.org/doc"):
    body = parse_html(html).find("body")
    return sectionize(body, url)


def test_analyze_sectionstart():
    assert analyze_sectionstart("1 Blahonga") == ("1", "Blahonga")
    assert analyze_sectionstart("1.2.3. This is a subsubsection") == (
        "1.2.3", "This is a subsubsection")
    assert analyze_sectionstart("Introduction") == (None, "Introduction")
    # trailing-dot titles don't match  (regex requires .*[^.]$)
    assert analyze_sectionstart("1 Ends with dot.") == (None, "1 Ends with dot.")


def test_flat_sections():
    rows = _sections(
        b"<html><body><p>intro</p>"
        b"<h1>1 First</h1><p>alpha</p>"
        b"<h1>2 Second</h1><p>beta</p></body></html>"
    )
    kinds = [(r["kind"], r["ordinal"], r["title"], r["text"]) for r in rows]
    assert kinds == [
        ("body", None, None, "intro"),
        ("section", "1", "First", "alpha"),
        ("section", "2", "Second", "beta"),
    ]
    assert rows[1]["section_uri"] == "http://ex.org/doc#S1"
    assert rows[1]["parent_uri"] == "http://ex.org/doc"


def test_nested_sections():
    rows = _sections(
        b"<html><body>"
        b"<h1>1 Top</h1><p>a</p>"
        b"<h2>1.1 Sub</h2><p>b</p>"
        b"<h3>1.1.1 Subsub</h3><p>c</p>"
        b"<h2>1.2 Sub2</h2><p>d</p>"
        b"<h1>2 Next</h1><p>e</p>"
        b"</body></html>"
    )
    got = [(r["kind"], r["ordinal"], r["parent_uri"]) for r in rows]
    assert got == [
        ("body", None, None),
        ("section", "1", "http://ex.org/doc"),
        ("subsection", "1.1", "http://ex.org/doc#S1"),
        ("subsubsection", "1.1.1", "http://ex.org/doc#S1.1"),
        ("subsection", "1.2", "http://ex.org/doc#S1"),
        ("section", "2", "http://ex.org/doc"),
    ]


def test_preamble_sections():
    rows = _sections(
        b"<html><body>"
        b"<h2>Abstract</h2><p>the abstract</p>"
        b"<h2>Table of Contents</h2><p>toc here</p>"
        b"<h1>1 Intro</h1><p>body text</p>"
        b"</body></html>"
    )
    got = [(r["kind"], r["title"], r["text"]) for r in rows]
    assert got == [
        ("body", None, ""),
        ("preamble", "Abstract", "the abstract"),
        ("preamble", "Table of Contents", "toc here"),
        ("section", "Intro", "body text"),
    ]
    assert rows[1]["section_uri"] == "http://ex.org/doc#PS1"
    assert rows[2]["section_uri"] == "http://ex.org/doc#PS2"


def test_preamble_ended_by_hr():
    rows = _sections(
        b"<html><body>"
        b"<h2>Abstract</h2><p>inside</p><hr/><p>after hr is body content</p>"
        b"</body></html>"
    )
    assert rows[1]["kind"] == "preamble"
    assert rows[1]["text"] == "inside"
    # hr pops the preamble; hr + following p land in body content
    assert rows[0]["text"] == "after hr is body content"


def test_depth2_header_in_body_is_content():
    # FSM: in "body" state only is_section/is_preamblesection/is_other
    # transitions exist — a depth-2 header is plain content
    rows = _sections(
        b"<html><body><h2>3.1 Orphan</h2><p>x</p></body></html>"
    )
    assert len(rows) == 1
    assert rows[0]["text"] == "3.1 Orphan x"


def test_depth3_header_in_section_is_content():
    # in "section" state there is no is_subsubsection transition
    rows = _sections(
        b"<html><body><h1>1 Top</h1><h3>1.1.1 Deep</h3><p>x</p></body></html>"
    )
    assert [(r["kind"]) for r in rows] == ["body", "section"]
    assert rows[1]["text"] == "1.1.1 Deep x"


def test_h5_not_a_section_header():
    rows = _sections(b"<html><body><h5>1 NotASection</h5><p>x</p></body></html>")
    assert len(rows) == 1
    assert rows[0]["text"] == "1 NotASection x"


def test_subsection_popped_by_new_section():
    rows = _sections(
        b"<html><body><h1>1 A</h1><h2>1.1 B</h2><p>deep</p><h1>2 C</h1><p>top</p></body></html>"
    )
    got = [(r["kind"], r["ordinal"], r["text"]) for r in rows]
    assert got == [
        ("body", None, ""),
        ("section", "1", ""),
        ("subsection", "1.1", "deep"),
        ("section", "2", "top"),
    ]


def test_positions_are_document_order():
    rows = _sections(
        b"<html><body><h2>Abstract</h2><p>a</p><h1>1 S</h1><p>b</p></body></html>"
    )
    assert [r["position"] for r in rows] == [0, 1, 2]
