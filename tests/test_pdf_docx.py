"""PDF + Word ingestion sources (round 5): pdf2xml parsing, glue,
footnote merges, the real-PDF writer/extractor round-trip, analyzer
metrics, docx run-merge round-trip, and both Dataset sources."""

import collections

import pytest

from ferenda_ray.sources import docx, pdf

PDF2XML = """<?xml version="1.0"?>
<pdf2xml>
<page number="1" width="612" height="792">
<fontspec id="0" size="12" family="Times" color="#000"/>
<fontspec id="1" size="16" family="Times-Bold" color="#000"/>
<text top="72" left="72" width="200" height="16" font="1">Heading one</text>
<text top="100" left="72" width="400" height="12" font="0">First line of para </text>
<text top="115" left="72" width="400" height="12" font="0">second line of para.</text>
<text top="160" left="72" width="400" height="12" font="0">New paragraph starts here </text>
<text top="175" left="72" width="380" height="12" font="0">and continues on <b>bold</b> text.</text>
<text top="300" left="72" width="10" height="12" font="0">   </text>
<text top="780" left="300" width="10" height="10" font="0">7</text>
</page>
<page number="2" width="612" height="792">
<text top="72" left="72" width="400" height="12" font="0">Second page text</text>
</page>
</pdf2xml>"""


def test_parse_pdf2xml_model():
    pages = pdf.parse_pdf2xml(PDF2XML, detect_footnotes=False)
    assert [p["number"] for p in pages] == [1, 2]
    boxes = pages[0]["boxes"]
    # whitespace-only box eliminated
    assert len(boxes) == 6
    assert boxes[0]["family"] == "Times-Bold" and boxes[0]["size"] == 16
    assert boxes[4]["tags"] == "|b|"
    assert pages[1]["boxes"][0]["text"] == "Second page text"


def test_default_glue_paragraphs():
    pages = pdf.parse_pdf2xml(PDF2XML, detect_footnotes=False)
    glued = pdf.glue_page_boxes(pages[0]["boxes"])
    texts = [g["text"] for g in glued]
    assert texts == [
        "Heading one",
        "First line of para second line of para.",
        "New paragraph starts here and continues on bold text.",
        "7"]
    para = glued[1]
    assert para["top"] == 100 and para["top"] + para["height"] == 127


def test_footnote_marker_merges():
    xml = """<pdf2xml><page number="1" width="612" height="792">
<fontspec id="0" size="12" family="Times" color="#000"/>
<fontspec id="1" size="7" family="Times" color="#000"/>
<text top="100" left="72" width="200" height="12" font="0">Some statement</text>
<text top="98" left="273" width="6" height="8" font="1">3</text>
<text top="98" left="320" width="100" height="12" font="0">continues after</text>
</page></pdf2xml>"""
    boxes = pdf.parse_pdf2xml(xml)[0]["boxes"]
    # marker merged into the statement; the after-footnote adjacency
    # merge requires flush edges (320 vs 279: separate box)
    assert boxes[0]["text"] == "Some statement3"
    assert "sup" in boxes[0]["tags"]
    assert len(boxes) == 2


def test_pdf_roundtrip_compressed_and_plain():
    pages = [[(72, 720, 12, r"Hello (world) \ test"),
              (72, 700, 12, "second line")],
             [(100, 650, 16, "Page two heading")]]
    for compress in (True, False):
        data = pdf.build_pdf(pages, compress=compress)
        assert data.startswith(b"%PDF")
        got = pdf.extract_pdf_text(data)
        assert [(p, x, y, s, t) for p, x, y, s, t in got] == [
            (1, 72, 720, 12, r"Hello (world) \ test"),
            (1, 72, 700, 12, "second line"),
            (2, 100, 650, 16, "Page two heading")]


def test_pdf_extract_rejects_non_pdf():
    with pytest.raises(ValueError):
        pdf.extract_pdf_text(b"plain text, no header")


def test_analyzer_metrics():
    lc, rc, tc, bc = (collections.Counter() for _ in range(4))
    sc = collections.Counter()
    pages = pdf.parse_pdf2xml(PDF2XML, detect_footnotes=False)
    for page in pages:
        for b in page["boxes"]:
            lc[b["left"]] += 1
            rc[b["left"] + b["width"]] += 1
            t = b["text"].strip()
            tc[b["top"]] += len(t)
            bc[b["top"] + b["height"]] += len(t)
            sc[(b["family"], b["size"])] += len(t)
    m = pdf.margins_from_counts(lc, rc, tc, bc, 612, 792)
    assert m["leftmargin"] == 72
    assert m["rightmargin"] == 480   # ceil-binned most common right
    assert 0 <= m["topmargin"] <= 792
    s = pdf.styles_from_counts(sc)
    assert s["default"] == ("Times", 12)
    assert s["h1"] == ("Times-Bold", 16)


def test_docx_roundtrip_and_merge():
    data = docx.build_docx([
        {"text": "Heading here", "style": "Heading1"},
        "A plain paragraph long enough to be split into two runs.",
        {"runs": [(("b",), "Bold lead"), ((), ": normal"),
                  (("b", "i"), " bolditalic")], "text": None}])
    paras = docx.parse_docx(data)
    assert paras[0]["style"] == "Heading1"
    # the split identically-formatted runs merged back to ONE
    assert len(paras[1]["runs"]) == 1
    assert paras[1]["text"] == \
        "A plain paragraph long enough to be split into two runs."
    assert paras[2]["tags"] == "|b|i|"
    assert paras[2]["text"] == "Bold lead: normal bolditalic"


def test_docx_rejects_doc_and_garbage():
    with pytest.raises(ValueError, match="antiword"):
        docx.parse_docx(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1 junk")
    with pytest.raises(ValueError, match="bad zip"):
        docx.parse_docx(b"not a zip at all")


def test_read_pdf2xml_dataset(ray_session, tmp_path):
    (tmp_path / "a.xml").write_text(PDF2XML)
    ds = pdf.read_pdf2xml([str(tmp_path / "a.xml")], glue=True)
    df = ds.to_pandas().sort_values(["page", "seq"])
    assert list(df["key"].unique()) == ["a"]
    assert len(df) == 5  # 4 glued boxes on page 1 + 1 on page 2
    assert df[df["page"] == 2].iloc[0]["text"] == "Second page text"


def test_read_docx_dataset(ray_session, tmp_path):
    (tmp_path / "x.docx").write_bytes(
        docx.build_docx(["first paragraph here", "second one"]))
    (tmp_path / "bad.docx").write_bytes(b"garbage")
    ds = docx.read_docx([str(tmp_path / "x.docx"),
                         str(tmp_path / "bad.docx")])
    df = ds.to_pandas()
    good = df[df["key"] == "x"].sort_values("para")
    assert list(good["text"]) == ["first paragraph here", "second one"]
    assert good["error"].isna().all()
    bad = df[df["key"] == "bad"]
    assert len(bad) == 1 and bad.iloc[0]["error"]


def test_link_uris_carried():
    xml = """<pdf2xml><page number="1" width="612" height="792">
<fontspec id="0" size="12" family="Times" color="#000"/>
<text top="100" left="72" width="400" height="12" font="0">See <a href="http://x.test/ref">the spec</a> and <b><a href="http://y.test/2">notes</a></b>.</text>
</page></pdf2xml>"""
    b = pdf.parse_pdf2xml(xml)[0]["boxes"][0]
    assert b["text"] == "See the spec and notes."
    # LinkedTextelement model: hrefs ride the box; nested <b><a>
    # composes the tag like the reference's "ba"
    assert b["uris"] == "http://x.test/ref|http://y.test/2"
    assert "ba" in b["tags"]
