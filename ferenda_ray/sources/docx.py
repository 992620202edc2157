"""Word (.docx) ingestion — the reference's ``WordReader`` surface
(``ferenda/wordreader.py``) re-expressed Ray-native, pure stdlib.

Reference semantics: ``word_to_ooxml`` (wordreader.py:112-124)
extracts ``word/document.xml`` from the docx zip;
``_simplify_ooxml`` strips nonessential OOXML down to paragraphs,
runs and text; ``_merge_ooxml`` (wordreader.py:149-180) joins
adjacent ``w:r`` runs whose formatting (``w:rPr``) is identical, so
the needlessly split ``<w:t>Avgörand</w:t><w:t>a</w:t>`` becomes one
run. (The legacy ``.doc`` path shells out to antiword — an external
binary, out of scope exactly like pdftohtml; a .doc payload raises
``ValueError`` loudly.)

This module does the same with ``zipfile`` + ``ElementTree``:

- :func:`parse_docx` — docx bytes → list of paragraph dicts
  ``{style, runs: [(tags, text)...], text}`` with identical-format
  adjacent runs merged (the _merge_ooxml rule, keyed on the
  canonicalized ``w:rPr`` content) and the x81→Å control-char
  workaround (_simplify_ooxml wordreader.py:131-136);
- :func:`read_docx` — Dataset source: ``read_binary_files`` →
  stateless parse → one row per paragraph (the WARC/pdf source
  discipline: per-file tasks, Arrow rows, errors as data);
- :func:`build_docx` — deterministic minimal writer (valid zip with
  [Content_Types].xml + rels + document.xml) used by the tests and
  the ★``docx_roundtrip`` oracle; external Word tooling opens its
  output.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _w(tag: str) -> str:
    return "{%s}%s" % (W_NS, tag)


PARA_SCHEMA = pa.schema([
    ("para", pa.int32()),
    ("style", pa.string()),
    ("tags", pa.string()),    # "|b|", "|i|", "|b|i|" over the runs
    ("text", pa.string()),
])


def _rpr_key(r) -> str:
    """Canonical formatting key of a run: the sorted (tag, attrs) of
    its ``w:rPr`` children — the reference merges runs when
    ``current_r.find("w:rpr") == r.find("w:rpr")``."""
    rpr = r.find(_w("rPr"))
    if rpr is None:
        return ""
    parts = []
    for child in rpr:
        attrs = ",".join("%s=%s" % kv
                         for kv in sorted(child.attrib.items()))
        parts.append("%s(%s)" % (child.tag.split("}")[-1], attrs))
    return ";".join(sorted(parts))


def _run_tags(r) -> frozenset:
    rpr = r.find(_w("rPr"))
    tags = set()
    if rpr is not None:
        if rpr.find(_w("b")) is not None:
            tags.add("b")
        if rpr.find(_w("i")) is not None:
            tags.add("i")
    return frozenset(tags)


def _run_text(r) -> str:
    out = []
    for child in r:
        if child.tag == _w("t"):
            out.append(child.text or "")
        elif child.tag in (_w("br"), _w("cr")):
            out.append("\n")
        elif child.tag == _w("tab"):
            out.append("\t")
    return "".join(out)


def parse_docx(data: bytes) -> list[dict]:
    """docx bytes → paragraph dicts ``{style, runs, text}``; adjacent
    identically-formatted runs merged (_merge_ooxml)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as exc:
        if data[:8].startswith(b"\xd0\xcf\x11\xe0"):
            raise ValueError(
                "legacy .doc (OLE2) payload — the antiword path is "
                "an external binary, out of scope like pdftohtml")
        raise ValueError("not a docx (bad zip): %s" % exc)
    name = "word/document.xml"
    if name not in zf.namelist():
        raise ValueError("No %s in zipfile" % name)
    raw = zf.read(name)
    # the reference's control-char workaround (wordreader.py:131-136)
    if b"\xc2\x81" in raw:
        raw = raw.replace(b"\xc2\x81", b"\xc3\x85")
    root = ET.fromstring(raw)
    body = root.find(_w("body"))
    paras = []
    for p in (body if body is not None else root).iter(_w("p")):
        ppr = p.find(_w("pPr"))
        style = ""
        if ppr is not None:
            ps = ppr.find(_w("pStyle"))
            if ps is not None:
                style = ps.get(_w("val"), "")
        runs: list[list] = []  # [key, tags, text]
        for r in p.iter(_w("r")):
            key = _rpr_key(r)
            text = _run_text(r)
            if runs and runs[-1][0] == key:
                runs[-1][2] += text    # _merge_ooxml join
            else:
                runs.append([key, _run_tags(r), text])
        text = "".join(t for _, _, t in runs)
        tags = sorted({t for _, ts, _ in runs for t in ts})
        paras.append({
            "style": style,
            "runs": [(ts, t) for _, ts, t in runs],
            "tags": "|%s|" % "|".join(tags) if tags else "",
            "text": text})
    return paras


def read_docx(paths, **read_kwargs):
    """Dataset source: one row per paragraph of every .docx file
    (key = basename without extension); malformed files become
    error rows (the WARC error-column contract)."""
    import os

    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True,
                              **read_kwargs)
    schema = pa.schema([("key", pa.string())] + list(PARA_SCHEMA)
                       + [("error", pa.string())])

    def parse(t: pa.Table) -> pa.Table:
        cols: dict = {n: [] for n in schema.names}
        for path, data in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            key = os.path.basename(path).rsplit(".", 1)[0]
            try:
                paras = parse_docx(bytes(data))
            except ValueError as exc:
                cols["key"].append(key)
                cols["para"].append(-1)
                cols["style"].append("")
                cols["tags"].append("")
                cols["text"].append("")
                cols["error"].append(str(exc))
                continue
            for i, p in enumerate(paras):
                cols["key"].append(key)
                cols["para"].append(i)
                cols["style"].append(p["style"])
                cols["tags"].append(p["tags"])
                cols["text"].append(p["text"])
                cols["error"].append(None)
        return pa.table({f.name: pa.array(cols[f.name], f.type)
                         for f in schema})

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------
# deterministic writer (tests + oracle)
# ---------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def _xml_esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def build_docx(paragraphs) -> bytes:
    """``paragraphs``: list of either plain strings or dicts
    ``{text, style?, runs?: [(tags_iterable, text)...]}`` → docx
    bytes. Runs with identical tags are written SPLIT mid-word (when
    long enough) so the reader's merge rule is actually exercised on
    round-trip."""
    parts = []
    for p in paragraphs:
        if isinstance(p, str):
            p = {"text": p}
        ppr = ('<w:pPr><w:pStyle w:val="%s"/></w:pPr>' % p["style"]
               if p.get("style") else "")
        runs = p.get("runs")
        if runs is None:
            text = p["text"]
            if len(text) > 8:
                # split into two identically-formatted w:r: the
                # reference's merge target shape
                runs = [((), text[:5]), ((), text[5:])]
            else:
                runs = [((), text)]
        rxml = []
        for tags, text in runs:
            tset = set(tags)
            rpr = ""
            if tset:
                rpr = "<w:rPr>%s</w:rPr>" % "".join(
                    "<w:%s/>" % t for t in sorted(tset))
            rxml.append(
                '<w:r>%s<w:t xml:space="preserve">%s</w:t></w:r>'
                % (rpr, _xml_esc(text)))
        parts.append("<w:p>%s%s</w:p>" % (ppr, "".join(rxml)))
    doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<w:document xmlns:w="%s"><w:body>%s</w:body>'
           "</w:document>" % (W_NS, "".join(parts)))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed timestamps: byte-deterministic output
        for name, payload in (
                ("[Content_Types].xml", _CONTENT_TYPES),
                ("_rels/.rels", _RELS),
                ("word/document.xml", doc)):
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue()
