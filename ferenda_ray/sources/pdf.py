"""PDF ingestion — the reference's ``PDFReader`` / ``StreamingPDFReader``
surface re-expressed Ray-native, pure stdlib.

The reference delegates PDF *decoding* to the external ``pdftohtml
-xml`` binary and itself parses the **pdf2xml intermediate** into a
Page / Textbox / Textelement model (``ferenda/pdfreader.py:522-905
_parse_xml`` / ``_parse_xml_make_textbox``), glues line boxes into
paragraph boxes (``pdfreader.py:961-1071 textboxes() +
_default_glue``), and runs layout statistics over the boxes
(``ferenda/pdfanalyze.py:325-549 PDFAnalyzer`` counters → margins,
header/footer zones, style roles). This module implements all three
layers over Arrow rows instead of element trees:

- :func:`parse_pdf2xml` — the intermediate-format parser (fontspec
  table, empty-box elimination, the ``txt()`` whitespace rule,
  b/i/a child tags, footnote-marker superscript detection + the
  two adjacency merges of ``_parse_xml``);
- :func:`glue_page_boxes` / :func:`glue_boxes_df` — the
  ``_default_glue`` recurrence (basefamily-equal, same size, same
  left, top increasing, 1.5-linespacing window) as a vectorizable
  per-page pass;
- :func:`margins_from_counts` / :func:`styles_from_counts` — the
  PDFAnalyzer metric analysis (most-common left margin, quantized
  right margin with the 80 %-candidate rule, 0.2 %-char
  header/footer walk, charcount-weighted style roles) over BOUNDED
  coordinate histograms, so the distributed shape is map-side
  partial Counters → one tiny merge → an O(pageheight) driver walk
  (never a per-box driver loop);
- :func:`extract_pdf_text` — a REAL (small) PDF text extractor for
  actual ``%PDF`` bytes: object scan, FlateDecode via zlib, BT/ET
  content-stream interpretation (Tf/Td/TD/Tm/T*/Tj/TJ, literal +
  hex strings with escapes). The reference needs poppler for this
  step; at 100 TB the decode runs inside ``map_batches`` tasks on
  raw ``binary`` columns (the multimodal-column discipline) — and
  unlike a stub it round-trips real bytes (see
  :func:`build_pdf`, the deterministic writer the tests and the
  ★``pdf_roundtrip`` oracle use).

Scale shape: one ``read_binary_files`` task per archive/document,
stateless parse in ``map_batches`` (no shared state → task pool, not
actors), boxes stay row-structured Arrow; the analyzer is the
bounded-histogram + driver-walk pattern used by the repo's other
census operators.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zlib

import pyarrow as pa

BOX_SCHEMA = pa.schema([
    ("page", pa.int32()),
    ("seq", pa.int32()),
    ("top", pa.int32()),
    ("left", pa.int32()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("family", pa.string()),
    ("size", pa.int32()),
    ("text", pa.string()),
    ("tags", pa.string()),      # e.g. "|b|i|" member tags, "" if none
    ("uris", pa.string()),      # "|"-joined link hrefs in the box
    ("page_width", pa.int32()),
    ("page_height", pa.int32()),
])

_WS_RE = re.compile(r"[\s\xa0\xc2]+")


def _tags_of(tags) -> str:
    """Distinct non-empty member tags as a sorted ``|``-delimited
    set string (``"|b|i|"``), ``""`` when all members are plain."""
    s = sorted({t for t in tags if t})
    return "|%s|" % "|".join(s) if s else ""


def _txt(s) -> str:
    """pdfreader.py:560 txt(): collapse whitespace runs (incl. NBSP
    and the 0xc2 artifact) to single spaces."""
    return _WS_RE.sub(" ", str(s))


def _element_texts(el):
    """One pdf2xml <text> element → list of (tag, text, uri) member
    elements: plain runs tag '', <b>→'b', <i>→'i', <b><i>→'bi',
    <a href>→'a' with the href carried as ``uri`` (the
    Textelement/LinkedTextelement model, pdfreader.py:814-906),
    whitespace-only members merged into the previous member when
    present (the 'merge whitespace-only-boxes' rule at
    pdfreader.py:795-812)."""
    out = []

    def emit(tag, s, uri):
        if s is None or s == "":
            return
        s = _txt(s)
        if out and s.strip() == "" and out[-1][0] == tag                 and out[-1][2] == uri:
            out[-1] = (tag, out[-1][1] + s, uri)
        elif out and s.strip() == "":
            # whitespace-only member: merge with previous even if the
            # tag differs (the tag of whitespace is irrelevant)
            out[-1] = (out[-1][0], out[-1][1] + s, out[-1][2])
        else:
            out.append((tag, s, uri))

    def walk(node, tag, uri):
        emit(tag, node.text, uri)
        for child in node:
            ctag = {"b": "b", "i": "i", "a": "a"}.get(child.tag, "")
            curi = child.get("href") if child.tag == "a" else uri
            if tag and ctag and ctag != tag:
                ctag = tag + ctag  # <b><i> → "bi"
            elif tag and not ctag:
                ctag = tag
            walk(child, ctag, curi)
            emit(tag, child.tail, uri)

    walk(el, "", None)
    return out


def parse_pdf2xml(data, detect_footnotes: bool = True):
    """pdf2xml intermediate (bytes or str) → list of page dicts
    ``{number, width, height, boxes: [box...]}`` where each box is
    ``{top, left, width, height, family, size, text, tags}``.

    Implements _parse_xml's behaviors: fontspec accumulation, empty
    text-element elimination, whitespace normalization, and (with
    ``detect_footnotes``) the digit-superscript footnote-marker rule
    with its two adjacency merges: a marker adjacent to the previous
    box (|lastbox.right − left| < 3) merges into it, and the box
    following a footnote marker merges when flush with the marker's
    right edge (pdfreader.py:688-705, 712-780)."""
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    root = ET.fromstring(data)
    if root.tag != "pdf2xml":
        raise ValueError(
            "Unexpected root node from pdftohtml -xml: %s" % root.tag)
    fontspec: dict[int, dict] = {}
    pages = []
    for pageelement in root:
        if pageelement.tag != "page":
            continue  # outline etc.
        page = {"number": int(pageelement.get("number")),
                "width": int(pageelement.get("width")),
                "height": int(pageelement.get("height")),
                "boxes": []}
        boxes = page["boxes"]
        after_footnote = False
        elements = [e for e in pageelement
                    if e.tag in ("fontspec", "text")]
        for i, element in enumerate(elements):
            if element.tag == "fontspec":
                fid = int(element.get("id"))
                fontspec[fid] = {
                    "family": element.get("family", ""),
                    "size": int(element.get("size", "0"))}
                continue
            members = _element_texts(element)
            text = "".join(m[1] for m in members)
            if text.strip() == "":
                continue  # empty textbox elimination
            font = fontspec.get(int(element.get("font", "0")),
                                {"family": "", "size": 0})
            uris = sorted({m[2] for m in members if m[2]})
            box = {
                "top": int(element.get("top")),
                "left": int(element.get("left")),
                "width": int(element.get("width")),
                "height": int(element.get("height")),
                "family": font["family"],
                "size": font["size"],
                "text": text,
                "tags": _tags_of(m[0] for m in members),
                "uris": "|".join(uris),
            }
            last = boxes[-1] if boxes else None
            nextel = next((e for e in elements[i + 1:]
                           if e.tag == "text"), None)
            if detect_footnotes and _is_footnote_marker(
                    box, text, last, nextel, fontspec):
                box["tags"] = "|sup|"
                if last is not None and \
                        abs(_right(last) - box["left"]) < 3:
                    _merge_into(last, box)
                    after_footnote = True
                    continue
                boxes.append(box)
                after_footnote = True
                continue
            if after_footnote and last is not None and \
                    abs(_right(last) - box["left"]) < 3:
                _merge_into(last, box)
                after_footnote = False
                continue
            after_footnote = False
            boxes.append(box)
        pages.append(page)
    return pages


def _right(box) -> int:
    return box["left"] + box["width"]


def _bottom(box) -> int:
    return box["top"] + box["height"]


def _merge_into(dst, src):
    """Textbox.__add__ bbox-union + member-concat semantics
    (pdfreader.py:1364-1415): str() of the merged box is the plain
    concatenation of both boxes' text."""
    right = max(_right(dst), _right(src))
    bottom = max(_bottom(dst), _bottom(src))
    dst["top"] = min(dst["top"], src["top"])
    dst["left"] = min(dst["left"], src["left"])
    dst["width"] = right - dst["left"]
    dst["height"] = bottom - dst["top"]
    dst["text"] += src["text"]
    if src["tags"]:
        merged = {t for box in (dst, src) if box["tags"]
                  for t in box["tags"].strip("|").split("|")}
        dst["tags"] = _tags_of(merged)
    if src.get("uris"):
        us = {u for box in (dst, src) if box.get("uris")
              for u in box["uris"].split("|")}
        dst["uris"] = "|".join(sorted(us))


def _is_footnote_marker(box, text, last, nextel, fontspec) -> bool:
    """The detect_footnotes test of _parse_xml_make_textbox
    (pdfreader.py:718-737): an all-digit run in a smaller size of the
    same family as its neighbor, horizontally adjacent and slightly
    above/below it."""
    if not text.strip().isdigit():
        return False
    if last is not None and last["family"] == box["family"] \
            and last["size"] > box["size"] \
            and -5 < box["left"] - _right(last) < 10 \
            and 0 < _bottom(last) - _bottom(box) < 20:
        return True
    if nextel is not None and nextel.get("font") is not None:
        nf = fontspec.get(int(nextel.get("font")),
                          {"family": None, "size": 0})
        n_left = int(nextel.get("left"))
        n_bottom = int(nextel.get("top")) + int(nextel.get("height"))
        if nf["family"] == box["family"] \
                and box["size"] < nf["size"] \
                and -5 < n_left - _right(box) < 10 \
                and 0 < n_bottom - _bottom(box) < 20:
            return True
    return False


# ---------------------------------------------------------------------
# textboxes() + _default_glue
# ---------------------------------------------------------------------

_BASEFAM_RE = re.compile(r"-|Bold|Italic")
LINESPACING_NUM, LINESPACING_DEN = 3, 2  # the 1.5 kept rational


def _basefamily(family: str) -> str:
    return _BASEFAM_RE.sub("", family)


def default_glue(textbox, nextbox, prevbox) -> bool:
    """pdfreader.py:1039-1071 _default_glue, bit-for-bit: glue when
    the (possibly merged) textbox and the next line share basefamily
    and size, line up on the left edge, proceed downward, and the
    next line's top falls inside prevbox.height·1.5 of the current
    bottom. Kept integer (3/2) so SQL oracles replay it exactly."""
    return (_basefamily(textbox["family"]) == _basefamily(nextbox["family"])
            and textbox["size"] == nextbox["size"]
            and textbox["left"] == nextbox["left"]
            and textbox["top"] < nextbox["top"]
            and _bottom(textbox) * LINESPACING_DEN
            + prevbox["height"] * LINESPACING_NUM
            - prevbox["height"] * LINESPACING_DEN
            >= nextbox["top"] * LINESPACING_DEN)


def glue_page_boxes(boxes, gluefunc=None):
    """One page's box dicts → glued paragraph boxes — the
    textboxes() loop (pdfreader.py:961-1024): empty boxes skipped,
    ``glue(textbox, nextbox, prevbox)`` decides appends, bbox unions
    and text concatenates via Textbox.__add__ semantics."""
    glue = gluefunc or default_glue
    out = []
    textbox = None
    prevbox = None
    for nextbox in boxes:
        if not nextbox["text"].strip():
            continue
        if textbox is None:
            textbox = dict(nextbox)
        elif glue(textbox, nextbox, prevbox):
            _merge_into(textbox, nextbox)
        else:
            out.append(textbox)
            textbox = dict(nextbox)
        prevbox = nextbox
    if textbox is not None:
        out.append(textbox)
    return out


def pages_to_rows(doc_key, pages, glue: bool = False) -> dict:
    """Page dicts → columnar rows for BOX_SCHEMA (+ a leading key
    column); ``glue`` applies default_glue per page first."""
    cols = {name: [] for name in
            ("key", "page", "seq", "top", "left", "width", "height",
             "family", "size", "text", "tags", "uris", "page_width",
             "page_height")}
    for page in pages:
        boxes = glue_page_boxes(page["boxes"]) if glue \
            else page["boxes"]
        for seq, b in enumerate(boxes):
            cols["key"].append(doc_key)
            cols["page"].append(page["number"])
            cols["seq"].append(seq)
            for f in ("top", "left", "width", "height",
                      "family", "size", "text", "tags", "uris"):
                cols[f].append(b.get(f, ""))
            cols["page_width"].append(page["width"])
            cols["page_height"].append(page["height"])
    return cols


def read_pdf2xml(paths, glue: bool = False, **read_kwargs):
    """Dataset source: one row per (glued) textbox of every pdf2xml
    file. One read task per file; stateless parse in map_batches."""
    import os

    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True,
                              **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        out = None
        for path, data in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            key = os.path.basename(path).rsplit(".", 1)[0]
            cols = pages_to_rows(key, parse_pdf2xml(bytes(data)),
                                 glue=glue)
            tbl = pa.table(
                {"key": pa.array(cols["key"], pa.string()),
                 **{f.name: pa.array(cols[f.name], f.type)
                    for f in BOX_SCHEMA}})
            out = tbl if out is None else pa.concat_tables([out, tbl])
        if out is None:
            return pa.schema(
                [("key", pa.string())] + list(BOX_SCHEMA)) \
                .empty_table()
        return out

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------
# PDFAnalyzer metrics (pdfanalyze.py:325-549) over bounded histograms
# ---------------------------------------------------------------------

HEADER_SIGNIFICANCE = 0.002   # pdfanalyze header_significance_threshold
FOOTER_SIGNIFICANCE = 0.002
STYLE_SIGNIFICANCE = 0.005
RIGHT_BINSIZE = 10


def margins_from_counts(left_counts, right_counts, top_counts,
                        bottom_counts, pagewidth, pageheight):
    """Counter dicts → the PDFAnalyzer margin metrics.

    - leftmargin: most common left edge below midpage
      (analyze_horizontal_margins, quantize=False ⇒ plain mode;
      ties break on the smaller coordinate for determinism);
    - rightmargin: right edges above midpage, quantized into
      ``ceil(val/10)·10`` bins; candidates = bins with count ≥ 0.8 ×
      the top bin (findmargin's most_common walk visits bins in
      descending count order, so exactly the ≥-threshold bins are
      collected), selected with max() (trunc_func=ceil);
    - topmargin/bottommargin: the header/footer walk — cumulative
      char-weighted counts from the page edge until > 0.2 % of all
      chars (analyze_vertical_margins).
    """
    midpage_x2 = pagewidth  # compare 2·edge vs pagewidth: stays int
    left = {k: v for k, v in left_counts.items()
            if 2 * k < midpage_x2}
    right = {k: v for k, v in right_counts.items()
             if 2 * k > midpage_x2}
    leftmargin = min(
        (k for k, v in left.items()
         if v == max(left.values())), default=0) if left else 0
    rightmargin = 0
    if right:
        bins: dict[int, int] = {}
        for val, n in right.items():
            b = -(-val // RIGHT_BINSIZE) * RIGHT_BINSIZE
            bins[b] = bins.get(b, 0) + n
        top = max(bins.values())
        # candidate rule: count*5 >= top*4  ⇔  count >= 0.8*top, int
        rightmargin = max(b for b, n in bins.items()
                          if 5 * n >= 4 * top)
    total = sum(top_counts.values())
    maxcount_num = total * 2  # 0.2% ⇔ charcount*1000 > total*2
    charcount = 0
    header = 0
    for i in range(pageheight):
        charcount += top_counts.get(i, 0)
        if charcount * 1000 > maxcount_num:
            header = i - 1
            break
    charcount = 0
    footer = pageheight
    for i in range(pageheight - 1, -1, -1):
        charcount += bottom_counts.get(i, 0)
        if charcount * 1000 > maxcount_num:
            footer = i + 1
            break
    return {"leftmargin": leftmargin, "rightmargin": rightmargin,
            "topmargin": header, "bottommargin": footer,
            "pagewidth": pagewidth, "pageheight": pageheight}


def _fontsize_key(family: str, size: int) -> tuple:
    weight = 2 if "Bold" in family else (1 if "Italic" in family
                                         else 0)
    return (size, weight)


def styles_from_counts(style_counts: dict) -> dict:
    """{(family, size): charcount} → role map (analyze_styles):
    default = most used (ties: smaller fontsize_key, then family);
    h1-h3 = styles strictly larger than default by fontsize_key with
    use > 0.5 % of chars, in descending fontsize_key order;
    footnoteref = smallest significant same-family style at ≤ half
    the default size."""
    if not style_counts:
        return {}
    top = max(style_counts.values())
    ds = min((k for k, v in style_counts.items() if v == top),
             key=lambda k: (_fontsize_key(*k), k[0]))
    out = {"default": ds}
    total = sum(style_counts.values())
    # significant ⇔ count*1000 > total*5 (0.5%), kept integer
    sig = [k for k, v in style_counts.items() if 1000 * v > 5 * total]
    large = sorted((k for k in sig
                    if _fontsize_key(*k) > _fontsize_key(*ds)),
                   key=lambda k: (_fontsize_key(*k), k[0]),
                   reverse=True)
    for role, style in zip(("h1", "h2", "h3"), large):
        out[role] = style
    fnrs = sorted((k for k in sig
                   if k[0] == ds[0] and 2 * k[1] <= ds[1]),
                  key=lambda k: (_fontsize_key(*k), k[0]))
    if fnrs:
        out["footnoteref"] = fnrs[0]
    return out


# ---------------------------------------------------------------------
# a REAL minimal PDF text extractor + deterministic writer
# ---------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


def _pdf_streams(data: bytes):
    """Yield every object's (dict_bytes, stream_bytes) — xref-free
    scan (valid for the linear files build_pdf writes and for most
    small single-generation PDFs)."""
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            return
        end = data.find(b"endobj", m.end())
        if end < 0:
            end = len(data)
        body = data[m.end():end]
        sm = _STREAM_RE.search(body)
        if sm:
            se = body.find(b"endstream", sm.end())
            yield body[:sm.start()], body[sm.end():se]
        else:
            yield body, None
        pos = end + 6


def _decode_stream(dict_bytes: bytes, stream: bytes) -> bytes:
    if b"FlateDecode" in dict_bytes:
        return zlib.decompress(stream)
    return stream


_STR_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _parse_literal(data: bytes, i: int):
    """( ... ) literal string with \\ escapes and balanced parens;
    returns (bytes, next_index)."""
    out = bytearray()
    depth = 1
    i += 1
    while i < len(data) and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in (b"\r", b"\n"):
                # line continuation: swallow the EOL (and a CRLF pair)
                i += 2
                if nxt == b"\r" and data[i:i + 1] == b"\n":
                    i += 1
                continue
            if nxt.isdigit():
                j = i + 1
                oct_ = b""
                while j < len(data) and data[j:j + 1].isdigit() \
                        and len(oct_) < 3:
                    oct_ += data[j:j + 1]
                    j += 1
                out.append(int(oct_, 8))
                i = j
                continue
            out += _STR_ESC.get(nxt, nxt)
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        out += c
        i += 1
    return bytes(out), i


def _tokenize_content(data: bytes):
    """Content-stream tokens: strings, hex strings, numbers, names,
    arrays (as nested lists of string/number tokens), operators."""
    i, n = 0, len(data)
    while i < n:
        c = data[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"(":
            s, i = _parse_literal(data, i)
            yield ("str", s)
        elif c == b"<" and data[i + 1:i + 2] != b"<":
            j = data.find(b">", i)
            hexs = re.sub(rb"\s", b"", data[i + 1:j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode()))
            i = j + 1
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            m = re.match(rb"/[^\s()<>\[\]/]*", data[i:])
            yield ("name", m.group(0))
            i += m.end()
        elif re.match(rb"[-+.\d]", c):
            m = re.match(rb"[-+]?\d*\.?\d+", data[i:])
            if not m:   # stray sign/dot — not a number
                i += 1
                continue
            yield ("num", float(m.group(0)))
            i += m.end()
        else:
            m = re.match(rb"[A-Za-z'\"*]+", data[i:])
            if not m:
                i += 1
                continue
            yield ("op", m.group(0))
            i += m.end()


def extract_pdf_text(data: bytes):
    """Real %PDF bytes → list of (page, x, y, size, text) show
    operations, in content order. Supports the BT/ET text-object
    subset: Tf (size), Td/TD (relative moves), Tm (absolute matrix),
    T* (next line via TD-set leading), Tj / TJ / ' (show). Raises
    ValueError on non-PDF input (strict contract, like the
    multimodal decoders)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    out = []
    pageno = 0
    for dict_bytes, stream in _pdf_streams(data):
        if stream is None:
            continue
        content = _decode_stream(dict_bytes, stream)
        if b"BT" not in content:
            continue
        pageno += 1
        x = y = 0.0
        size = 0.0
        leading = 0.0
        stack: list = []
        arr: list | None = None
        for kind, val in _tokenize_content(content):
            if kind == "arr_open":
                arr = []
                continue
            if kind == "arr_close":
                stack.append(("arr", arr))
                arr = None
                continue
            if kind in ("num", "str", "name"):
                (arr if arr is not None else stack).append(
                    (kind, val))
                continue
            op = val
            if op == b"Tf" and len(stack) >= 1:
                size = float(stack[-1][1])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                x += float(stack[-2][1])
                y += float(stack[-1][1])
                if op == b"TD":
                    leading = -float(stack[-1][1])
            elif op == b"Tm" and len(stack) >= 6:
                x = float(stack[-2][1])
                y = float(stack[-1][1])
            elif op == b"TL" and len(stack) >= 1:
                leading = float(stack[-1][1])
            elif op in (b"T*", b"'"):
                y -= leading
            if op in (b"Tj", b"'") and stack \
                    and stack[-1][0] == "str":
                out.append((pageno, x, y, size,
                            stack[-1][1].decode("latin-1")))
            elif op == b"TJ" and stack and stack[-1][0] == "arr":
                text = "".join(v.decode("latin-1")
                               for k, v in stack[-1][1]
                               if k == "str")
                out.append((pageno, x, y, size, text))
            if kind == "op":
                stack = []
    return out


def _esc_pdf_string(s: str) -> bytes:
    return (s.replace("\\", r"\\").replace("(", r"\(")
            .replace(")", r"\)").encode("latin-1", "replace"))


def build_pdf(pages, compress: bool = True) -> bytes:
    """Deterministic minimal PDF writer: ``pages`` is a list of
    [(x, y, size, text), ...] lists. Produces a valid single-font
    PDF (catalog → pages → page+contents, optional FlateDecode,
    correct xref) that :func:`extract_pdf_text` round-trips exactly
    — and that external PDF tools can open."""
    objs: list[bytes] = []

    def obj(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = obj(b"<< /Type /Font /Subtype /Type1 "
               b"/BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for shows in pages:
        parts = [b"BT"]
        for x, y, size, text in shows:
            parts.append(b"/F1 %g Tf" % size)
            parts.append(b"1 0 0 1 %g %g Tm" % (x, y))
            parts.append(b"(" + _esc_pdf_string(text) + b") Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            z = zlib.compress(content)
            content_ids.append(obj(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(z) + z + b"\nendstream"))
        else:
            content_ids.append(obj(
                b"<< /Length %d >>\nstream\n" % len(content)
                + content + b"\nendstream"))
    pages_id = len(objs) + len(pages) + 1
    for cid in content_ids:
        page_ids.append(obj(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (pages_id, font, cid)))
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert obj(b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (kids, len(page_ids))) == pages_id
    catalog = obj(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, catalog, xref))
    return bytes(buf)


# ---------------------------------------------------------------------
# pagination: physical page → printed page number
# (pdfanalyze.py:114-236 paginate / guess_pagenumber*)
# ---------------------------------------------------------------------

PAGINATION_MIN_SIZE = 6   # pdfanalyze.PDFAnalyzer.pagination_min_size

_ARABIC_RE = re.compile(r"[0-9]+$")


def guess_pagenumber_boxes(boxes):
    """The last 5 + first 5 boxes of a page, font size ≥ the
    pagination minimum (filters footnote markers) —
    guess_pagenumber_boxes, pdfanalyze.py:211-216."""
    return [b for b in list(reversed(boxes))[:5] + list(boxes)[:5]
            if b["size"] >= PAGINATION_MIN_SIZE]


def guess_pagenumber_candidates(boxes, page_number,
                                probable_pagenumber):
    """pdfanalyze.py:189-209: strict-arabic tokens (the [0-9]+$ rule
    — .isdigit() matches too much) with the <1900 year guard; roman
    tokens only on the first physical page or while the expected
    number is itself roman."""
    from ..functions import is_roman

    out = []
    for box in guess_pagenumber_boxes(boxes):
        el = box["text"].strip()
        if _ARABIC_RE.match(el) and (
                int(el) < 1900
                or (isinstance(probable_pagenumber, int)
                    and probable_pagenumber >= 1900)):
            out.append(int(el))
        elif ((page_number == 1 or is_roman(probable_pagenumber))
              and is_roman(el)):
            out.append(el)
    return out


def guess_pagenumber_select(candidates, probable_pagenumber):
    """pdfanalyze.py:219-236: the expected number itself wins when
    present; else the smallest candidate ≥ expected; a mixed
    roman/arabic comparison falls back to the first candidate; no
    suitable candidate → None."""
    if probable_pagenumber in candidates:
        return probable_pagenumber
    try:
        return next(c for c in sorted(candidates)
                    if c >= probable_pagenumber)
    except TypeError:
        return candidates[0]
    except StopIteration:
        return None


def _increment(v, amount=1):
    """util.increment (ferenda/util.py:712-722): arabic ints add;
    roman strings increment as romans, preserving case."""
    from ..functions import from_roman, is_roman, to_roman

    if is_roman(v):
        lower = v.islower()
        s = to_roman(from_roman(v) + amount)
        return s.lower() if lower else s
    return v + amount


def paginate_pages(pages):
    """[(page_number, boxes)] → [(page_number, printed)] — the core
    walk of pdfanalyze.paginate (pdfanalyze.py:114-180): carry an
    expected printed number forward (incremented by the physical
    page skip), let each page's guess override it, keep the
    expectation when a page offers no guess. (The reference's
    double-misguess repair state machine is driven by logging
    concerns; the mapping it produces for consistently paginated
    documents is this walk's.)"""
    out = []
    current = 0
    last_physical = 0
    for number, boxes in pages:
        current = _increment(current, number - last_physical)
        last_physical = number
        guess = None
        cands = guess_pagenumber_candidates(boxes, number, current)
        if cands:
            guess = guess_pagenumber_select(cands, current)
        if guess is not None:
            current = guess
        out.append((number, current))
    return out
