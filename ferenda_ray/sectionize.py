"""Heading-driven sectionizer with the reference's W3C FSM semantics.

Re-implements the decision procedure of the reference's FSM parser for
HTML documents (ferenda/sources/tech/w3c.py:84-207 over
ferenda/fsmparser.py:13-239) as a direct recursive descent — same
classification, same transition outcomes, no FSM machinery. The
semantics being replicated:

- Chunks are the top-level children of <body>; headers are h1–h4
  (w3c.py:86-92).
- ``analyze_sectionstart`` (w3c.py:167-177): a header starting
  ``^(\\d[\\.\\d]*) +(.*[^.])$`` yields (ordinal rstripped of '.',
  title); ordinal segment count 1/2/3 → section/subsection/
  subsubsection.
- Preamble sections: headers whose lowercased text is one of
  "abstract", "status of this document", "table of contents",
  "appendices" (w3c.py:94-99); ended by any <hr>, a new preamble
  header, or a depth-1 section header (w3c.py:188-191) — the ending
  chunk is *not* consumed by the preamble.
- FSM transition-table filtering (fsmparser.py:120-149): only
  recognizers with a transition from the current state are tried, so
  e.g. a depth-2 header seen in "body" state is plain content, and a
  depth-3 header seen in "section" state is plain content.
- Fragment URIs: Section/Subsection/Subsubsection →
  ``url + "#S" + ordinal`` (elements/elements.py:622-623);
  PreambleSection → ``url + "#PS" + n`` with a per-document 1-based
  counter (sources/tech/rfc.py:51-58).

Output: a flat list of section rows (adjacency list via parent_uri) —
Arrow has no recursive types, so the tree is encoded as rows with
(url, section_uri, kind, ordinal, title, parent_uri, text, position).
Section text is the ``as_plaintext`` join of the section's *own*
content chunks (nested subsections are their own rows — mirrors the
per-@about-resource extraction of documentrepository.py:2148-2218).
"""

from __future__ import annotations

import re

from .htmltree import Elem, as_plaintext

_SECTIONSTART = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$")
_PREAMBLE_TITLES = frozenset(
    ("abstract", "status of this document", "table of contents", "appendices")
)
_HEADER_TAGS = frozenset(("h1", "h2", "h3", "h4"))


def analyze_sectionstart(text: str):
    """'1.2.3. This is a subsubsection' → ('1.2.3', 'This is a subsubsection');
    no match → (None, text). Reference: w3c.py:167-177."""
    m = _SECTIONSTART.match(text)
    if m:
        return (m.group(1).rstrip("."), m.group(2))
    return (None, text)


def _classify(chunk):
    """(is_header, ordinal, depth, title_text, is_preamble, is_hr)."""
    if isinstance(chunk, str):
        return (False, None, 0, None, False, False)
    if chunk.tag == "hr":
        return (False, None, 0, None, False, True)
    if chunk.tag not in _HEADER_TAGS:
        return (False, None, 0, None, False, False)
    text = as_plaintext(chunk)
    ordinal, title = analyze_sectionstart(text)
    depth = len([seg for seg in ordinal.split(".") if seg]) if ordinal else 0
    return (True, ordinal, depth, title, text.lower() in _PREAMBLE_TITLES, False)


def sectionize(body: Elem, url: str) -> list[dict]:
    """Flatten one document body into section rows (document order).

    The first row is always the ``body`` row (section_uri == url);
    its ``text`` holds the joined text of only the chunks that are
    direct body content (not captured by any section), matching the
    container-text rule used for every other row.
    """
    chunks = list(body.children)
    cls = [_classify(c) for c in chunks]
    rows: list[dict] = []
    pos = 0

    def new_row(kind, uri, ordinal, title, parent_uri):
        nonlocal pos
        row = {
            "url": url,
            "section_uri": uri,
            "kind": kind,
            "ordinal": ordinal,
            "title": title,
            "parent_uri": parent_uri,
            "text_parts": [],
            "position": pos,
        }
        pos += 1
        rows.append(row)
        return row

    body_row = new_row("body", url, None, None, None)
    ps_counter = 0
    i = 0
    n = len(chunks)

    def content(row, idx):
        txt = as_plaintext(chunks[idx])
        if txt:
            row["text_parts"].append(txt)

    def parse_container(row, level, start):
        """Consume chunks into `row` until a pop condition; return next index.

        level: 1=section, 2=subsection, 3=subsubsection.
        Pop on any header of depth 1..level; recurse on depth level+1
        (only when level < 3). Everything else — including preamble
        headers and deeper-than-level+1 headers — is content, exactly
        as the FSM's applicable-recognizer filtering dictates.
        """
        i = start
        while i < n:
            is_hdr, ordinal, depth, title, _pre, _hr = cls[i]
            if is_hdr and 1 <= depth <= level:
                return i
            if is_hdr and depth == level + 1 and level < 3:
                sub_kind = ("section", "subsection", "subsubsection")[level]
                sub = new_row(
                    sub_kind, url + "#S" + ordinal, ordinal, title,
                    row["section_uri"],
                )
                i = parse_container(sub, level + 1, i + 1)
                continue
            content(row, i)
            i += 1
        return i

    def parse_preamble(row, start):
        i = start
        while i < n:
            is_hdr, _ordinal, depth, _title, pre, hr = cls[i]
            if hr or (is_hdr and (pre or depth == 1)):
                return i  # pop; ending chunk NOT consumed
            content(row, i)
            i += 1
        return i

    while i < n:
        is_hdr, ordinal, depth, title, pre, _hr = cls[i]
        if is_hdr and depth == 1:
            sec = new_row("section", url + "#S" + ordinal, ordinal, title, url)
            i = parse_container(sec, 1, i + 1)
        elif is_hdr and pre:
            ps_counter += 1
            ps_title = as_plaintext(chunks[i])
            ps = new_row(
                "preamble", url + "#PS" + str(ps_counter), None, ps_title, url
            )
            i = parse_preamble(ps, i + 1)
        else:
            content(body_row, i)
            i += 1

    for row in rows:
        row["text"] = " ".join(filter(None, row.pop("text_parts")))
    return rows
