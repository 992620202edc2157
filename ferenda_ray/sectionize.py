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


def build_w3c_parser() -> "FSMParser":
    """The W3C HTML sectionizer expressed as a configuration of the
    general FSM framework (ferenda_ray.fsm) — recognizers + transition
    table only, no bespoke parsing code. State-filtered semantics:
    recognizers without a transition from the current state are never
    tried (a depth-2 header in "body" state falls through to plain
    content), POP outcomes do not consume the chunk (a depth-1 header
    cascades out of any nesting depth), and preamble sections end on
    hr / new preamble / depth-1 header without consuming it."""
    from .fsm import FSMParser

    p = FSMParser("body")

    def cls(parser, chunk):
        # memo lives ON the parser (cleared each parse) so one parser
        # instance is reusable across documents with no stale-id risk
        k = id(chunk)
        memo = parser.chunk_cache
        if k not in memo:
            memo[k] = _classify(chunk)
        return memo[k]

    def depth_is(d):
        return lambda parser, c: cls(parser, c)[0] and cls(parser, c)[2] == d

    p.set_recognizers(
        ("section", depth_is(1)),
        ("subsection", depth_is(2)),
        ("subsubsection", depth_is(3)),
        ("preamble", lambda parser, c: cls(parser, c)[4]),
        ("hr", lambda parser, c: cls(parser, c)[5]),
    )
    p.default_content = lambda parser, chunk, row, ctx: as_plaintext(chunk)

    def make(kind):
        def ctor(parser, chunk, parent, ctx):
            _h, ordinal, _d, title, _p, _hr = cls(parser, chunk)
            return parser.new_row(parent["url"], kind,
                                  parent["url"] + "#S" + ordinal,
                                  ordinal, title, parent["section_uri"])
        return ctor

    def make_preamble(parser, chunk, parent, ctx):
        ctx["ps"] = ctx.get("ps", 0) + 1
        return parser.new_row(parent["url"], "preamble",
                              parent["url"] + "#PS" + str(ctx["ps"]),
                              None, as_plaintext(chunk),
                              parent["section_uri"])

    POP = FSMParser.POP
    p.set_transitions({
        ("body", "section"): ("push", make("section"), "section"),
        ("body", "preamble"): ("push", make_preamble, "preamble"),
        ("section", "section"): POP,
        ("section", "subsection"): ("push", make("subsection"), "subsection"),
        ("subsection", "section"): POP,
        ("subsection", "subsection"): POP,
        ("subsection", "subsubsection"):
            ("push", make("subsubsection"), "subsubsection"),
        ("subsubsection", "section"): POP,
        ("subsubsection", "subsection"): POP,
        ("subsubsection", "subsubsection"): POP,
        ("preamble", "hr"): POP,
        ("preamble", "preamble"): POP,
        ("preamble", "section"): POP,
    })
    return p


_W3C_PARSER = None


def sectionize(body: Elem, url: str) -> list[dict]:
    """Flatten one document body into section rows (document order).

    The first row is always the ``body`` row (section_uri == url);
    its ``text`` holds the joined text of only the chunks that are
    direct body content (not captured by any section), matching the
    container-text rule used for every other row.

    One module-level parser instance serves every document (parse()
    resets all per-document state) — within a Ray worker process,
    map_batches tasks run sequentially, so this is safe and avoids
    rebuilding the grammar closure per page.
    """
    global _W3C_PARSER
    if _W3C_PARSER is None:
        _W3C_PARSER = build_w3c_parser()
    return _W3C_PARSER.parse(list(body.children), url)
