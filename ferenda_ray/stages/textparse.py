"""Plain-text document parsing: paragraph reader + RFC-style FSM
sectionizer.

Reference semantics reproduced:

- ``TextReader`` paragraph iteration (ferenda/textreader.py:11-352):
  a plain-text document is consumed as double-newline-separated
  paragraph chunks.
- The RFC plain-text FSM (sources/tech/rfc.py:133-428): chunks are
  classified as section headers (``analyze_sectionstart`` ordinal
  rule, same regex as the HTML sectionizer), preformatted blocks
  (indented lines), or paragraphs; headers of depth 1/2/3 open
  section/subsection/subsubsection containers with the same
  state-filtered transition semantics as sectionize.py (a depth-2
  header in body state is content, etc.).

Output rows use the same sections schema as the HTML path — the two
sectionizers are interchangeable upstream of the triple emitter.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions import normalize_space
from ..sectionize import analyze_sectionstart

_PAGEBREAK = re.compile(r"\f")


def paragraphs(text: str) -> list[str]:
    """Double-newline-separated chunks (TextReader.readparagraph
    semantics); form feeds (page breaks) are chunk separators too and
    are dropped (rfc.py cleanup_body:520-535 removes Pagebreak)."""
    text = _PAGEBREAK.sub("\n\n", text)
    return [c for c in (chunk.strip("\n") for chunk in text.split("\n\n"))
            if c.strip()]


def _is_preformatted(chunk: str) -> bool:
    """A chunk whose every line is indented ≥ 3 spaces is preformatted
    (the RFC parser's is_preformatted heuristic shape)."""
    lines = [ln for ln in chunk.split("\n") if ln.strip()]
    return bool(lines) and all(ln.startswith("   ") for ln in lines)


def _classify_text(chunk: str):
    """(ordinal, depth, title): a header chunk is a single line
    starting with an ordinal."""
    if "\n" in chunk:
        return (None, 0, None)
    ordinal, title = analyze_sectionstart(chunk.strip())
    depth = len([s for s in ordinal.split(".") if s]) if ordinal else 0
    return (ordinal, depth, title)


def build_rfc_text_parser() -> "FSMParser":
    """The RFC plain-text sectionizer as a configuration of the
    general FSM framework (ferenda_ray.fsm) — same states and
    transition outcomes as the W3C HTML grammar, plus a preformatted
    recognizer whose content rule preserves raw whitespace."""
    from ..fsm import FSMParser

    p = FSMParser("body")

    def cls(parser, chunk):
        k = id(chunk)
        memo = parser.chunk_cache
        if k not in memo:
            memo[k] = _classify_text(chunk)
        return memo[k]

    def depth_is(d):
        return (lambda parser, c:
                cls(parser, c)[0] is not None and cls(parser, c)[1] == d)

    p.set_recognizers(
        ("section", depth_is(1)),
        ("subsection", depth_is(2)),
        ("subsubsection", depth_is(3)),
        ("pre", lambda parser, c: _is_preformatted(c)),
    )
    p.default_content = (
        lambda parser, chunk, row, ctx: normalize_space(chunk))
    raw = ("content", lambda parser, chunk, row, ctx: chunk)

    def make(kind):
        def ctor(parser, chunk, parent, ctx):
            ordinal, _d, title = cls(parser, chunk)
            return parser.new_row(parent["url"], kind,
                                  parent["url"] + "#S" + ordinal,
                                  ordinal, title, parent["section_uri"])
        return ctor

    POP = FSMParser.POP
    p.set_transitions({
        ("body", "section"): ("push", make("section"), "section"),
        ("body", "pre"): raw,
        ("section", "section"): POP,
        ("section", "subsection"): ("push", make("subsection"), "subsection"),
        ("section", "pre"): raw,
        ("subsection", "section"): POP,
        ("subsection", "subsection"): POP,
        ("subsection", "subsubsection"):
            ("push", make("subsubsection"), "subsubsection"),
        ("subsection", "pre"): raw,
        ("subsubsection", "section"): POP,
        ("subsubsection", "subsection"): POP,
        ("subsubsection", "subsubsection"): POP,
        ("subsubsection", "pre"): raw,
    })
    return p


_RFC_PARSER = None


def sectionize_text(text: str, url: str) -> list[dict]:
    """Plain text → section rows (same adjacency-list schema as the
    HTML sectionizer). One module-level parser serves every document
    (parse() resets per-document state)."""
    global _RFC_PARSER
    if _RFC_PARSER is None:
        _RFC_PARSER = build_rfc_text_parser()
    return _RFC_PARSER.parse(paragraphs(text), url)


def parse_text_batch(batch: pa.Table, url_col: str = "url",
                     text_col: str = "text") -> pa.Table:
    """map_batches UDF: plain-text docs → sections rows (error rows as
    data, mirroring parse_pages_batch)."""
    urls = batch[url_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out = {k: [] for k in ("url", "section_uri", "kind", "ordinal", "title",
                           "parent_uri", "text", "position", "error")}
    for url, text in zip(urls, texts):
        try:
            for r in sectionize_text(text or "", url):
                out["url"].append(url)
                out["section_uri"].append(r["section_uri"])
                out["kind"].append(r["kind"])
                out["ordinal"].append(r["ordinal"])
                out["title"].append(r["title"])
                out["parent_uri"].append(r["parent_uri"])
                out["text"].append(r["text"])
                out["position"].append(r["position"])
                out["error"].append(None)
        except Exception as exc:  # pragma: no cover - defensive
            out["url"].append(url)
            out["section_uri"].append(url)
            out["kind"].append("body")
            out["ordinal"].append(None)
            out["title"].append(None)
            out["parent_uri"].append(None)
            out["text"].append(None)
            out["position"].append(0)
            out["error"].append("%s: %s" % (type(exc).__name__, exc))
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "section_uri": pa.array(out["section_uri"], pa.string()),
        "kind": pa.array(out["kind"], pa.string()),
        "ordinal": pa.array(out["ordinal"], pa.string()),
        "title": pa.array(out["title"], pa.string()),
        "parent_uri": pa.array(out["parent_uri"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "position": pa.array(out["position"], pa.int32()),
        "error": pa.array(out["error"], pa.string()),
    })
