"""HTML → element-tree → plain text, with reference-exact semantics.

This module re-implements, on the Python stdlib ``html.parser`` (no
bs4/lxml in this environment), the three reference functions whose
composition defines the **byte-identical extracted text per url**
invariant:

- ``elements_from_soup`` (ferenda/elements/html.py:23-71): drop
  ``script/style/font/map/center`` subtrees, drop tags not in the
  HTML tagmap (html.py:558-645) *with their whole subtree*, drop
  comments and pure-whitespace text nodes, keep only the attributes
  ``class,id,dir,lang,src,href,name,alt`` (list-valued attrs joined
  with a space).
- ``CompoundElement.as_plaintext`` (ferenda/elements/elements.py:249-261):
  normalize whitespace per string child, recurse into element
  children, join the non-empty results with a single space.
- ``Preformatted.as_plaintext`` (elements.py:685-691): raw ``"".join``
  of children — no whitespace normalization inside ``<pre>``.

The tree is a plain ``Elem`` (slots) object — cheap to build per row
inside a ``map_batches`` UDF; it never crosses a block boundary.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .functions import normalize_space

# Tag set accepted by the reference's tagmap
# (ferenda/elements/html.py:558-645). Anything else is dropped with its
# subtree ("Can't render X" → return None in the reference).
KNOWN_TAGS = frozenset(
    """html head title body p h1 h2 h3 h4 h5 h6 ul ol li pre dl dt dd div
    blockquote form hr table fieldset address tt i b u big small em strong
    dfn code samp kbd var cite abbr acronym a img object br q sub sup span
    bdo input select textarea label button caption thead tfoot tbody
    colgroup col tr th td ins del article aside bdi details dialog summary
    figure figcaption footer header hgroup mark meter nav progress ruby rt
    rp section time wbr""".split()
)

#: dropped with their entire subtree (ferenda/elements/html.py:24)
REMOVE_TAGS = frozenset(("script", "style", "font", "map", "center"))

#: attributes preserved on kept elements (ferenda/elements/html.py:25)
KEEP_ATTRIBUTES = ("class", "id", "dir", "lang", "src", "href", "name", "alt")

#: HTML void elements — no closing tag expected
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Elem:
    """One element node: tag, filtered attrs, children (str | Elem)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []

    def __repr__(self):  # pragma: no cover - debug aid
        return "<%s %r %d children>" % (self.tag, self.attrs, len(self.children))

    def find(self, tag: str):
        """Depth-first search for the first descendant with ``tag``."""
        if self.tag == tag:
            return self
        for c in self.children:
            if isinstance(c, Elem):
                hit = c.find(tag)
                if hit is not None:
                    return hit
        return None


class _TreeBuilder(HTMLParser):
    """Builds the filtered Elem tree in a single pass.

    Filtering (remove_tags / unknown tags / comments / whitespace-only
    text) happens during parsing: a removed element suppresses its whole
    subtree via a skip counter, exactly matching the reference's
    "return None from elements_from_soup" behaviour.
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Elem("#root")
        self._stack = [self.root]
        # (tag, depth) skip record: >0 → we are inside a dropped subtree
        self._skip: list[str] = []

    # -- tag handling -----------------------------------------------

    def handle_starttag(self, tag, attrs):
        if self._skip:
            if tag not in _VOID:
                self._skip.append(tag)
            return
        if tag in REMOVE_TAGS or tag not in KNOWN_TAGS:
            if tag not in _VOID:
                self._skip.append(tag)
            return
        kept = {}
        for k, v in attrs:
            if k in KEEP_ATTRIBUTES:
                kept[k] = v if v is not None else ""
        el = Elem(tag, kept)
        self._stack[-1].children.append(el)
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        if self._skip:
            return
        if tag in REMOVE_TAGS or tag not in KNOWN_TAGS:
            return
        kept = {}
        for k, v in attrs:
            if k in KEEP_ATTRIBUTES:
                kept[k] = v if v is not None else ""
        self._stack[-1].children.append(Elem(tag, kept))

    def handle_endtag(self, tag):
        if self._skip:
            # close the innermost matching skipped tag, tolerate strays
            for i in range(len(self._skip) - 1, -1, -1):
                if self._skip[i] == tag:
                    del self._skip[i:]
                    return
            return
        if tag in _VOID:
            return
        # pop to the matching open tag; ignore unmatched end tags
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    # -- text / comments --------------------------------------------

    def handle_data(self, data):
        if self._skip:
            return
        # ignore pure whitespace between tags (elements/html.py:63-65)
        if data.strip() != "":
            parent = self._stack[-1]
            # merge adjacent text nodes (html.parser can split on charrefs
            # even with convert_charrefs when buffers flush mid-text)
            if parent.children and isinstance(parent.children[-1], str):
                parent.children[-1] += data
            else:
                parent.children.append(data)

    def handle_comment(self, data):
        pass  # dropped (elements/html.py:59-61)


def parse_html(html) -> Elem:
    """Parse HTML (bytes or str) into a filtered ``Elem`` tree.

    Bytes are decoded as UTF-8 (errors replaced) — the synthesized
    corpus is UTF-8; a production ingest would sniff ``<meta charset>``.
    Returns the synthetic ``#root`` element; use ``root.find("body")``.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


def as_plaintext(el) -> str:
    """Element → plain text, reference rule.

    ``CompoundElement.as_plaintext`` (elements/elements.py:249-261):
    normalize each string child, recurse into elements, join non-empty
    parts with one space. ``<pre>`` (Preformatted, elements.py:685-691)
    raw-joins instead — no normalization, no separator.
    """
    if isinstance(el, str):
        return normalize_space(el)
    if el.tag == "pre":
        parts = []
        for c in el.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                parts.append(as_plaintext(c))
        return "".join(parts)
    res = []
    for c in el.children:
        if isinstance(c, str):
            res.append(normalize_space(c))
        else:
            res.append(as_plaintext(c))
    return " ".join(filter(None, res))


def extract_text(html) -> str:
    """Full pipeline for one page: HTML → body element → plain text.

    The reference parses only the content selected by
    ``parse_content_selector`` (default ``"body"``,
    documentrepository.py:327-335) — so the <head>/<title> never
    contributes to extracted body text.
    """
    root = parse_html(html)
    body = root.find("body")
    if body is None:
        return as_plaintext(root)
    return as_plaintext(body)


def doc_lang(root: Elem, default: str = "en") -> str:
    """<html lang> (xml:lang is not in the kept attribute set; the
    reference checks xml:lang then lang, documentrepository.py:1299-1306
    — our keep_attributes only carries ``lang``)."""
    html_el = root.find("html")
    if html_el is not None and html_el.attrs.get("lang"):
        return html_el.attrs["lang"]
    return default


def doc_title(root: Elem) -> str | None:
    """<title> string, reference parse_metadata_from_soup
    (documentrepository.py:1307-1311)."""
    t = root.find("title")
    if t is None:
        return None
    txt = as_plaintext(t)
    return txt if txt else None
