"""EBNF → grammar-spec converter for the reference's ``res/ebnf``
production files.

The reference loads SimpleParse-dialect EBNF grammar files at runtime
(sources/legal/se/legalref.py:94-186: ``load_ebnf`` reads
``res/ebnf/*.ebnf`` and composes productions into the citation
parser). This repo's grammar files are regex-based JSON
(:mod:`ferenda_ray.grammarfile`); this module lets a migrating user's
actual ``.ebnf`` files load directly by compiling the production
graph to regexes and emitting a ``load_grammars``-compatible spec.

Supported SimpleParse constructs (everything the reference's
citation grammars use):

- ``Name ::= expression`` productions, ``#`` comments, a
  ``# -*- coding: ... -*-`` first-line declaration (the files are
  windows-1252 / iso-8859-1);
- sequence ``a, b`` and ordered alternation ``a / b`` with
  SimpleParse precedence — FirstOf binds tighter than sequence
  (``a, b / c, d`` ≡ ``a, (b / c), d``, the fo_group/seq_group
  nesting of simpleparse's own bootstrap grammar);
- string literals ``'x'`` / ``"x"``, case-insensitive literals
  ``c"x"`` (→ ``(?i:x)``), char classes ``[a-z]`` (with ranges,
  backslash escapes and a leading literal ``]``), grouping ``(...)``;
- postfix ``?`` ``+`` ``*``; prefix ``?`` (lookahead → ``(?=...)``),
  prefix ``?-`` (negative lookahead → ``(?!...)``) and prefix ``-``
  (negation — supported for char classes, single chars, char-level
  productions and alternations thereof → one negated class; the
  general "anything but this expression" form raises
  :class:`UnsupportedEBNF`, matching how rarely the reference uses
  it outside char-level productions).

All nine of the reference's shipped citation .ebnf files parse under
this subset (pinned by tests/test_ebnf.py).

Productions expand by inline substitution, so the grammar must be
non-recursive (citation grammars are regular — the reference's are);
recursion raises :class:`UnsupportedEBNF`. Named productions listed
in ``captures`` become ``(?P<Name>...)`` groups, which
``grammarfile`` bindings reference as ``{"group": "Name"}``.

Semantics caveat (documented, inherent to the re-expression): regex
alternation backtracks where SimpleParse's ordered choice commits;
for the citation-shaped grammars converted here the match sets
coincide (pinned by tests against the reference's own files).
"""

from __future__ import annotations

import re

_PROD_RE = re.compile(r"^(\w+)\s*::=", re.M)
_CODING_RE = re.compile(rb"-\*-\s*coding:\s*([-\w.]+)\s*-\*-")


class UnsupportedEBNF(ValueError):
    """Construct outside the supported SimpleParse subset."""


# ---------------------------------------------------------------------
# tokenizer + recursive-descent parser for one production body
# ---------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<lit>c?'(?:[^'\\]|\\.)*'|c?"(?:[^"\\]|\\.)*")   # c"..." = casefold
  | (?P<cls>\[\]?(?:[^\]\\]|\\.)*\])   # leading ] is a literal member
  | (?P<name>\w+)
  | (?P<op>::=|[(),/?*+-])
""", re.X)


def _tokenize(body: str):
    toks = []
    pos = 0
    while pos < len(body):
        m = _TOKEN_RE.match(body, pos)
        if not m:
            raise UnsupportedEBNF("cannot tokenize at %r" % body[pos:pos + 20])
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        toks.append((m.lastgroup, m.group(0)))
    return toks


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # seq := alt (',' alt)*      (sequence is the OUTER level)
    # alt := term ('/' term)*    (FirstOf binds tighter, simpleparse)
    def parse(self):
        node = self._seq()
        if self.i != len(self.toks):
            raise UnsupportedEBNF("trailing tokens: %r" % (self.toks[self.i:],))
        return node

    def _seq(self):
        terms = [self._alt()]
        while self.peek() == ("op", ","):
            self.take()
            terms.append(self._alt())
        return terms[0] if len(terms) == 1 else ("seq", terms)

    def _alt(self):
        alts = [self._term()]
        while self.peek() == ("op", "/"):
            self.take()
            alts.append(self._term())
        return alts[0] if len(alts) == 1 else ("alt", alts)

    def _term(self):
        kind, val = self.peek()
        neg = look = neglook = False
        if (kind, val) == ("op", "-"):
            self.take()
            neg = True
        elif (kind, val) == ("op", "?"):
            self.take()
            if self.peek() == ("op", "-"):  # ?-x: negative lookahead
                self.take()
                neglook = True
            else:
                look = True
        node = self._atom()
        while self.peek()[0] == "op" and self.peek()[1] in "?*+":
            node = ("rep", node, self.take()[1])
        if neg:
            node = ("neg", node)
        if look:
            node = ("look", node)
        if neglook:
            node = ("neglook", node)
        return node

    def _atom(self):
        kind, val = self.take()
        if kind == "lit":
            if val[0] == "c":  # simpleparse case-insensitive literal
                return ("ilit", _unescape(val[2:-1]))
            return ("lit", _unescape(val[1:-1]))
        if kind == "cls":
            return ("cls", val[1:-1])
        if kind == "name":
            return ("name", val)
        if (kind, val) == ("op", "("):
            node = self._seq()
            if self.take() != ("op", ")"):
                raise UnsupportedEBNF("unbalanced parens")
            return node
        raise UnsupportedEBNF("unexpected token %r" % ((kind, val),))


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


# ---------------------------------------------------------------------
# file parsing
# ---------------------------------------------------------------------

def _strip_comments(text: str) -> str:
    # '#' starts a comment unless inside a literal or char class.
    # Escapes are honored, and quote chars INSIDE a char class (e.g.
    # ["'] ) do not open strings — class state takes precedence.
    out = []
    for line in text.split("\n"):
        cut = len(line)
        quote = None
        in_class = False
        class_start = False
        esc = False
        for i, ch in enumerate(line):
            if esc:
                esc = False
                continue
            if ch == "\\":
                esc = True
                continue
            if quote:
                if ch == quote:
                    quote = None
                continue
            if in_class:
                if ch == "]" and not class_start:
                    in_class = False
                class_start = False
                continue
            if ch in "'\"":
                quote = ch
            elif ch == "[":
                in_class = True
                class_start = True  # leading ] is a literal member
            elif ch == "#":
                cut = i
                break
        out.append(line[:cut])
    return "\n".join(out)


def read_ebnf_text(path: str) -> str:
    """Read an .ebnf file honoring its ``-*- coding: ... -*-`` line
    (the reference's files are windows-1252 / iso-8859-1)."""
    with open(path, "rb") as f:
        raw = f.read()
    m = _CODING_RE.search(raw[:200])
    enc = m.group(1).decode("ascii") if m else "iso-8859-1"
    return raw.decode(enc)


def parse_ebnf(text: str) -> dict:
    """Parse EBNF source into ``{production_name: ast_node}``. Later
    definitions of the same name override earlier ones (the
    reference's sequential ``load_ebnf`` merge semantics)."""
    text = _strip_comments(text)
    prods = {}
    matches = list(_PROD_RE.finditer(text))
    for j, m in enumerate(matches):
        body = text[m.end():
                    matches[j + 1].start() if j + 1 < len(matches)
                    else len(text)].strip()
        if not body:
            raise UnsupportedEBNF("empty production %r" % m.group(1))
        prods[m.group(1)] = _Parser(_tokenize(body)).parse()
    if not prods:
        raise UnsupportedEBNF("no productions found")
    return prods


def load_ebnf_productions(*paths) -> dict:
    """Parse and merge several .ebnf files in order (base grammar
    first, like legalref.py loads base.ebnf before each family)."""
    prods: dict = {}
    for p in paths:
        prods.update(parse_ebnf(read_ebnf_text(p)))
    return prods


# ---------------------------------------------------------------------
# regex compilation
# ---------------------------------------------------------------------

def _single_chars(node, prods, depth: int = 0):
    """The set-of-chars form of a node, for negation merging; None if
    the node is not a char-level expression. Resolves production
    names (``word ::= [...]+``) and strips ``+``/``*`` repetition —
    SimpleParse ``-x`` consumes ONE item where ``x`` fails to match,
    which for char-level x is exactly the negated class."""
    if depth > 16:
        return None
    k = node[0]
    if k == "cls":
        return node[1]
    if k == "lit" and len(node[1]) == 1:
        return re.escape(node[1])
    if k == "rep" and node[2] in "+*":
        return _single_chars(node[1], prods, depth + 1)
    if k == "name":
        inner = prods.get(node[1])
        return None if inner is None \
            else _single_chars(inner, prods, depth + 1)
    if k == "alt":
        parts = [_single_chars(n, prods, depth + 1) for n in node[1]]
        if all(p is not None for p in parts):
            # escape edge chars so concatenation cannot create
            # accidental ranges ('a-' + 'z' must not become a-z) or
            # a class-negation marker ('^' first)
            safe = []
            for p in parts:
                if p.endswith("-") and not p.endswith("\\-"):
                    p = p[:-1] + "\\-"
                # a LEADING '-' must be escaped too, or 'ab' + '-z'
                # concatenates into the accidental range b-z
                if p.startswith("-"):
                    p = "\\" + p
                safe.append(p)
            body = "".join(safe)
            if body.startswith("^"):
                body = "\\" + body
            return body
    return None


def production_regex(prods: dict, root: str, captures=(),
                     max_depth: int = 64,
                     return_aliases: bool = False):
    """Expand ``root`` into one regex by inline substitution.
    Productions named in ``captures`` wrap in ``(?P<Name>...)``; a
    production captured in SEVERAL alternation branches gets aliased
    group names (``Name``, ``Name_2``, …) because regex forbids
    redefinition — with ``return_aliases=True`` the alias map
    ``{prod: [group, ...]}`` returns alongside the pattern (exactly
    one alias is non-None on any match)."""
    captures = set(captures)
    aliases: dict = {}

    def _capture_name(name: str) -> str:
        names = aliases.setdefault(name, [])
        gname = name if not names else "%s_%d" % (name, len(names) + 1)
        names.append(gname)
        return gname

    def emit(node, stack):
        if len(stack) > max_depth:
            raise UnsupportedEBNF("expansion too deep (recursion?)")
        k = node[0]
        if k == "lit":
            return re.escape(node[1])
        if k == "ilit":
            return "(?i:%s)" % re.escape(node[1])
        if k == "cls":
            return "[%s]" % node[1]
        if k == "name":
            name = node[1]
            if name in stack:
                raise UnsupportedEBNF(
                    "recursive production %r (regular grammars only)" % name)
            if name not in prods:
                raise UnsupportedEBNF("undefined production %r" % name)
            inner = emit(prods[name], stack + (name,))
            if name in captures:
                return "(?P<%s>%s)" % (_capture_name(name), inner)
            return "(?:%s)" % inner
        if k == "seq":
            return "".join(emit(n, stack) for n in node[1])
        if k == "alt":
            return "(?:%s)" % "|".join(emit(n, stack) for n in node[1])
        if k == "rep":
            return "(?:%s)%s" % (emit(node[1], stack), node[2])
        if k == "look":
            return "(?=%s)" % emit(node[1], stack)
        if k == "neglook":
            return "(?!%s)" % emit(node[1], stack)
        if k == "neg":
            chars = _single_chars(node[1], prods)
            if chars is None:
                raise UnsupportedEBNF(
                    "negation is only supported over char classes / "
                    "single chars, got %r" % (node[1],))
            return "[^%s]" % chars
        raise UnsupportedEBNF("unknown node %r" % (node,))

    if root not in prods:
        raise UnsupportedEBNF("undefined root production %r" % root)
    body = emit(prods[root], (root,))
    if root in captures:
        body = "(?P<%s>%s)" % (_capture_name(root), body)
    if return_aliases:
        return body, aliases
    return body


def ebnf_to_grammar_spec(paths, grammars, spaces: dict | None = None) -> dict:
    """Build a :func:`ferenda_ray.grammarfile.load_grammars`-ready
    spec from .ebnf files. ``grammars`` is a list of dicts, each::

        {"name": ..., "root": "<production>",
         # literal grammar (match text is the reference string):
         "literal": True, "strip": ",."
         # OR minting grammar:
         "space": ..., "template": ..., "captures": [prod, ...],
         "bindings": {var: [{"group": "<prod>"}, ...]}}

    The converted regex for ``root`` becomes the grammar's pattern,
    with each production in ``captures`` exposed as a named group for
    the bindings. Feed the result straight to ``load_grammars`` —
    one conversion call replaces the reference's
    ``load_ebnf(...) + namespace wiring`` (legalref.py:111-186)."""
    if isinstance(paths, str):
        paths = [paths]
    prods = load_ebnf_productions(*paths)
    out = {"spaces": dict(spaces or {}), "grammars": []}
    for g in grammars:
        pattern, aliases = production_regex(
            prods, g["root"], captures=g.get("captures", ()),
            return_aliases=True)
        re.compile(pattern)  # fail at conversion, not at scan
        entry = {"name": g["name"], "pattern": pattern}
        if g.get("literal"):
            entry["literal"] = True
            if g.get("strip"):
                entry["strip"] = g["strip"]
        else:
            entry["space"] = g["space"]
            entry["template"] = g.get("template")
            # a production captured in several branches has aliased
            # groups; expand each {"group": prod} part into one
            # OPTIONAL part per alias — exactly one is non-None on
            # any match, so the concatenation yields that one value
            bindings = {}
            for var, parts in g.get("bindings", {}).items():
                expanded = []
                for p in parts:
                    names = aliases.get(p.get("group"), None) \
                        if "group" in p else None
                    if names and len(names) > 1:
                        for nm in names:
                            q = dict(p)
                            q["group"] = nm
                            q["optional"] = True
                            expanded.append(q)
                    else:
                        expanded.append(p)
                bindings[var] = expanded
            entry["bindings"] = bindings
        out["grammars"].append(entry)
    return out
