"""XSLT 1.0 subset interpreter — the reference's ``Transformer``
presentation step (ferenda/transformer.py:25-330: parametrized XSLT
templates turning parsed XHTML into browser-ready HTML), stdlib-only
(lxml is absent in this environment) and scoped to the constructs the
reference's shipped stylesheets (res/xsl/*.xsl) actually use.

Supported XSLT elements: ``stylesheet``/``transform``, ``template``
(match | name, priority, MODE), ``apply-templates`` (select, mode),
``call-template``, ``param`` / ``with-param``, ``variable``,
``value-of``, ``text``, ``if``, ``choose``/``when``/``otherwise``,
``for-each``, ``attribute``, ``element``, ``copy``, ``copy-of``,
``comment``, ``include``/``import`` (via a resolver), literal result
elements with ``{...}`` attribute value templates; match patterns
include ``@*``, ``node()``, ``text()`` and the identity-transform
shape. ``document(href)`` loads external docs through the resolver
(the annotations-file shape), degrading to an empty node-set when
the file is absent.

The reference's OWN res/xsl assets are the acceptance fixture:
``generic.xsl`` (+ its ``base.xsl`` include and
``annotations-panel.xsl`` import) loads and transforms an XHTML
document into the full branded page in tests/test_xslt.py.

Supported XPath subset: relative/absolute location paths with
``child``, ``attribute`` (``@``), ``descendant-or-self`` (``//``),
``self`` (``.``), ``parent`` (``..``) and ``ancestor::*`` axes;
name / prefix:name / ``*`` / ``text()`` node tests; predicates
(positional, existence, comparisons); variables ``$x``; string and
number literals; ``|`` union; ``=`` ``!=`` ``<`` ``<=`` ``>`` ``>=``,
``and`` ``or``; functions ``count not true false concat contains
starts-with string string-length normalize-space substring-after
substring-before position last name local-name``. ``ext:node-set``
is the identity (result fragments here ARE node lists).

Anything outside the subset raises :class:`UnsupportedXSLT` at
stylesheet parse time where detectable, else at transform time — a
migrating user sees exactly which construct to adapt instead of a
silently wrong page.

Built-in template rules follow the spec: elements/root recurse,
text nodes copy through, attributes stringify.

Ray integration: :func:`transform_dataset` applies a stylesheet to a
rendered-XHTML column as an actor-pool ``map_batches`` stage — the
stylesheet parses ONCE per actor in ``__init__`` (the stateful-stage
contract), parameters ride the task closure exactly like the
reference's ``<xsl:param>`` configuration knobs.
"""

from __future__ import annotations

import functools
import io
import os
import re
import xml.etree.ElementTree as ET

XSL = "http://www.w3.org/1999/XSL/Transform"


class UnsupportedXSLT(ValueError):
    """Stylesheet uses a construct outside the documented subset."""


class XSLTError(ValueError):
    """Malformed stylesheet or evaluation failure."""


# ---------------------------------------------------------------------
# namespace-aware parsing (ElementTree drops xmlns declarations)
# ---------------------------------------------------------------------

def _parse_with_ns(text: str):
    """Parse XML keeping the root's prefix → URI map."""
    ns = {}
    root = None
    for ev, obj in ET.iterparse(io.StringIO(text),
                                events=("start-ns", "start")):
        if ev == "start-ns":
            ns.setdefault(obj[0], obj[1])
        elif root is None:
            root = obj
    return root, ns


def _qname(name: str, nsmap: dict) -> str:
    """prefix:local → {uri}local (default: no namespace)."""
    if name.startswith("{") or ":" not in name:
        return name
    pfx, local = name.split(":", 1)
    uri = nsmap.get(pfx)
    if uri is None:
        raise XSLTError("undeclared namespace prefix %r" % pfx)
    return "{%s}%s" % (uri, local)


# ---------------------------------------------------------------------
# node model: ET elements + attribute/text wrappers + a root wrapper
# ---------------------------------------------------------------------

class AttrNode:
    __slots__ = ("owner", "name", "value")

    def __init__(self, owner, name, value):
        self.owner, self.name, self.value = owner, name, value


class RootNode:
    """Document root ("/") — parent of the document element."""
    __slots__ = ("elem",)

    def __init__(self, elem):
        self.elem = elem


def _string_value(node) -> str:
    if isinstance(node, AttrNode):
        return node.value
    if isinstance(node, RootNode):
        return _string_value(node.elem)
    if isinstance(node, str):
        return node
    return "".join(node.itertext())


def _to_string(val) -> str:
    if isinstance(val, list):
        return _string_value(val[0]) if val else ""
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        return ("%d" % int(val)) if val == int(val) else repr(val)
    return str(val)


def _to_bool(val) -> bool:
    if isinstance(val, list):
        return bool(val)
    if isinstance(val, str):
        return bool(val)
    return bool(val)


def _to_num(val) -> float:
    try:
        return float(_to_string(val) if not isinstance(val, (int, float))
                     else val)
    except ValueError:
        return float("nan")


# ---------------------------------------------------------------------
# XPath subset: tokenizer + recursive-descent evaluator
# ---------------------------------------------------------------------

_XP_TOKEN = re.compile(r"""
    (?P<num>\d+(?:\.\d+)?)
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<var>\$[\w.-]+)
  | (?P<axis>[\w-]+::)
  | (?P<dslash>//)
  | (?P<ddot>\.\.)
  | (?P<op><=|>=|!=|[=<>|/\[\]()@.,*])
  | (?P<name>[\w-]+(?::\*|:[\w-]+)?(?:\(\))?)
  | (?P<ws>\s+)
""", re.X)

_AXES = ("ancestor-or-self", "ancestor", "descendant-or-self",
         "descendant", "child", "attribute", "self", "parent",
         "following-sibling", "preceding-sibling")


def _xp_tokenize(s: str):
    toks, pos = [], 0
    while pos < len(s):
        m = _XP_TOKEN.match(s, pos)
        if not m:
            raise UnsupportedXSLT("XPath: cannot tokenize %r" % s[pos:])
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group(0)
        # NOTE: "div"/"mod" stay NAMES — arithmetic is outside the
        # subset and <div> is the most common HTML element
        if kind == "name" and val in ("and", "or"):
            kind = "op"
        toks.append((kind, val))
    return toks


class _Ctx:
    __slots__ = ("node", "pos", "size", "vars", "nsmap", "parents",
                 "engine")

    def __init__(self, node, pos, size, vars, nsmap, parents,
                 engine=None):
        self.node, self.pos, self.size = node, pos, size
        self.vars, self.nsmap, self.parents = vars, nsmap, parents
        self.engine = engine


@functools.lru_cache(maxsize=4096)
def _xp_tokens_cached(text: str) -> tuple:
    """Token stream per expression text — stylesheets evaluate the
    same handful of expressions once per NODE, so memoizing the
    tokenizer removes the per-evaluation regex scan (the tuple is
    immutable; evaluation state lives on the _XPath instance)."""
    return tuple(_xp_tokenize(text))


class _XPath:
    """One parsed expression, evaluated against a context."""

    def __init__(self, text: str):
        self.text = text
        self.toks = _xp_tokens_cached(text)

    # --- public ---
    def evaluate(self, ctx: _Ctx):
        self.i = 0
        self.ctx = ctx
        val = self._or()
        if self.i != len(self.toks):
            raise UnsupportedXSLT("XPath: trailing tokens in %r" % self.text)
        return val

    # --- helpers ---
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _take(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val):
        t = self._take()
        if t[1] != val:
            raise UnsupportedXSLT("XPath: expected %r in %r" % (val, self.text))

    # --- grammar ---
    def _or(self):
        v = self._and()
        while self._peek() == ("op", "or"):
            self._take()
            r = self._and()
            v = _to_bool(v) or _to_bool(r)
        return v

    def _and(self):
        v = self._eq()
        while self._peek() == ("op", "and"):
            self._take()
            r = self._eq()
            v = _to_bool(v) and _to_bool(r)
        return v

    def _eq(self):
        v = self._rel()
        while self._peek()[1] in ("=", "!="):
            op = self._take()[1]
            r = self._rel()
            v = self._compare(v, r, op)
        return v

    def _rel(self):
        v = self._union()
        while self._peek()[1] in ("<", "<=", ">", ">="):
            op = self._take()[1]
            r = self._union()
            a, b = _to_num(v), _to_num(r)
            v = {"<": a < b, "<=": a <= b,
                 ">": a > b, ">=": a >= b}[op]
        return v

    def _union(self):
        v = self._path()
        while self._peek() == ("op", "|"):
            self._take()
            r = self._path()
            if not isinstance(v, list) or not isinstance(r, list):
                raise UnsupportedXSLT("XPath: | needs node-sets")
            seen = {id(n) for n in v}
            v = v + [n for n in r if id(n) not in seen]
        return v

    @staticmethod
    def _compare(a, b, op):
        # XPath 1.0: comparisons with node-sets are EXISTENTIAL for
        # both = and != independently (some node satisfies the op) —
        # != is NOT the negation of =
        if isinstance(a, list) or isinstance(b, list):
            nodes, other = (a, b) if isinstance(a, list) else (b, a)
            if isinstance(other, list):
                vals = {_string_value(n) for n in other}
                if op == "=":
                    return any(_string_value(n) in vals for n in nodes)
                # != is existential over PAIRS: true iff some (a, b)
                # pair differs — with both sets non-empty that is
                # "more than one distinct string across both sets"
                avals = {_string_value(n) for n in nodes}
                if not avals or not vals:
                    return False
                return len(avals | vals) > 1
            if isinstance(other, bool):
                eq = _to_bool(nodes) == other
                return eq if op == "=" else not eq
            if isinstance(other, (int, float)):
                if op == "=":
                    return any(_to_num(_string_value(n)) == other
                               for n in nodes)
                return any(_to_num(_string_value(n)) != other
                           for n in nodes)
            if op == "=":
                return any(_string_value(n) == str(other)
                           for n in nodes)
            return any(_string_value(n) != str(other) for n in nodes)
        # bool first: isinstance(True, int) is True, so the numeric
        # branch would otherwise swallow booleans as NaN comparisons
        if isinstance(a, bool) or isinstance(b, bool):
            eq = _to_bool(a) == _to_bool(b)
        elif isinstance(a, (int, float)) or isinstance(b, (int, float)):
            eq = _to_num(a) == _to_num(b)
        else:
            eq = _to_string(a) == _to_string(b)
        return eq if op == "=" else not eq

    def _path(self):
        kind, val = self._peek()
        # primary expressions
        if kind == "num":
            self._take()
            return float(val)
        if kind == "str":
            self._take()
            return val[1:-1]
        if kind == "var":
            self._take()
            name = val[1:]
            if name not in self.ctx.vars:
                raise XSLTError("undefined variable $%s" % name)
            v = self.ctx.vars[name]
            # a node-set variable may continue as a path: $x/foo
            if self._peek()[1] in ("/", "//") and isinstance(v, list):
                sep = self._take()[1]
                return self._steps(v, first_deep=(sep == "//"))
            return v
        if kind == "name" and self._is_function(val):
            v = self._function(val)
            if self._peek()[1] in ("/", "//") and isinstance(v, list):
                sep = self._take()[1]
                return self._steps(v, first_deep=(sep == "//"))
            return v
        if (kind, val) == ("op", "("):
            self._take()
            v = self._or()
            self._expect(")")
            if self._peek()[1] in ("/", "//") and isinstance(v, list):
                sep = self._take()[1]
                return self._steps(v, first_deep=(sep == "//"))
            return v
        # location paths
        if (kind, val) == ("op", "/") or kind == "dslash":
            self._take()
            root = [self._root_of(self.ctx.node)]
            if kind == "dslash":
                return self._steps(root, first_deep=True)
            if not self._starts_step():
                return root  # bare "/"
            return self._steps(root)
        if self._starts_step():
            return self._steps([self.ctx.node])
        raise UnsupportedXSLT(
            "XPath: unexpected token %r in %r" % (val, self.text))

    def _starts_step(self):
        kind, val = self._peek()
        return (kind in ("name", "axis", "ddot")
                or (kind, val) in (("op", "@"), ("op", "*"), ("op", ".")))

    def _is_function(self, name):
        base = name[:-2] if name.endswith("()") else name
        base = base.split(":")[-1]
        if base == "text":
            return False  # node test, not a function
        if base not in _FUNCTIONS:
            return False
        return (name.endswith("()")
                or (self.i + 1 < len(self.toks)
                    and self.toks[self.i + 1] == ("op", "(")))

    def _function(self, name):
        self._take()
        fname = name.split(":")[-1].replace("()", "").strip()
        args = []
        if not name.endswith("()"):
            self._expect("(")
            if self._peek()[1] != ")":
                args.append(self._or())
                while self._peek()[1] == ",":
                    self._take()
                    args.append(self._or())
            self._expect(")")
        return _FUNCTIONS[fname](self.ctx, args)

    def _root_of(self, node):
        n = node
        while True:
            p = self.ctx.parents.get(id(n))
            if p is None:
                return n if isinstance(n, RootNode) else RootNode(n)
            n = p

    # step (('/'|'//') step)* over a node list
    def _steps(self, nodes, first_deep=False):
        nodes = self._step(nodes, deep=first_deep)
        while self._peek()[1] in ("/", "//"):
            sep = self._take()[1]
            nodes = self._step(nodes, deep=(sep == "//"))
        return nodes

    def _step(self, nodes, deep=False):
        kind, val = self._peek()
        axis = "child"
        if kind == "axis":
            self._take()
            axis = val[:-2]
            if axis not in ("ancestor", "ancestor-or-self",
                            "descendant", "descendant-or-self",
                            "self", "child", "attribute", "parent"):
                raise UnsupportedXSLT("axis %r" % axis)
            kind, val = self._peek()
        elif (kind, val) == ("op", "@"):
            self._take()
            axis = "attribute"
            kind, val = self._peek()

        if axis == "self" or (axis == "child"
                              and (kind, val) == ("op", ".")):
            if (kind, val) == ("op", "."):
                self._take()
                out = list(nodes)
            else:
                self._take()  # self::nodetest
                want = None if val == "*" else _qname(val, self.ctx.nsmap)
                out = [n for n in nodes if self._test_node(n, want)]
        elif axis == "parent" or kind == "ddot":
            self._take()
            out = []
            for n in nodes:
                p = self.ctx.parents.get(id(n))
                if p is not None and not any(p is o for o in out):
                    out.append(p)
        elif kind == "name" or (kind, val) == ("op", "*"):
            self._take()
            out = self._nodetest(nodes, axis, val, deep)
        else:
            raise UnsupportedXSLT(
                "XPath: unexpected step %r in %r" % (val, self.text))
        # predicates
        while self._peek() == ("op", "["):
            self._take()
            out = self._predicate(out)
            self._expect("]")
        return out

    def _children(self, node):
        if isinstance(node, RootNode):
            return [node.elem]
        if isinstance(node, AttrNode):
            return []
        kids = list(node)
        for k in kids:
            self.ctx.parents.setdefault(id(k), node)
        return kids

    def _descendants(self, node, with_self):
        out = [node] if with_self else []
        for c in self._children(node):
            out.extend(self._descendants(c, True))
        return out

    def _nodetest(self, nodes, axis, test, deep):
        out = []
        if test.endswith("()"):
            fn = test[:-2].strip()
            if fn != "text":
                raise UnsupportedXSLT("node test %r" % test)
        want = None
        if test == "*" or test.endswith("()"):
            want = None if test == "*" else "text()"
        else:
            want = _qname(test, self.ctx.nsmap)
        for n in nodes:
            base = self._descendants(n, True) if deep else [n]
            if deep and axis == "child":
                # //test == descendant-or-self::node()/child::test —
                # walk descendants pre-order so DOCUMENT ORDER holds
                # (collecting per-descendant children would misorder)
                if want == "text()":
                    out.extend(self._deep_texts(n))
                    continue
                for b in base:
                    if b is not n and self._test_node(b, want):
                        out.append(b)
                continue
            for b in base:
                if axis == "attribute":
                    if hasattr(b, "attrib"):
                        if want is None:
                            for k, v in b.attrib.items():
                                out.append(AttrNode(b, k, v))
                        elif want in b.attrib:
                            out.append(AttrNode(b, want, b.attrib[want]))
                elif axis in ("ancestor", "ancestor-or-self"):
                    cur = b if axis == "ancestor-or-self" else \
                        self.ctx.parents.get(id(b))
                    while cur is not None and not isinstance(cur, RootNode):
                        if want is None or (hasattr(cur, "tag")
                                            and cur.tag == want):
                            out.append(cur)
                        cur = self.ctx.parents.get(id(cur))
                elif axis in ("descendant", "descendant-or-self"):
                    for d in self._descendants(b, axis.endswith("self")):
                        if self._test_node(d, want):
                            out.append(d)
                else:  # child
                    if want == "text()":
                        out.extend(self._texts(b))
                        continue
                    for c in self._children(b):
                        if self._test_node(c, want):
                            out.append(c)
        return out

    def _deep_texts(self, node):
        """All descendant text nodes in true document order (text
        before children's text before tails)."""
        out = []
        if isinstance(node, RootNode):
            node = node.elem
        if isinstance(node, (AttrNode, str)):
            return out
        if node.text:
            out.append(node.text)
        for c in list(node):
            if isinstance(c.tag, str):
                self.ctx.parents.setdefault(id(c), node)
                out.extend(self._deep_texts(c))
            if c.tail:
                out.append(c.tail)
        return out

    def _texts(self, node):
        if isinstance(node, (AttrNode, RootNode)):
            return []
        out = []
        if node.text:
            out.append(node.text)
        for c in list(node):
            if c.tail:
                out.append(c.tail)
        return out

    @staticmethod
    def _test_node(node, want):
        if want == "text()":
            return isinstance(node, str)
        if isinstance(node, (AttrNode, RootNode, str)):
            return False
        if not isinstance(node.tag, str):
            return False  # comments / PIs
        if want is None:
            return True
        if want.endswith("}*"):  # pfx:* namespace wildcard
            return node.tag.startswith(want[:-1])
        return node.tag == want

    def _predicate(self, nodes):
        # evaluate the predicate expression once per node with
        # position()/last() context; save+restore parse position
        start = self.i
        out = []
        size = len(nodes)
        for pos, n in enumerate(nodes, 1):
            self.i = start
            saved = self.ctx
            self.ctx = _Ctx(n, pos, size, saved.vars, saved.nsmap,
                            saved.parents, saved.engine)
            try:
                v = self._or()
            finally:
                self.ctx = saved
            if isinstance(v, float):
                if int(v) == pos:
                    out.append(n)
            elif _to_bool(v):
                out.append(n)
        if size == 0:
            # still need to consume the predicate tokens
            self.i = start
            saved = self.ctx
            self.ctx = _Ctx(saved.node, 1, 1, saved.vars, saved.nsmap,
                            saved.parents, saved.engine)
            try:
                self._or()
            finally:
                self.ctx = saved
        return out


def _fn_count(ctx, args):
    v = args[0]
    if not isinstance(v, list):
        raise UnsupportedXSLT("count() needs a node-set")
    return float(len(v))


_FUNCTIONS = {
    "count": _fn_count,
    "not": lambda ctx, a: not _to_bool(a[0]),
    "true": lambda ctx, a: True,
    "false": lambda ctx, a: False,
    "string": lambda ctx, a: _to_string(a[0]) if a
    else _string_value(ctx.node),
    "concat": lambda ctx, a: "".join(_to_string(x) for x in a),
    "contains": lambda ctx, a: _to_string(a[1]) in _to_string(a[0]),
    "starts-with": lambda ctx, a: _to_string(a[0]).startswith(
        _to_string(a[1])),
    "string-length": lambda ctx, a: float(len(
        _to_string(a[0]) if a else _string_value(ctx.node))),
    "normalize-space": lambda ctx, a: " ".join(
        (_to_string(a[0]) if a else _string_value(ctx.node)).split()),
    "substring-after": lambda ctx, a: _to_string(a[0]).split(
        _to_string(a[1]), 1)[1] if _to_string(a[1]) in _to_string(a[0])
    else "",
    "substring-before": lambda ctx, a: _to_string(a[0]).split(
        _to_string(a[1]), 1)[0] if _to_string(a[1]) in _to_string(a[0])
    else "",
    "position": lambda ctx, a: float(ctx.pos),
    "last": lambda ctx, a: float(ctx.size),
    "name": lambda ctx, a: _node_name(a[0][0] if a and a[0] else ctx.node),
    "local-name": lambda ctx, a: _node_name(
        a[0][0] if a and a[0] else ctx.node).split("}")[-1],
    "node-set": lambda ctx, a: a[0],  # ext:node-set identity
    "document": lambda ctx, a: _fn_document(ctx, a),
}


def _fn_document(ctx, args):
    """document(href): load an external XML doc through the engine's
    resolver (the annotations-file shape of the reference's base.xsl);
    document('') and unresolvable-but-empty hrefs yield an empty
    node-set so stylesheets degrade gracefully without the file."""
    href = _to_string(args[0])
    eng = ctx.engine
    if not href or eng is None:
        return []
    return eng._load_document(href)


def _node_name(node):
    if isinstance(node, AttrNode):
        return node.name
    if isinstance(node, (RootNode, str)):
        return ""
    return node.tag


# ---------------------------------------------------------------------
# match patterns
# ---------------------------------------------------------------------

class _Pattern:
    """An XSLT match pattern (the subset the reference's stylesheets
    use): alternatives split on ``|``; each alternative is a chain of
    steps ``a/b/c`` (the node must match the last step and its parent
    chain the preceding ones), a step being ``name`` / ``pfx:name`` /
    ``*`` / ``text()`` / ``/`` with optional ``[predicate]``s
    (evaluated through the XPath subset)."""

    def __init__(self, text: str, nsmap: dict):
        self.text = text
        self.alts = []
        # split alternatives on TOP-LEVEL | only (a | inside a
        # predicate like [w:b|w:i] belongs to the predicate's XPath)
        alts, cur, depth = [], "", 0
        for ch in text:
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            if ch == "|" and depth == 0:
                alts.append(cur)
                cur = ""
            else:
                cur += ch
        alts.append(cur)
        for alt in alts:
            alt = alt.strip()
            if alt == "/":
                self.alts.append(("root", ()))
                continue
            steps = []
            # split on / but keep predicates intact (no / inside the
            # reference's predicates)
            depth = 0
            cur = ""
            parts = []
            for ch in alt:
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                if ch == "/" and depth == 0:
                    parts.append(cur)
                    cur = ""
                else:
                    cur += ch
            parts.append(cur)
            if parts and parts[0] == "":
                parts = parts[1:]  # absolute pattern: anchored at root
                steps.append(("__root__", ()))
            for p in parts:
                p = p.strip()
                m = re.match(r"^(@\*|@[\w:-]+|[\w-]+:\*"
                             r"|[\w-]+:[\w-]+|[\w-]+"
                             r"|\*|text\(\)|node\(\))"
                             r"((?:\[[^\]]*\])*)$", p)
                if not m:
                    raise UnsupportedXSLT("match pattern %r" % text)
                preds = re.findall(r"\[([^\]]*)\]", m.group(2) or "")
                steps.append((m.group(1), tuple(preds)))
            self.alts.append(("steps", tuple(steps)))
        self.nsmap = nsmap

    def default_priority(self) -> float:
        # max over alternatives, spec-flavored
        best = -2.0
        for kind, steps in self.alts:
            if kind == "root":
                best = max(best, 0.5)
                continue
            if len(steps) > 1 or (steps and steps[0][1]):
                best = max(best, 0.5)
            else:
                test = steps[0][0]
                best = max(best, -0.5 if test in ("*", "node()", "@*")
                           else 0.0)
        return best

    def matches(self, node, engine) -> bool:
        for kind, steps in self.alts:
            if kind == "root":
                if isinstance(node, RootNode):
                    return True
                continue
            if self._match_steps(node, list(steps), engine):
                return True
        return False

    def _match_steps(self, node, steps, engine) -> bool:
        test, preds = steps[-1]
        if not self._match_one(node, test, preds, engine):
            return False
        rest = steps[:-1]
        cur = node
        while rest:
            t, p = rest[-1]
            parent = engine.parents.get(id(cur))
            if t == "__root__":
                return isinstance(parent, RootNode) or parent is None
            if parent is None or isinstance(parent, RootNode):
                return False
            if not self._match_one(parent, t, p, engine):
                return False
            cur = parent
            rest = rest[:-1]
        return True

    def _test_hit(self, node, test) -> bool:
        if test == "text()":
            return isinstance(node, str)
        if test == "node()":
            return isinstance(node, str) or (
                hasattr(node, "tag") and isinstance(node.tag, str))
        if test == "@*":
            return isinstance(node, AttrNode)
        if test.startswith("@"):
            return (isinstance(node, AttrNode)
                    and node.name == _qname(test[1:], self.nsmap))
        if test == "*":
            return hasattr(node, "tag") and isinstance(node.tag, str)
        if test.endswith(":*"):
            uri = self.nsmap.get(test[:-2])
            return (uri is not None and hasattr(node, "tag")
                    and isinstance(node.tag, str)
                    and node.tag.startswith("{%s}" % uri))
        return (hasattr(node, "tag")
                and node.tag == _qname(test, self.nsmap))

    def _match_one(self, node, test, preds, engine) -> bool:
        if not self._test_hit(node, test):
            return False
        if not preds:
            return True
        # Predicate context in a match pattern is the node's parent
        # acting as the child axis (XSLT 1.0 §5.2): position()/last()
        # count the like-test siblings, so match="b[1]" selects only
        # the first b — not every b (ADVICE r4).
        pos = size = 1
        if not isinstance(node, (str, AttrNode)):
            parent = engine.parents.get(id(node))
            if isinstance(parent, RootNode):
                pos = size = 1
            elif parent is not None and hasattr(parent, "tag"):
                sibs = [c for c in list(parent)
                        if self._test_hit(c, test)]
                for i, s in enumerate(sibs):
                    if s is node:
                        pos, size = i + 1, len(sibs)
                        break
        ctx = _Ctx(node, pos, size, engine.global_vars, self.nsmap,
                   engine.parents, engine)
        for p in preds:
            v = _XPath(p).evaluate(ctx)
            # numeric predicate means position()=N, same as _predicate
            if isinstance(v, float):
                if int(v) != pos:
                    return False
            elif not _to_bool(v):
                return False
        return True


# ---------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------

_AVT_RE = re.compile(r"\{([^{}]+)\}")

_KNOWN = {"template", "apply-templates", "call-template", "param",
          "with-param", "variable", "value-of", "text", "if",
          "choose", "when", "otherwise", "for-each", "attribute",
          "element", "copy", "copy-of", "comment", "include",
          "import", "output", "strip-space", "preserve-space",
          "stylesheet", "transform", "key", "decimal-format"}


class _Template:
    __slots__ = ("pattern", "name", "priority", "params",
                 "body", "order", "nsmap", "mode")

    def __init__(self, pattern, name, priority, params, body, order,
                 mode=None):
        self.pattern, self.name = pattern, name
        self.priority, self.params = priority, params
        self.body, self.order = body, order
        self.mode = mode


class XSLTTransformer:
    """Parse once, transform many — the reference's one-template-per-
    Transformer contract (transformer.py:49-52). ``stylesheet`` is
    XSLT text or a path; ``resolver`` locates include/import targets:
    a dict name → text, a directory path, or None (includes then
    raise). ``params`` are global ``<xsl:param>`` overrides, exactly
    the reference's config-driven template parameters."""

    def __init__(self, stylesheet, resolver=None, params=None):
        if isinstance(stylesheet, str) and "\n" not in stylesheet \
                and os.path.exists(stylesheet):
            if resolver is None:
                resolver = os.path.dirname(stylesheet) or "."
            with open(stylesheet, encoding="utf-8") as f:
                stylesheet = f.read()
        self.resolver = resolver
        self.templates: list[_Template] = []
        self.named: dict[str, _Template] = {}
        self.global_params: dict[str, object] = {}
        self._order = 0
        self._load(stylesheet)
        self.user_params = dict(params or {})

    # --- stylesheet loading (include/import flattening) ---
    def _resolve(self, href: str) -> str:
        if isinstance(self.resolver, dict):
            if href not in self.resolver:
                raise XSLTError("cannot resolve %r" % href)
            return self.resolver[href]
        if isinstance(self.resolver, str):
            path = os.path.join(self.resolver, href)
            with open(path, encoding="utf-8") as f:
                return f.read()
        raise UnsupportedXSLT(
            "include/import of %r needs a resolver" % href)

    def _load(self, text: str):
        root, nsmap = _parse_with_ns(text)
        if root.tag not in ("{%s}stylesheet" % XSL,
                            "{%s}transform" % XSL):
            raise XSLTError("not an XSLT stylesheet: %r" % root.tag)
        nsmap = dict(nsmap)
        # the OUTERMOST stylesheet's prefixes drive global xsl:param
        # select evaluation (the doc's nsmap would be wrong — a
        # typical XHTML doc declares only a default xmlns)
        if not hasattr(self, "nsmap"):
            self.nsmap = nsmap
        for child in root:
            if not isinstance(child.tag, str):
                continue
            if not child.tag.startswith("{%s}" % XSL):
                continue  # top-level literal / foreign: ignored
            local = child.tag.split("}", 1)[1]
            if local in ("include", "import"):
                self._load(self._resolve(child.get("href")))
            elif local == "template":
                self._add_template(child, nsmap)
            elif local in ("param", "variable"):
                # (select_expr, literal_content) — content-bodied
                # params hold their text (the bodyclass shape)
                self.global_params[child.get("name")] = (
                    child.get("select"),
                    (child.text or "").strip() or "")
            elif local in ("output", "strip-space", "preserve-space",
                           "key", "decimal-format"):
                continue  # accepted, no-op in this subset
            else:
                raise UnsupportedXSLT("top-level xsl:%s" % local)

    def _add_template(self, elem, nsmap):
        match = elem.get("match")
        name = elem.get("name")
        pattern = _Pattern(match, nsmap) if match else None
        prio = elem.get("priority")
        priority = float(prio) if prio is not None else (
            pattern.default_priority() if pattern else 0.0)
        params = []
        body = []
        for c in elem:
            if isinstance(c.tag, str) and c.tag == "{%s}param" % XSL:
                params.append((c.get("name"), c.get("select"), list(c)))
            else:
                body.append(c)
        t = _Template(pattern, name, priority, params,
                      (elem.text, body), self._order,
                      mode=elem.get("mode"))
        self._order += 1
        if name:
            self.named[name] = t
        if pattern:
            self.templates.append(t)
        # template nsmap rides on the object for XPath evaluation
        t.nsmap = nsmap

    def _load_document(self, href: str):
        cache = getattr(self, "_doc_cache", None)
        if cache is None:
            cache = self._doc_cache = {}
        if href not in cache:
            try:
                if isinstance(self.resolver, dict) and \
                        href in self.resolver:
                    text = self.resolver[href]
                elif isinstance(self.resolver, str) and os.path.exists(
                        os.path.join(self.resolver, href)):
                    with open(os.path.join(self.resolver, href),
                              encoding="utf-8") as f:
                        text = f.read()
                elif os.path.exists(href):
                    with open(href, encoding="utf-8") as f:
                        text = f.read()
                else:
                    cache[href] = []
                    return []
            except OSError:
                cache[href] = []
                return []
            root, _ = _parse_with_ns(text)
            cache[href] = [RootNode(root)]
        # transform() resets self.parents each call — re-register the
        # cached doc's parent links every time it is requested
        rn = cache[href][0]
        self._index_parents(rn.elem)
        self.parents[id(rn.elem)] = rn
        return cache[href]

    # --- transform ---
    def transform(self, xml_text: str, params=None) -> str:
        doc_root, doc_ns = _parse_with_ns(xml_text)
        self.parents = {}
        self._index_parents(doc_root)
        root = RootNode(doc_root)
        self.parents[id(doc_root)] = root
        self.global_vars = {}
        merged = dict(self.user_params)
        merged.update(params or {})
        for k, (sel, content) in self.global_params.items():
            if k in merged:
                self.global_vars[k] = merged[k]
            elif sel is not None:
                ctx = _Ctx(root, 1, 1, self.global_vars,
                           self.nsmap, self.parents, self)
                self.global_vars[k] = _XPath(sel).evaluate(ctx)
            else:
                self.global_vars[k] = content
        for k, v in merged.items():
            self.global_vars.setdefault(k, v)
        out = self._apply([root], dict(self.global_vars))
        return self._serialize(out)

    def _index_parents(self, elem):
        for c in elem:
            self.parents[id(c)] = elem
            if isinstance(c.tag, str):
                self._index_parents(c)

    # --- template application ---
    def _best_template(self, node, mode=None):
        best = None
        for t in self.templates:
            if t.mode != mode:
                continue
            if t.pattern.matches(node, self):
                if best is None or (t.priority, t.order) > \
                        (best.priority, best.order):
                    best = t
        return best

    def _apply(self, nodes, vars, params=None, mode=None):
        out = []
        size = len(nodes)
        for pos, n in enumerate(nodes, 1):
            t = self._best_template(n, mode)
            if t is None:
                # built-in rules (recursing IN the current mode)
                if isinstance(n, str):
                    out.append(n)
                elif isinstance(n, AttrNode):
                    out.append(n.value)
                elif isinstance(n, RootNode):
                    out.extend(self._apply([n.elem], vars, mode=mode))
                else:
                    out.extend(self._apply(self._content(n), vars,
                                           mode=mode))
                continue
            out.extend(self._invoke(t, n, pos, size, vars, params))
        return out

    def _content(self, elem):
        """children in document order: text + elements + tails."""
        out = []
        if elem.text:
            out.append(elem.text)
        for c in elem:
            self.parents.setdefault(id(c), elem)
            if isinstance(c.tag, str):
                out.append(c)
            if c.tail:
                out.append(c.tail)
        return out

    def _invoke(self, t, node, pos, size, vars, with_params):
        local = dict(self.global_vars)
        ctx = _Ctx(node, pos, size, local, t.nsmap, self.parents,
                   self)
        for name, sel, content in t.params:
            if with_params and name in with_params:
                local[name] = with_params[name]
            elif sel is not None:
                local[name] = _XPath(sel).evaluate(ctx)
            else:
                local[name] = self._execute_body((None, content), ctx)
        return self._execute_body(t.body, ctx)

    # --- instruction execution ---
    def _execute_body(self, body, ctx):
        lead, children = body if isinstance(body, tuple) else (None, body)
        out = []
        if lead and lead.strip():
            out.append(lead)
        for c in children:
            out.extend(self._execute(c, ctx))
            if c.tail and c.tail.strip():
                out.append(c.tail)
        return out

    def _execute(self, elem, ctx):
        if not isinstance(elem.tag, str):
            return []  # comments in the stylesheet
        if not elem.tag.startswith("{%s}" % XSL):
            return [self._literal(elem, ctx)]
        local = elem.tag.split("}", 1)[1]
        fn = getattr(self, "_i_" + local.replace("-", "_"), None)
        if fn is None:
            raise UnsupportedXSLT("xsl:%s" % local)
        return fn(elem, ctx)

    def _avt(self, text, ctx):
        # {{ and }} are the spec's literal-brace escapes — protect
        # them before expression substitution, restore after
        text = text.replace("{{", "\x00").replace("}}", "\x01")

        def sub(m):
            return _to_string(_XPath(m.group(1)).evaluate(ctx))
        out = _AVT_RE.sub(sub, text)
        return out.replace("\x00", "{").replace("\x01", "}")

    def _literal(self, elem, ctx):
        out = ET.Element(elem.tag)
        for k, v in elem.attrib.items():
            out.set(k, self._avt(v, ctx))
        self._fill(out, self._execute_body((elem.text, list(elem)), ctx))
        return out

    @staticmethod
    def _fill(out_elem, items):
        """Attach a produced node list as out_elem's content."""
        for it in items:
            if isinstance(it, ET.Element):
                out_elem.append(it)
            elif isinstance(it, _Attr):
                out_elem.set(it.name, it.value)
            else:
                s = it if isinstance(it, str) else _to_string(it)
                if len(out_elem):
                    out_elem[-1].tail = (out_elem[-1].tail or "") + s
                else:
                    out_elem.text = (out_elem.text or "") + s

    # instructions
    def _i_value_of(self, elem, ctx):
        return [_to_string(_XPath(elem.get("select")).evaluate(ctx))]

    def _i_text(self, elem, ctx):
        return [elem.text or ""]

    def _i_comment(self, elem, ctx):
        c = ET.Comment("".join(
            _to_string(x)
            for x in self._execute_body((elem.text, list(elem)), ctx)))
        return [c]

    def _i_if(self, elem, ctx):
        if _to_bool(_XPath(elem.get("test")).evaluate(ctx)):
            return self._execute_body((elem.text, list(elem)), ctx)
        return []

    def _i_choose(self, elem, ctx):
        for c in elem:
            if not isinstance(c.tag, str):
                continue
            local = c.tag.split("}", 1)[1]
            if local == "when" and _to_bool(
                    _XPath(c.get("test")).evaluate(ctx)):
                return self._execute_body((c.text, list(c)), ctx)
            if local == "otherwise":
                return self._execute_body((c.text, list(c)), ctx)
        return []

    def _i_for_each(self, elem, ctx):
        sel = _XPath(elem.get("select")).evaluate(ctx)
        if not isinstance(sel, list):
            raise XSLTError("for-each select is not a node-set")
        out = []
        size = len(sel)
        for pos, n in enumerate(sel, 1):
            sub = _Ctx(n, pos, size, dict(ctx.vars), ctx.nsmap,
                       ctx.parents, ctx.engine)
            out.extend(self._execute_body((elem.text, list(elem)), sub))
        return out

    def _i_apply_templates(self, elem, ctx):
        sel = elem.get("select")
        if sel:
            nodes = _XPath(sel).evaluate(ctx)
            if not isinstance(nodes, list):
                raise XSLTError("apply-templates select not a node-set")
        else:
            n = ctx.node
            nodes = self._content(n) if hasattr(n, "tag") else (
                [n.elem] if isinstance(n, RootNode) else [])
        params = self._collect_params(elem, ctx)
        return self._apply(nodes, ctx.vars, params or None,
                           mode=elem.get("mode"))

    def _i_call_template(self, elem, ctx):
        name = elem.get("name")
        t = self.named.get(name)
        if t is None:
            raise XSLTError("no template named %r" % name)
        params = self._collect_params(elem, ctx)
        return self._invoke(t, ctx.node, ctx.pos, ctx.size,
                            ctx.vars, params)

    def _collect_params(self, elem, ctx):
        params = {}
        for c in elem:
            if isinstance(c.tag, str) and \
                    c.tag == "{%s}with-param" % XSL:
                sel = c.get("select")
                params[c.get("name")] = (
                    _XPath(sel).evaluate(ctx) if sel is not None
                    else self._execute_body((c.text, list(c)), ctx))
        return params

    def _i_variable(self, elem, ctx):
        sel = elem.get("select")
        val = (_XPath(sel).evaluate(ctx) if sel is not None
               else self._fragment(
                   self._execute_body((elem.text, list(elem)), ctx)))
        ctx.vars[elem.get("name")] = val
        return []

    def _i_param(self, elem, ctx):
        name = elem.get("name")
        if name not in ctx.vars:
            sel = elem.get("select")
            ctx.vars[name] = (_XPath(sel).evaluate(ctx)
                              if sel is not None else "")
        return []

    def _fragment(self, items):
        """Result tree fragment as a node list; element parents are
        indexed so XPath over ext:node-set(fragment) works."""
        for it in items:
            if isinstance(it, ET.Element):
                self._index_parents(it)
        return items

    def _i_attribute(self, elem, ctx):
        name = self._avt(elem.get("name"), ctx)
        val = "".join(
            _to_string(x)
            for x in self._execute_body((elem.text, list(elem)), ctx))
        return [_Attr(name, val)]

    def _i_element(self, elem, ctx):
        out = ET.Element(self._avt(elem.get("name"), ctx))
        self._fill(out, self._execute_body((elem.text, list(elem)), ctx))
        return [out]

    def _i_copy(self, elem, ctx):
        n = ctx.node
        if isinstance(n, str):
            return [n]
        if isinstance(n, AttrNode):
            return [_Attr(n.name, n.value)]
        if isinstance(n, RootNode):
            return self._execute_body((elem.text, list(elem)), ctx)
        out = ET.Element(n.tag)
        self._fill(out, self._execute_body((elem.text, list(elem)), ctx))
        return [out]

    def _i_copy_of(self, elem, ctx):
        import copy as _copy

        val = _XPath(elem.get("select")).evaluate(ctx)
        if isinstance(val, list):
            out = []
            for n in val:
                if isinstance(n, ET.Element) or hasattr(n, "tag"):
                    out.append(_copy.deepcopy(n))
                elif isinstance(n, AttrNode):
                    out.append(_Attr(n.name, n.value))
                else:
                    out.append(_to_string(n))
            return out
        return [_to_string(val)]

    # --- serialization ---
    @staticmethod
    def _serialize(items) -> str:
        parts = []
        for it in items:
            if isinstance(it, ET.Element):
                parts.append(ET.tostring(it, encoding="unicode"))
            elif isinstance(it, _Attr):
                continue  # attribute with no element: dropped
            elif callable(getattr(it, "tag", None)):  # Comment
                parts.append("<!--%s-->" % it.text)
            else:
                parts.append(_escape_text(_to_string(it)))
        return "".join(parts)


class _Attr:
    """A pending output attribute (xsl:attribute result)."""
    __slots__ = ("name", "value")

    def __init__(self, name, value):
        self.name, self.value = name, value


def _escape_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# ---------------------------------------------------------------------
# Ray stage
# ---------------------------------------------------------------------

class _XSLTStage:
    """Actor-pool stage: stylesheet compiled ONCE per actor."""

    def __init__(self, stylesheet_text, resolver, params,
                 col, out_col, uritransform, url_col):
        self.t = XSLTTransformer(stylesheet_text, resolver=resolver,
                                 params=params)
        self.col, self.out_col = col, out_col
        self.uritransform, self.url_col = uritransform, url_col

    def __call__(self, batch):
        import pandas as pd

        batch = batch.reset_index(drop=True)
        out = []
        for i in range(len(batch)):
            html = self.t.transform(batch.at[i, self.col])
            if self.uritransform:
                from .sources.xhtml import transform_uris

                html = transform_uris(html, batch.at[i, self.url_col],
                                      mode=self.uritransform)
            out.append(html)
        cols = {c: batch[c] for c in batch.columns}
        cols[self.out_col] = pd.Series(out, dtype=object)
        return pd.DataFrame(cols)


def transform_dataset(ds, stylesheet, resolver=None, params=None,
                      col: str = "xhtml", out_col: str = "html",
                      uritransform: str | None = None,
                      url_col: str = "url", concurrency=None):
    """Apply an XSLT stylesheet to a rendered-markup column — the
    reference's ``generate`` step (transformer.py transform_file over
    every parsed doc) as an actor-pool map: stylesheet text ships in
    the task spec, parses once per actor, documents stream through
    with zero shuffle. ``uritransform`` composes the
    ``transform_uris`` pass exactly like ``render_with_template``."""
    if isinstance(stylesheet, str) and "\n" not in stylesheet \
            and os.path.exists(stylesheet):
        if resolver is None:
            resolver = os.path.dirname(stylesheet) or "."
        with open(stylesheet, encoding="utf-8") as f:
            stylesheet = f.read()
    return ds.map_batches(
        _XSLTStage,
        fn_constructor_kwargs={
            "stylesheet_text": stylesheet, "resolver": resolver,
            "params": params, "col": col, "out_col": out_col,
            "uritransform": uritransform, "url_col": url_col},
        batch_format="pandas",
        concurrency=concurrency or (1, 4))
