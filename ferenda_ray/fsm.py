"""Configurable FSM chunk parser — the reference's #1 extension point.

Re-implements the semantics of ``ferenda/fsmparser.py:13-239`` (the
``FSMParser`` users configure with recognizers + a transition table)
over row output instead of element trees:

- **recognizers**: an ordered list of ``(name, predicate)`` pairs
  (``set_recognizers``, fsmparser.py:41-55). For each chunk only the
  recognizers with a transition FROM the current state are tried
  ("applicable recognizers", fsmparser.py:120-149) — a depth-2 header
  seen in "body" state is never recognized as a subsection, it falls
  through to the paragraph/content rule.
- **transition table**: ``{(state, recognizer_name): outcome}``
  (``set_transitions``, fsmparser.py:57-76) where outcome is one of
    ``FSMParser.POP``                     — leave the current
        container; the chunk is NOT consumed and is reprocessed in
        the parent state (the reference's ``False`` constructor,
        fsmparser.py:180-196);
    ``("content", fn_or_None)``           — append the chunk to the
        current container's text (``fn(parser, chunk, row, ctx)``
        overrides the default extractor);
    ``("push", constructor, new_state)``  — ``constructor(parser,
        chunk, parent_row, ctx)`` opens a child container and the
        parser descends into ``new_state`` (fsmparser.py:150-178).
- **state stack** + ``Peekable`` chunk stream (fsmparser.py:28-39,
  87-117): pops cascade naturally because the popping chunk is
  re-examined one stack frame up.

Engine output is a flat list of section rows (adjacency list via
parent_uri — Arrow has no recursive types); constructors create rows
with ``parser.new_row`` and the caller collects ``parser.rows``.

The two shipped grammars — the W3C HTML sectionizer
(``sectionize.build_w3c_parser``) and the RFC plain-text sectionizer
(``textparse.build_rfc_text_parser``) — are pure configurations of
this class; registering a novel grammar (e.g. appendix headings)
requires no engine change (tested in test_fsm.py).
"""

from __future__ import annotations


class Peekable:
    """Minimal peekable chunk stream (fsmparser.py:28-39)."""

    def __init__(self, chunks):
        self._chunks = list(chunks)
        self._i = 0

    @property
    def eof(self) -> bool:
        return self._i >= len(self._chunks)

    def peek(self):
        return self._chunks[self._i]

    def next(self):
        c = self._chunks[self._i]
        self._i += 1
        return c


class FSMParser:
    POP = ("pop",)

    def __init__(self, initial_state: str = "body"):
        self.recognizers: list[tuple] = []   # (name, predicate(parser, chunk))
        self.transitions: dict = {}
        self.initial_state = initial_state
        # default content extractor: str(chunk); instances override
        self.default_content = lambda parser, chunk, row, ctx: str(chunk)
        # parse-time state
        self.rows: list[dict] = []
        self._pos = 0
        # per-parse chunk-classification memo for recognizer instances
        # (keyed by id(chunk); cleared at every parse() so one parser
        # object is safely reusable across documents — id reuse after
        # GC can never serve a stale classification)
        self.chunk_cache: dict = {}

    # -- configuration -------------------------------------------------
    def set_recognizers(self, *pairs):
        self.recognizers = list(pairs)

    def add_recognizer(self, name: str, predicate, index: int | None = None):
        """Register a recognizer; ``index`` sets its priority slot."""
        pair = (name, predicate)
        if index is None:
            self.recognizers.append(pair)
        else:
            self.recognizers.insert(index, pair)

    def set_transitions(self, table: dict):
        self.transitions = dict(table)

    def add_transitions(self, table: dict):
        self.transitions.update(table)

    # -- row construction ---------------------------------------------
    def new_row(self, url: str, kind: str, uri: str, ordinal, title,
                parent_uri) -> dict:
        row = {
            "url": url, "section_uri": uri, "kind": kind,
            "ordinal": ordinal, "title": title, "parent_uri": parent_uri,
            "text_parts": [], "position": self._pos,
        }
        self._pos += 1
        self.rows.append(row)
        return row

    # -- the machine ---------------------------------------------------
    def _match(self, state, chunk):
        for name, predicate in self.recognizers:
            if (state, name) in self.transitions and predicate(self, chunk):
                return name
        return None

    def parse(self, chunks, url: str, context: dict | None = None,
              root_kind: str = "body") -> list[dict]:
        """Run the machine over the chunk stream; returns the flat row
        list (document order; first row is the root/body row)."""
        ctx = context if context is not None else {}
        self.rows = []
        self._pos = 0
        self.chunk_cache.clear()
        root = self.new_row(url, root_kind, url, None, None, None)
        stream = Peekable(chunks)
        stack = [(self.initial_state, root)]
        while not stream.eof:
            state, row = stack[-1]
            chunk = stream.peek()
            name = self._match(state, chunk)
            if name is None:
                # no applicable recognizer → plain content of the
                # current container (the reference's paragraph default)
                self._content(None, chunk, row, ctx)
                stream.next()
                continue
            outcome = self.transitions[(state, name)]
            if outcome == self.POP:
                if len(stack) > 1:
                    stack.pop()  # chunk NOT consumed; retried in parent
                else:  # popping the root never happens in valid tables
                    self._content(None, chunk, row, ctx)
                    stream.next()
                continue
            if outcome[0] == "content":
                self._content(outcome[1], chunk, row, ctx)
                stream.next()
                continue
            if outcome[0] == "push":
                _tag, constructor, new_state = outcome
                child = constructor(self, chunk, row, ctx)
                stack.append((new_state, child))
                stream.next()
                continue
            raise ValueError("bad transition outcome %r" % (outcome,))
        for row in self.rows:
            row["text"] = " ".join(filter(None, row.pop("text_parts")))
        return self.rows

    def _content(self, fn, chunk, row, ctx):
        txt = (fn or self.default_content)(self, chunk, row, ctx)
        if txt:
            row["text_parts"].append(txt)
