"""The FSM framework itself: the shipped grammars are pure
configurations, and a NOVEL grammar (appendix headings) can be
registered without touching engine code (the reference's
fsmparser.py extension contract)."""

import re

from ferenda_ray.fsm import FSMParser
from ferenda_ray.htmltree import Elem, as_plaintext
from ferenda_ray.sectionize import build_w3c_parser, sectionize


def _h(tag, text):
    e = Elem(tag)
    e.children.append(text)
    return e


def _p(text):
    e = Elem("p")
    e.children.append(text)
    return e


def test_w3c_parser_is_fsm_instance():
    p = build_w3c_parser()
    assert isinstance(p, FSMParser)
    assert ("body", "section") in p.transitions
    assert p.transitions[("section", "section")] == FSMParser.POP


def test_novel_appendix_grammar_no_engine_change():
    """Register an appendix grammar ('Appendix A: Title' headers open
    an appendix container under body) purely via add_recognizer /
    add_transitions on the stock W3C parser."""
    apx_re = re.compile(r"^Appendix ([A-Z]):\s+(.*)$")

    def is_appendix(parser, chunk):
        return (not isinstance(chunk, str) and chunk.tag in ("h1", "h2")
                and apx_re.match(as_plaintext(chunk)) is not None)

    def make_appendix(parser, chunk, parent, ctx):
        m = apx_re.match(as_plaintext(chunk))
        return parser.new_row(parent["url"], "appendix",
                              parent["url"] + "#A" + m.group(1),
                              m.group(1), m.group(2),
                              parent["section_uri"])

    p = build_w3c_parser()
    p.add_recognizer("appendix", is_appendix, index=0)
    p.add_transitions({
        ("body", "appendix"): ("push", make_appendix, "appendix"),
        # an appendix ends at the next appendix or depth-1 section
        ("appendix", "appendix"): FSMParser.POP,
        ("appendix", "section"): FSMParser.POP,
        # sections also end when an appendix starts
        ("section", "appendix"): FSMParser.POP,
        ("subsection", "appendix"): FSMParser.POP,
        ("subsubsection", "appendix"): FSMParser.POP,
    })

    chunks = [
        _p("intro"),
        _h("h1", "1 First"),
        _p("first text"),
        _h("h1", "Appendix A: Extra Material"),
        _p("appendix text"),
        _h("h1", "Appendix B: More"),
        _p("more text"),
    ]
    rows = p.parse(chunks, "http://d/x")
    kinds = [(r["kind"], r["ordinal"], r["title"]) for r in rows]
    assert kinds == [
        ("body", None, None),
        ("section", "1", "First"),
        ("appendix", "A", "Extra Material"),
        ("appendix", "B", "More"),
    ]
    assert rows[2]["section_uri"] == "http://d/x#AA"
    assert rows[2]["text"] == "appendix text"
    assert rows[3]["text"] == "more text"
    # the stock grammar is untouched by the extension
    body = Elem("body")
    body.children.extend([_p("intro"), _h("h1", "1 First"), _p("t")])
    stock = sectionize(body, "http://d/y")
    assert [r["kind"] for r in stock] == ["body", "section"]


def test_pop_cascades_from_depth():
    """A depth-1 header inside a subsubsection pops all the way out
    without consuming the chunk."""
    chunks = [
        _h("h1", "1 Top"),
        _h("h2", "1.1 Mid"),
        _h("h3", "1.1.1 Deep"),
        _p("deep text"),
        _h("h1", "2 Next"),
        _p("next text"),
    ]
    rows = build_w3c_parser().parse(chunks, "http://d/z")
    assert [(r["kind"], r["ordinal"]) for r in rows] == [
        ("body", None), ("section", "1"), ("subsection", "1.1"),
        ("subsubsection", "1.1.1"), ("section", "2")]
    assert rows[4]["text"] == "next text"
