"""EBNF → grammar-spec converter (ferenda_ray/ebnf.py).

The headline fixture is the REFERENCE'S OWN grammar files
(sources/legal/se/res/ebnf/{base,rattsfall}.ebnf, read at test time
from the read-only reference checkout): the converted regex must scan
real Swedish case-law citations, and the full conversion must load
through ``load_grammars`` and mint URIs — a migrating user's .ebnf
files load directly (legalref.py:111-186's load_ebnf + wiring in one
converter call). Unit tests pin the SimpleParse dialect corners:
FirstOf-binds-tighter-than-sequence precedence, leading-] char
classes, negation, lookahead, recursion rejection, capture aliasing.
"""

import os
import re

import pytest

import sys

sys.path.insert(0, "/root/repo")

from ferenda_ray import ebnf  # noqa: E402
from ferenda_ray.ebnf import (  # noqa: E402
    UnsupportedEBNF,
    ebnf_to_grammar_spec,
    parse_ebnf,
    production_regex,
)
from ferenda_ray.grammarfile import load_grammars  # noqa: E402
from ferenda_ray.stages.mentions import scan_citations  # noqa: E402

REF_EBNF = "/root/reference/ferenda/sources/legal/se/res/ebnf"
CAPTURES = ("DomstolRefID", "NJARefID", "ArRefID",
            "LopnrRefID", "SidnrRefID", "NotnrRefID")


def test_precedence_firstof_binds_tighter():
    # a, b/c, d  ==  a, (b/c), d   (simpleparse fo_group in seq_group)
    prods = parse_ebnf("x ::= 'a', 'b'/'c', 'd'")
    rx = re.compile(production_regex(prods, "x"))
    assert rx.fullmatch("abd")
    assert rx.fullmatch("acd")
    assert not rx.fullmatch("ab")      # the (a,b)/(c,d) reading
    assert not rx.fullmatch("cd")


def test_class_negation_lookahead_repetition():
    prods = parse_ebnf(
        "w ::= [a-z]+\n"
        "other ::= -(w/[0-9])\n"
        "opt ::= 'x', w?, ('y'/'z')*\n"
        "look ::= 'st', ?' '\n"
        "brack ::= [][()]+\n")
    assert re.compile(production_regex(prods, "other")).fullmatch("!")
    assert not re.compile(production_regex(prods, "other")).fullmatch("q")
    rx = re.compile(production_regex(prods, "opt"))
    assert rx.fullmatch("x") and rx.fullmatch("xabcyzz")
    lk = re.compile(production_regex(prods, "look"))
    assert lk.match("st meningen") and not lk.match("stycket")
    br = re.compile(production_regex(prods, "brack"))
    assert br.fullmatch("[]()[")


def test_recursion_and_unknowns_raise():
    with pytest.raises(UnsupportedEBNF):
        production_regex(parse_ebnf("a ::= 'x', a?"), "a")
    with pytest.raises(UnsupportedEBNF):
        production_regex(parse_ebnf("a ::= b"), "a")
    with pytest.raises(UnsupportedEBNF):
        # general expression negation is out of the subset
        production_regex(parse_ebnf("a ::= -('x', 'y')"), "a")


@pytest.mark.skipif(not os.path.isdir(REF_EBNF),
                    reason="reference checkout not present")
def test_reference_rattsfall_scans():
    prods = ebnf.load_ebnf_productions(
        os.path.join(REF_EBNF, "base.ebnf"),
        os.path.join(REF_EBNF, "rattsfall.ebnf"))
    pat, aliases = production_regex(prods, "rattsfallref",
                                    captures=CAPTURES,
                                    return_aliases=True)
    rx = re.compile(pat)
    cases = {               # (text, year-group value)
        "NJA 1994 s. 19": "1994",
        "RH 1999:102": "1999",
        "RÅ 2010 ref. 52": "2010",
        "NJA 2005 not 45": "2005",
        "MÖD 2004:12": "2004",
        "AD 1994 nr 102": "1994",
        "HFD 2011 ref. 30": "2011",
    }
    for text, year in cases.items():
        m = rx.search("se %s här" % text)
        assert m and m.group(0) == text, text
        got_year = next(v for g in aliases["ArRefID"]
                        if (v := m.group(g)) is not None)
        assert got_year == year
    assert rx.search("inget rättsfall här 123") is None


@pytest.mark.skipif(not os.path.isdir(REF_EBNF),
                    reason="reference checkout not present")
def test_reference_ebnf_through_load_grammars():
    """End to end: .ebnf files → spec → load_grammars → scan + mint,
    including the aliased-group optional-binding expansion."""
    spec = ebnf_to_grammar_spec(
        [os.path.join(REF_EBNF, "base.ebnf"),
         os.path.join(REF_EBNF, "rattsfall.ebnf")],
        grammars=[{
            "name": "rattsfall",
            "root": "rattsfallref",
            "space": "se_case",
            "template": "case",
            "captures": list(CAPTURES),
            "bindings": {
                "court": [{"group": "DomstolRefID"},
                          {"group": "NJARefID"}],
                "year": [{"group": "ArRefID"}],
                "num": [{"group": "LopnrRefID"},
                        {"group": "SidnrRefID"},
                        {"group": "NotnrRefID"}],
            },
        }],
        spaces={"se_case": {
            "base": "https://lagen.test/dom",
            "templates": [{"name": "case",
                           "bindings": ["court", "year", "num"],
                           "pattern": "{base}/{court}/{year}:{num}"}],
        }})
    grammars = load_grammars(spec)
    text = "jämför NJA 1994 s. 19 och RH 1999:102 i målet"
    matches, _ = scan_citations(text, "http://d/1", grammars=grammars)
    by_surface = {m[2]: m[4] for m in matches}
    assert by_surface == {
        "NJA 1994 s. 19": "https://lagen.test/dom/NJA/1994:19",
        "RH 1999:102": "https://lagen.test/dom/RH/1999:102",
    }
    # every kind tagged with the converted grammar's name
    assert {m[3] for m in matches} == {"rattsfall"}


@pytest.mark.skipif(not os.path.isdir(REF_EBNF),
                    reason="reference checkout not present")
def test_all_reference_citation_families_convert():
    """Every production of every citation .ebnf the reference ships
    parses, and each file's root-most productions expand to a
    compilable regex (base.ebnf merged first, like legalref.py)."""
    roots = {
        "rattsfall.ebnf": "rattsfallref",
        "forarbeten.ebnf": "forarbetenref",
        "eulag.ebnf": "eulagref",
        "euratt.ebnf": None,   # root name probed below
        "avg.ebnf": None,
        "lagrum.ebnf": None,
        "enklalagrum.ebnf": None,
        "kortlagrum.ebnf": None,
    }
    base = ebnf.parse_ebnf(
        ebnf.read_ebnf_text(os.path.join(REF_EBNF, "base.ebnf")))
    converted = 0
    for fn in sorted(os.listdir(REF_EBNF)):
        if not fn.endswith(".ebnf") or fn == "base.ebnf":
            continue
        prods = dict(base)
        prods.update(ebnf.parse_ebnf(
            ebnf.read_ebnf_text(os.path.join(REF_EBNF, fn))))
        root = roots.get(fn)
        candidates = [root] if root else [
            n for n in prods if n.lower().endswith("ref")]
        for cand in candidates:
            if cand in prods:
                try:
                    re.compile(production_regex(prods, cand))
                    converted += 1
                    break
                except UnsupportedEBNF:
                    continue
    assert converted >= 4  # at least the major citation families


def test_negation_merge_edge_chars():
    """Review-fix regression: merging char-level alternatives for
    negation must not create accidental ranges or class-negation
    markers (-([a-]/'z') rejects exactly {a,-,z}, not a..z)."""
    prods = parse_ebnf("bad ::= -([a-]/'z')\ncaret ::= -('^'/[b])")
    rx = re.compile(production_regex(prods, "bad"))
    assert rx.fullmatch("m")
    for ch in "a-z":
        assert not rx.fullmatch(ch), ch
    cx = re.compile(production_regex(prods, "caret"))
    assert cx.fullmatch("q")
    assert not cx.fullmatch("^") and not cx.fullmatch("b")


def test_comment_stripper_class_and_escape_precedence():
    """Review-fix regression: quote chars inside char classes (["'])
    and escaped quotes must not derail comment stripping; leading-]
    classes keep their body."""
    prods = parse_ebnf(
        "q ::= [\"']  # trailing comment\n"
        "brack ::= [][!\"#$%']+  # class containing # and quotes\n")
    rx = re.compile(production_regex(prods, "q"))
    assert rx.fullmatch('"') and rx.fullmatch("'")
    br = re.compile(production_regex(prods, "brack"))
    assert br.fullmatch('][!"#$%\'')
    assert not br.fullmatch("x")
