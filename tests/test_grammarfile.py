"""Loadable grammar files (legalref.py:94-186 res/ebnf analogue):
the shipped default.json must reproduce default_grammars() scan
output EXACTLY, custom files register novel families with zero code
edits, and malformed files fail loudly at load time."""

import io
import json
import os

import pytest

from ferenda_ray.grammarfile import GrammarFileError, load_grammars
from ferenda_ray.stages.mentions import default_grammars, scan_citations

DEFAULT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "ferenda_ray", "resources",
    "grammars", "default.json")

SAMPLES = [
    "see section 2.2 of [RFC 2616] for details",
    "as defined in RFC 0822 and RFC 100",
    "per section 4.1. above",
    "Directive 2007/42/EC applies; see Article 6(1) of "
    "Directive 2007/42/EC and Article 3 of Directive 1995/46/EC",
    "Regulation (EC) No 45/2001 at https://eur.example.org/x, done.",
    "plain text with no citations at all",
]


def _scan_all(grammars):
    out = []
    for text in SAMPLES:
        matches, segments = scan_citations(
            text, "http://doc.example.org/d1", grammars=grammars)
        out.append((matches, segments))
    return out


def test_default_file_equals_code_registry():
    from_file = load_grammars(DEFAULT_PATH)
    from_code = default_grammars()
    assert [g.name for g in from_file] == [g.name for g in from_code]
    assert _scan_all(from_file) == _scan_all(from_code)


def test_base_override():
    gs = load_grammars(DEFAULT_PATH,
                       base_overrides={"rfc": "http://alt.test/r/"})
    matches, _ = scan_citations("see RFC 822", "http://d/1",
                                grammars=gs)
    assert matches[0][4] == "http://alt.test/r/822"


def test_novel_family_from_data_only():
    """A brand-new citation family — ISO standards — registered purely
    as data, including a custom URI space with transforms."""
    spec = {
        "spaces": {
            "iso": {"base": "https://iso.example.org/",
                    "templates": [
                        {"name": "std", "bindings": ["num", "year"],
                         "pattern": "{base}iso-{num}-{year}"},
                        {"name": "std_noyear", "bindings": ["num"],
                         "pattern": "{base}iso-{num}"}]}
        },
        "grammars": [
            {"name": "iso", "pattern":
             "ISO\\s+(\\d+)(?::(\\d{4}))?",
             "space": "iso", "template": None,
             "bindings": {"num": [{"group": 1}],
                          "year": [{"group": 2, "optional": True}]}},
        ],
    }
    # optional missing year -> empty string binding; use two grammars
    # instead to exercise priority order
    spec["grammars"] = [
        {"name": "iso_year", "pattern": "ISO\\s+(\\d+):(\\d{4})",
         "space": "iso", "template": "std",
         "bindings": {"num": [{"group": 1}],
                      "year": [{"group": 2}]}},
        {"name": "iso", "pattern": "ISO\\s+(\\d+)",
         "space": "iso", "template": "std_noyear",
         "bindings": {"num": [{"group": 1}]}},
    ]
    gs = load_grammars(spec)
    matches, _ = scan_citations(
        "conforms to ISO 8601:2004 and ISO 216 sizes",
        "http://d/1", grammars=gs)
    assert [(m[3], m[4]) for m in matches] == [
        ("iso_year", "https://iso.example.org/iso-8601-2004"),
        ("iso", "https://iso.example.org/iso-216")]


def test_file_like_and_dict_inputs():
    spec = json.load(open(DEFAULT_PATH))
    a = load_grammars(spec)
    b = load_grammars(io.StringIO(json.dumps(spec)))
    assert _scan_all(a) == _scan_all(b)


def test_malformed_files_raise():
    with pytest.raises(GrammarFileError):
        load_grammars({"grammars": []})
    with pytest.raises(GrammarFileError):
        load_grammars({"grammars": [{"name": "x", "pattern": "y",
                                     "space": "missing"}]})
    with pytest.raises(GrammarFileError):
        load_grammars({"spaces": {"s": {"base": "b", "templates": [
            {"name": "t", "bindings": ["a"], "pattern": "{base}{a}",
             "transforms": {"a": "evil_code"}}]}},
            "grammars": [{"name": "x", "pattern": "y", "space": "s",
                          "template": "t", "bindings": {}}]})


def test_linker_accepts_grammar_file_path(ray_session):
    """MentionLinker(grammars=<path>) loads the file once per actor —
    the mentions output equals the code-registry output."""
    import pandas as pd
    import ray.data as rd

    from ferenda_ray.stages.mentions import MentionLinker

    sections = pd.DataFrame({
        "url": ["http://d/1"],
        "section_uri": ["http://d/1#S1"],
        "kind": ["section"],
        "text": ["see section 2.2 of [RFC 2616] and "
                 "Directive 2007/42/EC"],
        "lang": ["en"], "title": ["t"], "source": ["s"]})
    ds = rd.from_pandas(sections)
    out_file = (ds.map_batches(
        MentionLinker, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"gazetteer": {},
                               "grammars": DEFAULT_PATH})
        .to_pandas())
    out_code = (ds.map_batches(
        MentionLinker, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"gazetteer": {}})
        .to_pandas())
    pd.testing.assert_frame_equal(
        out_file.sort_values(list(out_file.columns))
        .reset_index(drop=True),
        out_code.sort_values(list(out_code.columns))
        .reset_index(drop=True))
    assert set(out_file["kind"]) >= {"sec_rfc", "eu_directive"}
