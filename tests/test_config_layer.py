"""The declarative extension surface: COIN-style URISpaces, the
citation grammar registry, and Facet declarations with fulltext
schema conflict detection."""

import re

import pandas as pd
import pytest

from ferenda_ray import facet as F
from ferenda_ray import uris
from ferenda_ray.stages import mentions


# --- URISpace ----------------------------------------------------------

def test_rfc_space_mints_round1_uris():
    sp = uris.rfc_space("https://rfc.example.org/rfc/")
    assert sp.mint({"num": "0822"}, template="rfc") == \
        "https://rfc.example.org/rfc/822"
    assert sp.mint({"num": "2616", "sec": "2.2."}, template="rfc_sec") == \
        "https://rfc.example.org/rfc/2616#S2.2"
    assert sp.mint({"doc_url": "http://d/1", "sec": "3"},
                   template="sec_only") == "http://d/1#S3"


def test_two_urispace_configs_mint_differently():
    """The same bindings mint different URIs under different declared
    spaces — the template space is config, not code."""
    values = {"year": "2007", "num": "42", "assoc": "EC"}
    a = uris.eulaw_space("https://eurlex.example.org/")
    b = uris.URISpace("https://laws.example.net/", [
        uris.URITemplate("directive", ("assoc", "year", "num"),
                         "{base}acts/{assoc}-{year}-{num}",
                         {"assoc": str.lower}),
    ])
    assert a.mint(values, template="directive") == \
        "https://eurlex.example.org/dir/2007/42/EC"
    assert b.mint(values) == "https://laws.example.net/acts/ec-2007-42"


def test_mint_first_applicable_template_and_error():
    sp = uris.URISpace("http://b/", [
        uris.URITemplate("full", ("x", "y"), "{base}{x}/{y}"),
        uris.URITemplate("short", ("x",), "{base}{x}"),
    ])
    assert sp.mint({"x": "1", "y": "2"}) == "http://b/1/2"
    assert sp.mint({"x": "1"}) == "http://b/1"
    with pytest.raises(uris.MintError):
        sp.mint({"z": "?"})


def test_space_wide_slug_transform():
    sp = uris.URISpace("http://b/", [
        uris.URITemplate("t", ("name",), "{base}{name}")],
        slug_transform=lambda s: s.lower().replace(" ", "-"))
    assert sp.mint({"name": "Hash Join"}) == "http://b/hash-join"


# --- grammar registry --------------------------------------------------

def test_default_grammars_match_round1_outputs():
    text = ("see section 2.2 of [RFC 2616] and RFC 0822 or "
            "Directive 2007/42/EC plus https://x.example.org/p, done")
    matches, _ = mentions.scan_citations(text, "http://d/1")
    by_kind = {k: uri for (_s, _e, _surf, k, uri) in matches}
    assert by_kind["sec_rfc"] == "https://rfc.example.org/rfc/2616#S2.2"
    assert by_kind["rfc"] == "https://rfc.example.org/rfc/822"
    assert by_kind["eu_directive"] == "https://eurlex.example.org/dir/2007/42/EC"
    assert by_kind["url"] == "https://x.example.org/p"


def test_register_new_grammar_family():
    """A DOI grammar slots in as data (priority position included) —
    no engine edits, the LegalRef extension contract."""
    doi_space = uris.URISpace("https://doi.example.org/", [
        uris.URITemplate("doi", ("doi",), "{base}{doi}")])
    doi = mentions.CitationGrammar(
        "doi", re.compile(r"doi:(10\.\d{4,}/[^\s,]+)"),
        lambda m, ctx: doi_space.mint({"doi": m.group(1)}))
    grammars = (doi,) + mentions.default_grammars()
    text = "cite doi:10.1000/xyz123 and RFC 42 here"
    matches, _ = mentions.scan_citations(text, "http://d/1",
                                         grammars=grammars)
    kinds = {k: uri for (_s, _e, _surf, k, uri) in matches}
    assert kinds["doi"] == "https://doi.example.org/10.1000/xyz123"
    assert kinds["rfc"] == "https://rfc.example.org/rfc/42"


def test_linker_accepts_custom_grammars(ray_session):
    import pyarrow as pa

    doi = mentions.CitationGrammar(
        "doi", r"doi:(10\.\d{4,}/[^\s,]+)",
        lambda m, ctx: "https://doi.example.org/" + m.group(1))
    linker = mentions.MentionLinker({}, grammars=(doi,))
    batch = pa.table({
        "url": ["http://d/1"], "section_uri": ["http://d/1#S1"],
        "kind": ["section"], "text": ["see doi:10.1000/abc now"]})
    out = linker(batch)
    assert out["kind"].to_pylist() == ["doi"]
    assert out["linked_uri"].to_pylist() == ["https://doi.example.org/10.1000/abc"]


# --- Facet declarations ------------------------------------------------

def test_fulltext_schema_conflict():
    a = [F.Facet("dcterms:title", indexingtype="text")]
    b = [F.Facet("dcterms:title", indexingtype="keyword")]
    with pytest.raises(F.SchemaConflictError):
        F.fulltext_schema({"repoA": a, "repoB": b})
    # agreeing declarations merge fine
    schema = F.fulltext_schema({"repoA": a, "repoB": a})
    assert schema == {"dcterms_title": "text"}


def test_facet_driven_pivot_equals_string_form(ray_session):
    import ray.data as rd

    from ferenda_ray.pipelines.facets import facet_pivot

    rows = []
    for i in range(20):
        rows.append({"subj": "s%02d" % i, "pred": "rdf:type",
                     "obj": "T", "obj_is_literal": False})
        rows.append({"subj": "s%02d" % i, "pred": "dcterms:title",
                     "obj": "title %d" % i, "obj_is_literal": True})
    ds = rd.from_items(rows)
    via_str = facet_pivot(ds, ("rdf:type", "dcterms:title")).to_pandas()
    via_facet = facet_pivot(ds, (
        F.Facet("rdf:type", indexingtype="keyword"),
        F.Facet("dcterms:title"))).to_pandas()
    key = ["subj", "rdf_type", "dcterms_title"]
    pd.testing.assert_frame_equal(
        via_str[key].sort_values("subj").reset_index(drop=True),
        via_facet[key].sort_values("subj").reset_index(drop=True))


def test_facet_selector_drives_pagesets(ray_session):
    import ray.data as rd

    from ferenda_ray.pipelines.facets import toc_pagesets

    year_facet = F.Facet("dcterms:issued", indexingtype="label",
                         selector=lambda v, row=None: (v or "")[:4] or "-")
    ds = rd.from_items([
        {"subj": "a", "dcterms_issued": "2021-03-01"},
        {"subj": "b", "dcterms_issued": "2021-07-09"},
        {"subj": "c", "dcterms_issued": "2022-01-01"},
    ])
    out = toc_pagesets(ds, binding="dcterms_issued",
                       facet=year_facet).to_pandas()
    got = dict(zip(out["value"], out["n_docs"]))
    assert got == {"2021": 2, "2022": 1}


# --- layered ops-time config (manager.py:863-910 cascade) -------------

def test_layered_config_cascade(tmp_path):
    from ferenda_ray.config import layered_config

    ini = tmp_path / "ferenda.ini"
    ini.write_text(
        "[ferenda_ray]\nworkers = 8\nthreshold = 0.7\nverbose = yes\n")
    defaults = {"workers": 4, "threshold": 0.55, "verbose": False,
                "name": "base", "pools": (2, 4)}
    # defaults only
    assert layered_config(defaults, env={}) == defaults
    # ini overrides defaults (typed)
    c = layered_config(defaults, inifile=str(ini), env={})
    assert c["workers"] == 8 and c["threshold"] == 0.7
    assert c["verbose"] is True
    # env overrides ini
    c = layered_config(defaults, inifile=str(ini),
                       env={"FERENDA_RAY_WORKERS": "16",
                            "FERENDA_RAY_POOLS": "3, 9"})
    assert c["workers"] == 16
    assert c["pools"] == (3, 9)
    # argv overrides env
    c = layered_config(defaults, inifile=str(ini),
                       env={"FERENDA_RAY_WORKERS": "16"},
                       argv=["--workers=32", "--verbose"])
    assert c["workers"] == 32 and c["verbose"] is True
    # unknown keys survive as strings
    c = layered_config(defaults, env={"FERENDA_RAY_EXTRA": "x"})
    assert c["extra"] == "x"


def test_env_overrides_profile_without_code_edits(tmp_path):
    """The verdict's acceptance case: an env var overrides a
    RepoProfile knob with zero code edits."""
    from ferenda_ray.config import profile_with_config
    from ferenda_ray.pipelines.profile import RepoProfile

    prof = RepoProfile(checkpoint_dir=None, embed_threshold=0.55)
    out = profile_with_config(
        prof,
        env={"FERENDA_RAY_CHECKPOINT_DIR": "/tmp/ckpt_env",
             "FERENDA_RAY_EMBED_THRESHOLD": "0.8",
             "FERENDA_RAY_LINKER_CONCURRENCY": "2,6"})
    assert out.checkpoint_dir == "/tmp/ckpt_env"
    assert out.embed_threshold == 0.8
    assert out.linker_concurrency == (2, 6)
    # untouched fields carry over; original profile unchanged
    assert out.facets is prof.facets
    assert prof.checkpoint_dir is None

    ini = tmp_path / "ferenda.ini"
    ini.write_text("[ferenda_ray]\ncheckpoint_dir = /tmp/ckpt_ini\n")
    # ini < env precedence
    out2 = profile_with_config(
        prof, inifile=str(ini),
        env={"FERENDA_RAY_CHECKPOINT_DIR": "/tmp/ckpt_env"})
    assert out2.checkpoint_dir == "/tmp/ckpt_env"
    out3 = profile_with_config(prof, inifile=str(ini), env={})
    assert out3.checkpoint_dir == "/tmp/ckpt_ini"
