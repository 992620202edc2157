"""Unit tests for the RDFS subClassOf closure behind
``queries.kg_type_inference`` — diamond DAGs, multi-level chains, and
the closure-vs-brute-force law on an arbitrary acyclic edge set."""

import itertools

from ferenda_ray.pipelines.queries import TYPE_ONTOLOGY, _subclass_closure


def _brute_closure(edges):
    """Reachability by |edges| rounds of path extension."""
    reach = {(c, p) for c, p in edges}
    for _ in range(len(edges)):
        reach |= {(a, d) for (a, b) in reach for (c, d) in reach if b == c}
    out = {}
    for c, p in reach:
        out.setdefault(c, set()).add(p)
    return {c: tuple(sorted(v)) for c, v in out.items()}


def test_chain_closure():
    clo = _subclass_closure([("a", "b"), ("b", "c"), ("c", "d")])
    assert clo["a"] == ("b", "c", "d")
    assert clo["b"] == ("c", "d")
    assert clo["c"] == ("d",)


def test_diamond_closure_dedups_paths():
    # a ⊑ b, a ⊑ c, b ⊑ d, c ⊑ d — d reachable twice, listed once
    clo = _subclass_closure([("a", "b"), ("a", "c"),
                             ("b", "d"), ("c", "d")])
    assert clo["a"] == ("b", "c", "d")


def test_closure_matches_brute_force():
    edges = [("doc", "biblio"), ("part", "biblio"), ("part", "frag"),
             ("biblio", "work"), ("frag", "work"), ("work", "thing")]
    assert _subclass_closure(edges) == _brute_closure(edges)


def test_shipped_ontology_is_acyclic_and_closed():
    clo = _subclass_closure(TYPE_ONTOLOGY)
    for c, supers in clo.items():
        assert c not in supers  # acyclic: no class is its own super
    # closure law: super's supers are included
    for c, supers in clo.items():
        for s in supers:
            for ss in clo.get(s, ()):
                assert ss in supers


def test_entailment_row_count_law():
    # entailed set size = 1 asserted + |closure(class)| per subject
    clo = _subclass_closure(TYPE_ONTOLOGY)
    for cls in ("bibo:Document", "bibo:DocumentPart"):
        assert len(clo[cls]) == 3  # biblio → foaf:Document → owl:Thing
