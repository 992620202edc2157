"""resourcelabel resolution (facet.py:235-344 parity) and rendered-
XHTML validation (documentrepository.py:1684-1698 parity)."""

import ray.data as rd

from ferenda_ray.facet import (
    label_map,
    resourcelabel,
    resourcelabel_or_term,
    sortresource,
)
from ferenda_ray.sources.xhtml import validate_rendered


def _triples(rows):
    return rd.from_items([
        {"subj": s, "pred": p, "obj": o, "obj_is_literal": lit}
        for s, p, o, lit in rows
    ])


def test_label_map_priority(ray_session):
    ds = _triples([
        ("http://ex.org/a", "dcterms:title", "A title", True),
        ("http://ex.org/a", "rdfs:label", "A label", True),
        ("http://ex.org/b", "foaf:name", "B name", True),
        ("http://ex.org/b", "bibo:identifier", "B id", True),
        ("http://ex.org/c", "dcterms:creator", "not a label pred", True),
        ("http://ex.org/d", "rdfs:label", "http://ex.org/x", False),
    ])
    labels = label_map(ds)
    # rdfs:label outranks dcterms:title (reference probe order)
    assert labels["http://ex.org/a"] == "A label"
    # foaf:name outranks bibo:identifier
    assert labels["http://ex.org/b"] == "B name"
    # non-label predicates and non-literal objects never label
    assert "http://ex.org/c" not in labels
    assert "http://ex.org/d" not in labels


def test_label_map_cross_batch_priority(ray_session):
    # the winning predicate lives in a different block than the loser:
    # the driver merge must still apply the global priority
    a = _triples([("http://ex.org/a", "dcterms:title", "A title", True)])
    b = _triples([("http://ex.org/a", "skos:prefLabel", "A pref", True)])
    labels = label_map(a.union(b))
    assert labels["http://ex.org/a"] == "A pref"


def test_resourcelabel_fallbacks():
    labels = {"http://ex.org/chapman_hall": "Chapman & Hall"}
    assert resourcelabel("http://ex.org/chapman_hall",
                         labels) == "Chapman & Hall"
    # unlabeled: resourcelabel echoes the uri, _or_term shortens it
    assert resourcelabel("http://ex.org/nope", labels) == "http://ex.org/nope"
    assert resourcelabel_or_term("http://ex.org/nope", labels) == "nope"
    assert sortresource("http://ex.org/chapman_hall",
                        labels) == "chapmanhall"


def test_validate_rendered(ray_session):
    good = ('<body about="http://ex.org/g"><div about="#S1"/>'
            '<span about="#S1" property="x" content="y"/>'
            '<div about="#S2"/></body>')
    dup = ('<body about="http://ex.org/d"><div about="#S1"/>'
           '<div about="#S1"/></body>')
    toomany = ('<body about="http://ex.org/m">'
               + "".join('<div about="#S%d"/>' % i for i in range(5))
               + '</body>')
    ds = rd.from_items([
        {"url": "http://ex.org/g", "xhtml": good},
        {"url": "http://ex.org/d", "xhtml": dup},
        {"url": "http://ex.org/m", "xhtml": toomany},
    ])
    bad = validate_rendered(ds, max_resources=3).to_pandas()
    errs = dict(zip(bad["url"], bad["error"]))
    assert set(errs) == {"http://ex.org/d", "http://ex.org/m"}
    assert errs["http://ex.org/d"] == "Resource #S1 encountered twice"
    assert errs["http://ex.org/m"].startswith("Found over 3 resources (5)")
    # spans sharing their div's @about never count twice
    assert "http://ex.org/g" not in errs
