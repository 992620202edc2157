"""Facet declarations — the reference's declarative facet system.

Re-implements the configuration surface of ``ferenda/facet.py:348-422``
(a Facet bundles the RDF predicate with selector / key /
identificator callables and indexing metadata) and the cross-repo
fulltext schema derivation with conflict detection
(``ferenda/fulltextindex.py:65-94``, ``SchemaConflictError`` at
78-81). A Facet list drives BOTH:

- the pivot query (``pipelines.facets.facet_pivot`` column set), and
- the fulltext index schema (``fulltext_schema``), where two repos
  declaring the same field with different indexing types is an error,
  exactly as the reference refuses to mix conflicting index schemas.

Selector/key defaults are the deterministic pure functions of
``functions/text.py`` (firstletter / title_sortkey / slugify) — never
cluster-locale collation (SURVEY §7 hard-point 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions import firstletter, slugify, title_sortkey


class SchemaConflictError(Exception):
    """Two repos declare the same fulltext field with incompatible
    indexing types (fulltextindex.py:78-81)."""


def _default_selector(value, row=None):
    return firstletter(value) if value else "-"


def _default_key(value, row=None):
    return title_sortkey(value or "")


def _default_identificator(value, row=None):
    return slugify(value or "")


@dataclass(frozen=True)
class Facet:
    """One facet declaration (facet.py:348-422 constructor surface).

    ``rdftype``: the predicate whose objects this facet selects over
    (the reference's first positional arg). ``indexingtype`` feeds the
    fulltext schema; ``dimension_label`` overrides the derived column
    name; ``use_for_toc`` / ``use_for_feed`` mirror the reference's
    routing flags.
    """
    rdftype: str
    label: str = ""
    pagetitle: str = ""
    indexingtype: str = "text"
    selector: object = _default_selector
    key: object = _default_key
    identificator: object = _default_identificator
    dimension_label: str = ""
    use_for_toc: bool = True
    use_for_feed: bool = False
    toplevel_only: bool = False

    @property
    def colname(self) -> str:
        return self.dimension_label or self.rdftype.replace(":", "_")


DEFAULT_FACETS = (
    Facet("rdf:type", indexingtype="keyword", use_for_toc=False),
    Facet("dcterms:title", indexingtype="text"),
    Facet("dcterms:identifier", indexingtype="label", use_for_toc=False),
)


def facet_predicates(facets) -> list[str]:
    """Accepts Facet objects or plain predicate strings (the round-1
    tuple form stays valid)."""
    return [f.rdftype if isinstance(f, Facet) else f for f in facets]


def facet_colnames(facets) -> list[str]:
    return [f.colname if isinstance(f, Facet) else f.replace(":", "_")
            for f in facets]


def fulltext_schema(facets_by_repo: dict) -> dict:
    """Merge every repo's facet declarations into one fulltext index
    schema {colname: indexingtype}; raise SchemaConflictError when two
    repos declare the same column with different indexing types
    (fulltextindex.py:65-94)."""
    schema: dict[str, tuple[str, str]] = {}
    for repo, facets in sorted(facets_by_repo.items()):
        for f in facets:
            if not isinstance(f, Facet):
                f = Facet(f)
            prev = schema.get(f.colname)
            if prev is not None and prev[0] != f.indexingtype:
                raise SchemaConflictError(
                    "field %r: repo %r declares indexingtype %r but repo %r "
                    "already declared %r"
                    % (f.colname, repo, f.indexingtype, prev[1], prev[0]))
            schema.setdefault(f.colname, (f.indexingtype, repo))
    return {name: typ for name, (typ, _repo) in schema.items()}


# ---------------------------------------------------------------------
# resource-label resolution (facet.py:235-344)
# ---------------------------------------------------------------------

LABEL_PREDICATES = ("rdfs:label", "skos:prefLabel", "skos:altLabel",
                    "dcterms:title", "dcterms:alternative", "foaf:name",
                    "bibo:identifier")


def label_map(triples_ds, predicates=LABEL_PREDICATES) -> dict:
    """{uri → best label} from a triples Dataset, honouring the
    reference's predicate priority (facet.py:258-263, the
    ``resource_graph.value`` probe order). Ray-native shape: each
    batch keeps only label-predicate literal rows and its best
    candidate per subject (map-side combine), then the labeled
    subjects — authority-table scale, orders of magnitude smaller
    than the corpus — merge on the driver into a broadcast-ready
    dict (``ray.put`` once, read per actor), the stand-in for the
    reference's in-memory ``resource_graph``."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    prio = {p: i for i, p in enumerate(predicates)}
    pred_arr = pa.array(list(predicates), pa.string())

    def partial(t):
        f = t.filter(pc.and_(pc.is_in(t["pred"], value_set=pred_arr),
                             t["obj_is_literal"]))
        df = pd.DataFrame({"subj": f["subj"].to_pylist(),
                           "rank": [prio[p] for p in f["pred"].to_pylist()],
                           "label": f["obj"].to_pylist()})
        if not len(df):
            return pd.DataFrame({"subj": pd.Series(dtype="object"),
                                 "rank": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="object")})
        # deterministic per-batch best: lowest rank, then lexicographic
        df = df.sort_values(["subj", "rank", "label"], kind="mergesort")
        return df.drop_duplicates("subj", keep="first")

    parts = triples_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return {}
    parts = parts.sort_values(["subj", "rank", "label"], kind="mergesort")
    best = parts.drop_duplicates("subj", keep="first")
    return dict(zip(best["subj"], best["label"]))


def resourcelabel(uri, labels: dict):
    """Reference ``Facet.resourcelabel`` (facet.py:235-263): the best
    label for ``uri``, or the uri itself when nothing labels it."""
    return labels.get(uri, uri)


def resourcelabel_or_term(uri, labels: dict):
    """Reference ``Facet.resourcelabel_or_qname`` (facet.py:334-340):
    label if any, else the uri's leaf term (CURIE-ish shortening)."""
    got = labels.get(uri)
    if got is not None:
        return got
    from .functions import uri_leaf

    return uri_leaf(uri) or uri


def sortresource(uri, labels: dict):
    """Reference ``Facet.sortresource`` (facet.py:293-311): sortable
    collation key of the resolved label."""
    return title_sortkey(resourcelabel(uri, labels))
