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
