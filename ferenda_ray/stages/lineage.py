"""Exchange-depth lineage guard for a Ray 2.49 streaming-executor
DAG hazard.

Observed reproducibly on Ray 2.49 (see CLAUDE.md): a lineage of the
form ``(exchangeA → union → exchangeB) → union → exchangeC`` — a
THIRD bucketed groupby consuming the union of a two-exchange subtree
with another branch of the same upstream — returns wrong results
(rows duplicated/lost at the final sort), while each subtree executed
standalone is correct. The repo-wide discipline is therefore: any
operator chains at most TWO exchanges with one union between them;
a third exchange must ``materialize()`` its input subtree first.

This module turns that prose rule into code. Exchanges built through
:func:`exchange` carry a depth count that propagates through
:func:`derive` (map-side ops) and :func:`union_tracked`; when a third
chained exchange would form, the guard either MATERIALIZES the input
(cutting the lineage — the documented safe fallback, default) or
raises :class:`ExchangeDepthError` (``on_limit="assert"``, for tests
and for callers that want to restructure instead of paying the
materialization).

Depth bookkeeping is a ``WeakKeyDictionary`` keyed on Dataset
objects: untracked datasets count as depth 0 (sources / freshly
materialized), entries die with their datasets, and nothing here
touches Ray internals. The guard is OPT-IN per operator — migrated
callers: ``dedup.scrub_duplicated_passages``, ``dedup.decontaminate``
(the family the hazard was discovered in).

At scale the materialization fallback is a real cost (it pins the
subtree in the object store), which is exactly why it only triggers
at depth 3 — the shapes this repo ships keep every lineage at ≤ 2.
"""

from __future__ import annotations

import weakref

# the proven-safe chain length: exchangeA → union → exchangeB
MAX_CHAINED_EXCHANGES = 2

_DEPTH: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


class ExchangeDepthError(RuntimeError):
    """A third chained exchange would form the forbidden DAG shape."""


def exchange_depth(ds) -> int:
    """Chained-exchange depth recorded for ``ds`` (0 if untracked —
    sources, freshly materialized datasets, or lineages built outside
    this module)."""
    return _DEPTH.get(ds, 0)


def derive(out, *inputs):
    """Record that ``out`` was derived from ``inputs`` by map-side
    (non-exchange) ops: depth is the max over inputs. Returns ``out``
    so calls chain inline."""
    d = max((exchange_depth(i) for i in inputs), default=0)
    if d:
        _DEPTH[out] = d
    return out


def union_tracked(first, *rest):
    """``first.union(*rest)`` with depth = max over all branches (a
    union adds no exchange but joins lineages, which is exactly where
    the hazard hides)."""
    out = first.union(*rest)
    return derive(out, first, *rest)


def exchange(ds, build, on_limit: str = "materialize"):
    """Apply ``build(ds) -> Dataset`` — an exchange-producing step
    (bucketed ``groupby(...).map_groups``, ``sort``, shuffling
    ``repartition``) — with depth accounting.

    If ``ds`` already sits at ``MAX_CHAINED_EXCHANGES``, the forbidden
    third-exchange shape is about to form:

    - ``on_limit="materialize"`` (default): ``ds.materialize()``
      first — the documented safe fallback; the new exchange then
      starts a fresh lineage at depth 1;
    - ``on_limit="assert"``: raise :class:`ExchangeDepthError` so the
      caller restructures (e.g. feeds pre-dedup keys forward as the
      scrub/decontaminate family does).
    """
    d = exchange_depth(ds)
    if d >= MAX_CHAINED_EXCHANGES:
        if on_limit == "assert":
            raise ExchangeDepthError(
                "exchange depth %d would chain a third bucketed "
                "exchange across unions — the Ray 2.49 wrong-results "
                "DAG shape; materialize() the subtree or flatten the "
                "lineage (see stages/lineage.py)" % (d + 1))
        ds = ds.materialize()
        d = 0
    out = build(ds)
    _DEPTH[out] = d + 1
    return out
