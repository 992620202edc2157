"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init()`` / ``ray.shutdown()`` here or in any library code these
callables reach (pipelines auto-use the ambient session).

- ``entry()``: flagship KG pipeline over /root/testdata/sf0.001 —
  synthesized Common-Crawl-style pages → parse → mention/link →
  canonicalize → deduped (subj, pred, obj) triples Dataset.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operator family); each takes
  ``sf_dir`` and returns a Dataset / DataFrame / Table.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents, column
  names matched to the Ray outputs; omitted for non-SQL-expressible
  operators (full HTML parse, sketch-based near-dup, language-ID).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001; returns the triples Dataset."""
    from ferenda_ray.pipelines.kg import kg_pipeline

    return kg_pipeline(sf_dir=SF_SMOKE)["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    from ferenda_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from ferenda_ray.pipelines.queries import oracle_sql as _o

    return _o()
