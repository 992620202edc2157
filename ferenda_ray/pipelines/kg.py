"""The flagship KG-construction DAG (SURVEY §7 target dataflow).

read_parquet(pages) ─ latest_per_url ─ map_batches(ParseHTML)
  ├─ meta triples (stateless map)
  ├─ map_batches(MentionLinker, actor pool) ─ mention triples
  ├─ canonicalize (sameAs connected components → broadcast remap)
  ├─ exact triple dedup (local combiner + groupby)
  └─ sinks: partitioned parquet, dump.nt, fulltext table, facet pivot

Everything stays a lazy ``ray.data.Dataset`` under streaming
execution; the one intentional materialization is the post-parse
sections table (html dropped — the natural stage boundary, mirroring
the reference's ``parsed/*.xhtml`` artifacts), which both the triple
emitter and the mention linker consume. With ``checkpoint_dir`` set,
that boundary becomes a resumable parquet checkpoint instead.
"""

from __future__ import annotations

import os

import ray

from ..stages.canonicalize import (
    dedup_exact_triples,
    remap_triples,
    sameas_triples,
    union_find,
)
from ..stages.mentions import MentionLinker, mention_triples
from ..stages.parse_html import latest_per_url, parse_pages_batch
from ..stages.triples import emit_meta_triples
from . import corpus


def sections_dataset(pages, checkpoint_dir: str | None = None,
                     stage_name: str = "parse"):
    """pages → sections (the flagship parse stage), optionally
    checkpointed to parquet for resume (see state/manifest.py)."""
    pages = latest_per_url(pages)
    sections = pages.map_batches(parse_pages_batch, batch_format="pyarrow")
    if checkpoint_dir:
        from ..state.manifest import checkpointed_stage

        return checkpointed_stage(sections, checkpoint_dir, stage_name)
    return sections.materialize()


def kg_pipeline(sf_dir: str | None = None, pages=None,
                gazetteer: dict | None = None,
                sameas_edges: list | None = None,
                linker_concurrency=(2, 12),
                checkpoint_dir: str | None = None) -> dict:
    """Run the full pipeline; returns dict of lazy Datasets:
    ``sections``, ``mentions``, ``triples`` (canonicalized + deduped)
    and the ``canon`` map."""
    if pages is None:
        if sf_dir is None:
            raise ValueError("need sf_dir or pages")
        pages = corpus.pages_dataset(sf_dir)
    if gazetteer is None:
        gazetteer = corpus.gazetteer()
    if sameas_edges is None:
        sameas_edges = corpus.sameas_edges()

    sections = sections_dataset(pages, checkpoint_dir)

    meta = sections.map_batches(emit_meta_triples, batch_format="pyarrow")

    gaz_ref = ray.put(gazetteer)
    mentions = sections.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"gazetteer": gaz_ref},
        concurrency=linker_concurrency,
        batch_format="pyarrow",
    )
    refs = mentions.map_batches(mention_triples, batch_format="pyarrow")

    # canonicalization: the entity/sameAs graph is input-side config
    # here (authority-derived) — exact union-find on the driver,
    # broadcast for the remap. canonical_map() switches to the
    # distributed CC when edges exceed the broadcast threshold.
    canon = union_find(sameas_edges)
    canon_ref = ray.put(canon)

    triples = meta.union(refs)
    triples = remap_triples(triples, canon_ref)
    sameas = ray.data.from_arrow(sameas_triples(canon))
    triples = triples.union(sameas)
    triples = dedup_exact_triples(triples)

    return {
        "pages": pages,
        "sections": sections,
        "mentions": mentions,
        "triples": triples,
        "canon": canon,
    }


def write_outputs(result: dict, out_dir: str) -> dict:
    """Materialize the pipeline to resumable partitioned parquet."""
    paths = {}
    for name in ("sections", "mentions", "triples"):
        path = os.path.join(out_dir, name)
        result[name].write_parquet(path)
        paths[name] = path
    return paths
