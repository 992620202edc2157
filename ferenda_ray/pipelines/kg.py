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
                     stage_name: str = "parse", pages_slim=None):
    """pages → sections (the flagship parse stage), optionally
    checkpointed to parquet for resume (see state/manifest.py).
    ``pages_slim``: cheap (url, warc_ts) source for the recrawl-dedup
    pre-pass (see latest_per_url)."""
    pages = latest_per_url(pages, slim=pages_slim)
    sections = pages.map_batches(parse_pages_batch, batch_format="pyarrow")
    if checkpoint_dir:
        from ..state.manifest import checkpointed_stage

        return checkpointed_stage(sections, checkpoint_dir, stage_name)
    return sections.materialize()


def kg_pipeline(sf_dir: str | None = None, pages=None,
                gazetteer: dict | None = None,
                sameas_edges: list | None = None,
                linker_concurrency=None,
                checkpoint_dir: str | None = None,
                pages_slim=None) -> dict:
    """Run the full pipeline; returns dict of lazy Datasets:
    ``sections``, ``mentions``, ``triples`` (canonicalized + deduped)
    and the ``canon`` map."""
    if pages is None:
        if sf_dir is None:
            raise ValueError("need sf_dir or pages")
        pages = corpus.pages_dataset(sf_dir)
        if pages_slim is None:
            pages_slim = corpus.pages_slim_dataset(sf_dir)
    if gazetteer is None:
        gazetteer = corpus.gazetteer()
    if sameas_edges is None:
        sameas_edges = corpus.sameas_edges()

    sections = sections_dataset(pages, checkpoint_dir,
                                pages_slim=pages_slim)

    meta = sections.map_batches(emit_meta_triples, batch_format="pyarrow")

    if linker_concurrency is None:
        # size the actor pool to the cluster: the linker is the only
        # actor stage in the DAG — a fixed small pool would cap the
        # whole pipeline's throughput at larger cluster sizes. The
        # floor is ncpu/4 so the pool doesn't spend the first seconds
        # of every run ramping from 2 actors.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        linker_concurrency = (max(2, ncpu // 4), max(4, ncpu - 2))
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
    # doc_local is exact here: subjects embed the emitting page's URL,
    # pages never split across batches, and the sameAs table is unique
    # — see dedup_exact_triples' docstring for the full argument
    triples = dedup_exact_triples(triples, scope="doc_local")

    return {
        "pages": pages,
        "sections": sections,
        "mentions": mentions,
        "triples": triples,
        "canon": canon,
    }


class TripleEmitter:
    """Actor stage fusing the two consumers of the sections table:
    sections batch → meta triples + mention/link triples + canonical
    remap, in one pass. Lets the flagship DAG run as a SINGLE
    streaming execution (parse stays stateless tasks; no
    mid-pipeline materialize barrier — the barrier was ~15% of wall
    and capped 8→32 scaling at ~0.7 by Amdahl)."""

    def __init__(self, gazetteer_ref, canon_ref):
        import ray as _ray

        from ..stages.mentions import MentionLinker

        gaz = (_ray.get(gazetteer_ref)
               if isinstance(gazetteer_ref, _ray.ObjectRef) else gazetteer_ref)
        self.linker = MentionLinker(gaz)
        self.canon = (_ray.get(canon_ref)
                      if isinstance(canon_ref, _ray.ObjectRef) else canon_ref)

    def __call__(self, sections: "pa.Table"):
        import pandas as pd
        import pyarrow as pa

        from ..stages.mentions import mention_triples
        from ..stages.triples import emit_meta_triples

        meta = emit_meta_triples(sections)
        refs = mention_triples(self.linker(sections))
        trip = pa.concat_tables([meta, refs]).combine_chunks()
        if self.canon:
            # only URI objects remap; subjects are page/section URIs
            # which are never canon-map keys in this DAG
            obj = trip["obj"].to_pandas()
            is_lit = trip["obj_is_literal"].to_pandas()
            mapped = obj.where(is_lit, obj.map(self.canon).fillna(obj))
            trip = trip.set_column(
                trip.schema.get_field_index("obj"), "obj",
                pa.array(mapped, pa.string()))
        return trip


def kg_triples_streaming(pages, gazetteer: dict | None = None,
                         sameas_edges: list | None = None,
                         emitter_concurrency=None, pages_slim=None):
    """Single-execution flagship path: pages → canonical deduped
    triples with zero mid-pipeline materialization. Output set is
    identical to ``kg_pipeline(...)["triples"]`` (tested)."""
    from ..stages.canonicalize import (
        dedup_exact_triples as _dedup,
        sameas_triples as _sameas,
        union_find as _uf,
    )

    if gazetteer is None:
        gazetteer = corpus.gazetteer()
    if sameas_edges is None:
        sameas_edges = corpus.sameas_edges()
    if emitter_concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        emitter_concurrency = (max(2, ncpu // 4), max(4, ncpu - 2))
    canon = _uf(sameas_edges)
    pages = latest_per_url(pages, slim=pages_slim)
    sections = pages.map_batches(parse_pages_batch, batch_format="pyarrow")
    trip = sections.map_batches(
        TripleEmitter,
        fn_constructor_kwargs={
            "gazetteer_ref": ray.put(gazetteer),
            "canon_ref": ray.put(canon),
        },
        concurrency=emitter_concurrency,
        batch_format="pyarrow",
    )
    trip = trip.union(ray.data.from_arrow(_sameas(canon)))
    return _dedup(trip, scope="doc_local")


class KGExtract:
    """Fused flagship actor stage: pages batch → canonicalized triples.

    One pass does parse → sections (in memory) → meta triples →
    mention scan + entity link → canonical remap. Fusing removes
    three stage boundaries and — decisively at scale — one full
    materialize+re-read of the entire triple set between parse and
    linking. The composable stages (sections_dataset + emit_meta_triples
    + MentionLinker) remain the right shape when intermediate tables
    are themselves outputs; this is the throughput path when only the
    final graph matters.

    All heavy state (gazetteer regex, canon map) is built once per
    actor from ``ray.put`` refs.
    """

    def __init__(self, gazetteer_ref, canon_ref, default_lang: str = "en"):
        import ray as _ray

        from ..stages.mentions import MentionLinker

        gaz = (_ray.get(gazetteer_ref)
               if isinstance(gazetteer_ref, _ray.ObjectRef) else gazetteer_ref)
        self.linker = MentionLinker(gaz)
        self.canon = (_ray.get(canon_ref)
                      if isinstance(canon_ref, _ray.ObjectRef) else canon_ref)
        self.default_lang = default_lang

    def __call__(self, batch):
        import pyarrow as pa

        from ..stages.mentions import mention_triples
        from ..stages.parse_html import parse_pages_batch
        from ..stages.triples import emit_meta_triples

        sections = parse_pages_batch(batch, default_lang=self.default_lang)
        meta = emit_meta_triples(sections)
        mentions = self.linker(sections)
        refs = mention_triples(mentions)
        trip = pa.concat_tables([meta, refs]).combine_chunks()
        if self.canon:
            import pandas as pd

            df = trip.to_pandas()
            df["subj"] = df["subj"].map(self.canon).fillna(df["subj"])
            is_uri = ~df["obj_is_literal"]
            mapped = df.loc[is_uri, "obj"].map(self.canon)
            df.loc[is_uri, "obj"] = mapped.fillna(df.loc[is_uri, "obj"])
            trip = pa.Table.from_pandas(df, preserve_index=False)
        return trip


def kg_triples_direct(pages, gazetteer: dict | None = None,
                      sameas_edges: list | None = None,
                      concurrency=None, pages_slim=None):
    """Throughput path: pages → deduped canonical triples with the
    fused extract stage (see KGExtract)."""
    if gazetteer is None:
        gazetteer = corpus.gazetteer()
    if sameas_edges is None:
        sameas_edges = corpus.sameas_edges()
    from ..stages.canonicalize import (
        dedup_exact_triples as _dedup,
        sameas_triples as _sameas,
        union_find as _uf,
    )

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (2, max(4, ncpu - 2))
    canon = _uf(sameas_edges)
    pages = latest_per_url(pages, slim=pages_slim)
    trip = pages.map_batches(
        KGExtract,
        fn_constructor_kwargs={
            "gazetteer_ref": ray.put(gazetteer),
            "canon_ref": ray.put(canon),
        },
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    trip = trip.union(ray.data.from_arrow(_sameas(canon)))
    return _dedup(trip)


def write_outputs(result: dict, out_dir: str) -> dict:
    """Materialize the pipeline to resumable partitioned parquet."""
    paths = {}
    for name in ("sections", "mentions", "triples"):
        path = os.path.join(out_dir, name)
        result[name].write_parquet(path)
        paths[name] = path
    return paths


def kg_pipeline_resumable(sf_dir: str | None, checkpoint_dir: str,
                          pages=None, gazetteer: dict | None = None,
                          sameas_edges: list | None = None,
                          pages_slim=None) -> dict:
    """Full flagship DAG with EVERY stage boundary checkpointed
    (parse → sections, mentions, triples). A re-run skips completed
    stages entirely (state/manifest.checkpointed_stage); deleting a
    later stage's directory re-runs only that stage and its
    descendants from the durable upstream parquet — the reference's
    ``needed()`` mtime short-circuit (documentstore.py:400-470)
    generalized to stage granularity."""
    from ..state.manifest import checkpointed_stage

    if pages is None:
        if sf_dir is None:
            raise ValueError("need sf_dir or pages")
        pages = corpus.pages_dataset(sf_dir)
        if pages_slim is None:
            pages_slim = corpus.pages_slim_dataset(sf_dir)
    if gazetteer is None:
        gazetteer = corpus.gazetteer()
    if sameas_edges is None:
        sameas_edges = corpus.sameas_edges()

    sections = sections_dataset(pages, checkpoint_dir,
                                pages_slim=pages_slim)  # stage "parse"

    gaz_ref = ray.put(gazetteer)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    mentions = sections.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"gazetteer": gaz_ref},
        concurrency=(max(2, ncpu // 4), max(4, ncpu - 2)),
        batch_format="pyarrow",
    )
    mentions = checkpointed_stage(mentions, checkpoint_dir, "mentions",
                                  upstream=("parse",))

    meta = sections.map_batches(emit_meta_triples, batch_format="pyarrow")
    refs = mentions.map_batches(mention_triples, batch_format="pyarrow")
    canon = union_find(sameas_edges)
    triples = remap_triples(meta.union(refs), ray.put(canon))
    triples = triples.union(ray.data.from_arrow(sameas_triples(canon)))
    triples = dedup_exact_triples(triples, scope="doc_local")
    triples = checkpointed_stage(triples, checkpoint_dir, "triples",
                                 url_col="source_url",
                                 upstream=("parse", "mentions"))

    return {"sections": sections, "mentions": mentions, "triples": triples,
            "canon": canon}
