"""RepoProfile — the reference's DocumentRepository-subclass surface
as one declarative config object.

The reference's extension model is "subclass DocumentRepository and
override hooks" (documentrepository.py:99-144 enumerates the entry
points: ``get_parser``, ``parse_metadata_from_soup``, ``facets()``,
citation grammars, URI minting, required predicates, patching …).
SURVEY §2.10 maps that to "a PipelineStep-style registry of
(parse_fn, sectionizer, mention grammars, uri formatters, facet
specs) config objects; subclass hooks become plain function
parameters of the pipeline builder" — this module is that registry:
every hook is data on ``RepoProfile``, and ``kg_pipeline_profiled``
builds the flagship DAG from it without any engine edits.

A new "repository" is therefore a ``RepoProfile(...)`` literal — the
Ray-native equivalent of the reference's subclass-per-source layout
(sources/tech/rfc.py, sources/general/static.py, …).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping, Sequence

from ..facet import DEFAULT_FACETS
from ..stages.triples import DEFAULT_REQUIRED


@dataclass(frozen=True)
class RepoProfile:
    """Everything the flagship pipeline can be configured with.

    ``parser``: pages-batch → sections-batch callable (the
    ``get_parser`` / ``parse()`` hook). ``None`` = the built-in HTML
    parser; ``composite=True`` = the CompositeRepository
    try-in-order fallback chain instead.
    ``grammars``: citation grammar families in priority order
    (``stages.mentions.CitationGrammar``; the LegalRef registry).
    ``gazetteer`` / ``sameas_edges``: entity-linking inputs
    (ontologies/commondata analogue). ``None`` = synthetic-corpus
    defaults.
    ``facets``: ``facet.Facet`` declarations (drive pivot + fulltext
    schema).
    ``required_predicates``: the render-validation set
    (decorators.py:229-236).
    ``patches``: {url: [(find, replace), ...]} overrides applied to
    the ``text`` column before parse (the fast-path override map).
    ``patchdir``: a directory of ``<urlencoded-url>.patch``
    unified-diff files (+ optional ``.desc`` sidecars) applied to the
    ``html`` column before parse — the reference's real
    ``patch_if_needed`` patchstore semantics
    (documentrepository.py:1352-1401; transform.load_patchdir /
    patch_if_needed).
    ``checkpoint_dir``: stage-checkpointed resumable run when set.
    """

    parser: Callable | None = None
    composite: bool = False
    grammars: Sequence | None = None
    gazetteer: Mapping[str, str] | None = None
    sameas_edges: Sequence[tuple] | None = None
    facets: Sequence = DEFAULT_FACETS
    required_predicates: Sequence[str] = DEFAULT_REQUIRED
    patches: Mapping[str, Mapping[str, str]] = field(default_factory=dict)
    patchdir: str | None = None
    checkpoint_dir: str | None = None
    linker_concurrency: tuple | None = None
    # embedding-linker fallback (stages/embed_link) for candidate
    # surfaces the fuzzy gazetteer misses. None = off (default: the
    # flagship output is byte-identical with or without this field).
    embed_entities: Mapping[str, str] | None = None
    embed_threshold: float = 0.55


def kg_pipeline_profiled(pages, profile: RepoProfile = RepoProfile(),
                         pages_slim=None) -> dict:
    """Build the flagship DAG from a RepoProfile. Returns the same
    dict contract as ``kg.kg_pipeline`` (sections, mentions, triples,
    canon) plus ``validation`` (lazy missing-predicate Dataset).

    With a default profile the output set is identical to
    ``kg_pipeline`` (tested in test_profile.py)."""
    import ray
    import ray.data

    from ..stages.canonicalize import (
        dedup_exact_triples,
        remap_triples,
        sameas_triples,
        union_find,
    )
    from ..stages.composite import composite_parse_batch
    from ..stages.mentions import MentionLinker, mention_triples
    from ..stages.parse_html import latest_per_url, parse_pages_batch
    from ..stages.transform import apply_patches
    from ..stages.triples import emit_meta_triples, \
        validate_required_predicates
    from . import corpus

    gazetteer = (dict(profile.gazetteer) if profile.gazetteer is not None
                 else corpus.gazetteer())
    sameas = (list(profile.sameas_edges)
              if profile.sameas_edges is not None else corpus.sameas_edges())

    pages = latest_per_url(pages, slim=pages_slim)
    if profile.patches:
        pages = apply_patches(pages, dict(profile.patches))
    if profile.patchdir:
        from ..stages.transform import load_patchdir, patch_if_needed

        loaded = load_patchdir(profile.patchdir)
        if loaded:
            pages = patch_if_needed(pages, loaded, col="html",
                                    desc_col=None)

    parse_fn = profile.parser or (
        composite_parse_batch if profile.composite else parse_pages_batch)
    sections = pages.map_batches(parse_fn, batch_format="pyarrow")
    if profile.checkpoint_dir:
        from ..state.manifest import checkpointed_stage

        sections = checkpointed_stage(sections, profile.checkpoint_dir,
                                      "parse")

    conc = profile.linker_concurrency
    if conc is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        conc = (max(2, ncpu // 4), max(4, ncpu - 2))
    linker_kwargs = {"gazetteer": ray.put(gazetteer)}
    if profile.grammars is not None:
        linker_kwargs["grammars"] = tuple(profile.grammars)
    if profile.embed_entities is not None:
        linker_kwargs["embed_entities"] = ray.put(
            dict(profile.embed_entities))
        linker_kwargs["embed_threshold"] = profile.embed_threshold
    mentions = sections.map_batches(
        MentionLinker,
        fn_constructor_kwargs=linker_kwargs,
        concurrency=conc,
        batch_format="pyarrow",
    )

    meta = sections.map_batches(emit_meta_triples, batch_format="pyarrow")
    refs = mentions.map_batches(mention_triples, batch_format="pyarrow")
    canon = union_find(sameas)
    triples = remap_triples(meta.union(refs), ray.put(canon))
    triples = triples.union(ray.data.from_arrow(sameas_triples(canon)))
    triples = dedup_exact_triples(triples, scope="doc_local")

    validation = validate_required_predicates(
        triples, required=tuple(profile.required_predicates),
        as_dataset=True)

    return {
        "pages": pages,
        "sections": sections,
        "mentions": mentions,
        "triples": triples,
        "canon": canon,
        "validation": validation,
    }
