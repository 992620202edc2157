"""ferenda_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of the ferenda reference (unstructured document
collections → structured Linked Data), re-expressed as idiomatic Ray
Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages (gazetteer linking,
compiled grammars), ``groupby``/``aggregate`` for the wide steps, and
streaming execution throughout.

Layout:

- ``functions/``  — pure scalar/vector functions (reference-semantics
  string, date, sort-key, URI helpers).
- ``sources/``    — readers/writers: pages parquet reader (column-pruned,
  latest-per-url), partitioned triple sink, N-Triples dump emitter.
- ``stages/``     — per-batch transforms: HTML parse + text extraction,
  sectionizer, mention detection, entity linking (actor pool), URI
  minting, canonicalization (connected components), dedup family
  (exact / MinHash-LSH / SimHash / embedding), similarity search,
  text analysis, multimodal plumbing.
- ``pipelines/``  — composed end-to-end DAGs (the flagship KG pipeline,
  facet pivot, stats, TOC/feeds) and the synthetic page corpus.
- ``state/``      — lineage manifest + resumable checkpoint helpers.
"""

__version__ = "0.1.0"
