"""Sections → RDF triples (document + section metadata).

Reference semantics being reproduced:

- document-level: ``parse_metadata_from_soup``
  (documentrepository.py:1277-1317) — ``rdf:type``, ``dcterms:title``
  (lang-tagged), ``dcterms:identifier`` (basefile),
  ``prov:wasGeneratedBy`` (qualified engine name);
- section-level: ``SectionalElement.as_xhtml`` / ``PreambleSection``
  (elements/elements.py:625-658, sources/tech/rfc.py:37-61) —
  ``rdf:type bibo:DocumentPart``, ``dcterms:title`` (NO lang tag,
  elements.py:640-644), ``bibo:chapter`` (ordinal),
  ``dcterms:isPartOf`` (parent resource);
- required-predicate validation (decorators.py:229-236): counts of
  documents missing required predicates, reported as data instead of
  raising.

Ray shape: a stateless vectorized ``map_batches`` over the sections
table — pure column manipulation, no python-per-row work beyond list
building over already-materialized columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import (
    BIBO_CHAPTER,
    BIBO_DOCPART,
    BIBO_DOCUMENT,
    DCTERMS_IDENTIFIER,
    DCTERMS_ISPARTOF,
    DCTERMS_TITLE,
    PROV_GENERATED,
    RDF_TYPE,
)

ENGINE_NAME = "ferenda_ray.pipelines.kg.KGPipeline"

TRIPLE_COLS = ("subj", "pred", "obj", "obj_is_literal", "obj_lang",
               "obj_datatype", "source_url")


def _table(subj, pred, obj, lit, lang, src) -> pa.Table:
    n = len(subj)
    return pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(pred, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "obj_is_literal": pa.array(lit, pa.bool_()),
        "obj_lang": pa.array(lang, pa.string()),
        "obj_datatype": pa.array([""] * n, pa.string()),
        "source_url": pa.array(src, pa.string()),
    })


def emit_meta_triples(batch: pa.Table, doc_type: str = BIBO_DOCUMENT,
                      engine_name: str = ENGINE_NAME) -> pa.Table:
    """sections batch → meta triples batch (flat_map-style fan-out)."""
    subj: list = []
    pred: list = []
    obj: list = []
    lit: list = []
    lang: list = []
    src: list = []

    def emit(s, p, o, is_lit, olang, url):
        subj.append(s); pred.append(p); obj.append(o)
        lit.append(is_lit); lang.append(olang); src.append(url)

    kinds = batch["kind"].to_pylist()
    urls = batch["url"].to_pylist()
    uris = batch["section_uri"].to_pylist()
    titles = batch["title"].to_pylist()
    ordinals = batch["ordinal"].to_pylist()
    parents = batch["parent_uri"].to_pylist()
    langs = batch["lang"].to_pylist()
    basefiles = batch["basefile"].to_pylist()
    errors = batch["error"].to_pylist() if "error" in batch.column_names else [None] * len(kinds)

    for k, url, uri, title, ordinal, parent, dlang, basefile, err in zip(
            kinds, urls, uris, titles, ordinals, parents, langs, basefiles, errors):
        if err:
            continue  # failed parses contribute no triples (entry.status analogue)
        if k == "body":
            emit(url, RDF_TYPE, doc_type, False, "", url)
            if title:
                emit(url, DCTERMS_TITLE, title, True, dlang or "", url)
            emit(url, DCTERMS_IDENTIFIER, basefile, True, "", url)
            emit(url, PROV_GENERATED, engine_name, True, "", url)
        else:
            emit(uri, RDF_TYPE, BIBO_DOCPART, False, "", url)
            if title:
                emit(uri, DCTERMS_TITLE, title, True, "", url)
            if ordinal:
                emit(uri, BIBO_CHAPTER, ordinal, True, "", url)
            if parent:
                emit(uri, DCTERMS_ISPARTOF, parent, False, "", url)
    return _table(subj, pred, obj, lit, lang, src)


DEFAULT_REQUIRED = (RDF_TYPE, DCTERMS_TITLE, DCTERMS_IDENTIFIER)


def validate_required_predicates(triples_ds, required=DEFAULT_REQUIRED):
    """Documents missing any required predicate (decorators.py:229-236
    semantics, as counters instead of DocumentRemovedError).

    Returns a small pandas DataFrame (url, missing_pred) — a groupby
    over (source_url, pred) partials, so only O(docs × |required|)
    rows ever shuffle.
    """
    req = pa.array(list(required), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(t["pred"], value_set=req),
                       pc.equal(t["subj"], t["source_url"]))
        f = t.filter(mask)
        return f.group_by(["source_url", "pred"]).aggregate([("pred", "count")])

    have = (
        triples_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source_url", "pred"])
        .sum("pred_count")
        .to_pandas()
    )
    missing = []
    by_url = have.groupby("source_url")["pred"].apply(set).to_dict()
    for url, preds in by_url.items():
        for r in required:
            if r not in preds:
                missing.append({"url": url, "missing_pred": r})
    import pandas as pd

    return pd.DataFrame(missing, columns=["url", "missing_pred"])
