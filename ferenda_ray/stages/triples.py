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


def validate_required_predicates(triples_ds, required=DEFAULT_REQUIRED,
                                 as_dataset: bool = False):
    """Documents missing any required predicate (decorators.py:229-236
    semantics, as counters instead of DocumentRemovedError).

    Fully distributed: each batch ORs a per-document bitmask of the
    required predicates it sees (one tiny row per url per batch), a
    64-bucket merge ORs across batches, and only the FAILING documents
    are ever emitted — the driver never holds the per-document table.
    Only documents carrying at least one required predicate are
    checked (a url absent from the triple set entirely is a parse
    failure, caught upstream by the parse stage's ``error`` column).

    Returns a pandas DataFrame (url, missing_pred) of failures — small
    by assumption; pass ``as_dataset=True`` to keep it distributed
    when validating a corpus where failures may be corpus-scale.
    """
    import numpy as np
    import pandas as pd

    req = list(required)
    if len(req) > 63:
        raise ValueError("more than 63 required predicates")
    bit = {p: 1 << i for i, p in enumerate(req)}
    full = (1 << len(req)) - 1
    req_arr = pa.array(req, pa.string())

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"url": pd.Series(dtype="object"),
                             "bits": pd.Series(dtype="int64"),
                             "_b": pd.Series(dtype="int32")})

    def partial(t: pa.Table) -> pd.DataFrame:
        mask = pc.and_(pc.is_in(t["pred"], value_set=req_arr),
                       pc.equal(t["subj"], t["source_url"]))
        f = t.filter(mask)
        if f.num_rows == 0:
            return _empty()
        df = pd.DataFrame({
            "url": f["source_url"].to_pylist(),
            "bits": np.array([bit[p] for p in f["pred"].to_pylist()],
                             dtype="int64"),
        })
        g = (df.groupby("url", sort=False)["bits"]
             .agg(lambda s: int(np.bitwise_or.reduce(s.values))))
        out = pd.DataFrame({"url": g.index.to_numpy(dtype=object),
                            "bits": g.to_numpy(dtype="int64")})
        h = pd.util.hash_pandas_object(out["url"], index=False).values
        out["_b"] = (h % 64).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pa.Table:
        urls, miss = [], []
        if len(g):
            gg = (g.groupby("url", sort=False)["bits"]
                  .agg(lambda s: int(np.bitwise_or.reduce(s.values))))
            for url, bits in gg[gg != full].items():
                for i, p in enumerate(req):
                    if not (bits >> i) & 1:
                        urls.append(url)
                        miss.append(p)
        # typed arrow output: an empty pandas object column trips
        # Ray's block size estimator (np.vectorize on size-0)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "missing_pred": pa.array(miss, pa.string())})

    out = (triples_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("_b")
           .map_groups(merge, batch_format="pandas"))
    if as_dataset:
        return out
    pdf = out.to_pandas()
    if len(pdf) == 0:  # all-green: columns may be absent entirely
        return pd.DataFrame({"url": pd.Series(dtype="object"),
                             "missing_pred": pd.Series(dtype="object")})
    return (pdf.sort_values(["url", "missing_pred"])
            .reset_index(drop=True))
