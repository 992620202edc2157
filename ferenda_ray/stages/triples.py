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


# ---------------------------------------------------------------------
# negative sampling for KG-embedding training
# ---------------------------------------------------------------------

def negative_samples(triples_ds, pred: str = "dcterms:subject",
                     k_neg: int = 2, num_entity_buckets: int = 8,
                     num_buckets: int = 64):
    """Corrupted-object negatives for KG-embedding training (TransE /
    Bordes et al. 2013 recipe — public literature: for each positive
    (s, p, o) draw K entities o' ≠ o uniformly from the entity set).
    Deterministic and SQL-replicable: the "draw" is an md5 of
    (s, o, i), so every negative is a pure function of the positive.

    Scale design — NO global sort, NO driver-side entity list. The
    entity set gets a two-level address instead of a global ordinal:
    md5-bucket ``b`` (``num_entity_buckets`` of them) + local rank
    ``r`` within the bucket (ordered by (md5(entity), entity)). Only
    the per-bucket COUNTS (``num_entity_buckets`` ints — bounded by
    construction) ride a broadcast; the draw picks ``b = h % B`` then
    ``r = (h // B) % count[b]``, and the negatives meet the entity
    table in ONE (b)-keyed bucketed exchange. Skew note: md5 buckets
    are balanced in expectation; the address join is uniform by
    construction.

    Returns Dataset(subj, pred, neg_obj, neg_ix). Negatives equal to
    the true object are dropped (both sides replicate the filter).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def _h15(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    def positives(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["pred"], pred)).select(["subj", "obj"])

    pos = triples_ds.map_batches(positives, batch_format="pyarrow")

    # entity table with (b, r) addresses: distinct objs → md5-bucket →
    # per-bucket dedup + rank in one exchange
    def ent_part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"entity": df["obj"].drop_duplicates()
                            .astype("object")})
        out["_bucket"] = [
            _h15(e) % num_entity_buckets for e in out["entity"]]
        return out

    def ent_rank(g: pd.DataFrame) -> pd.DataFrame:
        ents = sorted(set(g["entity"]),
                      key=lambda e: (hashlib.md5(e.encode())
                                     .hexdigest(), e))
        return pd.DataFrame({
            "b": pd.Series([int(g["_bucket"].iloc[0])] * len(ents),
                           dtype="int64"),
            "r": pd.Series(range(len(ents)), dtype="int64"),
            "entity": pd.Series(ents, dtype="object"),
        })

    ent = (pos.map_batches(ent_part, batch_format="pandas")
           .groupby("_bucket")
           .map_groups(ent_rank, batch_format="pandas")).materialize()

    # per-bucket entity counts: distributed partials, driver merges
    # only num_entity_buckets rows (bounded by construction — never
    # stream the entity table itself to the driver)
    def cnt_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("b", as_index=False)["r"].max()
        return pd.DataFrame({"b": out["b"].astype("int64"),
                             "m": out["r"].astype("int64")})

    counts: dict = {}
    for row in (ent.map_batches(cnt_part, batch_format="pandas")
                .to_pandas().itertuples(index=False)):
        counts[int(row.b)] = max(counts.get(int(row.b), -1), int(row.m))
    counts = {b: m + 1 for b, m in counts.items()}

    def draws(df: pd.DataFrame) -> pd.DataFrame:
        subjs, objs, bs, rs, ixs = [], [], [], [], []
        for s, o in zip(df["subj"], df["obj"]):
            for i in range(1, k_neg + 1):
                h = _h15("%s|%s|%d" % (s, o, i))
                b = h % num_entity_buckets
                c = counts.get(b, 0)
                if c == 0:
                    continue
                subjs.append(s); objs.append(o)
                bs.append(b); rs.append((h // num_entity_buckets) % c)
                ixs.append(i)
        out = pd.DataFrame({
            "subj": pd.Series(subjs, dtype="object"),
            "obj": pd.Series(objs, dtype="object"),
            "b": pd.Series(bs, dtype="int64"),
            "r": pd.Series(rs, dtype="int64"),
            "neg_ix": pd.Series(ixs, dtype="int64"),
        })
        return out

    from .joins import bucket_join

    need = pos.map_batches(draws, batch_format="pandas")

    def key_ent(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_k"] = df["b"].astype(str) + "\x1f" + df["r"].astype(str)
        return df

    joined = bucket_join(
        need.map_batches(key_ent, batch_format="pandas"),
        ent.map_batches(key_ent, batch_format="pandas"),
        left_on="_k", num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["entity"] != df["obj"]]
        return pd.DataFrame({
            "subj": d["subj"].to_numpy(dtype=object),
            "pred": np.full(len(d), pred, dtype=object),
            "neg_obj": d["entity"].to_numpy(dtype=object),
            "neg_ix": d["neg_ix"].to_numpy(dtype="int64"),
        })

    return joined.map_batches(finish, batch_format="pandas")
