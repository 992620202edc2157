"""Corpus-wide aggregates: facet pivot, stats, citation inversion,
TOC pagesets, news feeds.

Reference semantics reproduced:

- ``faceted_data()`` (documentrepository.py:2290-2380): corpus-wide
  ``SELECT DISTINCT ?uri ?facet...`` with OPTIONAL per facet →
  pivot of the triples table: ``groupby(subj) → min(obj) per pred``
  (min = deterministic stand-in for SPARQL's arbitrary binding
  order; exact-duplicate row removal comes free from the groupby).
- ``WSGIApp.stats()`` (wsgiapp.py:232-386): per-dimension Counter of
  selector values with per-(uri, observation) dedup →
  ``groupby(pred, obj) → count(distinct subj)``.
- ``relate_dependencies`` (documentrepository.py:2015-2077): inverted
  citation edges — for each referenced target, the set of citing
  documents; shuffle key = target url (the hot-target skew case —
  counts are pre-aggregated per batch before the exchange).
- ``analyze_article_citations`` (graphanalyze.py:268-329): top-N
  cited targets.
- ``toc_pagesets`` + ``toc_select_for_pages``
  (documentrepository.py:2852-2992): distinct selector values per
  facet, then rows grouped per value sorted by the facet key —
  selectors/keys are the deterministic pure functions of
  functions/text.py (never cluster-locale collation, SURVEY §7
  hard-point 4).
- ``news_feedsets`` / feeds (documentrepository.py:3232-3374,
  3524-3545): per-feed lists sorted by timestamp desc, paginated in
  chunks of ``archivesize``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..facet import Facet, facet_colnames, facet_predicates
from ..functions import firstletter, title_sortkey

DEFAULT_FACETS = ("rdf:type", "dcterms:title", "dcterms:identifier")


def _colname(pred: str) -> str:
    return pred.replace(":", "_")


def facet_pivot(triples_ds, facet_preds=DEFAULT_FACETS, num_buckets: int = 64):
    """triples → wide table (subj, rdf_type, dcterms_title, ...).

    Two-phase: a vectorized per-batch partial pivot (pandas
    pivot_table, min per (subj, pred)), then ONE groupby on an int
    hash bucket of subj with a vectorized merge inside each bucket —
    min-of-mins is exact, and no one-pandas-frame-per-subject group
    ever exists (at per-document subject cardinality that pattern
    measured ~10x slower; see memory ray-data-perf-pitfalls).

    ``facet_preds`` accepts plain predicate strings OR Facet
    declarations (ferenda_ray.facet) — the declarative form also
    carries the fulltext indexing type and selector/key callables."""
    pred_names = facet_predicates(facet_preds)
    preds = pa.array(pred_names, pa.string())
    cols = facet_colnames(facet_preds)

    def partial(t: pa.Table) -> pd.DataFrame:
        f = t.filter(pc.is_in(t["pred"], value_set=preds))
        df = f.select(["subj", "pred", "obj"]).to_pandas()
        if len(df) == 0:
            out = pd.DataFrame({"subj": pd.Series(dtype=object)})
            for c in cols:
                out[c] = pd.Series(dtype=object)
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        piv = df.pivot_table(index="subj", columns="pred", values="obj",
                             aggfunc="min")
        piv = piv.reindex(columns=pred_names)
        piv.columns = cols
        piv = piv.reset_index()
        h = pd.util.hash_pandas_object(piv["subj"], index=False).values
        piv["_bucket"] = (h % np.uint64(num_buckets)).astype("int32")
        return piv

    # NaN-safe vectorized min: object-dtype groupby.min raises on
    # str-vs-NaN comparison when a subject's partials disagree on which
    # facets are present; fill with a beyond-any-string sentinel, min,
    # then restore None
    _SENTINEL = "￿￿"

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        filled = g[["subj"] + cols].copy()
        filled[cols] = filled[cols].fillna(_SENTINEL)
        out = filled.groupby("subj", as_index=False)[cols].min()
        out[cols] = out[cols].where(out[cols] != _SENTINEL, None)
        return out

    return (
        triples_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def stats_aggregate(triples_ds, dims=("rdf:type",)):
    """Per-dimension value counts with per-(subj,value) dedup:
    (dim, value, n_subjects). Two-phase: local per-batch dedup
    combiner, then global groupby — only distinct partials shuffle."""
    dset = pa.array(list(dims), pa.string())

    def local(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["pred"], value_set=dset))
        df = f.select(["pred", "obj", "subj"]).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dim": [g["pred"].iloc[0]],
            "value": [g["obj"].iloc[0]],
            "n_subjects": [g["subj"].nunique()],
        })

    return (
        triples_ds.map_batches(local, batch_format="pyarrow")
        .groupby(["pred", "obj"])
        .map_groups(count_distinct, batch_format="pandas")
    )


def citation_edges(triples_ds):
    """dcterms:references triples → (source_url, target_url) edges
    (fragment stripped from the target: citations point at documents)."""

    def edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], "dcterms:references"))
        target = pc.replace_substring_regex(f["obj"], r"#.*$", "")
        return pa.table({"source_url": f["source_url"], "target_url": target})

    return triples_ds.map_batches(edges, batch_format="pyarrow")


def _target_bucket(df: pd.DataFrame, col: str, num_buckets: int) -> pd.DataFrame:
    df = df.copy()
    h = pd.util.hash_pandas_object(df[col], index=False).values
    df["_bucket"] = (h % np.uint64(num_buckets)).astype("int32")
    return df


def inbound_citations(triples_ds, num_buckets: int = 64):
    """Inverted citation index: (target_url, citing_urls, n_citations).
    The relate_dependencies / annotation-CONSTRUCT shape; shuffle key
    is an int hash bucket of the cited target (one Ray group per
    bucket, vectorized pandas groupby inside — never one frame per
    target at web citation cardinality)."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("target_url")["source_url"]
               .agg(lambda s: sorted(set(s))).reset_index())
        out.columns = ["target_url", "citing_urls"]
        out["n_citations"] = out["citing_urls"].map(len)
        return out

    return (
        citation_edges(triples_ds)
        .map_batches(lambda df: _target_bucket(df, "target_url", num_buckets),
                     batch_format="pandas")
        .groupby("_bucket")
        .map_groups(collect, batch_format="pandas")
    )


def annotations(triples_ds, num_buckets: int = 64):
    """Per-resource annotation rows — the reference's
    ``prep_annotation_file`` CONSTRUCT (documentrepository.py:2633-2688):
    for every cited target, the citing documents WITH their titles,
    ready to be joined into the presentation layer (render_xhtml's
    ``annotations_ds`` input).

    Exploded relational form (target_url, citing_url, citing_title);
    the title attachment is a distributed bucket hash join (neither
    side is broadcast — at 10^12 docs the title table is corpus-sized).
    """
    from ..stages.joins import bucket_join

    def edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], "dcterms:references"))
        target = pc.replace_substring_regex(f["obj"], r"#.*$", "")
        return pa.table({"citing_url": f["source_url"],
                         "target_url": target})

    def titles(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["pred"], "dcterms:title"),
                       pc.equal(t["subj"], t["source_url"]))
        f = t.filter(mask)
        return pa.table({"citing_url": f["subj"], "citing_title": f["obj"]})

    joined = bucket_join(
        triples_ds.map_batches(edges, batch_format="pyarrow"),
        triples_ds.map_batches(titles, batch_format="pyarrow"),
        "citing_url", num_buckets=num_buckets)
    return joined.map_batches(
        lambda df: df[["target_url", "citing_url", "citing_title"]],
        batch_format="pandas")


def top_cited(triples_ds, k: int = 10):
    """Top-k citation targets by distinct citing documents — partial
    per-batch dedup, global groupby-count, then a small sort+limit."""

    def local(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas().drop_duplicates()
        return _target_bucket(df, "target_url", 64)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("target_url")["source_url"]
               .nunique().reset_index())
        out.columns = ["target_url", "n"]
        return out

    counts = (
        citation_edges(triples_ds)
        .map_batches(local, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(count_distinct, batch_format="pandas")
    )
    return counts.sort(["n", "target_url"], descending=[True, False]).limit(k)


def toc_pagesets(facets_ds, binding: str = "dcterms_title",
                 facet: Facet | None = None):
    """Distinct selector values + doc counts (the small driver-facing
    pageset list). Selector = the Facet declaration's selector
    callable (facet.py:203-233; default Facet.firstletter) over the
    pivoted facet table."""
    sel = facet.selector if facet else (
        lambda v, row=None: firstletter(v) if v else "-")

    def add_letter(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[binding].fillna("")
        df = df.copy()
        df["value"] = [sel(v) for v in vals]
        return df[["subj", "value"]]

    return (
        facets_ds.map_batches(add_letter, batch_format="pandas")
        .groupby("value")
        .map_groups(
            lambda g: pd.DataFrame(
                {"value": [g["value"].iloc[0]], "n_docs": [g["subj"].nunique()]}),
            batch_format="pandas",
        )
    )


def toc_select_for_pages(facets_ds, binding: str = "dcterms_title",
                         facet: Facet | None = None):
    """Rows per TOC page, each page's docs sorted by the facet's key
    callable (default titlesortkey, util.py:724 semantics —
    precomputed deterministic key, never cluster-locale collation)."""
    sel = facet.selector if facet else (
        lambda v, row=None: firstletter(v) if v else "-")
    keyfn = facet.key if facet else (lambda v, row=None: title_sortkey(v))

    def add_keys(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[binding].fillna("")
        df = df.copy()
        df["value"] = [sel(v) for v in vals]
        df["sortkey"] = [keyfn(v) for v in vals]
        return df

    def page(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sortkey", "subj"], kind="mergesort")
        return pd.DataFrame({
            "value": [g["value"].iloc[0]],
            "uris": [list(g["subj"])],
            "titles": [list(g[binding].fillna(""))],
        })

    return (
        facets_ds.map_batches(add_keys, batch_format="pandas")
        .groupby("value")
        .map_groups(page, batch_format="pandas")
    )


def news_feeds(pages_ds, archivesize: int = 100):
    """Per-source feeds: entries sorted by warc_ts desc, paginated in
    chunks of ``archivesize`` (documentrepository.py:3308-3317,
    3524-3545). Feed key = url host (the repo/source analogue)."""

    def key(t: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            t["url"], r"^https?://([^/]+)/.*$", r"\1")
        return pa.table({
            "feed": host,
            "url": t["url"],
            "warc_ts": t["warc_ts"],
        })

    def paginate(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of each feed co-located in this bucket; sort once,
        # then a vectorized per-feed cumcount gives the page numbers
        g = g.sort_values(["feed", "warc_ts", "url"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.reset_index(drop=True)
        g["page"] = (g.groupby("feed").cumcount() // archivesize).astype("int32")
        return g[["feed", "page", "url", "warc_ts"]]

    return (
        pages_ds.map_batches(key, batch_format="pyarrow")
        .map_batches(lambda df: _target_bucket(df, "feed", 64),
                     batch_format="pandas")
        .groupby("_bucket")
        .map_groups(paginate, batch_format="pandas")
    )


def keyword_concepts(triples_ds):
    """keyword-repo semantics (sources/general/keyword.py:107-150):
    one concept row per distinct ``dcterms:subject`` object, with the
    documents that mention it — ``triples.filter(pred ==
    dcterms:subject).groupby(obj)``."""

    def narrow(t: pa.Table) -> pd.DataFrame:
        f = t.filter(pc.equal(t["pred"], "dcterms:subject"))
        df = pd.DataFrame({"concept": f["obj"].to_pandas(),
                           "doc": f["source_url"].to_pandas()})
        return _target_bucket(df, "concept", 64)

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("concept")["doc"]
               .agg(lambda s: sorted(set(s))).reset_index())
        out.columns = ["concept", "docs"]
        out["n_docs"] = out["docs"].map(len)
        return out

    return (
        triples_ds.map_batches(narrow, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(collect, batch_format="pandas")
    )


def skeleton_entities(triples_ds, broadcast_threshold: int | None = None,
                      force_bloom: bool = False):
    """skeleton-repo anti-join (sources/general/skeleton.py:99-120):
    URIs occurring as objects but never as subjects → stub entities.

    Routed through ``joins.membership_join``: subject sets below the
    broadcast threshold ship as a Python set (zero shuffle); a 10^9-
    subject corpus switches to the Bloom-prefilter + exact-recheck
    path automatically — both return identical results (tested via
    ``force_bloom``)."""
    from ..stages.joins import membership_join

    subj_ds = triples_ds.map_batches(
        lambda t: pa.table({"s": pc.unique(t["subj"].combine_chunks())}),
        batch_format="pyarrow",
    ).groupby("s").count()

    def uri_objs(t: pa.Table) -> pa.Table:
        f = t.filter(pc.invert(t["obj_is_literal"].combine_chunks()))
        return pa.table({
            "uri": pc.unique(f["obj"].combine_chunks())})

    objs = triples_ds.map_batches(uri_objs, batch_format="pyarrow")
    anti = membership_join(objs, "uri", subj_ds, "s", mode="anti",
                           broadcast_threshold=broadcast_threshold,
                           force_bloom=force_bloom)
    return (anti.groupby("uri").count()
            .map_batches(lambda df: df[["uri"]], batch_format="pandas"))


def fulltext_table(sections_ds, facets_by_repo: dict | None = None):
    """The fulltext-index table (relate_fulltext semantics,
    documentrepository.py:2079-2146): one row per addressable resource
    (document + each section), with its text and facet fields;
    resource dedup (2148-2155) is already guaranteed by section_uri
    uniqueness per document.

    With ``facets_by_repo`` ({repo: [Facet, ...]}), the merged index
    schema is derived up front and conflicting declarations raise
    SchemaConflictError BEFORE any data moves (fulltextindex.py:65-94).
    """
    if facets_by_repo:
        from ..facet import fulltext_schema

        fulltext_schema(facets_by_repo)  # raises on conflict

    def project(t: pa.Table) -> pa.Table:
        ok = pc.is_null(t["error"]) if "error" in t.column_names else None
        if ok is not None:
            t = t.filter(ok)
        return t.select(
            ["url", "section_uri", "kind", "title", "text", "lang", "basefile"])

    return sections_ds.map_batches(project, batch_format="pyarrow")
