"""CompositeRepository semantics: try parsers in order until one
succeeds (compositerepository.py:57-337) — as a single map_batches
stage trying each parse strategy per row; the first that yields a
usable body wins, and the winning strategy is recorded per row
(the reference stores which subrepo parsed each basefile).

Also archive versioning (documentstore.py:348-354,
get_archive_version documentrepository.py:639-655): the non-latest
rows per url, kept as an archive table instead of being discarded.
"""

from __future__ import annotations

import pyarrow as pa


def composite_parse_batch(batch: pa.Table) -> pa.Table:
    """pages batch → sections rows, trying (1) HTML parse, then
    (2) plain-text sectionizer over the decoded payload. Adds a
    ``parser`` column ('html' | 'text') and keeps error rows only
    when every strategy failed."""
    from .parse_html import parse_pages_batch
    from .textparse import parse_text_batch

    html_out = parse_pages_batch(batch)
    err_mask = html_out["error"].to_pylist()
    failed_urls = {u for u, e in zip(html_out["url"].to_pylist(), err_mask) if e}
    ok = html_out.filter(
        pa.array([e is None for e in err_mask], pa.bool_()))
    ok = ok.append_column(
        "parser", pa.array(["html"] * ok.num_rows, pa.string()))
    if not failed_urls:
        return ok

    urls = batch["url"].to_pylist()
    keep = pa.array([u in failed_urls for u in urls], pa.bool_())
    retry = batch.filter(keep)
    texts = [
        (bytes(h).decode("utf-8", errors="replace") if h is not None else "")
        for h in retry["html"].to_pylist()
    ]
    retry_tbl = pa.table({
        "url": retry["url"],
        "text": pa.array(texts, pa.string()),
    })
    text_out = parse_text_batch(retry_tbl)
    # align to the sections schema of the html path
    text_out = (text_out
                .append_column("lang", pa.array(["und"] * text_out.num_rows))
                .append_column("basefile", pa.array(
                    [u.rstrip("/").rsplit("/", 1)[-1]
                     for u in text_out["url"].to_pylist()], pa.string()))
                .append_column("parser", pa.array(
                    ["text"] * text_out.num_rows, pa.string())))
    text_out = text_out.select(ok.column_names)
    return pa.concat_tables([ok, text_out])


def archive_versions(pages, dup_threshold: int | None = None,
                     slim=None):
    """The inverse of latest_per_url: all NON-latest versions per url
    (the reference's archive/ directory as a table).

    Duplicated-url sets below ``dup_threshold`` broadcast as a
    {url: max_ts} dict and filter map-side (zero movement of the html
    column); above it the winner table stays a Dataset and meets the
    pages in a url-hash-bucketed exchange instead — same rows either
    way (the forced-distributed sweep pins dup_threshold=0)."""
    import ray
    import pyarrow.compute as pc

    from .parse_html import DUP_BROADCAST_THRESHOLD, dup_url_stats
    if dup_threshold is None:
        dup_threshold = DUP_BROADCAST_THRESHOLD

    # shared recrawl pre-pass (latest_per_url's): partial aggregates
    # + one bucketed merge over just (url, warc_ts) — replaces the
    # full groupby().aggregate() exchange (measured 1.9 → sub-second
    # at sf0.1 bench scale)
    if slim is None:
        slim = pages.select_columns(["url", "warc_ts"])
    agg_ds = dup_url_stats(slim).materialize()
    n_dups = agg_ds.count()
    if n_dups == 0:
        return pages.limit(0)
    if n_dups > dup_threshold:
        from .joins import bucket_join

        winners = agg_ds.map_batches(
            lambda t: t.select(["url", "max_ts"]),
            batch_format="pyarrow")
        joined = bucket_join(pages, winners, left_on="url")
        return joined.map_batches(
            lambda t: t.filter(
                pc.not_equal(t["warc_ts"], t["max_ts"])).drop(
                    ["max_ts"]),
            batch_format="pyarrow")
    agg = agg_ds.to_pandas()
    winner = dict(zip(agg["url"], agg["max_ts"]))
    ref = ray.put(winner)

    def keep_archived(t: pa.Table) -> pa.Table:
        win = ray.get(ref)
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        mask = [u in win and ts != win[u] for u, ts in zip(urls, tss)]
        return t.filter(pa.array(mask, pa.bool_()))

    return pages.map_batches(keep_archived, batch_format="pyarrow")


def crawl_delta(pages, url_col: str = "url", ts_col: str = "warc_ts",
                text_col: str = "text", num_buckets: int = 64):
    """Recrawl change detection — the incremental-processing
    counterpart of ``download_if_needed``'s conditional-GET logic
    (``ferenda/documentrepository.py`` download_if_needed only
    re-parses when the fetched content differs): classify every URL's
    LATEST crawl as ``new`` (single version), ``changed`` (text hash
    differs from the previous version) or ``unchanged``. A delta-driven
    pipeline feeds only new+changed into parse.

    Scale shape: the map side reduces each page to (url, ts, md5) —
    text/html never reach the exchange — then ONE url-hash-bucketed
    exchange with a vectorized per-bucket sort + shift compare.
    Returns Dataset(url, status).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from .dedup import _bucket_of

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "url": df[url_col].astype("object"),
            "ts": df[ts_col].astype("int64"),
            "h": [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                  for t in df[text_col]],
        })
        out["_bucket"] = _bucket_of(out["url"], num_buckets)
        return out

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "ts"], kind="mergesort")
        prev_url = g["url"].shift(1)
        prev_h = g["h"].shift(1)
        is_latest = g["url"] != g["url"].shift(-1)
        first = g["url"] != prev_url
        status = np.where(first, "new",
                          np.where(g["h"] != prev_h, "changed",
                                   "unchanged"))
        m = is_latest.to_numpy()
        return pd.DataFrame({
            "url": pd.Series(g["url"].to_numpy()[m], dtype="object"),
            "status": pd.Series(status[m], dtype="object"),
        })

    return (pages.map_batches(prep, batch_format="pandas")
            .groupby("_bucket").map_groups(classify, batch_format="pandas"))
