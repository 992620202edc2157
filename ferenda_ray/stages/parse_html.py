"""The flagship ``map_batches`` stage: pages → sections (+ doc metadata).

Reference chain being reproduced (SURVEY §3.1): ``parse()``
(documentrepository.py:1191-1216) = soup → ``parse_metadata_from_soup``
(1277-1317: lang, <title> → dcterms:title, identifier, rdf:type,
prov:wasGeneratedBy) + ``parse_document_from_soup`` (1319-1350:
content selector "body") → elements tree (elements/html.py:23-71) →
sectionizer FSM (sources/tech/w3c.py:84-207).

Ray shape: stateless ``map_batches(parse_pages_batch,
batch_format="pyarrow")``. One output table (the sections table,
schemas.SECTIONS + lang/basefile/error columns); document-level
metadata rides on the ``kind == "body"`` row so a single parse pass
feeds both the sections sink and the triple emitter.

Error rows as data (SURVEY §7 hard-point 6): a page that fails to
parse produces a body row with ``error`` set instead of failing the
job — the manifest aggregates these; a single bad page must never
kill a 10^12-doc run.
"""

from __future__ import annotations

import pyarrow as pa

from ..htmltree import as_plaintext, doc_lang, doc_title, parse_html
from ..sectionize import sectionize

SECTION_COLS = (
    "url", "section_uri", "kind", "ordinal", "title", "parent_uri",
    "text", "position", "lang", "basefile", "error",
)


def basefile_from_url(url: str) -> str:
    """Stable per-document key — the trailing path segment
    (reference ``basefile_from_uri``, documentrepository.py:719-743)."""
    return url.rstrip("/").rsplit("/", 1)[-1]


def parse_pages_batch(batch: pa.Table, default_lang: str = "en") -> pa.Table:
    """pages(url, html[, lang]) → sections rows.

    Per-row work (HTML parsing is inherently sequential per document);
    vectorization happens across the batch via Arrow in/out. The
    ``html`` column is dropped on output — body blobs must not ride
    through downstream shuffles (SURVEY §7 hard-point 5).
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out: dict[str, list] = {c: [] for c in SECTION_COLS}

    def emit(url, section_uri, kind, ordinal, title, parent_uri, text,
             position, lang, basefile, error=None):
        out["url"].append(url)
        out["section_uri"].append(section_uri)
        out["kind"].append(kind)
        out["ordinal"].append(ordinal)
        out["title"].append(title)
        out["parent_uri"].append(parent_uri)
        out["text"].append(text)
        out["position"].append(position)
        out["lang"].append(lang)
        out["basefile"].append(basefile)
        out["error"].append(error)

    for url, html in zip(urls, htmls):
        basefile = basefile_from_url(url)
        try:
            root = parse_html(html)
            lang = doc_lang(root, default=default_lang)
            title = doc_title(root)
            body = root.find("body")
            if body is None:
                raise ValueError("no <body> element")
            fulltext = as_plaintext(body)
            rows = sectionize(body, url)
            for r in rows:
                if r["kind"] == "body":
                    # the body row carries doc-level metadata; its
                    # dedicated `text` is the FULL extracted body text
                    # (the byte-identity column), not just direct chunks
                    emit(url, url, "body", None, title, None, fulltext,
                         r["position"], lang, basefile)
                else:
                    emit(url, r["section_uri"], r["kind"], r["ordinal"],
                         r["title"], r["parent_uri"], r["text"],
                         r["position"], lang, basefile)
        except Exception as exc:  # error-as-data, never raise
            emit(url, url, "body", None, None, None, None, 0,
                 default_lang, basefile, error="%s: %s" % (type(exc).__name__, exc))

    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "section_uri": pa.array(out["section_uri"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "ordinal": pa.array(out["ordinal"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "parent_uri": pa.array(out["parent_uri"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "position": pa.array(out["position"], pa.int32()),
            "lang": pa.array(out["lang"], pa.string()),
            "basefile": pa.array(out["basefile"], pa.string()),
            "error": pa.array(out["error"], pa.string()),
        }
    )


DUP_BROADCAST_THRESHOLD = 5_000_000


def dup_url_stats(slim):
    """(url, n, max_ts, n_at_max) for every url appearing MORE THAN
    ONCE — the shared recrawl pre-pass of ``latest_per_url`` and
    ``composite.archive_versions``: per-batch partial aggregates over
    just (url, warc_ts), one hash-bucketed merge (64 groups, never a
    Ray group per url), duplicates only flow out. The heavy html
    column never moves."""
    import pandas as pd

    # merge emits Arrow with ONE explicit schema (empty groups
    # included): pandas 0-row object columns trip Ray's block size
    # estimator ("cannot call `vectorize` on size 0 inputs") and
    # mixed pandas/Arrow blocks draw RefBundle schema warnings
    _AGG_SCHEMA = pa.schema([("url", pa.string()), ("n", pa.int64()),
                             ("max_ts", pa.timestamp("us")),
                             ("n_at_max", pa.int64())])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("url", sort=False)["warc_ts"]
        mx = g.max()
        n = g.size()
        at_max = (df["warc_ts"].values ==
                  mx.reindex(df["url"]).values)
        nam = (df.loc[at_max].groupby("url", sort=False).size()
               .reindex(mx.index).fillna(0).astype("int64"))
        out = pd.DataFrame({"url": mx.index.to_numpy(dtype=object),
                            "n": n.to_numpy(),
                            "max_ts": mx.to_numpy(),
                            "n_at_max": nam.to_numpy()})
        # only urls that might be duplicated anywhere need the merge:
        # a url unique in its batch can still repeat across batches, so
        # everything flows on, but hash-bucketed
        h = pd.util.hash_pandas_object(out["url"], index=False).values
        out["_b"] = (h % 64).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _AGG_SCHEMA.empty_table()
        gg = g.groupby("url", sort=False)
        n = gg["n"].sum()
        mx = gg["max_ts"].max()
        at_gmax = (g["max_ts"].values == mx.reindex(g["url"]).values)
        nam = (g.loc[at_gmax].groupby("url", sort=False)["n_at_max"]
               .sum().reindex(mx.index).fillna(0).astype("int64"))
        out = pd.DataFrame({"url": n.index.to_numpy(dtype=object),
                            "n": n.to_numpy(),
                            "max_ts": mx.to_numpy(),
                            "n_at_max": nam.to_numpy()})
        out = out[out["n"] > 1]
        if not len(out):
            return _AGG_SCHEMA.empty_table()
        return pa.Table.from_pandas(out, schema=_AGG_SCHEMA,
                                    preserve_index=False)

    return (slim.map_batches(partial, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(merge, batch_format="pandas"))


def latest_per_url(pages, dup_threshold: int | None = None, slim=None):
    """Keep only the newest ``warc_ts`` row per url (recrawl dedup,
    SURVEY §2.9: ``groupby(url).max_by(warc_ts)``).

    Scale-aware plan: recrawled urls are typically a small fraction of
    the corpus, so instead of shuffling every html blob through a
    ``groupby(url)``, run ONE pre-pass over just (url, warc_ts):
    per-batch partial aggregate (count, max ts, count at max ts),
    bucketed merge, keep the urls that appear more than once (small),
    broadcast that {url: max_ts} map, and filter the full rows
    map-side — zero movement of the heavy ``html`` column. The
    count-at-max piggybacks on the same pass so timestamp ties (which
    need an exact grouped pick) are detected without a second scan.
    Falls back to a full groupby shuffle if the duplicate set exceeds
    ``dup_threshold`` (then it no longer fits a broadcast object).

    ``slim``: optional Dataset with just (url, warc_ts) from a cheaper
    source. Ray does not push ``select_columns`` down into the parquet
    scan, so for parquet-backed pages pass
    ``read_parquet(dir, columns=["url", "warc_ts"])`` here to keep the
    html blobs out of the pre-pass entirely.
    """
    import ray

    import zlib

    import pandas as pd

    if dup_threshold is None:
        dup_threshold = DUP_BROADCAST_THRESHOLD
    if slim is None:
        slim = pages.select_columns(["url", "warc_ts"])

    agg_ds = dup_url_stats(slim).materialize()
    n_dups = agg_ds.count()
    if n_dups == 0:
        return pages
    if n_dups > dup_threshold:
        # full-shuffle path: hash-bucket the urls (never one Ray group
        # per url at corpus cardinality), newest-first dedup per bucket
        import pandas as pd

        def bucketize(df):
            h = pd.util.hash_pandas_object(df["url"], index=False).values
            df = df.copy()
            df["_bucket"] = (h % 256).astype("int32")
            return df

        def newest(g):
            g = g.sort_values(["url", "warc_ts"], ascending=[True, False],
                              kind="mergesort")
            return g.drop_duplicates("url").drop(columns=["_bucket"])

        return (pages.map_batches(bucketize, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(newest, batch_format="pandas"))
    agg = agg_ds.to_pandas()
    winner = dict(zip(agg["url"], agg["max_ts"]))
    # urls whose max warc_ts is itself duplicated need an exact grouped
    # pick; the count-at-max from the single pre-pass identifies them
    ties = {u for u, nam in zip(agg["url"], agg["n_at_max"]) if nam > 1}
    state_ref = ray.put((winner, ties))

    def keep_latest(t: pa.Table) -> pa.Table:
        win, tie = ray.get(state_ref)
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        mask = [u not in tie and (u not in win or ts == win[u])
                for u, ts in zip(urls, tss)]
        return t.filter(pa.array(mask, pa.bool_()))

    latest = pages.map_batches(keep_latest, batch_format="pyarrow")
    if not ties:
        return latest

    def pick_tied(g: pa.Table) -> pa.Table:
        # exactly ONE survivor even when warc_ts ties: newest first,
        # content-hash tie-break (deterministic across runs/paths)
        tss = g["warc_ts"].to_pylist()
        htmls = g["html"].to_pylist()
        def _crc(h) -> int:
            if isinstance(h, str):  # html column accepts str or bytes
                h = h.encode("utf-8")
            return zlib.crc32(h or b"")

        order = sorted(
            range(len(tss)),
            key=lambda i: (tss[i], -_crc(htmls[i])),
            reverse=True,
        )
        return g.take([order[0]])

    def only_ties(t: pa.Table) -> pa.Table:
        _, tie = ray.get(state_ref)
        mask = [u in tie for u in t["url"].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    tied_latest = (
        pages.map_batches(only_ties, batch_format="pyarrow")
        .groupby("url")
        .map_groups(pick_tied, batch_format="pyarrow")
    )
    return latest.union(tied_latest)
