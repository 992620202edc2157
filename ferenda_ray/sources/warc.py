"""WARC ingestion — the web-scale entry path for the flagship
pipeline: Common-Crawl-style ``*.warc`` / ``*.warc.gz`` files parsed
into the corpus page schema (url, warc_ts, html, text, lang) with
pure-stdlib code (ISO 28500 / WARC 1.0 format; the container ships no
warcio).

Reference semantics served: the ``download()`` family's acquisition
step (documentrepository.py:500-547 stores one fetched page per
basefile; SURVEY maps acquisition to a pre-materialized corpus) — at
100 TB the acquisition artifact IS a WARC archive, so this source is
what lets a crawler hand its raw archives straight to the engine.

Scale shape: ``ray.data.read_binary_files`` plans one task per
archive file (a WARC member is self-contained, so parsing is
embarrassingly parallel and the streaming executor pipelines
decompress → parse → downstream); per-file output is row-structured
Arrow, html payloads stay ``binary``. Malformed records land in an
``error`` column instead of killing the task (the per-row error
contract of parse_html)."""

from __future__ import annotations

import gzip
import io

import pyarrow as pa

PAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.string()),
    ("html", pa.binary()),
    ("http_status", pa.int32()),
    ("content_type", pa.string()),
    ("error", pa.string()),
])


def parse_warc_records(data: bytes):
    """Parse one WARC file's bytes (plain or gzip, including the
    per-record-member ``.warc.gz`` layout — ``gzip.decompress``
    consumes concatenated members) into dicts for ``response``
    records: url, warc_ts (WARC-Date), html (HTTP body bytes),
    http_status, content_type, error."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            # resync: find the next record marker
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        headers = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        block = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        status = -1
        ctype = ""
        body = block
        err = None
        try:
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0 and block[:5] in (b"HTTP/",):
                http_head = block[:http_end].decode("utf-8", "replace")
                hlines = http_head.split("\r\n")
                parts = hlines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for hl in hlines[1:]:
                    if hl.lower().startswith("content-type:"):
                        ctype = hl.split(":", 1)[1].strip()
                body = block[http_end + 4:]
            elif block[:5] == b"HTTP/":
                # starts like an HTTP response but the \r\n\r\n header
                # terminator never arrives: malformed — flag it rather
                # than passing raw headers through as body bytes
                err = "truncated HTTP headers in block"
            else:
                err = "no HTTP response header in block"
        except Exception as e:  # malformed record → error row
            err = "%s: %s" % (type(e).__name__, e)
        out.append({"url": url, "warc_ts": ts, "html": body,
                    "http_status": status, "content_type": ctype,
                    "error": err})
    return out


def read_warc(paths, **read_kwargs):
    """``*.warc`` / ``*.warc.gz`` files → Dataset with PAGE_SCHEMA
    (url, warc_ts, html binary, http_status, content_type, error).
    One read task per file; each task emits one Arrow block."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for payload in batch["bytes"]:
            rows.extend(parse_warc_records(payload.as_py()))
        if not rows:
            return PAGE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PAGE_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow")


def _warc_date_us(ts: str) -> int:
    """ISO-8601 WARC-Date → int64 epoch microseconds (0 on parse
    failure — a missing date must not kill the record)."""
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return 0


def pages_from_warc(warc_ds, keep_statuses=(200,)):
    """WARC rows → the flagship corpus page schema (url,
    warc_ts timestamp[us], html binary, text, lang): filter to kept
    HTTP statuses, and run the SAME extract_text / doc_lang path the
    synthesized corpus uses, so a WARC-fed run honors the
    byte-identical-text-per-url contract and plugs straight into
    ``latest_per_url`` → ``kg_pipeline``."""
    import numpy as np

    from ..htmltree import doc_lang, extract_text, parse_html

    statuses = set(keep_statuses)

    def convert(t: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for row in t.to_pylist():
            if row["http_status"] not in statuses or row["error"]:
                continue
            raw = bytes(row["html"])
            html = raw.decode("utf-8", "replace")
            try:
                tree = parse_html(html)
                text = extract_text(html)
                lang = doc_lang(tree) or ""
            except Exception:
                continue
            urls.append(row["url"])
            tss.append(_warc_date_us(row["warc_ts"]))
            htmls.append(raw)
            texts.append(text)
            langs.append(lang)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(tss, dtype="int64"),
                                pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string())})

    return warc_ds.map_batches(convert, batch_format="pyarrow")
