"""WARC ingestion source (ISO 28500, stdlib-only): synthetic
archives — plain, whole-file gzip, and per-record-member gzip (the
Common-Crawl .warc.gz layout) — parse to identical rows; non-response
records skip; pages_from_warc reproduces the corpus page schema and
the extract_text contract, and feeds latest_per_url → parse."""

import gzip

import pytest

from ferenda_ray.sources.warc import (
    PAGE_SCHEMA,
    pages_from_warc,
    parse_warc_records,
    read_warc,
)


def _record(wtype, url, date, block: bytes) -> bytes:
    head = ("WARC/1.0\r\n"
            "WARC-Type: %s\r\n"
            "WARC-Target-URI: %s\r\n"
            "WARC-Date: %s\r\n"
            "Content-Length: %d\r\n" % (wtype, url, date, len(block)))
    return head.encode() + b"\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html") -> bytes:
    return (("HTTP/1.1 %d OK\r\nContent-Type: %s\r\n"
             "Content-Length: %d\r\n" % (status, ctype, len(body)))
            .encode() + b"\r\n" + body)


HTML_A = (b"<html lang='en'><head><title>Doc A</title></head>"
          b"<body><h1>Doc A</h1><p>alpha text</p></body></html>")
HTML_B = (b"<html lang='sv'><head><title>Doc B</title></head>"
          b"<body><h1>Doc B</h1><p>beta text</p></body></html>")


def _warc_records() -> list:
    return [
        _record("warcinfo", "", "2024-01-01T00:00:00Z",
                b"software: test\r\n"),
        _record("request", "http://w.test/a", "2024-01-02T00:00:00Z",
                b"GET /a HTTP/1.1\r\n"),
        _record("response", "http://w.test/a",
                "2024-01-02T00:00:00Z", _http(HTML_A)),
        _record("response", "http://w.test/missing",
                "2024-01-02T01:00:00Z", _http(b"gone", status=404)),
        _record("response", "http://w.test/b",
                "2024-01-03T12:30:00Z", _http(HTML_B))]


def _warc_bytes() -> bytes:
    return b"".join(_warc_records())


def test_parse_plain_and_gzip_variants():
    raw = _warc_bytes()
    whole_gz = gzip.compress(raw)
    # Common-Crawl layout: one gzip MEMBER per record
    member_gz = b"".join(gzip.compress(r) for r in _warc_records())
    got_plain = parse_warc_records(raw)
    assert parse_warc_records(whole_gz) == got_plain
    assert parse_warc_records(member_gz) == got_plain
    rows = got_plain
    assert [r["url"] for r in rows] == [
        "http://w.test/a", "http://w.test/missing", "http://w.test/b"]
    assert [r["http_status"] for r in rows] == [200, 404, 200]
    assert rows[0]["html"] == HTML_A
    assert rows[2]["html"] == HTML_B
    assert rows[0]["content_type"] == "text/html"
    assert all(r["error"] is None for r in rows)


def test_truncated_http_headers_flagged():
    """A response block that starts with HTTP/ but never terminates
    its headers (\\r\\n\\r\\n) is malformed: the error column must say
    so rather than passing raw header bytes through as body."""
    bad = _record("response", "http://w.test/bad",
                  "2024-01-04T00:00:00Z",
                  b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")
    rows = parse_warc_records(bad)
    assert len(rows) == 1
    assert rows[0]["error"] == "truncated HTTP headers in block"
    assert rows[0]["http_status"] == -1


def test_read_warc_dataset(ray_session, tmp_path):
    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_warc_bytes()))
    ds = read_warc([str(tmp_path / "a.warc"),
                    str(tmp_path / "b.warc.gz")])
    df = ds.to_pandas()
    assert len(df) == 6  # 3 responses per file
    assert set(df.columns) == set(PAGE_SCHEMA.names)
    assert (df["http_status"] == 200).sum() == 4


def test_pages_from_warc_feeds_flagship(ray_session, tmp_path):
    from ferenda_ray.htmltree import extract_text
    from ferenda_ray.stages.parse_html import (
        latest_per_url,
        parse_pages_batch,
    )

    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    pages = pages_from_warc(read_warc([str(tmp_path / "a.warc")]))
    df = pages.to_pandas().sort_values("url").reset_index(drop=True)
    # 404 filtered; timestamps parsed; text honors the extract
    # contract byte-for-byte
    assert list(df["url"]) == ["http://w.test/a", "http://w.test/b"]
    assert str(df["warc_ts"][0]).startswith("2024-01-02")
    for _, row in df.iterrows():
        html = bytes(row["html"]).decode("utf-8")
        assert row["text"] == extract_text(html)
    assert list(df["lang"]) == ["en", "sv"]

    sections = (latest_per_url(pages)
                .map_batches(parse_pages_batch, batch_format="pyarrow")
                .to_pandas())
    assert set(sections[sections["kind"] == "body"]["url"]) == {
        "http://w.test/a", "http://w.test/b"}
