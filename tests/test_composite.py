"""CompositeRepository fallback parse + archive versions + error-row
integration."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ferenda_ray.stages.composite import archive_versions, composite_parse_batch
from ferenda_ray.stages.parse_html import parse_pages_batch


def test_composite_fallback_to_text_parser():
    batch = pa.table({
        "url": ["http://d/1", "http://d/2"],
        "html": [
            b"<html><body><h1>1 Intro</h1><p>html doc</p></body></html>",
            b"Plain text memo\n\n1. First\n\nbody of first section",
        ],
    })
    out = composite_parse_batch(batch)
    parser_by_url = {
        (u, k): p for u, k, p in zip(out["url"].to_pylist(),
                                     out["kind"].to_pylist(),
                                     out["parser"].to_pylist())
    }
    assert parser_by_url[("http://d/1", "body")] == "html"
    assert parser_by_url[("http://d/2", "body")] == "text"
    # the text path sectionized the memo
    sec = out.filter(pc.equal(out["url"], "http://d/2"))
    kinds = set(sec["kind"].to_pylist())
    assert "section" in kinds


def test_error_rows_never_kill_pipeline():
    """A poisoned page inside a good batch → good pages parse, the bad
    one becomes an error row that emits no triples."""
    from ferenda_ray.stages.triples import emit_meta_triples

    batch = pa.table({
        "url": ["http://d/ok", "http://d/bad"],
        "html": [b"<html lang='en'><head><title>T</title></head>"
                 b"<body><p>fine</p></body></html>",
                 b"\x00\xff not html no body"],
    })
    sections = parse_pages_batch(batch)
    errs = {u: e for u, e in zip(sections["url"].to_pylist(),
                                 sections["error"].to_pylist()) if e}
    assert "http://d/bad" in errs
    triples = emit_meta_triples(sections)
    assert all(s != "http://d/bad" for s in triples["subj"].to_pylist())
    assert any(s == "http://d/ok" for s in triples["subj"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_latest_per_url_timestamp_tie():
    """Two crawl rows with the same url AND the same max warc_ts must
    yield exactly ONE survivor, deterministically (content-hash
    tie-break) — regression for the both-rows-pass bug."""
    import ray.data as rd

    from ferenda_ray.stages.parse_html import latest_per_url

    rows = [
        {"url": "http://t/1", "warc_ts": 100, "html": b"<p>version A</p>"},
        {"url": "http://t/1", "warc_ts": 100, "html": b"<p>version B</p>"},
        {"url": "http://t/2", "warc_ts": 50, "html": b"<p>only</p>"},
    ]
    out1 = latest_per_url(rd.from_items(rows)).to_pandas()
    assert len(out1) == 2
    assert out1["url"].is_unique
    survivor1 = out1.set_index("url").loc["http://t/1", "html"]
    out2 = latest_per_url(rd.from_items(rows)).to_pandas()
    survivor2 = out2.set_index("url").loc["http://t/1", "html"]
    assert bytes(survivor1) == bytes(survivor2)  # deterministic pick


@pytest.mark.usefixtures("ray_session")
def test_archive_versions(sf_smoke):
    from ferenda_ray.pipelines.corpus import pages_dataset

    pages = pages_dataset(sf_smoke)
    arch = archive_versions(pages).to_pandas()
    # synthesizer plants an older version for doc_id % 17 == 0
    assert len(arch) == len([1 for d in range(500) if d % 17 == 0])
    # archived rows are strictly the older timestamps
    latest = (pages.to_pandas().groupby("url")["warc_ts"].max())
    for _, row in arch.iterrows():
        assert row["warc_ts"] < latest[row["url"]]
