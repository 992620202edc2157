"""Golden tests over the deterministic synthetic corpus:

1. byte-identical extracted text per url (the M1 acceptance test /
   north-rule per-row invariant),
2. parsed sections == plan-derived expected sections,
3. determinism of the generator.

These run the pure-Python path over every sf0.001 document (500 pages)
without Ray — the Ray pipeline wiring is tested separately.
"""

import pyarrow.parquet as pq
import pytest

from ferenda_ray.htmltree import extract_text, parse_html
from ferenda_ray.pipelines import corpus
from ferenda_ray.sectionize import sectionize
from ferenda_ray.stages.parse_html import parse_pages_batch


@pytest.fixture(scope="module")
def documents(sf_smoke):
    return pq.read_table(sf_smoke + "/documents.parquet")


@pytest.fixture(scope="module")
def pages(documents):
    return corpus.synthesize_batch(documents)


def test_generator_deterministic(documents):
    a = corpus.synthesize_batch(documents)
    b = corpus.synthesize_batch(documents)
    assert a.equals(b)


def test_recrawl_rows_present(documents, pages):
    n_docs = documents.num_rows
    n_recrawl = sum(1 for d in documents["doc_id"].to_pylist() if d % 17 == 0)
    assert pages.num_rows == n_docs + n_recrawl
    urls = pages["url"].to_pylist()
    assert len(set(urls)) == n_docs


def test_byte_identical_text_per_url(pages):
    """extract_text(html) must equal the pages.text column byte-for-byte
    for EVERY row (incl. recrawl versions)."""
    htmls = pages["html"].to_pylist()
    texts = pages["text"].to_pylist()
    urls = pages["url"].to_pylist()
    for url, html, expected in zip(urls, htmls, texts):
        got = extract_text(html)
        assert got == expected, "text mismatch for %s" % url


def test_sections_match_plan(documents):
    """Parse-path sections (html → tree → FSM) must equal the
    plan-derived expected sections for every document."""
    for did, text, lang, source in zip(
        documents["doc_id"].to_pylist(),
        documents["text"].to_pylist(),
        documents["lang"].to_pylist(),
        documents["source"].to_pylist(),
    ):
        plan = corpus.plan_document(did, text, lang, source)
        body_parsed = parse_html(corpus.render_html(plan, corpus.build_body_elem(plan))).find("body")
        got = sectionize(body_parsed, plan["url"])
        exp = corpus.expected_sections(plan)
        exp_cmp = [
            (r["section_uri"], r["kind"], r["ordinal"], r["title"],
             r["parent_uri"], r["text"], r["position"])
            for r in sorted(exp, key=lambda r: r["position"])
        ]
        got_cmp = [
            (r["section_uri"], r["kind"], r["ordinal"], r["title"],
             r["parent_uri"], r["text"], r["position"])
            for r in got
        ]
        # body-row text differs by design (expected_sections stores the
        # direct-content join; sectionize's body row also does) — both
        # include only direct body chunks, so full compare is valid
        assert got_cmp == exp_cmp, "sections mismatch for doc %d" % did


def test_parse_pages_batch_text_column(pages):
    """The Ray batch UDF's body rows reproduce the text column."""
    out = parse_pages_batch(pages)
    body = out.filter(
        __import__("pyarrow").compute.equal(out["kind"], "body")
    )
    got = dict(zip(body["url"].to_pylist(), body["text"].to_pylist()))
    # compare against the LAST occurrence per url? No — every (url,ts)
    # row parses independently; verify the latest rows (main versions)
    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()
    tss = pages["warc_ts"].to_pylist()
    latest = {}
    for u, t, ts in zip(urls, texts, tss):
        if u not in latest or ts > latest[u][0]:
            latest[u] = (ts, t)
    # parse_pages_batch keeps every version; body rows are per input row —
    # so instead parse only the deduped latest rows here
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = [ts == latest[u][0] for u, ts in zip(urls, tss)]
    deduped = pages.filter(pa.array(keep))
    out2 = parse_pages_batch(deduped)
    body2 = out2.filter(pc.equal(out2["kind"], "body"))
    assert body2.num_rows == len(latest)
    for u, txt in zip(body2["url"].to_pylist(), body2["text"].to_pylist()):
        assert txt == latest[u][1], "UDF text mismatch for %s" % u
    errs = [e for e in out2["error"].to_pylist() if e]
    assert errs == []


def test_titles_and_langs(pages, documents):
    out = parse_pages_batch(pages)
    import pyarrow.compute as pc

    body = out.filter(pc.equal(out["kind"], "body"))
    by_url = {
        u: (t, l)
        for u, t, l in zip(
            body["url"].to_pylist(),
            body["title"].to_pylist(),
            body["lang"].to_pylist(),
        )
    }
    for did, text, lang, source in zip(
        documents["doc_id"].to_pylist(),
        documents["text"].to_pylist(),
        documents["lang"].to_pylist(),
        documents["source"].to_pylist(),
    ):
        plan = corpus.plan_document(did, text, lang, source)
        title, got_lang = by_url[plan["url"]]
        assert title == plan["title"]
        assert got_lang == lang


def test_pages_slim_matches_full_synthesis(documents, pages, sf_smoke):
    """pages_slim_dataset (no-html arithmetic) must stay in lockstep
    with synthesize_batch's (url, warc_ts) — latest_per_url's
    correctness depends on it."""
    import collections

    for replicate in (1, 3):
        full = corpus.synthesize_batch(documents, replicate=replicate)
        slim = corpus.pages_slim_dataset(sf_smoke, replicate=replicate)
        slim_t = slim.to_pandas()
        want = collections.Counter(
            zip(full["url"].to_pylist(), full["warc_ts"].to_pylist()))
        got = collections.Counter(
            zip(slim_t["url"],
                (ts.to_pydatetime() for ts in slim_t["warc_ts"])))
        assert got == want
