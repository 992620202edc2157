"""Deterministic synthetic web-page corpus + oracles.

Synthesizes the Common-Crawl-style ``pages`` table (url, warc_ts,
html, text, lang — BASELINE.json input_hint) from the driver's
``documents`` table (doc_id, text, lang, source) with **pure
arithmetic determinism** — every structural decision is a function of
``doc_id`` alone, never a PRNG — so that DuckDB SQL oracles can
recompute expected values (e.g. the title triple) from the same
parquet, and repeated runs are byte-identical.

Also produces the oracle tables for pytest (FIXTURES.md §4):
expected sections, expected triples (post-canonicalization),
authority/gazetteer, sameAs edges incl. one deliberately giant
component on a hot domain (skew test for connected components).

Page structure (all mod-arithmetic on doc_id; ``w(i)`` = words of the
document text cycled):

- title           = first 3 words, uppercased
- intro paragraph = 6 words (+ an inline <a> link every 4th doc)
- "Abstract" preamble (h2) iff doc_id % 2 == 0, 5 words
- <hr> after the preamble iff doc_id % 6 == 0
- n_sections      = 2 + doc_id % 3, heading "<s> <2 words>"
- section s has a subsection "s.1" iff (doc_id+s) % 2 == 0,
  which has a subsubsection "s.1.1" iff (doc_id+s) % 4 == 0
- <pre> block in section 1 iff doc_id % 5 == 0 (whitespace-exact)
- <ul> in the last section iff doc_id % 4 == 1
- citations in section 1: "RFC <n>" iff doc_id%3==0;
  "section 2.2 of [RFC 2616]" iff doc_id%7==0; a bare URL iff doc_id%5==1
- an entity mention (gazetteer surface) in section 2's paragraph
- HTML noise that extraction must drop: <script>/<style>/<font>
  subtrees, comments, whitespace-only text, an unknown tag
- recrawl: doc_id % 17 == 0 gets an extra OLDER row (same url,
  warc_ts − 1 day, truncated body) — latest-per-url must win.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np
import pyarrow as pa

from ..htmltree import Elem, as_plaintext

# ---------------------------------------------------------------------
# Authority / gazetteer (constant; FIXTURES.md §3)
# ---------------------------------------------------------------------

ENTITY_LABELS = [
    "Apache Spark", "Ray Data", "Arrow Format", "Hash Join",
    "Merge Sort", "Query Planner", "Stream Engine", "Batch Window",
    "Vector Index", "Column Store", "Data Lake", "Key Value",
    "Table Scan", "Sort Merge", "Group Agg", "Filter Push",
    "Row Cache", "Join Order", "Page Rank", "Web Crawl",
    "Link Graph", "Text Mine", "Dup Detect", "Shard Map",
]
N_ENT = len(ENTITY_LABELS)

KB = "https://kb.example.org/entity/E"
HOT_DOMAIN = "https://hot.example.org/x/"
GIANT_CHAIN_LEN = 200  # giant sameAs component attached to entity 0


def n_variants(i: int) -> int:
    return 1 + i % 3


def variant_uri(i: int, k: int) -> str:
    return "https://v%d.alt.example.org/e/%d" % (k, i)


def entity_surfaces(i: int) -> list[str]:
    """[label, exact alt label, misspelling]. The alt label is in the
    gazetteer; the misspelling is NOT — it must be linked via fuzzy
    matching (difflib cutoff 0.8, documentrepository.py:500-547)."""
    label = ENTITY_LABELS[i]
    alt = label + " System"
    missp = label[:-1] + "x"  # one trailing char changed → ratio ≈ 0.9
    return [label, alt, missp]


def gazetteer() -> dict[str, str]:
    """surface → (variant) entity URI. Label → variant 0, alt label →
    variant 1 when the entity has one (else 0): different surfaces of
    one entity resolve to *different* URIs, which canonicalization
    must merge via sameAs."""
    g = {}
    for i in range(N_ENT):
        label, alt, _ = entity_surfaces(i)
        g[label] = variant_uri(i, 0)
        g[alt] = variant_uri(i, 1 % n_variants(i))
    return g


def authority_table() -> pa.Table:
    rows = {
        "entity_uri": [KB + str(i) for i in range(N_ENT)],
        "label": [ENTITY_LABELS[i] for i in range(N_ENT)],
        "alt_labels": [[entity_surfaces(i)[1]] for i in range(N_ENT)],
        "entity_type": ["concept"] * N_ENT,
    }
    return pa.table(rows)


def sameas_edges() -> list[tuple[str, str]]:
    """(uri_a, uri_b) undirected: every variant ↔ its kb uri, plus a
    200-node chain on a hot domain attached to entity 0 (the giant
    component / skew fixture of FIXTURES.md §3)."""
    edges = []
    for i in range(N_ENT):
        for k in range(n_variants(i)):
            edges.append((variant_uri(i, k), KB + str(i)))
    for j in range(GIANT_CHAIN_LEN - 1):
        edges.append((HOT_DOMAIN + str(j), HOT_DOMAIN + str(j + 1)))
    edges.append((HOT_DOMAIN + "0", KB + "0"))
    return edges


def expected_canonical() -> dict[str, str]:
    """uri → component representative (lexicographic min) for every
    node in the sameAs graph — driver-side exact union-find oracle."""
    parent: dict[str, str] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in sameas_edges():
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    return {u: find(u) for u in parent}


# ---------------------------------------------------------------------
# Per-document plan (pure arithmetic)
# ---------------------------------------------------------------------

RFC_BASE = "https://rfc.example.org/rfc/"
SPEC_URL = "https://spec.example.org/s/"
ENGINE_NAME = "ferenda_ray.pipelines.kg.KGPipeline"


def page_url(source: str, doc_id: int) -> str:
    return "https://%s.example.org/d/%d" % (_src_num(source), doc_id)


def _src_num(source: str) -> int:
    # "src13" → 13; keeps the url derivable in SQL via regexp
    return int(source[3:])


def _cyc(words: list[str], start: int, k: int) -> str:
    n = len(words)
    return " ".join(words[(start + j) % n] for j in range(k))


def plan_document(doc_id: int, text: str, lang: str, source: str,
                  truncated: bool = False) -> dict:
    """The structural plan for one page. ``truncated`` builds the older
    recrawl version (1 section, no preamble)."""
    words = text.split() or ["empty"]
    url = page_url(source, doc_id)
    title = " ".join(words[:3]).upper() if len(words) >= 3 else " ".join(words).upper()
    n_sec = 1 if truncated else 2 + doc_id % 3

    sections = []
    for s in range(1, n_sec + 1):
        sec = {
            "ordinal": str(s),
            "title": _cyc(words, 3 + 2 * s, 2),
            "paras": [],
            "pre": None,
            "ul": None,
            "subs": [],
        }
        para = _cyc(words, 7 * s, 8)
        if s == 1 and not truncated:
            if doc_id % 3 == 0:
                para += " as defined in RFC %d" % (100 + doc_id % 900)
            if doc_id % 7 == 0:
                para += " see section 2.2 of [RFC 2616] for details"
            if doc_id % 5 == 1:
                para += " published at %s%d today" % (SPEC_URL, doc_id % 50)
        if s == 2:
            surfaces = entity_surfaces(doc_id % N_ENT)
            surface = surfaces[(doc_id // N_ENT) % 3]
            para += " the " + surface + " project ships"
        sec["paras"].append(para)
        if s == 1 and doc_id % 5 == 0 and not truncated:
            sec["pre"] = "raw   text\n  line%d()\nend" % doc_id
        if s == n_sec and doc_id % 4 == 1:
            sec["ul"] = [_cyc(words, 17, 2), _cyc(words, 19, 2)]
        if (doc_id + s) % 2 == 0 and not truncated:
            sub = {
                "ordinal": "%d.1" % s,
                "title": _cyc(words, 11 * s, 2),
                "paras": [_cyc(words, 13 * s, 6)],
                "subs": [],
            }
            if (doc_id + s) % 4 == 0:
                sub["subs"].append({
                    "ordinal": "%d.1.1" % s,
                    "title": _cyc(words, 13 * s + 1, 2),
                    "paras": [_cyc(words, 15 * s, 4)],
                    "subs": [],
                })
            sec["subs"].append(sub)
        sections.append(sec)

    return {
        "doc_id": doc_id,
        "url": url,
        "title": title,
        "lang": lang,
        "intro": _cyc(words, 0, 6),
        "intro_link": (doc_id % 4 == 2),
        "preamble": None if truncated or doc_id % 2 != 0 else _cyc(words, 1, 5),
        "hr_after_preamble": (doc_id % 6 == 0) and not truncated and doc_id % 2 == 0,
        "stray_h5": (doc_id % 9 == 0) and not truncated,
        "orphan_sub_header": (doc_id % 8 == 3) and not truncated,
        "sections": sections,
        "truncated": truncated,
    }


# ---------------------------------------------------------------------
# Plan → clean element tree (for expected text) and → HTML (with noise)
# ---------------------------------------------------------------------

def _para_elem(text: str) -> Elem:
    p = Elem("p")
    p.children.append(text)
    return p


def _heading(tag: str, text: str) -> Elem:
    h = Elem(tag)
    h.children.append(text)
    return h


def build_body_elem(plan: dict) -> Elem:
    """The clean (noise-free) element tree the extraction must recover."""
    body = Elem("body")
    ch = body.children
    if plan["intro_link"]:
        p = Elem("p")
        p.children.append(plan["intro"] + " see ")
        a = Elem("a", {"href": "https://example.org/more"})
        a.children.append("more info")
        p.children.append(a)
        ch.append(p)
    else:
        ch.append(_para_elem(plan["intro"]))
    if plan["stray_h5"]:
        ch.append(_heading("h5", "Sidebar Note"))
    if plan["preamble"] is not None:
        ch.append(_heading("h2", "Abstract"))
        ch.append(_para_elem(plan["preamble"]))
        if plan["hr_after_preamble"]:
            ch.append(Elem("hr"))
    if plan["orphan_sub_header"]:
        ch.append(_heading("h3", "9.9 Orphan Depth Two"))

    for sec in plan["sections"]:
        ch.append(_heading("h1", "%s %s" % (sec["ordinal"], sec["title"])))
        for para in sec["paras"]:
            ch.append(_para_elem(para))
        if sec.get("pre"):
            pre = Elem("pre")
            pre.children.append(sec["pre"])
            ch.append(pre)
        if sec.get("ul"):
            ul = Elem("ul")
            for item in sec["ul"]:
                li = Elem("li")
                li.children.append(item)
                ul.children.append(li)
            ch.append(ul)
        for sub in sec["subs"]:
            ch.append(_heading("h2", "%s %s" % (sub["ordinal"], sub["title"])))
            for para in sub["paras"]:
                ch.append(_para_elem(para))
            for ss in sub["subs"]:
                ch.append(_heading("h3", "%s %s" % (ss["ordinal"], ss["title"])))
                for para in ss["paras"]:
                    ch.append(_para_elem(para))
    return body


def _render_elem(el, out: list[str]):
    if isinstance(el, str):
        out.append(_htmlmod.escape(el, quote=False))
        return
    attrs = "".join(' %s="%s"' % (k, _htmlmod.escape(v, quote=True))
                    for k, v in el.attrs.items())
    if el.tag in ("hr", "br", "img"):
        out.append("<%s%s/>" % (el.tag, attrs))
        return
    out.append("<%s%s>" % (el.tag, attrs))
    for c in el.children:
        _render_elem(c, out)
    out.append("</%s>" % el.tag)


def render_html(plan: dict, body: Elem) -> bytes:
    """Render the page with noise that extraction must drop:
    script/style/font subtrees, comments, an unknown tag, and
    insignificant whitespace between block elements."""
    out: list[str] = []
    out.append("<!DOCTYPE html>\n")
    out.append('<html lang="%s">\n<head>\n' % plan["lang"])
    out.append("<title>%s</title>\n" % _htmlmod.escape(plan["title"], quote=False))
    out.append("<script>var tracker = %d;</script>\n" % plan["doc_id"])
    out.append("<style>body { margin: 0; }</style>\n")
    out.append("</head>\n<body>\n<!-- generated page -->\n")
    did = plan["doc_id"]
    for i, c in enumerate(body.children):
        _render_elem(c, out)
        out.append("\n")
        if i == 0:
            out.append("<script>console.log(%d);</script>\n" % did)
            out.append("<font color=\"red\">legacy <b>noise</b></font>\n")
            out.append("<blink>unknown tag dropped</blink>\n")
    out.append("<center>footer noise</center>\n</body>\n</html>\n")
    return "".join(out).encode("utf-8")


# ---------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------

def expected_sections(plan: dict) -> list[dict]:
    """Section rows computed from the plan structure (independent of the
    sectionizer's FSM walk — only the text fields reuse as_plaintext
    over generator-built chunk elements)."""
    url = plan["url"]
    rows: list[dict] = []
    pos = [0]

    def add(kind, uri, ordinal, title, parent, text):
        rows.append({
            "url": url, "section_uri": uri, "kind": kind, "ordinal": ordinal,
            "title": title, "parent_uri": parent, "text": text,
            "position": pos[0],
        })
        pos[0] += 1

    body = build_body_elem(plan)
    chunk_text = {}  # index in body.children → plaintext
    for i, c in enumerate(body.children):
        chunk_text[i] = as_plaintext(c)

    # body row: direct content = intro (+ stray h5, hr, orphan header)
    body_parts = [chunk_text[0]]
    i = 1
    if plan["stray_h5"]:
        body_parts.append(chunk_text[i]); i += 1
    pre_start = i
    add("body", url, None, None, None, None)  # text filled below
    if plan["preamble"] is not None:
        # preamble: h2 consumed as title; content = the para;
        # the <hr> (if any) pops the preamble and lands in body content
        add("preamble", url + "#PS1", None, "Abstract",
            url, chunk_text[pre_start + 1])
        i = pre_start + 2
        if plan["hr_after_preamble"]:
            body_parts.append(chunk_text[i])  # '' — hr has no text
            i += 1
    if plan["orphan_sub_header"]:
        body_parts.append(chunk_text[i]); i += 1

    for sec in plan["sections"]:
        i += 1  # heading consumed as title
        sec_uri = url + "#S" + sec["ordinal"]
        parts = []
        for _ in sec["paras"]:
            parts.append(chunk_text[i]); i += 1
        if sec.get("pre"):
            parts.append(chunk_text[i]); i += 1
        if sec.get("ul"):
            parts.append(chunk_text[i]); i += 1
        add("section", sec_uri, sec["ordinal"], sec["title"], url,
            " ".join(filter(None, parts)))
        for sub in sec["subs"]:
            i += 1
            sub_uri = url + "#S" + sub["ordinal"]
            sparts = []
            for _ in sub["paras"]:
                sparts.append(chunk_text[i]); i += 1
            add("subsection", sub_uri, sub["ordinal"], sub["title"], sec_uri,
                " ".join(filter(None, sparts)))
            for ss in sub["subs"]:
                i += 1
                ss_uri = url + "#S" + ss["ordinal"]
                ssparts = []
                for _ in ss["paras"]:
                    ssparts.append(chunk_text[i]); i += 1
                add("subsubsection", ss_uri, ss["ordinal"], ss["title"],
                    sub_uri, " ".join(filter(None, ssparts)))

    rows[0]["text"] = " ".join(filter(None, body_parts))
    # fix position ordering: sectionize assigns positions in creation
    # order which equals document order here already
    for idx, r in enumerate(sorted(rows, key=lambda r: r["position"])):
        r["position"] = idx
    return rows


def expected_triples(plan: dict, canon: dict[str, str]) -> list[tuple]:
    """(subj, pred, obj, obj_is_literal, obj_lang) — the
    post-canonicalization flagship output for one page."""
    url, lang = plan["url"], plan["lang"]
    t: list[tuple] = []

    def lit(s, p, o, olang=""):
        t.append((s, p, o, True, olang))

    def ref(s, p, o):
        t.append((s, p, o, False, ""))

    ref(url, "rdf:type", "bibo:Document")
    lit(url, "dcterms:title", plan["title"], lang)
    lit(url, "dcterms:identifier", str(plan["doc_id"]))
    lit(url, "prov:wasGeneratedBy", ENGINE_NAME)
    for row in expected_sections(plan):
        if row["kind"] == "body":
            continue
        su = row["section_uri"]
        ref(su, "rdf:type", "bibo:DocumentPart")
        if row["title"]:
            # section titles carry no lang tag (elements.py:640-644:
            # "we don't set xml:lang ... the data does not originate
            # from RDF"); only the doc title does (docrepo.py:1315)
            lit(su, "dcterms:title", row["title"])
        if row["ordinal"]:
            lit(su, "bibo:chapter", row["ordinal"])
        ref(su, "dcterms:isPartOf", row["parent_uri"])
    did = plan["doc_id"]
    if not plan["truncated"]:
        s1 = url + "#S1"
        if did % 3 == 0:
            ref(s1, "dcterms:references", RFC_BASE + str(100 + did % 900))
        if did % 7 == 0:
            ref(s1, "dcterms:references", RFC_BASE + "2616#S2.2")
        if did % 5 == 1:
            ref(s1, "dcterms:references", SPEC_URL + str(did % 50))
        # entity mention in section 2 → canonicalized subject link
        e = did % N_ENT
        surfaces = entity_surfaces(e)
        surface = surfaces[(did // N_ENT) % 3]
        gaz = gazetteer()
        target = gaz.get(surface)
        if target is None:  # misspelling → fuzzy → its closest label's uri
            target = gaz[surfaces[0]]
        ref(url + "#S2", "dcterms:subject", canon.get(target, target))
    return t


# ---------------------------------------------------------------------
# Batch synthesizer (documents batch → pages batch) + Ray entry
# ---------------------------------------------------------------------

EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds


def synthesize_batch(batch: pa.Table, replicate: int = 1) -> pa.Table:
    """documents(doc_id,text,lang,source) → pages(url,warc_ts,html,text,lang).

    Vector-of-rows construction (HTML synthesis is inherently per-row);
    runs inside map_batches so it parallelizes across blocks.

    ``replicate`` > 1 deterministically fans each document out into
    that many distinct pages (doc_id offset by k·1e6 → different
    structure, urls, citations per replica) — bench-scale corpora
    from the small driver tables, still fully deterministic.
    """
    doc_ids0 = batch["doc_id"].to_pylist()
    texts0 = batch["text"].to_pylist()
    langs0 = batch["lang"].to_pylist()
    sources0 = batch["source"].to_pylist()
    doc_ids, texts, langs, sources = [], [], [], []
    for k in range(replicate):
        off = k * 1_000_000
        doc_ids += [d + off for d in doc_ids0]
        texts += texts0
        langs += langs0
        sources += sources0
    urls, tss, htmls, exps, outlangs = [], [], [], [], []
    for did, text, lang, source in zip(doc_ids, texts, langs, sources):
        plan = plan_document(did, text, lang, source)
        body = build_body_elem(plan)
        urls.append(plan["url"])
        tss.append(EPOCH_US + did * 37_000_000)
        htmls.append(render_html(plan, body))
        exps.append(as_plaintext(body))
        outlangs.append(lang)
        if did % 17 == 0:  # older recrawl version
            plan_old = plan_document(did, text, lang, source, truncated=True)
            body_old = build_body_elem(plan_old)
            urls.append(plan_old["url"])
            tss.append(EPOCH_US + did * 37_000_000 - 86_400_000_000)
            htmls.append(render_html(plan_old, body_old))
            exps.append(as_plaintext(body_old))
            outlangs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.asarray(tss, dtype="int64"), pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(exps, pa.string()),
        "lang": pa.array(outlangs, pa.string()),
    })


def pages_dataset(sf_dir: str, replicate: int = 1):
    """Lazy Ray Dataset of synthesized pages for one testdata sf dir."""
    import functools

    import ray.data as rd

    from ..stages.transform import strip_schema_metadata

    import ray

    # explicit read fan-out sized to the cluster: the implicit
    # 1-task→SplitBlocks path dribbles blocks out of a lone read task
    # (cold 4.2 s vs 1.2 s measured at sf0.01); synthesis downstream
    # is CPU-heavy, so 2×CPUs blocks keep every core fed
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    docs = strip_schema_metadata(
        rd.read_parquet(sf_dir.rstrip("/") + "/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"],
                        override_num_blocks=max(8, 2 * ncpu)))
    fn = (synthesize_batch if replicate == 1 else
          functools.partial(synthesize_batch, replicate=replicate))
    return docs.map_batches(fn, batch_format="pyarrow")


def pages_slim_dataset(sf_dir: str, replicate: int = 1):
    """Just (url, warc_ts) of ``pages_dataset`` without rendering any
    html — the cheap pre-pass input for ``latest_per_url`` (pure
    url/timestamp arithmetic over a 2-column documents read; kept in
    lockstep with ``synthesize_batch``, tested equal in
    test_corpus_golden)."""
    import ray.data as rd

    # modest fan-out: the pre-pass is IO- and compute-light, and at
    # this block-count per-task overhead dominates (measured: 64 read
    # tasks ≈ 3-8 s vs 8 tasks ≈ 0.6 s on the same tiny columns)
    from ..stages.transform import strip_schema_metadata

    docs = strip_schema_metadata(
        rd.read_parquet(sf_dir.rstrip("/") + "/documents.parquet",
                        columns=["doc_id", "source"],
                        override_num_blocks=8))

    def slim_batch(batch: pa.Table) -> pa.Table:
        doc_ids0 = batch["doc_id"].to_pylist()
        sources0 = batch["source"].to_pylist()
        urls, tss = [], []
        for k in range(replicate):
            off = k * 1_000_000
            for d0, src in zip(doc_ids0, sources0):
                did = d0 + off
                urls.append(page_url(src, did))
                tss.append(EPOCH_US + did * 37_000_000)
                if did % 17 == 0:  # older recrawl version, same url
                    urls.append(page_url(src, did))
                    tss.append(EPOCH_US + did * 37_000_000
                               - 86_400_000_000)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(tss, dtype="int64"),
                                pa.timestamp("us")),
        })

    return docs.map_batches(slim_batch, batch_format="pyarrow")


def read_pages(pages_dir: str):
    """Read a materialized pages dir with read fan-out sized to the
    cluster. Ray's size-based splitting packs the small benchmark
    page files into a handful of read tasks, and because the
    downstream parse / link stages fuse with the read, that would cap
    the whole pipeline's parallelism at the read's block count
    (observed: 65 files → 6 read tasks → 6 of 32 CPUs busy). The
    override keeps at least two blocks per CPU, and never fewer than
    the file count — at real corpus scale the file count dominates
    and the override is a no-op."""
    import os

    import ray
    import ray.data as rd

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    try:
        nfiles = sum(1 for f in os.listdir(pages_dir)
                     if f.endswith(".parquet"))
    except OSError:
        nfiles = 1
    from ..stages.transform import strip_schema_metadata

    return strip_schema_metadata(rd.read_parquet(
        pages_dir, override_num_blocks=max(2 * ncpu, nfiles)))


def read_pages_slim(pages_dir: str):
    """(url, warc_ts) projection of a materialized pages dir for the
    ``latest_per_url`` pre-pass. Low fan-out on purpose: the
    projection is tiny and per-read-task overhead dominates below
    ~1 M rows/block (see pages_slim_dataset)."""
    import os

    import ray.data as rd

    try:
        nfiles = sum(1 for f in os.listdir(pages_dir)
                     if f.endswith(".parquet"))
    except OSError:
        nfiles = 1
    from ..stages.transform import strip_schema_metadata

    return strip_schema_metadata(
        rd.read_parquet(pages_dir, columns=["url", "warc_ts"],
                        override_num_blocks=max(8, nfiles // 8)))


def _synth_version() -> str:
    """Hash of the synthesizer source — any edit to the page-planning
    or rendering code changes the cache tag, so stale /tmp page caches
    self-invalidate instead of silently serving old corpora."""
    import hashlib
    import inspect

    src = "".join(inspect.getsource(f) for f in (
        plan_document, build_body_elem, render_html, synthesize_batch))
    return hashlib.md5(src.encode()).hexdigest()[:10]


def materialize_pages(sf_dir: str, out_dir: str | None = None,
                      replicate: int = 1) -> str:
    """Write the synthesized pages for ``sf_dir`` to parquet once and
    reuse (cache keyed on sf dir name + replication + synthesizer
    source hash). Returns the dir."""
    import os

    if out_dir is None:
        tag = "%s_%s" % (os.path.basename(sf_dir.rstrip("/")),
                         _synth_version())
        if replicate != 1:
            tag += "_x%d" % replicate
        out_dir = "/tmp/ferenda_ray_pages/%s" % tag
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        pages_dataset(sf_dir, replicate=replicate).write_parquet(out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir
