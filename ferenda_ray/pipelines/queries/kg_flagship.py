"""KG flagship queries over the real pipeline output (sections, mentions,
titles, annotations, TOC, feeds)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ...functions import firstletter
from ...stages import text_analysis
from ...stages.dedup import (
    embedding_neardup_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from ...stages.similarity import knn_brute_force
from ...stages.canonicalize import connected_components_distributed
from ...stages import joins
from .. import corpus, facets
from ..kg import kg_pipeline
from ._shared import _exchange_buckets, _kg, _read


# ---------------------------------------------------------------------
# KG flagship queries (pipeline-backed; several SQL-oracled thanks to
# the arithmetic-deterministic page synthesizer)
# ---------------------------------------------------------------------

PAGE_URL_SQL = "'https://' || substr(source, 4) || '.example.org/d/' || doc_id"
TITLE_SQL = ("upper(array_to_string(list_slice(regexp_extract_all(text, "
             "'\\S+'), 1, 3), ' '))")


def kg_triples(sf_dir):
    """The flagship output — full canonicalized deduped triple set."""
    return _kg(sf_dir)["triples"]


def kg_incremental(sf_dir):
    """Incremental KG update — crawl-delta processing end to end: the
    previous run covered every page EXCEPT doc_id % 13 == 0; the new
    crawl delivers those, and ONLY they pass through the expensive
    per-doc stages (parse → mention/link → remap → doc-local dedup).
    The union of the previous run's triples with the delta's equals a
    full recompute EXACTLY — by construction, not by luck: every
    global stage is either config-broadcast (the sameAs canonical map
    derives from authority config, never from the corpus) or
    doc-local (exact dedup's no-exchange fast path, proof at
    canonicalize.dedup_exact_triples), so per-doc outputs are
    independent of which other docs share the run. The oracle is the
    UNCHANGED full-corpus KG_TRIPLES_SQL."""
    import ray as _ray

    from ..kg import sections_dataset
    from ...stages.canonicalize import (dedup_exact_triples, remap_triples,
                                       sameas_triples, union_find)
    from ...stages.mentions import MentionLinker, mention_triples
    from ...stages.triples import emit_meta_triples

    def split(keep_delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.array([int(u.rsplit("/", 1)[1])
                            for u in t["url"].to_pylist()])
            m = pa.array(ids % 13 == 0)
            return t.filter(m if keep_delta else pc.invert(m))
        return fn

    gaz_ref = _ray.put(corpus.gazetteer())
    canon = union_find(corpus.sameas_edges())
    canon_ref = _ray.put(canon)
    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    conc = (max(2, ncpu // 4), max(4, ncpu - 2))

    def per_doc_triples(which_delta: bool):
        pages = (corpus.pages_dataset(sf_dir)
                 .map_batches(split(which_delta), batch_format="pyarrow"))
        slim = (corpus.pages_slim_dataset(sf_dir)
                .map_batches(split(which_delta), batch_format="pyarrow"))
        sections = sections_dataset(pages, pages_slim=slim)
        meta = sections.map_batches(emit_meta_triples,
                                    batch_format="pyarrow")
        mentions = sections.map_batches(
            MentionLinker, fn_constructor_kwargs={"gazetteer": gaz_ref},
            concurrency=conc, batch_format="pyarrow")
        refs = mentions.map_batches(mention_triples,
                                    batch_format="pyarrow")
        t = remap_triples(meta.union(refs), canon_ref)
        return dedup_exact_triples(t, scope="doc_local")

    prior = per_doc_triples(False)     # the cached previous run
    delta = per_doc_triples(True)      # only the new crawl's docs
    sameas = _ray.data.from_arrow(sameas_triples(canon))
    return prior.union(delta).union(sameas)


def kg_sections(sf_dir):
    res = _kg(sf_dir)["sections"]
    return res.map_batches(
        lambda t: t.select(["url", "section_uri", "kind", "ordinal",
                            "title", "parent_uri", "position"]),
        batch_format="pyarrow")


def kg_mentions(sf_dir):
    return _kg(sf_dir)["mentions"]


_KWIC_WINDOW = 30


def kg_mention_contexts(sf_dir):
    """KWIC snippet extraction: ±30 chars of section text around every
    linked mention — the reference's fulltext-index fragment /
    highlight surface (fulltextindex.py search-result snippets) as a
    distributed join. Shape: mentions ⋈ sections on section_uri via a
    hash-bucketed exchange (neither side broadcast — at crawl scale
    both are O(corpus)), then a vectorized per-row slice. The join key
    is doc-local (section_uri embeds the url), so bucketing co-locates
    each document's mentions with its own text and nothing else."""
    from ...stages.joins import bucket_join

    res = _kg(sf_dir)
    mentions = res["mentions"].map_batches(
        lambda t: t.select(["url", "section_uri", "surface", "start",
                            "end", "linked_uri"]),
        batch_format="pyarrow")
    secs = res["sections"].map_batches(
        lambda t: (t.filter(pc.is_null(t["error"]))
                   if "error" in t.column_names else t).select(
                       ["section_uri", "text"]),
        batch_format="pyarrow")
    joined = bucket_join(mentions, secs, left_on="section_uri",
                         num_buckets=_exchange_buckets(sf_dir))
    w = _KWIC_WINDOW

    def ctx(df: pd.DataFrame) -> pd.DataFrame:
        starts = df["start"].to_numpy()
        ends = df["end"].to_numpy()
        texts = df["text"].tolist()
        df = df.drop(columns=["text"])
        df["ctx_before"] = [t[max(0, s - w):s]
                            for s, t in zip(starts, texts)]
        df["ctx_after"] = [t[e:e + w] for e, t in zip(ends, texts)]
        return df

    return joined.map_batches(ctx, batch_format="pandas")


def phrase_search(sf_dir):
    """Positional phrase query (quoted-phrase search over the fulltext
    surface, fulltextindex.py:395-683 query shape): documents whose
    whitespace token stream contains 'window' immediately followed by
    'join', scored by occurrence count — adjacency checked doc-locally
    (zero shuffle), global top-20 with a deterministic doc_id
    tie-break."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        # vectorized adjacency count: DOUBLING each whitespace run
        # makes consecutive phrase hits non-overlapping (each match
        # consumes one of the two boundary spaces), so re2's
        # non-overlapping count_substring_regex — no lookarounds —
        # equals the token-pair count exactly
        txt = pc.coalesce(t["text"], pa.scalar("", pa.string()))
        norm = pc.replace_substring_regex(txt, r"\s+", "  ")
        c = pc.count_substring_regex(
            norm, r"(?:^| )window  join(?: |$)")
        mask = pc.greater(c, 0)
        return pa.table({
            "doc_id": t["doc_id"].filter(mask).cast(pa.int64()),
            "n_hits": c.filter(mask).cast(pa.int64())})

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["n_hits", "doc_id"], descending=[True, False])
            .limit(20))


PHRASE_SEARCH_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
           FROM documents),
u AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
      FROM t),
hits AS (SELECT a.doc_id, count(*) AS n_hits
         FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         WHERE a.tok = 'window' AND b.tok = 'join'
         GROUP BY a.doc_id)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM hits
ORDER BY n_hits DESC, doc_id ASC LIMIT 20
"""


def kg_titles(sf_dir):
    """doc-title triples from the REAL parse pipeline vs SQL recomputing
    the synthesizer's title rule — an end-to-end cross-check of
    html-rendering + extraction + metadata emission."""
    t = _kg(sf_dir)["triples"]

    def pick(tb: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(tb["pred"], "dcterms:title"),
                       pc.equal(tb["subj"], tb["source_url"]))
        f = tb.filter(mask)
        return pa.table({"subj": f["subj"], "title": f["obj"]})

    return t.map_batches(pick, batch_format="pyarrow")


KG_TITLES_SQL = f"""
SELECT {PAGE_URL_SQL} AS subj, {TITLE_SQL} AS title FROM documents
"""


def kg_section_counts(sf_dir):
    """sections per document (excl. the body row) from the real
    pipeline vs the synthesizer's arithmetic recomputed in SQL."""
    s = _kg(sf_dir)["sections"]

    def count_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t["kind"], "body"))
        df = f.select(["url"]).to_pandas()
        g = df.groupby("url", as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (s.map_batches(count_rows, batch_format="pyarrow")
            .groupby("url").sum("n")
            .map_batches(lambda df: df.rename(columns={"sum(n)": "n_sections"}),
                         batch_format="pandas"))


# per-section arithmetic (corpus.plan_document):
#   n_sec = 2 + doc_id % 3; preamble iff doc_id % 2 = 0
#   sub at s iff (doc_id + s) % 2 = 0 (s ≤ n_sec); subsub iff (doc_id+s) % 4 = 0
_SEC_TERM = " + ".join(
    "(CASE WHEN {s} <= 2 + doc_id % 3 THEN "
    "1 + (CASE WHEN (doc_id + {s}) % 2 = 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN (doc_id + {s}) % 4 = 0 THEN 1 ELSE 0 END)"
    " ELSE 0 END)".format(s=s)
    for s in (1, 2, 3, 4)
)

KG_SECTION_COUNTS_SQL = f"""
SELECT {PAGE_URL_SQL} AS url,
       cast((CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) + {_SEC_TERM} AS BIGINT)
         AS n_sections
FROM documents
"""


def kg_top_cited(sf_dir):
    """top-10 citation targets by distinct citing docs, from the real
    pipeline, vs SQL recomputing the planted-citation arithmetic."""
    return facets.top_cited(_kg(sf_dir)["triples"], k=10)


KG_TOP_CITED_SQL = """
WITH cites AS (
  SELECT 'https://rfc.example.org/rfc/' || (100 + doc_id % 900) AS target_url,
         doc_id FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'https://rfc.example.org/rfc/2616', doc_id
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'https://spec.example.org/s/' || (doc_id % 50), doc_id
  FROM documents WHERE doc_id % 5 = 1
)
SELECT target_url, count(DISTINCT doc_id) AS n FROM cites
GROUP BY target_url ORDER BY n DESC, target_url ASC LIMIT 10
"""


def kg_identifiers(sf_dir):
    """dcterms:identifier triples (basefile rule) vs SQL."""
    t = _kg(sf_dir)["triples"]

    def pick(tb: pa.Table) -> pa.Table:
        f = tb.filter(pc.equal(tb["pred"], "dcterms:identifier"))
        return pa.table({"subj": f["subj"], "basefile": f["obj"]})

    return t.map_batches(pick, batch_format="pyarrow")


KG_IDENTIFIERS_SQL = f"""
SELECT {PAGE_URL_SQL} AS subj, cast(doc_id AS VARCHAR) AS basefile
FROM documents
"""


def kg_entity_subjects(sf_dir):
    """entity-link triples from the REAL pipeline (mention detection →
    exact/fuzzy gazetteer linking → sameAs canonicalization) vs SQL
    recomputing the planted-entity arithmetic: entity e = doc_id % 24;
    every surface variant canonicalizes to kb E<e>, except entity 0
    whose component includes the hot-domain chain (min = hot/x/0)."""
    t = _kg(sf_dir)["triples"]

    def pick(tb: pa.Table) -> pa.Table:
        f = tb.filter(pc.equal(tb["pred"], "dcterms:subject"))
        return pa.table({"subj": f["subj"], "entity": f["obj"]})

    return t.map_batches(pick, batch_format="pyarrow")


KG_ENTITY_SQL = f"""
SELECT {PAGE_URL_SQL} || '#S2' AS subj,
       CASE WHEN doc_id % 24 = 0 THEN 'https://hot.example.org/x/0'
            ELSE 'https://kb.example.org/entity/E' || (doc_id % 24) END
         AS entity
FROM documents
"""


def kg_negative_samples(sf_dir):
    """Corrupted-object negatives for KG-embedding training
    (triples.negative_samples, the TransE recipe made deterministic):
    K=2 negatives per dcterms:subject positive, drawn by md5 through a
    two-level (md5-bucket, local-rank) entity address — no global
    sort, only the per-bucket counts broadcast; negatives meet the
    entity table in one bucketed exchange. SQL recomputes every draw
    (window row_number per bucket ≡ the per-bucket rank)."""
    from ...stages.triples import negative_samples

    return negative_samples(_kg(sf_dir)["triples"], k_neg=2)


KG_NEGATIVES_SQL = f"""
WITH pos AS (
  SELECT {PAGE_URL_SQL} || '#S2' AS subj,
         CASE WHEN doc_id % 24 = 0 THEN 'https://hot.example.org/x/0'
              ELSE 'https://kb.example.org/entity/E' || (doc_id % 24)
         END AS obj
  FROM documents
),
ent AS (SELECT DISTINCT obj AS entity FROM pos),
eb AS (
  SELECT entity,
         CAST('0x' || substr(md5(entity), 1, 15) AS BIGINT) % 8 AS b,
         row_number() OVER (
           PARTITION BY CAST('0x' || substr(md5(entity), 1, 15)
                             AS BIGINT) % 8
           ORDER BY md5(entity), entity) - 1 AS r
  FROM ent
),
cnt AS (SELECT b, count(*) AS c FROM eb GROUP BY b),
need AS (
  SELECT subj, obj, i,
         CAST('0x' || substr(md5(subj || '|' || obj || '|' || i),
                             1, 15) AS BIGINT) AS h
  FROM pos, (SELECT unnest(generate_series(1, 2)) AS i) k
),
addr AS (
  SELECT n.subj, n.obj, n.i, n.h % 8 AS b, (n.h // 8) % c.c AS r
  FROM need n JOIN cnt c ON c.b = n.h % 8
),
sel AS (
  SELECT a.subj, a.obj, e.entity AS neg_obj, a.i AS neg_ix
  FROM addr a JOIN eb e ON e.b = a.b AND e.r = a.r
)
SELECT subj, 'dcterms:subject' AS pred, neg_obj,
       CAST(neg_ix AS BIGINT) AS neg_ix
FROM sel WHERE neg_obj <> obj
"""


def kg_entity_cooccurrence(sf_dir):
    """Entity co-occurrence counts with the source host as the
    context window (the skip-gram-statistics shape — count pairs
    sharing a context, the input to PMI / embedding training):
    (entity_a < entity_b, n_contexts). Per-context distinct combiner
    → in-context pair explode (bounded: contexts hold few distinct
    entities after dedup) → pair-hash bucketed count; entity strings
    cross the exchange once per (context, pair)."""
    from ...stages.dedup import _bucket_of

    t = _kg(sf_dir)["triples"]

    def ctx_entity(tb: pa.Table) -> pd.DataFrame:
        f = tb.filter(pc.equal(tb["pred"], "dcterms:subject"))
        hosts = [s.split("//", 1)[1].split("/", 1)[0]
                 for s in f["subj"].to_pylist()]
        out = pd.DataFrame({"ctx": pd.Series(hosts, dtype="object"),
                            "entity": f["obj"].to_pylist()})
        out = out.drop_duplicates()
        out["_bucket"] = _bucket_of(out["ctx"], 64)
        return out

    def ctx_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["ctx", "entity"])[["ctx", "entity"]]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in df.groupby("ctx", sort=False):
            ents = sorted(set(grp["entity"]))
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    a_out.append(ents[i]); b_out.append(ents[j])
        out = pd.DataFrame({
            "entity_a": pd.Series(a_out, dtype="object"),
            "entity_b": pd.Series(b_out, dtype="object"),
        })
        out["_bucket"] = _bucket_of(
            out["entity_a"] + "\x1f" + out["entity_b"], 64)
        return out

    def count(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["entity_a", "entity_b"], as_index=False)
               .size().rename(columns={"size": "n_contexts"}))
        out["n_contexts"] = out["n_contexts"].astype("int64")
        return out

    ce = (t.map_batches(ctx_entity, batch_format="pyarrow")
          .groupby("_bucket").map_groups(ctx_dedup,
                                         batch_format="pandas"))
    return (ce.map_batches(pairs, batch_format="pandas")
            .groupby("_bucket").map_groups(count, batch_format="pandas"))


KG_COOC_SQL = """
WITH ce AS (
  SELECT DISTINCT substr(source, 4) || '.example.org' AS ctx,
         CASE WHEN doc_id % 24 = 0 THEN 'https://hot.example.org/x/0'
              ELSE 'https://kb.example.org/entity/E' || (doc_id % 24)
         END AS entity
  FROM documents
)
SELECT a.entity AS entity_a, b.entity AS entity_b,
       count(*) AS n_contexts
FROM ce a JOIN ce b ON a.ctx = b.ctx AND a.entity < b.entity
GROUP BY a.entity, b.entity
"""


def kg_keyword_concepts(sf_dir):
    """keyword-repo groupby over entity subjects: (concept, n_docs)."""
    kc = facets.keyword_concepts(_kg(sf_dir)["triples"])
    return kc.map_batches(lambda df: df[["concept", "n_docs"]],
                          batch_format="pandas")


KG_KEYWORD_SQL = """
SELECT CASE WHEN doc_id % 24 = 0 THEN 'https://hot.example.org/x/0'
            ELSE 'https://kb.example.org/entity/E' || (doc_id % 24) END
         AS concept,
       cast(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def kg_skeleton(sf_dir):
    """object-minus-subject anti-join over the flagship triples:
    stub-entity URIs (cited-but-never-described resources). The SQL
    oracle recomputes the object set from the planted citation/entity
    arithmetic and the constant sameAs graph (page urls, section uris
    and non-representative sameAs nodes are the only subjects, so the
    skeleton = type objects ∪ citation targets ∪ component
    representatives)."""
    return facets.skeleton_entities(_kg(sf_dir)["triples"])


KG_SKELETON_SQL = """
WITH objs AS (
  SELECT 'bibo:Document' AS uri
  UNION SELECT 'bibo:DocumentPart'
  UNION SELECT DISTINCT 'https://rfc.example.org/rfc/' || (100 + doc_id % 900)
    FROM documents WHERE doc_id % 3 = 0
  UNION SELECT 'https://rfc.example.org/rfc/2616#S2.2'
    WHERE EXISTS (SELECT 1 FROM documents WHERE doc_id % 7 = 0)
  UNION SELECT DISTINCT 'https://spec.example.org/s/' || (doc_id % 50)
    FROM documents WHERE doc_id % 5 = 1
  UNION SELECT 'https://kb.example.org/entity/E' || i FROM range(1, 24) t(i)
  UNION SELECT 'https://hot.example.org/x/0'
)
SELECT uri FROM objs
"""


def kg_facet_pivot(sf_dir):
    """pivoted facet table for document subjects vs SQL recomputation."""
    piv = facets.facet_pivot(_kg(sf_dir)["triples"])

    def docs_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["subj"].str.contains("#")][
            ["subj", "rdf_type", "dcterms_title", "dcterms_identifier"]]

    return piv.map_batches(docs_only, batch_format="pandas")


KG_FACET_SQL = f"""
SELECT {PAGE_URL_SQL} AS subj,
       'bibo:Document' AS rdf_type,
       {TITLE_SQL} AS dcterms_title,
       cast(doc_id AS VARCHAR) AS dcterms_identifier
FROM documents
"""


AC_PREFIX = "ME"
AC_LIMIT = 10


def search_autocomplete(sf_dir):
    """The search endpoint's AUTOCOMPLETE mode (wsgiapp.py:411
    ``ac_query`` → fulltextindex.py:828-914 label-field regexp
    matching on the lowercase_keyword analyzer; mangle_results
    KEEPS the index's relevance order for ac queries — wsgiapp.py:
    446-448 — and trims the envelope, returning bare items): the
    prefix query matches document LABELS from the REAL flagship
    pipeline (dcterms:title triples), relevance = earliest matching
    word (then iri — deterministic where ES leaves order to scoring),
    top-10 items of (iri, label, match_pos).

    Scale shape: one map pass over the titles projection emitting
    per-batch top-10 partials, one bounded merge block. Zero
    shuffle."""
    t = _kg(sf_dir)["triples"]
    prefix = AC_PREFIX

    def part(tb: pa.Table) -> pd.DataFrame:
        mask = pc.and_(pc.equal(tb["pred"], "dcterms:title"),
                       pc.equal(tb["subj"], tb["source_url"]))
        f = tb.filter(mask)
        subjs = f["subj"].to_pylist()
        titles = f["obj"].to_pylist()
        rows = []
        for s, title in zip(subjs, titles):
            pos = next((i + 1 for i, w in
                        enumerate((title or "").split(" "))
                        if w.startswith(prefix)), None)
            if pos is not None:
                rows.append((pos, s, title))
        rows.sort()
        rows = rows[:AC_LIMIT]
        return pd.DataFrame({
            "iri": pd.Series([r[1] for r in rows], dtype=object),
            "label": pd.Series([r[2] for r in rows], dtype=object),
            "match_pos": pd.Series([r[0] for r in rows],
                                   dtype="int64")})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["match_pos", "iri"])
                .head(AC_LIMIT).reset_index(drop=True))

    from ._shared import _merge_partials

    return _merge_partials(
        t.map_batches(part, batch_format="pyarrow"), final)


SEARCH_AC_SQL = f"""
WITH t AS (SELECT {PAGE_URL_SQL} AS subj, {TITLE_SQL} AS title
           FROM documents),
w AS (SELECT subj, title, unnest(str_split(title, ' ')) AS word,
             generate_subscripts(str_split(title, ' '), 1) AS pos
      FROM t),
m AS (SELECT subj, title, min(pos) AS match_pos FROM w
      WHERE word LIKE '{AC_PREFIX}%' GROUP BY subj, title)
SELECT subj AS iri, title AS label,
       CAST(match_pos AS BIGINT) AS match_pos
FROM m ORDER BY match_pos ASC, iri ASC LIMIT {AC_LIMIT}
"""
