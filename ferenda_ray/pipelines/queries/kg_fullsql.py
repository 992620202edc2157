"""Generated full-pipeline SQL oracles: the page synthesizer is pure doc_id
arithmetic, so complete sections/mentions/triples outputs are recomputable in SQL."""

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
from ._shared import _exchange_buckets, _kg, _merge_partials
from .kg_flagship import PAGE_URL_SQL, TITLE_SQL, _KWIC_WINDOW


# ---------------------------------------------------------------------
# full-pipeline SQL oracles (generated): the synthesizer is pure
# doc_id arithmetic (corpus.plan_document), so the complete sections /
# mentions / triples outputs are recomputable in SQL — branch per
# structural case (s ∈ 1..4, preamble, sub/subsub), titles via cycled
# word indexing over regexp_extract_all(text).
# ---------------------------------------------------------------------

def _cyc_sql(start: int, count: int) -> str:
    """SQL for corpus._cyc(words, start, count): cycled 1-indexed word
    list joined by single spaces."""
    parts = ", ".join("w[((%d + %d) %% nw) + 1]" % (start, j)
                      for j in range(count))
    return "array_to_string([%s], ' ')" % parts


_D_CTE = f"""
  SELECT doc_id, lang,
         {PAGE_URL_SQL} AS url,
         regexp_extract_all(text, '\\S+') AS w,
         greatest(len(regexp_extract_all(text, '\\S+')), 1) AS nw,
         {TITLE_SQL} AS title
  FROM documents
"""


def _section_rows():
    """(section_uri, kind, ordinal, title, parent_uri, position, cond)
    SQL fragments — one tuple per structural row kind of
    corpus.plan_document / expected_sections."""
    rows = [
        ("url", "'body'", "CAST(NULL AS VARCHAR)", "title",
         "CAST(NULL AS VARCHAR)", "0", "TRUE"),
        ("url || '#PS1'", "'preamble'", "CAST(NULL AS VARCHAR)",
         "'Abstract'", "url", "1", "doc_id % 2 = 0"),
    ]
    pre = "(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)"

    def sub(s):
        return "(CASE WHEN (doc_id + %d) %% 2 = 0 THEN 1 ELSE 0 END)" % s

    def ssub(s):
        return "(CASE WHEN (doc_id + %d) %% 4 = 0 THEN 1 ELSE 0 END)" % s

    for s in (1, 2, 3, 4):
        prior = " + ".join("(1 + %s + %s)" % (sub(sp), ssub(sp))
                           for sp in range(1, s)) or "0"
        pos = "1 + %s + %s" % (pre, prior)
        cond = "%d <= 2 + doc_id %% 3" % s
        rows.append((
            "url || '#S%d'" % s, "'section'", "'%d'" % s,
            _cyc_sql(3 + 2 * s, 2), "url", pos, cond))
        rows.append((
            "url || '#S%d.1'" % s, "'subsection'", "'%d.1'" % s,
            _cyc_sql(11 * s, 2), "url || '#S%d'" % s, "(%s) + 1" % pos,
            "%s AND (doc_id + %d) %% 2 = 0" % (cond, s)))
        rows.append((
            "url || '#S%d.1.1'" % s, "'subsubsection'", "'%d.1.1'" % s,
            _cyc_sql(13 * s + 1, 2), "url || '#S%d.1'" % s,
            "(%s) + 2" % pos,
            "%s AND (doc_id + %d) %% 4 = 0" % (cond, s)))
    return rows


KG_SECTIONS_SQL = "WITH d AS (%s)\n%s" % (_D_CTE, "\nUNION ALL\n".join(
    "SELECT url, %s AS section_uri, %s AS kind, %s AS ordinal, "
    "%s AS title, %s AS parent_uri, CAST(%s AS INTEGER) AS position "
    "FROM d WHERE %s" % (su, kind, o, t, p, pos, cond)
    for su, kind, o, t, p, pos, cond in _section_rows()))


def _kg_triples_sql() -> str:
    sec_branches = "\nUNION ALL\n".join(
        "SELECT doc_id, url, %s AS section_uri, %s AS ordinal, "
        "%s AS title, %s AS parent_uri FROM d WHERE %s"
        % (su, o, t, p, cond)
        for su, kind, o, t, p, pos, cond in _section_rows()
        if kind != "'body'")
    sameas_vals = ",\n".join(
        "('%s', 'owl:sameAs', '%s', FALSE, '', '', '')" % (u, c)
        for u, c in sorted(corpus.expected_canonical().items()) if u != c)
    return f"""
WITH d AS ({_D_CTE}),
sec AS ({sec_branches})
SELECT url AS subj, 'rdf:type' AS pred, 'bibo:Document' AS obj,
       FALSE AS obj_is_literal, '' AS obj_lang, '' AS obj_datatype,
       url AS source_url FROM d
UNION ALL SELECT url, 'dcterms:title', title, TRUE, lang, '', url FROM d
UNION ALL SELECT url, 'dcterms:identifier', CAST(doc_id AS VARCHAR),
       TRUE, '', '', url FROM d
UNION ALL SELECT url, 'prov:wasGeneratedBy', '{corpus.ENGINE_NAME}',
       TRUE, '', '', url FROM d
UNION ALL SELECT section_uri, 'rdf:type', 'bibo:DocumentPart',
       FALSE, '', '', url FROM sec
UNION ALL SELECT section_uri, 'dcterms:title', title, TRUE, '', '', url
       FROM sec
UNION ALL SELECT section_uri, 'bibo:chapter', ordinal, TRUE, '', '', url
       FROM sec WHERE ordinal IS NOT NULL
UNION ALL SELECT section_uri, 'dcterms:isPartOf', parent_uri,
       FALSE, '', '', url FROM sec
UNION ALL SELECT url || '#S1', 'dcterms:references',
       'https://rfc.example.org/rfc/' || (100 + doc_id % 900),
       FALSE, '', '', url FROM d WHERE doc_id % 3 = 0
UNION ALL SELECT url || '#S1', 'dcterms:references',
       'https://rfc.example.org/rfc/2616#S2.2',
       FALSE, '', '', url FROM d WHERE doc_id % 7 = 0
UNION ALL SELECT url || '#S1', 'dcterms:references',
       'https://spec.example.org/s/' || (doc_id % 50),
       FALSE, '', '', url FROM d WHERE doc_id % 5 = 1
UNION ALL SELECT url || '#S2', 'dcterms:subject',
       CASE WHEN doc_id % 24 = 0 THEN 'https://hot.example.org/x/0'
            ELSE 'https://kb.example.org/entity/E' || (doc_id % 24) END,
       FALSE, '', '', url FROM d
UNION ALL SELECT * FROM (VALUES
{sameas_vals}
) v(subj, pred, obj, obj_is_literal, obj_lang, obj_datatype, source_url)
"""


KG_TRIPLES_SQL = _kg_triples_sql()


def kg_labels(sf_dir):
    """facet.label_map over the flagship triples: best label per
    resource by the reference's predicate priority. In this KG the
    only label predicate is dcterms:title, so the oracle reduces to
    the lexicographic-min title per subject."""
    from ...facet import label_map

    labels = label_map(_kg(sf_dir)["triples"])
    return pd.DataFrame(sorted(labels.items()), columns=["uri", "label"])


KG_LABELS_SQL = (
    "WITH t AS (%s) SELECT subj AS uri, min(obj) AS label FROM t "
    "WHERE pred = 'dcterms:title' AND obj_is_literal GROUP BY subj"
    % KG_TRIPLES_SQL)


# rdfs:subClassOf edges (class, superclass) — declarative engine
# config, the same altitude as uris.URISpace / mentions grammar
# registries. Must be acyclic (a class hierarchy).
TYPE_ONTOLOGY = (
    ("bibo:Document", "bibo:BibliographicResource"),
    ("bibo:DocumentPart", "bibo:BibliographicResource"),
    ("bibo:BibliographicResource", "foaf:Document"),
    ("foaf:Document", "owl:Thing"),
)


def _subclass_closure(edges) -> dict:
    """Transitive closure of the class DAG: class → sorted tuple of
    ALL superclasses. Runs where the ontology lives — it is
    authority-sized (dozens..thousands of classes), never
    corpus-sized."""
    parents: dict = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    clo: dict = {}

    def expand(c):
        if c in clo:
            return clo[c]
        out = set()
        for p in parents.get(c, ()):
            out.add(p)
            out |= expand(p)
        clo[c] = out
        return out

    for c in list(parents):
        expand(c)
    return {c: tuple(sorted(v)) for c, v in clo.items() if v}


def kg_type_inference(sf_dir):
    """RDFS subClassOf entailment (rules rdfs9 + rdfs11) over the
    flagship triples — the reference's ontology surface (ontologies /
    commondata graphs loaded once per repo process,
    documentrepository.py ontologies property; here the hierarchy is
    the declarative TYPE_ONTOLOGY config). Output = the full entailed
    type set: DISTINCT (subj, obj) over asserted rdf:type triples ∪
    every superclass of the asserted class.

    Scale shape: the closure is computed once on the tiny config and
    broadcast inside the map fn (classes are authority-sized);
    entailment is a ZERO-SHUFFLE map-side expansion. Dedup is
    batch-local and that is exact here because each subject carries
    exactly ONE asserted rdf:type row (one row per subject ⇒ all of a
    subject's entailed rows are emitted together); a KG with multiple
    asserted types per subject would chain
    canonicalize.dedup_exact_triples (doc-local fast path still
    applies — entailment never changes the subject)."""
    clo = _subclass_closure(TYPE_ONTOLOGY)

    def entail(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], "rdf:type"))
        subs = t["subj"].to_pylist()
        objs = t["obj"].to_pylist()
        out_s, out_o, seen = [], [], set()
        for s, o in zip(subs, objs):
            for x in (o, *clo.get(o, ())):
                if (s, x) not in seen:
                    seen.add((s, x))
                    out_s.append(s)
                    out_o.append(x)
        return pa.table({"subj": pa.array(out_s, pa.string()),
                         "obj": pa.array(out_o, pa.string())})

    return _kg(sf_dir)["triples"].map_batches(
        entail, batch_format="pyarrow")


def _type_inference_sql() -> str:
    """Closure unrolled to the config DAG's depth bound (|edges| path
    extensions always suffice) — the repo's unrolled-replay
    discipline; recursion is unnecessary because the ontology is a
    compile-time constant, not data."""
    vals = ", ".join("('%s', '%s')" % e for e in TYPE_ONTOLOGY)
    depth = len(TYPE_ONTOLOGY)
    ctes = ["onto(c, p) AS (SELECT * FROM (VALUES %s) v(c, p))" % vals,
            "clo0 AS (SELECT c, p FROM onto)"]
    for i in range(1, depth):
        ctes.append(
            "clo%d AS (SELECT c, p FROM clo%d UNION"
            " SELECT a.c, b.p FROM clo%d a JOIN onto b ON a.p = b.c)"
            % (i, i - 1, i - 1))
    return """
WITH %s,
t AS (%s),
a AS (SELECT subj, obj FROM t WHERE pred = 'rdf:type')
SELECT DISTINCT subj, obj FROM (
  SELECT subj, obj FROM a
  UNION ALL
  SELECT a.subj, clo.p AS obj FROM a JOIN clo%d clo ON clo.c = a.obj)
""" % (",\n".join(ctes), KG_TRIPLES_SQL, depth - 1)


KG_TYPE_INFERENCE_SQL = _type_inference_sql()


# declarative rdfs:domain / rdfs:range ontology for the predicates the
# flagship KG emits (pred, domain class or '', range class or '') —
# the property-axiom half of the reference's ontologies surface
# (documentrepository.py ontologies property; TYPE_ONTOLOGY above is
# the class-axiom half). Literal-valued predicates declare no range.
PRED_ONTOLOGY = (
    ("dcterms:isPartOf", "bibo:DocumentPart", "bibo:Document"),
    ("dcterms:references", "bibo:DocumentPart", "foaf:Document"),
    ("dcterms:subject", "bibo:DocumentPart", "skos:Concept"),
    ("prov:wasGeneratedBy", "prov:Entity", "prov:Activity"),
)


def kg_domain_range_inference(sf_dir):
    """RDFS domain/range entailment (rules rdfs2 + rdfs3) over the
    flagship triples: (s p o) ∧ (p rdfs:domain C) ⊢ (s rdf:type C);
    (s p o) ∧ (p rdfs:range C) ⊢ (o rdf:type C) — the property-axiom
    complement of ``kg_type_inference``'s subClassOf closure. Output =
    DISTINCT (subj, obj) inferred type assertions (asserted rdf:type
    rows are NOT echoed — this is the delta a materialized-inference
    store would add).

    Scale shape: the axiom table is authority-sized and rides the
    task spec (broadcast-by-closure); entailment is a zero-shuffle
    map-side emission with batch-local dedup. Unlike subClassOf
    inference, the SAME entailed row here can be produced from
    DIFFERENT batches (a section subject gains bibo:DocumentPart from
    dcterms:isPartOf in the meta-triples branch and again from
    dcterms:references in the mentions branch), so a global distinct
    is required: ONE subject-hash-bucketed exchange with a vectorized
    drop_duplicates per bucket — the dedup_exact_triples shape
    (canonicalize.py:372) on a two-column projection."""
    dom = {p: d for p, d, _ in PRED_ONTOLOGY if d}
    rng = {p: r for p, _, r in PRED_ONTOLOGY if r}
    buckets = _exchange_buckets(sf_dir)

    def entail(df: pd.DataFrame) -> pd.DataFrame:
        preds = df["pred"].to_numpy()
        subs = df["subj"].to_numpy()
        objs = df["obj"].to_numpy()
        out_s: list = []
        out_o: list = []
        for p, s, o in zip(preds, subs, objs):
            d = dom.get(p)
            if d is not None:
                out_s.append(s)
                out_o.append(d)
            r = rng.get(p)
            if r is not None:
                out_s.append(o)
                out_o.append(r)
        out = pd.DataFrame({"subj": out_s, "obj": out_o}).drop_duplicates()
        h = pd.util.hash_pandas_object(out["subj"], index=False).values
        return out.assign(_bucket=(h % np.uint64(buckets)).astype("int32"))

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return (g[["subj", "obj"]].drop_duplicates()
                .reset_index(drop=True))

    return (_kg(sf_dir)["triples"]
            .map_batches(entail, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(distinct, batch_format="pandas"))


def _domain_range_sql() -> str:
    vals = ", ".join("('%s', '%s', '%s')" % e for e in PRED_ONTOLOGY)
    return """
WITH onto(pr, dom, rng) AS (SELECT * FROM (VALUES %s) v(pr, dom, rng)),
t AS (%s)
SELECT DISTINCT subj, obj FROM (
  SELECT t.subj, o.dom AS obj FROM t JOIN onto o
    ON o.pr = t.pred AND o.dom <> ''
  UNION ALL
  SELECT t.obj AS subj, o.rng AS obj FROM t JOIN onto o
    ON o.pr = t.pred AND o.rng <> '')
""" % (vals, KG_TRIPLES_SQL)


KG_DOMAIN_RANGE_SQL = _domain_range_sql()


# single-copy SQL fragments shared by the mentions / xhtml / KWIC
# oracles (repo convention: every arithmetic recipe lives exactly once)
_LABELS_VALS = ",\n".join(
    "(%d, '%s')" % (i, lbl.replace("'", "''"))
    for i, lbl in enumerate(corpus.ENTITY_LABELS))
_ENT_SURFACE_SQL = (
    "CASE idx WHEN 0 THEN label WHEN 1 THEN label || ' System' "
    "ELSE substr(label, 1, length(label) - 1) || 'x' END")


def _sec_text_sql(s: int) -> str:
    """SQL reconstruction of corpus section-``s`` paragraph TEXT
    (corpus.plan_document body arithmetic): base cycled words plus the
    citation / entity / pre-block / list fragments appended in render
    order. Evaluated against the ``ent`` CTE shape (needs doc_id plus
    e/label/idx from the entity-labels join when s == 2)."""
    parts = [_cyc_sql(7 * s, 8)]
    if s == 1:
        parts.append(
            "(CASE WHEN doc_id % 3 = 0 THEN ' as defined in RFC ' || "
            "(100 + doc_id % 900) ELSE '' END)")
        parts.append(
            "(CASE WHEN doc_id % 7 = 0 THEN "
            "' see section 2.2 of [RFC 2616] for details' ELSE '' END)")
        parts.append(
            "(CASE WHEN doc_id % 5 = 1 THEN "
            "' published at https://spec.example.org/s/' || (doc_id % 50)"
            " || ' today' ELSE '' END)")
    if s == 2:
        parts.append("' the ' || %s || ' project ships'" % _ENT_SURFACE_SQL)
    if s == 1:
        parts.append(
            "(CASE WHEN doc_id % 5 = 0 THEN ' raw   text' || chr(10) || "
            "'  line' || doc_id || '()' || chr(10) || 'end' ELSE '' END)")
    # <ul> lands in the LAST section (s == n_sec = 2 + doc_id % 3,
    # so only s ∈ {2,3,4} can be last — never s=1)
    if s >= 2:
        parts.append(
            "(CASE WHEN doc_id %% 4 = 1 AND doc_id %% 3 = %d THEN ' ' || %s"
            " || ' ' || %s ELSE '' END)" % (s - 2, _cyc_sql(17, 2),
                                            _cyc_sql(19, 2)))
    return " || ".join(parts)


def _kg_mentions_sql() -> str:
    b1 = _cyc_sql(7, 8)    # section 1 paragraph base (s=1 → start 7·1)
    b2 = _cyc_sql(14, 8)   # section 2 paragraph base
    secrfc_str = "section 2.2 of [RFC 2616]"
    secrfc_full = " see section 2.2 of [RFC 2616] for details"
    rfc_len = ("(CASE WHEN doc_id % 3 = 0 THEN 19 + "
               "length(CAST(100 + doc_id % 900 AS VARCHAR)) ELSE 0 END)")
    sec_len = ("(CASE WHEN doc_id %% 7 = 0 THEN %d ELSE 0 END)"
               % len(secrfc_full))
    labels_vals = _LABELS_VALS
    ent_surface = _ENT_SURFACE_SQL
    return f"""
WITH d AS ({_D_CTE}),
b AS (SELECT d.*, length({b1}) AS l1, length({b2}) AS l2 FROM d),
ent AS (
  SELECT b.*, e, label, (doc_id // 24) % 3 AS idx
  FROM b JOIN (VALUES {labels_vals}) labels(e, label) ON e = doc_id % 24
)
SELECT url, url || '#S1' AS section_uri,
       'RFC ' || (100 + doc_id % 900) AS surface,
       CAST(l1 + 15 AS INTEGER) AS "start",
       CAST(l1 + 19 + length(CAST(100 + doc_id % 900 AS VARCHAR))
            AS INTEGER) AS "end",
       'rfc' AS kind,
       'https://rfc.example.org/rfc/' || (100 + doc_id % 900) AS linked_uri,
       'dcterms:references' AS predicate
FROM b WHERE doc_id % 3 = 0
UNION ALL
SELECT url, url || '#S1', '{secrfc_str}',
       CAST(l1 + {rfc_len} + 5 AS INTEGER),
       CAST(l1 + {rfc_len} + 5 + {len(secrfc_str)} AS INTEGER),
       'sec_rfc', 'https://rfc.example.org/rfc/2616#S2.2',
       'dcterms:references'
FROM b WHERE doc_id % 7 = 0
UNION ALL
SELECT url, url || '#S1',
       'https://spec.example.org/s/' || (doc_id % 50),
       CAST(l1 + {rfc_len} + {sec_len} + 14 AS INTEGER),
       CAST(l1 + {rfc_len} + {sec_len} + 14
            + length('https://spec.example.org/s/' || (doc_id % 50))
            AS INTEGER),
       'url', 'https://spec.example.org/s/' || (doc_id % 50),
       'dcterms:references'
FROM b WHERE doc_id % 5 = 1
UNION ALL
SELECT url, url || '#S2',
       {ent_surface},
       CAST(l2 + 5 AS INTEGER),
       CAST(l2 + 5 + length({ent_surface}) AS INTEGER),
       -- a label already ending in 'x' ("Vector Index") is its own
       -- "misspelling" → the exact matcher claims it, not the fuzzy one
       CASE WHEN idx = 2 AND right(label, 1) <> 'x'
            THEN 'entity_fuzzy' ELSE 'entity' END,
       'https://v' || (CASE WHEN idx = 1 AND e % 3 <> 0 THEN 1 ELSE 0 END)
           || '.alt.example.org/e/' || e,
       'dcterms:subject'
FROM ent
"""


KG_MENTIONS_SQL = _kg_mentions_sql()


def kg_anchor_text(sf_dir):
    """Anchor-text profile per cited target — the web-graph primitive
    search engines and KG label miners run over link anchors (the
    surface forms citing a page ARE its crowd-sourced labels; Craswell
    et al. SIGIR'01 — public literature): per linked_uri from the
    REAL mention pipeline, the dominant surface form, its count, the
    total mentions and the surface diversity.

    Scale shape: batch-local (target, surface) count partials (the
    lossless combiner) feed ONE target-bucketed exchange; a target's
    whole profile lives in one bucket, so top-surface / totals /
    diversity finalize vectorized per bucket and the per-target rows
    are FINAL — the merge block only sorts. The oracle recomputes the
    mentions from doc arithmetic (KG_MENTIONS_SQL) and replays the
    same window ranking."""
    buckets = _exchange_buckets(sf_dir, "documents")
    mentions = _kg(sf_dir)["mentions"]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "linked_uri": t["linked_uri"].to_pandas().astype(object),
            "surface": t["surface"].to_pandas().astype(object)})
        p = (df.groupby(["linked_uri", "surface"], as_index=False)
             .size().rename(columns={"size": "n"}))
        p["n"] = p["n"].astype("int64")
        h = pd.util.hash_pandas_object(p["linked_uri"],
                                       index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_profile(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["linked_uri", "surface"], as_index=False)
             ["n"].sum())
        c = c.sort_values(["linked_uri", "n", "surface"],
                          ascending=[True, False, True],
                          kind="mergesort")
        tot = c.groupby("linked_uri", as_index=False).agg(
            total_mentions=("n", "sum"), n_surfaces=("n", "size"))
        top = c.groupby("linked_uri", as_index=False).first()
        out = top.merge(tot, on="linked_uri")
        return pd.DataFrame({
            "linked_uri": out["linked_uri"].astype(object),
            "top_surface": out["surface"].astype(object),
            "top_n": out["n"].astype("int64"),
            "total_mentions": out["total_mentions"].astype("int64"),
            "n_surfaces": out["n_surfaces"].astype("int64")})

    per_bucket = (mentions.map_batches(partial, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_profile, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("linked_uri").reset_index(drop=True)

    return _merge_partials(per_bucket, final)


KG_ANCHOR_SQL = f"""
WITH m AS ({KG_MENTIONS_SQL}),
c AS (
  SELECT linked_uri, surface, count(*) AS n
  FROM m GROUP BY 1, 2),
r AS (
  SELECT linked_uri, surface, n,
         row_number() OVER (PARTITION BY linked_uri
                            ORDER BY n DESC, surface) AS rk,
         CAST(sum(n) OVER (PARTITION BY linked_uri) AS BIGINT)
           AS total_mentions,
         count(*) OVER (PARTITION BY linked_uri) AS n_surfaces
  FROM c)
SELECT linked_uri, surface AS top_surface,
       CAST(n AS BIGINT) AS top_n, total_mentions,
       CAST(n_surfaces AS BIGINT) AS n_surfaces
FROM r WHERE rk = 1 ORDER BY linked_uri
"""


def _sql_lit(s: str) -> str:
    """SQL string literal (embedded newlines are valid in standard
    string literals; single quotes double)."""
    return "'%s'" % s.replace("'", "''")


def _esc_xml(expr: str, quote: bool) -> str:
    """html.escape as a SQL replace chain (& first)."""
    e = ("replace(replace(replace(%s, '&', '&amp;'), '<', '&lt;'), "
         "'>', '&gt;')" % expr)
    if quote:
        e = ("replace(replace(%s, '\"', '&quot;'), '''', '&#x27;')" % e)
    return e


def _kg_xhtml_sql() -> str:
    """Full XHTML render recomputed in SQL: per-section div fragments
    (with the arithmetic-derived section TEXTS) string_agg'd in
    position order inside the head/body envelope — byte-identical to
    sources/xhtml.render_document over the flagship sections."""
    labels_vals = _LABELS_VALS

    def cyc(start, count):
        return _cyc_sql(start, count)

    sec_text = _sec_text_sql

    def div(su, kind_lit, ordinal, title, parent, text):
        pieces = [
            _sql_lit('  <div about="'), _esc_xml(su, True),
            _sql_lit('" property="dcterms:title" content="'),
            _esc_xml(title, True),
            _sql_lit('" typeof="bibo:DocumentPart" class="%s">\n' % kind_lit),
        ]
        if ordinal is not None:
            pieces += [
                _sql_lit('    <span about="'), _esc_xml(su, True),
                _sql_lit('" property="bibo:chapter" content="'),
                _esc_xml(ordinal, True), _sql_lit('"/>\n'),
            ]
        pieces += [
            _sql_lit('    <span rel="dcterms:isPartOf" href="'),
            _esc_xml(parent, True), _sql_lit('"/>\n'),
            _sql_lit("    <p>"), _esc_xml(text, False),
            _sql_lit("</p>\n"), _sql_lit("  </div>\n"),
        ]
        return " || ".join(pieces)

    branches = []
    branches.append(
        "SELECT url, 1 AS position, %s AS frag FROM d WHERE doc_id %% 2 = 0"
        % div("url || '#PS1'", "preamble", None, "'Abstract'", "url",
              cyc(1, 5)))
    for su, kind, o, t, p, pos, cond in _section_rows():
        if kind in ("'body'", "'preamble'"):
            continue
        k = kind.strip("'")
        s = int(su.split("#S")[1].rstrip("'").split(".")[0])
        if k == "section":
            text = sec_text(s)
        elif k == "subsection":
            text = cyc(13 * s, 6)
        else:
            text = cyc(15 * s, 4)
        branches.append(
            "SELECT url, %s AS position, %s AS frag FROM d WHERE %s"
            % (pos, div(su, k, o, t, p, text), cond))

    head = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<html xmlns="http://www.w3.org/1999/xhtml"\n'
        '      xmlns:dcterms="http://purl.org/dc/terms/"\n'
        '      xmlns:bibo="http://purl.org/ontology/bibo/"\n'
        '      xmlns:prov="http://www.w3.org/ns/prov#">\n')
    return f"""
WITH d AS (
  SELECT dd.*, e, label, (doc_id // 24) % 3 AS idx
  FROM ({_D_CTE}) dd
  JOIN (VALUES {labels_vals}) labels(e, label) ON e = doc_id % 24
),
frags AS (
{chr(10).join("UNION ALL " + b if i else b for i, b in enumerate(branches))}
),
divs AS (
  SELECT url, string_agg(frag, '' ORDER BY position) AS body_divs
  FROM frags GROUP BY url
),
docs0 AS (SELECT DISTINCT url, title, lang FROM d)
SELECT docs0.url,
       {_sql_lit(head)}
       || '<head><title>' || {_esc_xml("title", True)} || '</title></head>' || chr(10)
       || '<body about="' || {_esc_xml("docs0.url", True)} || '" xml:lang="'
       || {_esc_xml("lang", True)} || '">' || chr(10)
       || coalesce(body_divs, '')
       || '</body>' || chr(10) || '</html>' || chr(10) AS xhtml
FROM docs0 LEFT JOIN divs ON docs0.url = divs.url
"""


KG_XHTML_SQL = _kg_xhtml_sql()


def _kg_kwic_sql() -> str:
    """Mention contexts recomputed in SQL: the mentions oracle joined
    to the arithmetic-reconstructed S1/S2 section texts, windows via
    1-based substr with the same clamping as the Python slice."""
    w = _KWIC_WINDOW
    return f"""
WITH m AS ({KG_MENTIONS_SQL}),
d AS ({_D_CTE}),
ent AS (
  SELECT d.*, e, label, (doc_id // 24) % 3 AS idx
  FROM d JOIN (VALUES {_LABELS_VALS}) labels(e, label) ON e = doc_id % 24
),
stext AS (
  SELECT url, url || '#S1' AS section_uri, {_sec_text_sql(1)} AS stext
  FROM ent
  UNION ALL
  SELECT url, url || '#S2' AS section_uri, {_sec_text_sql(2)} AS stext
  FROM ent
)
SELECT m.url, m.section_uri, m.surface, m."start", m."end", m.linked_uri,
       substr(stext, greatest(1, m."start" - {w} + 1),
              m."start" - greatest(0, m."start" - {w})) AS ctx_before,
       substr(stext, m."end" + 1, {w}) AS ctx_after
FROM m JOIN stext
  ON m.url = stext.url AND m.section_uri = stext.section_uri
"""


KG_KWIC_SQL = _kg_kwic_sql()
