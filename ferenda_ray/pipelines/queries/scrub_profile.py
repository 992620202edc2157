"""PII scrubbing, duplicated-passage scrub / decontamination, table profiling."""

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
from ._shared import _exchange_buckets, _read
from .sketches import (
    _CC_CTES,
    _jaccard_pair_select,
    _shingle_cte,
    _split_select,
)
from .kg_fullsql import _sql_lit


# ---------------------------------------------------------------------
# PII scrubbing, duplicated passages, table profiling
# ---------------------------------------------------------------------

def pii_scan(sf_dir):
    """PII detection + redaction over documents. The word-salad corpus
    carries no natural PII, so the query plants emails / NANP phones /
    SSN-shaped ids / IPv4s by pure doc_id arithmetic (planted-oracle
    convention, cf. simhash_planted_recall) and then runs the real
    regex scrubber (stages/pii.py). The SQL oracle re-plants with the
    identical string arithmetic and re-scans with the IDENTICAL
    RE2-compatible patterns via regexp_extract_all / regexp_replace —
    so the check exercises true regex-match and byte-level redaction
    parity, not just arithmetic. No shuffle anywhere: plant, scan and
    filter are all fused stateless maps."""
    from ...stages.pii import pii_scan as scan_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = []
        for i, txt in zip(ids, texts):
            s = txt or ""
            if i % 7 == 0:
                s += " contact user%d@example.org" % i
            if i % 5 == 0:
                s += " call +1 555-%d-%d" % (700 + i % 300,
                                             1000 + i % 9000)
            if i % 13 == 0:
                s += " ssn %d-%d-%d" % (100 + i % 900, 10 + i % 90,
                                        1000 + i % 9000)
            if i % 11 == 0:
                s += " from 10.%d.0.%d" % (i % 256, i % 100)
            out.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    scanned = (ds.map_batches(plant, batch_format="pyarrow")
               .map_batches(scan_batch, batch_format="pyarrow"))

    def any_pii(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["n_email"] + df["n_phone"] + df["n_ssn"]
             + df["n_ipv4"]) > 0
        return df[m]

    return scanned.map_batches(any_pii, batch_format="pandas")


def _pii_sql() -> str:
    from ...stages.pii import PII_PATTERNS

    aug = (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id"
        " || '@example.org' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555-'"
        " || (700 + doc_id % 300) || '-' || (1000 + doc_id % 9000)"
        " ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' ssn '"
        " || (100 + doc_id % 900) || '-' || (10 + doc_id % 90) || '-'"
        " || (1000 + doc_id % 9000) ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.'"
        " || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END")
    counts = ",\n       ".join(
        "len(regexp_extract_all(text, '%s')) AS n_%s"
        % (pat.replace("'", "''"), name)
        for name, pat, _ in PII_PATTERNS)
    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = "regexp_replace(%s, '%s', '%s', 'g')" % (
            clean, pat.replace("'", "''"), token)
    return (
        "WITH aug AS (SELECT doc_id, %s AS text FROM documents),\n"
        "scan AS (SELECT doc_id,\n       %s,\n       %s AS clean"
        " FROM aug)\n"
        "SELECT * FROM scan"
        " WHERE n_email + n_phone + n_ssn + n_ipv4 > 0" % (
            aug, counts, clean))


PII_SCAN_SQL = _pii_sql()


def dup_passages(sf_dir):
    """Cross-document duplicated-passage detection (exact word-6-gram
    document frequency — stages/dedup.duplicated_passages). Beyond the
    ~1k natural 6-gram collisions the small-vocabulary corpus already
    contains, a 6-word marker passage is planted on doc_id % 10 == 0
    so even sf0.001 has a guaranteed high-frequency passage. The SQL
    oracle recomputes the FULL output (natural + planted + junction
    grams) from the same augmented text with string_split /
    generate_series / list slicing."""
    from ...stages.dedup import duplicated_passages

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [(txt or "")
               + (" shared passage marker alpha beta gamma"
                  if i % 10 == 0 else "")
               for i, txt in zip(ids, texts)]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    return duplicated_passages(
        ds.map_batches(plant, batch_format="pyarrow"), n=6,
        num_buckets=_exchange_buckets(sf_dir))


DUP_PASSAGES_SQL = """
WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 10 = 0
                      THEN ' shared passage marker alpha beta gamma'
                      ELSE '' END AS text
  FROM documents),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 5)) AS i
        FROM words),
grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+5], ' ') AS gram
          FROM idx)
SELECT gram, count(*) AS n_docs
FROM grams GROUP BY gram HAVING count(*) >= 2
"""


def scrub_passages(sf_dir):
    """Exact-substring scrubbing (dedup.scrub_duplicated_passages):
    every word position covered by a cross-doc-duplicated word-6-gram
    is removed; output is the FULL cleaned corpus (doc_id,
    clean_text). Shares dup_passages' planted marker so removal
    provably triggers at every sf; the SQL oracle rebuilds each
    cleaned text via the same gram-df / covered-position /
    string_agg-by-position arithmetic."""
    from ...stages.dedup import scrub_duplicated_passages

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [(txt or "")
               + (" shared passage marker alpha beta gamma"
                  if i % 10 == 0 else "")
               for i, txt in zip(ids, texts)]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    labeled = scrub_duplicated_passages(
        ds.map_batches(plant, batch_format="pyarrow"), n=6,
        num_buckets=_exchange_buckets(sf_dir))
    return labeled.map_batches(
        lambda df: df.rename(columns={"key": "doc_id"}),
        batch_format="pandas")


SCRUB_PASSAGES_SQL = """
WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 10 = 0
                      THEN ' shared passage marker alpha beta gamma'
                      ELSE '' END AS text
  FROM documents),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 5)) AS i
        FROM words),
g AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS gram FROM idx),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT g.doc_id,
               unnest(generate_series(g.i, g.i + 5)) AS p
        FROM g JOIN dup USING (gram)),
pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS j
        FROM words),
kept AS (
  SELECT p.doc_id, p.j, p.w[p.j] AS word
  FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.p = p.j
  WHERE c.p IS NULL)
SELECT a.doc_id,
       coalesce(string_agg(k.word, ' ' ORDER BY k.j), '') AS clean_text
FROM aug a LEFT JOIN kept k USING (doc_id)
GROUP BY a.doc_id
"""


# shared bench/train split for the decontamination pair: every
# doc_id % 53 == 0 document is the held-out "benchmark suite"; the
# planted dup_passages marker guarantees overlap at every sf (any
# train doc with doc_id % 10 == 0 shares the marker 6-gram with any
# bench doc with doc_id % 530 == 0), on top of the corpus' natural
# small-vocabulary 6-gram collisions — the SQL recomputes all of it.
_DECON_AUG = """
  SELECT doc_id,
         text || CASE WHEN doc_id % 10 = 0
                      THEN ' shared passage marker alpha beta gamma'
                      ELSE '' END AS text
  FROM documents"""

_DECON_GRAMS = """
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 5)) AS i
        FROM words),
-- the operator exchanges md5-prefix gram hashes, not gram strings;
-- the oracle computes the identical hash so parity is exact
g AS (SELECT DISTINCT doc_id,
             CAST('0x' || substr(md5(array_to_string(w[i:i+5], ' ')),
                                 1, 15) AS BIGINT) AS gram
      FROM idx),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 53 = 0),
c AS (SELECT DISTINCT doc_id FROM g
      WHERE doc_id % 53 <> 0
        AND gram IN (SELECT gram FROM bench))"""


def _decon_inputs(sf_dir):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [(txt or "")
               + (" shared passage marker alpha beta gamma"
                  if i % 10 == 0 else "")
               for i, txt in zip(ids, texts)]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    aug = ds.map_batches(plant, batch_format="pyarrow")

    def side(keep_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            m = pa.array(ids % 53 == 0)
            return t.filter(m if keep_bench else pc.invert(m))
        return fn

    return (aug.map_batches(side(False), batch_format="pyarrow"),
            aug.map_batches(side(True), batch_format="pyarrow"))


def doc_contamination(sf_dir):
    """Benchmark-contamination flags (dedup.contamination_flags — the
    GPT-3 / Pile n-gram decontamination recipe at word-6-gram grain):
    1 for every training doc sharing >= 1 6-gram with the held-out
    doc_id % 53 == 0 benchmark slice. Both grams exchanges are
    narrow — text never crosses; the SQL oracle recomputes the full
    flag table from the same grams."""
    from ...stages.dedup import contamination_flags

    train, bench = _decon_inputs(sf_dir)
    flags = contamination_flags(train, bench, n=6,
                                num_buckets=_exchange_buckets(sf_dir))
    return flags.map_batches(
        lambda df: df.rename(columns={"key": "doc_id"}),
        batch_format="pandas")


DOC_CONTAMINATION_SQL = """
WITH aug AS (%s),%s
SELECT d.doc_id,
       CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contaminated
FROM (SELECT doc_id FROM aug WHERE doc_id %% 53 <> 0) d
LEFT JOIN c USING (doc_id)
""" % (_DECON_AUG, _DECON_GRAMS)


def doc_decontaminate(sf_dir):
    """Removal counterpart (dedup.decontaminate): the surviving
    training docs as (doc_id, text), text byte-exact vs the SQL
    reconstruction — text crosses only the final key-bucketed hop."""
    from ...stages.dedup import decontaminate

    train, bench = _decon_inputs(sf_dir)
    out = decontaminate(train, bench, n=6,
                        num_buckets=_exchange_buckets(sf_dir))
    return out.map_batches(
        lambda df: df.rename(columns={"key": "doc_id"}),
        batch_format="pandas")


DOC_DECONTAMINATE_SQL = """
WITH aug AS (%s),%s
SELECT doc_id, text FROM aug
WHERE doc_id %% 53 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM c)
""" % (_DECON_AUG, _DECON_GRAMS)


def profile_documents(sf_dir):
    """Column profile of the documents table (stages/profiling.py):
    n_rows / n_null / exact n_distinct / min / max per column, with
    native-typed min-max merge and a bucketed distinct-count
    exchange."""
    from ...stages.profiling import profile_columns

    return profile_columns(_read(sf_dir, "documents"))


def xhtml_annotated(sf_dir):
    """Annotation-joined presentation render — the reference's
    generate()-with-annotations step (transformer.py:25-330 consuming
    prep_annotation_file output). The corpus' natural citation targets
    are all external URI spaces, so this planted variant mints a
    minimal one-body-row document per page and plants internal
    citations (doc_id % 3 == 1 cites page (doc_id*7) % 100); the full
    rendered XHTML — including each target's RDFa
    ``<aside class=annotations>`` with citing urls + titles in
    citing-url order — is recomputed byte-exactly by SQL string
    assembly. Exercises render_xhtml's typed annotation-row union and
    bucketed per-url render, not just the bare sink."""
    from ...sources.xhtml import render_xhtml

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    SEC_SCHEMA = pa.schema([("url", pa.string()), ("kind", pa.string()),
                            ("title", pa.string()), ("lang", pa.string()),
                            ("section_uri", pa.string()),
                            ("ordinal", pa.string()),
                            ("parent_uri", pa.string()),
                            ("text", pa.string()),
                            ("position", pa.int64())])

    def body_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        urls = ["https://%s.example.org/d/%d" % (s[3:], i)
                for s, i in zip(srcs, ids)]
        n = len(ids)
        return pa.table({
            "url": urls, "kind": ["body"] * n,
            "title": ["DOC %d" % i for i in ids], "lang": ["en"] * n,
            "section_uri": [""] * n, "ordinal": [""] * n,
            "parent_uri": [""] * n, "text": [""] * n,
            "position": pa.array([0] * n, pa.int64()),
        }, schema=SEC_SCHEMA)

    def ann_rows(t: pa.Table) -> pa.Table:
        tgt, citing, titles = [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["source"].to_pylist()):
            if i % 3 != 1:
                continue
            ti = (i * 7) % 100
            tgt.append("https://%d.example.org/d/%d" % (ti % 20, ti))
            citing.append("https://%s.example.org/d/%d" % (s[3:], i))
            titles.append("DOC %d" % i)
        return pa.table({"target_url": pa.array(tgt, pa.string()),
                         "citing_url": pa.array(citing, pa.string()),
                         "citing_title": pa.array(titles, pa.string())})

    return render_xhtml(
        ds.map_batches(body_rows, batch_format="pyarrow"),
        annotations_ds=ds.map_batches(ann_rows, batch_format="pyarrow"))


def _xhtml_annotated_sql() -> str:
    from ...sources.xhtml import _HEAD

    return f"""
WITH docs AS (
  SELECT doc_id,
         'https://' || (doc_id % 20) || '.example.org/d/' || doc_id
           AS url,
         'DOC ' || doc_id AS title
  FROM documents),
cites AS (
  SELECT (doc_id * 7) % 100 AS target_id, url AS citing_url,
         title AS citing_title
  FROM docs WHERE doc_id % 3 = 1),
asides AS (
  SELECT t.doc_id,
         '  <aside class="annotations">' || chr(10) ||
         string_agg('    <span about="' || t.url ||
                    '" rel="dcterms:isReferencedBy" href="' ||
                    citing_url || '" title="' || citing_title ||
                    '"/>' || chr(10), '' ORDER BY citing_url) ||
         '  </aside>' || chr(10) AS aside
  FROM cites JOIN docs t ON t.doc_id = cites.target_id
  GROUP BY t.doc_id, t.url)
SELECT d.url,
       {_sql_lit(_HEAD)}
       || '<head><title>' || d.title || '</title></head>' || chr(10)
       || '<body about="' || d.url || '" xml:lang="en">' || chr(10)
       || coalesce(a.aside, '')
       || '</body>' || chr(10) || '</html>' || chr(10) AS xhtml
FROM docs d LEFT JOIN asides a USING (doc_id)
"""


XHTML_ANNOTATED_SQL = _xhtml_annotated_sql()


def curation_pipeline(sf_dir):
    """End-to-end curation DAG (pipelines/curation.curate): PII-redact
    -> C4 quality gate -> exact dedup -> MinHash near-dup removal ->
    deterministic split. The oracle chains the per-stage SQL oracles,
    so the final (doc_id, split) survivor set is gated end to end."""
    from ..curation import curate

    return curate(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _curation_sql() -> str:
    from ...stages.pii import PII_PATTERNS

    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = "regexp_replace(%s, '%s', '%s', 'g')" % (
            clean, pat.replace("'", "''"), token)
    return f"""
WITH RECURSIVE clean AS (
  SELECT doc_id, {clean} AS text FROM documents),
m AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g')) AS alpha_len
  FROM clean),
q AS (
  SELECT doc_id, text FROM m
  WHERE n_tokens >= 5 AND alpha_len >= 2.0 * n_tokens
    AND alpha_len <= 12.0 * n_tokens),
ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
qq AS (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)),
s AS ({_shingle_cte("qq")}),
p AS ({_jaccard_pair_select("ka", "kb")}),
{_CC_CTES},
canon AS (SELECT node AS doc_id, min(lbl) AS canonical
          FROM reach GROUP BY node),
kept AS (
  SELECT qq.doc_id FROM qq LEFT JOIN canon USING (doc_id)
  WHERE canonical IS NULL OR canonical = qq.doc_id)
{_split_select("kept")}
"""


CURATION_SQL = _curation_sql()


def doc_chunks(sf_dir):
    """Overlapping word-window chunking (64 words every 48 — the RAG /
    embedding-input prep step): doc-local explode fused with the
    pruned read, zero shuffles. The SQL oracle recomputes every chunk
    byte-exactly via regexp word extraction + list_slice +
    array_to_string."""
    from ...stages.text_analysis import chunk_windows

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(chunk_windows, batch_format="pyarrow")


DOC_CHUNKS_SQL = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS words FROM documents
), s AS (
  SELECT doc_id, words,
         UNNEST(range(0, greatest(len(words) - 16, 1), 48)) AS start
  FROM w
)
SELECT doc_id,
       CAST(start / 48 AS BIGINT) AS chunk_id,
       CAST(least(start + 64, len(words)) - start AS BIGINT) AS n_words,
       array_to_string(list_slice(words, start + 1, start + 64), ' ')
         AS chunk_text
FROM s
"""


def doc_repetition(sf_dir):
    """Gopher-style repetition metrics per doc (integer outputs:
    duplicate 2-/3-gram and top-word counts — stages/text_analysis.
    repetition_metrics). Pure doc-local map fused with the pruned
    read; the SQL oracle recomputes every count via string_split +
    n-gram slicing."""
    from ...stages.text_analysis import repetition_metrics

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_metrics, batch_format="pyarrow")


DOC_REPETITION_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
base AS (SELECT doc_id, len(w) AS n_words FROM words),
uw AS (SELECT doc_id, unnest(w) AS word FROM words),
topw AS (SELECT doc_id, max(c) AS top_word FROM (
           SELECT doc_id, word, count(*) AS c FROM uw
           GROUP BY doc_id, word) GROUP BY doc_id),
g2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
       FROM (SELECT doc_id, w,
                    unnest(generate_series(1, len(w) - 1)) AS i
             FROM words)),
a2 AS (SELECT doc_id, count(*) AS ngrams_2,
              count(DISTINCT gram) AS distinct_2
       FROM g2 GROUP BY doc_id),
g3 AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
       FROM (SELECT doc_id, w,
                    unnest(generate_series(1, len(w) - 2)) AS i
             FROM words)),
a3 AS (SELECT doc_id, count(*) AS ngrams_3,
              count(DISTINCT gram) AS distinct_3
       FROM g3 GROUP BY doc_id)
SELECT base.doc_id, base.n_words, topw.top_word,
       coalesce(a2.ngrams_2, 0) AS ngrams_2,
       coalesce(a2.distinct_2, 0) AS distinct_2,
       coalesce(a3.ngrams_3, 0) AS ngrams_3,
       coalesce(a3.distinct_3, 0) AS distinct_3
FROM base
JOIN topw USING (doc_id)
LEFT JOIN a2 USING (doc_id)
LEFT JOIN a3 USING (doc_id)
"""


def split_assign(sf_dir):
    """Deterministic hash-based train/val/test split (80/10/10) over
    doc_id — stages/transform.hash_split; membership is a pure
    function of the key (no seed, no state), so resumes and
    late-arriving shards agree. The oracle recomputes the identical
    md5-prefix bucket in SQL."""
    from ...stages.transform import hash_split

    return hash_split(_read(sf_dir, "documents", columns=["doc_id"]))


SPLIT_ASSIGN_SQL = _split_select("documents")


def pack_token_chunks(sf_dir, budget: int = 2048):
    """LLM-pretraining sequence packing: each source's documents are
    concatenated in doc_id order and cut every ``budget`` whitespace
    tokens; emits one (source, doc_id, chunk_id) row per fixed-size
    training chunk a document overlaps (documents split across chunk
    boundaries, GPT-style packing).

    Distribution shape: token counting is a stateless map; only the
    NARROW (source, doc_id, n_tokens) triples cross ONE exchange
    bucketed by source; the prefix-sum + overlap explode is a
    vectorized numpy pass per source group. Partitioning assumption
    (documented per the custom-operator contract): packing order is
    per-source by doc_id, so a source's counts must co-locate — at
    100 TB a giant source would be sub-sharded by a coarse doc_id
    range first, each range packed independently with offsets
    rebased afterwards. Zero-token docs occupy the chunk at their
    start offset."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def tok(t: pa.Table) -> pa.Table:
        t = text_analysis.token_counts(t)
        return t.select(["source", "doc_id", "ws_tokens"])

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["ws_tokens"].to_numpy(dtype="int64")
        end = np.cumsum(n)
        start = end - n
        first = start // budget
        last = np.maximum(end - 1, start) // budget
        reps = (last - first + 1).astype("int64")
        chunk = np.repeat(first, reps) + (
            np.arange(int(reps.sum()), dtype="int64")
            - np.repeat(np.cumsum(reps) - reps, reps))
        return pd.DataFrame({
            "source": np.repeat(g["source"].to_numpy(), reps),
            "doc_id": np.repeat(g["doc_id"].to_numpy(), reps),
            "chunk_id": chunk,
        })

    return (ds.map_batches(tok, batch_format="pyarrow")
            .groupby("source").map_groups(pack, batch_format="pandas"))


PACK_CHUNKS_SQL = """
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\\S+')) AS n
  FROM documents),
w AS (
  SELECT doc_id, source, n,
         sum(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS start_off
  FROM t),
b AS (
  SELECT doc_id, source,
         CAST(start_off // 2048 AS BIGINT) AS first_chunk,
         CAST(greatest(start_off + n - 1, start_off) // 2048 AS BIGINT)
             AS last_chunk
  FROM w)
SELECT source, doc_id,
       CAST(unnest(generate_series(first_chunk, last_chunk)) AS BIGINT)
           AS chunk_id
FROM b
"""


PROFILE_DOCS_SQL = "\nUNION ALL\n".join(
    "SELECT '%(c)s' AS col, count(*) AS n_rows,"
    " count(*) - count(%(c)s) AS n_null,"
    " count(DISTINCT %(c)s) AS n_distinct,"
    " CAST(min(%(c)s) AS VARCHAR) AS min_val,"
    " CAST(max(%(c)s) AS VARCHAR) AS max_val FROM documents"
    % {"c": c}
    for c in ("doc_id", "text", "lang", "source", "n_chars"))
