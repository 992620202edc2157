"""Near-dup sketches (minhash / simhash / containment / semantic) — SQL-oracled
via brute-force closures and planted clones — plus shared oracle fragments."""

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
from ._shared import CLONE_OFFSET, _exchange_buckets, _kg, _read
from .kg_flagship import PAGE_URL_SQL, TITLE_SQL, _SEC_TERM


def minhash_neardup(sf_dir):
    """MinHash+LSH near-dup clustering over the documents table. The
    driver's synthetic corpus plants near-dup chains (word-level edits,
    trigram Jaccard ≥ 0.88 with nothing else above 0.4), so the full
    output is recomputable by a brute-force trigram-Jaccard self-join
    + recursive transitive closure in SQL — verified hash-J == string-J
    exactly at sf0.001/sf0.01 (no 31-bit shingle-hash collisions touch
    the threshold)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.5)


CONT_MOD, CONT_OFF = 11, 3_000_000
CONT_NUM, CONT_DEN, CONT_DF_CAP = 4, 5, 256


def doc_containment(sf_dir):
    """Excerpt / quotation detection by asymmetric shingle CONTAINMENT
    (dedup.containment_pairs): delta docs whose rare-gram set is
    ≥ 4/5 contained in a corpus doc — the duplication symmetric
    Jaccard misses (every doc_id%11==0 doc plants a first-⅔-of-words
    excerpt under id+3·10⁶: containment ≈ 1 while J ≈ ⅔ < 4/5).
    Boilerplate grams (corpus df > 256) are excluded from numerator
    AND denominator — the exact, SQL-replicable cap that also bounds
    the per-gram pair explode. Two bucketed exchanges (gram postings,
    then per-delta-key finalize), exact cross-multiplied threshold."""
    from ...stages.dedup import containment_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def excerpts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for i, tx in zip(ids, texts):
            if i % CONT_MOD:
                continue
            w = (tx or "").split()
            k = (2 * len(w)) // 3
            if k < 1:
                continue
            out_id.append(int(i) + CONT_OFF)
            out_tx.append(" ".join(w[:k]))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    delta = docs.map_batches(excerpts, batch_format="pyarrow")
    return containment_pairs(delta, docs, cont_num=CONT_NUM,
                             cont_den=CONT_DEN, df_cap=CONT_DF_CAP)


MHIDX_CLONE_MOD, MHIDX_NOVEL_MOD = 5, 7
MHIDX_CLONE_OFF, MHIDX_NOVEL_OFF = 1_000_000, 2_000_000


def neardup_incremental(sf_dir):
    """Incremental (delta-crawl) near-dup against the MATERIALIZED
    LSH index (dedup.build_minhash_index / neardup_vs_index): the
    corpus is shingled + minhashed ONCE into a band table
    hive-partitioned by band-hash; a delta snapshot then pays only
    its own sketching cost and probes the index with a PRUNED read —
    the rolling-crawl shape where re-sketching 100 TB per crawl is
    the thing being avoided.

    The delta is doc arithmetic in both engines: every doc_id%5==0
    doc re-appears byte-identical under a new id (mirrored content
    at a new URL — MUST match its source and the source's planted
    near-dup chain), every doc_id%7==0 id contributes a genuinely
    novel doc (MUST match nothing). Output = exact-verified
    (delta_key, indexed_key) pairs at trigram Jaccard ≥ 0.5; the SQL
    oracle is the brute-force delta×corpus Jaccard join, licensed by
    the same catch argument as minhash_neardup (qualifying pairs are
    the planted chains; banding provably catches clones because an
    identical text has an identical signature)."""
    from ...stages.dedup import build_minhash_index, neardup_vs_index

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def delta_tbl(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for i, tx in zip(ids, texts):
            if i % MHIDX_CLONE_MOD == 0:
                out_id.append(int(i) + MHIDX_CLONE_OFF)
                out_tx.append(tx)
            if i % MHIDX_NOVEL_MOD == 0:
                out_id.append(int(i) + MHIDX_NOVEL_OFF)
                out_tx.append("novel doc %d" % i)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    delta = docs.map_batches(delta_tbl, batch_format="pyarrow")
    import os as _os

    idx_dir = "/tmp/ferenda_ray_mhidx/%s_b16" % _os.path.basename(
        sf_dir.rstrip("/"))
    build_minhash_index(docs, idx_dir)
    return neardup_vs_index(delta, idx_dir, docs.union(delta),
                            threshold=0.5)


# --- shared oracle-SQL fragments (ONE copy of each recipe; the
# minhash, ngram-jaccard, curation and split oracles compose these so
# a change to the shingle grammar, Jaccard threshold, CC recursion or
# split recipe edits exactly one string) --------------------------------

def _shingle_cte(src: str) -> str:
    """Word-trigram shingle set per doc over relation ``src`` — the
    SQL mirror of stages/dedup's shingle_k=3 word shingles."""
    return """
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w)-2, 1)),
    i -> array_to_string(w[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM %s)""" % src


def _jaccard_pair_select(ka: str, kb: str) -> str:
    """Self-join of shingle CTE ``s`` at trigram Jaccard >= 0.5."""
    return """
  SELECT a.doc_id AS %s, b.doc_id AS %s
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))
        >= 0.5 * len(list_distinct(list_concat(a.sh, b.sh)))""" % (ka, kb)


_CC_CTES = """e AS (
  SELECT ka AS a, kb AS b FROM p UNION SELECT kb, ka FROM p
), reach(node, lbl) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, r.lbl FROM e JOIN reach r ON e.b = r.node
)"""


def _split_select(src: str) -> str:
    """hash_split's md5-bucket 80/10/10 assignment over ``src``."""
    return """SELECT doc_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) %% 100 AS bucket
      FROM %s)""" % src


MINHASH_SQL = """
WITH RECURSIVE s AS (%s
), p AS (%s
), %s
SELECT node AS key, min(lbl) AS canonical_key FROM reach GROUP BY node
""" % (_shingle_cte("documents"), _jaccard_pair_select("ka", "kb"), _CC_CTES)


MHIDX_SQL = """
WITH everything AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + %d, text FROM documents WHERE doc_id %% %d = 0
  UNION ALL
  SELECT doc_id + %d, 'novel doc ' || doc_id
  FROM documents WHERE doc_id %% %d = 0),
s AS (%s)
SELECT d.doc_id AS delta_key, i.doc_id AS indexed_key
FROM s d JOIN s i ON d.doc_id >= %d AND i.doc_id < %d
WHERE len(list_intersect(d.sh, i.sh))
      >= 0.5 * len(list_distinct(list_concat(d.sh, i.sh)))
""" % (MHIDX_CLONE_OFF, MHIDX_CLONE_MOD, MHIDX_NOVEL_OFF,
       MHIDX_NOVEL_MOD, _shingle_cte("everything"),
       MHIDX_CLONE_OFF, MHIDX_CLONE_OFF)


DOC_CONTAINMENT_SQL = """
WITH excerpts AS (
  SELECT doc_id + %d AS doc_id,
         array_to_string(w[1:(2 * len(w)) // 3], ' ') AS text
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
        FROM documents)
  WHERE doc_id %% %d = 0 AND (2 * len(w)) // 3 >= 1),
everything AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id, text FROM excerpts),
s AS (%s),
tok AS (SELECT doc_id, unnest(sh) AS g FROM s),
corpus_g AS (SELECT * FROM tok WHERE doc_id < %d),
delta_g AS (SELECT * FROM tok WHERE doc_id >= %d),
hot AS (SELECT g FROM corpus_g GROUP BY g HAVING count(*) > %d),
asize AS (SELECT doc_id, count(*) AS n FROM delta_g
          WHERE g NOT IN (SELECT g FROM hot) GROUP BY doc_id),
inter AS (SELECT d.doc_id AS a, c.doc_id AS b, count(*) AS i
          FROM delta_g d JOIN corpus_g c USING (g)
          WHERE g NOT IN (SELECT g FROM hot) GROUP BY a, b)
SELECT i.a AS delta_key, i.b AS corpus_key
FROM inter i JOIN asize z ON z.doc_id = i.a
WHERE i.i * %d >= %d * z.n
""" % (CONT_OFF, CONT_MOD, _shingle_cte("everything"), CONT_OFF,
       CONT_OFF, CONT_DF_CAP, CONT_DEN, CONT_NUM)



def neardup_representatives(sf_dir):
    """Quality-based representative per near-dup cluster
    (dedup.cluster_representatives — the production "keep the best
    copy" policy): argmax n_chars per minhash cluster, ties to min
    key; unclustered docs represent themselves. Two narrow bucketed
    exchanges (canonical attach, then per-cluster argmax with a
    partial-argmax combiner). The oracle composes the shared
    minhash-closure fragments with a window argmax."""
    from ...stages.dedup import cluster_representatives

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "n_chars"])
    import ray as _ray

    clusters = minhash_dedup(
        docs.map_batches(lambda t: t.select(["doc_id", "text"]),
                         batch_format="pyarrow"),
        threshold=0.5)
    if isinstance(clusters, pd.DataFrame):  # driver union-find path
        clusters = _ray.data.from_pandas(clusters)
    return cluster_representatives(
        clusters,
        docs.map_batches(lambda t: t.select(["doc_id", "n_chars"]),
                         batch_format="pyarrow"),
        score_col="n_chars")


NEARDUP_REPS_SQL = """
WITH RECURSIVE s AS (%s
), p AS (%s
), %s,
m AS (SELECT node AS key, min(lbl) AS canonical_key
      FROM reach GROUP BY node),
alld AS (
  SELECT d.doc_id AS key, d.n_chars AS score,
         coalesce(m.canonical_key, d.doc_id) AS canon
  FROM documents d LEFT JOIN m ON m.key = d.doc_id),
sel AS (SELECT canon, key,
               row_number() OVER (PARTITION BY canon
                                  ORDER BY score DESC, key ASC) AS rn,
               count(*) OVER (PARTITION BY canon) AS n
        FROM alld)
SELECT canon AS canonical_key, key AS rep_key,
       CAST(n AS BIGINT) AS n_members
FROM sel WHERE rn = 1
""" % (_shingle_cte("documents"), _jaccard_pair_select("ka", "kb"),
       _CC_CTES)


def ngram_jaccard(sf_dir):
    """EXACT n-gram Jaccard similarity self-join (prefix-filtered
    AllPairs — no LSH approximation), the deterministic sibling of
    minhash_neardup. Output = every unordered doc pair with trigram
    Jaccard >= 0.5, keys only: the jaccard double itself is
    hash-fragile across engines ((1e6*i)/u vs 1e6*(i/u) differ by one
    ulp at exact fractions), and the threshold decision already
    exercises the value. Hash-J == string-J exactly at sf0.001/0.01
    (verified: no 31-bit shingle collisions touch the threshold)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5)

    def keys_only(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            return pd.DataFrame({"key_a": pd.Series(dtype="int64"),
                                 "key_b": pd.Series(dtype="int64")})
        return df[["key_a", "key_b"]].astype("int64")

    return pairs.map_batches(keys_only, batch_format="pandas")


NGRAM_JACCARD_SQL = """
WITH s AS (%s
)%s
""" % (_shingle_cte("documents"), _jaccard_pair_select("key_a", "key_b"))


def simhash_pairs(sf_dir):
    """Full SimHash pair output over the raw documents. Rows-only BY
    DESIGN, with the family fully pinned by two oracled siblings
    rather than left unverified: (1) ``simhash_pairs_md5`` runs the
    IDENTICAL banding operator under an md5 word-hash that SQL
    recomputes bit-for-bit (full pair-set closure oracle), so every
    line of the operator is exact-checked; (2)
    ``simhash_planted_recall`` runs THIS hash family (pandas
    C-siphash, the throughput path) and SQL-enumerates the planted
    exact clones it must recover (distance 0 → pigeonhole-guaranteed
    candidate). What remains rows-only is precisely the natural-pair
    Hamming spectrum of a hash family SQL cannot evaluate — not any
    unchecked operator logic."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup_pairs(ds, max_hamming=3)


def simhash_pairs_md5(sf_dir):
    """Fully-oracled SimHash: same banding operator, md5-prefix word
    hash family (dedup.simhash63_md5) so SQL recomputes every simhash
    bit-vote, every Hamming distance (bit_count(xor)) and therefore
    the complete pair set — pigeonhole-exact at max_hamming=3 with
    n_tables=4. simhash_pairs (the C-siphash throughput family) keeps
    its rows-only status + planted-recall sibling."""
    from ...stages.dedup import simhash63_md5

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup_pairs(ds, max_hamming=3, hasher=simhash63_md5)


SIMHASH_MD5_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents
),
hh AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)
           & CAST(9223372036854775807 AS UBIGINT) AS h
  FROM toks
),
bt AS (
  SELECT doc_id, b,
         sum(2 * CAST((h >> b) & 1 AS BIGINT) - 1) AS s
  FROM hh, (SELECT unnest(generate_series(0, 62)) AS b) bits
  GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b
                       ELSE 0 END) AS BIGINT) AS sh
  FROM bt GROUP BY doc_id
)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       CAST(bit_count(xor(CAST(a.sh AS UBIGINT), CAST(b.sh AS UBIGINT)))
            AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.sh AS UBIGINT), CAST(b.sh AS UBIGINT))) <= 3
"""


def simhash_planted_recall(sf_dir):
    """Planted-recall oracle for SimHash: exact text clones
    (doc_id % 10 == 0 → doc_id + CLONE_OFFSET) have Hamming distance 0
    and MUST all be recovered; the query runs the full operator and
    projects the planted subset, which SQL enumerates exactly."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clones(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        oi, ot = list(ids), list(texts)
        for i, txt in zip(ids, texts):
            if i % 10 == 0:
                oi.append(i + CLONE_OFFSET)
                ot.append(txt)
        return pa.table({"doc_id": pa.array(oi, pa.int64()),
                         "text": pa.array(ot, pa.string())})

    pairs = simhash_dedup_pairs(ds.map_batches(clones, batch_format="pyarrow"),
                                max_hamming=3)

    def planted(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            return pd.DataFrame({"key_a": pd.Series(dtype="int64"),
                                 "key_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        m = (df["key_b"] - df["key_a"] == CLONE_OFFSET) \
            & (df["key_a"] % 10 == 0)
        return df[m]

    return pairs.map_batches(planted, batch_format="pandas")


SIMHASH_PLANTED_SQL = """
SELECT doc_id AS key_a, doc_id + 10000000 AS key_b,
       CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id % 10 = 0
"""


def embed_knn_ivf(sf_dir):
    """IVF-bucketed ANN for the vec_id=0 query — the scale path of
    embed_knn (rows-only: ANN recall is approximate by design; the
    brute-force baseline carries the SQL oracle)."""
    from ...stages.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    out = knn_ivf(ds, qv[None, :], k=10, n_centroids=8, n_probe=4)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


def embedding_neardup(sf_dir):
    """Embedding-cosine near-dup with planted duplicate directions:
    vec_id % 10 == 0 gains a clone (vec_id + CLONE_OFFSET) scaled by
    2.0 — scaling by a power of two is IEEE-exact, so the clone's unit
    vector is bitwise-identical (cosine exactly 1, every hyperplane
    sign unchanged → guaranteed same LSH bucket). Nothing natural in
    the synthetic embeddings exceeds cosine 0.52, so the full output
    is exactly the planted pair list."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def clones(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        embs = t["embedding"].to_pylist()
        oi, oe = list(ids), list(embs)
        for i, e in zip(ids, embs):
            if i % 10 == 0:
                oi.append(i + CLONE_OFFSET)
                oe.append([2.0 * x for x in e])
        return pa.table({"vec_id": pa.array(oi, pa.int64()),
                         "embedding": pa.array(oe, t["embedding"].type)})

    pairs = embedding_neardup_pairs(
        ds.map_batches(clones, batch_format="pyarrow"), threshold=0.95)

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            return pd.DataFrame({"key_a": pd.Series(dtype="int64"),
                                 "key_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        df = df.copy()
        df["cosine"] = df["cosine"].round(6)
        return df

    return pairs.map_batches(shape, batch_format="pandas")


EMBED_NEARDUP_SQL = """
SELECT vec_id AS key_a, vec_id + 10000000 AS key_b, 1.0 AS cosine
FROM embeddings WHERE vec_id % 10 = 0
"""


def text_sections(sf_dir):
    """plain-text sectionizer over the documents table (TextReader +
    RFC-FSM path). The word-soup docs have no headings, so each yields
    exactly one body row whose text is the whitespace-normalized
    document — SQL-recomputable."""
    from ...stages.textparse import parse_text_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_url(t: pa.Table) -> pa.Table:
        urls = ["doc:%d" % i for i in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(urls), "text": t["text"]})

    out = ds.map_batches(add_url, batch_format="pyarrow").map_batches(
        parse_text_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table({"url": t["url"], "kind": t["kind"],
                            "text": t["text"]}),
        batch_format="pyarrow")


TEXT_SECTIONS_SQL = """
SELECT 'doc:' || doc_id AS url, 'body' AS kind,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
FROM documents
"""


def salted_source_counts(sf_dir):
    """two-phase salted groupby-count (hot-key skew operator) — must
    agree exactly with a plain SQL GROUP BY."""
    from ...stages.transform import salted_counts

    ds = _read(sf_dir, "documents", columns=["source"])
    return salted_counts(ds, "source", salt_n=8)


SALTED_SQL = """
SELECT source, count(*) AS n FROM documents GROUP BY source
"""


def xhtml_render(sf_dir):
    """XHTML+RDFa render sink over the flagship sections (rows-only:
    one xhtml doc per url)."""
    from ...sources.xhtml import render_xhtml

    return render_xhtml(_kg(sf_dir)["sections"])


def archived_versions(sf_dir):
    """archive-versioning operator: the non-latest recrawl rows
    (synthesizer plants an older version for doc_id % 17 == 0)."""
    from ...stages.composite import archive_versions

    pages = corpus.pages_dataset(sf_dir)
    # slim pre-pass input: (url, warc_ts) from pure arithmetic — the
    # pre-pass must not pay a second full html synthesis
    arch = archive_versions(
        pages, slim=corpus.pages_slim_dataset(sf_dir))
    return arch.map_batches(
        lambda t: pa.table({"url": t["url"]}), batch_format="pyarrow")


ARCHIVED_SQL = f"""
SELECT {PAGE_URL_SQL} AS url FROM documents WHERE doc_id % 17 = 0
"""


def crawl_version_intervals(sf_dir):
    """SCD2 validity intervals over the crawl archive — the
    warehouse slowly-changing-dimension form of the reference's
    archived-versions surface (documentstore.py archive(): every
    superseded version remains addressable): one row per (url,
    snapshot) with [valid_from_us, valid_to_us), valid_to_us = the
    next snapshot's timestamp, -1 sentinel for the live version
    (int64 microseconds on both engines — no datetime unit drift
    across the oracle boundary). ONE url-hash-bucketed exchange over
    the slim (url, ts) projection; per bucket the LEAD is a single
    vectorized shift over the (url, ts)-sorted block masked at url
    boundaries."""
    pages = corpus.pages_slim_dataset(sf_dir)
    nb = _exchange_buckets(sf_dir)

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "url": t["url"].to_pandas().astype("object"),
            "ts_us": pc.cast(t["warc_ts"], pa.int64()).to_pandas(),
        })
        from ...stages.dedup import _bucket_of
        df["_b"] = _bucket_of(df["url"], nb)
        return df

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["url", "ts_us"], kind="mergesort")
             .reset_index(drop=True))
        nxt = g["ts_us"].shift(-1)
        same = g["url"].shift(-1) == g["url"]
        # exact: µs timestamps ≈ 1.7e15 < 2^53, float round-trip safe
        valid_to = np.where(same, nxt, -1).astype("int64")
        rank = (g.groupby("url").cumcount() + 1).astype("int64")
        return pd.DataFrame({
            "url": g["url"],
            "version_rank": rank,
            "valid_from_us": g["ts_us"].astype("int64"),
            "valid_to_us": valid_to,
        })

    return (pages.map_batches(prep, batch_format="pyarrow")
            .groupby("_b").map_groups(intervals, batch_format="pandas"))


CRAWL_INTERVALS_SQL = f"""
WITH v AS (
  SELECT {PAGE_URL_SQL} AS url,
         {corpus.EPOCH_US} + doc_id * 37000000
           - CASE WHEN k = 1 THEN 86400000000 ELSE 0 END AS ts_us
  FROM documents, (VALUES (0), (1)) t(k)
  WHERE k = 0 OR doc_id % 17 = 0
)
SELECT url,
       row_number() OVER (PARTITION BY url ORDER BY ts_us)
         AS version_rank,
       ts_us AS valid_from_us,
       coalesce(lead(ts_us) OVER (PARTITION BY url ORDER BY ts_us), -1)
         AS valid_to_us
FROM v
"""


def crawl_delta_status(sf_dir):
    """Recrawl change detection (composite.crawl_delta): two planted
    crawls — crawl 1 omits doc_id % 13 == 0 and crawl 2 edits
    doc_id % 9 == 0 — classified per url as new / changed / unchanged
    from nothing but (url, ts, md5) on the exchange; the SQL oracle
    recomputes the full status table from the planting arithmetic."""
    from ...stages.composite import crawl_delta

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def two_crawls(t: pa.Table) -> pa.Table:
        ids = [int(i) for i in t["doc_id"].to_pylist()]
        texts = t["text"].to_pylist()
        urls, tss, out = [], [], []
        for i, txt in zip(ids, texts):
            if i % 13 != 0:
                urls.append("u%d" % i); tss.append(1)
                out.append(txt or "")
            urls.append("u%d" % i); tss.append(2)
            out.append((txt or "")
                       + (" changed" if i % 9 == 0 else ""))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.int64()),
                         "text": pa.array(out, pa.string())})

    return crawl_delta(ds.map_batches(two_crawls,
                                      batch_format="pyarrow"))


CRAWL_DELTA_SQL = """
SELECT 'u' || doc_id AS url,
       CASE WHEN doc_id % 13 = 0 THEN 'new'
            WHEN doc_id % 9 = 0 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM documents
"""


def composite_parse(sf_dir):
    """CompositeRepository fallback parse over pages with a planted
    non-HTML payload batch: count of docs per winning parser."""
    import functools

    from ...stages.composite import composite_parse_batch
    from ...stages.parse_html import latest_per_url

    pages = latest_per_url(corpus.pages_dataset(sf_dir),
                           slim=corpus.pages_slim_dataset(sf_dir))
    sections = pages.map_batches(composite_parse_batch, batch_format="pyarrow")

    def body_only(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["kind"], "body"))
        return f.select(["url", "parser"])

    return (sections.map_batches(body_only, batch_format="pyarrow")
            .groupby("parser").count()
            .map_batches(lambda df: df.rename(columns={"count()": "n_docs"}),
                         batch_format="pandas"))


COMPOSITE_SQL = """
SELECT 'html' AS parser, count(*) AS n_docs FROM documents
"""


def news_feeds_kg(sf_dir):
    """paginated per-host feeds over the latest pages (archivesize
    100, warc_ts desc) vs SQL recomputing from the synthesizer's
    deterministic timestamps (ts = epoch + doc_id·37s)."""
    from ...stages.parse_html import latest_per_url

    pages = latest_per_url(corpus.pages_dataset(sf_dir),
                           slim=corpus.pages_slim_dataset(sf_dir))
    out = facets.news_feeds(pages, archivesize=100)
    return out.map_batches(
        lambda df: df[["feed", "page", "url"]], batch_format="pandas")


NEWS_FEEDS_SQL = f"""
WITH p AS (
  SELECT substr(source, 4) || '.example.org' AS feed,
         {PAGE_URL_SQL} AS url,
         row_number() OVER (PARTITION BY substr(source, 4)
                            ORDER BY doc_id DESC) AS rn
  FROM documents
)
SELECT feed, cast((rn - 1) // 100 AS INTEGER) AS page, url FROM p
"""


def langid_docs(sf_dir):
    """Language-ID actor pool over deterministic stopword probe text.

    The probe text is pure doc_id arithmetic (stopword profile of
    lang[doc_id % 4] repeated — pipelines/corpus.py pattern), so the
    detected language is SQL-recomputable while the query still
    exercises the real LangId actor-pool stage end to end. Pool sized
    to the cluster like the flagship linker (kg.py:70-77) — a fixed
    concurrency=2 starved 30 of 32 CPUs."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    langs = sorted(text_analysis._STOP)  # ["de", "en", "es", "fr"]

    def probe(t: pa.Table) -> pa.Table:
        texts = []
        for did in t["doc_id"].to_pylist():
            lang = langs[did % 4]
            texts.append(" ".join(sorted(text_analysis._STOP[lang]) * 3))
        return t.append_column("text", pa.array(texts, pa.string()))

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (ds.map_batches(probe, batch_format="pyarrow")
            .map_batches(text_analysis.LangId,
                         concurrency=(max(2, ncpu // 4), max(4, ncpu - 2)),
                         batch_format="pyarrow")
            .select_columns(["doc_id", "detected_lang"]))


LANGID_SQL = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
                       WHEN 2 THEN 'es' ELSE 'fr' END AS detected_lang
FROM documents
"""


def embed_link_entities(sf_dir):
    """Embedding-linker actor pool (the north-star's "embedding
    linkers" alongside the fuzzy gazetteer) over planted one-char-
    deletion variants of the authority labels.

    The variant is pure doc_id arithmetic (entity = doc_id % N_ENT,
    deleted position = 1 + (doc_id // N_ENT) % (len-2)), so the
    EXPECTED top-1 link is SQL-recomputable while the query exercises
    the real trigram-embedding + broadcast-matrix cosine stage end to
    end: a mislink anywhere hash-fails the oracle.
    `tests/test_embed_link.py` proves every (entity, position) variant
    in the space links back to its source, which is what licenses the
    arithmetic oracle. Pool sized to the cluster like the linker."""
    import ray

    from ...stages.embed_link import EmbedLinker

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    labels = corpus.ENTITY_LABELS

    def plant(t: pa.Table) -> pa.Table:
        surfaces = []
        for did in t["doc_id"].to_pylist():
            label = labels[did % corpus.N_ENT]
            p = 1 + (did // corpus.N_ENT) % (len(label) - 2)
            surfaces.append(label[:p] + label[p + 1:])
        return t.append_column("surface", pa.array(surfaces, pa.string()))

    entities_ref = ray.put(
        {lbl: corpus.KB + str(i) for i, lbl in enumerate(labels)})
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (ds.map_batches(plant, batch_format="pyarrow")
            .map_batches(EmbedLinker,
                         fn_constructor_kwargs={"entities": entities_ref},
                         concurrency=(max(2, ncpu // 4), max(4, ncpu - 2)),
                         batch_format="pyarrow")
            .select_columns(["doc_id", "surface", "linked_uri"]))


EMBED_LINK_SQL = """
WITH ents(e, label) AS (VALUES %s),
d AS (
  SELECT doc_id, label, e,
         1 + (doc_id // %d) %% (length(label) - 2) AS p
  FROM documents JOIN ents ON ents.e = documents.doc_id %% %d
)
SELECT doc_id,
       substr(label, 1, p) || substr(label, p + 2) AS surface,
       '%s' || e AS linked_uri
FROM d
""" % (", ".join("(%d, '%s')" % (i, l)
                 for i, l in enumerate(corpus.ENTITY_LABELS)),
       corpus.N_ENT, corpus.N_ENT, corpus.KB)


def toc_pages_kg(sf_dir):
    """TOC pages (per-letter doc lists, sorted by titlesortkey) over
    the pivoted facet table of the flagship triples — exploded to one
    row per (value, position-in-page) so the list ordering is
    hash-verifiable against SQL row_number recomputation."""
    piv = facets.facet_pivot(_kg(sf_dir)["triples"])
    docs = piv.map_batches(
        lambda df: df[~df["subj"].str.contains("#")],
        batch_format="pandas")
    pages = facets.toc_select_for_pages(docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        vals, pos, uris, titles = [], [], [], []
        for value, us, ts in zip(df["value"], df["uris"], df["titles"]):
            for i, (u, t) in enumerate(zip(us, ts)):
                vals.append(value)
                pos.append(i)
                uris.append(u)
                titles.append(t)
        return pd.DataFrame({
            "value": pd.Series(vals, dtype=object),
            "pos": pd.Series(pos, dtype="int64"),
            "uri": pd.Series(uris, dtype=object),
            "title": pd.Series(titles, dtype=object)})

    return pages.map_batches(explode, batch_format="pandas")


TOC_PAGES_SQL = f"""
WITH t AS (
  SELECT {PAGE_URL_SQL} AS uri, {TITLE_SQL} AS title FROM documents
), k AS (
  SELECT uri, title,
         regexp_replace(CASE WHEN lower(title) LIKE 'the %'
                             THEN substr(lower(title), 5)
                             ELSE lower(title) END,
                        '[^a-z0-9]', '', 'g') AS skey
  FROM t
)
SELECT CASE WHEN skey = '' THEN '-' ELSE substr(skey, 1, 1) END AS value,
       cast(row_number() OVER (
         PARTITION BY (CASE WHEN skey = '' THEN '-' ELSE substr(skey, 1, 1) END)
         ORDER BY skey, uri) - 1 AS BIGINT) AS pos,
       uri, title
FROM k
"""


def kg_annotations(sf_dir):
    """Per-target annotation artifact (inbound citations joined with
    the citing documents' titles via the distributed bucket hash join)
    vs SQL recomputing the planted-citation arithmetic + title rule."""
    return facets.annotations(_kg(sf_dir)["triples"])


KG_ANNOTATIONS_SQL = f"""
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
SELECT target_url, {PAGE_URL_SQL} AS citing_url, {TITLE_SQL} AS citing_title
FROM cites JOIN documents USING (doc_id)
"""


def kg_stats(sf_dir):
    """per-type subject counts over the flagship triples."""
    return facets.stats_aggregate(_kg(sf_dir)["triples"], dims=("rdf:type",))


KG_STATS_SQL = """
WITH n AS (SELECT count(*) AS docs FROM documents),
s AS (SELECT sum(
        (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) + {sec}) AS parts
      FROM documents)
SELECT 'rdf:type' AS dim, 'bibo:Document' AS value, docs AS n_subjects FROM n
UNION ALL
SELECT 'rdf:type', 'bibo:DocumentPart', cast(parts AS BIGINT) FROM s
""".format(sec=_SEC_TERM)


IVF_PLANT_MOD = 50


def embed_knn_ivf_planted(sf_dir):
    """Planted-EXACTNESS oracle for the IVF ANN path (the companion
    that lets the approximate operator carry a full SQL oracle): for
    every vec_id % IVF_PLANT_MOD == 0 a clone of the QUERY vector
    (vec_id 0's embedding, bitwise-identical floats) is planted under
    vec_id + CLONE_OFFSET. Each clone (a) assigns to the query's own
    argmax centroid — the first bucket ANY n_probe ≥ 1 probe visits —
    and (b) scores the identical maximal cosine (same floats, same
    kernel), above every natural vector (< 0.52 in this corpus). The
    REAL operator (train_centroids k-means → bucket assign → probe →
    per-bucket top-k → global heap with (cosine desc, vec_id asc)
    tie-break) must therefore return EXACTLY vec_id 0 followed by the
    9 lowest planted ids — enumerable in SQL. This pins the whole IVF
    code path; ``embed_knn_ivf`` itself stays rows-only because ANN
    recall on natural data is approximate BY CONTRACT (its accuracy
    is bounded against ``embed_knn``'s exact SQL in
    test_similarity)."""
    from ...stages.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    qlist = list(q["embedding"])[0]

    def clones(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        embs = t["embedding"].to_pylist()
        oi, oe = list(ids), list(embs)
        for i in ids:
            if i % IVF_PLANT_MOD == 0:
                oi.append(i + CLONE_OFFSET)
                oe.append(list(qlist))
        return pa.table({"vec_id": pa.array(oi, pa.int64()),
                         "embedding": pa.array(oe, t["embedding"].type)})

    planted = ds.map_batches(clones, batch_format="pyarrow")
    out = knn_ivf(planted, qv[None, :], k=10, n_centroids=8, n_probe=4,
                  round_dp=12)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64",
                                           "rank": "int64"})


EMBED_IVF_PLANTED_SQL = """
WITH ones AS (
  SELECT 0 AS vec_id
  UNION ALL
  SELECT vec_id + 10000000 FROM embeddings WHERE vec_id %% 50 = 0)
SELECT vec_id,
       CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS rank
FROM ones ORDER BY vec_id LIMIT 10
"""
EMBED_IVF_PLANTED_SQL = EMBED_IVF_PLANTED_SQL.replace("%%", "%")


def split_leakage_safe(sf_dir):
    """Leakage-safe train/val/test split — the dedup-aware split the
    pretraining-data literature mandates (Lee et al. '22 "Deduplicating
    Training Data Makes Language Models Better": near-duplicates
    straddling train and test inflate eval): every document is
    assigned by the md5 bucket of its NEAR-DUP CLUSTER REPRESENTATIVE
    (minhash_dedup's canonical key; non-duplicated docs are their own
    representative), so an entire near-dup cluster always lands in one
    split. Same 80/10/10 md5 recipe as split_assign — the two splits
    differ exactly on clustered documents.

    Scale shape: the cluster map (only duplicated docs — a small
    fraction of the corpus) attaches through ``joins.attach_dim``
    how="left" (broadcast ≤ threshold, bucketed hash join above);
    the assignment itself is a pure map."""
    import hashlib

    docs_text = _read(sf_dir, "documents", columns=["doc_id", "text"])
    clusters = minhash_dedup(docs_text, threshold=0.5)
    if isinstance(clusters, pd.DataFrame):
        # minhash_dedup's driver fast path returns a frame; the
        # distributed path (forced in tests) returns a Dataset
        import ray.data as rd

        clusters = rd.from_pandas(
            clusters if len(clusters) else pd.DataFrame(
                {"key": pd.Series(dtype="int64"),
                 "canonical_key": pd.Series(dtype="int64")}))
    ids = _read(sf_dir, "documents", columns=["doc_id"])
    tagged = joins.attach_dim(ids, clusters, "doc_id", "key",
                              "canonical_key", out_col="rep",
                              how="left")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        rep = df["rep"].fillna(df["doc_id"]).astype("int64")

        def split_of(k):
            b = int(hashlib.md5(str(int(k)).encode())
                    .hexdigest()[:15], 16) % 100
            return "train" if b < 80 else ("val" if b < 90 else "test")

        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "rep": rep,
            "split": rep.map(split_of).astype(object)})

    return tagged.map_batches(assign, batch_format="pandas")


SPLIT_LEAK_SQL = """
WITH RECURSIVE s AS (%s
), p AS (%s
), %s,
cl AS (SELECT node AS key, min(lbl) AS rep FROM reach GROUP BY node),
r AS (SELECT d.doc_id, coalesce(cl.rep, d.doc_id) AS rep
      FROM documents d LEFT JOIN cl ON cl.key = d.doc_id)
SELECT doc_id, CAST(rep AS BIGINT) AS rep,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, rep,
             CAST('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15)
                  AS BIGINT) %% 100 AS bucket
      FROM r)
""" % (_shingle_cte("documents"), _jaccard_pair_select("ka", "kb"),
       _CC_CTES)
