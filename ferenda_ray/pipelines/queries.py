"""Query registry for the driver correctness harness.

Each entry pairs a Ray-Data pipeline (callable sf_dir → Dataset /
DataFrame / Table) with, where SQL-expressible, an ANSI-SQL oracle
DuckDB runs over the same parquet views (region nation customer
supplier part orders lineitem events documents embeddings).

Column names match between both sides exactly (driver hashes values
after sorting columns by name). Float aggregates are rounded on BOTH
sides to dodge summation-order ulp drift.

KG queries run the real flagship pipeline over pages *synthesized
deterministically from the documents table* (pipelines/corpus.py —
pure doc_id arithmetic), which is what makes even full-pipeline
outputs (titles, section counts, top-cited) SQL-recomputable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import firstletter
from ..stages import text_analysis
from ..stages.dedup import (
    embedding_neardup_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from ..stages.similarity import knn_brute_force
from ..stages.canonicalize import connected_components_distributed
from ..stages import joins
from . import corpus, facets
from .kg import kg_pipeline

# ---------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------

def _read(sf_dir: str, table: str, columns=None, num_blocks: int | None = None):
    """Pruned parquet read with explicit block fan-out.

    Ray's implicit path for a small single file is one read task
    feeding SplitBlocks(2×CPUs), which dribbles blocks out of a lone
    task (measured: 2-4 s for a 20 MB read that takes 0.35 s via
    pyarrow; 8 explicit read tasks do it in 0.4 s). Per-block fixed
    cost is ~10-15 ms, so fan-out follows input size — ~1 MB/block,
    clamped to [8, 64] — instead of CPU count. CPU-heavy consumers
    (shingling, per-doc token loops) pass ``num_blocks`` to buy more
    parallelism explicitly; at 100 TB the file count dominates and the
    override is a no-op relative to Ray's own file-based planning."""
    import os

    import ray.data as rd

    from ..stages.transform import strip_schema_metadata

    path = "%s/%s.parquet" % (sf_dir.rstrip("/"), table)
    if num_blocks is None:
        try:
            num_blocks = min(64, max(8, os.path.getsize(path) >> 20))
        except OSError:
            num_blocks = 8
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns,
                        override_num_blocks=num_blocks))


def _exchange_buckets(sf_dir: str, table: str = "documents") -> int:
    """Adaptive exchange width for bucketed-shuffle operators driven by
    one input table — the same judgment as ``_read``'s fan-out and
    ``graph._adapt_buckets``: bucket count is a pure work-partitioning
    knob (every bucketed op unions over groups, so ANY value yields
    identical rows), and each groupby exchange pays ~10-15 ms of fixed
    scheduling cost per output partition. Sizing by input bytes keeps
    small inputs at 8 partitions (measured: doc_decontaminate's two
    64-wide exchanges spent ~4 s of wall on a 0.6 MB table) while
    web-scale inputs ride the 64 cap — at 100 TB callers pass an
    explicit width instead."""
    import os

    path = "%s/%s.parquet" % (sf_dir.rstrip("/"), table)
    try:
        return min(64, max(8, os.path.getsize(path) >> 20))
    except OSError:
        return 64


def _merge_partials(partials_ds, merge_fn):
    """Final merge for BOUNDED-cardinality partial aggregates.

    Partial rows number O(input_blocks × distinct_keys). When the key
    space is small (Q1's 6 flag×status cells, 25 nations, a few
    thousand time windows), a key-partitioned sort exchange costs far
    more in scheduling than the merge computes: measured on q1_pricing
    at 32 CPUs, the 64-partition sort of 384 six-row partial blocks
    spends ~5 s wall for <1 ms of aggregate work. Coalescing the
    partials into ONE block and merging vectorized removes the sort
    entirely; the single merge block holds blocks×keys rows, which for
    these key spaces stays KBs even at 100 TB inputs. Unbounded key
    spaces (per-user, per-domain, per-fingerprint) must keep the
    hash-bucketed groupby pattern instead."""
    return partials_ds.repartition(1).map_batches(
        merge_fn, batch_format="pandas", batch_size=None)


_KG_CACHE: dict[str, dict] = {}


def _kg(sf_dir: str) -> dict:
    """Run the flagship pipeline once per sf_dir; cache materialized
    outputs for the other kg_* queries in the same harness run."""
    if sf_dir not in _KG_CACHE:
        res = kg_pipeline(sf_dir=sf_dir)
        res["triples"] = res["triples"].materialize()
        res["sections"] = res["sections"].materialize()
        # mentions feed kg_mentions (and are small next to pages) —
        # without this every access re-runs the actor-pool linker
        res["mentions"] = res["mentions"].materialize()
        _KG_CACHE[sf_dir] = res
    return _KG_CACHE[sf_dir]


# ---------------------------------------------------------------------
# relational / operator queries (SQL-oracled)
# ---------------------------------------------------------------------

def q1_pricing(sf_dir):
    """TPC-H Q1-style pricing summary: groupby + multi-aggregate
    (prune at the read: only 5 of 11 lineitem columns leave storage)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        # per-row rounding to integer cents → order-independent sums
        # that match any engine bit-for-bit
        # half_away_from_zero = SQL round() semantics (pyarrow defaults
        # to banker's rounding, which disagrees with DuckDB on .5)
        cents = pc.round(pc.multiply(disc_price, pa.scalar(100.0)),
                         round_mode="half_towards_infinity")
        t = t.append_column("cents", pc.cast(cents, pa.int64()))
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            disc_price_cents=("cents", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"],
                       as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            disc_price_cents=("disc_price_cents", "sum"),
            count_order=("count_order", "sum"))
        g["sum_qty"] = g["sum_qty"].round(2)
        g["disc_price_cents"] = g["disc_price_cents"].astype("int64")
        g["count_order"] = g["count_order"].astype("int64")
        return g

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS disc_price_cents,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def doc_stats_by_lang(sf_dir):
    """stats groupby-count (wsgiapp.stats shape) over documents."""
    from ray.data.aggregate import Count, Sum

    return (_read(sf_dir, "documents", columns=["lang", "n_chars"])
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="total_chars")))


DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def doc_token_counts(sf_dir):
    """token counting per lang, BOTH conventions (whitespace and the
    BPE-ish \\w+|[^\\w\\s]+ regex — the same RE2-compatible pattern the
    oracle runs) — partial counts inside map_batches, tiny groupby
    after."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = text_analysis.token_counts(t)
        df = t.select(["lang", "ws_tokens", "bpeish_tokens"]).to_pandas()
        g = df.groupby("lang", as_index=False)[
            ["ws_tokens", "bpeish_tokens"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"sum(ws_tokens)": "total_tokens",
                                  "sum(bpeish_tokens)": "bpeish_total"})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").sum(["ws_tokens", "bpeish_tokens"])
            .map_batches(rename, batch_format="pandas"))


DOC_TOKENS_SQL = """
SELECT lang, cast(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
         AS total_tokens,
       cast(sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')))
            AS BIGINT) AS bpeish_total
FROM documents GROUP BY lang
"""


def doc_quality(sf_dir):
    """per-doc char/token metrics (quality-scoring signals)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def metrics(t: pa.Table) -> pa.Table:
        t = text_analysis.token_counts(t)
        texts = t["text"].to_pylist()
        chars = [len(x or "") for x in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_text": pa.array(chars, pa.int64()),
            "n_tokens": t["ws_tokens"],
        })

    return ds.map_batches(metrics, batch_format="pyarrow")


DOC_QUALITY_SQL = """
SELECT doc_id, length(text) AS n_chars_text,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens
FROM documents
"""


def doc_quality_filter(sf_dir):
    """quality gates as a filter (C4-style): keep docs with ≥5 tokens
    and mean token length in [2, 12]."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        t = text_analysis.quality_metrics(t)
        t = text_analysis.quality_filter(t, min_tokens=5,
                                         min_mean_token_len=2.0,
                                         max_mean_token_len=12.0)
        return t.select(["doc_id"])

    return ds.map_batches(gate, batch_format="pyarrow")


DOC_QUALITY_FILTER_SQL = """
WITH m AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g')) AS alpha_len
  FROM documents
)
SELECT doc_id FROM m
WHERE n_tokens >= 5
  AND alpha_len >= 2.0 * n_tokens
  AND alpha_len <= 12.0 * n_tokens
"""


def fulltext_search(sf_dir):
    """fulltext query over the documents (the reference's fulltext
    index SELECT shape, fulltextindex.py:395-683): docs containing
    ALL query terms, ranked by total term frequency; deterministic
    (doc_id) tie-break; top 20."""
    terms = ("merge", "join")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_score = [], []
        for i, txt in zip(ids, texts):
            toks = (txt or "").split()
            counts = [sum(1 for w in toks if w == term) for term in terms]
            if all(c > 0 for c in counts):
                out_id.append(i)
                out_score.append(sum(counts))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_score, pa.int64())})

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["score", "doc_id"], descending=[True, False]).limit(20))


FULLTEXT_SQL = """
WITH m AS (
  SELECT doc_id,
         len(list_filter(regexp_extract_all(text, '\\S+'), t -> t = 'merge'))
           AS c1,
         len(list_filter(regexp_extract_all(text, '\\S+'), t -> t = 'join'))
           AS c2
  FROM documents
)
SELECT doc_id, cast(c1 + c2 AS BIGINT) AS score FROM m
WHERE c1 > 0 AND c2 > 0
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def fulltext_indexed_search(sf_dir):
    """The same ranked AND query as ``fulltext_search``, served from
    the MATERIALIZED inverted index (sources/ftindex — the reference's
    Whoosh/ES index artifact, fulltextindex.py:395-683): postings
    hive-partitioned by term-hash bucket, built once per corpus with
    an idempotent _SUCCESS/tmp-swap, and the query read planned over
    ONLY the 2 query terms' bucket directories — 14 of 16 posting
    shares never leave storage. Oracle shared with fulltext_search
    (identical result contract proves index == scan)."""
    import os

    from ..sources import ftindex

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = "/tmp/ferenda_ray_ftidx/%s_b%d" % (
        os.path.basename(sf_dir.rstrip("/")), ftindex.DEFAULT_BUCKETS)
    ftindex.build_inverted_index(docs, idx)
    return ftindex.indexed_term_search(idx, ("merge", "join"), k=20)


FT_DELTA_REPL_MOD, FT_DELTA_NEW_MOD = 31, 37
FT_DELTA_NEW_OFF = 10_000_000


def fulltext_delta_search(sf_dir):
    """The SAME ranked AND query served from an INCREMENTALLY
    MAINTAINED index: the base index of ``fulltext_indexed_search``
    is upgraded by ``ftindex.merge_index_delta`` with a deterministic
    delta crawl — doc_id %% 31 re-crawled with changed text (UPSERT:
    their old postings are superseded), doc_id %% 37 spawning brand-new
    docs under key+10⁷ — and the query runs against the merged
    VERSION (the base stays immutable; LSM/segment-merge discipline,
    fulltextindex.py update semantics). The oracle reconstructs the
    post-delta corpus in SQL and replays the scan query, so equality
    proves merge(index, δ) == index(apply(corpus, δ)) — the index
    twin of orders_ivm_counts' Δ-law.

    Scale point: the merge pays ONLY the delta's tokenization plus a
    zero-shuffle drop-filter stream of the base postings — never a
    re-index of the corpus."""
    import os

    from ..sources import ftindex

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    base = "/tmp/ferenda_ray_ftidx/%s_b%d" % (
        os.path.basename(sf_dir.rstrip("/")), ftindex.DEFAULT_BUCKETS)
    ftindex.build_inverted_index(docs, base)

    def delta_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for i, tx in zip(ids, texts):
            if i % FT_DELTA_REPL_MOD == 0:   # re-crawl: changed text
                out_id.append(int(i))
                out_tx.append((tx or "") + " merge deltaterm")
            if i % FT_DELTA_NEW_MOD == 0:    # brand-new document
                out_id.append(int(i) + FT_DELTA_NEW_OFF)
                out_tx.append((tx or "") + " merge join")
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    delta = docs.map_batches(delta_rows, batch_format="pyarrow")
    # the re-crawl manifest IS the superseded-key list (bounded by
    # the delta batch, never by the corpus)
    replaced = [int(r["doc_id"]) for r in
                _read(sf_dir, "documents", columns=["doc_id"])
                .take_all() if r["doc_id"] % FT_DELTA_REPL_MOD == 0]
    merged = "%s_delta_v1" % base
    ftindex.merge_index_delta(base, delta, merged,
                              replaced_keys=replaced)
    return ftindex.indexed_term_search(merged, ("merge", "join"), k=20)


FT_DELTA_SQL = """
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id %% %d = 0
              THEN text || ' merge deltaterm' ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT doc_id + %d, text || ' merge join'
  FROM documents WHERE doc_id %% %d = 0),
m AS (
  SELECT doc_id,
         len(list_filter(regexp_extract_all(text, '\\S+'),
                         t -> t = 'merge')) AS c1,
         len(list_filter(regexp_extract_all(text, '\\S+'),
                         t -> t = 'join')) AS c2
  FROM corpus)
SELECT doc_id, CAST(c1 + c2 AS BIGINT) AS score FROM m
WHERE c1 > 0 AND c2 > 0
ORDER BY score DESC, doc_id ASC LIMIT 20
""" % (FT_DELTA_REPL_MOD, FT_DELTA_NEW_OFF, FT_DELTA_NEW_MOD)


def _bm25_scored(sf_dir):
    """Shared BM25 scorer (the single copy of the Okapi arithmetic,
    consumed by ``bm25_search`` and the RRF hybrid's lexical leg):
    returns the UNSORTED zero-shuffle scored dataset
    (doc_id, score > 0) for the fixed two-term query.

    Scale shape: TWO streaming passes. Pass 1 reduces the corpus to
    FOUR integers (N docs, Σdl, df per query term) via per-batch
    partials and one bounded merge row — the only exchange. Pass 2 is
    a zero-shuffle map-side scorer with the four constants closed
    over (broadcast-by-closure; at 100 TB the constants ride the task
    spec).

    Exactness discipline: k1=6/5 and b=3/4 are kept RATIONAL — the
    per-term fraction tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) is
    cross-multiplied by 10·Σdl into pure integers:
    22·tf·S / (10·tf·S + 3·S + 9·dl·N), S=Σdl. The idf is the RSJ
    odds (N−df+½)/(df+½) in fixed-point micro-units — the classic
    idf's pre-log argument, a per-term monotone transform kept
    integer so the oracle replays every floor division bit-exactly
    (swap in ln() where cross-term calibration matters more than
    exact replay). OR semantics."""
    terms = ("merge", "join")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        n, s = len(texts), 0
        df = [0] * len(terms)
        for txt in texts:
            toks = (txt or "").split()
            s += len(toks)
            for j, term in enumerate(terms):
                if term in toks:
                    df[j] += 1
        row = {"n": [n], "s": [s]}
        row.update({"df%d" % j: [df[j]] for j in range(len(terms))})
        return pd.DataFrame(row)

    merged = _merge_partials(
        ds.map_batches(stats, batch_format="pyarrow"),
        lambda g: g.sum().to_frame().T).take(1)[0]
    N, S = int(merged["n"]), int(merged["s"])
    idf = [((2 * N - 2 * int(merged["df%d" % j]) + 1) * 1_000_000)
           // (2 * int(merged["df%d" % j]) + 1) for j in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_score = [], []
        for i, txt in zip(ids, texts):
            toks = (txt or "").split()
            dl = len(toks)
            sc = 0
            for j, term in enumerate(terms):
                tf = toks.count(term)
                if tf:
                    sc += (idf[j] * (22 * tf * S)) \
                        // (10 * tf * S + 3 * S + 9 * dl * N)
            if sc > 0:
                out_id.append(i)
                out_score.append(sc)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_score, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_search(sf_dir):
    """BM25 ranked retrieval (Robertson et al., TREC-3 Okapi) over the
    documents table — the scoring upgrade over ``fulltext_search``'s
    raw term-frequency rank (fulltextindex.py:395-683 SELECT shape).
    Arithmetic and scale shape live in ``_bm25_scored``; this entry
    adds the global (score desc, doc_id) top-20 of the tiny
    qualifying set."""
    return (_bm25_scored(sf_dir)
            .sort(["score", "doc_id"], descending=[True, False]).limit(20))


# the CTE chain replaying _bm25_scored bit-exactly — the single SQL
# copy, shared by BM25_SQL and RRF_HYBRID_SQL
_BM25_CTES = """toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
),
d AS (
  SELECT doc_id, len(w) AS dl,
         len(list_filter(w, t -> t = 'merge')) AS tf1,
         len(list_filter(w, t -> t = 'join'))  AS tf2
  FROM toks
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(dl) AS HUGEINT) AS s,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS HUGEINT) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS HUGEINT) AS df2
  FROM d
),
idf AS (
  SELECT ((2 * n - 2 * df1 + 1) * 1000000) // (2 * df1 + 1) AS idf1,
         ((2 * n - 2 * df2 + 1) * 1000000) // (2 * df2 + 1) AS idf2,
         n, s
  FROM g
),
lexall0 AS (
  SELECT d.doc_id, CAST(
      CASE WHEN tf1 > 0 THEN (idf1 * (22 * tf1 * s))
           // (10 * tf1 * s + 3 * s + 9 * dl * n) ELSE 0 END
    + CASE WHEN tf2 > 0 THEN (idf2 * (22 * tf2 * s))
           // (10 * tf2 * s + 3 * s + 9 * dl * n) ELSE 0 END
    AS BIGINT) AS score
  FROM d, idf
  WHERE tf1 > 0 OR tf2 > 0
),
lexall AS (
  -- score > 0, not tf > 0: _bm25_scored emits only positive scores,
  -- and a df ≈ N term floors its idf to 0 at large N — keep the two
  -- engines' qualifying sets identical
  SELECT doc_id, score FROM lexall0 WHERE score > 0
)"""

BM25_SQL = """
WITH %s
SELECT doc_id, score FROM lexall
ORDER BY score DESC, doc_id ASC LIMIT 20
""" % _BM25_CTES


RRF_KK, RRF_POOL, RRF_TOP = 60, 50, 10
RRF_UNIT = 10 ** 12  # fixed-point 1/(k+rank) unit — exact in int64
# embedding quantization family (shared with kmeans / semantic dedup /
# MMR below — defined here because RRF_HYBRID_SQL bakes the scale in
# at module-build time)
EMB_K, EMB_ITERS, EMB_SCALE = 8, 2, 1000


def rrf_hybrid_search(sf_dir):
    """Hybrid retrieval fused by Reciprocal Rank Fusion (Cormack,
    Clarke & Büttcher, SIGIR'09): the lexical leg is the shared BM25
    scorer (``_bm25_scored``, documents table) and the semantic leg
    is exact-integer squared-L2 against vec_id 0's quantized
    embedding (embeddings table, doc_id ≡ vec_id); each leg
    contributes floor(10¹²/(60 + rank)) for its 1-based rank within
    its top-``RRF_POOL``, absent legs contribute 0, and the fused
    top-``RRF_TOP`` is ordered (rrf desc, doc_id asc).

    Scale shape: BOTH legs are zero-shuffle map passes emitting only
    per-batch partial top-pool rows tagged by leg (lexical keeps
    (score desc, doc_id) candidates, semantic keeps (dist asc,
    vec_id) candidates against the broadcast quantized query), so the
    union holds ≤ 2·blocks·pool rows and the global rank assignment +
    fusion runs once in a single bounded merge block — the classic
    partial-top-k shape of ``mmr_search``/``top_cited``. RRF itself
    is rank-only (no score calibration across legs), which is why the
    floor-division fixed point replays bit-exactly in the SQL oracle:
    ranks are integers, units are integers, ties break on doc_id in
    both engines. Reference parity: fulltextindex.py:159-170 returns
    relevance-ordered hits from ONE index; fusing a lexical and an
    embedding index is the modern RAG/retrieval upgrade of that
    surface, new-design per the brief."""
    from ..stages import clustering

    lex = _bm25_scored(sf_dir)

    def lex_part(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        sc = t["score"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, -sc))[:RRF_POOL]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "kind": pa.array(np.zeros(len(order), np.int64()), pa.int64()),
            "val": pa.array(sc[order], pa.int64())})

    eds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrow = (eds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow").to_pandas())
    qv = np.floor(np.asarray(list(qrow["embedding"])[0], dtype=np.float64)
                  * EMB_SCALE).astype(np.int64)
    qds = clustering.quantize_vectors(eds, scale=EMB_SCALE)

    def sem_part(t: pa.Table) -> pa.Table:
        m = clustering._qmatrix(t["qv"])
        ids = t["vec_id"].to_numpy().astype(np.int64)
        keep = ids != 0
        m, ids = m[keep], ids[keep]
        diff = m - qv[None, :]
        qd = np.einsum("ij,ij->i", diff, diff)
        order = np.lexsort((ids, qd))[:RRF_POOL]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "kind": pa.array(np.ones(len(order), np.int64()), pa.int64()),
            "val": pa.array(qd[order], pa.int64())})

    parts = (lex.map_batches(lex_part, batch_format="pyarrow")
             .union(qds.map_batches(sem_part, batch_format="pyarrow")))

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        lexd = (df[df["kind"] == 0]
                .sort_values(["val", "doc_id"], ascending=[False, True])
                .head(RRF_POOL))
        semd = (df[df["kind"] == 1]
                .sort_values(["val", "doc_id"], ascending=[True, True])
                .head(RRF_POOL))
        score: dict = {}
        lex_rank: dict = {}
        sem_rank: dict = {}
        for r, d in enumerate(lexd["doc_id"].tolist(), 1):
            lex_rank[d] = r
            score[d] = score.get(d, 0) + RRF_UNIT // (RRF_KK + r)
        for r, d in enumerate(semd["doc_id"].tolist(), 1):
            sem_rank[d] = r
            score[d] = score.get(d, 0) + RRF_UNIT // (RRF_KK + r)
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOP]
        return pd.DataFrame(
            {"doc_id": [d for d, _ in top],
             "lex_rank": [lex_rank.get(d, 0) for d, _ in top],
             "sem_rank": [sem_rank.get(d, 0) for d, _ in top],
             "rrf": [s for _, s in top]}).astype("int64")

    return _merge_partials(parts, fuse)


RRF_HYBRID_SQL = """
WITH %s,
lex AS (
  SELECT doc_id, CAST(row_number() OVER
           (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r
  FROM lexall QUALIFY r <= %d
),
qe AS (SELECT list_transform(embedding,
         x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v
       FROM embeddings WHERE vec_id = 0),
bv AS (SELECT vec_id, list_transform(embedding,
         x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v
       FROM embeddings WHERE vec_id <> 0),
sd AS (SELECT vec_id,
         CAST(list_inner_product(bv.v, bv.v)
              + list_inner_product(qe.v, qe.v)
              - 2 * list_inner_product(bv.v, qe.v) AS BIGINT) AS dist
       FROM bv, qe),
sem AS (
  SELECT vec_id AS doc_id, CAST(row_number() OVER
           (ORDER BY dist ASC, vec_id ASC) AS BIGINT) AS r
  FROM sd QUALIFY r <= %d
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         COALESCE(lex.r, 0) AS lex_rank,
         COALESCE(sem.r, 0) AS sem_rank,
         COALESCE(%d // (%d + lex.r), 0)
           + COALESCE(%d // (%d + sem.r), 0) AS rrf
  FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank, CAST(rrf AS BIGINT) AS rrf
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT %d
""" % (_BM25_CTES, RRF_POOL, EMB_SCALE, EMB_SCALE, RRF_POOL,
       RRF_UNIT, RRF_KK, RRF_UNIT, RRF_KK, RRF_TOP)


BOTTOMK = 32


def user_bottomk_sample(sf_dir, k: int = BOTTOMK):
    """Bottom-k (KMV) sketch over distinct events.user_id: the k
    minimum md5 hashes of the distinct keys — simultaneously a
    UNIFORM k-sample of users (hash order is independent of the data)
    and the K-Minimum-Values distinct-count estimator
    (Bar-Yossef et al. RANDOM'02: D ≈ (k−1)/h_(k)).

    Scale shape: each batch reduces to its local bottom-k over its
    distinct keys (bounded combiner — k rows out per batch no matter
    the input), and the partials coalesce into ONE tiny merge block
    that dedups and re-takes the bottom k; the exchange moves k·blocks
    hashes, never the key column. Both engines share md5 hex exactly,
    and fixed-width lowercase hex compares lexicographically as the
    integer hash, so the SQL oracle is a direct ORDER BY replay."""
    import hashlib

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(df["user_id"])
        out = pd.DataFrame({
            "user_id": pd.Series(ids, dtype="int64"),
            "h": [hashlib.md5(str(int(u)).encode()).hexdigest()
                  for u in ids]})
        return (out.drop_duplicates("h")
                .sort_values("h", kind="mergesort").head(k))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("h").sort_values("h", kind="mergesort")
        return g.head(k).reset_index(drop=True)

    return _merge_partials(ds.map_batches(partial, batch_format="pandas"),
                           merge)


USER_BOTTOMK_SQL = """
SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h
FROM (SELECT DISTINCT user_id FROM events)
ORDER BY h ASC LIMIT %d
""" % BOTTOMK


def doc_fingerprint(sf_dir):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        t = text_analysis.fingerprint(t)
        return t.select(["doc_id", "fp_md5"])

    return ds.map_batches(fp, batch_format="pyarrow")


DOC_FP_SQL = """
SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp_md5
FROM documents
"""


def doc_exact_dedup(sf_dir):
    """exact dedup stats: one row per distinct text
    (canonical = min doc_id, n_copies)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pd.DataFrame:
        t = text_analysis.fingerprint(t)
        df = t.select(["doc_id", "fp_md5"]).to_pandas()
        h = pd.util.hash_pandas_object(df["fp_md5"], index=False).values
        df["_bucket"] = (h % np.uint64(64)).astype("int32")
        return df

    def rep(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fp_md5", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return out[["doc_id", "n_copies"]]

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("_bucket").map_groups(rep, batch_format="pandas"))


DOC_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents
GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))
"""


NORM_CLONE_MOD, NORM_CLONE_OFFSET = 5, 1_000_000


def doc_normalized_dedup(sf_dir):
    """CCNet-style aggressive-normalization dedup (Wenzek et al.
    LREC'20 §4.1): documents are keyed by md5 of lowercase text with
    digits squashed to '0', punctuation stripped and whitespace
    collapsed — catching case/digit/punctuation variants that exact
    dedup (``doc_exact_dedup``) cannot. The corpus has no such
    variants by construction, so every doc_id%5==0 document gets a
    PLANTED variant (doc_id+1e6, uppercased, '5'→'7', ' ***'
    appended — all erased by the normalization chain) built from the
    same arithmetic in both engines; the planted-clone convention of
    ``cross_source_contamination``/``simhash_planted_recall``.

    Scale shape: the normalization chain and the md5 key are
    zero-shuffle map-side work; only (key, doc_id, raw_md5) triples
    reach ONE key-hash-bucketed exchange where each group reduces to
    (min doc_id, n_copies, n_raw_variants); dup groups only are
    emitted. Text never crosses the exchange."""
    import hashlib
    import re

    ws = re.compile(r"\s+")
    punct = re.compile(r"[^a-z0-9 \t\n\r]")

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        texts = pd.Series(t["text"].to_pylist(), dtype=object)
        m = ids % NORM_CLONE_MOD == 0
        all_ids = np.concatenate(
            [ids, ids[m] + NORM_CLONE_OFFSET])
        clones = (texts[m].str.replace("5", "7", regex=False)
                  .str.upper() + " ***")
        all_txt = pd.concat([texts, clones], ignore_index=True)
        norm = (all_txt.str.lower()
                .str.replace(r"[0-9]", "0", regex=True))
        norm = norm.map(lambda s: ws.sub(" ", punct.sub("", s)).strip())
        nk = [hashlib.md5(s.encode()).hexdigest() for s in norm]
        rk = [hashlib.md5(s.encode()).hexdigest() for s in all_txt]
        df = pd.DataFrame({"doc_id": all_ids.astype("int64"),
                           "nk": pd.Series(nk, dtype=object),
                           "rk": pd.Series(rk, dtype=object)})
        h = pd.util.hash_pandas_object(df["nk"], index=False).values
        df["_bucket"] = (h % np.uint64(64)).astype("int32")
        return df

    def rep(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("nk", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"),
            n_variants=("rk", "nunique"))
        out = out[out["n_copies"] > 1]
        for c in ("doc_id", "n_copies", "n_variants"):
            out[c] = out[c].astype("int64")
        return out[["doc_id", "n_copies", "n_variants"]]

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("_bucket").map_groups(rep, batch_format="pandas"))


NORM_DEDUP_SQL = """
WITH everything AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + %d,
         upper(regexp_replace(text, '5', '7', 'g')) || ' ***'
  FROM documents WHERE doc_id %% %d = 0),
keyed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(regexp_replace(
             lower(text), '[0-9]', '0', 'g'),
             '[^a-z0-9 \t\n\r]', '', 'g'), '\\s+', ' ', 'g'))) AS nk,
         md5(text) AS rk
  FROM everything)
SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
       count(DISTINCT rk) AS n_variants
FROM keyed GROUP BY nk HAVING count(*) > 1
""" % (NORM_CLONE_OFFSET, NORM_CLONE_MOD)


def snapshot_dedup(sf_dir):
    """Cross-snapshot (incremental-crawl) exact dedup: drop every
    new-snapshot document whose CONTENT hash already exists in the
    previous snapshot — the 'only process what the last crawl didn't
    have' step of a rolling 100-TB ingest. Snapshots are doc_id
    arithmetic (old = doc_id%2==0, new = doc_id%3==0; their overlap
    doc_id%6==0 carries byte-identical text). The anti-join runs
    through joins.membership_join with force_bloom=True, so the
    ORACLED path here is the scale path — Bloom prefilter plus exact
    hash-partitioned recheck of the maybe-member rows — not the
    small-side broadcast shortcut."""
    import hashlib

    from ..stages.joins import membership_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def snapshot(mod: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            t = t.filter(pa.array(ids % mod == 0))
            h = [hashlib.md5((x or "").encode()).hexdigest()
                 for x in t["text"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                             "h": pa.array(h, pa.string())})
        return fn

    old = docs.map_batches(snapshot(2), batch_format="pyarrow")
    new = docs.map_batches(snapshot(3), batch_format="pyarrow")
    kept = membership_join(new, "h", old.select_columns(["h"]), "h",
                           mode="anti", force_bloom=True)
    return kept.select_columns(["doc_id", "source"])


SNAPSHOT_DEDUP_SQL = """
WITH old AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
new AS (SELECT doc_id, source, md5(text) AS h FROM documents
        WHERE doc_id % 3 = 0)
SELECT n.doc_id, n.source FROM new n
WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.h = n.h)
"""


def toc_firstletter(sf_dir):
    """toc_pagesets semantics over documents: firstletter of the
    derived title (first 3 words uppercased — same rule as the page
    synthesizer) → doc counts."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def letters(t: pa.Table) -> pa.Table:
        vals = []
        for text in t["text"].to_pylist():
            words = (text or "").split()
            title = " ".join(words[:3]).upper()
            vals.append(firstletter(title))
        return pa.table({"value": pa.array(vals, pa.string()),
                         "doc_id": t["doc_id"]})

    return (ds.map_batches(letters, batch_format="pyarrow")
            .groupby("value").count()
            .map_batches(lambda df: df.rename(columns={"count()": "n_docs"}),
                         batch_format="pandas"))


TOC_SQL = """
WITH t AS (
  SELECT lower(array_to_string(list_slice(regexp_extract_all(text, '\\S+'), 1, 3), ' ')) AS tl
  FROM documents
), k AS (
  SELECT regexp_replace(CASE WHEN tl LIKE 'the %' THEN substr(tl, 5) ELSE tl END,
                        '[^a-z0-9]', '', 'g') AS key
  FROM t
)
SELECT CASE WHEN key = '' THEN '-' ELSE substr(key, 1, 1) END AS value,
       count(*) AS n_docs
FROM k GROUP BY 1
"""


def meta_triples_docs(sf_dir):
    """flat_map triple emission from document metadata columns."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        sources = t["source"].to_pylist()
        subj, pred, obj = [], [], []
        for i, lang, src in zip(ids, langs, sources):
            s = "doc:%d" % i
            subj += [s, s]
            pred += ["dcterms:language", "dcterms:source"]
            obj += [lang, src]
        return pa.table({"subj": pa.array(subj), "pred": pa.array(pred),
                         "obj": pa.array(obj)})

    return ds.map_batches(explode, batch_format="pyarrow")


META_TRIPLES_SQL = """
SELECT 'doc:' || doc_id AS subj, 'dcterms:language' AS pred, lang AS obj FROM documents
UNION ALL
SELECT 'doc:' || doc_id, 'dcterms:source', source FROM documents
"""


def top_sources(sf_dir):
    """top-k after shuffle (analyze_article_citations shape)."""
    ds = _read(sf_dir, "documents", columns=["source"])
    return (ds.groupby("source").count()
            .map_batches(lambda df: df.rename(columns={"count()": "n"}),
                         batch_format="pandas")
            .sort(["n", "source"], descending=[True, False]).limit(10))


TOP_SOURCES_SQL = """
SELECT source, count(*) AS n FROM documents
GROUP BY source ORDER BY n DESC, source ASC LIMIT 10
"""


def top_docs_per_source(sf_dir, k: int = 3):
    """Per-source top-k curation: keep the k longest (by token count)
    documents of every source — the best-k-per-domain selection step
    of a training-data pipeline. Scale shape: per-BATCH partial top-k
    per source (local combiner — at most k rows per (batch, source)
    reach the exchange, never the corpus), then a per-source merge
    top-k. Deterministic: ties break on doc_id ascending."""

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def partial_topk(t: pa.Table) -> pd.DataFrame:
        t = text_analysis.token_counts(t)
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(),
            "source": t["source"].to_pylist(),
            "n_tokens": t["ws_tokens"].to_numpy(),
        })
        df = df.sort_values(["source", "n_tokens", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("source", sort=False).head(k)

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tokens", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = (g.index + 1).astype("int64")
        return g[["doc_id", "source", "n_tokens", "rank"]]

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("source").map_groups(merge_topk, batch_format="pandas"))


TOP_DOCS_PER_SOURCE_SQL = """
WITH t AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM documents)
SELECT doc_id, source, n_tokens, rank FROM (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_tokens DESC, doc_id) AS rank
  FROM t) WHERE rank <= 3
"""


def sample_per_source(sf_dir, n: int = 5):
    """Deterministic stratified sample: n docs per source, chosen by
    md5(doc_id) order — seedless and stable across runs, engines and
    partitionings (no PRNG state to ship to workers). Same scale
    shape as top_docs_per_source: per-batch partial selection keeps
    only n rows per (batch, source) ahead of the exchange."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial_pick(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        df = pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "source": pd.Series(t["source"].to_pylist(), dtype="object"),
            "h": pd.Series([hashlib.md5(str(i).encode()).hexdigest()
                            for i in ids], dtype="object"),
        })
        df = df.sort_values(["source", "h"], kind="mergesort")
        return df.groupby("source", sort=False).head(n)

    def merge_pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("h", kind="mergesort").head(n)
        return g[["doc_id", "source"]].astype({"doc_id": "int64"})

    return (ds.map_batches(partial_pick, batch_format="pyarrow")
            .groupby("source").map_groups(merge_pick, batch_format="pandas"))


SAMPLE_PER_SOURCE_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS r
  FROM documents) WHERE r <= 5
"""


WPS_K = 32


def doc_weighted_sample(sf_dir, k: int = WPS_K):
    """Deterministic WEIGHTED priority sample (the Efraimidis &
    Spirakis IPL'06 one-pass shape): k docs with minimum priority =
    (hash · 10⁶) // weight, weight = n_chars — heavier docs draw
    proportionally smaller priorities, so inclusion probability grows
    with weight (the exponential-race form min hᵢ/wᵢ; the
    floor-division integer surrogate replaces u^(1/w) so both engines
    replay the SAME sample — the md5-as-randomness convention of
    ``sample_per_source``/``user_bottomk_sample``). The hash keeps 10
    hex digits (2⁴⁰) so the scaled numerator stays well inside int64;
    ties break on doc_id.

    Scale shape: per-batch bounded partial bottom-k (≤ k rows leave
    each batch regardless of size), one tiny single-block merge — the
    KMV discipline; no exchange ever carries the corpus."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        ws = t["n_chars"].to_pylist()
        rows = []
        for i, w in zip(ids, ws):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:10], 16)
            w = max(int(w), 1)
            rows.append((i, w, (h * 1_000_000) // w))
        df = pd.DataFrame(rows, columns=["doc_id", "n_chars", "prio"])
        return (df.sort_values(["prio", "doc_id"]).head(k)
                .reset_index(drop=True)
                .astype({"doc_id": "int64", "n_chars": "int64",
                         "prio": "int64"}))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["prio", "doc_id"]).head(k)
                .reset_index(drop=True)
                .astype({"doc_id": "int64", "n_chars": "int64",
                         "prio": "int64"}))

    return _merge_partials(
        ds.map_batches(part, batch_format="pyarrow"), merge)


DOC_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, GREATEST(n_chars, 1) AS n_chars,
       CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)
                 AS BIGINT) * 1000000 // GREATEST(n_chars, 1)
            AS BIGINT) AS prio
FROM documents
ORDER BY prio ASC, doc_id ASC LIMIT %d
""" % WPS_K


def mixture_sample(sf_dir, weights=None):
    """Deterministic source-mixture sampling (Pile/Dolma-style data
    mixing): given integer mixture weights w_s, pick per-source quotas
    k_s = (M * w_s) // W with W = Σw and M = min_s (n_s * W) // w_s —
    the largest total the corpus can serve at the target mixture
    without oversampling any source (waterfill). Each source's k_s
    docs are then selected by md5(doc_id) order: seedless, stable
    across runs, engines and partitionings. All quota math is integer,
    so the SQL oracle recomputes it bit-exactly.

    Default weights derive from the synthetic source name
    (1 + src_index % 4) purely so the testdata's uniform sources get a
    NON-trivial mixture; real use passes ``weights={source: int}``.

    Scale shape: one tiny per-source count groupby (sources ≪ docs)
    feeds driver-side quota math; quotas broadcast in the UDF closure;
    per-batch partial pick caps rows per (batch, source) at k_s ahead
    of the single per-source exchange."""
    import hashlib

    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    counts = (ds.groupby("source")
              .aggregate(Count(alias_name="n_s")).to_pandas())
    if weights is None:
        weights = {s: 1 + int(s[3:]) % 4 for s in counts["source"]}
    # a source with weight 0 — or absent from the dict — is excluded
    # from the mixture AND from the waterfill min (it can't bind M)
    pos = {s: w for s, w in weights.items() if w > 0}
    W = sum(pos.values())
    present = [(s, int(n)) for s, n in zip(counts["source"], counts["n_s"])
               if s in pos]
    M = min((n * W) // pos[s] for s, n in present) if present else 0
    quotas = {s: (M * w) // W for s, w in pos.items()}

    def pick(df: pd.DataFrame, final: bool) -> pd.DataFrame:
        if "h" not in df.columns:
            df = df.assign(h=pd.Series(
                [hashlib.md5(str(i).encode()).hexdigest()
                 for i in df["doc_id"]], index=df.index, dtype="object"))
        df = df.sort_values(["source", "h"], kind="mergesort")
        cc = df.groupby("source", sort=False).cumcount()
        lim = df["source"].map(quotas).fillna(0).astype("int64")
        df = df[cc < lim]
        return (df[["doc_id", "source"]].astype(
            {"doc_id": "int64", "source": "object"}) if final else df)

    def partial_pick(t: pa.Table) -> pd.DataFrame:
        # typed construction: empty batches must carry the same block
        # schema as full ones (CLAUDE.md one-schema-per-stage rule)
        return pick(pd.DataFrame({
            "doc_id": pd.Series(t["doc_id"].to_pylist(), dtype="int64"),
            "source": pd.Series(t["source"].to_pylist(), dtype="object"),
        }), final=False)

    return (ds.map_batches(partial_pick, batch_format="pyarrow")
            .groupby("source")
            .map_groups(lambda g: pick(g, final=True),
                        batch_format="pandas"))


MIXTURE_SAMPLE_SQL = """
WITH w AS (
  SELECT source, count(*) AS n_s,
         1 + (CAST(substr(source, 4) AS BIGINT) % 4) AS wt
  FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(wt) AS BIGINT) AS W FROM w),
m AS (SELECT CAST(min((n_s * W) // wt) AS BIGINT) AS M FROM w, tot),
q AS (SELECT source, CAST((M * wt) // W AS BIGINT) AS k FROM w, tot, m),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
  FROM documents)
SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE rn <= q.k
"""


def source_token_quantiles(sf_dir):
    """EXACT per-source token-count quantiles (p50/p90) without ever
    shuffling raw per-doc values: token counts have a bounded small
    domain, so a per-batch (source, value) -> count histogram is a
    lossless combiner; the exchange moves histograms, the merge sums
    them and reads the quantile off the cumulative counts. Quantile
    convention pinned to integer arithmetic on BOTH sides (0-based
    index q*(n-1) computed as (9*(n-1))//10 etc. — no float floor at
    engine boundaries)."""

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial_hist(t: pa.Table) -> pd.DataFrame:
        t = text_analysis.token_counts(t)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "v": t["ws_tokens"].to_numpy()})
        g = df.groupby(["source", "v"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def merge_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        h = (g.groupby("v", as_index=False)["cnt"].sum()
             .sort_values("v", kind="mergesort"))
        counts = h["cnt"].to_numpy()
        values = h["v"].to_numpy()
        cum = counts.cumsum()
        n = int(cum[-1])

        def pick(idx0):
            return int(values[int((cum > idx0).argmax())])

        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_docs": [n],
            "p50_tokens": [pick((n - 1) // 2)],
            "p90_tokens": [pick((9 * (n - 1)) // 10)],
        })

    return (ds.map_batches(partial_hist, batch_format="pyarrow")
            .groupby("source").map_groups(merge_quantiles,
                                          batch_format="pandas"))


SOURCE_QUANTILES_SQL = """
WITH t AS (
  SELECT source, len(regexp_extract_all(text, '\\S+')) AS v
  FROM documents),
r AS (
  SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM t)
SELECT source, max(n) AS n_docs,
       max(CASE WHEN rn = 1 + (n - 1) // 2 THEN v END) AS p50_tokens,
       max(CASE WHEN rn = 1 + (9 * (n - 1)) // 10 THEN v END) AS p90_tokens
FROM r GROUP BY source
"""


def quantile_band_docs(sf_dir):
    """Data-driven length gate: keep documents whose token count sits
    inside their OWN source's [p50, p90] band (the per-domain
    adaptive version of C4/Gopher's fixed length bounds). Scale
    shape: the exact per-source quantiles come from the histogram
    combiner (source_token_quantiles — the exchange moves (source,
    value, count) histograms, never per-doc values); the band table
    is one row per source — a bounded driver pull broadcast back via
    ray.put — and the gate itself is a zero-shuffle map-side
    filter."""
    import ray

    bands = {r["source"]: (r["p50_tokens"], r["p90_tokens"])
             for r in source_token_quantiles(sf_dir).take_all()}
    ref = ray.put(bands)

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def gate(t: pa.Table) -> pa.Table:
        t = text_analysis.token_counts(t)
        b = ray.get(ref)
        srcs = t["source"].to_pylist()
        toks = t["ws_tokens"].to_numpy()
        keep = [s in b and b[s][0] <= v <= b[s][1]
                for s, v in zip(srcs, toks)]
        t = t.filter(pa.array(keep))
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "ws_tokens": t["ws_tokens"]})

    return ds.map_batches(gate, batch_format="pyarrow")


QUANTILE_BAND_SQL = """
WITH q AS (%s)
SELECT d.doc_id, d.source,
       len(regexp_extract_all(d.text, '\\S+')) AS ws_tokens
FROM documents d JOIN q ON q.source = d.source
WHERE len(regexp_extract_all(d.text, '\\S+'))
      BETWEEN q.p50_tokens AND q.p90_tokens
""" % SOURCE_QUANTILES_SQL


CHI2_MICRO = 10 ** 6


MAD_K_NUM, MAD_K_DEN = 29652, 10000  # 2 · 1.4826 in 1e4 fixed point


def doc_length_outliers(sf_dir):
    """Robust per-source outlier gate on document length (the
    Iglewicz–Hoaglin modified z-score rule at |z| > 2): flag docs
    with |n_chars − median| > 2·1.4826·MAD, the constant entering as
    the exact 29652/10000 cross-multiplication so no float crosses
    the engine boundary; median and MAD share the repo's 0-based
    (n−1)//2 index convention.

    Scale shape: MAD derives from the SAME bounded-domain
    (source, n_chars)→count histogram that yields the median (the
    source_token_quantiles combiner — the deviation histogram is the
    value histogram folded around the median), so ONE histogram
    exchange computes both statistics; the per-source (med, mad)
    table is a bounded pull broadcast via ray.put and the flag pass
    is a zero-shuffle map-side filter. Output: flagged
    (doc_id, source, n_chars, med, mad)."""
    import ray

    ds0 = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial_hist(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "v": t["n_chars"].to_numpy()})
        g = df.groupby(["source", "v"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def merge_stats(g: pd.DataFrame) -> pd.DataFrame:
        h = (g.groupby("v", as_index=False)["cnt"].sum()
             .sort_values("v", kind="mergesort"))
        counts = h["cnt"].to_numpy()
        values = h["v"].to_numpy()
        n = int(counts.sum())

        def pick(vals, cnts, idx0):
            cum = cnts.cumsum()
            return int(vals[int((cum > idx0).argmax())])

        med = pick(values, counts, (n - 1) // 2)
        dev = pd.DataFrame({"d": np.abs(values - med), "cnt": counts})
        dh = (dev.groupby("d", as_index=False)["cnt"].sum()
              .sort_values("d", kind="mergesort"))
        mad = pick(dh["d"].to_numpy(), dh["cnt"].to_numpy(),
                   (n - 1) // 2)
        return pd.DataFrame({"source": [g["source"].iloc[0]],
                             "med": [med], "mad": [mad]})

    stats = {r["source"]: (int(r["med"]), int(r["mad"]))
             for r in (ds0.map_batches(partial_hist,
                                       batch_format="pyarrow")
                       .groupby("source")
                       .map_groups(merge_stats, batch_format="pandas")
                       ).take_all()}
    ref = ray.put(stats)

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("source", pa.string()),
                            ("n_chars", pa.int64()),
                            ("med", pa.int64()), ("mad", pa.int64())])

    def gate(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        srcs = t["source"].to_pylist()
        nc = t["n_chars"].to_numpy().astype(np.int64)
        med = np.fromiter((st[s][0] for s in srcs), np.int64, len(srcs))
        mad = np.fromiter((st[s][1] for s in srcs), np.int64, len(srcs))
        keep = MAD_K_DEN * np.abs(nc - med) > MAD_K_NUM * mad
        # Arrow out with an explicit schema: an all-filtered batch
        # must not emit a schema-less empty pandas block
        return pa.table({
            "doc_id": pa.array(t["doc_id"].to_numpy()[keep], pa.int64()),
            "source": pa.array([s for s, k in zip(srcs, keep) if k],
                               pa.string()),
            "n_chars": pa.array(nc[keep], pa.int64()),
            "med": pa.array(med[keep], pa.int64()),
            "mad": pa.array(mad[keep], pa.int64())}, schema=out_schema)

    return ds.map_batches(gate, batch_format="pyarrow")


DOC_LENGTH_OUTLIERS_SQL = """
WITH r AS (
  SELECT source, n_chars AS v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
med AS (SELECT source, max(CASE WHEN rn = 1 + (n - 1) // 2 THEN v END)
          AS med FROM r GROUP BY source),
dv AS (
  SELECT r.source, abs(r.v - m.med) AS d,
         row_number() OVER (PARTITION BY r.source
                            ORDER BY abs(r.v - m.med)) AS rn,
         count(*) OVER (PARTITION BY r.source) AS n
  FROM r JOIN med m ON m.source = r.source),
mad AS (SELECT source, max(CASE WHEN rn = 1 + (n - 1) // 2 THEN d END)
          AS mad FROM dv GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars,
       CAST(m.med AS BIGINT) AS med, CAST(a.mad AS BIGINT) AS mad
FROM documents d
JOIN med m ON m.source = d.source
JOIN mad a ON a.source = d.source
WHERE %d * abs(d.n_chars - m.med) > %d * a.mad
""" % (MAD_K_DEN, MAD_K_NUM)


def source_vocab_overlap(sf_dir):
    """Pairwise vocabulary Jaccard between sources — the corpus-mix
    diagnostic next to source_term_divergence (χ² asks 'does this
    source drift from the mixture'; this asks 'which sources share a
    lexicon'). Output per source pair (a < b): intersection size,
    union size, and Jaccard in exact integer milli-units
    (inter·1000)//union.

    Scale shape: per-batch batch-local distinct (source, term) pairs,
    ONE term-hash-bucketed exchange; inside each bucket a vectorized
    self-merge per term emits bounded ≤ sources² pair counts plus
    per-source partial vocabulary sizes (every distinct term lives in
    exactly one bucket, so bucket partials sum exactly); one bounded
    single-block merge finishes the Jaccard arithmetic. Raw documents
    never cross the exchange — only (source, term) distinct pairs."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])
    W = _exchange_buckets(sf_dir)

    def st_partial(t: pa.Table) -> pd.DataFrame:
        rows = set()
        for s, txt in zip(t["source"].to_pylist(),
                          t["text"].to_pylist()):
            for term in set((txt or "").split(" ")):
                rows.add((s, term))
        df = pd.DataFrame(sorted(rows), columns=["source", "term"])
        h = pd.util.hash_pandas_object(df["term"], index=False).values
        df["_bucket"] = (h % np.uint64(W)).astype("int32")
        return df

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["source", "term"])
        m = g.merge(g, on="term")
        m = m[m["source_x"] < m["source_y"]]
        pr = (m.groupby(["source_x", "source_y"], as_index=False)
              .agg(n=("term", "size")))
        pr.columns = ["a", "b", "n"]
        szg = g.groupby("source", as_index=False).agg(n=("term", "size"))
        sz = pd.DataFrame({"a": szg["source"], "b": "", "n": szg["n"]})
        out = pd.concat([pr, sz], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out[["a", "b", "n"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["a", "b"], as_index=False)["n"].sum()
        szs = dict(zip(agg.loc[agg["b"] == "", "a"],
                       agg.loc[agg["b"] == "", "n"]))
        pr = agg[agg["b"] != ""]
        inter = pr["n"].to_numpy(np.int64)
        union = (pr["a"].map(szs).to_numpy(np.int64)
                 + pr["b"].map(szs).to_numpy(np.int64) - inter)
        out = pd.DataFrame({
            "source_a": pr["a"].to_numpy(),
            "source_b": pr["b"].to_numpy(),
            "inter": inter,
            "union_sz": union,
            "jacc_milli": inter * 1000 // union})
        return (out.sort_values(["source_a", "source_b"])
                .reset_index(drop=True)
                .astype({"inter": "int64", "union_sz": "int64",
                         "jacc_milli": "int64"}))

    partials = (ds.map_batches(st_partial, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_counts, batch_format="pandas"))
    return _merge_partials(partials, final)


SOURCE_VOCAB_OVERLAP_SQL = """
WITH st AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest(string_split(text, ' ')) AS term
    FROM documents)),
sz AS (SELECT source, count(*) AS c FROM st GROUP BY source),
pr AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS inter
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY source_a, source_b)
SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter,
       CAST(za.c + zb.c - inter AS BIGINT) AS union_sz,
       CAST(inter * 1000 // (za.c + zb.c - inter) AS BIGINT)
         AS jacc_milli
FROM pr
JOIN sz za ON za.source = source_a
JOIN sz zb ON zb.source = source_b
ORDER BY source_a, source_b
"""


def source_term_divergence(sf_dir):
    """Domain-shift detector: per-source χ² divergence of the unigram
    term distribution against the whole corpus (the 'is this domain's
    vocabulary drifting from the mixture' quality signal). EXACT
    integer arithmetic end to end: each χ² term is
    ((o·N − n_s·n_w)² · 10⁶) // (N · n_s · n_w) — a single rational
    floored once, computed in Python bigints here and HUGEINT in the
    oracle, so no float crosses the engine boundary. Scale shape: the
    exchange carries (source, term, count) partials — bounded by
    sources × vocabulary — merged in one vectorized block; zero cells
    (a source never using a term) are filled in at the merge, as χ²
    requires."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df.assign(w=df["text"].str.split(" "))
              .explode("w")[["source", "w"]])
        g = ex.groupby(["source", "w"]).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["cnt"].sum()
        ns = g.groupby("source")["cnt"].sum().to_dict()
        nw = g.groupby("w")["cnt"].sum().to_dict()
        obs = {(s, w): int(c) for s, w, c in
               zip(g["source"], g["w"], g["cnt"])}
        n = int(g["cnt"].sum())
        rows = []
        for s in sorted(ns):
            chi2 = 0
            for w in sorted(nw):
                o = obs.get((s, w), 0)
                d = (o * n - int(ns[s]) * int(nw[w]))
                chi2 += (d * d * CHI2_MICRO) // (n * int(ns[s]) * int(nw[w]))
            rows.append((s, chi2))
        return pd.DataFrame({"source": [r[0] for r in rows],
                             "chi2_micro": pd.Series(
                                 [r[1] for r in rows], dtype="int64")})

    return _merge_partials(
        ds.map_batches(part, batch_format="pandas"), merge)


SOURCE_CHI2_SQL = """
WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
           FROM documents),
o AS (SELECT source, w, count(*) AS o FROM t GROUP BY source, w),
ns AS (SELECT source, count(*) AS n_s FROM t GROUP BY source),
nw AS (SELECT w, count(*) AS n_w FROM t GROUP BY w),
tot AS (SELECT count(*) AS n FROM t),
cells AS (SELECT ns.source, nw.w, ns.n_s, nw.n_w, COALESCE(o.o, 0) AS o
          FROM ns CROSS JOIN nw
          LEFT JOIN o ON o.source = ns.source AND o.w = nw.w)
SELECT source,
       CAST(sum((CAST(o AS HUGEINT) * n - CAST(n_s AS HUGEINT) * n_w)
                * (CAST(o AS HUGEINT) * n - CAST(n_s AS HUGEINT) * n_w)
                * %d // (CAST(n AS HUGEINT) * n_s * n_w)) AS BIGINT)
           AS chi2_micro
FROM cells, tot GROUP BY source
""" % CHI2_MICRO


def cross_source_contamination(sf_dir):
    """Benchmark-contamination / cross-split-leakage detector: every
    document whose exact text also appears under a DIFFERENT source.
    The raw table has no cross-source duplicates, so (planted-oracle
    convention, cf. simhash_planted_recall) the query clones
    doc_id % 7 == 0 into a synthetic 'heldout' source and the detector
    must recover exactly the planted originals + clones. Scale shape:
    map-side md5 fingerprint, fingerprints hash-bucketed (64 groups,
    never one Ray group per fingerprint), per-bucket nunique(source)
    filter — only (fp, doc_id, source) triples reach the exchange,
    never text."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def plant_and_fp(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        oi, osrc, otxt = list(ids), list(srcs), list(texts)
        for i, txt in zip(ids, texts):
            if i % 7 == 0:
                oi.append(i + CLONE_OFFSET)
                osrc.append("heldout")
                otxt.append(txt)
        fps = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
               for x in otxt]
        df = pd.DataFrame({"fp": fps, "doc_id": oi, "source": osrc})
        df["_b"] = (pd.util.hash_pandas_object(df["fp"], index=False)
                    % 64).astype("int32")
        return df

    def leaked(g: pd.DataFrame) -> pd.DataFrame:
        ns = g.groupby("fp")["source"].transform("nunique")
        out = g.loc[ns > 1, ["doc_id", "source"]]
        if not len(out):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object")})
        return out.astype({"doc_id": "int64"})

    return (ds.map_batches(plant_and_fp, batch_format="pyarrow")
            .groupby("_b").map_groups(leaked, batch_format="pandas"))


CONTAMINATION_SQL = """
SELECT doc_id, source FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 10000000 AS doc_id, 'heldout' AS source
FROM documents WHERE doc_id % 7 = 0
"""


HLL_P = 8  # 256 registers; HLL σ ≈ 1.04/√256 ≈ 6.5 %


def _hll_rank_cols(ids):
    """ids → parallel (bucket, rank) lists. Hash = first 15 hex chars
    of md5(str(id)) parsed as a 60-bit integer — an avalanche hash
    BOTH engines share exactly (DuckDB: CAST('0x'||substr(md5(..),
    1,15) AS BIGINT) — verified bit-identical to hashlib). Low
    HLL_P bits bucket; rank = leading-zero count + 1 in the remaining
    52-bit window."""
    import hashlib

    buckets, ranks = [], []
    w = 60 - HLL_P
    for u in ids:
        h = int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)
        rem = h >> HLL_P
        buckets.append(h % (1 << HLL_P))
        ranks.append(w - rem.bit_length() + 1 if rem else w + 1)
    return buckets, ranks


def hll_estimate(registers: dict, p: int = HLL_P) -> float:
    """Standard HyperLogLog estimator (Flajolet et al. '07) with the
    small-range linear-counting correction; absent buckets count as
    rank 0."""
    import math

    m = 1 << p
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / s
    zeros = sum(1 for b in range(m) if b not in registers)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return e


def hll_user_registers(sf_dir):
    """Mergeable distinct-count sketch (HyperLogLog register state)
    over events.user_id. Scale shape: each batch reduces to ≤256
    (bucket, max_rank) ints — the exchange moves registers, never
    ids, and registers merge by max (associative/commutative, so any
    partial aggregation tree is exact). The register state is pure
    integer arithmetic over a hash both engines share, so the SQL
    oracle recomputes it EXACTLY; the float estimator on top is unit
    tested separately (test_hll: accuracy bound + merge law)."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b, r = _hll_rank_cols(pd.unique(df["user_id"]))  # hash once/id
        out = pd.DataFrame({"bucket": pd.Series(b, dtype="int64"),
                            "max_rank": pd.Series(r, dtype="int64")})
        return out.groupby("bucket", as_index=False)["max_rank"].max()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bucket", as_index=False)["max_rank"].max()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("bucket").map_groups(merge, batch_format="pandas"))


HLL_REGISTERS_SQL = """
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events),
r AS (SELECT hv % 256 AS bucket, hv // 256 AS rem FROM h)
SELECT bucket,
       max(CASE WHEN rem = 0 THEN 53
                ELSE 52 - length(printf('%b', rem)) + 1 END) AS max_rank
FROM r GROUP BY bucket
"""


CM_DEPTH = 4   # independent hash rows
CM_WIDTH = 64  # counters per row; ε ≈ e/64, δ ≈ e^-4


def _cm_col(row: int, key) -> int:
    """Column index of ``key`` in hash row ``row`` — md5 over
    'row:key', same 60-bit parse the HLL sketch uses, shared
    bit-exactly with the SQL oracle."""
    import hashlib

    h = hashlib.md5(("%d:%d" % (row, int(key))).encode()).hexdigest()
    return int(h[:15], 16) % CM_WIDTH


def cm_point_estimate(cells: dict, key) -> int:
    """Count-Min point query: min over rows of the key's cell (absent
    cell = 0). Never underestimates the true count."""
    return min(cells.get((r, _cm_col(r, key)), 0) for r in range(CM_DEPTH))


def cm_user_counts(sf_dir):
    """Mergeable frequency sketch (Count-Min, Cormode & Muthukrishnan
    '05) of per-user event counts. Scale shape: each batch reduces to
    ≤ CM_DEPTH·CM_WIDTH (row, col, count) cells — counters merge by
    SUM (associative/commutative), so the exchange moves a fixed-size
    sketch regardless of input size. Cell state is exact integer
    counting over the shared md5-derived column hash, so the SQL
    oracle recomputes every cell EXACTLY; the point-query estimator's
    one-sided error guarantee is unit tested (test_cm_sketch)."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["user_id"].value_counts()  # count once per unique id
        rows, cols, cnts = [], [], []
        for u, n in vc.items():
            for r in range(CM_DEPTH):
                rows.append(r)
                cols.append(_cm_col(r, u))
                cnts.append(int(n))
        out = pd.DataFrame({"row_id": pd.Series(rows, dtype="int64"),
                            "col_id": pd.Series(cols, dtype="int64"),
                            "cnt": pd.Series(cnts, dtype="int64")})
        return out.groupby(["row_id", "col_id"], as_index=False)["cnt"].sum()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["row_id", "col_id"], as_index=False)["cnt"].sum()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("row_id").map_groups(merge, batch_format="pandas"))


CM_COUNTS_SQL = """
WITH g AS (
  SELECT r.row_id,
         CAST(concat('0x', substr(md5(concat(r.row_id, ':',
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 64 AS col_id
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS row_id) r)
SELECT row_id, col_id, count(*) AS cnt
FROM g GROUP BY row_id, col_id
"""


def user_hll_by_type(sf_dir):
    """Per-GROUP mergeable distinct-count sketch: HyperLogLog register
    state per event_type (the 'distinct users per segment' question a
    100-TB log answers without an exact-distinct exchange). Scale
    shape: each batch reduces to ≤ types × 2^HLL_P (event_type,
    bucket, max_rank) rows; registers merge by max
    (associative/commutative), and the merged key space is bounded
    (types × 256), so the final merge is one vectorized block
    (_merge_partials). Same shared md5-derived hash as
    hll_user_registers, so the SQL oracle recomputes every register
    EXACTLY; the float estimator on top is unit tested in test_hll."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[["event_type", "user_id"]].drop_duplicates()
        uids = pd.unique(pairs["user_id"])
        b, r = _hll_rank_cols(uids)  # hash once per unique id
        hmap = pd.DataFrame({"user_id": uids,
                             "bucket": pd.Series(b, dtype="int64"),
                             "max_rank": pd.Series(r, dtype="int64")})
        out = pairs.merge(hmap, on="user_id")[
            ["event_type", "bucket", "max_rank"]]
        return out.groupby(["event_type", "bucket"],
                           as_index=False)["max_rank"].max()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "bucket"],
                       as_index=False)["max_rank"].max()
        g["bucket"] = g["bucket"].astype("int64")
        g["max_rank"] = g["max_rank"].astype("int64")
        return g

    return _merge_partials(
        ds.map_batches(partial, batch_format="pandas"), merge)


USER_HLL_BY_TYPE_SQL = """
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events),
r AS (SELECT event_type, hv % 256 AS bucket, hv // 256 AS rem FROM h)
SELECT event_type, bucket,
       max(CASE WHEN rem = 0 THEN 53
                ELSE 52 - length(printf('%b', rem)) + 1 END) AS max_rank
FROM r GROUP BY event_type, bucket
"""


HH_CAP = 4000  # φ = 1/4000 of all trigram occurrences


def heavy_hitter_grams(sf_dir):
    """EXACT heavy-hitter trigrams (count·cap > N) via the two-phase
    pigeonhole / Misra–Gries pattern (stages/transform.heavy_hitters):
    phase 1 never shuffles the gram space — per-block partial counts,
    < cap candidates per block by construction; phase 2 exact-counts
    only the broadcast candidate set and applies the exact global
    filter. A plain groupby alternative moves every distinct gram
    (16k here, billions on a real crawl) through an exchange; this
    moves |candidates|. Result is bit-identical to the SQL HAVING."""
    from ..stages.transform import heavy_hitters

    ds = _read(sf_dir, "documents", columns=["text"])

    def grams(t: pa.Table) -> pa.Table:
        out = []
        for txt in t["text"].to_pylist():
            ws = (txt or "").split(" ")
            out.extend("%s %s %s" % (ws[i], ws[i + 1], ws[i + 2])
                       for i in range(len(ws) - 2))
        return pa.table({"gram": pa.array(out, pa.string())})

    return heavy_hitters(ds.map_batches(grams, batch_format="pyarrow"),
                         "gram", cap=HH_CAP)


HH_GRAMS_SQL = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
t AS (SELECT ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
      FROM w, unnest(range(1, len(ws) - 1)) AS r(i))
SELECT gram, count(*) AS cnt FROM t GROUP BY gram
HAVING count(*) * %d > (SELECT count(*) FROM t)
""" % HH_CAP


PMI_MINC, PMI_SCALE, PMI_TOPN = 3, 1000, 20


def collocation_pmi(sf_dir):
    """Top-N collocations by pointwise mutual information over
    whitespace bigrams (Church & Hanks, CL'90): lift(x,y) =
    P(xy) / (P(x)·P(y)) = cxy·N / (cx·cy), kept as the EXACT integer
    floor(cxy · N · PMI_SCALE / (cx · cy)) so ranking needs no float
    log (log is monotone — ordering by lift IS ordering by PMI).

    Scale shape: ONE pass over text emits per-batch PARTIAL counts
    for unigrams and bigrams together (a Counter combiner — the
    exchange moves batch-vocabulary rows, never tokens; the two gram
    kinds share one namespace because unigrams never contain a space
    and bigrams always do); one hash groupby sums; the count table is
    materialized once (the checkpointed vocabulary — modest even at
    web scale); bigrams below PMI_MINC are dropped BEFORE any join;
    the survivors pick up their member-term counts via two bucketed
    hash joins (stages/joins.bucket_join — no broadcast of the
    unigram vocabulary); scoring is vectorized map-side and only
    per-batch top-PMI_TOPN partials reach the final bounded merge.
    N (total tokens) is a single bounded aggregate. int64 is safe at
    test scale (cxy·N·SCALE < 2⁶³); a 100-TB run would widen the
    score to Python ints / HUGEINT in the same merge.
    Reference parity: new-design text-analysis operator alongside
    heavy_hitter_grams / doc_tfidf_terms."""
    from collections import Counter

    from ..stages.joins import bucket_join

    width = _exchange_buckets(sf_dir)
    ds = _read(sf_dir, "documents", columns=["text"])

    def gram_partials(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for txt in t["text"].to_pylist():
            ws = (txt or "").split(" ")
            cnt.update(ws)
            cnt.update("%s %s" % (ws[i], ws[i + 1])
                       for i in range(len(ws) - 1))
        return pa.table({"gram": pa.array(list(cnt.keys()), pa.string()),
                         "n": pa.array(list(cnt.values()), pa.int64())})

    counts = (ds.map_batches(gram_partials, batch_format="pyarrow")
              .groupby("gram").sum("n")
              .map_batches(lambda df: df.rename(columns={"sum(n)": "cnt"}),
                           batch_format="pandas")
              .materialize())

    def _is_bigram(t: pa.Table, want: bool) -> pa.Table:
        has_space = pc.not_equal(pc.find_substring(t["gram"], " "), -1)
        return t.filter(has_space if want else pc.invert(has_space))

    n_tokens = int(
        counts.map_batches(lambda t: _is_bigram(t, False),
                           batch_format="pyarrow").sum("cnt"))

    big = counts.map_batches(
        lambda t: (lambda f: pa.table({
            "gram": f["gram"],
            "x": pc.list_element(pc.split_pattern(f["gram"], " "), 0),
            "y": pc.list_element(pc.split_pattern(f["gram"], " "), 1),
            "cxy": f["cnt"]}))(
                _is_bigram(t, True).filter(
                    pc.greater_equal(_is_bigram(t, True)["cnt"],
                                     PMI_MINC))),
        batch_format="pyarrow")

    def _uni_as(key: str, cname: str):
        return counts.map_batches(
            lambda t, k=key, c=cname: (lambda u: pa.table(
                {k: u["gram"], c: u["cnt"]}))(_is_bigram(t, False)),
            batch_format="pyarrow")

    j = bucket_join(big, _uni_as("x", "cx"), left_on="x",
                    num_buckets=width)
    j = bucket_join(j, _uni_as("y", "cy"), left_on="y",
                    num_buckets=width)

    def score_topn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"gram": pd.Series(dtype="object"),
                                 "cxy": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        cxy = df["cxy"].to_numpy(np.int64)
        cx = df["cx"].to_numpy(np.int64)
        cy = df["cy"].to_numpy(np.int64)
        score = cxy * np.int64(n_tokens) * np.int64(PMI_SCALE) // (cx * cy)
        out = pd.DataFrame({
            "gram": df["gram"].to_numpy(),
            "cxy": pd.Series(cxy, dtype="int64"),
            "score": pd.Series(score, dtype="int64")})
        out = out.sort_values(["score", "gram"], ascending=[False, True],
                              kind="mergesort")
        return out.head(PMI_TOPN).reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["score", "gram"], ascending=[False, True],
                             kind="mergesort")
              .head(PMI_TOPN).reset_index(drop=True))
        df["rank"] = pd.Series(range(1, len(df) + 1), dtype="int64")
        df["cxy"] = df["cxy"].astype("int64")
        df["score"] = df["score"].astype("int64")
        return df[["rank", "gram", "cxy", "score"]]

    return _merge_partials(
        j.map_batches(score_topn, batch_format="pandas"), final)


COLLOCATION_PMI_SQL = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
u AS (SELECT ws[i] AS term FROM w, unnest(range(1, len(ws) + 1)) AS r(i)),
uc AS (SELECT term, count(*) AS c FROM u GROUP BY term),
n AS (SELECT count(*) AS n FROM u),
bg AS (SELECT ws[i] AS x, ws[i + 1] AS y
       FROM w, unnest(range(1, len(ws))) AS r(i)),
bc AS (SELECT x, y, count(*) AS cxy FROM bg GROUP BY x, y
       HAVING count(*) >= %d),
sc AS (SELECT bc.x || ' ' || bc.y AS gram, bc.cxy,
              CAST(bc.cxy * n.n * %d // (ux.c * uy.c) AS BIGINT) AS score
       FROM bc CROSS JOIN n
       JOIN uc ux ON ux.term = bc.x
       JOIN uc uy ON uy.term = bc.y)
SELECT CAST(row_number() OVER (ORDER BY score DESC, gram) AS BIGINT) AS rank,
       gram, CAST(cxy AS BIGINT) AS cxy, score
FROM sc ORDER BY score DESC, gram LIMIT %d
""" % (PMI_MINC, PMI_SCALE, PMI_TOPN)


def name_edit1_pairs(sf_dir):
    """Edit-distance-1 similarity self-join over customer names —
    EXACT, via FastSS deletion-neighborhood signatures
    (stages/dedup.edit1_join_pairs): map-side signature explode,
    signature-hash-bucketed candidate grouping, O(len) verify, pair
    dedup exchange. Oracle = brute-force levenshtein self-join."""
    from ..stages.dedup import edit1_join_pairs

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return edit1_join_pairs(ds, text_col="c_name", key_col="c_custkey")


NAME_EDIT1_SQL = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def er_customer_clusters(sf_dir):
    """End-to-end entity resolution (the Fellegi-Sunter pipeline
    shape: blocking → pairwise match → clustering → canonical id)
    over customer names, composing three already-oracled stages into
    one lazy DAG: FastSS deletion-1 blocking with O(len) verify
    (EXACT edit-distance-1 match, ``dedup.edit1_join_pairs``) →
    hash-to-min distributed CC over the match graph
    (``canonicalize.connected_components_distributed``) → canonical
    id = min custkey per cluster. Output (c_custkey, canon_key) for
    every clustered (non-singleton) customer. Keys ride the CC
    machinery zero-padded to fixed width so lexicographic min ==
    numeric min; the oracle recomputes TRUE reachability closure
    over the brute-force levenshtein pair graph with a recursive
    CTE (the kg_cocite_communities discipline — no planted
    construction)."""
    from ..stages.canonicalize import connected_components_distributed
    from ..stages.dedup import edit1_join_pairs

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    pairs = edit1_join_pairs(ds, text_col="c_name", key_col="c_custkey")

    def as_edges(t: pa.Table) -> pa.Table:
        # lexicographic min == numeric min only while keys fit the
        # fixed pad width (utf8_lpad does NOT truncate) — fail loud
        # rather than silently mis-canonicalize
        if len(t) and int(pc.max(t["key_b"]).as_py()) >= 10 ** 12:
            raise ValueError("custkey exceeds the 12-digit pad width")
        a = pc.utf8_lpad(pc.cast(t["key_a"], pa.string()), 12, "0")
        b = pc.utf8_lpad(pc.cast(t["key_b"], pa.string()), 12, "0")
        return pa.table({"uri_a": a, "uri_b": b})

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow"))
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "c_custkey": df["node"].astype("int64"),
            "canon_key": df["label"].astype("int64")}),
        batch_format="pandas")


ER_CLUSTERS_SQL = """
WITH RECURSIVE pr AS (
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
sym AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
nds AS (SELECT u AS node FROM sym UNION SELECT v FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nds
  UNION
  SELECT s.v, r.lab FROM reach r JOIN sym s ON s.u = r.node)
SELECT CAST(node AS BIGINT) AS c_custkey,
       CAST(min(lab) AS BIGINT) AS canon_key
FROM reach GROUP BY node
"""


def doc_tfidf_terms(sf_dir, k: int = 3):
    """Per-document top-k TF-IDF keyword extraction in two linear
    passes: (1) document frequencies — per-batch (term, n-docs-
    containing) partials merged in ONE vocabulary-sized groupby and
    broadcast via ray.put (vocabulary << corpus; each doc is one row,
    so batch-local distinct-doc counts sum globally with no dedup
    exchange); (2) map-side tf + top-k — entirely doc-local, zero
    shuffle. The score is the integer surrogate (tf*N)//df — exact in
    any engine, so no float idf crosses the oracle boundary; ties
    break on term ascending."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(t: pa.Table) -> pd.DataFrame:
        counts: dict = {}
        for txt in t["text"].to_pylist():
            for term in set((txt or "").split()):
                counts[term] = counts.get(term, 0) + 1
        return pd.DataFrame({
            "term": pd.Series(list(counts), dtype="object"),
            "df": pd.Series(list(counts.values()), dtype="int64")})

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow")
              .groupby("term").sum("df").to_pandas())
    dfm = dict(zip(df_tbl["term"], df_tbl["sum(df)"]))
    n_docs = int(ds.count())
    ref = ray.put((dfm, n_docs))

    def topk(t: pa.Table) -> pd.DataFrame:
        dfm_, n = ray.get(ref)
        od, ot, os_, orank = [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            tf: dict = {}
            for term in (txt or "").split():
                tf[term] = tf.get(term, 0) + 1
            scored = sorted(((-((c * n) // dfm_[term]), term)
                             for term, c in tf.items()))[:k]
            for r, (neg, term) in enumerate(scored, 1):
                od.append(did)
                ot.append(term)
                os_.append(-neg)
                orank.append(r)
        return pd.DataFrame({
            "doc_id": pd.Series(od, dtype="int64"),
            "term": pd.Series(ot, dtype="object"),
            "score": pd.Series(os_, dtype="int64"),
            "rank": pd.Series(orank, dtype="int64")})

    return ds.map_batches(topk, batch_format="pyarrow")


DOC_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
r AS (
  SELECT tf.doc_id, tf.term, (tf.tf * n.n) // df.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY (tf.tf * n.n) // df.df DESC,
                                     tf.term) AS rank
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, score, rank FROM r WHERE rank <= 3
"""


def events_windows(sf_dir):
    """tumbling 1-hour windows per event_type: count + rounded sum."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h").astype(str)
        # integer milli-units: per-row rounding is engine-stable,
        # integer sums are order-independent
        df["value_milli"] = (df["value"] * 1000).round().astype("int64")
        g = df.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("value_milli", "size"), sum_value_milli=("value_milli", "sum"))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["window_start", "event_type"],
                       as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_milli=("sum_value_milli", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        g["sum_value_milli"] = g["sum_value_milli"].astype("int64")
        return g

    return _merge_partials(
        ds.map_batches(bucket, batch_format="pandas"), merge)


EVENTS_WINDOWS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       cast(sum(cast(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events GROUP BY 1, 2
"""


def latest_event_per_user(sf_dir):
    """latest-per-key (groupby.max_by shape; ties broken by event_id).
    Two-phase: per-batch winner per user (combiner), then per-bucket
    winner — winner-of-winners is exact, only one row per (batch,
    user) ever shuffles, and the groupby key is an int bucket, not one
    Ray group per user."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], ascending=False,
                            kind="mergesort").drop_duplicates("user_id")
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=False,
                          kind="mergesort").drop_duplicates("user_id")
        return g[["user_id", "event_id", "event_type"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_sessions(sf_dir):
    """gap-based sessionization (session = events of one user with
    < 30 min between consecutive events; the streaming-shaped
    windowing pattern: partition by key, sort by ts within group).
    Output: one row per session."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    GAP = pd.Timedelta(minutes=30)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # all events of each user co-located in this bucket; the gap
        # scan is vectorized across ALL users at once (groupby.diff),
        # never one Ray group (or one pandas frame) per user
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = g.groupby("user_id")["ts"].diff()
        sid = (d.isna() | (d > GAP)).cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        ).reset_index(drop=True)
        out["session_no"] = out.groupby("user_id").cumcount() + 1
        # explicit %f so zero-microsecond values still print 6 digits
        # (str(Timestamp) drops them; DuckDB strftime does not)
        out["start_ts"] = out["start_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        out["end_ts"] = out["end_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out[["user_id", "session_no", "n_events", "start_ts", "end_ts"]]

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(sessions, batch_format="pandas"))


EVENTS_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, cast(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts
FROM s GROUP BY user_id, session_no
"""


PATHS_TOPN = 5


def events_session_paths(sf_dir):
    """Clickstream path mining: the top-5 most frequent 3-step
    event-type paths WITHIN a session (the events_sessions 30-min-gap
    convention, same (ts, event_id) ordering) — the sequential-pattern
    complement of the funnel's fixed pattern.

    Scale shape: one user-bucketed exchange co-locates each user's
    events; inside the bucket the session split (groupby.diff) and
    the trigram shift are vectorized across all users at once, and
    the bucket emits only its bounded ≤ types³ path counts; the
    single merge block sums and takes the global top-5 (count desc,
    path asc). The SQL oracle replays sessionization with the shared
    lag/sum window recipe and trigrams as two rank self-joins."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    GAP = pd.Timedelta(minutes=30)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = g.groupby("user_id")["ts"].diff()
        sid = (d.isna() | (d > GAP)).cumsum().to_numpy()
        et = g["event_type"].to_numpy()
        ok = (sid[:-2] == sid[1:-1]) & (sid[1:-1] == sid[2:]) \
            if len(et) >= 3 else np.zeros(0, bool)
        a, b, c = et[:-2][ok], et[1:-1][ok], et[2:][ok]
        path = pd.Series([f"{x}>{y}>{z}" for x, y, z in zip(a, b, c)],
                         dtype="object")
        out = (pd.DataFrame({"path": path})
               .groupby("path", as_index=False).agg(n=("path", "size")))
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("path", as_index=False)["n"].sum()
               .sort_values(["n", "path"], ascending=[False, True],
                            kind="mergesort")
               .head(PATHS_TOPN).reset_index(drop=True))
        out["n"] = out["n"].astype("int64")
        return out

    partials = (ds.map_batches(add_bucket, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(paths, batch_format="pandas"))
    return _merge_partials(partials, final)


EVENTS_SESSION_PATHS_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, event_id, ts, event_type,
         sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS sid
  FROM o),
r AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM s),
tri AS (
  SELECT a.event_type || '>' || b.event_type || '>' || c.event_type
           AS path
  FROM r a
  JOIN r b ON b.user_id = a.user_id AND b.sid = a.sid
          AND b.rn = a.rn + 1
  JOIN r c ON c.user_id = a.user_id AND c.sid = a.sid
          AND c.rn = a.rn + 2)
SELECT path, count(*) AS n FROM tri
GROUP BY path ORDER BY n DESC, path ASC LIMIT %d
""" % PATHS_TOPN


def events_funnel(sf_dir):
    """Ordered conversion-funnel stage per user (view → click →
    purchase, each step strictly after the previous one's FIRST
    occurrence) — sequence-pattern matching, the windowing family's
    third shape next to sessions and as-of. All events of a user
    co-locate in one hash bucket; inside the bucket every step is
    vectorized across users at once (filter + groupby-min + map),
    never a per-user loop. Output: (user_id, funnel_stage 0-3)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        t1 = (g[g["event_type"] == "view"]
              .groupby("user_id")["ts"].min())
        g = g.assign(_t1=g["user_id"].map(t1))
        t2 = (g[(g["event_type"] == "click") & (g["ts"] > g["_t1"])]
              .groupby("user_id")["ts"].min())
        g = g.assign(_t2=g["user_id"].map(t2))
        t3 = (g[(g["event_type"] == "purchase") & (g["ts"] > g["_t2"])]
              .groupby("user_id")["ts"].min())
        users = pd.Index(g["user_id"].unique(), name="user_id")
        stage = (users.isin(t1.index).astype("int64")
                 + users.isin(t2.index)
                 + users.isin(t3.index))
        return pd.DataFrame({"user_id": users.to_numpy(),
                             "funnel_stage": stage})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(funnel, batch_format="pandas"))


EVENTS_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def events_retention(sf_dir):
    """Weekly cohort retention matrix: cohort = the ISO-epoch week of
    a user's FIRST event; a cell (cohort_week, week_offset) counts the
    users from that cohort active offset weeks later — the classic
    growth-analytics triangle. Scale shape: per-batch distinct
    (user, week) pairs (combiner), ONE user-bucketed exchange where
    each user's cohort and offsets are computed vectorized across all
    users in the bucket, then the bounded (weeks × weeks) cell counts
    merge in a single block. Week arithmetic is integer days-since-
    epoch // 7 — identical in pandas and DuckDB."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].to_numpy().astype("datetime64[D]")
                .astype("int64"))
        out = pd.DataFrame({"user_id": df["user_id"],
                            "wk": days // 7})
        out = out.drop_duplicates()
        out["_bucket"] = (out["user_id"] % 64).astype("int32")
        return out

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "wk"])
        cohort = g.groupby("user_id")["wk"].min()
        co = g["user_id"].map(cohort)
        out = pd.DataFrame({"cohort_week": co.astype("int64"),
                            "week_offset": (g["wk"] - co).astype("int64")})
        cnt = (out.groupby(["cohort_week", "week_offset"]).size()
               .reset_index(name="n_users"))
        cnt["n_users"] = cnt["n_users"].astype("int64")
        return cnt

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort_week", "week_offset"],
                       as_index=False)["n_users"].sum()
        g["n_users"] = g["n_users"].astype("int64")
        return g

    return _merge_partials(
        (ds.map_batches(pairs, batch_format="pandas")
         .groupby("_bucket").map_groups(cells, batch_format="pandas")),
        merge)


def events_markov_transitions(sf_dir):
    """Event-type transition matrix (Markov bigrams over each user's
    time-ordered stream — the behavioral statistic sequence models
    train on). All events of a user co-locate in one hash bucket; the
    transition scan is ONE vectorized shift over the bucket sorted by
    (user, ts, event_id) — never a per-user loop; the (from, to)
    counts are bounded by types² and merge in a single block."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = g["user_id"].shift() == g["user_id"]
        out = pd.DataFrame({"from_type": g["event_type"].shift()[same],
                            "to_type": g["event_type"][same]})
        cnt = (out.groupby(["from_type", "to_type"]).size()
               .reset_index(name="n"))
        cnt["n"] = cnt["n"].astype("int64")
        return cnt

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    return _merge_partials(
        (ds.map_batches(add_bucket, batch_format="pandas")
         .groupby("_bucket").map_groups(trans, batch_format="pandas")),
        merge)


DEBOUNCE_US = 300_000_000  # 300 s


def events_debounce(sf_dir):
    """Stream de-duplication (debounce): drop every event that repeats
    its user's immediately-preceding event's type within 300 s — the
    double-click / retry-storm collapse step run before any
    behavioral statistic. Raw-predecessor semantics (each event
    compares to the previous RAW event, the LAG-expressible
    convention), identical in both engines.

    Scale shape: all of a user's events co-locate in one hash bucket;
    the predecessor comparison is ONE vectorized shift over the
    bucket sorted by (user, ts, event_id) — the markov-transition
    discipline; survivors stream out, nothing aggregates."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same_user = (g["user_id"].shift() == g["user_id"]).to_numpy()
        same_type = (g["event_type"].shift() == g["event_type"]).to_numpy()
        close = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            close[1:] = (ts_us[1:] - ts_us[:-1]) <= DEBOUNCE_US
        drop = same_user & same_type & close
        out = g.loc[~drop, ["event_id", "user_id", "ts", "event_type"]]
        return out.reset_index(drop=True)

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(keep, batch_format="pandas"))


EVENTS_DEBOUNCE_SQL = """
WITH o AS (
  SELECT event_id, user_id, ts, event_type,
         lag(event_type) OVER w AS ptype,
         lag(ts) OVER w AS pts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, ts, event_type FROM o
WHERE ptype IS NULL OR ptype <> event_type
   OR date_diff('microsecond', pts, ts) > %d
""" % DEBOUNCE_US


EVENTS_MARKOV_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, count(*) AS n
FROM o WHERE prev IS NOT NULL GROUP BY from_type, to_type
"""


EVENTS_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events),
coh AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
SELECT c.cohort AS cohort_week, uw.wk - c.cohort AS week_offset,
       count(*) AS n_users
FROM uw JOIN coh c USING (user_id)
GROUP BY cohort_week, week_offset
"""


def events_cumulative_users(sf_dir):
    """Per-feature adoption curves: cumulative distinct users per
    (event_type, epoch day) — for each feature and day, how many
    distinct users have used that feature on or before that day.
    Running count-distinct is computed by FIRST-SEEN factoring:
    cumulative distinct ≡ cumulative sum of first-seen counts, so no
    unbounded distinct state ever exists — per-batch
    min-day-per-(type, user) combiner, ONE user-bucketed exchange
    computing each (type, user)'s global first day vectorized per
    bucket, bounded (≤ types × days) first-seen counts per bucket,
    single-block merge with an exact per-type integer cumulative sum.
    Day arithmetic is days-since-epoch (the events_retention
    convention at day grain, identical in pandas and DuckDB)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def firstday_partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].to_numpy().astype("datetime64[D]")
                .astype("int64"))
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "user_id": df["user_id"].to_numpy(),
                            "d": days})
        out = out.groupby(["event_type", "user_id"],
                          as_index=False)["d"].min()
        out["_bucket"] = (out["user_id"] % 64).astype("int32")
        return out

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby(["event_type", "user_id"],
                          as_index=False)["d"].min()
        c = (first.groupby(["event_type", "d"], as_index=False)
             .agg(n_new=("user_id", "size")))
        c["d"] = c["d"].astype("int64")
        c["n_new"] = c["n_new"].astype("int64")
        return c

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "d"], as_index=False)["n_new"]
             .sum().sort_values(["event_type", "d"])
             .reset_index(drop=True))
        g["d"] = g["d"].astype("int64")
        g["n_new"] = g["n_new"].astype("int64")
        g["cum_users"] = (g.groupby("event_type")["n_new"].cumsum()
                          .astype("int64"))
        return g

    partials = (ds.map_batches(firstday_partial, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(bucket_counts, batch_format="pandas"))
    return _merge_partials(partials, merge)


EVENTS_CUMULATIVE_SQL = """
WITH uw AS (
  SELECT event_type, user_id,
         min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS d
  FROM events GROUP BY event_type, user_id),
c AS (SELECT event_type, d, count(*) AS n_new FROM uw
      GROUP BY event_type, d)
SELECT event_type, d, n_new,
       CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY d)
            AS BIGINT) AS cum_users
FROM c ORDER BY event_type, d
"""


DECAY_CAP = 62  # 2^-63 of an int64 milli-unit is identically 0


def events_decayed_user_score(sf_dir):
    """Recency-weighted per-user engagement score with exponential
    day-grain decay: score(u) = Σ_e milli(value) >> age_days(e) —
    weight 2^(−age) realized as an arithmetic right shift so decay is
    EXACT integer floor arithmetic (no float exp crosses the oracle
    boundary), ages measured back from the corpus' max event day
    (data-derived ⇒ deterministic) and capped at 62 where an int64
    milli-unit is already 0. The sample-reweighting shape a
    freshness-weighted training-data mixer runs.

    Scale shape: pass 1 reduces the corpus to ONE integer (max day)
    via bounded partials; pass 2 computes each event's term map-side
    (zero shuffle, the reference day rides the task spec) with
    per-batch partial sums per user, then ONE user-bucketed exchange
    finalizes — raw events never cross an exchange."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def maxday(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].to_numpy().astype("datetime64[D]")
                .astype("int64"))
        return pd.DataFrame({"d": [int(days.max())]})

    ref_day = int(_merge_partials(
        ds.map_batches(maxday, batch_format="pandas"),
        lambda g: pd.DataFrame({"d": [int(g["d"].max())]})
    ).take(1)[0]["d"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].to_numpy().astype("datetime64[D]")
                .astype("int64"))
        age = np.minimum(ref_day - days, DECAY_CAP)
        # half-up at milli precision == SQL round() for positive values
        vm = np.floor(df["value"].to_numpy() * 1000.0 + 0.5) \
            .astype(np.int64)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                            "s": vm >> age})
        p = out.groupby("user_id", as_index=False)["s"].sum()
        p["_bucket"] = (p["user_id"] % 64).astype("int32")
        return p

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)["s"].sum()
        return pd.DataFrame({
            "user_id": out["user_id"].astype("int64"),
            "decayed_milli": out["s"].astype("int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(merge, batch_format="pandas"))


EVENTS_DECAYED_SQL = """
WITH ref AS (
  SELECT max(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
    AS rd FROM events),
e AS (
  SELECT user_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
         LEAST(rd - datediff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               %d) AS age
  FROM events, ref)
SELECT user_id, CAST(sum(vm >> age) AS BIGINT) AS decayed_milli
FROM e GROUP BY user_id
""" % DECAY_CAP


def events_trending_window(sf_dir):
    """Sliding-window trend detection: for each event_type, the
    3-day sliding window (RANGE semantics — gap days count as zero,
    the window is [d−2, d] in day VALUES, not in rows) with the
    highest event count; ties take the earliest window end. The
    burst-detection complement of ``events_windows``' tumbling
    aggregate — the shape a feed/monitoring surface runs over an
    append-only stream.

    Scale shape: per-batch partial (event_type, day) counts bound the
    partials at types × days rows regardless of input size, and the
    sliding window + argmax runs vectorized once in the single merge
    block (prefix sums + searchsorted per type — no per-day Python
    loop); no exchange ever carries raw events. Day arithmetic is
    days-since-epoch, identical in pandas and DuckDB."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (df["ts"].to_numpy().astype("datetime64[D]")
                .astype("int64"))
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "d": days})
        return out.groupby(["event_type", "d"], as_index=False).agg(
            n=("d", "size"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["event_type", "d"], as_index=False)["n"].sum()
             .sort_values(["event_type", "d"]).reset_index(drop=True))
        rows = []
        for et, g in c.groupby("event_type", sort=True):
            days = g["d"].to_numpy()
            cum = np.concatenate(([0], np.cumsum(g["n"].to_numpy())))
            lo = np.searchsorted(days, days - 2, side="left")
            w = cum[1:] - cum[lo]
            best = np.lexsort((days, -w))[0]
            rows.append((et, int(days[best]), int(w[best])))
        return pd.DataFrame(rows, columns=["event_type", "d", "w_count"]) \
            .astype({"d": "int64", "w_count": "int64"})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pandas"), merge)


EVENTS_TRENDING_SQL = """
WITH c AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         count(*) AS n
  FROM events GROUP BY event_type, d),
w AS (
  SELECT event_type, CAST(d AS BIGINT) AS d,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
              RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS w_count
  FROM c)
SELECT event_type, d, w_count FROM w
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY w_count DESC, d ASC) = 1
ORDER BY event_type
"""


def events_asof_click_view(sf_dir):
    """as-of join (Ray Data has no native one — composed per the
    brief): each click event picks the most recent view event of the
    same user at or before the click. (user_id, ts) is unique in the
    corpus, so the winner is deterministic. DuckDB's ASOF JOIN is the
    oracle."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def of_type(et):
        def flt(t: pa.Table) -> pa.Table:
            return (t.filter(pc.equal(t["event_type"], et))
                    .select(["event_id", "ts", "user_id"]))
        return flt

    clicks = ev.map_batches(of_type("click"), batch_format="pyarrow")
    views = ev.map_batches(of_type("view"), batch_format="pyarrow")
    out = asof_join(clicks, views, on="ts", by="user_id", how="inner")

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="int64"),
                "click_ts": pd.Series(dtype="object"),
                "view_id": pd.Series(dtype="int64"),
                "view_ts": pd.Series(dtype="object")})
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "click_id": df["event_id"].astype("int64"),
            "click_ts": df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "view_id": df["event_id_r"].astype("int64"),
            "view_ts": df["ts_r"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")})

    return out.map_batches(shape, batch_format="pandas")


EVENTS_ASOF_SQL = """
SELECT c.user_id AS user_id, c.event_id AS click_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       v.event_id AS view_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def events_range_pairs(sf_dir):
    """band/range self-join: ordered event pairs of the same user
    within 60 seconds (sorted two-pointer per bucket, never a cross
    product)."""
    from ..stages.joins import range_join_pairs

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = range_join_pairs(ev, on="ts", by="user_id",
                           window=pd.Timedelta(seconds=60))

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "key_a" not in df.columns:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_id_a": pd.Series(dtype="int64"),
                "event_id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id_a": df["key_a"].astype("int64"),
            "event_id_b": df["key_b"].astype("int64")})

    return out.map_batches(shape, batch_format="pandas")


EVENTS_RANGE_SQL = """
SELECT e1.user_id AS user_id, e1.event_id AS event_id_a,
       e2.event_id AS event_id_b
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
"""


def user_event_pivot(sf_dir):
    """facet pivot shape: per user, count per event_type (wide).
    Two-phase partial pivot (vectorized pivot_table per batch) + one
    bucket groupby summing partials — sums of partial counts are exact."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    ncols = ["n_" + et for et in EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="user_id", columns="event_type",
                             values="event_type", aggfunc="size",
                             fill_value=0)
        piv = piv.reindex(columns=list(EVENT_TYPES), fill_value=0)
        piv.columns = ncols
        piv = piv.astype("int64").reset_index()
        piv["_bucket"] = (piv["user_id"] % 64).astype("int32")
        return piv

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)[ncols].sum()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


USER_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def events_type_stats(sf_dir):
    """count-distinct after local dedup combiner (stats semantics)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def cd(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users": [int(g["user_id"].nunique())],
        })

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("event_type").map_groups(cd, batch_format="pandas"))


EVENTS_TYPE_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def brand_revenue(sf_dir):
    """TPC-H Q9-flavored profit rollup exercising the part dimension:
    lineitem ⋈ part on partkey (NEITHER side broadcast — the part
    table is the mid-size dimension that outgrows a ray.put dict long
    before lineitem does, so both travel joins.bucket_join), revenue
    in per-row-rounded integer cents (the q1 discipline) aggregated
    per p_brand with a per-batch combiner before one tiny grouped
    merge. Reads prune to 3 + 2 columns."""
    from ..stages.joins import bucket_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def cents(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        c = pc.round(pc.multiply(disc, pa.scalar(100.0)),
                     round_mode="half_towards_infinity")
        return pa.table({"l_partkey": t["l_partkey"],
                         "cents": pc.cast(c, pa.int64())})

    joined = bucket_join(li.map_batches(cents, batch_format="pyarrow"),
                         part, left_on="l_partkey",
                         right_on="p_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", as_index=False).agg(
            revenue_cents=("cents", "sum"), n_items=("cents", "size"))
        g["revenue_cents"] = g["revenue_cents"].astype("int64")
        g["n_items"] = g["n_items"].astype("int64")
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("p_brand", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("n_items", "sum"))
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        return out

    return _merge_partials(
        joined.map_batches(partial, batch_format="pandas"), merge)


BRAND_REVENUE_SQL = """
SELECT p.p_brand,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""


def segment_order_revenue(sf_dir):
    """TPC-H Q3-shaped 3-table pipeline: BUILDING-segment customers ⋈
    pre-1998 orders ⋈ lineitem, revenue per order in integer cents.
    Join strategy by side size: the FILTERED customer key set gates
    orders via joins.membership_join (semi mode — broadcast set under
    the threshold, Bloom-prefilter + exact recheck above it, so the
    same code survives 10^9 customers); orders⋈lineitem is the
    large×large leg (bucket_join, neither side broadcast); filters
    applied AT THE READ side before any exchange. Top-level rollup is
    per o_orderkey — merged by the combiner-then-merge discipline."""
    from ..stages.joins import bucket_join, membership_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])

    def keys_only(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return f.select(["c_custkey"])

    building = cust.map_batches(keys_only, batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        dates = t["o_orderdate"].to_numpy()
        m = pa.array(dates < np.datetime64("1998-01-01"))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = membership_join(
        orders.map_batches(date_filter, batch_format="pyarrow"),
        "o_custkey", building, keys_col="c_custkey",
        mode="semi").select_columns(["o_orderkey"])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        c = pc.round(pc.multiply(disc, pa.scalar(100.0)),
                     round_mode="half_towards_infinity")
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": pc.cast(c, pa.int64())})

    joined = bucket_join(
        li.map_batches(cents, batch_format="pyarrow"),
        orders, left_on="l_orderkey", right_on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue_cents=("cents", "sum"))
        g["revenue_cents"] = g["revenue_cents"].astype("int64")
        return g.rename(columns={"l_orderkey": "o_orderkey"})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return _merge_partials(
        joined.map_batches(partial, batch_format="pandas"), merge)


SEGMENT_REVENUE_SQL = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '1998-01-01'
GROUP BY l.l_orderkey
"""


def doc_rank_in_source(sf_dir):
    """Distributed window ranking: row_number() per source partition,
    ordered by (n_chars DESC, doc_id ASC) — the full-ranking
    counterpart of top_docs_per_source's top-k. ONE source-hash
    bucketed exchange; the rank is a vectorized per-bucket groupby
    cumcount. SQL window oracle."""
    from ..stages.dedup import _bucket_of

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df["source"], 64)
        return df

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        out = pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "source": g["source"].astype("object"),
            "rnk": (g.groupby("source").cumcount() + 1).astype("int64"),
        })
        return out

    return (ds.map_batches(prep, batch_format="pandas")
            .groupby("_bucket").map_groups(rank, batch_format="pandas"))


DOC_RANK_SQL = """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source
                          ORDER BY n_chars DESC, doc_id ASC) AS rnk
FROM documents
"""


def orders_running_total(sf_dir):
    """Distributed prefix aggregate: per-customer running total of
    order value (integer cents, per-row half-away-from-zero rounding)
    in (o_orderdate, o_orderkey) order — the cumulative-window shape
    (sum OVER ... ROWS UNBOUNDED PRECEDING). ONE custkey-bucketed
    exchange; the cumsum is one vectorized groupby pass per bucket."""
    from ..stages.dedup import _bucket_of

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        c = pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity")
        df = pd.DataFrame({
            "o_orderkey": t["o_orderkey"].to_numpy(),
            "o_custkey": t["o_custkey"].to_numpy(),
            "o_orderdate": t["o_orderdate"].to_numpy(),
            "cents": pc.cast(c, pa.int64()).to_numpy(),
        })
        df["_bucket"] = _bucket_of(df["o_custkey"], 64)
        return df

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_custkey": g["o_custkey"].astype("int64"),
            "running_cents": g.groupby("o_custkey")["cents"].cumsum()
            .astype("int64"),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket").map_groups(cum, batch_format="pandas"))


ORDERS_RUNNING_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_cents
FROM orders
"""


def orders_rollup(sf_dir):
    """GROUPING-SETS rollup (year × priority → year → grand total) in
    ONE pass: the finest-grain cells are a bounded partial aggregate
    (years × 5 priorities), so every coarser level is derived from the
    merged cells locally — zero extra passes over the data, zero extra
    exchanges. Sentinels (-1 / 'ALL') stand in for SQL's rolled-up
    NULLs so the column types stay concrete."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity")
        df = pd.DataFrame({
            "o_year": pc.year(t["o_orderdate"]).to_numpy().astype("int64"),
            "o_orderpriority": t["o_orderpriority"].to_pandas(),
            "cents": pc.cast(c, pa.int64()).to_numpy(),
        })
        g = df.groupby(["o_year", "o_orderpriority"], as_index=False).agg(
            revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["o_year", "o_orderpriority"]
        fine = df.groupby(keys, as_index=False)[
            ["revenue_cents", "n_orders"]].sum()
        by_year = fine.groupby("o_year", as_index=False)[
            ["revenue_cents", "n_orders"]].sum()
        by_year["o_orderpriority"] = "ALL"
        total = pd.DataFrame({
            "o_year": [-1], "o_orderpriority": ["ALL"],
            "revenue_cents": [fine["revenue_cents"].sum()],
            "n_orders": [fine["n_orders"].sum()],
        })
        out = pd.concat([fine, by_year[fine.columns], total[fine.columns]],
                        ignore_index=True)
        out["o_year"] = out["o_year"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(y, -1) AS o_year,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
GROUP BY ROLLUP(y, o_orderpriority)
"""


def lineitem_corr_components(sf_dir):
    """Exact distributed bivariate statistics: the five raw moments of
    (quantity, discount%) per returnflag as INTEGER sums, plus the
    integer covariance / variance numerators (n·Σxy − Σx·Σy etc.) that
    determine Pearson's r without any float accumulation. One bounded
    partial per batch, one vectorized merge — the numerically-stable
    way to compute correlations over 100 TB (float second moments lose
    digits; integer moments are exact and associative)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        d = pc.cast(
            pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy()
        df = pd.DataFrame({"l_returnflag": t["l_returnflag"].to_pandas(),
                           "q": q, "d": d, "qq": q * q, "dd": d * d,
                           "qd": q * d})
        g = df.groupby("l_returnflag", as_index=False).agg(
            n=("q", "size"), sum_q=("q", "sum"), sum_d=("d", "sum"),
            sum_qq=("qq", "sum"), sum_dd=("dd", "sum"),
            sum_qd=("qd", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", as_index=False).sum()
        for c in ("n", "sum_q", "sum_d", "sum_qq", "sum_dd", "sum_qd"):
            g[c] = g[c].astype("int64")
        g["cov_num"] = g["n"] * g["sum_qd"] - g["sum_q"] * g["sum_d"]
        g["var_q_num"] = g["n"] * g["sum_qq"] - g["sum_q"] ** 2
        g["var_d_num"] = g["n"] * g["sum_dd"] - g["sum_d"] ** 2
        return g

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


LINEITEM_CORR_SQL = """
WITH x AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
), m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sum_q,
         CAST(sum(d) AS BIGINT) AS sum_d,
         CAST(sum(q * q) AS BIGINT) AS sum_qq,
         CAST(sum(d * d) AS BIGINT) AS sum_dd,
         CAST(sum(q * d) AS BIGINT) AS sum_qd
  FROM x GROUP BY l_returnflag
)
SELECT l_returnflag, n, sum_q, sum_d, sum_qq, sum_dd, sum_qd,
       n * sum_qd - sum_q * sum_d AS cov_num,
       n * sum_qq - sum_q * sum_q AS var_q_num,
       n * sum_dd - sum_d * sum_d AS var_d_num
FROM m
"""


def events_props_agg(sf_dir):
    """Semi-structured extraction + aggregation: the events table's
    ``props`` column is a JSON payload (schema-on-read, the
    Common-Crawl metadata shape); parse it INSIDE map_batches (one
    json.loads per row, stdlib — no shuffle touches the raw JSON),
    project the typed field, then a two-phase integer aggregate per
    event_type. SQL oracle extracts the same field with
    json_extract."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pd.DataFrame:
        import json

        ks = [int(json.loads(p or "{}").get("k", 0))
              for p in t["props"].to_pylist()]
        out = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "k": pd.Series(ks, dtype="int64"),
        })
        # local combiner: one partial row per (batch, type)
        return out.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": [int(g["n"].sum())],
            "sum_k": [int(g["sum_k"].sum())],
            "max_k": [int(g["max_k"].max())],
        })

    return (ds.map_batches(extract, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge,
                                              batch_format="pandas"))


EVENTS_PROPS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def anti_join_empty_orders(sf_dir, force_bloom: bool = False):
    """skeleton-repo anti-join (objects minus subjects shape,
    skeleton.py:111-120): orders with no lineitems — broadcast the
    distinct orderkey set when it fits; above the threshold (or with
    ``force_bloom``) the Bloom-prefilter + exact-recheck path of
    ``joins.membership_join`` takes over with identical results."""
    from ..stages.joins import membership_join

    keys_ds = (_read(sf_dir, "lineitem", columns=["l_orderkey"])
               .groupby("l_orderkey").count())
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    return membership_join(orders, "o_orderkey", keys_ds, "l_orderkey",
                           mode="anti", force_bloom=force_bloom)


ANTI_JOIN_SQL = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
"""


def q13_custdist(sf_dir):
    """TPC-H Q13 shape — customer distribution by (urgent-)order
    count, INCLUDING the zero-order customers a plain inner join
    loses: per-custkey counts are a combiner + one bucketed merge;
    the zero side is customers anti-joined (joins.membership_join —
    broadcast under threshold, Bloom + exact recheck above) against
    the counted key set; the final (c_count, custdist) histogram has
    bounded cardinality and merges in one block."""
    from ..stages.joins import membership_join

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        return (t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                .select(["o_custkey"]))

    urgent_orders = orders.map_batches(urgent, batch_format="pyarrow")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey").size().reset_index(name="c_count")
        g["c_count"] = g["c_count"].astype("int64")
        g["_bucket"] = (g["o_custkey"] % 64).astype("int32")
        return g

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False)["c_count"].sum()
        out["c_count"] = out["c_count"].astype("int64")
        return out

    counts = (urgent_orders.map_batches(part, batch_format="pandas")
              .groupby("_bucket").map_groups(merge_counts,
                                             batch_format="pandas"))

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    zeros = membership_join(
        cust, "c_custkey",
        counts.map_batches(lambda df: df[["o_custkey"]],
                           batch_format="pandas"),
        "o_custkey", mode="anti")

    def hist_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_count").size().reset_index(name="custdist")
        g["custdist"] = g["custdist"].astype("int64")
        return g

    def hist_zero(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "c_count": pd.Series([0] * min(1, t.num_rows), dtype="int64"),
            "custdist": pd.Series([t.num_rows] * min(1, t.num_rows),
                                  dtype="int64")})

    def merge_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_count", as_index=False)["custdist"].sum()
        for c in ("c_count", "custdist"):
            g[c] = g[c].astype("int64")
        return g

    partials = (counts.map_batches(hist_counts, batch_format="pandas")
                .union(zeros.map_batches(hist_zero,
                                         batch_format="pyarrow")))
    return _merge_partials(partials, merge_hist)


Q13_CUSTDIST_SQL = """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o
       ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  GROUP BY c.c_custkey)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
"""


Q15_START, Q15_END = "1995-01-01", "1995-04-01"


def q15_top_supplier(sf_dir):
    """TPC-H Q15 shape — the top supplier(s) by revenue in a fixed
    3-month shipdate window, ties kept (the HAVING revenue = MAX
    semantics). Revenue partials are integer cents combined per batch;
    the per-supplier merge, the global max, and the tie filter all
    happen in ONE coalesced block (suppliers are a bounded dimension);
    supplier names resolve AFTER the tie filter via
    ``joins.resolve_keys`` — the k winning keys stream-filter the
    supplier table map-side, so neither lineitem nor the supplier
    dimension ever materializes on the driver."""
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    lo = np.datetime64(Q15_START)
    hi = np.datetime64(Q15_END)

    def part(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        sd = df["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        df = df[m]
        cents = np.round(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0).astype("int64")
        out = pd.DataFrame({"l_suppkey": df["l_suppkey"],
                            "rev": cents})
        return out.groupby("l_suppkey", as_index=False)["rev"].sum()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", as_index=False)["rev"].sum()
        g["rev"] = g["rev"].astype("int64")
        top = g[g["rev"] == g["rev"].max()].copy()
        top["l_suppkey"] = top["l_suppkey"].astype("int64")
        return (top.rename(columns={"l_suppkey": "s_suppkey",
                                    "rev": "total_revenue_cents"})
                [["s_suppkey", "total_revenue_cents"]])

    top = _merge_partials(
        li.map_batches(part, batch_format="pyarrow"), merge).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", top["s_suppkey"], "s_name")
    top["s_name"] = top["s_suppkey"].map(names).astype(object)
    return top[["s_suppkey", "s_name", "total_revenue_cents"]]


Q15_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '%s' AND l_shipdate < DATE '%s'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
""" % (Q15_START, Q15_END)


def priority_lineitems(sf_dir):
    """Large×large hash-equi-join (TPC-H Q12 shape): lineitem ⋈ orders
    on orderkey via the bucketed exchange join (``joins.bucket_join``
    — NEITHER side broadcast, both sides shuffle once by key hash),
    then per-batch partials merged over the 5 bounded priority keys.
    Per-row integer cents before the join so only fixed-width columns
    cross the exchange and sums are order-independent."""
    from ..stages.joins import bucket_join

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t["l_extendedprice"],
                                     pa.scalar(100.0)),
                         round_mode="half_towards_infinity")
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": pc.cast(cents, pa.int64())})

    li = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice"])
          .map_batches(to_cents, batch_format="pyarrow"))
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority"])
    joined = bucket_join(li, od, left_on="l_orderkey",
                         right_on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_lines=("cents", "size"), price_cents=("cents", "sum"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_lines=("n_lines", "sum"), price_cents=("price_cents", "sum"))
        g["n_lines"] = g["n_lines"].astype("int64")
        g["price_cents"] = g["price_cents"].astype("int64")
        return g

    return _merge_partials(
        joined.map_batches(partial, batch_format="pandas"), merge)


PRIORITY_LINEITEMS_SQL = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


Q18_MIN_QTY = 250  # sum(l_quantity) threshold — top ~1-2% of orders


def q18_large_orders(sf_dir):
    """TPC-H Q18 shape (large-volume customers): GROUP-HAVING on the
    fact table's unbounded key (per-order quantity sum > threshold)
    followed by a JOIN-BACK to the order/customer detail rows — the
    canonical "aggregate, filter, rehydrate" pattern a plain groupby
    can't express in one pass.

    Scale shape: lineitem reduces per batch to (okey, qty) partial
    sums — a lossless combiner, so only one narrow row per
    (batch, order) reaches the exchange; orders rows ride the SAME
    orderkey-hash-bucketed exchange tagged (the q3/q5 single-exchange
    discipline), so each bucket holds every qty partial AND the
    detail row of its orderkeys and can finalize the HAVING, the
    join-back, and its LOCAL top-100 — exact because an order lives
    in exactly one bucket. Customer names resolve AFTER the global
    top-100 via ``joins.resolve_keys`` (<=100 keys stream-filter the
    customer table; no whole-dimension driver collect at 10^9
    customers). Integer quantity units + cents keep both engines
    bit-equal."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "qty", "ckey", "cents", "odate_us", "_bucket",
            "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "qty": qty.to_numpy()})
        p = df.groupby("okey", as_index=False)["qty"].sum()
        p["qty"] = p["qty"].astype("int64")
        p["ckey"] = np.int64(-1)
        p["cents"] = np.int64(0)
        p["odate_us"] = np.int64(0)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        p = pd.DataFrame({
            "okey": t["o_orderkey"].to_numpy(),
            "qty": np.zeros(t.num_rows, np.int64),
            "ckey": t["o_custkey"].to_numpy(),
            "cents": cents.to_numpy(),
            "odate_us": t["o_orderdate"].to_numpy()
                         .astype("datetime64[us]").astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0]
        sums = li_.groupby("okey", as_index=False)["qty"].sum()
        sums = sums[sums["qty"] > Q18_MIN_QTY]
        od_ = g[g["_side"] == 1][["okey", "ckey", "cents", "odate_us"]]
        j = sums.merge(od_, on="okey", how="inner")
        j = j.sort_values(["cents", "odate_us", "okey"],
                          ascending=[False, True, True]).head(100)
        for c in ("okey", "qty", "ckey", "cents", "odate_us"):
            j[c] = j[c].astype("int64")
        return j[["okey", "qty", "ckey", "cents", "odate_us"]]

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_quantity"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderdate"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_od, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_top, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = (df.sort_values(["cents", "odate_us", "okey"],
                              ascending=[False, True, True])
               .head(100).reset_index(drop=True))
        for c in ("okey", "qty", "ckey", "cents", "odate_us"):
            top[c] = top[c].astype("int64")
        return top

    top = _merge_partials(per_bucket, final).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        "c_custkey", top["ckey"], "c_name")
    return pd.DataFrame({
        "c_name": top["ckey"].map(names).astype(object),
        "c_custkey": top["ckey"].astype("int64"),
        "o_orderkey": top["okey"].astype("int64"),
        "o_orderdate": top["odate_us"].astype("datetime64[us]"),
        "total_cents": top["cents"].astype("int64"),
        "sum_qty": top["qty"].astype("int64")})


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty > %d)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_cents DESC, o.o_orderdate ASC, o.o_orderkey ASC
LIMIT 100
""" % Q18_MIN_QTY


Q4_LATE_DAYS = 60


def q4_late_orders(sf_dir):
    """TPC-H Q4 shape (order-priority checking): count orders by
    priority where EXISTS a lineitem shipped more than N days after
    the order date — a large×large EXISTS semi-join whose predicate
    correlates the two sides (shipdate vs orderdate).

    Scale shape: EXISTS(any lineitem with shipdate > orderdate + N)
    ≡ max(shipdate) > orderdate + N, and max is a lossless per-batch
    combiner — so lineitem reduces to one (okey, max_ship) row per
    (batch, order) before the single orderkey-bucketed tagged
    exchange (q3/q5/q18 discipline). Each bucket finalizes the max,
    applies the correlated predicate against its order rows, and
    emits bounded per-priority count partials; the 5-row histogram
    merges in one block. All-integer µs timestamps keep the
    comparison exact."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "ship_us", "odate_us", "prio", "_bucket", "_side"]
    late_us = np.int64(Q4_LATE_DAYS) * 86_400_000_000

    def prep_li(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(),
            "ship_us": t["l_shipdate"].to_numpy()
                        .astype("datetime64[us]").astype(np.int64)})
        p = df.groupby("okey", as_index=False)["ship_us"].max()
        p["ship_us"] = p["ship_us"].astype("int64")
        p["odate_us"] = np.int64(0)
        p["prio"] = ""
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "okey": t["o_orderkey"].to_numpy(),
            "ship_us": np.zeros(t.num_rows, np.int64),
            "odate_us": t["o_orderdate"].to_numpy()
                         .astype("datetime64[us]").astype(np.int64),
            "prio": t["o_orderpriority"].to_pandas().astype(object)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0][["okey", "ship_us"]]
        mx = li_.groupby("okey", as_index=False)["ship_us"].max()
        od_ = g[g["_side"] == 1][["okey", "odate_us", "prio"]]
        j = od_.merge(mx, on="okey", how="inner")
        j = j[(j["ship_us"].to_numpy()
               > j["odate_us"].to_numpy() + late_us)]
        out = j.groupby("prio", as_index=False).size()
        return pd.DataFrame({
            "o_orderpriority": out["prio"].astype(object),
            "order_count": out["size"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate",
                        "o_orderpriority"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_od, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_counts, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("o_orderpriority", as_index=False)
               ["order_count"].sum()
               .sort_values("o_orderpriority").reset_index(drop=True))
        out["order_count"] = out["order_count"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL %d DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""" % Q4_LATE_DAYS


def q17_small_qty_revenue(sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): total revenue
    of lineitems whose quantity is below 20%% of their part's average
    quantity — a large table SELF-JOINED against its own per-group
    aggregate (the correlated-scalar-subquery shape; Q18 filters the
    group, this filters the DETAIL rows against the group).

    Scale shape: the predicate depends on the row only through
    (partkey, qty), so each batch pre-reduces to ((partkey, qty) →
    row count + cents sum) — a lossless combiner — before ONE
    partkey-hash-bucketed exchange; a part's whole distribution lives
    in one bucket, which recovers sum/count per part vectorized,
    applies the EXACT cross-multiplied predicate 5·qty·n < Σqty (no
    float avg crosses an engine boundary), and emits a single cents
    partial; bounded partials coalesce in one block."""
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def part(t: pa.Table) -> pd.DataFrame:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "qty": qty, "cents": cents})
        out = df.groupby(["pkey", "qty"], as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(out["pkey"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["pkey", "qty"], as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))
        # Σqty per part = Σ qty·n over its (qty → n) histogram
        tot = (g.assign(qn=g["qty"] * g["n"])
               .groupby("pkey", as_index=False)
               .agg(s=("qn", "sum"), n_all=("n", "sum")))
        j = g.merge(tot, on="pkey")
        keep = 5 * j["qty"] * j["n_all"] < j["s"]
        return pd.DataFrame(
            {"revenue_cents": [int(j.loc[keep, "cents"].sum())]})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    per_bucket = (li.map_batches(part, batch_format="pyarrow")
                  .groupby("_bucket").map_groups(bucket_sum,
                                                 batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"revenue_cents": pd.Series([df["revenue_cents"].sum()],
                                        dtype="int64")})

    return _merge_partials(per_bucket, final)


Q17_SQL = """
WITH a AS (
  SELECT l_partkey,
         sum(CAST(round(l_quantity) AS BIGINT)) AS s,
         count(*) AS n
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)),
            0) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * a.n < a.s
"""


def q22_idle_rich_customers(sf_dir):
    """TPC-H Q22 shape (global-account-balance anti-join): customers
    whose balance exceeds the positive-balance AVERAGE and who placed
    no urgent order, grouped by market segment — a SCALAR-subquery
    broadcast (two integers) feeding a map-side filter, then an
    anti-join, then a bounded rollup.

    Scale shape: the average never exists as a float — pass 1 reduces
    the customer table to (Σ positive cents, n) via a bounded
    combiner, and the filter is the exact cross-multiplication
    bal·n > Σ closed over the two broadcast integers (zero-shuffle);
    the no-urgent-orders side goes through joins.membership_join
    (broadcast key set under threshold, Bloom + exact recheck above —
    the q13 discipline); the segment rollup is bounded."""
    from ..stages.joins import membership_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def cents_tbl(t: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(t["c_acctbal"],
                                           pa.scalar(100.0)),
                               round_mode="half_towards_infinity"),
                      pa.int64())
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "bal": bal})

    cc = cust.map_batches(cents_tbl, batch_format="pyarrow")

    def stat_part(t: pa.Table) -> pd.DataFrame:
        bal = t["bal"].to_numpy()
        pos = bal[bal > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    def stat_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["s"].sum())],
                             "n": [int(df["n"].sum())]})

    st = _merge_partials(cc.map_batches(stat_part,
                                        batch_format="pyarrow"),
                         stat_merge).take_all()[0]
    s_pos, n_pos = int(st["s"]), int(st["n"])

    rich = cc.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["bal"],
                                                  pa.scalar(n_pos)),
                                      pa.scalar(s_pos))),
        batch_format="pyarrow")

    urgent = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: (t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_custkey"])),
        batch_format="pyarrow")
    idle_rich = membership_join(rich, "c_custkey", urgent, "o_custkey",
                                mode="anti")

    def seg_part(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"c_mktsegment": t["c_mktsegment"].to_pandas(),
                           "bal": t["bal"].to_numpy()})
        out = df.groupby("c_mktsegment", as_index=False).agg(
            n_custs=("bal", "size"), bal_cents=("bal", "sum"))
        out["n_custs"] = out["n_custs"].astype("int64")
        out["bal_cents"] = out["bal_cents"].astype("int64")
        return out

    def seg_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c_mktsegment", as_index=False).agg(
            n_custs=("n_custs", "sum"), bal_cents=("bal_cents", "sum"))
        out["n_custs"] = out["n_custs"].astype("int64")
        out["bal_cents"] = out["bal_cents"].astype("int64")
        return out

    return _merge_partials(
        idle_rich.map_batches(seg_part, batch_format="pyarrow"),
        seg_merge)


Q22_SQL = """
WITH cents AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer),
avgpos AS (SELECT sum(bal) AS s, count(*) AS n FROM cents WHERE bal > 0)
SELECT c_mktsegment, count(*) AS n_custs,
       CAST(sum(bal) AS BIGINT) AS bal_cents
FROM cents c, avgpos a
WHERE c.bal * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


Q21_LATE_DAYS = 60


def q21_blame_supplier(sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished orders involving ≥2 distinct suppliers where EXACTLY ONE
    supplier shipped late, blame that supplier — the triple
    EXISTS / NOT-EXISTS self-correlation on one fact table
    (reference shape: TPC-H 21; restated on this schema's columns as
    late := max(l_shipdate) per (order, supplier) > o_orderdate + N
    days, since the testdata carries no receipt/commit dates).

    Scale shape: "supplier was late on order o" depends on lineitem
    only through max(l_shipdate) per (okey, skey) — max is a lossless
    per-batch combiner, so lineitem reduces to one narrow row per
    (batch, order, supplier) before ONE orderkey-hash-bucketed tagged
    exchange (the q3/q4/q18 discipline); 'F' order rows ride the same
    exchange. An order's complete supplier set lives in exactly one
    bucket, so each bucket evaluates the whole correlated predicate
    (n_supp ≥ 2 ∧ n_late == 1 ∧ this supplier late) vectorized and
    emits bounded (suppkey → numwait) count partials. The final merge
    keeps only the CANDIDATE set — suppliers whose numwait ties or
    beats the 20th largest (s_name is the tie-break, so ties must
    survive to the name resolution) — and ``joins.resolve_keys``
    stream-filters the supplier table for just those keys; the
    dimension never collects to the driver."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "skey", "ship_us", "odate_us", "_bucket", "_side"]
    late_us = np.int64(Q21_LATE_DAYS) * 86_400_000_000

    def prep_li(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(),
            "skey": t["l_suppkey"].to_numpy(),
            "ship_us": t["l_shipdate"].to_numpy()
                        .astype("datetime64[us]").astype(np.int64)})
        p = df.groupby(["okey", "skey"], as_index=False)["ship_us"].max()
        for c in ("okey", "skey", "ship_us"):
            p[c] = p[c].astype("int64")
        p["odate_us"] = np.int64(0)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        p = pd.DataFrame({
            "okey": t["o_orderkey"].to_numpy(),
            "skey": np.zeros(t.num_rows, np.int64),
            "ship_us": np.zeros(t.num_rows, np.int64),
            "odate_us": t["o_orderdate"].to_numpy()
                         .astype("datetime64[us]").astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_blame(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0]
        mx = li_.groupby(["okey", "skey"],
                         as_index=False)["ship_us"].max()
        od_ = g[g["_side"] == 1][["okey", "odate_us"]]
        j = mx.merge(od_, on="okey", how="inner")
        j["late"] = (j["ship_us"].to_numpy()
                     > j["odate_us"].to_numpy() + late_us).astype(np.int64)
        per_o = j.groupby("okey").agg(n_supp=("skey", "size"),
                                      n_late=("late", "sum"))
        ok = per_o.index[(per_o["n_supp"] >= 2)
                         & (per_o["n_late"] == 1)]
        w = j[j["okey"].isin(ok) & (j["late"] == 1)]
        out = w.groupby("skey", as_index=False).size()
        return pd.DataFrame({"skey": out["skey"].astype("int64"),
                             "numwait": out["size"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_orderdate"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_od, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_blame, batch_format="pandas"))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("skey", as_index=False)["numwait"].sum()
        agg = agg.sort_values("numwait", ascending=False)
        if len(agg) > 20:
            thresh = agg["numwait"].iloc[19]
            agg = agg[agg["numwait"] >= thresh]
        agg = agg.reset_index(drop=True)
        agg["skey"] = agg["skey"].astype("int64")
        agg["numwait"] = agg["numwait"].astype("int64")
        return agg[["skey", "numwait"]]

    cand = _merge_partials(per_bucket, candidates).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", cand["skey"], "s_name")
    cand["s_name"] = cand["skey"].map(names).astype(object)
    cand = (cand.sort_values(["numwait", "s_name"],
                             ascending=[False, True])
            .head(20).reset_index(drop=True))
    return pd.DataFrame({
        "s_name": cand["s_name"].astype(object),
        "numwait": cand["numwait"].astype("int64")})


Q21_SQL = """
WITH l AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey, max(l_shipdate) AS mx
  FROM lineitem GROUP BY 1, 2),
j AS (
  SELECT l.okey, l.skey,
         CASE WHEN l.mx > o.o_orderdate + INTERVAL %d DAY
              THEN 1 ELSE 0 END AS late
  FROM l JOIN orders o ON o.o_orderkey = l.okey
  WHERE o.o_orderstatus = 'F'),
g AS (SELECT okey, count(*) AS n_supp, sum(late) AS n_late
      FROM j GROUP BY okey)
SELECT s.s_name, count(*) AS numwait
FROM j JOIN g USING (okey) JOIN supplier s ON s.s_suppkey = j.skey
WHERE g.n_supp >= 2 AND g.n_late = 1 AND j.late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""" % Q21_LATE_DAYS


Q11_SHARE_NUM, Q11_SHARE_DEN = 12, 10  # keep parts > 1.2× avg revenue


def q11_important_parts(sf_dir):
    """TPC-H Q11 shape (important stock): per-part revenue HAVING a
    threshold that is itself a GLOBAL aggregate of the same groupby —
    the "filter groups against a scalar computed over all groups"
    pattern (reference shape: TPC-H 11; restated over lineitem since
    the testdata has no partsupp — threshold = 1.2× the average
    per-part revenue, which is non-degenerate on this corpus where a
    fixed global fraction is all-or-nothing).

    Scale shape: per-batch (partkey → cents) partial sums (lossless
    combiner) feed ONE partkey-hash-bucketed exchange that finalizes
    exact per-part revenues; that per-part table — the inherently
    small output of the aggregate — materializes ONCE and is consumed
    twice: a bounded two-integer pass (Σcents, n_parts) broadcasts the
    threshold, then a map-side cross-multiplied filter (no float avg
    crosses an engine boundary) with per-batch local top-100 partials
    coalesces into the single bounded merge block (q18 discipline)."""
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def part(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "cents": cents})
        out = df.groupby("pkey", as_index=False)["cents"].sum()
        for c in ("pkey", "cents"):
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(out["pkey"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pkey", as_index=False)["cents"].sum()
        return pd.DataFrame({"pkey": out["pkey"].astype("int64"),
                             "cents": out["cents"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])
    per_part = (li.map_batches(part, batch_format="pyarrow")
                .groupby("_bucket").map_groups(bucket_final,
                                               batch_format="pandas")
                ).materialize()

    def stat_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["cents"].sum())],
                             "n": [int(len(df))]})

    def stat_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["s"].sum())],
                             "n": [int(df["n"].sum())]})

    st = _merge_partials(per_part.map_batches(stat_part,
                                              batch_format="pandas"),
                         stat_merge).take_all()[0]
    tot, n_parts = int(st["s"]), int(st["n"])

    def keep_top(df: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray((df["cents"].to_numpy().astype(object) * n_parts
                        * Q11_SHARE_DEN) > (tot * Q11_SHARE_NUM),
                       dtype=bool)
        out = (df[m].sort_values(["cents", "pkey"],
                                 ascending=[False, True]).head(100))
        return pd.DataFrame({"pkey": out["pkey"].astype("int64"),
                             "cents": out["cents"].astype("int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["cents", "pkey"],
                              ascending=[False, True])
               .head(100).reset_index(drop=True))
        return pd.DataFrame({
            "l_partkey": out["pkey"].astype("int64"),
            "revenue_cents": out["cents"].astype("int64")})

    return _merge_partials(
        per_part.map_batches(keep_top, batch_format="pandas"), final)


Q11_SQL = """
WITH p AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1),
t AS (SELECT sum(revenue_cents) AS tot, count(*) AS np FROM p)
SELECT p.l_partkey, p.revenue_cents
FROM p, t
WHERE p.revenue_cents * t.np * %d > t.tot * %d
ORDER BY p.revenue_cents DESC, p.l_partkey
LIMIT 100
""" % (Q11_SHARE_DEN, Q11_SHARE_NUM)


def orders_zorder_scan(sf_dir):
    """Zone-map data-skipping scan over the MATERIALIZED Z-order
    layout — the consumer half of ``orders_zorder`` (which emits the
    zone map; this query writes the clustered layout once and then
    answers a 2-D range predicate by reading ONLY the shards whose
    zone map intersects — the Delta/Iceberg "OPTIMIZE ZORDER →
    data-skipping scan" pair, same build-once/pruned-read discipline
    as ``fulltext_indexed_search`` / ``build_ivf_index``).

    Predicate: custkey in the lowest 10%% of its observed range AND
    orderdate in the first quarter of its range — both bounds derived
    from data, so the SQL oracle replays them exactly. Pruning is
    sound (a shard qualifies iff its per-dimension minima can admit a
    match — a superset) and the scan re-applies the exact predicate,
    so the pruned answer ≡ the full-scan answer; the unit test
    additionally asserts shards were actually skipped."""
    import json as _json

    from ..sources.zlayout import build_zorder_layout, zorder_pruned_scan

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def to_xy(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        return pd.DataFrame({
            "key": t["o_orderkey"].to_numpy().astype("int64"),
            "x": t["o_custkey"].to_numpy().astype("int64"),
            "y": days})

    tag = sf_dir.rstrip("/").split("/")[-1]
    layout = build_zorder_layout(
        ds.map_batches(to_xy, batch_format="pyarrow"),
        "/tmp/ferenda_ray_zlayout_v1/%s" % tag)
    import os as _os
    with open(_os.path.join(layout, "_meta.json")) as fh:
        m = _json.load(fh)
    x_hi = m["x_lo"] + m["x_rng"] // 10
    y_hi = m["y_lo"] + m["y_rng"] // 4

    rows, _read_n, _tot = zorder_pruned_scan(layout, x_hi, y_hi)

    def present(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": t["key"].to_numpy().astype("int64"),
            "o_custkey": t["x"].to_numpy().astype("int64"),
            "o_orderdate": t["y"].to_numpy()
                            .astype("datetime64[D]")
                            .astype("datetime64[us]")})

    return rows.map_batches(present, batch_format="pyarrow")


ZORDER_SCAN_SQL = """
WITH raw AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
         o_orderdate
  FROM orders),
b AS (SELECT min(o_custkey) AS x_lo,
             greatest(max(o_custkey) - min(o_custkey), 1) AS x_rng,
             min(day) AS y_lo,
             greatest(max(day) - min(day), 1) AS y_rng
      FROM raw)
SELECT r.o_orderkey, r.o_custkey, r.o_orderdate
FROM raw r, b
WHERE r.o_custkey <= b.x_lo + b.x_rng // 10
  AND r.day <= b.y_lo + b.y_rng // 4
"""


Q10_DATE_LO, Q10_DATE_HI = "1997-10-01", "1998-01-01"


def q10_returned_customers(sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue of RETURNED lineitems on orders in one quarter — a fact ⋈
    fact ⋈ dimension rollup whose group key (custkey) is NOT the join
    key of the first join (orderkey), i.e. the canonical DOUBLE
    re-key: aggregate on key A, re-partition the partials on key B.

    Scale shape: lineitem pre-reduces per batch to (okey → 'R' cents)
    partials (lossless combiner) and rides ONE orderkey-bucketed
    tagged exchange with the window-filtered order rows; each bucket
    joins and re-emits (ckey → cents) partials tagged with a SECOND
    custkey-hash bucket — the chain is exactly two exchanges with one
    union (the scrub/decontaminate DAG discipline). The second
    exchange finalizes per-customer revenue and takes a LOCAL top-20
    (exact: a customer's whole revenue lives in one bucket); bounded
    partials coalesce in the single merge block; the 20 winning
    custkeys then resolve names via ``joins.resolve_keys`` (map-side
    stream filter of the customer table — no whole-dimension driver
    collect at 10⁹ customers)."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "ckey", "cents", "_bucket", "_side"]
    lo_us = int(np.datetime64(Q10_DATE_LO, "us").astype(np.int64))
    hi_us = int(np.datetime64(Q10_DATE_HI, "us").astype(np.int64))

    def prep_li(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "cents": cents})
        p = df.groupby("okey", as_index=False)["cents"].sum()
        for c in ("okey", "cents"):
            p[c] = p[c].astype("int64")
        p["ckey"] = np.int64(-1)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        dus = (t["o_orderdate"].to_numpy()
               .astype("datetime64[us]").astype(np.int64))
        keep = (dus >= lo_us) & (dus < hi_us)
        p = pd.DataFrame({
            "okey": t["o_orderkey"].to_numpy()[keep],
            "ckey": t["o_custkey"].to_numpy()[keep],
            "cents": np.zeros(int(keep.sum()), np.int64)})
        for c in ("okey", "ckey"):
            p[c] = p[c].astype("int64")
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_cust(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0]
               .groupby("okey", as_index=False)["cents"].sum())
        od_ = g[g["_side"] == 1][["okey", "ckey"]]
        j = li_.merge(od_, on="okey", how="inner")
        out = j.groupby("ckey", as_index=False)["cents"].sum()
        for c in ("ckey", "cents"):
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(out["ckey"], index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out[["ckey", "cents", "_b2"]]

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("ckey", as_index=False)["cents"].sum()
        top = (s.sort_values(["cents", "ckey"],
                             ascending=[False, True]).head(20))
        for c in ("ckey", "cents"):
            top[c] = top[c].astype("int64")
        return top[["ckey", "cents"]]

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag",
                        "l_extendedprice"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_od, batch_format="pyarrow")))
    per_cust = (tagged.groupby("_bucket")
                .map_groups(bucket_cust, batch_format="pandas")
                .groupby("_b2")
                .map_groups(bucket_top, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = (df.sort_values(["cents", "ckey"],
                              ascending=[False, True])
               .head(20).reset_index(drop=True))
        for c in ("ckey", "cents"):
            top[c] = top[c].astype("int64")
        return top[["ckey", "cents"]]

    top = _merge_partials(per_cust, final).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        "c_custkey", top["ckey"], "c_name")
    return pd.DataFrame({
        "c_custkey": top["ckey"].astype("int64"),
        "c_name": top["ckey"].map(names).astype(object),
        "revenue_cents": top["cents"].astype("int64")})


Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '%s'
  AND o.o_orderdate < DATE '%s'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""" % (Q10_DATE_LO, Q10_DATE_HI)


def q7_nation_volume(sf_dir):
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations by year, in both directions — the pattern where DIMENSION
    ATTRIBUTES (supplier nation, customer nation) must propagate
    through a fact×fact join before a bounded rollup.

    Scale shape: the supplier nation resolves via a broadcast dict
    BEFORE the exchange; the customer arm goes through
    ``joins.attach_dim`` (broadcast ≤ threshold, bucketed hash join
    above — forced-path tested), and the nation-pair filter
    prunes map-side, so only matching rows enter the ONE
    orderkey-bucketed tagged exchange; lineitem pre-reduces per batch
    to (okey, supp_nation, year) → cents partials (lossless combiner).
    Each bucket joins, drops same-nation flows, and emits BOUNDED
    (2 × 2 × years) revenue partials that coalesce in one block.

    The nation pair is DERIVED FROM THE DATA (the nations of the two
    lowest-suppkey suppliers with distinct nations) so the query is
    non-degenerate at every scale factor — the synthetic corpus
    spreads few suppliers over 25 nations at sf0.001; the SQL oracle
    replays the same rule."""
    import ray

    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "nat", "year", "cents", "_bucket", "_side"]

    nat_name = {int(r["n_nationkey"]): r["n_name"]
                for r in _read(sf_dir, "nation",
                               columns=["n_nationkey",
                                        "n_name"]).take_all()}
    supp_nat = {int(r["s_suppkey"]): nat_name[int(r["s_nationkey"])]
                for r in _read(sf_dir, "supplier",
                               columns=["s_suppkey",
                                        "s_nationkey"]).take_all()}
    # pair rule shared with the SQL oracle: nation of the lowest
    # suppkey, and of the lowest suppkey in a DIFFERENT nation
    by_key = sorted(supp_nat)
    nat_a = supp_nat[by_key[0]]
    nat_b = next(supp_nat[k] for k in by_key if supp_nat[k] != nat_a)
    pair = {nat_a, nat_b}
    supp_ref = ray.put(supp_nat)

    # customer arm: nationkey→name resolves from the 25-row nation
    # dict map-side, the pair filter prunes BEFORE the dispatch, and
    # attach_dim broadcasts custkey→nation below the threshold /
    # bucket-joins above it (10⁹-customer contract, forced-path
    # tested)
    pair_keys = sorted(k for k, v in nat_name.items() if v in pair)
    names_by_key = dict(nat_name)

    def cust_pair(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(
            t["c_nationkey"],
            value_set=pa.array(pair_keys,
                               type=t.schema.field("c_nationkey").type)))
        nm = pa.array([names_by_key[int(k)]
                       for k in t["c_nationkey"].to_pylist()],
                      type=pa.string())
        return pa.table({"c_custkey": t["c_custkey"], "cnat": nm})

    cust_ds = (_read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"])
               .map_batches(cust_pair, batch_format="pyarrow"))
    od_tagged = joins.attach_dim(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        cust_ds, "o_custkey", "c_custkey", "cnat", out_col="nat",
        how="inner")

    def prep_li(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        sn = _ray.get(supp_ref)
        nat = pd.Series(t["l_suppkey"].to_numpy()).map(sn)
        keep = nat.isin(pair).to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()[keep]
        year = (t["l_shipdate"].to_numpy()[keep]
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy()[keep],
                           "nat": nat.to_numpy()[keep],
                           "year": year, "cents": cents})
        p = df.groupby(["okey", "nat", "year"],
                       as_index=False)["cents"].sum()
        for c in ("okey", "year", "cents"):
            p[c] = p[c].astype("int64")
        p["nat"] = p["nat"].astype(object)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        okey = t["o_orderkey"].to_numpy()
        p = pd.DataFrame({"okey": okey.astype("int64"),
                          "nat": pd.Series(t["nat"].to_pylist(),
                                           dtype=object),
                          "year": np.zeros(len(okey), np.int64),
                          "cents": np.zeros(len(okey), np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_vol(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0]
               .groupby(["okey", "nat", "year"],
                        as_index=False)["cents"].sum()
               .rename(columns={"nat": "supp_nation"}))
        od_ = (g[g["_side"] == 1][["okey", "nat"]]
               .rename(columns={"nat": "cust_nation"}))
        j = li_.merge(od_, on="okey", how="inner")
        j = j[j["supp_nation"] != j["cust_nation"]]
        out = j.groupby(["supp_nation", "cust_nation", "year"],
                        as_index=False)["cents"].sum()
        return pd.DataFrame({
            "supp_nation": out["supp_nation"].astype(object),
            "cust_nation": out["cust_nation"].astype(object),
            "l_year": out["year"].astype("int64"),
            "revenue_cents": out["cents"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od_tagged.map_batches(prep_od,
                                           batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_vol, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # typed empty — schema-loss pitfall guard
            return pd.DataFrame({
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64")})
        out = (df.groupby(["supp_nation", "cust_nation", "l_year"],
                          as_index=False)["revenue_cents"].sum()
               .sort_values(["supp_nation", "cust_nation", "l_year"])
               .reset_index(drop=True))
        out["l_year"] = out["l_year"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


Q7_SQL = """
WITH sn AS (
  SELECT s_suppkey, n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey),
na AS (SELECT n_name FROM sn ORDER BY s_suppkey LIMIT 1),
nb AS (SELECT n_name FROM sn
       WHERE n_name <> (SELECT n_name FROM na)
       ORDER BY s_suppkey LIMIT 1)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name <> n2.n_name
  AND n1.n_name IN ((SELECT n_name FROM na), (SELECT n_name FROM nb))
  AND n2.n_name IN ((SELECT n_name FROM na), (SELECT n_name FROM nb))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


TRAIN_SHARDS = 8


def training_shards(sf_dir):
    """Deterministic hash-shuffle into dataloader shards — the
    training-manifest step of a 100-TB pipeline: every document gets a
    stable (shard, position) independent of read order, partitioning
    or engine, because both derive from md5(doc_id) alone (the
    seedless-shuffle discipline shared by mixture_sample /
    user_bottomk_sample; a global random_shuffle of 100 TB is an
    all-to-all of every byte, while the hash manifest moves only
    (doc_id, hash) pairs).

    Scale shape: shard = md5[:8] % K is map-side; ONE shard-bucketed
    exchange groups each shard, which sorts by the full hex digest
    (position = rank) vectorized. A shard sorting in one worker is
    the operating point by construction — K is chosen so a shard fits
    the dataloader (thousands of shards at 100 TB); for pathological
    shard sizes the order key is prefix-decomposable (sort hex[0:2]
    ranges separately, offset by counts)."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def prep(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        hx = [hashlib.md5(str(int(i)).encode()).hexdigest()
              for i in ids]
        shard = np.array([int(h[:8], 16) % TRAIN_SHARDS for h in hx],
                         dtype=np.int64)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "hx": pd.Series(hx, dtype=object),
                             "shard": shard})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["hx", "doc_id"], kind="mergesort")
             .reset_index(drop=True))
        return pd.DataFrame({
            "shard": g["shard"].astype("int64"),
            "pos": np.arange(len(g), dtype=np.int64),
            "doc_id": g["doc_id"].astype("int64")})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("shard").map_groups(rank, batch_format="pandas"))


TRAINING_SHARDS_SQL = """
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
s AS (
  SELECT doc_id, hx,
         CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) %% %d
              AS BIGINT) AS shard
  FROM h)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY hx, doc_id) - 1
            AS BIGINT) AS pos,
       doc_id
FROM s
""" % TRAIN_SHARDS


def q2_min_cost_supplier(sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for each part, the
    supplier offering the LOWEST average sale price — the grouped
    ARGMIN + join-back pattern (Q15 is the global argmax; this is the
    per-group argmin whose group count is unbounded), restated over
    lineitem since the testdata carries no partsupp.

    Ranking is the exact integer floor((Σcents·1000)/n) milli-cent
    average with suppkey tie-break — both engines replay the same
    formula, so no float average crosses the boundary. Scale shape:
    per-batch (pkey, skey) → (n, cents) partial sums (lossless
    combiner) feed ONE partkey-bucketed exchange — a part's whole
    supplier distribution lives in one bucket, which finalizes sums,
    computes the rational rank and takes the per-part argmin
    vectorized (groupby-idxmin over sorted keys), then keeps its
    LOCAL 100 lowest partkeys; bounded partials coalesce in the one
    merge block, and the ≤100 winning suppkeys resolve names via
    ``joins.resolve_keys`` (no whole-dimension driver collect)."""
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def part(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy(),
                           "cents": cents})
        out = df.groupby(["pkey", "skey"], as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(out["pkey"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_argmin(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pkey", "skey"], as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))
        s["avg_milli"] = (s["cents"] * 1000) // s["n"]
        s = s.sort_values(["pkey", "avg_milli", "skey"],
                          kind="mergesort")
        best = s.groupby("pkey", as_index=False).first()
        best = best.sort_values("pkey").head(100)
        return pd.DataFrame({
            "pkey": best["pkey"].astype("int64"),
            "skey": best["skey"].astype("int64"),
            "avg_milli": best["avg_milli"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    per_bucket = (li.map_batches(part, batch_format="pyarrow")
                  .groupby("_bucket").map_groups(bucket_argmin,
                                                 batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = (df.sort_values("pkey").head(100)
               .reset_index(drop=True))
        for c in ("pkey", "skey", "avg_milli"):
            top[c] = top[c].astype("int64")
        return top

    top = _merge_partials(per_bucket, final).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", top["skey"], "s_name")
    return pd.DataFrame({
        "l_partkey": top["pkey"].astype("int64"),
        "s_suppkey": top["skey"].astype("int64"),
        "s_name": top["skey"].map(names).astype(object),
        "avg_milli": top["avg_milli"].astype("int64")})


Q2_SQL = """
WITH s AS (
  SELECT l_partkey AS pkey, l_suppkey AS skey,
         count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1, 2),
r AS (
  SELECT pkey, skey, (cents * 1000) // n AS avg_milli,
         row_number() OVER (PARTITION BY pkey
                            ORDER BY (cents * 1000) // n, skey) AS rk
  FROM s)
SELECT r.pkey AS l_partkey, r.skey AS s_suppkey, sp.s_name,
       CAST(r.avg_milli AS BIGINT) AS avg_milli
FROM r JOIN supplier sp ON sp.s_suppkey = r.skey
WHERE r.rk = 1
ORDER BY r.pkey
LIMIT 100
"""


CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_MOD = 10, 17, 23
CDC_INS_OFF = 10_000_000


def orders_cdc_merge(sf_dir):
    """Warehouse MERGE INTO / CDC apply: a change-data-capture delta
    (updates, deletes, inserts) applied to the orders base table in
    one pass — the upsert primitive every incremental ingest needs.
    The delta is doc arithmetic in both engines: keys %10 (and not
    %17) get a +100-cent price correction, keys %17 are deleted,
    keys %23 re-appear as inserts under key+10⁷; DELETE dominates
    UPDATE by rule.

    Scale shape: base rows (version 0) and delta rows (version 1 +
    op) ride ONE key-hash-bucketed exchange tagged; each bucket
    resolves its keys vectorized — drop keys holding a delete, else
    keep the highest version — and streams the merged rows out.
    Neither side broadcasts; only fixed-width columns cross."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def base_rows(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        k = t["o_orderkey"].to_numpy()
        df = pd.DataFrame({"k": k, "total_cents": cents,
                           "st": t["o_orderstatus"].to_pandas()
                           .astype(object),
                           "ver": np.zeros(len(k), np.int8),
                           "del_": np.zeros(len(k), np.int8)})
        return df

    def delta_rows(t: pa.Table) -> pd.DataFrame:
        b = base_rows(t)
        k = b["k"].to_numpy()
        upd = b[(k % CDC_UPD_MOD == 0) & (k % CDC_DEL_MOD != 0)].copy()
        upd["total_cents"] = upd["total_cents"] + 100
        upd["ver"] = np.int8(1)
        dl = b[k % CDC_DEL_MOD == 0].copy()
        dl["ver"] = np.int8(1)
        dl["del_"] = np.int8(1)
        ins = b[k % CDC_INS_MOD == 0].copy()
        ins["k"] = ins["k"] + CDC_INS_OFF
        ins["st"] = "N"
        ins["ver"] = np.int8(1)
        return pd.concat([upd, dl, ins], ignore_index=True)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["k"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        dead = set(g.loc[g["del_"] == 1, "k"])
        g = g[~g["k"].isin(dead)]
        g = (g.sort_values(["k", "ver"], ascending=[True, False],
                           kind="mergesort")
             .drop_duplicates("k"))
        out = pd.DataFrame({
            "o_orderkey": g["k"].astype("int64"),
            "total_cents": g["total_cents"].astype("int64"),
            "o_orderstatus": g["st"].astype(object)})
        return out.reset_index(drop=True)

    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    tagged = (od.map_batches(base_rows, batch_format="pyarrow")
              .union(od.map_batches(delta_rows, batch_format="pyarrow"))
              .map_batches(tag, batch_format="pandas"))
    return (tagged.groupby("_bucket")
            .map_groups(resolve, batch_format="pandas"))


ORDERS_CDC_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
         o_orderstatus AS st
  FROM orders),
upd AS (SELECT k, total_cents + 100 AS total_cents, st FROM base
        WHERE k %% %d = 0 AND k %% %d <> 0),
del AS (SELECT k FROM base WHERE k %% %d = 0),
ins AS (SELECT k + %d AS k, total_cents, 'N' AS st FROM base
        WHERE k %% %d = 0)
SELECT k AS o_orderkey, total_cents, st AS o_orderstatus FROM (
  SELECT * FROM base
  WHERE k NOT IN (SELECT k FROM del) AND k NOT IN (SELECT k FROM upd)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins)
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_DEL_MOD, CDC_INS_OFF, CDC_INS_MOD)


def events_daily_dense(sf_dir):
    """Dense per-type daily event counts with EXPLICIT zero cells —
    dimension densification (the gap-filling every time-series
    consumer needs: a day with no events must exist as 0, not be
    absent; the Q13 zero-cell idea on the time axis). The calendar is
    the GLOBAL [min_day, max_day] span so every type carries the same
    dense axis.

    Scale shape: the (type, day) count table is bounded, so per-batch
    partials are a lossless combiner; the single coalesced merge
    block derives the global span and reindexes each type against it
    vectorized — zero shuffle, and the dense output is |types|×|days|
    rows by construction. SQL mirrors via generate_series ×
    types LEFT JOIN counts."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas()
                           .astype(object), "day": days})
        out = df.groupby(["event_type", "day"], as_index=False).size()
        out = out.rename(columns={"size": "n_events"})
        out["n_events"] = out["n_events"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)[
            "n_events"].sum()
        lo, hi = int(g["day"].min()), int(g["day"].max())
        cal = np.arange(lo, hi + 1, dtype=np.int64)
        types = sorted(g["event_type"].unique())
        dense = pd.DataFrame({
            "event_type": np.repeat(np.array(types, dtype=object),
                                    len(cal)),
            "day": np.tile(cal, len(types))})
        out = dense.merge(g, on=["event_type", "day"], how="left")
        out["n_events"] = (out["n_events"].fillna(0).astype("int64"))
        out["day"] = out["day"].astype("int64")
        return out[["event_type", "day", "n_events"]]

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


EVENTS_DENSE_SQL = """
WITH c AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '1970-01-01', ts) AS day,
         count(*) AS n_events
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
cal AS (SELECT unnest(generate_series(lo, hi)) AS day FROM span),
types AS (SELECT DISTINCT event_type FROM c)
SELECT t.event_type, CAST(cal.day AS BIGINT) AS day,
       CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
FROM types t CROSS JOIN cal
LEFT JOIN c ON c.event_type = t.event_type AND c.day = cal.day
"""


PREC_LOOKBACK_US = 3_600_000_000        # 1 h
PREC_WINDOW_US = 6 * 3_600_000_000      # 6 h panes


def events_preceding_hour_count(sf_dir):
    """Per-EVENT sliding RANGE window: for every event, the number of
    same-type events in the preceding hour (inclusive, peers counted
    — SQL RANGE ... 1 HOUR PRECEDING AND CURRENT ROW semantics). The
    per-row rate feature behind burst detection and rate limiting.

    Scale shape: a per-row window over an unbounded partition can't
    ride one group per type — instead events split into 6-hour PANES
    keyed (type, pane), and every event within 1 h of a pane's end is
    ALSO emitted into the next pane as a context-only HALO row, so
    each pane holds everything its own rows can look back at. One
    bucketed exchange; per pane one sort + two vectorized
    searchsorted passes; halo duplication is bounded by
    lookback/pane = 1/6 of the stream. Exact by construction — the
    window never crosses more than one pane boundary."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts",
                                          "event_type"])
    from ..stages.joins import _hash64

    def panes(t: pa.Table) -> pd.DataFrame:
        ts_us = (t["ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64))
        et = pd.Series(t["event_type"].to_pylist(), dtype=object)
        eid = t["event_id"].to_numpy()
        w = ts_us // PREC_WINDOW_US
        own = pd.DataFrame({"event_id": eid, "ts_us": ts_us,
                            "event_type": et, "w": w,
                            "is_ctx": np.int8(0)})
        halo_m = ts_us >= (w + 1) * PREC_WINDOW_US - PREC_LOOKBACK_US
        halo = pd.DataFrame({
            "event_id": eid[halo_m], "ts_us": ts_us[halo_m],
            "event_type": et[halo_m].reset_index(drop=True),
            "w": w[halo_m] + 1, "is_ctx": np.int8(1)})
        out = pd.concat([own, halo], ignore_index=True)
        key = out["event_type"].astype(str) + "\x1f" + out["w"].astype(str)
        out["_bucket"] = (_hash64(key) % np.uint64(64)).astype("int32")
        return out

    def count_window(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(["event_type", "w"], sort=False):
            sub = sub.sort_values(["ts_us", "event_id"],
                                  kind="mergesort")
            all_ts = sub["ts_us"].to_numpy()
            own = sub[sub["is_ctx"] == 0]
            t = own["ts_us"].to_numpy()
            lo = np.searchsorted(all_ts, t - PREC_LOOKBACK_US,
                                 side="left")
            hi = np.searchsorted(all_ts, t, side="right")
            outs.append(pd.DataFrame({
                "event_id": own["event_id"].to_numpy(),
                "n_prec": (hi - lo).astype("int64")}))
        if not outs:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "n_prec": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["event_id"] = out["event_id"].astype("int64")
        return out

    return (ds.map_batches(panes, batch_format="pyarrow")
            .groupby("_bucket").map_groups(count_window,
                                           batch_format="pandas"))


EVENTS_PREC_SQL = """
SELECT event_id,
       count(*) OVER (PARTITION BY event_type ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                      AND CURRENT ROW) AS n_prec
FROM events
"""


ANOM_K_NUM, ANOM_K_DEN = 2 * 10_000, 29_652  # |z| > 2, 1.4826 exact


def events_anomaly_days(sf_dir):
    """Event-rate anomaly detection: days whose per-type event count
    deviates from that type's typical daily rate by a modified
    z-score > 2 (Iglewicz–Hoaglin over median/MAD — the
    doc_length_outliers rule applied to a TIME SERIES of rates, the
    ops-monitoring 'traffic spike/outage day' signal).

    Scale shape: the (type, day) count table is BOUNDED (types ×
    days), so per-batch count partials are a lossless combiner and
    median, MAD and the exact 29652·|x−med| > 2·10⁴·MAD
    cross-multiplied flag all evaluate vectorized inside the ONE
    coalesced merge block — zero shuffle end to end."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas()
                           .astype(object), "day": days})
        out = df.groupby(["event_type", "day"], as_index=False).size()
        out = out.rename(columns={"size": "n_events"})
        out["n_events"] = out["n_events"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)[
            "n_events"].sum()
        outs = []
        for et, sub in g.groupby("event_type"):
            v = np.sort(sub["n_events"].to_numpy())
            med = int(v[(len(v) - 1) // 2])
            d = np.sort(np.abs(sub["n_events"].to_numpy() - med))
            mad = int(d[(len(d) - 1) // 2])
            keep = (ANOM_K_DEN * np.abs(sub["n_events"].to_numpy()
                                        - med) > ANOM_K_NUM * mad)
            s = sub[keep].copy()
            s["med"] = np.int64(med)
            s["mad"] = np.int64(mad)
            outs.append(s)
        out = (pd.concat(outs, ignore_index=True) if outs else
               pd.DataFrame(columns=["event_type", "day", "n_events",
                                     "med", "mad"]))
        for c in ("day", "n_events", "med", "mad"):
            out[c] = out[c].astype("int64")
        return out[["event_type", "day", "n_events", "med", "mad"]]

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


EVENTS_ANOMALY_SQL = """
WITH c AS (
  SELECT event_type,
         date_diff('day', TIMESTAMP '1970-01-01', ts) AS day,
         count(*) AS n_events
  FROM events GROUP BY event_type, day),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n_events) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c),
med AS (SELECT event_type, max(CASE WHEN rn = 1 + (n - 1) // 2
                                    THEN n_events END) AS med
        FROM r GROUP BY event_type),
dv AS (SELECT c.event_type, abs(c.n_events - m.med) AS d,
              row_number() OVER (PARTITION BY c.event_type
                                 ORDER BY abs(c.n_events - m.med))
                  AS rn,
              count(*) OVER (PARTITION BY c.event_type) AS n
       FROM c JOIN med m USING (event_type)),
mad AS (SELECT event_type, max(CASE WHEN rn = 1 + (n - 1) // 2
                                    THEN d END) AS mad
        FROM dv GROUP BY event_type)
SELECT c.event_type, c.day, c.n_events,
       CAST(m.med AS BIGINT) AS med, CAST(a.mad AS BIGINT) AS mad
FROM c JOIN med m USING (event_type) JOIN mad a USING (event_type)
WHERE %d * abs(c.n_events - m.med) > %d * a.mad
""" % (ANOM_K_DEN, ANOM_K_NUM)


ZORDER_SHARD_BITS = 6  # 64 layout shards from the top Morton bits


def orders_zorder(sf_dir):
    """Z-order (Morton-curve) data-layout clustering — the Delta/
    Iceberg OPTIMIZE ZORDER BY (o_custkey, o_orderdate) analogue:
    interleave the low 16 bits of custkey with the low 16 bits of the
    epoch-day so rows close in EITHER dimension land in the same
    layout shard, then emit the per-shard ZONE MAP (row count +
    min/max of both dimensions) — the metadata a scan planner prunes
    row groups with. Writing the shards is ``write_triples_
    partitioned``'s job; the zone map is the verifiable layout
    artifact.

    Each dimension is first RANGE-QUANTIZED to 16 bits against its
    observed [min, max] — the exact integer floor division
    ((v−vmin)·65535)//max(vmax−vmin, 1), the same linearization real
    ZORDER implementations apply so the curve fills the key space at
    any data scale (raw low-16-bit interleaving degenerates to one
    shard when both domains are narrow).

    Scale shape: the bounds are ONE bounded pre-pass (min/max
    combiner → 4 integers on the driver, the events_decayed_user_score
    discipline); the Morton code is a vectorized numpy bit-spread per
    batch and the shard key is its top 6 bits — BOUNDED (64) — so
    per-batch zone-map partials are a lossless min/max/count combiner
    and the whole operator is ZERO-shuffle: partials coalesce into
    one final block. SQL replays quantization and interleave
    bit-for-bit."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate"])

    def bounds_partial(t: pa.Table) -> pd.DataFrame:
        ck = t["o_custkey"].to_numpy().astype(np.int64)
        days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        return pd.DataFrame({
            "ck_min": [int(ck.min())], "ck_max": [int(ck.max())],
            "day_min": [int(days.min())], "day_max": [int(days.max())]})

    def bounds_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ck_min": [int(df["ck_min"].min())],
            "ck_max": [int(df["ck_max"].max())],
            "day_min": [int(df["day_min"].min())],
            "day_max": [int(df["day_max"].max())]})

    b = _merge_partials(
        ds.map_batches(bounds_partial, batch_format="pyarrow"),
        bounds_merge).take_all()[0]
    ck_lo, ck_rng = b["ck_min"], max(b["ck_max"] - b["ck_min"], 1)
    day_lo, day_rng = b["day_min"], max(b["day_max"] - b["day_min"], 1)

    def _spread16(v: np.ndarray) -> np.ndarray:
        # 16-bit value -> even bit positions of a 32-bit word
        v = v.astype(np.int64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = t["o_custkey"].to_numpy().astype(np.int64)
        days = (t["o_orderdate"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        qx = ((ck - ck_lo) * 65535) // ck_rng
        qy = ((days - day_lo) * 65535) // day_rng
        z = _spread16(qx) | (_spread16(qy) << 1)
        shard = z >> (32 - ZORDER_SHARD_BITS)
        df = pd.DataFrame({"shard": shard, "ck": ck, "day": days})
        out = df.groupby("shard", as_index=False).agg(
            n_orders=("ck", "size"),
            ck_min=("ck", "min"), ck_max=("ck", "max"),
            day_min=("day", "min"), day_max=("day", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            n_orders=("n_orders", "sum"),
            ck_min=("ck_min", "min"), ck_max=("ck_max", "max"),
            day_min=("day_min", "min"), day_max=("day_max", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


def _zorder_sql() -> str:
    terms = " + ".join(
        "(((x >> %d) & 1) << %d) + (((y >> %d) & 1) << %d)"
        % (b, 2 * b, b, 2 * b + 1) for b in range(16))
    return """
WITH raw AS (
  SELECT o_custkey AS ck,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day
  FROM orders),
b AS (SELECT min(ck) AS ck_lo, greatest(max(ck) - min(ck), 1) AS ck_rng,
             min(day) AS day_lo,
             greatest(max(day) - min(day), 1) AS day_rng
      FROM raw),
xy AS (
  SELECT ((r.ck - b.ck_lo) * 65535) // b.ck_rng AS x,
         ((r.day - b.day_lo) * 65535) // b.day_rng AS y,
         r.ck, r.day
  FROM raw r, b),
z AS (SELECT CAST(%s AS BIGINT) >> (32 - %d) AS shard, ck, day FROM xy)
SELECT shard, count(*) AS n_orders,
       min(ck) AS ck_min, max(ck) AS ck_max,
       min(day) AS day_min, max(day) AS day_max
FROM z GROUP BY shard
""" % (terms, ZORDER_SHARD_BITS)


ORDERS_ZORDER_SQL = _zorder_sql()


Q5_REGION, Q5_LO, Q5_HI = "ASIA", "1997-01-01", "1998-01-01"


def q5_local_suppliers(sf_dir):
    """TPC-H Q5 shape (local supplier volume): customer ⋈ orders ⋈
    lineitem ⋈ supplier ⋈ nation ⋈ region — the deepest star join,
    revenue per nation where the supplier is in the CUSTOMER's
    nation, region-filtered. Exercises every dimension table.

    Scale shape: region→nation→(customer, supplier) are the star's
    dimension arms — region/nation/supplier broadcast as dicts;
    the customer arm goes through ``joins.attach_dim``, which
    broadcasts the custkey→nationkey map below
    ``joins.DIM_BROADCAST_THRESHOLD`` and switches to a bucketed
    hash join above it (forced-path equality tested), so 10⁹
    customers never materialize on the driver.
    The fact-side large×large leg is ONE orderkey-bucketed exchange
    carrying both sides tagged: filtered orders enter as
    (okey, customer-nation), lineitem as per-batch partial
    (okey, suppkey) cents sums; each bucket joins, applies the
    supplier-nation == customer-nation filter via the broadcast
    supplier dict, and pre-aggregates to its bounded ≤ nations
    revenue partials; one single-block merge finishes. Integer cents
    per row before the exchange (q1 rounding discipline)."""
    import ray

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]
                ).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    asia = set(reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(asia)]
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    region_nats = sorted(int(k) for k in n2name)
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    ref = ray.put((s2n, n2name))
    buckets = _exchange_buckets(sf_dir, "lineitem")
    lo, hi = np.datetime64(Q5_LO), np.datetime64(Q5_HI)
    COLS = ["okey", "suppkey", "cents", "c_nat", "_bucket", "_side"]

    def cust_in_region(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(
            t["c_nationkey"],
            value_set=pa.array(region_nats,
                               type=t.schema.field("c_nationkey").type)))

    cust_f = (_read(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey"])
              .map_batches(cust_in_region, batch_format="pyarrow"))

    def od_window(t: pa.Table) -> pa.Table:
        od_np = t["o_orderdate"].to_numpy()
        keep = (od_np >= lo) & (od_np < hi)
        return t.select(["o_orderkey", "o_custkey"]).filter(
            pa.array(keep))

    od_f = (_read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(od_window, batch_format="pyarrow"))
    od_tagged = joins.attach_dim(od_f, cust_f, "o_custkey",
                                 "c_custkey", "c_nationkey",
                                 out_col="c_nat", how="inner")

    def prep_li(t: pa.Table) -> pd.DataFrame:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "suppkey": t["l_suppkey"].to_numpy(),
                           "cents": cents.to_numpy()})
        p = df.groupby(["okey", "suppkey"], as_index=False)["cents"].sum()
        p["cents"] = p["cents"].astype("int64")
        p["c_nat"] = np.int64(-1)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        n = t.num_rows
        p = pd.DataFrame({
            "okey": t["o_orderkey"].to_numpy(),
            "suppkey": np.full(n, -1, np.int64),
            "cents": np.zeros(n, np.int64),
            "c_nat": t["c_nat"].to_numpy().astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_rev(g: pd.DataFrame) -> pd.DataFrame:
        s2n_, n2name_ = ray.get(ref)
        li_ = g[g["_side"] == 0][["okey", "suppkey", "cents"]]
        od_ = g[g["_side"] == 1][["okey", "c_nat"]]
        j = li_.merge(od_, on="okey", how="inner")
        s_nat = j["suppkey"].map(s2n_)
        j = j[(s_nat == j["c_nat"]).to_numpy()]
        j = j.assign(n_name=j["c_nat"].map(n2name_))
        out = j.groupby("n_name", as_index=False)["cents"].sum()
        return pd.DataFrame({
            "n_name": out["n_name"].astype(object),
            "revenue_cents": out["cents"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od_tagged.map_batches(prep_od,
                                           batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_rev, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("n_name", as_index=False)["revenue_cents"]
               .sum()
               .sort_values(["revenue_cents", "n_name"],
                            ascending=[False, True])
               .reset_index(drop=True))
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '%s'
  AND o_orderdate >= TIMESTAMP '%s' AND o_orderdate < TIMESTAMP '%s'
GROUP BY n_name ORDER BY revenue_cents DESC, n_name ASC
""" % (Q5_REGION, Q5_LO, Q5_HI)


def orders_cube(sf_dir):
    """Full CUBE over (o_orderstatus, o_orderpriority) — grouping
    sets / OLAP rollup lattice in one pass: all four levels
    ((s,p), (s,·), (·,p), (·,·)) with 'ALL' as the rolled-up marker.

    Scale shape: per-batch partials aggregate ONLY the finest cell
    (status × priority — the bounded lattice bottom); every coarser
    level is derived from the finest inside the single bounded merge
    block, so the cube costs exactly what the finest groupby costs —
    no per-level passes, no exchange beyond the partial coalesce.
    Integer cents keep sums engine-exact."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderpriority",
                        "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        df = pd.DataFrame({
            "o_orderstatus": t["o_orderstatus"].to_pandas(),
            "o_orderpriority": t["o_orderpriority"].to_pandas(),
            "cents": cents.to_pandas()})
        return df.groupby(["o_orderstatus", "o_orderpriority"],
                          as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        agg = {"n_orders": ("n_orders", "sum"),
               "revenue_cents": ("revenue_cents", "sum")}
        fin = df.groupby(["o_orderstatus", "o_orderpriority"],
                         as_index=False).agg(**agg)
        by_s = fin.groupby("o_orderstatus", as_index=False).agg(**agg)
        by_s["o_orderpriority"] = "ALL"
        by_p = fin.groupby("o_orderpriority", as_index=False).agg(**agg)
        by_p["o_orderstatus"] = "ALL"
        tot = pd.DataFrame({"o_orderstatus": ["ALL"],
                            "o_orderpriority": ["ALL"],
                            "n_orders": [fin["n_orders"].sum()],
                            "revenue_cents": [fin["revenue_cents"].sum()]})
        cols = ["o_orderstatus", "o_orderpriority", "n_orders",
                "revenue_cents"]
        out = pd.concat([fin[cols], by_s[cols], by_p[cols], tot[cols]],
                        ignore_index=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _tag_bucket(p: pd.DataFrame, buckets: int, side: int,
                cols: list, key: str = "okey") -> pd.DataFrame:
    """Shared prep for the tagged two-sided fact exchange (the
    q3/q5 family): key-hash bucket + side tag + fixed projection so
    both sides union into one uniform block schema."""
    h = pd.util.hash_pandas_object(p[key], index=False).values
    p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
    p["_side"] = np.int8(side)
    return p[cols]


Q3_CUT = "1998-06-01"
Q3_SEGMENT = "BUILDING"


def q3_shipping(sf_dir):
    """TPC-H Q3 shape (shipping priority): customer ⋈ orders ⋈
    lineitem, unshipped-revenue top 10 — THREE-way join with an
    unbounded group key (per-order), the step up from
    ``priority_lineitems``' bounded-key Q12 shape.

    Scale shape: the dimension leg (BUILDING customers) broadcasts as
    a key set via ray.put (at 10⁹ customers swap in joins.bloom_keys
    / bucket_join — same contract as skeleton_entities); the
    large×large leg is ONE orderkey-hash-bucketed exchange carrying
    BOTH sides tagged (filtered lineitem rows enter as per-batch
    partial cents sums, filtered orders as (key, date, priority)
    rows), so each bucket holds every surviving row of its orderkeys
    and can finalize revenue, join, and take its LOCAL top 10 —
    valid because an order's complete revenue lives in exactly one
    bucket. Partial top-10s coalesce into the single bounded merge
    block. Per-row integer cents before the exchange (the q1_pricing
    rounding discipline) keep sums order-independent and the oracle
    bit-exact."""
    import ray

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = set(cust.loc[cust["c_mktsegment"] == Q3_SEGMENT,
                        "c_custkey"].tolist())
    ref = ray.put(keys)
    buckets = _exchange_buckets(sf_dir, "lineitem")
    cut = pd.Timestamp(Q3_CUT)
    COLS = ["okey", "cents", "o_orderdate", "o_orderpriority",
            "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "cents": cents.to_numpy()})
        p = df.groupby("okey", as_index=False)["cents"].sum()
        p["cents"] = p["cents"].astype("int64")
        p["o_orderdate"] = pd.NaT
        p["o_orderpriority"] = None
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        keys_ = ray.get(ref)
        df = t.to_pandas()
        m = ((df["o_orderdate"].to_numpy() < np.datetime64(cut))
             & df["o_custkey"].isin(keys_).to_numpy())
        df = df[m]
        p = pd.DataFrame({
            "okey": df["o_orderkey"].to_numpy(),
            "cents": np.zeros(int(m.sum()), np.int64),
            "o_orderdate": df["o_orderdate"].to_numpy(),
            "o_orderpriority": df["o_orderpriority"].to_numpy()})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0]
        od_ = g[g["_side"] == 1]
        rev = li_.groupby("okey", as_index=False)["cents"].sum()
        j = (od_[["okey", "o_orderdate", "o_orderpriority"]]
             .merge(rev, on="okey", how="inner")
             .sort_values(["cents", "o_orderdate", "okey"],
                          ascending=[False, True, True]).head(10))
        return pd.DataFrame({
            "o_orderkey": j["okey"].to_numpy().astype("int64"),
            "o_orderdate": j["o_orderdate"].to_numpy(),
            "o_orderpriority": j["o_orderpriority"].to_numpy(),
            "revenue_cents": j["cents"].to_numpy().astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_orderpriority"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_od, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_topk, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        j = df.sort_values(["revenue_cents", "o_orderdate", "o_orderkey"],
                           ascending=[False, True, True]).head(10)
        return j.reset_index(drop=True)

    return _merge_partials(per_bucket, final)


Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '%s'
  AND o_orderdate < TIMESTAMP '%s'
  AND l_shipdate > TIMESTAMP '%s'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 10
""" % (Q3_SEGMENT, Q3_CUT, Q3_CUT)


def revenue_by_nation(sf_dir):
    """hash join via broadcast small sides: orders ⋈ customer ⋈ nation
    (customer+nation are dimension tables → ray.put lookup dicts)."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    c2n = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    ref = ray.put((c2n, n2name))

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        c2n_, n2name_ = ray.get(ref)
        df = df.copy()
        df["n_name"] = df["o_custkey"].map(c2n_).map(n2name_)
        # integer cents: per-row rounding is exact in any engine, and
        # integer sums are order-independent (float sums are not —
        # they round differently at boundaries between engines)
        df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
        g = df.groupby("n_name", as_index=False).agg(
            revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_orders=("n_orders", "sum"))
        g["revenue_cents"] = g["revenue_cents"].astype("int64")
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    return _merge_partials(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(enrich, batch_format="pandas"), merge)


REVENUE_SQL = """
SELECT n_name,
       cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def union_entities(sf_dir):
    """union of two sources + groupby (CompositeRepository shape)."""
    c = _read(sf_dir, "customer", columns=["c_name"]).map_batches(
        lambda t: pa.table({"name": t["c_name"]}), batch_format="pyarrow")
    s = _read(sf_dir, "supplier", columns=["s_name"]).map_batches(
        lambda t: pa.table({"name": t["s_name"]}), batch_format="pyarrow")
    return (c.union(s).groupby("name").count()
            .map_batches(lambda df: df.rename(columns={"count()": "n"}),
                         batch_format="pandas"))


UNION_SQL = """
SELECT name, count(*) AS n FROM (
  SELECT c_name AS name FROM customer
  UNION ALL SELECT s_name FROM supplier) GROUP BY name
"""


# ---------------------------------------------------------------------
# embeddings: similarity + distributed connected components
# ---------------------------------------------------------------------

def embed_knn(sf_dir):
    """brute-force cosine top-10 for the vec_id=0 query vector."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    out = knn_brute_force(ds, qv[None, :], k=10)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


EMBED_KNN_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) AS sim
  FROM embeddings, q
)
SELECT vec_id, cast(row_number() OVER (ORDER BY sim DESC, vec_id ASC) - 1 AS BIGINT) AS rank
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


IVF_ADD_MOD, IVF_ADD_OFF = 13, 10_000_000


def embed_ivf_add_knn(sf_dir):
    """ANN served from an INCREMENTALLY GROWN materialized IVF index
    (similarity.add_to_ivf_index — FAISS's IndexIVF.add shape): the
    base index is built once, a delta of re-keyed vector copies
    (vec_id %% 13 → key+10⁷, identical embedding) is ADDED against the
    FIXED centroids (hardlinked base segments + delta segments — the
    base corpus is never read or rewritten), and the query probes the
    merged version with n_probe = ALL buckets, which makes IVF exact
    — so a plain brute-force SQL oracle over the post-delta vector
    set proves add(index, δ) == index(corpus ∪ δ) end to end. This
    gives the ANN-index family its fully-oracled member
    (embed_knn_ivf stays the honest approximate path)."""
    import os

    from ..stages.similarity import (add_to_ivf_index, build_ivf_index,
                                     knn_ivf_indexed)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = "/tmp/ferenda_ray_ivf/%s_c8_v1" % os.path.basename(
        sf_dir.rstrip("/"))
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        build_ivf_index(ds, base, n_centroids=8)
        with open(os.path.join(base, "_SUCCESS"), "w") as fh:
            fh.write("ok")

    def delta_rows(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        keep = ids % IVF_ADD_MOD == 0
        return pa.table({
            "vec_id": pa.array(ids[keep] + IVF_ADD_OFF, pa.int64()),
            "embedding": t["embedding"].filter(
                pa.array(keep, pa.bool_()))})

    delta = ds.map_batches(delta_rows, batch_format="pyarrow")
    merged = "%s_add_v1" % base
    add_to_ivf_index(base, delta, merged)

    q = (ds.map_batches(
            lambda t: t.filter(pc.equal(t["vec_id"], 0)),
            batch_format="pyarrow").to_pandas())
    qv = np.asarray(list(q["embedding"])[0], dtype=np.float64)
    out = knn_ivf_indexed(merged, qv[None, :], k=10, n_probe=8)
    # rank on cosine rounded to 12 dp: the planted exact-duplicate
    # tie must break on vec_id in BOTH engines — raw float64 dots
    # drift a final ulp with BLAS kernel/segment-size choice, which
    # would otherwise flip the (0, 0+10⁷) pair nondeterministically
    out = out.copy()
    out["c12"] = out["cosine"].round(12)
    out = (out.sort_values(["c12", "vec_id"],
                           ascending=[False, True], kind="mergesort")
           .reset_index(drop=True))
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return (out[["vec_id", "rank"]]
            .astype({"vec_id": "int64", "rank": "int64"}))


IVF_ADD_SQL = """
WITH allv AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + %d, embedding FROM embeddings
  WHERE vec_id %% %d = 0),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[])
           AS sim
  FROM allv, q)
SELECT vec_id,
       CAST(row_number() OVER (ORDER BY round(sim, 12) DESC,
                               vec_id ASC) - 1
            AS BIGINT) AS rank
FROM s ORDER BY round(sim, 12) DESC, vec_id ASC LIMIT 10
""" % (IVF_ADD_OFF, IVF_ADD_MOD)


def segment_price_median(sf_dir):
    """GROUPED radix selection: the exact median order price PER
    customer market segment — the per-group generalization of
    ``orders_price_percentiles``. A grouped exact median over a wide
    value domain normally means a per-group sort; here BOTH passes
    stay zero-shuffle because the histogram key is (segment,
    bucket): pass 1 histograms high bits per segment (bounded
    |segments|·2^14 cells — still a lossless combiner), one walk per
    segment pins its ceil(N_g/2) rank to a bucket + residual, pass 2
    histograms full values inside only the selected (segment,
    bucket) cells. The segment dimension attaches through
    ``joins.attach_dim`` (broadcast ≤ threshold, bucketed hash join
    at 10⁹ customers — forced-path tested).

    Ranks are ceil(N/2) with value-ties, so SQL's per-partition
    row_number replays rank→value engine-independently."""
    def seg_cents(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        return pd.DataFrame({
            "seg": pd.Series(t["seg"].to_pylist(), dtype=object),
            "v": cents})

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        df = seg_cents(t)
        df["hi"] = df["v"].to_numpy() >> RADIX_SHIFT
        out = (df.groupby(["seg", "hi"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["hi"] = out["hi"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    ds = joins.attach_dim(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_mktsegment"]),
        "o_custkey", "c_custkey", "c_mktsegment", out_col="seg",
        how="inner")
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby(["seg", "hi"], as_index=False)["n"].sum())
    targets = {}  # seg -> (hi_bucket, residual_rank)
    for seg, g in h1.groupby("seg"):
        g = g.sort_values("hi").reset_index(drop=True)
        n = int(g["n"].sum())
        k = (n + 1) // 2  # ceil(N/2) — the lower median
        cum = g["n"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets[seg] = (int(g["hi"].iloc[i]), k - prev)
    wanted = {s: hi for s, (hi, _) in targets.items()}

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        df = seg_cents(t)
        hi = df["v"].to_numpy() >> RADIX_SHIFT
        keep = hi == df["seg"].map(wanted).to_numpy()
        df = df[keep]
        out = (df.groupby(["seg", "v"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["v"] = out["v"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby(["seg", "v"], as_index=False)["n"].sum())
    rows = []
    for seg, (hi, resid) in sorted(targets.items()):
        g = h2[h2["seg"] == seg].sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        j = int(np.searchsorted(cum, resid))
        rows.append((seg, int(g["v"].iloc[j])))
    return pd.DataFrame({
        "c_mktsegment": pd.Series([r[0] for r in rows], dtype=object),
        "median_cents": pd.Series([r[1] for r in rows],
                                  dtype="int64")})


SEGMENT_MEDIAN_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders JOIN customer c ON o_custkey = c.c_custkey),
r AS (
  SELECT seg, v,
         row_number() OVER (PARTITION BY seg ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM j)
SELECT seg AS c_mktsegment, CAST(v AS BIGINT) AS median_cents
FROM r WHERE rn = (n + 1) // 2
ORDER BY seg
"""


EMB_DIM, EMB_QUANT = 64, 1000.0


def source_embedding_coherence(sf_dir):
    """Exact within-group embedding coherence in ONE streaming pass —
    the cluster-quality statistic (within-cluster sum of squared
    pairwise distances) computed WITHOUT the pairwise join, via the
    sufficient-statistics identity Σ_{i<j}|vᵢ−vⱼ|² = n·Σ|vᵢ|² − |Σvᵢ|².
    A naive implementation shuffles O(n²) pairs per group; this moves
    exactly (n_groups × (2 + dim)) integers — the same decomposition
    that makes distributed variance/k-means updates one-pass.

    Exactness: embeddings quantize to integer milli-units with
    half-away rounding (the cents discipline) so every sum, square
    and the final cross-multiplied milli-average replay bit-for-bit
    in SQL. Scale shape: per-batch per-source partials (n, Σ|q|²,
    Σq as DIM int columns) are a lossless combiner; the bounded
    merge block squares the summed vector and divides exactly —
    zero shuffle at any corpus size."""
    import ray

    # dimension dispatch (the verify_jaccard contract): the
    # (doc_id → source) arm broadcasts as a dict ≤ threshold; above
    # it, each embedding row first QUANTIZES to flat int64 scalar
    # columns (vec_id, s2, c0..cD) — a carrier that CAN ride the
    # bucketed exchange (object-ndarray columns can't, the
    # ragged-TensorArray pitfall) — then attach_dim joins the source
    # on, and a downstream per-batch combiner re-bounds the rows.
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    docs_dim = _read(sf_dir, "documents",
                     columns=["doc_id", "source"])

    def _quant(df: pd.DataFrame) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) * EMB_QUANT
                      for v in df["embedding"]])
        return (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)

    def _empty_partial() -> pd.DataFrame:
        cols = {"source": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "s2": pd.Series(dtype="int64")}
        cols.update({"c%d" % d: pd.Series(dtype="int64")
                     for d in range(EMB_DIM)})
        return pd.DataFrame(cols)

    n_docs_dim = docs_dim.count()
    if n_docs_dim <= joins.DIM_BROADCAST_THRESHOLD:
        src_ref = ray.put({
            int(r["doc_id"]): r["source"]
            for r in docs_dim.take_all()})

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray
            if len(df) == 0:
                return _empty_partial()
            s2n = _ray.get(src_ref)
            q = _quant(df)
            out = pd.DataFrame({
                "source": [s2n[int(k)] for k in df["vec_id"]],
                "n": np.ones(len(df), np.int64),
                "s2": (q * q).sum(axis=1)})
            for d in range(EMB_DIM):
                out["c%d" % d] = q[:, d]
            p = out.groupby("source", as_index=False).sum()
            p["source"] = p["source"].astype(object)
            return p

        partials = emb.map_batches(partial, batch_format="pandas")
    else:
        def quantize(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                cols = {"vec_id": pd.Series(dtype="int64"),
                        "n": pd.Series(dtype="int64"),
                        "s2": pd.Series(dtype="int64")}
                cols.update({"c%d" % d: pd.Series(dtype="int64")
                             for d in range(EMB_DIM)})
                return pd.DataFrame(cols)
            q = _quant(df)
            out = pd.DataFrame({
                "vec_id": df["vec_id"].to_numpy().astype("int64"),
                "n": np.ones(len(df), np.int64),
                "s2": (q * q).sum(axis=1)})
            for d in range(EMB_DIM):
                out["c%d" % d] = q[:, d]
            return out

        flat = emb.map_batches(quantize, batch_format="pandas")
        tagged = joins.attach_dim(flat, docs_dim, "vec_id", "doc_id",
                                  "source", out_col="source",
                                  how="inner")

        def by_source(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return _empty_partial()
            p = (df.drop(columns=["vec_id"])
                 .groupby("source", as_index=False).sum())
            p["source"] = p["source"].astype(object)
            cols = ["source", "n", "s2"] + ["c%d" % d
                                            for d in range(EMB_DIM)]
            return p[cols]

        partials = tagged.map_batches(by_source, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).sum()
        cvec = g[["c%d" % d for d in range(EMB_DIM)]].to_numpy()
        n = g["n"].to_numpy(np.int64)
        S = g["s2"].to_numpy(np.int64)
        # Python ints: n·S and |Σq|² exceed int64 long before 100 TB
        rows = []
        for i, src in enumerate(g["source"]):
            T = sum(int(x) * int(x) for x in cvec[i])
            tot = int(n[i]) * int(S[i]) - T  # = Σ_{i<j} d²
            pairs = int(n[i]) * (int(n[i]) - 1)
            rows.append((src, int(n[i]),
                         (tot * 2000) // pairs if pairs else 0))
        out = pd.DataFrame(rows, columns=["source", "n_docs",
                                          "coherence_milli"])
        out = out.sort_values("source").reset_index(drop=True)
        out["source"] = out["source"].astype(object)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["coherence_milli"] = out["coherence_milli"].astype("int64")
        return out

    return _merge_partials(partials, final)


SOURCE_COHERENCE_SQL = """
WITH x AS (
  SELECT d.source, e.vec_id, s.i,
         CAST(round(e.embedding[s.i] * 1000) AS BIGINT) AS q
  FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id,
  generate_series(1, %d) s(i)),
per_vec AS (
  SELECT source, vec_id, CAST(sum(q * q) AS BIGINT) AS s2
  FROM x GROUP BY 1, 2),
dims AS (
  SELECT source, i, CAST(sum(q) AS BIGINT) AS sq
  FROM x GROUP BY 1, 2),
a AS (
  SELECT source, count(*) AS n, CAST(sum(s2) AS HUGEINT) AS S
  FROM per_vec GROUP BY 1),
t AS (
  SELECT source, CAST(sum(CAST(sq AS HUGEINT) * sq) AS HUGEINT) AS T
  FROM dims GROUP BY 1)
SELECT a.source, CAST(a.n AS BIGINT) AS n_docs,
       CAST((CAST(a.n AS HUGEINT) * a.S - t.T) * 2000
            // (a.n * (a.n - 1)) AS BIGINT) AS coherence_milli
FROM a JOIN t USING (source)
ORDER BY a.source
""" % EMB_DIM


SEMDEDUP_OFFSET = 10_000_000
SEMDEDUP_THR = (9025, 10000)  # τ=0.95 → τ² as an exact integer ratio

MMR_POOL, MMR_K = 50, 5
MMR_LAM = (7, 10)  # λ = 7/10 relevance weight, cross-multiplied


def mmr_search(sf_dir):
    """Maximal Marginal Relevance diversified top-k retrieval
    (Carbonell & Goldstein, SIGIR'98): greedily pick MMR_K results
    that balance closeness to the query (vec_id = 0's embedding)
    against redundancy with the already-selected set —
    argmax over candidates of  λ·(−d²(q,c)) + (1−λ)·min_{s∈S} d²(c,s),
    i.e. score = (den−num)·min_sel_dist − num·query_dist with
    λ = num/den kept as the exact integer cross-multiplication.

    Scale shape: relevance distances are exact integer squared-L2
    computed MAP-SIDE against the broadcast quantized query vector
    (zero shuffle); each batch emits only its partial top-MMR_POOL
    rows, so the single merge block holds blocks × MMR_POOL rows and
    the O(MMR_POOL · MMR_K) greedy runs once there. Integer
    fixed-point throughout (clustering.quantize_vectors, scale 1000)
    so the SQL oracle replays every greedy step bit-exactly.
    Reference parity: the reranking counterpart of fulltextindex
    query()'s relevance-ordered hits (fulltextindex.py:159-170) —
    diversification is a new-design training-data/RAG operator."""
    from ..stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qrow = (ds.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow").to_pandas())
    qv = np.floor(np.asarray(list(qrow["embedding"])[0], dtype=np.float64)
                  * EMB_SCALE).astype(np.int64)
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE)
    num, den = MMR_LAM

    def part(t: pa.Table) -> pa.Table:
        m = clustering._qmatrix(t["qv"])
        ids = t["vec_id"].to_numpy().astype(np.int64)
        keep = ids != 0
        m, ids = m[keep], ids[keep]
        diff = m - qv[None, :]
        qd = np.einsum("ij,ij->i", diff, diff)
        order = np.lexsort((ids, qd))[:MMR_POOL]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "qd": pa.array(qd[order], pa.int64()),
                         "qv": clustering._qv_column(m[order])})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["qd", "vec_id"], kind="mergesort")
              .head(MMR_POOL).reset_index(drop=True))
        mat = np.stack([np.asarray(v, dtype=np.int64) for v in df["qv"]])
        ids = df["vec_id"].to_numpy(np.int64)
        qd = df["qd"].to_numpy(np.int64)
        sel = [0]  # first pick = nearest to the query (ties: vec_id)
        while len(sel) < min(MMR_K, len(df)):
            rem = np.setdiff1d(np.arange(len(df)), sel)
            d = ((mat[rem][:, None, :] - mat[sel][None, :, :]) ** 2
                 ).sum(axis=2).min(axis=1)
            score = (den - num) * d - num * qd[rem]
            best = rem[np.lexsort((ids[rem], -score))[0]]
            sel.append(int(best))
        return pd.DataFrame({
            "rank": pd.Series(range(len(sel)), dtype="int64"),
            "vec_id": pd.Series(ids[sel], dtype="int64"),
            "qd": pd.Series(qd[sel], dtype="int64")})

    return _merge_partials(qds.map_batches(part, batch_format="pyarrow"),
                           merge)


def _mmr_sql() -> str:
    """Unrolled greedy replay of mmr_search (same discipline as
    _kmeans_ctes): candidate pool by (qd, vec_id), then MMR_K − 1
    steps of min-distance-to-selected + cross-multiplied argmax."""
    num, den = MMR_LAM
    li = "CAST(list_inner_product(%s, %s) AS BIGINT)"
    dist = ("(" + li % ("c.v", "c.v") + " + " + li % ("s.v", "s.v")
            + " - 2 * " + li % ("c.v", "s.v") + ")")
    ctes = [
        "b AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % EMB_SCALE,
        "q AS (SELECT v AS qv FROM b WHERE vec_id = 0)",
        "d AS (SELECT vec_id, v, " + li % ("v", "v") + " + "
        + li % ("qv", "qv") + " - 2 * " + li % ("v", "qv")
        + " AS qd FROM b, q WHERE vec_id <> 0)",
        "cand AS (SELECT * FROM d ORDER BY qd, vec_id LIMIT %d)" % MMR_POOL,
        "p0 AS (SELECT vec_id, v, qd FROM cand ORDER BY qd, vec_id LIMIT 1)",
        "sel0 AS (SELECT vec_id, v FROM p0)",
    ]
    for i in range(1, MMR_K):
        ctes.append(
            "m%d AS (SELECT c.vec_id, min(%s) AS md FROM cand c, sel%d s"
            " WHERE c.vec_id NOT IN (SELECT vec_id FROM sel%d)"
            " GROUP BY c.vec_id)" % (i, dist, i - 1, i - 1))
        ctes.append(
            "p%d AS (SELECT c.vec_id, c.v, c.qd FROM cand c"
            " JOIN m%d m ON m.vec_id = c.vec_id"
            " ORDER BY (%d * m.md - %d * c.qd) DESC, c.vec_id LIMIT 1)"
            % (i, i, den - num, num))
        ctes.append(
            "sel%d AS (SELECT * FROM sel%d"
            " UNION ALL SELECT vec_id, v FROM p%d)" % (i, i - 1, i))
    picks = " UNION ALL ".join(
        "SELECT CAST(%d AS BIGINT) AS rank, vec_id, CAST(qd AS BIGINT)"
        " AS qd FROM p%d" % (i, i) for i in range(MMR_K))
    return "WITH " + ",\n".join(ctes) + "\n" + picks


MMR_SQL = _mmr_sql()


def embed_kmeans(sf_dir):
    """Distributed integer k-means (Lloyd's, k=8, 2 iterations) over
    the embeddings table — stages/clustering.kmeans_int: quantized
    int64 vectors, map-side assignment against broadcast centroids,
    bounded (cluster, count, sumvec) partials per pass. Output =
    per-cluster size + exact integer inertia. The SQL oracle unrolls
    both Lloyd iterations (list_inner_product distances are exact:
    every intermediate stays < 2⁵³)."""
    from ..stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat)

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"cluster": t["cluster"].to_numpy(),
                           "dist": t["dist"].to_numpy()})
        g = df.groupby("cluster", as_index=False).agg(
            n=("dist", "size"), inertia=("dist", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", as_index=False)[["n", "inertia"]].sum()
        for c in ("cluster", "n", "inertia"):
            g[c] = g[c].astype("int64")
        return g

    return _merge_partials(
        ads.map_batches(part, batch_format="pyarrow"), merge)


def _kmeans_ctes(k: int, iterations: int, scale: int,
                 base: str) -> tuple[str, int]:
    """Shared CTE chain replaying kmeans_int bit-exactly. ``base`` is
    the SQL for the quantized vector table b(vec_id, v). Returns
    (ctes, final_assignment_index)."""
    ctes = [
        "q0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % scale,
        "b AS (%s)" % base,
        "n AS (SELECT vec_id, v,"
        " CAST(list_inner_product(v, v) AS BIGINT) AS nn FROM b)",
        "c0 AS (SELECT vec_id AS c, v, nn FROM n WHERE vec_id < %d)" % k,
    ]
    for i in range(1, iterations + 2):
        ctes.append(
            "d%d AS (SELECT n.vec_id, c.c, n.nn + c.nn"
            " - 2 * CAST(list_inner_product(n.v, c.v) AS BIGINT) AS dist"
            " FROM n, c%d c)" % (i, i - 1))
        ctes.append(
            "a%d AS (SELECT vec_id, c, dist FROM"
            " (SELECT vec_id, c, dist, row_number() OVER"
            " (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM d%d)"
            " WHERE rn = 1)" % (i, i))
        if i <= iterations:
            ctes.append(
                "u%d AS (SELECT a.c, UNNEST(range(1, len(n.v) + 1)) AS dim,"
                " UNNEST(n.v) AS val FROM a%d a"
                " JOIN n ON n.vec_id = a.vec_id)" % (i, i))
            ctes.append(
                "m%d AS (SELECT c, dim, FLOOR(SUM(val) / COUNT(*)) AS val"
                " FROM u%d GROUP BY c, dim)" % (i, i))
            ctes.append(
                "c%dl AS (SELECT c, list(val ORDER BY dim) AS v"
                " FROM m%d GROUP BY c)" % (i, i))
            ctes.append(
                "c%d AS (SELECT c, v,"
                " CAST(list_inner_product(v, v) AS BIGINT) AS nn"
                " FROM c%dl)" % (i, i))
    return ",\n".join(ctes), iterations + 1


_KM_CTES, _KM_FINAL = _kmeans_ctes(
    EMB_K, EMB_ITERS, EMB_SCALE, "SELECT vec_id, v FROM q0")

EMBED_KMEANS_SQL = """
WITH %s
SELECT c AS cluster, count(*) AS n, CAST(sum(dist) AS BIGINT) AS inertia
FROM a%d GROUP BY c
""" % (_KM_CTES, _KM_FINAL)


def topic_shards(sf_dir):
    """Topic sharding — the 'partition the corpus by embedding
    cluster' curation step (cluster-balanced training shards): k-means
    cluster each embedding, bucket-hash-join the cluster ids to the
    documents table (neither side broadcast), count docs per
    (cluster, source). The count is a bounded two-phase aggregate
    (k × sources cells)."""
    from ..stages import clustering
    from ..stages.joins import bucket_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(emb, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"], "cluster": t["cluster"]}),
        batch_format="pyarrow")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    joined = bucket_join(docs, ads, left_on="doc_id")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "source"]).size().reset_index(
            name="n_docs")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "source"], as_index=False)[
            "n_docs"].sum()
        g["cluster"] = g["cluster"].astype("int64")
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    return _merge_partials(
        joined.map_batches(part, batch_format="pandas"), merge)


TOPIC_SHARDS_SQL = """
WITH %s
SELECT a.c AS cluster, d.source, count(*) AS n_docs
FROM a%d a JOIN documents d ON d.doc_id = a.vec_id
GROUP BY a.c, d.source
""" % (_KM_CTES, _KM_FINAL)


def cluster_pseudo_labels(sf_dir):
    """Cluster-majority auto-labeling (pseudo-labeling / weak
    supervision for training-data curation): k-means the embedding
    space, take each cluster's majority gold label (ties → smallest
    label), stamp it on every member. Scale shape: the (cluster,
    label) vote is a BOUNDED k × L two-phase partial aggregate; the
    k-row majority map is a driver pull the size of the centroid set,
    broadcast back map-side — per-vector rows never shuffle after the
    one label bucket-join."""
    import ray

    from ..stages import clustering
    from ..stages.joins import bucket_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(emb, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"],
                            "cluster": t["cluster"]}),
        batch_format="pyarrow")
    labels = _read(sf_dir, "embeddings", columns=["vec_id", "label"])
    joined = bucket_join(labels, ads, left_on="vec_id").materialize()

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "label"]).size().reset_index(name="n")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cluster", "label"], as_index=False)["n"].sum()
        return g

    votes = _merge_partials(
        joined.map_batches(part, batch_format="pandas"),
        merge).take_all()  # ≤ k × L rows — bounded like the centroids
    best: dict[int, int] = {}
    for r in sorted(votes, key=lambda r: (r["cluster"], -r["n"],
                                          r["label"])):
        best.setdefault(int(r["cluster"]), int(r["label"]))
    ref = ray.put(best)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = df[["vec_id", "cluster"]].copy()
        out["cluster"] = out["cluster"].astype("int64")
        out["pseudo_label"] = (
            out["cluster"].map(m).astype("int64"))
        return out

    return joined.map_batches(attach, batch_format="pandas")


CLUSTER_PSEUDO_SQL = """
WITH %s,
lab AS (SELECT a.vec_id, a.c, e.label FROM a%d a
        JOIN embeddings e ON e.vec_id = a.vec_id),
cnt AS (SELECT c, label, count(*) AS n FROM lab GROUP BY c, label),
maj AS (SELECT c, label AS pseudo_label FROM
        (SELECT c, label, row_number() OVER
         (PARTITION BY c ORDER BY n DESC, label) AS rn FROM cnt)
        WHERE rn = 1)
SELECT l.vec_id, l.c AS cluster, m.pseudo_label
FROM lab l JOIN maj m ON m.c = l.c
""" % (_KM_CTES, _KM_FINAL)


PCA_ITERS = 2
PCA_NORM = 1000  # per-iteration max-abs renormalization target


def embed_pca_power(sf_dir):
    """Distributed EXACT-integer PCA (top principal direction of the
    uncentered second-moment matrix, power iteration): each batch
    reduces to the d×d partial Gram matrix qmatᵀ·qmat — the exchange
    carries d² = 4096 int64 cells regardless of row count, the
    canonical 'distributed linear algebra as a bounded partial
    aggregate' shape. The merged matrix is a driver pull the size of
    the centroid set (same contract as kmeans_int); the p=2 power
    iterations renormalize by max-abs to %d with TRUNCATING division
    (DuckDB's `//`), so every intermediate is an int64 the SQL oracle
    replays bit-exactly. Output: (dim, component) — the unnormalized
    top eigenvector direction."""
    from ..stages import clustering
    from ..stages.clustering import _qmatrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE)

    def cov_part(t: pa.Table) -> pa.Table:
        qmat = _qmatrix(t["qv"])
        if len(qmat) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        c = qmat.T @ qmat  # int64; |cells| ≤ rows·scale² ≪ 2⁶³
        d = c.shape[0]
        return pa.table({
            "i": pa.array(np.repeat(np.arange(1, d + 1), d), pa.int64()),
            "j": pa.array(np.tile(np.arange(1, d + 1), d), pa.int64()),
            "s": pa.array(c.reshape(-1), pa.int64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["i", "j"], as_index=False)["s"].sum()
        for c in ("i", "j", "s"):
            g[c] = g[c].astype("int64")
        return g

    cells = _merge_partials(
        qds.map_batches(cov_part, batch_format="pyarrow"), merge).take_all()
    d = max(r["i"] for r in cells)
    cov = np.zeros((d, d), np.int64)
    for r in cells:
        cov[r["i"] - 1, r["j"] - 1] = r["s"]

    v = np.ones(d, np.int64)
    for _ in range(PCA_ITERS):
        w = cov @ v
        m = np.abs(w).max()
        # DuckDB // truncates toward zero; mirror it exactly
        v = (np.sign(w) * ((np.abs(w) * PCA_NORM) // m)).astype(np.int64)

    return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                     "component": pa.array(v, pa.int64())})


def _pca_sql(iters: int, scale: int, norm: int, dim: int) -> str:
    ctes = [
        "q0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> FLOOR(CAST(x AS DOUBLE) * %d)) AS v FROM embeddings)" % scale,
        "u AS (SELECT vec_id, UNNEST(range(1, %d)) AS i, UNNEST(v) AS x"
        " FROM q0)" % (dim + 1),
        "cov AS (SELECT a.i AS i, b.i AS j,"
        " CAST(SUM(CAST(a.x AS BIGINT) * b.x) AS BIGINT) AS s"
        " FROM u a JOIN u b USING (vec_id) GROUP BY a.i, b.i)",
        "r0 AS (SELECT DISTINCT i, CAST(1 AS BIGINT) AS v FROM cov)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            "w%d AS (SELECT c.i, CAST(SUM(c.s * r.v) AS BIGINT) AS w"
            " FROM cov c JOIN r%d r ON r.i = c.j GROUP BY c.i)" % (k, k - 1))
        ctes.append("m%d AS (SELECT MAX(ABS(w)) AS m FROM w%d)" % (k, k))
        ctes.append(
            "r%d AS (SELECT i, (w * %d) // m AS v FROM w%d, m%d)"
            % (k, norm, k, k))
    return ("WITH %s\nSELECT i AS dim, CAST(v AS BIGINT) AS component"
            " FROM r%d" % (",\n".join(ctes), iters))


EMBED_PCA_SQL = _pca_sql(PCA_ITERS, EMB_SCALE, PCA_NORM, 64)


PROTO_DQ = 1 << 12  # distance-quantization step for the median:
# unit-norm embeddings × EMB_SCALE=1000 put ‖a−c‖² in [0, ~4·10⁶],
# so //2¹² gives a bounded ~10³-bucket histogram domain


def prototype_prune(sf_dir):
    """SSL-prototypes data pruning (Sorscher et al., 'Beyond neural
    scaling laws', 2022): drop the EASY half of each cluster — the
    examples closest to their prototype (centroid) — and keep the
    informative far half. The per-cluster median distance is read off
    a bounded (cluster, dist//2¹²) histogram (same cumulative-pick
    convention as source_token_quantiles), broadcast back, and the
    prune itself is a zero-shuffle map-side filter; distances are the
    exact integer k-means distances, so the SQL oracle replays the
    whole decision."""
    import ray

    from ..stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qds = clustering.quantize_vectors(ds, scale=EMB_SCALE).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat).map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"], "cluster": t["cluster"],
            "dist_bucket": pc.divide(t["dist"], PROTO_DQ)}),
        batch_format="pyarrow").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cluster", "dist_bucket"]).size()
             .reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cluster", "dist_bucket"],
                          as_index=False)["cnt"].sum()

    rows = _merge_partials(
        ads.map_batches(hist, batch_format="pandas"), merge).take_all()
    med: dict[int, int] = {}
    by_c: dict[int, list] = {}
    for r in rows:
        by_c.setdefault(int(r["cluster"]), []).append(
            (int(r["dist_bucket"]), int(r["cnt"])))
    for c, h in by_c.items():
        h.sort()
        n = sum(cnt for _, cnt in h)
        idx0, cum = (n - 1) // 2, 0
        for db, cnt in h:
            cum += cnt
            if cum > idx0:
                med[c] = db
                break
    ref = ray.put(med)

    def prune(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        cl = t["cluster"].to_numpy()
        db = t["dist_bucket"].to_numpy()
        thr = np.array([m[int(c)] for c in cl], np.int64)
        return t.filter(pa.array(db > thr))

    return ads.map_batches(prune, batch_format="pyarrow")


PROTO_PRUNE_SQL = """
WITH %s,
pb AS (SELECT vec_id, c, dist // %d AS db FROM a%d),
pr AS (SELECT c, db,
              row_number() OVER (PARTITION BY c ORDER BY db, vec_id) AS rn,
              count(*) OVER (PARTITION BY c) AS n
       FROM pb),
pmed AS (SELECT c, max(CASE WHEN rn = 1 + (n - 1) // 2 THEN db END) AS mdb
         FROM pr GROUP BY c)
SELECT pb.vec_id, pb.c AS cluster, pb.db AS dist_bucket
FROM pb JOIN pmed ON pmed.c = pb.c WHERE pb.db > pmed.mdb
""" % (_KM_CTES, PROTO_DQ, _KM_FINAL)


def semantic_dedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    flag within-cluster near-identical vectors (cos ≥ 0.95 via the
    exact cross-multiplied integer predicate; the smaller key is
    kept). Clones are PLANTED in integer space (vec_id%%10 → clone at
    +10⁷ with dim-0 + 1) so the expected duplicates exist and the SQL
    oracle derives the clone vectors from the originals exactly
    (floor(x)+1 == floor(x+1))."""
    from ..stages import clustering

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        from ..stages.clustering import _qmatrix, _qv_column

        keys = t["vec_id"].to_numpy()
        qmat = _qmatrix(t["qv"])
        mask = keys % 10 == 0
        clones = qmat[mask].copy()
        if len(clones):
            clones[:, 0] += 1
        return pa.table({
            "vec_id": pa.array(
                np.concatenate([keys, keys[mask] + SEMDEDUP_OFFSET]),
                pa.int64()),
            "qv": _qv_column(np.concatenate([qmat, clones])),
        })

    qds = (clustering.quantize_vectors(ds, scale=EMB_SCALE)
           .map_batches(plant, batch_format="pyarrow").materialize())
    ids, cmat = clustering.kmeans_int(qds, k=EMB_K, iterations=EMB_ITERS)
    ads = clustering.assign_clusters(qds, ids, cmat, carry_qv=True)
    return clustering.semdedup_flags(ads, thr_num=SEMDEDUP_THR[0],
                                     thr_den=SEMDEDUP_THR[1])


_SD_CTES, _SD_FINAL = _kmeans_ctes(
    EMB_K, EMB_ITERS, EMB_SCALE,
    "SELECT vec_id, v FROM q0 UNION ALL "
    "SELECT vec_id + %d, list_concat([v[1] + 1], list_slice(v, 2, len(v)))"
    " FROM q0 WHERE vec_id %% 10 = 0" % SEMDEDUP_OFFSET)

SEMANTIC_DEDUP_SQL = """
WITH %s,
p AS (
  SELECT y.vec_id AS kb,
         CAST(list_inner_product(nx.v, ny.v) AS BIGINT) AS dot,
         nx.nn AS na, ny.nn AS nb
  FROM a%d x JOIN a%d y ON x.c = y.c AND x.vec_id < y.vec_id
  JOIN n nx ON nx.vec_id = x.vec_id
  JOIN n ny ON ny.vec_id = y.vec_id
),
dup AS (SELECT DISTINCT kb FROM p
        WHERE dot > 0 AND dot * dot * %d >= %d * na * nb)
SELECT n.vec_id, (dup.kb IS NULL) AS kept
FROM n LEFT JOIN dup ON dup.kb = n.vec_id
""" % (_SD_CTES, _SD_FINAL, _SD_FINAL,
       SEMDEDUP_THR[1], SEMDEDUP_THR[0])


def canonicalize_cc(sf_dir):
    """distributed connected components over a chain graph derived from
    embeddings labels (edges = consecutive vec_ids within a label) —
    component representative must equal min vec_id per label."""
    import ray.data as rd

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(v) for v in g["vec_id"])
        a = ["v%08d" % ids[i] for i in range(len(ids) - 1)]
        b = ["v%08d" % ids[i + 1] for i in range(len(ids) - 1)]
        return pd.DataFrame({"uri_a": a, "uri_b": b})

    edges = ds.groupby("label").map_groups(chain, batch_format="pandas")
    labels = connected_components_distributed(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["node"].str[1:].astype("int64"),
            "canonical": df["label"].str[1:].astype("int64"),
        }),
        batch_format="pandas",
    )


CANON_CC_SQL = """
SELECT vec_id, min(vec_id) OVER (PARTITION BY label) AS canonical
FROM embeddings
"""


def canonicalize_cc_star(sf_dir):
    """Same component problem as canonicalize_cc, solved by the
    giant-component-safe alternating large-star/small-star contraction
    (flat pair state, vectorized per-bucket min — no member sets on
    any reducer). Same oracle: both algorithms must agree exactly."""
    import ray.data as rd

    from ..stages.canonicalize import connected_components_starcontract

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(v) for v in g["vec_id"])
        a = ["v%08d" % ids[i] for i in range(len(ids) - 1)]
        b = ["v%08d" % ids[i + 1] for i in range(len(ids) - 1)]
        return pd.DataFrame({"uri_a": a, "uri_b": b})

    edges = ds.groupby("label").map_groups(chain, batch_format="pandas")
    labels = connected_components_starcontract(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["node"].str[1:].astype("int64"),
            "canonical": df["label"].str[1:].astype("int64"),
        }),
        batch_format="pandas",
    )


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

    from .kg import sections_dataset
    from ..stages.canonicalize import (dedup_exact_triples, remap_triples,
                                       sameas_triples, union_find)
    from ..stages.mentions import MentionLinker, mention_triples
    from ..stages.triples import emit_meta_triples

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
    from ..stages.joins import bucket_join

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
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        oid, osc = [], []
        for i, txt in zip(ids, texts):
            toks = (txt or "").split()
            c = sum(1 for a, b in zip(toks, toks[1:])
                    if a == "window" and b == "join")
            if c:
                oid.append(i)
                osc.append(c)
        return pa.table({"doc_id": pa.array(oid, pa.int64()),
                         "n_hits": pa.array(osc, pa.int64())})

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
    from ..stages.triples import negative_samples

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
    from ..stages.dedup import _bucket_of

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


# ---------------------------------------------------------------------
# near-dup sketches — SQL-oracled where brute force / planted clones
# make the expected output exactly recomputable
# ---------------------------------------------------------------------

CLONE_OFFSET = 10_000_000


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
    from ..stages.dedup import containment_pairs

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
    from ..stages.dedup import build_minhash_index, neardup_vs_index

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
    from ..stages.dedup import cluster_representatives

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
    """Full SimHash pair output over the raw documents (rows-only: the
    Hamming distances of the natural word-edit near-dups depend on the
    64-bit word-hash family, which SQL cannot recompute)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup_pairs(ds, max_hamming=3)


def simhash_pairs_md5(sf_dir):
    """Fully-oracled SimHash: same banding operator, md5-prefix word
    hash family (dedup.simhash63_md5) so SQL recomputes every simhash
    bit-vote, every Hamming distance (bit_count(xor)) and therefore
    the complete pair set — pigeonhole-exact at max_hamming=3 with
    n_tables=4. simhash_pairs (the C-siphash throughput family) keeps
    its rows-only status + planted-recall sibling."""
    from ..stages.dedup import simhash63_md5

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
    from ..stages.similarity import knn_ivf

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
    from ..stages.textparse import parse_text_batch

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
    from ..stages.transform import salted_counts

    ds = _read(sf_dir, "documents", columns=["source"])
    return salted_counts(ds, "source", salt_n=8)


SALTED_SQL = """
SELECT source, count(*) AS n FROM documents GROUP BY source
"""


def xhtml_render(sf_dir):
    """XHTML+RDFa render sink over the flagship sections (rows-only:
    one xhtml doc per url)."""
    from ..sources.xhtml import render_xhtml

    return render_xhtml(_kg(sf_dir)["sections"])


def archived_versions(sf_dir):
    """archive-versioning operator: the non-latest recrawl rows
    (synthesizer plants an older version for doc_id % 17 == 0)."""
    from ..stages.composite import archive_versions

    pages = corpus.pages_dataset(sf_dir)
    arch = archive_versions(pages)
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
        from ..stages.dedup import _bucket_of
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
    from ..stages.composite import crawl_delta

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

    from ..stages.composite import composite_parse_batch
    from ..stages.parse_html import latest_per_url

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
    from ..stages.parse_html import latest_per_url

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

    from ..stages.embed_link import EmbedLinker

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
    from ..facet import label_map

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
    from ..stages.pii import pii_scan as scan_batch

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
    from ..stages.pii import PII_PATTERNS

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
    from ..stages.dedup import duplicated_passages

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
    from ..stages.dedup import scrub_duplicated_passages

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
    from ..stages.dedup import contamination_flags

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
    from ..stages.dedup import decontaminate

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
    from ..stages.profiling import profile_columns

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
    from ..sources.xhtml import render_xhtml

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
    from ..sources.xhtml import _HEAD

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
    from .curation import curate

    return curate(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _curation_sql() -> str:
    from ..stages.pii import PII_PATTERNS

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
    from ..stages.text_analysis import chunk_windows

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
    from ..stages.text_analysis import repetition_metrics

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
    from ..stages.transform import hash_split

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


# ---------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------

# --- multimodal: REAL decode paths driver-checked against SQL ---------
# No media table exists in testdata, so payloads are synthesized as a
# PURE doc_id-arithmetic function (the corpus convention), decoded by
# the zero-dependency parsers in stages/multimodal under strict=True
# (any parse failure raises — no silent fake fallback), and the
# recovered features compared to the same arithmetic in SQL. The
# perceptual hashes are exercised (decode must fully parse pixels) but
# asserted in unit tests — bit-level ahash is not SQL-expressible.

def _media_pool() -> tuple:
    """Autoscaling actor-pool bounds for the decode stages, capped at
    ncpu-2 like the linker pool (kg.py): a pool holding EVERY cpu
    starves the downstream task stage — deadlock at small test
    clusters, throughput cap at big ones."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return (2, max(2, ncpu - 2))


def _media_table(ids, media_type: str, payloads) -> pa.Table:
    from ..stages.multimodal import MEDIA_SCHEMA

    return pa.table({
        "media_id": pa.array([int(i) for i in ids], pa.int64()),
        "url": pa.array(["%s://%d" % (media_type, i) for i in ids],
                        pa.string()),
        "media_type": pa.array([media_type] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(["{}"] * len(ids), pa.string()),
    }, schema=MEDIA_SCHEMA)


def media_image_features(sf_dir):
    """P6 PPM payloads (w=8+id%5, h=8+id%3, deterministic pixels) →
    DecodeImage actor pool (small batches, pyarrow end to end) →
    recovered dimensions vs the synthesis arithmetic in SQL."""
    from ..stages.multimodal import DecodeImage, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 8 + i % 5, 8 + i % 3
            px = ((np.arange(w * h * 3) * 31 + i) % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        return _media_table(ids, "image", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, DecodeImage, concurrency=_media_pool(),
                           batch_size=256, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "width", "height", "decoded"]),
        batch_format="pyarrow")


MEDIA_IMAGE_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 5 AS INTEGER) AS width,
       CAST(8 + doc_id % 3 AS INTEGER) AS height,
       TRUE AS decoded
FROM documents
"""


MEDIA_DUP_PATTERNS = 25


def media_phash_dupes(sf_dir):
    """Image dedup by PERCEPTUAL hash over really-decoded pixels — the
    multimodal counterpart of exact text dedup: payloads are planted
    as doc_id %% 25 pattern clones, decoded by the DecodeImage actor
    pool (strict=True: the zero-dependency P6 decoder, no fakes),
    average-hashed, and grouped by the hash; each duplicate group
    keeps its min media_id. The oracle derives the groups purely from
    the planting arithmetic, so the pipeline matches ONLY if the real
    decode → downsample → average-hash round-trip is deterministic
    and collision-free across the 25 planted patterns. Group counts
    are bounded (≤ 25 phash keys), merged in one block."""
    from ..stages.multimodal import DecodeImage, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            p = i % MEDIA_DUP_PATTERNS
            w, h = 8 + p % 5, 8 + p % 3
            # per-pattern stride (spatial frequency) + phase keeps the
            # 25 thresholded 8×8 structures phash-distinct
            px = ((np.arange(w * h * 3) * (17 + 13 * p) + p)
                  % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        return _media_table(ids, "image", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, DecodeImage, concurrency=_media_pool(),
                           batch_size=256, strict=True)

    def part(t: pa.Table) -> pd.DataFrame:
        df = t.select(["media_id", "phash"]).to_pandas()
        g = df.groupby("phash", as_index=False).agg(
            rep_media_id=("media_id", "min"),
            n_copies=("media_id", "size"))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("phash", as_index=False).agg(
            rep_media_id=("rep_media_id", "min"),
            n_copies=("n_copies", "sum"))
        out = g[["rep_media_id", "n_copies"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        decoded.map_batches(part, batch_format="pyarrow"), merge)


MEDIA_PHASH_SQL = """
SELECT min(doc_id) AS rep_media_id, count(*) AS n_copies
FROM documents GROUP BY doc_id %% 25
""".replace("%%", "%")


def media_audio_features(sf_dir):
    """PCM WAV payloads (16 kHz mono int16, n=1600+(id%7)*160 frames)
    → ExtractAudioFeatures actor pool → recovered frame counts vs the
    synthesis arithmetic in SQL."""
    import io
    import wave

    from ..stages.multimodal import ExtractAudioFeatures, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            n = 1600 + (i % 7) * 160
            samples = ((np.arange(n) * (3 + i % 11)) % 65536 - 32768) \
                .astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
        return _media_table(ids, "audio", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, ExtractAudioFeatures,
                           concurrency=_media_pool(),
                           batch_size=256, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "n_samples", "decoded"]),
        batch_format="pyarrow")


MEDIA_AUDIO_SQL = """
SELECT doc_id AS media_id,
       CAST(1600 + (doc_id % 7) * 160 AS BIGINT) AS n_samples,
       TRUE AS decoded
FROM documents
"""


def media_video_frames(sf_dir):
    """Concatenated-PPM video streams (1+id%4 frames of 8×8) →
    SampleVideoFrames actor pool sampling every 2nd frame → sampled
    frame indices vs generate_series arithmetic in SQL (flat-map
    output: one row per sampled frame)."""
    from ..stages.multimodal import SampleVideoFrames, decode_stage

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            frames = []
            for f in range(1 + i % 4):
                px = ((np.arange(8 * 8 * 3) * 7 + i + f) % 256) \
                    .astype(np.uint8)
                frames.append(b"P6\n8 8\n255\n" + px.tobytes())
            payloads.append(b"".join(frames))
        return _media_table(ids, "video", payloads)

    media = (_read(sf_dir, "documents", columns=["doc_id"])
             .map_batches(synth, batch_format="pyarrow"))
    decoded = decode_stage(media, SampleVideoFrames,
                           concurrency=_media_pool(),
                           batch_size=128, every_n=2, strict=True)
    return decoded.map_batches(
        lambda t: t.select(["media_id", "frame_idx"]),
        batch_format="pyarrow")


MEDIA_VIDEO_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(generate_series(0, doc_id % 4, 2)) AS INTEGER)
           AS frame_idx
FROM documents
"""


# ---------------------------------------------------------------------
# graph analytics over the citation graph (graphanalyze.py:31-68 runs
# networkx pagerank/hits on a driver-collected edge list; here the
# edges stay distributed and the integer recurrences are replicated
# verbatim by unrolled SQL CTE chains — bit-exact, no float drift)
# ---------------------------------------------------------------------

_CITE_EDGES_SQL = f"""
  SELECT {PAGE_URL_SQL} AS src,
         'https://rfc.example.org/rfc/' || (100 + doc_id % 900) AS dst
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT {PAGE_URL_SQL},
         'https://rfc.example.org/rfc/2616'
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT {PAGE_URL_SQL},
         'https://spec.example.org/s/' || (doc_id % 50)
  FROM documents WHERE doc_id % 5 = 1
"""

_GRAPH_PRELUDE_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
"""


def _kg_edges(sf_dir):
    """Citation edge list, derived from the cached flagship triples
    ONCE per sf_dir and materialized (narrow src/dst — bounded by
    mention volume): the graph family calls this 10+ times per
    harness run, and unions like ``e.union(e.rev)`` would otherwise
    re-execute the citation_edges subtree twice per query."""
    cache = _kg(sf_dir)
    if "_edges" not in cache:
        e = facets.citation_edges(cache["triples"])

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["source_url"],
                             "dst": t["target_url"]})

        cache["_edges"] = (e.map_batches(rename, batch_format="pyarrow")
                           .materialize())
    return cache["_edges"]


PR_ITERS, PR_SCALE = 2, 10 ** 12


def kg_pagerank(sf_dir):
    """Integer PageRank over the real pipeline's citation edges
    (fragment-stripped dcterms:references), 2 iterations — every
    exchange bucketed, ranks materialized per round. SQL oracle
    unrolls the identical floor-division recurrence."""
    from ..stages import graph

    return graph.pagerank(_kg_edges(sf_dir), iterations=PR_ITERS,
                          scale=PR_SCALE)


WALK_LEN = 3


def kg_random_walks(sf_dir):
    """Deterministic DeepWalk corpus over the citation graph
    (graph.random_walks): one walk per node, 3 hops, hop k from node
    v = neighbor rank md5(start|k|v) % outdeg(v) in md5-ranked
    neighbor order; walks stop at sinks. The graph is SYMMETRIZED
    first (edges ∪ reversed — the DeepWalk undirected convention;
    the raw citation graph is bipartite page→target, so directed
    walks die after one hop). The ranked-neighbor table is one
    exchange, each hop one bucketed join with per-hop materialization
    (the pagerank loop discipline). SQL replays every hop with
    per-src row_number windows."""
    from ..stages import graph

    e = _kg_edges(sf_dir)

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    sym = e.union(e.map_batches(rev, batch_format="pyarrow"))
    return graph.random_walks(sym, length=WALK_LEN)


def _walks_sql(length: int) -> str:
    hop = """
w%(k)d AS (
  SELECT w.start, rk.dst AS node
  FROM w%(p)d w JOIN rk ON rk.src = w.node
   AND rk.r = CAST('0x' || substr(
         md5(w.start || '|%(k)d|' || w.node), 1, 15) AS BIGINT)
       %% rk.deg
)"""
    ctes = ["""sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
                            ORDER BY md5(dst), dst) - 1 AS r,
         count(*) OVER (PARTITION BY src) AS deg
  FROM sym
),
w0 AS (SELECT node AS start, node FROM nodes)"""]
    for k in range(1, length + 1):
        ctes.append(hop % {"k": k, "p": k - 1})
    selects = ["SELECT start, CAST(%d AS BIGINT) AS step, node FROM w%d"
               % (k, k) for k in range(length + 1)]
    return "%s,\n%s\n%s" % (_GRAPH_PRELUDE_SQL, ",".join(ctes),
                            "\nUNION ALL\n".join(selects))


KG_WALKS_SQL = _walks_sql(WALK_LEN)


BFS_DEPTH = 3


def _trusted_core_scan(e, with_labels: bool = False):
    """Symmetrize + materialize the citation edge list ONCE (seed
    scan and per-round joins share it) and scan its nodes for the
    deterministic md5-prefix trusted core — the single copy of the
    seed convention consumed by kg_bfs_depth / kg_label_propagation
    (kg_trustrank applies the same predicate per node via
    ``_trust_seed``). One hexdigest per node; ``with_labels`` adds
    the hex(md5[1]) % 3 ground-truth label column."""
    import hashlib

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    sym = e.union(e.map_batches(rev, batch_format="pyarrow")) \
        .materialize()

    def seed_rows(t: pa.Table) -> pd.DataFrame:
        nodes = set(t["src"].to_pylist()) | set(t["dst"].to_pylist())
        picked = []
        for n in sorted(nodes):
            h = hashlib.md5(n.encode()).hexdigest()
            if h[0] == "0":
                picked.append((n, int(h[1], 16) % 3))
        out = pd.DataFrame({"node": pd.Series([n for n, _ in picked],
                                              dtype="object")})
        if with_labels:
            out["label"] = pd.Series([v for _, v in picked],
                                     dtype="int64")
        return out

    return sym, sym.map_batches(seed_rows, batch_format="pyarrow")


def kg_bfs_depth(sf_dir):
    """Multi-source BFS distance (≤ 3 hops) from a deterministic seed
    set — nodes whose md5 starts with '0', a 1/16 'trusted pages'
    sample — over the SYMMETRIZED citation graph (the TrustRank /
    seed-propagation shape: how far is every page from a trusted
    core). graph.bfs_depth: per hop one bucketed frontier⋈edges join +
    one bucketed distinct, labeled-set anti-join via membership_join,
    per-hop materialization. The SQL oracle expands each hop as a
    NOT-IN-all-previous-levels frontier CTE."""
    from ..stages import graph

    sym, seeds = _trusted_core_scan(_kg_edges(sf_dir))
    return graph.bfs_depth(sym, seeds, max_depth=BFS_DEPTH)


def _bfs_sql(max_depth: int) -> str:
    ctes = [
        "edges0 AS (%s)" % _CITE_EDGES_SQL,
        "edges AS (SELECT src, dst FROM edges0"
        " UNION SELECT dst, src FROM edges0)",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "f0 AS (SELECT node FROM nodes WHERE substr(md5(node), 1, 1)"
        " = '0')",
    ]
    sel = ["SELECT node, CAST(0 AS BIGINT) AS depth FROM f0"]
    for k in range(1, max_depth + 1):
        excl = " AND ".join(
            "e.dst NOT IN (SELECT node FROM f%d)" % p for p in range(k))
        ctes.append(
            "f%d AS (SELECT DISTINCT e.dst AS node FROM edges e"
            " JOIN f%d ON f%d.node = e.src WHERE %s)"
            % (k, k - 1, k - 1, excl))
        sel.append("SELECT node, CAST(%d AS BIGINT) FROM f%d" % (k, k))
    return "WITH %s\n%s" % (",\n".join(ctes), "\nUNION ALL ".join(sel))


KG_BFS_SQL = _bfs_sql(BFS_DEPTH)


LP_ITERS = 2


def kg_label_propagation(sf_dir):
    """Semi-supervised node classification by label propagation
    (graph.label_propagation) over the symmetrized citation graph:
    the deterministic trusted core (md5-prefix '0', the
    kg_bfs_depth/kg_trustrank seed set) carries clamped ground-truth
    labels hex(md5[1]) % 3, and two synchronous majority rounds
    spread them to the unlabeled region (count desc, label asc tie
    break; unlabeled when no labeled in-neighbor). The SQL oracle
    unrolls each round as count → row_number argmax → clamp-union
    CTEs."""
    from ..stages import graph

    sym, seeds = _trusted_core_scan(_kg_edges(sf_dir),
                                    with_labels=True)
    return graph.label_propagation(sym, seeds, iterations=LP_ITERS)


def _labelprop_sql(iterations: int) -> str:
    ctes = [
        "edges0 AS (%s)" % _CITE_EDGES_SQL,
        "edges AS (SELECT src, dst FROM edges0"
        " UNION SELECT dst, src FROM edges0)",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "l0 AS (SELECT node, CAST('0x' || substr(md5(node), 2, 1)"
        " AS BIGINT) % 3 AS label FROM nodes"
        " WHERE substr(md5(node), 1, 1) = '0')",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            "c%d AS (SELECT e.dst AS node, p.label, count(*) AS c"
            " FROM edges e JOIN l%d p ON p.node = e.src"
            " GROUP BY e.dst, p.label)" % (k, k - 1))
        ctes.append(
            "p%d AS (SELECT node, label FROM"
            " (SELECT node, label, row_number() OVER (PARTITION BY node"
            " ORDER BY c DESC, label ASC) AS rn FROM c%d) WHERE rn = 1)"
            % (k, k))
        ctes.append(
            "l%d AS (SELECT node, label FROM l0 UNION ALL"
            " SELECT node, label FROM p%d"
            " WHERE node NOT IN (SELECT node FROM l0))" % (k, k))
    return "WITH %s\nSELECT node, CAST(label AS BIGINT) AS label FROM l%d" \
        % (",\n".join(ctes), iterations)


KG_LABELPROP_SQL = _labelprop_sql(LP_ITERS)


KCORE_K, KCORE_ROUNDS = 2, 4


def kg_kcore(sf_dir):
    """k-core of the symmetrized citation graph (graph.kcore, k=2,
    4 peel rounds — ≥ the corpus' true peel depth, so the output is
    the exact 2-core): the classic dense-subgraph curation step (thin
    link neighborhoods peel away; spam/mirror analysis keeps the
    core). Per round two bucketed semi-joins + one combiner-first
    degree exchange, materialized per round; the SQL oracle unrolls
    the identical peel recurrence."""
    from ..stages import graph

    return graph.kcore(_kg_edges(sf_dir), k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql(k: int, rounds: int) -> str:
    ctes = [
        "edges0 AS (%s)" % _CITE_EDGES_SQL,
        "edges AS (SELECT src, dst FROM (SELECT src, dst FROM edges0"
        " UNION SELECT dst, src FROM edges0) WHERE src <> dst)",
    ]
    prev = None
    for r in range(rounds):
        if prev is None:
            e_r = "edges"
        else:
            ctes.append(
                "e%d AS (SELECT e.src, e.dst FROM edges e"
                " JOIN %s a ON a.node = e.src"
                " JOIN %s b ON b.node = e.dst)" % (r, prev, prev))
            e_r = "e%d" % r
        ctes.append("d%d AS (SELECT src AS node, count(*) AS deg"
                    " FROM %s GROUP BY src)" % (r, e_r))
        ctes.append("a%d AS (SELECT node FROM d%d WHERE deg >= %d)"
                    % (r, r, k))
        prev = "a%d" % r
    return ("WITH %s\nSELECT node, CAST(deg AS BIGINT) AS deg"
            " FROM d%d WHERE deg >= %d"
            % (",\n".join(ctes), rounds - 1, k))


KG_KCORE_SQL = _kcore_sql(KCORE_K, KCORE_ROUNDS)


def kg_cocite_communities(sf_dir):
    """Community detection as connected components of the CO-CITATION
    graph (targets co-cited by any page form one topical community —
    the simplest web-graph clustering step). Reuses the hash-to-min CC
    machinery (canonicalize.connected_components_distributed) on a
    SECOND graph shape; the oracle computes true reachability closure
    with a recursive CTE (min reachable node == component id on a
    symmetrized graph), so this is the one CC query whose oracle does
    NOT come from planted construction."""
    from ..stages import graph
    from ..stages.canonicalize import connected_components_distributed

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir))

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"uri_a": t["a"], "uri_b": t["b"]})

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow"))
    return labels.map_batches(
        lambda df: pd.DataFrame({"node": df["node"],
                                 "component": df["label"]}),
        batch_format="pandas")


KG_COCITE_CC_SQL = f"""
WITH RECURSIVE edges AS ({_CITE_EDGES_SQL}),
pairs AS (SELECT DISTINCT e1.dst AS a, e2.dst AS b
          FROM edges e1 JOIN edges e2
            ON e1.src = e2.src AND e1.dst < e2.dst),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
nds AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nds
  UNION
  SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node)
SELECT node, min(lab) AS component FROM reach GROUP BY node
"""


JACC_N, JACC_D = 1, 10


def kg_mirror_candidates(sf_dir):
    """Mirror-site detection by in-link neighborhood overlap
    (graph.neighbor_jaccard): target pairs co-cited enough that
    Jaccard(in-links) ≥ 1/10, decided by the exact integer
    cross-multiplication — the 'two URLs are probably the same
    resource' signal used to fold mirrors before counting citations.
    Pair counts and in-degrees are bounded combiner aggregates;
    everything that crosses an exchange is (str, int64) rows."""
    from ..stages import graph

    return graph.neighbor_jaccard(_kg_edges(sf_dir), jn=JACC_N, jd=JACC_D)


KG_MIRROR_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS inter
          FROM edges e1 JOIN edges e2
               ON e1.src = e2.src AND e1.dst < e2.dst
          GROUP BY a, b),
ind AS (SELECT dst, count(*) AS d FROM edges GROUP BY dst)
SELECT p.a, p.b, p.inter, ia.d + ib.d - p.inter AS union_n
FROM pairs p JOIN ind ia ON ia.dst = p.a JOIN ind ib ON ib.dst = p.b
WHERE p.inter * {JACC_D} >= (ia.d + ib.d - p.inter) * {JACC_N}
"""


ANF_ROUNDS = 2


def kg_neighborhood_anf(sf_dir):
    """Approximate Neighborhood Function over the citation graph
    (graph.neighborhood_registers — ANF/HyperBall): per-node HLL
    register state of the radius-2 ball, the primitive behind
    neighborhood-size / effective-diameter estimation where the exact
    ball's quadratic state is unaffordable. Registers merge by max
    (associative — every exchange is a combiner), one join + one
    max-merge per round; the register state is pure integer
    arithmetic over the shared md5 hash, so SQL replays it EXACTLY by
    unrolling the 2-hop ball; the float estimator on top is
    hll_estimate (unit-tested in test_hll)."""
    from ..stages import graph

    return graph.neighborhood_registers(_kg_edges(sf_dir),
                                        rounds=ANF_ROUNDS)


KG_ANF_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
        ),
b0 AS (SELECT src AS v, src AS m FROM sym UNION SELECT dst, dst FROM sym),
b1 AS (SELECT v, m FROM b0 UNION
       SELECT s.dst, b.m FROM b0 b JOIN sym s ON s.src = b.v),
b2 AS (SELECT v, m FROM b1 UNION
       SELECT s.dst, b.m FROM b1 b JOIN sym s ON s.src = b.v),
h AS (SELECT v, CAST('0x' || substr(md5(m), 1, 15) AS BIGINT) AS hv
      FROM b2)
SELECT v AS node, hv % 256 AS reg,
       max(CASE WHEN hv // 256 = 0 THEN 53
                ELSE 52 - length(printf('%b', hv // 256)) + 1 END)
           AS max_rank
FROM h GROUP BY node, reg
"""


RA_SCALE, RA_MAXDEG, RA_TOPK = 10 ** 6, 64, 50


def kg_link_prediction(sf_dir):
    """Missing-link prediction over the citation graph by the
    resource-allocation index (graph.resource_allocation — Zhou, Lü
    & Zhang '09): non-adjacent pairs scored Σ floor(1e6/deg(z)) over
    common neighbors z of the symmetrized graph, hubs past deg 64
    skipped exactly (WHERE deg ≤ cap in both engines), deterministic
    top-50. The 'which cross-references are probably missing' signal
    for KG completion. Two bucketed exchanges (z-neighborhood
    partials, then pair merge + adjacency anti-join + local top-k),
    one bounded final block."""
    from ..stages import graph

    return graph.resource_allocation(
        _kg_edges(sf_dir), scale=RA_SCALE, max_degree=RA_MAXDEG,
        topk=RA_TOPK)


KG_LINKPRED_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
degz AS (SELECT src AS z, count(*) AS d FROM sym GROUP BY src),
pairs AS (
  SELECT x.dst AS a, y.dst AS b,
         CAST(sum({RA_SCALE} // g.d) AS BIGINT) AS score
  FROM sym x JOIN sym y ON x.src = y.src AND x.dst < y.dst
  JOIN degz g ON g.z = x.src
  WHERE g.d <= {RA_MAXDEG}
  GROUP BY a, b)
SELECT a, b, score FROM pairs p
WHERE score > 0
  AND NOT EXISTS (SELECT 1 FROM sym e WHERE e.src = p.a AND e.dst = p.b)
ORDER BY score DESC, a, b LIMIT {RA_TOPK}
"""


def _pagerank_sql(iterations: int, scale: int,
                  dn: int = 85, dd: int = 100) -> str:
    base = (scale * (dd - dn)) // dd
    ctes = ["r0 AS (SELECT node, CAST(%d AS BIGINT) AS r FROM nodes)"
            % scale]
    for k in range(1, iterations + 1):
        ctes.append(
            "r%d AS (SELECT n.node, CAST(%d + coalesce("
            "sum((%d * p.r) // (%d * o.d)), 0) AS BIGINT) AS r "
            "FROM nodes n "
            "LEFT JOIN edges e ON e.dst = n.node "
            "LEFT JOIN outdeg o ON o.src = e.src "
            "LEFT JOIN r%d p ON p.node = e.src "
            "GROUP BY n.node)" % (k, base, dn, dd, k - 1))
    return "%s,\n%s\nSELECT node, r AS pr FROM r%d" % (
        _GRAPH_PRELUDE_SQL, ",\n".join(ctes), iterations)


KG_PAGERANK_SQL = _pagerank_sql(PR_ITERS, PR_SCALE)


def _trust_seed(node: str) -> bool:
    """The deterministic 1/16 'trusted core' shared with
    kg_bfs_depth: nodes whose md5 hex starts with '0'. A pure
    function of the node string — seed membership never needs a
    broadcast table."""
    import hashlib

    return hashlib.md5(node.encode()).hexdigest()[0] == "0"


def kg_trustrank(sf_dir):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB'04) over
    the citation graph: personalized PageRank whose teleport set is
    the deterministic trusted core (md5-prefix seeds, the same set
    kg_bfs_depth measures hop distance from) — trust mass flows only
    out of seeds, so spam/orphan regions score 0 while kg_pagerank
    gives every node base mass. Same integer floor-division
    recurrence, exchanges and adaptive width as graph.pagerank
    (seed_fn branch); the SQL oracle unrolls it with the seed CASE
    on both r0 and the per-round base term."""
    from ..stages import graph

    return graph.pagerank(_kg_edges(sf_dir), iterations=PR_ITERS,
                          scale=PR_SCALE, seed_fn=_trust_seed)


def _trustrank_sql(iterations: int, scale: int,
                   dn: int = 85, dd: int = 100) -> str:
    base = (scale * (dd - dn)) // dd
    seed = "substr(md5(%s), 1, 1) = '0'"
    ctes = ["r0 AS (SELECT node, CAST(CASE WHEN %s THEN %d ELSE 0 END"
            " AS BIGINT) AS r FROM nodes)" % (seed % "node", scale)]
    for k in range(1, iterations + 1):
        ctes.append(
            "r%d AS (SELECT n.node, CAST("
            "CASE WHEN %s THEN %d ELSE 0 END + coalesce("
            "sum((%d * p.r) // (%d * o.d)), 0) AS BIGINT) AS r "
            "FROM nodes n "
            "LEFT JOIN edges e ON e.dst = n.node "
            "LEFT JOIN outdeg o ON o.src = e.src "
            "LEFT JOIN r%d p ON p.node = e.src "
            "GROUP BY n.node)" % (k, seed % "n.node", base, dn, dd, k - 1))
    return "%s,\n%s\nSELECT node, r AS pr FROM r%d" % (
        _GRAPH_PRELUDE_SQL, ",\n".join(ctes), iterations)


KG_TRUSTRANK_SQL = _trustrank_sql(PR_ITERS, PR_SCALE)

HITS_ITERS = 2


def kg_hits(sf_dir):
    """Integer HITS hub/authority over the citation edges (the
    reference's second networkx link-analysis metric,
    graphanalyze.py:33)."""
    from ..stages import graph

    return graph.hits(_kg_edges(sf_dir), iterations=HITS_ITERS)


def _hits_sql(iterations: int) -> str:
    ctes = ["h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes)"]
    for k in range(1, iterations + 1):
        ctes.append(
            "a%d AS (SELECT n.node, CAST(coalesce(sum(h.v), 0) AS BIGINT)"
            " AS v FROM nodes n "
            "LEFT JOIN edges e ON e.dst = n.node "
            "LEFT JOIN h%d h ON h.node = e.src GROUP BY n.node)"
            % (k, k - 1))
        ctes.append(
            "h%d AS (SELECT n.node, CAST(coalesce(sum(a.v), 0) AS BIGINT)"
            " AS v FROM nodes n "
            "LEFT JOIN edges e ON e.src = n.node "
            "LEFT JOIN a%d a ON a.node = e.dst GROUP BY n.node)"
            % (k, k))
    return ("%s,\n%s\nSELECT h.node, h.v AS hub, a.v AS auth "
            "FROM h%d h JOIN a%d a ON a.node = h.node"
            % (_GRAPH_PRELUDE_SQL, ",\n".join(ctes),
               iterations, iterations))


KG_HITS_SQL = _hits_sql(HITS_ITERS)


def kg_degree_dist(sf_dir):
    """In-degree distribution of the normalized citation graph
    (graphanalyze.py:537-575 citegraph degree distributions)."""
    from ..stages import graph

    return graph.degree_distribution(_kg_edges(sf_dir), col="dst")


KG_DEGREE_DIST_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL})
SELECT d AS degree, count(*) AS n_nodes
FROM (SELECT dst, count(*) AS d FROM edges GROUP BY dst)
GROUP BY d
"""


def kg_cocite_triangles(sf_dir):
    """Per-node triangle counts of the CO-CITATION graph (targets
    a<b<c pairwise co-cited — bibliometric coupling; the raw citation
    graph is bipartite page→target so it has no triangles itself).
    Pair building is src-bucketed with a deterministic hub cap,
    triangle enumeration is a wedge join + closing-edge semi-join over
    the materialized pair list (stages/graph.cocitation_pairs /
    triangle_counts)."""
    from ..stages import graph

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir))
    return graph.triangle_counts(pairs)


KG_TRIANGLES_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst
),
tri AS (
  SELECT p1.a, p1.b, p2.b AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.a = p1.b
  JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b
)
SELECT node, count(*) AS n_triangles
FROM (SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY node
"""


LM_K = 400  # < the corpus' 916 distinct bigrams → pruning + OOV real


def doc_lm_score(sf_dir):
    """CCNet-style LM quality score: train a pruned bigram model on
    the documents table (distributed counts, top-K kept, prefix
    totals over the FULL table), broadcast it, score every doc with
    integer credits. The SQL oracle replicates the identical
    floor-division arithmetic including the deterministic top-K
    tie-break."""
    from ..stages import lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lm.lm_score(docs, k_bigrams=LM_K)


DOC_LM_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
),
pairs AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i FROM toks)
),
big AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2),
pref AS (SELECT w1, sum(c) AS cp FROM big GROUP BY w1),
ranked AS (
  SELECT w1, w2, c,
         row_number() OVER (ORDER BY c DESC, w1 ASC, w2 ASC) AS rn
  FROM big
),
kept AS (
  SELECT r.w1, r.w2, CAST((r.c * 1000000) // p.cp AS BIGINT) AS credit
  FROM ranked r JOIN pref p ON p.w1 = r.w1 WHERE r.rn <= %(k)d
),
np AS (SELECT doc_id, greatest(len(w) - 1, 1) AS np FROM toks),
credits AS (
  SELECT p.doc_id, coalesce(k.credit, 0) AS credit
  FROM pairs p LEFT JOIN kept k ON k.w1 = p.w1 AND k.w2 = p.w2
)
SELECT n.doc_id,
       CAST(coalesce(sum(c.credit), 0) // n.np AS BIGINT) AS lm_score
FROM np n LEFT JOIN credits c ON c.doc_id = n.doc_id
GROUP BY n.doc_id, n.np
""" % {"k": LM_K}


# --- URL canonicalization / crawl-frontier dedup ----------------------
# Messy URLs planted by pure doc_id arithmetic: every doc_id maps to
# canonical target m = doc_id % 400 (so clones collide after
# normalization), with uppercase authority, explicit :443, tracking
# params, fragments and trailing slashes sprinkled by coprime moduli.
# The trailing-slash plant is exclusive with the kept query param
# (m % 4 != 0) so clones of one m always share ONE canonical form.


def _messy_url(doc_id: int) -> str:
    m = doc_id % 400
    host = "WWW.Example.org" if doc_id % 2 == 0 else "www.example.org"
    u = "https://" + host
    if doc_id % 3 == 0:
        u += ":443"
    u += "/path/" + str(m)
    if doc_id % 11 == 0 and m % 4 != 0:
        u += "/"
    params = []
    if doc_id % 5 == 0:
        params.append("utm_source=feed")
    if m % 4 == 0:
        params.append("page=" + str(m % 13))
    if doc_id % 5 == 0:
        params.append("gclid=" + str(doc_id % 9))
    if params:
        u += "?" + "&".join(params)
    if doc_id % 7 == 0:
        u += "#sec" + str(doc_id % 3)
    return u


_MESSY_URL_SQL = """
  'https://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.Example.org'
                     ELSE 'www.example.org' END
  || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
  || '/path/' || (doc_id % 400)
  || CASE WHEN doc_id % 11 = 0 AND doc_id % 400 % 4 <> 0
          THEN '/' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 AND doc_id % 400 % 4 = 0
          THEN '?utm_source=feed&page=' || (doc_id % 400 % 13)
               || '&gclid=' || (doc_id % 9)
          WHEN doc_id % 5 = 0
          THEN '?utm_source=feed&gclid=' || (doc_id % 9)
          WHEN doc_id % 400 % 4 = 0
          THEN '?page=' || (doc_id % 400 % 13)
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN '#sec' || (doc_id % 3)
          ELSE '' END"""

# the canonicalization chain as SQL — the IDENTICAL ordered rules (and
# RE2-identical patterns) as functions/url.canonical_url
_CANON_URL_SQL = r"""
canon AS (
  SELECT doc_id, url,
         regexp_replace(url, '#.*$', '') AS u1
  FROM messy
),
auth AS (
  SELECT doc_id, url, u1,
         regexp_extract(u1, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')
           AS a
  FROM canon
),
lowered AS (
  SELECT doc_id, url,
         lower(a) || substr(u1, len(a) + 1) AS u2
  FROM auth
),
unport AS (
  SELECT doc_id, url,
         regexp_replace(
           regexp_replace(u2, '^(http://[^/:?#]*):80($|[/?])',
                          '\1\2'),
           '^(https://[^/:?#]*):443($|[/?])', '\1\2') AS u3
  FROM lowered
),
unq AS (
  SELECT doc_id, url,
         CASE WHEN strpos(u3, '?') = 0 THEN u3
              ELSE substr(u3, 1, strpos(u3, '?') - 1)
                   || CASE WHEN kept = '' THEN '' ELSE '?' || kept END
         END AS u4
  FROM (SELECT doc_id, url, u3,
               -- array_to_string of an EMPTY list is NULL in DuckDB
               coalesce(array_to_string(list_filter(
                 string_split(substr(u3, strpos(u3, '?') + 1), '&'),
                 p -> NOT (p LIKE 'utm\_%' ESCAPE '\'
                           OR p LIKE 'gclid=%'
                           OR p LIKE 'fbclid=%')), '&'), '') AS kept
        FROM unport)
),
final AS (
  SELECT doc_id, url,
         regexp_replace(u4, '/+$', '') AS canonical_url
  FROM unq
)"""


BLOCKED_HOSTS = ("3.example.org", "7.example.org", "13.example.org")
_HOST_RE = "^[a-z]+://([^/:?#]*)"


def crawl_blocklist(sf_dir):
    """Domain blocklist gate — the first filter of every crawl
    curation recipe (C4 / RefinedWeb banned-domain lists): page URLs
    derived from the corpus arithmetic, host extracted with the SAME
    compiled authority pattern the oracle runs, blocked hosts dropped
    map-side against a broadcast frozenset. Zero shuffle; survivors
    keep (doc_id, url)."""
    import re

    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    ref = ray.put(frozenset(BLOCKED_HOSTS))
    host_re = re.compile(_HOST_RE)

    def gate(t: pa.Table) -> pa.Table:
        blocked = ray.get(ref)
        ids = t["doc_id"].to_pylist()
        urls = ["https://%s.example.org/d/%d" % (s[3:], i)
                for s, i in zip(t["source"].to_pylist(), ids)]
        keep = [host_re.match(u).group(1) not in blocked for u in urls]
        return pa.table({
            "doc_id": pa.array([i for i, k in zip(ids, keep) if k],
                               pa.int64()),
            "url": pa.array([u for u, k in zip(urls, keep) if k],
                            pa.string())})

    return ds.map_batches(gate, batch_format="pyarrow")


CRAWL_BLOCKLIST_SQL = f"""
WITH u AS (SELECT doc_id, {PAGE_URL_SQL} AS url FROM documents)
SELECT doc_id, url FROM u
WHERE regexp_extract(url, '{_HOST_RE}', 1) NOT IN
      ('3.example.org', '7.example.org', '13.example.org')
"""


def url_canonicalize(sf_dir):
    """URL canonicalization (functions/url.canonical_url): fragment
    drop, authority lowercasing, default-port strip, tracking-param
    removal, trailing-slash strip — per-doc (doc_id, url,
    canonical_url), the full normalizer output hash-checked against
    the identical SQL rule chain. Pure zero-shuffle map."""
    from ..functions.url import canonical_url

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def norm(t: pa.Table) -> pa.Table:
        ids = [int(i) for i in t["doc_id"].to_pylist()]
        urls = [_messy_url(i) for i in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "canonical_url": pa.array([canonical_url(u) for u in urls],
                                      pa.string()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


URL_CANON_SQL = """
WITH messy AS (
  SELECT doc_id, %s AS url FROM documents
),%s
SELECT doc_id, url, canonical_url FROM final
""" % (_MESSY_URL_SQL, _CANON_URL_SQL)


def url_frontier(sf_dir):
    """Crawl-frontier dedup on the canonical URL: one row per
    canonical target with its variant count and representative
    (min doc_id) — the recrawl-scheduling counterpart of
    latest_per_url, keyed on normalized identity instead of raw url.
    Canonical-url-hash bucketed exchange carrying only (canonical,
    doc_id) pairs."""
    from ..stages.dedup import _bucket_of

    ds = url_canonicalize(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("canonical_url", as_index=False).agg(
            n_docs=("doc_id", "size"), first_doc=("doc_id", "min"))
        out["_bucket"] = _bucket_of(out["canonical_url"], 64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("canonical_url", as_index=False).agg(
            n_docs=("n_docs", "sum"), first_doc=("first_doc", "min"))
        return pd.DataFrame({
            "canonical_url": out["canonical_url"].astype("object"),
            "n_docs": out["n_docs"].astype("int64"),
            "first_doc": out["first_doc"].astype("int64"),
        })

    return (ds.map_batches(part, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


URL_FRONTIER_SQL = """
WITH messy AS (
  SELECT doc_id, %s AS url FROM documents
),%s
SELECT canonical_url, count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM final GROUP BY canonical_url
""" % (_MESSY_URL_SQL, _CANON_URL_SQL)


def doc_winnow(sf_dir):
    """Winnowing local fingerprints (dedup.winnow_fingerprints, the
    MOSS algorithm, Schleimer et al. SIGMOD'03): word-5-gram hashes,
    window w=4, per-window rightmost minimum, each selected
    (position, hash) once. Doc-local zero-shuffle map; the SQL oracle
    recomputes every fingerprint via the same md5-prefix gram hash and
    a window-min + rightmost-argmax join."""
    from ..stages.dedup import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = winnow_fingerprints(ds, k=5, w=4)
    return out.map_batches(
        lambda df: df.rename(columns={"key": "doc_id"}),
        batch_format="pandas")


DOC_WINNOW_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (SELECT doc_id, ws,
             unnest(generate_series(1, len(ws) - 4)) AS i
      FROM words),
h AS (SELECT doc_id, i,
             CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')),
                                 1, 15) AS BIGINT) AS h
      FROM g),
n AS (SELECT doc_id, count(*) AS ng FROM h GROUP BY doc_id),
starts AS (SELECT h.doc_id, h.i AS s
           FROM h JOIN n USING (doc_id)
           WHERE h.i <= greatest(n.ng - 3, 1)),
wmin AS (SELECT s.doc_id, s.s, min(b.h) AS mh
         FROM starts s JOIN h b
           ON b.doc_id = s.doc_id AND b.i BETWEEN s.s AND s.s + 3
         GROUP BY s.doc_id, s.s),
sel AS (SELECT w.doc_id, max(b.i) AS pos, w.mh AS fp
        FROM wmin w JOIN h b
          ON b.doc_id = w.doc_id AND b.i BETWEEN w.s AND w.s + 3
         AND b.h = w.mh
        GROUP BY w.doc_id, w.s, w.mh)
SELECT DISTINCT doc_id, pos, fp FROM sel
"""


BPE_MERGES = 10


def doc_bpe_tokens(sf_dir):
    """Distributed BPE tokenizer training + encoding (stages/bpe,
    Sennrich et al. 2016): one word-count exchange reduces the corpus
    to its bounded (word, count) table, the merge loop runs on that
    table, the merge list broadcasts once, and encoding is a
    zero-shuffle per-actor-cached pass. Output = (doc_id,
    n_bpe_tokens). The SQL oracle unrolls every merge round
    (pair-count → deterministic argmax → delimited-string replace,
    which equals greedy leftmost merge application) so training AND
    encoding are recomputed bit-exactly."""
    from ..stages.bpe import bpe_token_counts

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_token_counts(docs, num_merges=BPE_MERGES)


def _bpe_sql(k: int) -> str:
    """Unrolled-CTE BPE oracle (the _pagerank_sql trick): each round
    recomputes pair counts over the delimited symbol strings, picks
    the (count DESC, a ASC, b ASC) argmax, and applies it via
    non-overlapping leftmost replace — verified equal to the greedy
    list merge. LEFT JOIN ON TRUE keeps the vocab when no pair
    remains."""
    ctes = ["""toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word
  FROM documents
),
wc AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
v0 AS (
  SELECT word, c,
         '|' || array_to_string(regexp_extract_all(word, '.'), '||')
             || '|' AS s
  FROM wc
)"""]
    for i in range(1, k + 1):
        ctes.append("""px%(i)d AS (
  SELECT c, sy, unnest(generate_series(1, len(sy) - 1)) AS j
  FROM (SELECT c, string_split(trim(s, '|'), '||') AS sy FROM v%(p)d)
),
p%(i)d AS (SELECT sy[j] AS a, sy[j + 1] AS b, sum(c) AS pc
       FROM px%(i)d GROUP BY a, b),
m%(i)d AS (SELECT a, b FROM p%(i)d
       ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
v%(i)d AS (
  SELECT v.word, v.c,
         CASE WHEN m.a IS NULL THEN v.s
              ELSE replace(v.s, '|' || m.a || '||' || m.b || '|',
                                '|' || m.a || m.b || '|') END AS s
  FROM v%(p)d v LEFT JOIN m%(i)d m ON TRUE
)""" % {"i": i, "p": i - 1})
    return """
WITH %s,
lens AS (SELECT word,
                len(string_split(trim(s, '|'), '||')) AS n
         FROM v%d)
SELECT t.doc_id, CAST(sum(l.n) AS BIGINT) AS n_bpe_tokens
FROM toks t JOIN lens l USING (word)
GROUP BY t.doc_id
""" % (",\n".join(ctes), k)


DOC_BPE_SQL = _bpe_sql(BPE_MERGES)


def doc_dsir_score(sf_dir):
    """DSIR-style importance weighting (lm.dsir_score, Xie et al.
    2023): hashed-unigram feature counts of the full corpus (source)
    vs the doc_id % 31 == 0 slice (target-domain sample) produce an
    integer weight per 2^16-bucket feature; every doc scores the sum
    of its tokens' weights. Feature hashing bounds the broadcast model
    by construction; the SQL oracle replicates the md5-prefix bucket,
    the add-1 floor-division weights and the multiplicity sum
    bit-exactly."""
    from ..stages import lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tgt_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.filter(pa.array(ids % 31 == 0))

    target = docs.map_batches(tgt_side, batch_format="pyarrow")
    return lm.dsir_score(docs, target)


DOC_DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
feat AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 65536 AS b
  FROM toks
),
src AS (SELECT b, count(*) AS c FROM feat GROUP BY b),
tgt AS (SELECT b, count(*) AS c
        FROM feat WHERE doc_id % 31 = 0 GROUP BY b),
wt AS (
  SELECT s.b,
         CAST(((coalesce(t.c, 0) + 1) * 1000000) // (s.c + 1)
              AS BIGINT) AS w
  FROM src s LEFT JOIN tgt t ON t.b = s.b
)
SELECT f.doc_id, CAST(sum(wt.w) AS BIGINT) AS dsir_score
FROM feat f JOIN wt ON wt.b = f.b
GROUP BY f.doc_id
"""


def orders_skyline(sf_dir):
    """Distributed skyline (Pareto front) over orders, maximizing
    (total price, order date) — the classic multi-criteria preference
    operator (Börzsönyi et al. ICDE'01 "The Skyline Operator";
    preference-query family). Scale shape: every batch computes its
    LOCAL front — a lossless combiner, since a globally non-dominated
    row is non-dominated in any subset containing it — and the fronts
    coalesce into ONE bounded merge block where the same sweep runs
    again (idempotent). The merge input is |batches| × local-front
    rows (front size is O(log n) expected under independent dims),
    never the table. Integer cents (q1 rounding discipline) + int64 µs
    dates so the NOT EXISTS dominance SQL matches bit-exactly."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def _front(df: pd.DataFrame) -> pd.DataFrame:
        # 2-D max/max sweep: sort by (cents desc, date desc); within an
        # equal-cents group only max-date rows can survive (a higher
        # date strictly dominates at equal cents), and the group
        # survives iff its max date exceeds every strictly-richer
        # group's max (running cummax of previous group maxima)
        df = (df.sort_values(["cents", "date_us"], ascending=False,
                             kind="mergesort").reset_index(drop=True))
        g = df.drop_duplicates("cents")[["cents", "date_us"]]
        best_above = g["date_us"].cummax().shift(1, fill_value=-1)
        alive = set(g.loc[g["date_us"].to_numpy()
                          > best_above.to_numpy(), "cents"])
        gmax = df.groupby("cents")["date_us"].transform("max")
        keep = (df["date_us"] == gmax) & df["cents"].isin(alive)
        return df[keep].reset_index(drop=True)

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        df = pd.DataFrame({
            "o_orderkey": t["o_orderkey"].to_pandas(),
            "cents": cents.to_pandas(),
            "date_us": pc.cast(t["o_orderdate"], pa.int64()).to_pandas(),
        })
        return _front(df)

    partials = ds.map_batches(prep, batch_format="pyarrow")
    return _merge_partials(partials, _front)


ORDERS_SKYLINE_SQL = """
WITH o AS (SELECT o_orderkey,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        epoch_us(o_orderdate) AS date_us FROM orders)
SELECT o_orderkey, cents, date_us FROM o a
WHERE NOT EXISTS (SELECT 1 FROM o b
  WHERE b.cents >= a.cents AND b.date_us >= a.date_us
    AND (b.cents > a.cents OR b.date_us > a.date_us))
"""


# 16 marker tokens: at the corpus' tiny 34-word vocabulary the
# within-class projection spread is ~260k (each doc's common words
# ride the same noisy weight vector), so the planted curated-register
# phrase must contribute >> that — 16 tokens separates the classes
# completely (oracle-measured acc 1.000 at sf0.001)
_CURATED_MARK = ("curated register marker corpus quality gold standard seal curated register marker corpus quality gold standard seal")


def doc_quality_classifier(sf_dir):
    """Trained quality classifier (lm.centroid_quality — the GPT-3
    data-curation recipe, Brown et al. 2020 appendix A: a linear
    classifier on hashed bag-of-words features separating 'curated'
    from raw text). The doc_id % 3 == 0 slice is labeled +1 AND given
    a curated-register marker phrase (the same planted-signal
    discipline as scrub/decontaminate), so the learned direction
    genuinely separates the classes; training is the exact-integer
    Rocchio / nearest-centroid rule — ONE bounded (<= 4097-row)
    class-sum exchange, the driver forms cross-multiplied centroid
    weights + midpoint threshold in arbitrary-precision ints (the
    bounded-centroid contract), and scoring is a broadcast
    zero-shuffle actor pool. The SQL oracle (HUGEINT arithmetic)
    replays the augmentation, the training sums and every score/pred
    bit-exactly."""
    from ..stages import lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def with_label(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        pos = ids % 3 == 0
        lab = np.where(pos, 1, -1).astype("int64")
        texts = [(txt or "") + (" " + _CURATED_MARK if p else "")
                 for p, txt in zip(pos, t["text"].to_pylist())]
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(texts, pa.string()),
                         "label": pa.array(lab, pa.int64())})

    labeled = ds.map_batches(with_label, batch_format="pyarrow")
    return lm.centroid_quality(labeled,
                               num_buckets=_exchange_buckets(sf_dir))


def _centroid_sql(d: int) -> str:
    """HUGEINT replay of lm.train_centroid_classifier +
    CentroidScorer: class-sum counts, cross-multiplied centroid
    weights w_f = N*S+_f - P*S-_f, midpoint threshold
    2*P*N*proj >= N*A + P*B."""
    return """
WITH aug AS (SELECT doc_id, text ||
  CASE WHEN doc_id %% 3 = 0 THEN ' curated register marker corpus quality gold standard seal curated register marker corpus quality gold standard seal'
  ELSE '' END AS text FROM documents),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM aug),
x AS (SELECT doc_id,
  CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) %% %d AS b,
  count(*) AS c FROM toks GROUP BY doc_id, b),
lab AS (SELECT doc_id,
  CASE WHEN doc_id %% 3 = 0 THEN 1 ELSE -1 END AS l FROM documents),
cls AS (SELECT b,
  sum(CASE WHEN l = 1 THEN c ELSE 0 END) AS sp,
  sum(CASE WHEN l = -1 THEN c ELSE 0 END) AS sn
  FROM x JOIN lab USING (doc_id) GROUP BY b),
pn AS (SELECT sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS p,
  sum(CASE WHEN l = -1 THEN 1 ELSE 0 END) AS n FROM lab),
w AS (SELECT b,
  CAST(pn.n AS HUGEINT) * sp - CAST(pn.p AS HUGEINT) * sn AS wv
  FROM cls, pn),
ab AS (SELECT sum(CAST(cls.sp AS HUGEINT) * w.wv) AS a,
  sum(CAST(cls.sn AS HUGEINT) * w.wv) AS bsum
  FROM cls JOIN w USING (b)),
proj AS (SELECT x.doc_id, sum(CAST(x.c AS HUGEINT) * w.wv) AS pr
  FROM x JOIN w USING (b) GROUP BY x.doc_id)
SELECT proj.doc_id, CAST(pr AS BIGINT) AS score,
  CAST(CASE WHEN 2 * CAST(pn.p AS HUGEINT) * pn.n * pr
    >= CAST(pn.n AS HUGEINT) * ab.a + CAST(pn.p AS HUGEINT) * ab.bsum
  THEN 1 ELSE -1 END AS BIGINT) AS pred
FROM proj, pn, ab
""" % (d)


DOC_QUALITY_CLASSIFIER_SQL = _centroid_sql(4096)


# ---------------------------------------------------------------------
# TPC-H fill-ins: Q6 / Q14 / Q19 / Q16 / Q8 shapes
# ---------------------------------------------------------------------
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): a pure
    filter-and-sum over the fact table — the zero-shuffle baseline
    every scan-heavy stage should degenerate to.

    Scale shape: predicate + per-batch cents partial entirely
    map-side (only 4 of 11 lineitem columns leave storage), one
    bounded single-row merge. The float discount crosses engines as
    round(l_discount*100) integer percent, so the BETWEEN 3 AND 7 is
    exact; revenue units are extprice-cents × discount-percent
    (1e-4 dollars), an integer product of two per-row roundings —
    no float sum exists on either side."""
    lo = np.datetime64(Q6_LO, "us").astype(np.int64)
    hi = np.datetime64(Q6_HI, "us").astype(np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        ship = (t["l_shipdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64))
        pct = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                           pa.scalar(100.0)),
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = t["l_quantity"].to_numpy()
        m = ((ship >= lo) & (ship < hi)
             & (pct >= 3) & (pct <= 7) & (qty < 25))
        return pd.DataFrame(
            {"revenue_e4": pd.Series([int((cents[m] * pct[m]).sum())],
                                     dtype="int64"),
             "n_items": pd.Series([int(m.sum())], dtype="int64")})

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount",
                        "l_extendedprice", "l_quantity"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"revenue_e4": pd.Series([int(df["revenue_e4"].sum())],
                                     dtype="int64"),
             "n_items": pd.Series([int(df["n_items"].sum())],
                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


Q6_SQL = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
            * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_e4,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '%s' AND l_shipdate < DATE '%s'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
  AND l_quantity < 25
""" % (Q6_LO, Q6_HI)


Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"


def q14_promo_revenue(sf_dir):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue that came from PROMO-type parts — a fact ⋈ dimension join
    whose output is a single ratio.

    Scale shape: the month filter + per-row cents land map-side, and
    each lineitem batch pre-reduces to (partkey → cents) partials (a
    lossless combiner) before ONE partkey-hash-bucketed tagged
    exchange against the part side's (partkey, is_promo) rows — the
    part table is NOT broadcast (every part matters here, unlike a
    filtered dimension leg, so at 10⁹ parts a broadcast dict would be
    the skeleton_entities anti-pattern). Each bucket inner-joins and
    emits one (promo_cents, total_cents) partial; the ratio is exact
    integer permille in the single-block merge, so no float division
    crosses engines."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    lo, hi = np.datetime64(Q14_LO), np.datetime64(Q14_HI)
    COLS = ["pkey", "cents", "promo", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        ship = t["l_shipdate"].to_numpy()
        m = (ship >= lo) & (ship < hi)
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy()[m],
                           "cents": cents[m]})
        p = df.groupby("pkey", as_index=False)["cents"].sum()
        p["cents"] = p["cents"].astype("int64")
        p["promo"] = np.int64(-1)
        return _tag_bucket(p, buckets, 0, COLS, key="pkey")

    def prep_pt(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "pkey": t["p_partkey"].to_numpy(),
            "cents": np.zeros(t.num_rows, np.int64),
            "promo": (t["p_type"].to_numpy(zero_copy_only=False)
                      == "PROMO").astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS, key="pkey")

    def bucket_sums(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0][["pkey", "cents"]]
        pt_ = g[g["_side"] == 1][["pkey", "promo"]]
        j = li_.merge(pt_, on="pkey", how="inner")
        c = j["cents"].to_numpy()
        return pd.DataFrame(
            {"promo_cents": pd.Series(
                [int(c[j["promo"].to_numpy() == 1].sum())],
                dtype="int64"),
             "total_cents": pd.Series([int(c.sum())], dtype="int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])
    pt = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(pt.map_batches(prep_pt, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_sums, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        promo = int(df["promo_cents"].sum())
        total = int(df["total_cents"].sum())
        return pd.DataFrame(
            {"promo_cents": pd.Series([promo], dtype="int64"),
             "total_cents": pd.Series([total], dtype="int64"),
             "promo_permille": pd.Series(
                 [(1000 * promo) // max(total, 1)], dtype="int64")})

    return _merge_partials(per_bucket, final)


Q14_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS c
  FROM lineitem
  WHERE l_shipdate >= DATE '%s' AND l_shipdate < DATE '%s')
SELECT CAST(coalesce(sum(CASE WHEN p.p_type = 'PROMO' THEN li.c END), 0)
            AS BIGINT) AS promo_cents,
       CAST(coalesce(sum(li.c), 0) AS BIGINT) AS total_cents,
       CAST((1000 * coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN li.c END), 0))
            // greatest(coalesce(sum(li.c), 0), 1) AS BIGINT)
         AS promo_permille
FROM li JOIN part p ON p.p_partkey = li.l_partkey
""" % (Q14_LO, Q14_HI)


# (brand, size_lo..size_hi, qty_lo..qty_hi) — brands are disjoint so a
# part matches at most one bracket
Q19_BRACKETS = (("Brand#12", 1, 5, 1, 11),
                ("Brand#23", 1, 10, 10, 20),
                ("Brand#15", 1, 15, 20, 30))


def q19_bracket_revenue(sf_dir):
    """TPC-H Q19 shape (discounted revenue): a disjunction of
    three (brand, size-range, quantity-range) brackets spanning BOTH
    join sides — the predicate that defeats naive pushdown because
    no single conjunct applies to either table alone.

    Scale shape: the bracket predicates select a small fraction of
    parts, so the part side reduces to a broadcast dict
    partkey → (qty_lo, qty_hi) built from a pruned 3-column read
    (the filtered-dimension-leg contract of q3_shipping; at 10⁹
    parts swap in joins.bucket_join). The lineitem pass is then
    zero-shuffle: map each row's partkey, range-check its quantity,
    sum cents per batch, merge one bounded block."""
    import ray

    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    bracket_keys = []
    for brand, slo, shi, qlo, qhi in Q19_BRACKETS:
        m = ((pt["p_brand"] == brand)
             & (pt["p_size"] >= slo) & (pt["p_size"] <= shi))
        bracket_keys.append(
            (frozenset(pt.loc[m, "p_partkey"].astype(int)), qlo, qhi))
    ref = ray.put(bracket_keys)

    def partial(t: pa.Table) -> pd.DataFrame:
        brackets = ray.get(ref)
        pk = pd.Series(t["l_partkey"].to_numpy())
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        m = np.zeros(len(pk), dtype=bool)
        for keys, qlo, qhi in brackets:  # 3 vectorized passes
            m |= pk.isin(keys).to_numpy() & (qty >= qlo) & (qty <= qhi)
        return pd.DataFrame(
            {"revenue_cents": pd.Series([int(cents[m].sum())],
                                        dtype="int64"),
             "n_items": pd.Series([int(m.sum())], dtype="int64")})

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"revenue_cents": pd.Series([int(df["revenue_cents"].sum())],
                                        dtype="int64"),
             "n_items": pd.Series([int(df["n_items"].sum())],
                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


Q19_SQL = """
SELECT CAST(coalesce(sum(
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE %s
""" % " OR ".join(
    "(p.p_brand = '%s' AND p.p_size BETWEEN %d AND %d "
    "AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN %d AND %d)"
    % b for b in Q19_BRACKETS)


Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
Q16_EXCL_BRAND = "Brand#5"
Q16_MIN_BAL = 2000  # suppliers below this are excluded ("complaints")


def q16_supplier_count(sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    suppliers per (brand, type, size) for a filtered part family,
    excluding a supplier blocklist — COUNT(DISTINCT) whose groups
    span the whole fact table, with lineitem standing in for
    partsupp as the part↔supplier association.

    Scale shape: the filtered part attributes broadcast as
    partkey → (brand, type, size) (filtered-dimension contract) and
    the blocklist as a set; each lineitem batch projects to
    batch-locally-deduped (suppkey, brand, type, size) rows — the
    dedup is the combiner — before ONE suppkey-hash-bucketed
    exchange. A supplier's rows land in exactly one bucket, so the
    per-bucket global dedup makes per-group distinct-counts additive
    across buckets; the ≤ brands×types×sizes merge is bounded."""
    import ray

    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_type",
                        "p_size"]).to_pandas()
    pt = pt[pt["p_size"].isin(Q16_SIZES)
            & (pt["p_brand"] != Q16_EXCL_BRAND)]
    pk = pt["p_partkey"].astype(int)
    brand_of = dict(zip(pk, pt["p_brand"]))
    type_of = dict(zip(pk, pt["p_type"]))
    size_of = dict(zip(pk, pt["p_size"].astype(int)))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(sup.loc[sup["s_acctbal"] < Q16_MIN_BAL, "s_suppkey"]
              .astype(int))
    ref = ray.put((brand_of, type_of, size_of, bad))
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def prep(t: pa.Table) -> pd.DataFrame:
        brand_, type_, size_, bad_ = ray.get(ref)
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy()})
        df = df[df["pkey"].isin(brand_) & ~df["skey"].isin(bad_)]
        df = df.drop_duplicates()  # batch-local combiner
        out = pd.DataFrame({
            "skey": df["skey"].to_numpy(),
            "p_brand": df["pkey"].map(brand_).to_numpy(),
            "p_type": df["pkey"].map(type_).to_numpy(),
            "p_size": df["pkey"].map(size_).to_numpy(np.int64)})
        out = out.drop_duplicates()
        h = pd.util.hash_pandas_object(out["skey"], index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["skey", "p_brand", "p_type", "p_size"])
        out = (g.groupby(["p_brand", "p_type", "p_size"],
                         as_index=False).size()
               .rename(columns={"size": "supplier_cnt"}))
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    per_bucket = (li.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_counts, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["p_brand", "p_type", "p_size"],
                          as_index=False)["supplier_cnt"].sum()
               .sort_values(["supplier_cnt", "p_brand",
                             "p_type", "p_size"],
                            ascending=[False, True, True, True])
               .reset_index(drop=True))
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


Q16_SQL = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (%s) AND p.p_brand <> '%s'
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < %d)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""" % (", ".join(str(s) for s in Q16_SIZES), Q16_EXCL_BRAND, Q16_MIN_BAL)


Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"


def q8_market_share(sf_dir):
    """TPC-H Q8 shape (national market share): per order-year, the
    permille of region-ASIA customers' ECONOMY-part revenue supplied
    by one target nation — a ratio whose numerator and denominator
    share the same join tree. The target nation derives from the
    data (nation of the lowest-suppkey supplier), so every scale
    factor is non-degenerate and the SQL oracle replays the rule.

    Scale shape: part-type filter and supplier→nation map broadcast
    (filtered-dimension / q5 contract); the customer arm is a
    SEMI-join of orders against the region's customers through
    ``joins.membership_join`` (keyset broadcast ≤ threshold, Bloom +
    exact hash-partitioned recheck above — forced-path tested);
    lineitem pre-reduces per batch to
    (okey → total_cents, nation_cents) — a lossless combiner —
    before the single orderkey-bucketed tagged exchange against
    region+window-filtered orders (okey, year). Each bucket joins
    and emits bounded per-year (num, den) partials; the permille is
    exact integer division in the one-block merge."""
    import ray

    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"])
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region_nk = set(nat.loc[nat["n_regionkey"].isin(rk),
                            "n_nationkey"].astype(int))
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = dict(zip(sup["s_suppkey"].astype(int),
                   sup["s_nationkey"].astype(int)))
    target_nk = s2n[min(s2n)]  # data-derived: nation of supplier #min
    pt = _read(sf_dir, "part",
               columns=["p_partkey", "p_type"]).to_pandas()
    pkeys = set(pt.loc[pt["p_type"] == Q8_TYPE, "p_partkey"].astype(int))
    ref = ray.put((pkeys, s2n, target_nk))
    buckets = _exchange_buckets(sf_dir, "lineitem")
    lo, hi = np.datetime64(Q8_LO), np.datetime64(Q8_HI)
    COLS = ["okey", "cents", "nat_cents", "year", "_bucket", "_side"]

    region_list = sorted(region_nk)

    def cust_region(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(
            t["c_nationkey"],
            value_set=pa.array(region_list,
                               type=t.schema.field("c_nationkey").type)))
        return t.select(["c_custkey"])

    cust_keys = (_read(sf_dir, "customer",
                       columns=["c_custkey", "c_nationkey"])
                 .map_batches(cust_region, batch_format="pyarrow"))

    def od_window(t: pa.Table) -> pa.Table:
        od_np = t["o_orderdate"].to_numpy()
        keep = (od_np >= lo) & (od_np < hi)
        return t.filter(pa.array(keep))

    od_member = joins.membership_join(
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(od_window, batch_format="pyarrow"),
        "o_custkey", cust_keys, keys_col="c_custkey", mode="semi")

    def prep_li(t: pa.Table) -> pd.DataFrame:
        pkeys_, s2n_, tnk = ray.get(ref)
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = pc.cast(pc.round(pc.multiply(disc, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy(),
                           "cents": cents})
        df = df[df["pkey"].isin(pkeys_)]
        isn = df["skey"].map(s2n_).to_numpy() == tnk
        df = df.assign(nat_cents=np.where(isn, df["cents"], 0))
        p = df.groupby("okey", as_index=False)[
            ["cents", "nat_cents"]].sum()
        p["cents"] = p["cents"].astype("int64")
        p["nat_cents"] = p["nat_cents"].astype("int64")
        p["year"] = np.int64(0)
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_od(t: pa.Table) -> pd.DataFrame:
        od = t["o_orderdate"].to_numpy()
        okey = t["o_orderkey"].to_numpy()
        yr = (od.astype("datetime64[Y]").astype(np.int64) + 1970)
        p = pd.DataFrame({"okey": okey,
                          "cents": np.zeros(len(okey), np.int64),
                          "nat_cents": np.zeros(len(okey), np.int64),
                          "year": yr.astype(np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_share(g: pd.DataFrame) -> pd.DataFrame:
        li_ = g[g["_side"] == 0][["okey", "cents", "nat_cents"]]
        od_ = g[g["_side"] == 1][["okey", "year"]]
        j = li_.merge(od_, on="okey", how="inner")
        out = j.groupby("year", as_index=False)[
            ["cents", "nat_cents"]].sum()
        return pd.DataFrame({
            "o_year": out["year"].astype("int64"),
            "nation_cents": out["nat_cents"].astype("int64"),
            "total_cents": out["cents"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_partkey",
                        "l_extendedprice", "l_discount"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od_member.map_batches(prep_od,
                                           batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_share, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("o_year", as_index=False)[
            ["nation_cents", "total_cents"]].sum()
               .sort_values("o_year").reset_index(drop=True))
        num = out["nation_cents"].to_numpy()
        den = np.maximum(out["total_cents"].to_numpy(), 1)
        out["share_permille"] = (1000 * num) // den
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


QUANTILE_PERMILLES = (500, 950, 990)
RADIX_SHIFT = 12  # pass-1 buckets = cents >> 12 (bounded, ≤ 2^14 here)


def orders_price_percentiles(sf_dir):
    """Exact order statistics without a sort: P50/P95/P99 of the
    order price by TWO-PASS RADIX SELECTION — the primitive that
    replaces `ds.sort` + offset when only ranks are wanted (a global
    sort of 100 TB is an all-to-all; this is two zero-shuffle
    histogram passes).

    Pass 1 histograms the high bits (cents >> 12 — a bounded-domain
    combiner, ≤2^14 cells at any data scale for this column; widen
    the shift for wider domains), the cumulative walk pins each
    target rank to one high-bucket + residual rank; pass 2
    histograms full values inside only the ≤3 selected buckets
    (pruned map-side) and walks to the exact value. Ranks are
    ceil(q·N) so the SQL row_number oracle replays them; ties are
    value-ties, so rank→value is engine-independent."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        hi = cents_of(t) >> RADIX_SHIFT
        out = (pd.DataFrame({"hi": hi})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["hi"] = out["hi"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []  # (q_permille, hi_bucket, residual_rank)
    for q in QUANTILE_PERMILLES:
        k = (q * n_total + 999) // 1000  # ceil(q·N)
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((q, int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for _, hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["v"] = out["v"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    out_rows = []
    for q, hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        j = int(np.searchsorted(c, resid))
        out_rows.append((q, int(vals[m][j])))
    return pd.DataFrame({
        "q_permille": pd.Series([r[0] for r in out_rows],
                                dtype="int64"),
        "cents": pd.Series([r[1] for r in out_rows], dtype="int64")})


ORDERS_PCTL_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
ks AS (
  SELECT q, (q * n.n + 999) // 1000 AS k
  FROM (VALUES (%s)) qs(q), n)
SELECT CAST(ks.q AS BIGINT) AS q_permille,
       CAST(r.v AS BIGINT) AS cents
FROM ks JOIN r ON r.rn = ks.k
ORDER BY 1
""" % "), (".join(str(q) for q in QUANTILE_PERMILLES)


WINSOR_PERMILLES = (50, 950)  # clip bounds for the robust mean


def orders_winsorized_mean(sf_dir):
    """Winsorized (clipped) robust mean of the order price — the
    outlier-resistant aggregate a billing/metrics pipeline reports
    when heavy tails would swamp a plain mean: values are CLIPPED to
    the exact [P05, P95] before averaging. Reuses the two-pass radix
    selection of ``orders_price_percentiles`` for the exact bounds
    (rank = ceil(q·N), value-ties engine-independent), then one more
    zero-shuffle pass sums the clipped values as integer cents —
    three streaming passes total, no sort, no exchange anywhere.

    Output: the bounds and mean_milli = 1000·Σclip // N, all exact
    integers; SQL replays the ranks via row_number and the clip via
    greatest/least."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        hi = cents_of(t) >> RADIX_SHIFT
        out = (pd.DataFrame({"hi": hi})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []
    for q in WINSOR_PERMILLES:
        k = (q * n_total + 999) // 1000
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    bounds = []
    for hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        bounds.append(int(vals[m][int(np.searchsorted(c, resid))]))
    lo_c, hi_c = bounds

    def clipped_sum(t: pa.Table) -> pd.DataFrame:
        v = np.clip(cents_of(t), lo_c, hi_c)
        return pd.DataFrame({"s": [int(v.sum())],
                             "n": [len(v)]}).astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        s, n = int(df["s"].sum()), int(df["n"].sum())
        return pd.DataFrame({
            "lo_cents": pd.Series([lo_c], dtype="int64"),
            "hi_cents": pd.Series([hi_c], dtype="int64"),
            "n": pd.Series([n], dtype="int64"),
            "mean_milli": pd.Series([(s * 1000) // n],
                                    dtype="int64")})

    return _merge_partials(
        ds.map_batches(clipped_sum, batch_format="pyarrow"), final)


ORDERS_WINSOR_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
b AS (
  SELECT min(v) FILTER (rn = (%d * n.n + 999) // 1000) AS lo,
         min(v) FILTER (rn = (%d * n.n + 999) // 1000) AS hi
  FROM r, n GROUP BY n.n)
SELECT CAST(b.lo AS BIGINT) AS lo_cents,
       CAST(b.hi AS BIGINT) AS hi_cents,
       CAST(n.n AS BIGINT) AS n,
       CAST(sum(greatest(b.lo, least(b.hi, c.v))) * 1000 // n.n
            AS BIGINT) AS mean_milli
FROM c, b, n GROUP BY b.lo, b.hi, n.n
""" % WINSOR_PERMILLES


def key_skew_profile(sf_dir):
    """Partition-skew diagnosis (the pre-shuffle audit that decides
    whether a key needs salting BEFORE a 100-TB groupby is launched):
    the distribution of per-key row counts, reported as a log₂-bucket
    histogram — bucket k holds keys with 2^k ≤ count < 2^(k+1), with
    key- and row-mass per bucket. A heavy tail at high buckets means
    hot keys (salt them, q.v. salted_source_counts); a flat profile
    licenses plain hash partitioning.

    Scale shape: per-batch (key → count) partials (lossless combiner)
    feed ONE key-bucketed exchange; each bucket finalizes its keys'
    counts, takes the frexp exponent vectorized (exact — no float
    log₂ at engine boundaries; SQL replays via the binary-string
    length), and emits bounded ≤64-cell histogram partials; one merge
    block sums."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy()})
             .groupby("u", as_index=False).size()
             .rename(columns={"size": "cnt"}))
        p["cnt"] = p["cnt"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby("u", as_index=False)["cnt"].sum()
             ["cnt"].to_numpy(np.int64))
        lb = np.frexp(c.astype(np.float64))[1] - 1  # floor(log2), exact
        out = (pd.DataFrame({"log2_bucket": lb, "cnt": c})
               .groupby("log2_bucket", as_index=False)
               .agg(n_keys=("cnt", "size"), n_rows=("cnt", "sum")))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("log2_bucket", as_index=False)
               [["n_keys", "n_rows"]].sum()
               .sort_values("log2_bucket").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, final)


KEY_SKEW_SQL = """
WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
SELECT CAST(length(format('{:b}', c)) - 1 AS BIGINT) AS log2_bucket,
       count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows
FROM c GROUP BY 1 ORDER BY 1
"""


def orders_benford_audit(sf_dir):
    """Benford's-law first-digit audit of the order totals — the
    fraud/data-quality screen an ingest pipeline runs on any
    money-like column (fabricated values flatten the leading-digit
    curve; Benford '38, Nigrini '96 — public literature). Reports
    per leading digit the count and the exact milli-share, plus the
    Benford expectation in milli (floor(1000·log10(1+1/d)) — a
    CONSTANT table, so no float computed from data crosses engines).

    Scale shape: the 9-cell digit histogram is a bounded-domain
    per-batch combiner — zero shuffle at any scale; the leading
    digit comes off the integer cents' decimal string in both
    engines."""
    benford_milli = {d: int(np.floor(1000 * np.log10(1 + 1 / d)))
                     for d in range(1, 10)}

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        first = (pd.Series(cents).astype(str).str[0]
                 .astype(np.int64))
        out = (pd.DataFrame({"digit": first})
               .groupby("digit", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("digit", as_index=False)["n"].sum()
               .sort_values("digit").reset_index(drop=True))
        total = int(out["n"].sum())
        out["share_milli"] = (out["n"] * 1000) // total
        out["benford_milli"] = out["digit"].map(benford_milli)
        return out.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_BENFORD_SQL = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
h AS (SELECT digit, count(*) AS n FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
SELECT h.digit, CAST(h.n AS BIGINT) AS n,
       CAST(h.n * 1000 // t.total AS BIGINT) AS share_milli,
       CAST(floor(1000 * log10(1 + 1.0 / h.digit)) AS BIGINT)
         AS benford_milli
FROM h, t ORDER BY h.digit
"""


def orderkey_join_stats(sf_dir):
    """EXACT join-cardinality statistics for lineitem ⋈ orders on
    orderkey — the question every optimizer answers with a sketch,
    answered exactly in one pass: |join| = Σ_k cnt_li(k)·cnt_od(k),
    plus distinct keys on each side and in the intersection. This is
    the pre-flight a 100-TB join runs to choose broadcast vs shuffle
    vs salt (pairs with key_skew_profile).

    Scale shape: per-batch (key, side) → count partials (lossless
    combiner) ride ONE key-bucketed tagged exchange; each bucket
    finalizes both sides' counts, multiplies vectorized, and emits a
    single 5-integer partial row; one merge block sums. Nothing but
    narrow count rows ever crosses the wire."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["k", "n", "_bucket", "_side"]

    def prep(col):
        def f(t: pa.Table) -> pd.DataFrame:
            p = (pd.DataFrame({"k": t[col].to_numpy()})
                 .groupby("k", as_index=False).size()
                 .rename(columns={"size": "n"}))
            p["n"] = p["n"].astype("int64")
            return _tag_bucket(p, buckets, 0 if col[0] == "l" else 1,
                               COLS, key="k")
        return f

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0].groupby("k", as_index=False)
               ["n"].sum())
        od_ = (g[g["_side"] == 1].groupby("k", as_index=False)
               ["n"].sum())
        j = li_.merge(od_, on="k", how="outer",
                      suffixes=("_l", "_o"))
        # outer-merge NaNs upcast to float64 — restore exact int64
        # before any product (the >2^53 exactness discipline)
        j["n_l"] = j["n_l"].fillna(0).astype("int64")
        j["n_o"] = j["n_o"].fillna(0).astype("int64")
        both = (j["n_l"] > 0) & (j["n_o"] > 0)
        return pd.DataFrame({
            "join_rows": [int((j["n_l"] * j["n_o"]).sum())],
            "li_keys": [int((j["n_l"] > 0).sum())],
            "od_keys": [int((j["n_o"] > 0).sum())],
            "both_keys": [int(both.sum())],
            "max_key_rows": [int((j["n_l"] * j["n_o"]).max())
                             if len(j) else 0]}).astype("int64")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    od = _read(sf_dir, "orders", columns=["o_orderkey"])
    tagged = (li.map_batches(prep("l_orderkey"),
                             batch_format="pyarrow")
              .union(od.map_batches(prep("o_orderkey"),
                                    batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "join_rows": [int(df["join_rows"].sum())],
            "li_keys": [int(df["li_keys"].sum())],
            "od_keys": [int(df["od_keys"].sum())],
            "both_keys": [int(df["both_keys"].sum())],
            "max_key_rows": [int(df["max_key_rows"].max())
                             if len(df) else 0]}).astype("int64")

    return _merge_partials(per_bucket, final)


JOIN_STATS_SQL = """
WITH l AS (SELECT l_orderkey AS k, count(*) AS n
           FROM lineitem GROUP BY 1),
o AS (SELECT o_orderkey AS k, count(*) AS n
      FROM orders GROUP BY 1),
j AS (SELECT coalesce(l.k, o.k) AS k,
             coalesce(l.n, 0) AS nl, coalesce(o.n, 0) AS no
      FROM l FULL OUTER JOIN o ON l.k = o.k)
SELECT CAST(sum(nl * no) AS BIGINT) AS join_rows,
       CAST(count(*) FILTER (nl > 0) AS BIGINT) AS li_keys,
       CAST(count(*) FILTER (no > 0) AS BIGINT) AS od_keys,
       CAST(count(*) FILTER (nl > 0 AND no > 0) AS BIGINT)
         AS both_keys,
       CAST(max(nl * no) AS BIGINT) AS max_key_rows
FROM j
"""


def brand_revenue_hhi(sf_dir):
    """Market-concentration audit: the Herfindahl–Hirschman index of
    brand revenue shares in exact integer units — HHI_micro =
    (10⁶·Σc_b²) // (Σc_b)², the regulator's concentration screen and
    the curation pipeline's source-dominance check (one brand owning
    the corpus is a sampling hazard; pairs with source_lang_gini,
    which is the same rational family as impurity rather than
    concentration). Revenue in per-row-rounded integer cents — the
    q1 discipline — so the squared sums replay exactly.

    Scale shape: brand revenue is a bounded-domain per-batch combiner
    (the brand dimension rides a bucket_join in brand_revenue; here
    only (brand, cents) partials move), the squared-share arithmetic
    happens in the one coalesced merge block — zero data shuffle."""
    from ..stages.joins import bucket_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "cents": c})

    joined = bucket_join(li.map_batches(cents, batch_format="pyarrow"),
                         part, left_on="l_partkey",
                         right_on="p_partkey")

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "brand": t["p_brand"].to_pandas().astype(object),
            "cents": t["cents"].to_numpy()})
        out = df.groupby("brand", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby("brand", as_index=False)["cents"].sum()
        total = int(b["cents"].sum())
        sumsq = int((b["cents"].astype(object) ** 2).sum())
        hhi = (1_000_000 * sumsq) // (total * total)
        top = b.sort_values(["cents", "brand"],
                            ascending=[False, True]).iloc[0]
        return pd.DataFrame({
            "n_brands": pd.Series([len(b)], dtype="int64"),
            "hhi_micro": pd.Series([hhi], dtype="int64"),
            "top_brand": pd.Series([top["brand"]], dtype=object),
            "top_share_milli": pd.Series(
                [(int(top["cents"]) * 1000) // total], dtype="int64")})

    return _merge_partials(
        joined.map_batches(partial, batch_format="pyarrow"), final)


BRAND_HHI_SQL = """
WITH b AS (
  SELECT p_brand AS brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT)
               AS sumsq,
             count(*) AS n_brands
      FROM b),
top AS (SELECT brand, cents FROM b
        ORDER BY cents DESC, brand LIMIT 1)
SELECT t.n_brands,
       CAST(1000000 * t.sumsq
            // (CAST(t.total AS HUGEINT) * t.total) AS BIGINT)
         AS hhi_micro,
       top.brand AS top_brand,
       CAST(top.cents * 1000 // t.total AS BIGINT) AS top_share_milli
FROM t, top
"""


ANALYZE_COLS = ("o_orderkey", "o_custkey", "o_totalprice",
                "o_orderdate")


def orders_analyze_stats(sf_dir):
    """ANALYZE TABLE — the catalog-statistics pass every optimizer
    (and every zone-map builder) runs: per numeric/date column, the
    EXACT distinct-value count, null count, min and max, normalized
    to int64 (cents for money, µs for dates) so one uniform schema
    carries every column.

    Scale shape: min/max/nulls are per-batch combiners (exact, zero
    shuffle); exact NDV is the one statistic that needs an exchange,
    and ALL columns share a single (col, value)-bucketed exchange of
    batch-local DISTINCT pairs (the dedup-combiner discipline:
    batch-distinct bounds the exchange by distinct-per-batch, and
    per-bucket nunique is additive because a (col, value) pair lives
    in exactly one bucket). Compare approximate twins: hll_user
    registers trade this exactness for fixed memory at 10¹² keys."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def to_i64(t: pa.Table, col: str) -> np.ndarray:
        a = t[col]
        if pa.types.is_timestamp(a.type):
            return a.to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
        if pa.types.is_floating(a.type):
            return pc.cast(pc.round(pc.multiply(a, pa.scalar(100.0)),
                                    round_mode="half_towards_infinity"),
                           pa.int64()).to_numpy()
        return a.to_numpy().astype(np.int64)

    def prep_pairs(t: pa.Table) -> pd.DataFrame:
        outs = []
        for ci, col in enumerate(ANALYZE_COLS):
            v = np.unique(to_i64(t, col))
            outs.append(pd.DataFrame({
                "ci": np.full(len(v), ci, np.int64), "v": v}))
        p = pd.concat(outs, ignore_index=True)
        h = pd.util.hash_pandas_object(
            p["ci"] * np.int64(1_000_003) + p["v"],
            index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_ndv(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates(["ci", "v"])
               .groupby("ci", as_index=False).size()
               .rename(columns={"size": "ndv"}))
        return out.astype("int64")

    def prep_minmax(t: pa.Table) -> pd.DataFrame:
        rows = []
        for ci, col in enumerate(ANALYZE_COLS):
            nulls = int(pc.sum(pc.is_null(t[col])).as_py() or 0)
            v = to_i64(t.filter(pc.is_valid(t[col])), col) \
                if nulls else to_i64(t, col)
            rows.append((ci, nulls,
                         int(v.min()) if len(v) else np.iinfo(np.int64).max,
                         int(v.max()) if len(v) else np.iinfo(np.int64).min))
        return pd.DataFrame(rows, columns=["ci", "nulls", "mn", "mx"]) \
            .astype("int64")

    ds = _read(sf_dir, "orders", columns=list(ANALYZE_COLS))
    ndv = (ds.map_batches(prep_pairs, batch_format="pyarrow")
           .groupby("_bucket")
           .map_groups(bucket_ndv, batch_format="pandas")
           .to_pandas()
           .groupby("ci", as_index=False)["ndv"].sum())
    mm = (ds.map_batches(prep_minmax, batch_format="pyarrow")
          .to_pandas()
          .groupby("ci", as_index=False)
          .agg(nulls=("nulls", "sum"), mn=("mn", "min"),
               mx=("mx", "max")))
    out = mm.merge(ndv, on="ci").sort_values("ci")
    return pd.DataFrame({
        "column": pd.Series([ANALYZE_COLS[int(i)]
                             for i in out["ci"]], dtype=object),
        "ndv": out["ndv"].astype("int64").reset_index(drop=True),
        "nulls": out["nulls"].astype("int64").reset_index(drop=True),
        "min_i64": out["mn"].astype("int64").reset_index(drop=True),
        "max_i64": out["mx"].astype("int64").reset_index(drop=True)})


ORDERS_ANALYZE_SQL = """
WITH n AS (
  SELECT 'o_orderkey' AS col, 0 AS ci,
         count(DISTINCT o_orderkey) AS ndv,
         count(*) - count(o_orderkey) AS nulls,
         CAST(min(o_orderkey) AS BIGINT) AS min_i64,
         CAST(max(o_orderkey) AS BIGINT) AS max_i64
  FROM orders
  UNION ALL
  SELECT 'o_custkey', 1, count(DISTINCT o_custkey),
         count(*) - count(o_custkey),
         CAST(min(o_custkey) AS BIGINT),
         CAST(max(o_custkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', 2,
         count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)),
         count(*) - count(o_totalprice),
         CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT),
         CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate', 3, count(DISTINCT o_orderdate),
         count(*) - count(o_orderdate),
         CAST(epoch_us(min(o_orderdate)) AS BIGINT),
         CAST(epoch_us(max(o_orderdate)) AS BIGINT)
  FROM orders)
SELECT col AS "column", CAST(ndv AS BIGINT) AS ndv,
       CAST(nulls AS BIGINT) AS nulls, min_i64, max_i64
FROM n ORDER BY ci
"""


def q20_excess_suppliers(sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped quantity of some widget part EXCEEDS half that part's
    stock — the doubly-nested EXISTS (partsupp ⋈ agg-subquery on
    lineitem) restated over the available tables: stock derives
    deterministically from the part dimension (avail = (p_size+5)·4,
    pure arithmetic both engines replay), and the output ranks
    suppliers by how many parts they overshipped. Completes the
    TPC-H sweep (q9/q12 live as brand_revenue/priority_lineitems).

    Scale shape: lineitem pre-reduces to (pkey, skey) → Σqty partials
    (lossless combiner); the widget-filtered part arm rides the SAME
    pkey-bucketed tagged exchange (the q14 discipline — every part
    matters, so no broadcast); each bucket finalizes sums, applies
    the exact integer 2·Σqty > avail predicate and emits (skey,
    n_excess) partials — additive because a (pkey, skey) pair lives
    in exactly one bucket; names resolve for EXACTLY the result's
    suppkeys via ``joins.resolve_keys`` (the key set is the output
    itself — never the whole dimension)."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["pkey", "skey", "q", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        df = pd.DataFrame({"pkey": t["l_partkey"].to_numpy(),
                           "skey": t["l_suppkey"].to_numpy(),
                           "q": qty})
        p = df.groupby(["pkey", "skey"], as_index=False)["q"].sum()
        p["q"] = p["q"].astype("int64")
        return _tag_bucket(p, buckets, 0, COLS, key="pkey")

    def prep_part(t: pa.Table) -> pd.DataFrame:
        m = pc.match_substring(t["p_name"], "widget").to_numpy(
            zero_copy_only=False)
        keys = t["p_partkey"].to_numpy()[m]
        size = t["p_size"].to_numpy()[m].astype(np.int64)
        p = pd.DataFrame({"pkey": keys,
                          "skey": np.zeros(len(keys), np.int64),
                          "q": (size + 5) * 4})  # q carries avail
        return _tag_bucket(p, buckets, 1, COLS, key="pkey")

    def bucket_excess(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0]
               .groupby(["pkey", "skey"], as_index=False)["q"].sum())
        pa_ = g[g["_side"] == 1][["pkey", "q"]] \
            .rename(columns={"q": "avail"})
        j = li_.merge(pa_, on="pkey", how="inner")
        j = j[2 * j["q"].to_numpy() > j["avail"].to_numpy()]
        out = (j.groupby("skey", as_index=False)
               .agg(excess_parts=("pkey", "nunique")))
        return out.astype("int64")

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_name", "p_size"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(part.map_batches(prep_part,
                                      batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_excess, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("skey", as_index=False)
               ["excess_parts"].sum()
               .sort_values(["excess_parts", "skey"],
                            ascending=[False, True])
               .reset_index(drop=True))
        return out.astype("int64")

    out = _merge_partials(per_bucket, final).to_pandas()
    names = joins.resolve_keys(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", out["skey"], "s_name")
    return pd.DataFrame({
        "s_suppkey": out["skey"].astype("int64"),
        "s_name": out["skey"].map(names).astype(object),
        "excess_parts": out["excess_parts"].astype("int64")})


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
pa AS (
  SELECT p_partkey, (p_size + 5) * 4 AS avail
  FROM part WHERE p_name LIKE '%widget%'),
x AS (
  SELECT sk, count(DISTINCT pk) AS excess_parts
  FROM ps JOIN pa ON pk = p_partkey
  WHERE 2 * q > avail GROUP BY 1)
SELECT s.s_suppkey, s.s_name,
       CAST(x.excess_parts AS BIGINT) AS excess_parts
FROM x JOIN supplier s ON s.s_suppkey = x.sk
ORDER BY excess_parts DESC, s.s_suppkey
"""


def audience_overlap_matrix(sf_dir):
    """Audience overlap — |users(A) ∩ users(B)| for every event-type
    pair, the segmentation cross-tab ad/analytics systems compute
    with per-segment bitmap indexes: a user's type SET is one ≤2^5
    mask, the mask HISTOGRAM is a bounded sufficient statistic, and
    every pairwise intersection reads off it by popcount arithmetic —
    no per-pair distinct-count pass, no |types|² scans.

    Scale shape: batch-local (user, bit) dedup+sum partials (the
    events_daily_type_mask OR-combiner, without the day axis) feed
    ONE user-bucketed exchange; buckets OR partial masks and emit the
    bounded ≤2^|types| histogram; the merge derives all pairs from
    the histogram in one vectorized pass. SQL replays via per-user
    bool flags and sum-of-products."""
    buckets = _exchange_buckets(sf_dir, "events")
    nbits = len(EVENT_TYPE_BITS)
    types = sorted(EVENT_TYPE_BITS)  # bit i = types[i] (1,2,4,8,16)

    def prep(t: pa.Table) -> pd.DataFrame:
        bit = (pd.Series(t["event_type"].to_pylist())
               .map(EVENT_TYPE_BITS).to_numpy(np.int64))
        df = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                            "bit": bit}).drop_duplicates())
        p = df.groupby("u", as_index=False)["bit"].sum()
        p = p.rename(columns={"bit": "mask"})
        p["mask"] = p["mask"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        m = g["mask"].to_numpy()
        bits = pd.DataFrame({"u": g["u"].to_numpy()})
        for i in range(nbits):
            bits["b%d" % i] = (m >> i) & 1
        mx = bits.groupby("u", as_index=False).max()
        mask = np.zeros(len(mx), np.int64)
        for i in range(nbits):
            mask += mx["b%d" % i].to_numpy(np.int64) << i
        out = (pd.DataFrame({"mask": mask})
               .groupby("mask", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("mask", as_index=False)["n"].sum()
        masks = h["mask"].to_numpy(np.int64)
        counts = h["n"].to_numpy(np.int64)
        rows = []
        for i, ta in enumerate(types):
            for k, tb in enumerate(types):
                if i > k:
                    continue
                sel = ((masks >> i) & 1) & ((masks >> k) & 1)
                rows.append((ta, tb, int(counts[sel == 1].sum())))
        out = pd.DataFrame(rows, columns=["type_a", "type_b",
                                          "n_users"])
        out["type_a"] = out["type_a"].astype(object)
        out["type_b"] = out["type_b"].astype(object)
        out["n_users"] = out["n_users"].astype("int64")
        return out.sort_values(["type_a", "type_b"]) \
            .reset_index(drop=True)

    return _merge_partials(per_bucket, final)


AUDIENCE_OVERLAP_SQL = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchase,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           AS signup,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_
  FROM events GROUP BY 1),
p AS (
  SELECT a.type_a, b.type_b FROM
    (VALUES ('click'), ('error'), ('purchase'), ('signup'),
            ('view')) a(type_a),
    (VALUES ('click'), ('error'), ('purchase'), ('signup'),
            ('view')) b(type_b)
  WHERE a.type_a <= b.type_b)
SELECT p.type_a, p.type_b,
       CAST(sum((CASE p.type_a WHEN 'click' THEN click
                 WHEN 'error' THEN error WHEN 'purchase' THEN purchase
                 WHEN 'signup' THEN signup ELSE view_ END)
                * (CASE p.type_b WHEN 'click' THEN click
                   WHEN 'error' THEN error
                   WHEN 'purchase' THEN purchase
                   WHEN 'signup' THEN signup ELSE view_ END))
            AS BIGINT) AS n_users
FROM f, p GROUP BY 1, 2 ORDER BY 1, 2
"""


TREND_EPOCH_H = 473_352  # 2024-01-01 UTC in epoch-hours — x origin


def events_value_trend(sf_dir):
    """Grouped OLS trend via sufficient statistics — per event type,
    the least-squares slope of value over time from the classic
    closed form slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), computed
    in ONE streaming pass: the five sufficient statistics (n, Σx,
    Σy, Σxy, Σx²) are per-batch integer partials (x = seconds since
    a fixed epoch, y = milli-value — every term exact), and the
    numerator/denominator finalize as arbitrary-precision Python
    ints in the bounded merge (HUGEINT in the oracle). The result
    IS the (num, den) integer pair — no float division, no
    floor-vs-truncate sign hazard crosses engines; consumers divide.

    This is the trend-detection primitive every metrics pipeline
    wants per segment, in the same one-pass family as
    source_embedding_coherence (variance identity) and the IVM
    Δ-law: aggregates maintained from mergeable statistics."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        # HOUR ticks: x ≤ ~10³ keeps n²·Var(x) (the denominator)
        # inside int64 through sf0.1 and beyond — the tick unit is
        # the overflow knob (seconds blow int64 at n ≈ 2·10⁴)
        x = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 3_600_000_000) - TREND_EPOCH_H
        y = pc.cast(pc.round(pc.multiply(t["value"],
                                         pa.scalar(1000.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(object),
            "n": np.ones(len(x), np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        out = df.groupby("event_type", as_index=False).sum()
        out["event_type"] = out["event_type"].astype(object)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).sum()
        rows = []
        for r in g.itertuples(index=False):
            n, sx, sy = int(r.n), int(r.sx), int(r.sy)
            num = n * int(r.sxy) - sx * sy
            den = n * int(r.sxx) - sx * sx
            rows.append((r.event_type, n, num, den))
        out = pd.DataFrame(rows, columns=["event_type", "n",
                                          "slope_num", "slope_den"])
        out = out.sort_values("event_type").reset_index(drop=True)
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n", "slope_num", "slope_den"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


EVENTS_TREND_SQL = """
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 - %d AS x,
         CAST(round(value * 1000) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM e GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM s ORDER BY event_type
""" % TREND_EPOCH_H


WM_DELAY_MOD = 600            # synthetic network delay: 0..599 s
WM_ALLOWED_US = 300_000_000   # watermark lag: 5 minutes
WM_PANE_US = 600_000_000      # 10-minute arrival panes


def events_late_arrivals(sf_dir):
    """Watermark / late-data accounting — the correctness ledger of
    every streaming engine (Flink/Beam allowed-lateness semantics):
    events ARRIVE out of order (arrival = event time + a seedless
    md5-derived 0..599 s delay, deterministic in both engines), the
    watermark trails the maximum event time SEEN so far by 5 minutes,
    and an event is LATE iff its event time is below the watermark at
    its arrival. Reports per type: events, late count, worst lateness.

    Scale shape: the watermark is a PREFIX MAX over arrival order —
    decomposable exactly like a running total: pass 1 reduces each
    10-minute arrival pane to its max event time (bounded-domain
    per-batch combiner, zero shuffle) and the coalesced merge derives
    each pane's EXCLUSIVE carry (max over all earlier panes),
    broadcast by closure; pass 2 is ONE pane-bucketed exchange whose
    buckets sort their panes locally, take the within-pane exclusive
    cummax, splice the carry, flag lateness vectorized and emit
    bounded per-type partials. No global sort ever happens — the
    pane decomposition IS the distributed watermark."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")
    SENT = np.int64(np.iinfo(np.int64).min)

    def base(t: pa.Table) -> pd.DataFrame:
        ids = t["event_id"].to_numpy()
        delay = np.array(
            [int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8],
                 16) % WM_DELAY_MOD for i in ids],
            dtype=np.int64) * 1_000_000
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pd.DataFrame({
            "eid": ids, "t": ts, "a": ts + delay,
            "et": t["event_type"].to_pandas().astype(object)})

    def pane_max(t: pa.Table) -> pd.DataFrame:
        df = base(t)
        df["pane"] = df["a"].to_numpy() // WM_PANE_US
        out = df.groupby("pane", as_index=False)["t"].max()
        out["pane"] = out["pane"].astype("int64")
        out["t"] = out["t"].astype("int64")
        return out

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type"])
    pm = (ev.map_batches(pane_max, batch_format="pyarrow")
          .to_pandas()
          .groupby("pane", as_index=False)["t"].max()
          .sort_values("pane").reset_index(drop=True))
    # exclusive carry: max event time of all STRICTLY earlier panes
    run = pm["t"].cummax().shift(1)
    carry = {int(p): (SENT if pd.isna(c) else np.int64(c))
             for p, c in zip(pm["pane"], run)}

    def prep(t: pa.Table) -> pd.DataFrame:
        df = base(t)
        df["pane"] = df["a"].to_numpy() // WM_PANE_US
        h = pd.util.hash_pandas_object(df["pane"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_flags(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["pane", "a", "eid"], kind="mergesort")
             .reset_index(drop=True))
        run = g.groupby("pane")["t"].cummax()
        prev = run.groupby(g["pane"]).shift(1)
        pane_carry = g["pane"].map(carry).astype("int64")
        t = g["t"].to_numpy(np.int64)
        seen = np.maximum(prev.fillna(SENT).to_numpy(np.int64),
                          pane_carry.to_numpy(np.int64))
        late = (seen != SENT) & (t < seen - WM_ALLOWED_US)
        late_s = np.where(late, (seen - WM_ALLOWED_US - t)
                          // 1_000_000, 0)
        out = pd.DataFrame({"et": g["et"], "late": late.astype(np.int64),
                            "late_s": late_s.astype(np.int64)})
        p = out.groupby("et", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_late_s=("late_s", "max"))
        p["et"] = p["et"].astype(object)
        for c in ("n_events", "n_late", "max_late_s"):
            p[c] = p[c].astype("int64")
        return p

    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_flags, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("et", as_index=False)
               .agg(n_events=("n_events", "sum"),
                    n_late=("n_late", "sum"),
                    max_late_s=("max_late_s", "max"))
               .rename(columns={"et": "event_type"})
               .sort_values("event_type").reset_index(drop=True))
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n_events", "n_late", "max_late_s"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


LATE_ARRIVALS_SQL = """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS t,
         epoch_us(ts)
           + CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                      1, 8) AS BIGINT) %% %d
                  AS BIGINT) * 1000000 AS a
  FROM events),
w AS (
  SELECT event_type, t,
         max(t) OVER (ORDER BY a, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS seen
  FROM e)
SELECT event_type, count(*) AS n_events,
       CAST(count(*) FILTER (seen IS NOT NULL
                             AND t < seen - %d) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN seen IS NOT NULL
                               AND t < seen - %d
                              THEN (seen - %d - t) // 1000000 END),
                     0) AS BIGINT) AS max_late_s
FROM w GROUP BY 1 ORDER BY 1
""" % (WM_DELAY_MOD, WM_ALLOWED_US, WM_ALLOWED_US, WM_ALLOWED_US)


SLIDING_WINDOW_HOURS = 6


def events_sliding_dau(sf_dir):
    """EXACT sliding-window distinct users — active users over the
    trailing 6 hours, reported hourly (the ops dashboard's DAU/MAU
    shape at window grain). Distinct counts are NOT additive across
    subwindows (per-hour distincts cannot be summed), which is what
    makes this a real operator: a user-hour contributes to exactly 6
    overlapping windows, so the expansion is BOUNDED (6×) and
    deduplication per (user, window) restores exactness.

    Scale shape: batch-local distinct (user, hour) pairs (a lossless
    combiner for this expansion) ride ONE user-bucketed exchange;
    each bucket dedups its users' hours exactly (a user lives in one
    bucket), expands hour→6 windows vectorized (np.repeat/tile),
    dedups (user, window) and emits bounded (window, count) partials
    — additive across buckets; one merge block sums over the ~10³
    window cells. SQL replays via the same 6-way range expansion."""
    buckets = _exchange_buckets(sf_dir, "events")
    W = SLIDING_WINDOW_HOURS

    def prep(t: pa.Table) -> pd.DataFrame:
        h = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // 3_600_000_000)
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(), "h": h})
             .drop_duplicates())
        hh = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (hh % np.uint64(buckets)).astype("int32")
        return p.reset_index(drop=True)

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "h"])
        u = np.repeat(g["u"].to_numpy(np.int64), W)
        w = (np.repeat(g["h"].to_numpy(np.int64), W)
             + np.tile(np.arange(W, dtype=np.int64), len(g)))
        uw = pd.DataFrame({"u": u, "w": w}).drop_duplicates()
        out = (uw.groupby("w", as_index=False).size()
               .rename(columns={"size": "active_users"}))
        return out.astype("int64")

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_count, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("w", as_index=False)["active_users"].sum()
               .rename(columns={"w": "window_end_hour"})
               .sort_values("window_end_hour")
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, final)


SLIDING_DAU_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 3600000000 AS h
  FROM events),
uw AS (
  SELECT DISTINCT user_id, h + k.k AS w
  FROM uh, range(%d) k(k))
SELECT CAST(w AS BIGINT) AS window_end_hour,
       count(*) AS active_users
FROM uw GROUP BY 1 ORDER BY 1
""" % SLIDING_WINDOW_HOURS


def region_revenue_share(sf_dir):
    """Hierarchical ratio-to-parent rollup (the OLAP share-of-segment
    report): revenue per supplier nation with each nation's exact
    permille share OF ITS REGION — the two-level rollup where the
    child metric divides by the parent aggregate. Exercises the full
    region→nation→supplier dimension chain over the fact table.

    Scale shape: region/nation are genuinely bounded (25/5 rows) and
    broadcast as dicts; the supplier arm goes through
    ``joins.attach_dim`` (broadcast ≤ threshold, bucketed hash join
    at 10⁹ suppliers — forced-path tested); fact batches emit
    bounded (nation) cents partials — a lossless combiner — and the
    parent totals + shares derive in the one coalesced merge block.
    Exact integer permille."""
    nat = {int(r["n_nationkey"]): (r["n_name"], int(r["n_regionkey"]))
           for r in _read(sf_dir, "nation").take_all()}
    reg = {int(r["r_regionkey"]): r["r_name"]
           for r in _read(sf_dir, "region").take_all()}
    nk2name = {nk: name for nk, (name, _) in nat.items()}
    n2r = {name: reg[rk] for name, rk in nat.values()}

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({
            "nation": pd.Series([nk2name[int(k)] for k in
                                 t["snat"].to_pylist()],
                                dtype=object),
            "cents": cents})
        out = df.groupby("nation", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    li = joins.attach_dim(
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice"]),
        _read(sf_dir, "supplier",
              columns=["s_suppkey", "s_nationkey"]),
        "l_suppkey", "s_suppkey", "s_nationkey", out_col="snat",
        how="inner")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("nation", as_index=False)["cents"].sum()
        n["region"] = n["nation"].map(n2r).astype(object)
        rc = n.groupby("region")["cents"].transform("sum")
        n["share_permille"] = (n["cents"] * 1000) // rc
        out = (n[["region", "nation", "cents", "share_permille"]]
               .sort_values(["region", "nation"])
               .reset_index(drop=True))
        out["cents"] = out["cents"].astype("int64")
        out["share_permille"] = out["share_permille"].astype("int64")
        return out

    return _merge_partials(
        li.map_batches(partial, batch_format="pyarrow"), final)


REGION_SHARE_SQL = """
WITH nrev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2),
rr AS (SELECT region, CAST(sum(cents) AS BIGINT) AS rc
       FROM nrev GROUP BY 1)
SELECT nrev.region, nrev.nation, nrev.cents,
       CAST(nrev.cents * 1000 // rr.rc AS BIGINT) AS share_permille
FROM nrev JOIN rr USING (region)
ORDER BY 1, 2
"""


def orders_decile_report(sf_dir):
    """Exact equi-depth histogram — decile boundaries plus per-decile
    row counts and cents mass over the order price: the statistic a
    cost-based optimizer keeps per column (equi-depth beats equi-width
    under skew) and a billing pipeline reports as the decile table.
    Boundaries are TRUE order statistics (rank ceil(d·N/10) via the
    two-pass radix selection of orders_price_percentiles — no sort),
    and a third zero-shuffle pass assigns each row to its decile by
    searchsorted against the broadcast 9-edge array and emits bounded
    10-cell (count, cents) partials. Three streaming passes total.

    Decile rule pinned for both engines: decile d (1..10) holds rows
    with v ≤ edge_d and v > edge_{d-1}, edges being the ceil-rank
    values — SQL replays via the same edge values from row_number."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def hist_hi(t: pa.Table) -> pd.DataFrame:
        out = (pd.DataFrame({"hi": cents_of(t) >> RADIX_SHIFT})
               .groupby("hi", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby("hi", as_index=False)["n"].sum()
          .sort_values("hi").reset_index(drop=True))
    n_total = int(h1["n"].sum())
    cum = h1["n"].cumsum().to_numpy()
    targets = []
    for d in range(1, 10):  # the 9 interior edges
        k = (d * n_total + 9) // 10  # ceil(d·N/10)
        i = int(np.searchsorted(cum, k))
        prev = int(cum[i - 1]) if i else 0
        targets.append((int(h1["hi"].iloc[i]), k - prev))
    wanted = frozenset(hi for hi, _ in targets)

    def hist_lo(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        v = v[np.isin(v >> RADIX_SHIFT, list(wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    edges = []
    for hi, resid in targets:
        m = (vals >> RADIX_SHIFT) == hi
        c = counts[m].cumsum()
        edges.append(int(vals[m][int(np.searchsorted(c, resid))]))
    edges_arr = np.asarray(edges, dtype=np.int64)

    def decile_partial(t: pa.Table) -> pd.DataFrame:
        v = cents_of(t)
        # decile = 1 + #edges strictly below v  (v ≤ edge_d rule)
        d = 1 + np.searchsorted(edges_arr, v, side="left")
        # rows equal to an edge belong to that edge's decile
        out = (pd.DataFrame({"decile": d, "n": 1, "cents": v})
               .groupby("decile", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("decile", as_index=False)
             [["n", "cents"]].sum()
             .sort_values("decile").reset_index(drop=True))
        hi_edges = edges + [None]
        g["hi_cents"] = [hi_edges[int(d) - 1] if int(d) <= 9 else -1
                         for d in g["decile"]]
        g.loc[g["decile"] == 10, "hi_cents"] = -1  # open top bucket
        for c in ("decile", "n", "cents", "hi_cents"):
            g[c] = g[c].astype("int64")
        return g[["decile", "hi_cents", "n", "cents"]]

    return _merge_partials(
        ds.map_batches(decile_partial, batch_format="pyarrow"), final)


ORDERS_DECILE_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS n FROM c),
e AS (
  SELECT d, min(r.v) AS edge
  FROM generate_series(1, 9) g(d), n, r
  WHERE r.rn = (g.d * n.n + 9) // 10
  GROUP BY d),
a AS (
  SELECT c.v,
         1 + (SELECT count(*) FROM e WHERE e.edge < c.v) AS decile
  FROM c)
SELECT decile,
       CAST(coalesce((SELECT edge FROM e WHERE e.d = a.decile), -1)
            AS BIGINT) AS hi_cents,
       count(*) AS n, CAST(sum(v) AS BIGINT) AS cents
FROM a GROUP BY decile ORDER BY decile
"""


KANON_K, KANON_BAND = 5, 100


def doc_k_anonymity(sf_dir):
    """k-anonymity audit — the data-governance screen a release
    pipeline runs before publishing: rows whose QUASI-IDENTIFIER
    tuple (source, lang, length band) is shared by fewer than k
    records are re-identifiable (Sweeney '02 — public literature).
    Reports the group census: total groups, groups below k, rows at
    risk, and the smallest group size.

    Scale shape: the QI space is bounded (sources × langs × bands),
    so per-batch (QI → count) partials are a lossless combiner and
    the census finalizes in the one coalesced merge block — zero
    shuffle. With an unbounded QI (e.g. raw zip×birthdate) the same
    op rides one QI-bucketed exchange; the census stays bounded."""
    ds = _read(sf_dir, "documents",
               columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "lang": t["lang"].to_pandas().astype(object),
            "band": t["n_chars"].to_numpy() // KANON_BAND})
        out = (df.groupby(["source", "lang", "band"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["band"] = out["band"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "lang", "band"], as_index=False)
             ["n"].sum())
        small = g[g["n"] < KANON_K]
        return pd.DataFrame({
            "n_groups": pd.Series([len(g)], dtype="int64"),
            "small_groups": pd.Series([len(small)], dtype="int64"),
            "rows_at_risk": pd.Series([int(small["n"].sum())],
                                      dtype="int64"),
            "min_group": pd.Series([int(g["n"].min())],
                                   dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


KANON_SQL = """
WITH g AS (
  SELECT source, lang, n_chars // %d AS band, count(*) AS n
  FROM documents GROUP BY 1, 2, 3)
SELECT count(*) AS n_groups,
       CAST(count(*) FILTER (n < %d) AS BIGINT) AS small_groups,
       CAST(coalesce(sum(n) FILTER (n < %d), 0) AS BIGINT)
         AS rows_at_risk,
       CAST(min(n) AS BIGINT) AS min_group
FROM g
""" % (KANON_BAND, KANON_K, KANON_K)


CUSUM_H = (1, 2)  # alarm when 2·S_t > total (count·days units)


def events_cusum_alarms(sf_dir):
    """CUSUM change-point detection (Page '54 — public literature)
    over the per-type daily event counts: the sequential recursion
    S_t = max(0, S_{t−1} + (x_t − k)) looks unparallelizable, but it
    EQUALS P_t − min_{j≤t} P_j for the prefix sums P of (x − k) —
    the same prefix-decomposition as the events_late_arrivals
    watermark (pane minima + carries), here finalized in one block
    because the (type, day) table is bounded. All integer: deviations
    live in count·days units (x_i·D − total, so k = mean needs no
    division), and the alarm threshold h = total/2 cross-multiplies
    the same way. Reports per type the alarm-day count and the first
    alarm day.

    Scale shape: bounded (type, day) count partials (lossless
    combiner, zero shuffle); prefix sums, running minima and alarm
    flags all vectorize in the single coalesced merge block. SQL
    replays P and min-over-preceding with window functions."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (t["ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        out = (pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(object),
            "day": day}).groupby(["event_type", "day"],
                                 as_index=False).size()
            .rename(columns={"size": "n"}))
        out["day"] = out["day"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "day"], as_index=False)
             ["n"].sum())
        rows = []
        for et, grp in g.groupby("event_type"):
            grp = grp.sort_values("day").reset_index(drop=True)
            x = grp["n"].to_numpy(np.int64)
            D = np.int64(len(x))
            total = np.int64(x.sum())
            dev = x * D - total              # (x_i − mean)·D exactly
            P = np.cumsum(dev)
            minp = np.minimum.accumulate(np.concatenate(
                ([np.int64(0)], P)))[:-1]    # min over j < t, floor 0
            S = P - minp
            alarm = S * CUSUM_H[1] > CUSUM_H[0] * total
            first = (int(grp["day"].iloc[int(np.argmax(alarm))])
                     if alarm.any() else -1)
            rows.append((et, int(D), int(alarm.sum()), first))
        out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                          "alarm_days",
                                          "first_alarm_day"])
        out = out.sort_values("event_type").reset_index(drop=True)
        out["event_type"] = out["event_type"].astype(object)
        for c in ("n_days", "alarm_days", "first_alarm_day"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


EVENTS_CUSUM_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('day', ts)) // 86400000000
              AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(n) AS BIGINT) AS total
  FROM c GROUP BY 1),
p AS (
  SELECT c.event_type, c.day, tot.total,
         CAST(sum(c.n * tot.d - tot.total) OVER (
           PARTITION BY c.event_type ORDER BY c.day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
  FROM c JOIN tot USING (event_type)),
s AS (
  SELECT event_type, day, total, pf,
         pf - least(coalesce(min(pf) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0), 0) AS cusum
  FROM p)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(count(*) FILTER (cusum * %d > %d * total) AS BIGINT)
         AS alarm_days,
       CAST(coalesce(min(day) FILTER (cusum * %d > %d * total), -1)
            AS BIGINT) AS first_alarm_day
FROM s GROUP BY 1 ORDER BY 1
""" % (CUSUM_H[1], CUSUM_H[0], CUSUM_H[1], CUSUM_H[0])


def orders_daily_acf1(sf_dir):
    """Lag-1 autocorrelation of the daily order-revenue series — the
    seasonality/momentum screen that closes the time-series audit
    triad (trend slope → CUSUM shift → ACF persistence). With
    deviations d_t = x_t·D − T (the mean needs no division; D days,
    T total cents), num = Σ d_t·d_{t+1} and den = Σ d_t² live in
    128-bit/Python-int space (d² passes int64 already at sf0.01),
    and the result is acf1_milli = (1000·num) ÷ den with division
    EXPLICITLY toward zero on both sides — num can be negative, and
    Python floors where DuckDB truncates, so the sign is peeled
    first. Missing calendar days count as zero-revenue days (the
    dense-axis rule of events_daily_dense), so "consecutive" is
    well-defined.

    Scale shape: the (day → cents) table is bounded, so per-batch
    partials are a lossless combiner; densification, deviations and
    both sums run in the one coalesced merge block — zero shuffle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (t["o_orderdate"].to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"day": day, "cents": cents})
               .groupby("day", as_index=False)["cents"].sum())
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)["cents"].sum()
             .sort_values("day").reset_index(drop=True))
        lo, hi = int(g["day"].min()), int(g["day"].max())
        dense = np.zeros(hi - lo + 1, dtype=object)  # Python ints
        for d, c in zip(g["day"].to_numpy(), g["cents"].to_numpy()):
            dense[int(d) - lo] = int(c)
        D, T = len(dense), int(sum(dense))
        dev = [int(x) * D - T for x in dense]
        num = sum(a * b for a, b in zip(dev[:-1], dev[1:]))
        den = sum(a * a for a in dev)
        # toward-zero division (DuckDB's //), sign peeled first —
        # Python's // floors negatives
        milli = ((1000 * num) // den if num >= 0
                 else -((1000 * -num) // den)) if den else 0
        return pd.DataFrame({
            "n_days": pd.Series([D], dtype="int64"),
            "acf1_milli": pd.Series([milli], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_ACF1_SQL = """
WITH c AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
dense AS (
  SELECT g.day, coalesce(c.cents, 0) AS cents
  FROM (SELECT unnest(generate_series(span.lo, span.hi)) AS day
        FROM span) g
  LEFT JOIN c USING (day)),
s AS (SELECT count(*) AS d, CAST(sum(cents) AS HUGEINT) AS t
      FROM dense),
dev AS (
  SELECT day, CAST(cents AS HUGEINT) * s.d - s.t AS dv
  FROM dense, s),
pair AS (
  SELECT dv, lead(dv) OVER (ORDER BY day) AS dv1 FROM dev),
nd AS (
  SELECT sum(CASE WHEN dv1 IS NULL THEN 0 ELSE dv * dv1 END) AS num,
         sum(dv * dv) AS den
  FROM pair)
SELECT CAST(s.d AS BIGINT) AS n_days,
       CAST(CASE WHEN nd.den = 0 THEN 0
                 WHEN nd.num >= 0 THEN (1000 * nd.num) // nd.den
                 ELSE -((1000 * -nd.num) // nd.den) END
            AS BIGINT) AS acf1_milli
FROM nd, s
"""


EVENT_TYPE_BITS = {"click": 1, "error": 2, "purchase": 4,
                   "signup": 8, "view": 16}


def events_daily_type_mask(sf_dir):
    """Bitmap-index audience segmentation (the roaring-bitmap OLAP
    shape): per (user, day), the bitwise-OR mask of event types seen,
    then the audience-size histogram over masks — how many user-days
    were view-only, how many purchased without erroring, etc.

    Scale shape: a type's bit is a power of two, so the batch-local
    (user, day, bit) drop_duplicates + sum IS the OR — a lossless
    combiner into the single (user, day)-bucketed exchange. Buckets
    OR their mask partials vectorized (decompose → per-bit max →
    recompose; bitwise OR is associative so any partial grouping is
    exact) and emit bounded ≤2^types histogram partials; one merge
    block sums. DuckDB's bit_or replays the mask directly."""
    buckets = _exchange_buckets(sf_dir, "events")
    nbits = len(EVENT_TYPE_BITS)

    def prep(t: pa.Table) -> pd.DataFrame:
        day = (t["ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        bit = (pd.Series(t["event_type"].to_pylist())
               .map(EVENT_TYPE_BITS).to_numpy(np.int64))
        df = pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "d": day, "bit": bit}).drop_duplicates()
        p = df.groupby(["u", "d"], as_index=False)["bit"].sum()
        p = p.rename(columns={"bit": "mask"})
        p["mask"] = p["mask"].astype("int64")
        h = pd.util.hash_pandas_object(
            p["u"] * np.int64(1_000_003) + p["d"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        m = g["mask"].to_numpy()
        bits = pd.DataFrame({"u": g["u"].to_numpy(),
                             "d": g["d"].to_numpy()})
        for i in range(nbits):  # decompose → per-bit max == OR
            bits["b%d" % i] = (m >> i) & 1
        mx = bits.groupby(["u", "d"], as_index=False).max()
        mask = np.zeros(len(mx), np.int64)
        for i in range(nbits):
            mask += mx["b%d" % i].to_numpy(np.int64) << i
        hist = (pd.DataFrame({"mask": mask})
                .groupby("mask", as_index=False).size()
                .rename(columns={"size": "n_user_days"}))
        hist["mask"] = hist["mask"].astype("int64")
        hist["n_user_days"] = hist["n_user_days"].astype("int64")
        return hist

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("mask", as_index=False)["n_user_days"].sum()
               .sort_values("mask").reset_index(drop=True))
        out["mask"] = out["mask"].astype("int64")
        out["n_user_days"] = out["n_user_days"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


EVENTS_MASK_SQL = """
WITH m AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         bit_or(CASE event_type
                  WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                  ELSE 16 END) AS mask
  FROM events GROUP BY 1, 2)
SELECT CAST(mask AS BIGINT) AS mask, count(*) AS n_user_days
FROM m GROUP BY 1 ORDER BY 1
"""


def lineitem_fk_orphans(sf_dir):
    """Referential-integrity audit (the FK-violation scan a warehouse
    runs after a non-cascading delete): the same CDC delta as
    ``orders_cdc_merge`` deletes orders (keys %%17) WITHOUT cascading
    to lineitem, so surviving lineitems whose l_orderkey no longer
    resolves are orphans — reported per returnflag as orphan row
    count + distinct orphaned orders.

    Scale shape: the deleted-key side comes from the ORDERS SCAN (a
    membership problem — the audit must not assume the delete rule is
    recomputable from the fact side), riding the q3/q4 orderkey-
    bucketed tagged exchange: lineitem batches pre-reduce to
    (okey, flag) → row-count partials (lossless combiner; distinct-
    order counting stays exact because an order's rows land in one
    bucket), the orders side contributes one row per dead key, each
    bucket semi-joins vectorized and emits bounded ≤|flags| partials;
    one merge block sums. Neither side broadcasts."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["okey", "flag", "rows", "_bucket", "_side"]

    def prep_li(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(),
            "flag": t["l_returnflag"].to_pandas().astype(object)})
        p = (df.groupby(["okey", "flag"], as_index=False).size()
             .rename(columns={"size": "rows"}))
        p["rows"] = p["rows"].astype("int64")
        return _tag_bucket(p, buckets, 0, COLS)

    def prep_dead(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        k = k[k % CDC_DEL_MOD == 0]
        p = pd.DataFrame({"okey": k,
                          "flag": pd.Series([""] * len(k),
                                            dtype=object),
                          "rows": np.zeros(len(k), np.int64)})
        return _tag_bucket(p, buckets, 1, COLS)

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        dead = g.loc[g["_side"] == 1, "okey"].to_numpy()
        li_ = g[g["_side"] == 0]
        j = li_[li_["okey"].isin(dead)]
        out = j.groupby("flag", as_index=False).agg(
            orphan_rows=("rows", "sum"),
            orphan_orders=("okey", "nunique"))
        return pd.DataFrame({
            "l_returnflag": out["flag"].astype(object),
            "orphan_rows": out["orphan_rows"].astype("int64"),
            "orphan_orders": out["orphan_orders"].astype("int64")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])
    od = _read(sf_dir, "orders", columns=["o_orderkey"])
    tagged = (li.map_batches(prep_li, batch_format="pyarrow")
              .union(od.map_batches(prep_dead, batch_format="pyarrow")))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_audit, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("l_returnflag", as_index=False)
               [["orphan_rows", "orphan_orders"]].sum()
               .sort_values("l_returnflag").reset_index(drop=True))
        out["orphan_rows"] = out["orphan_rows"].astype("int64")
        out["orphan_orders"] = out["orphan_orders"].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


FK_ORPHANS_SQL = """
WITH dead AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey %% %d = 0)
SELECT l_returnflag,
       count(*) AS orphan_rows,
       count(DISTINCT l_orderkey) AS orphan_orders
FROM lineitem JOIN dead ON l_orderkey = dead.o_orderkey
GROUP BY 1 ORDER BY 1
""" % CDC_DEL_MOD


def events_ab_metrics(sf_dir):
    """A/B experiment readout: users are assigned a variant by
    md5(user_id) parity (the seedless hash assignment every
    experimentation platform uses — stable across engines, runs and
    partitions; the training_shards convention), and the readout
    reports per (variant, event_type) the user count, total events,
    and the EXACT integer sufficient statistics a t-test needs
    (Σx, Σx²) plus milli-mean = 1000·Σx // n. No float crosses the
    engine boundary; significance tests derive from the integers.

    Scale shape: batch-local (user, type) count partials (lossless
    combiner) feed ONE user-bucketed exchange; each bucket finalizes
    per-user counts, hashes each DISTINCT user once for its variant,
    and emits bounded ≤2·|types| (variant, type, n, Σx, Σx²)
    partials — additive across buckets because a user lives in
    exactly one bucket; one merge block sums and derives the
    milli-mean."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "et": t["event_type"].to_pandas().astype(object)})
        p = (df.groupby(["u", "et"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        p["cnt"] = p["cnt"].astype("int64")
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        pu = g.groupby(["u", "et"], as_index=False)["cnt"].sum()
        variant = {
            int(u): int(hashlib.md5(str(int(u)).encode())
                        .hexdigest()[:8], 16) % 2
            for u in pu["u"].unique()}
        pu["variant"] = pu["u"].map(variant).astype("int64")
        pu["sq"] = pu["cnt"] * pu["cnt"]
        out = pu.groupby(["variant", "et"], as_index=False).agg(
            n_users=("u", "size"),
            total_events=("cnt", "sum"),
            sumsq_events=("sq", "sum"))
        return pd.DataFrame({
            "variant": out["variant"].astype("int64"),
            "event_type": out["et"].astype(object),
            "n_users": out["n_users"].astype("int64"),
            "total_events": out["total_events"].astype("int64"),
            "sumsq_events": out["sumsq_events"].astype("int64")})

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["variant", "event_type"], as_index=False)
               [["n_users", "total_events", "sumsq_events"]].sum())
        out["mean_milli"] = ((out["total_events"] * 1000)
                             // out["n_users"])
        out = (out.sort_values(["variant", "event_type"])
               .reset_index(drop=True))
        for c in ("variant", "n_users", "total_events",
                  "sumsq_events", "mean_milli"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


EVENTS_AB_SQL = """
WITH pu AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2),
v AS (
  SELECT user_id,
         CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2 AS BIGINT) AS variant
  FROM (SELECT DISTINCT user_id FROM events))
SELECT v.variant, pu.event_type,
       count(*) AS n_users,
       CAST(sum(pu.cnt) AS BIGINT) AS total_events,
       CAST(sum(pu.cnt * pu.cnt) AS BIGINT) AS sumsq_events,
       CAST(sum(pu.cnt) * 1000 // count(*) AS BIGINT) AS mean_milli
FROM pu JOIN v USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


COMPACT_TARGET_CHARS = 2000


def source_compaction_plan(sf_dir):
    """Small-files compaction planning (the Delta/Iceberg OPTIMIZE
    bin-packing step): per source, pack document "files" into
    target-size output bins by the deterministic size-descending
    cumulative-quota rule — order by (bytes DESC, doc_id), bin =
    floor(running_bytes_before / TARGET) — and emit the per-bin
    manifest (file count, bytes). The rule is a pure function of the
    sorted order, so SQL's window cumsum replays it bit-for-bit, and
    every bin except a source's last lands within one max-file-size
    of the target.

    Scale shape: planning consumes only the FILE MANIFEST (source,
    id, bytes — one narrow row per file; ~10⁶ rows at 100 TB, not
    the data); ONE source-bucketed exchange co-locates each source's
    manifest (the plan needs its files totally ordered), the
    per-bucket plan is one vectorized sort + cumsum + floor-div, and
    the bounded (source, bin) rows are FINAL per bucket (a source
    lives in exactly one bucket) — the merge block only sorts. The
    rewrite pass the plan drives is embarrassingly parallel per
    bin."""
    buckets = _exchange_buckets(sf_dir, "documents")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "doc_id": t["doc_id"].to_numpy(),
            "bytes": t["n_chars"].to_numpy()})
        h = pd.util.hash_pandas_object(p["source"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_plan(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, f in g.groupby("source", sort=False):
            f = f.sort_values(["bytes", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort")
            b = f["bytes"].to_numpy(np.int64)
            before = np.cumsum(b) - b
            bins = before // COMPACT_TARGET_CHARS
            plan = (pd.DataFrame({"bin": bins, "bytes": b})
                    .groupby("bin", as_index=False)
                    .agg(n_files=("bytes", "size"),
                         bytes_total=("bytes", "sum")))
            plan.insert(0, "source", src)
            outs.append(plan)
        out = (pd.concat(outs, ignore_index=True) if outs else
               pd.DataFrame({"source": pd.Series(dtype=object),
                             "bin": pd.Series(dtype="int64"),
                             "n_files": pd.Series(dtype="int64"),
                             "bytes_total": pd.Series(dtype="int64")}))
        for c in ("bin", "n_files", "bytes_total"):
            out[c] = out[c].astype("int64")
        return out[["source", "bin", "n_files", "bytes_total"]]

    ds = _read(sf_dir, "documents",
               columns=["source", "doc_id", "n_chars"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_plan, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["source", "bin"])
                .reset_index(drop=True))

    return _merge_partials(per_bucket, final)


COMPACTION_SQL = """
WITH f AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING)
           - n_chars AS before
  FROM documents)
SELECT source, CAST(before // %d AS BIGINT) AS bin,
       count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes_total
FROM f GROUP BY 1, 2 ORDER BY 1, 2
""" % COMPACT_TARGET_CHARS


def source_lang_gini(sf_dir):
    """Label-distribution audit: per-source Gini impurity of the
    language labels in exact integer milli-units — the class-balance
    check a curation pipeline runs before trusting per-source
    sampling weights (a source whose labels collapsed to one class is
    a labeler failure, not a signal). Gini = 1 − Σp² is RATIONAL, so
    milli-gini = (1000·(n² − Σc²)) // n² replays bit-for-bit in SQL —
    no log/entropy float crosses the engine boundary.

    Scale shape: the (source, lang) count table is bounded, so
    per-batch count partials are a lossless combiner and the whole
    statistic finalizes in the one coalesced merge block — zero
    shuffle at any data scale."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "lang": t["lang"].to_pandas().astype(object)})
        out = (df.groupby(["source", "lang"], as_index=False).size()
               .rename(columns={"size": "c"}))
        out["c"] = out["c"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cell = df.groupby(["source", "lang"], as_index=False)["c"].sum()
        cell["sq"] = cell["c"] * cell["c"]
        s = cell.groupby("source", as_index=False).agg(
            n=("c", "sum"), sumsq=("sq", "sum"),
            n_langs=("lang", "size"))
        nn = s["n"] * s["n"]
        s["gini_milli"] = (1000 * (nn - s["sumsq"])) // nn
        out = (s[["source", "n_langs", "n", "gini_milli"]]
               .rename(columns={"n": "n_docs"})
               .sort_values("source").reset_index(drop=True))
        for c in ("n_langs", "n_docs", "gini_milli"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


SOURCE_GINI_SQL = """
WITH cell AS (
  SELECT source, lang, count(*) AS c
  FROM documents GROUP BY 1, 2),
s AS (
  SELECT source, count(*) AS n_langs,
         CAST(sum(c) AS BIGINT) AS n_docs,
         CAST(sum(c * c) AS BIGINT) AS sumsq
  FROM cell GROUP BY 1)
SELECT source, n_langs, n_docs,
       CAST((1000 * (n_docs * n_docs - sumsq))
            // (n_docs * n_docs) AS BIGINT) AS gini_milli
FROM s ORDER BY source
"""


RDV_NODES_BEFORE, RDV_NODES_AFTER = 8, 9


def rendezvous_rebalance(sf_dir):
    """Consistent-hashing shard rebalance audit (rendezvous / HRW
    hashing, Thaler-Ravishankar '98): every doc is assigned to the
    node maximizing md5(doc:node), before (8 nodes) and after (9
    nodes) a scale-out, and the movement matrix (node_before,
    node_after) → count is the proof of HRW's minimal-movement
    property — every off-diagonal row must land on the NEW node,
    and ~1/9 of each node moves. This is how a 100-TB engine grows
    its cache/shard tier without reshuffling the world.

    Scale shape: both assignments are pure map-side hashing (9 md5s
    per doc, the training_shards seedless discipline; argmax
    tie-breaks to the lower node id), the movement matrix is bounded
    ≤8·9 cells so per-batch partials are a lossless combiner — zero
    shuffle."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(doc_id: int, n_nodes: int) -> int:
        best, best_h = 0, -1
        for n in range(n_nodes):
            h = int(hashlib.md5(("%d:%d" % (doc_id, n)).encode())
                    .hexdigest()[:8], 16)
            if h > best_h:  # strict > == lower-node tie-break
                best, best_h = n, h
        return best

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = [int(i) for i in t["doc_id"].to_pylist()]
        b = [assign(i, RDV_NODES_BEFORE) for i in ids]
        a = [assign(i, RDV_NODES_AFTER) for i in ids]
        out = (pd.DataFrame({"node_before": b, "node_after": a})
               .groupby(["node_before", "node_after"], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["node_before", "node_after"],
                          as_index=False)["n_docs"].sum()
               .sort_values(["node_before", "node_after"])
               .reset_index(drop=True))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


RENDEZVOUS_SQL = """
WITH h AS (
  SELECT doc_id, CAST(t.n AS BIGINT) AS node,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                      || CAST(t.n AS VARCHAR)), 1, 8)
                   AS BIGINT) AS BIGINT) AS hv
  FROM documents, range(%d) t(n)),
p8 AS (
  SELECT doc_id, node FROM (
    SELECT doc_id, node, row_number() OVER (
      PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
    FROM h WHERE node < %d) WHERE rk = 1),
p9 AS (
  SELECT doc_id, node FROM (
    SELECT doc_id, node, row_number() OVER (
      PARTITION BY doc_id ORDER BY hv DESC, node) AS rk
    FROM h) WHERE rk = 1)
SELECT p8.node AS node_before, p9.node AS node_after,
       count(*) AS n_docs
FROM p8 JOIN p9 USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""" % (RDV_NODES_AFTER, RDV_NODES_BEFORE)


def user_value_twa(sf_dir):
    """Time-weighted average of the event value per user (the
    monitoring/billing primitive: a gauge sampled at irregular
    times is averaged by HOLDING each value until the next sample —
    last-observation-carried-forward — not by the naive mean that
    over-weights bursts). All integer: µs timestamps × milli-values,
    twa_milli = Σ(mv·Δt) // ΣΔt; users with one event have no
    holding interval and are excluded by rule.

    Scale shape: one user-bucketed exchange co-locates each user's
    events (the events_debounce LAG discipline), the per-bucket pass
    is one vectorized sort + shift + two grouped sums, and one
    (user) row per user streams out — no driver loop, no global
    sort. Bounds: Σmv·Δt ≤ max_mv · span_us ≈ 10¹⁸ here; at wider
    spans drop to ms ticks (divide Δt by a fixed 10³ in BOTH
    engines) before the product."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        mv = pc.cast(pc.round(pc.multiply(t["value"],
                                          pa.scalar(1000.0)),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy()
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": t["ts"].to_numpy()
                  .astype("datetime64[us]").astype(np.int64),
            "eid": t["event_id"].to_numpy(),
            "mv": mv})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p

    def bucket_twa(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["u", "ts", "eid"], kind="mergesort")
             .reset_index(drop=True))
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        mv = g["mv"].to_numpy(np.int64)
        # pair i with its successor WITHIN the same user — all int64
        # (a float64 detour via .shift() would lose exactness >2^53)
        i = np.flatnonzero(u[:-1] == u[1:]) if len(u) > 1 else \
            np.empty(0, np.intp)
        v = pd.DataFrame({"u": u[i], "num": mv[i] * (ts[i + 1] - ts[i]),
                          "dt": ts[i + 1] - ts[i]})
        s = v.groupby("u", as_index=False).agg(
            num=("num", "sum"), den=("dt", "sum"))
        s = s[s["den"] > 0]
        return pd.DataFrame({
            "user_id": s["u"].astype("int64"),
            "twa_milli": (s["num"].astype("int64")
                          // s["den"].astype("int64")),
            "span_us": s["den"].astype("int64")})

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])
    per_bucket = (ev.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_twa, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values("user_id").reset_index(drop=True)
        for c in ("user_id", "twa_milli", "span_us"):
            out[c] = out[c].astype("int64")
        return out

    return _merge_partials(per_bucket, final)


USER_TWA_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CAST(round(value * 1000) AS BIGINT) AS mv
  FROM events),
p AS (
  SELECT user_id, mv,
         lead(t) OVER (PARTITION BY user_id
                       ORDER BY t, event_id) - t AS dt
  FROM e)
SELECT user_id,
       CAST(sum(mv * dt) // sum(dt) AS BIGINT) AS twa_milli,
       CAST(sum(dt) AS BIGINT) AS span_us
FROM p WHERE dt IS NOT NULL
GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1
"""


def langid_agreement(sf_dir):
    """Inter-rater agreement (Cohen's kappa) between an "annotator"
    label and the REAL LangId actor-pool prediction — the
    label-quality audit every weakly-supervised training-data
    pipeline runs before trusting a heuristic labeler.

    Rater A is the planted language langs[doc_id % 4]; rater B is
    the LangId stage run end-to-end on a probe whose stopword
    profile is deliberately wrong for doc_id % 7 == 0 (a planted
    ~1/7 disagreement — kappa stays strongly positive, so the
    floor-divided milli-kappa never hits the Python-floor vs
    DuckDB-truncate sign divergence). Scale shape: probes and
    predictions are map-side (actor pool sized to the cluster),
    each batch emits a bounded ≤16-cell confusion partial, and
    kappa = (N·D − Σrᵢcᵢ)·1000 // (N² − Σrᵢcᵢ) — exact
    cross-multiplied integers — finalizes in one merge block."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    langs = sorted(text_analysis._STOP)  # ["de", "en", "es", "fr"]

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        a, texts = [], []
        for did in ids:
            a.append(langs[did % 4])
            b_lang = langs[(did + (1 if did % 7 == 0 else 0)) % 4]
            texts.append(" ".join(sorted(text_analysis._STOP[b_lang]) * 3))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "a_lang": pa.array(a, pa.string()),
                         "text": pa.array(texts, pa.string())})

    def confusion(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"a": t["a_lang"].to_pylist(),
                           "b": t["detected_lang"].to_pylist()})
        out = df.groupby(["a", "b"], as_index=False).size()
        out["size"] = out["size"].astype("int64")
        return out.rename(columns={"size": "n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cm = df.groupby(["a", "b"])["n"].sum()
        n = int(cm.sum())
        d = int(cm[[k for k in cm.index if k[0] == k[1]]].sum())
        rows = cm.groupby("a").sum()
        cols = cm.groupby("b").sum()
        s = int(sum(int(rows.get(l, 0)) * int(cols.get(l, 0))
                    for l in set(rows.index) | set(cols.index)))
        kappa_milli = (1000 * (n * d - s)) // max(n * n - s, 1)
        return pd.DataFrame(
            {"n_docs": pd.Series([n], dtype="int64"),
             "n_agree": pd.Series([d], dtype="int64"),
             "kappa_milli": pd.Series([kappa_milli], dtype="int64")})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    preds = (ds.map_batches(probe, batch_format="pyarrow")
             .map_batches(text_analysis.LangId,
                          concurrency=(max(2, ncpu // 4),
                                       max(4, ncpu - 2)),
                          batch_format="pyarrow"))
    return _merge_partials(
        preds.map_batches(confusion, batch_format="pyarrow"), final)


LANGID_AGREEMENT_SQL = """
WITH r AS (
  SELECT CASE doc_id % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
                          WHEN 2 THEN 'es' ELSE 'fr' END AS a,
         CASE (doc_id + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
              % 4
           WHEN 0 THEN 'de' WHEN 1 THEN 'en'
           WHEN 2 THEN 'es' ELSE 'fr' END AS b
  FROM documents),
cm AS (SELECT a, b, count(*) AS n FROM r GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(coalesce(sum(n) FILTER (a = b), 0) AS BIGINT) AS d
        FROM cm),
marg AS (
  SELECT CAST(coalesce(sum(ra.rn * cb.cn), 0) AS BIGINT) AS s
  FROM (SELECT a AS l, sum(n) AS rn FROM cm GROUP BY 1) ra
  JOIN (SELECT b AS l, sum(n) AS cn FROM cm GROUP BY 1) cb
    ON ra.l = cb.l)
SELECT tot.n AS n_docs, tot.d AS n_agree,
       CAST((1000 * (tot.n * tot.d - marg.s))
            // greatest(tot.n * tot.n - marg.s, 1) AS BIGINT)
         AS kappa_milli
FROM tot, marg
"""


def orders_ivm_counts(sf_dir):
    """Incremental view maintenance: keep the per-status
    (count, cents) aggregate current under the SAME CDC delta
    orders_cdc_merge applies — by folding SIGNED delta partials into
    the base aggregate instead of re-aggregating the merged table
    (the Δ-law agg(apply(base, δ)) = agg(base) ⊕ signed_agg(δ);
    at 100 TB the delta is MBs while the rescan is the table).

    Scale shape: fully zero-shuffle — one pass emits, per batch, the
    base (+1, +cents) partials AND the delta's signed partials
    (update: (0, +100) on surviving keys; delete: (−1, −cents);
    insert: (+1, +cents) under status 'N'), all bounded by the ≤5
    statuses; one merge block sums. The oracle re-aggregates the
    merged table from the same delta CTEs, so equality IS the IVM
    correctness proof."""

    def signed(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        upd = (k % CDC_UPD_MOD == 0) & (k % CDC_DEL_MOD != 0)
        dl = k % CDC_DEL_MOD == 0
        ins = k % CDC_INS_MOD == 0
        parts = [
            pd.DataFrame({"st": st, "dn": np.ones(len(k), np.int64),
                          "dc": c}),                       # base
            pd.DataFrame({"st": st[upd],
                          "dn": np.zeros(int(upd.sum()), np.int64),
                          "dc": np.full(int(upd.sum()), 100,
                                        np.int64)}),       # updates
            pd.DataFrame({"st": st[dl],
                          "dn": np.full(int(dl.sum()), -1, np.int64),
                          "dc": -c[dl]}),                  # deletes
            pd.DataFrame({"st": np.full(int(ins.sum()), "N",
                                        dtype=object),
                          "dn": np.ones(int(ins.sum()), np.int64),
                          "dc": c[ins]}),                  # inserts
        ]
        df = pd.concat(parts, ignore_index=True)
        out = df.groupby("st", as_index=False)[["dn", "dc"]].sum()
        out["dn"] = out["dn"].astype("int64")
        out["dc"] = out["dc"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("st", as_index=False)[["dn", "dc"]].sum()
               .rename(columns={"st": "o_orderstatus",
                                "dn": "n_orders",
                                "dc": "total_cents"}))
        out = out[out["n_orders"] > 0]
        out = out.sort_values("o_orderstatus").reset_index(drop=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["total_cents"] = out["total_cents"].astype("int64")
        return out

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(signed, batch_format="pyarrow"), final)


ORDERS_IVM_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
merged AS (
  SELECT CASE WHEN k %% %d = 0 THEN c + 100 ELSE c END AS c, st
  FROM base WHERE k %% %d != 0
  UNION ALL
  SELECT c, 'N' AS st FROM base WHERE k %% %d = 0)
SELECT st AS o_orderstatus, count(*) AS n_orders,
       CAST(sum(c) AS BIGINT) AS total_cents
FROM merged GROUP BY 1 ORDER BY 1
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_MOD)


BASKET_MINSUP = 2
BASKET_TOPK = 20


def basket_part_pairs(sf_dir):
    """Market-basket pair mining (the A-Priori pair-counting shape,
    MMDS ch.6): the top-20 part pairs by the number of orders whose
    basket contains both — the co-occurrence primitive behind
    recommenders and feature co-selection.

    Scale shape: baskets are unbounded and span input blocks, so the
    okey-bucketed exchange is required; batch-local distinct
    (okey, pkey) is the combiner into it. Each bucket self-joins its
    baskets vectorized (p1 < p2) and emits LOCAL pair counts — a
    lossless partial because an order lives in exactly one bucket.
    Pair support finalizes in a SECOND pair-hash-bucketed exchange
    (two chained exchanges, no union — within the DAG discipline)
    that prunes support < minsup map-side of the merge and keeps a
    local top-k; the global top-20 orders by (support desc, p1, p2)
    so ties never cross engines."""
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy()})
        df = df.drop_duplicates()  # batch-local combiner
        h = pd.util.hash_pandas_object(df["okey"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["okey", "pkey"]].drop_duplicates()
        j = g.merge(g, on="okey")
        j = j[j["pkey_x"] < j["pkey_y"]]
        out = (j.groupby(["pkey_x", "pkey_y"], as_index=False).size()
               .rename(columns={"pkey_x": "p1", "pkey_y": "p2",
                                "size": "support"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(
            out["p1"] * np.int64(1_000_003) + out["p2"],
            index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p1", "p2"], as_index=False)["support"].sum()
        g = g[g["support"] >= BASKET_MINSUP]
        g = (g.sort_values(["support", "p1", "p2"],
                           ascending=[False, True, True])
             .head(BASKET_TOPK))
        for c in ("p1", "p2", "support"):
            g[c] = g[c].astype("int64")
        return g[["p1", "p2", "support"]]

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    per_pair = (li.map_batches(prep, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_pairs, batch_format="pandas")
                .groupby("_b2")
                .map_groups(bucket_topk, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["support", "p1", "p2"],
                               ascending=[False, True, True])
                .head(BASKET_TOPK).reset_index(drop=True))

    return _merge_partials(per_pair, final)


BASKET_PAIRS_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, count(*) AS support
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2)
SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
       CAST(support AS BIGINT) AS support
FROM p WHERE support >= %d
ORDER BY support DESC, p1, p2 LIMIT %d
""" % (BASKET_MINSUP, BASKET_TOPK)


RANGE_SHARDS = 16


def doc_range_layout(sf_dir):
    """Balanced range partitioning by sampled splitters — the
    terasort primitive, and the scale path that replaces
    ``ds.sort`` on the full table: a global sort of 100 TB is an
    all-to-all of every byte, while the sampled-splitter layout moves
    only a key sample, then assigns shards map-side. Documents are
    ranged over the composite key n_chars·1e8 + doc_id (skewed first
    dimension, unique tiebreaker), the layout a length-bucketed
    curriculum/packing reader would want.

    Scale shape: the sample is deterministic (md5(doc_id) hex prefix
    '0', ~1/16 — seedless-shuffle discipline; at 100 TB deepen the
    prefix so ~1k keys/shard survive) and is a pruned 2-column read;
    splitter selection happens in ONE coalesced sample block and only
    the S-1 splitters reach the driver for broadcast. Assignment is a
    zero-shuffle searchsorted pass emitting bounded per-shard
    (count, min, max) partials; the merge is one ≤S-row block. The
    oracle replays sample, splitter ranks and the splitters≤key rule
    exactly."""
    import hashlib

    import ray

    def sample_keys(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_pylist()
        nch = t["n_chars"].to_numpy().astype(np.int64)
        keep = np.array(
            [hashlib.md5(str(int(i)).encode()).hexdigest()[0] == "0"
             for i in ids])
        key = nch * np.int64(100_000_000) + np.asarray(ids, np.int64)
        return pd.DataFrame({"key": key[keep]})

    def to_splitters(df: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(df["key"].to_numpy())
        m = len(k)
        pos = sorted({(i * m) // RANGE_SHARDS
                      for i in range(1, RANGE_SHARDS)} - {0})
        return pd.DataFrame(
            {"key": k[[p - 1 for p in pos]].astype(np.int64)})

    cols = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    spl = (cols.map_batches(sample_keys, batch_format="pyarrow")
           .repartition(1)
           .map_batches(to_splitters, batch_format="pandas",
                        batch_size=None)
           .to_pandas())  # bounded: ≤ S-1 splitter rows
    splitters = np.sort(spl["key"].to_numpy().astype(np.int64))
    ref = ray.put(splitters)

    def assign(t: pa.Table) -> pd.DataFrame:
        spl_ = ray.get(ref)
        key = (t["n_chars"].to_numpy().astype(np.int64)
               * np.int64(100_000_000)
               + t["doc_id"].to_numpy().astype(np.int64))
        shard = np.searchsorted(spl_, key, side="right")
        df = pd.DataFrame({"shard": shard.astype(np.int64),
                           "key": key})
        out = df.groupby("shard", as_index=False).agg(
            n_docs=("key", "size"), lo_key=("key", "min"),
            hi_key=("key", "max"))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            n_docs=("n_docs", "sum"), lo_key=("lo_key", "min"),
            hi_key=("hi_key", "max")).sort_values("shard")
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.reset_index(drop=True)

    return _merge_partials(
        cols.map_batches(assign, batch_format="pyarrow"), final)


DOC_RANGE_LAYOUT_SQL = """
WITH k AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) * 100000000 + doc_id AS key
  FROM documents),
samp AS (
  SELECT key FROM k
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
ordered AS (
  SELECT key, row_number() OVER (ORDER BY key) AS rn,
         count(*) OVER () AS m
  FROM samp),
pos AS (
  SELECT DISTINCT (i * mm.m) // %d AS p
  FROM generate_series(1, %d) g(i),
       (SELECT DISTINCT m FROM ordered) mm(m)
  WHERE (i * mm.m) // %d >= 1),
spl AS (SELECT o.key FROM ordered o JOIN pos ON o.rn = pos.p),
assigned AS (
  SELECT k.key,
         (SELECT count(*) FROM spl WHERE spl.key <= k.key) AS shard
  FROM k)
SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
       CAST(min(key) AS BIGINT) AS lo_key,
       CAST(max(key) AS BIGINT) AS hi_key
FROM assigned GROUP BY 1 ORDER BY 1
""" % (RANGE_SHARDS, RANGE_SHARDS - 1, RANGE_SHARDS)


CHECKSUM_BUCKETS = 16
CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: sums never overflow


def orders_checksum(sf_dir):
    """Anti-entropy table checksum (the Merkle/Cassandra repair
    primitive, and the CDC-apply verifier for orders_cdc_merge):
    per key-range bucket, an order-independent checksum — the sum
    mod 2⁶¹-1 of each row's md5-derived integer over its FULL
    canonical content. Two replicas (or a table before/after a
    botched migration) compare 16 small rows to localize which key
    ranges diverge, instead of diffing 100 TB.

    Scale shape: zero shuffle — the per-row hash and the per-bucket
    (count, sum-mod-p) partial are map-side (sums are associative
    mod p, so the partial is a lossless combiner), and the ≤16-row
    partials coalesce in one merge block. The canonical row string
    (okey|status|cents|iso-date) is engine-neutral, so the SQL
    oracle recomputes every row hash bit-for-bit."""
    import hashlib

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["o_orderkey"].to_numpy().astype(np.int64)
        status = t["o_orderstatus"].to_pylist()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        dates = t["o_orderdate"].to_numpy().astype("datetime64[D]")
        dstr = np.datetime_as_string(dates)
        rows = [int(hashlib.md5(
            ("%d|%s|%d|%s" % (k, s, c, d)).encode())
            .hexdigest()[:15], 16)
            for k, s, c, d in zip(okey, status, cents, dstr)]
        df = pd.DataFrame({"bucket": (okey % CHECKSUM_BUCKETS),
                           "h": pd.Series(rows, dtype=object)})
        out = df.groupby("bucket", as_index=False).agg(
            n_rows=("h", "size"),
            checksum=("h", lambda s: int(sum(s) % CHECKSUM_MOD)))
        out["bucket"] = out["bucket"].astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["checksum"] = out["checksum"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("bucket", as_index=False)
               .agg(n_rows=("n_rows", "sum"),
                    checksum=("checksum",
                              lambda s: int(sum(int(v) for v in s)
                                            % CHECKSUM_MOD)))
               .sort_values("bucket").reset_index(drop=True))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


ORDERS_CHECKSUM_SQL = """
WITH h AS (
  SELECT o_orderkey %% %d AS bucket,
         CAST('0x' || substr(md5(concat_ws('|',
                CAST(o_orderkey AS VARCHAR),
                o_orderstatus,
                CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR),
                strftime(o_orderdate, '%%Y-%%m-%%d'))), 1, 15)
              AS BIGINT) AS hv
  FROM orders)
SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
       CAST(sum(CAST(hv AS HUGEINT)) %% %d AS BIGINT) AS checksum
FROM h GROUP BY 1 ORDER BY 1
""" % (CHECKSUM_BUCKETS, CHECKSUM_MOD)


Q8_SQL = """
WITH tgt AS (
  SELECT s_nationkey AS nk FROM supplier ORDER BY s_suppkey LIMIT 1),
region_cust AS (
  SELECT c_custkey FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE n.n_regionkey =
        (SELECT r_regionkey FROM region WHERE r_name = '%s')),
li AS (
  SELECT l.l_orderkey AS okey,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS c,
         CASE WHEN s.s_nationkey = (SELECT nk FROM tgt)
              THEN 1 ELSE 0 END AS isn
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '%s'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey)
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(li.c * li.isn) AS BIGINT) AS nation_cents,
       CAST(sum(li.c) AS BIGINT) AS total_cents,
       CAST((1000 * sum(li.c * li.isn)) // greatest(sum(li.c), 1)
            AS BIGINT) AS share_permille
FROM li
JOIN orders o ON o.o_orderkey = li.okey
JOIN region_cust rc ON rc.c_custkey = o.o_custkey
WHERE o.o_orderdate >= DATE '%s' AND o.o_orderdate < DATE '%s'
GROUP BY 1 ORDER BY 1
""" % (Q8_REGION, Q8_TYPE, Q8_LO, Q8_HI)


# --- time travel / data-quality / weighted selection -----------------
# Second CDC delta (version 2) on top of orders_cdc_merge's delta —
# pure key arithmetic so both engines replay it. Applies to whatever
# key is ALIVE at v1 (including inserted keys k + CDC_INS_OFF).
TT_UPD2_MOD, TT_DEL2_MOD, TT_UPD2_CENTS = 21, 29, 50


def orders_time_travel(sf_dir):
    """Time-travel reads over a versioned table (Delta Lake /
    Iceberg `AS OF` — Armbrust VLDB'20): the table has a version
    ladder v0 (base orders) → v1 (the orders_cdc_merge delta:
    +100-cent updates %10, deletes %17, inserts %23 under
    key+10⁷) → v2 (a second delta: +50-cent updates on keys %21
    alive at v1, deletes %29), and a reader must see EXACTLY the
    state as of its pinned version — later deltas invisible.

    Scale shape: each version's aggregate folds by the SIGNED
    Delta-law (orders_ivm_counts): agg(v) = agg(v0) + Σ_{i≤v}
    signed_agg(δᵢ), and because every delta is key arithmetic the
    map side derives all three versions' (n, cents) partials from
    each base batch directly — ZERO shuffle, bounded 3-row merge.
    A file-borne delta would ride orders_cdc_merge's key-bucketed
    exchange instead; the aggregate fold is the same."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        n0, c0 = len(k), int(cents.sum())
        # v1: surviving base rows (+100 on %10 survivors) + inserts
        alive1 = k % CDC_DEL_MOD != 0
        c1b = cents + 100 * ((k % CDC_UPD_MOD == 0) & alive1)
        ins = k % CDC_INS_MOD == 0
        keys1 = np.concatenate([k[alive1], k[ins] + CDC_INS_OFF])
        cents1 = np.concatenate([c1b[alive1], cents[ins]])
        n1, c1 = len(keys1), int(cents1.sum())
        # v2: delta 2 applied to the v1 state
        alive2 = keys1 % TT_DEL2_MOD != 0
        c2v = cents1[alive2] + TT_UPD2_CENTS * (
            keys1[alive2] % TT_UPD2_MOD == 0)
        n2, c2 = int(alive2.sum()), int(c2v.sum())
        return pd.DataFrame({
            "version": pd.Series([0, 1, 2], dtype="int64"),
            "n_rows": pd.Series([n0, n1, n2], dtype="int64"),
            "total_cents": pd.Series([c0, c1, c2], dtype="int64")})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("version", as_index=False)
               .agg(n_rows=("n_rows", "sum"),
                    total_cents=("total_cents", "sum"))
               .sort_values("version").reset_index(drop=True))
        return out.astype("int64")

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_partials(partials, merge)


ORDERS_TIME_TRAVEL_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
v1 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN 100 ELSE 0 END AS c
  FROM base WHERE k %% %d <> 0
  UNION ALL
  SELECT k + %d, c FROM base WHERE k %% %d = 0),
v2 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN %d ELSE 0 END AS c
  FROM v1 WHERE k %% %d <> 0)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT)
         AS n_rows, CAST(sum(c) AS BIGINT) AS total_cents FROM base
  UNION ALL
  SELECT 1, count(*), CAST(sum(c) AS BIGINT) FROM v1
  UNION ALL
  SELECT 2, count(*), CAST(sum(c) AS BIGINT) FROM v2)
ORDER BY version
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_OFF, CDC_INS_MOD,
       TT_UPD2_MOD, TT_UPD2_CENTS, TT_DEL2_MOD)


DQ_CHECKS = ("not_null:o_orderkey", "unique:o_orderkey",
             "accepted_values:o_orderstatus",
             "domain:o_orderkey_lt_ins_off", "absent:cdc_deleted_keys",
             "non_negative:total_cents")


def orders_dq_expectations(sf_dir):
    """Declarative data-quality expectation suite (deequ — Schelter
    VLDB'18; Great Expectations) validated against a PIPELINE OUTPUT
    — the post-CDC-merge orders table — not the pristine input, so
    the suite actually bites: the delta's inserted rows carry status
    'N' (violates accepted_values {F,O,P}) and keys ≥ 10⁷ (violates
    the key-domain bound), while uniqueness / not-null / no-deleted-
    keys / non-negative pass, proving the merge. Output = one row
    per check: (check, total, violations, passed).

    Scale shape: five of the six checks are per-batch count
    partials (lossless combiner, zero shuffle); uniqueness is the
    one genuinely distributed check — batch-local (key, cnt)
    distinct partials through ONE key-bucketed exchange, per-bucket
    violations = Σ(cnt−1) additive because a key lives in exactly
    one bucket. The union of both partial streams meets in a single
    bounded 6-row merge."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def v1_rows(t: pa.Table):
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        alive1 = k % CDC_DEL_MOD != 0
        c1b = cents + 100 * ((k % CDC_UPD_MOD == 0) & alive1)
        ins = k % CDC_INS_MOD == 0
        keys1 = np.concatenate([k[alive1], k[ins] + CDC_INS_OFF])
        cents1 = np.concatenate([c1b[alive1], cents[ins]])
        st1 = np.concatenate(
            [st[alive1], np.full(int(ins.sum()), "N", dtype=object)])
        return keys1, cents1, st1

    def scan_checks(t: pa.Table) -> pd.DataFrame:
        keys1, cents1, st1 = v1_rows(t)
        n = len(keys1)
        viol = [
            0,  # not_null: synthesized keys are never null
            0,  # unique: measured by the exchange branch below
            int((~np.isin(st1, ("F", "O", "P"))).sum()),
            int((keys1 >= CDC_INS_OFF).sum()),
            int(((keys1 < CDC_INS_OFF)
                 & (keys1 % CDC_DEL_MOD == 0)).sum()),
            int((cents1 < 0).sum()),
        ]
        tot = [n, 0, n, n, n, n]  # unique totals ride the exchange
        return pd.DataFrame({
            "ci": pd.Series(range(len(DQ_CHECKS)), dtype="int64"),
            "total": pd.Series(tot, dtype="int64"),
            "violations": pd.Series(viol, dtype="int64")})

    def key_partial(t: pa.Table) -> pd.DataFrame:
        keys1, _, _ = v1_rows(t)
        p = (pd.DataFrame({"k": keys1})
             .groupby("k", as_index=False).size()
             .rename(columns={"size": "cnt"}))
        h = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        p["cnt"] = p["cnt"].astype("int64")
        p["k"] = p["k"].astype("int64")
        return p

    def bucket_unique(g: pd.DataFrame) -> pd.DataFrame:
        per_key = g.groupby("k")["cnt"].sum()
        return pd.DataFrame({
            "ci": pd.Series([1], dtype="int64"),
            "total": pd.Series([int(per_key.sum())], dtype="int64"),
            "violations": pd.Series([int((per_key - 1).sum())],
                                    dtype="int64")})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    scans = ds.map_batches(scan_checks, batch_format="pyarrow")
    uniq = (ds.map_batches(key_partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_unique, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("ci", as_index=False)
             .agg(total=("total", "sum"),
                  violations=("violations", "sum"))
             .sort_values("ci").reset_index(drop=True))
        return pd.DataFrame({
            "check": pd.Series([DQ_CHECKS[int(i)] for i in g["ci"]],
                               dtype=object),
            "total": g["total"].astype("int64"),
            "violations": g["violations"].astype("int64"),
            "passed": (g["violations"] == 0).astype("int64")})

    return _merge_partials(scans.union(uniq), merge)


ORDERS_DQ_SQL = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         o_orderstatus AS st
  FROM orders),
v1 AS (
  SELECT k, c + CASE WHEN k %% %d = 0 THEN 100 ELSE 0 END AS c, st
  FROM base WHERE k %% %d <> 0
  UNION ALL
  SELECT k + %d, c, 'N' FROM base WHERE k %% %d = 0),
checks AS (
  SELECT 'not_null:o_orderkey' AS chk, count(*) AS total,
         count(*) - count(k) AS violations FROM v1
  UNION ALL
  SELECT 'unique:o_orderkey', count(*),
         count(*) - count(DISTINCT k) FROM v1
  UNION ALL
  SELECT 'accepted_values:o_orderstatus', count(*),
         sum(CASE WHEN st NOT IN ('F','O','P') THEN 1 ELSE 0 END)
  FROM v1
  UNION ALL
  SELECT 'domain:o_orderkey_lt_ins_off', count(*),
         sum(CASE WHEN k >= %d THEN 1 ELSE 0 END) FROM v1
  UNION ALL
  SELECT 'absent:cdc_deleted_keys', count(*),
         sum(CASE WHEN k < %d AND k %% %d = 0 THEN 1 ELSE 0 END)
  FROM v1
  UNION ALL
  SELECT 'non_negative:total_cents', count(*),
         sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) FROM v1)
SELECT chk AS "check", CAST(total AS BIGINT) AS total,
       CAST(violations AS BIGINT) AS violations,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT)
       AS passed
FROM checks ORDER BY chk
""" % (CDC_UPD_MOD, CDC_DEL_MOD, CDC_INS_OFF, CDC_INS_MOD,
       CDC_INS_OFF, CDC_INS_OFF, CDC_DEL_MOD)


def lineitem_weighted_median(sf_dir):
    """Per-returnflag WEIGHTED median: the exact weighted order
    statistic (50% of shipped QUANTITY lies at or below the answer
    price) — the statistic behind weighted percentile SLAs and
    cost-weighted histogram equalization; quantity-weighted, so a
    10-unit line counts ten times a 1-unit line. Same grouped
    two-pass radix selection as segment_price_median, with weight
    sums replacing row counts in both histogram passes: no sort at
    any scale, ranks are weight ranks.

    Pass 1 histograms Σw per (flag, cents>>RADIX_SHIFT) — bounded
    |flags|×2^14 cells, a lossless combiner; the per-flag cumulative
    walk pins target = (W+1)//2 to one high bucket + residual weight
    rank. Pass 2 histograms Σw per full value inside only the
    selected cells (pruned map-side) and walks to the smallest value
    whose cumulative weight reaches the residual — the rule SQL
    replays via a window cumsum, engine-independent because ties are
    value ties."""

    def wv_of(t: pa.Table):
        v = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        w = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy()
        f = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        return f, v, w

    wm_schema = pa.schema([("f", pa.string()), ("k", pa.int64()),
                           ("w", pa.int64())])

    def hist_hi(t: pa.Table) -> pa.Table:
        f, v, w = wv_of(t)
        out = (pd.DataFrame({"f": f, "k": v >> RADIX_SHIFT, "w": w})
               .groupby(["f", "k"], as_index=False)["w"].sum())
        return pa.Table.from_arrays(
            [pa.array(out["f"], pa.string()),
             pa.array(out["k"].to_numpy(np.int64)),
             pa.array(out["w"].to_numpy(np.int64))], schema=wm_schema)

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice",
                        "l_quantity"])
    h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
          .to_pandas()
          .groupby(["f", "k"], as_index=False)["w"].sum())
    targets = {}   # flag -> (hi_bucket, residual_weight_rank, W)
    for flag, grp in h1.groupby("f"):
        grp = grp.sort_values("k")
        W = int(grp["w"].sum())
        tgt = (W + 1) // 2
        cum = grp["w"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, tgt))
        prev = int(cum[i - 1]) if i else 0
        targets[flag] = (int(grp["k"].iloc[i]), tgt - prev, W)
    wanted = {(flag, hi) for flag, (hi, _, _) in targets.items()}

    def hist_lo(t: pa.Table) -> pa.Table:
        f, v, w = wv_of(t)
        hi = v >> RADIX_SHIFT
        m = np.zeros(len(f), dtype=bool)  # |wanted| = |flags| passes,
        for flag, hi_sel in wanted:       # each one vectorized
            m |= (f == flag) & (hi == hi_sel)
        out = (pd.DataFrame({"f": f[m], "k": v[m], "w": w[m]})
               .groupby(["f", "k"], as_index=False)["w"].sum())
        return pa.Table.from_arrays(
            [pa.array(out["f"], pa.string()),
             pa.array(out["k"].to_numpy(np.int64)),
             pa.array(out["w"].to_numpy(np.int64))], schema=wm_schema)

    h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
          .to_pandas()
          .groupby(["f", "k"], as_index=False)["w"].sum())
    rows = []
    for flag in sorted(targets):
        hi_sel, resid, W = targets[flag]
        grp = h2[h2["f"] == flag].sort_values("k")
        cum = grp["w"].cumsum().to_numpy()
        j = int(np.searchsorted(cum, resid))
        rows.append((flag, W, int(grp["k"].iloc[j])))
    return pd.DataFrame({
        "l_returnflag": pd.Series([r[0] for r in rows], dtype=object),
        "w_total": pd.Series([r[1] for r in rows], dtype="int64"),
        "median_cents": pd.Series([r[2] for r in rows],
                                  dtype="int64")})


# Bloom audit constants: m deliberately small so the audit is
# non-degenerate at test scales (sf0.001 fill ≈ 17% → measurable FPs;
# sf0.01 saturates the filter, SHOWING the m-sizing tradeoff the
# membership_join bloom_fp parameter governs).
BLOOM_AUDIT_M = 1 << 14
BLOOM_AUDIT_K = 2
BLOOM_PROBE_OFF = 100_000_000


def bloom_fpr_audit(sf_dir):
    """Bloom-filter false-positive-rate audit — the measurement that
    validates ``joins.membership_join``'s Bloom pre-filter contract
    (no false negatives; FPR governed by fill ratio) before trusting
    it at 100 TB (Bloom '70; Broder & Mitzenmacher '04 survey).
    Members = order keys; probes = keys + 10⁸ (guaranteed
    non-members); filter bits use the repo's md5-hex discipline so
    DuckDB replays the EXACT bit arithmetic — the audit is fully
    oracled, unlike the production filter's siphash.

    Scale shape: pass 1 emits batch-local DISTINCT bit positions (a
    bounded ≤2^14 domain → lossless combiner), driver-merged and
    broadcast once via ray.put; pass 2 probes map-side with two
    np.isin checks per batch and emits (n, fp) count partials —
    both passes zero shuffle, single bounded merge row. Per-key md5
    is the audit's honest cost (the same per-row loop as
    orders_checksum)."""
    import hashlib
    import ray

    def bitpos(key: int, i: int) -> int:
        h = hashlib.md5(b"bf:%d:%d" % (key, i)).hexdigest()
        return int(h[:15], 16) % BLOOM_AUDIT_M

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def member_bits(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        bits = {bitpos(int(key), i)
                for key in k for i in range(BLOOM_AUDIT_K)}
        return pd.DataFrame({"bit": pd.Series(sorted(bits),
                                              dtype="int64")})

    bits = np.sort(ds.map_batches(member_bits, batch_format="pyarrow")
                   .to_pandas()["bit"].drop_duplicates()
                   .to_numpy(np.int64))
    bits_ref = ray.put(bits)
    bits_set = len(bits)

    def probe(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        b = _ray.get(bits_ref)
        k = t["o_orderkey"].to_numpy()
        cols = [np.fromiter((bitpos(int(key) + BLOOM_PROBE_OFF, i)
                             for key in k), np.int64, len(k))
                for i in range(BLOOM_AUDIT_K)]
        maybe = np.ones(len(k), dtype=bool)
        for c in cols:
            maybe &= np.isin(c, b)
        return pd.DataFrame({"n": pd.Series([len(k)], dtype="int64"),
                             "fp": pd.Series([int(maybe.sum())],
                                             dtype="int64")})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n, fp = int(df["n"].sum()), int(df["fp"].sum())
        return pd.DataFrame({
            "n_keys": pd.Series([n], dtype="int64"),
            "bits_set": pd.Series([bits_set], dtype="int64"),
            "measured_fp": pd.Series([fp], dtype="int64"),
            "fill_permille": pd.Series(
                [1000 * bits_set // BLOOM_AUDIT_M], dtype="int64")})

    partials = ds.map_batches(probe, batch_format="pyarrow")
    return _merge_partials(partials, merge)


BLOOM_FPR_SQL = """
WITH keys AS (SELECT o_orderkey AS k FROM orders),
hs AS (SELECT 0 AS i UNION ALL SELECT 1),
mb AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5('bf:' || CAST(k AS VARCHAR) || ':'
              || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) %% %d AS bit
  FROM keys, hs),
pb AS (
  SELECT k,
         bool_and(
           CAST('0x' || substr(md5('bf:'
                || CAST(k + %d AS VARCHAR) || ':'
                || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) %% %d
           IN (SELECT bit FROM mb)) AS maybe
  FROM keys, hs GROUP BY k)
SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
       CAST((SELECT count(*) FROM mb) AS BIGINT) AS bits_set,
       CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         AS measured_fp,
       CAST(1000 * (SELECT count(*) FROM mb) // %d AS BIGINT)
         AS fill_permille
FROM pb
""" % (BLOOM_AUDIT_M, BLOOM_PROBE_OFF, BLOOM_AUDIT_M, BLOOM_AUDIT_M)


WEIGHTED_MEDIAN_SQL = """
WITH wv AS (
  SELECT l_returnflag AS f,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem),
g AS (SELECT f, v, CAST(sum(w) AS BIGINT) AS w FROM wv GROUP BY 1, 2),
c AS (SELECT f, v, sum(w) OVER (PARTITION BY f ORDER BY v) AS cw,
             (sum(w) OVER (PARTITION BY f) + 1) // 2 AS tgt
      FROM g),
m AS (SELECT f, min(v) AS median_cents FROM c WHERE cw >= tgt
      GROUP BY f),
t AS (SELECT f, CAST(sum(w) AS BIGINT) AS w_total FROM wv GROUP BY f)
SELECT t.f AS l_returnflag, t.w_total,
       CAST(m.median_cents AS BIGINT) AS median_cents
FROM t JOIN m ON m.f = t.f ORDER BY 1
"""


def orders_price_mad(sf_dir):
    """Median absolute deviation of the order price — the robust
    scale estimator (Hampel '74; the statistic behind robust z-score
    outlier fences, pairing orders_winsorized_mean's robust
    location): MAD = median(|x − median(x)|), both medians EXACT
    order statistics found by the two-pass radix selection — four
    zero-shuffle histogram passes total, no sort at any scale.

    Selection rule everywhere: rank (N+1)//2, answer = smallest
    value whose cumulative count reaches it (ties are value ties, so
    rank→value is engine-independent; SQL replays via row_number).
    The deviation pass re-reads the column and subtracts the
    broadcast median map-side — deviations never materialize as a
    table."""

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def select_median(value_fn) -> tuple[int, int]:
        """Two-pass radix selection of rank (N+1)//2 over
        ``value_fn(batch) -> int64 array``. Returns (N, value)."""
        def hist_hi(t: pa.Table) -> pd.DataFrame:
            out = (pd.DataFrame({"hi": value_fn(t) >> RADIX_SHIFT})
                   .groupby("hi", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")

        h1 = (ds.map_batches(hist_hi, batch_format="pyarrow")
              .to_pandas()
              .groupby("hi", as_index=False)["n"].sum()
              .sort_values("hi").reset_index(drop=True))
        n_total = int(h1["n"].sum())
        tgt = (n_total + 1) // 2
        cum = h1["n"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, tgt))
        hi_sel = int(h1["hi"].iloc[i])
        resid = tgt - (int(cum[i - 1]) if i else 0)

        def hist_lo(t: pa.Table) -> pd.DataFrame:
            v = value_fn(t)
            v = v[(v >> RADIX_SHIFT) == hi_sel]
            out = (pd.DataFrame({"v": v})
                   .groupby("v", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")

        h2 = (ds.map_batches(hist_lo, batch_format="pyarrow")
              .to_pandas()
              .groupby("v", as_index=False)["n"].sum()
              .sort_values("v").reset_index(drop=True))
        c2 = h2["n"].cumsum().to_numpy()
        j = int(np.searchsorted(c2, resid))
        return n_total, int(h2["v"].iloc[j])

    n, med = select_median(cents_of)
    _, mad = select_median(lambda t: np.abs(cents_of(t) - med))
    return pd.DataFrame({
        "n_orders": pd.Series([n], dtype="int64"),
        "median_cents": pd.Series([med], dtype="int64"),
        "mad_cents": pd.Series([mad], dtype="int64")})


ORDERS_MAD_SQL = """
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
cnt AS (SELECT count(*) AS n FROM v),
m AS (
  SELECT c AS med FROM
    (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v), cnt
  WHERE rn = (n + 1) // 2),
d AS (SELECT abs(c - (SELECT med FROM m)) AS dv FROM v),
md AS (
  SELECT dv FROM
    (SELECT dv, row_number() OVER (ORDER BY dv) AS rn FROM d), cnt
  WHERE rn = (n + 1) // 2)
SELECT CAST((SELECT n FROM cnt) AS BIGINT) AS n_orders,
       CAST((SELECT med FROM m) AS BIGINT) AS median_cents,
       CAST((SELECT dv FROM md) AS BIGINT) AS mad_cents
"""


JOIN_SAMPLE_HEX = "0"  # md5 first hex char → sampling rate 1/16
JOIN_SAMPLE_RATE = 16


def orderkey_join_sample_estimate(sf_dir):
    """Sampled join-size estimation vs exact truth — the optimizer's
    actual workflow (sample keys, scale up) audited against the
    exact answer orderkey_join_stats computes, in ONE pass: keys
    whose md5 hex starts with '0' (a deterministic 1/16 KEY sample —
    seedless-shuffle discipline, so both engines draw the SAME
    sample) contribute cnt_li·cnt_od to the estimate, scaled ×16;
    the same bucket pass sums the unscaled products for the truth.
    Output = (true_pairs, est_pairs, err_permille) — the error the
    estimator actually made, as data.

    Scale shape: per-batch (key, side) count partials (lossless
    combiner) ride the ONE key-bucketed tagged exchange of
    orderkey_join_stats; each bucket multiplies vectorized, md5-tags
    its distinct keys once, and emits a 2-integer partial; single
    bounded merge."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "lineitem")
    COLS = ["k", "n", "_bucket", "_side"]

    def prep(table: str, col: str, side: int):
        def fn(t: pa.Table) -> pd.DataFrame:
            p = (pd.DataFrame({"k": t[col].to_numpy()})
                 .groupby("k", as_index=False).size()
                 .rename(columns={"size": "n"}))
            p["n"] = p["n"].astype("int64")
            return _tag_bucket(p, buckets, side, COLS, key="k")
        return _read(sf_dir, table, columns=[col]).map_batches(
            fn, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        li_ = (g[g["_side"] == 0].groupby("k")["n"].sum())
        od_ = (g[g["_side"] == 1].groupby("k")["n"].sum())
        j = pd.DataFrame({"a": li_, "b": od_}).dropna()
        a = j["a"].to_numpy(np.int64)
        b = j["b"].to_numpy(np.int64)
        prod = a * b
        sampled = np.fromiter(
            (hashlib.md5(str(int(k)).encode()).hexdigest()[0]
             == JOIN_SAMPLE_HEX for k in j.index),
            dtype=bool, count=len(j))
        return pd.DataFrame({
            "true_pairs": pd.Series([int(prod.sum())], dtype="int64"),
            "sampled_pairs": pd.Series([int(prod[sampled].sum())],
                                       dtype="int64")})

    tagged = prep("lineitem", "l_orderkey", 0).union(
        prep("orders", "o_orderkey", 1))
    per_bucket = (tagged.groupby("_bucket")
                  .map_groups(bucket_pairs, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        true = int(df["true_pairs"].sum())
        est = JOIN_SAMPLE_RATE * int(df["sampled_pairs"].sum())
        err = 1000 * abs(est - true) // max(true, 1)
        return pd.DataFrame({
            "true_pairs": pd.Series([true], dtype="int64"),
            "est_pairs": pd.Series([est], dtype="int64"),
            "err_permille": pd.Series([err], dtype="int64")})

    return _merge_partials(per_bucket, merge)


JOIN_SAMPLE_SQL = """
WITH li AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem
            GROUP BY 1),
od AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1),
j AS (
  SELECT li.k, li.n * od.n AS prod,
         CASE WHEN substr(md5(CAST(li.k AS VARCHAR)), 1, 1) = '%s'
              THEN 1 ELSE 0 END AS s
  FROM li JOIN od ON od.k = li.k),
t AS (SELECT CAST(sum(prod) AS BIGINT) AS true_pairs,
             CAST(%d * sum(prod * s) AS BIGINT) AS est_pairs
      FROM j)
SELECT true_pairs, est_pairs,
       CAST(1000 * abs(est_pairs - true_pairs)
            // greatest(true_pairs, 1) AS BIGINT) AS err_permille
FROM t
""" % (JOIN_SAMPLE_HEX, JOIN_SAMPLE_RATE)


SQ8_DIV, SQ8_CLIP, SQ8_K = 64, 15, 10  # int4-style signed grid


def embed_squant_recall(sf_dir):
    """Scalar-quantization recall audit (the FAISS SQ8 tradeoff —
    Jégou et al. TPAMI'11 §III discuss the coarse-quantizer loss):
    rank the corpus against query vec 0 on a coarse int4-style
    grid (clip(milli//64, ±15) — toward-zero division, the
    engine-shared rule) vs the exact milli grid, and report the per-rank top-10
    comparison with a hit flag — the measurement a vector store runs
    before shipping 8× memory compression (recall 8/10 at sf0.001,
    6/10 at sf0.01 — the grid is deliberately coarse so the audit
    bites; int8 at these dims is lossless and degenerate). Both scorers are INTEGER
    dot products, so ranking and ties (score desc, vec_id asc)
    replay bit-for-bit in SQL; no float ulp ever crosses engines.

    Scale shape: both query vectors broadcast once (tiny); each
    batch quantizes map-side, does two integer matvecs, and emits
    its local top-k for each scorer — an admissible partial (any
    global top-k member is in its batch's top-k) — into one bounded
    driver merge. Zero shuffle; the embedding column never enters an
    exchange."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def milli_of(vs) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) * EMB_QUANT
                      for v in vs])
        return (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)

    def sq8_of(m: np.ndarray) -> np.ndarray:
        return np.clip(np.sign(m) * (np.abs(m) // SQ8_DIV),
                       -SQ8_CLIP, SQ8_CLIP)

    qrow = (emb.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)),
        batch_format="pyarrow").to_pandas())
    qm = milli_of([np.asarray(list(qrow["embedding"])[0],
                              dtype=np.float64)])[0]
    qs = sq8_of(qm.reshape(1, -1))[0]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "scorer": pd.Series(dtype="int64")})
        m = milli_of(df["embedding"])
        vid = df["vec_id"].to_numpy(np.int64)
        outs = []
        for scorer, (mat, qv) in enumerate(
                [(m, qm), (sq8_of(m), qs)]):
            s = mat @ qv
            order = np.lexsort((vid, -s))[:SQ8_K]
            outs.append(pd.DataFrame({
                "vec_id": vid[order], "s": s[order],
                "scorer": np.full(len(order), scorer, np.int64)}))
        return pd.concat(outs, ignore_index=True).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        tops = {}
        for scorer, g in df.groupby("scorer"):
            g = g.sort_values(["s", "vec_id"],
                              ascending=[False, True]).head(SQ8_K)
            tops[int(scorer)] = g["vec_id"].to_numpy(np.int64)
        exact, sq8 = tops[0], tops[1]
        exact_set = set(exact.tolist())
        return pd.DataFrame({
            "rank": pd.Series(range(SQ8_K), dtype="int64"),
            "vec_exact": pd.Series(exact, dtype="int64"),
            "vec_sq8": pd.Series(sq8, dtype="int64"),
            "hit": pd.Series([1 if v in exact_set else 0
                              for v in sq8], dtype="int64")})

    return _merge_partials(
        emb.map_batches(partial, batch_format="pandas"), merge)


EMBED_SQ8_SQL = """
WITH m AS (
  SELECT e.vec_id, s.i,
         CAST(round(e.embedding[s.i] * 1000) AS BIGINT) AS q
  FROM embeddings e, generate_series(1, %d) s(i)),
q8 AS (
  SELECT vec_id, i,
         greatest(-%d, least(%d, q // %d)) AS q
  FROM m),
qm AS (SELECT i, q FROM m WHERE vec_id = 0),
qq AS (SELECT i, q FROM q8 WHERE vec_id = 0),
xs AS (SELECT m.vec_id, CAST(sum(m.q * qm.q) AS BIGINT) AS s
       FROM m JOIN qm USING (i) GROUP BY 1),
ss AS (SELECT q8.vec_id, CAST(sum(q8.q * qq.q) AS BIGINT) AS s
       FROM q8 JOIN qq USING (i) GROUP BY 1),
rx AS (SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id)
         AS rn FROM xs QUALIFY rn <= %d),
rs AS (SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id)
         AS rn FROM ss QUALIFY rn <= %d)
SELECT CAST(rx.rn - 1 AS BIGINT) AS rank,
       rx.vec_id AS vec_exact, rs.vec_id AS vec_sq8,
       CAST(CASE WHEN rs.vec_id IN (SELECT vec_id FROM rx)
            THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM rx JOIN rs USING (rn) ORDER BY rank
""" % (EMB_DIM, SQ8_CLIP, SQ8_CLIP, SQ8_DIV, SQ8_K, SQ8_K)


def orders_dow_seasonality(sf_dir):
    """Day-of-week seasonality index of order revenue — the calendar
    companion to the time-series audit triad (trend slope → CUSUM
    shift → ACF persistence): per weekday, order count, revenue
    cents and the seasonality index 7000·cents_d // total (1000 =
    flat week), the statistic capacity planners read before sizing
    ingestion for weekday peaks. Weekday = epoch-days % 7 — pure
    integer arithmetic both engines share, no locale-dependent
    DAYNAME ever crosses.

    Scale shape: the (dow, count, cents) table is a bounded 7-cell
    partial — a lossless per-batch combiner, zero shuffle, one merge
    block computing the exact integer permille index."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"dow": days % 7, "n": 1, "cents": cents})
               .groupby("dow", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dow", as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values("dow").reset_index(drop=True))
        total = int(g["cents"].sum())
        g["index_permille"] = (7000 * g["cents"]) // max(total, 1)
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


ORDERS_DOW_SQL = """
WITH d AS (
  SELECT (CAST(epoch_us(o_orderdate) AS BIGINT)
          // 86400000000) % 7 AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
g AS (SELECT dow, count(*) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM d GROUP BY 1)
SELECT dow, CAST(n_orders AS BIGINT) AS n_orders, cents,
       CAST(7000 * CAST(cents AS HUGEINT)
            // greatest((SELECT sum(cents) FROM g), 1) AS BIGINT)
         AS index_permille
FROM g ORDER BY dow
"""


CONC_INTERVAL_US = 600_000_000   # each event holds a 10-min slot
CONC_PANE_US = 600_000_000       # sweep-line pane width


def events_peak_concurrency(sf_dir):
    """Peak interval concurrency by DISTRIBUTED SWEEP-LINE — the
    capacity question (max simultaneous sessions/connections) solved
    without a global sort: every event holds a half-open 10-minute
    slot [ts, ts+600s), concurrency is the running sum of +1/−1
    deltas in (t, delta) order (−1 first at equal t, so a slot ending
    exactly when another starts frees first — the half-open rule),
    and the answer is the global max plus the FIRST microsecond it is
    reached.

    Scale shape: the prefix decomposition of events_late_arrivals /
    events_cusum_alarms applied to the sweep: delta rows ride ONE
    pane-bucketed exchange (10-min panes); each pane reduces
    vectorized to (net, internal prefix max, t of its first internal
    argmax) — within a run of equal (t, delta) the prefix max is
    order-independent, so the pane statistic is well-defined; the
    bounded merge derives each pane's exclusive carry and reads off
    max(carry + mx) with the first achieving pane's stored t. No
    global sort ever happens."""
    buckets = _exchange_buckets(sf_dir, "events")

    def deltas(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        tt = np.concatenate([ts, ts + CONC_INTERVAL_US])
        dd = np.concatenate([np.ones(len(ts), np.int64),
                             np.full(len(ts), -1, np.int64)])
        df = pd.DataFrame({"t": tt, "d": dd})
        # batch-local pre-reduction: collapse equal (t, d) runs
        p = df.groupby(["t", "d"], as_index=False).agg(
            n=("d", "size"))
        p["pane"] = p["t"] // CONC_PANE_US
        h = pd.util.hash_pandas_object(p["pane"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"t": "int64", "d": "int64", "n": "int64",
                         "pane": "int64"})

    def pane_stats(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pane, gg in g.groupby("pane"):
            gg = (gg.groupby(["t", "d"], as_index=False)["n"].sum()
                  .sort_values(["t", "d"]))  # -1 sorts before +1
            step = (gg["d"] * gg["n"]).to_numpy()
            cum = np.cumsum(step)
            i = int(np.argmax(cum))  # first index achieving the max
            rows.append((int(pane), int(cum[-1]), int(cum[i]),
                         int(gg["t"].iloc[i])))
        out = pd.DataFrame(rows, columns=["pane", "net", "mx",
                                          "t_first"])
        return out.astype("int64")

    ds = _read(sf_dir, "events", columns=["ts"])
    per_pane = (ds.map_batches(deltas, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(pane_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("pane").reset_index(drop=True)
        carry = g["net"].cumsum().shift(1, fill_value=0).to_numpy()
        tot = carry + g["mx"].to_numpy()
        peak = int(tot.max())
        first = int(np.argmax(tot == peak))
        return pd.DataFrame({
            "peak": pd.Series([peak], dtype="int64"),
            "t_peak_us": pd.Series([int(g["t_first"].iloc[first])],
                                   dtype="int64")})

    return _merge_partials(per_pane, merge)


EVENTS_PEAK_SQL = """
WITH iv AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS s FROM events),
d AS (
  SELECT s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT s + %d, -1 FROM iv),
c AS (
  SELECT t, sum(d) OVER (ORDER BY t, d
         ROWS UNBOUNDED PRECEDING) AS cum
  FROM d),
p AS (SELECT max(cum) AS peak FROM c)
SELECT CAST((SELECT peak FROM p) AS BIGINT) AS peak,
       CAST(min(t) AS BIGINT) AS t_peak_us
FROM c WHERE cum = (SELECT peak FROM p)
""" % CONC_INTERVAL_US


def lineitem_sequence_audit(sf_dir):
    """Ordinal-sequence integrity audit — per order, classify the
    line-number sequence into a failure taxonomy: ``ok`` (exactly
    1..n), ``dup`` (a line number repeats — double-ingest), ``gap``
    (no duplicate but numbers are not a dense 1..n prefix — rows
    lost in transit). The billing/ledger completeness check every
    warehouse runs after an at-least-once ingest; on this corpus the
    synthesizer draws line numbers with replacement, so all three
    classes are populated at every scale (37 ok / 833 dup / 603 gap
    at sf0.001) and the taxonomy carries real signal.

    Scale shape: (okey, linenumber) pairs ride ONE okey-bucketed
    exchange (an order's lines co-locate); each bucket classifies
    vectorized from four per-order aggregates (count, max, min,
    distinct) and emits bounded (class, n) partials; single 3-row
    merge."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    CLASSES = ("dup", "gap", "ok")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"k": t["l_orderkey"].to_numpy(),
                          "ln": t["l_linenumber"].to_numpy()})
        h = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"k": "int64", "ln": "int64"})

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("k")["ln"].agg(["size", "max", "min",
                                      "nunique"])
        dup = a["nunique"] < a["size"]
        ok = (~dup) & (a["min"] == 1) & (a["max"] == a["size"])
        counts = [int(dup.sum()), int((~dup & ~ok).sum()),
                  int(ok.sum())]
        return pd.DataFrame({
            "class": pd.Series(CLASSES, dtype=object),
            "n_orders": pd.Series(counts, dtype="int64")})

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_audit, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("class", as_index=False)["n_orders"].sum()
               .sort_values("class").reset_index(drop=True))
        out["class"] = out["class"].astype(object)
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return _merge_partials(per_bucket, merge)


LINEITEM_SEQ_SQL = """
WITH a AS (
  SELECT l_orderkey AS k, count(*) AS n, max(l_linenumber) AS mx,
         min(l_linenumber) AS mn,
         count(DISTINCT l_linenumber) AS nd
  FROM lineitem GROUP BY 1)
SELECT CASE WHEN nd < n THEN 'dup'
            WHEN mn = 1 AND mx = n THEN 'ok'
            ELSE 'gap' END AS "class",
       CAST(count(*) AS BIGINT) AS n_orders
FROM a GROUP BY 1 ORDER BY 1
"""


# SCD2 version boundaries for the point-in-time dimension join:
# customers with custkey % PIT_MOD == 0 rotate their market segment
# at each boundary (pure arithmetic — both engines replay it).
PIT_BOUNDS = ("1994-01-01", "1996-01-01")
PIT_MOD = 5


def orders_pit_dimension_join(sf_dir):
    """Point-in-time dimension join — the feature-store / SCD2
    correctness primitive (Kimball type-2 dimensions; every feature
    platform's 'as-of the event, not as-of today' rule): each order
    must see the customer-segment VERSION valid at its order date,
    never the current one (that is label leakage). The versioned
    dimension derives by rule: customers with custkey % 5 == 0
    rotate one segment forward at 1994-01-01 and again at
    1996-01-01; effective segment = rotate(base, versions passed).
    Output = revenue rollup by EFFECTIVE segment — provably
    different from the current-version rollup.

    Scale shape: the segment VOCABULARY (bounded, ≤ segments) comes
    from a per-batch distinct pre-pass; the per-customer base segment
    attaches through ``joins.attach_dim`` (broadcast ≤ threshold,
    bucketed hash join at 10⁹ customers — forced-path tested); the
    version lookup is a map-side searchsorted against the closure's
    boundary array, so everything past the attach is ZERO shuffle;
    bounded (segment, n, cents) combiner, one merge."""
    cust_ds = _read(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"])
    seg_vocab = (cust_ds.map_batches(
        lambda t: pa.table(
            {"s": pc.unique(t["c_mktsegment"])}),
        batch_format="pyarrow").to_pandas())
    segs = sorted(seg_vocab["s"].unique().tolist())
    seg_idx = {s: i for i, s in enumerate(segs)}
    bounds = np.array([np.datetime64(b, "D").astype(np.int64)
                       for b in PIT_BOUNDS], dtype=np.int64)
    nseg = len(segs)

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = t["o_custkey"].to_numpy()
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        base = np.fromiter((seg_idx[s] for s in
                            t["seg"].to_pylist()), np.int64, len(ck))
        shift = np.where(ck % PIT_MOD == 0,
                         np.searchsorted(bounds, days, side="right"),
                         0)
        eff = (base + shift) % nseg
        out = (pd.DataFrame({"ei": eff, "n": 1, "cents": cents})
               .groupby("ei", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("ei", as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values("ei").reset_index(drop=True))
        return pd.DataFrame({
            "segment": pd.Series([segs[int(i)] for i in g["ei"]],
                                 dtype=object),
            "n_orders": g["n_orders"].astype("int64"),
            "cents": g["cents"].astype("int64")})

    ds = joins.attach_dim(
        _read(sf_dir, "orders",
              columns=["o_custkey", "o_orderdate", "o_totalprice"]),
        cust_ds, "o_custkey", "c_custkey", "c_mktsegment",
        out_col="seg", how="inner")
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


PIT_JOIN_SQL = """
WITH segs AS (
  SELECT s, row_number() OVER (ORDER BY s) - 1 AS i
  FROM (SELECT DISTINCT c_mktsegment AS s FROM customer)),
nseg AS (SELECT count(*) AS n FROM segs),
cust AS (
  SELECT c_custkey AS ck, i AS base
  FROM customer JOIN segs ON s = c_mktsegment),
eff AS (
  SELECT (base + CASE WHEN ck %% %d = 0 THEN
            (CASE WHEN o_orderdate >= TIMESTAMP '%s'
                  THEN 1 ELSE 0 END
           + CASE WHEN o_orderdate >= TIMESTAMP '%s'
                  THEN 1 ELSE 0 END)
          ELSE 0 END) %% (SELECT n FROM nseg) AS ei,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN cust ON ck = o_custkey)
SELECT s.s AS segment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(e.cents) AS BIGINT) AS cents
FROM eff e JOIN segs s ON s.i = e.ei
GROUP BY 1 ORDER BY 1
""" % (PIT_MOD, PIT_BOUNDS[0], PIT_BOUNDS[1])


def user_interarrival_histogram(sf_dir):
    """Inter-arrival-time histogram per log₂ band — the traffic-
    model statistic (burstiness vs Poisson; the tail tells you
    session-timeout and cache-TTL budgets): for every user, the gaps
    between consecutive events in microseconds, bucketed by
    floor(log₂ gap) exactly (frexp exponent — an integer, so SQL
    replays via binary-string length, the key_skew_profile
    discipline; zero-gaps get bucket −1).

    Scale shape: (user, ts) pairs ride ONE user-bucketed exchange
    (a user's events co-locate); each bucket sorts within user
    vectorized (mergesort on the narrow pair columns only), diffs,
    and emits bounded ≤64-cell (bucket, n) partials; single merge.
    The gap multiset is tie-order-independent (equal timestamps gap
    to zero), so no tiebreak ever crosses engines."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        b = np.full(len(gaps), -1, np.int64)
        nz = gaps > 0
        b[nz] = np.frexp(gaps[nz].astype(np.float64))[1] - 1
        out = (pd.DataFrame({"log2_bucket": b})
               .groupby("log2_bucket", as_index=False).size()
               .rename(columns={"size": "n_gaps"}))
        return out.astype("int64")

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("log2_bucket", as_index=False)
               ["n_gaps"].sum()
               .sort_values("log2_bucket").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT CAST(epoch_us(ts) AS BIGINT)
         - lag(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events),
b AS (
  SELECT CASE WHEN gap = 0 THEN -1
         ELSE length(format('{:b}', gap)) - 1 END AS log2_bucket
  FROM g WHERE gap IS NOT NULL)
SELECT CAST(log2_bucket AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY 1 ORDER BY 1
"""


ZIPF_J = 11  # planted power-law family z_0..z_10


def vocab_zipf_spectrum(sf_dir):
    """Zipf frequency-spectrum audit of the corpus vocabulary — the
    corpus-linguistics health check (Zipf '49; a natural-language
    corpus shows a near-linear log-log frequency spectrum, while
    boilerplate floods single bands): the number of distinct terms
    whose total frequency falls in each log₂ band, plus the OLS
    slope of floor(log₂ n_terms) over the band index as an exact
    integer milli-value (the events_value_trend five-statistic
    identity; toward-zero division pinned in both engines). All
    integers — log₂ via frexp / binary-string length, never a float
    log.

    Scale shape: per-batch term→count partials (lossless combiner)
    ride ONE term-hash-bucketed exchange; a term's total finalizes
    in exactly one bucket, so per-bucket (band, n_terms) cells are
    additive; the ≤64-row band histogram merges in one block where
    the slope is plain integer arithmetic.

    The synthetic corpus has a ~31-term vocabulary (degenerate
    2-band spectrum), so a power-law token family is planted (the
    dup_passages precedent): each doc carries z_j = "z{j}_{doc_id
    mod 2^j}" for j in 0..10 — ~2^j distinct terms at frequency
    ≈N/2^j, a true s≈1 Zipf law both engines replay by
    arithmetic."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W = _exchange_buckets(sf_dir)

    def term_partial(t: pa.Table) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            c.update((txt or "").split(" "))
            c.update("z%d_%d" % (j, did % (1 << j))
                     for j in range(ZIPF_J))
        df = pd.DataFrame({"term": list(c.keys()),
                           "n": np.fromiter(c.values(), np.int64,
                                            len(c))})
        h = pd.util.hash_pandas_object(df["term"], index=False).values
        df["_bucket"] = (h % np.uint64(W)).astype("int32")
        return df

    def bucket_bands(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("term")["n"].sum().to_numpy(np.int64)
        band = np.frexp(tot.astype(np.float64))[1] - 1
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n_terms"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(term_partial, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_bands, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("band", as_index=False)["n_terms"].sum()
             .sort_values("band").reset_index(drop=True))
        x = g["band"].to_numpy(np.int64)
        y = (np.frexp(g["n_terms"].to_numpy(np.float64))[1] - 1)
        n = len(x)
        num = int(n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
        den = int(n * int((x * x).sum()) - int(x.sum()) ** 2)
        s = 1000 * num
        milli = (abs(s) // abs(den)) * (1 if (s >= 0) == (den > 0)
                                        else -1) if den else 0
        out = g.astype("int64")
        out["slope_milli"] = np.int64(milli)
        return out

    return _merge_partials(per_bucket, merge)


VOCAB_ZIPF_SQL = """
WITH aug AS (
  SELECT text || ' z0_' || CAST(doc_id % 1 AS VARCHAR) || ' z1_' || CAST(doc_id % 2 AS VARCHAR) || ' z2_' || CAST(doc_id % 4 AS VARCHAR) || ' z3_' || CAST(doc_id % 8 AS VARCHAR) || ' z4_' || CAST(doc_id % 16 AS VARCHAR) || ' z5_' || CAST(doc_id % 32 AS VARCHAR) || ' z6_' || CAST(doc_id % 64 AS VARCHAR) || ' z7_' || CAST(doc_id % 128 AS VARCHAR) || ' z8_' || CAST(doc_id % 256 AS VARCHAR) || ' z9_' || CAST(doc_id % 512 AS VARCHAR) || ' z10_' || CAST(doc_id % 1024 AS VARCHAR) AS text FROM documents),
tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM aug),
tc AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
bands AS (
  SELECT length(format('{:b}', n)) - 1 AS band,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM tc GROUP BY 1),
pts AS (
  SELECT CAST(band AS BIGINT) AS x,
         CAST(length(format('{:b}', n_terms)) - 1 AS BIGINT) AS y
  FROM bands),
ols AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts),
s AS (
  SELECT 1000 * (n * sxy - sx * sy) AS num,
         n * sxx - sx * sx AS den
  FROM ols)
SELECT b.band, b.n_terms,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE num // den END AS BIGINT) AS slope_milli
FROM bands b, s ORDER BY b.band
"""


MOM_GROUPS = 32  # median-of-means partition count


def orders_median_of_means(sf_dir):
    """Median-of-means estimator audit — the heavy-tail-robust mean
    every streaming system reaches for when a plain average can be
    wrecked by outliers (Alon-Matias-Szegedy '96 uses exactly this
    shape; Lugosi-Mendelson '19 surveys the theory): rows are
    deterministically md5-assigned to 32 groups, each group's exact
    integer milli-mean is computed, and the estimator is the median
    of those 32 means — reported NEXT TO the true milli-mean so the
    estimator's deviation is data, like orderkey_join_sample_estimate.

    Scale shape: the (group → sum, n) table is a bounded 32-cell
    per-batch combiner — zero shuffle at any scale; the merge block
    finalizes 32 exact means (toward-zero irrelevant: all positive),
    sorts 32 values, and takes the lower median (rank (g+1)//2, the
    radix-selection rule). SQL replays the assignment, the means and
    the rank."""
    import hashlib

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        grp = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                 16) % MOM_GROUPS for x in k), np.int64, len(k))
        out = (pd.DataFrame({"g": grp, "n": 1, "cents": cents})
               .groupby("g", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("g", as_index=False)
             .agg(n=("n", "sum"), cents=("cents", "sum")))
        means = np.sort((1000 * g["cents"].to_numpy(np.int64))
                        // g["n"].to_numpy(np.int64))
        mom = int(means[(len(means) + 1) // 2 - 1])
        true = (1000 * int(g["cents"].sum())) // int(g["n"].sum())
        return pd.DataFrame({
            "n_groups": pd.Series([len(means)], dtype="int64"),
            "mom_millicents": pd.Series([mom], dtype="int64"),
            "true_millicents": pd.Series([int(true)], dtype="int64"),
            "abs_diff": pd.Series([abs(mom - int(true))],
                                  dtype="int64")})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


MOM_SQL = """
WITH r AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
              AS BIGINT) %% %d AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
gm AS (
  SELECT g, CAST(1000 * sum(cents) // count(*) AS BIGINT) AS mean_m
  FROM r GROUP BY 1),
mom AS (
  SELECT mean_m FROM
    (SELECT mean_m, row_number() OVER (ORDER BY mean_m) AS rn
     FROM gm),
    (SELECT count(*) AS c FROM gm)
  WHERE rn = (c + 1) // 2),
tr AS (
  SELECT CAST(1000 * sum(cents) // count(*) AS BIGINT) AS true_m
  FROM r)
SELECT CAST((SELECT count(*) FROM gm) AS BIGINT) AS n_groups,
       CAST((SELECT mean_m FROM mom) AS BIGINT) AS mom_millicents,
       CAST((SELECT true_m FROM tr) AS BIGINT) AS true_millicents,
       CAST(abs((SELECT mean_m FROM mom) - (SELECT true_m FROM tr))
            AS BIGINT) AS abs_diff
""" % MOM_GROUPS


AGING_BANDS = (30, 90, 365)  # days: 0-30 / 31-90 / 91-365 / 365+


def orders_backlog_aging(sf_dir):
    """Open-order backlog aging report — the accounts-receivable /
    fulfillment-SLA staple: orders still OPEN (status 'O') bucketed
    by age at the ledger close, where the close date is the maximum
    order date in the data (derived, so every scale is
    non-degenerate and both engines pin the same instant). Bands
    0–30 / 31–90 / 91–365 / 365+ days; per band the open-order count
    and exposure cents.

    Scale shape: pass 1 is a zero-shuffle max-date combiner (one
    scalar); pass 2 buckets map-side against the broadcast close
    date and emits bounded 4-cell (band, n, cents) partials — zero
    shuffle, single merge."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderdate", "o_totalprice"])

    def max_day(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mx": pd.Series([int(days.max())],
                                             dtype="int64")})

    close = int(ds.map_batches(max_day, batch_format="pyarrow")
                .to_pandas()["mx"].max())
    edges = np.array(AGING_BANDS, dtype=np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        m = st == "O"
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))[m]
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()[m]
        age = close - days
        band = np.searchsorted(edges, age, side="left")
        out = (pd.DataFrame({"band": band, "n": 1, "cents": cents})
               .groupby("band", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("band", as_index=False)
               .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


AGING_SQL = """
WITH close AS (
  SELECT max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
    AS c FROM orders),
o AS (
  SELECT (SELECT c FROM close)
         - CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
           AS age,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O')
SELECT CAST(CASE WHEN age <= 30 THEN 0 WHEN age <= 90 THEN 1
            WHEN age <= 365 THEN 2 ELSE 3 END AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
FROM o GROUP BY 1 ORDER BY 1
"""


def customer_rfm_segments(sf_dir):
    """RFM segmentation (Hughes '94 — the marketing-analytics
    staple): every customer scored 1–5 on Recency (days since last
    order at the ledger close = the data's max order date),
    Frequency (order count) and Monetary (lifetime cents) by EXACT
    quintile rank, then the 5×5×5 segment census. Quintile edges are
    TRUE order statistics (rank ceil(q·N/5)); a value's score is
    1 + the number of edges strictly below it (the decile-report
    tie rule — rows equal to an edge belong to that edge's
    quintile), so heavy ties (shared last-order days) resolve
    identically in both engines.

    Scale shape: order partials (custkey → n, cents, last_day — a
    lossless combiner) ride ONE custkey-bucketed exchange; the
    per-customer (r, f, m) table materializes ONCE (narrow: 4
    int64/customer — the checkpointed-vocabulary precedent; ~32 GB
    at 10⁹ customers, spread across the cluster store). R and F have
    bounded domains (days, order counts) so their edge histograms
    are zero-shuffle full-value combiners; M uses the two-pass radix
    selection. Scoring is map-side against broadcast edge arrays
    into a bounded ≤125-cell combiner."""
    buckets = _exchange_buckets(sf_dir, "orders")
    COLS = ["ck", "n", "cents", "last_day", "_bucket"]

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"ck": t["o_custkey"].to_numpy(),
                           "n": 1, "cents": cents, "last_day": days})
             .groupby("ck", as_index=False)
             .agg(n=("n", "sum"), cents=("cents", "sum"),
                  last_day=("last_day", "max")))
        h = pd.util.hash_pandas_object(p["ck"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype("int64")[COLS].astype({"_bucket": "int32"})

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby("ck", as_index=False)
             .agg(f=("n", "sum"), m=("cents", "sum"),
                  last_day=("last_day", "max")))
        return a.astype("int64")

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_customer, batch_format="pandas")
            .materialize())
    close = int(cust.map_batches(
        lambda df: pd.DataFrame(
            {"mx": pd.Series([int(df["last_day"].max())],
                             dtype="int64")}),
        batch_format="pandas").to_pandas()["mx"].max())
    n_cust = cust.count()
    ranks = [(q * n_cust + 4) // 5 for q in (1, 2, 3, 4)]

    def exact_edges(hist: pd.DataFrame) -> np.ndarray:
        """hist: (v, n) full-value histogram → 4 quintile edges."""
        hist = hist.sort_values("v").reset_index(drop=True)
        cum = hist["n"].cumsum().to_numpy()
        return np.asarray(
            [int(hist["v"].iloc[int(np.searchsorted(cum, k))])
             for k in ranks], dtype=np.int64)

    def hist_of(expr) -> pd.DataFrame:
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = (pd.DataFrame({"v": expr(df)})
                   .groupby("v", as_index=False).size()
                   .rename(columns={"size": "n"}))
            return out.astype("int64")
        return (cust.map_batches(fn, batch_format="pandas")
                .to_pandas().groupby("v", as_index=False)["n"].sum())

    r_edges = exact_edges(hist_of(
        lambda df: close - df["last_day"].to_numpy(np.int64)))
    f_edges = exact_edges(hist_of(
        lambda df: df["f"].to_numpy(np.int64)))
    # M: two-pass radix (cents totals are unbounded)
    m_hi = hist_of(lambda df: df["m"].to_numpy(np.int64)
                   >> RADIX_SHIFT).sort_values("v")
    cum = m_hi["n"].cumsum().to_numpy()
    m_targets = []
    for k in ranks:
        i = int(np.searchsorted(cum, k))
        m_targets.append((int(m_hi["v"].iloc[i]),
                          k - (int(cum[i - 1]) if i else 0)))
    m_wanted = frozenset(hi for hi, _ in m_targets)

    def m_lo(df: pd.DataFrame) -> pd.DataFrame:
        v = df["m"].to_numpy(np.int64)
        v = v[np.isin(v >> RADIX_SHIFT, list(m_wanted))]
        out = (pd.DataFrame({"v": v})
               .groupby("v", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    h2 = (cust.map_batches(m_lo, batch_format="pandas")
          .to_pandas().groupby("v", as_index=False)["n"].sum()
          .sort_values("v").reset_index(drop=True))
    vals, counts = h2["v"].to_numpy(), h2["n"].to_numpy()
    m_edges = []
    for hi, resid in m_targets:
        msk = (vals >> RADIX_SHIFT) == hi
        c = counts[msk].cumsum()
        m_edges.append(int(vals[msk][int(np.searchsorted(c, resid))]))
    m_edges = np.asarray(m_edges, dtype=np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        r = close - df["last_day"].to_numpy(np.int64)
        f = df["f"].to_numpy(np.int64)
        m = df["m"].to_numpy(np.int64)
        out = pd.DataFrame({
            "r_score": 1 + np.searchsorted(r_edges, r, side="left"),
            "f_score": 1 + np.searchsorted(f_edges, f, side="left"),
            "m_score": 1 + np.searchsorted(m_edges, m, side="left"),
            "n": 1})
        return (out.groupby(["r_score", "f_score", "m_score"],
                            as_index=False)["n"].sum()
                .astype("int64"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["r_score", "f_score", "m_score"],
                          as_index=False)["n"].sum()
               .rename(columns={"n": "n_customers"})
               .sort_values(["r_score", "f_score", "m_score"])
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(
        cust.map_batches(score, batch_format="pandas"), merge)


RFM_SQL = """
WITH close AS (
  SELECT max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
    AS c FROM orders),
cust AS (
  SELECT o_custkey AS ck,
         (SELECT c FROM close)
         - max(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
           AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1),
n AS (SELECT count(*) AS n FROM cust),
re AS (SELECT r AS v, row_number() OVER (ORDER BY r) AS rn FROM cust),
fe AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM cust),
me AS (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn FROM cust),
qr AS (SELECT unnest([1, 2, 3, 4]) AS q),
redge AS (SELECT v FROM re, n, qr WHERE rn = (q * n + 4) // 5),
fedge AS (SELECT v FROM fe, n, qr WHERE rn = (q * n + 4) // 5),
medge AS (SELECT v FROM me, n, qr WHERE rn = (q * n + 4) // 5),
scored AS (
  SELECT 1 + (SELECT count(*) FROM redge WHERE redge.v < cust.r)
           AS r_score,
         1 + (SELECT count(*) FROM fedge WHERE fedge.v < cust.f)
           AS f_score,
         1 + (SELECT count(*) FROM medge WHERE medge.v < cust.m)
           AS m_score
  FROM cust)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def customer_pareto_concentration(sf_dir):
    """Pareto 80/20 revenue-concentration audit — the SMALLEST number
    of top customers whose lifetime revenue covers 80% of the total,
    found WITHOUT ranking 10⁹ customers: a descending two-pass radix
    walk (the selection machinery run top-down on mass instead of
    bottom-up on count). Ties are value ties — within a tier of
    equal lifetime revenue the crossing count is order-independent,
    so SQL's row_number cumsum replays it exactly.

    Scale shape: per-batch (custkey → cents) partials ride ONE
    custkey-bucketed exchange; pass 2 histograms per-customer totals
    into bounded high-bit bands (count + mass per band — a lossless
    combiner), the driver walks bands top-down to the crossing band,
    pass 3 histograms full values inside only that band; the final
    tier arithmetic (j = ceil((target − mass_above)/v)) is exact
    integers."""
    buckets = _exchange_buckets(sf_dir, "orders")

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"ck": t["o_custkey"].to_numpy(),
                           "m": cents})
             .groupby("ck", as_index=False)["m"].sum())
        h = pd.util.hash_pandas_object(p["ck"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"ck": "int64", "m": "int64"})

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("ck", as_index=False)["m"].sum()
                .astype("int64"))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_customer, batch_format="pandas")
            .materialize())

    def band_hist(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy(np.int64)
        out = (pd.DataFrame({"band": m >> RADIX_SHIFT, "n": 1,
                             "mass": m})
               .groupby("band", as_index=False)
               .agg(n=("n", "sum"), mass=("mass", "sum")))
        return out.astype("int64")

    h1 = (cust.map_batches(band_hist, batch_format="pandas")
          .to_pandas()
          .groupby("band", as_index=False)
          .agg(n=("n", "sum"), mass=("mass", "sum"))
          .sort_values("band", ascending=False)
          .reset_index(drop=True))
    total = int(h1["mass"].sum())
    n_cust = int(h1["n"].sum())
    target = (4 * total + 4) // 5  # ceil(0.8·T)
    cum = h1["mass"].cumsum().to_numpy()
    i = int(np.searchsorted(cum, target))
    mass_above = int(cum[i - 1]) if i else 0
    count_above = int(h1["n"].iloc[:i].sum())
    band_sel = int(h1["band"].iloc[i])

    def val_hist(df: pd.DataFrame) -> pd.DataFrame:
        m = df["m"].to_numpy(np.int64)
        m = m[(m >> RADIX_SHIFT) == band_sel]
        out = (pd.DataFrame({"v": m, "n": 1})
               .groupby("v", as_index=False)["n"].sum())
        return out.astype("int64")

    h2 = (cust.map_batches(val_hist, batch_format="pandas")
          .to_pandas().groupby("v", as_index=False)["n"].sum()
          .sort_values("v", ascending=False).reset_index(drop=True))
    k, covered = count_above, mass_above
    for v, n in zip(h2["v"].to_numpy(np.int64),
                    h2["n"].to_numpy(np.int64)):
        tier = int(v) * int(n)
        if covered + tier >= target:
            j = (target - covered + int(v) - 1) // int(v)
            k += int(j)
            covered += int(j) * int(v)
            break
        covered += tier
        k += int(n)
    return pd.DataFrame({
        "n_customers": pd.Series([n_cust], dtype="int64"),
        "top_k": pd.Series([k], dtype="int64"),
        "covered_cents": pd.Series([covered], dtype="int64"),
        "covered_permille": pd.Series([1000 * covered // total],
                                      dtype="int64")})


PARETO_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(m) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n FROM cust),
r AS (
  SELECT m, row_number() OVER (ORDER BY m DESC) AS rn,
         sum(m) OVER (ORDER BY m DESC ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM cust),
x AS (
  SELECT min(rn) AS k FROM r, t
  WHERE cum >= (4 * total + 4) // 5)
SELECT (SELECT n FROM t) AS n_customers,
       CAST((SELECT k FROM x) AS BIGINT) AS top_k,
       CAST((SELECT cum FROM r WHERE rn = (SELECT k FROM x))
            AS BIGINT) AS covered_cents,
       CAST(1000 * (SELECT cum FROM r WHERE rn = (SELECT k FROM x))
            // (SELECT total FROM t) AS BIGINT) AS covered_permille
"""


def events_session_lifetable(sf_dir):
    """Survival-analysis life table of session durations — the
    Kaplan-Meier INPUT (t, n_at_risk, n_ending): for every observed
    duration (whole minutes), how many sessions last at least that
    long and how many end exactly there. Retention teams read the
    hazard d/n off this table; keeping it integer (counts, not the
    KM product) is what lets both engines agree exactly.

    Scale shape: sessions form in the events_sessions user-bucketed
    exchange (same 30-min-gap, (ts, event_id) ordering convention);
    each bucket emits its duration histogram (bounded: distinct
    whole-minute durations) as additive partials, and the single
    merge derives n_at_risk as the descending suffix cumsum — no
    second pass, no sort exchange."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    GAP = pd.Timedelta(minutes=30)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (df["user_id"] % 64).astype("int32")
        return df

    def dur_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        d = g.groupby("user_id")["ts"].diff()
        sid = (d.isna() | (d > GAP)).cumsum()
        s = g.groupby(sid)["ts"].agg(["min", "max"])
        # normalize to µs explicitly — Ray pandas blocks carry
        # datetime64[us], a ns assumption silently floors to 0
        lo = s["min"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hi = s["max"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dur = (hi - lo) // 60_000_000
        out = (pd.DataFrame({"dur_min": dur})
               .groupby("dur_min", as_index=False).size()
               .rename(columns={"size": "n_ending"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(add_bucket, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(dur_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("dur_min", as_index=False)["n_ending"].sum()
             .sort_values("dur_min", ascending=False)
             .reset_index(drop=True))
        g["n_at_risk"] = g["n_ending"].cumsum()
        g = g.sort_values("dur_min").reset_index(drop=True)
        return g[["dur_min", "n_at_risk", "n_ending"]].astype("int64")

    return _merge_partials(per_bucket, merge)


LIFETABLE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING)
           AS session_no
  FROM o),
d AS (
  SELECT (CAST(epoch_us(max(ts)) AS BIGINT)
          - CAST(epoch_us(min(ts)) AS BIGINT)) // 60000000
           AS dur_min
  FROM s GROUP BY user_id, session_no),
h AS (SELECT dur_min, CAST(count(*) AS BIGINT) AS n_ending
      FROM d GROUP BY 1)
SELECT dur_min,
       CAST(sum(n_ending) OVER (ORDER BY dur_min DESC
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk,
       n_ending
FROM h ORDER BY dur_min
"""


CHURN_WINDOW_HOURS = 12  # events span 30 days @ ~10 h/user gap —
# a day-scale window labels nobody churned; 12 h gives 5/15 (sf0.001)
# and 40/150 (sf0.01) churned, a usable class balance at every scale


def user_churn_labels(sf_dir):
    """Leakage-safe churn-label generation — the supervised-training
    primitive every behavioral model needs (and the temporal twin of
    orders_pit_dimension_join's rule): pin a cutoff at max(ts) − W,
    build FEATURES strictly from events before the cutoff and
    the LABEL strictly from the W window after it; a user is
    churned iff active before and silent after. Output = the label
    census per activity band (feature = floor(log₂ events-before),
    the frexp/binary-length discipline) — the class-balance table a
    trainer reads before sampling.

    Scale shape: pass 1 is the zero-shuffle max-ts combiner; pass 2
    emits per-batch (user → n_before, n_after) count partials
    (lossless combiner) through ONE user-bucketed exchange, where
    each bucket finalizes labels vectorized and emits bounded
    (band, churned, n_users) cells; single merge."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def max_ts(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        return pd.DataFrame({"mx": pd.Series([int(ts.max())],
                                             dtype="int64")})

    cutoff = (int(ds.map_batches(max_ts, batch_format="pyarrow")
                  .to_pandas()["mx"].max())
              - CHURN_WINDOW_HOURS * 3_600_000_000)

    def prep(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        before = ts < cutoff
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "nb": before.astype(np.int64),
                           "na": (~before).astype(np.int64)})
             .groupby("u", as_index=False)
             .agg(nb=("nb", "sum"), na=("na", "sum")))
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "nb": "int64", "na": "int64"})

    def bucket_labels(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby("u", as_index=False)
             .agg(nb=("nb", "sum"), na=("na", "sum")))
        a = a[a["nb"] > 0]  # users born inside the label window
        nb = a["nb"].to_numpy(np.int64)  # have no feature history
        band = np.frexp(nb.astype(np.float64))[1] - 1
        churned = (a["na"].to_numpy(np.int64) == 0).astype(np.int64)
        out = (pd.DataFrame({"band": band, "churned": churned,
                             "n": 1})
               .groupby(["band", "churned"], as_index=False)
               ["n"].sum())
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_labels, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["band", "churned"], as_index=False)
               ["n"].sum().rename(columns={"n": "n_users"})
               .sort_values(["band", "churned"])
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


CHURN_SQL = """
WITH cut AS (
  SELECT max(CAST(epoch_us(ts) AS BIGINT)) - %d AS c FROM events),
u AS (
  SELECT user_id,
         sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                  < (SELECT c FROM cut) THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                  >= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS na
  FROM events GROUP BY 1),
l AS (
  SELECT length(bin(CAST(nb AS BIGINT))) - 1 AS band,
         CASE WHEN na = 0 THEN 1 ELSE 0 END AS churned
  FROM u WHERE nb > 0)
SELECT CAST(band AS BIGINT) AS band,
       CAST(churned AS BIGINT) AS churned,
       CAST(count(*) AS BIGINT) AS n_users
FROM l GROUP BY 1, 2 ORDER BY 1, 2
""" % (CHURN_WINDOW_HOURS * 3_600_000_000)


def funnel_latency_median(sf_dir):
    """Funnel step latency — the EXACT median seconds from a click
    to the SAME user's next purchase (the as-of pairing of
    events_asof_click_view, then the radix selection instead of a
    percentile sort): product analytics' time-to-convert number.
    Pairs = every click matched to the first purchase at or after it
    (unmatched clicks drop out); latency floor-seconds; median by
    rank (N+1)//2 — the engine-shared selection rule throughout.

    Scale shape: (user, ts, kind) rows ride ONE user-bucketed
    exchange; each bucket pairs vectorized (searchsorted of click
    times into the user-offset purchase timeline — no per-user loop)
    and emits its bounded latency histogram in SECONDS bands
    directly (latencies ≤ the data span, so the full-value histogram
    is the bounded combiner; no second radix pass needed); the merge
    walks the histogram to the exact median and reports n_pairs."""
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        kind = np.asarray(t["event_type"].to_pylist(), dtype=object)
        m = (kind == "click") | (kind == "purchase")
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy()[m],
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))[m],
            "is_click": (kind[m] == "click").astype(np.int64)})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64",
                         "is_click": "int64"})

    # ONE reversed minimum.accumulate pairs every user at once with
    # no compound-key arithmetic (a u*2^52+ts axis overflows int64
    # once user_id ≥ 2^11): sort by (u, ts, purchase-last) so user
    # segments are contiguous, take each position's nearest purchase
    # position at-or-after it GLOBALLY — contiguity guarantees that
    # position is the same user's iff the user has a later purchase,
    # so one same-user mask finishes the as-of join exactly.
    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        isp = 1 - g["is_click"].to_numpy(np.int64)
        order = np.lexsort((isp, ts, u))  # same-ts click before buy
        u, ts, isp = u[order], ts[order], isp[order]
        n = len(u)
        pos = np.where(isp == 1, np.arange(n), n)
        nxt = np.minimum.accumulate(pos[::-1])[::-1]
        ick = isp == 0
        j = nxt[ick]
        ok = j < n
        same = u[j[ok]] == u[ick][ok]
        sec = (ts[j[ok]][same] - ts[ick][ok][same]) // 1_000_000
        out = (pd.DataFrame({"sec": sec})
               .groupby("sec", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])
    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_hist, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("sec", as_index=False)["n"].sum()
             .sort_values("sec").reset_index(drop=True))
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        med = int(g["sec"].iloc[int(np.searchsorted(
            cum, (n + 1) // 2))])
        return pd.DataFrame({
            "n_pairs": pd.Series([n], dtype="int64"),
            "median_latency_sec": pd.Series([med], dtype="int64")})

    return _merge_partials(per_bucket, merge)


FUNNEL_LATENCY_SQL = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
  FROM events WHERE event_type IN ('click', 'purchase')),
pairs AS (
  SELECT c.t AS ct,
         (SELECT min(p.t) FROM e p
          WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            AND p.t >= c.t) AS pt
  FROM e c WHERE c.event_type = 'click'),
lat AS (
  SELECT (pt - ct) // 1000000 AS sec FROM pairs WHERE pt IS NOT NULL),
n AS (SELECT count(*) AS n FROM lat)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_pairs,
       CAST((SELECT sec FROM
              (SELECT sec, row_number() OVER (ORDER BY sec) AS rn
               FROM lat), n
             WHERE rn = (n + 1) // 2) AS BIGINT)
         AS median_latency_sec
"""


def orders_price_drift(sf_dir):
    """Two-sample distribution-drift detector — the check a training
    pipeline runs before trusting a new data window: split orders at
    the midpoint date and compare the price distributions of the two
    halves by Kolmogorov–Smirnov distance AND total-variation
    distance, both EXACT via cross-multiplication (|cum₁·n₂ −
    cum₂·n₁| never divides, so engines can't drift on floats; the
    final permille division happens in Python ints because 1000·D
    exceeds int64 once n₁·n₂ > 9·10¹⁵). KS runs on raw cents (CDFs
    are binning-free); TV needs overlapping supports — on all-
    distinct raw prices point-mass TV is trivially 1000‰ — so it
    bins at $10k (50 cells over the price domain; measured 141‰ →
    38‰ from sf0.001 → sf0.01, the √n noise shrink a real statistic
    shows).

    Scale shape: one zero-shuffle min/max-day pre-pass pins the
    midpoint; per-batch (cents, half) count partials form a bounded
    combiner (distinct cents ≤ the price domain, ~10⁷ cells at any
    input size); the single merge block sorts once and walks the two
    cumsums. Cross-products cum·n fit int64 up to ~7.5·10⁸ rows per
    half (√(int64max) split) — beyond that carry the comparison in
    Python ints inside the merge too."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max()) + 1) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        lo = (d < mid).astype(np.int64)
        out = (pd.DataFrame({"v": cents, "c_lo": lo, "c_hi": 1 - lo})
               .groupby("v", as_index=False)
               .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("v", as_index=False)
             .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum"))
             .sort_values("v").reset_index(drop=True))
        c1 = g["c_lo"].to_numpy(np.int64)
        c2 = g["c_hi"].to_numpy(np.int64)
        n1, n2 = int(c1.sum()), int(c2.sum())
        cross = c1.cumsum() * n2 - c2.cumsum() * n1
        d_num = int(np.abs(cross).max())
        binned = (g.assign(b=g["v"] // 1_000_000)
                  .groupby("b", as_index=False)
                  .agg(c_lo=("c_lo", "sum"), c_hi=("c_hi", "sum")))
        tv_num = int(np.abs(
            binned["c_lo"].to_numpy(np.int64) * n2
            - binned["c_hi"].to_numpy(np.int64) * n1).sum())
        return pd.DataFrame({
            "n_lo": pd.Series([n1], dtype="int64"),
            "n_hi": pd.Series([n2], dtype="int64"),
            "ks_permille": pd.Series([1000 * d_num // (n1 * n2)],
                                     dtype="int64"),
            "tv_permille": pd.Series(
                [1000 * tv_num // (2 * n1 * n2)], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


DRIFT_SQL = """
WITH b AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders),
m AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM b),
h AS (
  SELECT v,
         sum(CASE WHEN d < (SELECT mid FROM m) THEN 1 ELSE 0 END)
           AS c1,
         sum(CASE WHEN d >= (SELECT mid FROM m) THEN 1 ELSE 0 END)
           AS c2
  FROM b GROUP BY 1),
n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h),
c AS (
  SELECT sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
         sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
  FROM h),
tb AS (
  SELECT v // 1000000 AS b, sum(c1) AS c1, sum(c2) AS c2
  FROM h GROUP BY 1),
ks AS (SELECT max(abs(cum1 * n2 - cum2 * n1)) AS d_num
       FROM c, n GROUP BY n1, n2),
tv AS (SELECT sum(abs(c1 * n2 - c2 * n1)) AS tv_num
       FROM tb, n GROUP BY n1, n2)
SELECT CAST(n1 AS BIGINT) AS n_lo, CAST(n2 AS BIGINT) AS n_hi,
       CAST(1000 * (SELECT d_num FROM ks) // (n1 * n2)
            AS BIGINT) AS ks_permille,
       CAST(1000 * (SELECT tv_num FROM tv) // (2 * n1 * n2)
            AS BIGINT) AS tv_permille
FROM n
"""


NEYMAN_BUDGET = 50


def part_neyman_allocation(sf_dir):
    """Neyman optimal sample allocation (Neyman '34 — the survey-
    sampling design primitive): split a budget of 50 samples across
    the 25 brand strata proportional to N_h·σ_h, minimizing the
    stratified-mean variance. The identity N_h·σ_h =
    √(N_h·Σv² − (Σv)²) keeps the weight computable from the three
    integer moments a combiner carries; IEEE-754 sqrt is correctly
    rounded, so floor(sqrt(D)) agrees across engines whenever D <
    2⁵³. Integer seats come from largest-remainder (Hamilton)
    apportionment — floor quotas, then +1 to the largest remainders,
    ties broken by brand — so the allocation is exact arithmetic,
    not a float rounding convention.

    Scale shape: per-batch (brand → n, Σv, Σv²) moment partials are
    a bounded 25-cell zero-shuffle combiner; the apportionment walks
    the 25-row merge block. Σv² fits int64 to ~2·10⁸ rows/stratum at
    max-price 2·10⁵ cents — past that the combiner must carry a
    two-limb (hi, lo) sum (documented, not built)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["p_retailprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"brand": t["p_brand"].to_pylist(),
                             "n": 1, "sv": cents,
                             "sq": cents * cents})
               .groupby("brand", as_index=False)
               .agg(n=("n", "sum"), sv=("sv", "sum"),
                    sq=("sq", "sum")))
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("brand", as_index=False)
             .agg(n=("n", "sum"), sv=("sv", "sum"), sq=("sq", "sum"))
             .sort_values("brand").reset_index(drop=True))
        disc = (g["n"].to_numpy(np.int64) * g["sq"].to_numpy(np.int64)
                - g["sv"].to_numpy(np.int64) ** 2)
        w = np.floor(np.sqrt(disc.astype(np.float64))).astype(np.int64)
        W = int(w.sum())
        base = NEYMAN_BUDGET * w // W
        rem = NEYMAN_BUDGET * w % W
        leftover = NEYMAN_BUDGET - int(base.sum())
        # +1 to the `leftover` largest remainders, brand-asc ties
        order = np.lexsort((np.arange(len(g)), -rem))
        extra = np.zeros(len(g), dtype=np.int64)
        extra[order[:leftover]] = 1
        return pd.DataFrame({
            "brand": g["brand"],
            "n_parts": g["n"].astype("int64"),
            "neyman_weight": w,
            "alloc": base + extra})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


NEYMAN_SQL = """
WITH s AS (
  SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sv,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(round(p_retailprice * 100) AS BIGINT)) AS sq
  FROM part GROUP BY 1),
w AS (
  SELECT brand, n,
         CAST(floor(sqrt(CAST(n * sq - sv * sv AS DOUBLE)))
              AS BIGINT) AS w
  FROM s),
t AS (SELECT sum(w) AS tw FROM w),
a AS (
  SELECT brand, n, w,
         CAST((%d * w) // tw AS BIGINT) AS base,
         CAST((%d * w) %% tw AS BIGINT) AS rem
  FROM w, t),
l AS (SELECT %d - sum(base) AS leftover FROM a),
r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, brand) AS rk
  FROM a)
SELECT brand, n AS n_parts, w AS neyman_weight,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY brand
""" % (NEYMAN_BUDGET, NEYMAN_BUDGET, NEYMAN_BUDGET)


def vocab_heaps_curve(sf_dir):
    """Heaps'-law vocabulary-growth curve (Heaps '78 — the corpus-
    scaling companion to vocab_zipf_spectrum's frequency spectrum):
    distinct-vocabulary size after the first k documents, for k on a
    power-of-two ladder plus N. The sequential-looking "distinct so
    far" is really first-occurrence arithmetic — a term counts
    toward vocab(k) iff min(doc_id) < k — so the curve distributes
    as a min-combiner, not a scan. Uses the zipf query's augmented
    token stream (doc tokens + the planted z_j power-law family) so
    the curve is non-degenerate: z_j contributes min(2^j, k) terms
    at prefix k, a true sublinear growth both engines replay.

    Scale shape: per-batch term→min(doc_id) partials (idempotent
    min combiner) ride ONE term-hash-bucketed exchange; each bucket
    compares its finalized first-occurrences against the ≤64-rung
    broadcast ladder and emits bounded (k, n) cells; single merge."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W = _exchange_buckets(sf_dir)

    def mx(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"mx": pd.Series(
            [int(t["doc_id"].to_numpy().max())], dtype="int64")})

    n_docs = int(ds.map_batches(mx, batch_format="pyarrow")
                 .to_pandas()["mx"].max()) + 1
    ladder = sorted({1 << i for i in range(64) if (1 << i) < n_docs}
                    | {n_docs})

    def term_first(t: pa.Table) -> pd.DataFrame:
        firsts: dict = {}
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            for tok in (txt or "").split(" "):
                if firsts.get(tok, n_docs) > did:
                    firsts[tok] = did
            for j in range(ZIPF_J):
                tok = "z%d_%d" % (j, did % (1 << j))
                if firsts.get(tok, n_docs) > did:
                    firsts[tok] = did
        df = pd.DataFrame({"term": list(firsts.keys()),
                           "fd": np.fromiter(firsts.values(),
                                             np.int64, len(firsts))})
        h = pd.util.hash_pandas_object(df["term"], index=False).values
        df["_bucket"] = (h % np.uint64(W)).astype("int32")
        return df

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("term")["fd"].min().to_numpy(np.int64)
        return pd.DataFrame({
            "prefix_docs": np.asarray(ladder, dtype=np.int64),
            "n": [int((fd < k).sum()) for k in ladder]}).astype(
                "int64")

    per_bucket = (ds.map_batches(term_first, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_counts, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("prefix_docs", as_index=False)["n"].sum()
               .rename(columns={"n": "vocab_size"})
               .sort_values("prefix_docs").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


_HEAPS_AUG = "text || " + " || ".join(
    "' z%d_' || CAST(doc_id %% %d AS VARCHAR)" % (j, 1 << j)
    for j in range(ZIPF_J))

HEAPS_SQL = """
WITH aug AS (SELECT doc_id, %s AS text FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM aug),
tf AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
nd AS (SELECT max(doc_id) + 1 AS n FROM documents),
lad AS (
  SELECT DISTINCT k FROM (
    SELECT CAST(power(2, i) AS BIGINT) AS k
    FROM (SELECT unnest(generate_series(0, 50)) AS i), nd
    WHERE power(2, i) < n
    UNION ALL SELECT n FROM nd))
SELECT CAST(k AS BIGINT) AS prefix_docs,
       CAST((SELECT count(*) FROM tf WHERE fd < lad.k) AS BIGINT)
         AS vocab_size
FROM lad ORDER BY 1
""" % _HEAPS_AUG


def user_event_gini_impurity(sf_dir):
    """Behavioral-diversity census — Gini impurity of each user's
    event-type mix, kept EXACT as the rational 1 − Σ(cᵢ/n)² reported
    in floored permille: impurity = (1000·(n² − Σcᵢ²)) // n². The
    segmentation complement to customer_rfm_segments: 0‰ = single-
    minded users, →800‰ = uniform over the 5 event types. Output is
    the n_users histogram per distinct impurity value (≤1001 cells).

    Scale shape: per-batch (user, type → n) count partials (lossless
    combiner) ride ONE user-bucketed exchange; each bucket finalizes
    Σcᵢ² per user vectorized (sort-free: groupby-sum of squares) and
    emits bounded impurity-cell partials; single merge. n² fits
    int64 to 3·10⁹ events per user."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "k": t["event_type"].to_pylist(), "n": 1})
             .groupby(["u", "k"], as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["u", "k"], as_index=False)["n"].sum()
        per_u = (a.assign(sq=a["n"] * a["n"])
                 .groupby("u", as_index=False)
                 .agg(n=("n", "sum"), sq=("sq", "sum")))
        n = per_u["n"].to_numpy(np.int64)
        sq = per_u["sq"].to_numpy(np.int64)
        imp = 1000 * (n * n - sq) // (n * n)
        out = (pd.DataFrame({"impurity_permille": imp})
               .groupby("impurity_permille", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("impurity_permille", as_index=False)
               ["n_users"].sum()
               .sort_values("impurity_permille")
               .reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


GINI_IMPURITY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id, sum(n) AS n, sum(n * n) AS sq
  FROM c GROUP BY 1),
i AS (
  SELECT CAST(1000 * (n * n - sq) // (n * n) AS BIGINT)
           AS impurity_permille
  FROM u)
SELECT impurity_permille, CAST(count(*) AS BIGINT) AS n_users
FROM i GROUP BY 1 ORDER BY 1
"""


def _auc_score_hist(sf_dir):
    """Shared bounded (score, label) histogram for the model-eval
    operators: a PLANTED noisy scorer s = 8·[returnflag='R'] +
    orderkey%20 over lineitem (the synthesizer draws returnflag
    independently of every numeric column — measured corr ≈ 0 — so a
    non-degenerate evaluation needs a planted signal, the
    vocab_zipf_spectrum / dup_passages precedent; in production the
    score column is a real model output and this stage is a pruned
    two-column read). Score domain is bounded (0..27), so the
    histogram is a ≤56-cell lossless per-batch combiner — zero
    shuffle, one merge block."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        s = 8 * y + okey % 20
        out = (pd.DataFrame({"s": s, "y": y, "n": 1})
               .groupby(["s", "y"], as_index=False)["n"].sum())
        return out.astype("int64")

    return ds.map_batches(partial, batch_format="pyarrow")


def _auc_cells(df: pd.DataFrame) -> pd.DataFrame:
    """Fold histogram partials into one ascending-score frame with
    (np_, nn, cum_nn_below, cum_np_from) columns."""
    g = (df.groupby(["s", "y"], as_index=False)["n"].sum()
         .pivot_table(index="s", columns="y", values="n",
                      fill_value=0, aggfunc="sum")
         .reindex(columns=[0, 1], fill_value=0)
         .rename(columns={0: "nn", 1: "np_"})
         .reset_index().sort_values("s").reset_index(drop=True))
    return g.astype("int64")


def lineitem_model_auc(sf_dir):
    """Exact ROC-AUC of a scorer against a binary label — the
    model-evaluation primitive, computed as the Mann-Whitney U
    statistic with MIDRANK tie handling kept integer by doubling:
    2U = Σ_s n_pos(s)·(2·n_neg(<s) + n_neg(s)), AUC = U/(n_pos·n_neg)
    reported as the floored ppm 10⁶·2U // (2·n_pos·n_neg), plus the
    Gini coefficient 2·AUC−1 in the same grid. Ties matter: the
    planted scorer has heavy overlap (score 8..19 reachable from both
    classes), so an implementation that ignores midranks is visibly
    wrong. Final arithmetic runs in Python ints (2U outgrows int64
    near 10¹⁰ rows); SQL replays in HUGEINT.

    Scale shape: bounded ≤56-cell (score, label) count partials —
    lossless combiner, zero shuffle, one merge block; the score
    column never enters an exchange."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = _auc_cells(df)
        npos = [int(v) for v in g["np_"]]
        nneg = [int(v) for v in g["nn"]]
        tp, tn = sum(npos), sum(nneg)
        u2, below = 0, 0
        for p, q in zip(npos, nneg):
            u2 += p * (2 * below + q)
            below += q
        auc = 1_000_000 * u2 // max(2 * tp * tn, 1)
        return pd.DataFrame({"auc_ppm": [auc],
                             "gini_ppm": [2 * auc - 1_000_000],
                             "n_pos": [tp], "n_neg": [tn]}
                            ).astype("int64")

    return _merge_partials(_auc_score_hist(sf_dir), merge)


MODEL_AUC_SQL = """
WITH s AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         8 * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
           + l_orderkey % 20 AS s
  FROM lineitem),
h AS (SELECT s, CAST(sum(y) AS BIGINT) AS np_,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
      FROM s GROUP BY 1),
w AS (SELECT s, np_, nn,
             coalesce(sum(nn) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS below
      FROM h),
t AS (SELECT CAST(sum(np_ * (2 * below + nn)) AS HUGEINT) AS u2,
             CAST(sum(np_) AS HUGEINT) AS tp,
             CAST(sum(nn) AS HUGEINT) AS tn
      FROM w)
SELECT CAST(1000000 * u2 // greatest(2 * tp * tn, 1) AS BIGINT)
         AS auc_ppm,
       CAST(2 * (1000000 * u2 // greatest(2 * tp * tn, 1))
            - 1000000 AS BIGINT) AS gini_ppm,
       CAST(tp AS BIGINT) AS n_pos, CAST(tn AS BIGINT) AS n_neg
FROM t
"""


def lineitem_pr_curve(sf_dir):
    """Precision-recall / F1 threshold sweep — the operating-point
    table a deployment reads to pick its classification threshold:
    for every threshold t in the bounded score domain, predict
    positive iff score ≥ t and report the exact confusion counts plus
    floored-permille precision, recall and F1 (F1 = 2000·tp //
    (2·tp + fp + fn) — the harmonic mean kept in one integer
    division). Same planted scorer as lineitem_model_auc, so the
    sweep shows the full tradeoff: t=0 is recall 1000‰, t=20 is
    precision 1000‰ (scores ≥20 are reachable only via the +8 class
    shift).

    Scale shape: the same ≤56-cell zero-shuffle histogram; the sweep
    is suffix cumsums over ≤28 thresholds in the single merge
    block."""
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = _auc_cells(df)
        tp_tot, tn_tot = int(g["np_"].sum()), int(g["nn"].sum())
        # suffix sums: predictions positive at threshold t are rows
        # with score >= t
        np_arr = g["np_"].to_numpy(np.int64)
        nn_arr = g["nn"].to_numpy(np.int64)
        tp = np_arr[::-1].cumsum()[::-1]
        fp = nn_arr[::-1].cumsum()[::-1]
        fn = tp_tot - tp
        tn = tn_tot - fp
        prec = 1000 * tp // np.maximum(tp + fp, 1)
        rec = 1000 * tp // max(tp_tot, 1)
        f1 = 2000 * tp // np.maximum(2 * tp + fp + fn, 1)
        out = pd.DataFrame({"threshold": g["s"], "tp": tp, "fp": fp,
                            "fn": fn, "tn": tn,
                            "precision_permille": prec,
                            "recall_permille": rec,
                            "f1_permille": f1})
        return out.sort_values("threshold").reset_index(drop=True) \
                  .astype("int64")

    return _merge_partials(_auc_score_hist(sf_dir), merge)


PR_CURVE_SQL = """
WITH s AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         8 * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
           + l_orderkey % 20 AS s
  FROM lineitem),
h AS (SELECT s, CAST(sum(y) AS BIGINT) AS np_,
             CAST(count(*) - sum(y) AS BIGINT) AS nn
      FROM s GROUP BY 1),
t AS (SELECT CAST(sum(np_) AS BIGINT) AS tp_tot,
             CAST(sum(nn) AS BIGINT) AS tn_tot FROM h),
w AS (SELECT s AS threshold,
             CAST(sum(np_) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(sum(nn) OVER (ORDER BY s DESC) AS BIGINT) AS fp
      FROM h)
SELECT threshold, tp, fp,
       CAST(t.tp_tot - tp AS BIGINT) AS fn,
       CAST(t.tn_tot - fp AS BIGINT) AS tn,
       CAST(1000 * tp // greatest(tp + fp, 1) AS BIGINT)
         AS precision_permille,
       CAST(1000 * tp // greatest(t.tp_tot, 1) AS BIGINT)
         AS recall_permille,
       CAST(2000 * tp // greatest(2 * tp + fp + (t.tp_tot - tp), 1)
            AS BIGINT) AS f1_permille
FROM w, t ORDER BY threshold
"""


def events_chi2_independence(sf_dir):
    """Chi-square independence audit of event type × hour-of-day —
    the feature-independence check run before treating a categorical
    pair as uncorrelated (and the contingency companion to
    orders_price_drift's two-sample tests). The statistic is kept
    cross-engine exact by DEFINING it cell-floored: each of the
    (observed-type × observed-hour) cells contributes
    floor(1000·(N·n_ij − r_i·c_j)² / (N·r_i·c_j)) — the classic
    (O−E)²/E with both sides multiplied through by N so no float
    expected-count ever exists — and the report is each type's milli
    contribution summed over its 24 hour cells (the per-feature-value
    attribution a drift dashboard plots). Zero-observed cells of the
    dense margin cross DO contribute (n=0 ⇒ 1000·r·c // N), the
    textbook requirement a sparse groupby silently violates. On this
    synthesizer types and hours are independent by construction, so
    the audit correctly reports noise-level values — the exact noise
    is the data.

    Scale shape: bounded ≤120-cell (type, hour) count partials —
    lossless per-batch combiner, zero shuffle; the single merge block
    densifies the margin cross and runs the quadratic arithmetic in
    Python ints ((N·n)² outgrows int64 past ~3·10⁹ events; SQL
    replays in HUGEINT)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        hrs = (t["ts"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // 3_600_000_000) % 24
        out = (pd.DataFrame({"t": t["event_type"].to_pylist(),
                             "h": hrs, "n": 1})
               .groupby(["t", "h"], as_index=False)["n"].sum())
        return out.astype({"h": "int64", "n": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby(["t", "h"], as_index=False)["n"].sum()
        obs = {(r.t, int(r.h)): int(r.n) for r in b.itertuples()}
        rmarg = b.groupby("t")["n"].sum().to_dict()
        cmarg = b.groupby("h")["n"].sum().to_dict()
        N = int(b["n"].sum())
        rows = []
        for t, rn in sorted(rmarg.items()):
            chi = 0
            for h, cn in cmarg.items():
                n = obs.get((t, int(h)), 0)
                dev = N * n - int(rn) * int(cn)
                chi += 1000 * dev * dev // (N * int(rn) * int(cn))
            rows.append((t, int(rn), chi))
        return pd.DataFrame(rows, columns=["event_type", "n_events",
                                           "chi2_milli"]
                            ).astype({"n_events": "int64",
                                      "chi2_milli": "int64"})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


EVENTS_CHI2_SQL = """
WITH b AS (
  SELECT event_type AS t,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT t, CAST(sum(n) AS BIGINT) AS rn FROM b GROUP BY 1),
c AS (SELECT h, CAST(sum(n) AS BIGINT) AS cn FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt FROM b),
d AS (SELECT r.t, r.rn, c.cn, coalesce(b.n, 0) AS n
      FROM r CROSS JOIN c
      LEFT JOIN b ON b.t = r.t AND b.h = c.h),
cell AS (
  SELECT t, rn,
         1000 * (tot.nt * n - CAST(rn AS HUGEINT) * cn)
              * (tot.nt * n - CAST(rn AS HUGEINT) * cn)
           // (tot.nt * rn * cn) AS chi
  FROM d, tot)
SELECT t AS event_type, rn AS n_events,
       CAST(sum(chi) AS BIGINT) AS chi2_milli
FROM cell GROUP BY 1, 2 ORDER BY 1
"""


def basket_rule_lift(sf_dir):
    """Association-rule strength mining — the step AFTER
    basket_part_pairs's support counting: the top-20 part pairs by
    exact LIFT (T·n_ab / (n_a·n_b), >1 = bought together more than
    independence predicts), reported with both directed confidences,
    everything in floored integer grids (lift_ppm = 10⁶·T·n_ab //
    (n_a·n_b); conf = 1000·n_ab // n_a) so ranking and ties replay
    bit-for-bit in SQL. Raw lift explodes on singleton pairs, so the
    rule universe is support ≥ BASKET_MINSUP — the standard A-Priori
    pruning.

    Scale shape: item supports n_a and the basket count T come off
    the okey-bucketed exchange (batch-local distinct combiner; an
    order lives in exactly one bucket, so per-bucket item counts are
    additive) and DISPATCH on size: ≤ joins.DIM_BROADCAST_THRESHOLD
    they fold driver-side and broadcast into the pair ranking; above
    it they total in a bucketed second exchange and join onto the
    pruned pairs via attach_dim (forced-path tested). Pairs ride the
    basket_part_pairs two-exchange shape — okey buckets self-join
    baskets, a second pair-hash exchange totals support, prunes
    minsup and scores lift map-side of the merge (a pair finalizes in
    exactly one bucket, so per-bucket top-k is exact); the bounded
    merge takes the global top-20 by (lift_ppm desc, p1, p2).
    10⁶·T·n_ab outgrows int64 near 10¹³ baskets — Python ints in the
    scorer, HUGEINT in SQL."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "pkey": t["l_partkey"].to_numpy()})
        df = df.drop_duplicates()
        h = pd.util.hash_pandas_object(df["okey"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    # pass 1: the small dimension — per-item basket counts + T,
    # additive over okey buckets because a basket lives in one bucket
    def bucket_items(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["okey", "pkey"]].drop_duplicates()
        out = (g.groupby("pkey", as_index=False).size()
               .rename(columns={"size": "n"}))
        out = pd.concat(
            [out, pd.DataFrame({"pkey": [-1],
                                "n": [g["okey"].nunique()]})],
            ignore_index=True)
        return out.astype("int64")

    # per-bucket partials are additive (a basket lives in one okey
    # bucket). Threshold dispatch (the verify_jaccard contract):
    # partial rows ≤ joins.DIM_BROADCAST_THRESHOLD → driver-side
    # pandas fold + broadcast counts dict (a second Ray-native
    # groupby measured 44 s of pure exchange overhead on 0.8 MB of
    # partials); above → bucketed second exchange + attach_dim joins
    # for n_a/n_b, so 10⁹ parts never materialize on the driver.
    partial_items = (li.map_batches(prep, batch_format="pyarrow")
                     .groupby("_bucket")
                     .map_groups(bucket_items, batch_format="pandas")
                     .materialize())
    driver_fold = (partial_items.count()
                   <= joins.DIM_BROADCAST_THRESHOLD)
    counts: dict = {}
    n_baskets = 0
    counts_ds = None
    if driver_fold:
        folded = partial_items.to_pandas().groupby("pkey")["n"].sum()
        counts = {int(k): int(v) for k, v in folded.items()}
        n_baskets = counts.pop(-1)
    else:
        def tag_pkey(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            h = pd.util.hash_pandas_object(df["pkey"],
                                           index=False).values
            df["_b3"] = (h % np.uint64(buckets)).astype("int32")
            return df

        def sum_items(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("pkey", as_index=False)["n"].sum()
            return out.astype("int64")

        counts_all = (partial_items
                      .map_batches(tag_pkey, batch_format="pandas")
                      .groupby("_b3")
                      .map_groups(sum_items, batch_format="pandas")
                      .materialize())
        n_baskets = int(counts_all.map_batches(
            lambda df: df[df["pkey"] == -1],
            batch_format="pandas").to_pandas()["n"].sum())
        counts_ds = counts_all.map_batches(
            lambda df: df[df["pkey"] != -1], batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["okey", "pkey"]].drop_duplicates()
        j = g.merge(g, on="okey")
        j = j[j["pkey_x"] < j["pkey_y"]]
        out = (j.groupby(["pkey_x", "pkey_y"], as_index=False).size()
               .rename(columns={"pkey_x": "p1", "pkey_y": "p2",
                                "size": "support"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        h = pd.util.hash_pandas_object(
            out["p1"] * np.int64(1_000_003) + out["p2"],
            index=False).values
        out["_b2"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        """(p1, p2, support, na, nb) → scored local top-k."""
        sup = g["support"].to_numpy(np.int64)
        na = g["na"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        if (len(sup) == 0
                or (1_000_000 * n_baskets * int(sup.max()) < 2 ** 63
                    and int(na.max()) * int(nb.max()) < 2 ** 63)):
            lift = 1_000_000 * n_baskets * sup // (na * nb)
            c12 = 1000 * sup // na
            c21 = 1000 * sup // nb
        else:  # Python-int path past ~9·10¹² basket·support products
            lift = [1_000_000 * n_baskets * int(s) // (int(a) * int(b))
                    for s, a, b in zip(sup, na, nb)]
            c12 = [1000 * int(s) // int(a) for s, a in zip(sup, na)]
            c21 = [1000 * int(s) // int(b) for s, b in zip(sup, nb)]
        out = pd.DataFrame({"p1": g["p1"].to_numpy(np.int64),
                            "p2": g["p2"].to_numpy(np.int64),
                            "support": sup, "lift_ppm": lift,
                            "conf12_permille": c12,
                            "conf21_permille": c21})
        out = (out.sort_values(["lift_ppm", "p1", "p2"],
                               ascending=[False, True, True])
               .head(BASKET_TOPK))
        return out.astype("int64")

    def bucket_totals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p1", "p2"], as_index=False)["support"].sum()
        g = g[g["support"] >= BASKET_MINSUP]
        return g.astype("int64")[["p1", "p2", "support"]]

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        g = bucket_totals(g)
        g = g.assign(na=g["p1"].map(counts).astype("int64"),
                     nb=g["p2"].map(counts).astype("int64"))
        return _score(g)

    if driver_fold:
        per_pair = (li.map_batches(prep, batch_format="pyarrow")
                    .groupby("_bucket")
                    .map_groups(bucket_pairs, batch_format="pandas")
                    .groupby("_b2")
                    .map_groups(bucket_score, batch_format="pandas"))
    else:
        # two-exchange pair subtree materializes (pruned by minsup —
        # bounded) before the attach_dim exchanges: the documented
        # three-exchange DAG-shape mitigation
        pair_totals = (li.map_batches(prep, batch_format="pyarrow")
                       .groupby("_bucket")
                       .map_groups(bucket_pairs, batch_format="pandas")
                       .groupby("_b2")
                       .map_groups(bucket_totals,
                                   batch_format="pandas")
                       .materialize())
        with_na = joins.attach_dim(pair_totals, counts_ds, "p1",
                                   "pkey", "n", out_col="na",
                                   how="inner")
        with_nb = joins.attach_dim(with_na, counts_ds, "p2",
                                   "pkey", "n", out_col="nb",
                                   how="inner")
        per_pair = with_nb.map_batches(_score, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["lift_ppm", "p1", "p2"],
                               ascending=[False, True, True])
                .head(BASKET_TOPK).reset_index(drop=True)
                .astype("int64"))

    return _merge_partials(per_pair, final)


BASKET_LIFT_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS nb
      FROM b),
i AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1),
p AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS support
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= %d)
SELECT CAST(p.p1 AS BIGINT) AS p1, CAST(p.p2 AS BIGINT) AS p2,
       p.support,
       CAST(1000000 * t.nb * p.support
            // (CAST(ia.n AS HUGEINT) * ib.n) AS BIGINT) AS lift_ppm,
       CAST(1000 * p.support // ia.n AS BIGINT) AS conf12_permille,
       CAST(1000 * p.support // ib.n AS BIGINT) AS conf21_permille
FROM p, t
JOIN i ia ON ia.l_partkey = p.p1
JOIN i ib ON ib.l_partkey = p.p2
ORDER BY lift_ppm DESC, p1, p2 LIMIT %d
""" % (BASKET_MINSUP, BASKET_TOPK)


def orders_jackknife_variance(sf_dir):
    """Delete-one-GROUP jackknife (Quenouille '56 / Tukey '58, the
    block-jackknife form every survey system uses) — the standard
    error of the mean estimated WITHOUT distributional assumptions,
    pairing orders_median_of_means's robust location with a
    stability/precision audit: rows md5-assign to the same 32
    deterministic groups, each leave-one-group-out milli-mean is
    θ_i = 1000·(S−s_i) // (N−n_i), and the jackknife variance is
    v = (g−1)·(g·Σθ² − (Σθ)²) // g² with se = isqrt(v) — all floored
    integer grids (isqrt is exact in Python; SQL floor(sqrt()) agrees
    below 2^53, the part_neyman_allocation precedent). The max
    |θ_i − θ̂| influence column is the one-bad-shard diagnostic.

    Scale shape: the (group → n, sum) table is a bounded 32-cell
    lossless per-batch combiner — zero shuffle; merge arithmetic in
    Python ints (g·Σθ² nears int64 at milli-means ~10⁸), HUGEINT in
    SQL."""
    import hashlib
    import math

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        grp = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15],
                 16) % MOM_GROUPS for x in k), np.int64, len(k))
        out = (pd.DataFrame({"g": grp, "n": 1, "cents": cents})
               .groupby("g", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        gt = (df.groupby("g", as_index=False)
              .agg(n=("n", "sum"), cents=("cents", "sum")))
        ns = [int(v) for v in gt["n"]]
        ss = [int(v) for v in gt["cents"]]
        N, S, g = sum(ns), sum(ss), len(ns)
        thetas = [1000 * (S - s) // (N - n) for n, s in zip(ns, ss)]
        st, st2 = sum(thetas), sum(t * t for t in thetas)
        var = (g - 1) * (g * st2 - st * st) // (g * g)
        theta_hat = 1000 * S // N
        infl = max(abs(t - theta_hat) for t in thetas)
        return pd.DataFrame({
            "n_groups": pd.Series([g], dtype="int64"),
            "true_millicents": pd.Series([theta_hat], dtype="int64"),
            "jk_var": pd.Series([var], dtype="int64"),
            "jk_se_milli": pd.Series([math.isqrt(var)],
                                     dtype="int64"),
            "max_influence_milli": pd.Series([infl], dtype="int64")})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


JACKKNIFE_SQL = """
WITH r AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
              AS BIGINT) %% %d AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
gm AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(cents) AS HUGEINT) AS s
       FROM r GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(s) AS HUGEINT) AS st,
               CAST(count(*) AS HUGEINT) AS g FROM gm),
th AS (SELECT 1000 * (tot.st - gm.s) // (tot.nt - gm.n) AS theta
       FROM gm, tot),
agg AS (SELECT CAST(sum(theta) AS HUGEINT) AS s1,
               CAST(sum(theta * theta) AS HUGEINT) AS s2
        FROM th),
fin AS (SELECT tot.g AS g,
               1000 * tot.st // tot.nt AS theta_hat,
               (tot.g - 1) * (tot.g * agg.s2 - agg.s1 * agg.s1)
                 // (tot.g * tot.g) AS var
        FROM tot, agg)
SELECT CAST(fin.g AS BIGINT) AS n_groups,
       CAST(fin.theta_hat AS BIGINT) AS true_millicents,
       CAST(fin.var AS BIGINT) AS jk_var,
       CAST(floor(sqrt(CAST(fin.var AS DOUBLE))) AS BIGINT)
         AS jk_se_milli,
       CAST((SELECT max(abs(theta - fin.theta_hat)) FROM th)
            AS BIGINT) AS max_influence_milli
FROM fin
""" % MOM_GROUPS


def orders_forecast_backtest(sf_dir):
    """Walk-forward backtest of the seasonal-naive forecaster — the
    evaluation discipline behind every demand-forecast deployment
    (and the honest companion to q6_forecast_revenue's point
    forecast): daily revenue densified to the full calendar (missing
    days are real zero-revenue days, the orders_daily_acf1 rule),
    forecast f_d = x_{d−7} scored against actuals over every day
    with a 7-back history, next to the persistence baseline
    f_d = x_{d−1}. Reported: exact floored MAE cents for both and
    the skill ratio 1000·mae7 // mae1 (<1000 = weekly seasonality
    carries signal beyond persistence). All integer — no float error
    metric ever crosses engines.

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner (~2.4k cells for this corpus' 6½ calendar years) — zero
    shuffle; the single merge block densifies and shifts
    vectorized."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = g["cents"].to_numpy(np.int64)
        act, f7, f1 = x[7:], x[:-7], x[6:-1]
        n = len(act)
        e7 = int(np.abs(act - f7).sum())
        e1 = int(np.abs(act - f1).sum())
        return pd.DataFrame({
            "n_days": pd.Series([n], dtype="int64"),
            "mae7_cents": pd.Series([e7 // n], dtype="int64"),
            "mae1_cents": pd.Series([e1 // n], dtype="int64"),
            "skill_permille": pd.Series([1000 * e7 // max(e1, 1)],
                                        dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FORECAST_BACKTEST_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
l AS (SELECT c, lag(c, 7) OVER (ORDER BY d) AS f7,
             lag(c, 1) OVER (ORDER BY d) AS f1
      FROM x),
e AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(abs(c - f7)) AS HUGEINT) AS e7,
             CAST(sum(abs(c - f1)) AS HUGEINT) AS e1
      FROM l WHERE f7 IS NOT NULL)
SELECT n AS n_days,
       CAST(e7 // n AS BIGINT) AS mae7_cents,
       CAST(e1 // n AS BIGINT) AS mae1_cents,
       CAST(1000 * e7 // greatest(e1, 1) AS BIGINT)
         AS skill_permille
FROM e
"""


def kg_transitivity(sf_dir):
    """Global clustering coefficient (transitivity) of the
    co-citation graph — the one-number cohesion summary next to
    kg_cocite_triangles' per-node counts: C = 3·triangles / wedges,
    wedges = Σ_v d_v(d_v−1)/2, reported as the floored permille
    1000·Σ_v tri_v // wedges (Σ_v tri_v is already 3T because each
    triangle is counted at its three corners). A bibliometric
    network's transitivity >> a random graph's is the small-world
    signature (Watts-Strogatz '98).

    Scale shape: rides the existing distributed machinery whole —
    cocitation_pairs (two bucketed exchanges, hub-capped),
    triangle_counts (wedge join + closing-edge semi-join),
    graph.degrees (node-bucketed exchange of count partials); each
    side reduces to a bounded scalar partial and only those scalars
    reach the driver. Final quotient in Python ints (Σd² outgrows
    int64 past ~10⁹-degree hubs)."""
    from ..stages import graph

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node")

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64)
        return pd.DataFrame({"n_nodes": [len(d)],
                             "wedges2": [int((d * (d - 1)).sum())]}
                            ).astype("int64")

    deg_tot = (deg.map_batches(deg_partial, batch_format="pandas")
               .to_pandas().sum())
    n_nodes, wedges = int(deg_tot["n_nodes"]), int(deg_tot["wedges2"]) // 2

    tri_tot = (graph.triangle_counts(pairs)
               .map_batches(lambda df: pd.DataFrame(
                   {"t3": [int(df["n_triangles"].sum())]}),
                   batch_format="pandas")
               .to_pandas()["t3"].sum())
    n_edges = pairs.count()

    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_edges": pd.Series([int(n_edges)], dtype="int64"),
        "n_wedges": pd.Series([wedges], dtype="int64"),
        "n_triangles": pd.Series([int(tri_tot) // 3], dtype="int64"),
        "transitivity_permille": pd.Series(
            [1000 * int(tri_tot) // max(wedges, 1)], dtype="int64")})


KG_TRANSITIVITY_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
tri AS (
  SELECT p1.a, p1.b, p2.b AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.a = p1.b
  JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
agg AS (
  SELECT (SELECT count(*) FROM deg) AS n_nodes,
         (SELECT count(*) FROM pairs) AS n_edges,
         (SELECT CAST(sum(d * (d - 1)) AS HUGEINT) // 2 FROM deg)
           AS n_wedges,
         (SELECT count(*) FROM tri) AS n_triangles)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(1000 * 3 * CAST(n_triangles AS HUGEINT)
            // greatest(n_wedges, 1) AS BIGINT)
         AS transitivity_permille
FROM agg
"""


GINI_BAND_CENTS = 100_000  # $1,000 revenue bins


def customer_revenue_gini(sf_dir):
    """Gini coefficient of customer revenue — the Lorenz-curve
    inequality number completing the concentration triad
    (customer_pareto_concentration = smallest 80% cover,
    brand_revenue_hhi = Herfindahl, this = Gini). Exact Gini needs
    every rank, so the statistic is DEFINED on $1,000-binned revenue
    (the orders_price_drift binning precedent — binned Gini is the
    exact Gini of the banded values, well-defined identically in both
    engines): G = Σ_{i<j} n_i·n_j·(b_j−b_i) / (N·Σ n_b·b), computed
    from ascending-band cumsums and floored to permille. Only
    ordering customers exist in the fact table, so the population is
    'customers with ≥1 order' — stated, not hidden.

    Scale shape: per-batch (custkey → cents) partials (lossless
    combiner) ride ONE custkey-bucketed exchange; each bucket bands
    its finalized customers into bounded (band, n) cells (a customer
    lives in one bucket, so cells are additive); the single merge
    runs the pairwise-difference cumsum in Python ints (n_i·n_j·Δb
    outgrows int64 past ~10⁹ customers)."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(),
                           "cents": cents})
             .groupby("c", as_index=False)["cents"].sum())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "cents": "int64",
                         "_bucket": "int32"})

    def bucket_bands(g: pd.DataFrame) -> pd.DataFrame:
        per_c = g.groupby("c", as_index=False)["cents"].sum()
        band = per_c["cents"].to_numpy(np.int64) // GINI_BAND_CENTS
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_bands, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = (df.groupby("band", as_index=False)["n"].sum()
             .sort_values("band").reset_index(drop=True))
        bands = [int(v) for v in b["band"]]
        ns = [int(v) for v in b["n"]]
        num, cn, cs = 0, 0, 0
        for band, n in zip(bands, ns):
            num += n * (band * cn - cs)
            cn += n
            cs += band * n
        return pd.DataFrame({
            "n_customers": pd.Series([cn], dtype="int64"),
            "n_bands": pd.Series([len(bands)], dtype="int64"),
            "gini_permille": pd.Series(
                [1000 * num // max(cn * cs, 1)], dtype="int64")})

    return _merge_partials(per_bucket, merge)


CUSTOMER_GINI_SQL = """
WITH r AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
b AS (SELECT cents // %d AS band, CAST(count(*) AS BIGINT) AS n
      FROM r GROUP BY 1),
w AS (SELECT band, n,
             coalesce(sum(n) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cn,
             coalesce(sum(band * n) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cs
      FROM b),
agg AS (SELECT CAST(sum(n * (band * cn - cs)) AS HUGEINT) AS num,
               CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(band * n) AS HUGEINT) AS sb,
               CAST(count(*) AS BIGINT) AS nb
        FROM w)
SELECT CAST(nt AS BIGINT) AS n_customers,
       nb AS n_bands,
       CAST(1000 * num // greatest(nt * sb, 1) AS BIGINT)
         AS gini_permille
FROM agg
""" % GINI_BAND_CENTS


def events_fano_overdispersion(sf_dir):
    """Fano factor (variance-to-mean ratio) of daily event counts per
    type — the overdispersion audit that decides whether arrivals are
    Poisson (F≈1), bursty (F>1) or regularized (F<1) before anyone
    fits a Poisson rate model (Fano '47; the burstiness companion to
    user_interarrival_histogram). Exact via the integer-moment
    identity: F_milli = 1000·(D·Σx² − S²) // (D·S) over the DENSIFIED
    calendar — missing days are real zero-count days (the
    orders_daily_acf1 rule) and silently dropping them inflates the
    mean and deflates the variance.

    Scale shape: bounded (type, day) count partials — lossless
    per-batch combiner, zero shuffle (≤ types × calendar-days cells);
    the single merge densifies per type and runs the moment
    arithmetic in Python ints (D·Σx² outgrows int64 past ~10⁷ daily
    events over decades)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        out = (pd.DataFrame({"t": t["event_type"].to_pylist(),
                             "d": days, "n": 1})
               .groupby(["t", "d"], as_index=False)["n"].sum())
        return out.astype({"d": "int64", "n": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby(["t", "d"], as_index=False)["n"].sum()
        lo, hi = int(b["d"].min()), int(b["d"].max())
        D = hi - lo + 1
        rows = []
        for ty, g in b.groupby("t"):
            ns = [int(v) for v in g["n"]]
            s = sum(ns)
            s2 = sum(v * v for v in ns)  # zero days add 0 to both
            fano = 1000 * (D * s2 - s * s) // (D * s)
            rows.append((ty, D, s, fano))
        out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                          "n_events", "fano_milli"])
        return out.sort_values("event_type").reset_index(drop=True) \
            .astype({"n_days": "int64", "n_events": "int64",
                     "fano_milli": "int64"})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FANO_SQL = """
WITH b AS (
  SELECT event_type AS t,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
cal AS (SELECT max(d) - min(d) + 1 AS nd FROM b),
m AS (SELECT t, CAST(sum(n) AS HUGEINT) AS s,
             CAST(sum(n * n) AS HUGEINT) AS s2
      FROM b GROUP BY 1)
SELECT t AS event_type,
       CAST(cal.nd AS BIGINT) AS n_days,
       CAST(m.s AS BIGINT) AS n_events,
       CAST(1000 * (cal.nd * m.s2 - m.s * m.s)
            // (cal.nd * m.s) AS BIGINT) AS fano_milli
FROM m, cal ORDER BY t
"""


def kg_degree_assortativity(sf_dir):
    """Degree assortativity of the co-citation graph — do hubs attach
    to hubs (r>0, social networks) or to leaves (r<0, technological
    graphs; Newman '02)? Pearson r over edge-endpoint degree pairs is
    kept cross-engine exact by NEVER taking the square root: each
    undirected edge contributes both directions, the five integer
    sufficient statistics (n, Σx, Σy=Σx, Σxy, Σx²) reduce to
    num = n·Σxy − (Σx)² and var = n·Σx² − (Σx)², and the report is
    the SIGNED r² ppm sign(num)·(10⁶·num² // var²) next to the raw
    (num, var) pair — the events_value_trend exact-pair discipline
    (r = num/var here because x and y are exchangeable, so
    r² = num²/var²).

    Scale shape: degrees ride one node-bucketed exchange
    (graph.degrees); endpoint degrees join onto the pair list by two
    hash-bucketed joins (stages.joins.bucket_join — the a-side and
    b-side each co-locate once); the joined batches reduce to the
    bounded five-statistic partial, zero further shuffle, Python-int
    finalize (num² outgrows int64 immediately)."""
    from ..stages import graph
    from ..stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()

    ja = bucket_join(pairs, deg, left_on="a", right_on="node",
                     suffix="_da")
    jb = bucket_join(ja, deg, left_on="b", right_on="node",
                     suffix="_db")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        da = df["deg"].to_numpy(np.int64)
        db = df["deg_db"].to_numpy(np.int64)
        # both directions of every undirected edge
        sx = int(da.sum() + db.sum())
        sxy = 2 * int((da * db).sum())
        sx2 = int((da * da).sum() + (db * db).sum())
        return pd.DataFrame({"n": [2 * len(df)], "sx": [sx],
                             "sxy": [sxy], "sx2": [sx2]}
                            ).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        sx = int(df["sx"].sum())
        sxy = int(df["sxy"].sum())
        sx2 = int(df["sx2"].sum())
        num = n * sxy - sx * sx
        var = n * sx2 - sx * sx
        sgn = 1 if num >= 0 else -1
        r2 = sgn * (1_000_000 * num * num // max(var * var, 1))
        return pd.DataFrame({
            "n_endpoints": pd.Series([n], dtype="int64"),
            "num": pd.Series([num], dtype="int64"),
            "var": pd.Series([var], dtype="int64"),
            "assort_r2_ppm_signed": pd.Series([r2], dtype="int64")})

    return _merge_partials(
        jb.map_batches(stats, batch_format="pandas"), merge)


KG_ASSORTATIVITY_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
ep AS (
  SELECT da.d AS x, db.d AS y
  FROM pairs JOIN deg da ON da.node = pairs.a
             JOIN deg db ON db.node = pairs.b
  UNION ALL
  SELECT db.d, da.d
  FROM pairs JOIN deg da ON da.node = pairs.a
             JOIN deg db ON db.node = pairs.b),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sx2
      FROM ep),
f AS (SELECT n, n * sxy - sx * sx AS num,
             n * sx2 - sx * sx AS var
      FROM s)
SELECT CAST(n AS BIGINT) AS n_endpoints,
       CAST(num AS BIGINT) AS num,
       CAST(var AS BIGINT) AS var,
       CAST((CASE WHEN num >= 0 THEN 1 ELSE -1 END)
            * (1000000 * num * num
               // greatest(var * var, 1)) AS BIGINT)
         AS assort_r2_ppm_signed
FROM f
"""


LTV_MONTH_DAYS = 30  # account-age month = 30-day grid (documented)


def customer_cohort_ltv(sf_dir):
    """Cohort LTV curves — the growth-analytics staple: customers
    cohorted by the calendar YEAR of their first order, every later
    order assigned to its account-age month ((day − first_day) // 30,
    a deterministic grid both engines share), and each (cohort,
    age_month) cell reports order count, revenue cents, the running
    cumulative revenue and the per-customer LTV cum_cents //
    cohort_size — the curve a finance team reads payback periods
    from. Calendar year via datetime64[Y] arithmetic (no locale).

    Scale shape: the customer dimension is the small side — per-batch
    (custkey → min day) partials ride ONE custkey-bucketed exchange
    and the narrow (custkey, first_day) table materializes once (4
    int64s/customer, the RFM precedent) and BROADCASTS as the
    first-order lookup; orders then tag map-side into bounded
    (cohort_year, age_month) cells (≤ years × ~90 months), zero
    further shuffle; the single merge runs the within-cohort
    cumsum."""
    import ray

    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(),
                           "d": days})
             .groupby("c", as_index=False)["d"].min())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "d": "int64",
                         "_bucket": "int32"})

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("c", as_index=False)["d"].min()
                .astype("int64"))

    first = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(bucket_first, batch_format="pandas")
             .to_pandas())
    first_day = dict(zip(first["c"].astype(int),
                         first["d"].astype(int)))
    # cohort sizes from the same narrow table
    fy = (np.asarray(list(first_day.values()), np.int64)
          .astype("datetime64[D]").astype("datetime64[Y]")
          .astype(np.int64) + 1970)
    cohort_size = pd.Series(fy).value_counts().to_dict()
    lookup = ray.put(first_day)

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        fd = _ray.get(lookup)
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        firsts = np.asarray([fd[int(c)] for c in
                             t["o_custkey"].to_pylist()], np.int64)
        years = (firsts.astype("datetime64[D]")
                 .astype("datetime64[Y]").astype(np.int64) + 1970)
        age = (days - firsts) // LTV_MONTH_DAYS
        out = (pd.DataFrame({"cohort_year": years, "age_month": age,
                             "n": 1, "cents": cents})
               .groupby(["cohort_year", "age_month"], as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["cohort_year", "age_month"], as_index=False)
             .agg(n_orders=("n", "sum"), cents=("cents", "sum"))
             .sort_values(["cohort_year", "age_month"])
             .reset_index(drop=True))
        g["cum_cents"] = g.groupby("cohort_year")["cents"].cumsum()
        sizes = g["cohort_year"].map(cohort_size).astype("int64")
        g["n_customers"] = sizes
        g["ltv_cents"] = g["cum_cents"] // sizes
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


COHORT_LTV_SQL = """
WITH f AS (
  SELECT o_custkey,
         CAST(min(epoch_us(o_orderdate)) // 86400000000 AS BIGINT)
           AS fd
  FROM orders GROUP BY 1),
cs AS (
  SELECT CAST(year(CAST(to_timestamp(fd * 86400) AS DATE))
              AS BIGINT) AS cohort_year,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM f GROUP BY 1),
o AS (
  SELECT CAST(year(CAST(to_timestamp(f.fd * 86400) AS DATE))
              AS BIGINT) AS cohort_year,
         (CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000
          - f.fd) // %d AS age_month,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN f ON f.o_custkey = o.o_custkey),
g AS (
  SELECT cohort_year, age_month,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM o GROUP BY 1, 2)
SELECT g.cohort_year, g.age_month, g.n_orders, g.cents,
       CAST(sum(g.cents) OVER (PARTITION BY g.cohort_year
              ORDER BY g.age_month) AS BIGINT) AS cum_cents,
       cs.n_customers,
       CAST(sum(g.cents) OVER (PARTITION BY g.cohort_year
              ORDER BY g.age_month) // cs.n_customers AS BIGINT)
         AS ltv_cents
FROM g JOIN cs ON cs.cohort_year = g.cohort_year
ORDER BY g.cohort_year, g.age_month
""" % LTV_MONTH_DAYS


def part_price_index(sf_dir):
    """Laspeyres and Paasche price indices between the two halves of
    the shipdate range — the econometrics primitive (CPI arithmetic)
    asking 'did prices rise, holding the BASKET fixed?': per part and
    period, unit price is the floored milli-grid 1000·cents // qty
    (a documented grid — per-row prices are ratios, so a grid is the
    only way integer arithmetic crosses engines), Laspeyres weights
    by base-period quantities (1000·Σp₁q₀ // Σp₀q₀) and Paasche by
    current (1000·Σp₁q₁ // Σp₀q₁), over parts traded in BOTH halves
    (the matched-basket rule).

    Scale shape: one zero-shuffle min/max pre-pass pins the midpoint
    (the orders_price_drift discipline); (part, half → cents, qty)
    partials ride ONE partkey-bucketed exchange; each bucket
    finalizes its parts' per-period prices and emits ONE bounded
    five-number partial (a part lives in exactly one bucket, so the
    basket sums are additive); Python-int merge, HUGEINT oracle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity",
                        "l_extendedprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2
    buckets = _exchange_buckets(sf_dir, "lineitem")

    def prep(t: pa.Table) -> pd.DataFrame:
        days = (t["l_shipdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = pc.cast(pc.round(t["l_quantity"],
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        p = (pd.DataFrame({"k": t["l_partkey"].to_numpy(),
                           "h": (days > mid).astype(np.int64),
                           "cents": cents, "qty": qty})
             .groupby(["k", "h"], as_index=False)
             .agg(cents=("cents", "sum"), qty=("qty", "sum")))
        hh = pd.util.hash_pandas_object(p["k"], index=False).values
        p["_bucket"] = (hh % np.uint64(buckets)).astype("int32")
        return p.astype({"k": "int64", "h": "int64", "cents": "int64",
                         "qty": "int64", "_bucket": "int32"})

    def bucket_sums(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby(["k", "h"], as_index=False)
             .agg(cents=("cents", "sum"), qty=("qty", "sum")))
        w = a.pivot_table(index="k", columns="h",
                          values=["cents", "qty"], aggfunc="sum")
        w = w.reindex(columns=pd.MultiIndex.from_product(
            [["cents", "qty"], [0, 1]]))
        both = w.dropna()
        if len(both) == 0:
            z = [0] * 5
        else:
            c0 = both[("cents", 0)].to_numpy(np.int64)
            c1 = both[("cents", 1)].to_numpy(np.int64)
            q0 = both[("qty", 0)].to_numpy(np.int64)
            q1 = both[("qty", 1)].to_numpy(np.int64)
            p0 = 1000 * c0 // q0
            p1 = 1000 * c1 // q1
            z = [len(both), int((p1 * q0).sum()),
                 int((p0 * q0).sum()), int((p1 * q1).sum()),
                 int((p0 * q1).sum())]
        return pd.DataFrame({"n_parts": [z[0]], "l_num": [z[1]],
                             "l_den": [z[2]], "p_num": [z[3]],
                             "p_den": [z[4]]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_sums, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ln, ld = int(df["l_num"].sum()), int(df["l_den"].sum())
        pn, pdn = int(df["p_num"].sum()), int(df["p_den"].sum())
        return pd.DataFrame({
            "n_parts_both": pd.Series([int(df["n_parts"].sum())],
                                      dtype="int64"),
            "laspeyres_milli": pd.Series([1000 * ln // max(ld, 1)],
                                         dtype="int64"),
            "paasche_milli": pd.Series([1000 * pn // max(pdn, 1)],
                                       dtype="int64")})

    return _merge_partials(per_bucket, merge)


PRICE_INDEX_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000)
          + max(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000))
         // 2 AS mid
  FROM lineitem),
b AS (
  SELECT l_partkey AS k,
         CASE WHEN CAST(epoch_us(l_shipdate) AS BIGINT)
                   // 86400000000 > rng.mid
              THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           AS qty
  FROM lineitem, rng GROUP BY 1, 2),
w AS (
  SELECT b0.k,
         1000 * b0.cents // b0.qty AS p0,
         1000 * b1.cents // b1.qty AS p1,
         b0.qty AS q0, b1.qty AS q1
  FROM b b0 JOIN b b1 ON b1.k = b0.k AND b0.h = 0 AND b1.h = 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p1 * q0) AS HUGEINT) AS ln_,
             CAST(sum(p0 * q0) AS HUGEINT) AS ld,
             CAST(sum(p1 * q1) AS HUGEINT) AS pn,
             CAST(sum(p0 * q1) AS HUGEINT) AS pd_
      FROM w)
SELECT n AS n_parts_both,
       CAST(1000 * ln_ // greatest(ld, 1) AS BIGINT)
         AS laspeyres_milli,
       CAST(1000 * pn // greatest(pd_, 1) AS BIGINT)
         AS paasche_milli
FROM s
"""


def kg_rich_club(sf_dir):
    """Rich-club coefficient ladder of the co-citation graph — for
    every degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k
    counts nodes of degree > k and E_k edges whose BOTH endpoints
    have degree > k (Colizza et al. '06): do the hubs form a club
    denser than the graph at large? Reported as floored permille per
    k over every k with N_k ≥ 2.

    Scale shape: reuses the assortativity join plan — degrees ride
    one node-bucketed exchange and attach to the pair list via two
    bucket_joins over materialized inputs; per-batch census of
    min(da, db) plus the bounded degree histogram are both suffix-
    cumsummable, so E_k and N_k for EVERY k fall out of one merge
    block with no per-k passes. Python-int quotients (N_k² outgrows
    int64 past ~3·10⁹ hub nodes)."""
    from ..stages import graph
    from ..stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()

    # bounded degree histogram (distinct degree values)
    def deg_hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("deg", as_index=False).size()
               .rename(columns={"size": "n_nodes"}))
        return out.astype("int64")

    hist = (deg.map_batches(deg_hist, batch_format="pandas")
            .to_pandas().groupby("deg", as_index=False)["n_nodes"]
            .sum())

    ja = bucket_join(pairs, deg, left_on="a", right_on="node",
                     suffix="_da")
    jb = bucket_join(ja, deg, left_on="b", right_on="node",
                     suffix="_db")

    def edge_census(df: pd.DataFrame) -> pd.DataFrame:
        m = np.minimum(df["deg"].to_numpy(np.int64),
                       df["deg_db"].to_numpy(np.int64))
        out = (pd.DataFrame({"mindeg": m})
               .groupby("mindeg", as_index=False).size()
               .rename(columns={"size": "n_edges"}))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ec = (df.groupby("mindeg", as_index=False)["n_edges"].sum()
              .sort_values("mindeg").reset_index(drop=True))
        degs = hist.sort_values("deg").reset_index(drop=True)
        max_deg = int(degs["deg"].max())
        rows = []
        for k in range(1, max_deg):
            nk = int(degs.loc[degs["deg"] > k, "n_nodes"].sum())
            if nk < 2:
                continue
            ek = int(ec.loc[ec["mindeg"] > k, "n_edges"].sum())
            rows.append((k, nk, ek,
                         1000 * 2 * ek // (nk * (nk - 1))))
        return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges",
                                           "phi_permille"]
                            ).astype("int64")

    return _merge_partials(
        jb.map_batches(edge_census, batch_format="pandas"), merge)


KG_RICH_CLUB_SQL = f"""
WITH edges AS ({_CITE_EDGES_SQL}),
pairs AS (
  SELECT DISTINCT e1.dst AS a, e2.dst AS b
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
ks AS (
  SELECT unnest(generate_series(1,
           (SELECT CAST(max(d) AS BIGINT) FROM deg) - 1)) AS k),
nk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
ek AS (SELECT ks.k, CAST(count(e.mindeg) AS BIGINT) AS n_edges
       FROM ks LEFT JOIN (
         SELECT least(da.d, db.d) AS mindeg
         FROM pairs JOIN deg da ON da.node = pairs.a
                    JOIN deg db ON db.node = pairs.b) e
         ON e.mindeg > ks.k
       GROUP BY 1)
SELECT nk.k, nk.n_nodes,
       coalesce(ek.n_edges, 0) AS n_edges,
       CAST(1000 * 2 * CAST(coalesce(ek.n_edges, 0) AS HUGEINT)
            // (CAST(nk.n_nodes AS HUGEINT) * (nk.n_nodes - 1))
            AS BIGINT) AS phi_permille
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes >= 2
ORDER BY nk.k
"""


def er_blocking_quality(sf_dir):
    """Blocking-scheme evaluation (Christen '12's two standard
    metrics) — before trusting a cheap blocking key at 10⁹ records,
    measure what it buys and what it loses against ground truth:
    PAIRS COMPLETENESS (recall: fraction of true edit-distance-1
    name pairs whose two records share a block) and REDUCTION RATIO
    (fraction of the N·(N−1)/2 comparison space the blocking prunes).
    The audited scheme is prefix-15 blocking (drop the last 3 name
    chars) over the zero-padded customer names, whose block key is
    provably custkey // 1000 — so a truth pair is captured iff its
    keys agree on //1000, evaluable map-side with no name join.

    Scale shape: the truth pairs reuse the FastSS deletion-
    neighborhood machinery (dedup.edit1_join_pairs — signature
    explode, bucketed verify); capture tagging and the pair census
    are per-batch count partials, zero further shuffle; block sizes
    for the reduction ratio are a bounded (block → n) combiner
    (≤ N/1000 blocks). C(N,2) arithmetic in Python ints."""
    from ..stages.dedup import edit1_join_pairs

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    n_cust = ds.count()

    pairs = edit1_join_pairs(ds, text_col="c_name",
                             key_col="c_custkey")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        a = df["key_a"].to_numpy(np.int64)
        b = df["key_b"].to_numpy(np.int64)
        cap = (a // 1000 == b // 1000).astype(np.int64)
        return pd.DataFrame({"n_truth": [len(df)],
                             "n_captured": [int(cap.sum())]}
                            ).astype("int64")

    truth = pairs.map_batches(tag, batch_format="pandas").to_pandas()
    n_truth = int(truth["n_truth"].sum())
    n_cap = int(truth["n_captured"].sum())

    def block_sizes(t: pa.Table) -> pd.DataFrame:
        blk = t["c_custkey"].to_numpy() // 1000
        out = (pd.DataFrame({"blk": blk})
               .groupby("blk", as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype("int64")

    blocks = (_read(sf_dir, "customer", columns=["c_custkey"])
              .map_batches(block_sizes, batch_format="pyarrow")
              .to_pandas().groupby("blk")["n"].sum())
    candidates = sum(int(n) * (int(n) - 1) // 2 for n in blocks)
    possible = n_cust * (n_cust - 1) // 2

    return pd.DataFrame({
        "n_truth_pairs": pd.Series([n_truth], dtype="int64"),
        "n_captured": pd.Series([n_cap], dtype="int64"),
        "recall_permille": pd.Series(
            [1000 * n_cap // max(n_truth, 1)], dtype="int64"),
        "n_candidates": pd.Series([candidates], dtype="int64"),
        "reduction_permille": pd.Series(
            [1000 * (possible - candidates) // max(possible, 1)],
            dtype="int64")})


ER_BLOCKING_SQL = """
WITH truth AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb
  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
cap AS (
  SELECT CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN ka // 1000 = kb // 1000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cap
  FROM truth),
blk AS (SELECT c_custkey // 1000 AS b, count(*) AS n
        FROM customer GROUP BY 1),
cand AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS c FROM blk),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM customer)
SELECT cap.n_truth AS n_truth_pairs,
       cap.n_cap AS n_captured,
       CAST(1000 * cap.n_cap // greatest(cap.n_truth, 1) AS BIGINT)
         AS recall_permille,
       cand.c AS n_candidates,
       CAST(1000 * (tot.n * (tot.n - 1) // 2 - cand.c)
            // greatest(tot.n * (tot.n - 1) // 2, 1) AS BIGINT)
         AS reduction_permille
FROM cap, cand, tot
"""


ATTR_WINDOW_US = 48 * 3600 * 1_000_000  # 48-hour lookback


def events_touch_attribution(sf_dir):
    """Multi-touch attribution — the marketing-analytics question
    'which channel gets credit for the purchase?', answered under the
    three standard models at once: per channel (view/click), the
    count of purchases whose FIRST touch in the 48 h lookback was
    this channel, whose LAST touch was, and the LINEAR credit sum
    (each of a purchase's k touches earns the floored 1000//k
    permille — the floor is the defined grid, so credits sum to ≤1000
    per purchase identically in both engines). Window is half-open
    [t_p − W, t_p): a touch AT the purchase microsecond is the
    purchase's own page-render, not a cause. Purchases with no touch
    in window report as the '(none)' channel — the orphan rate a
    media team reads before trusting the model. Ties on equal ts
    break by event_id in both engines.

    Scale shape: one user-bucketed exchange co-locates each user's
    events; per bucket the purchases×touches window join is a
    vectorized same-user merge (per-user event counts are bounded —
    the basket self-join discipline), first/last fall out of one
    (pid, ts, eid) sort, and the bucket emits a bounded ≤3-channel
    census partial (a purchase lives in exactly one bucket)."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        kinds = t["event_type"].to_pylist()
        keep = [i for i, k in enumerate(kinds)
                if k in ("purchase", "view", "click")]
        tt = t.take(keep)
        df = pd.DataFrame({
            "u": tt["user_id"].to_numpy(),
            "ts": (tt["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64)),
            "eid": tt["event_id"].to_numpy(),
            "ch": tt["event_type"].to_pylist()})
        h = pd.util.hash_pandas_object(df["u"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df

    def bucket_census(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["ch"] == "purchase"][["u", "ts", "eid"]] \
            .rename(columns={"ts": "pts", "eid": "pid"})
        t = g[g["ch"] != "purchase"][["u", "ts", "eid", "ch"]]
        j = p.merge(t, on="u")
        j = j[(j["ts"] >= j["pts"] - ATTR_WINDOW_US)
              & (j["ts"] < j["pts"])]
        cells = {}

        def bump(ch, col, val=1):
            key = ch
            if key not in cells:
                cells[key] = [0, 0, 0]
            cells[key][col] += val

        if len(j):
            j = j.sort_values(["pid", "ts", "eid"], kind="mergesort")
            kk = j.groupby("pid")["eid"].transform("size") \
                .to_numpy(np.int64)
            for ch, n in (j.groupby("pid").head(1)["ch"]
                          .value_counts().items()):
                bump(ch, 0, int(n))
            for ch, n in (j.groupby("pid").tail(1)["ch"]
                          .value_counts().items()):
                bump(ch, 1, int(n))
            lin = pd.DataFrame({"ch": j["ch"].to_numpy(),
                                "w": 1000 // kk})
            for ch, s in lin.groupby("ch")["w"].sum().items():
                bump(ch, 2, int(s))
        orphans = len(p) - j["pid"].nunique() if len(j) else len(p)
        if orphans:
            bump("(none)", 0, orphans)
            bump("(none)", 1, orphans)
        out = pd.DataFrame(
            [(ch, v[0], v[1], v[2]) for ch, v in cells.items()],
            columns=["channel", "first_touch", "last_touch",
                     "linear_permille"])
        return out.astype({"first_touch": "int64",
                           "last_touch": "int64",
                           "linear_permille": "int64"})

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_census, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("channel", as_index=False)
               .agg(first_touch=("first_touch", "sum"),
                    last_touch=("last_touch", "sum"),
                    linear_permille=("linear_permille", "sum"))
               .sort_values("channel").reset_index(drop=True))
        return out.astype({"first_touch": "int64",
                           "last_touch": "int64",
                           "linear_permille": "int64"})

    return _merge_partials(per_bucket, merge)


TOUCH_ATTR_SQL = """
WITH p AS (
  SELECT event_id AS pid, user_id AS u,
         CAST(epoch_us(ts) AS BIGINT) AS pts
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts,
         event_id AS eid, event_type AS ch
  FROM events WHERE event_type IN ('view', 'click')),
j AS (
  SELECT p.pid, t.ch, t.ts, t.eid
  FROM p JOIN t ON t.u = p.u
    AND t.ts >= p.pts - %d AND t.ts < p.pts),
r AS (
  SELECT pid, ch,
         row_number() OVER (PARTITION BY pid
                            ORDER BY ts, eid) AS rn_a,
         row_number() OVER (PARTITION BY pid
                            ORDER BY ts DESC, eid DESC) AS rn_d,
         CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS k
  FROM j),
ft AS (SELECT ch, CAST(count(*) AS BIGINT) AS n
       FROM r WHERE rn_a = 1 GROUP BY 1),
lt AS (SELECT ch, CAST(count(*) AS BIGINT) AS n
       FROM r WHERE rn_d = 1 GROUP BY 1),
lin AS (SELECT ch, CAST(sum(1000 // k) AS BIGINT) AS s
        FROM r GROUP BY 1),
orph AS (SELECT (SELECT count(*) FROM p)
                - (SELECT count(DISTINCT pid) FROM j) AS n),
chans AS (SELECT DISTINCT ch FROM j)
SELECT ch AS channel,
       coalesce(ft.n, 0) AS first_touch,
       coalesce(lt.n, 0) AS last_touch,
       coalesce(lin.s, 0) AS linear_permille
FROM chans LEFT JOIN ft USING (ch) LEFT JOIN lt USING (ch)
           LEFT JOIN lin USING (ch)
UNION ALL
SELECT '(none)', CAST(orph.n AS BIGINT), CAST(orph.n AS BIGINT),
       CAST(0 AS BIGINT)
FROM orph WHERE orph.n > 0
ORDER BY channel
""" % ATTR_WINDOW_US


FAIR_THRESHOLD = 14  # classify positive at planted score >= 14


def lineitem_fairness_audit(sf_dir):
    """Group-fairness audit of a classifier — the responsible-AI
    release gate: per protected group (supplier cohort l_suppkey % 5,
    a synthetic protected attribute on a real column), the three
    quantities every fairness review reads: SELECTION RATE
    (demographic parity), TPR and FPR (equalized odds, Hardt et al.
    '16), each as exact floored permille. The classifier is the
    planted scorer thresholded at ≥14 (the lineitem_model_auc rule);
    score and group are independent by construction, so the audit
    correctly reports near-equal rates — the exact per-group values
    and their gaps are the data a dashboard plots.

    Scale shape: bounded (group, y, ŷ) count partials — ≤20 cells,
    lossless per-batch combiner, zero shuffle, one merge block of
    integer divisions."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        s = 8 * y + okey % 20
        out = (pd.DataFrame({"g": t["l_suppkey"].to_numpy() % 5,
                             "y": y,
                             "yh": (s >= FAIR_THRESHOLD)
                             .astype(np.int64),
                             "n": 1})
               .groupby(["g", "y", "yh"], as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["g", "y", "yh"])["n"].sum()
        rows = []
        for g in sorted({k[0] for k in c.index}):
            def n(y, yh):
                return int(c.get((g, y, yh), 0))
            tot = n(0, 0) + n(0, 1) + n(1, 0) + n(1, 1)
            pos = n(1, 0) + n(1, 1)
            neg = n(0, 0) + n(0, 1)
            rows.append((int(g), tot,
                         1000 * (n(0, 1) + n(1, 1)) // max(tot, 1),
                         1000 * n(1, 1) // max(pos, 1),
                         1000 * n(0, 1) // max(neg, 1)))
        return pd.DataFrame(rows, columns=[
            "grp", "n", "selection_permille", "tpr_permille",
            "fpr_permille"]).astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


FAIRNESS_SQL = """
WITH s AS (
  SELECT l_suppkey %% 5 AS grp,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CASE WHEN 8 * (CASE WHEN l_returnflag = 'R'
                             THEN 1 ELSE 0 END)
                   + l_orderkey %% 20 >= %d
              THEN 1 ELSE 0 END AS yh
  FROM lineitem),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yh) AS BIGINT) AS sel,
         CAST(sum(y * yh) AS BIGINT) AS tp,
         CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum((1 - y) * yh) AS BIGINT) AS fp
  FROM s GROUP BY 1)
SELECT CAST(grp AS BIGINT) AS grp, n,
       CAST(1000 * sel // greatest(n, 1) AS BIGINT)
         AS selection_permille,
       CAST(1000 * tp // greatest(pos, 1) AS BIGINT)
         AS tpr_permille,
       CAST(1000 * fp // greatest(n - pos, 1) AS BIGINT)
         AS fpr_permille
FROM g ORDER BY grp
""" % FAIR_THRESHOLD


CONFORMAL_ALPHA_PERMILLE = 100  # target 90% coverage


def lineitem_conformal_threshold(sf_dir):
    """Split-conformal calibration (Vovk '05 / Angelopoulos-Bates
    '21) — the distribution-free coverage guarantee every deployed
    scorer should ship with: a deterministic calibration split
    (l_orderkey % 4 = 0, both engines replay it), nonconformity
    u = 27 − score over calibration POSITIVES, threshold q̂ = the
    ⌈(n+1)(1−α)⌉-th smallest u (the finite-sample corrected order
    statistic — an off-by-one here silently voids the guarantee),
    then the EMPIRICAL eval-set check: positive coverage (must
    concentrate near ≥900‰) and the negative capture rate — the
    efficiency price of the guarantee.

    Scale shape: nonconformity lives on the bounded ≤28-value score
    grid, so calibration is a zero-shuffle (u, split, y) count
    histogram; the order statistic reads off a cumsum and the
    coverage recount is the same histogram's other half — one pass,
    one merge block."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"])

    def partial(t: pa.Table) -> pd.DataFrame:
        okey = t["l_orderkey"].to_numpy()
        y = (pc.equal(t["l_returnflag"], pa.scalar("R"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        u = 27 - (8 * y + okey % 20)
        out = (pd.DataFrame({"u": u, "cal": (okey // 20 % 4 == 0)
                             .astype(np.int64), "y": y, "n": 1})
               .groupby(["u", "cal", "y"], as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["u", "cal", "y"])["n"].sum()
        cal = sorted((int(u), int(n)) for (u, cl, y), n in c.items()
                     if cl == 1 and y == 1)
        n_cal = sum(n for _, n in cal)
        rank = -(-(n_cal + 1) * (1000 - CONFORMAL_ALPHA_PERMILLE)
                 // 1000)  # ceil((n+1)(1-alpha))
        rank = min(rank, n_cal)
        cum, q = 0, max(u for u, _ in cal) if cal else 0
        for u, n in cal:
            cum += n
            if cum >= rank:
                q = u
                break
        ev_pos = sum(int(n) for (u, cl, y), n in c.items()
                     if cl == 0 and y == 1)
        ev_pos_cov = sum(int(n) for (u, cl, y), n in c.items()
                         if cl == 0 and y == 1 and int(u) <= q)
        ev_neg = sum(int(n) for (u, cl, y), n in c.items()
                     if cl == 0 and y == 0)
        # negatives scored by the same rule: u = 27 - s
        ev_neg_cap = sum(int(n) for (u, cl, y), n in c.items()
                         if cl == 0 and y == 0 and int(u) <= q)
        return pd.DataFrame({
            "n_cal": pd.Series([n_cal], dtype="int64"),
            "q_hat": pd.Series([q], dtype="int64"),
            "coverage_permille": pd.Series(
                [1000 * ev_pos_cov // max(ev_pos, 1)], dtype="int64"),
            "neg_capture_permille": pd.Series(
                [1000 * ev_neg_cap // max(ev_neg, 1)],
                dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


CONFORMAL_SQL = """
WITH s AS (
  SELECT 27 - (8 * (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               + l_orderkey %% 20) AS u,
         CASE WHEN (l_orderkey // 20) %% 4 = 0 THEN 1 ELSE 0 END
           AS cal,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
calpos AS (SELECT u, CAST(count(*) AS BIGINT) AS n
           FROM s WHERE cal = 1 AND y = 1 GROUP BY 1),
nc AS (SELECT CAST(sum(n) AS BIGINT) AS n_cal FROM calpos),
rk AS (SELECT least(((n_cal + 1) * (1000 - %d) + 999) // 1000,
                    n_cal) AS r, n_cal FROM nc),
q AS (SELECT min(u) AS q_hat FROM
        (SELECT u, sum(n) OVER (ORDER BY u) AS cum FROM calpos),
        rk
      WHERE cum >= rk.r),
ev AS (SELECT
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS pos,
         CAST(sum(CASE WHEN y = 1 AND u <= q.q_hat
                       THEN 1 ELSE 0 END) AS BIGINT) AS pos_cov,
         CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS neg,
         CAST(sum(CASE WHEN y = 0 AND u <= q.q_hat
                       THEN 1 ELSE 0 END) AS BIGINT) AS neg_cap
       FROM s, q WHERE cal = 0)
SELECT rk.n_cal AS n_cal,
       CAST(q.q_hat AS BIGINT) AS q_hat,
       CAST(1000 * ev.pos_cov // greatest(ev.pos, 1) AS BIGINT)
         AS coverage_permille,
       CAST(1000 * ev.neg_cap // greatest(ev.neg, 1) AS BIGINT)
         AS neg_capture_permille
FROM rk, q, ev
""" % CONFORMAL_ALPHA_PERMILLE


def events_cuped_reduction(sf_dir):
    """CUPED variance-reduction audit (Deng et al. WSDM'13) — the
    experimentation-platform question 'how much experiment runtime
    does the pre-period covariate buy?': per user, X = pre-midpoint
    value sum and Y = post-midpoint value sum (whole-unit integer
    grid), θ = cov/var reported as the exact integer pair
    (θ_num, θ_den) = (n·Σxy − ΣxΣy, n·Σx² − (Σx)²) — the
    events_value_trend discipline — and the headline variance
    reduction r² in ppm, 10⁶·num² // (varx·vary), all Python-int
    (num² reaches ~10²⁹ at sf0.01; HUGEINT oracle). Here the only
    X↔Y link is per-user activity rate, so the audit honestly reports
    a few-permille reduction — the number that tells a team CUPED is
    NOT worth it for this metric.

    Scale shape: one zero-shuffle min/max pre-pass pins the midpoint;
    per-batch (user → x, y) sum partials (lossless combiner) ride ONE
    user-bucketed exchange; each bucket reduces its finalized users
    to a bounded six-statistic partial, single Python-int merge."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def ts_range(t: pa.Table) -> pd.DataFrame:
        x = (t["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(x.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(x.max())],
                                             dtype="int64")})

    r = ds.map_batches(ts_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2
    buckets = _exchange_buckets(sf_dir, "events")

    def prep(t: pa.Table) -> pd.DataFrame:
        ts = (t["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        v = pc.cast(pc.round(t["value"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        pre = ts <= mid
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(),
                           "x": np.where(pre, v, 0),
                           "y": np.where(pre, 0, v)})
             .groupby("u", as_index=False).agg(x=("x", "sum"),
                                               y=("y", "sum")))
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "x": "int64", "y": "int64",
                         "_bucket": "int32"})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("u", as_index=False).agg(x=("x", "sum"),
                                               y=("y", "sum"))
        x = a["x"].to_numpy(np.int64)
        y = a["y"].to_numpy(np.int64)
        return pd.DataFrame({"n": [len(a)], "sx": [int(x.sum())],
                             "sy": [int(y.sum())],
                             "sxy": [int((x * y).sum())],
                             "sx2": [int((x * x).sum())],
                             "sy2": [int((y * y).sum())]}
                            ).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        sx, sy = int(df["sx"].sum()), int(df["sy"].sum())
        sxy = int(df["sxy"].sum())
        sx2, sy2 = int(df["sx2"].sum()), int(df["sy2"].sum())
        num = n * sxy - sx * sy
        vx = n * sx2 - sx * sx
        vy = n * sy2 - sy * sy
        r2 = 1_000_000 * num * num // max(vx * vy, 1)
        return pd.DataFrame({
            "n_users": pd.Series([n], dtype="int64"),
            "theta_num": pd.Series([num], dtype="int64"),
            "theta_den": pd.Series([vx], dtype="int64"),
            "var_reduction_ppm": pd.Series([r2], dtype="int64")})

    return _merge_partials(per_bucket, merge)


CUPED_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(ts) AS BIGINT))
          + max(CAST(epoch_us(ts) AS BIGINT))) // 2 AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) <= rng.mid
                       THEN CAST(round(value) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) > rng.mid
                       THEN CAST(round(value) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events, rng GROUP BY 1),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sx2,
             CAST(sum(y * y) AS HUGEINT) AS sy2
      FROM u),
f AS (SELECT n, n * sxy - sx * sy AS num,
             n * sx2 - sx * sx AS vx,
             n * sy2 - sy * sy AS vy
      FROM s)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(num AS BIGINT) AS theta_num,
       CAST(vx AS BIGINT) AS theta_den,
       CAST(1000000 * num * num // greatest(vx * vy, 1) AS BIGINT)
         AS var_reduction_ppm
FROM f
"""


def events_srm_check(sf_dir):
    """Sample-ratio-mismatch check — the first gate every experiment
    readout runs (Fabijan et al. '19: an SRM invalidates everything
    downstream): users md5-hash into two arms (the deterministic
    assignment discipline — a modulo on sequential ids is EXACTLY
    balanced by construction and tests nothing), and the 1-dof χ²
    against the 50/50 design is the exact integer
    1000·(n₀−n₁)² // (n₀+n₁), flagged at the 3.841 critical value.
    On an honest assignment the statistic is binomial noise — the
    audit passing IS the result.

    Scale shape: distinct users need one user-bucketed exchange
    (batch-local distinct is not a user census); each bucket emits
    its two arm counts (a user lives in one bucket), bounded 2-cell
    merge."""
    import hashlib

    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"u": t["user_id"].to_numpy()}) \
            .drop_duplicates()
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "_bucket": "int32"})

    def bucket_arms(g: pd.DataFrame) -> pd.DataFrame:
        us = g["u"].drop_duplicates()
        arms = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15],
                 16) % 2 for u in us), np.int64, len(us))
        return pd.DataFrame({"n0": [int((arms == 0).sum())],
                             "n1": [int((arms == 1).sum())]}
                            ).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_arms, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n0, n1 = int(df["n0"].sum()), int(df["n1"].sum())
        chi2 = 1000 * (n0 - n1) * (n0 - n1) // max(n0 + n1, 1)
        return pd.DataFrame({
            "n_arm0": pd.Series([n0], dtype="int64"),
            "n_arm1": pd.Series([n1], dtype="int64"),
            "srm_chi2_milli": pd.Series([chi2], dtype="int64"),
            "srm_flag": pd.Series([1 if chi2 > 3841 else 0],
                                  dtype="int64")})

    return _merge_partials(per_bucket, merge)


SRM_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
a AS (SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                 1, 15) AS BIGINT) % 2 AS arm
      FROM u),
c AS (SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n0,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n1
      FROM a)
SELECT n0 AS n_arm0, n1 AS n_arm1,
       CAST(1000 * (n0 - n1) * (n0 - n1)
            // greatest(n0 + n1, 1) AS BIGINT) AS srm_chi2_milli,
       CAST(CASE WHEN 1000 * (n0 - n1) * (n0 - n1)
                      // greatest(n0 + n1, 1) > 3841
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM c
"""


DUP_PAY_PLANT_MOD = 37      # every 37th order double-submits
DUP_PAY_CLONE_BASE = 10 ** 9
DUP_PAY_WINDOW_DAYS = 7


def orders_duplicate_payments(sf_dir):
    """Duplicate-payment detector with a planted validation set — the
    AP/fraud audit 'same payer, same amount, days apart' cannot be
    demonstrated on this synthesizer (continuous prices: measured 0
    natural collisions even on a $100 grid), so every 37th order
    PLANTS a double-submission (clone key +10⁹, same customer and
    cents, next day — the bloom_fpr_audit detector-validation
    discipline) and the detector's recall against the plant is the
    reported result, next to the natural-pair count (0 here; >0 in
    production is the finding).

    Scale shape: plants are map-side row emission; candidate pairs
    ride ONE custkey-bucketed exchange and each bucket self-merges on
    (custkey, cents) — the same-key join is tiny because amounts
    collide rarely (that rarity is WHY the detector works) — then
    filters the ±7-day window; bounded count partials, single
    merge."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        c = t["o_custkey"].to_numpy()
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        df = pd.DataFrame({"k": k, "c": c, "d": d, "cents": cents})
        plant = df[df["k"] % DUP_PAY_PLANT_MOD == 0].copy()
        plant["k"] = plant["k"] + DUP_PAY_CLONE_BASE
        plant["d"] = plant["d"] + 1
        df = pd.concat([df, plant], ignore_index=True)
        h = pd.util.hash_pandas_object(df["c"], index=False).values
        df["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return df.astype({"k": "int64", "c": "int64", "d": "int64",
                          "cents": "int64", "_bucket": "int32"})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        j = g.merge(g, on=["c", "cents"])
        j = j[(j["k_x"] < j["k_y"])
              & ((j["d_x"] - j["d_y"]).abs()
                 <= DUP_PAY_WINDOW_DAYS)]
        clone = (j["k_y"] >= DUP_PAY_CLONE_BASE) \
            | (j["k_x"] >= DUP_PAY_CLONE_BASE)
        n_plant = int((g.loc[g["k"] < DUP_PAY_CLONE_BASE, "k"]
                       % DUP_PAY_PLANT_MOD == 0).sum())
        return pd.DataFrame({
            "n_pairs": [len(j)],
            "n_clone_pairs": [int(clone.sum())],
            "n_natural_pairs": [int((~clone).sum())],
            "n_planted": [n_plant]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_pairs, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        pairs = int(df["n_pairs"].sum())
        clones = int(df["n_clone_pairs"].sum())
        nat = int(df["n_natural_pairs"].sum())
        planted = int(df["n_planted"].sum())
        return pd.DataFrame({
            "n_planted": pd.Series([planted], dtype="int64"),
            "n_pairs": pd.Series([pairs], dtype="int64"),
            "n_natural_pairs": pd.Series([nat], dtype="int64"),
            "recall_permille": pd.Series(
                [1000 * clones // max(planted, 1)], dtype="int64")})

    return _merge_partials(per_bucket, merge)


DUP_PAY_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS c,
         CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
o AS (
  SELECT * FROM base
  UNION ALL
  SELECT k + %d, c, d + 1, cents FROM base WHERE k %% %d = 0),
p AS (
  SELECT a.k AS ka, b.k AS kb
  FROM o a JOIN o b
    ON a.c = b.c AND a.cents = b.cents AND a.k < b.k
   AND abs(a.d - b.d) <= %d),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN ka >= %d OR kb >= %d
                       THEN 1 ELSE 0 END) AS BIGINT) AS clones
  FROM p),
pl AS (SELECT CAST(count(*) AS BIGINT) AS n
       FROM base WHERE k %% %d = 0)
SELECT pl.n AS n_planted,
       agg.n_pairs,
       CAST(agg.n_pairs - agg.clones AS BIGINT) AS n_natural_pairs,
       CAST(1000 * agg.clones // greatest(pl.n, 1) AS BIGINT)
         AS recall_permille
FROM agg, pl
""" % (DUP_PAY_CLONE_BASE, DUP_PAY_PLANT_MOD, DUP_PAY_WINDOW_DAYS,
       DUP_PAY_CLONE_BASE, DUP_PAY_CLONE_BASE, DUP_PAY_PLANT_MOD)


SKETCH_BINS = 256


def orders_quantile_sketch_audit(sf_dir):
    """Quantile-sketch accuracy audit — before trusting an
    equi-width-histogram quantile estimator (the shape every
    approximate engine ships), measure its error against the exact
    order statistics ON THIS DISTRIBUTION: p50/p90/p99 of order
    cents, estimate = linear interpolation inside the crossing
    256-bin cell (all integer: lo + width·(rank−cum_below) //
    bin_count), exact = the true rank-⌈qN⌉ value, error reported in
    ppm of the exact (measured ~240 ppm at p50 — permille floors a
    256-bin sketch's error to zero). The join_sample_estimate /
    embed_squant_recall discipline: the estimator's deviation IS the
    data.

    Scale shape: one zero-shuffle min/max pre-pass sizes the bins;
    per-batch partials carry BOTH the bounded 256-cell sketch and the
    distinct-cents exact histogram (price-domain bounded, the
    orders_price_drift argument); single merge reads both off
    cumsums."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def cents_of(t: pa.Table) -> np.ndarray:
        return pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                            pa.scalar(100.0)),
                                round_mode="half_towards_infinity"),
                       pa.int64()).to_numpy()

    def rng(t: pa.Table) -> pd.DataFrame:
        x = cents_of(t)
        return pd.DataFrame({"lo": pd.Series([int(x.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(x.max())],
                                             dtype="int64")})

    r = ds.map_batches(rng, batch_format="pyarrow").to_pandas()
    lo, hi = int(r["lo"].min()), int(r["hi"].max())
    width = max((hi - lo + SKETCH_BINS) // SKETCH_BINS, 1)

    def partial(t: pa.Table) -> pd.DataFrame:
        x = cents_of(t)
        out = (pd.DataFrame({"cents": x, "n": 1})
               .groupby("cents", as_index=False)["n"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("cents", as_index=False)["n"].sum()
             .sort_values("cents").reset_index(drop=True))
        vals = g["cents"].to_numpy(np.int64)
        cnts = g["n"].to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])
        bins = (vals - lo) // width
        bdf = (pd.DataFrame({"b": bins, "n": cnts})
               .groupby("b", as_index=False)["n"].sum())
        bb = bdf["b"].to_numpy(np.int64)
        bn = bdf["n"].to_numpy(np.int64)
        bcum = bn.cumsum()
        rows = []
        for qpm in (500, 900, 990):
            rank = -(-qpm * n // 1000)  # ceil(q*N)
            exact = int(vals[np.searchsorted(cum, rank)])
            i = int(np.searchsorted(bcum, rank))
            below = int(bcum[i - 1]) if i else 0
            blo = lo + int(bb[i]) * width
            est = blo + width * (rank - below) // int(bn[i])
            rows.append((qpm, exact, est,
                         1_000_000 * abs(est - exact) // exact))
        return pd.DataFrame(rows, columns=[
            "q_permille", "exact_cents", "sketch_cents",
            "err_ppm"]).astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


SKETCH_AUDIT_SQL = """
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
           FROM orders),
rng AS (SELECT min(v) AS lo, max(v) AS hi,
               CAST(count(*) AS BIGINT) AS n FROM c),
w AS (SELECT greatest((hi - lo + %d) // %d, 1) AS width FROM rng),
q AS (SELECT unnest([500, 900, 990]) AS qpm),
rk AS (SELECT qpm, (qpm * rng.n + 999) // 1000 AS rank
       FROM q, rng),
ex AS (
  SELECT rk.qpm, min(t.v) AS exact_cents
  FROM rk JOIN (SELECT v, sum(1) OVER (ORDER BY v) AS cum
                FROM c) t ON t.cum >= rk.rank
  GROUP BY 1),
bh AS (SELECT (v - rng.lo) // w.width AS b,
              CAST(count(*) AS BIGINT) AS n
       FROM c, rng, w GROUP BY 1),
bc AS (SELECT b, n, sum(n) OVER (ORDER BY b) AS cum,
              coalesce(sum(n) OVER (ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS below
       FROM bh),
est AS (
  SELECT rk.qpm,
         min(rng.lo + bc.b * w.width
             + w.width * (rk.rank - bc.below) // bc.n)
           AS sketch_cents
  FROM rk, rng, w, bc
  WHERE bc.cum >= rk.rank AND bc.below < rk.rank
  GROUP BY 1)
SELECT ex.qpm AS q_permille, ex.exact_cents,
       CAST(est.sketch_cents AS BIGINT) AS sketch_cents,
       CAST(1000000 * abs(est.sketch_cents - ex.exact_cents)
            // ex.exact_cents AS BIGINT) AS err_ppm
FROM ex JOIN est ON est.qpm = ex.qpm
ORDER BY 1
""" % (SKETCH_BINS, SKETCH_BINS)


TS_GRID_SHIFT = 20  # Theil-Sen slopes on the 2^-20 grid


def orders_theil_sen_trend(sf_dir):
    """Theil-Sen robust trend of daily revenue (Theil '50 / Sen '68)
    — the median of all C(D,2) pairwise slopes, the trend estimate a
    single outlier day cannot move (the robust companion to
    events_value_trend's OLS and the CUSUM detector). Slopes are
    ratios, so the statistic is DEFINED on the 2⁻²⁰ grid with the
    sign peeled before flooring (sign·((|Δc| << 20) // Δd) —
    toward-zero in both engines; Python floors negatives where DuckDB
    truncates, the repo's recorded division hazard), and the median
    is the exact rank-(M+1)//2 order statistic of the grid values.

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner — zero shuffle; the single merge densifies the calendar
    and builds all pairwise slopes vectorized (D² int64 for this
    corpus' ~6½ years ≈ 46 MB — past ~10⁴ days switch to the
    two-pass radix selection over the slope grid)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        d = len(x)
        i, j = np.triu_indices(d, k=1)
        dc = x[j] - x[i]
        dd = (j - i).astype(np.int64)
        key = np.sign(dc) * ((np.abs(dc) << TS_GRID_SHIFT) // dd)
        key.sort()
        m = len(key)
        med = int(key[(m + 1) // 2 - 1])
        return pd.DataFrame({
            "n_days": pd.Series([d], dtype="int64"),
            "n_pairs": pd.Series([m], dtype="int64"),
            "slope_q20": pd.Series([med], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


THEIL_SEN_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
p AS (
  SELECT CASE WHEN b.c - a.c >= 0 THEN 1 ELSE -1 END
           * ((abs(b.c - a.c) * %d) // (b.d - a.d)) AS key
  FROM x a JOIN x b ON b.d > a.d),
r AS (SELECT key, row_number() OVER (ORDER BY key) AS rn,
             count(*) OVER () AS m
      FROM p)
SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_days,
       CAST(m AS BIGINT) AS n_pairs,
       CAST(key AS BIGINT) AS slope_q20
FROM r WHERE rn = (m + 1) // 2
""" % (1 << TS_GRID_SHIFT)


def orders_fulfillment_leadtime(sf_dir):
    """Order-to-first-ship lead time per priority — the fulfillment
    SLA report (does URGENT actually ship faster?): per order, lead =
    first shipdate − order date in days; per priority, the order
    count, EXACT median and p90 lead (rank (n+1)//2 and ⌈0.9·n⌉ order
    statistics read off the bounded day histogram — lead times live
    on a ~hundreds-of-days domain, so no radix pass is needed) and
    the max. Orders with no lineitems are out of scope by definition
    (nothing shipped), stated not hidden.

    Scale shape: both sides ride ONE orderkey-bucketed exchange —
    lineitem batches pre-combine to (okey → min ship day) partials
    (min is idempotent, the lossless combiner), orders rows carry
    (okey, order day, priority); an order finalizes in exactly one
    bucket, so each bucket joins locally and emits additive
    (priority, lead_days) cells; single bounded merge."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def prep_li(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = (pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                           "ship": d})
             .groupby("okey", as_index=False)["ship"].min())
        p["oday"] = np.int64(-1)
        p["pri"] = ""
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p[["okey", "ship", "oday", "pri", "_bucket"]].astype(
            {"okey": "int64", "ship": "int64", "oday": "int64",
             "_bucket": "int32"})

    def prep_od(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["o_orderkey"].to_numpy(),
                          "ship": np.int64(-1), "oday": d,
                          "pri": t["o_orderpriority"].to_pylist()})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "ship": "int64",
                         "oday": "int64", "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        ship = (g[g["ship"] >= 0]
                .groupby("okey", as_index=False)["ship"].min())
        orders = g[g["oday"] >= 0][["okey", "oday", "pri"]]
        j = orders.merge(ship, on="okey")
        if not len(j):
            return pd.DataFrame({"pri": pd.Series([], dtype=object),
                                 "lead": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        j["lead"] = j["ship"] - j["oday"]
        out = (j.groupby(["pri", "lead"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype({"lead": "int64", "n": "int64"})

    per_bucket = (li.map_batches(prep_li, batch_format="pyarrow")
                  .union(od.map_batches(prep_od,
                                        batch_format="pyarrow"))
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cells = df.groupby(["pri", "lead"], as_index=False)["n"].sum()
        rows = []
        for pri, g in cells.groupby("pri"):
            g = g.sort_values("lead")
            leads = g["lead"].to_numpy(np.int64)
            ns = g["n"].to_numpy(np.int64)
            cum = ns.cumsum()
            n = int(cum[-1])
            med = int(leads[np.searchsorted(cum, (n + 1) // 2)])
            # ceil(0.9n) written POSITIVELY: -(-9n//10) floors in
            # Python but truncates in DuckDB once negated
            p90 = int(leads[np.searchsorted(cum, (9 * n + 9) // 10)])
            rows.append((pri, n, med, p90, int(leads[-1])))
        return (pd.DataFrame(rows, columns=[
            "priority", "n_orders", "median_days", "p90_days",
            "max_days"]).sort_values("priority")
            .reset_index(drop=True)
            .astype({"n_orders": "int64", "median_days": "int64",
                     "p90_days": "int64", "max_days": "int64"}))

    return _merge_partials(per_bucket, merge)


LEADTIME_SQL = """
WITH s AS (
  SELECT l_orderkey AS okey,
         CAST(min(epoch_us(l_shipdate)) // 86400000000 AS BIGINT)
           AS ship
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o.o_orderpriority AS priority,
         s.ship - CAST(epoch_us(o.o_orderdate) // 86400000000
                       AS BIGINT) AS lead
  FROM orders o JOIN s ON s.okey = o.o_orderkey),
c AS (SELECT priority, lead, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY 1, 2),
w AS (SELECT priority, lead, n,
             sum(n) OVER (PARTITION BY priority ORDER BY lead)
               AS cum,
             sum(n) OVER (PARTITION BY priority) AS tot,
             max(lead) OVER (PARTITION BY priority) AS mx
      FROM c)
SELECT priority,
       CAST(max(tot) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN cum >= (tot + 1) // 2
                     THEN lead END) AS BIGINT) AS median_days,
       CAST(min(CASE WHEN cum >= (9 * tot + 9) // 10
                     THEN lead END) AS BIGINT) AS p90_days,
       CAST(max(mx) AS BIGINT) AS max_days
FROM w GROUP BY 1 ORDER BY 1
"""


LDIV_L = 3  # required distinct sensitive values per QI group


def doc_l_diversity(sf_dir):
    """l-diversity audit (Machanavajjhala '07) — the governance screen
    k-anonymity misses: a group can be large yet leak its SENSITIVE
    attribute if every member shares it (the homogeneity attack).
    QI = (source, length band), sensitive = lang; a group is safe iff
    it contains ≥ l distinct langs. Reports the census (groups,
    below-l groups, rows at risk, minimum diversity) plus the
    diversity histogram n_groups per distinct-lang count — the figure
    a privacy review plots.

    Scale shape: the (QI, lang) space is bounded (sources × bands ×
    5 langs), so per-batch count partials are a lossless combiner —
    zero shuffle; distinct-lang counts per QI finalize in the one
    merge block. Unbounded QIs ride one QI-bucketed exchange, the
    doc_k_anonymity contract."""
    ds = _read(sf_dir, "documents",
               columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t["source"].to_pandas().astype(object),
            "band": t["n_chars"].to_numpy() // KANON_BAND,
            "lang": t["lang"].to_pandas().astype(object)})
        out = (df.groupby(["source", "band", "lang"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return out.astype({"band": "int64", "n": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "band", "lang"], as_index=False)
             ["n"].sum())
        per_qi = (g.groupby(["source", "band"])
                  .agg(div=("lang", "nunique"), rows=("n", "sum")))
        low = per_qi[per_qi["div"] < LDIV_L]
        return pd.DataFrame({
            "n_groups": pd.Series([len(per_qi)], dtype="int64"),
            "low_div_groups": pd.Series([len(low)], dtype="int64"),
            "rows_at_risk": pd.Series([int(low["rows"].sum())],
                                      dtype="int64"),
            "min_diversity": pd.Series([int(per_qi["div"].min())],
                                       dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


L_DIVERSITY_SQL = """
WITH g AS (
  SELECT source, n_chars // %d AS band,
         CAST(count(DISTINCT lang) AS BIGINT) AS div,
         CAST(count(*) AS BIGINT) AS rows_
  FROM documents GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN div < %d THEN 1 ELSE 0 END) AS BIGINT)
         AS low_div_groups,
       CAST(coalesce(sum(CASE WHEN div < %d THEN rows_ END), 0)
            AS BIGINT) AS rows_at_risk,
       CAST(min(div) AS BIGINT) AS min_diversity
FROM g
""" % (KANON_BAND, LDIV_L, LDIV_L)


def orders_dow_anova(sf_dir):
    """One-way ANOVA effect size (η²) of weekday on order value —
    does the calendar EXPLAIN revenue variance, or merely wiggle it?
    η² = SS_between/SS_total, kept cross-engine exact by the
    declared per-term floor: num = Σ_d (N·S_d² // n_d) − S²,
    den = N·Σx² − S², η²_permille = 1000·num // den (sum-of-floors
    is the defined statistic — the events_chi2_independence
    discipline). The inferential companion to
    orders_dow_seasonality's descriptive index: a big index with
    η² ≈ 0 means the weekday 'pattern' is noise.

    Scale shape: bounded 7-cell (dow → n, Σx, Σx²) moment combiner —
    zero shuffle; Python-int merge (N·S_d² reaches ~10²⁷ at sf0.01),
    HUGEINT oracle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        s2 = cents * cents  # ≤ 3.6·10¹⁵ per row — fits int64
        # Σs2 per batch does NOT safely fit int64 (overflows past
        # ~2500 max-price rows), so the partial carries it split into
        # 26-bit-shifted halves whose per-batch sums stay bounded
        out = (pd.DataFrame({"dow": days % 7, "n": 1, "s": cents,
                             "s2h": s2 >> 26,
                             "s2l": s2 & ((1 << 26) - 1)})
               .groupby("dow", as_index=False)
               .agg(n=("n", "sum"), s=("s", "sum"),
                    s2h=("s2h", "sum"), s2l=("s2l", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # fold partials in Python ints: Σx² crosses 9.2·10¹⁸ (int64
        # max) already at sf0.01, so a pandas int64 groupby-sum wraps
        # silently (caught by the oracle at sf0.01, green at sf0.001)
        acc: dict[int, list[int]] = {}
        for dow, n, s, s2h, s2l in df[
                ["dow", "n", "s", "s2h", "s2l"]].itertuples(
                index=False):
            a = acc.setdefault(int(dow), [0, 0, 0])
            a[0] += int(n)
            a[1] += int(s)
            a[2] += (int(s2h) << 26) + int(s2l)
        ns = [a[0] for a in acc.values()]
        ss = [a[1] for a in acc.values()]
        N = sum(ns)
        S = sum(ss)
        sx2 = sum(a[2] for a in acc.values())
        num = sum(N * s * s // n for n, s in zip(ns, ss)) - S * S
        den = N * sx2 - S * S
        return pd.DataFrame({
            "n_orders": pd.Series([N], dtype="int64"),
            "eta2_permille": pd.Series([1000 * num // max(den, 1)],
                                       dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


DOW_ANOVA_SQL = """
WITH d AS (
  SELECT (CAST(epoch_us(o_orderdate) AS BIGINT)
          // 86400000000) % 7 AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
g AS (SELECT dow, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS s2
      FROM d GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
               CAST(sum(s) AS HUGEINT) AS st,
               CAST(sum(s2) AS HUGEINT) AS sx2 FROM g),
f AS (SELECT (SELECT sum(tot.nt * g.s * g.s // g.n)
              FROM g, tot) - tot.st * tot.st AS num,
             tot.nt * tot.sx2 - tot.st * tot.st AS den,
             tot.nt AS nt
      FROM tot)
SELECT CAST(nt AS BIGINT) AS n_orders,
       CAST(1000 * num // greatest(den, 1) AS BIGINT)
         AS eta2_permille
FROM f
"""


def orders_runs_test(sf_dir):
    """Wald-Wolfowitz runs test on daily revenue — the randomness
    audit that catches serial dependence a mean/variance summary
    hides (too FEW runs = trending/sticky days, too MANY =
    oscillation): days sign as above/below the exact daily-revenue
    median (equal-to-median days drop, the textbook rule), R = runs
    counted over the DENSE calendar, and the z² statistic kept
    integer by cross-multiplication: with e = R·n − (n + 2·n₊·n₋),
    z²_milli = 1000·e²·(n−1) // (2·n₊·n₋·(2·n₊·n₋ − n)) — no float
    mean/variance of R ever exists. The randomness sibling of
    orders_daily_acf1 (ACF measures linear lag-1; runs catch any
    sign-level stickiness).

    Scale shape: the (day, cents) table is a bounded-domain per-batch
    combiner — zero shuffle; the single merge densifies, takes the
    exact median by full sort of the ≤calendar-size daily array, and
    counts runs vectorized; Python-int statistic (e²·n outgrows int64
    past ~10⁶ days)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        s = np.sort(x)
        med = int(s[(len(s) + 1) // 2 - 1])  # lower median, exact
        signs = x[x != med] > med
        npos = int(signs.sum())
        nneg = len(signs) - npos
        n = npos + nneg
        runs = 1 + int((signs[1:] != signs[:-1]).sum()) if n else 0
        e = runs * n - (n + 2 * npos * nneg)
        den = 2 * npos * nneg * (2 * npos * nneg - n)
        z2 = 1000 * e * e * (n - 1) // max(den, 1)
        return pd.DataFrame({
            "n_days_used": pd.Series([n], dtype="int64"),
            "n_runs": pd.Series([runs], dtype="int64"),
            "n_pos": pd.Series([npos], dtype="int64"),
            "n_neg": pd.Series([nneg], dtype="int64"),
            "z2_milli": pd.Series([z2], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


RUNS_TEST_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
med AS (
  SELECT c AS m FROM
    (SELECT c, row_number() OVER (ORDER BY c) AS rn,
            count(*) OVER () AS n FROM x)
  WHERE rn = (n + 1) // 2),
s AS (SELECT d, CASE WHEN c > med.m THEN 1 ELSE 0 END AS sgn
      FROM x, med WHERE c <> med.m),
r AS (SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev FROM s),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sgn) AS BIGINT) AS npos,
         CAST(sum(CASE WHEN prev IS NULL OR sgn <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM r),
f AS (SELECT n, runs, npos, n - npos AS nneg,
             CAST(runs AS HUGEINT) * n
               - (n + 2 * CAST(npos AS HUGEINT) * (n - npos)) AS e,
             2 * CAST(npos AS HUGEINT) * (n - npos)
               * (2 * CAST(npos AS HUGEINT) * (n - npos) - n)
               AS den
      FROM agg)
SELECT n AS n_days_used, runs AS n_runs, npos AS n_pos,
       CAST(nneg AS BIGINT) AS n_neg,
       CAST(1000 * e * e * (n - 1) // greatest(den, 1) AS BIGINT)
         AS z2_milli
FROM f
"""


POWER_Z_SUM_MILLI = 2802  # z_{alpha/2}=1.960 + z_{beta}=0.842 (80% @ 5%)
POWER_MDE_PCT = 5         # detect a 5% lift


def events_power_analysis(sf_dir):
    """Experiment power analysis — the 'how long must this test run'
    number every platform computes before launch: required sample
    size per arm n = 2·(z_{α/2}+z_β)²·σ²/δ² for 80% power at 5%
    significance against a 5%-of-mean MDE, every term on a declared
    integer grid (z-sum 2802 milli; σ² = floor(10⁶·(N·Σx²−S²)/N²)
    milli²; δ = mean_milli // 20; ceil division for n). Closes the
    experimentation family: SRM gates validity, CUPED buys variance,
    this prices the runtime.

    Scale shape: one bounded three-moment combiner (n, Σx, Σx²) with
    the Σx² int64-split of orders_dow_anova — zero shuffle,
    Python-int merge, HUGEINT oracle."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        v = pc.cast(pc.round(t["value"],
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
        v2 = v * v
        return pd.DataFrame({
            "n": [len(v)], "s": [int(v.sum())],
            "s2h": [int((v2 >> 26).sum())],
            "s2l": [int((v2 & ((1 << 26) - 1)).sum())]}
            ).astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        s = int(df["s"].sum())
        s2 = (int(df["s2h"].sum()) << 26) + int(df["s2l"].sum())
        mean_milli = 1000 * s // n
        var_milli2 = 1_000_000 * (n * s2 - s * s) // (n * n)
        delta_milli = mean_milli // (100 // POWER_MDE_PCT)
        num = 2 * POWER_Z_SUM_MILLI * POWER_Z_SUM_MILLI * var_milli2
        den = max(1_000_000 * delta_milli * delta_milli, 1)
        # ceil written POSITIVELY: -(-a//b) floors in Python but
        # truncates in DuckDB (the recorded division hazard)
        n_req = (num + den - 1) // den
        return pd.DataFrame({
            "n_events": pd.Series([n], dtype="int64"),
            "mean_milli": pd.Series([mean_milli], dtype="int64"),
            "var_milli2": pd.Series([var_milli2], dtype="int64"),
            "delta_milli": pd.Series([delta_milli], dtype="int64"),
            "n_required_per_arm": pd.Series([n_req], dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


POWER_SQL = """
WITH v AS (SELECT CAST(round(value) AS BIGINT) AS x FROM events),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS s2
      FROM v),
m AS (SELECT n, 1000 * s // n AS mean_milli,
             1000000 * (n * s2 - s * s) // (n * n) AS var_milli2
      FROM s),
f AS (SELECT n, mean_milli, var_milli2,
             mean_milli // %d AS delta_milli
      FROM m)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(mean_milli AS BIGINT) AS mean_milli,
       CAST(var_milli2 AS BIGINT) AS var_milli2,
       CAST(delta_milli AS BIGINT) AS delta_milli,
       CAST((2 * %d * %d * var_milli2
             + greatest(1000000 * delta_milli * delta_milli, 1) - 1)
            // greatest(1000000 * delta_milli * delta_milli, 1)
            AS BIGINT) AS n_required_per_arm
FROM f
""" % (100 // POWER_MDE_PCT, POWER_Z_SUM_MILLI, POWER_Z_SUM_MILLI)


BOT_CV2_FLAG_MILLI = 200  # CV² below this = suspiciously regular


def user_bot_score_census(sf_dir):
    """Bot/automation detection census — the abuse-team heuristic
    that a HUMAN's inter-event gaps are bursty (exponential gaps have
    CV² = 1) while scripted traffic is metronomic (CV² → 0): per user
    with ≥2 gaps, CV² of second-grid gaps as the exact integer
    cv2_milli = 1000·(k·Σg² − S²) // S², flagged below 200‰, and the
    output is the ≤51-cell histogram of 100‰ CV² bands plus the flag
    count — the census a rate-limiting review reads, never a
    per-user dump.

    Scale shape: (user, ts) rides the user_interarrival_histogram
    exchange; each bucket sorts within user, diffs, and reduces its
    users vectorized to bounded band cells (a user lives in one
    bucket, so cells are additive); single merge. Σg² fits int64 to
    ~10⁶ month-scale gaps per user."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same] // 1_000_000
        gu = u[1:][same]
        df = pd.DataFrame({"u": gu, "g": gaps, "g2": gaps * gaps})
        agg = (df.groupby("u")
               .agg(k=("g", "size"), s=("g", "sum"),
                    s2=("g2", "sum")))
        agg = agg[(agg["k"] >= 2) & (agg["s"] > 0)]
        k = agg["k"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        s2 = agg["s2"].to_numpy(np.int64)
        cv2 = 1000 * (k * s2 - s * s) // (s * s)
        band = np.minimum(cv2 // 100, 50)
        out = (pd.DataFrame({"band": band,
                             "flag": (cv2 < BOT_CV2_FLAG_MILLI)
                             .astype(np.int64)})
               .groupby("band", as_index=False)
               .agg(n_users=("band", "size"),
                    n_flagged=("flag", "sum")))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("band", as_index=False)
               .agg(n_users=("n_users", "sum"),
                    n_flagged=("n_flagged", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


BOT_CENSUS_SQL = """
WITH e AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts
  FROM events),
g AS (
  SELECT u, (ts - lag(ts) OVER (PARTITION BY u ORDER BY ts))
            // 1000000 AS gap
  FROM e),
a AS (
  SELECT u, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(gap) AS BIGINT) AS s,
         CAST(sum(gap * gap) AS BIGINT) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY 1),
c AS (
  SELECT least(CAST(1000 * (k * s2 - s * s) // (s * s) AS BIGINT)
               // 100, 50) AS band,
         CASE WHEN 1000 * (k * s2 - s * s) // (s * s) < %d
              THEN 1 ELSE 0 END AS flag
  FROM a WHERE k >= 2 AND s > 0)
SELECT band, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(flag) AS BIGINT) AS n_flagged
FROM c GROUP BY 1 ORDER BY 1
""" % BOT_CV2_FLAG_MILLI


def brand_share_shift(sf_dir):
    """Brand share-shift report — the BI staple behind every 'who is
    winning the category' review: per brand, revenue share (permille)
    in the first vs second half of the shipdate range and the signed
    shift, computed on exact cents so ranking and signs replay
    bit-for-bit. The drift detector's per-dimension sibling:
    orders_price_drift says THAT the distribution moved; this says
    WHO gained.

    Scale shape: the part→brand map is the small dimension —
    materialized once and broadcast (the PIT-join discipline);
    lineitem then reduces map-side to bounded (brand, half) cent
    cells (≤ 25×2), zero shuffle, one merge block of permille
    arithmetic."""
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    brand_map = dict(zip(part["p_partkey"].astype(int),
                         part["p_brand"]))
    lookup = ray.put(brand_map)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice"])

    def day_range(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": pd.Series([int(d.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(d.max())],
                                             dtype="int64")})

    r = ds.map_batches(day_range, batch_format="pyarrow").to_pandas()
    mid = (int(r["lo"].min()) + int(r["hi"].max())) // 2

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        bm = _ray.get(lookup)
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        brands = [bm[int(k)] for k in t["l_partkey"].to_pylist()]
        out = (pd.DataFrame({"brand": brands,
                             "h": (d > mid).astype(np.int64),
                             "cents": cents})
               .groupby(["brand", "h"], as_index=False)["cents"]
               .sum())
        return out.astype({"h": "int64", "cents": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["brand", "h"])["cents"].sum()
        tot = {0: int(g.xs(0, level="h").sum()),
               1: int(g.xs(1, level="h").sum())}
        rows = []
        for brand in sorted({k[0] for k in g.index}):
            b0 = int(g.get((brand, 0), 0))
            b1 = int(g.get((brand, 1), 0))
            s0 = 1000 * b0 // max(tot[0], 1)
            s1 = 1000 * b1 // max(tot[1], 1)
            rows.append((brand, s0, s1, s1 - s0))
        return pd.DataFrame(rows, columns=[
            "brand", "share_before_permille", "share_after_permille",
            "shift_permille"]).astype(
            {"share_before_permille": "int64",
             "share_after_permille": "int64",
             "shift_permille": "int64"})

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


BRAND_SHIFT_SQL = """
WITH rng AS (
  SELECT (min(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000)
          + max(CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000))
         // 2 AS mid
  FROM lineitem),
b AS (
  SELECT p.p_brand AS brand,
         CASE WHEN CAST(epoch_us(l.l_shipdate) AS BIGINT)
                   // 86400000000 > rng.mid THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey, rng
  GROUP BY 1, 2),
tot AS (SELECT h, CAST(sum(cents) AS BIGINT) AS t FROM b GROUP BY 1),
w AS (
  SELECT br.brand,
         CAST(1000 * coalesce(b0.cents, 0)
              // greatest(t0.t, 1) AS BIGINT) AS s0,
         CAST(1000 * coalesce(b1.cents, 0)
              // greatest(t1.t, 1) AS BIGINT) AS s1
  FROM (SELECT DISTINCT brand FROM b) br
  LEFT JOIN b b0 ON b0.brand = br.brand AND b0.h = 0
  LEFT JOIN b b1 ON b1.brand = br.brand AND b1.h = 1
  CROSS JOIN (SELECT t FROM tot WHERE h = 0) t0
  CROSS JOIN (SELECT t FROM tot WHERE h = 1) t1)
SELECT brand, s0 AS share_before_permille,
       s1 AS share_after_permille,
       CAST(s1 - s0 AS BIGINT) AS shift_permille
FROM w ORDER BY brand
"""


def lang_tokenizer_fertility(sf_dir):
    """Tokenizer fertility per language — the LLM-pipeline statistic
    (tokens emitted per whitespace word) that decides whether a
    tokenizer taxes some languages more than others (the compression
    disparity every multilingual training report tables): the
    distributed-BPE tokenizer trains once on the corpus (bounded
    word-count exchange, the doc_bpe_tokens machinery), and fertility
    = 1000·Σ bpe_tokens // Σ words per lang, exact on the permille
    grid. The SQL oracle replays BPE training AND encoding through
    the unrolled-CTE oracle and aggregates the same ratio.

    Scale shape: merges broadcast once; the scoring pass is a
    per-actor-cached zero-shuffle encode that reduces map-side to
    bounded (lang → words, tokens) cells — text never leaves the map
    task; single merge block."""
    import ray

    from ..stages import bpe as bpestage

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"])
    merges = bpestage.train_bpe(docs, BPE_MERGES)
    ref = ray.put(merges)

    class Fertility:
        def __init__(self):
            self.merges = ray.get(ref)
            self._cache: dict = {}

        def _n(self, w: str) -> int:
            n = self._cache.get(w)
            if n is None:
                n = len(bpestage.apply_merges(w, self.merges))
                self._cache[w] = n
            return n

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cells: dict = {}
            for lang, text in zip(t["lang"].to_pylist(),
                                  t["text"].to_pylist()):
                words = bpestage._WORD_RE.findall(text or "")
                a = cells.setdefault(lang, [0, 0])
                a[0] += len(words)
                a[1] += sum(self._n(w) for w in words)
            return pd.DataFrame(
                [(k, v[0], v[1]) for k, v in cells.items()],
                columns=["lang", "w", "t"]).astype({"w": "int64",
                                                    "t": "int64"})

    per_batch = docs.map_batches(
        Fertility, batch_format="pyarrow",
        concurrency=bpestage._pool_size())

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("lang", as_index=False)
             .agg(n_words=("w", "sum"), n_bpe_tokens=("t", "sum"))
             .sort_values("lang").reset_index(drop=True))
        g["fertility_milli"] = (1000 * g["n_bpe_tokens"]
                                // g["n_words"].clip(lower=1))
        return g.astype({"n_words": "int64", "n_bpe_tokens": "int64",
                         "fertility_milli": "int64"})

    return _merge_partials(per_batch, merge)


FERTILITY_SQL = """
SELECT d.lang,
       CAST(sum(len(regexp_extract_all(d.text, '\\S+')))
            AS BIGINT) AS n_words,
       CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(1000 * sum(b.n_bpe_tokens)
            // greatest(sum(len(regexp_extract_all(d.text,
                                                   '\\S+'))), 1)
            AS BIGINT) AS fertility_milli
FROM documents d JOIN (%s) b ON b.doc_id = d.doc_id
GROUP BY 1 ORDER BY 1
""" % DOC_BPE_SQL


def orders_stl_strength(sf_dir):
    """Seasonality-strength decomposition (the STL-shaped measure
    Hyndman-Athanasopoulos ch. 3 popularized: F_s = 1 −
    Var(remainder)/Var(detrended)) of daily revenue — the one number
    that says whether the weekly pattern is STRUCTURE or noise,
    capping the time-series family (trend slope → CUSUM → ACF → runs
    → this). Every step is a declared integer grid: trend = the
    7-day centered moving average floored (edges dropped), seasonal
    s_w = the per-weekday mean of the detrended series with the SIGN
    PEELED before flooring (detrended values go negative — Python
    floors, DuckDB truncates, the recorded hazard), remainder =
    detrended − s_w, and F_s in permille from the two integer
    variance forms (n·Σe²−(Σe)² over n·Σr²−(Σr)²), clipped at 0.
    Also reports the seasonal amplitude max(s_w) − min(s_w) in cents.

    Scale shape: the bounded (day, cents) combiner — zero shuffle;
    the single merge densifies and runs the decomposition vectorized
    over the ≤calendar-size array; Python-int variances (Σe²
    outgrows int64 past ~10⁵ high-revenue days)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["o_orderdate"].to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        out = (pd.DataFrame({"d": days, "cents": cents})
               .groupby("d", as_index=False)["cents"].sum())
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", as_index=False)["cents"].sum()
        lo, hi = int(g["d"].min()), int(g["d"].max())
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["d"].to_numpy(np.int64) - lo] = \
            g["cents"].to_numpy(np.int64)
        if len(x) < 8:
            return pd.DataFrame({"n_days_used": [0],
                                 "strength_permille": [0],
                                 "seasonal_amplitude_cents": [0]}
                                ).astype("int64")
        k = np.ones(7, np.int64)
        trend = np.convolve(x, k, mode="valid") // 7  # x>=0: floor ok
        days = np.arange(lo + 3, hi - 2, dtype=np.int64)
        r = x[3:-3] - trend
        dows = days % 7
        s = {}
        for w in range(7):
            vals = r[dows == w]
            tot = int(vals.sum())
            n = len(vals)
            if n:
                sgn = 1 if tot >= 0 else -1
                s[w] = sgn * (abs(tot) // n)  # toward-zero, declared
            else:
                s[w] = 0
        e = r - np.asarray([s[int(w)] for w in dows], np.int64)
        n = len(r)
        sr = [int(v) for v in r]
        se = [int(v) for v in e]
        vr = n * sum(v * v for v in sr) - sum(sr) ** 2
        ve = n * sum(v * v for v in se) - sum(se) ** 2
        strength = max(0, 1000 - 1000 * ve // max(vr, 1))
        amp = max(s.values()) - min(s.values())
        return pd.DataFrame({
            "n_days_used": pd.Series([n], dtype="int64"),
            "strength_permille": pd.Series([strength], dtype="int64"),
            "seasonal_amplitude_cents": pd.Series([amp],
                                                  dtype="int64")})

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


STL_STRENGTH_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series((SELECT min(d) FROM d),
                                (SELECT max(d) FROM d))) AS d),
x AS (SELECT cal.d, coalesce(dd.c, 0) AS c
      FROM cal LEFT JOIN d dd ON dd.d = cal.d),
w AS (SELECT d, c,
             sum(c) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS k7
      FROM x),
r AS (SELECT d, d % 7 AS dow, c - s7 // 7 AS r
      FROM w WHERE k7 = 7),
s AS (SELECT dow,
             CASE WHEN sum(r) >= 0
                  THEN sum(r) // count(*)
                  ELSE -((-sum(r)) // count(*)) END AS sw
      FROM r GROUP BY 1),
e AS (SELECT r.r, r.r - s.sw AS e
      FROM r JOIN s ON s.dow = r.dow),
agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(r) AS HUGEINT) AS sr,
               CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sr2,
               CAST(sum(e) AS HUGEINT) AS se,
               CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS se2
        FROM e),
f AS (SELECT n, n * sr2 - sr * sr AS vr,
             n * se2 - se * se AS ve
      FROM agg)
SELECT CAST(n AS BIGINT) AS n_days_used,
       CAST(greatest(0, 1000 - 1000 * ve // greatest(vr, 1))
            AS BIGINT) AS strength_permille,
       CAST((SELECT max(sw) - min(sw) FROM s) AS BIGINT)
         AS seasonal_amplitude_cents
FROM f
"""


def kg_component_census(sf_dir):
    """Connectivity-health dashboard of the co-citation graph — the
    two numbers a web-graph report leads with: the GIANT-COMPONENT
    share (what fraction of total degree mass the largest connected
    component holds — the Broder-bowtie headline) and the
    fragmentation HHI of per-component degree mass (10⁶·Σ(d_c)² //
    (2m)² ppm — 10⁶ = one monolithic component, →0 = dust), plus the
    component count. Degree mass rather than node count weights
    components by their actual linkage.

    Scale shape: CC labels come from the existing hash-to-min
    distributed machinery; degrees join onto labels via bucket_join
    over materialized inputs; per-component degree sums finalize in
    ONE label-bucketed exchange whose buckets emit bounded partials
    (Σ(d_c)², max d_c, count — each additive/max-combinable because a
    component lives in exactly one bucket); Python-int merge
    (Σ(d_c)² outgrows int64 immediately at web scale)."""
    from ..stages import graph
    from ..stages.canonicalize import connected_components_distributed
    from ..stages.joins import bucket_join

    pairs = graph.cocitation_pairs(_kg_edges(sf_dir)).materialize()

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"uri_a": t["a"], "uri_b": t["b"]})

    labels = connected_components_distributed(
        pairs.map_batches(as_edges, batch_format="pyarrow")) \
        .materialize()

    def flat_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.string()),
             t["b"].combine_chunks().cast(pa.string())])})

    deg = graph.degrees(pairs.map_batches(flat_nodes,
                                          batch_format="pyarrow"),
                        "node").materialize()
    j = bucket_join(deg, labels, left_on="node", right_on="node",
                    suffix="_l")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        p = (df.groupby("label", as_index=False)["deg"].sum())
        from ..stages.graph import _hash64
        p["_bucket"] = (_hash64(p["label"].astype(str))
                        % np.uint64(64)).astype("int32")
        return p

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("label")["deg"].sum()
        vals = [int(v) for v in c]
        return pd.DataFrame({
            "sumsq_h": [sum(v * v for v in vals) >> 62],
            "sumsq_l": [sum(v * v for v in vals) & ((1 << 62) - 1)],
            "mx": [max(vals)], "nc": [len(vals)],
            "total": [sum(vals)]}).astype("int64")

    per_bucket = (j.map_batches(prep, batch_format="pandas")
                  .groupby("_bucket")
                  .map_groups(bucket_stats, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        sumsq = sum((int(h) << 62) + int(l) for h, l in
                    zip(df["sumsq_h"], df["sumsq_l"]))
        mx = int(df["mx"].max())
        nc = int(df["nc"].sum())
        total = int(df["total"].sum())  # = 2m
        return pd.DataFrame({
            "n_components": pd.Series([nc], dtype="int64"),
            "giant_share_permille": pd.Series(
                [1000 * mx // max(total, 1)], dtype="int64"),
            "fragmentation_hhi_ppm": pd.Series(
                [1_000_000 * sumsq // max(total * total, 1)],
                dtype="int64")})

    return _merge_partials(per_bucket, merge)


KG_COMPONENT_CENSUS_SQL = f"""
WITH RECURSIVE edges AS ({_CITE_EDGES_SQL}),
pairs AS (SELECT DISTINCT e1.dst AS a, e2.dst AS b
          FROM edges e1 JOIN edges e2
            ON e1.src = e2.src AND e1.dst < e2.dst),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
nds AS (SELECT a AS node FROM sym UNION SELECT b FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nds
  UNION
  SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node),
cc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM pairs
        UNION ALL SELECT b FROM pairs)
  GROUP BY node),
comp AS (
  SELECT cc.component, CAST(sum(deg.d) AS HUGEINT) AS dc
  FROM cc JOIN deg ON deg.node = cc.node
  GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS nc,
               CAST(max(dc) AS HUGEINT) AS mx,
               CAST(sum(dc * dc) AS HUGEINT) AS sumsq,
               CAST(sum(dc) AS HUGEINT) AS total
        FROM comp)
SELECT nc AS n_components,
       CAST(1000 * mx // greatest(total, 1) AS BIGINT)
         AS giant_share_permille,
       CAST(1000000 * sumsq // greatest(total * total, 1) AS BIGINT)
         AS fragmentation_hhi_ppm
FROM agg
"""


def customer_purchase_dispersion(sf_dir):
    """Purchase-count dispersion — the model-selection audit run
    before fitting a buy-till-you-die CLV model (BG/NBD assumes
    per-customer Poisson purchasing with Gamma heterogeneity, i.e.
    OVER-dispersed counts): the orders-per-customer histogram plus
    the exact dispersion index D_milli = 1000·(n·Σk² − (Σk)²) //
    (n·Σk) (Poisson ⇒ 1000; >1000 ⇒ the Gamma mixing NBD needs;
    <1000 ⇒ regular buyers, use a different model). The
    customer-side sibling of events_fano_overdispersion.

    Scale shape: per-batch (custkey → count) partials ride ONE
    custkey-bucketed exchange; buckets emit the bounded count
    histogram plus three moment cells (additive — a customer
    finalizes in one bucket); Python-int merge."""
    buckets = _exchange_buckets(sf_dir, "orders")
    ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"c": t["o_custkey"].to_numpy(), "n": 1})
             .groupby("c", as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["c"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"c": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        k = g.groupby("c")["n"].sum().to_numpy(np.int64)
        hist = (pd.DataFrame({"k": k})
                .groupby("k", as_index=False).size()
                .rename(columns={"size": "n_customers"}))
        hist["s"] = hist["k"] * hist["n_customers"]
        hist["s2"] = hist["k"] * hist["k"] * hist["n_customers"]
        return hist.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.groupby("k", as_index=False)
             .agg(n_customers=("n_customers", "sum"),
                  s=("s", "sum"), s2=("s2", "sum"))
             .sort_values("k").reset_index(drop=True))
        n = int(h["n_customers"].sum())
        s = int(h["s"].sum())
        s2 = int(h["s2"].sum())
        d = 1000 * (n * s2 - s * s) // max(n * s, 1)
        out = h[["k", "n_customers"]].copy()
        out["dispersion_milli"] = d
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


PURCHASE_DISPERSION_SQL = """
WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
           FROM orders GROUP BY 1),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(k) AS HUGEINT) AS s,
             CAST(sum(k * k) AS HUGEINT) AS s2
      FROM c)
SELECT c.k, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(1000 * (m.n * m.s2 - m.s * m.s)
            // greatest(m.n * m.s, 1) AS BIGINT)
         AS dispersion_milli
FROM c, m GROUP BY 1, 3 ORDER BY 1
"""


MARKUP_BAND_PERMILLE = 100  # 10%-wide markup bands


def part_markup_census(sf_dir):
    """Markup-vs-list-price audit — the procurement screen for lines
    sold off list: per lineitem, unit price on the exact milli grid
    (1000·cents // qty) against the part's retail list price, markup
    = 1000·unit_milli // retail_milli banded in 10% cells (band =
    markup // 100, capped at 30) — the census that surfaces both
    systematic underpricing and the fat tail of list-busting lines.

    Scale shape: the part→retail map is the small dimension,
    broadcast once (the brand_share_shift discipline); everything
    else is a zero-shuffle bounded ≤31-cell band census."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_retailprice"]).to_pandas()
    retail_milli = pc.cast(
        pc.round(pc.multiply(pa.array(part["p_retailprice"],
                                      type=pa.float64()),
                             pa.scalar(1000.0)),
                 round_mode="half_towards_infinity"),
        pa.int64()).to_numpy()
    retail = {int(k): int(v)
              for k, v in zip(part["p_partkey"], retail_milli)}
    lookup = ray.put(retail)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        rp = _ray.get(lookup)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy()
        qty = pc.cast(pc.round(t["l_quantity"],
                               round_mode="half_towards_infinity"),
                      pa.int64()).to_numpy()
        unit_milli = 10 * cents // np.maximum(qty, 1)
        rr = np.asarray([rp[int(k)] for k in
                         t["l_partkey"].to_pylist()], np.int64)
        markup = 1000 * unit_milli // np.maximum(rr, 1)
        band = np.minimum(markup // MARKUP_BAND_PERMILLE, 30)
        out = (pd.DataFrame({"band": band})
               .groupby("band", as_index=False).size()
               .rename(columns={"size": "n_lines"}))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("band", as_index=False)["n_lines"].sum()
                .sort_values("band").reset_index(drop=True)
                .astype("int64"))

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


MARKUP_CENSUS_SQL = """
WITH l AS (
  SELECT 10 * CAST(round(l_extendedprice * 100) AS BIGINT)
           // greatest(CAST(round(l_quantity) AS BIGINT), 1)
           AS unit_milli,
         CAST(round(p.p_retailprice * 1000) AS BIGINT) AS retail
  FROM lineitem JOIN part p ON p.p_partkey = lineitem.l_partkey),
b AS (SELECT least(1000 * unit_milli // greatest(retail, 1)
                   // %d, 30) AS band
      FROM l)
SELECT band, CAST(count(*) AS BIGINT) AS n_lines
FROM b GROUP BY 1 ORDER BY 1
""" % MARKUP_BAND_PERMILLE


SLA_DAYS = 365          # a line is compliant if shipped within a year
SLA_BAND_PERMILLE = 100  # 10%-wide compliance bands


def supplier_sla_compliance(sf_dir):
    """Per-supplier ship-SLA compliance census — the vendor-scorecard
    question (which suppliers actually ship inside the contracted
    window?) answered as a census, never a per-supplier dump: each
    line's lead = ship day − order day, compliant iff ≤ 365 days,
    per-supplier compliance = 1000·n_ok // n floored, and the output
    is the supplier count per 10%-compliance band plus each band's
    total line volume (so a review sees whether the laggards are
    low-volume noise or real exposure).

    Scale shape: lines join their order date through ONE
    orderkey-bucketed exchange (orders side carries (okey, day),
    lineitem side (okey, suppkey, ship day) — an order finalizes in
    one bucket); per-supplier (n, n_ok) partials are additive ACROSS
    okey buckets (the dimension is the bounded supplier table), so
    the second exchange is unnecessary — buckets emit supplier cells
    and the single merge scores and bands."""
    buckets = _exchange_buckets(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def prep_li(t: pa.Table) -> pd.DataFrame:
        d = (t["l_shipdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["l_orderkey"].to_numpy(),
                          "supp": t["l_suppkey"].to_numpy(),
                          "ship": d, "oday": np.int64(-1)})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "supp": "int64",
                         "ship": "int64", "oday": "int64",
                         "_bucket": "int32"})

    def prep_od(t: pa.Table) -> pd.DataFrame:
        d = (t["o_orderdate"].to_numpy()
             .astype("datetime64[D]").astype(np.int64))
        p = pd.DataFrame({"okey": t["o_orderkey"].to_numpy(),
                          "supp": np.int64(-1),
                          "ship": np.int64(-1), "oday": d})
        h = pd.util.hash_pandas_object(p["okey"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"okey": "int64", "supp": "int64",
                         "ship": "int64", "oday": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["oday"] >= 0][["okey", "oday"]]
        lines = g[g["supp"] >= 0][["okey", "supp", "ship"]]
        j = lines.merge(orders, on="okey")
        if not len(j):
            return pd.DataFrame({"supp": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "n_ok": pd.Series([], dtype="int64")})
        ok = ((j["ship"] - j["oday"]) <= SLA_DAYS).astype(np.int64)
        out = (pd.DataFrame({"supp": j["supp"].to_numpy(), "n": 1,
                             "n_ok": ok})
               .groupby("supp", as_index=False)
               .agg(n=("n", "sum"), n_ok=("n_ok", "sum")))
        return out.astype("int64")

    per_bucket = (li.map_batches(prep_li, batch_format="pyarrow")
                  .union(od.map_batches(prep_od,
                                        batch_format="pyarrow"))
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.groupby("supp", as_index=False)
             .agg(n=("n", "sum"), n_ok=("n_ok", "sum")))
        comp = 1000 * s["n_ok"].to_numpy(np.int64) \
            // s["n"].to_numpy(np.int64)
        band = np.minimum(comp // SLA_BAND_PERMILLE, 10)
        out = (pd.DataFrame({"band": band,
                             "n_lines": s["n"].to_numpy(np.int64)})
               .groupby("band", as_index=False)
               .agg(n_suppliers=("band", "size"),
                    n_lines=("n_lines", "sum"))
               .sort_values("band").reset_index(drop=True))
        return out.astype("int64")

    return _merge_partials(per_bucket, merge)


SLA_COMPLIANCE_SQL = """
WITH j AS (
  SELECT l.l_suppkey AS supp,
         CASE WHEN CAST(epoch_us(l.l_shipdate) AS BIGINT)
                   // 86400000000
                 - CAST(epoch_us(o.o_orderdate) AS BIGINT)
                   // 86400000000 <= %d
              THEN 1 ELSE 0 END AS ok
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
s AS (SELECT supp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ok) AS BIGINT) AS n_ok
      FROM j GROUP BY 1),
b AS (SELECT least(1000 * n_ok // n // %d, 10) AS band, n FROM s)
SELECT band, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(n) AS BIGINT) AS n_lines
FROM b GROUP BY 1 ORDER BY 1
""" % (SLA_DAYS, SLA_BAND_PERMILLE)


def cm_error_audit(sf_dir):
    """Count-Min point-query error audit — the measurement that
    completes the sketch-audit family (bloom_fpr_audit for
    membership, orderkey_join_sample_estimate for sampling,
    orders_quantile_sketch_audit for quantiles, this for
    frequencies): every user's CM estimate (min over the 4 hash
    rows) against the true count, error = est − true (one-sided ≥ 0
    by construction — a NEGATIVE error anywhere means the sketch is
    broken), reported as the error histogram in absolute counts plus
    n_exact and the max overestimate. The 64-wide sketch is
    deliberately small so collisions bite at test scales — the ε
    tradeoff as data, the bloom_fpr discipline.

    Scale shape: pass 1 builds the bounded 4×64 cell table (fixed
    size at any input) and broadcasts it; pass 2 computes true
    per-user counts through ONE user-bucketed exchange and probes the
    broadcast sketch map-side of the merge, emitting bounded error
    cells (a user finalizes in one bucket)."""
    import ray

    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["user_id"].value_counts()
        rows, cols, cnts = [], [], []
        for u, n in vc.items():
            for r in range(CM_DEPTH):
                rows.append(r)
                cols.append(_cm_col(r, u))
                cnts.append(int(n))
        return (pd.DataFrame({"row_id": rows, "col_id": cols,
                              "cnt": cnts})
                .groupby(["row_id", "col_id"], as_index=False)
                ["cnt"].sum().astype("int64"))

    cells_df = (ds.map_batches(cell_partial, batch_format="pandas")
                .to_pandas()
                .groupby(["row_id", "col_id"])["cnt"].sum())
    cells = {(int(r), int(c)): int(v)
             for (r, c), v in cells_df.items()}
    ref = ray.put(cells)

    def prep(t: pa.Table) -> pd.DataFrame:
        p = (pd.DataFrame({"u": t["user_id"].to_numpy(), "n": 1})
             .groupby("u", as_index=False)["n"].sum())
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "n": "int64",
                         "_bucket": "int32"})

    def bucket_errors(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        cm = _ray.get(ref)
        per = g.groupby("u", as_index=False)["n"].sum()
        errs = []
        for u, true in per.itertuples(index=False):
            est = min(cm.get((r, _cm_col(r, int(u))), 0)
                      for r in range(CM_DEPTH))
            errs.append(int(est) - int(true))
        out = (pd.DataFrame({"err": errs})
               .groupby("err", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_errors, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.groupby("err", as_index=False)["n_users"].sum()
             .sort_values("err").reset_index(drop=True))
        return h.astype("int64")

    return _merge_partials(per_bucket, merge)


CM_ERROR_SQL = """
WITH cells AS (
  SELECT r.row_id,
         CAST(concat('0x', substr(md5(concat(r.row_id, ':',
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT)
           %% 64 AS col_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(0, %d)) AS row_id) r
  GROUP BY 1, 2),
truth AS (SELECT user_id AS u, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
est AS (
  SELECT t.u, t.n,
         min(c.cnt) AS est
  FROM truth t
  CROSS JOIN (SELECT unnest(generate_series(0, %d)) AS row_id) r
  JOIN cells c ON c.row_id = r.row_id
    AND c.col_id = CAST(concat('0x', substr(md5(concat(r.row_id,
          ':', CAST(t.u AS VARCHAR))), 1, 15)) AS BIGINT) %% 64
  GROUP BY 1, 2)
SELECT CAST(est - n AS BIGINT) AS err,
       CAST(count(*) AS BIGINT) AS n_users
FROM est GROUP BY 1 ORDER BY 1
""" % (CM_DEPTH - 1, CM_DEPTH - 1)


def orderkey_gap_audit(sf_dir):
    """Keyspace-fragmentation audit — the sequence-health check an
    ingest pipeline runs on a supposedly-dense surrogate key (gaps =
    lost batches, compaction debt, or deliberate sharded allocators):
    key count, span, missing-key count, the LARGEST gap and the gap
    COUNT, all without a global sort — the distributed max-gap
    decomposition: keys hash into fixed-width RANGE buckets
    (key // W), each bucket sorts locally and emits (min, max, n,
    max internal gap, internal gap count); the bounded merge splices
    consecutive buckets' boundary gaps (range bucketing makes bucket
    order == key order, the orders_zorder locality argument). The
    ordinal sibling of lineitem_sequence_audit's per-order taxonomy.

    Scale shape: one min/max pre-pass sizes W; ONE range-bucketed
    exchange of batch-local distinct keys; bounded per-bucket summary
    rows; single merge."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def rng(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy()
        return pd.DataFrame({"lo": pd.Series([int(k.min())],
                                             dtype="int64"),
                             "hi": pd.Series([int(k.max())],
                                             dtype="int64")})

    r = ds.map_batches(rng, batch_format="pyarrow").to_pandas()
    lo, hi = int(r["lo"].min()), int(r["hi"].max())
    width = max((hi - lo) // 64 + 1, 1)

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({"k": t["o_orderkey"].to_numpy()}) \
            .drop_duplicates()
        p["_bucket"] = ((p["k"] - lo) // width).astype("int32")
        return p.astype({"k": "int64", "_bucket": "int32"})

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(g["k"].drop_duplicates().to_numpy(np.int64))
        d = np.diff(k)
        return pd.DataFrame({
            "bmin": [int(k[0])], "bmax": [int(k[-1])],
            "n": [len(k)],
            "mx_gap": [int(d.max()) if len(d) else 0],
            "n_gaps": [int((d > 1).sum())]}).astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_summary, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values("bmin").reset_index(drop=True)
        n = int(s["n"].sum())
        mx = int(s["mx_gap"].max())
        ng = int(s["n_gaps"].sum())
        bmax = s["bmax"].to_numpy(np.int64)
        bmin = s["bmin"].to_numpy(np.int64)
        if len(s) > 1:
            bound = bmin[1:] - bmax[:-1]
            mx = max(mx, int(bound.max()))
            ng += int((bound > 1).sum())
        span = int(bmax[-1]) - int(bmin[0]) + 1
        return pd.DataFrame({
            "n_keys": pd.Series([n], dtype="int64"),
            "span": pd.Series([span], dtype="int64"),
            "n_missing": pd.Series([span - n], dtype="int64"),
            "max_gap": pd.Series([mx], dtype="int64"),
            "n_gaps": pd.Series([ng], dtype="int64")})

    return _merge_partials(per_bucket, merge)


ORDERKEY_GAP_SQL = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
d AS (SELECT k, k - lag(k) OVER (ORDER BY k) AS gap FROM k),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(max(k) - min(k) + 1 AS BIGINT) AS span,
               CAST(coalesce(max(gap), 0) AS BIGINT) AS mx,
               CAST(sum(CASE WHEN gap > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ng
        FROM d)
SELECT n AS n_keys, span,
       CAST(span - n AS BIGINT) AS n_missing,
       mx AS max_gap, ng AS n_gaps
FROM agg
"""


def events_stickiness_ratio(sf_dir):
    """DAU/WAU stickiness — the product-health headline (what share
    of the weekly audience shows up on a given day; ~1000 = a daily
    habit, ~143 = once-a-week usage): per day, the exact distinct
    daily actives, the exact trailing-7-day distinct actives, and
    1000·DAU // WAU, reported for every day with a full 7-day
    history. Distinct counts are not additive across days, so WAU is
    computed by the events_sliding_dau expansion: a user-day
    contributes to exactly 7 trailing windows — bounded 7×, dedup per
    (user, window) restores exactness.

    Scale shape: batch-local distinct (user, day) pairs ride ONE
    user-bucketed exchange; each bucket dedups exactly (a user lives
    in one bucket), emits (day, dau) partials and the 7-window
    expansion's (window, wau) partials — both additive across
    buckets; one bounded merge joins the two calendars."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "d": (t["ts"].to_numpy().astype("datetime64[us]")
                  .astype(np.int64) // 86_400_000_000)})
        p = p.drop_duplicates()
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "d": "int64",
                         "_bucket": "int32"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["u", "d"]].drop_duplicates()
        dau = (g.groupby("d", as_index=False).size()
               .rename(columns={"d": "day", "size": "n"}))
        dau["kind"] = 0
        u = np.repeat(g["u"].to_numpy(np.int64), 7)
        w = (np.repeat(g["d"].to_numpy(np.int64), 7)
             + np.tile(np.arange(7, dtype=np.int64), len(g)))
        wau = (pd.DataFrame({"u": u, "day": w}).drop_duplicates()
               .groupby("day", as_index=False).size()
               .rename(columns={"size": "n"}))
        wau["kind"] = 1
        out = pd.concat([dau[["day", "kind", "n"]],
                         wau[["day", "kind", "n"]]],
                        ignore_index=True)
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["day", "kind"], as_index=False)["n"].sum())
        dau = g[g["kind"] == 0].set_index("day")["n"]
        wau = g[g["kind"] == 1].set_index("day")["n"]
        lo = int(dau.index.min())
        rows = []
        for day in sorted(dau.index):
            if day < lo + 6:
                continue  # no full 7-day history
            d = int(dau[day])
            w = int(wau.get(day, 0))
            rows.append((int(day), d, w, 1000 * d // max(w, 1)))
        return pd.DataFrame(rows, columns=[
            "day", "dau", "wau", "stickiness_permille"]
            ).astype("int64")

    return _merge_partials(per_bucket, merge)


STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
  FROM events),
dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        FROM ud GROUP BY 1),
wexp AS (
  SELECT DISTINCT ud.u, ud.d + off.o AS day
  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)
    off),
wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
        FROM wexp GROUP BY 1),
lo AS (SELECT min(d) AS lo FROM ud)
SELECT dau.day, dau.dau, wau.wau,
       CAST(1000 * dau.dau // greatest(wau.wau, 1) AS BIGINT)
         AS stickiness_permille
FROM dau JOIN wau ON wau.day = dau.day, lo
WHERE dau.day >= lo.lo + 6
ORDER BY dau.day
"""


SLO_ERROR_BUDGET_PERMILLE = 10  # 99% success SLO


def events_slo_burn_rate(sf_dir):
    """SLO error-budget burn rate — the SRE alerting primitive
    (Google SRE workbook ch. 5): against a 99% success objective,
    each day's burn rate = (error share) / (budget share), exact as
    burn_milli = 1000·1000·n_err // (n·B) with B = 10‰ — 1000 means
    burning budget exactly at the sustainable rate, 14,000 is the
    classic page-now threshold. Reports every day plus the
    cumulative budget consumed month-to-date (window = the data's
    calendar), so both fast-burn and slow-burn alerts read off one
    table.

    Scale shape: bounded (day → n, n_err) count partials — lossless
    per-batch combiner, zero shuffle; the single merge computes
    rates and the running cumulative."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = (t["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        err = (pc.equal(t["event_type"], pa.scalar("error"))
               .to_numpy(zero_copy_only=False).astype(np.int64))
        out = (pd.DataFrame({"day": days, "n": 1, "n_err": err})
               .groupby("day", as_index=False)
               .agg(n=("n", "sum"), n_err=("n_err", "sum")))
        return out.astype("int64")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)
             .agg(n=("n", "sum"), n_err=("n_err", "sum"))
             .sort_values("day").reset_index(drop=True))
        b = SLO_ERROR_BUDGET_PERMILLE
        g["burn_milli"] = (1_000_000 * g["n_err"]
                           // (g["n"].clip(lower=1) * b))
        cum_err = g["n_err"].cumsum()
        cum_n = g["n"].cumsum()
        g["cum_budget_used_milli"] = (1_000_000 * cum_err
                                      // (cum_n.clip(lower=1) * b))
        return g.astype("int64")

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"), merge)


SLO_BURN_SQL = """
WITH d AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM events GROUP BY 1)
SELECT day, n, n_err,
       CAST(1000000 * n_err // (greatest(n, 1) * %d) AS BIGINT)
         AS burn_milli,
       CAST(1000000 * sum(n_err) OVER (ORDER BY day)
            // (greatest(sum(n) OVER (ORDER BY day), 1) * %d)
            AS BIGINT) AS cum_budget_used_milli
FROM d ORDER BY day
""" % (SLO_ERROR_BUDGET_PERMILLE, SLO_ERROR_BUDGET_PERMILLE)


def brand_return_rate(sf_dir):
    """Return rate by brand — the vendor-quality scorecard (which
    brands come back?): per brand, line count, returned-line count
    (l_returnflag = 'R') and the exact permille rate, plus the rate's
    delta from the global rate so over/under-performers read
    directly. Returns are drawn independently of brand in this
    synthesizer, so deltas are binomial noise — the exact noise is
    the data (the fairness-audit stance).

    Scale shape: part→brand broadcast once (the brand_share_shift
    discipline); bounded (brand → n, n_ret) cells, zero shuffle, one
    merge block."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    brand_map = dict(zip(part["p_partkey"].astype(int),
                         part["p_brand"]))
    lookup = ray.put(brand_map)
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_returnflag"])

    def cells(t: pa.Table) -> pd.DataFrame:
        import ray as _ray
        bm = _ray.get(lookup)
        ret = (pc.equal(t["l_returnflag"], pa.scalar("R"))
               .to_numpy(zero_copy_only=False).astype(np.int64))
        brands = [bm[int(k)] for k in t["l_partkey"].to_pylist()]
        out = (pd.DataFrame({"brand": brands, "n": 1, "n_ret": ret})
               .groupby("brand", as_index=False)
               .agg(n=("n", "sum"), n_ret=("n_ret", "sum")))
        return out.astype({"n": "int64", "n_ret": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("brand", as_index=False)
             .agg(n=("n", "sum"), n_ret=("n_ret", "sum"))
             .sort_values("brand").reset_index(drop=True))
        glob = 1000 * int(g["n_ret"].sum()) // int(g["n"].sum())
        g["rate_permille"] = 1000 * g["n_ret"] // g["n"]
        g["delta_permille"] = g["rate_permille"] - glob
        return g.astype({"n": "int64", "n_ret": "int64",
                         "rate_permille": "int64",
                         "delta_permille": "int64"})

    return _merge_partials(
        ds.map_batches(cells, batch_format="pyarrow"), merge)


BRAND_RETURN_SQL = """
WITH b AS (
  SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l.l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ret
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1),
g AS (SELECT CAST(1000 * sum(n_ret) // sum(n) AS BIGINT) AS glob
      FROM b)
SELECT brand, n, n_ret,
       CAST(1000 * n_ret // n AS BIGINT) AS rate_permille,
       CAST(1000 * n_ret // n - g.glob AS BIGINT) AS delta_permille
FROM b, g ORDER BY brand
"""


BOUNCE_GAP_US = 1_800_000_000  # the 30-min session rule


def events_bounce_rate(sf_dir):
    """Session bounce rate per day — the engagement headline next to
    stickiness: sessions under the 30-minute-gap rule (the
    events_sessions contract), a BOUNCE is a single-event session,
    each session dated by its first event's day, and the report is
    per-day sessions, bounces and the exact permille rate.

    Scale shape: (user, ts) rides the interarrival user-bucketed
    exchange; each bucket sorts within user, marks session starts
    vectorized (gap > 30 min), derives per-session lengths from
    consecutive start indices (a user's events co-locate, so session
    boundaries never cross buckets) and emits bounded (day →
    sessions, bounces) cells; single merge."""
    buckets = _exchange_buckets(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame({
            "u": t["user_id"].to_numpy(),
            "ts": (t["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))})
        h = pd.util.hash_pandas_object(p["u"], index=False).values
        p["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return p.astype({"u": "int64", "ts": "int64"})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts"], kind="mergesort")
        u = g["u"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gap = np.ones(len(g), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > BOUNCE_GAP_US
        start = new_user | gap
        idx = np.flatnonzero(start)
        lengths = np.diff(np.append(idx, len(g)))
        days = ts[idx] // 86_400_000_000
        out = (pd.DataFrame({"day": days,
                             "n_sessions": 1,
                             "n_bounces": (lengths == 1)
                             .astype(np.int64)})
               .groupby("day", as_index=False)
               .agg(n_sessions=("n_sessions", "sum"),
                    n_bounces=("n_bounces", "sum")))
        return out.astype("int64")

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(bucket_cells, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("day", as_index=False)
             .agg(n_sessions=("n_sessions", "sum"),
                  n_bounces=("n_bounces", "sum"))
             .sort_values("day").reset_index(drop=True))
        g["bounce_permille"] = (1000 * g["n_bounces"]
                                // g["n_sessions"].clip(lower=1))
        return g.astype("int64")

    return _merge_partials(per_bucket, merge)


BOUNCE_RATE_SQL = """
WITH e AS (
  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts
  FROM events),
m AS (
  SELECT u, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY u ORDER BY ts)
                   IS NULL
                OR ts - lag(ts) OVER (PARTITION BY u ORDER BY ts)
                   > %d
              THEN 1 ELSE 0 END AS start
  FROM e),
s AS (SELECT u, ts, sum(start) OVER (PARTITION BY u ORDER BY ts)
             AS sid
      FROM m),
sess AS (
  SELECT u, sid, min(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS len
  FROM s GROUP BY 1, 2),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bounces
      FROM sess GROUP BY 1)
SELECT day, n_sessions, n_bounces,
       CAST(1000 * n_bounces // greatest(n_sessions, 1) AS BIGINT)
         AS bounce_permille
FROM d ORDER BY day
""" % BOUNCE_GAP_US


QUERIES = {
    "q1_pricing": (q1_pricing, Q1_SQL),
    "doc_stats_by_lang": (doc_stats_by_lang, DOC_STATS_SQL),
    "doc_token_counts": (doc_token_counts, DOC_TOKENS_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FP_SQL),
    "doc_quality_filter": (doc_quality_filter, DOC_QUALITY_FILTER_SQL),
    "fulltext_search": (fulltext_search, FULLTEXT_SQL),
    "fulltext_indexed_search": (fulltext_indexed_search, FULLTEXT_SQL),
    "bm25_search": (bm25_search, BM25_SQL),
    "rrf_hybrid_search": (rrf_hybrid_search, RRF_HYBRID_SQL),
    "collocation_pmi": (collocation_pmi, COLLOCATION_PMI_SQL),
    "mmr_search": (mmr_search, MMR_SQL),
    "user_bottomk_sample": (user_bottomk_sample, USER_BOTTOMK_SQL),
    "doc_exact_dedup": (doc_exact_dedup, DOC_DEDUP_SQL),
    "doc_normalized_dedup": (doc_normalized_dedup, NORM_DEDUP_SQL),
    "snapshot_dedup": (snapshot_dedup, SNAPSHOT_DEDUP_SQL),
    "quantile_band_docs": (quantile_band_docs, QUANTILE_BAND_SQL),
    "toc_firstletter": (toc_firstletter, TOC_SQL),
    "meta_triples_docs": (meta_triples_docs, META_TRIPLES_SQL),
    "top_sources": (top_sources, TOP_SOURCES_SQL),
    "top_docs_per_source": (top_docs_per_source, TOP_DOCS_PER_SOURCE_SQL),
    "sample_per_source": (sample_per_source, SAMPLE_PER_SOURCE_SQL),
    "mixture_sample": (mixture_sample, MIXTURE_SAMPLE_SQL),
    "media_image_features": (media_image_features, MEDIA_IMAGE_SQL),
    "media_phash_dupes": (media_phash_dupes, MEDIA_PHASH_SQL),
    "media_audio_features": (media_audio_features, MEDIA_AUDIO_SQL),
    "media_video_frames": (media_video_frames, MEDIA_VIDEO_SQL),
    "source_token_quantiles": (source_token_quantiles, SOURCE_QUANTILES_SQL),
    "cross_source_contamination": (cross_source_contamination,
                                   CONTAMINATION_SQL),
    "source_term_divergence": (source_term_divergence, SOURCE_CHI2_SQL),
    "doc_length_outliers": (doc_length_outliers, DOC_LENGTH_OUTLIERS_SQL),
    "source_vocab_overlap": (source_vocab_overlap,
                             SOURCE_VOCAB_OVERLAP_SQL),
    "hll_user_registers": (hll_user_registers, HLL_REGISTERS_SQL),
    "user_hll_by_type": (user_hll_by_type, USER_HLL_BY_TYPE_SQL),
    "cm_user_counts": (cm_user_counts, CM_COUNTS_SQL),
    "heavy_hitter_grams": (heavy_hitter_grams, HH_GRAMS_SQL),
    "name_edit1_pairs": (name_edit1_pairs, NAME_EDIT1_SQL),
    "er_customer_clusters": (er_customer_clusters, ER_CLUSTERS_SQL),
    "doc_weighted_sample": (doc_weighted_sample, DOC_WEIGHTED_SAMPLE_SQL),
    "doc_tfidf_terms": (doc_tfidf_terms, DOC_TFIDF_SQL),
    "events_windows": (events_windows, EVENTS_WINDOWS_SQL),
    "latest_event_per_user": (latest_event_per_user, LATEST_EVENT_SQL),
    "user_event_pivot": (user_event_pivot, USER_PIVOT_SQL),
    "events_type_stats": (events_type_stats, EVENTS_TYPE_SQL),
    "events_props_agg": (events_props_agg, EVENTS_PROPS_SQL),
    "brand_revenue": (brand_revenue, BRAND_REVENUE_SQL),
    "segment_order_revenue": (segment_order_revenue, SEGMENT_REVENUE_SQL),
    "doc_rank_in_source": (doc_rank_in_source, DOC_RANK_SQL),
    "orders_running_total": (orders_running_total, ORDERS_RUNNING_SQL),
    "orders_rollup": (orders_rollup, ORDERS_ROLLUP_SQL),
    "orders_skyline": (orders_skyline, ORDERS_SKYLINE_SQL),
    "orders_zorder": (orders_zorder, ORDERS_ZORDER_SQL),
    "orders_cdc_merge": (orders_cdc_merge, ORDERS_CDC_SQL),
    "events_anomaly_days": (events_anomaly_days, EVENTS_ANOMALY_SQL),
    "events_daily_dense": (events_daily_dense, EVENTS_DENSE_SQL),
    "events_preceding_hour_count": (events_preceding_hour_count,
                                    EVENTS_PREC_SQL),
    "lineitem_corr_components": (lineitem_corr_components,
                                 LINEITEM_CORR_SQL),
    "events_sessions": (events_sessions, EVENTS_SESSIONS_SQL),
    "events_session_paths": (events_session_paths,
                             EVENTS_SESSION_PATHS_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_retention": (events_retention, EVENTS_RETENTION_SQL),
    "events_cumulative_users": (events_cumulative_users,
                                EVENTS_CUMULATIVE_SQL),
    "events_trending_window": (events_trending_window,
                               EVENTS_TRENDING_SQL),
    "events_decayed_user_score": (events_decayed_user_score,
                                  EVENTS_DECAYED_SQL),
    "events_markov_transitions": (events_markov_transitions,
                                  EVENTS_MARKOV_SQL),
    "events_debounce": (events_debounce, EVENTS_DEBOUNCE_SQL),
    "events_asof_click_view": (events_asof_click_view, EVENTS_ASOF_SQL),
    "events_range_pairs": (events_range_pairs, EVENTS_RANGE_SQL),
    "anti_join_empty_orders": (anti_join_empty_orders, ANTI_JOIN_SQL),
    "priority_lineitems": (priority_lineitems, PRIORITY_LINEITEMS_SQL),
    "q3_shipping": (q3_shipping, Q3_SQL),
    "orders_cube": (orders_cube, ORDERS_CUBE_SQL),
    "q5_local_suppliers": (q5_local_suppliers, Q5_SQL),
    "q4_late_orders": (q4_late_orders, Q4_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
    "q21_blame_supplier": (q21_blame_supplier, Q21_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q10_returned_customers": (q10_returned_customers, Q10_SQL),
    "orders_zorder_scan": (orders_zorder_scan, ZORDER_SCAN_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "training_shards": (training_shards, TRAINING_SHARDS_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q13_custdist": (q13_custdist, Q13_CUSTDIST_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_TOP_SUPPLIER_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q19_bracket_revenue": (q19_bracket_revenue, Q19_SQL),
    "q16_supplier_count": (q16_supplier_count, Q16_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "doc_range_layout": (doc_range_layout, DOC_RANGE_LAYOUT_SQL),
    "orders_checksum": (orders_checksum, ORDERS_CHECKSUM_SQL),
    "basket_part_pairs": (basket_part_pairs, BASKET_PAIRS_SQL),
    "langid_agreement": (langid_agreement, LANGID_AGREEMENT_SQL),
    "orders_ivm_counts": (orders_ivm_counts, ORDERS_IVM_SQL),
    "events_daily_type_mask": (events_daily_type_mask, EVENTS_MASK_SQL),
    "orders_price_percentiles": (orders_price_percentiles,
                                 ORDERS_PCTL_SQL),
    "lineitem_fk_orphans": (lineitem_fk_orphans, FK_ORPHANS_SQL),
    "events_ab_metrics": (events_ab_metrics, EVENTS_AB_SQL),
    "source_compaction_plan": (source_compaction_plan, COMPACTION_SQL),
    "source_lang_gini": (source_lang_gini, SOURCE_GINI_SQL),
    "rendezvous_rebalance": (rendezvous_rebalance, RENDEZVOUS_SQL),
    "user_value_twa": (user_value_twa, USER_TWA_SQL),
    "orders_winsorized_mean": (orders_winsorized_mean,
                               ORDERS_WINSOR_SQL),
    "key_skew_profile": (key_skew_profile, KEY_SKEW_SQL),
    "orders_benford_audit": (orders_benford_audit, ORDERS_BENFORD_SQL),
    "orderkey_join_stats": (orderkey_join_stats, JOIN_STATS_SQL),
    "brand_revenue_hhi": (brand_revenue_hhi, BRAND_HHI_SQL),
    "orders_analyze_stats": (orders_analyze_stats, ORDERS_ANALYZE_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "events_sliding_dau": (events_sliding_dau, SLIDING_DAU_SQL),
    "events_late_arrivals": (events_late_arrivals,
                             LATE_ARRIVALS_SQL),
    "audience_overlap_matrix": (audience_overlap_matrix,
                                AUDIENCE_OVERLAP_SQL),
    "events_value_trend": (events_value_trend, EVENTS_TREND_SQL),
    "orders_decile_report": (orders_decile_report,
                             ORDERS_DECILE_SQL),
    "doc_k_anonymity": (doc_k_anonymity, KANON_SQL),
    "events_cusum_alarms": (events_cusum_alarms,
                            EVENTS_CUSUM_SQL),
    "orders_daily_acf1": (orders_daily_acf1, ORDERS_ACF1_SQL),
    "region_revenue_share": (region_revenue_share, REGION_SHARE_SQL),
    "fulltext_delta_search": (fulltext_delta_search, FT_DELTA_SQL),
    "embed_ivf_add_knn": (embed_ivf_add_knn, IVF_ADD_SQL),
    "segment_price_median": (segment_price_median,
                             SEGMENT_MEDIAN_SQL),
    "source_embedding_coherence": (source_embedding_coherence,
                                   SOURCE_COHERENCE_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_SQL),
    "union_entities": (union_entities, UNION_SQL),
    "embed_knn": (embed_knn, EMBED_KNN_SQL),
    "embed_kmeans": (embed_kmeans, EMBED_KMEANS_SQL),
    "semantic_dedup": (semantic_dedup, SEMANTIC_DEDUP_SQL),
    "topic_shards": (topic_shards, TOPIC_SHARDS_SQL),
    "cluster_pseudo_labels": (cluster_pseudo_labels, CLUSTER_PSEUDO_SQL),
    "embed_pca_power": (embed_pca_power, EMBED_PCA_SQL),
    "prototype_prune": (prototype_prune, PROTO_PRUNE_SQL),
    "canonicalize_cc": (canonicalize_cc, CANON_CC_SQL),
    "canonicalize_cc_star": (canonicalize_cc_star, CANON_CC_SQL),
    "kg_titles": (kg_titles, KG_TITLES_SQL),
    "kg_identifiers": (kg_identifiers, KG_IDENTIFIERS_SQL),
    "kg_section_counts": (kg_section_counts, KG_SECTION_COUNTS_SQL),
    "kg_top_cited": (kg_top_cited, KG_TOP_CITED_SQL),
    "kg_pagerank": (kg_pagerank, KG_PAGERANK_SQL),
    "kg_trustrank": (kg_trustrank, KG_TRUSTRANK_SQL),
    "doc_lm_score": (doc_lm_score, DOC_LM_SQL),
    "doc_dsir_score": (doc_dsir_score, DOC_DSIR_SQL),
    "doc_quality_classifier": (doc_quality_classifier,
                               DOC_QUALITY_CLASSIFIER_SQL),
    "doc_bpe_tokens": (doc_bpe_tokens, DOC_BPE_SQL),
    "url_canonicalize": (url_canonicalize, URL_CANON_SQL),
    "crawl_blocklist": (crawl_blocklist, CRAWL_BLOCKLIST_SQL),
    "url_frontier": (url_frontier, URL_FRONTIER_SQL),
    "doc_winnow": (doc_winnow, DOC_WINNOW_SQL),
    "kg_hits": (kg_hits, KG_HITS_SQL),
    "kg_degree_dist": (kg_degree_dist, KG_DEGREE_DIST_SQL),
    "kg_cocite_triangles": (kg_cocite_triangles, KG_TRIANGLES_SQL),
    "kg_random_walks": (kg_random_walks, KG_WALKS_SQL),
    "kg_bfs_depth": (kg_bfs_depth, KG_BFS_SQL),
    "kg_label_propagation": (kg_label_propagation, KG_LABELPROP_SQL),
    "kg_kcore": (kg_kcore, KG_KCORE_SQL),
    "kg_mirror_candidates": (kg_mirror_candidates, KG_MIRROR_SQL),
    "kg_link_prediction": (kg_link_prediction, KG_LINKPRED_SQL),
    "kg_neighborhood_anf": (kg_neighborhood_anf, KG_ANF_SQL),
    "kg_cocite_communities": (kg_cocite_communities, KG_COCITE_CC_SQL),
    "kg_facet_pivot": (kg_facet_pivot, KG_FACET_SQL),
    "kg_entity_subjects": (kg_entity_subjects, KG_ENTITY_SQL),
    "kg_keyword_concepts": (kg_keyword_concepts, KG_KEYWORD_SQL),
    "kg_negative_samples": (kg_negative_samples, KG_NEGATIVES_SQL),
    "kg_entity_cooccurrence": (kg_entity_cooccurrence, KG_COOC_SQL),
    "kg_skeleton": (kg_skeleton, KG_SKELETON_SQL),
    "kg_stats": (kg_stats, KG_STATS_SQL),
    "kg_annotations": (kg_annotations, KG_ANNOTATIONS_SQL),
    "text_sections": (text_sections, TEXT_SECTIONS_SQL),
    "archived_versions": (archived_versions, ARCHIVED_SQL),
    "crawl_delta_status": (crawl_delta_status, CRAWL_DELTA_SQL),
    "crawl_version_intervals": (crawl_version_intervals,
                                CRAWL_INTERVALS_SQL),
    "composite_parse": (composite_parse, COMPOSITE_SQL),
    "news_feeds_kg": (news_feeds_kg, NEWS_FEEDS_SQL),
    "salted_source_counts": (salted_source_counts, SALTED_SQL),
    "xhtml_render": (xhtml_render, KG_XHTML_SQL),
    "kg_triples": (kg_triples, KG_TRIPLES_SQL),
    "kg_type_inference": (kg_type_inference, KG_TYPE_INFERENCE_SQL),
    "kg_domain_range_inference": (kg_domain_range_inference,
                                  KG_DOMAIN_RANGE_SQL),
    "kg_incremental": (kg_incremental, KG_TRIPLES_SQL),
    "kg_labels": (kg_labels, KG_LABELS_SQL),
    "kg_sections": (kg_sections, KG_SECTIONS_SQL),
    "kg_mentions": (kg_mentions, KG_MENTIONS_SQL),
    "kg_anchor_text": (kg_anchor_text, KG_ANCHOR_SQL),
    "kg_mention_contexts": (kg_mention_contexts, KG_KWIC_SQL),
    "phrase_search": (phrase_search, PHRASE_SEARCH_SQL),
    "toc_pages_kg": (toc_pages_kg, TOC_PAGES_SQL),
    "minhash_neardup": (minhash_neardup, MINHASH_SQL),
    "neardup_incremental": (neardup_incremental, MHIDX_SQL),
    "doc_containment": (doc_containment, DOC_CONTAINMENT_SQL),
    "ngram_jaccard": (ngram_jaccard, NGRAM_JACCARD_SQL),
    "simhash_pairs": (simhash_pairs, None),
    "simhash_pairs_md5": (simhash_pairs_md5, SIMHASH_MD5_SQL),
    "neardup_representatives": (neardup_representatives,
                                NEARDUP_REPS_SQL),
    "simhash_planted_recall": (simhash_planted_recall, SIMHASH_PLANTED_SQL),
    "embedding_neardup": (embedding_neardup, EMBED_NEARDUP_SQL),
    # rows-only: ANN recall is approximate by design (brute-force
    # embed_knn carries the SQL oracle; recall bound in pytest)
    "embed_knn_ivf": (embed_knn_ivf, None),
    "langid_docs": (langid_docs, LANGID_SQL),
    "embed_link_entities": (embed_link_entities, EMBED_LINK_SQL),
    "pii_scan": (pii_scan, PII_SCAN_SQL),
    "dup_passages": (dup_passages, DUP_PASSAGES_SQL),
    "scrub_passages": (scrub_passages, SCRUB_PASSAGES_SQL),
    "doc_contamination": (doc_contamination, DOC_CONTAMINATION_SQL),
    "doc_decontaminate": (doc_decontaminate, DOC_DECONTAMINATE_SQL),
    "profile_documents": (profile_documents, PROFILE_DOCS_SQL),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "doc_chunks": (doc_chunks, DOC_CHUNKS_SQL),
    "split_assign": (split_assign, SPLIT_ASSIGN_SQL),
    "pack_token_chunks": (pack_token_chunks, PACK_CHUNKS_SQL),
    "xhtml_annotated": (xhtml_annotated, XHTML_ANNOTATED_SQL),
    "curation_pipeline": (curation_pipeline, CURATION_SQL),
    "orders_time_travel": (orders_time_travel, ORDERS_TIME_TRAVEL_SQL),
    "orders_dq_expectations": (orders_dq_expectations, ORDERS_DQ_SQL),
    "lineitem_weighted_median": (lineitem_weighted_median,
                                 WEIGHTED_MEDIAN_SQL),
    "bloom_fpr_audit": (bloom_fpr_audit, BLOOM_FPR_SQL),
    "orders_price_mad": (orders_price_mad, ORDERS_MAD_SQL),
    "orderkey_join_sample_estimate": (orderkey_join_sample_estimate,
                                      JOIN_SAMPLE_SQL),
    "embed_squant_recall": (embed_squant_recall, EMBED_SQ8_SQL),
    "orders_dow_seasonality": (orders_dow_seasonality,
                               ORDERS_DOW_SQL),
    "events_peak_concurrency": (events_peak_concurrency,
                                EVENTS_PEAK_SQL),
    "lineitem_sequence_audit": (lineitem_sequence_audit,
                                LINEITEM_SEQ_SQL),
    "orders_pit_dimension_join": (orders_pit_dimension_join,
                                  PIT_JOIN_SQL),
    "user_interarrival_histogram": (user_interarrival_histogram,
                                    INTERARRIVAL_SQL),
    "vocab_zipf_spectrum": (vocab_zipf_spectrum, VOCAB_ZIPF_SQL),
    "orders_median_of_means": (orders_median_of_means, MOM_SQL),
    "orders_backlog_aging": (orders_backlog_aging, AGING_SQL),
    "customer_rfm_segments": (customer_rfm_segments, RFM_SQL),
    "customer_pareto_concentration": (customer_pareto_concentration,
                                      PARETO_SQL),
    "events_session_lifetable": (events_session_lifetable,
                                 LIFETABLE_SQL),
    "user_churn_labels": (user_churn_labels, CHURN_SQL),
    "funnel_latency_median": (funnel_latency_median,
                              FUNNEL_LATENCY_SQL),
    "orders_price_drift": (orders_price_drift, DRIFT_SQL),
    "part_neyman_allocation": (part_neyman_allocation, NEYMAN_SQL),
    "vocab_heaps_curve": (vocab_heaps_curve, HEAPS_SQL),
    "user_event_gini_impurity": (user_event_gini_impurity,
                                 GINI_IMPURITY_SQL),
    "lineitem_model_auc": (lineitem_model_auc, MODEL_AUC_SQL),
    "lineitem_pr_curve": (lineitem_pr_curve, PR_CURVE_SQL),
    "events_chi2_independence": (events_chi2_independence,
                                 EVENTS_CHI2_SQL),
    "basket_rule_lift": (basket_rule_lift, BASKET_LIFT_SQL),
    "orders_jackknife_variance": (orders_jackknife_variance,
                                  JACKKNIFE_SQL),
    "orders_forecast_backtest": (orders_forecast_backtest,
                                 FORECAST_BACKTEST_SQL),
    "kg_transitivity": (kg_transitivity, KG_TRANSITIVITY_SQL),
    "customer_revenue_gini": (customer_revenue_gini,
                              CUSTOMER_GINI_SQL),
    "events_fano_overdispersion": (events_fano_overdispersion,
                                   FANO_SQL),
    "kg_degree_assortativity": (kg_degree_assortativity,
                                KG_ASSORTATIVITY_SQL),
    "customer_cohort_ltv": (customer_cohort_ltv, COHORT_LTV_SQL),
    "part_price_index": (part_price_index, PRICE_INDEX_SQL),
    "kg_rich_club": (kg_rich_club, KG_RICH_CLUB_SQL),
    "er_blocking_quality": (er_blocking_quality, ER_BLOCKING_SQL),
    "events_touch_attribution": (events_touch_attribution,
                                 TOUCH_ATTR_SQL),
    "lineitem_fairness_audit": (lineitem_fairness_audit,
                                FAIRNESS_SQL),
    "lineitem_conformal_threshold": (lineitem_conformal_threshold,
                                     CONFORMAL_SQL),
    "events_cuped_reduction": (events_cuped_reduction, CUPED_SQL),
    "events_srm_check": (events_srm_check, SRM_SQL),
    "orders_duplicate_payments": (orders_duplicate_payments,
                                  DUP_PAY_SQL),
    "orders_quantile_sketch_audit": (orders_quantile_sketch_audit,
                                     SKETCH_AUDIT_SQL),
    "orders_theil_sen_trend": (orders_theil_sen_trend,
                               THEIL_SEN_SQL),
    "orders_fulfillment_leadtime": (orders_fulfillment_leadtime,
                                    LEADTIME_SQL),
    "doc_l_diversity": (doc_l_diversity, L_DIVERSITY_SQL),
    "orders_dow_anova": (orders_dow_anova, DOW_ANOVA_SQL),
    "orders_runs_test": (orders_runs_test, RUNS_TEST_SQL),
    "events_power_analysis": (events_power_analysis, POWER_SQL),
    "user_bot_score_census": (user_bot_score_census,
                              BOT_CENSUS_SQL),
    "brand_share_shift": (brand_share_shift, BRAND_SHIFT_SQL),
    "lang_tokenizer_fertility": (lang_tokenizer_fertility,
                                 FERTILITY_SQL),
    "orders_stl_strength": (orders_stl_strength, STL_STRENGTH_SQL),
    "kg_component_census": (kg_component_census,
                            KG_COMPONENT_CENSUS_SQL),
    "customer_purchase_dispersion": (customer_purchase_dispersion,
                                     PURCHASE_DISPERSION_SQL),
    "part_markup_census": (part_markup_census, MARKUP_CENSUS_SQL),
    "supplier_sla_compliance": (supplier_sla_compliance,
                                SLA_COMPLIANCE_SQL),
    "cm_error_audit": (cm_error_audit, CM_ERROR_SQL),
    "orderkey_gap_audit": (orderkey_gap_audit, ORDERKEY_GAP_SQL),
    "events_stickiness_ratio": (events_stickiness_ratio,
                                STICKINESS_SQL),
    "events_slo_burn_rate": (events_slo_burn_rate, SLO_BURN_SQL),
    "brand_return_rate": (brand_return_rate, BRAND_RETURN_SQL),
    "events_bounce_rate": (events_bounce_rate, BOUNCE_RATE_SQL),
}


def queries():
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql():
    return {name: sql for name, (_, sql) in QUERIES.items() if sql}
