"""Graph analytics over the citation graph (pagerank, k-core, components,
trust, assortativity) plus URL canonicalization / crawl-frontier dedup."""

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
from ._shared import _exchange_buckets, _kg, _merge_partials, _read
from .kg_flagship import PAGE_URL_SQL


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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph
    from ...stages.canonicalize import connected_components_distributed

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
                  dn: int = 85, dd: int = 100,
                  prelude: str | None = None,
                  tail: str | None = None) -> str:
    """Unrolled integer-PageRank CTE chain over any prelude that
    defines ``edges(src, dst)``, ``nodes(node)`` and
    ``outdeg(src, d)`` (default: the citation-graph prelude;
    vocab_textrank_keywords passes a word-cooccurrence prelude)."""
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
    return "%s,\n%s\n%s" % (
        prelude if prelude is not None else _GRAPH_PRELUDE_SQL,
        ",\n".join(ctes),
        tail if tail is not None
        else "SELECT node, r AS pr FROM r%d" % iterations)


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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import graph

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
    from ...stages import lm

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
    from ...functions.url import canonical_url

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
    from ...stages.dedup import _bucket_of

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
    from ...stages.dedup import winnow_fingerprints

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
    from ...stages.bpe import bpe_token_counts

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
    from ...stages import lm

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
    from ...stages import lm

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


def lang_ppl_buckets(sf_dir):
    """CCNet's per-language head/middle/tail quality bucketing
    (Wenzek et al. '20: each language's documents split into thirds
    by LM perplexity; pretraining mixes sample the head first) on the
    integer lm_score grid (higher score = more in-distribution =
    head). Thresholds are TRUE order statistics per language —
    v1 = the score at rank ceil(N/3), v2 at rank ceil(2N/3) by
    (score desc, doc_id asc) — with value-ties joining the better
    bucket (head: score ≥ v1; middle: ≥ v2; tail: rest), so the
    census replays exactly in SQL without intra-tie document
    ordering. Output: (lang, bucket, n_docs, lo_score, hi_score).

    Scale shape: the expensive part is lm_score's distributed
    train+score (bounded vocabulary exchange, broadcast model); the
    language tag attaches via ``joins.attach_dim`` (dispatching);
    bucketing needs only a (lang × score-grid) histogram — a bounded
    lossless combiner — and a driver-side cumulative walk."""
    from ...stages import lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scores = lm.lm_score(docs, k_bigrams=LM_K)
    lang_dim = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    tagged = joins.attach_dim(scores, lang_dim, "doc_id", "doc_id",
                              "lang", out_col="lang", how="inner")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["lang", "lm_score"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["lm_score"] = out["lm_score"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["lang", "lm_score", "n"]]

    h = (tagged.map_batches(partial, batch_format="pandas")
         .to_pandas()
         .groupby(["lang", "lm_score"], as_index=False)["n"].sum())
    rows = []
    for lang, g in h.groupby("lang", sort=True):
        g = g.sort_values("lm_score", ascending=False) \
            .reset_index(drop=True)
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        v1 = int(g["lm_score"].iloc[
            int(np.searchsorted(cum, (n + 2) // 3))])
        v2 = int(g["lm_score"].iloc[
            int(np.searchsorted(cum, (2 * n + 2) // 3))])
        vals = g["lm_score"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        for bucket, mask in (
                ("head", vals >= v1),
                ("middle", (vals < v1) & (vals >= v2)),
                ("tail", vals < v2)):
            if not mask.any():
                continue
            rows.append((lang, bucket, int(ns[mask].sum()),
                         int(vals[mask].min()),
                         int(vals[mask].max())))
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs",
                                      "lo_score", "hi_score"])
    out = out.sort_values(["lang", "bucket"]).reset_index(drop=True)
    for c in ("n_docs", "lo_score", "hi_score"):
        out[c] = out[c].astype("int64")
    out["lang"] = out["lang"].astype(object)
    out["bucket"] = out["bucket"].astype(object)
    return out


LANG_PPL_SQL = """
WITH j AS (
  SELECT d.lang, s.doc_id, s.lm_score
  FROM (%s) s JOIN documents d USING (doc_id)),
n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1),
rk AS (SELECT lang, doc_id, lm_score,
              row_number() OVER (PARTITION BY lang
                ORDER BY lm_score DESC, doc_id ASC) AS rn
       FROM j),
v1 AS (SELECT rk.lang, rk.lm_score AS v
       FROM rk JOIN n USING (lang) WHERE rn = (n.n + 2) // 3),
v2 AS (SELECT rk.lang, rk.lm_score AS v
       FROM rk JOIN n USING (lang) WHERE rn = (2 * n.n + 2) // 3),
b AS (
  SELECT j.lang,
         CASE WHEN j.lm_score >= v1.v THEN 'head'
              WHEN j.lm_score >= v2.v THEN 'middle'
              ELSE 'tail' END AS bucket,
         j.lm_score
  FROM j JOIN v1 USING (lang) JOIN v2 USING (lang))
SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(lm_score) AS BIGINT) AS lo_score,
       CAST(max(lm_score) AS BIGINT) AS hi_score
FROM b GROUP BY 1, 2 ORDER BY 1, 2
""" % DOC_LM_SQL


TEXTRANK_SCALE = 10 ** 9
TEXTRANK_ITERS, TEXTRANK_TOPK = 2, 20


def vocab_textrank_keywords(sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau '04 — PageRank
    over the word co-occurrence graph; the unsupervised keyphrase
    baseline): DISTINCT adjacent-word pairs across the corpus form an
    undirected graph (both orientations materialized, the paper's
    undirected-window-2 setting), and the SAME integer PageRank
    recurrence as kg_pagerank ranks the vocabulary; output = the
    top-20 words by (rank desc, word asc).

    Scale shape: per-batch canonical (min, max) pair dedup → ONE
    bucketed distinct exchange (bounded by the bigram vocabulary,
    not the token count) → symmetrize by union-with-reverse →
    graph.pagerank's bucketed exchanges; top-k via per-batch local
    heads + one coalesced merge. SQL: the parameterized unrolled
    PageRank chain over a word-cooccurrence prelude."""
    from ...stages import graph

    ds = _read(sf_dir, "documents", columns=["text"])
    buckets = _exchange_buckets(sf_dir)

    def canon_pairs(df: pd.DataFrame) -> pd.DataFrame:
        seen = set()
        for t in df["text"].fillna(""):
            w = t.split()
            for a, b in zip(w, w[1:]):
                if a != b:
                    seen.add((a, b) if a < b else (b, a))
        out = pd.DataFrame(sorted(seen), columns=["a", "b"])
        if not len(out):
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "_bucket": pd.Series(dtype="int32")})
        h = pd.util.hash_pandas_object(out["a"] + "\x1f" + out["b"],
                                       index=False).values
        out["_bucket"] = (h % np.uint64(buckets)).astype("int32")
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return (g[["a", "b"]].drop_duplicates()
                .reset_index(drop=True))

    canon = (ds.map_batches(canon_pairs, batch_format="pandas")
             .groupby("_bucket").map_groups(dedup,
                                            batch_format="pandas"))
    fwd = canon.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
        batch_format="pyarrow")
    rev = canon.map_batches(
        lambda t: pa.table({"src": t["b"], "dst": t["a"]}),
        batch_format="pyarrow")
    pr = graph.pagerank(fwd.union(rev), iterations=TEXTRANK_ITERS,
                        scale=TEXTRANK_SCALE)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["pr", "node"],
                               ascending=[False, True])
                .head(TEXTRANK_TOPK).reset_index(drop=True))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["pr", "node"],
                              ascending=[False, True])
               .head(TEXTRANK_TOPK).reset_index(drop=True))
        return pd.DataFrame({"word": out["node"].astype(object),
                             "pr": out["pr"].astype("int64")})

    return _merge_partials(
        pr.map_batches(local_top, batch_format="pandas"), final)


_TEXTRANK_PRELUDE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
  FROM documents),
bi AS (
  SELECT DISTINCT least(w[i], w[i + 1]) AS a,
         greatest(w[i], w[i + 1]) AS b
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i FROM toks)
  WHERE w[i] <> w[i + 1]),
edges AS (SELECT a AS src, b AS dst FROM bi
          UNION SELECT b, a FROM bi),
nodes AS (SELECT DISTINCT src AS node FROM edges),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
           FROM edges GROUP BY 1)"""

TEXTRANK_SQL = _pagerank_sql(
    TEXTRANK_ITERS, TEXTRANK_SCALE, prelude=_TEXTRANK_PRELUDE,
    tail=("SELECT node AS word, r AS pr FROM r%d "
          "ORDER BY r DESC, node ASC LIMIT %d"
          % (TEXTRANK_ITERS, TEXTRANK_TOPK)))
