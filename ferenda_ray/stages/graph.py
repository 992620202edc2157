"""Distributed graph analytics over (src, dst) edge Datasets.

Reference semantics served: the reference collects the full citation
graph from its triple store onto the driver and runs single-process
networkx over it — PageRank and HITS link analysis
(``ferenda/sources/general/graphanalyze.py:31-68`` imports
``networkx.pagerank`` / ``hits``; ``:412-470`` builds the citation
edge dict with duplicate-edge and self-citation removal) and citegraph
degree distributions (``graphanalyze.py:537-575``). Here the same
metrics are computed distributively: the edge list never leaves the
cluster, every exchange moves only narrow ``(node, int64)`` rows, and
per-iteration state is one row per node.

INTEGER fixed-point arithmetic: ranks are unnormalized int64 with
floor division (``(85*r) // (100*outdeg)``), so a SQL oracle can
replicate every iteration bit-exactly — no float drift between
backends, no tolerance windows in the correctness gate.

Scale notes (100-TB target):
- Edge dedup, degree counting, the per-iteration contribution join
  and the rank re-aggregation are all hash-bucketed exchanges
  (``joins.bucket_join`` shape): one Ray group per int bucket,
  vectorized pandas inside — never one group per node.
- Per-iteration state (``ranks``) is materialized so the lineage
  stays O(1) deep per iteration instead of re-executing the whole
  history each round (the same discipline as
  ``canonicalize.connected_components_distributed``).
- Magnitude bound: with the default ``scale=10**12`` the hottest
  node's rank is ≤ ``indeg_max * 0.85 * scale``; int64 overflows
  only past ~7.5e6 in-degree. For a web-scale graph pass a smaller
  ``scale`` (the oracle replicates any choice) — the recurrence is
  linear in ``scale`` so ordering is unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import _hash64, bucket_join

__all__ = ["distinct_edges", "degrees", "degree_distribution",
           "cocitation_pairs", "triangle_counts",
           "pagerank", "hits", "random_walks", "bfs_depth", "kcore",
           "cocitation_counts", "neighbor_jaccard",
           "resource_allocation", "neighborhood_registers"]


def _bucketize(col: str, num_buckets: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = (_hash64(df[col])
                         % np.uint64(num_buckets)).astype("int32")
        return df
    return fn


def distinct_edges(edges_ds, src: str = "src", dst: str = "dst",
                   num_buckets: int = 64, drop_self: bool = True):
    """Deduplicated directed edge list (the reference's "remove
    duplicate citations, self-citations and pinpoints" normalization,
    graphanalyze.py:440-455). One exchange keyed on the (src,dst)
    pair hash; only the two key columns cross it."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[src, dst]].copy()
        if drop_self:
            df = df[df[src] != df[dst]]
        # pre-dedup inside the batch so the exchange carries less
        df = df.drop_duplicates([src, dst])
        key = df[src].astype(str) + "\x1f" + df[dst].astype(str)
        df["_bucket"] = (_hash64(key)
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([src, dst])[[src, dst]]

    # Coalesce to num_buckets blocks FIRST: every downstream exchange
    # (this dedup, degrees, the per-iteration join/re-aggregation in
    # pagerank/hits) has at most num_buckets-way key parallelism, so
    # blocks beyond that only multiply sort/shuffle task count — an
    # edge list inheriting hundreds of tiny upstream blocks made
    # pagerank 20× slower (208 s → 8.8 s at sf0.1). num_buckets is
    # therefore the SINGLE parallelism knob: size it so one bucket of
    # (src,dst) pairs fits a worker (narrow columns — the repartition
    # moves no payload).
    return (edges_ds.repartition(num_buckets)
            .map_batches(prep, batch_format="pandas")
            .groupby("_bucket").map_groups(uniq, batch_format="pandas"))


def degrees(edges_ds, col: str, num_buckets: int = 64,
            out_col: str = "deg"):
    """(node, degree) counted on ``col`` — per-batch partial counts
    (combiner) before the bucketed merge, so the exchange moves one
    row per (batch, node), not one per edge."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(col).size().reset_index(name=out_col)
        out[out_col] = out[out_col].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(col, as_index=False)[out_col].sum()
        out[out_col] = out[out_col].astype("int64")
        return out

    return (edges_ds.map_batches(part, batch_format="pandas")
            .map_batches(_bucketize(col, num_buckets),
                         batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def degree_distribution(edges_ds, col: str = "dst",
                        src: str = "src", dst: str = "dst",
                        num_buckets: int = 64, normalize: bool = True):
    """Histogram of node degree on ``col`` → (degree, n_nodes): the
    citegraph degree-distribution analysis (graphanalyze.py:537-575),
    over the normalized graph (duplicate edges + self-loops removed
    first, as the reference does at :440-455). Second phase is a
    bounded-cardinality count (distinct degree values), merged the
    same bucketed way."""

    e = (distinct_edges(edges_ds, src, dst, num_buckets)
         if normalize else edges_ds)
    deg = degrees(e, col, num_buckets)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("deg").size().reset_index(name="n_nodes")
        out["n_nodes"] = out["n_nodes"].astype("int64")
        return out.rename(columns={"deg": "degree"})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("degree", as_index=False)["n_nodes"].sum()
        out["n_nodes"] = out["n_nodes"].astype("int64")
        return out

    return (deg.map_batches(part, batch_format="pandas")
            .map_batches(_bucketize("degree", num_buckets),
                         batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def cocitation_pairs(edges_ds, src: str = "src", dst: str = "dst",
                     num_buckets: int = 64, max_targets: int = 64,
                     small_graph_edges: int | None = None):
    """Distinct co-citation pairs (a < b cited by the same ``src``) —
    the bibliometric coupling graph over a directed citation edge
    list. Two bucketed exchanges: (1) hash(src) co-locates each page's
    targets (vectorized per-bucket self-merge — never one Ray group
    per page), (2) hash(a,b) deduplicates the pair set. ``max_targets``
    caps the quadratic explode of hub pages deterministically (the
    lexicographically-smallest targets win — same discipline as
    lsh_candidate_pairs' max_bucket); the synthetic corpus tops out at
    3 targets/page so the cap never binds in the oracle-checked
    domain. ``small_graph_edges`` (defaults to the module-level
    SMALL_GRAPH_EDGES) switches to the width-1 single-task path when
    the raw edge list fits one block — same rationale as pagerank."""
    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES

    def per_src_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates([src, dst])
             .sort_values([src, dst], kind="mergesort")
             .groupby(src).head(max_targets))
        m = g.merge(g, on=src)
        m = m[m[dst + "_x"] < m[dst + "_y"]]
        out = pd.DataFrame({"a": m[dst + "_x"], "b": m[dst + "_y"]})
        return out.drop_duplicates()

    mat = edges_ds.materialize()
    if mat.count() <= small_graph_edges:
        # width-1: the whole edge list in one task — per_src_pairs is
        # already a whole-frame computation (merge keyed on src), and
        # its trailing drop_duplicates is the global pair dedup here
        return mat.repartition(1).map_batches(
            per_src_pairs, batch_format="pandas", batch_size=None)

    raw = (mat.repartition(num_buckets)
           .map_batches(_bucketize(src, num_buckets),
                        batch_format="pandas")
           .groupby("_bucket").map_groups(per_src_pairs,
                                          batch_format="pandas"))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["a", "b"]).copy()
        key = df["a"].astype(str) + "\x1f" + df["b"].astype(str)
        df["_bucket"] = (_hash64(key)
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (raw.map_batches(prep, batch_format="pandas")
            .groupby("_bucket").map_groups(uniq, batch_format="pandas"))


def _solo_triangles(p: pd.DataFrame) -> pd.DataFrame:
    """One-block wedge + close: identical enumeration (a < b < c,
    each triangle once), vectorized pandas merges."""
    p = p[["a", "b"]]
    w = p.merge(p, left_on="b", right_on="a", suffixes=("", "_r"))
    t = w.merge(p, left_on=["a", "b_r"], right_on=["a", "b"],
                suffixes=("", "_c"))
    nodes = pd.concat([t["a"], t["b"], t["b_r"]], ignore_index=True)
    out = (nodes.value_counts().rename_axis("node")
           .reset_index(name="n_triangles"))
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out


def triangle_counts(pairs_ds, num_buckets: int = 64,
                    small_graph_pairs: int | None = None):
    """Per-node triangle participation counts over an undirected
    (a < b) pair list — the classic two-step distributed triangle
    enumeration: wedge join (pairs ⋈ pairs on the middle vertex,
    ordering a < b < c makes each triangle appear exactly once) then
    a closing-edge semi-join. The pair list is materialized once — it
    is consumed three times (both wedge sides + the membership side)
    and keeping it lazy would chain a third exchange onto a
    union-of-exchanges lineage (the Ray 2.49 DAG shape documented in
    CLAUDE.md). membership_join broadcasts the closing-edge set under
    its threshold and switches to Bloom + exact recheck above it, so
    the shape survives edge lists that don't fit the driver."""
    from .joins import membership_join

    if small_graph_pairs is None:
        small_graph_pairs = SMALL_GRAPH_EDGES

    pairs = pairs_ds.materialize()
    if pairs.count() <= small_graph_pairs:
        # width-1 single-task path (same rationale as pagerank)
        return pairs.repartition(1).map_batches(
            _solo_triangles, batch_format="pandas", batch_size=None)

    # wedge (a,b,c): left (a,b) ⋈ right (b,c) on the middle vertex
    wedges = bucket_join(pairs, pairs, left_on="b", right_on="a",
                         num_buckets=num_buckets, suffix="_r")

    def wedge_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(
            pc.cast(t["a"], pa.string()), pc.cast(t["b_r"], pa.string()),
            "\x1f")
        return t.append_column("_key", key)

    def pair_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(
            pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()),
            "\x1f")
        return pa.table({"_key": key})

    tri = membership_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"), "_key",
        pairs.map_batches(pair_key, batch_format="pyarrow"), "_key",
        mode="semi", num_buckets=num_buckets)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["a"], df["b"], df["b_r"]],
                          ignore_index=True)
        out = nodes.value_counts().rename_axis("node").reset_index(
            name="n_triangles")
        out["n_triangles"] = out["n_triangles"].astype("int64")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["n_triangles"].sum()
        out["n_triangles"] = out["n_triangles"].astype("int64")
        return out

    return (tri.map_batches(part, batch_format="pandas")
            .map_batches(_bucketize("node", num_buckets),
                         batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def _nodes(edges_ds, src: str, dst: str, num_buckets: int):
    """Distinct node set (src ∪ dst) as a Dataset with one ``node``
    column; bucket-deduplicated, never collected to the driver."""

    def pick(col: str):
        def fn(t: pa.Table) -> pa.Table:
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return pa.table({"node": pa.compute.unique(arr)})
        return fn

    both = (edges_ds.map_batches(pick(src), batch_format="pyarrow")
            .union(edges_ds.map_batches(pick(dst), batch_format="pyarrow")))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])[["node"]]

    # union doubles the block count; coalesce before the exchange
    # (see distinct_edges — block growth, not data volume, was the
    # dominant cost of these narrow-row shuffles)
    return (both.repartition(num_buckets)
            .map_batches(_bucketize("node", num_buckets),
                         batch_format="pandas")
            .groupby("_bucket").map_groups(uniq, batch_format="pandas"))


def _adapt_buckets(materialized_edges, num_buckets: int) -> int:
    """Size the per-iteration exchange width to the graph: bucket
    count is a pure work-partitioning knob (outputs are unions over
    groups, so any value yields identical rows), and an iterative
    algorithm pays the per-task fixed cost num_buckets × exchanges ×
    iterations times. ~20k edges per bucket keeps small graphs cheap
    while leaving the caller's cap for web-scale ones."""
    n = materialized_edges.count()
    return max(8, min(num_buckets, (n // 20_000) + 8))


# Below this many RAW edges the whole graph fits one worker block and
# the iterative exchanges are pure fixed cost (measured at sf0.1:
# 3,382 edges, 12.8 s of exchange overhead vs 0.2 s of arithmetic) —
# the same adaptive-execution-width judgment as _merge_partials /
# _adapt_buckets, taken to width 1. The distributed path is unchanged
# for real graphs and stays test-covered via small_graph_edges=0.
SMALL_GRAPH_EDGES = 2_000_000


def _graph_index(g: pd.DataFrame, src: str, dst: str):
    """Normalize (self-loops, duplicate edges — graphanalyze.py:
    440-455) and integer-index a single-block edge list."""
    g = g[g[src] != g[dst]].drop_duplicates([src, dst])
    srcs = g[src].to_numpy()
    dsts = g[dst].to_numpy()
    nodes = np.unique(np.concatenate([srcs, dsts]))
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[s] for s in srcs), np.int64, len(srcs))
    di = np.fromiter((idx[d] for d in dsts), np.int64, len(dsts))
    return nodes, si, di


def _solo_pagerank(g, iterations, scale, dn, dd, src, dst,
                   seed_fn=None):
    """The identical integer recurrence, vectorized over one block."""
    base = (scale * (dd - dn)) // dd
    nodes, si, di = _graph_index(g, src, dst)
    if len(nodes) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="object"),
                             "pr": pd.Series([], dtype="int64")})
    deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    if seed_fn is None:
        mask = np.ones(len(nodes), bool)
    else:
        mask = np.fromiter((bool(seed_fn(n)) for n in nodes),
                           bool, len(nodes))
    r = np.where(mask, np.int64(scale), np.int64(0))
    for _ in range(iterations):
        contrib = (dn * r[si]) // (dd * deg[si])
        nxt = np.where(mask, np.int64(base), np.int64(0))
        np.add.at(nxt, di, contrib)
        r = nxt
    return pd.DataFrame({"node": nodes, "pr": r})


def pagerank(edges_ds, iterations: int = 2, scale: int = 10 ** 12,
             damping_num: int = 85, damping_den: int = 100,
             num_buckets: int = 64, src: str = "src", dst: str = "dst",
             small_graph_edges: int | None = None,
             seed_fn=None):
    """Unnormalized integer PageRank (graphanalyze.py:32 semantics,
    distributed). Recurrence, replicated verbatim by the SQL oracle:

        r0(v)   = scale
        r_k(v)  = base + Σ_{u→v} (damping_num * r_{k-1}(u))
                               // (damping_den * outdeg(u))
        base    = (scale * (damping_den - damping_num)) // damping_den

    Dangling-node mass is dropped (the standard simplification when
    ranks are unnormalized). Per iteration: ONE bucketed join
    (edges+outdeg ⋈ ranks on src) and ONE bucketed re-aggregation by
    dst — both exchanges carry only (str node, int64) rows; document
    text never enters this stage. Returns Dataset(node, pr).

    ADAPTIVE WIDTH: a graph whose raw edge list is at most
    ``small_graph_edges`` runs the identical recurrence vectorized in
    ONE worker task (repartition(1) — still off-driver); iterating
    exchanges over a graph that fits a block is pure fixed cost. Pass
    ``small_graph_edges=0`` to force the distributed path (the tests
    exercising it do).

    PERSONALIZATION: ``seed_fn`` (node → bool, a pure function of the
    node string so membership needs no broadcast table) restricts the
    teleport set — r0 and the per-round base term apply only to seed
    nodes, zero elsewhere. That is personalized PageRank / TrustRank
    (Gyöngyi, Garcia-Molina & Pedersen, VLDB'04) with the same
    unnormalized-integer discipline; ``seed_fn=None`` keeps the
    uniform recurrence above.
    """
    base = (scale * (damping_den - damping_num)) // damping_den

    def _seed_mask(node_series: pd.Series) -> np.ndarray:
        return node_series.map(lambda n: bool(seed_fn(n))) \
            .to_numpy(dtype=bool)

    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES
    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_pagerank(g, iterations, scale, damping_num,
                                  damping_den, src, dst,
                                  seed_fn=seed_fn)
        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    e = distinct_edges(raw, src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(e, num_buckets)
    outdeg = degrees(e, src, num_buckets)
    # static per-edge table (src, dst, deg) — join once, reuse every
    # iteration (the reference recomputes nothing per networkx call
    # either; here it saves an exchange per round)
    static = bucket_join(e, outdeg, left_on=src,
                         num_buckets=num_buckets).materialize()
    nodes = _nodes(e, src, dst, num_buckets).materialize()

    def init(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["node"]].copy()
        if seed_fn is None:
            df["r"] = np.int64(scale)
        else:
            df["r"] = np.where(_seed_mask(df["node"]),
                               np.int64(scale), np.int64(0))
        return df

    def zero(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "c": np.zeros(len(df), np.int64)})

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r"].to_numpy(np.int64)
        d = df["deg"].to_numpy(np.int64)
        return pd.DataFrame({
            "node": df[dst],
            "c": (damping_num * r) // (damping_den * d),
        })

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["c"].sum()
        if seed_fn is None:
            b = base
        else:
            b = np.where(_seed_mask(out["node"]),
                         np.int64(base), np.int64(0))
        return pd.DataFrame({"node": out["node"],
                             "r": (b + out["c"]).astype("int64")})

    ranks = nodes.map_batches(init, batch_format="pandas")
    for _ in range(iterations):
        joined = bucket_join(static, ranks, left_on=src,
                             right_on="node", num_buckets=num_buckets)
        cont = (joined.map_batches(contrib, batch_format="pandas")
                # zero row per node: nodes with no in-edges still get
                # base, and the output keys every node every round
                .union(nodes.map_batches(zero, batch_format="pandas")))
        # coalesce the join∪zero union before the re-aggregation:
        # without it each iteration's state inherits the sum of its
        # inputs' block counts and the narrow-row sorts drown in task
        # scheduling (measured 1600 blocks / 3000 rows after 2 HITS
        # rounds before this fix)
        ranks = (cont.repartition(num_buckets)
                 .map_batches(part, batch_format="pandas")
                 .map_batches(_bucketize("node", num_buckets),
                              batch_format="pandas")
                 .groupby("_bucket")
                 .map_groups(total, batch_format="pandas")
                 ).materialize()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "pr": df["r"].astype("int64")})

    return ranks.map_batches(final, batch_format="pandas")


def _solo_labelprop(g, seed_pairs, iterations, src, dst):
    """The identical synchronous majority-update, vectorized over one
    block. ``seed_pairs`` is the bounded (node, label) seed list;
    duplicate seed rows for one node resolve to the SMALLEST label
    (the same rule the distributed _uniq_seed applies)."""
    seed_map: dict = {}
    for n, v in sorted(seed_pairs):
        if n not in seed_map:
            seed_map[n] = v
    nodes, si, di = _graph_index(g, src, dst)
    labels_sorted = sorted(set(seed_map.values()))
    lab_idx = {v: i for i, v in enumerate(labels_sorted)}
    L = len(labels_sorted)
    if L == 0:
        # no seeds ⇒ nothing is ever labeled (matches the
        # distributed path's empty seeds ∪ empty propagation)
        return pd.DataFrame({"node": pd.Series([], dtype="object"),
                             "label": pd.Series([], dtype="int64")})
    idx = {n: i for i, n in enumerate(nodes)}
    clamp = np.full(len(nodes), -1, np.int64)
    for n, v in seed_map.items():
        if n in idx:
            clamp[idx[n]] = lab_idx[v]
    cur = clamp.copy()
    for _ in range(iterations):
        lm = cur[si] >= 0
        counts = np.zeros((len(nodes), L), np.int64)
        np.add.at(counts, (di[lm], cur[si][lm]), 1)
        has = counts.sum(axis=1) > 0
        # argmax picks the FIRST max → smallest label index on ties
        nxt = np.where(has, np.argmax(counts, axis=1), -1)
        cur = np.where(clamp >= 0, clamp, nxt).astype(np.int64)
    mask = cur >= 0
    out_n = list(nodes[mask])
    out_l = [labels_sorted[i] for i in cur[mask]]
    # graph-absent seeds are still labeled (the bfs_depth convention)
    for n, v in sorted(seed_map.items()):
        if n not in idx:
            out_n.append(n)
            out_l.append(v)
    return pd.DataFrame({"node": pd.Series(out_n, dtype="object"),
                         "label": pd.Series(out_l, dtype="int64")})


def label_propagation(edges_ds, seeds_ds, iterations: int = 2,
                      num_buckets: int = 64, src: str = "src",
                      dst: str = "dst",
                      small_graph_edges: int | None = None):
    """Semi-supervised label propagation (Zhu & Ghahramani CMU-TR'02
    hard-clamp variant / Raghavan et al. PRE'07 LPA, synchronous):
    ``seeds_ds`` carries (node, label int64) ground-truth rows that
    stay CLAMPED; each round every non-seed node takes the majority
    label among its in-neighbors labeled in the PREVIOUS round
    (tie-break: count desc, label asc), and nodes with no labeled
    in-neighbor are unlabeled that round (pure memoryless update —
    the recurrence the SQL oracle unrolls). Symmetrize the edge list
    first for the undirected convention. Returns Dataset(node, label)
    for labeled nodes only; graph-absent seeds are emitted with their
    seed label (the bfs_depth convention).

    Scale shape per round: ONE bucketed labels⋈edges join on src and
    ONE dst-bucketed majority vote (count per (node, label) then the
    deterministic argmax inside the bucket — exact because a node's
    votes all hash to its bucket); seed clamping is a
    membership_join anti pass (broadcast set below threshold, Bloom +
    exact recheck above) + union, materialized per round (the
    pagerank loop discipline: O(1) lineage, ≤ 2 chained exchanges).
    Small graphs take the width-1 single-task path
    (``small_graph_edges=0`` forces distributed)."""
    from .joins import bucket_join, membership_join

    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES

    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        seed_pairs = sorted(
            (r["node"], int(r["label"]))
            for r in seeds_ds.select_columns(["node", "label"])
            .take_all())

        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_labelprop(g, seed_pairs, iterations, src, dst)

        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    e = distinct_edges(raw, src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(e, num_buckets)

    def _uniq_seed(g: pd.DataFrame) -> pd.DataFrame:
        # conflicting duplicate seed rows resolve to the SMALLEST
        # label — deterministic and identical to the solo path
        out = (g.sort_values(["node", "label"], kind="mergesort")
               .drop_duplicates(["node"])[["node", "label"]])
        out = out.reset_index(drop=True)
        out["label"] = out["label"].astype("int64")
        return out

    # seed rows may repeat per producing batch (the kg seed scan
    # emits per edge block) — dedup once by node hash
    seeds = (seeds_ds.map_batches(_bucketize("node", num_buckets),
                                  batch_format="pandas")
             .groupby("_bucket")
             .map_groups(_uniq_seed, batch_format="pandas")
             ).materialize()
    if seeds.count() == 0:
        # no seeds ⇒ nothing ever gets labeled; an all-empty dataset
        # also loses its schema, which would break the round joins
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"node": pd.Series([], dtype="object"),
             "label": pd.Series([], dtype="int64")}))

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["node", "label"], as_index=False)
             .agg(c=("label", "size"))
             .sort_values(["node", "c", "label"],
                          ascending=[True, False, True],
                          kind="mergesort"))
        out = c.drop_duplicates(["node"])[["node", "label"]]
        out = out.reset_index(drop=True)
        out["label"] = out["label"].astype("int64")
        return out

    labels = seeds
    for _ in range(iterations):
        hop = bucket_join(e, labels, left_on=src, right_on="node",
                          num_buckets=num_buckets)
        votes = hop.map_batches(
            lambda df: pd.DataFrame(
                {"node": df[dst].to_numpy(),
                 "label": df["label"].to_numpy()}),
            batch_format="pandas")
        prop = (votes.map_batches(_bucketize("node", num_buckets),
                                  batch_format="pandas")
                .groupby("_bucket")
                .map_groups(vote, batch_format="pandas"))
        nonseed = membership_join(prop, "node", seeds, "node",
                                  mode="anti", num_buckets=num_buckets)
        labels = seeds.union(nonseed).materialize()
    return labels


def _solo_hits(g, iterations, src, dst):
    """The identical HITS recurrence, vectorized over one block."""
    nodes, si, di = _graph_index(g, src, dst)
    if len(nodes) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="object"),
                             "hub": pd.Series([], dtype="int64"),
                             "auth": pd.Series([], dtype="int64")})
    h = np.ones(len(nodes), np.int64)
    a = np.zeros(len(nodes), np.int64)
    for _ in range(iterations):
        a = np.zeros(len(nodes), np.int64)
        np.add.at(a, di, h[si])
        h = np.zeros(len(nodes), np.int64)
        np.add.at(h, si, a[di])
    return pd.DataFrame({"node": nodes, "hub": h, "auth": a})


def hits(edges_ds, iterations: int = 2, num_buckets: int = 64,
         src: str = "src", dst: str = "dst",
         small_graph_edges: int | None = None):
    """Unnormalized integer HITS (graphanalyze.py:33). Recurrence,
    replicated verbatim by the SQL oracle:

        h0(u)  = 1
        a_k(v) = Σ_{u→v} h_{k-1}(u)
        h_k(u) = Σ_{u→v} a_k(v)

    Skipping the per-round float normalization keeps the state int64
    and bit-exactly SQL-checkable; magnitudes grow ~(E/N)^k per round,
    so keep ``iterations`` small or pre-scale — ordering matches
    normalized HITS after any fixed iteration count. Two bucketed
    join+aggregate exchanges per iteration. Returns
    Dataset(node, hub, auth). Same adaptive small-graph width-1 path
    as ``pagerank`` (``small_graph_edges=0`` forces distributed)."""

    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES
    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_hits(g, iterations, src, dst)
        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    e = distinct_edges(raw, src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(e, num_buckets)
    nodes = _nodes(e, src, dst, num_buckets).materialize()

    def init(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["node"]].copy()
        df["v"] = np.int64(1)
        return df

    def zero(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "c": np.zeros(len(df), np.int64)})

    def sum_to(out_key: str):
        """join rows carry (out_key target node, joined value v) —
        emit (node, c) pairs for re-aggregation."""
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df[out_key],
                                 "c": df["v"].to_numpy(np.int64)})
        return fn

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["c"].sum()
        return pd.DataFrame({"node": out["node"],
                             "v": out["c"].astype("int64")})

    def push(join_on: str, emit: str, state):
        """one half-step: edges ⋈ state on ``join_on``, sum v into
        the ``emit`` endpoint across all nodes."""
        joined = bucket_join(e, state, left_on=join_on,
                             right_on="node", num_buckets=num_buckets)
        cont = (joined.map_batches(sum_to(emit), batch_format="pandas")
                .union(nodes.map_batches(zero, batch_format="pandas")))
        # coalesce before the exchange — keeps per-half-step state at
        # num_buckets blocks instead of compounding every round (same
        # rationale as distinct_edges / the pagerank loop)
        return (cont.repartition(num_buckets)
                .map_batches(part, batch_format="pandas")
                .map_batches(_bucketize("node", num_buckets),
                             batch_format="pandas")
                .groupby("_bucket")
                .map_groups(total, batch_format="pandas")).materialize()

    h = nodes.map_batches(init, batch_format="pandas").materialize()
    a = None
    for _ in range(iterations):
        a = push(src, dst, h)   # a_k(v) = Σ_{u→v} h_{k-1}(u)
        h = push(dst, src, a)   # h_k(u) = Σ_{u→v} a_k(v)

    def tag(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            z = np.zeros(len(df), np.int64)
            v = df["v"].to_numpy(np.int64)
            return pd.DataFrame({
                "node": df["node"],
                "hub": v if col == "hub" else z,
                "auth": v if col == "auth" else z,
            })
        return fn

    both = (h.map_batches(tag("hub"), batch_format="pandas")
            .union(a.map_batches(tag("auth"), batch_format="pandas")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)[["hub", "auth"]].sum()
        out["hub"] = out["hub"].astype("int64")
        out["auth"] = out["auth"].astype("int64")
        return out

    return (both.repartition(num_buckets)
            .map_batches(_bucketize("node", num_buckets),
                         batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def random_walks(edges_ds, length: int = 4, num_buckets: int = 64,
                 src: str = "src", dst: str = "dst"):
    """DeepWalk-style walk corpus (Perozzi et al. KDD 2014 — public:
    truncated random walks as sentences for skip-gram training), made
    DETERMINISTIC so a SQL oracle replays every hop: from every node,
    one walk of ``length`` hops where hop k from node v picks
    neighbor rank ``md5(start|k|v) % outdeg(v)`` among v's neighbors
    ranked by (md5(dst), dst). Walks stop early at sinks.

    Scale shape: the ranked-neighbor table (src, r, dst, deg) is ONE
    exchange over the deduped edge list (per-src local rank — no
    global ordinal); each hop is one (src ⋈ frontier) bucketed join,
    state materialized per hop exactly like the pagerank loop. Only
    (start, step, node) rows ever move. Returns
    Dataset(start, step, node) with step 0 = the start node itself.
    """
    import hashlib

    e = distinct_edges(edges_ds, src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(e, num_buckets)

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[src, dst]].copy()
        df["_bucket"] = (_hash64(df[src])
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, grp in g.groupby(src, sort=False):
            ds_ = sorted(set(grp[dst]),
                         key=lambda d: (hashlib.md5(str(d).encode())
                                        .hexdigest(), d))
            outs.append(pd.DataFrame({
                "src": pd.Series([s] * len(ds_), dtype="object"),
                "r": pd.Series(range(len(ds_)), dtype="int64"),
                "dst": pd.Series(ds_, dtype="object"),
                "deg": pd.Series([len(ds_)] * len(ds_), dtype="int64"),
            }))
        if not outs:
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    ranked = (e.map_batches(rank_part, batch_format="pandas")
              .groupby("_bucket")
              .map_groups(rank_group, batch_format="pandas")).materialize()

    nodes = _nodes(e, src, dst, num_buckets).materialize()

    def start_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "start": df["node"].astype("object"),
            "node": df["node"].astype("object"),
        })

    frontier = nodes.map_batches(start_rows, batch_format="pandas")
    out_steps = [frontier.map_batches(
        lambda df: pd.DataFrame({
            "start": df["start"], "node": df["node"],
            "step": np.zeros(len(df), np.int64)}),
        batch_format="pandas")]

    from .joins import bucket_join

    for k in range(1, length + 1):

        def pick(df: pd.DataFrame, _k=k) -> pd.DataFrame:
            rs = [int(hashlib.md5(("%s|%d|%s" % (s, _k, v))
                                  .encode()).hexdigest()[:15], 16)
                  for s, v in zip(df["start"], df["node"])]
            out = pd.DataFrame({
                "start": df["start"].to_numpy(dtype=object),
                "node": df["node"].to_numpy(dtype=object),
                "_h": pd.Series(rs, dtype="int64"),
            })
            return out

        hashed = frontier.map_batches(pick, batch_format="pandas")
        joined = bucket_join(hashed, ranked, left_on="node",
                             right_on="src", num_buckets=num_buckets)

        def step_to(df: pd.DataFrame, _k=k) -> pd.DataFrame:
            d = df[df["r"] == df["_h"] % df["deg"]]
            return pd.DataFrame({
                "start": d["start"].to_numpy(dtype=object),
                "node": d["dst"].to_numpy(dtype=object),
                "step": np.full(len(d), _k, dtype="int64"),
            })

        stepped = (joined.map_batches(step_to, batch_format="pandas")
                   .materialize())
        out_steps.append(stepped)
        frontier = stepped.map_batches(
            lambda df: df[["start", "node"]], batch_format="pandas")

    walks = out_steps[0]
    for s_ in out_steps[1:]:
        walks = walks.union(s_)
    return walks.repartition(num_buckets)


def _solo_bfs(g: pd.DataFrame, seed_list, max_depth: int,
              src: str, dst: str) -> pd.DataFrame:
    """One-block multi-source BFS — identical level semantics."""
    g = g[g[src] != g[dst]].drop_duplicates([src, dst])
    adj: dict = {}
    for s, d in zip(g[src].to_numpy(), g[dst].to_numpy()):
        adj.setdefault(s, []).append(d)
    # every seed is labeled depth 0, graph-present or not — identical
    # to the distributed path's distinct_nodes(seeds) frontier
    depth = {n: 0 for n in seed_list}
    frontier = set(depth)
    for k in range(1, max_depth + 1):
        nxt = {d for f in frontier for d in adj.get(f, ())} - set(depth)
        for n in nxt:
            depth[n] = k
        frontier = nxt
        if not frontier:
            break
    items = sorted(depth.items())
    return pd.DataFrame({
        "node": pd.Series([n for n, _ in items], dtype="object"),
        "depth": pd.Series([d for _, d in items], dtype="int64")})


def bfs_depth(edges_ds, seeds_ds, max_depth: int = 3,
              num_buckets: int = 64, src: str = "src", dst: str = "dst",
              small_graph_edges: int | None = None):
    """Multi-source BFS levels from a seed set — the seed-propagation
    shape (TrustRank's 'distance from trusted pages', crawl-depth
    tiers, link-spam radius). Per hop: ONE bucketed frontier⋈edges
    join and ONE bucketed distinct of the discovered neighbors; the
    already-labeled anti-join runs through joins.membership_join
    (broadcast set below its threshold, Bloom + exact recheck above —
    both exact). Frontier and labeled set are materialized per hop
    (the pagerank loop discipline: O(1) lineage depth, and no operator
    ever chains more than two exchanges — the documented Ray 2.49
    nested-exchange hazard). Returns Dataset(node, depth 0..max_depth)
    for REACHED nodes only; unreached nodes are absent. Small graphs
    take the width-1 single-task path (same rationale as pagerank;
    ``small_graph_edges=0`` forces distributed)."""
    from .joins import bucket_join, membership_join

    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES

    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        # the seed set is ≤ the node set of a one-block graph — a
        # bounded pull, like the centroid contract
        seed_list = sorted({r["node"] for r in
                            seeds_ds.select_columns(["node"]).take_all()})

        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_bfs(g, seed_list, max_depth, src, dst)

        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    e = distinct_edges(raw, src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(e, num_buckets)

    def level(depth: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node"]].copy()
            out["depth"] = np.int64(depth)
            return out
        return fn

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])[["node"]]

    def distinct_nodes(ds):
        return (ds.repartition(num_buckets)
                .map_batches(_bucketize("node", num_buckets),
                             batch_format="pandas")
                .groupby("_bucket").map_groups(uniq, batch_format="pandas"))

    frontier = distinct_nodes(seeds_ds).materialize()
    levels = [frontier.map_batches(level(0), batch_format="pandas")]
    labeled = frontier
    for k in range(1, max_depth + 1):
        hop = bucket_join(e, frontier, left_on=src, right_on="node",
                          num_buckets=num_buckets)
        nbrs = hop.map_batches(
            lambda df: pd.DataFrame({"node": df[dst]}),
            batch_format="pandas")
        fresh = distinct_nodes(
            membership_join(nbrs, "node", labeled, "node", mode="anti")
        ).materialize()
        if fresh.count() == 0:
            break
        levels.append(fresh.map_batches(level(k), batch_format="pandas"))
        frontier = fresh
        labeled = labeled.union(fresh).materialize()

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cocitation_counts(edges_ds, src: str = "src", dst: str = "dst",
                      num_buckets: int = 64, max_targets: int = 64):
    """(a, b, inter) — how many pages cite BOTH a and b (a < b): the
    weighted form of cocitation_pairs. Same two-exchange shape —
    hash(src) co-locates each page's targets, per-bucket vectorized
    self-merge emits per-bucket pair COUNTS (a combiner: one row per
    (bucket, pair)), hash(a,b) merges them. ``max_targets`` caps hub
    explode exactly as in cocitation_pairs (never binds on the
    oracle-checked corpus: ≤ 3 targets/page)."""

    def per_src_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates([src, dst])
             .sort_values([src, dst], kind="mergesort")
             .groupby(src).head(max_targets))
        m = g.merge(g, on=src)
        m = m[m[dst + "_x"] < m[dst + "_y"]]
        out = pd.DataFrame({"a": m[dst + "_x"], "b": m[dst + "_y"]})
        cnt = out.groupby(["a", "b"]).size().reset_index(name="inter")
        cnt["inter"] = cnt["inter"].astype("int64")
        return cnt

    raw = (edges_ds.repartition(num_buckets)
           .map_batches(_bucketize(src, num_buckets),
                        batch_format="pandas")
           .groupby("_bucket").map_groups(per_src_counts,
                                          batch_format="pandas"))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df["a"].astype(str) + "\x1f" + df["b"].astype(str)
        df["_bucket"] = (_hash64(key)
                         % np.uint64(num_buckets)).astype("int32")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["inter"].sum()
        out["inter"] = out["inter"].astype("int64")
        return out

    return (raw.map_batches(prep, batch_format="pandas")
            .groupby("_bucket").map_groups(merge, batch_format="pandas"))


def neighbor_jaccard(edges_ds, jn: int = 1, jd: int = 2,
                     src: str = "src", dst: str = "dst",
                     num_buckets: int = 64, max_targets: int = 64):
    """Mirror-site / duplicate-entity candidates: target pairs whose
    in-link neighborhoods overlap with Jaccard ≥ jn/jd, decided by the
    EXACT integer cross-multiplication inter·jd ≥ (|A|+|B|−inter)·jn —
    no float ratio crosses an engine boundary. Built from bounded
    pieces: co-citation pair counts (two exchanges, combiner inside),
    in-degrees (combiner + one exchange), then two bucket joins to
    attach |A| and |B|; pair counts and degrees are materialized first
    so no operator chains more than two exchanges (the documented Ray
    2.49 DAG hazard). Returns (a, b, inter, union_n)."""
    e = distinct_edges(edges_ds, src, dst, num_buckets).materialize()
    nb = _adapt_buckets(e, num_buckets)
    pairs = cocitation_counts(e, src, dst, nb, max_targets).materialize()
    ind = degrees(e, dst, nb, out_col="d").materialize()

    j1 = bucket_join(pairs, ind, left_on="a", right_on=dst,
                     num_buckets=nb)
    j2 = bucket_join(j1, ind, left_on="b", right_on=dst,
                     num_buckets=nb, suffix="_b")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        inter = df["inter"].astype("int64")
        da = df["d"].astype("int64")
        db = df["d_b"].astype("int64")
        un = da + db - inter
        keep = inter * jd >= un * jn
        out = pd.DataFrame({"a": df["a"], "b": df["b"],
                            "inter": inter, "union_n": un})[keep]
        return out.reset_index(drop=True)

    return j2.map_batches(final, batch_format="pandas")


def _node_registers(nodes, hll_p: int = 8):
    """(reg, rank) per node string — md5 60-bit parse, low ``hll_p``
    bits register, leading-zero rank in the remaining window: the
    hll_user_registers hash convention, shared bit-exactly with SQL
    (CAST('0x'||substr(md5(node),1,15) AS BIGINT))."""
    import hashlib

    regs, ranks = [], []
    w = 60 - hll_p
    for n in nodes:
        h = int(hashlib.md5(str(n).encode()).hexdigest()[:15], 16)
        rem = h >> hll_p
        regs.append(h % (1 << hll_p))
        ranks.append(w - rem.bit_length() + 1 if rem else w + 1)
    return regs, ranks


def neighborhood_registers(edges_ds, rounds: int = 2, hll_p: int = 8,
                           num_buckets: int = 64,
                           src: str = "src", dst: str = "dst",
                           small_graph_edges: int | None = None):
    """Approximate Neighborhood Function state (ANF, Palmer et al.
    KDD'02; HyperBall, Boldi & Vigna WWW'11): per-node HyperLogLog
    registers of the radius-``rounds`` ball over the SYMMETRIZED
    graph — the web-graph primitive behind neighborhood-size,
    effective-diameter and centrality estimation, computable where
    the exact ball (quadratic state) is not.

    State is rows ``(node, reg, max_rank)``; a round is register
    flow along edges (one bucketed state⋈edges join) + a max-merge
    per (node, reg) (one bucketed exchange), materialized per round
    (the pagerank loop discipline). Register max is associative, so
    any partial tree is exact and the final state is EXACTLY
    SQL-replayable by unrolling the k-hop ball; the float ball-size
    estimate on top is ``queries.hll_estimate`` (unit-tested
    separately — the register STATE is what the correctness gate
    hashes). Small graphs take the width-1 single-task path."""
    from .joins import bucket_join

    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES

    raw = edges_ds.materialize()

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({src: t[dst], dst: t[src]})

    if raw.count() <= small_graph_edges:
        def solo(g: pd.DataFrame) -> pd.DataFrame:
            s = np.concatenate([g[src].to_numpy(), g[dst].to_numpy()])
            d = np.concatenate([g[dst].to_numpy(), g[src].to_numpy()])
            e = pd.DataFrame({"s": s, "d": d})
            e = e[e["s"] != e["d"]].drop_duplicates()
            nodes = pd.unique(np.concatenate(
                [e["s"].to_numpy(), e["d"].to_numpy()]))
            regs, ranks = _node_registers(nodes, hll_p)
            st = pd.DataFrame({"node": nodes,
                               "reg": pd.Series(regs, dtype="int64"),
                               "max_rank": pd.Series(ranks,
                                                     dtype="int64")})
            for _ in range(rounds):
                c = st.merge(e, left_on="node", right_on="s")
                c = pd.DataFrame({"node": c["d"].to_numpy(),
                                  "reg": c["reg"].to_numpy(),
                                  "max_rank": c["max_rank"].to_numpy()})
                st = (pd.concat([st, c], ignore_index=True)
                      .groupby(["node", "reg"], as_index=False)
                      ["max_rank"].max())
            st["reg"] = st["reg"].astype("int64")
            st["max_rank"] = st["max_rank"].astype("int64")
            return st[["node", "reg", "max_rank"]]

        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    e = distinct_edges(
        raw.union(raw.map_batches(rev, batch_format="pyarrow")),
        src, dst, num_buckets).materialize()
    nb = _adapt_buckets(e, num_buckets)

    def seed_regs(df: pd.DataFrame) -> pd.DataFrame:
        regs, ranks = _node_registers(df["node"].to_numpy(), hll_p)
        return pd.DataFrame({
            "node": pd.Series(df["node"].to_numpy(), dtype=object),
            "reg": pd.Series(regs, dtype="int64"),
            "max_rank": pd.Series(ranks, dtype="int64")})

    def maxmerge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["node", "reg"], as_index=False)["max_rank"].max()
        out["reg"] = out["reg"].astype("int64")
        out["max_rank"] = out["max_rank"].astype("int64")
        return out[["node", "reg", "max_rank"]]

    state = (_nodes(e, src, dst, nb)
             .map_batches(seed_regs, batch_format="pandas")
             .materialize())
    for _ in range(rounds):
        hop = bucket_join(state, e, left_on="node", right_on=src,
                          num_buckets=nb)
        contrib = hop.map_batches(
            lambda df: pd.DataFrame({
                "node": df[dst].to_numpy(),
                "reg": df["reg"].to_numpy(),
                "max_rank": df["max_rank"].to_numpy()}),
            batch_format="pandas")
        state = (state.union(contrib)
                 .repartition(nb)
                 .map_batches(_bucketize("node", nb),
                              batch_format="pandas")
                 .groupby("_bucket")
                 .map_groups(maxmerge, batch_format="pandas")
                 .materialize())
    return state


def _solo_resource_allocation(g: pd.DataFrame, scale: int,
                              max_degree: int, topk: int,
                              src: str, dst: str) -> pd.DataFrame:
    """The identical RA computation, vectorized over one block."""
    s = np.concatenate([g[src].to_numpy(), g[dst].to_numpy()])
    d = np.concatenate([g[dst].to_numpy(), g[src].to_numpy()])
    e = pd.DataFrame({"s": s, "d": d})
    e = e[e["s"] != e["d"]].drop_duplicates()
    deg = e.groupby("s")["d"].transform("size")
    el = e[deg <= max_degree]
    per_z = el.groupby("s", as_index=False).size()
    wmap = dict(zip(per_z["s"],
                    (scale // per_z["size"].to_numpy()).astype("int64")))
    m = el.merge(el, on="s")
    m = m[m["d_x"] < m["d_y"]]
    sc = (pd.DataFrame({"a": m["d_x"].to_numpy(),
                        "b": m["d_y"].to_numpy(),
                        "w": m["s"].map(wmap).to_numpy()})
          .groupby(["a", "b"], as_index=False)["w"].sum())
    en = e[e["s"] < e["d"]].rename(columns={"s": "a", "d": "b"})
    sc = sc.merge(en, on=["a", "b"], how="left", indicator=True)
    sc = sc[(sc["_merge"] == "left_only") & (sc["w"] > 0)]
    out = (sc.sort_values(["w", "a", "b"],
                          ascending=[False, True, True]).head(topk)
           .rename(columns={"w": "score"}))
    out["score"] = out["score"].astype("int64")
    return out[["a", "b", "score"]].reset_index(drop=True)


def resource_allocation(edges_ds, scale: int = 10 ** 6,
                        max_degree: int = 64, topk: int = 50,
                        num_buckets: int = 64,
                        src: str = "src", dst: str = "dst",
                        small_graph_edges: int | None = None):
    """Link prediction by the resource-allocation index (Zhou, Lü &
    Zhang, Eur. Phys. J. B 71 2009): for node pairs (u, w) NOT already
    adjacent, score = Σ_{z ∈ N(u)∩N(w)} floor(scale / deg(z)) over the
    SYMMETRIZED graph — common neighbors weighted inversely by their
    degree, the strongest of the classic local similarity indices.
    Deterministic top-``topk`` by (score DESC, u, w).

    All-integer floor-division weights so a SQL oracle replays every
    score bit-exactly. ``max_degree`` SKIPS hub intermediaries
    entirely (deg(z) > cap contributes ⌊scale/deg⌋ ≈ 0 anyway) —
    an exact, SQL-replicable cap (WHERE deg ≤ cap), unlike a lossy
    truncation; it also bounds the per-z pair explode quadratically.

    Scale shape: exchange 1 hash(z)-buckets the symmetric edge list so
    each z's full neighborhood is co-located — deg(z) and the weighted
    per-bucket pair PARTIALS (one row per (bucket, pair) — a combiner)
    compute vectorized; exchange 2 hash(u,w)-buckets partials UNIONed
    with the (materialized) normalized edge list to finalize sums and
    drop already-adjacent pairs, then takes its LOCAL top-k; the
    bounded buckets×k partials coalesce in one final block. Follows
    the scrub/decontaminate two-exchange discipline (CLAUDE.md DAG
    hazard): the unioned edge side is materialized. Small graphs take
    the width-1 single-task path (same rationale as pagerank: two
    64-wide exchanges cost seconds of fixed scheduling against
    milliseconds of compute; measured 7.7 s → sub-second at sf0.1)."""
    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES

    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_resource_allocation(g, scale, max_degree,
                                             topk, src, dst)

        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    sym = distinct_edges(
        raw.union(raw.map_batches(
            lambda t: pa.table({src: t[dst], dst: t[src]}),
            batch_format="pyarrow")),
        src, dst, num_buckets).materialize()
    num_buckets = _adapt_buckets(sym, num_buckets)

    def per_z_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[src, dst]]
        deg = g.groupby(src)[dst].transform("size")
        g = g[deg <= max_degree]
        if g.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype="int64"),
                                 "is_edge": pd.Series([], dtype="int8")})
        per_z = g.groupby(src, as_index=False).size()
        wmap = dict(zip(per_z[src],
                        (scale // per_z["size"].to_numpy()).astype("int64")))
        m = g.merge(g, on=src)
        m = m[m[dst + "_x"] < m[dst + "_y"]]
        out = pd.DataFrame({"a": m[dst + "_x"], "b": m[dst + "_y"],
                            "w": m[src].map(wmap).astype("int64")})
        out = out.groupby(["a", "b"], as_index=False)["w"].sum()
        out["w"] = out["w"].astype("int64")
        out["is_edge"] = np.int8(0)
        return out

    partials = (sym.repartition(num_buckets)
                .map_batches(_bucketize(src, num_buckets),
                             batch_format="pandas")
                .groupby("_bucket").map_groups(per_z_partials,
                                               batch_format="pandas"))

    def edge_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df[src] < df[dst]]
        return pd.DataFrame({"a": df[src].astype(object),
                             "b": df[dst].astype(object),
                             "w": np.zeros(len(df), np.int64),
                             "is_edge": np.full(len(df), 1, np.int8)})

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df["a"].astype(str) + "\x1f" + df["b"].astype(str)
        df["_bucket"] = (_hash64(key)
                         % np.uint64(num_buckets)).astype("int32")
        return df

    # explicit Arrow schema so an all-empty result keeps its columns
    # (memory: ray-empty-dataset-schema-loss)
    out_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("score", pa.int64())])

    def _typed(out: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(out[["a", "b", "score"]],
                                    schema=out_schema,
                                    preserve_index=False)

    def finalize(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["a", "b"], as_index=False).agg(
            score=("w", "sum"), has_edge=("is_edge", "max"))
        agg = agg[(agg["has_edge"] == 0) & (agg["score"] > 0)]
        agg = agg.sort_values(["score", "a", "b"],
                              ascending=[False, True, True]).head(topk)
        agg["score"] = agg["score"].astype("int64")
        return _typed(agg)

    tagged = partials.union(
        sym.map_batches(edge_rows, batch_format="pyarrow"))
    per_bucket = (tagged.map_batches(pair_bucket, batch_format="pandas")
                  .groupby("_bucket").map_groups(finalize,
                                                 batch_format="pandas"))

    def merge_top(df: pd.DataFrame) -> pa.Table:
        df = df[df["score"] >= 0]  # drop the schema sentinel
        out = (df.sort_values(["score", "a", "b"],
                              ascending=[False, True, True])
               .head(topk).reset_index(drop=True))
        out["score"] = out["score"].astype("int64")
        return _typed(out)

    import ray.data as rd

    # one SENTINEL row (score=-1, dropped in merge_top) guarantees the
    # merge UDF runs even when every bucket is empty — Ray skips the
    # UDF on zero-row input, emitting a schema-less block that an
    # all-empty dataset can't recover from
    # (memory: ray-empty-dataset-schema-loss)
    sentinel = rd.from_arrow(pa.table(
        {"a": [""], "b": [""], "score": [-1]}, schema=out_schema))
    return per_bucket.union(sentinel).repartition(1).map_batches(
        merge_top, batch_format="pandas", batch_size=None)


def _solo_kcore(g: pd.DataFrame, k: int, rounds: int,
                src: str, dst: str) -> pd.DataFrame:
    """The identical peel recurrence, vectorized over one block."""
    nodes, si, di = _graph_index(g, src, dst)
    if len(nodes) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="object"),
                             "deg": pd.Series([], dtype="int64")})
    # symmetrize in index space; dedup undirected duplicates
    s2 = np.concatenate([si, di])
    d2 = np.concatenate([di, si])
    key = np.unique(s2 * np.int64(len(nodes)) + d2)
    s2 = key // len(nodes)
    d2 = key % len(nodes)
    alive = np.ones(len(nodes), dtype=bool)
    deg = np.bincount(s2, minlength=len(nodes)).astype(np.int64)
    for _ in range(rounds):
        live = alive[s2] & alive[d2]
        deg = np.bincount(s2[live], minlength=len(nodes)).astype(np.int64)
        alive &= deg >= k
    return pd.DataFrame({"node": nodes[alive], "deg": deg[alive]})


def kcore(edges_ds, k: int = 2, rounds: int = 4, num_buckets: int = 64,
          src: str = "src", dst: str = "dst",
          small_graph_edges: int | None = None):
    """k-core decomposition by iterative peeling over the UNDIRECTED
    (symmetrized, deduplicated, self-loop-free) graph — the classic
    web-graph curation/spam-analysis operator (a page in a thin link
    neighborhood peels away; dense cores survive). Each round
    recomputes degrees over the survivor-induced subgraph and drops
    nodes below ``k``. Peeling is monotone and idempotent at the
    fixpoint, so a FIXED ``rounds`` count (the bfs_depth discipline)
    keeps the SQL oracle an exact unrolled replay; with ``rounds`` ≥
    the true peel depth the result IS the exact k-core.

    Returns (node, deg) for nodes surviving round ``rounds``, with
    ``deg`` the node's degree among the previous round's survivors
    (at the fixpoint: its k-core degree).

    Scale shape: per round, two hash-bucketed semi-joins restrict the
    symmetric edge list to live endpoints and one combiner-first
    degree exchange recounts — each round is materialized so no
    operator chains more than two exchanges (the documented Ray 2.49
    DAG hazard) and lineage stays O(1) deep. Small graphs take the
    width-1 single-task path (``small_graph_edges=0`` forces the
    distributed one, as in pagerank)."""
    if small_graph_edges is None:
        small_graph_edges = SMALL_GRAPH_EDGES
    assert k >= 1 and rounds >= 1

    raw = edges_ds.materialize()
    if raw.count() <= small_graph_edges:
        def solo(g: pd.DataFrame) -> pd.DataFrame:
            return _solo_kcore(g, k, rounds, src, dst)

        return raw.repartition(1).map_batches(
            solo, batch_format="pandas", batch_size=None)

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({src: df[dst].to_numpy(),
                             dst: df[src].to_numpy()})

    sym = distinct_edges(
        raw.union(raw.map_batches(rev, batch_format="pandas")),
        src, dst, num_buckets).materialize()
    nb = _adapt_buckets(sym, num_buckets)

    deg = degrees(sym, src, nb).materialize()
    alive = None
    for r in range(rounds):
        if r:
            e1 = bucket_join(sym, alive, left_on=src, right_on="node",
                             num_buckets=nb).materialize()
            e2 = bucket_join(e1, alive, left_on=dst, right_on="node",
                             num_buckets=nb).materialize()
            deg = degrees(e2, src, nb).materialize()

        def survivors(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["deg"] >= k]
            return pd.DataFrame({"node": d[src].to_numpy()})

        alive = deg.map_batches(survivors,
                                batch_format="pandas").materialize()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["deg"] >= k]
        return pd.DataFrame({"node": d[src].to_numpy(),
                             "deg": d["deg"].to_numpy(dtype="int64")})

    return deg.map_batches(final, batch_format="pandas")
