"""Entity canonicalization: connected components over sameAs edges,
canonical remap of triples, exact triple dedup.

Reference semantics: ``owl:sameAs`` equivalence expansion
(lagen/nu/sameas.py:53-88 minting; sources/general/graphanalyze.py:171-225
consumption) — every URI in a sameAs-connected component is rewritten
to one canonical representative. The representative is the
**lexicographically smallest URI** of the component (deterministic,
cluster-independent).

Ray shape (SURVEY §7 M4 — the only multi-round shuffle in the DAG):

- ``connected_components_distributed``: batch-local union-find
  contraction, then hash-to-min rounds (one groupby exchange per
  round, O(log diameter) rounds; block-local components finish in
  the contraction pass).
- ``canonical_map``: driver-side union-find fast path when the edge
  set is small enough to collect (entity graphs are orders of
  magnitude smaller than the page corpus — at 10^12 docs the entity
  graph is ~10^8 edges; above ``driver_threshold`` the distributed
  path runs and the result stays a Dataset).
- ``remap_triples``: broadcast the canon map once (``ray.put``),
  rewrite subj/obj map-side — no shuffle of the triples.
- ``dedup_exact_triples``: per-batch exact dedup combiner (the
  skew/salting mitigation: a triple asserted by millions of pages
  collapses once per block before any exchange) then one streaming
  hash-bucket groupby — or no exchange at all under the proven
  ``doc_local`` scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------
# union-find (driver-side exact path)
# ---------------------------------------------------------------------

def union_find(edges) -> dict[str, str]:
    """Exact connected components; representative = lexicographic min."""
    parent: dict[str, str] = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {u: find(u) for u in parent}


# ---------------------------------------------------------------------
# distributed connected components
# ---------------------------------------------------------------------

def _flat(col) -> pa.Array:
    """ChunkedArray | Array → single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # older pyarrow returns chunked
        col = pa.concat_arrays(col.chunks)
    return col


def connected_components_distributed(edges_ds, max_rounds: int = 30):
    """edges(uri_a, uri_b) → Dataset(node, label), label = component
    representative (min URI).

    Algorithm: **hash-to-min** (Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE 2013 —
    public literature). Each node v keeps a cluster set C(v)
    (initially v + neighbors); per round it sends C(v) to
    m = min(C(v)) and {m} to every other member; new C(v) = union of
    received sets. Converges in O(log diameter) rounds — the 200-node
    chain fixture needs ~9 — and each round is exactly ONE
    groupby(node) exchange (vs 2-3 for label-propagation + pointer
    jumping). Hazard at scale: the representative of a giant
    component accumulates the full member set on one reducer; cap
    with the driver union-find path (canonical_map) or a two-phase
    split when components are known to be huge.
    """
    import zlib

    NUM_BUCKETS = 64

    def _with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # int hash bucket of the destination node: the per-round
        # exchange groups per BUCKET (vectorized merge inside), never
        # one Ray group / one pandas frame per node
        h = pd.util.hash_pandas_object(df["node"], index=False).values
        df["_bucket"] = (h % np.uint64(NUM_BUCKETS)).astype("int32")
        return df

    def local_contract(t: pa.Table) -> pd.DataFrame:
        """Batch-local contraction: exact union-find over the edges in
        THIS batch, then emit each local component in hash-to-min
        message form ((min, members) + (u, [min])). A component fully
        contained in one batch needs zero further rounds — for
        block-local graphs (e.g. chains generated per group) this
        collapses the round count from O(log diameter) to O(1)."""
        a = _flat(t["uri_a"]).to_pylist()
        b = _flat(t["uri_b"]).to_pylist()
        canon = union_find(list(zip(a, b)))
        comp: dict[str, list] = {}
        for node, root in canon.items():
            comp.setdefault(root, []).append(node)
        dest, mem = [], []
        for root, members in comp.items():
            members = sorted(members)
            dest.append(root)
            mem.append(members)
            for u in members:
                if u != root:
                    dest.append(u)
                    mem.append([root])
        return _with_bucket(pd.DataFrame({"node": dest, "members": mem}))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        nodes, mems = [], []
        for node, grp in g.groupby("node", sort=False):
            s: set = set()
            for mm in grp["members"]:
                s.update(mm)
            nodes.append(node)
            mems.append(sorted(s))
        return pd.DataFrame({"node": nodes, "members": mems})

    clusters = (
        edges_ds.map_batches(local_contract, batch_format="pyarrow")
        .groupby("_bucket").map_groups(merge, batch_format="pandas")
        .materialize()
    )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        dest: list = []
        mem: list = []
        for node, members in zip(df["node"], df["members"]):
            members = sorted(set(members))
            m = members[0]
            dest.append(m)
            mem.append(members)
            for u in members:
                if u != m:
                    dest.append(u)
                    mem.append([m])
        return _with_bucket(pd.DataFrame({"node": dest, "members": mem}))

    def signature(cl) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            total = 0
            for node, members in zip(df["node"], df["members"]):
                total += zlib.crc32(("%s\x00%s" % (node, min(members))).encode())
            return pd.DataFrame({"h": [total % (1 << 61)]})

        return int(cl.map_batches(h, batch_format="pandas").sum("h") or 0) % (1 << 61)

    # convergence check = one extra (small) execution — sample it
    # every other round: worst case costs one surplus round, saves
    # half the fixed per-execution overhead of the check
    prev_sig = signature(clusters)
    for rnd in range(max_rounds):
        clusters = (
            clusters.map_batches(emit, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(merge, batch_format="pandas")
            .materialize()
        )
        if rnd % 2 == 0:
            continue
        sig = signature(clusters)
        if sig == prev_sig:
            break
        prev_sig = sig

    return clusters.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"],
            "label": [min(m) for m in df["members"]],
        }),
        batch_format="pandas",
    )


def connected_components_starcontract(edges_ds, max_rounds: int = 50):
    """edges(uri_a, uri_b) → Dataset(node, label): alternating
    **large-star / small-star** contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 —
    public literature).

    The giant-component-safe alternative to hash-to-min: state is
    always a flat (node, neighbor) PAIR list — no row ever carries a
    member set — and every reducer step is a vectorized per-bucket
    ``groupby(node).min()``. A hub node's adjacency still lands in
    one hash bucket, but as a flat string column min-reduced by
    pandas, not a Python set-of-sets; memory per bucket is O(bucket
    share of edges), and the output star is (member → center) pairs
    spread across buckets. Two exchanges per round (vs hash-to-min's
    one), same O(log n) round bound — use this when components may be
    a large fraction of the graph.

    * large-star: for each node u, connect every neighbor v > u to
      m = min(N(u) ∪ {u}).
    * small-star: connect every neighbor v ≤ u (and u itself) to m.

    Converged when the edge multiset is a fixpoint (every node points
    directly at its component min)."""
    import zlib

    NUM_BUCKETS = 64

    def _bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["u"], index=False).values
        return df.assign(_bucket=(h % np.uint64(NUM_BUCKETS))
                         .astype("int32"))

    _EMPTY = {"u": pd.Series(dtype="object"), "v": pd.Series(dtype="object")}

    def init(t: pa.Table) -> pd.DataFrame:
        a = _flat(t["uri_a"]).to_pylist()
        b = _flat(t["uri_b"]).to_pylist()
        # self-loops keep every node present through to the fixpoint
        df = pd.DataFrame({"u": a + b, "v": b + a})
        df = pd.concat([df, pd.DataFrame({"u": a + b, "v": a + b})],
                       ignore_index=True)
        return _bucketize(df.drop_duplicates())

    def mirror(df: pd.DataFrame) -> pd.DataFrame:
        # large-star groups every node with ALL its neighbors, so the
        # oriented (bigger → smaller) state must be re-mirrored map-side
        # each round (the reverse edge belongs to the OTHER endpoint's
        # bucket, so this cannot happen inside the reducer)
        both = pd.concat(
            [df[["u", "v"]],
             df[["u", "v"]].rename(columns={"u": "v", "v": "u"})],
            ignore_index=True).drop_duplicates()
        return _bucketize(both)

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _bucketize(pd.DataFrame(_EMPTY))
        m = g.groupby("u", sort=False)["v"].transform("min")
        m = np.minimum(m.values, g["u"].values)  # min(N(u) ∪ {u})
        keep = g["v"].values > g["u"].values
        out = pd.DataFrame({"u": g["v"].values[keep], "v": m[keep]})
        return _bucketize(out.drop_duplicates())

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _bucketize(pd.DataFrame(_EMPTY))
        # input is oriented (u ≥ v); every neighbor and u itself link
        # to the min
        m = g.groupby("u", sort=False)["v"].transform("min")
        m = np.minimum(m.values, g["u"].values)
        out = pd.concat(
            [pd.DataFrame({"u": g["v"].values, "v": m}),
             pd.DataFrame({"u": g["u"].values, "v": m})],
            ignore_index=True)
        return _bucketize(out.drop_duplicates())

    def signature(ds) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            total = 0
            for u, v in zip(df["u"], df["v"]):
                total += zlib.crc32(("%s\x00%s" % (u, v)).encode())
            return pd.DataFrame({"h": [total % (1 << 61)]})

        return int(ds.map_batches(h, batch_format="pandas").sum("h") or 0) \
            % (1 << 61)

    pairs = (edges_ds.map_batches(init, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(lambda g: _bucketize(g[["u", "v"]].drop_duplicates()),
                         batch_format="pandas")
             .materialize())
    prev_sig = signature(pairs)
    for _ in range(max_rounds):
        pairs = (pairs.map_batches(mirror, batch_format="pandas")
                 .groupby("_bucket")
                 .map_groups(large_star, batch_format="pandas")
                 .groupby("_bucket")
                 .map_groups(small_star, batch_format="pandas")
                 .materialize())
        sig = signature(pairs)
        if sig == prev_sig:
            break
        prev_sig = sig

    # fixpoint state: u → component min for every node (self-loop for
    # the representative itself)
    def emit(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "label": pd.Series(dtype="object")})
        lab = g.groupby("u", sort=False)["v"].min()
        return pd.DataFrame({"node": lab.index.to_numpy(dtype=object),
                             "label": lab.to_numpy(dtype=object)})

    return (pairs.groupby("_bucket")
            .map_groups(emit, batch_format="pandas"))


DRIVER_THRESHOLD = 5_000_000


def canonical_map(edges_ds, driver_threshold: int | None = None):
    """edges Dataset → {uri: canonical_uri} dict (small path) or a
    (node, label) Dataset (distributed path)."""
    if driver_threshold is None:
        driver_threshold = DRIVER_THRESHOLD
    n = edges_ds.count()
    if n <= driver_threshold:
        tbl = edges_ds.to_pandas()
        return union_find(list(zip(tbl["uri_a"], tbl["uri_b"])))
    return connected_components_distributed(edges_ds)  # pragma: no cover


# ---------------------------------------------------------------------
# canonical remap + exact dedup
# ---------------------------------------------------------------------

def remap_triples(triples_ds, canon_map):
    """Rewrite subj/obj through the canon map — broadcast once via
    ``ray.put``, applied map-side with pandas ``Series.map`` (no
    shuffle of the triples)."""
    import ray

    ref = canon_map if isinstance(canon_map, ray.ObjectRef) else ray.put(canon_map)

    from ..schemas import TRIPLES

    def remap(df: pd.DataFrame) -> pa.Table:
        canon = ray.get(ref)
        if canon:
            df["subj"] = df["subj"].map(canon).fillna(df["subj"])
            is_uri = ~df["obj_is_literal"]
            mapped = df.loc[is_uri, "obj"].map(canon)
            df.loc[is_uri, "obj"] = mapped.fillna(df.loc[is_uri, "obj"])
        # Arrow out with the declared schema: this stage is unioned with
        # from_arrow datasets, and mixed pandas/Arrow blocks draw
        # RefBundle schema warnings downstream
        return pa.Table.from_pandas(df, schema=TRIPLES,
                                    preserve_index=False)

    return triples_ds.map_batches(remap, batch_format="pandas")


TRIPLE_KEY = ["subj", "pred", "obj", "obj_is_literal", "obj_lang",
              "obj_datatype"]


def _joined_key(t: pa.Table):
    """Unit-separator-joined triple identity as one Arrow string column
    (hashing input only — exact comparisons always use the individual
    key columns). NOT NUL-joined: pandas' C string hashing truncates
    at embedded NULs, which made every shared-subject prefix collide.
    """
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        t["subj"], t["pred"], t["obj"],
        pc.cast(t["obj_is_literal"], pa.string()), t["obj_lang"],
        t["obj_datatype"], "\x1f")


def dedup_exact_triples(triples_ds, num_buckets: int = 64,
                        scope: str = "global"):
    """Exact triple dedup as a streaming partitioned hash dedup.

    ``scope="doc_local"`` skips the global exchange and dedups within
    batches only. That is EXACT — not approximate — whenever duplicate
    triples cannot span batches: in the KG DAG every emitted triple's
    subject embeds the URL of the page that produced it, one page's
    rows never split across batches, page-URI subjects are not in the
    canon map (so the remap cannot merge subjects from different
    pages), and the corpus-level sameAs table is unique by
    construction. Under those invariants the global shuffle is a
    provable no-op — at 340k pages it moved 9M string rows (~2 GB) to
    remove zero duplicates and capped scaling. Use "global" whenever
    the input's provenance doesn't guarantee subject-locality.

    The full semantic identity (subj, pred, obj, obj_is_literal,
    obj_lang) is the dedup key — two literals differing only in
    language tag are different triples; among duplicates the min
    ``source_url`` row survives (deterministic provenance).

    Plan: (1) exact per-batch dedup combiner — collapses hot triples
    before the exchange (the skew mitigation); (2) int32 content-hash
    bucket column; (3) ONE groupby on the bucket with a vectorized
    pandas dedup per bucket. Same-key rows always land in the same
    bucket, so the result is exact, and the whole thing stays a
    single streaming shuffle — no mid-pipeline materialization.

    Designs measured on 2.25M triples @32 CPUs: per-group
    ``map_groups(head(1))`` 60-90s; multi-key string aggregate 89s;
    a hash-first variant that materialized + counted hashes to skip
    the full-row shuffle looked cheaper in isolation but LOST overall
    (the extra materialize + 2 executions cost more than the
    pipelined shuffle it avoided); this streaming shape wins.
    """
    if scope == "doc_local":
        def local_only(t: pa.Table) -> pa.Table:
            keep = ~t.select(TRIPLE_KEY).to_pandas().duplicated().values
            return t.filter(pa.array(keep))

        return triples_ds.map_batches(local_only, batch_format="pyarrow")

    def local(t: pa.Table) -> pa.Table:
        # exact in-batch dedup over the key COLUMNS (first wins), then
        # an int32 hash bucket — arrow blocks through the shuffle
        keep = ~t.select(TRIPLE_KEY).to_pandas().duplicated().values
        jpd = _joined_key(t).to_pandas()
        h = pd.util.hash_pandas_object(jpd, index=False).values.view("int64")
        t = t.append_column(
            "_bucket", pa.array((h % num_buckets).astype("int32")))
        return t.filter(pa.array(keep))

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(TRIPLE_KEY + ["source_url"], kind="mergesort")
        g = g.drop_duplicates(subset=TRIPLE_KEY)
        return g.drop(columns=["_bucket"])

    return (
        triples_ds.map_batches(local, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


def sameas_triples(canon: dict[str, str]) -> pa.Table:
    """The owl:sameAs assertions retained in the output graph:
    one (uri, owl:sameAs, canonical) triple per non-representative."""
    subj, obj = [], []
    for u, c in sorted(canon.items()):
        if u != c:
            subj.append(u)
            obj.append(c)
    n = len(subj)
    return pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(["owl:sameAs"] * n, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "obj_is_literal": pa.array([False] * n, pa.bool_()),
        "obj_lang": pa.array([""] * n, pa.string()),
        "obj_datatype": pa.array([""] * n, pa.string()),
        "source_url": pa.array([""] * n, pa.string()),
    })
