"""graph.pagerank / hits / degree_distribution vs a pure-Python
reference implementation of the same integer recurrences, on a small
cyclic multigraph (duplicate edges + a self-loop that must be
normalized away, graphanalyze.py:440-455 semantics)."""

import pandas as pd
import ray

from ferenda_ray.stages import graph

# cyclic graph with a duplicate edge and a self-loop
EDGES = [
    ("a", "b"), ("a", "b"), ("a", "c"),
    ("b", "c"),
    ("c", "a"),          # cycle a→b→c→a
    ("c", "c"),          # self-loop: dropped
    ("d", "c"),
    ("e", "a"), ("e", "b"), ("e", "c"),
]
CLEAN = sorted({(s, d) for s, d in EDGES if s != d})
NODES = sorted({n for e in CLEAN for n in e})


def _edges_ds():
    return ray.data.from_pandas(
        pd.DataFrame(EDGES, columns=["src", "dst"]))


def _ref_pagerank(iterations, scale=10 ** 12, dn=85, dd=100):
    base = (scale * (dd - dn)) // dd
    out = {}
    for s, _ in CLEAN:
        out[s] = out.get(s, 0) + 1
    r = {n: scale for n in NODES}
    for _ in range(iterations):
        nxt = {n: base for n in NODES}
        for s, d in CLEAN:
            nxt[d] += (dn * r[s]) // (dd * out[s])
        r = nxt
    return r


def _ref_hits(iterations):
    h = {n: 1 for n in NODES}
    a = None
    for _ in range(iterations):
        a = {n: 0 for n in NODES}
        for s, d in CLEAN:
            a[d] += h[s]
        h = {n: 0 for n in NODES}
        for s, d in CLEAN:
            h[s] += a[d]
    return h, a


def test_distinct_edges_normalizes(ray_session):
    got = graph.distinct_edges(_edges_ds(), num_buckets=4).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == CLEAN


def test_pagerank_matches_reference(ray_session):
    # both execution widths: the adaptive single-task path (default)
    # and the distributed exchange path (small_graph_edges=0)
    for small in (10 ** 6, 0):
        for iters in (1, 2, 3):
            got = graph.pagerank(_edges_ds(), iterations=iters,
                                 num_buckets=4,
                                 small_graph_edges=small).to_pandas()
            got = dict(zip(got["node"], got["pr"]))
            assert got == _ref_pagerank(iters), \
                "iteration %d small=%d" % (iters, small)


def _ref_ppr(iterations, seeds, scale=10 ** 12, dn=85, dd=100):
    base = (scale * (dd - dn)) // dd
    out = {}
    for s, _ in CLEAN:
        out[s] = out.get(s, 0) + 1
    r = {n: (scale if n in seeds else 0) for n in NODES}
    for _ in range(iterations):
        nxt = {n: (base if n in seeds else 0) for n in NODES}
        for s, d in CLEAN:
            nxt[d] += (dn * r[s]) // (dd * out[s])
        r = nxt
    return r


def test_personalized_pagerank_matches_reference(ray_session):
    # teleport restricted to {a, d}: trust mass reaches b/c through
    # edges only; node e (no in-edges, not a seed) must score 0
    seeds = {"a", "d"}
    for small in (10 ** 6, 0):
        for iters in (1, 2, 3):
            got = graph.pagerank(_edges_ds(), iterations=iters,
                                 num_buckets=4,
                                 small_graph_edges=small,
                                 seed_fn=lambda n: n in seeds
                                 ).to_pandas()
            got = dict(zip(got["node"], got["pr"]))
            assert got == _ref_ppr(iters, seeds), \
                "iteration %d small=%d" % (iters, small)
            assert got["e"] == 0


def _ref_labelprop(iterations, seed_map):
    cur = dict(seed_map)
    for _ in range(iterations):
        votes = {}
        for s, d in CLEAN:
            if s in cur:
                votes.setdefault(d, {})
                votes[d][cur[s]] = votes[d].get(cur[s], 0) + 1
        nxt = {}
        for n, vs in votes.items():
            nxt[n] = sorted(vs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        nxt.update(seed_map)  # clamp
        cur = nxt
    return cur


def test_label_propagation_matches_reference(ray_session):
    seed_map = {"a": 1, "d": 0, "zzz-absent": 2}
    seeds = ray.data.from_pandas(pd.DataFrame(
        {"node": list(seed_map), "label": list(seed_map.values())}))
    for small in (10 ** 6, 0):
        for iters in (1, 2, 3):
            got = graph.label_propagation(
                _edges_ds(), seeds, iterations=iters, num_buckets=4,
                small_graph_edges=small).to_pandas()
            got = dict(zip(got["node"], got["label"]))
            ref = _ref_labelprop(iters, seed_map)
            # the graph-absent seed is emitted with its seed label
            assert got == ref, "iteration %d small=%d" % (iters, small)
            assert got["zzz-absent"] == 2


def test_label_propagation_conflicting_and_empty_seeds(ray_session):
    # duplicate seed rows with conflicting labels: SMALLEST label
    # wins, identically on both execution widths
    seeds = ray.data.from_pandas(pd.DataFrame(
        {"node": ["a", "a", "d"], "label": [2, 1, 0]}))
    for small in (10 ** 6, 0):
        got = graph.label_propagation(_edges_ds(), seeds, iterations=1,
                                      num_buckets=4,
                                      small_graph_edges=small).to_pandas()
        assert dict(zip(got["node"], got["label"])) == \
            _ref_labelprop(1, {"a": 1, "d": 0}), "small=%d" % small
    # empty seed set: both widths return empty, no crash
    empty = ray.data.from_pandas(pd.DataFrame(
        {"node": pd.Series([], dtype="object"),
         "label": pd.Series([], dtype="int64")}))
    for small in (10 ** 6, 0):
        got = graph.label_propagation(_edges_ds(), empty, iterations=2,
                                      num_buckets=4,
                                      small_graph_edges=small).to_pandas()
        assert len(got) == 0, "small=%d" % small


def test_pagerank_cycle_converges_ordering(ray_session):
    # c has the most in-edges (b, d, e, a→c) → highest rank
    got = graph.pagerank(_edges_ds(), iterations=3,
                         num_buckets=4).to_pandas()
    top = got.sort_values("pr", ascending=False)["node"].iloc[0]
    assert top == "c"


def test_hits_matches_reference(ray_session):
    for small in (10 ** 6, 0):
        for iters in (1, 2):
            got = graph.hits(_edges_ds(), iterations=iters,
                             num_buckets=4,
                             small_graph_edges=small).to_pandas()
            h, a = _ref_hits(iters)
            assert dict(zip(got["node"], got["hub"])) == h
            assert dict(zip(got["node"], got["auth"])) == a


def test_degree_distribution(ray_session):
    got = graph.degree_distribution(_edges_ds(), col="dst",
                                    num_buckets=4).to_pandas()
    indeg = {}
    for _, d in CLEAN:
        indeg[d] = indeg.get(d, 0) + 1
    expected = {}
    for v in indeg.values():
        expected[v] = expected.get(v, 0) + 1
    assert dict(zip(got["degree"], got["n_nodes"])) == expected


def test_random_walks_deterministic_and_valid(ray_session):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from ferenda_ray.stages.graph import random_walks

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("c", "d"), ("d", "a")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = random_walks(ds, length=3).to_pandas()

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    ranked = {s: sorted(ds_, key=lambda d: (hashlib.md5(d.encode())
                                            .hexdigest(), d))
              for s, ds_ in adj.items()}

    walks = {}
    for _, r in got.iterrows():
        walks.setdefault(r["start"], {})[int(r["step"])] = r["node"]
    assert set(walks) == {"a", "b", "c", "d"}
    for start, steps in walks.items():
        assert steps[0] == start
        node = start
        for k in range(1, 4):
            nbrs = ranked.get(node)
            if not nbrs:
                assert k not in steps
                break
            h = int(hashlib.md5(("%s|%d|%s" % (start, k, node))
                                .encode()).hexdigest()[:15], 16)
            node = nbrs[h % len(nbrs)]
            assert steps[k] == node

    again = random_walks(ds, length=3).to_pandas()
    key = ["start", "step", "node"]
    assert (got[key].sort_values(key).reset_index(drop=True)
            .equals(again[key].sort_values(key).reset_index(drop=True)))


def test_cocitation_pairs_and_triangles(ray_session):
    # pages p1/p2/p3 co-cite targets so that {x,y,z} closes a triangle
    # via three different pages, and {x,w} is a pair in no triangle
    edges = [
        ("p1", "x"), ("p1", "y"),
        ("p2", "y"), ("p2", "z"),
        ("p3", "x"), ("p3", "z"),
        ("p4", "x"), ("p4", "w"),
        ("p5", "x"), ("p5", "y"),   # duplicate pair (x,y): deduped
    ]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    for small in (10 ** 6, 0):  # width-1 AND distributed paths
        pairs = graph.cocitation_pairs(
            ds, small_graph_edges=small).to_pandas()
        got_pairs = sorted(map(tuple, pairs[["a", "b"]].values))
        assert got_pairs == [("w", "x"), ("x", "y"), ("x", "z"),
                             ("y", "z")], small

        tri = graph.triangle_counts(
            graph.cocitation_pairs(ds, small_graph_edges=small),
            small_graph_pairs=small).to_pandas()
        got = dict(zip(tri["node"], tri["n_triangles"]))
        assert got == {"x": 1, "y": 1, "z": 1}, small


def test_cocitation_hub_cap_deterministic(ray_session):
    # a hub page citing 5 targets with max_targets=3 keeps only the
    # 3 lexicographically-smallest targets' pairs
    edges = [("hub", t) for t in ["e", "d", "c", "b", "a"]]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    pairs = graph.cocitation_pairs(ds, max_targets=3).to_pandas()
    got = sorted(map(tuple, pairs[["a", "b"]].values))
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_bfs_depth_matches_reference(ray_session):
    import collections

    seeds = ["a"]
    # brute-force BFS over the normalized graph
    adj = collections.defaultdict(set)
    for s, d in CLEAN:
        adj[s].add(d)
    expected = {"a": 0}
    frontier = {"a"}
    for k in (1, 2, 3):
        nxt = {d for f in frontier for d in adj[f]} - set(expected)
        for n_ in nxt:
            expected[n_] = k
        frontier = nxt
    seeds_ds = ray.data.from_pandas(pd.DataFrame({"node": seeds}))
    for small in (10 ** 6, 0):  # width-1 AND distributed paths
        got = graph.bfs_depth(_edges_ds(), seeds_ds, max_depth=3,
                              num_buckets=4,
                              small_graph_edges=small).to_pandas()
        assert dict(zip(got["node"], got["depth"])) == expected, small
        assert len(got) == len(expected)  # no duplicate labels


def test_bfs_seed_dedup_and_unreached(ray_session):
    # duplicated seeds collapse; nodes unreachable from the seed set
    # are absent from the output
    seeds_ds = ray.data.from_pandas(
        pd.DataFrame({"node": ["d", "d", "d"]}))
    got = graph.bfs_depth(_edges_ds(), seeds_ds, max_depth=3,
                          num_buckets=4).to_pandas()
    m = dict(zip(got["node"], got["depth"]))
    # d → c → a → b; e has no in-edges from this component
    assert m == {"d": 0, "c": 1, "a": 2, "b": 3}
    assert "e" not in m


def test_cocitation_counts_and_jaccard(ray_session):
    import collections
    import itertools

    # brute force over the normalized graph
    by_src = collections.defaultdict(set)
    for s, d in CLEAN:
        by_src[s].add(d)
    inter = collections.Counter()
    for _, tgts in by_src.items():
        for a, b in itertools.combinations(sorted(tgts), 2):
            inter[(a, b)] += 1
    indeg = collections.Counter(d for _, d in CLEAN)

    got = graph.cocitation_counts(
        graph.distinct_edges(_edges_ds(), num_buckets=4),
        num_buckets=4).to_pandas()
    assert {(a, b): c for a, b, c in
            got[["a", "b", "inter"]].values.tolist()} == dict(inter)

    expected = {}
    for (a, b), i in inter.items():
        un = indeg[a] + indeg[b] - i
        if i * 2 >= un:  # jaccard ≥ 1/2
            expected[(a, b)] = (i, un)
    jac = graph.neighbor_jaccard(_edges_ds(), jn=1, jd=2,
                                 num_buckets=4).to_pandas()
    assert {(a, b): (i, u) for a, b, i, u in
            jac[["a", "b", "inter", "union_n"]].values.tolist()} == expected


def _ref_kcore(k, rounds):
    # symmetrized, deduplicated, self-loop-free peel
    und = sorted({(s, d) for s, d in CLEAN} | {(d, s) for s, d in CLEAN})
    alive = set(NODES)
    deg = {}
    for _ in range(rounds):
        deg = {n: 0 for n in alive}
        for s, d in und:
            if s in alive and d in alive:
                deg[s] += 1
        alive = {n for n in alive if deg[n] >= k}
    return {n: deg[n] for n in alive}


def test_kcore_matches_reference(ray_session):
    for k in (1, 2, 3):
        expected = _ref_kcore(k, rounds=4)
        for small in (10 ** 6, 0):  # width-1 AND distributed paths
            got = graph.kcore(_edges_ds(), k=k, rounds=4, num_buckets=4,
                              small_graph_edges=small).to_pandas()
            assert dict(zip(got["node"], got["deg"])) == expected, (k, small)
            assert len(got) == len(expected)


def test_kcore_fixpoint_idempotent(ray_session):
    # extra rounds past the peel depth are no-ops
    a = graph.kcore(_edges_ds(), k=2, rounds=4, num_buckets=4).to_pandas()
    b = graph.kcore(_edges_ds(), k=2, rounds=7, num_buckets=4).to_pandas()
    assert (a.sort_values("node").reset_index(drop=True)
            .equals(b.sort_values("node").reset_index(drop=True)))


def _ref_resource_allocation(scale=10 ** 6, max_degree=64, topk=50):
    sym = sorted({(s, d) for s, d in CLEAN} | {(d, s) for s, d in CLEAN})
    nbrs = {}
    for s, d in sym:
        nbrs.setdefault(s, set()).add(d)
    scores = {}
    for z, nz in nbrs.items():
        if len(nz) > max_degree:
            continue
        w = scale // len(nz)
        ns = sorted(nz)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                scores[(ns[i], ns[j])] = scores.get((ns[i], ns[j]), 0) + w
    out = [(a, b, s) for (a, b), s in scores.items()
           if s > 0 and b not in nbrs.get(a, ())]
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:topk]


def test_resource_allocation_matches_reference(ray_session):
    # both execution widths: width-1 solo (default on small graphs)
    # and the distributed two-exchange path (small_graph_edges=0)
    for small in (None, 0):
        kwargs = {} if small is None else {"small_graph_edges": 0}
        got = graph.resource_allocation(
            _edges_ds(), num_buckets=4, **kwargs).to_pandas()
        rows = list(map(tuple, got[["a", "b", "score"]].values.tolist()))
        assert rows == _ref_resource_allocation(), "small=%s" % small
        # hub cap: with max_degree=1 only degree-1 intermediaries
        # count — no candidate pairs here, but the schema must
        # survive the all-empty result on both widths
        got1 = graph.resource_allocation(
            _edges_ds(), max_degree=1, num_buckets=4,
            **kwargs).materialize()
        assert _ref_resource_allocation(max_degree=1) == []
        assert got1.count() == 0, "small=%s" % small
        # max_degree=3 keeps a/b/e as intermediaries (c is a deg-4
        # hub) — every qualifying pair is adjacent, so empty too
        got3 = graph.resource_allocation(
            _edges_ds(), max_degree=3, num_buckets=4,
            **kwargs).to_pandas()
        exp3 = _ref_resource_allocation(max_degree=3)
        if exp3:
            assert list(map(
                tuple, got3[["a", "b", "score"]].values.tolist())) == exp3
        else:
            assert len(got3) == 0


def _ref_anf_registers(rounds=2, hll_p=8):
    import hashlib

    sym = {(s, d) for s, d in CLEAN} | {(d, s) for s, d in CLEAN}
    nbrs = {}
    for s, d in sym:
        nbrs.setdefault(s, set()).add(d)
    ball = {n: {n} for n in NODES}
    for _ in range(rounds):
        ball = {n: b | {x for m in b for x in nbrs.get(m, ())}
                for n, b in ball.items()}
    w = 60 - hll_p
    out = {}
    for n, b in ball.items():
        for m in b:
            h = int(hashlib.md5(m.encode()).hexdigest()[:15], 16)
            rem = h >> hll_p
            rank = (w - rem.bit_length() + 1) if rem else w + 1
            key = (n, h % (1 << hll_p))
            out[key] = max(out.get(key, 0), rank)
    return sorted((n, r, v) for (n, r), v in out.items())


def test_neighborhood_registers_matches_reference(ray_session):
    exp = _ref_anf_registers()
    for force in (None, 0):
        kwargs = {} if force is None else {"small_graph_edges": 0}
        got = graph.neighborhood_registers(
            _edges_ds(), rounds=2, num_buckets=4, **kwargs).to_pandas()
        rows = sorted(map(tuple,
                          got[["node", "reg", "max_rank"]].values.tolist()))
        assert rows == exp, "path force=%s" % force
