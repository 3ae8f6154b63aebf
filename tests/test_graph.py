"""pagerank gates: bit-identical to a pure-python integer reference of
the same fixed-point rule, invariant under repartitioning (integer sums
are order-free), dangling mass re-spread, multi-edge votes, validation."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators.graph import pagerank


def ref_pagerank(edges, iters=3, d=85, scale=10**12):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    od = Counter(a for a, _ in edges)
    r = {v: scale // n for v in nodes}
    base = ((100 - d) * (scale // n)) // 100
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if od[v] == 0) // n
        inc = defaultdict(int)
        for a, b in edges:
            inc[b] += r[a] // od[a]
        r = {v: base + (d * (inc[v] + dang)) // 100 for v in nodes}
    return r


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (4, 1), (1, 4),
    (5, 1),            # 5 has no in-links
    (6, 7), (7, 6),    # separate component
    (1, 8),            # 8 is dangling (no out-edges)
]


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, **kw)
    return {r["node"]: r["rank_scaled"] for r in out.collect()}


def test_matches_integer_reference(spark):
    got = _run(spark, EDGES, iters=4)
    assert got == ref_pagerank(EDGES, iters=4)


def test_dangling_mass_is_respread(spark):
    # node 8 receives rank but has no out-edges; its mass must come
    # back into circulation — with dang dropped, total mass would decay
    # by r[8] every round
    got = _run(spark, EDGES, iters=3)
    ref = ref_pagerank(EDGES, iters=3)
    assert got == ref
    total = sum(got.values())
    # mass conserved up to deterministic floor dust
    assert abs(total - 10**12) < 100 * (len(EDGES) + len(got) + 2)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = pagerank(df.repartition(1), iters=3)
    b = pagerank(df.repartition(7, "dst"), iters=3)
    ra = {r["node"]: r["rank_scaled"] for r in a.collect()}
    rb = {r["node"]: r["rank_scaled"] for r in b.collect()}
    assert ra == rb


def test_multi_edges_count_as_repeated_votes(spark):
    simple = [(1, 2), (2, 1), (1, 3), (3, 1)]
    doubled = simple + [(1, 2)]  # 1 votes twice for 2
    rs = _run(spark, simple, iters=3)
    rd = _run(spark, doubled, iters=3)
    assert rd == ref_pagerank(doubled, iters=3)
    assert rd[2] > rs[2]


def test_hub_outranks_leaves(spark):
    star = [(i, 99) for i in range(10)] + [(99, i) for i in range(10)]
    got = _run(spark, star, iters=5)
    assert got[99] == max(got.values())
    assert got == ref_pagerank(star, iters=5)


def test_string_nodes_work(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=2).collect()}
    assert out == ref_pagerank(edges, iters=2)


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(df, damping_pct=100)
    with pytest.raises(ValueError, match="scale"):
        pagerank(df, scale=10)
    with pytest.raises(ValueError, match="edge column"):
        pagerank(df, src="nope")
    nulls = spark.createDataFrame([(1, None)], "src long, dst long")
    with pytest.raises(ValueError, match="NULL endpoints"):
        pagerank(nulls)


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------

def ref_bfs(edges, sources, max_hops):
    out = {}
    frontier = set(sources)
    for s in frontier:
        out[s] = 0
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            nxt |= adj[v]
        nxt -= out.keys()
        if not nxt:
            break
        for v in nxt:
            out[v] = h
        frontier = nxt
    return out


def _bfs(spark, edges, sources, max_hops):
    from pfutil_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    got = bfs_distances(e, s, max_hops=max_hops)
    return {r["node"]: r["dist"] for r in got.collect()}


def test_bfs_matches_reference(spark):
    got = _bfs(spark, EDGES, [5], max_hops=4)
    assert got == ref_bfs(EDGES, [5], 4)
    assert got[5] == 0 and got[1] == 1


def test_bfs_min_distance_and_unreachable(spark):
    # node 6/7 form a separate component: absent from the result;
    # node 1 is reachable many ways: labeled at its MIN distance
    got = _bfs(spark, EDGES, [4], max_hops=10)
    ref = ref_bfs(EDGES, [4], 10)
    assert got == ref
    assert 6 not in got and 7 not in got
    assert got[1] == 1 and got[3] == 1 and got[2] == 2


def test_bfs_early_stop_and_zero_hops(spark):
    # max_hops larger than the diameter: loop stops when drained
    got = _bfs(spark, [(1, 2), (2, 3)], [1], max_hops=100)
    assert got == {1: 0, 2: 1, 3: 2}
    assert _bfs(spark, [(1, 2)], [1, 2, 2], max_hops=0) == {1: 0, 2: 0}


def test_bfs_validation(spark):
    from pfutil_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(e, s, max_hops=-1)
    with pytest.raises(ValueError, match="sources must have"):
        bfs_distances(e, e, max_hops=1)
    with pytest.raises(ValueError, match="edge column"):
        bfs_distances(e, s, src="nope")


def test_bfs_rejects_null_endpoints_and_sources(spark):
    # review finding: a NULL dst would survive the left_anti dedup
    # (null-unsafe equality) and surface as a phantom reachable node
    from pfutil_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, None), (1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="NULL endpoints"):
        bfs_distances(e, s, max_hops=2)
    ok = spark.createDataFrame([(1, 2)], "src long, dst long")
    ns = spark.createDataFrame([(1,), (None,)], "node long")
    with pytest.raises(ValueError, match="NULL nodes"):
        bfs_distances(ok, ns, max_hops=1)


# ---------------------------------------------------------------------------
# personalized pagerank
# ---------------------------------------------------------------------------

def ref_ppr(edges, seeds, iters=3, d=85, scale=10**12):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    seeds = set(seeds)
    m = len(seeds)
    od = Counter(a for a, _ in edges)
    r = {v: (scale // m if v in seeds else 0) for v in nodes}
    base = ((100 - d) * (scale // m)) // 100
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if od[v] == 0) // m
        inc = defaultdict(int)
        for a, b in edges:
            inc[b] += r[a] // od[a]
        r = {
            v: (base if v in seeds else 0)
            + (d * (inc[v] + (dang if v in seeds else 0))) // 100
            for v in nodes
        }
    return r


def _run_ppr(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = pagerank(df, personalize=s, **kw)
    return {r["node"]: r["rank_scaled"] for r in out.collect()}


def test_personalized_matches_reference(spark):
    got = _run_ppr(spark, EDGES, [5, 4], iters=4)
    assert got == ref_ppr(EDGES, [5, 4], iters=4)


def test_personalized_localizes_rank(spark):
    # two disjoint components; seeding in one leaves the other at
    # exactly 0 after any number of rounds
    got = _run_ppr(spark, EDGES, [6], iters=3)
    assert got == ref_ppr(EDGES, [6], iters=3)
    assert got[6] > 0 and got[7] > 0
    assert all(got[v] == 0 for v in (1, 2, 3, 4, 5, 8))


def test_personalized_dangling_mass_returns_to_seeds(spark):
    # node 8 is dangling: its mass must re-spread to the SEEDS only
    got = _run_ppr(spark, EDGES, [1], iters=3)
    assert got == ref_ppr(EDGES, [1], iters=3)


def test_personalized_none_equals_plain(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    plain = {r["node"]: r["rank_scaled"] for r in pagerank(df, iters=3).collect()}
    assert plain == ref_pagerank(EDGES, iters=3)


def test_personalized_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="personalize must have"):
        pagerank(df, personalize=df)
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="personalize is empty"):
        pagerank(df, personalize=empty)
    absent = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="absent from edges"):
        pagerank(df, personalize=absent)


# ---------------------------------------------------------------------------
# nearest_seed
# ---------------------------------------------------------------------------

def ref_nearest(edges, seeds, max_hops):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    best = {}
    for s in sorted(set(seeds)):
        dist = {s: 0}
        frontier = {s}
        for h in range(1, max_hops + 1):
            nxt = set()
            for v in frontier:
                nxt |= adj[v]
            nxt -= dist.keys()
            if not nxt:
                break
            for v in nxt:
                dist[v] = h
            frontier = nxt
        for v, d in dist.items():
            cur = best.get(v)
            if cur is None or (d, s) < cur:
                best[v] = (d, s)
    return {v: (s, d) for v, (d, s) in best.items()}


def _nearest(spark, edges, seeds, max_hops):
    from pfutil_spark.operators.graph import nearest_seed

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = nearest_seed(e, s, max_hops=max_hops)
    return {r["node"]: (r["seed"], r["dist"]) for r in got.collect()}


def test_nearest_seed_matches_reference(spark):
    got = _nearest(spark, EDGES, [4, 5], max_hops=4)
    assert got == ref_nearest(EDGES, [4, 5], 4)
    assert got[4] == (4, 0) and got[5] == (5, 0)


def test_nearest_seed_tie_break_and_winner_propagation(spark):
    # node 30 is equidistant from seeds 2 and 3 (winner 2); node 40 is
    # reachable ONLY through 30 — min-of-mins must carry seed 2 onward
    edges = [(2, 30), (3, 30), (30, 40), (3, 50)]
    got = _nearest(spark, edges, [2, 3], max_hops=3)
    ref = ref_nearest(edges, [2, 3], 3)
    assert got == ref
    assert got[30] == (2, 1) and got[40] == (2, 2) and got[50] == (3, 1)


def test_nearest_seed_unreachable_and_validation(spark):
    got = _nearest(spark, EDGES, [6], max_hops=10)
    assert set(got) == {6, 7}
    from pfutil_spark.operators.graph import nearest_seed

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="max_hops"):
        nearest_seed(e, s, max_hops=-1)
    with pytest.raises(ValueError, match="seeds must have"):
        nearest_seed(e, e)
    nulls = spark.createDataFrame([(None,)], "node long")
    with pytest.raises(ValueError, match="NULL nodes"):
        nearest_seed(e, nulls)


# ---------------------------------------------------------------------------
# weighted pagerank
# ---------------------------------------------------------------------------

def ref_pagerank_w(edges, iters=3, d=85, scale=10**12):
    # edges: (a, b, w)
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    strength = Counter()
    for a, _, w in edges:
        strength[a] += w
    r = {v: scale // n for v in nodes}
    base = ((100 - d) * (scale // n)) // 100
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if strength[v] == 0) // n
        inc = defaultdict(int)
        for a, b, w in edges:
            inc[b] += (r[a] * w) // strength[a]
        r = {v: base + (d * (inc[v] + dang)) // 100 for v in nodes}
    return r


W_EDGES = [(1, 2, 3), (2, 1, 1), (1, 3, 1), (3, 1, 2), (3, 2, 5), (4, 1, 7)]


def test_weighted_pagerank_matches_reference(spark):
    df = spark.createDataFrame(W_EDGES, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, iters=4, weight="w").collect()
    }
    assert got == ref_pagerank_w(W_EDGES, iters=4)
    # heavier votes matter: 2 receives weight 3+5 of its in-mass
    assert got[2] > got[3]


def test_unit_weights_bit_identical_to_unweighted(spark):
    ones = [(a, b, 1) for a, b in EDGES]
    dfw = spark.createDataFrame(ones, "src long, dst long, w long")
    dfu = spark.createDataFrame(EDGES, "src long, dst long")
    rw = {r["node"]: r["rank_scaled"] for r in pagerank(dfw, iters=3, weight="w").collect()}
    ru = {r["node"]: r["rank_scaled"] for r in pagerank(dfu, iters=3).collect()}
    assert rw == ru


def test_weighted_validation(spark):
    df = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="weight column"):
        pagerank(df, weight="nope")
    bad = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="weights must be"):
        pagerank(bad, weight="w")
    nul = spark.createDataFrame([(1, 2, None)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="weights must be"):
        pagerank(nul, weight="w")
