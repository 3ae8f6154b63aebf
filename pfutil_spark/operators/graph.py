"""Integer-exact PageRank over a DataFrame edge list.

Iterative graph algorithms are the one shape the relational shell
can't one-shot — this is the K-round loop done Spark-first: every
iteration is one equi-join (edges x current ranks) + one map-side-
combined aggregation, with ``localCheckpoint`` cutting the lineage so
round K's plan doesn't replay rounds 1..K-1. Connected components
(operators/dedup.py) follows the same discipline.

The arithmetic is deliberately ALL-BIGINT fixed-point: rank mass is
``scale`` integer units, per-edge contributions are ``r div outdeg``,
damping is ``(d_pct * x) div 100``. Integer sums are order-independent
(float sums are not — Spark's aggregation order is nondeterministic),
so the result is bit-identical across partitionings, engines, and
reruns, which is what lets the driver grade PageRank with an EXACT
unrolled-CTE DuckDB oracle instead of a tolerance bound. The floor
divisions leak a deterministic dust of rank mass per round (bounded by
#edges + 2 units); at ``scale`` = 1e12 that is noise in ranking terms.

Scale design: state per round is one (node, rank) row per node;
contributions shuffle once per round on dst. Dangling-node mass is
re-spread via a broadcast 1-row aggregate, never a driver collect in
the loop. K is small and fixed (PageRank converges geometrically;
3-10 rounds rank-order real graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SRC, _DST, _NODE = "__pf_src", "__pf_dst", "node"
_R, _OD, _INC, _DANG = "__pf_r", "__pf_od", "__pf_inc", "__pf_dang"
_P, _M, _W = "__pf_p", "__pf_m", "__pf_w"


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    personalize: DataFrame | None = None,
    weight: str | None = None,
) -> DataFrame:
    """PageRank on the directed edge multiset ``edges[src -> dst]``
    (parallel edges count as repeated votes; pre-``distinct`` the frame
    for a simple graph). Returns ``(node, rank_scaled)`` where
    ``rank_scaled`` is the fixed-point rank in units of ``1/scale``
    (sums to ~``scale`` over all nodes, minus deterministic floor
    dust). NULL endpoints are rejected loudly — an edge to NULL is a
    data bug, not a graph feature.

    Exact update rule (all bigint, mirrored verbatim in the SQL
    oracle):

        base       = ((100 - damping_pct) * (scale div N)) div 100
        contrib(e) = r[src(e)] div outdeg[src(e)]
        dang       = (sum of r over out-degree-0 nodes) div N
        r'[v]      = base + (damping_pct * (sum contrib into v + dang)) div 100

    One driver action up front (``N = nodes.count()`` — a scalar, the
    index-build precedent) and one ``localCheckpoint`` per round.

    ``weight``: optional positive INTEGER edge-weight column — a
    vote with weight w counts w times: contrib(e) = (r * w) div
    strength[src] with strength = sum of outgoing weights (unweighted
    = all-ones, bit-identical to the plain rule). Weights must be
    >= 1 and non-null (validated loudly; zero/negative/NULL weights
    have no integer-exact semantics here). Parallel edges contribute
    separately — floor((r*w1)/s) + floor((r*w2)/s) is not always
    floor((r*(w1+w2))/s) — so pre-aggregate parallel edges into one
    weighted row for the canonical result (and mirror exactly that
    edge multiset in any oracle).

    ``personalize``: optional single-column ``node`` frame — the
    personalized-PageRank teleport set ("rank relative to THESE
    seeds": recommendations, topic-sensitive relevance). Teleport mass
    (the base term), the INITIAL rank, and re-spread dangling mass all
    go only to the |S| seed nodes (``div |S|`` instead of ``div N``);
    every seed must be a graph node (validated loudly — a seed with no
    edges would silently hold teleport mass forever).
    """
    if iters < 1:
        raise ValueError(f"iters={iters}: must be >= 1")
    if not 1 <= damping_pct <= 99:
        raise ValueError(f"damping_pct={damping_pct}: must be in [1, 99]")
    if scale < 10**6:
        raise ValueError(f"scale={scale}: too coarse, use >= 1e6")
    for c in (src, dst):
        if c not in edges.columns:
            raise ValueError(f"edge column {c!r} not in {edges.columns}")

    if weight is not None and weight not in edges.columns:
        raise ValueError(f"weight column {weight!r} not in {edges.columns}")
    w_col = (
        F.col(weight).cast("long") if weight is not None else F.lit(1)
    ).alias(_W)
    if scale > 10**16:
        # (damping_pct * mass) with mass ~ scale must stay inside long:
        # 99 * 10**16 < 2**63-1, anything bigger can silently wrap
        raise ValueError(f"scale={scale}: must be <= 1e16 (long overflow)")
    e = edges.select(
        F.col(src).alias(_SRC), F.col(dst).alias(_DST), w_col
    ).localCheckpoint()  # edges are re-joined every round: scan once
    # ONE validation pass (r5 verdict: the two limit(1) probes each
    # scanned the edges; a single OR-filter short-circuits identically).
    # The weight upper bound keeps contrib = r*w inside long: r <= ~scale
    # after any round, so w <= Long.MAX div scale is the safe envelope.
    w_max = (2**63 - 1) // scale
    bad_cond = F.col(_SRC).isNull() | F.col(_DST).isNull()
    if weight is not None:
        bad_cond = bad_cond | (
            F.col(_W).isNull() | (F.col(_W) < 1) | (F.col(_W) > w_max)
        )
    bad = e.filter(bad_cond).limit(1).collect()
    if bad:
        row = bad[0]
        if row[0] is None or row[1] is None:
            raise ValueError("edges contain NULL endpoints")
        if row[2] is None or row[2] < 1:
            raise ValueError("weights must be non-null integers >= 1")
        raise ValueError(
            f"weight {row[2]} > Long.MAX div scale = {w_max}: "
            f"contrib would overflow long (lower the weight or scale)"
        )

    nodes = (
        e.select(F.col(_SRC).alias(_NODE))
        .unionByName(e.select(F.col(_DST).alias(_NODE)))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(_NODE), F.lit(0).cast("long").alias("rank_scaled")
        )
    # out-STRENGTH: sum of outgoing weights (== out-degree when
    # unweighted, so the plain rule is bit-identical)
    outdeg = e.groupBy(F.col(_SRC).alias(_NODE)).agg(
        F.sum(_W).cast("long").alias(_OD)
    )

    p_nodes = None
    if personalize is not None:
        if list(personalize.columns) != [_NODE]:
            raise ValueError(
                f"personalize must have exactly one column named "
                f"{_NODE!r}, got {personalize.columns}"
            )
        p_nodes = personalize.distinct().localCheckpoint()
        m = p_nodes.count()
        if m == 0:
            raise ValueError("personalize is empty")
        if p_nodes.join(nodes, [_NODE], "left_anti").limit(1).count():
            raise ValueError("personalize contains nodes absent from edges")
        teleport_div = m
    else:
        teleport_div = n

    base = ((100 - damping_pct) * (scale // teleport_div)) // 100
    # the DANGLING SET is static across rounds (only its rank mass
    # changes) — compute it once; graphs with none (every symmetrized
    # graph) skip the per-round semi-join + crossJoin entirely
    dang_nodes = nodes.join(outdeg, [_NODE], "left_anti").localCheckpoint()
    has_dang = bool(dang_nodes.limit(1).count())
    if p_nodes is None:
        # plain path: no seed flag column, no conditional wrappers
        in_p = None
        nodes_p = nodes
        r0 = F.lit(scale // teleport_div)
    else:
        nodes_p = nodes.join(
            p_nodes.withColumn(_P, F.lit(1)), [_NODE], "left"
        ).localCheckpoint()
        in_p = F.col(_P).isNotNull()
        r0 = F.when(in_p, F.lit(scale // teleport_div)).otherwise(F.lit(0))
    r = nodes_p.withColumn(_R, r0.cast("long")).select(_NODE, _R)
    for _ in range(iters):
        contrib = (
            e.join(r.withColumnRenamed(_NODE, _SRC), [_SRC])
            .join(outdeg.withColumnRenamed(_NODE, _SRC), [_SRC])
            .select(
                F.col(_DST).alias(_NODE),
                F.expr(f"({_R} * {_W}) div {_OD}").cast("long").alias("c"),
            )
        )
        inc = contrib.groupBy(_NODE).agg(F.sum("c").cast("long").alias(_INC))
        nxt = nodes_p.join(inc, [_NODE], "left")
        mass = F.coalesce(F.col(_INC), F.lit(0))
        if has_dang:
            # dangling mass: broadcast 1-row aggregate, stays in-plan;
            # re-spread over the teleport set (all nodes, or the seeds)
            dang = (
                r.join(dang_nodes, [_NODE], "left_semi")
                .agg(F.coalesce(F.sum(_R), F.lit(0)).cast("long").alias("s"))
                .select(
                    F.expr(f"s div {int(teleport_div)}")
                    .cast("long")
                    .alias(_DANG)
                )
            )
            nxt = nxt.crossJoin(F.broadcast(dang))
            if in_p is None:
                mass = mass + F.col(_DANG)
            else:
                mass = mass + F.when(in_p, F.col(_DANG)).otherwise(F.lit(0))
        base_col = (
            F.lit(base)
            if in_p is None
            else F.when(in_p, F.lit(base)).otherwise(F.lit(0))
        )
        r = (
            nxt.withColumn(_M, mass.cast("long"))
            .select(
                F.col(_NODE),
                (
                    base_col.cast("long")
                    + F.expr(f"({int(damping_pct)} * {_M}) div 100").cast(
                        "long"
                    )
                ).alias(_R),
            )
            .localCheckpoint()
        )
    return r.select(F.col(_NODE), F.col(_R).alias("rank_scaled"))


def nearest_seed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
) -> DataFrame:
    """Assign every node within ``max_hops`` of the seed set to its
    NEAREST seed: returns ``(node, seed, dist)`` with min-distance
    semantics and a deterministic tie-break (among seeds reaching a
    node at the same minimal distance, the smallest ``seed`` value
    wins) — the graph cluster-assignment primitive (seed = cluster
    center / canonical document / topic anchor). ``seeds`` must have a
    single column named ``node``; each seed is assigned to itself at
    dist 0.

    Same frontier-expansion shape as :func:`bfs_distances` — each node
    labeled and expanded exactly once, O(edges reached) — except
    frontier rows carry the winning seed label. Propagating ONLY each
    node's winner is sound for the min tie-break because min is
    union-distributive: the min seed over all equal-length paths into
    a node equals the min over its predecessors' per-node winners
    (min of mins == min of the union) — so the propagated answer
    matches the global min-(dist, seed) definition the recursive-CTE
    oracle computes. All-integer output when nodes are integers ->
    EXACT oracles.
    """
    e = _prep_bfs(edges, seeds, src, dst, max_hops, "seeds")
    frontier = (
        seeds.distinct().select(F.col(_NODE), F.col(_NODE).alias("seed"))
        .localCheckpoint()
    )
    labeled = frontier.withColumn("dist", F.lit(0).cast("long"))

    def collapse(cand):
        return (
            cand.select(F.col(_DST).alias(_NODE), F.col("seed"))
            .groupBy(_NODE)
            .agg(F.min("seed").alias("seed"))
        )

    return _expand_frontiers(e, frontier, labeled, max_hops, collapse)


def _prep_bfs(edges, sources, src, dst, max_hops, what):
    """Shared validation + edge prep for the frontier-expansion
    operators: rejects NULL endpoints loudly (a NULL dst would survive
    the left_anti dedup — null-unsafe equality never matches — and
    surface as a phantom reachable node), checkpoints the edge frame
    (it is re-joined every round), and returns it."""
    if max_hops < 0:
        raise ValueError(f"max_hops={max_hops}: must be >= 0")
    if list(sources.columns) != [_NODE]:
        raise ValueError(
            f"{what} must have exactly one column named {_NODE!r}, "
            f"got {sources.columns}"
        )
    for c in (src, dst):
        if c not in edges.columns:
            raise ValueError(f"edge column {c!r} not in {edges.columns}")
    e = edges.select(
        F.col(src).alias(_SRC), F.col(dst).alias(_DST)
    ).localCheckpoint()
    if e.filter(F.col(_SRC).isNull() | F.col(_DST).isNull()).limit(1).count():
        raise ValueError("edges contain NULL endpoints")
    if sources.filter(F.col(_NODE).isNull()).limit(1).count():
        raise ValueError(f"{what} contain NULL nodes")
    return e


def _expand_frontiers(e, frontier, labeled, max_hops, collapse):
    """The shared per-round loop: frontier x edges equi-join ->
    ``collapse`` (dedup / per-node tie-break) -> anti-join vs labeled
    -> checkpoint; stops early when the frontier drains. Each node is
    expanded exactly once, so total work is O(edges reached)."""
    for h in range(1, max_hops + 1):
        nxt = (
            collapse(
                frontier.join(e, frontier[_NODE] == e[_SRC])
            )
            .join(labeled.select(_NODE), [_NODE], "left_anti")
            .localCheckpoint()
        )
        if not nxt.limit(1).count():
            break
        labeled = labeled.unionByName(
            nxt.withColumn("dist", F.lit(h).cast("long"))
        ).localCheckpoint()
        frontier = nxt
    return labeled


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
) -> DataFrame:
    """Minimum hop distance from a source set, breadth-first: returns
    ``(node, dist)`` for every node reachable within ``max_hops``
    directed hops (sources themselves at dist 0 — a source stays 0
    even if also reachable later; min-distance semantics). ``sources``
    must have a single column named ``node``; duplicate sources are
    deduplicated.

    Shape per round: frontier x edges equi-join -> distinct -> anti-
    join against everything already labeled (each node is expanded
    exactly ONCE, so total work is O(|E reached|), not O(paths) — the
    reason BFS frontier expansion beats path-enumerating transitive
    closure on dense graphs). One ``localCheckpoint`` + one empty-check
    action per round cut lineage and stop early when the frontier
    drains. All-integer output -> EXACT recursive-CTE oracles.
    """
    e = _prep_bfs(edges, sources, src, dst, max_hops, "sources")
    frontier = sources.distinct().localCheckpoint()
    dist = frontier.withColumn("dist", F.lit(0).cast("long"))

    def collapse(cand):
        return cand.select(F.col(_DST).alias(_NODE)).distinct()

    return _expand_frontiers(e, frontier, dist, max_hops, collapse)
