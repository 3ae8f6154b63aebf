"""Distribution / monitoring statistics: fixed-width histograms,
integer-exact volume-anomaly detection, and bipartite degree
distributions — the dashboard-grade companions of the sketch drift
suite (operators/drift.py). Everything here is pure built-in-expression
Spark (zero Python in any plan) and emits only integers or single IEEE
divisions, so every query is EXACT cross-engine and DuckDB-oracle-able.

These are beyond-reference pipeline operators (the reference,
ocadaruma/pfutil, is the HLL core); they reuse its design rules: one
scan where possible, map-side-combined aggregates, no driver actions
during construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    lo: int,
    width: int,
    n_bins: int,
    by: str | None = None,
    dense: bool = True,
    weight: str | Column | None = None,
) -> DataFrame:
    """Fixed-width histogram of an integer column, optionally per group:
    ``(by?, bin, bin_lo, bin_hi, n[, mass])``.

    With ``weight`` (a column name or Column, cast to bigint) each bin
    additionally carries ``mass`` = the sum of weights of its rows —
    the "token mass by document length" shape. NULL weights contribute
    0 to ``mass`` (the row still counts in ``n``); keep the weight
    integer-valued for exact cross-engine parity.

    Binning is CLAMPED: values below ``lo`` land in bin 0, values at or
    above ``lo + width*n_bins`` land in bin ``n_bins-1`` (a histogram
    that silently drops out-of-range rows misreports the distribution;
    under/overflow mass is signal). NULL values are dropped. ``lo`` and
    ``width`` must be Python ints so the bin index is pure bigint
    arithmetic — clamp-then-``(v - lo) div width`` with a non-negative
    dividend, hence truncating and floor division agree and the result
    is EXACT cross-engine (no float binning).

    ``dense=True`` (default) emits every bin for every group, zeros
    included — the plot-ready shape. The bin axis comes from
    ``spark.range(n_bins)`` (no data scan) and the group axis from a
    ``select(by).distinct()`` on the input; the cross join is
    index-sized (groups x n_bins) and both sides are broadcast-small by
    construction. ``dense=False`` skips the frame entirely and emits
    only non-empty bins — ONE scan, one map-side-combined shuffle; use
    it when the group space is huge.
    """
    if not isinstance(lo, int) or not isinstance(width, int):
        raise TypeError(f"lo={lo!r} width={width!r}: must be Python ints")
    if width < 1:
        raise ValueError(f"width={width}: must be >= 1")
    if n_bins < 1:
        raise ValueError(f"n_bins={n_bins}: must be >= 1")
    if width * n_bins >= 2**53:
        # floor((clamped-lo)/width) over doubles is provably exact while
        # the clamped offset stays below 2^53 (quotient error q*2^-53 <
        # the 1/width gap to the next integer); past that the bin index
        # could round up across a boundary
        raise ValueError(f"width*n_bins={width * n_bins}: must be < 2**53")
    hi = lo + width * n_bins - 1  # largest value of the top bin
    v = F.col(col).cast("long")
    clamped = F.greatest(
        F.lit(lo).cast("long"), F.least(v, F.lit(hi).cast("long"))
    )
    bin_ = F.floor((clamped - F.lit(lo)) / F.lit(width)).cast("long")
    keys = ([F.col(by)] if by else []) + [bin_.alias("bin")]
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight is not None:
        w = (F.col(weight) if isinstance(weight, str) else weight).cast("long")
        aggs.append(F.sum(F.coalesce(w, F.lit(0))).cast("long").alias("mass"))
    counts = df.filter(F.col(col).isNotNull()).groupBy(*keys).agg(*aggs)
    edges = [
        (F.lit(lo) + F.col("bin") * F.lit(width)).cast("long").alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).cast("long").alias("bin_hi"),
    ]
    vals = [F.coalesce("n", F.lit(0)).cast("long").alias("n")]
    if weight is not None:
        vals.append(F.coalesce("mass", F.lit(0)).cast("long").alias("mass"))
    if not dense:
        cols = ([by] if by else []) + ["bin", *edges, "n"] + (
            ["mass"] if weight is not None else []
        )
        return counts.select(*cols)
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("long").alias("bin"))
    if by:
        # null-safe group equality: a NULL group key is a real group
        # (dense must report its true counts, same as dense=False)
        axis = df.select(by).distinct().crossJoin(F.broadcast(bins))
        cnt = counts.withColumnRenamed(by, "__pf_by").withColumnRenamed(
            "bin", "__pf_bin"
        )
        joined = axis.join(
            cnt,
            F.col(by).eqNullSafe(F.col("__pf_by"))
            & (F.col("bin") == F.col("__pf_bin")),
            "left",
        )
        return joined.select(by, "bin", *edges, *vals)
    joined = bins.join(counts, ["bin"], "left")
    return joined.select("bin", *edges, *vals)


def daily_count_anomalies(
    df: DataFrame,
    ts: str = "ts",
    by: str = "event_type",
    z2: int = 9,
) -> DataFrame:
    """Per-day volume-anomaly detection per group: for each ``(by, day)``
    flag days whose event count deviates from the group's mean daily
    count by more than ``sqrt(z2)`` population standard deviations —
    the "did ingestion spike/drop?" monitor that complements the
    distribution-shaped drift suite (operators/drift.py).

    The z-test is evaluated in PURE bigint arithmetic (no float mean or
    variance, hence EXACT cross-engine): with ``d`` days, ``S = sum(n)``,
    ``SS = sum(n^2)`` per group,

        (x - S/d)^2 > z2 * ((d*SS - S^2)/d^2)
        <=> (d*x - S)^2 > z2 * (d*SS - S^2)

    both sides of which are exact int64 as long as ``|d*x - S|`` and
    ``d*SS`` stay below ~3e9 / ~9e18 respectively — true for daily
    count monitoring until per-group daily volumes approach 1e9 * days;
    past that, pre-aggregate to coarser buckets or divide counts by a
    constant. Constant groups (variance 0) flag nothing. ``z2`` is the
    SQUARED threshold (9 = 3 sigma) and must be a non-negative int.

    Output: ``(by, day_s, n, n_days, total, dev_sq, var_scaled,
    is_anomaly)`` where ``dev_sq = (d*x - S)^2`` and
    ``var_scaled = z2 * (d*SS - S^2)`` are the two exactly-comparable
    sides (emitted for threshold tuning), ``day_s`` is the
    ``yyyy-MM-dd`` string of the NAIVE date (``ts`` stays
    timestamp_ntz; no session-timezone dependence).

    Plan: one counting scan with map-side combine into ``(by, day)``,
    then window aggregates over that per-day frame (days-per-group
    rows, tiny) — the Window-on-aggregate skeleton of term_profile.
    Zero Python, one corpus-scale shuffle.
    """
    if not isinstance(z2, int) or z2 < 0:
        raise ValueError(f"z2={z2!r}: must be a non-negative int")
    day = F.to_date(F.col(ts))
    counts = (
        df.filter(F.col(ts).isNotNull())
        .groupBy(F.col(by), day.alias("__pf_day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(by)
    d = F.count(F.lit(1)).over(w)
    s = F.sum("n").over(w)
    ss = F.sum(F.col("n") * F.col("n")).over(w)
    dev = d * F.col("n") - s
    out = counts.select(
        by,
        F.date_format("__pf_day", "yyyy-MM-dd").alias("day_s"),
        F.col("n").cast("long").alias("n"),
        d.cast("long").alias("n_days"),
        s.cast("long").alias("total"),
        (dev * dev).cast("long").alias("dev_sq"),
        (F.lit(z2) * (d * ss - s * s)).cast("long").alias("var_scaled"),
    )
    return out.select(
        "*", (F.col("dev_sq") > F.col("var_scaled")).alias("is_anomaly")
    )


def degree_distribution(
    df: DataFrame, node: str, neighbor: str
) -> DataFrame:
    """Degree distribution of the ``node -> neighbor`` bipartite graph:
    ``(degree, n_nodes)`` where ``degree`` is the number of DISTINCT
    neighbors per node — the engagement-breadth / fan-out profile
    ("how many users touch k event types?", "how many customers order
    from k suppliers?"). NULL nodes and NULL neighbors are dropped (a
    NULL edge endpoint is not an edge).

    All-integer -> EXACT cross-engine. Plan: one distinct-edge
    aggregation (map-side combined; the only corpus-scale shuffle —
    its keys are the edges themselves, near-unique, no skew), a
    per-node count, then a tiny degree-histogram aggregate. The output
    is at most max-degree rows.
    """
    edges = (
        df.filter(F.col(node).isNotNull() & F.col(neighbor).isNotNull())
        .select(node, neighbor)
        .distinct()
    )
    degrees = edges.groupBy(node).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return degrees.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def triangle_count(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Exact triangle count of the UNDIRECTED simple graph whose edges
    are the (src, dst) rows: one row ``(n_nodes, n_edges,
    n_triangles)``. Self-loops, NULL endpoints and duplicate /
    reversed edges are collapsed first (simple-graph semantics), so
    the answer is independent of input orientation and multiplicity.

    Scale design — the degree-ordered orientation (the standard
    distributed triangle algorithm, e.g. Cohen's MapReduce scheme /
    GraphFrames, public technique): orient every edge from its
    lower-(degree, id) endpoint to the higher one. Every node's
    OUT-degree is then O(sqrt(m)), so the wedge self-join (pairs of
    out-edges sharing their source) generates at most m^1.5 / hub-free
    candidates instead of sum(deg^2) — the difference between a
    power-law graph finishing and its hottest node exploding. Each
    triangle appears as exactly ONE wedge (apex = its lowest-ranked
    corner) closed by exactly ONE oriented edge, so the final
    LEFT SEMI join counts each triangle once. All shuffles are
    equi-joins on node / edge keys; all-bigint output -> EXACT
    cross-engine.
    """
    a, b = F.col(src), F.col(dst)
    edges = (
        df.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(
            F.least(a, b).alias("__pf_a"), F.greatest(a, b).alias("__pf_b")
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("__pf_a").alias("__pf_v"))
        .unionAll(edges.select(F.col("__pf_b").alias("__pf_v")))
        .groupBy("__pf_v")
        .agg(F.count(F.lit(1)).cast("long").alias("__pf_deg"))
    )
    # rank = (degree, id): a TOTAL order over nodes, carried as a
    # struct so the wedge inequality compares degree first
    ranked = (
        edges.join(deg.withColumnRenamed("__pf_v", "__pf_a"), "__pf_a")
        .withColumnRenamed("__pf_deg", "__pf_da")
        .join(deg.withColumnRenamed("__pf_v", "__pf_b"), "__pf_b")
        .withColumnRenamed("__pf_deg", "__pf_db")
    )
    ra = F.struct(F.col("__pf_da").alias("d"), F.col("__pf_a").alias("v"))
    rb = F.struct(F.col("__pf_db").alias("d"), F.col("__pf_b").alias("v"))
    oriented = ranked.select(
        F.when(ra < rb, F.col("__pf_a")).otherwise(F.col("__pf_b")).alias("u"),
        F.when(ra < rb, F.col("__pf_b")).otherwise(F.col("__pf_a")).alias("v"),
        F.when(ra < rb, rb).otherwise(ra).alias("rv"),
    )
    e1 = oriented.select(
        F.col("u").alias("__pf_u"), F.col("v").alias("__pf_x"),
        F.col("rv").alias("__pf_rx"),
    )
    e2 = oriented.select(
        F.col("u").alias("__pf_u"), F.col("v").alias("__pf_y"),
        F.col("rv").alias("__pf_ry"),
    )
    wedges = e1.join(e2, "__pf_u").filter(F.col("__pf_rx") < F.col("__pf_ry"))
    closing = oriented.select(
        F.col("u").alias("__pf_x"), F.col("v").alias("__pf_y")
    )
    tri = wedges.join(closing, ["__pf_x", "__pf_y"], "left_semi")
    counts = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    return counts.crossJoin(
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    ).select("n_nodes", "n_edges", "n_triangles")
