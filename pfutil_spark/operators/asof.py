"""Time-series operators Spark lacks natively: as-of join and
sessionization.

As-of join: for each left row, the latest right row with
``right.on <= left.on`` (optionally tolerance-bounded), per key. Spark
has no native ASOF JOIN (DuckDB/Pandas do), so this is composed as
``cogroup().applyInPandas`` with ``pd.merge_asof`` per key group — the
standard distributed shape: both sides shuffle ONCE on the key, each
group's merge is a linear two-pointer pass over sorted Arrow batches.

Sessionization: gap-based session ids from pure window expressions
(lag + cumulative sum) — all JVM codegen, SQL-oracle-able.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row: the most recent right row at-or-before
    ``left.on`` (direction='backward'; 'forward'/'nearest' as in pandas),
    matched within ``by`` keys. Right's non-key columns are appended
    (nulls when no match). One shuffle per side, merge_asof per group.

    Keyless (``by=()``): rows are RANGE-partitioned on ``on`` into
    parallel merge tasks; each bucket additionally receives boundary
    "carry" rows (latest right row before its range for backward,
    earliest after for forward, both for nearest), so the as-of match is
    exact across bucket boundaries while the merge stays parallel — all
    three directions, since r3. Bucket edges derive lazily inside the
    job (no driver action at plan-construction time).
    """
    by = list(by)
    l_cols = left.columns
    r_value_cols = [c for c in right.columns if c not in by and c != on]
    collide = [c for c in r_value_cols if c in l_cols]
    if collide:
        raise ValueError(
            f"asof_join: right value column(s) {collide} collide with left "
            "column names — pd.merge_asof would silently shadow them; "
            "rename the right columns first"
        )
    out_schema = StructType(
        [left.schema[c] for c in l_cols]
        + [right.schema[c] for c in r_value_cols]
    )
    tol = pd.Timedelta(tolerance) if tolerance else None

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=l_cols + r_value_cols)
        lpdf = lpdf.sort_values(on, kind="stable")
        if len(rpdf) == 0:
            out = lpdf.copy()
            for c in r_value_cols:
                out[c] = None
            return out[l_cols + r_value_cols]
        rpdf = rpdf[[on] + r_value_cols].sort_values(on, kind="stable")
        merged = pd.merge_asof(
            lpdf, rpdf, on=on, direction=direction, tolerance=tol,
            suffixes=("", "__r"),
        )
        return merged[l_cols + r_value_cols]

    if by:
        return (
            left.groupBy(*by)
            .cogroup(right.groupBy(*by))
            .applyInPandas(lambda l, r: merge(l, r), out_schema)
        )
    return _asof_keyless_ranged(left, right, on, merge, out_schema, direction)


def _asof_keyless_ranged(
    left: DataFrame,
    right: DataFrame,
    on: str,
    merge,
    out_schema: StructType,
    direction: str = "backward",
    buckets: int | None = None,
) -> DataFrame:
    """Parallel keyless as-of for ALL directions: range-bucket both sides
    on ``on`` and duplicate boundary rows ("carries") into each bucket so
    every left row's match is locally available — backward carries the
    latest right row before each bucket, forward the earliest right row
    after it, nearest both. Any right row in an earlier (later) bucket is
    farther from a left value than that bucket's latest (earliest) row,
    so one carry per side per bucket is sufficient for exactness. The
    merge runs with one task per bucket instead of one task total.

    Bucket edges are approximate percentiles of the left side computed
    INSIDE the job (``percentile_approx`` + a broadcast 1-row array +
    a JVM array-filter bucket expression) — constructing the plan runs
    no driver action, unlike an ``approxQuantile`` pre-pass."""
    spark = left.sparkSession
    if buckets is None:
        buckets = spark.sparkContext.defaultParallelism
    # type-aware numeric view of `on` for BUCKETING only (merge_asof sees
    # the original values): timestamp_ntz/date cannot cast to double
    # directly — go through timestamp first. The session-tz cast is fine
    # here because bucket ids only need a consistent non-decreasing
    # mapping within this one job, applied identically to both sides.
    on_t = left.schema[on].dataType.typeName()
    if on_t in ("timestamp_ntz", "date"):
        on_num = F.col(on).cast("timestamp").cast("double")
    else:
        on_num = F.col(on).cast("double")
    probs = [i / buckets for i in range(1, buckets)]
    # persisted lazily: no job at construction, but the percentile scan
    # of the left side computes ONCE at first action even though the
    # 1-row edge frame is referenced by both sides' bucket expressions
    # (release via release_cached(result) if the session is long-lived)
    from pfutil_spark.operators._cache import CacheScope

    scope = CacheScope()
    edges = scope.persist(left.agg(
        F.coalesce(
            F.array_distinct(
                F.array_sort(F.percentile_approx(on_num, F.lit(probs)))
            ),
            F.array().cast("array<double>"),
        ).alias("__edges")
    ))

    def with_bucket(df: DataFrame) -> DataFrame:
        # bucket id = number of edges strictly below the value; same
        # expression on both sides keeps the partitioning consistent
        return (
            df.crossJoin(F.broadcast(edges))
            .withColumn(
                "__bucket",
                F.size(F.filter(F.col("__edges"), lambda e: on_num > e)).cast("int"),
            )
            .drop("__edges")
        )

    lb = with_bucket(left)
    rb = with_bucket(right)
    # carries: <= `buckets` rows per side, so the replication join is a
    # broadcast of a tiny table
    targets = spark.range(buckets).select(F.col("id").cast("int").alias("__tgt"))
    carry_frames = []
    if direction in ("backward", "nearest"):
        w = Window.partitionBy("__bucket").orderBy(F.col(on).desc())
        last_per_bucket = (
            rb.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        carry_frames.append(
            last_per_bucket.join(
                F.broadcast(targets), F.col("__bucket") < F.col("__tgt")
            )
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__tgt").orderBy(F.col(on).desc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__bucket", "__rn")
            .withColumnRenamed("__tgt", "__bucket")
        )
    if direction in ("forward", "nearest"):
        w = Window.partitionBy("__bucket").orderBy(F.col(on).asc())
        first_per_bucket = (
            rb.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        carry_frames.append(
            first_per_bucket.join(
                F.broadcast(targets), F.col("__bucket") > F.col("__tgt")
            )
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__tgt").orderBy(F.col(on).asc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__bucket", "__rn")
            .withColumnRenamed("__tgt", "__bucket")
        )
    rb_all = rb
    for cf in carry_frames:
        rb_all = rb_all.unionByName(cf.select(*rb.columns))
    out = (
        lb.groupBy("__bucket")
        .cogroup(rb_all.groupBy("__bucket"))
        .applyInPandas(
            lambda l, r: merge(
                l.drop(columns="__bucket"), r.drop(columns="__bucket")
            ),
            out_schema,
        )
    )
    out._pfutil_cache_scope = scope  # release_cached(out) frees the edge row
    return out


def sessionize(
    df: DataFrame,
    ts: str,
    by: Sequence[str],
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (within ``by``) exceeds ``gap_seconds``. Pure
    window expressions (lag + running sum) — whole-stage codegen.
    ``tiebreak`` columns make the ordering total when timestamps repeat."""
    by = list(by)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    # interval comparison works for TIMESTAMP and TIMESTAMP_NTZ alike
    gap_expr = F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    is_new = F.when(prev.isNull() | ((F.col(ts) - prev) > gap_expr), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            Window.partitionBy(*by).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
