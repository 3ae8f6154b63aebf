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
    ``keyless_buckets`` tasks; each bucket additionally receives the
    single latest right row before its range start (the "carry"), so
    backward as-of is exact across bucket boundaries while the merge
    stays parallel. Only direction='backward' supports the parallel
    path; 'forward'/'nearest' fall back to a single merge task.
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
    if direction == "backward":
        return _asof_keyless_ranged(left, right, on, merge, out_schema)
    # forward/nearest keyless: single merge task (documented small-input
    # path — the carry trick below is backward-specific)
    lk = left.withColumn("__k", F.lit(1))
    rk = right.withColumn("__k", F.lit(1))
    return (
        lk.groupBy("__k")
        .cogroup(rk.groupBy("__k"))
        .applyInPandas(lambda l, r: merge(l.drop(columns="__k"), r.drop(columns="__k")), out_schema)
    )


def _asof_keyless_ranged(
    left: DataFrame,
    right: DataFrame,
    on: str,
    merge,
    out_schema: StructType,
    buckets: int | None = None,
) -> DataFrame:
    """Parallel keyless backward as-of: range-bucket both sides on ``on``
    (boundaries from approx quantiles of the left side — one cheap pass),
    and duplicate into each bucket the latest right row BEFORE its range
    start so every left row's backward match is locally available. The
    merge runs with one task per bucket instead of one task total."""
    spark = left.sparkSession
    if buckets is None:
        buckets = spark.sparkContext.defaultParallelism
    on_num = F.col(on).cast("double")
    probs = [i / buckets for i in range(1, buckets)]
    edges = left.select(on_num.alias("__v")).approxQuantile("__v", probs, 0.01)
    # dedupe + sort: approxQuantile can repeat edges on skewed data
    edges = sorted(set(edges))
    if not edges:
        edges = [float("inf")]

    def bucket_of(c: Column) -> Column:
        b = F.lit(len(edges))  # > last edge
        for i in range(len(edges) - 1, -1, -1):
            b = F.when(c <= F.lit(edges[i]), F.lit(i)).otherwise(b)
        return b

    lb = left.withColumn("__bucket", bucket_of(on_num))
    rb = right.withColumn("__bucket", bucket_of(on_num))
    # carry: latest right row per bucket, replicated into every LATER
    # bucket, keeping only the latest carry per target bucket. The
    # last-rows frame is <= buckets rows, so the replication join is a
    # broadcast of a tiny table.
    from pyspark.sql.window import Window

    w = Window.partitionBy("__bucket").orderBy(F.col(on).desc())
    last_per_bucket = (
        rb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    targets = spark.range(len(edges) + 1).select(F.col("id").cast("int").alias("__tgt"))
    carries = (
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
    rb_all = rb.unionByName(carries.select(*rb.columns))
    return (
        lb.groupBy("__bucket")
        .cogroup(rb_all.groupBy("__bucket"))
        .applyInPandas(
            lambda l, r: merge(
                l.drop(columns="__bucket"), r.drop(columns="__bucket")
            ),
            out_schema,
        )
    )


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
