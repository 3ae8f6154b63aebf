"""Banded interval (range) join — the join Spark's planner lacks a
native physical strategy for: match every row of a point table to the
intervals ``[start, end)`` that contain it, WITHOUT a cartesian
product. The standard scalable rewrite (used by every warehouse range
join, e.g. Databricks' range-join binning, public technique): quantise
both sides to coarse buckets of width ``bucket_width``, explode each
interval over the buckets it overlaps, equi-join on (keys, bucket),
then apply the exact band predicate. Each point lives in exactly ONE
bucket, so every qualifying (interval, point) pair is produced exactly
once — no post-join dedup.

At 100 TB: the equi-join shuffles on (keys, bucket) — pick
``bucket_width`` near the typical interval length so intervals explode
to ~2 buckets and each bucket holds a cache-sized slice of points. The
exact predicate is pure codegen. A cartesian/BroadcastNestedLoopJoin
never appears in the plan (tests gate this).

Beyond-reference operator (the reference is a sketch library); the
composition pattern follows the public range-join literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _numcol(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str | Column,
    end: str | Column,
    point: str | Column,
    keys: tuple[str, ...] = (),
    bucket_width: int | float = 1,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join ``points`` rows to the ``intervals`` rows whose
    half-open band ``[start, end)`` contains ``point``, optionally
    also equi-matching on ``keys`` (column names present on BOTH
    sides). ``start`` / ``end`` / ``point`` must be NUMERIC columns or
    expressions (convert dates/timestamps to day or microsecond
    numbers first — naive arithmetic, see the events_temporal_drift
    NTZ lesson). Rows with a NULL endpoint / point and empty bands
    (``end <= start``) match nothing, mirroring SQL band-predicate
    semantics.

    ``bucket_width`` sets the banding granularity: every interval is
    exploded over ``floor(start/w) .. floor(end/w)`` bucket ids (the
    end bucket is kept even when ``end`` sits on the boundary — the
    exact ``point < end`` filter discards the false pairs, and one
    extra bucket is cheaper than a correctness-critical epsilon).
    Intervals wider than ``max_buckets_per_interval`` buckets raise at
    execution time instead of silently exploding the join (a single
    degenerate open-ended interval would otherwise fan out without
    bound).

    Output: all ``intervals`` columns plus all ``points`` columns
    (callers disambiguate clashing names beforehand; ``keys`` columns
    are emitted once). Plan: one explode (map-only, fan-out ~
    ``interval_len / bucket_width``), one hash equi-join on
    (keys, bucket) — the only corpus-scale shuffle — and a codegen
    band filter.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width={bucket_width}: must be > 0")
    if max_buckets_per_interval < 1:
        raise ValueError("max_buckets_per_interval must be >= 1")
    dup = [c for c in points.columns if c in intervals.columns and c not in keys]
    if dup:
        raise ValueError(
            f"columns {dup} exist on both sides; rename or add to keys"
        )
    w = F.lit(bucket_width)
    s, e, p = _numcol(start), _numcol(end), _numcol(point)

    b_lo = F.floor(s / w).cast("long")
    b_hi = F.floor(e / w).cast("long")
    n_buckets = b_hi - b_lo + F.lit(1)
    buckets = F.when(
        n_buckets > F.lit(max_buckets_per_interval),
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{max_buckets_per_interval} buckets of width "
                    f"{bucket_width} (start="
                ),
                s.cast("string"),
                F.lit(", end="),
                e.cast("string"),
                F.lit("); raise bucket_width or max_buckets_per_interval"),
            )
        ).cast("array<long>"),
    ).otherwise(F.sequence(b_lo, b_hi))

    left = (
        intervals.filter(s.isNotNull() & e.isNotNull() & (e > s))
        .withColumn("__pf_s", s)
        .withColumn("__pf_e", e)
        .withColumn("__pf_bucket", F.explode(buckets))
    )
    right = points.filter(p.isNotNull()).withColumn("__pf_p", p).withColumn(
        "__pf_pbucket", F.floor(p / w).cast("long")
    )

    cond = F.col("__pf_bucket") == F.col("__pf_pbucket")
    for k in keys:
        cond = cond & left[k].eqNullSafe(right[k])
    joined = left.join(right, cond, "inner").filter(
        (F.col("__pf_p") >= F.col("__pf_s")) & (F.col("__pf_p") < F.col("__pf_e"))
    )
    out_cols = [left[c] for c in intervals.columns] + [
        right[c] for c in points.columns if c not in keys
    ]
    return joined.select(*out_cols)
