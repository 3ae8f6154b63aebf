"""Per-column table profiling: the data-quality report (row counts,
null counts, min/max, approximate distinct per column) that corpus
monitoring and ingest validation run before anything else touches a new
snapshot (no reference-repo counterpart; provided Spark-side like
SURVEY.md §2.3 — the sketch core is the reference's HLL).

Scale shape — exactly two passes over the table, both map-only before
a constant-size reduction, regardless of how many columns are profiled:

* Pass 1 (exact stats): ONE whole-stage-codegen aggregate computes
  every column's non-null count and native min/max in a single scan —
  a 1-row result, no shuffle wider than the partial-aggregate rows.
* Pass 2 (distinct): pf_count_distinct_multi — one mapInArrow scan
  builds an HLL sketch PER COLUMN simultaneously (operators/multi.py),
  one constant-size shuffle of ~12KB sketches, Redis-parity estimates.

The two passes cannot fuse (Catalyst aggregates and mapInArrow do not
compose into one stage), and keeping the exact pass in pure codegen is
worth the second scan. min/max are computed on the NATIVE type, then
cast to string for the uniform report schema — note doubles/timestamps
stringify engine-specifically; integers and strings are portable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pfutil_spark.operators.multi import pf_count_distinct_multi


def table_profile(
    df: DataFrame, cols: Sequence[str] | None = None, version: int = 4
) -> DataFrame:
    """One row per profiled column: ``column``, ``n_rows``, ``n_null``,
    ``n_distinct_est`` (HLL over the string form of non-null values,
    within the published ~0.81% standard error), ``min_value`` /
    ``max_value`` (native-type extrema, stringified). ``cols`` defaults
    to every column of ``df``."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("table_profile: no columns to profile")

    def _ref(c: str):  # dotted/special column names stay one column
        return F.col("`" + c.replace("`", "``") + "`")

    # internal aliases are INDEX-based so arbitrary column names (dots,
    # backticks, spaces) never leak into generated identifiers
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_ref(c)).alias(f"__nn_{i}"),
            F.min(_ref(c)).cast("string").alias(f"__min_{i}"),
            F.max(_ref(c)).cast("string").alias(f"__max_{i}"),
        ]
    stats = df.agg(*aggs)
    long = stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__rows").alias("n_rows"),
                        (F.col("__rows") - F.col(f"__nn_{i}")).alias("n_null"),
                        F.col(f"__min_{i}").alias("min_value"),
                        F.col(f"__max_{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("s")
    ).select("s.*")
    # pf_partial_multi casts non-string elements itself; pre-select only
    # to rename special column names to safe positional ones
    est = pf_count_distinct_multi(
        df.select(*[_ref(c).alias(f"__e_{i}") for i, c in enumerate(cols)]),
        [f"__e_{i}" for i in range(len(cols))],
        version=version,
    )
    name_of = F.create_map(
        *[x for i, c in enumerate(cols) for x in (F.lit(f"__e_{i}"), F.lit(c))]
    )
    est = est.select(
        name_of[F.col("metric")].alias("column"),
        F.col("estimate").alias("n_distinct_est"),
    )
    # both sides are column-count-sized (a handful of rows): broadcast
    return long.join(F.broadcast(est), "column").select(
        "column", "n_rows", "n_null", "n_distinct_est", "min_value", "max_value"
    )
