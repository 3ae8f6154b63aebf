"""Partitioning utilities for the 1000-executor regime (SURVEY.md §4.2,
§7 step 6): explicit hash repartitioning for stable co-location, and
bucketed sketch tables so repeated merges/joins on the same key skip the
shuffle entirely (Spark reads bucketed tables pre-partitioned).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def repartition_by_hash(df: DataFrame, cols: Sequence[str], num_partitions: int) -> DataFrame:
    """Deterministic explicit repartition: pmod(xxhash64(cols...), P).
    Unlike plain ``repartition(cols)`` the bucket id is a pure function
    of the key bytes, so two tables repartitioned this way are row-
    aligned across jobs/clusters (checkpoint-resume friendly)."""
    cols = list(cols)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(num_partitions))
    return df.repartition(num_partitions, bucket)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: later equi-joins/groupBys on
    the bucket columns read it PRE-SHUFFLED (no Exchange in the plan)."""
    bucket_cols = list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def read_table_name(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
