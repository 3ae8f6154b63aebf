"""Checkpoint-resumable sketch pipeline (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Each stage of the two-phase plan is persisted to a parquet "sketch
table" under the checkpoint directory:

    <dir>/stage=partial/   (by..., sketch, _partition_id, _rows_seen)
    <dir>/stage=merged/    (by..., sketch)
    <dir>/stage=metrics/   per-partition lineage rollup

Stage completeness is Spark's own atomic ``_SUCCESS`` marker, so a rerun
after any failure resumes from the last complete stage — re-shuffling
constant-size sketches, never re-reading the raw input. The same code
path works against an Iceberg catalog by swapping ``parquet`` for
``format("iceberg")`` writes (no catalog is configured in this sandbox).

Correctness under resume is guaranteed by the register-max merge being
associative/commutative/idempotent (HllByteBuffer.java:341-398 semantics):
merging checkpointed partials in any order, any number of times, yields
byte-identical final sketches.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pfutil_spark.operators.hll_agg import LINEAGE_COLS, pf_merge, pf_partial


def _complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class ResumableHllJob:
    """Distinct-count sketch job with checkpointed stages."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        by: Sequence[str] = (),
        version: int = 4,
        salt_buckets: int | None = None,
    ):
        self.spark = spark
        self.dir = checkpoint_dir.rstrip("/")
        self.by = list(by)
        self.version = version
        self.salt_buckets = salt_buckets

    @property
    def partial_path(self) -> str:
        return f"{self.dir}/stage=partial"

    @property
    def merged_path(self) -> str:
        return f"{self.dir}/stage=merged"

    @property
    def metrics_path(self) -> str:
        return f"{self.dir}/stage=metrics"

    def stages_complete(self) -> dict[str, bool]:
        return {
            "partial": _complete(self.partial_path),
            "merged": _complete(self.merged_path),
            "metrics": _complete(self.metrics_path),
        }

    def run(self, df: DataFrame, element: str) -> DataFrame:
        """Execute (or resume) the job; returns the merged sketch table."""
        if _complete(self.merged_path):
            return self.spark.read.parquet(self.merged_path)

        if _complete(self.partial_path):
            partials = self.spark.read.parquet(self.partial_path)
        else:
            pf_partial(
                df, element, self.by, self.version, lineage=True
            ).write.mode("overwrite").parquet(self.partial_path)
            partials = self.spark.read.parquet(self.partial_path)

        if not _complete(self.metrics_path):
            metrics = partials.groupBy(LINEAGE_COLS[0]).agg(
                F.count(F.lit(1)).alias("n_partial_sketches"),
                F.sum(LINEAGE_COLS[1]).alias("rows_seen"),
                F.sum(F.length("sketch")).alias("sketch_bytes"),
            )
            metrics.write.mode("overwrite").parquet(self.metrics_path)

        merged = pf_merge(
            partials.drop(*LINEAGE_COLS),
            self.by,
            salt_buckets=self.salt_buckets,
        )
        merged.write.mode("overwrite").parquet(self.merged_path)
        return self.spark.read.parquet(self.merged_path)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.metrics_path)
