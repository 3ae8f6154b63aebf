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


def _complete(path: str, spark: SparkSession | None = None) -> bool:
    """True iff the stage's ``_SUCCESS`` marker exists. Resolved through
    the Hadoop FileSystem API when a session is available, so hdfs:// /
    s3a:// checkpoint dirs work, not just the driver-local filesystem
    (falls back to os.path for plain local paths with no session)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        return os.path.exists(os.path.join(path, "_SUCCESS"))
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
    return p.getFileSystem(conf).exists(p)


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
            "partial": _complete(self.partial_path, self.spark),
            "merged": _complete(self.merged_path, self.spark),
            "metrics": _complete(self.metrics_path, self.spark),
        }

    def run(self, df: DataFrame, element: str) -> DataFrame:
        """Execute (or resume) the job; returns the merged sketch table."""
        if _complete(self.merged_path, self.spark):
            return self.spark.read.parquet(self.merged_path)

        if _complete(self.partial_path, self.spark):
            partials = self.spark.read.parquet(self.partial_path)
        else:
            pf_partial(
                df, element, self.by, self.version, lineage=True
            ).write.mode("overwrite").parquet(self.partial_path)
            partials = self.spark.read.parquet(self.partial_path)

        if not _complete(self.metrics_path, self.spark):
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


class ResumableSketchJob:
    """Stage-checkpointed aggregation for ANY extension sketch
    (KMV / CMS / Bloom / KLL / t-digest / SpaceSaving) — the
    :class:`ResumableHllJob` contract generalized over a
    ``operators.sketch_agg.KernelSpec``:

        <dir>/stage=partial/  (by..., sketch, _partition_id)
        <dir>/stage=merged/   (by..., sketch)
        <dir>/stage=metrics/  per-partition partial counts + bytes

    Resume correctness: every spec's merge is associative + commutative
    (KMV = set union of k-min hashes, CMS = counter addition, Bloom =
    bit OR, KLL/t-digest/SpaceSaving = mergeable summaries), so merging
    checkpointed partials in any order — or twice — yields the same
    result (byte-identical for KMV/CMS/Bloom, estimate-identical for
    the order-dependent summaries)."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        spec,
        by: Sequence[str] = (),
    ):
        self.spark = spark
        self.dir = checkpoint_dir.rstrip("/")
        self.spec = spec
        self.by = list(by)

    partial_path = property(lambda self: f"{self.dir}/stage=partial")
    merged_path = property(lambda self: f"{self.dir}/stage=merged")
    metrics_path = property(lambda self: f"{self.dir}/stage=metrics")
    params_path = property(lambda self: f"{self.dir}/stage=params")

    def stages_complete(self) -> dict[str, bool]:
        return {
            "partial": _complete(self.partial_path, self.spark),
            "merged": _complete(self.merged_path, self.spark),
            "metrics": _complete(self.metrics_path, self.spark),
        }

    def _check_params(self, element, weight) -> None:
        """Persist the build parameters next to the partials and refuse
        to resume under different ones: checkpointed partials already
        bake in the element/weight expressions, so silently merging them
        under a changed weight would return WRONG sketches with no
        error. The expressions are compared by their Column string form
        (deterministic for a given construction)."""
        row = {
            "element_expr": str(element),
            "weight_expr": str(weight) if weight is not None else "",
            "by": ",".join(self.by),
        }
        if _complete(self.params_path, self.spark):
            prev = self.spark.read.parquet(self.params_path).collect()[0].asDict()
            if prev != row:
                raise ValueError(
                    "checkpoint at {} was built with different parameters: "
                    "{} vs requested {}; use a fresh checkpoint_dir (or "
                    "delete the stale one)".format(self.dir, prev, row)
                )
        else:
            self.spark.createDataFrame(
                [tuple(row.values())], "element_expr string, weight_expr string, by string"
            ).coalesce(1).write.mode("overwrite").parquet(self.params_path)

    def run(self, df: DataFrame, element, weight=None) -> DataFrame:
        """Execute (or resume) the job; returns the merged sketch table.
        ``weight`` (optional Column) flows to ``sketch_partial`` — the
        weighted-sketch jobs checkpoint/resume identically because the
        weight only affects how partials are BUILT, never how the
        already-encoded partials merge. The build parameters are
        recorded at stage=params; resuming with a different element /
        weight / by raises instead of silently merging stale partials."""
        from pfutil_spark.operators.sketch_agg import sketch_merge, sketch_partial

        self._check_params(element, weight)
        if _complete(self.merged_path, self.spark):
            return self.spark.read.parquet(self.merged_path)

        if _complete(self.partial_path, self.spark):
            partials = self.spark.read.parquet(self.partial_path)
        else:
            sketch_partial(df, element, self.spec, self.by, weight=weight).withColumn(
                "_partition_id", F.spark_partition_id()
            ).write.mode("overwrite").parquet(self.partial_path)
            partials = self.spark.read.parquet(self.partial_path)

        if not _complete(self.metrics_path, self.spark):
            partials.groupBy("_partition_id").agg(
                F.count(F.lit(1)).alias("n_partial_sketches"),
                F.sum(F.length("sketch")).alias("sketch_bytes"),
            ).write.mode("overwrite").parquet(self.metrics_path)

        merged = sketch_merge(partials.drop("_partition_id"), self.spec, self.by)
        merged.write.mode("overwrite").parquet(self.merged_path)
        return self.spark.read.parquet(self.merged_path)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.metrics_path)


class ResumableSketchMultiJob:
    """Stage-checkpointed MULTI-sketch report (one scan, N metric
    columns — operators.sketch_agg.sketch_multi split at its
    partial/merge boundary):

        <dir>/stage=params/   build parameters (resume guard)
        <dir>/stage=partial/  (by..., metric_1..metric_N, _partition_id)
        <dir>/stage=merged/   (by..., metric_1..metric_N)
        <dir>/stage=metrics/  per-partition partial counts + bytes

    Resume correctness: every metric's merge is associative/commutative
    (same specs as ResumableSketchJob), so merging checkpointed partials
    in any order — or twice — yields the same result per column."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        metrics: dict,
        by: Sequence[str] = (),
    ):
        self.spark = spark
        self.dir = checkpoint_dir.rstrip("/")
        self.metrics = dict(metrics)
        self.by = list(by)

    partial_path = property(lambda self: f"{self.dir}/stage=partial")
    merged_path = property(lambda self: f"{self.dir}/stage=merged")
    metrics_path = property(lambda self: f"{self.dir}/stage=metrics")
    params_path = property(lambda self: f"{self.dir}/stage=params")

    def _check_params(self) -> None:
        row = {
            "metric_exprs": ";".join(
                f"{m}={str(t[0])}|w={str(t[2]) if len(t) > 2 else ''}"
                for m, t in self.metrics.items()
            ),
            "by": ",".join(self.by),
        }
        if _complete(self.params_path, self.spark):
            prev = self.spark.read.parquet(self.params_path).collect()[0].asDict()
            if prev != row:
                raise ValueError(
                    "checkpoint at {} was built with different parameters: "
                    "{} vs requested {}; use a fresh checkpoint_dir".format(
                        self.dir, prev, row
                    )
                )
        else:
            self.spark.createDataFrame(
                [tuple(row.values())], "metric_exprs string, by string"
            ).coalesce(1).write.mode("overwrite").parquet(self.params_path)

    def run(self, df: DataFrame) -> DataFrame:
        from pfutil_spark.operators.sketch_agg import (
            sketch_multi_merge,
            sketch_multi_partial,
        )

        self._check_params()
        if _complete(self.merged_path, self.spark):
            return self.spark.read.parquet(self.merged_path)

        names = list(self.metrics.keys())
        if _complete(self.partial_path, self.spark):
            partials = self.spark.read.parquet(self.partial_path)
        else:
            sketch_multi_partial(df, self.metrics, self.by).withColumn(
                "_partition_id", F.spark_partition_id()
            ).write.mode("overwrite").parquet(self.partial_path)
            partials = self.spark.read.parquet(self.partial_path)

        if not _complete(self.metrics_path, self.spark):
            partials.groupBy("_partition_id").agg(
                F.count(F.lit(1)).alias("n_partial_rows"),
                *[
                    F.sum(F.length(m)).alias(f"{m}_bytes")
                    for m in names
                ],
            ).write.mode("overwrite").parquet(self.metrics_path)

        merged = sketch_multi_merge(
            partials.drop("_partition_id"),
            {m: t[1] for m, t in self.metrics.items()},
            self.by,
        )
        merged.write.mode("overwrite").parquet(self.merged_path)
        return self.spark.read.parquet(self.merged_path)

    def job_metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.metrics_path)
