"""Source/sink helpers: one entry point over the formats the engine
supports. Parquet is the default (columnar, predicate pushdown, column
pruning). Iceberg/Delta need their runtime jars — not in this container —
so they're gated behind a clear error rather than a confusing classpath
failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_NATIVE = {"parquet", "orc", "json", "csv"}
_JAR_GATED = {"iceberg", "delta"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    fmt = fmt.lower()
    if fmt in _JAR_GATED:
        try:
            return spark.read.format(fmt).options(**options).load(path)
        except Exception as e:  # pragma: no cover - no jars in container
            raise NotImplementedError(
                f"{fmt} requires its runtime jars on the classpath "
                f"(spark.jars.packages); not present in this environment"
            ) from e
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "json":
        options.setdefault("multiLine", "false")
    return reader.format(fmt).options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    fmt = fmt.lower()
    if fmt in _JAR_GATED:
        try:
            df.write.format(fmt).mode(mode).options(**options).save(path)
            return
        except Exception as e:  # pragma: no cover
            raise NotImplementedError(
                f"{fmt} requires its runtime jars on the classpath"
            ) from e
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format: {fmt}")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...] | list[str],
    num_buckets: int,
    sort_by: tuple[str, ...] | list[str] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Persist ``df`` as a CATALOG table hash-bucketed on ``bucket_by``
    — the shuffle-elimination layout for 100-TB fact tables. Every
    downstream equi-join between two tables bucketed on the same keys
    with the same ``num_buckets``, and every ``groupBy`` on the bucket
    keys, runs with ZERO Exchange: Spark's scan reports the bucketed
    ``HashPartitioning`` as its output partitioning, so the planner
    drops the shuffle (plan-gated in tests/test_bucketed.py). Pay the
    one layout shuffle at WRITE time, amortized over every query.

    Sizing rule at scale: pick ``num_buckets`` so one bucket of the
    LARGEST co-bucketed table is a few hundred MB (fits an executor
    core's working set); co-located joins require equal bucket counts,
    so choose once per key family. ``sort_by`` additionally orders
    rows within each bucket file (cheaper merge-side sorts when each
    bucket lands in one file).

    Bucketing metadata lives in the session catalog (``saveAsTable``
    is required — ``save(path)`` would silently drop the bucket spec;
    on a real cluster the catalog is the shared metastore). Read back
    with ``spark.table(table)``, never ``spark.read.parquet(path)``
    (a path read loses the bucket metadata and re-shuffles).

    Known limit: the SKETCH two-phase plans keep their one merge
    Exchange even over a co-bucketed scan — the mapInArrow partial
    stage emits new output attributes, so the scan's HashPartitioning
    cannot propagate through the Python node (gated in
    tests/test_bucketed.py). Bucketing buys the relational shell
    (joins/aggs on the key family), and the sketch partial already
    shrinks data to one row per (partition, group) before its shuffle.
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    fmt = fmt.lower()
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format: {fmt}")
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .options(**options)
        .bucketBy(num_buckets, *bucket_by)
    )
    if fmt == "csv":
        writer = writer.option("header", "true")
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by,
    num_files: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Write ``df`` range-CLUSTERED on ``cluster_by``: globally
    range-partitioned into ``num_files`` tasks and sorted within each,
    so every output file covers a narrow, pairwise-disjoint key range
    (gated in tests/test_layout.py). This is the min-max data-skipping
    layout: parquet file/row-group stats on the cluster key become
    selective, so a later predicate on it prunes whole files instead
    of scanning 100 TB. Pair with
    :func:`pfutil_spark.functions.layout.morton_key_col` to make ONE
    clustered axis serve TWO pruning dimensions (OPTIMIZE ZORDER).

    Cost: one range Exchange (plus Spark's tiny boundary-sampling
    pass) at write time — the same pay-once-at-layout trade as
    :func:`write_bucketed_table`, but for RANGE predicates where
    hash bucketing can't skip. ``cluster_by`` takes column names or
    Column expressions (a Morton key is an expression). Range
    partitioning keeps every occurrence of a key value in one file;
    skew in the cluster key shows up as file-size skew, not wrong
    ranges. ``num_files`` sizing at scale: total bytes / ~512 MB.
    """
    if num_files <= 0:
        raise ValueError(f"num_files must be positive, got {num_files}")
    cols = [F.col(c) if isinstance(c, str) else c for c in cluster_by]
    if not cols:
        raise ValueError("cluster_by must name at least one column/expr")
    fmt = fmt.lower()
    if fmt not in _NATIVE:
        raise ValueError(f"unsupported format: {fmt}")
    out = df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)
    writer = out.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
