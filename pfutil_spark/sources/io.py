"""Source/sink helpers: one entry point over the formats the engine
supports. Parquet is the default (columnar, predicate pushdown, column
pruning). Iceberg/Delta need their runtime jars — not in this container —
so they're gated behind a clear error rather than a confusing classpath
failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
