"""IO helpers, UDTF surface, and shuffle-size economics of sparse
partials."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.kernel import hll
from pfutil_spark.operators import pf_partial, pf_sketch
from pfutil_spark.sources.io import read_table, write_table


def test_roundtrip_all_native_formats(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        write_table(df, p, fmt)
        schema = "doc_id bigint, lang string, n_chars bigint" if fmt in ("json", "csv") else None
        back = read_table(spark, p, fmt, schema=schema)
        assert back.count() == df.count()
        assert set(back.columns) == set(df.columns)


def test_jar_gated_formats_raise_cleanly(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises((NotImplementedError, Exception)):
        write_table(df, str(tmp_path / "ice"), "iceberg")
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), "avro-nope")


def test_pf_registers_udtf(spark):
    from pfutil_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    df = (
        spark.range(100)
        .withColumn("e", F.col("id").cast("string"))
    )
    sk = pf_sketch(df, "e", by=())
    sk.createOrReplaceTempView("sk_udtf_v")
    rows = spark.sql(
        "SELECT t.reg_index, t.value FROM sk_udtf_v, LATERAL pf_registers(sketch) t"
    ).collect()
    regs = hll.decode(bytes(sk.collect()[0]["sketch"]))
    expected = {(int(i), int(regs[i])) for i in np.flatnonzero(regs)}
    assert {(r["reg_index"], r["value"]) for r in rows} == expected
    assert 50 < len(rows) <= 100


def test_partial_shuffle_bytes_sparse_for_long_tail(spark):
    """Long-tail groups (few elements) must ship KB-scale sparse states
    through the shuffle, not 12KB dense ones."""
    df = (
        spark.range(2000)
        .withColumn("grp", (F.col("id") % 500).cast("string"))  # ~4 rows/group
        .withColumn("e", F.col("id").cast("string"))
    )
    partials = pf_partial(df, "e", by=("grp",)).collect()
    sizes = np.array([len(bytes(r["sketch"])) for r in partials])
    assert sizes.max() < 200  # ~4 registers -> tens of bytes, never 12304
    # and a heavy group still round-trips correctly as dense
    big = pf_partial(
        spark.range(200_000).withColumn("g", F.lit("x")).withColumn(
            "e", F.col("id").cast("string")
        ).coalesce(1),
        "e",
        by=("g",),
    ).collect()
    assert len(bytes(big[0]["sketch"])) == hll.HLL_DENSE_SIZE
