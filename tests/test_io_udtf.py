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


def test_extension_sketch_sql_functions(spark):
    """Checkpoint-style sketch tables are queryable in plain SQL for
    every sketch family (r4): kmv_estimate / tdigest_quantile /
    cms_total / ss_topk_json."""
    import json

    from pyspark.sql import functions as F

    from pfutil_spark.functions.sql import register_sql_functions
    from pfutil_spark.operators.sketch_agg import (
        cms_sketch,
        kmv_sketch,
        spacesaving_sketch,
        tdigest_sketch,
    )

    register_sql_functions(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    kmv_sketch(ev, "user_id", by=("event_type",)).createOrReplaceTempView("t_kmv")
    tdigest_sketch(ev, "value", by=("event_type",)).createOrReplaceTempView("t_td")
    cms_sketch(ev, "user_id", by=("event_type",)).createOrReplaceTempView("t_cms")
    spacesaving_sketch(ev, "user_id", by=("event_type",)).createOrReplaceTempView("t_ss")

    exact = {
        r["event_type"]: (r["d"], r["n"], r["p50"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.count("user_id").alias("n"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for r in spark.sql("SELECT event_type, kmv_estimate(sketch) AS e FROM t_kmv").collect():
        d = exact[r["event_type"]][0]
        assert abs(r["e"] - d) <= max(2.0, 0.15 * d)
    for r in spark.sql(
        "SELECT event_type, tdigest_quantile(sketch, 0.5) AS q FROM t_td"
    ).collect():
        p50 = exact[r["event_type"]][2]
        assert abs(r["q"] - p50) <= max(1.0, 0.2 * abs(p50))
    for r in spark.sql("SELECT event_type, cms_total(sketch) AS t FROM t_cms").collect():
        assert r["t"] == exact[r["event_type"]][1]
    for r in spark.sql(
        "SELECT event_type, ss_topk_json(sketch, 3) AS j FROM t_ss"
    ).collect():
        top = json.loads(r["j"])
        assert 1 <= len(top) <= 3 and all(len(t) == 3 for t in top)
