"""Multi-element single-scan sketching (the north-star report shape)."""

from pyspark.sql import functions as F

from pfutil_spark.operators import pf_count_distinct
from pfutil_spark.operators.multi import (
    pf_count_distinct_multi,
    sourcecode_distinct_report,
)
from pfutil_spark.sources import sourcecode_table


def test_multi_matches_single_column_runs(spark):
    src = sourcecode_table(spark, 20_000, partitions=8).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
    multi = pf_count_distinct_multi(
        src, ["repo", "path", "commit", "content_sha"], by=("lang",)
    ).collect()
    got = {(r["lang"], r["metric"]): r["estimate"] for r in multi}
    for metric in ("repo", "commit", "content_sha"):
        single = pf_count_distinct(src, metric, by=("lang",)).collect()
        for r in single:
            assert got[(r["lang"], metric)] == r["estimate"], (metric, r["lang"])


def test_sourcecode_report_global_rows_and_bounds(spark):
    src = sourcecode_table(spark, 30_000, partitions=8).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
    rep = sourcecode_distinct_report(src).collect()
    rows = {(r["lang"], r["metric"]): r["estimate"] for r in rep}
    langs = {r["lang"] for r in rep if r["lang"] is not None}
    metrics = {"repo", "path", "commit", "content_sha"}
    assert {m for (_, m) in rows} == metrics
    # global row exists for every metric and matches exact within bound
    for m in metrics:
        assert (None, m) in rows
        exact = src.select(F.countDistinct(m).alias("x")).collect()[0]["x"]
        est = rows[(None, m)]
        assert abs(est - exact) <= max(1, round(3 * 0.008125 * exact)), (m, est, exact)
    # global >= every per-lang estimate (union dominates)
    for (lang, m), est in rows.items():
        if lang is not None:
            assert rows[(None, m)] >= est * 0.97  # HLL noise guard


def test_multi_null_elements_ignored(spark):
    src = (
        spark.range(1000)
        .withColumn("g", (F.col("id") % 2).cast("string"))
        .withColumn("a", F.when(F.col("id") % 3 == 0, None).otherwise(
            F.col("id").cast("string")))
        .withColumn("b", F.col("id").cast("string"))
    )
    rows = pf_count_distinct_multi(src, ["a", "b"], by=("g",)).collect()
    got = {(r["g"], r["metric"]): r["estimate"] for r in rows}
    for g in ("0", "1"):
        assert got[(g, "a")] < got[(g, "b")]
        single = pf_count_distinct(src, "a", by=("g",)).collect()
        for r in single:
            assert got[(r["g"], "a")] == r["estimate"]


def test_multi_all_null_column_rowset_partition_independent(spark):
    """An all-NULL element column must emit (group, metric) rows with
    empty sketches on EVERY path: accumulation single-partition,
    accumulation multi-partition, and direct-emit — the output row set
    may not depend on batch splits (regression: the accumulation path
    skipped fully-null batches, dropping the metric entirely)."""
    src = (
        spark.range(100)
        .withColumn("g", (F.col("id") % 4).cast("string"))
        .withColumn("a", F.col("id").cast("string"))
        .withColumn("z", F.lit(None).cast("string"))
    )
    expect = {(str(g), m) for g in range(4) for m in ("a", "z")}
    for shaped in (src.coalesce(1), src.repartition(5)):
        rows = pf_count_distinct_multi(shaped, ["a", "z"], by=("g",)).collect()
        got = {(r["g"], r["metric"]): r["estimate"] for r in rows}
        assert set(got) == expect
        for g in range(4):
            assert got[(str(g), "z")] == 0
