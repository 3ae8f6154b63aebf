"""Bucketed-table layout gates: write_bucketed_table persists the hash
layout in the catalog, and the plans that justify it actually drop their
shuffles — a co-bucketed equi-join and a groupBy on the bucket key both
run with ZERO Exchange, while the same query on plain parquet shuffles.
This is the pay-once layout for 100-TB fact tables: the write's one
shuffle is amortized over every downstream join/agg on the key family.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import plan_of
from pfutil_spark.sources.io import write_bucketed_table


def _exchanges(df) -> int:
    # count shuffles in "simple" mode — formatted mode splits the node
    # name from its hashpartitioning arguments across sections
    return plan_of(df, "simple").count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    """Two tables co-bucketed on `k` (4 buckets), plus the source frames."""
    facts = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    dims = spark.range(0, 97).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id") % 5).alias("grp")
    )
    write_bucketed_table(facts, "bt_facts", bucket_by=["k"], num_buckets=4)
    write_bucketed_table(
        dims, "bt_dims", bucket_by=["k"], num_buckets=4, sort_by=["k"]
    )
    yield facts, dims
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_groupby_on_bucket_key_has_zero_exchange(spark, bucketed_pair):
    facts, _ = bucketed_pair
    agg = lambda df: df.groupBy("k").agg(F.sum("v").alias("sv"))  # noqa: E731

    bt = agg(spark.table("bt_facts"))
    assert "Bucketed: true" in plan_of(bt), plan_of(bt)
    assert _exchanges(bt) == 0, plan_of(bt, "simple")
    # the identical agg on the unbucketed frame DOES shuffle — the gate
    # is meaningful, not vacuously zero
    assert _exchanges(agg(facts)) == 1

    got = {(r.k, r.sv) for r in bt.collect()}
    want = {(r.k, r.sv) for r in agg(facts).collect()}
    assert got == want and len(got) == 97


def test_cobucketed_join_has_zero_exchange(spark, bucketed_pair):
    facts, dims = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
        plan = plan_of(j, "simple")
        assert "SortMergeJoin" in plan, plan
        assert _exchanges(j) == 0, plan
        # same join on plain frames shuffles BOTH sides
        assert _exchanges(facts.join(dims, "k")) == 2
        # and the answer is the unbucketed answer
        got = {(r.k, r.v, r.grp) for r in j.collect()}
        want = {(r.k, r.v, r.grp) for r in facts.join(dims, "k").collect()}
        assert got == want and len(got) == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sketch_agg_on_bucketed_input_keeps_one_exchange(spark, bucketed_pair):
    # KNOWN LIMIT, documented on write_bucketed_table: bucketing canNOT
    # elide the sketch plan's merge shuffle. The mapInArrow partial stage
    # emits brand-new output attributes, so the scan's bucketed
    # HashPartitioning (defined over the pruned child attributes) does
    # not survive the Python node — Catalyst correctly reports
    # UnknownPartitioning and keeps the ONE merge Exchange. Bucketing
    # pays off for the RELATIONAL shell (joins/aggs on the key), not for
    # the sketch two-phase plan, whose partial already shrinks the data
    # to one row per (partition, group) before the shuffle.
    from pfutil_spark.operators import pf_count_distinct

    facts, _ = bucketed_pair
    df = pf_count_distinct(
        spark.table("bt_facts").withColumn("e", F.col("v").cast("string")),
        "e",
        by=("k",),
    )
    assert _exchanges(df) == 1, plan_of(df, "simple")
    rows = {(r.k, r.estimate) for r in df.collect()}
    # 97 keys, ~20-21 distinct v each, exact at this cardinality
    assert len(rows) == 97
    assert all(20 <= est <= 21 for _, est in rows)


def test_path_read_loses_bucket_metadata(spark, bucketed_pair):
    # documented trap: reading the files by PATH drops the bucket spec
    # and the shuffle comes back — spark.table() is the contract
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED bt_facts")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    by_path = spark.read.parquet(loc).groupBy("k").agg(F.sum("v").alias("sv"))
    assert _exchanges(by_path) == 1


def test_write_bucketed_table_validation(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed_table(df, "bt_bad", bucket_by=["k"], num_buckets=0)
    with pytest.raises(ValueError, match="bucket_by"):
        write_bucketed_table(df, "bt_bad", bucket_by=[], num_buckets=4)
    with pytest.raises(ValueError, match="unsupported format"):
        write_bucketed_table(
            df, "bt_bad", bucket_by=["k"], num_buckets=4, fmt="avro"
        )
