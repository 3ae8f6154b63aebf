"""salted_join gates: the result is EXACTLY the plain equi-join under
every (salt, hot_keys, how) shape, the hot key really spreads across
salt sub-keys, the right side replicates only what the mode promises,
and the plan stays an equi-join (no cartesian, no broadcast needed)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import plan_of
from pfutil_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 7 owns half of all fact rows; keys 0..9 exist in the dim
    facts = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % 10)
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )
    dims = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    return facts, dims


def _rows(df):
    # sort via a None-safe key (tuples with NULLs don't compare in py)
    rows = [tuple(r) for r in df.collect()]
    return sorted(
        rows,
        key=lambda t: [(x is None, type(x).__name__, str(x)) for x in t],
    )


def test_inner_matches_plain_join_all_salted(spark, skewed):
    facts, dims = skewed
    got = salted_join(facts, dims, on="k", salt=8)
    want = facts.join(dims, "k")
    assert got.columns == ["k", "v", "name"]
    assert _rows(got) == _rows(want)


def test_inner_matches_plain_join_hot_keys_only(spark, skewed):
    facts, dims = skewed
    got = salted_join(facts, dims, on="k", salt=8, hot_keys=[7])
    assert _rows(got) == _rows(facts.join(dims, "k"))


def test_left_join_keeps_unmatched_and_null_keys(spark, skewed):
    facts, _ = skewed
    # dim missing keys 5..9 and fact gains a NULL key row
    dims = spark.range(0, 5).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    f = facts.unionByName(
        spark.createDataFrame([(None, -1)], "k long, v long")
    )
    got = salted_join(f, dims, on="k", how="left", salt=4, hot_keys=[7])
    want = f.join(dims, "k", "left")
    assert _rows(got) == _rows(want)
    # the NULL-key and unmatched rows each appear exactly once
    assert got.where(F.col("k").isNull()).count() == 1


def test_different_key_names_keep_both_keys(spark, skewed):
    facts, dims = skewed
    d = dims.withColumnRenamed("k", "dk")
    got = salted_join(facts, d, on="k", right_on="dk", salt=4)
    assert got.columns == ["k", "v", "dk", "name"]
    want = facts.join(d, facts["k"] == d["dk"])
    assert _rows(got) == _rows(want)


def test_hot_key_spreads_and_cold_keys_do_not(spark, skewed):
    facts, dims = skewed
    salted = salted_join(
        facts.withColumn("__probe", F.lit(1)), dims, on="k", salt=8,
        hot_keys=[7],
    )
    # observe the salt by re-deriving it the way the operator does:
    # 2000 rows of key 7 across 8 salts can't land in one sub-key
    from pfutil_spark.operators.skew import _SALT

    l2 = facts.withColumn(
        _SALT,
        F.when(
            F.col("k") == 7, F.pmod(F.xxhash64("k", "v"), F.lit(8))
        ).otherwise(F.lit(0)),
    )
    per_salt = (
        l2.where(F.col("k") == 7).groupBy(_SALT).count().collect()
    )
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 2000 * 0.25
    assert salted.count() == 4000


def test_right_replication_is_bounded(spark, skewed):
    _, dims = skewed
    # all-salted: dim ships salt copies; hot-only: cold rows ship once
    from pfutil_spark.operators.skew import _SALT  # noqa: F401

    all_salted = dims.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("s")
    )
    assert all_salted.count() == 10 * 8
    # the operator's hot-only replication = hot*salt + cold
    facts = spark.range(1).select(F.lit(7).alias("k"), F.lit(0).alias("v"))
    got = salted_join(facts, dims, on="k", salt=8, hot_keys=[7])
    assert got.count() == 1


def test_plan_is_equijoin_no_cartesian(spark, skewed):
    facts, dims = skewed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(facts, dims, on="k", salt=8)
        plan = plan_of(j, "simple")
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salt_one_degenerates_to_plain_join(spark, skewed):
    facts, dims = skewed
    got = salted_join(facts, dims, on="k", salt=1)
    assert _rows(got) == _rows(facts.join(dims, "k"))


def test_validation(spark, skewed):
    facts, dims = skewed
    with pytest.raises(ValueError, match="salt=0"):
        salted_join(facts, dims, on="k", salt=0)
    with pytest.raises(ValueError, match="how"):
        salted_join(facts, dims, on="k", how="full")
    with pytest.raises(ValueError, match="left key"):
        salted_join(facts, dims, on="nope")
    with pytest.raises(ValueError, match="right key"):
        salted_join(facts, dims, on="k", right_on="nope")
    with pytest.raises(ValueError, match="hot_keys is empty"):
        salted_join(facts, dims, on="k", hot_keys=[])
    with pytest.raises(ValueError, match="salt_on columns"):
        salted_join(facts, dims, on="k", salt_on=["nope"])
    with pytest.raises(ValueError, match="reserved column"):
        salted_join(facts.withColumn("__pf_salt", F.lit(1)), dims, on="k")


def test_empty_salt_on_and_generator_hot_keys(spark, skewed):
    facts, dims = skewed
    # review findings: empty salt_on must be a crafted error (it used
    # to crash inside Catalyst with zero-arg xxhash64), and a
    # generator hot_keys must not be silently exhausted
    with pytest.raises(ValueError, match="salt_on is empty"):
        salted_join(facts, dims, on="k", salt_on=[])
    got = salted_join(facts, dims, on="k", salt=4, hot_keys=iter([7]))
    assert _rows(got) == _rows(facts.join(dims, "k"))
