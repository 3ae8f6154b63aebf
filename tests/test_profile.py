"""Per-column table profiling (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators.profile import table_profile


class TestTableProfile:
    def test_exact_stats_and_distinct_bound(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
        prof = {r["column"]: r for r in table_profile(df, cols).collect()}
        assert set(prof) == set(cols)
        n = df.count()
        for c in cols:
            exact_nn = df.filter(F.col(c).isNotNull()).count()
            exact_d = df.select(c).distinct().dropna().count()
            r = prof[c]
            assert r["n_rows"] == n
            assert r["n_null"] == n - exact_nn
            assert abs(r["n_distinct_est"] - exact_d) <= max(1.0, exact_d * 3 * 0.008125)
            lo, hi = df.agg(
                F.min(F.col(c)).cast("string"), F.max(F.col(c)).cast("string")
            ).collect()[0]
            assert (r["min_value"], r["max_value"]) == (lo, hi)

    def test_nulls_counted_and_all_null_column(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, None)], "x long, y string"
        ).withColumn("z", F.lit(None).cast("string"))
        prof = {r["column"]: r for r in table_profile(df).collect()}
        assert prof["x"]["n_null"] == 1 and prof["y"]["n_null"] == 2
        z = prof["z"]
        # all-NULL column: 0 distinct, NULL extrema, full null count
        assert z["n_null"] == 3 and z["n_distinct_est"] == 0
        assert z["min_value"] is None and z["max_value"] is None

    def test_all_null_column_survives_single_partition(self, spark):
        # regression: pf_partial_multi's accumulation path used to skip
        # an element whose values were ALL null in a partition that had
        # data for other columns — on a single-partition table the
        # all-NULL column vanished from the report entirely
        df = (
            spark.createDataFrame(
                [(1, "a"), (2, None), (3, None)], "x long, y string"
            )
            .withColumn("z", F.lit(None).cast("string"))
            .coalesce(1)
        )
        prof = {r["column"]: r for r in table_profile(df).collect()}
        assert set(prof) == {"x", "y", "z"}
        assert prof["z"]["n_distinct_est"] == 0 and prof["z"]["n_null"] == 3

    def test_dotted_and_backticked_column_names(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, t string").select(
            F.col("id").alias("user.id"), F.col("t").alias("we`ird name")
        )
        prof = {r["column"]: r for r in table_profile(df).collect()}
        assert set(prof) == {"user.id", "we`ird name"}
        assert prof["user.id"]["n_distinct_est"] == 1
        assert prof["user.id"]["min_value"] == "1"

    def test_validation(self, spark):
        df = spark.range(3)
        with pytest.raises(ValueError, match="no columns"):
            table_profile(df, [])
