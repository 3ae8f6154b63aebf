"""Join-size / F2 estimation from CMS sketches (operators/estimate.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.kernel import cms


class TestKernelInnerProduct:
    def test_matches_exact_inner_product_when_wide(self):
        # width >> distinct keys: collisions are possible but the
        # guarantee (never undercount) must hold; with these few keys
        # at width 1<<14 the estimate is exact with overwhelming
        # probability — assert the bound, not luck.
        rng = np.random.default_rng(7)
        keys_a = rng.integers(0, 50, size=4000, dtype=np.int64)
        keys_b = rng.integers(0, 50, size=3000, dtype=np.int64)
        A = cms.empty(width=1 << 14)
        B = cms.empty(width=1 << 14)
        cms.update(A, keys_a)
        cms.update(B, keys_b)
        fa = np.bincount(keys_a, minlength=50)
        fb = np.bincount(keys_b, minlength=50)
        exact = int(np.dot(fa, fb))
        est = cms.inner_product(A, B)
        assert est >= exact
        eps = np.e / (1 << 14)
        assert est <= exact + eps * len(keys_a) * len(keys_b)

    def test_self_join_is_f2(self):
        keys = np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)
        A = cms.empty(width=1 << 14)
        cms.update(A, keys)
        est = cms.inner_product(A, A)
        assert est >= 9 + 4 + 1  # F2 = 14

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            cms.inner_product(cms.empty(width=64), cms.empty(width=128))

    def test_exact_python_int_no_overflow(self):
        # counts ~2^40 each: the per-bucket product is ~2^80, far past
        # int64 — the accumulator must be an exact Python int.
        A = cms.empty(depth=2, width=8)
        A += np.int64(1 << 40)
        est = cms.inner_product(A, A)
        assert est == 8 * (1 << 80)


class TestJoinSizeEstimate:
    def _skewed(self, spark):
        # hot key 0 (500 rows), warm key 1 (50), long tail
        rows = [(0,)] * 500 + [(1,)] * 50 + [(k,) for k in range(2, 400)]
        return spark.createDataFrame(rows, "k long")

    def test_self_join_f2_bounds(self, spark):
        from pfutil_spark.operators.estimate import join_size_estimate

        df = self._skewed(spark)
        r = join_size_estimate(df, "k").collect()[0]
        exact = (
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * F.col("n")).alias("f2"))
            .collect()[0]["f2"]
        )
        assert r["n_left"] == r["n_right"] == df.count()
        assert r["est_join_rows"] >= exact
        assert r["est_join_rows"] <= exact + r["overcount_bound"]

    def test_cross_table_join_size_bounds(self, spark):
        from pfutil_spark.operators.estimate import join_size_estimate

        a = self._skewed(spark)
        b = spark.createDataFrame([(k,) for k in range(0, 100)] * 3, "k long")
        r = join_size_estimate(a, "k", b, "k").collect()[0]
        exact = a.join(b, "k").count()
        assert r["n_left"] == a.count() and r["n_right"] == b.count()
        assert r["est_join_rows"] >= exact
        assert r["est_join_rows"] <= exact + r["overcount_bound"]

    def test_null_keys_excluded_like_equijoin(self, spark):
        from pfutil_spark.operators.estimate import join_size_estimate

        a = spark.createDataFrame([(1,), (None,), (None,)], "k long")
        b = spark.createDataFrame([(1,), (None,)], "k long")
        r = join_size_estimate(a, "k", b, "k").collect()[0]
        # equi-join drops NULLs: exact size is 1, totals count non-null rows
        assert r["n_left"] == 1 and r["n_right"] == 1
        assert r["est_join_rows"] >= 1.0

    def test_key_b_required(self, spark):
        from pfutil_spark.operators.estimate import join_size_estimate

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="key_b"):
            join_size_estimate(df, "k", df, None)
