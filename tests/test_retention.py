"""Cohort retention: exact operator semantics, HLL-snapshot parity at
small cardinality (sparse regime => exact), and partition invariance."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h, 0, 0)) for (u, d, h) in rows],
        "user_id long, ts timestamp_ntz",
    )


@pytest.fixture(scope="module")
def small(spark):
    # day 1: users 1,2,3  day 2: users 2,3  day 3: user 3
    # plus duplicate events within a day (must not double-count)
    return _events(
        spark,
        [
            (1, 1, 0),
            (1, 1, 5),
            (2, 1, 1),
            (3, 1, 2),
            (2, 2, 3),
            (3, 2, 4),
            (3, 2, 23),
            (3, 3, 9),
        ],
    )


def test_cohort_retention_exact(spark, small):
    from pfutil_spark.operators.retention import cohort_retention

    rows = {
        r["day"].isoformat(): (
            r["active_users"],
            r["retained_next"],
            r["retention_rate"],
        )
        for r in cohort_retention(small).collect()
    }
    assert rows == {
        "2024-01-01": (3, 2, 2 / 3),
        "2024-01-02": (2, 1, 0.5),
        "2024-01-03": (1, 0, 0.0),
    }


def test_nulls_dropped(spark, small):
    from pfutil_spark.operators.retention import cohort_retention

    withnull = small.union(
        spark.createDataFrame(
            [(None, dt.datetime(2024, 1, 1)), (9, None)],
            small.schema,
        )
    )
    assert sorted(cohort_retention(withnull).collect()) == sorted(
        cohort_retention(small).collect()
    )


def test_retention_estimates_exact_in_sparse_regime(spark, small):
    """At tens of users the HLL stays sparse => estimates are EXACT, so
    the snapshot path must reproduce the exact counts including the
    no-successor day (empty-sketch coalesce => retained_est 0)."""
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_estimates,
        retention_sketches,
    )

    est = {
        r["day"].isoformat(): (r["active_est"], r["retained_est"])
        for r in retention_estimates(retention_sketches(small)).collect()
    }
    exact = {
        r["day"].isoformat(): (r["active_users"], r["retained_next"])
        for r in cohort_retention(small).collect()
    }
    assert est == exact


def test_partition_invariance(spark, small):
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_estimates,
        retention_sketches,
    )

    base = sorted(map(tuple, cohort_retention(small).collect()))
    for n in (1, 7):
        rep = small.repartition(n)
        assert sorted(map(tuple, cohort_retention(rep).collect())) == base
        est = sorted(
            map(tuple, retention_estimates(retention_sketches(rep)).collect())
        )
        assert est == sorted(
            map(tuple, retention_estimates(retention_sketches(small)).collect())
        )


def test_gap_days_are_not_retention(spark):
    """A user active on day 1 and day 3 (skipping day 2) is churn for
    day 1's next-day metric."""
    from pfutil_spark.operators.retention import cohort_retention

    df = _events(spark, [(1, 1, 0), (1, 3, 0)])
    rows = {
        r["day"].isoformat(): r["retained_next"]
        for r in cohort_retention(df).collect()
    }
    assert rows == {"2024-01-01": 0, "2024-01-03": 0}


def test_estimates_within_bound_at_sf(spark, sf_dir):
    """At the test scale factor the per-day sets are ~10^2 users: the
    union-relative bound must hold on every day (and in the sparse
    regime it holds with equality)."""
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_estimates,
        retention_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = cohort_retention(ev)
    est = retention_estimates(retention_sketches(ev))
    j = exact.join(est, "day").collect()
    assert len(j) > 0
    for r in j:
        union_ub = 2 * r["active_users"]
        assert abs(r["retained_est"] - r["retained_next"]) <= max(
            0.35 * r["retained_next"], 0.08 * union_ub, 3.0
        )


def test_return_gaps(spark):
    from pfutil_spark.operators.retention import return_gaps

    df = _events(spark, [(1, 1, 0), (1, 3, 0), (1, 10, 0), (2, 5, 0)])
    rows = {
        (r["user"], r["day"].isoformat()): r["gap_days"]
        for r in return_gaps(df).collect()
    }
    assert rows == {
        (1, "2024-01-01"): 2,
        (1, "2024-01-03"): 7,
        (1, "2024-01-10"): None,
        (2, "2024-01-05"): None,
    }


def test_retention_within_k(spark):
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_within_k,
    )

    df = _events(spark, [(1, 1, 0), (1, 3, 0), (2, 1, 0), (2, 2, 0)])
    d7 = {
        r["day"].isoformat(): (r["active_users"], r["retained_within_k"])
        for r in retention_within_k(df, 7).collect()
    }
    # day 1: user 1 returns day 3 (gap 2 <= 7), user 2 day 2 -> 2/2
    assert d7["2024-01-01"] == (2, 2)
    assert d7["2024-01-02"] == (1, 0)
    assert d7["2024-01-03"] == (1, 0)

    # k=1 must agree with cohort_retention
    d1 = sorted(
        (r["day"], r["active_users"], r["retained_within_k"])
        for r in retention_within_k(df, 1).collect()
    )
    c = sorted(
        (r["day"], r["active_users"], r["retained_next"])
        for r in cohort_retention(df).collect()
    )
    assert d1 == c

    import pytest as _pytest

    with _pytest.raises(ValueError):
        retention_within_k(df, 0)


def test_retention_from_streaming_state(spark, tmp_path):
    """Composition: per-day HLL snapshots built INCREMENTALLY by the
    streaming state store (two micro-batches, replay-idempotent merges)
    feed retention_estimates unchanged — retention over a live corpus
    without ever re-reading historical raw rows. Sparse regime =>
    estimates equal the exact counts."""
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_estimates,
    )
    from pfutil_spark.streaming import StreamingHllState

    ev = _events(
        spark,
        [(1, 1, 0), (2, 1, 1), (3, 1, 2), (2, 2, 3), (3, 2, 4), (3, 3, 9)],
    )
    base = ev.select(
        F.col("user_id").cast("string").alias("uid"),
        F.to_date("ts").alias("day"),
    )
    state = StreamingHllState(spark, str(tmp_path / "ret_state"), "uid", by=("day",))
    state.update(base.filter(F.col("uid").isin("1", "2")), batch_id=0)
    state.update(base.filter(~F.col("uid").isin("1", "2")), batch_id=1)

    est = {
        r["day"].isoformat(): (r["active_est"], r["retained_est"])
        for r in retention_estimates(state.current()).collect()
    }
    exact = {
        r["day"].isoformat(): (r["active_users"], r["retained_next"])
        for r in cohort_retention(ev).collect()
    }
    assert est == exact


def test_rolling_active_users_known(spark):
    from pfutil_spark.operators.retention import rolling_active_users

    # user 1 on day 1; user 2 on day 3; user 1 again day 5
    df = _events(spark, [(1, 1, 0), (2, 3, 0), (1, 5, 0)])
    rows = {
        r["day"].isoformat(): r["active_users"]
        for r in rolling_active_users(df, window_days=3).collect()
    }
    # windows clipped at max day (Jan 5)
    assert rows == {
        "2024-01-01": 1,  # {1}
        "2024-01-02": 1,  # {1}
        "2024-01-03": 2,  # {1 (d1), 2 (d3)}
        "2024-01-04": 1,  # {2}
        "2024-01-05": 2,  # {2 (d3), 1 (d5)}
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_active_users(df, window_days=0)


def test_rolling_window1_is_daily_active(spark, small):
    from pfutil_spark.operators.retention import (
        cohort_retention,
        rolling_active_users,
    )

    daily = {
        (r["day"], r["active_users"])
        for r in cohort_retention(small).collect()
    }
    rolled = {
        (r["day"], r["active_users"])
        for r in rolling_active_users(small, window_days=1).collect()
    }
    assert daily == rolled


def test_rolling_exact_gates_sliding_sketch(spark, sf_dir):
    """On shared days, the HLL sliding-window estimate must sit within
    the union-relative bound of the exact rolling count (the sketch
    path is the scale form of the same question)."""
    from pfutil_spark.operators.retention import rolling_active_users
    from pfutil_spark.operators.rollup import pf_sliding_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "uid", F.col("user_id").cast("string")
    )
    exact = rolling_active_users(ev, window_days=7)
    est = pf_sliding_distinct(
        ev, "ts", "uid", bucket="1 day", window_buckets=7
    ).select(F.to_date("window_end").alias("day"), "estimate")
    j = exact.join(est, "day").collect()
    assert len(j) > 0
    for r in j:
        assert abs(r["estimate"] - r["active_users"]) <= max(
            0.05 * r["active_users"], 3.0
        )
