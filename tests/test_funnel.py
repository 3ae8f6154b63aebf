"""funnel_counts: first-occurrence ordered-funnel semantics."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1, h, m, 0)) for (u, t, h, m) in rows],
        "user_id long, event_type string, ts timestamp_ntz",
    )


def test_known_funnel(spark):
    from pfutil_spark.operators.funnel import funnel_counts

    df = _ev(
        spark,
        [
            # user 1: full ordered journey
            (1, "view", 1, 0), (1, "click", 2, 0), (1, "purchase", 3, 0),
            # user 2: view then click only
            (2, "view", 1, 0), (2, "click", 5, 0),
            # user 3: click BEFORE view -> stops at view
            (3, "click", 1, 0), (3, "view", 2, 0),
            # user 4: purchase without click -> stops after view
            (4, "view", 1, 0), (4, "purchase", 2, 0),
            # user 5: tie (view and click same instant) -> not advanced
            (5, "view", 1, 0), (5, "click", 1, 0),
            # user 6: never views
            (6, "purchase", 1, 0),
            # noise event types are ignored
            (1, "error", 0, 30),
        ],
    )
    rows = {
        r["step"]: (r["step_rank"], r["n_users"], r["frac_of_first"])
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert rows["view"] == (1, 5, 1.0)
    assert rows["click"] == (2, 2, 0.4)
    assert rows["purchase"] == (3, 1, 0.2)


def test_first_occurrence_semantics(spark):
    from pfutil_spark.operators.funnel import funnel_counts

    # user clicks early, views, clicks again later: FIRST click is
    # before the first view, so the funnel stops at view even though a
    # later click exists
    df = _ev(spark, [(1, "click", 1, 0), (1, "view", 2, 0), (1, "click", 3, 0)])
    rows = {r["step"]: r["n_users"] for r in funnel_counts(df, ["view", "click"]).collect()}
    assert rows == {"view": 1, "click": 0}


def test_empty_step_and_validation(spark):
    from pfutil_spark.operators.funnel import funnel_counts

    df = _ev(spark, [(1, "view", 1, 0)])
    rows = {r["step"]: (r["n_users"], r["frac_of_first"])
            for r in funnel_counts(df, ["signup", "view"]).collect()}
    # nobody reaches step 1 -> all zero, fracs NULL (0/0)
    assert rows == {"signup": (0, None), "view": (0, None)}

    with pytest.raises(ValueError):
        funnel_counts(df, [])
    with pytest.raises(ValueError):
        funnel_counts(df, ["view", "view"])


def test_monotone_and_partition_invariant(spark, sf_dir):
    from pfutil_spark.operators.funnel import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    steps = ["view", "click", "purchase"]
    base = funnel_counts(ev, steps).orderBy("step_rank").collect()
    ns = [r["n_users"] for r in base]
    assert ns == sorted(ns, reverse=True)
    rep = funnel_counts(ev.repartition(9), steps).orderBy("step_rank").collect()
    assert list(map(tuple, rep)) == list(map(tuple, base))


def test_plan_no_python(spark, sf_dir):
    from pfutil_spark.operators.funnel import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = funnel_counts(ev, ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_step_names_with_quotes_are_data_not_syntax(spark):
    from pfutil_spark.operators.funnel import funnel_counts

    df = _ev(spark, [(1, "don't", 1, 0), (1, "o'k", 2, 0)])
    rows = {r["step"]: r["n_users"]
            for r in funnel_counts(df, ["don't", "o'k"]).collect()}
    assert rows == {"don't": 1, "o'k": 1}


# ---------------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------------

def _pev(spark, rows):
    # (user, type, minute, event_id)
    return spark.createDataFrame(
        [
            (u, t, dt.datetime(2024, 1, 1, 0, m, 0), e)
            for (u, t, m, e) in rows
        ],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )


def test_session_paths_known(spark):
    from pfutil_spark.operators.funnel import session_paths

    df = _pev(
        spark,
        [
            # user 1, session A: view > click (1-min apart)
            (1, "view", 0, 1), (1, "click", 1, 2),
            # user 1, session B after a 40-min gap: view > click again
            (1, "view", 45, 3), (1, "click", 46, 4),
            # user 2: view > click in one session
            (2, "view", 0, 5), (2, "click", 2, 6),
            # user 3: lone purchase
            (3, "purchase", 0, 7),
        ],
    )
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(df, gap_seconds=1800).collect()
    }
    assert got == {"view>click": 3, "purchase": 1}


def test_session_paths_ties_and_truncation(spark):
    from pfutil_spark.operators.funnel import session_paths

    # two events at the SAME timestamp: event_id tiebreak fixes order;
    # max_steps truncates the long session
    df = _pev(
        spark,
        [
            (1, "b", 0, 2), (1, "a", 0, 1), (1, "c", 1, 3), (1, "d", 2, 4),
        ],
    )
    got = session_paths(df, max_steps=3).collect()
    assert [(r["path"], r["n_sessions"]) for r in got] == [("a>b>c", 1)]


def test_session_paths_null_rows_dropped(spark):
    from pfutil_spark.operators.funnel import session_paths

    df = spark.createDataFrame(
        [
            (1, "view", dt.datetime(2024, 1, 1), 1),
            (1, None, dt.datetime(2024, 1, 1, 0, 1), 2),
            (1, "click", None, 3),
            (None, "view", dt.datetime(2024, 1, 1), 4),
        ],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    got = session_paths(df).collect()
    assert [(r["path"], r["n_sessions"]) for r in got] == [("view", 1)]


def test_session_paths_validation(spark):
    from pfutil_spark.operators.funnel import session_paths

    df = _pev(spark, [(1, "a", 0, 1)])
    with pytest.raises(ValueError, match="max_steps"):
        session_paths(df, max_steps=0)
    with pytest.raises(ValueError, match="top"):
        session_paths(df, top=0)
    with pytest.raises(ValueError, match="column"):
        session_paths(df, step="nope")
