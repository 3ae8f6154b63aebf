"""referential_audit / snapshot_diff / event_transitions: exact
semantics on crafted fixtures."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def test_referential_audit_known(spark):
    from pfutil_spark.operators.audit import referential_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,), (None,), (9,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,), (5,)], "pk long")
    [r] = referential_audit(child, parent, "fk", "pk").collect()
    # rows: 7 total, 2 null fk; distinct non-null fks {1,2,3,9};
    # matched rows: fk 1 (x2) + fk 2 (x1) = 3; orphans: fk 3, 9 -> 2
    assert (
        r["child_rows"], r["null_fk_rows"], r["distinct_fk"],
        r["matched_rows"], r["orphan_rows"], r["orphan_distinct_fk"],
    ) == (7, 2, 4, 3, 2, 2)
    assert r["match_frac"] == 3 / 5

    # all-NULL fk: frac NULL, nothing matched or orphaned
    allnull = spark.createDataFrame([(None,), (None,)], "fk long")
    [r2] = referential_audit(allnull, parent, "fk", "pk").collect()
    assert (r2["child_rows"], r2["null_fk_rows"], r2["orphan_rows"]) == (2, 2, 0)
    assert r2["match_frac"] is None


def test_referential_audit_broadcast_equivalence(spark, sf_dir):
    from pfutil_spark.operators.audit import referential_audit

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = referential_audit(o, c, "o_custkey", "c_custkey").collect()
    b = referential_audit(
        o, c, "o_custkey", "c_custkey", broadcast_parent=True
    ).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))
    assert a[0]["orphan_rows"] == 0  # fixture FKs are intact


def test_snapshot_diff_statuses(spark):
    from pfutil_spark.operators.audit import snapshot_diff, snapshot_diff_summary

    ref = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    cur = spark.createDataFrame(
        [(1, "a", 10),       # unchanged
         (2, "B", 20),       # changed (s)
         (3, "c", None),     # unchanged (NULL == NULL null-safely)
         (5, "e", 50),       # added
         (6, None, 60)],     # added with NULL col
        "k long, s string, v long",
    )
    got = {r["k"]: r["status"]
           for r in snapshot_diff(cur, ref, "k", ["s", "v"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added", 6: "added"}
    # NULL vs value is changed
    cur2 = spark.createDataFrame([(3, "c", 30)], "k long, s string, v long")
    [r3] = snapshot_diff(cur2, ref.filter("k = 3"), "k", ["s", "v"]).collect()
    assert r3["status"] == "changed"

    summ = {r["status"]: r["n"]
            for r in snapshot_diff_summary(cur, ref, "k", ["s", "v"]).collect()}
    assert summ == {"added": 2, "removed": 1, "changed": 1, "unchanged": 2}
    # zero statuses still emitted
    summ2 = {r["status"]: r["n"]
             for r in snapshot_diff_summary(ref, ref, "k", ["s"]).collect()}
    assert summ2 == {"added": 0, "removed": 0, "changed": 0, "unchanged": 4}

    with pytest.raises(ValueError):
        snapshot_diff(cur, ref, "k", [])


def test_event_transitions_known(spark):
    from pfutil_spark.operators.funnel import event_transitions

    rows = [
        # user 1: view -> click -> view  (ordered by ts)
        (1, 1, "view", dt.datetime(2024, 1, 1, 1)),
        (2, 1, "click", dt.datetime(2024, 1, 1, 2)),
        (3, 1, "view", dt.datetime(2024, 1, 1, 3)),
        # user 2: same-instant tie broken by event_id: view(4) -> click(5)
        (4, 2, "view", dt.datetime(2024, 1, 1, 1)),
        (5, 2, "click", dt.datetime(2024, 1, 1, 1)),
        # user 3: single event -> no transition
        (6, 3, "view", dt.datetime(2024, 1, 1, 1)),
        # NULL user / ts / type dropped
        (7, None, "view", dt.datetime(2024, 1, 1, 1)),
        (8, 4, None, dt.datetime(2024, 1, 1, 1)),
        (9, 4, "view", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = {
        (r["from_event"], r["to_event"]):
            (r["n_transitions"], r["from_total"], r["frac"])
        for r in event_transitions(df).collect()
    }
    # from view: 2 view->click; from click: 1 click->view
    assert got == {
        ("view", "click"): (2, 2, 1.0),
        ("click", "view"): (1, 1, 1.0),
    }


def test_event_transitions_tiebreak_determinism(spark, sf_dir):
    from pfutil_spark.operators.funnel import event_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sorted(map(tuple, event_transitions(ev).collect()))
    b = sorted(map(tuple, event_transitions(ev.repartition(13)).collect()))
    assert a == b and len(a) > 0


def test_audit_plans_no_python(spark, sf_dir):
    from pfutil_spark.operators.audit import referential_audit, snapshot_diff_summary
    from pfutil_spark.operators.funnel import event_transitions

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for df in (
        referential_audit(o, c, "o_custkey", "c_custkey", broadcast_parent=True),
        snapshot_diff_summary(o, o, "o_orderkey", ["o_totalprice"]),
        event_transitions(ev),
    ):
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan
