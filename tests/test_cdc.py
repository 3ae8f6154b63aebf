"""apply_upserts: latest-version-wins merge semantics — updates win
ties (idempotent re-apply), tombstones delete, inserts appear, losers
never resurrect, NULL version loses, schema preserved."""

import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators.cdc import apply_upserts


def _f(spark, rows):
    return spark.createDataFrame(
        rows, "id long, v long, txt string, deleted boolean"
    )


def _rows(df):
    rows = [tuple(r) for r in df.collect()]
    return sorted(
        rows,
        key=lambda t: [(x is None, type(x).__name__, str(x)) for x in t],
    )


def test_upsert_insert_update_delete(spark):
    base = _f(
        spark,
        [
            (1, 1, "one", False),
            (2, 1, "two", False),
            (3, 1, "three", False),
        ],
    )
    ups = _f(
        spark,
        [
            (2, 2, "two-v2", False),   # update
            (3, 2, "gone", True),      # tombstone
            (4, 1, "four", False),     # insert
        ],
    )
    got = apply_upserts(base, ups, key="id", version="v", deleted_col="deleted")
    assert got.columns == base.columns
    assert _rows(got) == _rows(
        _f(spark, [(1, 1, "one", False), (2, 2, "two-v2", False), (4, 1, "four", False)])
    )


def test_idempotent_reapply_and_tie_updates_win(spark):
    base = _f(spark, [(1, 5, "base-v5", False)])
    ups = _f(spark, [(1, 5, "ups-v5", False)])  # SAME version: updates win
    once = apply_upserts(base, ups, key="id", version="v")
    assert [r["txt"] for r in once.collect()] == ["ups-v5"]
    twice = apply_upserts(once, ups, key="id", version="v")
    assert _rows(twice) == _rows(once)


def test_stale_update_loses_and_null_version_loses(spark):
    base = _f(spark, [(1, 5, "fresh", False), (2, 1, "two", False)])
    ups = _f(spark, [(1, 3, "stale", False), (2, None, "nullv", False)])
    got = apply_upserts(base, ups, key="id", version="v")
    assert {r["id"]: r["txt"] for r in got.collect()} == {1: "fresh", 2: "two"}


def test_tombstone_beats_older_versions_without_flag_column(spark):
    # without deleted_col the tombstone row just wins as data
    base = _f(spark, [(1, 1, "one", False)])
    ups = _f(spark, [(1, 2, "onev2", True)])
    kept = apply_upserts(base, ups, key="id", version="v")
    assert [r["txt"] for r in kept.collect()] == ["onev2"]
    dropped = apply_upserts(base, ups, key="id", version="v", deleted_col="deleted")
    assert dropped.count() == 0


def test_partition_invariance(spark):
    base = _f(spark, [(i, 1, f"b{i}", False) for i in range(100)])
    ups = _f(
        spark,
        [(i, 2, f"u{i}", i % 7 == 0) for i in range(0, 100, 2)]
        + [(i + 100, 1, f"n{i}", False) for i in range(10)],
    )
    a = apply_upserts(
        base.repartition(1), ups.repartition(13), "id", "v", "deleted"
    )
    b = apply_upserts(
        base.repartition(7, "txt"), ups.coalesce(1), "id", "v", "deleted"
    )
    assert _rows(a) == _rows(b)


def test_validation(spark):
    base = _f(spark, [(1, 1, "one", False)])
    with pytest.raises(ValueError, match="key/version"):
        apply_upserts(base, base, key="nope", version="v")
    with pytest.raises(ValueError, match="schema mismatch"):
        apply_upserts(base, base.drop("txt"), key="id", version="v")
    with pytest.raises(ValueError, match="deleted_col"):
        apply_upserts(base, base, key="id", version="v", deleted_col="nope")
    with pytest.raises(ValueError, match="reserved column"):
        apply_upserts(
            base.withColumn("__pf_src", F.lit(1)),
            base.withColumn("__pf_src", F.lit(1)),
            key="id",
            version="v",
        )
