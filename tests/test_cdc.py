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


# ---------------------------------------------------------------------------
# StreamingUpsertStore
# ---------------------------------------------------------------------------

class TestStreamingUpsertStore:
    def _mk(self, spark, tmp_path):
        from pfutil_spark.streaming.cdc_stream import StreamingUpsertStore

        return StreamingUpsertStore(
            spark, str(tmp_path / "snapstate"), key="id", version="v",
            deleted_col="deleted",
        )

    def test_microbatch_merge_and_replay_skip(self, spark, tmp_path):
        import warnings as w

        store = self._mk(spark, tmp_path)
        assert store.snapshot() is None
        b1 = _f(spark, [(1, 1, "one", False), (2, 1, "two", False)])
        store.update(b1, batch_id=0)
        assert _rows(store.snapshot()) == _rows(b1)
        # batch 2: update 1, tombstone 2, insert 3
        b2 = _f(
            spark,
            [(1, 2, "one-v2", False), (2, 2, "", True), (3, 1, "three", False)],
        )
        store.update(b2, batch_id=1)
        want = _f(spark, [(1, 2, "one-v2", False), (3, 1, "three", False)])
        assert _rows(store.snapshot()) == _rows(want)
        # replaying a committed batch id changes NOTHING (warns)
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            store.update(b2, batch_id=1)
        assert any("replayed batch" in str(c.message) for c in caught)
        assert _rows(store.snapshot()) == _rows(want)
        # a losing version never resurrects a tombstoned key
        b3 = _f(spark, [(2, 1, "zombie", False)])
        store.update(b3, batch_id=2)
        assert {r["id"] for r in store.snapshot().collect()} == {1, 3}

    def test_foreach_batch_end_to_end(self, spark, tmp_path):
        from pfutil_spark.streaming.cdc_stream import (
            attach_upsert_foreach_batch,
        )

        changes = _f(
            spark,
            [(i, 1, f"c{i}", False) for i in range(20)]
            + [(5, 2, "c5-v2", False), (6, 2, "", True)],
        )
        src = tmp_path / "cdc_src"
        changes.write.parquet(str(src))
        store = self._mk(spark, tmp_path)
        stream = spark.readStream.schema(changes.schema).parquet(str(src))
        q = attach_upsert_foreach_batch(
            stream, store, str(tmp_path / "ckpt"), trigger_once=True
        )
        if not q.awaitTermination(120):  # ADVICE r5: a timeout must fail
            q.stop()                      # loudly, never assert against a
            raise TimeoutError("upsert stream did not finish in 120s")
        snap = {r["id"]: r["txt"] for r in store.snapshot().collect()}
        assert snap[5] == "c5-v2" and 6 not in snap and len(snap) == 19

    def test_remote_state_dir_refused(self, spark, tmp_path):
        from pfutil_spark.streaming.cdc_stream import StreamingUpsertStore

        with pytest.raises(NotImplementedError, match="driver-local"):
            StreamingUpsertStore(spark, "s3a://b/state", key="id", version="v")
