"""Streaming CDC apply: maintain a keyed latest-version snapshot from a
change stream, one :func:`pfutil_spark.operators.cdc.apply_upserts`
merge per micro-batch — the streaming face of the batch upsert, and
the parquet stand-in for an Iceberg/Delta MERGE sink (swap the
generation dirs for a real MERGE when the jars exist).

State is the shared two-generation atomic-swap layout
(streaming/_state.py::GenerationState). The upsert merge itself is
idempotent under replay (updates win version ties, so re-applying the
last uncommitted batch reproduces the same snapshot byte-for-byte in
content terms) — the marker's batch_id skip is therefore purely an
efficiency guard against rewriting an unchanged generation, not a
correctness requirement; the same checkpoint/state-dir coupling
caveat as the signature store applies and a warning is emitted on
every skip.

Scale shape per batch: the merge is one union + one key-window pass
over snapshot + batch (see operators/cdc.py's plan notes); the
rewrite cost is one snapshot-sized parquet write per batch — at real
scale you either widen the trigger interval or graduate to a MERGE
sink, both of which keep this module's API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pfutil_spark.operators.cdc import apply_upserts
from pfutil_spark.streaming._state import GenerationState


class StreamingUpsertStore:
    """Keyed snapshot maintained by per-micro-batch upserts."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key: str,
        version: str,
        deleted_col: str | None = None,
    ):
        self.spark = spark
        self._state = GenerationState(state_dir)
        self.state_dir = self._state.state_dir
        self.key = key
        self.version = version
        self.deleted_col = deleted_col

    def _marker(self) -> tuple[int, int]:
        return self._state.marker_pair()

    def _stored(self) -> DataFrame | None:
        """Raw stored state INCLUDING tombstone rows — the delete
        high-watermark must persist, or a later stale version of a
        deleted key would win against nothing and resurrect it."""
        gen, _ = self._marker()
        if gen < 0:
            return None
        return self.spark.read.parquet(self._state.gen_path(gen))

    def snapshot(self) -> DataFrame | None:
        """Current merged snapshot (tombstoned keys filtered out), or
        None before the first commit. NOTE: the returned frame reads
        the CURRENT generation directory lazily — consume it before
        the next update swaps generations."""
        cur = self._stored()
        if cur is None or self.deleted_col is None:
            return cur
        from pyspark.sql import functions as F

        return cur.filter(~F.coalesce(F.col(self.deleted_col), F.lit(False)))

    def update(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """Merge one (micro-)batch of change rows into the state."""
        gen, last_bid = self._marker()
        if self._state.replay_skip(batch_id, last_bid, "StreamingUpsertStore"):
            return
        if self.deleted_col is not None and self.deleted_col not in batch_df.columns:
            # fail at ingestion, not at the first snapshot() read long
            # after a typo'd deleted_col committed state
            raise ValueError(
                f"deleted_col {self.deleted_col!r} not in batch columns "
                f"{batch_df.columns}"
            )
        prev = self._stored()
        if prev is None:
            # first batch: the batch merged into an empty base of the
            # SAME schema (a batch may carry several versions of a key)
            prev = batch_df.limit(0)
        # deleted_col=None ON PURPOSE: tombstone winners stay in the
        # stored state as the per-key delete high-watermark; snapshot()
        # filters them for consumers
        merged = apply_upserts(prev, batch_df, self.key, self.version, None)
        nxt = gen + 1
        merged.write.mode("overwrite").parquet(self._state.gen_path(nxt))
        self._state.commit(nxt, batch_id if batch_id is not None else -1)


def attach_upsert_foreach_batch(
    stream_df: DataFrame,
    store: StreamingUpsertStore,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire a change-row stream into the snapshot store via
    foreachBatch. Returns the started StreamingQuery."""
    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda bdf, bid: store.update(bdf, bid))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
