"""Structured-Streaming distinct counting.

The mergeable-state contract makes streaming a corollary of the batch
plan: each micro-batch reduces to per-group partial sketches (the same
``pf_partial``/``pf_merge`` pipeline), which are merged into a persistent
sketch-state table via ``foreachBatch``. Register-max idempotence means
at-least-once batch delivery still yields exactly-correct sketches — a
replayed micro-batch merges to a no-op, so the sink is effectively
exactly-once for the STATE even when the engine only guarantees
at-least-once for the writes.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pfutil_spark.operators.hll_agg import SKETCH_COL, pf_count_col, pf_merge, pf_partial


class StreamingHllState:
    """Persistent per-group sketch state updated per micro-batch.

    State lives as a parquet sketch table at ``state_dir`` (two
    alternating generations for atomic swap without a transactional
    catalog; with Iceberg configured this would be a single MERGE)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        element: str,
        by: Sequence[str] = (),
        version: int = 4,
    ):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.element = element
        self.by = list(by)
        self.version = version

    def _gen_path(self, gen: int) -> str:
        return f"{self.state_dir}/gen={gen % 2}"

    def _current_gen(self) -> int:
        marker = f"{self.state_dir}/_GEN"
        if not os.path.exists(marker):
            return -1
        with open(marker) as f:
            return int(f.read().strip())

    def _commit_gen(self, gen: int) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = f"{self.state_dir}/_GEN.tmp"
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, f"{self.state_dir}/_GEN")

    def current(self) -> DataFrame | None:
        gen = self._current_gen()
        if gen < 0:
            return None
        return self.spark.read.parquet(self._gen_path(gen))

    def update(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """Merge one (micro-)batch into the state. Idempotent under
        replay of the same rows."""
        batch_partials = pf_merge(
            pf_partial(batch_df, self.element, self.by, self.version), self.by
        )
        prev = self.current()
        if prev is not None:
            merged = pf_merge(
                prev.select(*self.by, SKETCH_COL).unionByName(batch_partials),
                self.by,
            )
        else:
            merged = batch_partials
        gen = self._current_gen() + 1
        merged.write.mode("overwrite").parquet(self._gen_path(gen))
        self._commit_gen(gen)

    def estimates(self) -> DataFrame:
        cur = self.current()
        if cur is None:
            raise ValueError("no state committed yet")
        return cur.select(
            *self.by, pf_count_col(SKETCH_COL, self.version).alias("estimate")
        )


def attach_hll_foreach_batch(
    stream_df: DataFrame,
    state: StreamingHllState,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire a streaming DataFrame into the sketch state via foreachBatch.
    Returns the started StreamingQuery."""
    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda bdf, bid: state.update(bdf, bid))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
