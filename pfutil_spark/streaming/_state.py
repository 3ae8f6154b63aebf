"""Shared two-generation atomic-swap state layout for streaming sinks
without a transactional catalog (an Iceberg/Delta MERGE would replace
this): parquet data under ``<dir>/gen={0|1}`` plus a marker file whose
whitespace-separated integer fields are swapped atomically via
``os.replace``. Used by StreamingHllState (payload: generation) and
StreamingSignatureStore (payload: generation + last batch id)."""

from __future__ import annotations

import os
import warnings


class GenerationState:
    """Marker + path arithmetic for the two-generation layout."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir.rstrip("/")
        if "://" in self.state_dir:
            # the marker is read/written with driver-local file IO: on
            # hdfs:///s3a:// it would silently look absent and RESET
            # committed state, and even file:// URIs break os.path while
            # Spark writes to the stripped path — plain local paths only
            raise NotImplementedError(
                f"streaming state dir must be a plain driver-local path "
                f"(got {state_dir!r}); remote state needs a transactional "
                f"table format for the generation marker"
            )

    def gen_path(self, gen: int) -> str:
        return f"{self.state_dir}/gen={gen % 2}"

    def read(self) -> list[int]:
        """Marker fields, or [] before the first commit."""
        marker = f"{self.state_dir}/_GEN"
        if not os.path.exists(marker):
            return []
        with open(marker) as f:
            return [int(v) for v in f.read().split()]

    def commit(self, *fields: int) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = f"{self.state_dir}/_GEN.tmp"
        with open(tmp, "w") as f:
            f.write(" ".join(str(v) for v in fields))
        os.replace(tmp, f"{self.state_dir}/_GEN")

    def marker_pair(self) -> tuple[int, int]:
        """(generation, last committed batch id) — the two-field marker
        layout shared by the batch-id-guarded stores — or (-1, -1)
        before the first commit."""
        vals = self.read()
        return (vals[0], vals[1]) if vals else (-1, -1)

    def replay_skip(self, batch_id, last_bid: int, store: str) -> bool:
        """True if ``batch_id`` was already committed (foreachBatch
        replay) — with a warning, because a long run of skips means the
        streaming checkpoint dir was reset independently of this state
        dir (see the stores' module docstrings)."""
        if batch_id is None or batch_id > last_bid:
            return False
        warnings.warn(
            f"{store}: skipping replayed batch_id={batch_id} <= committed "
            f"{last_bid} (replay after crash is normal ONCE; repeated "
            f"skips mean the checkpoint dir was reset without the state "
            f"dir)",
            stacklevel=3,
        )
        return True
