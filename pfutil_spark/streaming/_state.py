"""Shared two-generation atomic-swap state layout for streaming sinks
without a transactional catalog (an Iceberg/Delta MERGE would replace
this): parquet data under ``<dir>/gen={0|1}`` plus a marker file whose
whitespace-separated integer fields are swapped atomically via
``os.replace``. Used by StreamingHllState (payload: generation) and
StreamingSignatureStore (payload: generation + last batch id)."""

from __future__ import annotations

import os


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
