"""Batch CDC apply: merge an updates/deletes batch into a keyed base
snapshot, latest-version-wins — the merge-on-read compaction job every
lakehouse table needs, expressed as ONE window pass (no MERGE engine
required; pairs with :func:`pfutil_spark.operators.audit.snapshot_diff`
which measures what such an apply changed).

Scale shape: union the two sides (map-only), ONE shuffle on the key
for the row_number window, filter to rank 1, optionally drop
soft-deleted winners. At 100 TB that is the minimal possible plan —
any upsert must co-locate versions of a key once. If the base is
already range/bucket-laid-out on the key, write the result back with
the same layout (sources/io.py writers) so the next apply pays only
the updates-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_SRC = "__pf_src"
_RN = "__pf_rn"


def apply_upserts(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version: str,
    deleted_col: str | None = None,
) -> DataFrame:
    """Return ``base`` with ``updates`` applied: for every ``key``, the
    row with the highest ``version`` wins; on a version tie the UPDATES
    side wins (re-applying the same batch is idempotent). If
    ``deleted_col`` (boolean) is given, a winning row with a true flag
    is a tombstone: the key disappears from the output (losing
    versions never resurrect it).

    Contract: both frames share the same column NAMES (any order);
    TYPES follow unionByName coercion, so a wider updates-side type
    (int vs long) widens the output column — keep dtypes aligned when
    writing back over a typed table. (key, version) is unique WITHIN
    each side — duplicate
    (key, version) rows on one side have no defined winner. NULL keys
    group together like any SQL partition key (one winner for all
    NULL-key rows — the same semantics DISTINCT ON / QUALIFY give);
    NULL versions sort lowest (they lose to any real version). The
    helper columns are internal; output columns == base columns (in
    base order).
    """
    if key not in base.columns or version not in base.columns:
        raise ValueError(
            f"key/version {key!r}/{version!r} must be in base {base.columns}"
        )
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    if deleted_col is not None and deleted_col not in base.columns:
        raise ValueError(f"deleted_col {deleted_col!r} not in {base.columns}")
    for c in (_SRC, _RN):
        if c in base.columns:
            raise ValueError(f"reserved column name {c!r} present in input")

    cols = list(base.columns)
    unioned = base.select(*cols).withColumn(
        _SRC, F.lit(0)
    ).unionByName(updates.select(*cols).withColumn(_SRC, F.lit(1)))
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc_nulls_last(), F.col(_SRC).desc()
    )
    winners = (
        unioned.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_SRC, _RN)
    )
    if deleted_col is not None:
        winners = winners.filter(
            ~F.coalesce(F.col(deleted_col), F.lit(False))
        )
    return winners.select(*cols)
