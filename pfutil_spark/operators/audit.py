"""Data-quality audits: referential integrity between tables and
row-level snapshot diffs — the "did the pipeline ship what I think it
shipped?" layer that complements the distribution-level drift suite
(operators/drift.py: sketches answer "did values move?"; these answer
"which rows appeared/vanished/changed and do my keys join?").

All outputs are integers plus single IEEE divisions -> EXACT
cross-engine, DuckDB-oracle-able. Beyond-reference operators following
the house design rules (aggregate before joining, no driver actions,
null-safe comparisons where NULL is signal).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """One-row foreign-key integrity report for ``child.fk ->
    parent.pk``: ``(child_rows, null_fk_rows, distinct_fk, matched_rows,
    orphan_rows, orphan_distinct_fk, match_frac)``.

    ``match_frac`` = matched / non-null-fk rows (one bigint/bigint
    division over NULLIF, NULL when every fk is NULL). NULL foreign
    keys are counted separately, never as orphans (SQL semantics: a
    NULL fk asserts nothing).

    Plan: the child aggregates to ``(fk, rows)`` FIRST (map-side
    combine — the join runs on distinct keys, not raw rows), the
    parent side reduces to its distinct key set, and the LEFT join
    between the two key tables closes with a single global reduction.
    ``broadcast_parent=True`` broadcasts the parent key set
    (dimension-table case) so the child-side aggregate is the only
    shuffle.
    """
    fk_rows = child.groupBy(F.col(fk).alias("__pf_fk")).agg(
        F.count(F.lit(1)).alias("__pf_rows")
    )
    pks = parent.select(F.col(pk).alias("__pf_pk")).distinct()
    joined = fk_rows.join(
        F.broadcast(pks) if broadcast_parent else pks,
        F.col("__pf_fk") == F.col("__pf_pk"),
        "left",
    )
    is_null = F.col("__pf_fk").isNull()
    matched = F.col("__pf_pk").isNotNull()
    agg = joined.agg(
        F.sum("__pf_rows").cast("long").alias("child_rows"),
        F.sum(F.when(is_null, F.col("__pf_rows")).otherwise(0))
        .cast("long")
        .alias("null_fk_rows"),
        F.sum(F.when(~is_null, 1).otherwise(0)).cast("long").alias("distinct_fk"),
        F.sum(F.when(matched, F.col("__pf_rows")).otherwise(0))
        .cast("long")
        .alias("matched_rows"),
        F.sum(F.when(~is_null & ~matched, F.col("__pf_rows")).otherwise(0))
        .cast("long")
        .alias("orphan_rows"),
        F.sum(F.when(~is_null & ~matched, 1).otherwise(0))
        .cast("long")
        .alias("orphan_distinct_fk"),
    )
    return agg.select(
        "*",
        (
            F.col("matched_rows")
            / F.nullif(F.col("child_rows") - F.col("null_fk_rows"), F.lit(0))
        ).alias("match_frac"),
    )


def snapshot_diff(
    cur: DataFrame,
    ref: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key``: one row per
    key present in either side, with ``status`` in
    ``{'added', 'removed', 'changed', 'unchanged'}``. ``compare_cols``
    are compared NULL-SAFELY (NULL == NULL is unchanged; NULL vs value
    is changed). Duplicate keys on either side are a contract
    violation this operator does not arbitrate — feed deduplicated
    snapshots.

    Plan: one FULL OUTER join on the key (both sides pruned to
    key + compared columns at the scan), status = pure codegen CASE.
    Returns the keyed frame; see :func:`snapshot_diff_summary` for the
    counts rollup.
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    c = cur.select(
        F.col(key).alias("__pf_k"),
        F.lit(1).alias("__pf_in_cur"),
        *[F.col(x).alias(f"__pf_c_{x}") for x in compare_cols],
    )
    r = ref.select(
        F.col(key).alias("__pf_rk"),
        F.lit(1).alias("__pf_in_ref"),
        *[F.col(x).alias(f"__pf_r_{x}") for x in compare_cols],
    )
    j = c.join(r, F.col("__pf_k") == F.col("__pf_rk"), "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__pf_c_{x}").eqNullSafe(F.col(f"__pf_r_{x}"))
            for x in compare_cols
        ],
    )
    status = (
        F.when(F.col("__pf_in_ref").isNull(), F.lit("added"))
        .when(F.col("__pf_in_cur").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce("__pf_k", "__pf_rk").alias(key), status.alias("status")
    )


def snapshot_diff_summary(
    cur: DataFrame,
    ref: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Counts-by-status rollup of :func:`snapshot_diff`:
    ``(status, n)`` — the four-line "what changed since the last run"
    report. All-bigint -> EXACT cross-engine. Statuses with zero keys
    are still emitted (a monitor that silently drops 'removed' when
    nothing was removed makes absence ambiguous)."""
    d = snapshot_diff(cur, ref, key, compare_cols)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n"))
    statuses = cur.sparkSession.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)],
        "status string",
    )
    return statuses.join(counts, ["status"], "left").select(
        "status", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top: int = 20,
) -> DataFrame:
    """Join-explosion early warning: per join key, the row count on
    each side and the exact inner-equi-join output size
    ``out_rows = left_rows * right_rows``, top ``top`` keys by
    (out_rows desc, key asc) — run it BEFORE a big join to find the
    hot keys that need salting / AQE skew handling, from two
    aggregates instead of the join itself. NULL keys are excluded
    (an inner equi-join never matches them); keys present on one side
    only are kept with 0 opposite rows and out_rows 0 (they're the
    other failure mode: a join that silently drops a source).

    Plan: each side reduces to (key, rows) map-side-combined FIRST —
    the join runs on distinct keys, the audit.referential_audit rule —
    then one FULL OUTER key join and a top-k TakeOrdered. All-bigint
    -> EXACT cross-engine.
    """
    if top < 1:
        raise ValueError(f"top={top}: must be >= 1")
    rk = right_key or left_key
    l = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("left_rows"))
    )
    r = (
        right.filter(F.col(rk).isNotNull())
        .groupBy(F.col(rk).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("right_rows"))
    )
    j = l.join(r, ["key"], "full_outer").select(
        "key",
        F.coalesce("left_rows", F.lit(0)).cast("long").alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).cast("long").alias("right_rows"),
        (
            F.coalesce("left_rows", F.lit(0)) * F.coalesce("right_rows", F.lit(0))
        ).cast("long").alias("out_rows"),
    )
    return j.orderBy(F.col("out_rows").desc(), F.col("key").asc()).limit(top)
