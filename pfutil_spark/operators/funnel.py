"""Ordered conversion funnels over event streams: how many users reach
each step of a journey IN ORDER (first-occurrence semantics) — the
product-analytics companion of :mod:`pfutil_spark.operators.retention`.

No reference-repo counterpart (the reference is the sketch primitive
layer); provided Spark-side like SURVEY.md §2.3's gap categories.

Scale posture: ONE shuffle — the groupBy(user) that computes each
user's first timestamp per step as conditional ``min`` aggregates
(map-side combinable; the pre-filter to funnel event types prunes the
shuffle to relevant rows). Everything after is a single global
reduction unpivoted to one row per step; no joins, no windows, no
Python."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["funnel_counts", "event_transitions", "session_paths"]


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step ordered-funnel reach: for step ``i``, the number of
    users whose FIRST occurrences of ``steps[0..i]`` happen in strictly
    increasing time order (the standard first-touch funnel; a tie —
    two steps first occurring at the same instant — does NOT advance,
    so a user's reach is well-defined under event reordering within a
    timestamp).

    Columns: ``(step_rank, step, n_users, frac_of_first)`` —
    ``frac_of_first`` is each step's reach relative to step 1 (one
    bigint/bigint IEEE division; NULL when nobody reached step 1).
    Counts are monotonically non-increasing by construction."""
    steps = list(steps)
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step names in {steps!r}")
    ev = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(list(steps))
    )
    firsts = ev.groupBy(F.col(user_col).alias("__u")).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(
                f"__t{i}"
            )
            for i, s in enumerate(steps)
        ]
    )
    reach_flags = []
    cond = F.col("__t0").isNotNull()
    reach_flags.append(cond)
    for i in range(1, len(steps)):
        # strict ordering on NTZ timestamps; NULL comparisons yield
        # NULL -> the when() below treats them as not-reached
        cond = cond & (F.col(f"__t{i}") > F.col(f"__t{i - 1}"))
        reach_flags.append(cond)
    totals = firsts.agg(
        *[
            F.sum(F.when(flag, 1).otherwise(0))
            .cast("long")
            .alias(f"__n{i}")
            for i, flag in enumerate(reach_flags)
        ]
    )
    # Column-API stack with literal step names — never an F.expr SQL
    # string, so step names containing quotes/backslashes are data,
    # not syntax
    stack_cols = [F.lit(len(steps))]
    for i, s in enumerate(steps):
        stack_cols += [F.lit(i + 1), F.lit(s), F.col(f"__n{i}")]
    unpivoted = totals.select(
        F.stack(*stack_cols).alias("step_rank", "step", "n_users")
    )
    first_n = F.first("n_users").over(
        Window.orderBy("step_rank").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    # frac relative to step 1: join-free via a window over the
    # steps-sized frame (len(steps) rows — driver-trivial)
    return unpivoted.select(
        "step_rank",
        "step",
        "n_users",
        (F.col("n_users") / F.nullif(first_n, F.lit(0))).alias(
            "frac_of_first"
        ),
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition matrix: for every consecutive event
    pair within a user's timeline, ``(from_event, to_event,
    n_transitions, from_total, frac)`` — the Markov-chain view of user
    behavior ("what follows a view?") that complements the ordered
    funnel. ``frac = n_transitions / from_total`` is one bigint/bigint
    IEEE division -> EXACT cross-engine.

    The per-user order is (ts, tiebreak) — a TOTAL order, so the
    transition multiset is deterministic under same-instant events
    (the funnel tie lesson: never leave intra-user order to partition
    luck). Rows with NULL user/ts/type are dropped (a transition needs
    both endpoints attributed and ordered); each user's last event has
    no successor and contributes nothing.

    Plan: one ``lead`` window per user over the event scan (the only
    corpus-scale shuffle — keyed by user, the natural key), a
    map-side-combined groupBy(from, to) on the transition pairs, and
    ``from_total`` as a window over that |types|^2-sized aggregate
    (Window-on-aggregate skeleton). Zero Python.
    """
    e = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    seq = e.select(
        F.col(type_col).alias("from_event"),
        F.lead(type_col).over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    t = seq.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    tot = F.sum("n_transitions").over(Window.partitionBy("from_event"))
    return t.select(
        "from_event",
        "to_event",
        "n_transitions",
        tot.cast("long").alias("from_total"),
        (F.col("n_transitions") / tot).alias("frac"),
    )


def session_paths(
    df: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    step: str = "event_type",
    gap_seconds: int = 1800,
    max_steps: int = 8,
    top: int = 20,
    sep: str = ">",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Top session journeys: gap-sessionize the event stream, read off
    each session's first ``max_steps`` step names in (ts, tiebreak)
    order, and count sessions per path string. Returns
    ``(path, n_sessions)``, top ``top`` by (n_sessions desc, path asc)
    — the "what do users actually do" report.

    Ordering is made TOTAL by ``tiebreak`` (a unique event id) —
    without it, same-timestamp events would make the path
    nondeterministic across partitionings and engines. Rows with a
    NULL timestamp, user, tiebreak, or step are dropped up front
    (NULL ordering is the one place engines disagree; an event with
    no timestamp has no position in a journey anyway).

    Plan: sessionize is pure window codegen over one (user)-partitioned
    sort; the per-session path is ONE groupBy collecting (ts, tiebreak,
    step) structs, sorted and truncated INSIDE the row (array_sort /
    slice / array_join — no second window pass); then a count per path
    and a TakeOrdered top-k. Two shuffles total (user sort reused by
    the groupBy when keys align, else 3), no Python. A step name
    containing ``sep`` cannot be distinguished from a boundary in the
    output string — both engines render identically so parity holds;
    pick ``sep`` outside the step alphabet for human use.
    """
    from pfutil_spark.operators.asof import sessionize

    if max_steps < 1:
        raise ValueError(f"max_steps={max_steps}: must be >= 1")
    if top < 1:
        raise ValueError(f"top={top}: must be >= 1")
    for c in (ts, user, step, *tiebreak):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    keep = F.col(ts).isNotNull() & F.col(user).isNotNull() & F.col(
        step
    ).isNotNull()
    for c in tiebreak:
        keep = keep & F.col(c).isNotNull()
    s = sessionize(
        df.filter(keep), ts, [user], gap_seconds, tiebreak=tiebreak
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(ts, *tiebreak, F.col(step).alias("__pf_s")))
    )
    # slice BEFORE transform: the sort already ordered the full array,
    # so only the kept max_steps elements need the lambda pass
    path = F.array_join(
        F.transform(
            F.slice(ordered, 1, max_steps), lambda x: x["__pf_s"]
        ),
        sep,
    ).alias("path")
    per_session = s.groupBy(user, "session_id").agg(path)
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top)
    )
