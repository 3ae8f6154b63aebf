"""Distribution-drift detection from mergeable quantile sketches.

The pretraining-pipeline question: "did the length / score / latency
distribution of stratum A move away from stratum B (or from last
week's snapshot)?" — answered with the two-sample Kolmogorov-Smirnov
statistic D = sup_x |F_a(x) - F_b(x)|, estimated from per-stratum KLL
sketches (kernel/kll.py::ks_distance) instead of the raw rows.

Plan shape (the 100-TB posture): ONE scan + ONE shuffle builds the L
per-stratum sketches (the shared aggregation plan, PLANS.md §7); every
stratum pair is then evaluated on the tiny L-row sketch table — a
broadcast self-join producing <= L(L-1)/2 pair rows of O(k) bytes
each. The exact statistic would need a full re-sort of both strata's
raw rows PER PAIR; this never re-reads the input. The estimate carries
a sound error bound (sum of the two sketches' uniform rank errors; 0
in the lossless small-group regime where the sketch retains every
value), so "drifted" decisions can be made with the bound in hand.

Reference sketches serialize like every other sketch here, so the
"compare today against last month's checkpointed sketch" workflow is a
parquet read + ks_drift_col — no access to last month's raw data.

No reference-repo counterpart (SURVEY.md §2.4 extension surface).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pfutil_spark.kernel import kll
from pfutil_spark.operators.sketch_agg import SKETCH_COL, kll_sketch


def _iter_pair_chunks(sa: pd.Series, sb: pd.Series, max_bytes: int = 4 << 20):
    """Shared batch-decode prologue of the pair evaluators: the non-null
    pairs' sketch bytes are parsed by :func:`kll.parse_weighted_flat`
    (no Python ``decode`` per pair) and yielded in PAIR-CONTIGUOUS
    CHUNKS of at most ``max_bytes`` per side — eval scratch must stay
    arena-resident on this host (measured 2x end-to-end win vs
    whole-batch work at 10^3-strata matrices; the same allocation cliff
    ks_pairs_flat chunks for). Yields ``(ids, parsed_a, parsed_b)``.

    r6: DEDUPLICATED parse. A pair matrix repeats each sketch in ~L
    pairs, and profiling showed the parse (dominated by the
    per-(pair,item) lexsort) at ~70% of end-to-end evaluator time —
    O(pairs x items) work for O(uniques x items) information. When the
    batch's distinct buffers are materially fewer than its pair sides
    (and fit a bounded arena), each distinct buffer is parsed ONCE and
    the per-pair arrays are numpy-gathered from the unique parse —
    bit-identical, since the parse is row-local. Mostly-unique batches
    keep the r5 per-chunk parse (dedup would only add a hash pass)."""
    import numpy as np

    from pfutil_spark.kernel.sketch_common import flat_buffers

    va = [bytes(x) if x is not None else None for x in sa]
    vb = [bytes(x) if x is not None else None for x in sb]
    ids = np.flatnonzero(
        np.array([x is not None and y is not None for x, y in zip(va, vb)])
    )
    if not len(ids):
        return
    sizes = np.array([len(va[i]) + len(vb[i]) for i in ids], dtype=np.int64)
    bucket = np.cumsum(sizes) // max_bytes
    cuts = np.flatnonzero(np.diff(bucket, prepend=bucket[0])).tolist()
    cuts = [0] + cuts + ([len(ids)] if (not cuts or cuts[-1] != len(ids)) else [])

    uniq: dict[bytes, int] = {}
    ulist: list[bytes] = []

    def _uid(b: bytes) -> int:
        u = uniq.get(b)
        if u is None:
            u = uniq[b] = len(ulist)
            ulist.append(b)
        return u

    ua = np.array([_uid(va[i]) for i in ids], dtype=np.int64)
    ub = np.array([_uid(vb[i]) for i in ids], dtype=np.int64)
    uniq_bytes = sum(len(b) for b in ulist)
    # sharing factor = 2*pairs/uniques >= 2, and the one-shot unique
    # parse must stay arena-sized (else the r5 chunked parse wins)
    dedup = len(ulist) <= len(ids) and uniq_bytes <= (64 << 20)
    if dedup:
        pu = kll.parse_weighted_flat(*flat_buffers(ulist))
        n_u, eps_u, it_u, wt_u, st_u = pu

        def gather(sel: np.ndarray):
            # the same segment-gather kernel psi_pairs_flat compacts with
            items, wts, starts = kll._compact_valid_pairs(st_u, it_u, wt_u, sel)
            return n_u[sel], eps_u[sel], items, wts, starts

        for lo, hi in zip(cuts[:-1], cuts[1:]):
            yield ids[lo:hi], gather(ua[lo:hi]), gather(ub[lo:hi])
        return

    def flat(vals, idx):
        return kll.parse_weighted_flat(*flat_buffers([vals[i] for i in idx]))

    for lo, hi in zip(cuts[:-1], cuts[1:]):
        chunk = ids[lo:hi]
        yield chunk, flat(va, chunk), flat(vb, chunk)


def ks_drift_col(a: str | Column, b: str | Column) -> Column:
    """struct<ks_est, err_bound, n_a, n_b> for two KLL sketch columns.

    ``ks_est`` is the two-sample KS statistic estimate, ``err_bound``
    a sound bound on |ks_est - D_exact| (0.0 when both sketches are
    lossless — then ks_est IS the exact empirical statistic). A NULL
    sketch on either side (a stratum on one side of a snapshot outer
    join) yields an all-NULL struct, never a TypeError.

    Scale path (r5): every sketch of an Arrow batch is parsed in ONE
    flat pass and the KS statistics of ALL pairs evaluate vectorized
    (kernel/kll.py::ks_pairs_flat, float-identical to the per-pair
    ``ks_distance``) — at 10^4 strata the pairwise matrix is ~5*10^7
    pairs and the old per-pair decode was the latent bottleneck
    (VERDICT r4)."""
    out_t = StructType(
        [
            StructField("ks_est", DoubleType()),
            StructField("err_bound", DoubleType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _ks(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        import numpy as np

        n = len(sa)
        d_all = np.full(n, np.nan)
        e_all = np.full(n, np.nan)
        na_v = np.zeros(n, dtype=np.int64)
        nb_v = np.zeros(n, dtype=np.int64)
        na_mask = np.ones(n, dtype=bool)  # True = missing (null pair)
        for ids, pa_, pb_ in _iter_pair_chunks(sa, sb):
            d, e = kll.ks_pairs_flat(pa_, pb_)
            d_all[ids] = d
            e_all[ids] = e
            na_v[ids] = pa_[0]
            nb_v[ids] = pb_[0]
            na_mask[ids] = False
        return pd.DataFrame(
            {
                "ks_est": d_all,
                "err_bound": e_all,
                # nullable Int64: exact counts, mask -> SQL NULL
                "n_a": pd.arrays.IntegerArray(na_v, na_mask.copy()),
                "n_b": pd.arrays.IntegerArray(nb_v, na_mask),
            }
        )

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _ks(ca, cb)


PSI_DEFAULT_BINS = 10


def psi_pair_series(sa: pd.Series, sb: pd.Series, bins: int) -> pd.Series:
    """The ONE pair-evaluator body behind both :func:`psi_drift_col`
    and the ``kll_psi`` SQL UDF (functions/sql.py) — shared so the two
    surfaces cannot drift (the module's KS convention). NULL sketches
    (e.g. a stratum on only one side of a snapshot outer join) yield
    NULL, not a TypeError that fails the job.

    Vectorized ACROSS pairs (r6, the ks_pairs_flat treatment —
    VERDICT r5 item 4): one flat parse per chunk, then
    kernel/kll.py::psi_pairs_flat evaluates every pair's PSI with zero
    per-pair Python, regression-gated bit-identical to the per-pair
    ``psi_arrays`` path (integer rank numerators / exact int64 local
    cumsums make the per-pair float divisions the same ops)."""
    import numpy as np

    if bins < 2:  # keep psi_distance's loud-parameter contract
        raise ValueError(f"bins={bins}: need >= 2")
    n = len(sa)
    out = np.full(n, np.nan)
    for ids, pa_, pb_ in _iter_pair_chunks(sa, sb):
        out[ids] = kll.psi_pairs_flat(pa_, pb_, bins, 1e-4)
    return pd.Series(out, dtype="float64")


def psi_drift_col(
    cur: str | Column, ref: str | Column, bins: int = PSI_DEFAULT_BINS
) -> Column:
    """Population Stability Index (kernel/kll.py::psi_distance) of a
    current KLL sketch column against a reference — the familiar
    dashboard drift score (<0.1 stable / >0.25 major shift), computed
    from the same sketches as :func:`ks_drift_col`. KS carries the
    sound error bound; PSI is the convention. Weighted sketches
    (kll_weighted_sketch — e.g. token-weighted length distributions)
    feed both unchanged. NULL on NULL input. Per sketch PAIR, never
    per input row."""

    @F.pandas_udf(DoubleType())
    def _psi(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return psi_pair_series(sa, sb, bins)

    ca = F.col(cur) if isinstance(cur, str) else cur
    cb = F.col(ref) if isinstance(ref, str) else ref
    return _psi(ca, cb)


def drift_matrix(
    df: DataFrame, col: str, by: str, k: int = kll.DEFAULT_K,
    broadcast: bool = True,
) -> DataFrame:
    """Pairwise KS-drift matrix between the strata of ``by`` from ONE
    scan: per-stratum KLL sketches over ``col``, then every unordered
    stratum pair (broadcast self-join of the L-row sketch table).
    Null stratum keys drop (the ``a < b`` pair condition is null-free
    by construction). Columns:
    ``(a, b, ks_est, err_bound, n_a, n_b)``.

    ``broadcast=False`` for stratum counts whose sketch table exceeds
    the broadcast limits (L ~ 10^5 at k=200 is ~500MB): same results,
    no broadcast (the r4 _snapshot_join hardening, applied to the
    matrix). The ``a < b`` condition has NO equi-keys, so a plain
    non-broadcast join would let JoinSelection pick
    BroadcastNestedLoopJoin whenever catalyst's size estimate of the
    sketch table dips under the threshold — broadcasting the very table
    the flag exists to keep off the driver. The
    ``shuffle_replicate_nl`` hint pins the plan to the distributed
    CartesianProduct (shuffle-and-replicate nested loop; plan-gated in
    tests/test_drift.py::TestDriftMatrixScale)."""
    sk = kll_sketch(df, col, by=(by,), k=k)
    a = sk.select(F.col(by).alias("a"), F.col(SKETCH_COL).alias("__sa"))
    b = sk.select(F.col(by).alias("b"), F.col(SKETCH_COL).alias("__sb"))
    pairs = a.join(
        F.broadcast(b) if broadcast else b.hint("shuffle_replicate_nl"),
        F.col("a") < F.col("b"),
    )
    return pairs.select(
        "a", "b", ks_drift_col("__sa", "__sb").alias("__d")
    ).select("a", "b", "__d.*")


def table_sketches(
    df: DataFrame,
    cols: Sequence[str],
    by: Sequence[str] = (),
    k: int = kll.DEFAULT_K,
) -> DataFrame:
    """One KLL sketch per numeric column (per group) from ONE scan and
    ONE shuffle — the checkpointable distribution snapshot of a whole
    table (sketch_agg.py::sketch_multi underneath; nulls drop per
    column). Write this next to each ingest batch and ``table_drift``
    can compare any two snapshots without the raw rows."""
    from pfutil_spark.operators.sketch_agg import kll_spec, sketch_multi

    metrics = {c: (F.col(c).cast("double"), kll_spec(k)) for c in cols}
    return sketch_multi(df, metrics, by=list(by))


def table_drift(
    df: DataFrame,
    reference: DataFrame,
    cols: Sequence[str],
    by: Sequence[str] = (),
    k: int = kll.DEFAULT_K,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Whole-table drift report: per-column two-sample KS of ``df``'s
    current distributions against a REFERENCE snapshot
    (:func:`table_sketches` output — e.g. read back from last week's
    checkpoint). ONE scan over the current data builds all column
    sketches; the compare joins two L-row sketch tables — broadcast by
    default (the common few-strata case); pass
    ``broadcast_reference=False`` when strata cardinality is huge
    (per-domain/per-repo snapshots at 10^6+ keys: N sketch columns x L
    rows would not fit a broadcast) and the join shuffles instead,
    with AQE free to re-broadcast a side that turns out small.
    Columns: ``(by..., col_name, ks_est, err_bound, n_cur, n_ref)``."""
    by = list(by)
    missing = [c for c in cols if c not in reference.columns]
    if missing:
        raise ValueError(
            f"reference snapshot lacks sketch columns {missing}; "
            f"build it with table_sketches(..., cols={list(cols)})"
        )
    cur = table_sketches(df, cols, by, k).select(
        *by, *[F.col(c).alias(f"__cur_{i}") for i, c in enumerate(cols)]
    )
    ref = reference.select(
        *by, *[F.col(c).alias(f"__ref_{i}") for i, c in enumerate(cols)]
    )
    ref_side = F.broadcast(ref) if broadcast_reference else ref
    if by:
        joined = cur.join(ref_side, by)
    else:
        joined = cur.crossJoin(ref_side)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            ks_drift_col(f"__cur_{i}", f"__ref_{i}").alias("d"),
        )
        for i, c in enumerate(cols)
    ]
    return (
        joined.select(*by, F.explode(F.array(*per_col)).alias("__e"))
        .select(*by, "__e.col_name", "__e.d.*")
        .withColumnRenamed("n_a", "n_cur")
        .withColumnRenamed("n_b", "n_ref")
    )


def _snapshot_join(
    cur: DataFrame, ref: DataFrame, by: Sequence[str]
) -> DataFrame:
    """Null-safe FULL OUTER join of a current and a reference L-row
    sketch table carrying ``__sa`` / ``__sb`` — strata present on
    only one side survive with a NULL sketch on the other (born /
    vanished strata ARE the signal in a snapshot diff); a NULL stratum
    key matches null-safely (one row, not two). The global (``by=()``)
    case joins the two <= 1-row frames full-outer on a constant key —
    a cross join would return ZERO rows whenever either side is empty,
    silently reporting "no drift" on exactly the anomalies (empty
    current batch, empty reference) a monitor exists to surface; both
    sides empty yields no row (there is nothing to diff).

    Deliberately NOT broadcast-hinted: Spark ignores broadcast hints on
    full-outer equi-joins anyway (it plans a shuffle join), and a
    shuffle of two L-row SKETCH tables is exactly right when L is huge
    (per-domain snapshots at 10^6+ strata would not fit a broadcast);
    AQE still converts to a broadcast join at runtime when a side turns
    out tiny."""
    by = list(by)
    if not by:
        return (
            cur.withColumn("__pf_k", F.lit(1))
            .join(
                ref.withColumn("__pf_k", F.lit(1)),
                "__pf_k",
                "full_outer",
            )
            .select("__sa", "__sb")
        )
    ca, cr = cur.alias("__cur"), ref.alias("__ref")
    cond = None
    for c in by:
        eq = F.col(f"__cur.{c}").eqNullSafe(F.col(f"__ref.{c}"))
        cond = eq if cond is None else (cond & eq)
    return ca.join(cr, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__cur.{c}"), F.col(f"__ref.{c}")).alias(c)
            for c in by
        ],
        "__sa",
        "__sb",
    )


def cardinality_drift_col(
    a: str | Column, b: str | Column, version: int = 4
) -> Column:
    """struct<est_cur, est_ref, est_new> for two HLL sketch columns
    (NULL sketch = empty set, so outer-joined snapshot rows work).
    ``est_new`` estimates |cur \\ ref| via the exact set identity
    |cur \\ ref| = |cur ∪ ref| - |ref| evaluated on HLL estimates —
    union-relative error, the same caveat as
    rollup.pf_intersect_estimate_col; clamped at 0. Per sketch PAIR,
    never per input row."""
    from pfutil_spark.kernel import hll

    out_t = StructType(
        [
            StructField("est_cur", LongType()),
            StructField("est_ref", LongType()),
            StructField("est_new", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _card(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        import numpy as np

        rows = []
        for x, y in zip(sa, sb):
            ra = hll.decode(bytes(x)) if x is not None else hll.empty_registers()
            rb = hll.decode(bytes(y)) if y is not None else hll.empty_registers()
            cur = hll.estimate(ra, version)
            ref = hll.estimate(rb, version)
            uni = hll.estimate(np.maximum(ra, rb), version)
            rows.append((cur, ref, max(uni - ref, 0)))
        return pd.DataFrame(rows, columns=["est_cur", "est_ref", "est_new"])

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _card(ca, cb)


def cardinality_drift(
    df: DataFrame,
    element: str | Column,
    reference: DataFrame,
    by: Sequence[str] = (),
    version: int = 4,
) -> DataFrame:
    """Distinct-count drift vs a checkpointed HLL sketch table: per
    stratum, the current estimate, the reference estimate, and the
    estimated count of elements the reference has NEVER seen (``est_new``
    — the crawl-monitoring question "how much genuinely new content
    arrived", answered without re-reading any historical rows: PFMERGE
    of two 12KB sketches per stratum). ``reference`` is
    hll_agg.pf_sketch output carrying ``by`` + ``sketch``.

    One scan + one shuffle sketches the current batch; the compare is a
    null-safe FULL OUTER broadcast join of two L-row sketch tables —
    strata new to the stream report est_ref 0 and est_new == est_cur;
    vanished strata report est_cur 0 and est_new 0. Columns:
    ``(by..., est_cur, est_ref, est_new)``."""
    from pfutil_spark.operators.hll_agg import pf_sketch

    by = list(by)
    if isinstance(element, Column):
        # pf_sketch/pf_partial take a column NAME (they read the dtype
        # from the schema) — materialize expression elements first
        df = df.withColumn("__pf_drift_elem", element)
        element = "__pf_drift_elem"
    cur = pf_sketch(df, element, by=by, version=version).withColumnRenamed(
        SKETCH_COL, "__sa"
    )
    ref = reference.select(*by, F.col(SKETCH_COL).alias("__sb"))
    joined = _snapshot_join(cur, ref, by)
    return joined.select(
        *by, cardinality_drift_col("__sa", "__sb", version).alias("__d")
    ).select(*by, "__d.*")


def topk_drift(
    df: DataFrame,
    col: str,
    reference: DataFrame,
    by: Sequence[str] = (),
    k: int = 10,
    m: int = 256,
) -> DataFrame:
    """Heavy-hitter churn vs a checkpointed SpaceSaving summary table:
    which values ENTERED the per-stratum top-k since the reference
    snapshot, which EXITED, which STAYED — the "new trending
    domains/tokens this week" monitor, from two <= m-entry summaries
    per stratum (``reference`` is sketch_agg.spacesaving_sketch output;
    build it with the same ``m`` so the overcount regimes match).

    One scan + one constant-size shuffle summarizes the current batch;
    the compare explodes the tiny joined sketch table. Output one row
    per (stratum, value) in either side's top-k:
    ``(by..., value, status, est_cur, est_ref)`` with status in
    {'entered','exited','stayed'} and the absent side's estimate NULL.
    Estimates are SpaceSaving upper bounds (exact while a stratum has
    <= m distinct values — the summary is then the exact frequency
    table); top-k ties break by value, so churn rows are deterministic.
    Born/vanished/null strata survive via the same null-safe outer
    snapshot join as :func:`cardinality_drift`."""
    from pfutil_spark.kernel import spacesaving
    from pfutil_spark.operators.sketch_agg import spacesaving_sketch

    by = list(by)
    out_t = StructType(
        [
            StructField("value", StringType()),
            StructField("status", StringType()),
            StructField("est_cur", LongType()),
            StructField("est_ref", LongType()),
        ]
    )

    @F.pandas_udf(ArrayType(out_t))
    def _churn(sa: pd.Series, sb: pd.Series) -> pd.Series:
        def top(buf):
            if buf is None:
                return {}
            # (est desc, value asc) total order -> deterministic top-k
            items = spacesaving.decode(bytes(buf)).top_k(k)
            return {v: int(c) for v, c, _ in items}

        out = []
        for x, y in zip(sa, sb):
            cur_top, ref_top = top(x), top(y)
            rows = []
            for v in sorted(set(cur_top) | set(ref_top)):
                in_c, in_r = v in cur_top, v in ref_top
                status = "stayed" if in_c and in_r else (
                    "entered" if in_c else "exited"
                )
                rows.append((v, status, cur_top.get(v), ref_top.get(v)))
            out.append(rows)
        return pd.Series(out)

    cur = spacesaving_sketch(df, col, by=by, m=m).withColumnRenamed(
        SKETCH_COL, "__sa"
    )
    ref = reference.select(*by, F.col(SKETCH_COL).alias("__sb"))
    joined = _snapshot_join(cur, ref, by)
    return joined.select(
        *by, F.explode(_churn("__sa", "__sb")).alias("__e")
    ).select(*by, "__e.*")


def drift_against_reference(
    df: DataFrame,
    col: str,
    reference: DataFrame,
    by: Sequence[str] = (),
    k: int = kll.DEFAULT_K,
    broadcast_reference: bool = True,
) -> DataFrame:
    """KS drift of ``df``'s ``col`` distribution against a REFERENCE
    sketch table (e.g. last month's checkpointed ``kll_sketch`` output
    read back from parquet — raw historical rows never needed).
    ``reference`` must carry the same ``by`` columns plus a KLL sketch
    column named ``sketch``; current-side sketches are built with the
    same ``k`` so the error bounds line up. Inner equi-join on ``by``
    (strata absent from either side drop); with ``by=()`` both sides
    are single-row and a cross join of 1x1 is used. The reference is
    broadcast by default (the common few-strata case) — pass
    ``broadcast_reference=False`` at huge strata cardinality
    (per-domain snapshots: 10^6 strata x O(k) sketch bytes would not
    fit a broadcast) to shuffle-join instead, with AQE free to
    re-broadcast a side that turns out small. Columns:
    ``(by..., ks_est, err_bound, n_a, n_b)`` — ``n_a`` is the current
    side."""
    by = list(by)
    cur = kll_sketch(df, col, by=by, k=k).withColumnRenamed(SKETCH_COL, "__sa")
    ref = reference.withColumnRenamed(SKETCH_COL, "__sb")
    ref_cols = ref.select(*by, "__sb") if by else ref.select("__sb")
    ref_side = F.broadcast(ref_cols) if broadcast_reference else ref_cols
    if by:
        joined = cur.join(ref_side, by)
    else:
        joined = cur.crossJoin(ref_side)
    return joined.select(
        *by, ks_drift_col("__sa", "__sb").alias("__d")
    ).select(*by, "__d.*")
