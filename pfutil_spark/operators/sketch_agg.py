"""Generic two-phase distributed aggregation for the extension sketches
(count-min, Bloom, KLL, t-digest) — same plan shape as the HLL operator
(see hll_agg.py: mapInArrow partial -> single shuffle -> applyInPandas
merge), parameterized by a small kernel spec.

Transfer-frugal by design: hash-keyed sketches (CMS, Bloom) consume a
JVM-side ``xxhash64(col)`` (8 bytes/row over Arrow, computed in codegen);
value sketches (KLL, t-digest) consume the raw double column.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, LongType, StructField, StructType

from pfutil_spark.kernel import bloom, cms, kll, kmv, tdigest

SKETCH_COL = "sketch"
_ELEM = "__pf_elem"
_WT = "__pf_wt"


@dataclass
class KernelSpec:
    """zero() -> state; update(state, values) -> state (may mutate);
    merge(list[state]) -> state; encode(state) -> bytes; decode(bytes) -> state.

    Optional vectorized hooks (all flat-buffer, zero per-group Python —
    the machinery that lets per-key sketches survive 10^6+ groups, the
    same progression the HLL path made in rounds 2-3):

    * ``fold_groups(values, inverse, n_groups) -> (data, offsets)`` —
      grouped partial fold straight from element values (int64 hashes or
      float64), used by the high-cardinality direct-emit partial path.
    * ``merge_groups(data, offsets, group_codes, n_groups) -> (data,
      offsets)`` — grouped merge of encoded sketches (``group_codes``
      non-decreasing, all codes present); used by the Arrow merge stage
      for multi-partial groups. Specs without it fall back to a
      per-GROUP Python fold over only those groups.
    * ``valid_flat(data, offsets) -> bool[n]`` — non-raising per-buffer
      validity, the single-partial passthrough gate of the Arrow merge
      stage (``encode(decode(b)) == b`` holds for every valid buffer of
      these formats, so validity alone implies canonical bytes).
    * ``fold_bytes_bound(n_groups, n_rows) -> int`` — upper bound on the
      bytes a direct-emit fold would produce for a batch. Direct emit is
      only taken when this stays under ``DIRECT_EMIT_BYTES_CAP``: a
      sketch whose size is independent of its row count (Bloom's m/8
      bit array) would otherwise blow up as n_groups x fixed-size where
      the accumulation path was fine.
    """

    zero: Callable
    update: Callable
    merge: Callable
    encode: Callable
    decode: Callable
    fold_groups: Callable | None = None
    merge_groups: Callable | None = None
    valid_flat: Callable | None = None
    fold_bytes_bound: Callable | None = None
    # weighted-element hooks (sketches whose rank mass can carry a
    # per-row weight, e.g. t-digest): update_weighted(state, values,
    # weights) -> state; fold_groups_weighted(values, weights, inverse,
    # n_groups) -> (data, offsets). Required when sketch_agg is called
    # with a weight column.
    update_weighted: Callable | None = None
    fold_groups_weighted: Callable | None = None
    # weight-aware direct-emit byte gate: fold_bytes_bound_weighted(
    # n_groups, n_rows, weights) -> int. Only needed when the weighted
    # fold's output size depends on the weight VALUES (KLL's binary
    # expansion emits one item per set weight bit); specs without it
    # gate weighted batches on the plain fold_bytes_bound.
    fold_bytes_bound_weighted: Callable | None = None


# per-batch output ceiling for the direct-emit fold (well under the 2GB
# Arrow int32-offset limit, and a sane executor-memory bound)
DIRECT_EMIT_BYTES_CAP = 1 << 28


def _emit_bytes_bound(spec: "KernelSpec", weighted: bool, n_groups: int,
                      n_rows: int, wts) -> int | None:
    """Byte bound for a direct-emit fold of one batch (None = ungated)."""
    if weighted and spec.fold_bytes_bound_weighted is not None:
        return spec.fold_bytes_bound_weighted(n_groups, n_rows, wts)
    if spec.fold_bytes_bound is not None:
        return spec.fold_bytes_bound(n_groups, n_rows)
    return None


def cms_spec(depth: int = cms.DEFAULT_DEPTH, width: int = cms.DEFAULT_WIDTH) -> KernelSpec:
    def update(state, values):
        cms.update(state, values)
        return state

    def update_weighted(state, values, weights):
        wt = np.asarray(weights).astype(np.int64)
        m = wt > 0  # negative increments would break never-undercount
        cms.update(state, np.asarray(values)[m], counts=wt[m])
        return state

    return KernelSpec(
        zero=lambda: cms.empty(depth, width),
        update=update,
        merge=cms.merge,
        encode=cms.encode,
        decode=cms.decode,
        fold_groups=lambda v, inv, n: cms.fold_groups(v, inv, n, depth, width),
        merge_groups=lambda d, o, g, n: cms.merge_groups_flat(d, o, g, n, depth, width),
        valid_flat=lambda d, o: cms.valid_flat(d, o, depth, width),
        # a group's sparse payload never exceeds its item count (dense is
        # only chosen when smaller), so rows*depth entries bound the lot
        fold_bytes_bound=lambda g, n: 20 * g + 12 * depth * n,
        update_weighted=update_weighted,
        fold_groups_weighted=lambda v, w, inv, n: cms.fold_groups_weighted(
            v, w, inv, n, depth, width
        ),
    )


def bloom_spec(m_bits: int = bloom.DEFAULT_BITS, k: int = bloom.DEFAULT_K) -> KernelSpec:
    def update(state, values):
        bloom.update(state, values, k)
        return state

    return KernelSpec(
        zero=lambda: bloom.empty(m_bits),
        update=update,
        merge=bloom.merge,
        encode=lambda s: bloom.encode(s, k),
        decode=lambda b: bloom.decode(b)[0],
        fold_groups=lambda v, inv, n: bloom.fold_groups(v, inv, n, m_bits, k),
        merge_groups=lambda d, o, g, n: bloom.merge_groups_flat(d, o, g, n, m_bits, k),
        valid_flat=lambda d, o: bloom.valid_flat(d, o, m_bits, k),
        # sparse v2 wire: a group costs min(dense, 20 + 4*set_bits), and
        # dense is only picked when smaller — so 20*g + 4*k*rows bounds
        # the whole batch (row-scaled; the cap still guards pathology)
        fold_bytes_bound=lambda g, n: 20 * g + 4 * k * n,
    )


def kll_spec(k: int = kll.DEFAULT_K) -> KernelSpec:
    def update(state, values):
        state.update(values)
        return state

    def update_weighted(state, values, weights):
        state.update_weighted(values, weights)
        return state

    return KernelSpec(
        zero=lambda: kll.KllSketch(k),
        update=update,
        merge=kll.merge_all,
        encode=lambda s: s.encode(),
        decode=kll.decode,
        fold_groups=lambda v, inv, n: kll.fold_groups_level0(v, inv, n, k),
        merge_groups=lambda d, o, g, n: kll.merge_groups_flat(d, o, g, n, k),
        valid_flat=lambda d, o: kll.valid_flat(d, o, k),
        fold_bytes_bound=lambda g, n: 32 * g + 8 * n,
        update_weighted=update_weighted,
        fold_groups_weighted=lambda v, w, inv, n: kll.fold_groups_weighted(
            v, w, inv, n, k
        ),
        # binary expansion emits one 8-byte item per set weight bit;
        # header worst case 28 + 4*63 per group (compacted big groups
        # only ever shrink below this)
        fold_bytes_bound_weighted=lambda g, n, w: 280 * g
        + 8 * kll.popcount_sum(w),
    )


def spacesaving_spec(m: int = 256) -> KernelSpec:
    from pfutil_spark.kernel import spacesaving as ss

    def update(state, values):
        state.update_batch(values)
        return state

    def update_weighted(state, values, weights):
        wt = np.asarray(weights).astype(np.int64)
        keep = wt > 0  # zero/negative weights must not seed theta+0 items
        state.update_batch(np.asarray(values, dtype=object)[keep], wt[keep])
        return state

    return KernelSpec(
        zero=lambda: ss.SpaceSaving(m),
        update=update,
        merge=ss.merge_all,
        encode=lambda s: s.encode(),
        decode=ss.decode,
        fold_groups=lambda v, inv, n: ss.fold_groups(v, inv, n, m),
        merge_groups=lambda d, o, g, n: ss.merge_groups_flat(d, o, g, n, m),
        valid_flat=lambda d, o: ss.valid_flat(d, o, m),
        # a group's wire row is 32B + (12 + key bytes) per kept item and
        # kept items never exceed the batch's rows for that group; 256B
        # assumed per key (SS elements are reportable values — ids,
        # terms), and the partial path's 2GB offsets check still guards
        # the pathological-long-key case
        fold_bytes_bound=lambda g, n: 32 * g + 268 * n,
        update_weighted=update_weighted,
        fold_groups_weighted=lambda v, w, inv, n: ss.fold_groups_weighted(
            v, w, inv, n, m
        ),
    )


def kmv_spec(k: int = kmv.DEFAULT_K) -> KernelSpec:
    def update(state, values):
        return state.update(values)

    return KernelSpec(
        zero=lambda: kmv.KmvSketch(k),
        update=update,
        merge=kmv.merge_all,
        encode=lambda s: s.encode(),
        decode=kmv.decode,
        fold_groups=lambda v, inv, n: kmv.fold_groups_hashes(v, inv, n, k),
        merge_groups=lambda d, o, g, n: kmv.merge_groups_flat(d, o, g, n, k),
        valid_flat=lambda d, o: kmv.valid_flat(d, o, k),
        fold_bytes_bound=lambda g, n: 16 * g + 8 * min(n, g * k),
    )


def tdigest_spec(delta: int = tdigest.DEFAULT_DELTA) -> KernelSpec:
    def update(state, values):
        state.update(values)
        return state

    def update_weighted(state, values, weights):
        state.update_weighted(values, weights)
        return state

    return KernelSpec(
        zero=lambda: tdigest.TDigest(delta),
        update=update,
        merge=tdigest.merge_all,
        encode=lambda s: s.encode(),
        decode=tdigest.decode,
        fold_groups=lambda v, inv, n: tdigest.fold_groups(v, inv, n, delta),
        merge_groups=lambda d, o, g, n: tdigest.merge_groups_flat(d, o, g, n, delta),
        valid_flat=lambda d, o: tdigest.valid_flat(d, o, delta),
        fold_bytes_bound=lambda g, n: 32 * g + 16 * min(n, g * (delta + 2)),
        update_weighted=update_weighted,
        fold_groups_weighted=lambda v, w, inv, n: tdigest.fold_groups_weighted(
            v, w, inv, n, delta
        ),
    )


# ---------------------------------------------------------------------------
# generic two-phase plan
# ---------------------------------------------------------------------------

def _out_schema(df: DataFrame, by: Sequence[str]) -> StructType:
    return StructType(
        [df.schema[c] for c in by] + [StructField(SKETCH_COL, BinaryType(), False)]
    )


def sketch_agg(
    df: DataFrame,
    element: Column,
    spec: KernelSpec,
    by: Sequence[str] = (),
    max_groups_in_flight: int = 2048,
    direct_emit_groups: int = 4096,
    engine: str = "arrow",
    weight: Column | None = None,
) -> DataFrame:
    """(by..., sketch) via partial (mapInArrow, per-partition accumulation)
    -> one shuffle -> merge. ``element`` must evaluate to LONG (pre-hash)
    or DOUBLE (values) — both cross Arrow as fixed 8-byte columns.

    Scale posture mirrors the HLL operator (hll_agg.py):

    * LOW-cardinality ``by`` (< ``direct_emit_groups`` distinct keys per
      batch): per-partition cross-batch accumulation — one partial per
      (partition, group), the shape that keeps shuffle bytes at
      O(groups x partitions x sketch).
    * HIGH-cardinality batches with a ``spec.fold_groups`` hook: the
      whole batch folds to per-group encoded sketches in one vectorized
      pass (flat buffers, zero per-group Python) and emits directly —
      the near-unique-key regime where accumulation buys nothing. As of
      r5 every spec has the hook (SpaceSaving folds its object-string
      summaries via factorize+reduceat).
    * ``engine='arrow'`` (default) merge: repartition on the keys (the
      only Exchange, no per-partition Sort) + a single vectorized pass
      per partition — validated single-partial groups PASS THROUGH
      untouched (an Arrow take; at 10^6 near-unique groups that is
      ~every group), multi-partial groups batch-merge via
      ``spec.merge_groups`` or, lacking one, a per-GROUP fold over just
      those groups. ``engine='pandas'`` keeps the r1-era applyInPandas
      fold (differential-test oracle)."""
    partials = sketch_partial(
        df, element, spec, by, max_groups_in_flight, direct_emit_groups,
        weight=weight,
    )
    return sketch_merge(partials, spec, by, engine=engine)


def sketch_partial(
    df: DataFrame,
    element: Column,
    spec: KernelSpec,
    by: Sequence[str] = (),
    max_groups_in_flight: int = 2048,
    direct_emit_groups: int = 4096,
    weight: Column | None = None,
) -> DataFrame:
    """Stage P alone: one ``(by..., sketch)`` partial row per
    (partition, group) — checkpointable (see
    sources.checkpoint.ResumableSketchJob) and mergeable later via
    :func:`sketch_merge` in any order/partitioning.

    With ``weight`` (a DOUBLE column; requires ``spec.update_weighted``)
    each element carries that much rank mass; rows with a null element
    OR null weight are dropped (non-positive weights drop kernel-side)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pfutil_spark.operators.hll_agg import _group_codes

    by = list(by)
    if weight is not None and spec.update_weighted is None:
        raise ValueError("this sketch spec does not support weighted elements")
    weighted = weight is not None  # plain bool: the Column itself must
    # NOT be captured by partial_fn (a JVM handle — unpicklable)
    wt_cols = [weight.alias(_WT)] if weighted else []
    pruned = df.select(*by, element.alias(_ELEM), *wt_cols)
    schema = _out_schema(pruned.select(*by, _ELEM), by)

    def partial_fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        acc: dict[tuple, object] = {}
        key_fields: list = []
        seen = False

        def flush() -> "pa.RecordBatch":
            keys = list(acc.keys())
            arrays = [
                pa.array([k[j] for k in keys], type=key_fields[j].type)
                for j in range(len(by))
            ]
            arrays.append(pa.array([spec.encode(acc[k]) for k in keys], type=pa.binary()))
            return pa.record_batch(arrays, names=by + [SKETCH_COL])

        for batch in batches:
            if not seen:
                key_fields = [batch.schema.field(c) for c in by]
                seen = True
            elem = batch.column(_ELEM)
            if weighted and batch.column(_WT).null_count:
                batch = batch.filter(pc.is_valid(batch.column(_WT)))
                elem = batch.column(_ELEM)
            if elem.null_count:
                batch = batch.filter(pc.is_valid(elem))
                elem = batch.column(_ELEM)
            if len(batch) == 0:
                continue
            values = elem.to_numpy(zero_copy_only=False)
            wts = (
                batch.column(_WT).to_numpy(zero_copy_only=False)
                if weighted
                else None
            )
            fold = spec.fold_groups_weighted if weighted else spec.fold_groups
            if by:
                inverse, first_idx = _group_codes(batch, by)
                n_groups = len(first_idx)
                # bound evaluated only after the cheap gates pass: the
                # weighted-KLL popcount bound is itself a batch-sized
                # scan, wasted work on low-cardinality batches that take
                # the accumulation path anyway
                bound = (
                    _emit_bytes_bound(spec, weighted, n_groups, len(values), wts)
                    if fold is not None and n_groups >= direct_emit_groups
                    else 0
                )
                if (
                    fold is not None
                    and n_groups >= direct_emit_groups
                    and (bound is None or bound <= DIRECT_EMIT_BYTES_CAP)
                ):
                    # high-cardinality batch: vectorized direct emit
                    data, offs = (
                        fold(values, wts, inverse, n_groups)
                        if weighted
                        else fold(values, inverse, n_groups)
                    )
                    if offs[-1] > (1 << 31) - 1:
                        raise ValueError(
                            "sketch_agg direct-emit batch exceeds 2GB of "
                            "sketch bytes; lower spark.sql.execution.arrow."
                            "maxRecordsPerBatch or the sketch width"
                        )
                    sk_arr = pa.Array.from_buffers(
                        pa.binary(),
                        n_groups,
                        [None, pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(data)],
                    )
                    take = pa.array(first_idx)
                    yield pa.record_batch(
                        [batch.column(c).take(take) for c in by] + [sk_arr],
                        names=by + [SKETCH_COL],
                    )
                    continue
                order = np.argsort(inverse, kind="stable")
                sorted_inv = inverse[order]
                bounds = np.flatnonzero(np.diff(sorted_inv)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(sorted_inv)]))
                take = pa.array(first_idx)
                key_cols = [batch.column(c).take(take).to_pylist() for c in by]
                for g, (s, e) in enumerate(zip(starts, ends)):
                    k = tuple(col[g] for col in key_cols)
                    st = acc.get(k)
                    if st is None:
                        st = acc[k] = spec.zero()
                    sel = order[s:e]
                    acc[k] = (
                        spec.update_weighted(st, values[sel], wts[sel])
                        if weighted
                        else spec.update(st, values[sel])
                    )
            else:
                st = acc.get(())
                if st is None:
                    st = acc[()] = spec.zero()
                acc[()] = (
                    spec.update_weighted(st, values, wts)
                    if weighted
                    else spec.update(st, values)
                )
            if len(acc) > max_groups_in_flight:
                yield flush()
                acc = {}
        if not acc and not by:
            acc[()] = spec.zero()
        if acc:
            yield flush()

    return pruned.mapInArrow(partial_fn, schema)


def sketch_merge(
    partials: DataFrame,
    spec: KernelSpec,
    by: Sequence[str] = (),
    sketch_col: str = SKETCH_COL,
    engine: str = "arrow",
) -> DataFrame:
    """Merge partial sketches per group (usable standalone on
    checkpointed partial tables, like hll_agg.pf_merge)."""
    by = list(by)
    schema = StructType(
        [partials.schema[c] for c in by]
        + [StructField(SKETCH_COL, BinaryType(), False)]
    )
    if engine == "arrow":
        import pyarrow as pa

        pruned = partials.select(*by, sketch_col)
        target = (
            pruned.repartition(*[F.col(c) for c in by]) if by else pruned.repartition(1)
        )

        def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
            import pyarrow as pa

            got = [b for b in batches if b.num_rows]
            if not got:
                return
            try:
                batch = pa.Table.from_batches(got).combine_chunks().to_batches()[0]
            except pa.lib.ArrowInvalid as e:  # int32 binary-offset overflow
                raise ValueError(
                    "merge partition exceeds 2GB of sketch bytes; raise "
                    "spark.sql.shuffle.partitions (or shrink the sketch "
                    "parameters)"
                ) from e
            yield merge_sketch_batch(batch, by, sketch_col, spec)

        return target.mapInArrow(fn, schema)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = spec.merge([spec.decode(b) for b in pdf[sketch_col]])
        head = pdf.iloc[[0]][by].reset_index(drop=True)
        head[SKETCH_COL] = [spec.encode(merged)]
        return head

    if by:
        return partials.groupBy(*by).applyInPandas(merge_fn, schema)
    return (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(merge_fn, schema)
        .select(SKETCH_COL)
    )


def merge_sketch_batch(
    batch: "pa.RecordBatch",
    keys: list[str],
    sketch_col: str,
    spec: KernelSpec,
    codes: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> "pa.RecordBatch":
    """Merge ALL groups of one Arrow batch (a merge task's partition) in
    one pass — module-level so tests can drive it directly and assert
    the no-per-group-Python property by monkeypatching the scalar
    kernels (which must never run for passthrough/vectorized regimes).

    Same skeleton as hll_agg.merge_record_batch: validated singles pass
    through via an Arrow ``take`` (these wire formats satisfy
    ``encode(decode(b)) == b``, so valid implies canonical — no
    re-encode needed); everything else merges via ``spec.merge_groups``
    when available, else a per-GROUP Python fold restricted to the
    multi-partial/invalid groups (at high-cardinality ``by`` that set is
    ~empty, which is what keeps 10^6-group merges cheap even for the
    object-state sketches)."""
    import pyarrow as pa

    from pfutil_spark.operators.hll_agg import _group_codes, _varbin_buffers

    n = batch.num_rows
    sk = batch.column(sketch_col)
    if codes is not None:  # precomputed by a multi-metric caller
        inverse, first_idx = codes
        n_groups = len(first_idx)
    elif keys:
        inverse, first_idx = _group_codes(batch, keys)
        n_groups = len(first_idx)
    else:
        inverse = np.zeros(n, dtype=np.int64)
        first_idx = np.array([0], dtype=np.int64)
        n_groups = 1
    counts = np.bincount(inverse, minlength=n_groups)
    order = np.argsort(inverse, kind="stable")
    gstarts = np.concatenate(([0], np.cumsum(counts)))[:-1]

    data, offsets = _varbin_buffers(sk)
    valid = (
        spec.valid_flat(data, offsets.astype(np.int64))
        if spec.valid_flat is not None
        else np.zeros(n, dtype=bool)
    )
    single_row = order[gstarts]
    passthrough = (counts == 1) & valid[single_row]
    pass_ids = np.flatnonzero(passthrough)
    work_ids = np.flatnonzero(~passthrough)
    arrays = []
    if len(pass_ids):
        arrays.append(sk.take(pa.array(single_row[pass_ids])))
    if len(work_ids):
        work_row_mask = ~passthrough[inverse[order]]
        rows = order[work_row_mask]  # group-sorted rows of work groups
        work_code = np.repeat(
            np.arange(len(work_ids), dtype=np.int64), counts[work_ids]
        )
        wdata, woffs = _varbin_buffers(sk.take(pa.array(rows)))
        woffs = woffs.astype(np.int64)
        if spec.merge_groups is not None:
            from pfutil_spark.kernel.sketch_common import check_arrow_binary_size

            mdata, moffs = spec.merge_groups(wdata, woffs, work_code, len(work_ids))
            check_arrow_binary_size(int(moffs[-1]))
            arrays.append(
                pa.Array.from_buffers(
                    pa.binary(),
                    len(work_ids),
                    [None, pa.py_buffer(moffs.astype(np.int32)), pa.py_buffer(mdata)],
                )
            )
        else:
            gb = np.flatnonzero(np.diff(work_code, prepend=-1))
            gends = np.append(gb[1:], len(work_code))
            outs = []
            for s, e in zip(gb.tolist(), gends.tolist()):
                states = [
                    spec.decode(bytes(wdata[woffs[i] : woffs[i + 1]]))
                    for i in range(s, e)
                ]
                outs.append(spec.encode(spec.merge(states)))
            arrays.append(pa.array(outs, type=pa.binary()))
    concat = pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays]
    )
    perm = np.empty(n_groups, dtype=np.int64)
    perm[pass_ids] = np.arange(len(pass_ids))
    perm[work_ids] = len(pass_ids) + np.arange(len(work_ids))
    sketch_out = concat.take(pa.array(perm))
    take = pa.array(first_idx)
    key_arrays = [batch.column(c).take(take) for c in keys]
    return pa.record_batch(key_arrays + [sketch_out], names=keys + [SKETCH_COL])


# ---------------------------------------------------------------------------
# public sketch builders
# ---------------------------------------------------------------------------

def sketch_multi(
    df: DataFrame,
    metrics: "dict[str, tuple[Column, KernelSpec] | tuple[Column, KernelSpec, Column]]",
    by: Sequence[str] = (),
    max_groups_in_flight: int = 2048,
    direct_emit_groups: int = 4096,
) -> DataFrame:
    """N DIFFERENT sketches over the same table in ONE scan and ONE
    shuffle — the profile-report shape ("per language: distinct shas
    (KMV), length quantiles (t-digest), token counts (CMS), membership
    (Bloom)") that would otherwise cost one scan+shuffle per metric.
    Mirrors ``operators/multi.pf_partial_multi`` (the HLL 4-metric
    report) generalized over arbitrary :class:`KernelSpec`s.
    ``sketch_multi_partial`` + ``sketch_multi_merge`` expose the two
    stages for checkpointing (ResumableSketchMultiJob).

    ``metrics`` maps output column name -> (element Column, spec) or
    (element, spec, weight Column) for weighted metrics (the spec must
    provide ``update_weighted``); each element must evaluate to a fixed
    8-byte type (pre-hashed LONG or DOUBLE). Nulls are dropped PER
    METRIC — element OR weight null drops that row for that metric only
    (a row missing one column still feeds the others); a group whose
    rows are all null for one metric still gets that metric's canonical
    empty sketch.

    Scale posture matches :func:`sketch_agg`: low-cardinality batches
    accumulate per (partition, group) across batches; high-cardinality
    batches direct-emit via each spec's vectorized ``fold_groups`` (all
    metrics must provide one, and the summed ``fold_bytes_bound`` must
    fit the cap — else the batch falls back to accumulation). The merge
    stage repartitions ONCE on the keys and merges every metric column
    inside the same task via :func:`merge_sketch_batch` (validated
    singles passthrough per column)."""
    partials = sketch_multi_partial(
        df, metrics, by, max_groups_in_flight, direct_emit_groups
    )
    return sketch_multi_merge(
        partials, {m: metrics[m][1] for m in metrics}, by
    )


def sketch_multi_partial(
    df: DataFrame,
    metrics: "dict[str, tuple[Column, KernelSpec] | tuple[Column, KernelSpec, Column]]",
    by: Sequence[str] = (),
    max_groups_in_flight: int = 2048,
    direct_emit_groups: int = 4096,
) -> DataFrame:
    """Stage P of :func:`sketch_multi`: one row per (partition, group)
    with one binary column PER METRIC — checkpointable; merge later (in
    any order/partitioning) with :func:`sketch_multi_merge`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pfutil_spark.operators.hll_agg import _group_codes

    by = list(by)
    names = list(metrics.keys())
    specs = [metrics[m][1] for m in names]
    wt_exprs = [metrics[m][2] if len(metrics[m]) > 2 else None for m in names]
    # plain bools/strings for the closure — never capture Column objects
    weighted_flags = [w is not None for w in wt_exprs]
    for m, spec, wf in zip(names, specs, weighted_flags):
        if wf and spec.update_weighted is None:
            raise ValueError(f"metric {m!r}: this spec does not support weighted elements")
    mcols = [f"__pf_m_{i}" for i in range(len(names))]
    wcols = [f"__pf_w_{i}" if wf else None for i, wf in enumerate(weighted_flags)]
    pruned = df.select(
        *by,
        *[metrics[m][0].alias(c) for m, c in zip(names, mcols)],
        *[w.alias(wc) for w, wc in zip(wt_exprs, wcols) if w is not None],
    )
    schema = StructType(
        [pruned.schema[c] for c in by]
        + [StructField(m, BinaryType(), False) for m in names]
    )

    def partial_fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        acc: dict[tuple, list] = {}
        key_fields: list = []
        seen = False

        def flush() -> "pa.RecordBatch":
            keys = list(acc.keys())
            arrays = [
                pa.array([k[j] for k in keys], type=key_fields[j].type)
                for j in range(len(by))
            ]
            for i, spec in enumerate(specs):
                arrays.append(
                    pa.array(
                        [
                            spec.encode(
                                acc[k][i] if acc[k][i] is not None else spec.zero()
                            )
                            for k in keys
                        ],
                        type=pa.binary(),
                    )
                )
            return pa.record_batch(arrays, names=by + names)

        for batch in batches:
            if not seen:
                key_fields = [batch.schema.field(c) for c in by]
                seen = True
            if len(batch) == 0:
                continue
            if by:
                inverse, first_idx = _group_codes(batch, by)
                n_groups = len(first_idx)
            else:
                inverse = np.zeros(len(batch), dtype=np.int64)
                first_idx = np.array([0], dtype=np.int64)
                n_groups = 1
            # per-metric valid rows (element OR weight nulls drop
            # independently per metric)
            per_metric = []
            for i, c in enumerate(mcols):
                col = batch.column(c)
                wcol = batch.column(wcols[i]) if weighted_flags[i] else None
                nulls = col.null_count or (wcol is not None and wcol.null_count)
                if nulls:
                    mask = pc.is_valid(col)
                    if wcol is not None:
                        mask = pc.and_(mask, pc.is_valid(wcol))
                    take = pa.array(np.flatnonzero(mask.to_numpy(zero_copy_only=False)))
                    vals = col.take(take).to_numpy(zero_copy_only=False)
                    wts = (
                        wcol.take(take).to_numpy(zero_copy_only=False)
                        if wcol is not None
                        else None
                    )
                    inv = inverse[take.to_numpy(zero_copy_only=False)]
                else:
                    vals = col.to_numpy(zero_copy_only=False)
                    wts = wcol.to_numpy(zero_copy_only=False) if wcol is not None else None
                    inv = inverse
                per_metric.append((vals, wts, inv))
            folds = [
                (s.fold_groups_weighted if wf else s.fold_groups)
                for s, wf in zip(specs, weighted_flags)
            ]
            direct_ok = (
                by
                and n_groups >= direct_emit_groups
                and all(f is not None for f in folds)
            )
            if direct_ok:
                # the byte gate sums over metrics: k folds co-reside in
                # the same output batch, so the cap must bound their
                # TOTAL (specs without a bound contribute 0, as in
                # sketch_agg). Evaluated only after the cheap gates —
                # weighted-KLL's popcount bound is a batch-sized scan.
                total_bound = sum(
                    b
                    for b in (
                        _emit_bytes_bound(s, wf, n_groups, len(v), w)
                        for s, wf, (v, w, __) in zip(
                            specs, weighted_flags, per_metric
                        )
                    )
                    if b is not None
                )
                direct_ok = total_bound <= DIRECT_EMIT_BYTES_CAP
            if direct_ok:
                arrays = [
                    batch.column(c).take(pa.array(first_idx)) for c in by
                ]
                for fold, wf, (vals, wts, inv) in zip(
                    folds, weighted_flags, per_metric
                ):
                    data, offs = (
                        fold(vals, wts, inv, n_groups)
                        if wf
                        else fold(vals, inv, n_groups)
                    )
                    if offs[-1] > (1 << 31) - 1:
                        raise ValueError(
                            "sketch_multi direct-emit batch exceeds 2GB of "
                            "sketch bytes; lower spark.sql.execution.arrow."
                            "maxRecordsPerBatch or the sketch widths"
                        )
                    arrays.append(
                        pa.Array.from_buffers(
                            pa.binary(),
                            n_groups,
                            [
                                None,
                                pa.py_buffer(offs.astype(np.int32)),
                                pa.py_buffer(data),
                            ],
                        )
                    )
                yield pa.record_batch(arrays, names=by + names)
                continue
            if by:
                take = pa.array(first_idx)
                key_cols = [batch.column(c).take(take).to_pylist() for c in by]
                group_keys = [
                    tuple(col[g] for col in key_cols) for g in range(n_groups)
                ]
            else:
                group_keys = [()]
            for k in group_keys:
                if k not in acc:
                    acc[k] = [None] * len(specs)
            for i, (spec, wf, (vals, wts, inv)) in enumerate(
                zip(specs, weighted_flags, per_metric)
            ):
                order = np.argsort(inv, kind="stable")
                sorted_inv = inv[order]
                bounds = np.flatnonzero(np.diff(sorted_inv)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(sorted_inv)]))
                for s, e in zip(starts, ends):
                    if s == e:
                        continue
                    k = group_keys[int(sorted_inv[s])]
                    st = acc[k][i]
                    if st is None:
                        st = acc[k][i] = spec.zero()
                    sel = order[s:e]
                    acc[k][i] = (
                        spec.update_weighted(st, vals[sel], wts[sel])
                        if wf
                        else spec.update(st, vals[sel])
                    )
            if len(acc) > max_groups_in_flight:
                yield flush()
                acc = {}
        if not acc and not by:
            acc[()] = [None] * len(specs)
        if acc:
            yield flush()

    return pruned.mapInArrow(partial_fn, schema)


def sketch_multi_merge(
    partials: DataFrame,
    metric_specs: "dict[str, KernelSpec]",
    by: Sequence[str] = (),
) -> DataFrame:
    """Merge stage of the multi-sketch report — usable standalone on a
    CHECKPOINTED partial table (sources.checkpoint.ResumableSketchMultiJob):
    ONE repartition on the keys, every metric column merges inside the
    same task (group codes computed once, validated singles passthrough
    per column)."""
    import pyarrow as pa

    from pfutil_spark.operators.hll_agg import _group_codes

    by = list(by)
    names = list(metric_specs.keys())
    specs = [metric_specs[m] for m in names]
    schema = StructType(
        [partials.schema[c] for c in by]
        + [StructField(m, BinaryType(), False) for m in names]
    )
    pruned = partials.select(*by, *names)
    target = (
        pruned.repartition(*[F.col(c) for c in by])
        if by
        else pruned.repartition(1)
    )

    def merge_fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        got = [b for b in batches if b.num_rows]
        if not got:
            return
        try:
            batch = pa.Table.from_batches(got).combine_chunks().to_batches()[0]
        except pa.lib.ArrowInvalid as e:
            raise ValueError(
                "sketch_multi merge partition exceeds 2GB of sketch bytes; "
                "raise spark.sql.shuffle.partitions"
            ) from e
        # group codes computed ONCE per partition, shared by all metrics
        if by:
            shared_codes = _group_codes(batch, by)
        else:
            shared_codes = (
                np.zeros(batch.num_rows, dtype=np.int64),
                np.array([0], dtype=np.int64),
            )
        merged_cols = []
        key_arrays = None
        for m, spec in zip(names, specs):
            sub = pa.record_batch(
                [batch.column(c) for c in by] + [batch.column(m)],
                names=by + [m],
            )
            out = merge_sketch_batch(sub, by, m, spec, codes=shared_codes)
            if key_arrays is None:
                key_arrays = [out.column(c) for c in by]
            # merge_sketch_batch names its sketch output SKETCH_COL
            merged_cols.append(out.column(SKETCH_COL))
        yield pa.record_batch(key_arrays + merged_cols, names=by + names)

    return target.mapInArrow(merge_fn, schema)


def tdigest_edges(
    sketch_df: DataFrame, qs: Sequence[float], sketch_col: str = SKETCH_COL
) -> list[float]:
    """Quantile edge values from a (single-row) t-digest sketch table —
    the index-building driver action of the bucketing pattern: one tiny
    collect (a few KB of sketch bytes, same class of documented action
    as the Bloom broadcast), after which bucketing is pure codegen."""
    row = sketch_df.select(sketch_col).first()
    if row is None:
        # a plan with ZERO partitions emits no partials at all (same
        # regime bloom_filter_join documents) — surface it, don't
        # TypeError on None
        raise ValueError(
            "tdigest_edges: sketch table has no rows (empty/zero-partition "
            "input?) — no quantile edges exist"
        )
    buf = row[0]
    return [
        float(x)
        for x in tdigest.decode(bytes(buf)).quantile(
            np.asarray(list(qs), dtype=np.float64)
        )
    ]


def bucket_col(col: str | Column, edges: Sequence[float]) -> Column:
    """Bucket index (0..len(edges)) for ``col`` against ascending edge
    values — e.g. length-decile features from `tdigest_edges(...,
    [0.1..0.9])`. Pure JVM: a sum of ``col > edge`` comparisons over
    literal edges, whole-stage-codegen'd, no UDF; NULL stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    idx: Column = F.lit(0)
    for e in edges:
        idx = idx + F.when(c > F.lit(float(e)), 1).otherwise(0)
    return F.when(c.isNotNull(), idx.cast("long"))


def quantile_clip(
    df: DataFrame,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    by: Sequence[str] = (),
    delta: int = tdigest.DEFAULT_DELTA,
) -> DataFrame:
    """Outlier clipping by estimated quantiles: keep rows whose ``col``
    lies inside the [lo, hi] quantile band — globally, or per group
    (e.g. drop the sub-p05 / post-p95 document-length tails PER
    LANGUAGE before packing). Neither pass re-sorts data: pass 1 builds
    one t-digest per group (one scan + one shuffle of constant-size
    sketch bytes), pass 2 filters against the tiny broadcast edge
    table (global form: edge LITERALS — pure whole-stage codegen, no
    join node at all). Band edges are inclusive; rows with NULL
    ``col`` — and, grouped, NULL group keys — drop (a NULL value is
    inside no band). Kept fraction is hi - lo up to the t-digest rank
    error at the two edges (tests bound it)."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"lo={lo}, hi={hi}: need 0 <= lo <= hi <= 1")
    by = list(by)
    c = F.col(col).cast("double")
    if not by:
        edges = tdigest_edges(tdigest_sketch(df, col, delta=delta), [lo, hi])
        return df.filter((c >= F.lit(edges[0])) & (c <= F.lit(edges[1])))
    q = tdigest_quantiles_col([lo, hi])
    ed = tdigest_sketch(df, col, by=by, delta=delta).select(
        *by,
        q.getItem(0).alias("__pf_clip_lo"),
        q.getItem(1).alias("__pf_clip_hi"),
    )
    joined = df.join(F.broadcast(ed), by)
    return joined.filter(
        (c >= F.col("__pf_clip_lo")) & (c <= F.col("__pf_clip_hi"))
    ).drop("__pf_clip_lo", "__pf_clip_hi")


def _long_weight(weight_col: str) -> Column:
    """Integer weight column with NaN / Infinity / out-of-long-range
    values treated as NULL (dropped rows): a bare ``cast("long")``
    throws CAST_OVERFLOW on any of them under ANSI mode (the default
    here), aborting the job instead of dropping the row."""
    return F.col(weight_col).cast("double").try_cast("long")


def _null_safe_hash(col: str) -> Column:
    """xxhash64 that propagates NULL: Spark's xxhash64(NULL) returns the
    SEED (42), which would smuggle null rows into hash-keyed sketches as
    a phantom element; sketch_agg drops null elements, so keep them
    null."""
    c = F.col(col)
    return F.when(c.isNotNull(), F.xxhash64(c))


def cms_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (),
    depth: int = cms.DEFAULT_DEPTH, width: int = cms.DEFAULT_WIDTH,
) -> DataFrame:
    """Count-min over ``col`` (any type — hashed JVM-side via xxhash64)."""
    return sketch_agg(df, _null_safe_hash(col), cms_spec(depth, width), by)


def cms_weighted_sketch(
    df: DataFrame, col: str, weight_col: str, by: Sequence[str] = (),
    depth: int = cms.DEFAULT_DEPTH, width: int = cms.DEFAULT_WIDTH,
) -> DataFrame:
    """Weighted count-min: each row adds ``weight_col`` (integer, > 0;
    null/non-positive rows drop) to its item's counters — byte-weighted
    token frequency, size-weighted key popularity. Same wire format; the
    never-undercount guarantee now bounds the weighted totals."""
    return sketch_agg(
        df,
        _null_safe_hash(col),
        cms_spec(depth, width),
        by,
        weight=_long_weight(weight_col),
    )


def bloom_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (),
    expected_n: int | None = None, fpr: float = 0.01,
    m_bits: int | None = None, k: int | None = None,
) -> DataFrame:
    if m_bits is None or k is None:
        m_bits, k = bloom.params_for(expected_n or 1_000_000, fpr)
    return sketch_agg(df, _null_safe_hash(col), bloom_spec(m_bits, k), by)


def kll_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (), k: int = kll.DEFAULT_K
) -> DataFrame:
    return sketch_agg(df, F.col(col).cast("double"), kll_spec(k), by)


def kll_weighted_sketch(
    df: DataFrame,
    col: str,
    weight_col: str,
    by: Sequence[str] = (),
    k: int = kll.DEFAULT_K,
) -> DataFrame:
    """Weighted KLL: each row's value carries ``weight_col`` (integer,
    > 0; null / non-positive / non-finite rows drop) units of rank mass
    via binary-expansion insertion (kernel/kll.py::update_weighted) —
    token-weighted length quantiles, byte-weighted score distributions.
    Same wire format (``kll_quantiles_col`` reads it unchanged); same
    two-phase plan. Insertion adds zero rank error (level-b items weigh
    exactly 2**b); unlike t-digest's weighted path, unit weights stay
    BYTE-identical to the unweighted sketch."""
    return sketch_agg(
        df,
        F.col(col).cast("double"),
        kll_spec(k),
        by,
        weight=_long_weight(weight_col),
    )


def tdigest_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (), delta: int = tdigest.DEFAULT_DELTA
) -> DataFrame:
    return sketch_agg(df, F.col(col).cast("double"), tdigest_spec(delta), by)


def tdigest_weighted_sketch(
    df: DataFrame,
    col: str,
    weight_col: str,
    by: Sequence[str] = (),
    delta: int = tdigest.DEFAULT_DELTA,
) -> DataFrame:
    """Weighted t-digest: each row's value carries ``weight_col`` units
    of rank mass — byte-weighted document-length quantiles,
    duration-weighted latency percentiles, token-weighted quality-score
    distributions. Same two-phase plan (partial -> one shuffle ->
    merge), same wire format (``tdigest_quantiles_col`` reads it
    unchanged); rows with null value/weight or weight <= 0 are dropped.
    Weighted folds are estimate-stable, not bit-stable, across batch
    splits (documented in kernel/tdigest.py::update_weighted)."""
    return sketch_agg(
        df,
        F.col(col).cast("double"),
        tdigest_spec(delta),
        by,
        weight=F.col(weight_col).cast("double"),
    )


def spacesaving_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (), m: int = 256
) -> DataFrame:
    """Mergeable SpaceSaving heavy-hitters summary over ``col``."""
    return sketch_agg(df, F.col(col).cast("string"), spacesaving_spec(m), by)


def spacesaving_weighted_sketch(
    df: DataFrame, col: str, weight_col: str, by: Sequence[str] = (), m: int = 256
) -> DataFrame:
    """Weighted heavy hitters: each row contributes ``weight_col``
    (integer, > 0; null/non-positive rows drop) to its value's count —
    "which tokens account for the most BYTES", "which repos the most
    files". When a group's distinct values fit in m the summary is
    EXACT (theta stays 0); above m the usual SpaceSaving guarantees
    bound the weighted totals."""
    return sketch_agg(
        df,
        F.col(col).cast("string"),
        spacesaving_spec(m),
        by,
        weight=_long_weight(weight_col),
    )


def kmv_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (), k: int = kmv.DEFAULT_K
) -> DataFrame:
    """KMV/theta distinct sketch over ``col`` (hashed JVM-side via
    xxhash64). Use when you need set OPERATIONS on the results —
    intersection / difference / Jaccard with error relative to the
    sample, not the union (HLL's inclusion-exclusion weakness)."""
    return sketch_agg(df, _null_safe_hash(col), kmv_spec(k), by)


def _kmv_estimate_series(s: pd.Series) -> pd.Series:
    """Shared KMV-estimate evaluator body (Column helper + SQL
    registration use the SAME implementation — keep them in sync by
    construction)."""
    return pd.Series([kmv.decode(bytes(b)).estimate() for b in s])


def kmv_estimate_col(sketch_col: str | Column = SKETCH_COL) -> Column:
    _est = F.pandas_udf(_kmv_estimate_series, DoubleType())
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return _est(c)


def kmv_set_ops_col(a: str | Column, b: str | Column) -> Column:
    """struct<union_est, intersect_est, diff_est, jaccard> for two KMV
    sketch columns. Decodes per row — meant for the usual tiny
    evaluation frames (one row per sketch pair)."""
    out_t = StructType(
        [
            StructField("union_est", DoubleType()),
            StructField("intersect_est", DoubleType()),
            StructField("diff_est", DoubleType()),
            StructField("jaccard", DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _ops(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        rows = []
        for ba, bb in zip(sa, sb):
            A, B = kmv.decode(bytes(ba)), kmv.decode(bytes(bb))
            rows.append(
                (
                    kmv.union_estimate([A, B]),
                    kmv.intersect_estimate(A, B),
                    kmv.a_not_b_estimate(A, B),
                    kmv.jaccard_estimate(A, B),
                )
            )
        return pd.DataFrame(
            rows, columns=["union_est", "intersect_est", "diff_est", "jaccard"]
        )

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _ops(ca, cb)


def spacesaving_topk_col(k: int, sketch_col: str = SKETCH_COL) -> Column:
    """array<struct<value, est_count, max_overcount>> of the summary's
    top-k; est_count is an upper bound, est_count - max_overcount a
    guaranteed lower bound."""
    from pyspark.sql.types import StringType, StructField, StructType

    from pfutil_spark.kernel import spacesaving as ss

    out_t = ArrayType(
        StructType(
            [
                StructField("value", StringType()),
                StructField("est_count", LongType()),
                StructField("max_overcount", LongType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def _topk(s: pd.Series) -> pd.Series:
        return pd.Series([ss.decode(bytes(b)).top_k(k) for b in s])

    return _topk(F.col(sketch_col))


# ---------------------------------------------------------------------------
# evaluation columns
# ---------------------------------------------------------------------------

def _hash_literals(df: DataFrame, items: Sequence) -> np.ndarray:
    """xxhash64 of literal items, computed BY SPARK so it matches the
    build-side hashing exactly."""
    spark = df.sparkSession
    rows = spark.range(1).select(
        *[F.xxhash64(F.lit(it)).alias(f"h{i}") for i, it in enumerate(items)]
    ).collect()[0]
    return np.array([rows[f"h{i}"] for i in range(len(items))], dtype=np.int64)


def cms_count_for_hash_col(
    sketch: str | Column = SKETCH_COL, hashed: str | Column = "h"
) -> Column:
    """CMS point estimate for a pre-hashed item column — fully plan-side
    (NO driver actions: pair the sketch with its items via a broadcast
    cross join and hash the items with codegen ``xxhash64`` in the same
    plan). Decodes the sketch per row, so intended for small
    sketch-x-items frames (the usual evaluation shape)."""

    @F.pandas_udf(LongType())
    def _q(sk: pd.Series, h: pd.Series) -> pd.Series:
        if len(sk) == 0:
            return pd.Series([], dtype="int64")
        cache: dict[bytes, object] = {}
        out = np.empty(len(sk), dtype=np.int64)
        hs = h.to_numpy()
        for i, b in enumerate(sk):
            bb = bytes(b)
            st = cache.get(bb)
            if st is None:
                st = cache[bb] = cms.decode(bb)
            out[i] = cms.query(st, hs[i : i + 1])[0]
        return pd.Series(out)

    s = F.col(sketch) if isinstance(sketch, str) else sketch
    c = F.col(hashed) if isinstance(hashed, str) else hashed
    return _q(s, c)


def cms_counts_col(df: DataFrame, items: Sequence, sketch_col: str = SKETCH_COL) -> Column:
    """array<long> of estimated counts for ``items`` (literals) per sketch."""
    hashes = _hash_literals(df, items)

    @F.pandas_udf(ArrayType(LongType()))
    def _q(s: pd.Series) -> pd.Series:
        return pd.Series([cms.query(cms.decode(b), hashes).tolist() for b in s])

    return _q(F.col(sketch_col))


def kll_quantiles_col(qs: Sequence[float], sketch_col: str = SKETCH_COL) -> Column:
    qarr = np.asarray(list(qs), dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _q(s: pd.Series) -> pd.Series:
        return pd.Series([kll.decode(b).quantile(qarr).tolist() for b in s])

    return _q(F.col(sketch_col))


def _tdigest_quantiles_of(buf: bytes, qarr: np.ndarray) -> np.ndarray:
    """Shared t-digest quantile evaluator body (Column helper + SQL
    registration route through this one function)."""
    return tdigest.decode(bytes(buf)).quantile(qarr)


def tdigest_quantiles_col(qs: Sequence[float], sketch_col: str = SKETCH_COL) -> Column:
    qarr = np.asarray(list(qs), dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _q(s: pd.Series) -> pd.Series:
        return pd.Series([_tdigest_quantiles_of(b, qarr).tolist() for b in s])

    return _q(F.col(sketch_col))


def bloom_filter_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    fpr: float = 0.01,
    expected_n: int = 1_000_000,
) -> DataFrame:
    """Join with a Bloom pre-filter: build a Bloom filter over the right
    side's keys (ONE aggregation pass — no extra count), drop left rows
    that cannot match BEFORE the join shuffle, then join exactly. With a
    selective right side this removes most of the shuffle I/O; false
    positives are eliminated by the exact join, false negatives don't
    exist for the retained-left-rows join types.

    ``how`` is restricted to join types where dropping non-matching LEFT
    rows early is semantics-preserving (inner / left_semi / right /
    cross); 'left'/'full'/'anti' must keep unmatched left rows, so the
    pre-filter would silently change the result — raise instead.

    ``expected_n`` sizes the filter without a counting pass (default 1M
    keys -> ~1.2MB at 1% FPR). If the right side is larger the FPR
    degrades gracefully: the pre-filter just drops fewer rows, the join
    stays exact. The filter bytes ship to executors via a Spark
    broadcast variable (one copy per executor, not per task).
    """
    allowed = {"inner", "left_semi", "leftsemi", "semi", "right", "rightouter", "cross"}
    if how.replace("_", "").lower() not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"bloom_filter_join(how={how!r}): pre-filtering the left side "
            "drops rows that 'left'/'full'/'anti' joins must retain; use a "
            "plain join for those types"
        )
    rows = bloom_sketch(right, on, expected_n=expected_n, fpr=fpr).collect()
    if not rows:
        # a right plan with ZERO partitions (empty parquet directory,
        # optimizer-folded empty LocalRelation) emits no partials — the
        # join result is empty for every allowed join type, but let the
        # exact join produce it with the correct schema
        return left.filter(F.lit(False)).join(right, on, how)
    pre = left.filter(
        bloom_might_contain_col(on, bytes(rows[0][SKETCH_COL]), spark=left.sparkSession)
    )
    return pre.join(right, on, how)


def bloom_might_contain_col(
    col: str | Column, sketch_bytes: bytes, spark=None
) -> Column:
    """Boolean membership column against a Bloom sketch. When ``spark``
    is given the bytes ship as a broadcast variable (deserialized once
    per executor); otherwise they're closure-captured (fine for KB-scale
    filters). Usable as a semi-join pre-filter:
    ``big.filter(bloom_might_contain_col("key", blm, spark))``."""
    from pyspark.sql.types import BooleanType

    if spark is not None:
        bc = spark.sparkContext.broadcast(sketch_bytes)
        cache: dict = {}

        @F.pandas_udf(BooleanType())
        def _contains(h: pd.Series) -> pd.Series:
            if "sk" not in cache:  # decode once per worker, not per batch
                cache["sk"] = bloom.decode(bc.value)
            state, k = cache["sk"]
            return pd.Series(bloom.contains(state, h.to_numpy(), k))

    else:
        state, k = bloom.decode(sketch_bytes)

        @F.pandas_udf(BooleanType())
        def _contains(h: pd.Series) -> pd.Series:
            return pd.Series(bloom.contains(state, h.to_numpy(), k))

    c = F.col(col) if isinstance(col, str) else col
    return _contains(F.xxhash64(c))
