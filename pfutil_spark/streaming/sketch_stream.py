"""Structured-Streaming stateful operators for the extension sketches.

Same design as hll_stream.streaming_distinct_with_state: the per-key
``GroupState`` IS a serialized mergeable sketch (constant-size
regardless of stream length), updated with the vectorized kernel each
micro-batch — the streaming operator is a corollary of the batch
zero/update/merge contract, not separate machinery.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_quantiles_with_state(
    stream_df: DataFrame,
    value: str,
    by: Sequence[str],
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    delta: int = 100,
) -> DataFrame:
    """Running per-key quantiles via ``applyInPandasWithState`` — the
    GroupState is a serialized t-digest (~delta centroids, constant
    bytes), folded with the vectorized k-space compress per micro-batch;
    emits the running quantile estimates per key. Output mode: update.

    The t-digest is the right streaming quantile state: mergeable (so
    replay/at-least-once delivery degrades accuracy, never correctness
    of the bound), tail-accurate (p99 latency dashboards), and bounded
    at ~16*delta bytes per key forever."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    import numpy as np
    import pandas as pd

    from pfutil_spark.kernel import tdigest

    by = list(by)
    qarr = np.asarray(list(qs), dtype=np.float64)
    out_schema = StructType(
        [stream_df.schema[c] for c in by]
        + [
            StructField("n", LongType(), False),
            StructField("quantiles", ArrayType(DoubleType()), False),
        ]
    )
    state_schema = StructType([StructField("sketch", BinaryType(), True)])

    def fn(key, pdfs, state: GroupState):
        td = (
            tdigest.decode(bytes(state.get[0]))
            if state.exists
            else tdigest.TDigest(delta)
        )
        for pdf in pdfs:
            vals = pdf[value].to_numpy(dtype=np.float64, na_value=np.nan)
            td.update(vals)
        state.update((td.encode(),))
        yield pd.DataFrame(
            [(*key, int(td.n), td.quantile(qarr).tolist())],
            columns=by + ["n", "quantiles"],
        )

    return stream_df.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_drift_with_state(
    stream_df: DataFrame,
    value: str,
    by: Sequence[str],
    reference: "bytes | dict",
    k: int = 200,
) -> DataFrame:
    """Running per-key distribution-drift monitor: the GroupState is a
    serialized KLL sketch of everything the key has streamed so far
    (O(k log log n) bytes forever); each micro-batch folds the new rows
    in and emits the two-sample KS statistic of the ACCUMULATED stream
    distribution against a REFERENCE sketch — e.g. last month's
    checkpointed ``kll_sketch`` output (operators/drift.py builds the
    same bytes). The emitted ``err_bound`` is sound for the estimate
    (kernel/kll.py::ks_distance), so an alert rule like ``ks_est -
    err_bound > 0.1`` never fires on sketch noise. Output mode: update.

    ``reference`` is either one encoded KLL for every key, or a dict of
    key -> bytes (single ``by`` column: the bare key value; composite:
    the tuple). Keys with no reference emit ks_est NULL (the NaN row
    marker crosses the Arrow boundary as SQL NULL) with err_bound inf
    rather than being dropped — a brand-new stratum IS a drift signal.
    KLL is the right drift state: mergeable (at-least-once replay keeps
    the bound sound), uniform rank error (the KS bound is its sum), and
    constant-size regardless of stream length.

    Scale note: the reference dict ships in the task closure — right
    for the intended dashboard-scale key counts (10^2-10^4 keys x O(k)
    bytes). For per-domain-scale references (10^6+ keys), monitor in
    micro-batch with ``foreachBatch`` + operators/drift.py::
    drift_against_reference(broadcast_reference=False) instead, which
    joins the reference as a DataFrame."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    import numpy as np
    import pandas as pd

    from pfutil_spark.kernel import kll

    by = list(by)
    if isinstance(reference, dict):
        ref_map = {
            (kk if isinstance(kk, tuple) else (kk,)): bytes(vv)
            for kk, vv in reference.items()
        }
    else:
        ref_map = None
        ref_bytes = bytes(reference)
    out_schema = StructType(
        [stream_df.schema[c] for c in by]
        + [
            StructField("n", LongType(), False),
            StructField("ks_est", DoubleType(), True),
            StructField("err_bound", DoubleType(), True),
        ]
    )
    state_schema = StructType([StructField("sketch", BinaryType(), True)])

    def fn(key, pdfs, state: GroupState):
        sk = (
            kll.decode(bytes(state.get[0])) if state.exists else kll.KllSketch(k)
        )
        for pdf in pdfs:
            sk.update(pdf[value].to_numpy(dtype=np.float64, na_value=np.nan))
        state.update((sk.encode(),))
        rb = ref_map.get(tuple(key)) if ref_map is not None else ref_bytes
        if rb is None:
            d, e = float("nan"), float("inf")
        else:
            d, e = kll.ks_distance(sk, kll.decode(rb))
        yield pd.DataFrame(
            [(*key, int(sk.n), d, e)], columns=by + ["n", "ks_est", "err_bound"]
        )

    return stream_df.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_topk_with_state(
    stream_df: DataFrame,
    value: str,
    by: Sequence[str],
    k: int = 10,
    m: int = 256,
) -> DataFrame:
    """Running per-key heavy hitters via ``applyInPandasWithState`` —
    the GroupState is a serialized SpaceSaving summary (≤ m entries,
    bounded bytes forever), updated with the vectorized
    factorize/bincount batch fold each micro-batch. Emits the running
    top-k values per key with their estimated counts and the guaranteed
    max overcount (theta). Output mode: update.

    SpaceSaving is the right streaming heavy-hitter state: single-pass,
    mergeable (Agarwal et al., PODS'12 — replay under at-least-once
    delivery widens theta, never undercounts), and every value whose
    true frequency exceeds n/m is GUARANTEED present in the summary."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    import pandas as pd

    from pfutil_spark.kernel import spacesaving

    by = list(by)
    out_schema = StructType(
        [stream_df.schema[c] for c in by]
        + [
            StructField("n", LongType(), False),
            StructField("top_values", ArrayType(StringType()), False),
            StructField("top_counts", ArrayType(LongType()), False),
            StructField("max_overcount", LongType(), False),
        ]
    )
    state_schema = StructType([StructField("sketch", BinaryType(), True)])

    def fn(key, pdfs, state: GroupState):
        ss = (
            spacesaving.decode(bytes(state.get[0]))
            if state.exists
            else spacesaving.SpaceSaving(m)
        )
        for pdf in pdfs:
            # object dtype: update_batch drops nulls at factorize and
            # coerces non-string keys to str (the fold's tie-break domain)
            ss.update_batch(pdf[value].to_numpy(dtype=object))
        state.update((ss.encode(),))
        top = ss.top_k(k)
        yield pd.DataFrame(
            [(
                *key,
                int(ss.n),
                [v for v, _, _ in top],
                [int(c) for _, c, _ in top],
                int(ss.theta),
            )],
            columns=by + ["n", "top_values", "top_counts", "max_overcount"],
        )

    return stream_df.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
