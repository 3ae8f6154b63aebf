"""SQL-surface registration: expose the sketch evaluation functions to
``spark.sql`` so sketch tables (e.g. checkpointed parquet from
ResumableHllJob) are queryable in plain SQL:

    register_sql_functions(spark)
    spark.read.parquet(ckpt).createOrReplaceTempView("sketches")
    spark.sql("SELECT lang, pf_count(sketch) FROM sketches")
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
)

from pfutil_spark.kernel import hll


def register_sql_functions(spark: SparkSession) -> None:
    @F.pandas_udf(LongType())
    def pf_count(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        return pd.Series(hll.estimate_batch(hll.decode_many(list(s)), 4))

    @F.pandas_udf(LongType())
    def pf_count_v5(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        return pd.Series(hll.estimate_batch(hll.decode_many(list(s)), 5))

    @F.pandas_udf(BinaryType())
    def pf_dump(s: pd.Series) -> pd.Series:
        return pd.Series([hll.dump(r, 4) for r in hll.decode_many(list(s))])

    @F.pandas_udf(BinaryType())
    def pf_merge_pair(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for x, y in zip(a, b):  # per sketch pair
            out.append(
                hll.encode(np.maximum(hll.decode(bytes(x)), hll.decode(bytes(y))))
            )
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def pf_is_valid(s: pd.Series) -> pd.Series:
        return pd.Series([hll.is_valid_hll(bytes(b)) for b in s])

    spark.udf.register("pf_count", pf_count)
    spark.udf.register("pf_count_v5", pf_count_v5)
    spark.udf.register("pf_dump", pf_dump)
    spark.udf.register("pf_merge_pair", pf_merge_pair)
    spark.udf.register("pf_is_valid", pf_is_valid)

    # extension-sketch evaluators (r4): checkpointed KMV / t-digest /
    # CMS / SpaceSaving tables become SQL-queryable the same way.
    # KMV / t-digest route through the SAME evaluator bodies as the
    # Column helpers (sketch_agg._kmv_estimate_series /
    # _tdigest_quantiles_of) so the two surfaces cannot diverge.
    from pfutil_spark.kernel import cms, spacesaving
    from pfutil_spark.operators.sketch_agg import (
        _kmv_estimate_series,
        _tdigest_quantiles_of,
    )

    kmv_estimate = F.pandas_udf(_kmv_estimate_series, DoubleType())

    @F.pandas_udf(DoubleType())
    def tdigest_quantile(s: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series(
            [float(_tdigest_quantiles_of(b, float(qq))) for b, qq in zip(s, q)],
            dtype="float64",
        )

    @F.pandas_udf(LongType())
    def cms_total(s: pd.Series) -> pd.Series:
        return pd.Series(
            [int(cms.total(cms.decode(bytes(b)))) for b in s], dtype="int64"
        )

    @F.pandas_udf(StringType())
    def ss_topk_json(s: pd.Series, k: pd.Series) -> pd.Series:
        import json

        return pd.Series(
            [
                json.dumps(spacesaving.decode(bytes(b)).top_k(int(kk)))
                for b, kk in zip(s, k)
            ]
        )

    # pair evaluator = kernel/kll.py::ks_distance; the Column surface
    # (operators/drift.py::ks_drift_col) runs the batch-vectorized
    # ks_pairs_flat instead, whose BIT parity with ks_distance is
    # regression-gated (tests/test_drift.py::TestBatchDecodedEvaluators)
    # — edit either only together with that gate
    from pfutil_spark.kernel import kll as _kll

    def _ks_series(sa: pd.Series, sb: pd.Series, part: int) -> pd.Series:
        # NULL sketches (a stratum on one side of a snapshot outer
        # join) yield NULL, never a job-failing TypeError
        return pd.Series(
            [
                (
                    None
                    if a is None or b is None
                    else _kll.ks_distance(
                        _kll.decode(bytes(a)), _kll.decode(bytes(b))
                    )[part]
                )
                for a, b in zip(sa, sb)
            ],
            dtype="float64",
        )

    @F.pandas_udf(DoubleType())
    def kll_ks(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return _ks_series(sa, sb, 0)

    @F.pandas_udf(DoubleType())
    def kll_ks_bound(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return _ks_series(sa, sb, 1)

    from pfutil_spark.operators.drift import PSI_DEFAULT_BINS, psi_pair_series

    @F.pandas_udf(DoubleType())
    def kll_psi(sa: pd.Series, sb: pd.Series) -> pd.Series:
        # the SAME evaluator body as psi_drift_col (shared import)
        return psi_pair_series(sa, sb, PSI_DEFAULT_BINS)

    spark.udf.register("kmv_estimate", kmv_estimate)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("cms_total", cms_total)
    spark.udf.register("ss_topk_json", ss_topk_json)
    spark.udf.register("kll_ks", kll_ks)
    spark.udf.register("kll_ks_bound", kll_ks_bound)
    spark.udf.register("kll_psi", kll_psi)
