"""Pre-execution size estimation from sketches — join planning at scale.

On a 1000-executor cluster the most expensive mistake is launching a
shuffle join whose output explodes (a skewed key, an accidental
many-to-many). These helpers answer "how big would it be?" BEFORE the
join runs, from two tiny mergeable sketches each built in a single
map-side pass over its table (one CMS per side: one scan, no shuffle of
data rows — only the constant-size counter matrices move):

* equi-join output size |A ⋈_k B| = the inner product of the two key
  frequency vectors — estimated by the CMS row-min dot product
  (kernel/cms.py::inner_product; Cormode & Muthukrishnan J.Alg'05 §4.2:
  never undercounts, overcount <= eps*N_A*N_B w.p. >= 1 - exp(-depth));
* self-join size F2 = sum_v f(v)^2 — the classic skew statistic (AMS);
  a key is shuffle-safe when F2 is close to N (near-unique) and
  dangerous when F2 >> N (hot keys). Same estimator with A == B.

Both sketches must share (depth, width); the kernel hash family is a
pure function of the row index, so equal shapes imply aligned buckets.

No reference-repo counterpart (SURVEY.md §2.4 extension surface); the
sketch build reuses the shared aggregation plan (PLANS.md §7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from pfutil_spark.kernel import cms
from pfutil_spark.operators.sketch_agg import SKETCH_COL, cms_sketch


def cms_inner_product_col(a: str | Column, b: str | Column) -> Column:
    """struct<est:double, n_a:long, n_b:long> for a pair of CMS sketch
    columns: the join-size estimate plus both sides' exact row totals
    (any counter row sums to N — free from the sketch, no second scan).

    ``est`` is a double because at 10^12-row inputs the estimate's
    ceiling (F2 + eps*N_A*N_B) exceeds int64; at evaluation-frame
    magnitudes (< 2^53) the double is exact. Decodes per row — meant
    for the usual tiny one-row-per-pair evaluation frames."""
    out_t = StructType(
        [
            StructField("est", DoubleType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _ip(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        rows = []
        for ba, bb in zip(sa, sb):
            A, B = cms.decode(bytes(ba)), cms.decode(bytes(bb))
            rows.append((float(cms.inner_product(A, B)), cms.total(A), cms.total(B)))
        return pd.DataFrame(rows, columns=["est", "n_a", "n_b"])

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _ip(ca, cb)


def join_size_estimate(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame | None = None,
    key_b: str | None = None,
    depth: int = cms.DEFAULT_DEPTH,
    width: int = cms.DEFAULT_WIDTH,
) -> DataFrame:
    """One-row DataFrame estimating |df_a ⋈ df_b| on key equality
    (``df_b=None`` → self-join size / F2 of ``key_a``): columns
    ``est_join_rows`` (never an undercount), ``n_left``, ``n_right``,
    and ``overcount_bound`` = eps*N_A*N_B, the published w.p.
    ``1 - exp(-depth)`` ceiling on est - true.

    The plan: one map-side sketch pass per table (NULL keys excluded,
    as an equi-join would), a broadcast of two constant-size sketch
    rows, and a driver-free evaluation — nothing about the estimate
    touches a data-row shuffle. Lazy end to end."""
    sa = cms_sketch(df_a, key_a, by=(), depth=depth, width=width)
    if df_b is None:
        sb, key_b = sa, key_a
    else:
        if key_b is None:
            raise ValueError("key_b is required when df_b is given")
        sb = cms_sketch(df_b, key_b, by=(), depth=depth, width=width)
    pair = sa.select(F.col(SKETCH_COL).alias("__sa")).crossJoin(
        F.broadcast(sb.select(F.col(SKETCH_COL).alias("__sb")))
    )
    eps = cms.error_bound(depth, width)[0]
    r = pair.select(cms_inner_product_col("__sa", "__sb").alias("r")).select(
        F.col("r.est").alias("est_join_rows"),
        F.col("r.n_a").alias("n_left"),
        F.col("r.n_b").alias("n_right"),
    )
    return r.select(
        "*",
        (F.lit(eps) * F.col("n_left").cast("double") * F.col("n_right")).alias(
            "overcount_bound"
        ),
    )
