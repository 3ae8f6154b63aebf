"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — pure Spark expressions (zip_with/aggregate
  dot products, JVM codegen; Catalyst prunes + pushes down), the exact
  baseline
* random-hyperplane LSH (Charikar 2002) — sign-bit bucket signatures for
  the scale path: candidates come from an equi-join on bucket id, then
  exact cosine re-ranks inside buckets

Hyperplanes are generated from a fixed seed, so bucket assignment is
deterministic and reproducible across runs/partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from pfutil_spark.operators._cache import CacheScope


def cosine_to_query_col(emb: str | Column, query_vec: list[float]) -> Column:
    """cosine(embedding, literal query) as a pure Spark expression."""
    e = F.col(emb) if isinstance(emb, str) else emb
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(e, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    qn = float(np.sqrt(np.sum(np.square(np.asarray(query_vec, dtype=np.float64)))))
    return dot / (norm_e * F.lit(qn))


def cosine_topk(
    df: DataFrame, emb: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine to a query vector (the baseline;
    fully parallel scan + a k-row ordered take)."""
    return (
        df.select(id_col, cosine_to_query_col(emb, query_vec).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(emb: str | Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature (sign bits packed into a long) — the
    LSH bucket id. Vectorized pandas UDF: one (batch x dim) @ (dim x p)
    matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed).T  # (dim, p)

    @F.pandas_udf(LongType())
    def _bucket(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(s.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (mat @ planes) > 0  # (n, p)
        weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
        return pd.Series(signs @ weights)

    e = F.col(emb) if isinstance(emb, str) else emb
    return _bucket(e)


def ann_topk_lsh(
    df: DataFrame, emb: str, id_col: str, query_vec: list[float],
    k: int = 10, n_planes: int = 8, seed: int = 42, n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane tables; in
    each, candidates are the query's bucket plus all Hamming-distance-1
    buckets (multi-probe); exact cosine re-rank over the union. Candidate
    set ~ n_tables * (p+1) * n / 2^p instead of n."""
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    pred = None
    bucketed = df
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qsig = int(
            ((planes @ q) > 0).astype(np.int64) @ (1 << np.arange(n_planes, dtype=np.int64))
        )
        probes = [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]
        bucketed = bucketed.withColumn(
            f"__bucket{t}", lsh_bucket_col(emb, dim, n_planes, seed + t)
        )
        clause = F.col(f"__bucket{t}").isin(probes)
        pred = clause if pred is None else (pred | clause)
    cand = bucketed.filter(pred)
    return cosine_topk(cand, emb, id_col, query_vec, k)


def _kmeans_fit(sample: np.ndarray, n_lists: int, seed: int = 42, iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means (k-means++ init) on a driver-side
    sample — the standard way to train an IVF coarse quantizer; the
    clustering itself never needs the full table."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(n_lists, n)
    # k-means++ seeding
    centroids = [sample[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((sample[:, None, :] - np.stack(centroids)[None, :, :]) ** 2).sum(-1), axis=1
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(sample[rng.choice(n, p=p)])
    c = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmin(((sample[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c


def ivf_assign_col(emb: str | Column, centroids: np.ndarray) -> Column:
    """Inverted-list id: index of the nearest coarse centroid. Vectorized
    pandas UDF — one matmul per Arrow batch."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    c_norm2 = (c * c).sum(axis=1)

    @F.pandas_udf(LongType())
    def _assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(s.to_numpy()).astype(np.float64)
        # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c)
        scores = c_norm2[None, :] - 2.0 * (mat @ c.T)
        return pd.Series(np.argmin(scores, axis=1).astype(np.int64))

    e = F.col(emb) if isinstance(emb, str) else emb
    return _assign(e)


def ivf_build(
    df: DataFrame, emb: str, n_lists: int = 16,
    sample_size: int = 4096, seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF index: train the coarse quantizer on a sample, add the
    ``__ivf_list`` bucket column (at scale: write this table partitioned
    by list id so probes prune partitions). Returns (indexed df,
    centroids)."""
    # deterministic, partition-independent sample: hash-ordered take
    # (TakeOrdered — no full sort materialization)
    sample_rows = (
        df.select(emb)
        .orderBy(F.xxhash64(F.col(emb)).asc())
        .limit(sample_size)
        .collect()
    )
    sample = np.vstack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
    centroids = _kmeans_fit(sample, n_lists, seed)
    return df.withColumn("__ivf_list", ivf_assign_col(emb, centroids)), centroids


def ivf_write(indexed: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Persist an IVF index: the vector table written PARTITIONED BY the
    inverted-list id (so a probe prunes whole partitions at the source —
    the scan reads nprobe/n_lists of the data, verified by the
    PartitionFilters plan gate in tests/test_text_ops.py::TestIVF), plus
    the trained centroids as a tiny sidecar table."""
    spark = indexed.sparkSession
    indexed.write.mode("overwrite").partitionBy("__ivf_list").parquet(
        f"{path}/vectors"
    )
    cent_rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        cent_rows, "list_id INT, centroid ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_read(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load a persisted IVF index -> (indexed df, centroids). The df's
    ``__ivf_list`` is a partition column, so ``ivf_topk``'s probe filter
    becomes a partition-pruning predicate, never a full scan."""
    vectors = spark.read.parquet(f"{path}/vectors")
    cent = (
        spark.read.parquet(f"{path}/centroids")
        .orderBy("list_id")
        .collect()
    )
    centroids = np.array([r["centroid"] for r in cent], dtype=np.float64)
    return vectors, centroids


def ivf_topk(
    indexed: DataFrame, centroids: np.ndarray, emb: str, id_col: str,
    query_vec: list[float], k: int = 10, nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest inverted lists, exact
    cosine re-rank inside — candidate set ~ nprobe/n_lists of the table,
    and with list-partitioned storage the scan prunes at the source."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[:nprobe]]
    cand = indexed.filter(F.col("__ivf_list").isin(probes))
    return cosine_topk(cand, emb, id_col, query_vec, k)


def all_pairs_above(
    df: DataFrame, emb: str, id_col: str,
    min_cosine: float = 0.95, n_planes: int = 12, seed: int = 42, dim: int | None = None,
    cache: CacheScope | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH bucket equi-join (never a cross
    join) -> exact cosine filter at ``min_cosine``. The bucketed frame is
    persisted (both join sides read it); pass ``cache=CacheScope()`` and
    release after the action, or call ``release_cached(result)``."""
    if dim is None:
        dim = _infer_dim(df, emb)
    scope = cache if cache is not None else CacheScope()
    bucketed = scope.persist(df.select(
        F.col(id_col), F.col(emb), lsh_bucket_col(emb, dim, n_planes, seed).alias("__b")
    ))
    l = bucketed.alias("l")
    r = bucketed.alias("r")
    pairs = l.join(
        r,
        (F.col("l.__b") == F.col("r.__b"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    out = (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            _pair_cosine(f"l.{emb}", f"r.{emb}").alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
        .distinct()
    )
    if cache is None:
        out._pfutil_cache_scope = scope
    return out


# ---------------------------------------------------------------------------
# table-vs-table k-NN join (r5): for EVERY row of a query table, the k
# nearest base rows by cosine — the batched retrieval / semantic-dedup
# primitive (cosine_topk answers one driver-side vector; this answers a
# DataFrame of them).
# ---------------------------------------------------------------------------

def _infer_dim(df: DataFrame, emb: str) -> int:
    """Embedding dimensionality from the first row (an eager tiny job
    at construction time — pass ``dim=`` to stay fully lazy). Raises a
    clear error on an empty frame / NULL embedding instead of the
    opaque ``'NoneType' is not subscriptable``."""
    row = df.select(emb).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer embedding dim from {emb!r} (empty frame or "
            "NULL first embedding); pass dim= explicitly"
        )
    return len(row[0])


def _pair_cosine(qv: str, bv: str) -> Column:
    """Exact cosine between two array columns: sequential left-fold dot
    and norms (deterministic float order — array order, both engines)."""
    dot = F.aggregate(
        F.zip_with(
            F.col(qv), F.col(bv), lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    return dot / (norm(qv) * norm(bv))


def knn_join(
    base: DataFrame,
    queries: DataFrame,
    emb: str = "embedding",
    base_id: str = "vec_id",
    query_id: str = "vec_id",
    k: int = 10,
    exclude_same_id: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """EXACT k-NN join: for each query row, the ``k`` highest-cosine
    base rows. Output ``(query_id, rank, base_id, cosine)`` with
    ``rank`` 1-based over (cosine desc, base_id asc) — a total order,
    deterministic under ties. ``exclude_same_id`` drops base rows whose
    id equals the query's (self-match suppression when both frames
    share an id space).

    Plan: with ``broadcast_queries`` (the probe-batch regime — Q small,
    base huge) the cross join is a BroadcastNestedLoopJoin: ONE
    distributed scan of base, cosines computed map-side in whole-stage
    codegen, then one shuffle by query_id for the top-k window over
    |Q|x|B| candidate rows. Cost is inherently |Q|x|B| — this is the
    exact BASELINE; use :func:`knn_join_lsh` when Q is corpus-sized."""
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(emb).alias("__pf_qv")
    )
    b = base.select(
        F.col(base_id).alias("base_id"), F.col(emb).alias("__pf_bv")
    )
    joined = b.crossJoin(F.broadcast(q) if broadcast_queries else q)
    if exclude_same_id:
        joined = joined.filter(F.col("query_id") != F.col("base_id"))
    scored = joined.select(
        "query_id",
        "base_id",
        _pair_cosine("__pf_qv", "__pf_bv").alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("base_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "base_id", "cosine")
    )


def knn_join_lsh(
    base: DataFrame,
    queries: DataFrame,
    emb: str = "embedding",
    base_id: str = "vec_id",
    query_id: str = "vec_id",
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
    n_tables: int = 4,
    multi_probe: bool = True,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Approximate k-NN join at corpus scale: ``n_tables`` independent
    hyperplane tables bucket BOTH sides; the query side probes its own
    bucket plus (with ``multi_probe``) every Hamming-distance-1 bucket;
    candidates come from a bucket EQUI-join (never a cross join), are
    deduped across tables, and the survivors re-rank by exact cosine
    with the same (cosine desc, base_id asc) total order as
    :func:`knn_join`. Same output schema. Candidate count per query
    ~ n_tables * (p+1) * |B| / 2^p instead of |B|.

    Plan: one union-of-tables pass per side (map-only: the bucket
    signatures are the library's Arrow-batched pandas-UDF
    ``lsh_bucket_col``, vectorized numpy per batch — not zero-Python,
    but never per-row Python), one shuffle equi-join on
    (table, bucket), a distinct on (query_id, base_id), two id-joins
    back to the vectors, one top-k window whose cosine re-rank is pure
    codegen."""
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    if dim is None:
        dim = _infer_dim(base, emb)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(emb).alias("__pf_qv")
    )
    b = base.select(
        F.col(base_id).alias("base_id"), F.col(emb).alias("__pf_bv")
    )
    b_sides, q_sides = [], []
    for t in range(n_tables):
        bucket = lsh_bucket_col("__pf_bv", dim, n_planes, seed + t)
        b_sides.append(
            b.select("base_id", F.lit(t).alias("__pf_t"), bucket.alias("__pf_bkt"))
        )
        qsig = lsh_bucket_col("__pf_qv", dim, n_planes, seed + t)
        probes = [qsig]
        if multi_probe:
            probes += [
                qsig.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
            ]
        q_sides.append(
            q.select(
                "query_id",
                F.lit(t).alias("__pf_t"),
                F.explode(F.array(*probes)).alias("__pf_bkt"),
            )
        )
    from functools import reduce

    b_all = reduce(DataFrame.unionByName, b_sides)
    q_all = reduce(DataFrame.unionByName, q_sides)
    cand = (
        q_all.join(b_all, ["__pf_t", "__pf_bkt"])
        .select("query_id", "base_id")
        .distinct()
    )
    if exclude_same_id:
        cand = cand.filter(F.col("query_id") != F.col("base_id"))
    scored = (
        cand.join(q, "query_id")
        .join(b, "base_id")
        .select(
            "query_id",
            "base_id",
            _pair_cosine("__pf_qv", "__pf_bv").alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("base_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "base_id", "cosine")
    )
