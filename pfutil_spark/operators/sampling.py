"""Deterministic content-keyed sampling for training-data pipelines.

Sampling by a cryptographic hash of a KEY instead of an RNG gives, at
100-TB scale, exactly the properties a training pipeline needs:

* **reproducible** — the same row set regardless of run, partitioning,
  executor count, or Spark version (no RNG, no seed-per-task drift);
* **referentially consistent** — sampling two tables on a shared key
  (customers and their orders on ``custkey``) keeps the join closed:
  a sampled order's customer is always sampled;
* **all-or-nothing per key** — keying by a dedup-cluster or document id
  keeps near-duplicate groups entirely in one split (no train/test
  leakage);
* **pure JVM** — the plan is ``sha2 + substring + string compare``
  inside whole-stage codegen; rows drop before any shuffle.

Mechanics: ``frac(x) = int(sha256(key '#' seed)[:15], 16) / 16^15`` is
uniform on [0,1); a rate-r sample keeps rows with frac < r. The
comparison happens directly on the fixed-width lowercase hex prefix
against a precomputed threshold string — lexicographic order on
fixed-width hex equals numeric order, so ANY engine with sha256 (DuckDB,
Trino, Snowflake) reproduces the exact row set; the driver oracle
exploits this for exact (not bound-boolean) parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_W = 15  # 60 bits of the sha256 hex prefix: ample rate resolution


def _threshold_hex(rate: float) -> str:
    """rate in [0,1] -> fixed-width lowercase hex threshold string."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate={rate}: must be in [0, 1]")
    return format(min(int(rate * 16**_HEX_W), 16**_HEX_W - 1), f"0{_HEX_W}x")


def hash_frac_hex_col(key: str | Column, seed: int = 0) -> Column:
    """The 15-hex-char uniform draw for ``key`` (string-compare it to
    ``_threshold_hex(rate)``). Null keys yield null (never sampled).

    Key columns should be string or integer: the draw hashes
    ``CAST(key AS STRING)``, and floating-point-to-string formatting is
    not guaranteed identical across engines (determinism WITHIN Spark
    holds for any type)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.sha2(F.concat(c.cast("string"), F.lit(f"#{seed}")), 256), 1, _HEX_W)


def sql_frac_expr(key_sql: str, seed: int = 0) -> str:
    """The ANSI/DuckDB mirror of :func:`hash_frac_hex_col` — for oracles
    and cross-engine reproduction of the exact sample.

    Concatenation is ``||`` (NULL-propagating, per the SQL standard) and
    NOT ``concat()``: DuckDB's concat IGNORES null arguments, so a null
    key would hash as just ``'#seed'`` and draw a real (possibly
    sampled) value, while the Spark side's null draw is never sampled."""
    return f"substr(sha256(CAST({key_sql} AS VARCHAR) || '#{seed}'), 1, {_HEX_W})"


def _keep_cond(frac: Column, rate: float) -> Column:
    """Keep-condition for a rate against a frac column. rate >= 1.0 keeps
    every NON-NULL key outright: the top threshold is clamped to
    16^15 - 1 and the compare is strict, so without the short-circuit a
    key whose 60-bit draw is exactly 0xfffffffffffffff would drop from a
    "keep everything" sample (2^-60 per key — real rows at 100-TB key
    counts). Null keys stay never-sampled either way."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate={rate}: must be in [0, 1]")
    if rate >= 1.0:
        return frac.isNotNull()
    return frac < F.lit(_threshold_hex(rate))


def hash_sample(
    df: DataFrame, key: str | Column, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed by ``key``. All rows
    sharing a key are kept or dropped together; the same (key, seed,
    rate) always selects the same keys — across tables too.
    ``rate=1.0`` is the identity on non-null keys."""
    return df.filter(_keep_cond(hash_frac_hex_col(key, seed), rate))


def hash_split_col(
    key: str | Column,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: int = 0,
) -> Column:
    """Split-name column assigning each key to exactly one split by
    cumulative hash ranges — disjoint, exhaustive (weights must sum to
    1), deterministic, leakage-free when keyed by a dedup-cluster id."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, need 1.0")
    frac = hash_frac_hex_col(key, seed)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        cond = frac < F.lit(_threshold_hex(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(weights[-1][0])
    return last if expr is None else expr.otherwise(last)


def sql_split_expr(
    key_sql: str,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: int = 0,
) -> str:
    """CASE-expression mirror of :func:`hash_split_col` for oracles."""
    frac = sql_frac_expr(key_sql, seed)
    parts, acc = [], 0.0
    for name, w in list(weights)[:-1]:
        acc += w
        parts.append(f"WHEN {frac} < '{_threshold_hex(acc)}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{weights[-1][0]}' END"


def geometric_mix_resample(
    df: DataFrame, key: str, strata: str, seed: int = 0
) -> DataFrame:
    """Deterministic temperature-style corpus rebalancing: per stratum
    (e.g. language) keep exactly ``k_s = ceil(sqrt(n_s * n_min))`` rows —
    the geometric mean of the stratum's own size and the smallest
    stratum's size. This is the alpha=0.5 point of the standard
    ``count^alpha`` temperature family used to flatten language mixes in
    pretraining data; alpha=0.5 specifically because every float op in
    ``k_s`` (int-product under 2^53, sqrt, ceil) is IEEE-correctly-rounded
    and therefore bit-identical on any engine — general alpha needs
    ``pow()``, whose last-ulp behavior is libm-specific, which would
    break exact cross-engine reproducibility of the selected row set.

    Within a stratum the kept rows are the ``k_s`` smallest sha256 draws
    (:func:`hash_frac_hex_col`; ties broken by key), so the selection is
    partition-independent, rerun-stable, and referentially consistent
    with :func:`hash_sample` / :func:`hash_split_col` draws at the same
    seed. Unlike a Bernoulli rate, the output size per stratum is EXACT.

    Plan: one column-pruned counting scan (groupBy strata + a broadcast
    1-row global min), then a rank window partitioned by strata over the
    main scan. With few strata each partition is one task — fine for the
    intended use (downsampling to a bounded mix you can afford to rank);
    when k_s is huge, pre-filter with ``hash_sample(df, key, rate)`` at a
    rate comfortably above ``k_s/n_s`` first and rank the survivors —
    same result as long as the pre-filter keeps >= k_s rows per stratum.

    Null keys draw null and sort last (explicitly — Spark's default is
    nulls-first, most other engines' is nulls-last), so they are only
    kept if a stratum is almost entirely null-keyed.
    """
    from pyspark.sql import Window

    s = F.col(strata)
    counts = df.groupBy(s.alias("__stratum")).agg(F.count(F.lit(1)).alias("__n_s"))
    n_min = counts.agg(F.min("__n_s").alias("__n_min"))
    k_s = F.ceil(
        F.sqrt(F.col("__n_s").cast("double") * F.col("__n_min"))
    ).alias("__k_s")
    plan = counts.crossJoin(F.broadcast(n_min)).select("__stratum", k_s)
    draw = hash_frac_hex_col(key, seed)
    w = Window.partitionBy(s).orderBy(
        draw.asc_nulls_last(), F.col(key).asc_nulls_last()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(plan), s.eqNullSafe(F.col("__stratum")))
        .filter(F.col("__rn") <= F.col("__k_s"))
        .drop("__stratum", "__k_s", "__rn")
    )


def sql_geometric_mix_expr(
    table: str,
    key_sql: str,
    strata_sql: str,
    seed: int = 0,
    key_alias: str = "key",
    strata_alias: str = "stratum",
) -> str:
    """ANSI/DuckDB mirror of :func:`geometric_mix_resample` — a full
    SELECT returning the kept ``(key, strata)`` rows (aliased
    ``key_alias``/``strata_alias``), for oracles and cross-engine
    reproduction of the exact row set."""
    frac = sql_frac_expr(key_sql, seed)
    return (
        f"WITH cnt AS (SELECT {strata_sql} AS stratum, count(*) AS n_s"
        f" FROM {table} GROUP BY {strata_sql}),"
        " m AS (SELECT min(n_s) AS n_min FROM cnt),"
        " k AS (SELECT stratum,"
        " CAST(ceil(sqrt(CAST(n_s AS DOUBLE) * (SELECT n_min FROM m))) AS BIGINT)"
        " AS k_s FROM cnt),"
        f" r AS (SELECT {key_sql} AS key, {strata_sql} AS stratum,"
        f" row_number() OVER (PARTITION BY {strata_sql}"
        f" ORDER BY {frac} ASC NULLS LAST, {key_sql} ASC NULLS LAST) AS rn"
        f" FROM {table})"
        f" SELECT r.key AS {key_alias}, r.stratum AS {strata_alias}"
        # IS NOT DISTINCT FROM: the Spark side joins quotas with
        # eqNullSafe, so a NULL stratum is a real stratum with its own
        # quota — a plain USING join would silently drop those rows
        " FROM r JOIN k ON r.stratum IS NOT DISTINCT FROM k.stratum"
        " WHERE rn <= k_s"
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str | Column,
    strata: str | Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced corpus
    downsampling: keep 100% of low-resource langs, 5% of English). One
    codegen'd CASE over the strata column — one scan, no shuffle."""
    s = F.col(strata) if isinstance(strata, str) else strata
    frac = hash_frac_hex_col(key, seed)
    cond: Column = _keep_cond(frac, default_rate)
    for name, r in sorted(rates.items()):  # deterministic plan
        cond = F.when(s == F.lit(name), _keep_cond(frac, r)).otherwise(cond)
    return df.filter(cond)
