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
    kept if a stratum is almost entirely null-keyed. ``key`` must be
    unique per row (see :func:`_rank_window`).
    """
    s = F.col(strata)
    counts = df.groupBy(s.alias("__stratum")).agg(F.count(F.lit(1)).alias("__n_s"))
    n_min = counts.agg(F.min("__n_s").alias("__n_min"))
    k_s = F.ceil(
        F.sqrt(F.col("__n_s").cast("double") * F.col("__n_min"))
    ).alias("__k_s")
    plan = counts.crossJoin(F.broadcast(n_min)).select("__stratum", k_s)
    return (
        df.withColumn("__rn", F.row_number().over(_rank_window(key, s, seed)))
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


def _rank_window(key: str, group: str | Column, seed: int):
    """The shared deterministic per-group ranking: smallest sha256 draws
    first, ties to the smallest key. Null keys draw null and sort LAST
    explicitly (Spark defaults nulls-first; most other engines default
    nulls-last — the asc_nulls_last makes the row set engine-portable).
    ``key`` must be UNIQUE per row within a group: duplicate keys tie on
    (draw, key) and row_number breaks the tie arbitrarily, which makes
    WHICH physical row ranks first partition-dependent (every caller's
    determinism guarantee inherits this requirement)."""
    from pyspark.sql import Window

    g = F.col(group) if isinstance(group, str) else group
    return Window.partitionBy(g).orderBy(
        hash_frac_hex_col(key, seed).asc_nulls_last(),
        F.col(key).asc_nulls_last(),
    )


def cap_per_group(
    df: DataFrame, key: str, group: str, cap: int, seed: int = 0
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group`` — the per-domain/per-source
    document cap of web-corpus curation (a single crawl domain must not
    dominate the training mix). Selection is the ``cap`` smallest sha256
    draws of ``key`` per group: deterministic, partition-independent, and
    referentially consistent with :func:`hash_sample` draws at the same
    seed, so a capped corpus stays a SUBSET of any same-seed sample.

    Plan: one rank window partitioned by ``group`` over one scan — no
    joins, no Python. Group sizes bound the window task; a pathological
    hot group (one domain = half the corpus) should be pre-filtered with
    ``hash_sample`` at a rate comfortably above ``cap/n_group`` first,
    same as :func:`geometric_mix_resample`'s huge-``k_s`` note (a
    pre-filter keeping >= cap rows per group leaves the result
    identical — the cap selects the globally smallest draws, which the
    draw-ordered pre-filter preserves). ``key`` must be unique per row
    (see :func:`_rank_window`)."""
    if cap < 0:
        raise ValueError(f"cap={cap}: must be >= 0")
    return (
        df.withColumn("__pf_rn", F.row_number().over(_rank_window(key, group, seed)))
        .filter(F.col("__pf_rn") <= F.lit(cap))
        .drop("__pf_rn")
    )


def sql_cap_select(
    table: str,
    key_sql: str,
    group_sql: str,
    cap: int,
    seed: int = 0,
    key_alias: str = "key",
    group_alias: str = "grp",
) -> str:
    """ANSI/DuckDB mirror of :func:`cap_per_group` — a full SELECT of the
    kept ``(key, group)`` rows, for oracles and cross-engine reproduction
    of the exact row set."""
    frac = sql_frac_expr(key_sql, seed)
    return (
        f"SELECT {key_sql} AS {key_alias}, {group_sql} AS {group_alias}"
        f" FROM (SELECT *, row_number() OVER (PARTITION BY {group_sql}"
        f" ORDER BY {frac} ASC NULLS LAST, {key_sql} ASC NULLS LAST) AS __rn"
        f" FROM {table}) WHERE __rn <= {int(cap)}"
    )


def mixture_resample(
    df: DataFrame,
    key: str,
    source: str,
    weights: dict[str, int],
    total: int | None = None,
    total_factor: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic multi-source mixture with epoch upsampling — the
    dataset-mixing step of large-scale pretraining (per-source weights
    with repetition/epoch factors, a la The Pile / LLaMA mixtures).

    Per source ``s`` with integer weight ``w_s`` the target row count is
    ``t_s = floor(T * w_s / W)`` where ``W = sum(weights)`` and the
    budget ``T`` is either the explicit ``total`` or ``total_factor``
    times the weighted corpus size (rows of sources present in
    ``weights``). A source with ``n_s`` rows emits every row
    ``t_s div n_s`` times (full epochs) plus one extra epoch for the
    ``t_s mod n_s`` rows with the smallest sha256 draws — so the output
    has EXACTLY ``t_s`` rows per source, oversampled sources repeat
    whole rows with an ``epoch`` counter (0-based), and undersampled
    sources keep their smallest-draw subset. Sources absent from
    ``weights`` (including NULL sources) are dropped.

    Weights are INTEGERS on purpose: every arithmetic op in the plan
    (bigint product, ``div``, ``mod``) is exact on any engine, so the
    selected row set — not just its size — reproduces bit-identically
    cross-engine (the same reasoning that pins
    :func:`geometric_mix_resample` to alpha=0.5). Double division would
    round past 2^53 at 10^12-row budgets; ``div`` never does.

    Plan: unweighted sources are filtered out BEFORE the rank window
    (their rows can never reach the output, and the window is
    partitioned by source so dropping whole sources leaves every rank
    unchanged); then one counting scan (groupBy source), a broadcast
    join against the tiny weights/quota table, one rank window per
    source over the main scan, and a pure-JVM
    ``explode(sequence(0, epochs-1))`` — no Python anywhere; the explode
    amplifies AFTER the filter, so pre-explode data moved is at most one
    row per kept row. The per-source rank sort is bounded by ``n_s``
    (the window only decides which ``t_s mod n_s`` rows get the EXTRA
    epoch — full epochs are rank-independent). Do NOT naively pre-filter
    the input with ``hash_sample`` to shrink that sort: unlike
    :func:`geometric_mix_resample`, the quotas here are computed FROM
    the input's per-source counts, so a pre-filter changes ``n_s`` (and,
    in the ``total_factor`` form, ``T``) and therefore the epoch
    structure itself — a scale-out of the remainder selection must keep
    the counting scan on the full table. ``key`` must be unique per row
    (see :func:`_rank_window`).
    """
    if (total is None) == (total_factor is None):
        raise ValueError("pass exactly one of total / total_factor")
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if not isinstance(w, int) or isinstance(w, bool) or w <= 0:
            raise ValueError(
                f"weights[{s!r}]={w!r}: weights must be positive ints "
                "(integer arithmetic is what makes the row set exact "
                "cross-engine)"
            )
    # strict int checks (bool is an int subclass; floats would silently
    # TRUNCATE — total_factor=0.5 must not become a 0 budget)
    if total is not None and (
        not isinstance(total, int) or isinstance(total, bool) or total < 0
    ):
        raise ValueError(f"total={total!r}: must be an int >= 0")
    if total_factor is not None and (
        not isinstance(total_factor, int)
        or isinstance(total_factor, bool)
        or total_factor <= 0
    ):
        raise ValueError(f"total_factor={total_factor!r}: must be an int >= 1")
    # the quota join coerces keys through str() — colliding keys (e.g.
    # {1: 2, '1': 3}) would fan the join out and silently DUPLICATE
    # every output row of that source
    if len({str(s) for s in weights}) != len(weights):
        raise ValueError(
            "weights keys collide after str() coercion: "
            f"{sorted(map(str, weights))}"
        )
    big_w = sum(weights.values())
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted((str(s), int(w)) for s, w in weights.items()),
        "__pf_src string, __pf_w long",
    )
    # drop unweighted sources BEFORE the window: their rows cannot reach
    # the output, and the window partitions by source, so per-source
    # ranks are identical with or without them. The cast matches the
    # quota join's string coercion exactly (NULL sources drop here too).
    df = df.filter(
        F.col(source).cast("string").isin([str(s) for s in weights])
    )
    counts = (
        df.groupBy(F.col(source).alias("__pf_src"))
        .agg(F.count(F.lit(1)).alias("__pf_n_s"))
        .join(F.broadcast(wdf), "__pf_src")
    )
    if total is not None:
        counts = counts.withColumn("__pf_t", F.lit(int(total)).cast("long"))
    else:
        n_tot = counts.agg(
            (F.sum("__pf_n_s") * F.lit(int(total_factor))).alias("__pf_t")
        )
        counts = counts.crossJoin(F.broadcast(n_tot))
    plan = counts.select(
        "__pf_src",
        F.expr(f"__pf_t * __pf_w div {big_w}").alias("__pf_t_s"),
        "__pf_n_s",
    ).select(
        "__pf_src",
        F.expr("__pf_t_s div __pf_n_s").alias("__pf_full"),
        (F.col("__pf_t_s") % F.col("__pf_n_s")).alias("__pf_rem"),
    )
    epochs = F.col("__pf_full") + F.when(
        F.col("__pf_rn") <= F.col("__pf_rem"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__pf_rn", F.row_number().over(_rank_window(key, source, seed)))
        .join(F.broadcast(plan), F.col(source) == F.col("__pf_src"))
        .withColumn("__pf_ep", epochs)
        .filter(F.col("__pf_ep") >= 1)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__pf_ep") - 1)),
        )
        .drop("__pf_src", "__pf_full", "__pf_rem", "__pf_rn", "__pf_ep")
    )


def sql_mixture_select(
    table: str,
    key_sql: str,
    source_sql: str,
    weights: dict[str, int],
    total: int | None = None,
    total_factor: int | None = None,
    seed: int = 0,
    key_alias: str = "key",
    source_alias: str = "source",
) -> str:
    """ANSI/DuckDB mirror of :func:`mixture_resample` — a full SELECT of
    the output ``(key, source, epoch)`` rows, for oracles and
    cross-engine reproduction of the exact mixture (epochs included)."""
    if (total is None) == (total_factor is None):
        raise ValueError("pass exactly one of total / total_factor")
    big_w = sum(weights.values())
    vals = ", ".join(
        # double embedded quotes: a source like "o'reilly" must stay
        # representable in the mirror (the Spark side handles it fine)
        "('{}', {})".format(str(s).replace("'", "''"), int(w))
        for s, w in sorted(weights.items())
    )
    t_expr = (
        str(int(total))
        if total is not None
        else f"(SELECT sum(n_s) * {int(total_factor)} FROM base)"
    )
    frac = sql_frac_expr(key_sql, seed)
    return (
        f"WITH w(src, wt) AS (VALUES {vals}),"
        f" cnt AS (SELECT {source_sql} AS src, count(*) AS n_s"
        f" FROM {table} GROUP BY {source_sql}),"
        " base AS (SELECT cnt.src, cnt.n_s, w.wt FROM cnt JOIN w USING (src)),"
        f" plan AS (SELECT src, n_s, ({t_expr} * wt) // {big_w} AS t_s FROM base),"
        " p2 AS (SELECT src, t_s // n_s AS fl, t_s % n_s AS rem FROM plan),"
        f" r AS (SELECT {key_sql} AS k, {source_sql} AS src,"
        f" row_number() OVER (PARTITION BY {source_sql}"
        f" ORDER BY {frac} ASC NULLS LAST, {key_sql} ASC NULLS LAST) AS rn"
        f" FROM {table}),"
        " e AS (SELECT r.k, r.src,"
        # CAST to BIGINT: DuckDB's integer aggregates/products promote to
        # HUGEINT, which range() rejects (and which stringifies as a
        # float in the driver compare — the NOTES r1 lesson)
        " CAST(fl + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT) AS ep"
        " FROM r JOIN p2 USING (src))"
        f" SELECT k AS {key_alias}, src AS {source_alias},"
        " unnest(range(ep)) AS epoch FROM e"
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


def mixture_token_plan(
    df: DataFrame,
    source: str,
    weights: dict[str, int],
    total_tokens: int,
    text: str = "text",
) -> DataFrame:
    """The token-budget mixing PLAN: before launching a
    :func:`mixture_resample`-style job, the per-source table a human
    signs off on — corpus inventory (docs, whitespace tokens) against
    the integer-weight targets ``t_s = floor(T * w_s / W)`` and the
    epoch structure ``(t_s div n_tokens_s)`` full passes plus
    ``(t_s mod n_tokens_s)`` remainder tokens.

    Columns: ``(source, n_docs, n_tokens, weight, target_tokens,
    epochs_full, extra_tokens)``. Every weighted source appears even
    with zero corpus presence (n_docs/n_tokens 0, epoch columns NULL —
    you cannot epoch an empty source; that row is the "you asked for
    data you don't have" signal). All arithmetic is bigint
    product/``div``/``mod`` — exact past 2^53, same reasoning as
    :func:`mixture_resample` — so the plan matches what the resample
    would actually emit on any engine.

    Plan shape: one counting scan (map-side-combined groupBy source,
    pre-filtered to weighted sources) joined against the tiny literal
    weight table; everything downstream is weights-sized."""
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if not isinstance(w, int) or isinstance(w, bool) or w <= 0:
            raise ValueError(
                f"weights[{s!r}]={w!r}: weights must be positive ints"
            )
    if not isinstance(total_tokens, int) or isinstance(total_tokens, bool) \
            or total_tokens < 0:
        raise ValueError(f"total_tokens={total_tokens!r}: must be int >= 0")
    if len({str(s) for s in weights}) != len(weights):
        raise ValueError(
            "weights keys collide after str() coercion: "
            f"{sorted(map(str, weights))}"
        )
    from pfutil_spark.functions.text import token_count_col

    big_w = sum(weights.values())
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted((str(s), int(w)) for s, w in weights.items()),
        "source string, weight long",
    )
    counts = (
        df.filter(
            F.col(source).cast("string").isin([str(s) for s in weights])
        )
        .groupBy(F.col(source).cast("string").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(token_count_col(text), F.lit(0)))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    j = wdf.join(counts, "source", "left").select(
        "source",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "weight",
        F.expr(
            f"(CAST({int(total_tokens)} AS BIGINT) * weight)"
            f" div CAST({int(big_w)} AS BIGINT)"
        ).alias("target_tokens"),
    )
    # explicit >0 guard: under ANSI mode div/mod by zero RAISE; the
    # zero-presence row must plan to NULL, not crash the job
    # (j.n_tokens is already coalesced non-null above)
    has = F.col("n_tokens") > 0
    return j.select(
        "*",
        F.when(has, F.expr("target_tokens div n_tokens")).alias(
            "epochs_full"
        ),
        F.when(has, F.expr("target_tokens % n_tokens")).alias(
            "extra_tokens"
        ),
    )
