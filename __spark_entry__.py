"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Redis-wire-compatible HLL
distinct-content-sha256 per lang + global PFMERGE) on sf0.001.
``queries()`` exposes exact relational queries (DuckDB-oracled) plus the
sketch operators (rows-only driver check; their correctness gates are the
golden-fixture and error-bound pytest suites — see tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make `import pfutil_spark` work no matter how this module was loaded
# (path import, different cwd) and propagate to python workers
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (
    _ROOT + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _ROOT
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pfutil_spark.operators import sampling as _sampling


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Distinct content-sha256 per lang (HLL v4, Redis-PFCOUNT-identical)
    + global PFMERGE row, on /root/testdata/sf0.001."""
    from pfutil_spark.operators import pf_count_col, pf_merge, pf_partial

    docs = _t(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    partials = pf_partial(docs, "content_sha", by=("lang",), version=4)
    # localCheckpoint: the per-lang sketches feed BOTH the per-lang counts
    # and the global PFMERGE — materialize once instead of recomputing the
    # whole upstream for each union branch
    per_lang = pf_merge(partials, by=("lang",)).localCheckpoint()
    global_merge = pf_merge(per_lang.select("sketch")).withColumn("lang", F.lit("*"))
    all_sketches = per_lang.unionByName(global_merge.select("lang", "sketch"))
    return all_sketches.select(
        "lang", pf_count_col("sketch", 4).alias("estimate")
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_sha256_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row invariant (BASELINE.json:input_hint): sha2(text, 256)
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha")
    )


def _q_exact_distinct_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct(F.sha2(F.col("text"), 256)).alias("exact_distinct"),
        )
    )


def _q_events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


def _q_orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    # r6 rewrite (same result rows/schema, gated by the shared oracle):
    # pre-aggregate orders by o_custkey FIRST, so the broadcast join
    # probes ~|custkeys| pre-aggregated rows instead of every order row,
    # and the per-segment distinct runs over already-unique custkeys.
    # Decimal partial sums re-summed exactly (decimal addition is
    # associative); final cast to double sees the same exact value, so
    # results are bit-identical. Measured at sf1.0: 1.93s -> 1.45s.
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("__pf_cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__pf_sum"),
    )
    return (
        per_cust.join(F.broadcast(customer), per_cust.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__pf_cnt").alias("order_cnt"),
            F.sum("__pf_sum").cast("double").alias("total_price"),
            F.countDistinct("o_custkey").alias("distinct_custs"),
        )
    )


def _q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1-shaped; decimal-exact sums cast to double for oracle hashing.
    # The shipdate column is timestamp_ntz; an ntz literal keeps the
    # comparison tz-free (no session-conf mutation — r2 ADVICE).
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, date filters, grouped revenue.
    Date columns are timestamp_ntz; ntz literals + date_format-on-ntz are
    tz-free, so no session timezone mutation is needed."""
    cst = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cst), orders.o_custkey == cst.c_custkey)
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
            F.round("revenue", 4).alias("revenue"),
        )
    )


def _q_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter((F.col("p_size") >= 20) & (~F.col("p_type").startswith("SMALL")))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("p_type").alias("types"),
            F.max("p_retailprice").cast("double").alias("max_price"),
        )
    )


def _q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        .limit(10)
    )


def _q_nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("cust_cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("acctbal_sum"),
        )
    )


def _hll(version: int):
    def q(spark: SparkSession, sf_dir: str, table: str, element, by) -> DataFrame:
        from pfutil_spark.operators import pf_count_distinct

        df = _t(spark, sf_dir, table)
        if callable(element):
            df = df.withColumn("__elem", element(df))
            col = "__elem"
        else:
            col = element
        return pf_count_distinct(df, col, by=by, version=version).orderBy(*by)

    return q


# published 3-sigma relative error for 16384 registers: 3 x 1.04/sqrt(m)
_HLL_BOUND = 3 * 0.008125


def _bound_check(est: DataFrame, exact: DataFrame, keys: list[str], exact_col: str) -> DataFrame:
    """(keys..., exact, within_bound): estimate vs exact within the
    published 3-sigma HLL bound, materialized as a boolean so DuckDB can
    verify it (the oracle recomputes ``exact`` and states TRUE)."""
    joined = est.join(exact, keys) if keys else est.crossJoin(exact)
    return joined.select(
        *keys,
        F.col(exact_col),
        (
            F.abs(F.col("estimate") - F.col(exact_col))
            <= F.greatest(F.lit(1.0), F.col(exact_col) * F.lit(_HLL_BOUND))
        ).alias("within_bound"),
    )


def _q_hll_text_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL v4 distinct content-sha per lang, DuckDB-oracled via the
    bound-boolean pattern (exact recomputed by the oracle)."""
    est = _hll(4)(
        spark, sf_dir, "documents", lambda d: F.sha2(F.col("text"), 256), ("lang",)
    )
    exact = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.countDistinct(F.sha2(F.col("text"), 256)).alias("exact_distinct"))
    )
    return _bound_check(est, exact, ["lang"], "exact_distinct")


def _q_hll_users_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators import pf_count_distinct

    ev = _t(spark, sf_dir, "events").withColumn(
        "uid", F.col("user_id").cast("string")
    )
    est = pf_count_distinct(ev, "uid", by=(), version=4)
    exact = ev.agg(F.countDistinct("uid").alias("exact_users"))
    return _bound_check(est, exact, [], "exact_users")


def _q_hll_v5_orderkey_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = _hll(5)(
        spark, sf_dir, "lineitem",
        lambda d: F.col("l_orderkey").cast("string"), ("l_returnflag",),
    )
    exact = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact_orderkeys"))
    )
    return _bound_check(est, exact, ["l_returnflag"], "exact_orderkeys")


def _q_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs exact COUNT(DISTINCT) within the published 3-sigma
    bound (3 x 0.8125%) — materialized as a boolean so the DuckDB oracle
    CAN verify it exactly."""
    from pfutil_spark.operators import pf_count_distinct

    docs = _t(spark, sf_dir, "documents").withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    est = pf_count_distinct(docs, "content_sha", by=("lang",))
    exact = docs.groupBy("lang").agg(
        F.countDistinct("content_sha").alias("exact_distinct")
    )
    return (
        est.join(exact, "lang")
        .select(
            "lang",
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                <= F.greatest(
                    F.lit(1.0), F.col("exact_distinct") * F.lit(3 * 0.008125)
                )
            ).alias("within_bound"),
        )
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.functions.text import token_count_col

    d = _t(spark, sf_dir, "documents")
    n_chars = F.length(F.col("text"))
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[\.,;:!\?\"'`]", ""))
    return d.select(
        "doc_id",
        token_count_col("text").alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_chars.alias("n_chars_calc"),
    )


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full quality-scoring feature set (token counts, BPE-ish word
    tokens, punct/digit/upper/stopword ratios) — every expression is a
    JVM codegen built-in, and every one is mirrored exactly in the
    DuckDB oracle (same regexes, same double divisions)."""
    from pfutil_spark.functions.text import quality_features, word_like_token_count_col

    d = _t(spark, sf_dir, "documents")
    q = quality_features(d)
    return q.select(
        "doc_id",
        word_like_token_count_col("text").alias("n_word_tokens"),
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        "upper_ratio",
        "stopword_ratio",
    )


def _q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _q_fingerprint_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash doc fingerprint is a pure function of content:
    every group of identical texts must have exactly one distinct
    fingerprint — materialized as a boolean the oracle can check."""
    from pfutil_spark.operators.dedup import fingerprint_col_df

    d = _t(spark, sf_dir, "documents")
    fp = fingerprint_col_df(d, "text", "doc_id")
    joined = d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha")).join(
        fp, "doc_id"
    )
    return joined.groupBy("content_sha").agg(
        (F.countDistinct("fingerprint") == 1).alias("consistent")
    )


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators.similarity import cosine_to_query_col

    e = _t(spark, sf_dir, "embeddings")
    qv = [1.0 if i % 2 == 0 else -0.5 for i in range(64)]
    return (
        e.select(
            "vec_id",
            F.round(cosine_to_query_col("embedding", qv), 4).alias("cosine_r"),
        )
        .orderBy(F.col("cosine_r").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _q_cms_within_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates vs exact counts: never undercounts, and
    overcount <= 3*eps*N — boolean per event_type, oracle-checkable.
    Fully declarative: items, N, and estimates all live in the plan
    (no driver-side collect/count during query construction)."""
    import math

    from pyspark.sql.window import Window

    from pfutil_spark.operators.sketch_agg import cms_count_for_hash_col, cms_sketch

    ev = _t(spark, sf_dir, "events")
    sk = cms_sketch(ev, "event_type", by=())  # one row
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact"))
        .withColumn("n_total", F.sum("exact").over(Window.partitionBy()))
    )
    eps = math.e / 2048  # kernel default width
    est = (
        exact.crossJoin(F.broadcast(sk))
        .withColumn("h", F.xxhash64(F.col("event_type")))
        .withColumn("est", cms_count_for_hash_col("sketch", "h"))
    )
    return est.select(
        "event_type",
        (
            (F.col("est") >= F.col("exact"))
            & ((F.col("est") - F.col("exact")) <= F.lit(3 * eps) * F.col("n_total"))
        ).alias("within_bound"),
    )


def _q_kll_median_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL median rank error <= 0.03 per event_type — boolean oracle."""
    from pfutil_spark.operators.sketch_agg import kll_quantiles_col, kll_sketch

    ev = _t(spark, sf_dir, "events")
    med = kll_sketch(ev, "value", by=("event_type",)).select(
        "event_type", kll_quantiles_col([0.5]).alias("q")
    ).select("event_type", F.col("q")[0].alias("median_est"))
    ranked = ev.join(med, "event_type").groupBy("event_type").agg(
        F.avg((F.col("value") <= F.col("median_est")).cast("double")).alias("rank_of_est")
    )
    return ranked.select(
        "event_type",
        (F.abs(F.col("rank_of_est") - 0.5) <= 0.03).alias("within_bound"),
    )


def _q_tdigest_tail_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest p95 rank error <= 0.02 per event_type — boolean oracle
    (the arcsine scale function concentrates centroids at the tails, so
    p95 is where t-digest beats a uniform-width quantile sketch)."""
    from pfutil_spark.operators.sketch_agg import tdigest_quantiles_col, tdigest_sketch

    ev = _t(spark, sf_dir, "events")
    est = tdigest_sketch(ev, "value", by=("event_type",)).select(
        "event_type", tdigest_quantiles_col([0.95]).alias("q")
    ).select("event_type", F.col("q")[0].alias("p95_est"))
    ranked = ev.join(est, "event_type").groupBy("event_type").agg(
        F.avg((F.col("value") <= F.col("p95_est")).cast("double")).alias("rank_of_est")
    )
    return ranked.select(
        "event_type",
        (F.abs(F.col("rank_of_est") - 0.95) <= 0.02).alias("within_bound"),
    )


def _q_bloom_no_false_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators.sketch_agg import bloom_might_contain_col, bloom_sketch

    ev = _t(spark, sf_dir, "events")
    members = ev.filter(F.col("user_id") % 3 == 0)
    sk = bloom_sketch(members, "user_id", expected_n=10_000).collect()[0]["sketch"]
    flagged = ev.withColumn("maybe", bloom_might_contain_col("user_id", bytes(sk)))
    return flagged.select(
        (
            F.count(F.lit(1))
            == F.count(F.when((F.col("user_id") % 3 != 0) | F.col("maybe"), 1))
        ).alias("no_false_negatives")
    )


def _q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash-LSH candidates (est Jaccard >= 0.5, a 6-sigma
    margin below the report threshold so banding recall ~ 1), then EXACT
    5-gram Jaccard verification at 0.8 — so the result equals the
    all-pairs ground truth, which the DuckDB oracle computes exactly."""
    from pfutil_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    # length >= k mirror of the oracle's implicit shingle-less-doc
    # exclusion: a doc with no 5-grams has an all-sentinel signature
    # (it would LSH-pair with every other such doc at jaccard 1.0)
    # but produces zero rows in the oracle's shingle CTE
    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= 5)
    cand = minhash_lsh_pairs(d, "text", "doc_id", 64, 16, 5, min_jaccard=0.5)
    verified = ngram_jaccard_pairs(d, cand.select("id_a", "id_b"), "text", "doc_id", k=5)
    return (
        verified.filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))
        .orderBy("id_a", "id_b")
    )


def _q_containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups (r5,
    operators/dedup.py::containment_pairs): ordered pairs where >= 80%
    of doc A's 5-gram set appears in doc B — the "A is quoted/wrapped
    inside B" detector symmetric-Jaccard LSH structurally misses when
    |B| >> |A|. Candidates come from ONE shingle equi-join of each
    doc's bottom-64 signature against the corpus's distinct
    (doc, shingle) table (hypergeometric gate at floor 0.4, miss
    probability ~1e-10), then EXACT per-candidate verification — so the
    result equals the all-ordered-pairs ground truth the DuckDB oracle
    computes exactly. Containment emitted UNROUNDED (one int/int IEEE
    division in both engines; the doc_repetition rounding lesson)."""
    from pfutil_spark.operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= 5)
    return (
        containment_pairs(
            d, "text", "doc_id", k=5, sample=64, min_containment=0.8
        )
        .orderBy("id_a", "id_b")
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of `orders`
    (operators/profile.py::table_profile): row/null counts, native-type
    min/max, HLL distinct per column — the ingest-validation report run
    on every new snapshot. Two passes total regardless of column count:
    one codegen aggregate (exact stats) + one mapInArrow scan building
    ALL columns' sketches simultaneously. n_rows/n_null/min/max are
    exact; the distinct estimate is graded as the established 3-sigma
    bound boolean (the query joins the exact COUNT(DISTINCT) purely to
    materialize the check; profiled columns are ints/strings so the
    min/max stringification is engine-portable — see profile.py)."""
    from pfutil_spark.operators.profile import table_profile

    orders = _t(spark, sf_dir, "orders")
    cols = list(_PROFILE_COLS)
    prof = table_profile(orders, cols)
    exact = orders.agg(
        *[F.countDistinct(c).alias(c) for c in cols]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(c).alias("n_distinct_exact")
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return (
        prof.join(F.broadcast(exact), "column")
        .select(
            "column",
            "n_rows",
            "n_null",
            "n_distinct_exact",
            (
                F.abs(F.col("n_distinct_est") - F.col("n_distinct_exact"))
                <= F.greatest(
                    F.lit(1.0), F.col("n_distinct_exact") * F.lit(_HLL_BOUND)
                )
            ).alias("distinct_ok"),
            "min_value",
            "max_value",
        )
        .orderBy("column")
    )


def _table_profile_oracle_sql() -> str:
    """DuckDB mirror: exact stats per profiled column (the bound
    boolean is the oracle-verifiable TRUE, per the hll_error_bound
    pattern); column list shared via _PROFILE_COLS."""
    parts = [
        (
            f'SELECT \'{c}\' AS "column", CAST(count(*) AS BIGINT) AS n_rows,'
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_null,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct_exact,"
            " TRUE AS distinct_ok,"
            f" CAST(min({c}) AS VARCHAR) AS min_value,"
            f" CAST(max({c}) AS VARCHAR) AS max_value"
            " FROM orders"
        )
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


_INGEST_SPLITS = (("new", 0.2), ("base", 0.8))


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (operators/dedup.py::
    lsh_pairs_between): a deterministic 20% 'new batch' is near-dup-
    checked against the 80% 'existing corpus' — cross-corpus pairs
    ONLY, the daily-ingest shape where the historical side is a
    persisted signature store and its raw text is never re-read.
    Candidates come from the shared band-bucket equi-join
    (est Jaccard >= 0.5, ~full recall at the 0.8 report threshold),
    then EXACT 5-gram Jaccard verification — so the result equals the
    all-cross-pairs ground truth the DuckDB oracle computes. jaccard is
    emitted UNROUNDED (one IEEE division, exact cross-engine)."""
    from pfutil_spark.operators.dedup import (
        lsh_pairs_between,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from pfutil_spark.operators.sampling import hash_split_col

    docs = (
        _t(spark, sf_dir, "documents")
        # mirror the oracle's implicit shingle-less-doc exclusion (see
        # _q_minhash_lsh_pairs)
        .filter(F.length("text") >= 5)
        .withColumn("split", hash_split_col("doc_id", _INGEST_SPLITS, seed=17))
    )
    new = docs.filter(F.col("split") == "new")
    base = docs.filter(F.col("split") == "base")
    sn = minhash_signatures(new, "text", "doc_id", 64, 5)
    sb = minhash_signatures(base, "text", "doc_id", 64, 5)
    cand = lsh_pairs_between(sn, sb, min_jaccard=0.5).select(
        F.col("id_new").alias("id_a"), F.col("id_base").alias("id_b")
    )
    verified = ngram_jaccard_pairs(docs, cand, "text", "doc_id", k=5)
    return (
        verified.filter(F.col("jaccard") >= 0.8)
        .select(
            F.col("id_a").alias("id_new"),
            F.col("id_b").alias("id_base"),
            "jaccard",
        )
        .orderBy("id_new", "id_base")
    )


def _clusters_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared near-dup cluster pipeline (dedup_clusters /
    cluster_split): verified pair graph (the exact pair set the
    minhash_lsh_pairs oracle reproduces) -> connected components ->
    cluster_id per document, singletons keeping their own id. The LSH/
    verify parameters live HERE only — the oracle mirror lives once in
    _CLUSTER_CTE."""
    from pfutil_spark.operators.dedup import (
        assign_dedup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    d_all = _t(spark, sf_dir, "documents")
    # the PAIR GRAPH mirrors the oracle's implicit shingle-less-doc
    # exclusion (see _q_minhash_lsh_pairs); the cluster UNIVERSE stays
    # all documents — a shingle-less doc is a singleton cluster
    d = d_all.filter(F.length("text") >= 5)
    cand = minhash_lsh_pairs(d, "text", "doc_id", 64, 16, 5, min_jaccard=0.5)
    verified = ngram_jaccard_pairs(
        d, cand.select("id_a", "id_b"), "text", "doc_id", k=5
    ).filter(F.col("jaccard") >= 0.8)
    return assign_dedup_clusters(d_all.select("doc_id"), verified, "doc_id")


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component cluster id per document over the VERIFIED
    near-dup pair graph — cluster_id = min doc_id of the component.
    The oracle computes the same fixpoint with a recursive CTE."""
    return _clusters_df(spark, sf_dir).select(
        "doc_id", "cluster_id"
    ).orderBy("doc_id")


def _q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via SimHash pigeonhole candidates (hamming <= 5)
    + exact 4-gram Jaccard verification at 0.9 — equals the all-pairs
    ground truth (DuckDB oracle). hamming<=5 over-generates slightly;
    the exact verify keeps precision at 1."""
    from pfutil_spark.operators.dedup import ngram_jaccard_pairs, simhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents")
    cand = simhash_near_dup_pairs(d, "text", "doc_id", max_hamming=5)
    verified = ngram_jaccard_pairs(d, cand.select("id_a", "id_b"), "text", "doc_id", k=4)
    return (
        verified.filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))
        .orderBy("id_a", "id_b")
    )


def _q_langid_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.functions.text import lang_id_col

    return (
        _t(spark, sf_dir, "documents")
        .select(lang_id_col("text").alias("pred"))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN vs exact brute-force top-k: recall and size
    materialized as oracle-checkable values (both sides deterministic —
    fixed hyperplane seed)."""
    from pfutil_spark.operators.similarity import ann_topk_lsh, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = [1.0 if i % 2 == 0 else -0.5 for i in range(64)]
    ann = ann_topk_lsh(
        e, "embedding", "vec_id", qv, k=10, n_planes=6, n_tables=8
    ).select("vec_id")
    exact = cosine_topk(e, "embedding", "vec_id", qv, k=10).select("vec_id")
    hits = ann.join(exact, "vec_id").agg(F.count(F.lit(1)).alias("h"))
    n = ann.agg(F.count(F.lit(1)).alias("n"))
    return hits.crossJoin(n).select(
        F.col("n").alias("k_returned"),
        (F.col("h") >= F.lit(7)).alias("recall_ok"),  # recall@10 >= 0.7
    )


def _q_multi_distinct_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star report shape: distinct source / content-sha per lang AND
    globally (lang shown as '<all>'), ONE scan (pf_partial_multi).
    Estimates checked against exact distincts (Spark-side), emitted as
    bound booleans the DuckDB oracle recomputes exactly."""
    from pfutil_spark.operators.multi import sourcecode_distinct_report

    docs = _t(spark, sf_dir, "documents").withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    rep = sourcecode_distinct_report(
        docs, by="lang", elements=("source", "content_sha")
    ).select(F.coalesce("lang", F.lit("<all>")).alias("lang"), "metric", "estimate")
    per_lang = docs.groupBy("lang").agg(
        F.countDistinct("source").alias("source"),
        F.countDistinct("content_sha").alias("content_sha"),
    )
    glob = docs.agg(
        F.countDistinct("source").alias("source"),
        F.countDistinct("content_sha").alias("content_sha"),
    ).withColumn("lang", F.lit("<all>"))
    exact = per_lang.unionByName(glob).unpivot(
        ["lang"], ["source", "content_sha"], "metric", "exact_distinct"
    )
    return (
        rep.join(exact, ["lang", "metric"])
        .select(
            "lang",
            "metric",
            "exact_distinct",
            (
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                <= F.greatest(
                    F.lit(1.0), F.col("exact_distinct") * F.lit(_HLL_BOUND)
                )
            ).alias("within_bound"),
        )
        .orderBy("lang", "metric")
    )


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decoder image features: per-media metadata invariants
    materialized as a boolean (decode is deterministic in the payload,
    so the checks are exact, not probabilistic)."""
    from pfutil_spark.operators.multimodal import image_features, synthetic_media_table

    feats = image_features(synthetic_media_table(spark, n=64))
    meta_ok = (
        F.col("width").between(64, 64 + 63 * 16)
        & F.col("height").between(64, 64 + 63 * 16)
        & F.col("channels").isin(1, 3)
        & (F.col("mean_pixel") >= 0.0)
        & (F.col("mean_pixel") <= 255.0)
        & F.col("phash").isNotNull()
    )
    return feats.select("media_id", meta_ok.alias("meta_ok")).orderBy("media_id")


def _q_dump_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format gate IN the graded contract: per-lang sketches dumped
    to Redis-loadable bytes (cardinality cache stamped), restored, and
    re-counted — the roundtrip estimate must equal the direct estimate,
    and every dump must carry a VALID cache equal to the estimate."""
    from pfutil_spark.operators import (
        pf_count_col, pf_dump_col, pf_restore_col, pf_sketch,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    # lazy: materialized once at EXECUTION (both branches reuse it); an
    # eager checkpoint would run a job during query construction
    sk = pf_sketch(docs, "content_sha", by=("lang",)).localCheckpoint(eager=False)
    direct = sk.select("lang", pf_count_col("sketch", 4).alias("direct_est"))
    dumped = sk.select("lang", pf_dump_col("sketch", 4).alias("d"))
    restored = dumped.select(
        "lang",
        pf_count_col(pf_restore_col("d", 4), 4).alias("rt_est"),
        # header byte 15 (1-indexed 16) MSB clear == cardinality cache VALID
        (
            F.conv(F.hex(F.expr("substring(d, 16, 1)")), 16, 10).cast("int") < 128
        ).alias("cache_valid"),
    )
    return (
        direct.join(restored, "lang")
        .select(
            "lang",
            (F.col("rt_est") == F.col("direct_est")).alias("roundtrip_ok"),
            "cache_valid",
        )
        .orderBy("lang")
    )


def _q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql surface of the sketch library: registered pf_*
    functions compose in plain SQL (merge a pair of per-type sketches,
    count the union, validate bytes) — union estimate within the 3-sigma
    bound of the exact distinct over both types."""
    from pfutil_spark.functions.sql import register_sql_functions
    from pfutil_spark.operators import pf_sketch

    register_sql_functions(spark)
    ev = _t(spark, sf_dir, "events").withColumn("uid", F.col("user_id").cast("string"))
    pf_sketch(ev, "uid", by=("event_type",)).createOrReplaceTempView("type_sketches")
    ev.createOrReplaceTempView("events_v")
    return spark.sql(
        """
        WITH two AS (
          SELECT event_type, sketch,
                 row_number() OVER (ORDER BY event_type) AS rn
          FROM type_sketches
        ),
        m AS (
          SELECT pf_merge_pair(a.sketch, b.sketch) AS ms
          FROM two a JOIN two b ON a.rn = 1 AND b.rn = 2
        ),
        est AS (SELECT pf_count(ms) AS u_est, pf_is_valid(ms) AS valid FROM m),
        exact AS (
          SELECT count(DISTINCT uid) AS u FROM events_v
          WHERE event_type IN (
            SELECT event_type FROM two WHERE rn <= 2)
        )
        SELECT exact.u AS exact_union,
               abs(est.u_est - exact.u) <= greatest(1.0, exact.u * 0.024375)
                 AS within_bound,
               est.valid AS bytes_valid
        FROM est CROSS JOIN exact
        """
    )


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection via LSH bucket equi-join (never
    a cross join). The sf corpus has no organic near-dups (max pair cosine
    0.51 at sf0.01), so 20 deterministic scaled copies are injected —
    scaling preserves hyperplane signs, so LSH recall is structural, and
    the DuckDB oracle enumerates the same pairs exactly."""
    from pfutil_spark.operators.similarity import all_pairs_above

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    aug = e.unionByName(dup)
    # dim passed explicitly: all_pairs_above would otherwise run a
    # .first() driver action while BUILDING the query
    pairs = all_pairs_above(
        aug, "embedding", "vec_id", min_cosine=0.95, n_planes=12, dim=64
    )
    return pairs.select("id_a", "id_b").orderBy("id_a", "id_b")


def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup CLUSTERS: the exact LSH-found pair set
    (same construction as embedding_near_dups) fed through connected
    components (operators/dedup.py) — cluster sizes per component id.
    EXACT DuckDB parity via all-pairs cosine + recursive-CTE fixpoint."""
    from pfutil_spark.operators.dedup import assign_dedup_clusters
    from pfutil_spark.operators.similarity import all_pairs_above

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    aug = e.unionByName(dup)
    pairs = all_pairs_above(
        aug, "embedding", "vec_id", min_cosine=0.95, n_planes=12, dim=64
    )
    clustered = assign_dedup_clusters(
        aug.select("vec_id"), pairs.select("id_a", "id_b"), "vec_id"
    )
    return (
        clustered.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster_id")
    )


def _q_hll_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly distinct-user sketches (bucket = group key,
    ONE scan + ONE shuffle), vs exact per bucket — bound boolean oracle."""
    from pfutil_spark.operators.rollup import pf_time_rollup

    # ts is timestamp_ntz: pf_time_rollup buckets it without a session-tz
    # cast and date_format on ntz is tz-free (no conf mutation, r2 ADVICE)
    ev = _t(spark, sf_dir, "events").withColumn("uid", F.col("user_id").cast("string"))
    est = pf_time_rollup(ev, "ts", "uid", bucket="1 hour").select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "estimate",
    )
    exact = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket_s")
    ).agg(F.countDistinct("uid").alias("exact_users"))
    return _bound_check(est, exact, ["bucket_s"], "exact_users").orderBy("bucket_s")


def _q_hll_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 6-hour distinct users per hourly bucket from MERGED
    per-hour sketches (operators/rollup.py::pf_sliding_distinct): raw
    rows are scanned ONCE; every trailing window is a merge of <= 6
    bucket sketches — exact sliding COUNT(DISTINCT) would re-scan per
    window. The exact side explodes each event into its <= 6 window
    ends (contract-scale verification only; the operator itself never
    touches raw rows twice). Bound-boolean oracle like hll_time_rollup."""
    from pfutil_spark.operators.rollup import pf_sliding_distinct

    ev = _t(spark, sf_dir, "events").withColumn(
        "uid", F.col("user_id").cast("string")
    )
    est = pf_sliding_distinct(
        ev, "ts", "uid", bucket="1 hour", window_buckets=6
    ).select(
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "estimate",
    )
    exploded = ev.select(
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', ts),"
                " date_trunc('hour', ts) + INTERVAL '1 hour' * 5,"
                " INTERVAL '1 hour')"
            )
        ).alias("we"),
        "uid",
    )
    observed = ev.select(F.date_trunc("hour", "ts").alias("we")).distinct()
    exact = (
        exploded.join(F.broadcast(observed), "we", "left_semi")
        .groupBy("we")
        .agg(F.countDistinct("uid").alias("exact_users"))
        .select(
            F.date_format("we", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
            "exact_users",
        )
    )
    return _bound_check(est, exact, ["bucket_s"], "exact_users").orderBy(
        "bucket_s"
    )


def _q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: every-10th-frame explode over the
    deterministic synthetic media table; per-media sampled-frame count
    and distinct frame hashes are exact functions of media_id, so the
    oracle enumerates them in closed form."""
    from pfutil_spark.operators.multimodal import sample_video_frames, synthetic_media_table

    t = synthetic_media_table(spark, n=64)
    fr = sample_video_frames(t, every_n=10, n_frames_col="n_frames")
    return (
        fr.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.countDistinct("frame_sha").alias("n_unique_sha"),
        )
        .orderBy("media_id")
    )


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively; DuckDB ASOF JOIN oracle)."""
    from pfutil_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    quotes = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
    )
    joined = asof_join(ev, quotes, on="ts", by=("user_id",))
    return joined.select("event_id", "ref_value")


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators.asof import sessionize

    ev = _t(spark, sf_dir, "events")
    return sessionize(
        ev, "ts", ["user_id"], gap_seconds=1800, tiebreak=("event_id",)
    ).select("event_id", "session_id")


def _q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.select("event_id", "event_type", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )


def _q_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators.rollup import approx_top_k

    return approx_top_k(_t(spark, sf_dir, "events"), "event_type", k=3)


def _q_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP distinct-user estimates (per event_type + grand total from
    ONE scan) vs exact, as oracle-checkable bound booleans."""
    from pfutil_spark.operators.rollup import pf_rollup

    ev = _t(spark, sf_dir, "events").withColumn("uid", F.col("user_id").cast("string"))
    est = pf_rollup(ev, "uid", ["event_type"]).select(
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"), "estimate"
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("uid").alias("exact_users"))
        .unionByName(
            ev.agg(F.countDistinct("uid").alias("exact_users")).withColumn(
                "event_type", F.lit("<all>")
            ).select("event_type", "exact_users")
        )
    )
    return _bound_check(est, exact, ["event_type"], "exact_users").orderBy("event_type")


def _q_hash_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed sampling + train/val/test split
    (operators/sampling.py): sha256-prefix draws are reproducible across
    engines, so the oracle reproduces the EXACT row sets (not a bound).
    Output: per (lang, split) doc counts and the count surviving an
    additional rate-0.25 sample under a different seed."""
    from pfutil_spark.operators.sampling import hash_frac_hex_col, hash_split_col

    d = _t(spark, sf_dir, "documents")
    thr25 = _sampling._threshold_hex(0.25)
    return (
        d.select(
            "lang",
            hash_split_col("doc_id", seed=7).alias("split"),
            (hash_frac_hex_col("doc_id", seed=11) < F.lit(thr25)).alias("in_sample"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("in_sample").cast("long")).alias("n_sampled"),
        )
        .orderBy("lang", "split")
    )


def _q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test assignment: the deterministic split
    keyed by the near-dup CLUSTER id, so every near-duplicate of a
    document lands in the same split (connected components composed
    with the content-keyed splitter) — exact cross-engine parity, per
    document."""
    from pfutil_spark.operators.sampling import hash_split_col

    return _clusters_df(spark, sf_dir).select(
        "doc_id",
        "cluster_id",
        hash_split_col("cluster_id", seed=11).alias("split"),
    ).orderBy("doc_id")


def _q_kmv_set_ops_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketch set operations (kernel/kmv.py): intersection /
    difference / Jaccard estimated on the k-minimum-values sample with
    error relative to the threshold-scaled sample — NOT HLL's
    inclusion-exclusion, whose error is relative to the union. Sets:
    A = open orders, B = orders over 150k, over o_orderkey. k=1024 puts
    sf0.01 (|A∪B| ~ 12k) well into the sampled regime; the exact side is
    conditional countDistinct in the same plan (one scan each side)."""
    from pfutil_spark.operators.sketch_agg import kmv_set_ops_col, kmv_sketch

    o = _t(spark, sf_dir, "orders")
    in_a = F.col("o_orderstatus") == "O"
    in_b = F.col("o_totalprice") > 150000
    sa = kmv_sketch(o.filter(in_a), "o_orderkey", k=1024).select(
        F.col("sketch").alias("sa")
    )
    sb = kmv_sketch(o.filter(in_b), "o_orderkey", k=1024).select(
        F.col("sketch").alias("sb")
    )
    est = sa.crossJoin(sb).select(kmv_set_ops_col("sa", "sb").alias("ops")).select("ops.*")
    key = F.col("o_orderkey")
    exact = o.agg(
        F.countDistinct(F.when(in_a | in_b, key)).alias("exact_union"),
        F.countDistinct(F.when(in_a & in_b, key)).alias("exact_intersect"),
        F.countDistinct(F.when(in_a & ~in_b, key)).alias("exact_diff"),
    )
    # 5-sigma-ish bounds: union RSE ~ 1/sqrt(k-2) ~ 3.1%; the op samples
    # shrink by their selectivity (intersect keeps ~k*i/u points), so
    # their relative bounds are wider
    return (
        est.crossJoin(exact)
        .select(
            "exact_union",
            "exact_intersect",
            "exact_diff",
            (F.abs(F.col("union_est") - F.col("exact_union"))
             <= 0.16 * F.col("exact_union")).alias("union_ok"),
            (F.abs(F.col("intersect_est") - F.col("exact_intersect"))
             <= 0.35 * F.col("exact_intersect")).alias("intersect_ok"),
            (F.abs(F.col("diff_est") - F.col("exact_diff"))
             <= 0.35 * F.col("exact_diff")).alias("diff_ok"),
            (F.abs(F.col("jaccard")
                   - F.col("exact_intersect") / F.col("exact_union"))
             <= 0.35 * F.col("exact_intersect") / F.col("exact_union")).alias("jaccard_ok"),
        )
    )


def _q_join_size_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-execution join planning (operators/estimate.py): estimate
    |lineitem ⋈ orders| on orderkey, and the events.user_id SELF-join
    size (F2, the AMS skew statistic — hot-key detector), from one CMS
    per side. Each sketch is a single map-side pass; only constant-size
    counter matrices move, no data-row shuffle. Graded against the
    exact sizes computed relationally in the same plan: the row-min
    inner product never undercounts, and overcounts by <= eps*N_A*N_B
    (kernel/cms.py::inner_product). For a FIXED input the hashes are
    deterministic so the booleans are stable across runs; across
    fixture re-rolls the upper bound is probabilistic, so this query
    runs depth=8 (miss probability exp(-8) ~ 3e-4 per metric, vs the
    0.7% default-depth exposure)."""
    from pfutil_spark.operators.estimate import join_size_estimate

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    cross_est = join_size_estimate(li, "l_orderkey", o, "o_orderkey", depth=8)
    self_est = join_size_estimate(ev, "user_id", depth=8)
    cross_exact = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("exact")
    )
    self_exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("exact"))
    )

    def _grade(est: DataFrame, exact: DataFrame, name: str) -> DataFrame:
        return est.crossJoin(exact).select(
            F.lit(name).alias("metric"),
            "exact",
            (F.col("est_join_rows") >= F.col("exact")).alias("lower_ok"),
            (F.col("est_join_rows") <= F.col("exact") + F.col("overcount_bound")).alias(
                "upper_ok"
            ),
        )

    return (
        _grade(cross_est, cross_exact, "lineitem_orders")
        .unionAll(_grade(self_est, self_exact, "events_user_f2"))
        .orderBy("metric")
    )


def _q_priority_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise customer-set overlap between the five order priorities
    (operators/rollup.py::kmv_similarity_matrix): ONE scan builds the
    per-priority KMV sketches; all 10 unordered pairs are then a
    broadcast self-join of the 5-row sketch table — exact pairwise
    overlap needs a data-level self-join per pair. Exact side
    recomputed relationally (distinct (priority, custkey) self-join);
    bound booleans use the threshold-scaled sample error with absolute
    floors (union-relative) so near-zero intersections stay gated."""
    from pfutil_spark.operators.rollup import kmv_similarity_matrix

    o = _t(spark, sf_dir, "orders")
    est = kmv_similarity_matrix(o, "o_custkey", "o_orderpriority", k=1024)
    du = o.select(F.col("o_orderpriority").alias("s"), "o_custkey").distinct()
    c = du.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    ix = (
        du.alias("x")
        .join(du.alias("y"), "o_custkey")
        .filter(F.col("x.s") < F.col("y.s"))
        .groupBy(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    allp = (
        c.select(F.col("s").alias("a"), F.col("c").alias("ca"))
        .join(
            c.select(F.col("s").alias("b"), F.col("c").alias("cb")),
            F.col("a") < F.col("b"),
        )
    )
    exact = allp.join(ix, ["a", "b"], "left").select(
        "a",
        "b",
        (F.col("ca") + F.col("cb") - F.coalesce("ix", F.lit(0)))
        .cast("long")
        .alias("exact_union"),
        F.coalesce("ix", F.lit(0)).cast("long").alias("exact_intersect"),
    )
    j = F.col("exact_intersect") / F.col("exact_union")
    return (
        est.join(exact, ["a", "b"])
        .select(
            "a",
            "b",
            "exact_union",
            "exact_intersect",
            (
                F.abs(F.col("union_est") - F.col("exact_union"))
                <= 0.16 * F.col("exact_union")
            ).alias("union_ok"),
            (
                F.abs(F.col("intersect_est") - F.col("exact_intersect"))
                <= F.greatest(
                    0.35 * F.col("exact_intersect"),
                    0.08 * F.col("exact_union"),
                )
            ).alias("intersect_ok"),
            (F.abs(F.col("jaccard") - j) <= F.greatest(0.35 * j, F.lit(0.08)))
            .alias("jaccard_ok"),
        )
        .orderBy("a", "b")
    )


def _q_hll_set_ops_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/intersection estimates vs exact within the union-relative
    bound — boolean, oracle-checkable."""
    from pfutil_spark.operators import pf_sketch
    from pfutil_spark.operators.rollup import (
        pf_intersect_estimate_col,
        pf_union_estimate_col,
    )

    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").withColumn("uid", F.col("user_id").cast("string"))
    # the two lexicographically-first event types, picked IN the plan
    # (no driver-side collect during query construction)
    two = (
        ev.select("event_type")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.partitionBy().orderBy("event_type")))
        .filter(F.col("rn") <= 2)
    )
    sub = ev.join(F.broadcast(two.select("event_type")), "event_type", "left_semi")
    sk = pf_sketch(sub, "uid", by=("event_type",)).join(F.broadcast(two), "event_type")
    a = sk.filter(F.col("rn") == 1).select(F.col("sketch").alias("sa"))
    b = sk.filter(F.col("rn") == 2).select(F.col("sketch").alias("sb"))
    est = a.crossJoin(b).select(
        pf_union_estimate_col("sa", "sb").alias("u_est"),
        pf_intersect_estimate_col("sa", "sb").alias("i_est"),
    )
    exact_u = sub.select(F.countDistinct("uid").alias("u"))
    exact_i = (
        sub.select("event_type", "uid")
        .distinct()
        .groupBy("uid")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.crossJoin(exact_u)
        .crossJoin(exact_i)
        .select(
            (F.abs(F.col("u_est") - F.col("u")) <= F.col("u") * 0.05).alias("union_ok"),
            (F.abs(F.col("i_est") - F.col("i")) <= F.col("u") * 0.05).alias("intersect_ok"),
        )
    )


_CONTAM_SPLITS = (("eval", 0.05), ("train", 0.95))


def _contam_oracle_sql(extra_cols: str) -> str:
    """Shared DuckDB mirror of the 5-gram train/eval contamination
    relation (ngram_contamination and bloom_contamination grade the same
    exact overlap; the Bloom variant appends its agreement booleans via
    ``extra_cols`` so the two oracles cannot drift)."""
    return (
        "WITH lab AS (SELECT doc_id, lang,"
        "  regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS words,"
        f"  {_sampling.sql_split_expr('doc_id', _CONTAM_SPLITS, seed=13)}"
        "   AS split FROM documents),"
        " g AS (SELECT unnest(range(1,"
        "   (SELECT max(len(words)) + 1 FROM lab))) AS i),"
        " evs AS (SELECT DISTINCT"
        "   array_to_string(l.words[g.i::INT : g.i::INT + 4], ' ') AS sh"
        "   FROM lab l JOIN g ON g.i + 4 <= len(l.words)"
        "   WHERE l.split = 'eval'),"
        " trs AS (SELECT DISTINCT l.doc_id,"
        "   array_to_string(l.words[g.i::INT : g.i::INT + 4], ' ') AS sh"
        "   FROM lab l JOIN g ON g.i + 4 <= len(l.words)"
        "   WHERE l.split = 'train'),"
        " fl AS (SELECT DISTINCT doc_id FROM trs"
        "   WHERE sh IN (SELECT sh FROM evs))"
        " SELECT l.lang, CAST(count(*) AS BIGINT) AS n_train,"
        "  CAST(count(f.doc_id) AS BIGINT) AS n_flagged"
        f" {extra_cols}"
        " FROM (SELECT doc_id, lang FROM lab WHERE split = 'train') l"
        " LEFT JOIN fl f USING (doc_id)"
        " GROUP BY l.lang ORDER BY l.lang"
    )


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window document chunking (operators/packing.py::
    chunk_documents): every document split into 24-token chunks with an
    8-token overlap (stride 16) — the prep step between cleaning and
    shard packing. MAP-ONLY (zero shuffles besides the display sort,
    zero Python — plan-gated in tests); integer token arithmetic and
    identical whitespace-split/join on both engines -> EXACT DuckDB
    parity on every chunk string."""
    from pfutil_spark.operators.packing import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=24, overlap=8).orderBy(
        "doc_id", "chunk_idx"
    )


def _q_chunk_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end layout pipeline: chunk_documents (24-token windows,
    8-token overlap) feeds pack_token_shards (500-token shards, 16
    buckets) — the full clean->chunk->pack path a pretraining writer
    runs, graded as one composition. Chunk identity is the composite
    key doc_id/chunk_idx (string, identical construction both engines).
    Map-only chunking + ONE hash Exchange + per-bucket window; all
    integer token arithmetic -> EXACT DuckDB parity on the shard
    manifest."""
    from pfutil_spark.operators.packing import (
        chunk_documents,
        pack_token_shards,
        shard_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=24, overlap=8).withColumn(
        "chunk_key",
        F.concat_ws(
            "/", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")
        ),
    )
    packed = pack_token_shards(
        chunks, "chunk_key", "n_chunk_tokens", budget=500, bucket_chars=1, seed=7
    )
    return shard_stats(packed, "n_chunk_tokens").orderBy("pack_bucket", "pack_shard")


def _chunk_pack_manifest_oracle_sql() -> str:
    """DuckDB mirror: the doc_chunks relation feeding the
    token_shard_packing window, chunk-keyed. Draw/bucket exprs come from
    packing.sql_pack_exprs over the same composite key so the two sides
    cannot drift."""
    from pfutil_spark.operators.packing import sql_pack_exprs

    key = "(CAST(doc_id AS VARCHAR) || '/' || CAST(chunk_idx AS VARCHAR))"
    draw, bucket = sql_pack_exprs(key, 1, seed=7)
    return (
        "WITH base AS (SELECT doc_id, trim(text) AS t FROM documents"
        "  WHERE doc_id IS NOT NULL AND text IS NOT NULL),"
        " tok AS (SELECT doc_id, regexp_split_to_array(t, '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS w,"
        "  CASE WHEN len(t) = 0 THEN 0"
        "   ELSE len(regexp_split_to_array(t, '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n FROM base),"
        " g AS (SELECT unnest(range(0,"
        "  (SELECT coalesce(max(n), 0) FROM tok), 16)) AS s),"
        " chunks AS (SELECT doc_id, s // 16 AS chunk_idx,"
        "  least(24, n - s) AS tok FROM tok JOIN g ON g.s < n),"
        f" keyed AS (SELECT {key} AS k, {draw} AS d, {bucket} AS b, tok"
        "  FROM chunks),"
        " cum AS (SELECT b, tok,"
        "  sum(tok) OVER (PARTITION BY b ORDER BY d, k"
        "   ROWS UNBOUNDED PRECEDING) AS c"
        " FROM keyed)"
        " SELECT b AS pack_bucket,"
        "  CAST((c - tok) // 500 AS BIGINT) AS pack_shard,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(tok) AS BIGINT) AS n_tokens"
        " FROM cum GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _q_events_temporal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-axis drift (r5): for each event_type, the two-sample KS
    between the ``value`` distribution of the FIRST and SECOND halves of
    the event stream's time range — the "did this metric move since the
    first half of the window?" monitor, answered from per-(type, half)
    KLL sketches built in ONE scan + ONE shuffle, evaluated on the
    5-row-per-side sketch table (batch-decoded ks_drift_col).

    The half split compares the NTZ timestamp against the midpoint
    ``min + floor(microseconds(min, max)/2)`` — pure naive-timestamp
    integer-microsecond arithmetic in BOTH engines (no epoch, no
    session timezone, no DST edge; ts is TIMESTAMP_NTZ and stays so).
    The /2 runs on a double under 2^53 so it is IEEE-exact. At sf0.01
    each (type, half) group holds ~1000 values < k=4096, so every
    sketch is lossless and ks_est is the EXACT empirical statistic —
    graded as exact float parity like length_drift_by_lang."""
    from pfutil_spark.operators.drift import ks_drift_col
    from pfutil_spark.operators.sketch_agg import SKETCH_COL, kll_sketch

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    mid = ev.agg(
        F.min("ts").alias("__pf_lo"), F.max("ts").alias("__pf_hi")
    ).select(
        F.timestamp_add(
            "MICROSECOND",
            F.floor(
                F.timestamp_diff("MICROSECOND", F.col("__pf_lo"), F.col("__pf_hi"))
                / F.lit(2)
            ).cast("long"),
            F.col("__pf_lo"),
        ).alias("__pf_mid")
    )
    lab = ev.crossJoin(F.broadcast(mid)).withColumn(
        "half",
        F.when(F.col("ts") <= F.col("__pf_mid"), F.lit("first")).otherwise(
            F.lit("second")
        ),
    )
    sk = kll_sketch(lab, "value", by=("event_type", "half"), k=4096)
    first = sk.filter(F.col("half") == "first").select(
        "event_type", F.col(SKETCH_COL).alias("__sa")
    )
    second = sk.filter(F.col("half") == "second").select(
        "event_type", F.col(SKETCH_COL).alias("__sb")
    )
    j = first.join(second, "event_type")  # types seen in BOTH halves
    return (
        j.select("event_type", ks_drift_col("__sa", "__sb").alias("__d"))
        .select(
            "event_type",
            F.col("__d.ks_est").alias("ks_est"),
            F.col("__d.n_a").alias("n_first"),
            F.col("__d.n_b").alias("n_second"),
        )
        .orderBy("event_type")
    )


def _events_temporal_drift_oracle_sql() -> str:
    """Exact per-type two-sample KS between time halves: the same
    int-count CDF divisions as the sketch side's rank() (lossless
    regime), max |gap| over each type's distinct values — a superset of
    the union support, which cannot change the max."""
    return (
        "WITH e AS (SELECT event_type AS t, value AS x, ts"
        "  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL"
        "   AND ts IS NOT NULL),"
        " m AS (SELECT min(ts) + to_microseconds(CAST(floor("
        "   date_diff('microsecond', min(ts), max(ts)) / 2) AS BIGINT))"
        "   AS mid FROM e),"
        " v AS (SELECT t, CASE WHEN ts <= mid THEN 'first' ELSE 'second' END"
        "   AS h, x FROM e, m),"
        " n AS (SELECT t, h, count(*) AS cnt FROM v GROUP BY t, h),"
        " cdf AS (SELECT g.t, g.h, p.x, count(w.x) AS c"
        "  FROM (SELECT DISTINCT t, h FROM v) g"
        "  JOIN (SELECT DISTINCT t, x FROM v) p ON p.t = g.t"
        "  LEFT JOIN v w ON w.t = g.t AND w.h = g.h AND w.x <= p.x"
        "  GROUP BY g.t, g.h, p.x),"
        " gaps AS (SELECT ca.t AS t,"
        "   abs(ca.c / na.cnt - cb.c / nb.cnt) AS gap"
        "  FROM cdf ca JOIN cdf cb ON cb.t = ca.t AND cb.x = ca.x"
        "   AND ca.h = 'first' AND cb.h = 'second'"
        "  JOIN n na ON na.t = ca.t AND na.h = 'first'"
        "  JOIN n nb ON nb.t = ca.t AND nb.h = 'second')"
        " SELECT g.t AS event_type, max(g.gap) AS ks_est,"
        "  CAST(max(na.cnt) AS BIGINT) AS n_first,"
        "  CAST(max(nb.cnt) AS BIGINT) AS n_second"
        " FROM gaps g JOIN n na ON na.t = g.t AND na.h = 'first'"
        " JOIN n nb ON nb.t = g.t AND nb.h = 'second'"
        " GROUP BY g.t ORDER BY g.t"
    )


def _q_length_drift_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample KS drift between per-language n_chars
    distributions from per-lang KLL sketches (operators/drift.py::
    drift_matrix — one scan + one shuffle, pairs evaluated on the tiny
    sketch table). At sf0.01 every lang group fits a k=1024 sketch
    losslessly, so the estimate IS the exact empirical statistic —
    graded as EXACT float parity with DuckDB's brute-force max-CDF-gap
    (both sides: int64-count divisions, identical IEEE ops). The
    approximation regime (compacted sketches, bound = sum of rank
    errors) is gated in tests/test_drift.py at 20k rows/side."""
    from pfutil_spark.operators.drift import drift_matrix

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    return drift_matrix(docs, "n_chars", "lang", k=1024).select(
        "a", "b", "ks_est", "n_a", "n_b"
    ).orderBy("a", "b")


def _length_drift_oracle_sql() -> str:
    """Exact two-sample KS per lang pair: CDFs as int-count divisions
    (identical IEEE doubles to the sketch side's rank()), max |gap| over
    all distinct values — a superset of the pair's union support, which
    cannot change the max (CDF steps only move at own-group points)."""
    return (
        "WITH v AS (SELECT lang AS s, CAST(n_chars AS DOUBLE) AS x"
        "  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),"
        " n AS (SELECT s, count(*) AS cnt FROM v GROUP BY s),"
        " cdf AS (SELECT g.s, p.x, count(w.x) AS c"
        "  FROM (SELECT DISTINCT s FROM v) g"
        "  CROSS JOIN (SELECT DISTINCT x FROM v) p"
        "  LEFT JOIN v w ON w.s = g.s AND w.x <= p.x"
        "  GROUP BY g.s, p.x),"
        " gaps AS (SELECT ca.s AS a, cb.s AS b,"
        "   abs(ca.c / na.cnt - cb.c / nb.cnt) AS gap"
        "  FROM cdf ca JOIN cdf cb ON ca.x = cb.x AND ca.s < cb.s"
        "  JOIN n na ON na.s = ca.s JOIN n nb ON nb.s = cb.s)"
        " SELECT g.a, g.b, max(g.gap) AS ks_est,"
        "  CAST(max(na.cnt) AS BIGINT) AS n_a,"
        "  CAST(max(nb.cnt) AS BIGINT) AS n_b"
        " FROM gaps g JOIN n na ON na.s = g.a JOIN n nb ON nb.s = g.b"
        " GROUP BY g.a, g.b ORDER BY g.a, g.b"
    )


def _q_length_clip_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang outlier clipping (sketch_agg.py::quantile_clip): keep
    documents inside the [p05, p95] n_chars band of their OWN language,
    then grade the kept fraction against the band width — |kept/total -
    0.9| <= 0.08 covers t-digest rank error at both edges plus the
    +/-1-row discreteness of the smallest (~64-doc) groups. n_total is
    exact; the fraction bound is the scale-honest estimator claim."""
    from pfutil_spark.operators.sketch_agg import quantile_clip

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    kept = quantile_clip(docs, "n_chars", lo=0.05, hi=0.95, by=("lang",))
    per = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("__kept"))
    tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tot.join(per, "lang", "left")
        .select(
            "lang",
            "n_total",
            (
                F.abs(
                    F.coalesce(F.col("__kept"), F.lit(0)) / F.col("n_total")
                    - F.lit(0.9)
                )
                <= F.lit(0.08)
            ).alias("within_bound"),
        )
        .orderBy("lang")
    )


def _q_events_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table drift report (operators/drift.py::table_drift): all
    numeric columns of events, ONE scan per side (sketch_multi KLL
    snapshot), compared between the two halves of a deterministic
    hash split on event_id — the A/B null check a pipeline runs to
    alarm on ingestion drift (two random halves of the same data must
    NOT drift; the ks_est quantifies exactly how little). Both halves
    are lossless at k=8192, so every per-column KS statistic is graded
    as EXACT float parity with DuckDB's window-cumsum CDF compute over
    the same sql_split_expr halves."""
    from pfutil_spark.operators.drift import table_drift, table_sketches
    from pfutil_spark.operators.sampling import hash_split_col

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    halves = ev.withColumn(
        "__half", hash_split_col("event_id", (("a", 0.5), ("b", 0.5)), seed=0)
    )
    ref = table_sketches(
        halves.filter(F.col("__half") == "b"), ["value", "user_id"], k=8192
    )
    return (
        table_drift(
            halves.filter(F.col("__half") == "a"),
            ref,
            ["value", "user_id"],
            k=8192,
        )
        .select("col_name", "ks_est", "n_cur", "n_ref")
        .orderBy("col_name")
    )


def _events_drift_oracle_sql() -> str:
    """Exact per-column two-sample KS between the same hash halves:
    window-cumsum CDFs at every distinct value (counts <= x), int64
    divisions — the identical IEEE ops as the sketch side's rank()."""
    split = _sampling.sql_split_expr("event_id", (("a", 0.5), ("b", 0.5)), seed=0)
    return (
        "WITH s AS (SELECT value, user_id, " + split + " AS half"
        "  FROM events WHERE event_id IS NOT NULL),"
        " v AS (SELECT half, 'value' AS c, CAST(value AS DOUBLE) AS x"
        "   FROM s WHERE value IS NOT NULL"
        "  UNION ALL SELECT half, 'user_id', CAST(user_id AS DOUBLE)"
        "   FROM s WHERE user_id IS NOT NULL),"
        " n AS (SELECT c, half, count(*) AS cnt FROM v GROUP BY 1, 2),"
        " m AS (SELECT c, x,"
        "   sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS da,"
        "   sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS db"
        "  FROM v GROUP BY 1, 2),"
        " cum AS (SELECT c, x,"
        "   CAST(sum(da) OVER (PARTITION BY c ORDER BY x"
        "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,"
        "   CAST(sum(db) OVER (PARTITION BY c ORDER BY x"
        "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb FROM m),"
        " g AS (SELECT cum.c, abs(cum.ca / na.cnt - cum.cb / nb.cnt) AS gap"
        "  FROM cum JOIN n na ON na.c = cum.c AND na.half = 'a'"
        "  JOIN n nb ON nb.c = cum.c AND nb.half = 'b')"
        " SELECT g.c AS col_name, max(g.gap) AS ks_est,"
        "  CAST(max(na.cnt) AS BIGINT) AS n_cur,"
        "  CAST(max(nb.cnt) AS BIGINT) AS n_ref"
        " FROM g JOIN n na ON na.c = g.c AND na.half = 'a'"
        " JOIN n nb ON nb.c = g.c AND nb.half = 'b'"
        " GROUP BY 1 ORDER BY 1"
    )


def _q_partkey_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count drift report (operators/drift.py::
    cardinality_drift): per returnflag, distinct l_partkey of the
    current half vs the reference half of a deterministic hash split on
    l_orderkey — est_cur / est_ref / est_new (= union - ref, the
    "genuinely new content" monitor) from two 12KB sketches per
    stratum, no historical raw rows. Graded: the exact per-stratum
    counts (n_cur/n_ref/n_new — EXACT DuckDB parity) plus booleans
    pinning every estimate within the union-relative 5% bound
    (estimates at ~2000 distinct are far inside it)."""
    from pfutil_spark.operators.drift import cardinality_drift
    from pfutil_spark.operators.hll_agg import pf_sketch
    from pfutil_spark.operators.sampling import hash_split_col

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_partkey").cast("string").alias("pk"),
        hash_split_col("l_orderkey", (("a", 0.5), ("b", 0.5)), seed=0).alias(
            "__half"
        ),
    )
    ref = pf_sketch(li.filter(F.col("__half") == "b"), "pk", by=("l_returnflag",))
    est = cardinality_drift(
        li.filter(F.col("__half") == "a"), "pk", ref, by=("l_returnflag",)
    )
    exact = (
        li.groupBy("l_returnflag", "pk")
        .agg(
            F.max((F.col("__half") == "a").cast("int")).alias("__in_a"),
            F.max((F.col("__half") == "b").cast("int")).alias("__in_b"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("__in_a").alias("n_cur"),
            F.sum("__in_b").alias("n_ref"),
            F.sum(
                ((F.col("__in_a") == 1) & (F.col("__in_b") == 0)).cast("long")
            ).alias("n_new"),
            F.count(F.lit(1)).alias("__n_uni"),
        )
    )
    tol = F.col("__n_uni") * 0.05
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n_cur",
            "n_ref",
            "n_new",
            (F.abs(F.col("est_cur") - F.col("n_cur")) <= tol).alias("cur_ok"),
            (F.abs(F.col("est_ref") - F.col("n_ref")) <= tol).alias("ref_ok"),
            (F.abs(F.col("est_new") - F.col("n_new")) <= tol).alias("new_ok"),
        )
        .orderBy("l_returnflag")
    )


def _q_user_topk_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter churn (operators/drift.py::topk_drift): which users
    entered / exited / stayed in the event-count top-10 between the two
    halves of a deterministic hash split on event_id. With 150 distinct
    users < m=256 both SpaceSaving summaries are EXACT frequency
    tables, so every churn row and estimate is graded at EXACT DuckDB
    parity (ties broken by value, deterministic both engines); above m
    the same query degrades to upper-bound estimates with the
    documented guarantees (tests cover that regime)."""
    from pfutil_spark.operators.drift import topk_drift
    from pfutil_spark.operators.sampling import hash_split_col
    from pfutil_spark.operators.sketch_agg import spacesaving_sketch

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").cast("string").alias("uid"),
        hash_split_col("event_id", (("a", 0.5), ("b", 0.5)), seed=0).alias(
            "__half"
        ),
    )
    ref = spacesaving_sketch(ev.filter(F.col("__half") == "b"), "uid", m=256)
    return topk_drift(
        ev.filter(F.col("__half") == "a"), "uid", ref, k=10, m=256
    ).orderBy("value")


def _q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction (functions/text.py::
    distinctive_terms): top-3 terms per doc by tf/doc_freq — tf-idf
    ranking with linear idf, emitted as ONE integer-operand IEEE
    division so the score is bit-identical cross-engine. Zero Python,
    ONE corpus scan (doc_freq = window over the (doc, term) aggregate).
    EXACT DuckDB parity on every rank, count, and score."""
    from pfutil_spark.functions.text import distinctive_terms

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    return distinctive_terms(docs, k=3).orderBy("doc_id", "term_rank")


def _contam_split_frames(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """The (train, eval) document split that BOTH contamination queries
    grade over — one definition, mirroring _contam_oracle_sql on the
    SQL side, so the two query/oracle pairs cannot drift apart."""
    from pfutil_spark.operators.sampling import hash_split_col

    docs = _t(spark, sf_dir, "documents").withColumn(
        "split", hash_split_col("doc_id", _CONTAM_SPLITS, seed=13)
    )
    return (
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "eval"),
    )


def _q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated decontamination (operators/contamination.py::
    bloom_contaminated_ids) differentially against the exact hash-set
    path on the same train/eval split as ngram_contamination
    (_contam_split_frames — shared construction, like the shared oracle
    body). The scale story: the eval shingle set compresses to a
    CONSTANT-size Bloom filter (~3.4 MB at the 1M/1e-6 defaults, vs 8
    bytes per distinct shingle for the broadcast hash set), built in one
    map-side pass with NO eval shuffle (bits are idempotent under
    duplicates — no distinct needed), and the corpus side stays
    map-only. Graded booleans: no_false_negatives is the Bloom
    guarantee (holds at ANY scale); false_flag_rate_ok bounds the
    false-flag COUNT at 0.2% of train + 3 — per-document false-flag
    probability union-bounds at shingles_per_doc * fpr (= 1e-6 here),
    so the bound holds with overwhelming margin for any corpus whose
    documents are under ~2000 tokens and whose eval side stays within
    expected_n distinct shingles (size expected_n up otherwise — the
    filter stays constant-size either way). n_train/n_flagged are exact
    integers the oracle recomputes."""
    from pfutil_spark.operators.contamination import (
        bloom_contaminated_ids,
        contaminated_ids,
    )

    tr, ev = _contam_split_frames(spark, sf_dir)
    exact = contaminated_ids(tr, ev, n=5, broadcast_eval=True).withColumn(
        "__e", F.lit(1)
    )
    blm = bloom_contaminated_ids(tr, ev, n=5).withColumn("__b", F.lit(1))
    n_false_flags = F.sum(
        F.when(F.col("__b").isNotNull() & F.col("__e").isNull(), 1).otherwise(0)
    )
    return (
        tr.select("doc_id", "lang")
        .join(F.broadcast(exact), "doc_id", "left")
        .join(F.broadcast(blm), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.when(F.col("__e").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            (
                F.sum(
                    F.when(F.col("__e").isNotNull() & F.col("__b").isNull(), 1)
                    .otherwise(0)
                )
                == 0
            ).alias("no_false_negatives"),
            (
                n_false_flags
                <= F.lit(0.002) * F.count(F.lit(1)) + F.lit(3)
            ).alias("false_flag_rate_ok"),
        )
        .orderBy("lang")
    )


def _q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination.py): hold out
    a deterministic 5% eval split (hash_split_col — all rows of a key
    land together, mirrored exactly by sql_split_expr), then flag every
    TRAIN document sharing any 5-word shingle with ANY eval document.
    The production path is exercised: shingles are pure-JVM exprs,
    hashed to 8-byte join keys, and the eval shingle set broadcasts (no
    corpus shuffle). EXACT DuckDB parity — the oracle regenerates both
    splits and the full word-shingle overlap relationally."""
    from pfutil_spark.operators.contamination import contaminated_ids

    tr, ev = _contam_split_frames(spark, sf_dir)
    flagged = contaminated_ids(tr, ev, n=5, broadcast_eval=True).withColumn(
        "__f", F.lit(1)
    )
    return (
        tr.join(F.broadcast(flagged), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.when(F.col("__f").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("lang")
    )


def _q_doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated n-gram stats (operators/contamination.py
    ::shared_ngram_stats — the Lee et al. ACL'22 repeated-substring
    dedup signal at word-shingle granularity): per document, its
    distinct 3-gram count, how many of those occur in at least one
    OTHER document, and the boilerplate fraction (unrounded single
    division — exact cross-engine). on_hash=False so DuckDB mirrors
    the join on raw shingle strings (EXACT parity; production uses
    8-byte xxhash64 keys, unit-tested equivalent)."""
    from pfutil_spark.operators.contamination import shared_ngram_stats

    docs = _t(spark, sf_dir, "documents")
    return shared_ngram_stats(docs, n=3, on_hash=False).orderBy("doc_id")


def _q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining quality-filter funnel: survivor counts through the
    cumulative stage chain all -> min_chars(>=150) -> min_tokens(>=40)
    -> repetition (distinct-token ratio >= 0.4, the Gopher-style
    dup-word filter). Every stage condition is a pure-JVM expression
    (ONE scan, ONE partial-aggregated reduction, then a stack unpivot of
    the four counters — no per-stage passes). EXACT DuckDB parity; the
    distinct-ratio compare is a single IEEE division, exact
    cross-engine (never round(x, N) a computed double — NOTES.md)."""
    from pfutil_spark.functions.text import token_count_col

    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = token_count_col("text")
    n_distinct = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.array_distinct(words)))
    c1 = F.length("text") >= 150
    c2 = c1 & (n_tokens >= 40)
    c3 = c2 & (n_distinct.cast("double") / n_tokens >= 0.4)
    agg = docs.agg(
        F.count(F.lit(1)).alias("c0"),
        F.sum(c1.cast("long")).alias("c1"),
        F.sum(c2.cast("long")).alias("c2"),
        F.sum(c3.cast("long")).alias("c3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 0, 'all', c0, 1, 'min_chars', c1,"
            " 2, 'min_tokens', c2, 3, 'repetition', c3)"
            " AS (stage_idx, stage, n_docs)"
        )
    ).orderBy("stage_idx")


def _q_pii_scan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction audit (functions/pii.py): every third
    document is deterministically enriched with a synthetic contact
    line (an email + an IPv4 derived from doc_id/n_chars — the corpus
    text itself is PII-free, so the detector needs signal), then the
    map-only regex scan reports per language how many documents carry
    PII, match counts per kind, and characters removed by redaction.
    EXACT DuckDB parity: the pattern dialect is the Java-regex ∩ RE2
    subset (no backrefs/lookaround), differential-tested in
    tests/test_pii.py."""
    from pfutil_spark.functions.pii import pii_scan

    docs = _t(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("n_chars") % 256).cast("string"),
    )
    enriched = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, contact).otherwise(F.col("text")),
    )
    return (
        pii_scan(enriched)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_pii_total") > 0).cast("long")).alias("n_docs_with_pii"),
            F.sum("n_pii_email").cast("long").alias("n_emails"),
            F.sum("n_pii_ipv4").cast("long").alias("n_ipv4"),
            F.sum("chars_redacted").cast("long").alias("chars_redacted"),
        )
        .orderBy("lang")
    )


def _pii_scan_report_oracle_sql() -> str:
    """DuckDB mirror of _q_pii_scan_report — patterns and redaction
    order come from functions/pii.py::sql_pii_* so the two sides cannot
    drift; string building uses || (NULL-propagating, like Spark's
    concat) per NOTES.md."""
    from pfutil_spark.functions.pii import (
        PII_PATTERNS,
        sql_pii_count_expr,
        sql_pii_redact_expr,
    )

    # kinds come from PII_PATTERNS itself: adding a pattern updates
    # n_pii_total on BOTH sides (the per-kind output columns stay the
    # graded email/ipv4 pair regardless)
    n = {k: sql_pii_count_expr("text", k) for k, _, _ in PII_PATTERNS}
    total = " + ".join(n.values())
    return (
        "WITH e AS ("
        " SELECT lang,"
        "  CASE WHEN doc_id % 3 = 0"
        "   THEN text || ' user' || CAST(doc_id AS VARCHAR)"
        "    || '@example.com from 10.0.'"
        "    || CAST(doc_id % 256 AS VARCHAR) || '.'"
        "    || CAST(n_chars % 256 AS VARCHAR)"
        "   ELSE text END AS text"
        " FROM documents)"
        " SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,"
        f" CAST(sum(CASE WHEN {total} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_docs_with_pii,"
        f" CAST(sum({n['email']}) AS BIGINT) AS n_emails,"
        f" CAST(sum({n['ipv4']}) AS BIGINT) AS n_ipv4,"
        f" CAST(sum(length(text) - length({sql_pii_redact_expr('text')})) AS BIGINT)"
        "  AS chars_redacted"
        " FROM e GROUP BY lang ORDER BY lang"
    )


def _token_shard_packing_oracle_sql() -> str:
    """DuckDB mirror of _q_token_shard_packing: same draw/bucket exprs
    (built by operators/packing.py::sql_pack_exprs, so the two sides
    cannot drift), same window, same integer chunk arithmetic."""
    from pfutil_spark.operators.packing import sql_pack_exprs

    draw, bucket = sql_pack_exprs("doc_id", 1, seed=3)
    return (
        "WITH base AS ("
        f" SELECT doc_id, {draw} AS d, {bucket} AS b,"
        "  CASE WHEN len(trim(text)) = 0 THEN 0"
        "   ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS tok"
        " FROM documents"
        # mirror pack_token_shards' NULL exclusion (tok is NULL iff text is)
        " WHERE doc_id IS NOT NULL AND text IS NOT NULL),"
        " cum AS ("
        " SELECT b, tok,"
        "  sum(tok) OVER (PARTITION BY b ORDER BY d, doc_id"
        "   ROWS UNBOUNDED PRECEDING) AS c"
        " FROM base)"
        " SELECT b AS pack_bucket,"
        "  CAST((c - tok) // 2000 AS BIGINT) AS pack_shard,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(tok) AS BIGINT) AS n_tokens"
        " FROM cum GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _q_token_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (operators/packing.py): the
    concat-and-chunk layout pretraining writers use — documents hashed
    into 16 independent buckets on a sha256 draw, laid out in draw
    order, and cut every 2000 tokens; output is the per-shard manifest
    (n_docs, n_tokens). One shuffle (hash by bucket), per-bucket
    window — never a global sort; the bucket count is the parallelism
    knob at 100 TB. All-integer arithmetic -> EXACT DuckDB parity on
    the full manifest."""
    from pfutil_spark.functions.text import token_count_col
    from pfutil_spark.operators.packing import pack_token_shards, shard_stats

    docs = _t(spark, sf_dir, "documents")
    tok = token_count_col("text")
    packed = pack_token_shards(
        docs, "doc_id", tok, budget=2000, bucket_chars=1, seed=3
    )
    return shard_stats(packed, tok).orderBy("pack_bucket", "pack_shard")


def _q_top_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary report (functions/text.py::term_profile): the 8
    most frequent tokens per language with in-language occurrence counts
    and corpus-wide document frequency — per-language top terms /
    stopword-candidate / df-weighting inputs, the corpus-level
    complement to doc_repetition's per-document signals. One explode
    feeds both aggregations; every shuffle after the first aggregation
    is vocabulary-sized, not corpus-sized. All-integer -> EXACT DuckDB
    parity (ties broken deterministically by term asc)."""
    from pfutil_spark.functions.text import term_profile

    docs = _t(spark, sf_dir, "documents")
    return (
        term_profile(docs, k=8)
        .select(
            "lang",
            F.col("term_rank").cast("long").alias("term_rank"),
            "term",
            "term_count",
            "doc_freq",
        )
        .orderBy("lang", "term_rank")
    )


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document
    (functions/text.py::word_repetition_stats): word counts, duplicate-
    word fraction, most-frequent word + fraction. Exact DuckDB parity:
    integer counts, and the two fractions are single IEEE divisions
    emitted UNROUNDED (bit-identical doubles cross-engine; round(x,4)
    would NOT be — engines disagree at boundary ratios)."""
    from pfutil_spark.functions.text import word_repetition_stats

    return word_repetition_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def _q_lang_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-style language-mix rebalancing
    (operators/sampling.py::geometric_mix_resample): keep exactly
    ceil(sqrt(n_lang * n_min)) docs per language, chosen by smallest
    sha256 draws. EXACT row-set parity with the SQL mirror — every float
    op involved (int product, sqrt, ceil, hex-string compare) is
    engine-independent."""
    from pfutil_spark.operators.sampling import geometric_mix_resample

    d = _t(spark, sf_dir, "documents")
    return (
        geometric_mix_resample(d, "doc_id", "lang", seed=0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _q_sampled_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referentially-consistent deterministic sampling across tables:
    sample 20% of customers by hashed c_custkey, then join their orders —
    the sampled orders are exactly the orders of sampled customers (the
    join-closure property hash-keyed sampling guarantees and RNG sampling
    does not). Exact DuckDB parity via the shared draw expression."""
    from pfutil_spark.operators.sampling import hash_sample

    cust = hash_sample(_t(spark, sf_dir, "customer"), "c_custkey", 0.2, seed=7)
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


# integer per-source mixture weights (1..4 cycling over the 20 synthetic
# sources) — integers so every quota op (product, div, mod) is exact
# cross-engine; the SAME dict builds both the Spark plan and the oracle
_MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}


def _q_source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-source mixture with epoch upsampling
    (operators/sampling.py::mixture_resample — the Pile/LLaMA-style
    dataset-mixing step): per-source targets t_s = floor(T*w_s/W) at
    T = 2x the corpus, oversampled sources repeating whole rows with an
    epoch counter, undersampled ones keeping their smallest-sha256-draw
    subset. EXACT row-set parity (epochs included) with the SQL mirror —
    integer weights keep every quota op engine-exact."""
    from pfutil_spark.operators.sampling import mixture_resample

    d = _t(spark, sf_dir, "documents")
    return (
        mixture_resample(
            d, "doc_id", "source", _MIX_WEIGHTS, total_factor=2, seed=3
        )
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


def _q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators/sampling.py::cap_per_group —
    the per-domain cap of web-corpus curation): keep the 15
    smallest-draw docs of each source. EXACT row-set parity with the
    SQL mirror."""
    from pfutil_spark.operators.sampling import cap_per_group

    d = _t(spark, sf_dir, "documents")
    return (
        cap_per_group(d, "doc_id", "source", cap=15, seed=11)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication profile of the corpus: histogram of near-dup
    cluster sizes (operators/dedup.py::cluster_size_stats over the same
    verified cluster assignment dedup_clusters grades). EXACT — the
    oracle extends the recursive-CTE cluster fixpoint with the same
    two-level aggregation; frac_docs is one long/long IEEE division."""
    from pfutil_spark.operators.dedup import cluster_size_stats

    return cluster_size_stats(_clusters_df(spark, sf_dir)).orderBy(
        "cluster_size"
    )


def _q_boilerplate_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate removal with document
    reconstruction (operators/contamination.py::remove_boilerplate_lines):
    every occurrence of a line present in >400 distinct docs is deleted
    and each doc is reassembled from its surviving lines in original
    order. The synthetic corpus is single-line word-soup, so the graded
    delimiter is ' ' (lines = words — the degenerate-but-exact case);
    real multi-line behavior is pytest-gated on constructed docs. EXACT
    parity including the reassembled text."""
    from pfutil_spark.operators.contamination import remove_boilerplate_lines

    d = _t(spark, sf_dir, "documents")
    # on_hash=False: the oracle joins raw strings, so the graded path
    # does too — no xxhash64-collision risk class in an EXACT compare
    # (hash==string equivalence is pytest-gated separately)
    return remove_boilerplate_lines(
        d, "text", "doc_id", delim=" ", max_docs=400, on_hash=False
    ).orderBy("doc_id")


def _q_weighted_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted t-digest (operators/sketch_agg.py::tdigest_weighted_sketch):
    quantity-weighted median of extendedprice per returnflag. The query
    re-verifies its own estimate IN the plan: the exact weighted CDF at
    the estimated p50 must sit within 3% of 0.5 (t-digest rank error at
    the median is ~1/delta). Oracle re-states the exact weight totals and
    the bound."""
    from pfutil_spark.operators.sketch_agg import (
        tdigest_quantiles_col,
        tdigest_weighted_sketch,
    )

    li = _t(spark, sf_dir, "lineitem")
    est = (
        tdigest_weighted_sketch(li, "l_extendedprice", "l_quantity", by=("l_returnflag",))
        .select(
            "l_returnflag",
            tdigest_quantiles_col([0.5]).getItem(0).alias("p50"),
        )
    )
    qty = F.col("l_quantity").cast("double")
    j = li.join(F.broadcast(est), "l_returnflag")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            (
                F.sum(F.when(F.col("l_extendedprice") <= F.col("p50"), qty).otherwise(0.0))
                / F.sum(qty)
            ).alias("__rank"),
        )
        .select(
            "l_returnflag",
            "total_qty",
            (F.abs(F.col("__rank") - 0.5) <= 0.03).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


def _q_weighted_kll_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted KLL (operators/sketch_agg.py::kll_weighted_sketch):
    token-count-weighted median of document length per language —
    "the doc length a randomly chosen TOKEN sits in" rather than a
    randomly chosen document. Weights enter by binary expansion
    (kernel/kll.py::update_weighted — level-b items weigh exactly 2**b,
    zero added rank error at insertion), so the published KLL rank bound
    applies to the weighted CDF. The plan re-verifies its own estimate:
    the exact weighted CDF at the estimated p50 must sit within 4% of
    0.5. Oracle re-states the exact per-language token totals (the SAME
    token expression as text_stats, exact cross-engine) and the bound."""
    from pfutil_spark.functions.text import token_count_col
    from pfutil_spark.operators.sketch_agg import (
        kll_quantiles_col,
        kll_weighted_sketch,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.length("text").cast("double").alias("len"),
        token_count_col("text").alias("toks"),
    )
    est = kll_weighted_sketch(docs, "len", "toks", by=("lang",)).select(
        "lang", kll_quantiles_col([0.5]).getItem(0).alias("p50")
    )
    w = F.col("toks").cast("double")
    # left join + vacuous-TRUE guard: a lang whose docs are all
    # null-text (absent from the sketch output) or all zero-token
    # (sum(w) = 0 -> NULL rank) still emits its oracle row — the bound
    # check is vacuously true when there is no token mass to rank.
    return (
        docs.join(F.broadcast(est), "lang", "left")
        .groupBy("lang")
        .agg(
            F.sum("toks").cast("long").alias("total_tokens"),
            F.try_divide(  # ANSI-safe: zero token mass -> NULL, not error
                F.sum(F.when(F.col("len") <= F.col("p50"), w).otherwise(0.0)),
                F.sum(w),
            ).alias("__rank"),
        )
        .select(
            "lang",
            "total_tokens",
            F.coalesce(
                F.abs(F.col("__rank") - 0.5) <= 0.04, F.lit(True)
            ).alias("within_bound"),
        )
        .orderBy("lang")
    )


def _q_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SpaceSaving heavy hitters
    (operators/sketch_agg.py::spacesaving_weighted_sketch): top order
    priorities by TOTAL PRICE (in exact cents), single pass. With
    distinct values <= m the summary is exact (theta stays 0), so this
    is EXACT DuckDB parity, not a bound — while the same plan at 10^9
    distinct keys degrades gracefully to the guaranteed-error regime."""
    from pfutil_spark.operators.sketch_agg import (
        spacesaving_topk_col,
        spacesaving_weighted_sketch,
    )

    o = _t(spark, sf_dir, "orders").withColumn(
        "cents", (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    )
    sk = spacesaving_weighted_sketch(o, "o_orderpriority", "cents", m=256)
    return (
        sk.select(F.explode(spacesaving_topk_col(3)).alias("t"))
        .select(
            F.col("t.value").alias("o_orderpriority"),
            F.col("t.est_count").alias("total_cents"),
        )
        .orderBy(F.col("total_cents").desc(), "o_orderpriority")
    )


def _q_sketch_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan multi-sketch profile (operators/sketch_agg.py::
    sketch_multi): per language, a KMV distinct-sha sketch AND a
    t-digest of document lengths from a SINGLE scan + SINGLE shuffle
    (plan-gated in tests/test_sketch_spark.py). The query re-verifies
    both estimates in-plan: KMV within 3 sample-RSEs of the exact
    distinct count (exact below k=1024 distinct), the t-digest p50 at
    rank 0.5 +/- 0.05."""
    from pfutil_spark.operators.sketch_agg import (
        _null_safe_hash,
        kmv_estimate_col,
        kmv_spec,
        sketch_multi,
        tdigest_quantiles_col,
        tdigest_spec,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.length("text").cast("double").alias("len"),
    )
    prof = sketch_multi(
        docs,
        {
            "sha_kmv": (_null_safe_hash("sha"), kmv_spec(1024)),
            "len_td": (F.col("len"), tdigest_spec(100)),
        },
        by=("lang",),
    ).select(
        "lang",
        kmv_estimate_col("sha_kmv").alias("kmv_est"),
        tdigest_quantiles_col([0.5], "len_td").getItem(0).alias("p50"),
    )
    exact = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("sha").alias("exact_distinct"),
    )
    j = docs.join(F.broadcast(prof), "lang")
    rank = j.groupBy("lang").agg(
        (
            F.sum(F.when(F.col("len") <= F.col("p50"), 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("__rank")
    )
    rse3 = 3.0 / (1024 - 2) ** 0.5
    return (
        exact.join(prof, "lang")
        .join(rank, "lang")
        .select(
            "lang",
            "n_docs",
            "exact_distinct",
            (
                F.abs(F.col("kmv_est") - F.col("exact_distinct"))
                <= F.greatest(F.col("exact_distinct") * rse3, F.lit(1.0))
            ).alias("kmv_ok"),
            (F.abs(F.col("__rank") - 0.5) <= 0.05).alias("p50_ok"),
        )
        .orderBy("lang")
    )


def _q_length_decile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven quantile bucketing (operators/sketch_agg.py::
    tdigest_edges + bucket_col): length-decile features computed as a
    pure-codegen comparison chain against t-digest edges (the standard
    "bucket by length decile" pretraining shard/curriculum key). Every
    decile bucket must hold 10% +/- 8% (abs) of the docs — t-digest rank
    error + value ties. The oracle re-states the exact doc count and the
    bound per bucket."""
    from pfutil_spark.operators.sketch_agg import (
        bucket_col,
        tdigest_edges,
        tdigest_sketch,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("len")
    )
    edges = tdigest_edges(
        tdigest_sketch(docs, "len"), [i / 10.0 for i in range(1, 10)]
    )
    counts = (
        docs.select(bucket_col("len", edges).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    # total stays IN the plan (broadcast 1-row agg — no hidden action)
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        spine.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_docs",
            (
                F.abs(
                    F.coalesce(F.col("__n"), F.lit(0)).cast("double")
                    / F.col("n_docs")
                    - 0.1
                )
                <= 0.08
            ).alias("frac_ok"),
        )
        .orderBy("bucket")
    )


def _q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OUTPUT table (operators/dedup.py::keep_best_per_cluster
    over the verified near-dup clusters): one representative per
    cluster — the LONGEST document, ties to the smallest doc_id. EXACT
    DuckDB parity via the recursive-CTE cluster fixpoint + the same
    window rank."""
    from pfutil_spark.operators.dedup import keep_best_per_cluster

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    clustered = _clusters_df(spark, sf_dir).join(d, "doc_id")
    return (
        keep_best_per_cluster(
            clustered,
            "cluster_id",
            preference=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        )
        .select("cluster_id", "doc_id", "n_chars")
        .orderBy("cluster_id")
    )


def _q_doc_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary statistics
    (functions/text.py::build_vocab + oov_stats): a top-50 corpus
    vocabulary (min_count=3, cutoff ties broken by term ASC — the
    vocabulary SET is deterministic cross-engine) and each document's
    token count, OOV token count, and OOV fraction — the fastText-style
    "does this doc look like the corpus?" quality proxy. All-integer
    counts + ONE bigint/bigint division (unrounded) -> EXACT DuckDB
    parity; zero-token docs survive with a NULL fraction."""
    from pfutil_spark.functions.text import build_vocab, oov_stats

    d = _t(spark, sf_dir, "documents")
    vocab = build_vocab(d, top_v=50, min_count=3)
    return oov_stats(d, vocab).orderBy("doc_id")


def _q_script_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script character mix per language
    (functions/text.py::script_counts): per-lang sums of
    latin/digit/CJK/cyrillic/arabic/whitespace/other character counts
    from explicit BMP code-point ranges (identical semantics in Java
    regex and RE2 — \\p{Han}-style named classes are NOT engine-stable)
    plus the latin fraction (one division, unrounded). The mojibake /
    wrong-language monitor. Map-only profile + one aggregate; EXACT
    DuckDB parity."""
    from pfutil_spark.functions.text import script_counts

    d = _t(spark, sf_dir, "documents")
    prof = script_counts(d, extra_cols=("lang",))
    agg = prof.groupBy("lang").agg(
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_latin").alias("latin_chars"),
        F.sum("n_digit").alias("digit_chars"),
        F.sum("n_cjk").alias("cjk_chars"),
        F.sum("n_cyrillic").alias("cyrillic_chars"),
        F.sum("n_arabic").alias("arabic_chars"),
        F.sum("n_whitespace").alias("ws_chars"),
        F.sum("n_other").alias("other_chars"),
    )
    return agg.select(
        "*",
        (
            F.col("latin_chars") / F.nullif(F.col("total_chars"), F.lit(0))
        ).alias("latin_frac"),
    ).orderBy("lang")


def _q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level duplication matrix
    (operators/dedup.py::cross_source_dup_matrix): the exact-verified
    near-dup pairs (same candidate+verify pipeline as
    minhash_lsh_pairs, jaccard >= 0.8) rolled up per unordered source
    combination — "which sources leak into which" for dataset-mixing
    and eval-contamination decisions. Counts are integers; pair_frac
    is ONE bigint/bigint division (unrounded) -> EXACT DuckDB parity
    vs the all-pairs ground truth with the same source join."""
    from pfutil_spark.operators.dedup import (
        cross_source_dup_matrix,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    d = docs.filter(F.length("text") >= 5)
    cand = minhash_lsh_pairs(d, "text", "doc_id", 64, 16, 5, min_jaccard=0.5)
    verified = ngram_jaccard_pairs(
        d, cand.select("id_a", "id_b"), "text", "doc_id", k=5
    )
    pairs = verified.filter(F.col("jaccard") >= 0.8)
    return cross_source_dup_matrix(
        docs, pairs, "doc_id", "source"
    ).orderBy("source_a", "source_b")


def _q_knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-vs-table exact k-NN join
    (operators/similarity.py::knn_join): for each of 5 query vectors,
    the 5 nearest base embeddings by cosine with self-matches excluded
    — the batched retrieval / semantic-dedup primitive. Rank order is
    the (cosine desc, base_id asc) total order both engines share;
    cosine rounded to 4 (the embedding_topk precedent — ULP-level
    engine differences in the dot-product fold sit far below 1e-4 at
    this data)."""
    from pfutil_spark.operators.similarity import knn_join

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return (
        knn_join(e, q, k=5, exclude_same_id=True)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("knn_rank"),
            "base_id",
            F.round("cosine", 4).alias("cosine_r"),
        )
        .orderBy("query_id", "knn_rank")
    )


def _q_vocab_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary churn monitor (operators/drift.py::topk_drift over
    exploded terms): which terms entered / exited / stayed in the
    token-frequency top-10 between the two halves of a deterministic
    hash split on doc_id — the "new words are entering the corpus"
    signal from two constant-size SpaceSaving summaries, no historical
    raw rows. The synthetic corpus has ~31 distinct terms < m=256, so
    both summaries are EXACT frequency tables and every churn row is
    graded at EXACT DuckDB parity (above m the query degrades to the
    documented upper-bound guarantees, pytest-gated)."""
    from pfutil_spark.operators.drift import topk_drift
    from pfutil_spark.operators.sampling import hash_split_col
    from pfutil_spark.operators.sketch_agg import spacesaving_sketch

    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0)
    )
    toks = d.select(
        hash_split_col("doc_id", (("a", 0.5), ("b", 0.5)), seed=0).alias(
            "__half"
        ),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    ref = spacesaving_sketch(
        toks.filter(F.col("__half") == "b"), "term", m=256
    )
    return topk_drift(
        toks.filter(F.col("__half") == "a"), "term", ref, k=10, m=256
    ).orderBy("value")


def _q_corpus_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card one-stop: corpus-level counts from ONE
    aggregation (docs, distinct sources/langs/texts, total chars,
    total whitespace tokens, blank docs) unpivoted to (metric, value)
    rows via stack. Multiple count-distincts share one scan (Spark
    plans them through a single Expand); all values bigint -> EXACT
    DuckDB parity."""
    from pfutil_spark.functions.text import token_count_col

    d = _t(spark, sf_dir, "documents")
    blank = F.when(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0,
        F.lit(1),
    ).otherwise(F.lit(0))
    agg = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(token_count_col("text")).alias("total_tokens"),
        F.sum(blank).cast("long").alias("n_blank_docs"),
    )
    return agg.select(
        F.expr(
            "stack(7,"
            " 'n_docs', n_docs,"
            " 'n_sources', n_sources,"
            " 'n_langs', n_langs,"
            " 'n_distinct_texts', n_distinct_texts,"
            " 'total_chars', total_chars,"
            " 'total_tokens', total_tokens,"
            " 'n_blank_docs', n_blank_docs) AS (metric, value)"
        )
    ).orderBy("metric")


def _q_line_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line removal
    (operators/contamination.py::dedup_lines_within_doc): keep only
    the first occurrence of each distinct line per doc, reassembled in
    order — the C4 self-repetition cleanup. Graded at delim=' ' on the
    single-line word-soup corpus (lines = words, the
    degenerate-but-exact case; real multi-line behavior is
    pytest-gated). EXACT parity including the reassembled text."""
    from pfutil_spark.operators.contamination import dedup_lines_within_doc

    d = _t(spark, sf_dir, "documents")
    return dedup_lines_within_doc(d, "text", "doc_id", delim=" ").orderBy(
        "doc_id"
    )


def _q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day user retention (operators/retention.py): for each
    active calendar day, how many of its users return the NEXT day —
    exact counts from ONE distinct over (user, day) (the only
    corpus-scale shuffle; the day-shifted probe re-joins on the same
    keys), plus a boolean gating the HLL-SNAPSHOT estimate — retention
    answered from checkpointed per-day sketches with no historical raw
    rows — against the exact count within the union-relative
    inclusion-exclusion bound (the priority_customer_overlap floors).
    Dates stay naive end-to-end (TIMESTAMP_NTZ -> DATE, no session tz
    — the events_temporal_drift trap class) and the day is emitted as
    a formatted string (the shipping_priority precedent). All-integer
    counts + ONE bigint/bigint IEEE division -> EXACT DuckDB parity;
    est_ok literal TRUE on the oracle side."""
    from pfutil_spark.operators.retention import (
        cohort_retention,
        retention_estimates,
        retention_sketches,
    )

    ev = _t(spark, sf_dir, "events")
    exact = cohort_retention(ev, "user_id", "ts")
    est = retention_estimates(retention_sketches(ev, "user_id", "ts"))
    nxt = exact.select(
        F.date_sub("day", 1).alias("day"),
        F.col("active_users").alias("__next_active"),
    )
    j = exact.join(est, "day").join(nxt, "day", "left")
    union_ub = (
        F.col("active_users")
        + F.coalesce("__next_active", F.lit(0))
        - F.col("retained_next")
    )
    est_ok = F.abs(F.col("retained_est") - F.col("retained_next")) <= F.greatest(
        0.35 * F.col("retained_next"), 0.08 * union_ub, F.lit(3.0)
    )
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "active_users",
        "retained_next",
        "retention_rate",
        est_ok.alias("est_ok"),
    ).orderBy("day_s")


def _q_top_bigrams_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 bigrams (functions/text.py::ngram_profile):
    the phrase-level collocation profile — stop-phrase lists,
    boilerplate candidates, BPE-merge diagnostics. Shingle generation
    is the decontamination suite's pure-JVM word_shingles_col; ONE
    scan, one map-side-combined aggregate, one vocabulary-sized top-k
    window. All-integer counts with a (count desc, ngram asc) total
    order -> EXACT DuckDB parity."""
    from pfutil_spark.functions.text import ngram_profile

    d = _t(spark, sf_dir, "documents")
    return ngram_profile(d, "text", "lang", n=2, k=10).orderBy(
        "lang", "ngram_rank"
    )


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus
    (operators/contamination.py::ngram_novelty_stats): for each probe
    document (hash-split half of documents), the fraction of its
    DISTINCT word 3-grams absent from the reference half's n-gram set
    — the incremental-crawl "is this new content?" curation score, the
    per-document inverse of the decontamination any-overlap boolean.
    Both sides deduplicate before ONE left equi-join; graded with
    on_hash=False (raw-string keys) so the oracle is exact; all-integer
    counts + ONE IEEE division (NULL for sub-3-token docs) -> EXACT
    DuckDB parity."""
    from pfutil_spark.operators.contamination import ngram_novelty_stats
    from pfutil_spark.operators.sampling import hash_split_col

    d = _t(spark, sf_dir, "documents").withColumn(
        "split",
        hash_split_col("doc_id", (("probe", 0.5), ("ref", 0.5)), seed=29),
    )
    return ngram_novelty_stats(
        d.filter(F.col("split") == "probe"),
        d.filter(F.col("split") == "ref"),
        "text",
        "doc_id",
        n=3,
        on_hash=False,
    ).orderBy("doc_id")


def _q_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline in one call
    (operators/curation.py::curate_corpus): exact dedup (smallest-id
    wins) -> token-count quality gate (20..80 tokens) -> deterministic
    per-source cap (15 docs, sha-draw selection) -> the kept-document
    manifest. Every stage is an existing audited operator; the whole
    plan is two shuffles (content-sha dedup, per-source rank window).
    All-integer columns -> EXACT DuckDB parity on the exact row set."""
    from pfutil_spark.operators.curation import curate_corpus

    d = _t(spark, sf_dir, "documents")
    return (
        curate_corpus(d, min_tokens=20, max_tokens=80, cap=15, seed=3)
        .select("doc_id", "source", "lang", "n_tokens")
        .orderBy("doc_id")
    )


def _q_retention_within_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d7 retention (operators/retention.py::retention_within_k): for
    each active day, how many of its users return within the next 7
    days — computed from the per-user gap-to-next-activity series
    (window lead over each user's OWN days; one shuffle on user after
    the activity distinct), so the cost is k-independent (no 7-way
    join family). All-integer counts + ONE bigint/bigint division ->
    EXACT DuckDB parity (sum CAST to BIGINT, the HUGEINT trap)."""
    from pfutil_spark.operators.retention import retention_within_k

    ev = _t(spark, sf_dir, "events")
    out = retention_within_k(ev, 7, "user_id", "ts")
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        "active_users",
        "retained_within_k",
        "retention_rate",
    ).orderBy("day_s")


def _q_source_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-mixing dashboard: docs, distinct texts, exact
    duplicate fraction, token mass, blank docs — the numbers a mixture
    weight decision reads, from ONE aggregation over one scan (the
    count-distinct shares the scan via Spark's Expand, the
    corpus_summary_report precedent). All-bigint + one bigint/bigint
    division -> EXACT DuckDB parity."""
    from pfutil_spark.functions.text import token_count_col

    d = _t(spark, sf_dir, "documents")
    blank = F.when(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0,
        F.lit(1),
    ).otherwise(F.lit(0))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        # token_count_col(NULL) is NULL, not 0 — coalesce so an
        # all-NULL-text source sums to 0 like the oracle's CASE arm
        F.sum(F.coalesce(token_count_col("text"), F.lit(0))).alias(
            "total_tokens"
        ),
        F.sum(blank).cast("long").alias("n_blank_docs"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_distinct_texts",
        (
            (F.col("n_docs") - F.col("n_distinct_texts")) / F.col("n_docs")
        ).alias("dup_frac"),
        "total_tokens",
        "n_blank_docs",
    ).orderBy("source")


def _q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (operators/funnel.py::funnel_counts):
    users reaching view -> click -> purchase with their FIRST
    occurrences in strictly increasing time order. ONE shuffle (the
    per-user conditional-min groupBy, map-side combinable, pre-filtered
    to funnel types); counts monotone by construction; frac_of_first is
    one bigint/bigint division -> EXACT DuckDB parity."""
    from pfutil_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"]).orderBy(
        "step_rank"
    )


def _q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day active users per day
    (operators/retention.py::rolling_active_users) — the rolling-WAU
    dashboard line, and the exact companion the HLL sliding window
    (hll_sliding_window) approximates. Map-only integer-offset explode
    (each activity pair feeds exactly 7 trailing days; no self-join
    family) + ONE count-distinct shuffle; all-integer -> EXACT DuckDB
    parity."""
    from pfutil_spark.operators.retention import rolling_active_users

    ev = _t(spark, sf_dir, "events")
    out = rolling_active_users(ev, 7, "user_id", "ts")
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_s"), "active_users"
    ).orderBy("day_s")


def _q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property analytics: events.props is a JSON
    string; parse it with a SCHEMA'D from_json (vectorized JVM Jackson
    — the idiomatic Spark semi-structured scan, zero Python) and
    aggregate the extracted integer field per event_type, counting
    missing/unparseable values explicitly. All-bigint -> EXACT DuckDB
    parity (oracle extracts with ->> + TRY_CAST; sum CAST to BIGINT,
    the HUGEINT trap)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").alias("__p")
    )
    k = F.col("__p.k")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(k.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_k"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
            F.sum(k).alias("k_sum"),
        )
        .orderBy("event_type")
    )


def _q_mixture_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing plan
    (operators/sampling.py::mixture_token_plan): per-source corpus
    inventory vs integer-weight targets and epoch structure for a 1M
    token budget over sources src0/src1/src2 plus a deliberately
    absent 'srcx' (zero presence -> NULL epoch columns, the "you asked
    for data you don't have" row). One counting scan + a literal
    weight table; all bigint product/div/mod -> EXACT DuckDB parity."""
    from pfutil_spark.operators.sampling import mixture_token_plan

    d = _t(spark, sf_dir, "documents")
    return mixture_token_plan(
        d,
        "source",
        {"src0": 4, "src1": 3, "src2": 2, "srcx": 1},
        total_tokens=1_000_000,
    ).orderBy("source")


def _q_length_percentile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-normalized quality scoring: each document's length
    percentile WITHIN its language (cume_dist over a per-lang window)
    — the standard way to make a raw quality signal comparable across
    languages before a global threshold ("keep the top 60% of every
    language" instead of biasing against naturally-short-doc
    languages). cume_dist is rows_leq/rows_total — an integer-ratio
    division, bit-exact cross-engine including ties. One window over
    one scan, zero Python."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.cume_dist().over(w).alias("length_pct"),
    ).orderBy("doc_id")


def _q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap between sources
    (operators/rollup.py::kmv_similarity_matrix over exploded terms):
    pairwise term-set union/intersection/Jaccard for every unordered
    source pair from ONE token scan — "do these crawls speak the same
    language?" for mixing and dedup-strategy decisions. Same sketch
    machinery and bound constants as priority_customer_overlap (the
    exact side is a distinct (source, term) self-join); exact integers
    graded, estimate booleans TRUE both sides."""
    from pfutil_spark.operators.rollup import kmv_similarity_matrix

    d = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0
    )
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    est = kmv_similarity_matrix(toks, "term", "source", k=1024)
    du = toks.select(F.col("source").alias("s"), "term").distinct()
    c = du.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    ix = (
        du.alias("x")
        .join(du.alias("y"), "term")
        .filter(F.col("x.s") < F.col("y.s"))
        .groupBy(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    allp = c.select(F.col("s").alias("a"), F.col("c").alias("ca")).join(
        c.select(F.col("s").alias("b"), F.col("c").alias("cb")),
        F.col("a") < F.col("b"),
    )
    exact = allp.join(ix, ["a", "b"], "left").select(
        "a",
        "b",
        (F.col("ca") + F.col("cb") - F.coalesce("ix", F.lit(0)))
        .cast("long")
        .alias("exact_union"),
        F.coalesce("ix", F.lit(0)).cast("long").alias("exact_intersect"),
    )
    j = F.col("exact_intersect") / F.col("exact_union")
    return (
        est.join(exact, ["a", "b"])
        .select(
            "a",
            "b",
            "exact_union",
            "exact_intersect",
            (
                F.abs(F.col("union_est") - F.col("exact_union"))
                <= 0.16 * F.col("exact_union")
            ).alias("union_ok"),
            (
                F.abs(F.col("intersect_est") - F.col("exact_intersect"))
                <= F.greatest(
                    0.35 * F.col("exact_intersect"),
                    0.08 * F.col("exact_union"),
                )
            ).alias("intersect_ok"),
            (F.abs(F.col("jaccard") - j) <= F.greatest(0.35 * j, F.lit(0.08)))
            .alias("jaccard_ok"),
        )
        .orderBy("a", "b")
    )


def _q_length_histogram_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense fixed-width length histogram per language
    (operators/stats.py::fixed_width_histogram): 6 bins of width 100,
    under/overflow clamped into the edge bins, zero bins emitted (the
    plot-ready shape). Pure bigint clamp-and-divide binning -> EXACT
    DuckDB parity."""
    from pfutil_spark.operators.stats import fixed_width_histogram

    d = _t(spark, sf_dir, "documents")
    return fixed_width_histogram(
        d, "n_chars", 0, 100, 6, by="lang"
    ).orderBy("lang", "bin")


def _q_daily_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day volume-anomaly monitor per event type
    (operators/stats.py::daily_count_anomalies, z2=4 = 2 sigma): the
    integer-exact z-test (d*x - S)^2 > z2*(d*SS - S^2) — no float mean
    or variance anywhere, so the flag booleans AND the diagnostic
    integers are EXACT DuckDB parity, not bound-booleans."""
    from pfutil_spark.operators.stats import daily_count_anomalies

    ev = _t(spark, sf_dir, "events")
    return daily_count_anomalies(ev, z2=4).orderBy("event_type", "day_s")


def _q_user_event_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the user -> active-day bipartite graph
    (operators/stats.py::degree_distribution): how many users are
    active on exactly k distinct days — the engagement-breadth
    histogram. Day = naive DATE of the timestamp_ntz (no session tz).
    All-integer -> EXACT DuckDB parity."""
    from pfutil_spark.operators.stats import degree_distribution

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    return degree_distribution(ev, "user_id", "day").orderBy("degree")


def _q_keyword_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index bag-of-words retrieval
    (operators/search.py::keyword_search_topk): top-10 documents for
    the query {join, filter, window}, scored tf * (N - df) — linear
    idf keeps every emitted value bigint, hence EXACT DuckDB parity
    (the distinctive_terms precedent). One scan; the explode is
    filtered to the query terms before any shuffle."""
    from pfutil_spark.operators.search import keyword_search_topk

    d = _t(spark, sf_dir, "documents")
    return keyword_search_topk(d, ["join", "filter", "window"], k=10)


def _q_word_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term co-occurrence mining (operators/search.py::word_pair_lift):
    the 15 most frequent co-occurring word pairs over the top-64
    vocabulary, with the exact association score
    lift = pair_docs*N / (docs_a*docs_b) (one bigint-product /
    bigint-product IEEE division -> EXACT DuckDB parity; log-PMI would
    be libm-specific). Candidate volume is vocabulary-bounded before
    the per-doc pair join."""
    from pfutil_spark.operators.search import word_pair_lift

    d = _t(spark, sf_dir, "documents")
    return word_pair_lift(d, top_v=64, min_pair_docs=2, k=15)


def _q_repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-passage detection
    (operators/spans.py::repeated_spans, k=30 chars, min_count=2):
    maximal character spans whose every 30-char window occurs at least
    twice corpus-wide — the Lee et al. 2022 substring-dedup signal,
    Spark-shaped as a sliding-gram stream + one count-over-window +
    integer island merging. All-integer -> EXACT DuckDB parity
    (oracle mirrors the gram/window/island pipeline on raw gram
    strings; on_hash=True is the 8-byte-key scale path, differential-
    gated in tests)."""
    from pfutil_spark.operators.spans import repeated_spans

    d = _t(spark, sf_dir, "documents")
    return repeated_spans(d, k=30, min_count=2).orderBy(
        "doc_id", "span_start"
    )


def _q_repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-character coverage
    (operators/spans.py::span_coverage): how much of each document is
    repeated corpus material. Every doc appears (clean docs are the
    keep-list); dup_frac is one bigint/bigint division over
    NULLIF(n_chars, 0) -> EXACT DuckDB parity."""
    from pfutil_spark.operators.spans import span_coverage

    d = _t(spark, sf_dir, "documents")
    return span_coverage(d, k=30, min_count=2).orderBy("doc_id")


def _q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-way join (lineitem |x| orders |x| customer
    |x| supplier |x| nation |x| region) with the local-supplier
    constraint (c_nationkey = s_nationkey), region + order-date
    filters, revenue per nation. ALL four dimension sides broadcast
    (customer/supplier/nation/region — plan-gated in tests), so the
    only shuffle is the lineitem-orders join; revenue is a
    decimal-exact sum cast to double (the lineitem_pricing precedent
    — float sums would be partition-order-dependent). ntz literals
    keep the date filter tz-free."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


def _q_token_mass_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted histogram (operators/stats.py::fixed_width_histogram
    with weight=): documents bucketed by length, each bin carrying BOTH
    the document count and the total token mass — "where do my
    training tokens live on the length axis?", the shape that decides
    chunking and packing parameters. Token weight = the house
    whitespace token count (coalesced to 0 for blank/NULL text).
    All-bigint -> EXACT DuckDB parity."""
    from pfutil_spark.functions.text import token_count_col
    from pfutil_spark.operators.stats import fixed_width_histogram

    d = _t(spark, sf_dir, "documents")
    return fixed_width_histogram(
        d,
        "n_chars",
        0,
        100,
        6,
        weight=F.coalesce(token_count_col("text"), F.lit(0)),
    ).orderBy("bin")


def _q_orders_customer_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit
    (operators/audit.py::referential_audit): one-row orders.o_custkey
    -> customer.c_custkey report (row/null/orphan accounting + match
    fraction). Child aggregates to distinct keys BEFORE the join; the
    dimension key set broadcasts. All-bigint + one division -> EXACT
    DuckDB parity."""
    from pfutil_spark.operators.audit import referential_audit

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return referential_audit(
        o, c, "o_custkey", "c_custkey", broadcast_parent=True
    )


def _q_document_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff report (operators/audit.py::snapshot_diff_summary):
    counts of added/removed/changed/unchanged documents between the
    corpus and a deterministically mutated copy (doc_id%16 buckets:
    bucket 2 removed, bucket 1 text upper-cased, bucket 0 re-added
    under shifted ids) — the "what changed since the last crawl" audit.
    Text comparison is null-safe; 'changed' requires the mutation to
    actually change the value (upper of an already-upper/blank text is
    unchanged — mirrored in the oracle CASE). ASCII corpus, so
    upper() agrees cross-engine."""
    from pfutil_spark.operators.audit import snapshot_diff_summary

    d = _t(spark, sf_dir, "documents")
    b = F.pmod(F.col("doc_id"), F.lit(16))
    ref = d.select("doc_id", "text")
    cur = d.filter(b != 2).select(
        "doc_id",
        F.when(b == 1, F.upper("text")).otherwise(F.col("text")).alias("text"),
    ).unionByName(
        d.filter(b == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return snapshot_diff_summary(cur, ref, "doc_id", ["text"]).orderBy("status")


def _q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix
    (operators/funnel.py::event_transitions): consecutive-event pair
    counts per user timeline with (ts, event_id) total order, plus the
    per-from-event transition fraction (one bigint/bigint division).
    EXACT DuckDB parity."""
    from pfutil_spark.operators.funnel import event_transitions

    ev = _t(spark, sf_dir, "events")
    return event_transitions(ev).orderBy("from_event", "to_event")


def _q_daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted daily event counts: one row per day, one column per
    event type (the wide dashboard shape; exercises DataFrame.pivot).
    The pivot value list is EXPLICIT — no hidden distinct job at plan
    time and a stable output schema, which is what the driver contract
    requires. Missing combinations coalesce to 0. All-bigint -> EXACT
    DuckDB parity (oracle = conditional sums, the portable spelling)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day_s"))
        .pivot("event_type", types)
        .count()
    )
    return wide.select(
        "day_s",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
        sum(
            [F.coalesce(F.col(t), F.lit(0)).cast("long") for t in types],
            F.lit(0).cast("long"),
        ).alias("total"),
    ).orderBy("day_s")


def _q_orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout keys (functions/layout.py::morton_key_col): the
    Morton interleave of (customer key, order-day number) — the sort
    key that makes min-max file skipping work for BOTH dimensions when
    a 100-TB orders table is range-partitioned by it. Pure bigint
    shift/mask codegen; the DuckDB oracle uses morton_sql_expr (the
    same masks in the same order), so the 64-bit keys are EXACT
    parity. Top 20 by (key, orderkey) — a total order."""
    from pfutil_spark.functions.layout import morton_key_col

    o = _t(spark, sf_dir, "orders")
    day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            day.cast("long").alias("day_num"),
            morton_key_col("o_custkey", day, bits=16).alias("zkey"),
        )
        .orderBy(F.col("zkey").asc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def _q_shipping_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval join (operators/rangejoin.py::interval_join):
    per order, the number of lineitems MARKET-WIDE (any order) whose
    ship day falls in the 7-day half-open window starting at the order
    date — the "how busy was the week I ordered in" activity join that
    has no equi-key. The operator rewrites the band predicate as a
    bucketed equi-join (bucket_width=7, so every interval spans <= 2
    buckets) — no cartesian product in the plan; the oracle states the
    same band as a plain non-equi LEFT JOIN. Orders with NULL dates or
    zero window activity are kept at 0. Day arithmetic on naive DATEs
    both engines; all-bigint -> EXACT."""
    from pfutil_spark.operators.rangejoin import interval_join

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    day0 = F.lit("1992-01-01").cast("date")
    iv = o.select(
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), day0).cast("long").alias("win_s"),
    ).withColumn("win_e", F.col("win_s") + F.lit(7))
    pts = li.select(
        F.datediff(F.to_date("l_shipdate"), day0).cast("long").alias("ship_day")
    )
    matched = interval_join(
        iv, pts, "win_s", "win_e", "ship_day", bucket_width=7
    )
    cnt = matched.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_shipped")
    )
    return (
        o.select("o_orderkey")
        .join(cnt, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("n_shipped", F.lit(0)).cast("long").alias("n_shipped"),
        )
        .orderBy("o_orderkey")
    )


def _q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count (operators/stats.py::triangle_count) of the
    part co-purchase graph: parts are adjacent when some order contains
    both (lineitem self-equi-join on orderkey, canonical a < b). The
    operator runs the degree-ordered orientation (out-degree
    O(sqrt(m)), each triangle closed exactly once); the oracle is the
    textbook a<b<c triple self-join. One all-bigint row -> EXACT."""
    from pfutil_spark.operators.stats import triangle_count

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
    )
    x, y = li.alias("x"), li.alias("y")
    edges = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(
        F.col("x.l_partkey").alias("pa"), F.col("y.l_partkey").alias("pb")
    )
    return triangle_count(edges, "pa", "pb")


def _q_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting lists
    (operators/search.py::build_postings): per term with df >= 2, the
    doc frequency, integer-exact whole-list summaries (min/max/sum of
    doc ids), and the first 16 sorted doc ids as the shipped index
    head (bounded BEFORE collection via a rank window — a stopword
    never materialises its full list in one task). House whitespace
    tokenizer; DuckDB mirror via list_sort/list_slice. EXACT."""
    from pfutil_spark.operators.search import build_postings

    d = _t(spark, sf_dir, "documents")
    return build_postings(d, min_df=2, head=16).orderBy(
        F.col("doc_freq").desc(), "term"
    )


def _q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue delta: one row of
    sum(l_extendedprice * l_discount) over a ship-year / discount-band
    / quantity filter — the pushdown showcase (every predicate reaches
    the scan; plan-gated in tests). Decimal-exact sum cast to double
    (the lineitem_pricing precedent); date filter on naive DATEs."""
    li = _t(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.filter(
            (d >= F.lit("1996-01-01").cast("date"))
            & (d < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def _q_top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item revenue: customers ranked by
    revenue of their returned lineitems (l_returnflag = 'R'), top 20
    with (revenue desc, custkey) total order. The customer dimension
    broadcasts; the lineitem-orders equi-join is the only shuffle.
    Decimal-exact revenue cast to double -> EXACT."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _q_fuzzy_dedup_edits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs
    (operators/dedup.py::fuzzy_dedup_pairs): MinHash-LSH candidates ->
    exact banded Levenshtein verify at max_edits=6 — so the result
    equals the all-pairs ground truth the oracle computes directly
    (lev <= 6 on >= 44-char docs implies 5-gram Jaccard ~0.88, LSH
    miss probability ~4e-7 at 16 bands). The oracle prefilters on
    |length diff| <= 6 (provably safe: lev >= |len_a - len_b|).
    Spark levenshtein counts code points, DuckDB bytes — the corpus
    is verified pure ASCII at every SF, where they agree. EXACT."""
    from pfutil_spark.operators.dedup import fuzzy_dedup_pairs

    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= 5)
    return fuzzy_dedup_pairs(
        d, "text", "doc_id", max_edits=6, min_jaccard=0.5
    ).orderBy("id_a", "id_b")


def _q_user_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion early warning
    (operators/audit.py::join_skew_report): top 20 user_id keys of the
    events self-join by exact output size left_rows * right_rows —
    the report you run BEFORE sessionize/transition joins to find the
    keys that need salting. Two map-side-combined aggregates + one
    key join; the diagnosed join itself never runs. All-bigint ->
    EXACT."""
    from pfutil_spark.operators.audit import join_skew_report

    ev = _t(spark, sf_dir, "events")
    return join_skew_report(ev, ev, "user_id", top=20)


def _q_unicode_normalization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization ingest monitor
    (functions/unicode.py::normalize_col / clean_whitespace_col): per
    lang, code-point totals before/after NFC and whitespace cleanup,
    plus how many raw documents NFC actually changes. To exercise the
    normalizer on (possibly all-ASCII) synthetic text, each document is
    decorated with a decomposed suffix ' Cafe'+U+0301+'  fin' — NFC
    composes e+COMBINING ACUTE to a single code point (-1 per doc) and
    the cleanup collapses the double space (-1 per doc), so the deltas
    are structural, not data-dependent. All counts are integers; the
    DuckDB mirror uses nfc_normalize() (same stability-guaranteed
    UAX#15 result as Python's unicodedata) -> EXACT."""
    from pfutil_spark.functions.unicode import clean_whitespace_col, normalize_col

    d = _t(spark, sf_dir, "documents")
    # explicit escape: e + U+0301 stays visibly DECOMPOSED (a pasted
    # precomposed e-acute would make NFC a no-op and the test vacuous)
    deco = F.concat(
        F.coalesce(F.col("text"), F.lit("")), F.lit(" Cafe\u0301  fin")
    )
    per = d.select(
        "lang",
        F.length(deco).cast("long").alias("raw_len"),
        F.length(normalize_col(deco)).cast("long").alias("nfc_len"),
        F.length(clean_whitespace_col(deco)).cast("long").alias("clean_len"),
        (
            normalize_col(F.coalesce(F.col("text"), F.lit("")))
            != F.coalesce(F.col("text"), F.lit(""))
        )
        .cast("long")
        .alias("raw_changed"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("raw_len").alias("raw_chars"),
            F.sum("nfc_len").alias("nfc_chars"),
            F.sum("clean_len").alias("clean_chars"),
            F.sum("raw_changed").alias("docs_nfc_changed"),
        )
        .orderBy("lang")
    )


def _q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped (large-volume customers): orders whose total
    lineitem quantity exceeds 150, joined back to orders + customer,
    top 100 by o_totalprice. The having-aggregate runs BEFORE the joins
    (the only corpus-scale shuffle keys on l_orderkey; the survivors
    are few, so both joins see a filtered build side). Quantity sums in
    decimal(18,2) cast to double (the lineitem_pricing exactness
    pattern); order (o_totalprice desc, o_orderkey asc) is a total
    order so LIMIT is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cst = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_d"))
        .filter(F.col("qty_d") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cst), orders.o_custkey == cst.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "o_totalprice_d"
            ),
            F.col("qty_d").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice_d").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def _q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped (promotion effect): share of H1-1996 revenue
    from parts of type 'PROMO'. Revenue terms are decimal(18,2)
    products (scale-4 result, exact — the shipping_priority pattern),
    summed exactly, and the final promo/total ratio is ONE division of
    two decimal-exact doubles -> EXACT cross-engine. part is a
    broadcast dimension; lineitem is filtered on shipdate at the scan
    (pushed) before the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    agg = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_frac"),
    )


def _q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/skew.py::salted_join) graded
    EXACTLY against the plain equi-join: orders joined to customer on
    custkey with the top-3 hottest custkeys salted 4 ways (the
    driver-known hot list a production job gets from
    join_skew_report), then rolled up per nation. Salting only changes
    PARTITIONING — the oracle is the unsalted SQL join, and all
    outputs are bigint counts -> EXACT. The hot-key probe is a tiny
    TakeOrdered collect (index-build precedent)."""
    from pfutil_spark.operators.skew import salted_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    hot = [
        r["o_custkey"]
        for r in o.groupBy("o_custkey")
        .count()
        .orderBy(F.col("count").desc(), F.col("o_custkey").asc())
        .limit(3)
        .collect()
    ]
    j = salted_join(
        o, c, on="o_custkey", right_on="c_custkey", salt=4, hot_keys=hot
    )
    return (
        j.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_custs"),
        )
        .orderBy("c_nationkey")
    )


def _q_part_seed_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-seed cluster assignment (operators/graph.py::
    nearest_seed): every part within 2 co-purchase hops of the
    first-order seed parts assigned to its closest seed (min dist,
    then min seed id — propagating per-node winners is sound because
    min distributes over unions), rolled up per (seed, dist). The
    oracle enumerates (node, seed, depth) in a recursive CTE and keeps
    row_number 1 by (depth, seed) per node. All-bigint -> EXACT."""
    from pfutil_spark.operators.graph import nearest_seed

    edges = _copurchase_edges(spark, sf_dir)
    srcs = _first_order_parts(spark, sf_dir)
    a = nearest_seed(edges, srcs, max_hops=2)
    return (
        a.groupBy("seed", "dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .orderBy("seed", "dist")
    )


def _q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped (top supplier): supplier(s) whose 1996-Q1
    shipped revenue EQUALS the maximum — the correlated scalar-max
    shape, run as a global max window over the already-aggregated
    supplier-sized frame (never a second lineitem scan). Revenue stays
    DECIMAL through the equality comparison (exact; a double max would
    be order-dependent) and casts to double only at output. Supplier
    dimension broadcasts."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    per_supp = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("__pf_rev"))
    )
    top = per_supp.withColumn(
        "__pf_mx", F.max("__pf_rev").over(Window.partitionBy())
    ).filter(F.col("__pf_rev") == F.col("__pf_mx"))
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__pf_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q_above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape ("orders above the customer's own
    average") graded EXACTLY: the naive correlated AVG rewrite is a
    per-customer window, and the float-hostile avg comparison
    p > s/n is restated as the all-decimal product comparison
    p * n > s — integer-scaled decimal multiply/compare is exact in
    both engines where a double division would be order-dependent.
    One window pass, no self-join."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey")
    o2 = o.select(
        "o_orderpriority",
        p.alias("p"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(p).over(w).alias("s"),
    )
    return (
        o2.filter(F.col("p") * F.col("n") > F.col("s"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_above"))
        .orderBy("o_orderpriority")
    )


def _q_customer_status_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operators graded: the distinct customer-key sets
    with 'F' orders vs 'O' orders combined via EXCEPT both ways and
    INTERSECT, reported as one row of three bigint counts. Spark's
    subtract/intersect are set-semantics (dedup) like SQL EXCEPT /
    INTERSECT; each count is a 1-row aggregate crossJoined together
    (no collect). EXACT."""
    o = _t(spark, sf_dir, "orders")
    fs = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    os_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(name))

    return (
        cnt(fs.subtract(os_), "n_f_only")
        .crossJoin(cnt(os_.subtract(fs), "n_o_only"))
        .crossJoin(cnt(fs.intersect(os_), "n_both"))
    )


def _q_documents_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC apply (operators/cdc.py::apply_upserts) graded end to
    end: a deterministic updates batch (10%-modulo text updates, 4%
    tombstones, 2% inserts with offset keys) merged into the documents
    snapshot latest-version-wins, then summarized per lang. The oracle
    replays the same merge as a QUALIFY row_number window. All-bigint
    summary -> EXACT."""
    from pfutil_spark.operators.cdc import apply_upserts

    d, ups = _documents_change_rows(spark, sf_dir)
    out = apply_upserts(d, ups, key="doc_id", version="v", deleted_col="deleted")
    return _upsert_summary(out)


def _documents_change_rows(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The deterministic documents change batch shared by the batch
    (documents_upsert) and streaming (streaming_upsert_snapshot) CDC
    queries: base snapshot at v1, plus 10%-modulo text updates (v2),
    4% tombstones (v2), 2% inserts with offset keys (v1)."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .withColumn("v", F.lit(1).cast("long"))
        .withColumn("deleted", F.lit(False))
    )
    did = F.col("doc_id")
    upd = d.filter((did % 10 == 0) & (did % 25 != 0)).select(
        "doc_id",
        "lang",
        F.concat(F.lit("upd:"), F.col("text")).alias("text"),
        F.lit(2).cast("long").alias("v"),
        F.lit(False).alias("deleted"),
    )
    tomb = d.filter(did % 25 == 0).select(
        "doc_id",
        "lang",
        F.lit("").alias("text"),
        F.lit(2).cast("long").alias("v"),
        F.lit(True).alias("deleted"),
    )
    new = d.filter(did % 50 == 0).select(
        (did + 100000).alias("doc_id"),
        "lang",
        F.concat(F.lit("new:"), F.col("text")).alias("text"),
        F.lit(1).cast("long").alias("v"),
        F.lit(False).alias("deleted"),
    )
    return d, upd.unionByName(tomb).unionByName(new)


def _upsert_summary(out: DataFrame) -> DataFrame:
    return (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("text").cast("long").alias("n_texts"),
            F.sum(
                F.when(F.col("text").startswith("upd:"), 1).otherwise(0)
            ).cast("long").alias("n_updated"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


def _q_streaming_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC graded end-to-end against the batch oracle: the
    documents_upsert change rows (base v1 + updates/tombstones/inserts)
    delivered through a REAL file-source stream into
    StreamingUpsertStore (foreachBatch, availableNow), then the
    committed snapshot summarized. Latest-version-wins makes the
    result independent of how the source splits micro-batches, so
    streaming must agree EXACTLY with the batch QUALIFY-merge oracle
    — the same SQL as documents_upsert. The summary is
    localCheckpoint'd so the temp state/checkpoint dirs can be removed
    before returning."""
    import shutil
    import tempfile

    from pfutil_spark.streaming.cdc_stream import (
        StreamingUpsertStore,
        attach_upsert_foreach_batch,
    )

    d, ups = _documents_change_rows(spark, sf_dir)
    changes = d.unionByName(ups)
    root = tempfile.mkdtemp(prefix="pf_cdc_stream_q_")
    try:
        src = f"{root}/src"
        changes.write.parquet(src)
        store = StreamingUpsertStore(
            spark, f"{root}/state", key="doc_id", version="v",
            deleted_col="deleted",
        )
        stream = spark.readStream.schema(changes.schema).parquet(src)
        q = attach_upsert_foreach_batch(stream, store, f"{root}/ckpt")
        if not q.awaitTermination(300):
            # never rmtree under a live query / summarize a partial
            # snapshot: stop it and fail loudly
            q.stop()
            raise RuntimeError(
                "streaming upsert did not finish within 300s"
            )
        return _upsert_summary(store.snapshot()).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP(returnflag, linestatus): the
    per-group rows PLUS per-flag subtotals PLUS the grand total in one
    aggregation pass (Expand-based grouping sets — one scan, one
    shuffle, no unioned re-aggregations). NULL marks the rolled-up
    level in both engines. Decimal-exact qty/revenue sums cast to
    double -> EXACT."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def _q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session journeys (operators/funnel.py::session_paths):
    gap-sessionized (30 min) event streams read off as each session's
    first 8 event types in (ts, event_id) total order, counted per
    path string, top 20 by (n_sessions desc, path). The in-row
    array_sort/slice/array_join keeps path building out of a second
    window pass; the oracle mirrors with row_number + ordered
    string_agg over the same sessionization CTE. EXACT."""
    from pfutil_spark.operators.funnel import session_paths

    ev = _t(spark, sf_dir, "events")
    return session_paths(
        ev, gap_seconds=1800, max_steps=8, top=20, tiebreak=("event_id",)
    )


def _q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped (global sales opportunity): LAPSED customers —
    above-threshold account balance and no order since 2000-01-01 —
    counted per market segment with their total balance. NOT EXISTS
    compiles to a LEFT-ANTI join against the (date-filtered, pushed to
    the scan) orders fact — the complement of the referential audit.
    The balance sum is decimal-exact (acctbal has 2 fixed decimals)
    cast to double -> EXACT; the threshold is a literal so no
    cross-engine float aggregate sits in the predicate."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    idle = c.filter(F.col("c_acctbal") > 5000.0).join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_idle"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("idle_balance"),
        )
        .orderBy("c_mktsegment")
    )


def _q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped (order priority checking): orders placed in
    1996-H1 with at least one lineitem shipped more than 60 days after
    the order date, counted per priority. EXISTS compiles to a
    LEFT-SEMI join — each order is counted ONCE however many lineitems
    are late (a plain inner join would inflate counts). The
    correlated date predicate rides the semi-join condition. Naive
    timestamp + day arithmetic both engines (the temporal-drift
    lesson: never cast TIMESTAMP_NTZ through session-tz). All-bigint
    counts -> EXACT."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")
    ow = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    late = ow.join(
        li,
        (ow.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > F.timestamp_add("DAY", F.lit(60), ow.o_orderdate)
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized DISTINCT part co-purchase edge set (src, dst):
    parts are adjacent when some order contains both (the
    copurchase_triangles pair builder, dedup'd then mirrored).
    Shared by the part_pagerank / part_reachability graph queries;
    SQL mirror: _COPURCHASE_E_CTE."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
    )
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .distinct()
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def _first_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed set shared by the graph queries: the distinct parts of the
    FIRST order (min l_orderkey — an in-plan broadcast scalar, no
    driver collect). SQL mirror: the `srcs` CTE in the
    part_reachability / part_seed_assignment oracles."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(li.agg(F.min("l_orderkey").alias("__pf_mk"))),
            F.col("l_orderkey") == F.col("__pf_mk"),
        )
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )


def _q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/graph.py::pagerank, 3 rounds,
    damping 85%) over the symmetrized part co-purchase graph. ALL-
    BIGINT fixed-point arithmetic makes the iterative result bit-
    identical across engines and partitionings, so the oracle is the
    literal 3x-unrolled CTE of the same update rule — EXACT, no
    tolerance. Top 20 parts by (rank desc, node) total order."""
    from pfutil_spark.operators.graph import pagerank

    edges = _copurchase_edges(spark, sf_dir)
    pr = pagerank(edges, "src", "dst", iters=3, damping_pct=85)
    return pr.orderBy(F.col("rank_scaled").desc(), "node").limit(20)


def _q_part_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank over the co-purchase graph: edge weight = the
    number of order co-occurrences of the pair (pre-aggregated to one
    row per directed pair — floor semantics make parallel edges and
    aggregated weights differ, so the operator contract is the
    aggregated multiset). contrib = (r * w) div strength, all bigint;
    the oracle is the same 3x unroll with sum(w) strengths. Top 20 by
    (rank desc, node)."""
    from pfutil_spark.operators.graph import pagerank

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
    )
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    pr = pagerank(edges, "src", "dst", iters=3, damping_pct=85, weight="w")
    return pr.orderBy(F.col("rank_scaled").desc(), "node").limit(20)


def _q_part_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop-distance profile (operators/graph.py::bfs_distances):
    from the parts of the FIRST order (min l_orderkey — an in-plan
    broadcast scalar, no driver collect) over the co-purchase graph,
    label every part within 2 hops with its MIN distance, then report
    per-hop (n_nodes, min_node, max_node). Frontier expansion visits
    each node once (O(edges), not O(paths)); the oracle is a DuckDB
    recursive CTE taking min(d) over path depths — same answer, the
    path-enumerating formulation BFS avoids. All-bigint -> EXACT."""
    from pfutil_spark.operators.graph import bfs_distances

    edges = _copurchase_edges(spark, sf_dir)
    srcs = _first_order_parts(spark, sf_dir)
    d = bfs_distances(edges, srcs, max_hops=2)
    return (
        d.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .orderBy("dist")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # exact, DuckDB-oracled
        "sha256_rows": _q_sha256_rows,
        "exact_distinct_by_lang": _q_exact_distinct_by_lang,
        "events_distinct_users": _q_events_distinct_users,
        "orders_customer_join": _q_orders_customer_join,
        "lineitem_pricing": _q_lineitem_pricing,
        "shipping_priority": _q_shipping_priority,
        "parts_by_brand": _q_parts_by_brand,
        "top_users": _q_top_users,
        "nation_region_rollup": _q_nation_region_rollup,
        "hll_error_bound": _q_hll_error_bound,
        "text_quality": _q_text_quality,
        "exact_dedup_groups": _q_exact_dedup_groups,
        "fingerprint_consistency": _q_fingerprint_consistency,
        "embedding_topk": _q_embedding_topk,
        "cms_within_bound": _q_cms_within_bound,
        "kll_median_bound": _q_kll_median_bound,
        "tdigest_tail_bound": _q_tdigest_tail_bound,
        "bloom_no_false_negatives": _q_bloom_no_false_negatives,
        "asof_join": _q_asof_join,
        "sessionize": _q_sessionize,
        "window_rank": _q_window_rank,
        "approx_topk": _q_approx_topk,
        "hll_set_ops_bound": _q_hll_set_ops_bound,
        "kmv_set_ops_bound": _q_kmv_set_ops_bound,
        "join_size_bound": _q_join_size_bound,
        "priority_customer_overlap": _q_priority_customer_overlap,
        "hash_sample_split": _q_hash_sample_split,
        "rollup_estimates": _q_rollup_estimates,
        # round-4 additions: pretraining-pipeline text/sampling ops,
        # all exact DuckDB parity
        "doc_repetition": _q_doc_repetition,
        "top_terms_by_lang": _q_top_terms_by_lang,
        "token_shard_packing": _q_token_shard_packing,
        "doc_chunks": _q_doc_chunks,
        "chunk_pack_manifest": _q_chunk_pack_manifest,
        "length_drift_by_lang": _q_length_drift_by_lang,
        "events_temporal_drift": _q_events_temporal_drift,
        "length_clip_by_lang": _q_length_clip_by_lang,
        "distinctive_terms": _q_distinctive_terms,
        "events_drift_report": _q_events_drift_report,
        "partkey_cardinality_drift": _q_partkey_cardinality_drift,
        "user_topk_drift": _q_user_topk_drift,
        "pii_scan_report": _q_pii_scan_report,
        "lang_mix_sample": _q_lang_mix_sample,
        "ngram_contamination": _q_ngram_contamination,
        "bloom_contamination": _q_bloom_contamination,
        "doc_boilerplate": _q_doc_boilerplate,
        "quality_filter_funnel": _q_quality_filter_funnel,
        "sampled_customer_orders": _q_sampled_customer_orders,
        "weighted_quantile_bound": _q_weighted_quantile_bound,
        "weighted_kll_bound": _q_weighted_kll_bound,
        "weighted_topk": _q_weighted_topk,
        "sketch_profile_report": _q_sketch_profile_report,
        "length_decile_buckets": _q_length_decile_buckets,
        "dedup_representatives": _q_dedup_representatives,
        # round-5 additions: corpus-curation ops, all exact DuckDB parity
        "source_mixture_sample": _q_source_mixture_sample,
        "source_cap_sample": _q_source_cap_sample,
        "dedup_cluster_stats": _q_dedup_cluster_stats,
        "boilerplate_clean": _q_boilerplate_clean,
        "doc_oov_stats": _q_doc_oov_stats,
        "script_mix_by_lang": _q_script_mix_by_lang,
        "cross_source_dups": _q_cross_source_dups,
        "knn_join_topk": _q_knn_join_topk,
        "vocab_churn": _q_vocab_churn,
        "corpus_summary_report": _q_corpus_summary_report,
        "line_dedup_clean": _q_line_dedup_clean,
        "user_retention": _q_user_retention,
        "top_bigrams_by_lang": _q_top_bigrams_by_lang,
        "ngram_novelty": _q_ngram_novelty,
        "curation_manifest": _q_curation_manifest,
        "retention_within_7": _q_retention_within_7,
        "source_profile_report": _q_source_profile_report,
        "event_funnel": _q_event_funnel,
        "rolling_active_users": _q_rolling_active_users,
        "props_json_stats": _q_props_json_stats,
        "mixture_token_plan": _q_mixture_token_plan,
        "length_percentile_by_lang": _q_length_percentile_by_lang,
        "source_vocab_overlap": _q_source_vocab_overlap,
        # round-5 fifth session: stats / search / repeated-span surface
        "length_histogram_by_lang": _q_length_histogram_by_lang,
        "daily_event_anomalies": _q_daily_event_anomalies,
        "user_event_degree_dist": _q_user_event_degree_dist,
        "keyword_search_topk": _q_keyword_search_topk,
        "word_pair_lift": _q_word_pair_lift,
        "repeated_substring_spans": _q_repeated_substring_spans,
        "repeated_span_coverage": _q_repeated_span_coverage,
        "regional_revenue": _q_regional_revenue,
        "token_mass_histogram": _q_token_mass_histogram,
        "orders_customer_integrity": _q_orders_customer_integrity,
        "document_snapshot_diff": _q_document_snapshot_diff,
        "event_transition_matrix": _q_event_transition_matrix,
        "daily_type_pivot": _q_daily_type_pivot,
        "orders_zorder_keys": _q_orders_zorder_keys,
        "shipping_window_activity": _q_shipping_window_activity,
        "copurchase_triangles": _q_copurchase_triangles,
        "term_postings": _q_term_postings,
        "forecast_revenue": _q_forecast_revenue,
        "top_return_customers": _q_top_return_customers,
        "fuzzy_dedup_edits": _q_fuzzy_dedup_edits,
        "user_join_skew": _q_user_join_skew,
        "unicode_normalization_stats": _q_unicode_normalization_stats,
        "large_volume_customers": _q_large_volume_customers,
        "promo_revenue": _q_promo_revenue,
        "skew_salted_join": _q_skew_salted_join,
        "part_pagerank": _q_part_pagerank,
        "part_reachability": _q_part_reachability,
        "part_seed_assignment": _q_part_seed_assignment,
        "part_pagerank_weighted": _q_part_pagerank_weighted,
        "late_shipment_priority": _q_late_shipment_priority,
        "idle_customers": _q_idle_customers,
        "top_session_paths": _q_top_session_paths,
        "pricing_rollup": _q_pricing_rollup,
        "documents_upsert": _q_documents_upsert,
        "streaming_upsert_snapshot": _q_streaming_upsert_snapshot,
        "above_average_orders": _q_above_average_orders,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "customer_status_sets": _q_customer_status_sets,
        # sketch/dedup/ANN queries — also DuckDB-oracled since round 2:
        # estimate-vs-exact bound booleans, exact-verified near-dup pair
        # sets, and an SQL mirror of the langid heuristic (pytest gates
        # additionally cover byte parity and error bounds)
        "hll_text_by_lang": _q_hll_text_by_lang,
        "hll_users_global": _q_hll_users_global,
        "hll_v5_orderkey_by_flag": _q_hll_v5_orderkey_by_flag,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "containment_dups": _q_containment_dups,
        "incremental_dedup_pairs": _q_incremental_dedup,
        "dedup_clusters": _q_dedup_clusters,
        "cluster_split": _q_cluster_split,
        "simhash_near_dups": _q_simhash_near_dups,
        "langid_distribution": _q_langid_distribution,
        "ann_topk": _q_ann_topk,
        "multimodal_features": _q_multimodal_features,
        "multi_distinct_report": _q_multi_distinct_report,
        "table_profile_report": _q_table_profile,
        # round-2 additions
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_clusters": _q_embedding_clusters,
        "hll_time_rollup": _q_hll_time_rollup,
        "hll_sliding_window": _q_hll_sliding_window,
        "video_frame_sample": _q_video_frame_sample,
        "text_stats": _q_text_stats,
        "dump_restore_roundtrip": _q_dump_restore_roundtrip,
        "sql_surface": _q_sql_surface,
    }


# SQL mirror of _copurchase_edges (shared by the part_pagerank /
# part_reachability oracles): distinct a<b co-purchase pairs, then
# symmetrized into directed edge list e(a, b).
_COPURCHASE_E_CTE = (
    "pairs AS ("
    " SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b"
    " FROM lineitem x JOIN lineitem y"
    "  ON x.l_orderkey = y.l_orderkey"
    "  AND x.l_partkey < y.l_partkey"
    " WHERE x.l_orderkey IS NOT NULL"
    "  AND x.l_partkey IS NOT NULL AND y.l_partkey IS NOT NULL),"
    " e AS (SELECT a, b FROM pairs"
    "  UNION ALL SELECT b AS a, a AS b FROM pairs)"
)


# Recursive-CTE mirror of the near-dup CLUSTER pipeline (shared by the
# dedup_clusters / cluster_split oracles): exact 5-gram pair set at
# jaccard >= 0.8 (the minhash_lsh_pairs ground truth), symmetrized
# edges, transitive reachability, min reachable id per node.
_CLUSTER_CTE = (
    "WITH RECURSIVE g AS (SELECT unnest(range(1,"
    "  (SELECT max(length(text)) + 1 FROM documents))) AS i),"
    " sh AS ("
    " SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 5) AS s"
    " FROM documents d JOIN g ON g.i <= length(d.text) - 4),"
    " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
    " inter AS ("
    "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i"
    "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
    "  GROUP BY a.doc_id, b.doc_id),"
    " pairs AS ("
    "  SELECT id_a, id_b FROM inter"
    "  JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b"
    "  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.8),"
    " edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
    "  UNION ALL SELECT id_b, id_a FROM pairs),"
    " reach(node, root) AS ("
    "  SELECT doc_id, doc_id FROM documents"
    "  UNION"
    "  SELECT e.b, reach.root FROM reach JOIN edges e ON e.a = reach.node),"
    " clusters AS (SELECT node AS doc_id, min(root) AS cluster_id"
    "  FROM reach GROUP BY node)"
)


def oracle_sql() -> dict[str, str]:
    from pfutil_spark.functions.layout import morton_sql_expr

    _zkey = morton_sql_expr(
        "o_custkey",
        "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))",
        16,
    )
    oracles = {
        "sha256_rows": (
            "SELECT doc_id, sha256(text) AS content_sha FROM documents"
        ),
        "exact_distinct_by_lang": (
            "SELECT lang, count(*) AS cnt,"
            " count(DISTINCT sha256(text)) AS exact_distinct"
            " FROM documents GROUP BY lang"
        ),
        "events_distinct_users": (
            "SELECT event_type, count(*) AS cnt,"
            " count(DISTINCT user_id) AS exact_users"
            " FROM events GROUP BY event_type"
        ),
        "orders_customer_join": (
            "SELECT c_mktsegment, count(*) AS order_cnt,"
            " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,"
            " count(DISTINCT o_custkey) AS distinct_custs"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " GROUP BY c_mktsegment"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,"
            " count(*) AS count_order"
            " FROM lineitem"
            " WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
            " GROUP BY l_returnflag, l_linestatus"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,"
            " o_orderpriority, round(revenue, 4) AS revenue FROM ("
            " SELECT l_orderkey, o_orderdate, o_orderpriority,"
            "  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"
            "   AS DOUBLE) AS revenue"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " WHERE c_mktsegment = 'BUILDING'"
            "  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'"
            "  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'"
            " GROUP BY l_orderkey, o_orderdate, o_orderpriority"
            " ORDER BY revenue DESC, l_orderkey ASC LIMIT 10)"
        ),
        "parts_by_brand": (
            "SELECT p_brand, count(*) AS cnt, count(DISTINCT p_type) AS types,"
            " CAST(max(p_retailprice) AS DOUBLE) AS max_price"
            " FROM part WHERE p_size >= 20 AND p_type NOT LIKE 'SMALL%'"
            " GROUP BY p_brand"
        ),
        "top_users": (
            "SELECT user_id, count(*) AS cnt FROM events"
            " GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10"
        ),
        "nation_region_rollup": (
            "SELECT r_name, count(*) AS cust_cnt,"
            " CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum"
            " FROM customer"
            " JOIN nation ON c_nationkey = n_nationkey"
            " JOIN region ON n_regionkey = r_regionkey"
            " GROUP BY r_name"
        ),
        "hll_error_bound": (
            "SELECT lang, TRUE AS within_bound FROM documents GROUP BY lang"
        ),
        "text_quality": (
            "SELECT doc_id,"
            " CASE WHEN length(trim(text)) = 0 THEN 0"
            "      ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n_tokens,"
            " length(text) - length(regexp_replace(text, '[.,;:!?\"''`]', '', 'g'))"
            "   AS n_punct,"
            " length(text) AS n_chars_calc"
            " FROM documents"
        ),
        "exact_dedup_groups": (
            "SELECT sha256(text) AS content_sha, min(doc_id) AS keep_id,"
            " count(*) AS dup_cnt FROM documents GROUP BY sha256(text)"
        ),
        "fingerprint_consistency": (
            "SELECT sha256(text) AS content_sha, TRUE AS consistent"
            " FROM documents GROUP BY sha256(text)"
        ),
        "embedding_topk": (
            "WITH q AS (SELECT ["
            + ",".join("1.0" if i % 2 == 0 else "-0.5" for i in range(64))
            + "]::DOUBLE[] AS v)"
            " SELECT vec_id,"
            " round(list_cosine_similarity(embedding::DOUBLE[], (SELECT v FROM q)), 4)"
            "   AS cosine_r"
            " FROM embeddings ORDER BY cosine_r DESC, vec_id ASC LIMIT 10"
        ),
        "cms_within_bound": (
            "SELECT event_type, TRUE AS within_bound FROM events GROUP BY event_type"
        ),
        "kll_median_bound": (
            "SELECT event_type, TRUE AS within_bound FROM events GROUP BY event_type"
        ),
        "tdigest_tail_bound": (
            "SELECT event_type, TRUE AS within_bound FROM events GROUP BY event_type"
        ),
        "bloom_no_false_negatives": (
            "SELECT TRUE AS no_false_negatives"
        ),
        "asof_join": (
            "WITH quotes AS ("
            " SELECT user_id, ts, max(value) AS ref_value FROM events"
            " WHERE event_id % 3 = 0 GROUP BY user_id, ts)"
            " SELECT l.event_id, r.ref_value FROM events l"
            " ASOF LEFT JOIN quotes r"
            " ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "sessionize": (
            "SELECT event_id, CAST(sum(is_new) OVER ("
            " PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM ("
            " SELECT event_id, user_id, ts,"
            "  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
            "        IS NULL"
            "   OR epoch(ts) - epoch(lag(ts) OVER ("
            "       PARTITION BY user_id ORDER BY ts, event_id)) > 1800"
            "  THEN 1 ELSE 0 END AS is_new FROM events)"
        ),
        "window_rank": (
            "SELECT event_id, event_type, rnk FROM ("
            " SELECT event_id, event_type,"
            "  row_number() OVER (PARTITION BY event_type"
            "   ORDER BY value DESC, event_id ASC) AS rnk"
            " FROM events) WHERE rnk <= 5"
        ),
        "approx_topk": (
            "SELECT event_type AS value, count(*) AS cnt FROM events"
            " GROUP BY event_type ORDER BY cnt DESC, value LIMIT 3"
        ),
        "hll_set_ops_bound": (
            "SELECT TRUE AS union_ok, TRUE AS intersect_ok"
        ),
        # sql_split_expr/sql_frac_expr are the single source of truth for
        # the thresholds: they accumulate the split weights with the SAME
        # float ops as hash_split_col, so the hex threshold strings are
        # bit-identical (0.8+0.1 != 0.9 exactly in binary floats)
        "hash_sample_split": (
            "SELECT lang,"
            f" {_sampling.sql_split_expr('doc_id', seed=7)} AS split,"
            " count(*) AS n_docs,"
            " CAST(sum(CASE WHEN"
            f" {_sampling.sql_frac_expr('doc_id', seed=11)}"
            f" < '{_sampling._threshold_hex(0.25)}' THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_sampled"
            " FROM documents GROUP BY lang, split ORDER BY lang, split"
        ),
        "doc_repetition": (
            # exact mirror of functions/text.py::word_repetition_stats:
            # unnest the single-space split, count per (doc, word), then
            # totals + the (max count, min word) argmax per doc
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word"
            "  FROM documents),"
            " wc AS (SELECT doc_id, word, count(*) AS cnt FROM w"
            "  GROUP BY doc_id, word),"
            " s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,"
            "  count(*) AS n_distinct_words, max(cnt) AS top_cnt FROM wc"
            "  GROUP BY doc_id),"
            " t AS (SELECT doc_id, min(word) AS top_word FROM wc"
            "  JOIN s USING (doc_id) WHERE cnt = top_cnt GROUP BY doc_id)"
            # fractions UNROUNDED: one IEEE division each, so the
            # doubles are bit-identical cross-engine; round(x,4) is NOT
            # (HALF_UP vs scale-multiply diverge at boundary ratios)
            " SELECT s.doc_id, n_words, n_distinct_words,"
            " 1.0 - CAST(n_distinct_words AS DOUBLE) / n_words"
            "  AS dup_word_frac,"
            " t.top_word,"
            " CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac"
            " FROM s JOIN t USING (doc_id) ORDER BY s.doc_id"
        ),
        "token_shard_packing": _token_shard_packing_oracle_sql(),
        "table_profile_report": _table_profile_oracle_sql(),
        "chunk_pack_manifest": _chunk_pack_manifest_oracle_sql(),
        "length_drift_by_lang": _length_drift_oracle_sql(),
        "events_temporal_drift": _events_temporal_drift_oracle_sql(),
        "events_drift_report": _events_drift_oracle_sql(),
        "partkey_cardinality_drift": (
            "WITH s AS (SELECT l_returnflag,"
            "  CAST(l_partkey AS VARCHAR) AS pk, "
            + _sampling.sql_split_expr(
                "l_orderkey", (("a", 0.5), ("b", 0.5)), seed=0
            )
            + " AS half FROM lineitem),"
            " p AS (SELECT l_returnflag, pk,"
            "  max(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS in_a,"
            "  max(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS in_b"
            "  FROM s GROUP BY 1, 2)"
            " SELECT l_returnflag,"
            "  CAST(sum(in_a) AS BIGINT) AS n_cur,"
            "  CAST(sum(in_b) AS BIGINT) AS n_ref,"
            "  CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_new,"
            "  TRUE AS cur_ok, TRUE AS ref_ok, TRUE AS new_ok"
            " FROM p GROUP BY 1 ORDER BY 1"
        ),
        "user_topk_drift": (
            "WITH s AS (SELECT CAST(user_id AS VARCHAR) AS v, "
            + _sampling.sql_split_expr(
                "event_id", (("a", 0.5), ("b", 0.5)), seed=0
            )
            + " AS half FROM events"
            "  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),"
            " c AS (SELECT half, v, count(*) AS cnt FROM s GROUP BY 1, 2),"
            " r AS (SELECT half, v, cnt, row_number() OVER ("
            "   PARTITION BY half ORDER BY cnt DESC, v ASC) AS rk FROM c),"
            " ta AS (SELECT v, cnt FROM r WHERE half = 'a' AND rk <= 10),"
            " tb AS (SELECT v, cnt FROM r WHERE half = 'b' AND rk <= 10)"
            " SELECT coalesce(ta.v, tb.v) AS value,"
            "  CASE WHEN ta.v IS NOT NULL AND tb.v IS NOT NULL THEN 'stayed'"
            "   WHEN ta.v IS NOT NULL THEN 'entered' ELSE 'exited' END"
            "   AS status,"
            "  CAST(ta.cnt AS BIGINT) AS est_cur,"
            "  CAST(tb.cnt AS BIGINT) AS est_ref"
            " FROM ta FULL OUTER JOIN tb ON ta.v = tb.v ORDER BY value"
        ),
        "length_clip_by_lang": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_total,"
            " TRUE AS within_bound FROM documents"
            " WHERE lang IS NOT NULL AND n_chars IS NOT NULL"
            " GROUP BY lang ORDER BY lang"
        ),
        "distinctive_terms": (
            "WITH toks AS (SELECT doc_id,"
            "  unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL"
            "  AND len(trim(text)) > 0),"
            " tf AS (SELECT doc_id, term, count(*) AS tf"
            "  FROM toks GROUP BY 1, 2),"
            " dfq AS (SELECT *, count(*) OVER (PARTITION BY term)"
            "   AS doc_freq FROM tf),"
            " r AS (SELECT doc_id, term, tf, doc_freq,"
            "   tf / doc_freq AS score,"
            "   row_number() OVER (PARTITION BY doc_id"
            "    ORDER BY tf / doc_freq DESC, term ASC) AS term_rank"
            "  FROM dfq)"
            " SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term,"
            "  CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq,"
            "  score FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank"
        ),
        "doc_chunks": (
            "WITH base AS (SELECT doc_id, trim(text) AS t FROM documents"
            "  WHERE doc_id IS NOT NULL AND text IS NOT NULL),"
            " tok AS (SELECT doc_id, regexp_split_to_array(t, '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS w,"
            "  CASE WHEN len(t) = 0 THEN 0"
            "   ELSE len(regexp_split_to_array(t, '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n FROM base),"
            " g AS (SELECT unnest(range(0,"
            "  (SELECT coalesce(max(n), 0) FROM tok), 16)) AS s)"
            " SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_idx,"
            "  CAST(least(24, n - s) AS BIGINT) AS n_chunk_tokens,"
            "  array_to_string(w[(s + 1)::INT : (s + 24)::INT], ' ')"
            "   AS chunk_text"
            " FROM tok JOIN g ON g.s < n ORDER BY doc_id, chunk_idx"
        ),
        "top_terms_by_lang": (
            "WITH toks AS (SELECT lang, doc_id,"
            "  unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents WHERE len(trim(text)) > 0),"
            " tf AS (SELECT lang, term, count(*) AS tc"
            "  FROM toks GROUP BY 1, 2),"
            " dfq AS (SELECT term, count(*) AS dfc FROM"
            "  (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),"
            " r AS (SELECT lang, row_number() OVER (PARTITION BY lang"
            "   ORDER BY tc DESC, term ASC) AS term_rank,"
            "  term, tc, dfc FROM tf JOIN dfq USING (term))"
            " SELECT lang, CAST(term_rank AS BIGINT) AS term_rank, term,"
            "  CAST(tc AS BIGINT) AS term_count, CAST(dfc AS BIGINT) AS doc_freq"
            " FROM r WHERE term_rank <= 8 ORDER BY lang, term_rank"
        ),
        "top_bigrams_by_lang": (
            # tokenizer = the Java-\s-equivalent explicit class (the
            # RE2-vs-Java \x0B trap); bigram join with a single space
            # mirrors word_shingles_col's array_join
            "WITH toks AS (SELECT lang,"
            "  regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS ws"
            "  FROM documents WHERE len(trim(coalesce(text, ''))) > 0),"
            " grams AS (SELECT lang,"
            "  unnest(list_transform(range(1, len(ws)),"
            "   i -> ws[i] || ' ' || ws[i+1])) AS ngram"
            "  FROM toks),"
            " counts AS (SELECT lang, ngram, count(*) AS nc"
            "  FROM grams GROUP BY 1, 2),"
            " r AS (SELECT lang, row_number() OVER (PARTITION BY lang"
            "   ORDER BY nc DESC, ngram ASC) AS ngram_rank, ngram, nc"
            "  FROM counts)"
            " SELECT lang, CAST(ngram_rank AS BIGINT) AS ngram_rank,"
            "  ngram, CAST(nc AS BIGINT) AS ngram_count"
            " FROM r WHERE ngram_rank <= 10 ORDER BY lang, ngram_rank"
        ),
        "ngram_novelty": (
            "WITH lab AS (SELECT doc_id,"
            "  regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS words,"
            f"  {_sampling.sql_split_expr('doc_id', (('probe', 0.5), ('ref', 0.5)), seed=29)}"
            "   AS split FROM documents),"
            " g AS (SELECT unnest(range(1,"
            "   (SELECT max(len(words)) + 1 FROM lab))) AS i),"
            " refs AS (SELECT DISTINCT"
            "   array_to_string(l.words[g.i::INT : g.i::INT + 2], ' ') AS sh"
            "   FROM lab l JOIN g ON g.i + 2 <= len(l.words)"
            "   WHERE l.split = 'ref'),"
            " prs AS (SELECT DISTINCT l.doc_id,"
            "   array_to_string(l.words[g.i::INT : g.i::INT + 2], ' ') AS sh"
            "   FROM lab l JOIN g ON g.i + 2 <= len(l.words)"
            "   WHERE l.split = 'probe'),"
            " per AS (SELECT p.doc_id,"
            "   CAST(count(*) AS BIGINT) AS n_ngrams,"
            "   CAST(count(*) FILTER (WHERE r.sh IS NULL) AS BIGINT)"
            "    AS n_novel"
            "   FROM prs p LEFT JOIN refs r ON p.sh = r.sh"
            "   GROUP BY p.doc_id)"
            " SELECT l.doc_id,"
            " CAST(coalesce(per.n_ngrams, 0) AS BIGINT) AS n_ngrams,"
            " CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,"
            # same single IEEE division as try_divide; NULL for docs
            # with fewer than 3 tokens
            " per.n_novel / NULLIF(per.n_ngrams, 0) AS novelty_frac"
            " FROM (SELECT DISTINCT doc_id FROM lab WHERE split = 'probe') l"
            " LEFT JOIN per ON l.doc_id = per.doc_id"
            " ORDER BY l.doc_id"
        ),
        "pii_scan_report": _pii_scan_report_oracle_sql(),
        "lang_mix_sample": (
            _sampling.sql_geometric_mix_expr(
                "documents", "doc_id", "lang", seed=0,
                key_alias="doc_id", strata_alias="lang",
            )
            + " ORDER BY r.key"
        ),
        "source_mixture_sample": (
            _sampling.sql_mixture_select(
                "documents", "doc_id", "source", _MIX_WEIGHTS,
                total_factor=2, seed=3,
                key_alias="doc_id", source_alias="source",
            )
            + " ORDER BY k, epoch"
        ),
        "curation_manifest": (
            "WITH tok AS (SELECT doc_id, source, lang,"
            "  CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0"
            "   ELSE len(regexp_split_to_array(trim(text),"
            "    '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n_tokens"
            "  FROM documents),"
            " keepers AS (SELECT min(doc_id) AS keep_id"
            "  FROM documents GROUP BY sha256(text)),"
            " gated AS (SELECT t.* FROM tok t"
            "  JOIN keepers k ON t.doc_id = k.keep_id"
            "  WHERE t.n_tokens >= 20 AND t.n_tokens <= 80),"
            " capped AS ("
            + _sampling.sql_cap_select(
                "gated", "doc_id", "source", 15, seed=3,
                key_alias="doc_id", group_alias="source",
            )
            + ")"
            " SELECT g.doc_id, g.source, g.lang,"
            " CAST(g.n_tokens AS BIGINT) AS n_tokens"
            " FROM gated g JOIN capped c ON g.doc_id = c.doc_id"
            " ORDER BY g.doc_id"
        ),
        "source_cap_sample": (
            _sampling.sql_cap_select(
                "documents", "doc_id", "source", 15, seed=11,
                key_alias="doc_id", group_alias="source",
            )
            + " ORDER BY doc_id"
        ),
        "dedup_cluster_stats": (
            _CLUSTER_CTE
            + ", sz AS (SELECT cluster_id, count(*) AS cluster_size"
            " FROM clusters GROUP BY cluster_id),"
            " hist AS (SELECT cluster_size, count(*) AS n_clusters,"
            " CAST(sum(cluster_size) AS BIGINT) AS n_docs"
            " FROM sz GROUP BY cluster_size)"
            " SELECT cluster_size, n_clusters, n_docs,"
            # numerator cast to DOUBLE, denominator BIGINT: DuckDB
            # promotes and divides exactly like Spark's long/long `/`
            " CAST(n_docs AS DOUBLE) /"
            " (SELECT CAST(sum(n_docs) AS BIGINT) FROM hist) AS frac_docs"
            " FROM hist ORDER BY cluster_size"
        ),
        "boilerplate_clean": (
            "WITH lab AS (SELECT doc_id, string_split(text, ' ') AS ws"
            " FROM documents),"
            " g AS (SELECT unnest(range(1,"
            "  (SELECT max(len(ws)) + 1 FROM lab))) AS i),"
            " ln AS (SELECT l.doc_id, g.i AS pos,"
            "  list_extract(l.ws, g.i::INT) AS line"
            "  FROM lab l JOIN g ON g.i <= len(l.ws)),"
            " c AS (SELECT line, count(DISTINCT doc_id) AS nd"
            "  FROM ln GROUP BY line),"
            " boiler AS (SELECT line FROM c WHERE nd > 400),"
            " kept AS (SELECT ln.doc_id, ln.pos, ln.line FROM ln"
            "  LEFT JOIN boiler b ON ln.line = b.line WHERE b.line IS NULL),"
            " agg AS (SELECT doc_id,"
            "  string_agg(line, ' ' ORDER BY pos) AS clean_text,"
            "  count(*) AS n_kept FROM kept GROUP BY doc_id),"
            " tot AS (SELECT doc_id, count(*) AS n_lines"
            "  FROM ln GROUP BY doc_id)"
            " SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,"
            " CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept,"
            " CAST(coalesce(t.n_lines, 0) - coalesce(a.n_kept, 0) AS BIGINT)"
            "  AS n_lines_removed"
            " FROM documents d"
            " LEFT JOIN tot t ON d.doc_id = t.doc_id"
            " LEFT JOIN agg a ON d.doc_id = a.doc_id"
            " ORDER BY d.doc_id"
        ),
        "doc_oov_stats": (
            "WITH toks AS (SELECT doc_id,"
            "  unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS tok"
            "  FROM documents"
            "  WHERE length(trim(coalesce(text, ''))) > 0),"
            " vocab AS (SELECT tok AS term FROM toks GROUP BY tok"
            "  HAVING count(*) >= 3"
            "  ORDER BY count(*) DESC, term ASC LIMIT 50),"
            " agg AS (SELECT t.doc_id,"
            "  CAST(count(*) AS BIGINT) AS n_tokens,"
            "  CAST(count(*) FILTER (WHERE v.term IS NULL) AS BIGINT)"
            "   AS n_oov"
            "  FROM toks t LEFT JOIN vocab v ON t.tok = v.term"
            "  GROUP BY t.doc_id)"
            " SELECT d.doc_id,"
            " CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,"
            " CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,"
            # same single IEEE division as the Spark side; NULL when a
            # doc has zero tokens
            " CAST(coalesce(a.n_oov, 0) AS DOUBLE)"
            "  / NULLIF(CAST(coalesce(a.n_tokens, 0) AS BIGINT), 0)"
            "  AS oov_frac"
            " FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
            " ORDER BY d.doc_id"
        ),
        "script_mix_by_lang": (
            # explicit BMP ranges: identical semantics in RE2 and Java
            # regex; DuckDB regexp_replace needs the 'g' flag (Spark's
            # replaces all matches by default)
            "WITH per AS (SELECT lang,"
            "  length(coalesce(text, '')) AS n_chars,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''), '[A-Za-z]', '', 'g')) AS n_latin,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''), '[0-9]', '', 'g')) AS n_digit,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''),"
            "   '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]',"
            "   '', 'g')) AS n_cjk,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''), '[\\x{0400}-\\x{04FF}]', '', 'g'))"
            "   AS n_cyrillic,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''), '[\\x{0600}-\\x{06FF}]', '', 'g'))"
            "   AS n_arabic,"
            "  length(coalesce(text, '')) - length(regexp_replace("
            "   coalesce(text, ''), '[ \\t\\n\\r\\x{000B}\\x{000C}]',"
            "   '', 'g')) AS n_ws"
            "  FROM documents)"
            " SELECT lang,"
            " CAST(sum(n_chars) AS BIGINT) AS total_chars,"
            " CAST(sum(n_latin) AS BIGINT) AS latin_chars,"
            " CAST(sum(n_digit) AS BIGINT) AS digit_chars,"
            " CAST(sum(n_cjk) AS BIGINT) AS cjk_chars,"
            " CAST(sum(n_cyrillic) AS BIGINT) AS cyrillic_chars,"
            " CAST(sum(n_arabic) AS BIGINT) AS arabic_chars,"
            " CAST(sum(n_ws) AS BIGINT) AS ws_chars,"
            " CAST(sum(n_chars) - sum(n_latin) - sum(n_digit)"
            "  - sum(n_cjk) - sum(n_cyrillic) - sum(n_arabic)"
            "  - sum(n_ws) AS BIGINT) AS other_chars,"
            " CAST(sum(n_latin) AS DOUBLE)"
            "  / NULLIF(CAST(sum(n_chars) AS BIGINT), 0) AS latin_frac"
            " FROM per GROUP BY lang ORDER BY lang"
        ),
        "cross_source_dups": (
            # same all-pairs ground truth as minhash_lsh_pairs, rolled
            # up per unordered source combination
            "WITH g AS (SELECT unnest(range(1,"
            "  (SELECT max(length(text)) + 1 FROM documents))) AS i),"
            " sh AS ("
            " SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 5) AS s"
            " FROM documents d JOIN g ON g.i <= length(d.text) - 4),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id),"
            " p AS (SELECT id_a, id_b FROM inter"
            "  JOIN cnt ca ON ca.doc_id = id_a"
            "  JOIN cnt cb ON cb.doc_id = id_b"
            "  WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.8),"
            # null-safe normalization mirrors the operator exactly:
            # NULL always lands in source_b, whichever side it arrives
            # on (a bare <= CASE would send a NULL db.source to
            # source_a via the ELSE branch)
            " m AS (SELECT"
            "  CASE WHEN (db.source IS NULL AND da.source IS NOT NULL)"
            "   OR da.source <= db.source THEN da.source"
            "   ELSE db.source END AS source_a,"
            "  CASE WHEN (db.source IS NULL AND da.source IS NOT NULL)"
            "   OR da.source <= db.source THEN db.source"
            "   ELSE da.source END AS source_b"
            "  FROM p JOIN documents da ON p.id_a = da.doc_id"
            "  JOIN documents db ON p.id_b = db.doc_id)"
            " SELECT source_a, source_b,"
            " CAST(count(*) AS BIGINT) AS n_pairs,"
            " CAST(count(*) AS DOUBLE)"
            "  / (SELECT CAST(count(*) AS BIGINT) FROM m) AS pair_frac"
            " FROM m GROUP BY source_a, source_b"
            " ORDER BY source_a, source_b"
        ),
        "knn_join_topk": (
            "WITH s AS (SELECT q.vec_id AS query_id, b.vec_id AS base_id,"
            "  list_cosine_similarity(q.embedding::DOUBLE[],"
            "   b.embedding::DOUBLE[]) AS c"
            "  FROM embeddings q JOIN embeddings b"
            "  ON b.vec_id <> q.vec_id WHERE q.vec_id < 5),"
            " r AS (SELECT query_id, base_id, c,"
            "  row_number() OVER (PARTITION BY query_id"
            "   ORDER BY c DESC, base_id ASC) AS knn_rank FROM s)"
            " SELECT query_id, CAST(knn_rank AS BIGINT) AS knn_rank,"
            " base_id, round(c, 4) AS cosine_r"
            " FROM r WHERE knn_rank <= 5 ORDER BY query_id, knn_rank"
        ),
        "vocab_churn": (
            "WITH s AS (SELECT "
            + _sampling.sql_split_expr(
                "doc_id", (("a", 0.5), ("b", 0.5)), seed=0
            )
            + " AS half,"
            "  unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+'))"
            "   AS v"
            "  FROM documents WHERE doc_id IS NOT NULL"
            "  AND length(trim(coalesce(text, ''))) > 0),"
            " c AS (SELECT half, v, count(*) AS cnt FROM s GROUP BY 1, 2),"
            " r AS (SELECT half, v, cnt, row_number() OVER ("
            "   PARTITION BY half ORDER BY cnt DESC, v ASC) AS rk FROM c),"
            " ta AS (SELECT v, cnt FROM r WHERE half = 'a' AND rk <= 10),"
            " tb AS (SELECT v, cnt FROM r WHERE half = 'b' AND rk <= 10)"
            " SELECT coalesce(ta.v, tb.v) AS value,"
            "  CASE WHEN ta.v IS NOT NULL AND tb.v IS NOT NULL THEN 'stayed'"
            "   WHEN ta.v IS NOT NULL THEN 'entered' ELSE 'exited' END"
            "   AS status,"
            "  CAST(ta.cnt AS BIGINT) AS est_cur,"
            "  CAST(tb.cnt AS BIGINT) AS est_ref"
            " FROM ta FULL OUTER JOIN tb ON ta.v = tb.v ORDER BY value"
        ),
        "corpus_summary_report": (
            "WITH a AS (SELECT"
            "  CAST(count(*) AS BIGINT) AS n_docs,"
            "  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,"
            "  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,"
            "  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,"
            "  CAST(sum(n_chars) AS BIGINT) AS total_chars,"
            "  CAST(sum(CASE WHEN text IS NULL THEN NULL"
            "   WHEN length(trim(text)) = 0 THEN 0"
            "   ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+'))"
            "   END) AS BIGINT) AS total_tokens,"
            "  CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) = 0"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_docs"
            "  FROM documents)"
            " SELECT 'n_docs' AS metric, n_docs AS value FROM a"
            " UNION ALL SELECT 'n_sources', n_sources FROM a"
            " UNION ALL SELECT 'n_langs', n_langs FROM a"
            " UNION ALL SELECT 'n_distinct_texts', n_distinct_texts FROM a"
            " UNION ALL SELECT 'total_chars', total_chars FROM a"
            " UNION ALL SELECT 'total_tokens', total_tokens FROM a"
            " UNION ALL SELECT 'n_blank_docs', n_blank_docs FROM a"
            " ORDER BY metric"
        ),
        "line_dedup_clean": (
            "WITH lab AS (SELECT doc_id, string_split(text, ' ') AS ws"
            " FROM documents),"
            " g AS (SELECT unnest(range(1,"
            "  (SELECT max(len(ws)) + 1 FROM lab))) AS i),"
            " ln AS (SELECT l.doc_id, g.i AS pos,"
            "  list_extract(l.ws, g.i::INT) AS line"
            "  FROM lab l JOIN g ON g.i <= len(l.ws)),"
            " kept AS (SELECT doc_id, line, min(pos) AS pos"
            "  FROM ln GROUP BY doc_id, line),"
            " agg AS (SELECT doc_id,"
            "  string_agg(line, ' ' ORDER BY pos) AS clean_text,"
            "  count(*) AS n_kept FROM kept GROUP BY doc_id),"
            " tot AS (SELECT doc_id, count(*) AS n_lines"
            "  FROM ln GROUP BY doc_id)"
            " SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,"
            " CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept,"
            " CAST(coalesce(t.n_lines, 0) - coalesce(a.n_kept, 0) AS BIGINT)"
            "  AS n_lines_removed"
            " FROM documents d"
            " LEFT JOIN tot t ON d.doc_id = t.doc_id"
            " LEFT JOIN agg a ON d.doc_id = a.doc_id"
            " ORDER BY d.doc_id"
        ),
        "user_retention": (
            # naive-timestamp -> DATE both sides (no session tz); BIGINT
            # counts; retention_rate is the same single bigint/bigint
            # IEEE division Spark emits (DuckDB `/` on integers is float
            # division); est_ok is the bound boolean, literal TRUE here
            "WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d"
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
            " c AS (SELECT d, CAST(count(*) AS BIGINT) AS n"
            "  FROM a GROUP BY d),"
            " r AS (SELECT x.d AS d, CAST(count(*) AS BIGINT) AS rn"
            "  FROM a x JOIN a y ON y.u = x.u AND y.d = x.d + 1"
            "  GROUP BY x.d)"
            " SELECT strftime(c.d, '%Y-%m-%d') AS day_s,"
            " c.n AS active_users,"
            " CAST(coalesce(r.rn, 0) AS BIGINT) AS retained_next,"
            " CAST(coalesce(r.rn, 0) AS BIGINT) / c.n AS retention_rate,"
            " TRUE AS est_ok"
            " FROM c LEFT JOIN r ON r.d = c.d"
            " ORDER BY day_s"
        ),
        "source_vocab_overlap": (
            # the tokenizer class is the Java-\s-equivalent; exact side
            # mirrors the priority_customer_overlap relational shape
            "WITH toks AS (SELECT source AS s,"
            "  unnest(regexp_split_to_array(trim(text),"
            "   '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents"
            "  WHERE length(trim(coalesce(text, ''))) > 0),"
            " du AS (SELECT DISTINCT s, term FROM toks),"
            " c AS (SELECT s, count(*) AS c FROM du GROUP BY s),"
            " i AS (SELECT x.s AS a, y.s AS b, count(*) AS ix"
            "  FROM du x JOIN du y USING (term) WHERE x.s < y.s"
            "  GROUP BY 1, 2)"
            " SELECT ca.s AS a, cb.s AS b,"
            " CAST(ca.c + cb.c - coalesce(i.ix, 0) AS BIGINT) AS exact_union,"
            " CAST(coalesce(i.ix, 0) AS BIGINT) AS exact_intersect,"
            " TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS jaccard_ok"
            " FROM c ca JOIN c cb ON ca.s < cb.s"
            " LEFT JOIN i ON i.a = ca.s AND i.b = cb.s"
            " ORDER BY a, b"
        ),
        "length_percentile_by_lang": (
            "SELECT doc_id, lang, n_chars,"
            " cume_dist() OVER (PARTITION BY lang ORDER BY n_chars)"
            "  AS length_pct"
            " FROM documents ORDER BY doc_id"
        ),
        "length_histogram_by_lang": (
            # clamp-then-integer-div binning (dividend >= 0 after the
            # clamp, so // == floor == Spark's floor(double-div) under
            # the enforced 2^53 bound); dense axis = langs x range(6)
            "WITH langs AS (SELECT DISTINCT lang FROM documents),"
            " bins AS (SELECT unnest(range(6)) AS bin),"
            " c AS (SELECT lang,"
            "  GREATEST(0, LEAST(CAST(n_chars AS BIGINT), 599)) // 100"
            "   AS bin,"
            "  CAST(count(*) AS BIGINT) AS n"
            "  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2)"
            " SELECT l.lang, CAST(b.bin AS BIGINT) AS bin,"
            " CAST(b.bin * 100 AS BIGINT) AS bin_lo,"
            " CAST((b.bin + 1) * 100 AS BIGINT) AS bin_hi,"
            " CAST(coalesce(c.n, 0) AS BIGINT) AS n"
            " FROM langs l CROSS JOIN bins b"
            " LEFT JOIN c ON c.lang IS NOT DISTINCT FROM l.lang"
            "  AND c.bin = b.bin"
            " ORDER BY l.lang, bin"
        ),
        "daily_event_anomalies": (
            # integer-exact z-test both sides: (d*x - S)^2 vs
            # z2*(d*SS - S^2); sums CAST to BIGINT (the HUGEINT trap)
            "WITH c AS (SELECT event_type, CAST(ts AS DATE) AS d,"
            "  CAST(count(*) AS BIGINT) AS n"
            "  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),"
            " w AS (SELECT event_type, d, n,"
            "  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)"
            "   AS n_days,"
            "  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)"
            "   AS total,"
            "  CAST(sum(n * n) OVER (PARTITION BY event_type) AS BIGINT)"
            "   AS ss"
            "  FROM c)"
            " SELECT event_type, strftime(d, '%Y-%m-%d') AS day_s, n,"
            " n_days, total,"
            " CAST((n_days*n - total) * (n_days*n - total) AS BIGINT)"
            "  AS dev_sq,"
            " CAST(4 * (n_days*ss - total*total) AS BIGINT) AS var_scaled,"
            " (n_days*n - total) * (n_days*n - total)"
            "  > 4 * (n_days*ss - total*total) AS is_anomaly"
            " FROM w ORDER BY event_type, day_s"
        ),
        "user_event_degree_dist": (
            # naive DATE both sides (timestamp_ntz -> DATE, no tz)
            "WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day"
            "  FROM events"
            "  WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
            " d AS (SELECT user_id, CAST(count(*) AS BIGINT) AS degree"
            "  FROM e GROUP BY 1)"
            " SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes"
            " FROM d GROUP BY degree ORDER BY degree"
        ),
        "keyword_search_topk": (
            # linear idf: score = sum(tf * (N - df)), all bigint; the
            # tokenizer class is the Java-\s equivalent
            "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n"
            "  FROM documents),"
            " toks AS (SELECT doc_id,"
            "  unnest(regexp_split_to_array(trim(text),"
            "   '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents WHERE length(trim(text)) > 0),"
            " f AS (SELECT doc_id, term FROM toks"
            "  WHERE term IN ('join', 'filter', 'window')),"
            " tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf"
            "  FROM f GROUP BY 1, 2),"
            " d AS (SELECT *, CAST(count(*) OVER (PARTITION BY term)"
            "  AS BIGINT) AS dfreq FROM tf)"
            " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,"
            " CAST(sum(tf * ((SELECT n FROM n) - dfreq)) AS BIGINT)"
            "  AS score"
            " FROM d GROUP BY doc_id"
            " ORDER BY score DESC, doc_id ASC LIMIT 10"
        ),
        "word_pair_lift": (
            # vocabulary cutoff (term_docs desc, term asc) is a total
            # order -> the selected set is reproducible; lift is one
            # bigint-product / bigint-product division
            "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n"
            "  FROM documents),"
            " dt AS (SELECT DISTINCT doc_id, term FROM ("
            "  SELECT doc_id, unnest(regexp_split_to_array(trim(text),"
            "   '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents WHERE length(trim(text)) > 0)),"
            " v AS (SELECT term, CAST(count(*) AS BIGINT) AS term_docs"
            "  FROM dt GROUP BY term"
            "  ORDER BY term_docs DESC, term ASC LIMIT 64),"
            " dv AS (SELECT dt.doc_id, dt.term, v.term_docs"
            "  FROM dt JOIN v USING (term)),"
            " p AS (SELECT a.term AS term_a, b.term AS term_b,"
            "  CAST(count(*) AS BIGINT) AS pair_docs,"
            "  a.term_docs AS docs_a, b.term_docs AS docs_b"
            "  FROM dv a JOIN dv b"
            "   ON a.doc_id = b.doc_id AND a.term < b.term"
            "  GROUP BY 1, 2, 4, 5 HAVING count(*) >= 2)"
            " SELECT term_a, term_b, pair_docs, docs_a, docs_b,"
            " pair_docs * (SELECT n FROM n) / (docs_a * docs_b) AS lift"
            " FROM p ORDER BY pair_docs DESC, term_a, term_b LIMIT 15"
        ),
        "repeated_substring_spans": (
            # sliding 30-char grams -> corpus occurrence count (window
            # over the gram) -> covered positions -> island merge
            # (break when pos gap > k); mirrors repeated_spans exactly
            "WITH g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,"
            "  substr(text, CAST(t.i + 1 AS INT), 30) AS gram"
            "  FROM documents, unnest(range(length(text) - 29)) AS t(i)"
            "  WHERE text IS NOT NULL AND length(text) >= 30),"
            " c AS (SELECT doc_id, pos,"
            "  count(*) OVER (PARTITION BY gram) AS cnt FROM g),"
            " f AS (SELECT doc_id, pos FROM c WHERE cnt >= 2),"
            " w AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER"
            "   (PARTITION BY doc_id ORDER BY pos) > 30"
            "  THEN 1 ELSE 0 END AS brk FROM f),"
            " i AS (SELECT doc_id, pos, sum(brk) OVER"
            "  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)"
            "  AS isl FROM w)"
            " SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,"
            " CAST(max(pos) + 30 AS BIGINT) AS span_end,"
            " CAST(max(pos) + 30 - min(pos) AS BIGINT) AS span_len,"
            " CAST(count(*) AS BIGINT) AS n_windows"
            " FROM i GROUP BY doc_id, isl ORDER BY doc_id, span_start"
        ),
        "orders_zorder_keys": (
            # the SQL spelling of the same shift/mask spread
            # (morton_sql_expr) — identical 64-bit arithmetic
            "SELECT o_orderkey, o_custkey,"
            " CAST(date_diff('day', DATE '1995-01-01',"
            "  CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,"
            " CAST(" + _zkey + " AS BIGINT) AS zkey"
            " FROM orders ORDER BY zkey, o_orderkey LIMIT 20"
        ),
        "daily_type_pivot": (
            # portable pivot spelling: conditional sums; naive DATE
            "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day_s,"
            " CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS click,"
            " CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS error,"
            " CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0"
            "  END) AS BIGINT) AS purchase,"
            " CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS signup,"
            " CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS view,"
            " CAST(sum(CASE WHEN event_type IN ('click', 'error',"
            "  'purchase', 'signup', 'view') THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS total"
            " FROM events WHERE ts IS NOT NULL"
            " GROUP BY 1 ORDER BY day_s"
        ),
        "shipping_window_activity": (
            # the band predicate as a plain non-equi LEFT JOIN — the
            # semantics the bucketed equi-join rewrite must reproduce;
            # count(l_shipdate) counts only matched rows (0 for
            # NULL-date / quiet-week orders)
            "SELECT o_orderkey,"
            " CAST(count(l_shipdate) AS BIGINT) AS n_shipped"
            " FROM orders LEFT JOIN lineitem"
            " ON CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)"
            " AND CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE)"
            "  + 7"
            " GROUP BY o_orderkey ORDER BY o_orderkey"
        ),
        "copurchase_triangles": (
            # canonical a<b co-purchase edges; triangles via the
            # textbook a<b<c triple self-join (each counted once) —
            # orientation-independent, so it grades the degree-ordered
            # Spark plan exactly
            "WITH e AS (SELECT DISTINCT x.l_partkey AS a,"
            "  y.l_partkey AS b FROM lineitem x JOIN lineitem y"
            "  ON x.l_orderkey = y.l_orderkey"
            "  AND x.l_partkey < y.l_partkey),"
            " n AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_nodes"
            "  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),"
            " m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),"
            " t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles"
            "  FROM e e1 JOIN e e2 ON e1.b = e2.a"
            "  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)"
            " SELECT n_nodes, n_edges, n_triangles FROM n, m, t"
        ),
        "term_postings": (
            # house tokenizer (Java-\s class), per-doc distinct terms,
            # sorted posting head via list_sort/list_slice; integer
            # whole-list summaries
            "WITH toks AS (SELECT DISTINCT doc_id, term FROM ("
            "  SELECT doc_id, unnest(regexp_split_to_array(trim(text),"
            "   '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) AS term"
            "  FROM documents"
            "  WHERE length(trim(coalesce(text, ''))) > 0)),"
            " agg AS (SELECT term,"
            "  CAST(count(*) AS BIGINT) AS doc_freq,"
            "  CAST(min(doc_id) AS BIGINT) AS min_id,"
            "  CAST(max(doc_id) AS BIGINT) AS max_id,"
            "  CAST(sum(doc_id) AS BIGINT) AS sum_ids,"
            "  array_to_string(list_slice(list_sort(list(doc_id)),"
            "   1, 16), ',') AS postings_head"
            "  FROM toks GROUP BY term)"
            " SELECT term, doc_freq, min_id, max_id, sum_ids,"
            " postings_head FROM agg WHERE doc_freq >= 2"
            " ORDER BY doc_freq DESC, term"
        ),
        "forecast_revenue": (
            # decimal-exact sum cast to double; every predicate is a
            # scan-pushable conjunct
            "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
            "  AS revenue,"
            " CAST(count(*) AS BIGINT) AS n_items"
            " FROM lineitem"
            " WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'"
            " AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'"
            " AND l_discount >= 0.05 AND l_discount <= 0.07"
            " AND l_quantity < 24"
        ),
        "top_return_customers": (
            # decimal-exact returned revenue; (revenue desc, custkey)
            # total order
            "SELECT c_custkey, c_name, c_mktsegment,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
            "  AS revenue,"
            " CAST(count(*) AS BIGINT) AS n_items"
            " FROM lineitem"
            " JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " WHERE l_returnflag = 'R'"
            " GROUP BY c_custkey, c_name, c_mktsegment"
            " ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "fuzzy_dedup_edits": (
            # all-pairs ground truth with the provably-safe length
            # prefilter (lev >= |len diff|); byte-vs-codepoint
            # levenshtein divergence is moot on the verified-ASCII
            # corpus
            "WITH d AS (SELECT doc_id, text, length(text) AS n"
            "  FROM documents WHERE text IS NOT NULL"
            "  AND length(text) >= 5),"
            " p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "  a.text AS ta, b.text AS tb FROM d a JOIN d b"
            "  ON a.doc_id < b.doc_id AND abs(a.n - b.n) <= 6)"
            " SELECT id_a, id_b,"
            " CAST(levenshtein(ta, tb) AS BIGINT) AS edits"
            " FROM p WHERE levenshtein(ta, tb) <= 6"
            " ORDER BY id_a, id_b"
        ),
        "user_join_skew": (
            # two pre-aggregations, full-outer key join, top-20 by
            # exact join output size
            "WITH l AS (SELECT user_id AS key,"
            "  CAST(count(*) AS BIGINT) AS lr FROM events"
            "  WHERE user_id IS NOT NULL GROUP BY 1),"
            " r AS (SELECT user_id AS key,"
            "  CAST(count(*) AS BIGINT) AS rr FROM events"
            "  WHERE user_id IS NOT NULL GROUP BY 1)"
            " SELECT coalesce(l.key, r.key) AS key,"
            " CAST(coalesce(lr, 0) AS BIGINT) AS left_rows,"
            " CAST(coalesce(rr, 0) AS BIGINT) AS right_rows,"
            " CAST(coalesce(lr, 0) * coalesce(rr, 0) AS BIGINT)"
            "  AS out_rows"
            " FROM l FULL OUTER JOIN r ON l.key = r.key"
            " ORDER BY out_rows DESC, key ASC LIMIT 20"
        ),
        "unicode_normalization_stats": (
            # nfc_normalize = the same stability-guaranteed UAX#15 NFC
            # as Python's unicodedata; chr(769) = U+0301 COMBINING
            # ACUTE keeps the suffix visibly decomposed; whitespace
            # class spelled explicitly (RE2 \\s has no VT) with the
            # 'g' flag (Spark replaces all matches by default)
            "WITH per AS (SELECT lang,"
            "  coalesce(text, '') || ' Cafe' || chr(769) || '  fin'"
            "   AS deco,"
            "  coalesce(text, '') AS raw FROM documents)"
            " SELECT lang, count(*) AS docs,"
            " CAST(sum(length(deco)) AS BIGINT) AS raw_chars,"
            " CAST(sum(length(nfc_normalize(deco))) AS BIGINT)"
            "  AS nfc_chars,"
            " CAST(sum(length(trim(regexp_replace(deco,"
            "  '[ \\t\\n\\r\\x{000B}\\x{000C}]+', ' ', 'g'))))"
            "  AS BIGINT) AS clean_chars,"
            " CAST(sum(CASE WHEN nfc_normalize(raw) <> raw THEN 1"
            "  ELSE 0 END) AS BIGINT) AS docs_nfc_changed"
            " FROM per GROUP BY lang ORDER BY lang"
        ),
        "large_volume_customers": (
            # having-aggregate before the joins; decimal-exact sums
            # cast to double (lineitem_pricing pattern); total order
            # (o_totalprice desc, o_orderkey asc) makes LIMIT stable
            "WITH big AS (SELECT l_orderkey,"
            "  sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d"
            "  FROM lineitem GROUP BY l_orderkey"
            "  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)"
            " SELECT c_name, c_custkey, o_orderkey,"
            " strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,"
            " CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)"
            "  AS o_totalprice_d,"
            " CAST(qty_d AS DOUBLE) AS total_qty"
            " FROM big JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " ORDER BY o_totalprice_d DESC, o_orderkey ASC LIMIT 100"
        ),
        "promo_revenue": (
            # decimal-exact revenue terms; final ratio = ONE division
            # of two decimal-exact doubles
            "SELECT promo_revenue, total_revenue,"
            " promo_revenue / total_revenue AS promo_frac FROM ("
            " SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN"
            "   CAST(l_extendedprice AS DECIMAL(18,2))"
            "   * (CAST(1 AS DECIMAL(18,2))"
            "      - CAST(l_discount AS DECIMAL(18,2)))"
            "  ELSE 0 END) AS DOUBLE) AS promo_revenue,"
            "  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "   * (CAST(1 AS DECIMAL(18,2))"
            "      - CAST(l_discount AS DECIMAL(18,2))))"
            "   AS DOUBLE) AS total_revenue"
            " FROM lineitem JOIN part ON l_partkey = p_partkey"
            " WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
            "  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')"
        ),
        "skew_salted_join": (
            # salting only changes partitioning: the oracle is the
            # PLAIN equi-join, rolled up per nation; all-bigint EXACT
            "SELECT c_nationkey,"
            " CAST(count(*) AS BIGINT) AS n_orders,"
            " CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " GROUP BY c_nationkey ORDER BY c_nationkey"
        ),
        "top_supplier_revenue": (
            # revenue == max compared in DECIMAL (exact); double only
            # at output
            "WITH r AS (SELECT l_suppkey,"
            "  sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "   * (CAST(1 AS DECIMAL(18,2))"
            "      - CAST(l_discount AS DECIMAL(18,2)))) AS rev"
            " FROM lineitem"
            " WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
            "  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
            " GROUP BY l_suppkey)"
            " SELECT s_suppkey, s_name,"
            " CAST(rev AS DOUBLE) AS total_revenue"
            " FROM r JOIN supplier ON s_suppkey = l_suppkey"
            " WHERE rev = (SELECT max(rev) FROM r)"
            " ORDER BY s_suppkey"
        ),
        "above_average_orders": (
            # p > avg rewritten as decimal p*n > s: exact where the
            # double division is order-dependent
            "WITH w AS (SELECT o_orderpriority,"
            "  CAST(o_totalprice AS DECIMAL(18,2)) AS p,"
            "  count(*) OVER (PARTITION BY o_custkey) AS n,"
            "  sum(CAST(o_totalprice AS DECIMAL(18,2)))"
            "   OVER (PARTITION BY o_custkey) AS s"
            " FROM orders)"
            " SELECT o_orderpriority,"
            " CAST(count(*) AS BIGINT) AS n_above"
            " FROM w WHERE p * n > s"
            " GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "customer_status_sets": (
            # EXCEPT / INTERSECT set semantics over distinct key sets
            "WITH f AS (SELECT DISTINCT o_custkey FROM orders"
            "  WHERE o_orderstatus = 'F'),"
            " o AS (SELECT DISTINCT o_custkey FROM orders"
            "  WHERE o_orderstatus = 'O')"
            " SELECT"
            " (SELECT CAST(count(*) AS BIGINT) FROM"
            "  (SELECT * FROM f EXCEPT SELECT * FROM o)) AS n_f_only,"
            " (SELECT CAST(count(*) AS BIGINT) FROM"
            "  (SELECT * FROM o EXCEPT SELECT * FROM f)) AS n_o_only,"
            " (SELECT CAST(count(*) AS BIGINT) FROM"
            "  (SELECT * FROM f INTERSECT SELECT * FROM o)) AS n_both"
        ),
        "documents_upsert": (
            # the same merge replayed as a QUALIFY-style row_number
            # window (v desc, updates-side wins ties), tombstones
            # dropped after winning; all-bigint summary
            "WITH d AS (SELECT doc_id, lang, text, 1 AS v,"
            "  FALSE AS deleted FROM documents),"
            " ups AS ("
            "  SELECT doc_id, lang, 'upd:' || text AS text, 2 AS v,"
            "   FALSE AS deleted FROM documents"
            "   WHERE doc_id % 10 = 0 AND doc_id % 25 <> 0"
            "  UNION ALL"
            "  SELECT doc_id, lang, '' AS text, 2 AS v, TRUE AS deleted"
            "   FROM documents WHERE doc_id % 25 = 0"
            "  UNION ALL"
            "  SELECT doc_id + 100000 AS doc_id, lang,"
            "   'new:' || text AS text, 1 AS v, FALSE AS deleted"
            "   FROM documents WHERE doc_id % 50 = 0),"
            " u AS (SELECT *, 0 AS src FROM d"
            "  UNION ALL SELECT *, 1 AS src FROM ups),"
            " w AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
            "   ORDER BY v DESC, src DESC) AS rn FROM u),"
            " o AS (SELECT doc_id, lang, text FROM w"
            "  WHERE rn = 1 AND NOT deleted)"
            " SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(count(DISTINCT text) AS BIGINT) AS n_texts,"
            " CAST(sum(CASE WHEN text LIKE 'upd:%' THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS n_updated,"
            " CAST(max(doc_id) AS BIGINT) AS max_doc_id"
            " FROM o GROUP BY lang ORDER BY lang"
        ),
        "pricing_rollup": (
            # GROUP BY ROLLUP: NULL marks the rolled-up level in both
            # engines; decimal-exact sums cast to double
            "SELECT l_returnflag, l_linestatus,"
            " CAST(count(*) AS BIGINT) AS n_items,"
            " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
            "  AS sum_qty,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "  * (CAST(1 AS DECIMAL(18,2))"
            "     - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
            "  AS revenue"
            " FROM lineitem"
            " GROUP BY ROLLUP(l_returnflag, l_linestatus)"
            " ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"
        ),
        "top_session_paths": (
            # same sessionization CTE as the `sessionize` oracle, then
            # row_number truncation + ordered string_agg per session
            "WITH s AS (SELECT user_id, event_type, ts, event_id,"
            " sum(is_new) OVER (PARTITION BY user_id"
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)"
            "  AS session_id FROM ("
            " SELECT user_id, event_type, ts, event_id,"
            "  CASE WHEN lag(ts) OVER (PARTITION BY user_id"
            "    ORDER BY ts, event_id) IS NULL"
            "   OR epoch(ts) - epoch(lag(ts) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id)) > 1800"
            "  THEN 1 ELSE 0 END AS is_new FROM events"
            "  WHERE ts IS NOT NULL AND user_id IS NOT NULL"
            "   AND event_type IS NOT NULL AND event_id IS NOT NULL)),"
            " r AS (SELECT user_id, session_id, event_type, ts, event_id,"
            "  row_number() OVER (PARTITION BY user_id, session_id"
            "   ORDER BY ts, event_id) AS rn FROM s),"
            " p AS (SELECT user_id, session_id,"
            "  string_agg(event_type, '>' ORDER BY ts, event_id) AS path"
            "  FROM r WHERE rn <= 8 GROUP BY user_id, session_id)"
            " SELECT path, CAST(count(*) AS BIGINT) AS n_sessions"
            " FROM p GROUP BY path"
            " ORDER BY n_sessions DESC, path LIMIT 20"
        ),
        "idle_customers": (
            # NOT EXISTS over the date-filtered fact = anti-join;
            # decimal-exact balance sum
            "SELECT c_mktsegment,"
            " CAST(count(*) AS BIGINT) AS n_idle,"
            " CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)"
            "  AS idle_balance"
            " FROM customer c"
            " WHERE c.c_acctbal > 5000.0"
            " AND NOT EXISTS (SELECT 1 FROM orders o"
            "  WHERE o.o_custkey = c.c_custkey"
            "  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')"
            " GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "late_shipment_priority": (
            # EXISTS = semi-join: each order counted once; naive
            # timestamp + INTERVAL day arithmetic matches Spark's
            # timestamp_add on TIMESTAMP_NTZ
            "SELECT o_orderpriority,"
            " CAST(count(*) AS BIGINT) AS n_late_orders"
            " FROM orders o"
            " WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'"
            " AND EXISTS (SELECT 1 FROM lineitem l"
            "  WHERE l.l_orderkey = o.o_orderkey"
            "  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)"
            " GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "part_pagerank_weighted": (
            # weighted 3x unroll: strengths = sum(w), contrib =
            # (r * w) // strength; same integer fixed-point rule
            "WITH pairs AS ("
            " SELECT x.l_partkey AS a, y.l_partkey AS b,"
            "  CAST(count(*) AS BIGINT) AS w"
            " FROM lineitem x JOIN lineitem y"
            "  ON x.l_orderkey = y.l_orderkey"
            "  AND x.l_partkey < y.l_partkey"
            " WHERE x.l_orderkey IS NOT NULL"
            "  AND x.l_partkey IS NOT NULL AND y.l_partkey IS NOT NULL"
            " GROUP BY x.l_partkey, y.l_partkey),"
            " e AS (SELECT a, b, w FROM pairs"
            "  UNION ALL SELECT b AS a, a AS b, w FROM pairs),"
            " nodes AS (SELECT DISTINCT a AS node FROM e),"
            " cnt AS (SELECT count(*) AS n FROM nodes),"
            " od AS (SELECT a AS node, CAST(sum(w) AS BIGINT) AS d"
            "  FROM e GROUP BY a),"
            " r0 AS (SELECT node,"
            "  CAST(1000000000000 // c.n AS BIGINT) AS r"
            "  FROM nodes CROSS JOIN cnt c),"
            " s1 AS (SELECT e.b AS node,"
            "  CAST(sum((r.r * e.w) // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN r0 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i1 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s1.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s1 ON s1.node = n.node),"
            " s2 AS (SELECT e.b AS node,"
            "  CAST(sum((r.r * e.w) // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN i1 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i2 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s2.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s2 ON s2.node = n.node),"
            " s3 AS (SELECT e.b AS node,"
            "  CAST(sum((r.r * e.w) // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN i2 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i3 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s3.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s3 ON s3.node = n.node)"
            " SELECT node, r AS rank_scaled FROM i3"
            " ORDER BY r DESC, node LIMIT 20"
        ),
        "part_seed_assignment": (
            # recursive CTE enumerates (node, seed, depth) capped at 2
            # hops; per node keep row 1 by (depth, seed) — the global
            # min-(dist, seed) the frontier propagation computes
            f"WITH RECURSIVE {_COPURCHASE_E_CTE},"
            " srcs AS (SELECT DISTINCT l_partkey AS node FROM lineitem"
            "  WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)),"
            " reach(node, seed, d) AS ("
            "  SELECT node, node AS seed, 0 FROM srcs"
            "  UNION"
            "  SELECT e.b, reach.seed, reach.d + 1 FROM reach"
            "  JOIN e ON e.a = reach.node WHERE reach.d < 2),"
            " best AS (SELECT node, seed, d, row_number() OVER ("
            "  PARTITION BY node ORDER BY d, seed) AS rn FROM reach)"
            " SELECT seed, CAST(d AS BIGINT) AS dist,"
            " CAST(count(*) AS BIGINT) AS n_nodes,"
            " CAST(min(node) AS BIGINT) AS min_node,"
            " CAST(max(node) AS BIGINT) AS max_node"
            " FROM best WHERE rn = 1"
            " GROUP BY seed, d ORDER BY seed, d"
        ),
        "part_reachability": (
            # recursive CTE enumerates (node, depth) pairs capped at 2
            # hops; min(d) per node = BFS distance. UNION dedups
            # repeated (node, depth) rows so it terminates; the
            # operator's frontier expansion computes the same min
            # without enumerating paths. All-bigint -> EXACT.
            f"WITH RECURSIVE {_COPURCHASE_E_CTE},"
            " srcs AS (SELECT DISTINCT l_partkey AS node FROM lineitem"
            "  WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)),"
            " reach(node, d) AS ("
            "  SELECT node, 0 FROM srcs"
            "  UNION"
            "  SELECT e.b, reach.d + 1 FROM reach"
            "  JOIN e ON e.a = reach.node WHERE reach.d < 2),"
            " md AS (SELECT node, min(d) AS dist FROM reach GROUP BY node)"
            " SELECT CAST(dist AS BIGINT) AS dist,"
            " CAST(count(*) AS BIGINT) AS n_nodes,"
            " CAST(min(node) AS BIGINT) AS min_node,"
            " CAST(max(node) AS BIGINT) AS max_node"
            " FROM md GROUP BY dist ORDER BY dist"
        ),
        "part_pagerank": (
            # literal 3x unroll of the integer fixed-point update rule
            # (scale 1e12, damping 85/100, contrib = r // outdeg); the
            # symmetrized graph has no dangling nodes so the operator's
            # dang term is exactly 0 and the oracle omits it. All
            # bigint -> order-independent sums -> EXACT.
            f"WITH {_COPURCHASE_E_CTE},"
            " nodes AS (SELECT DISTINCT a AS node FROM e),"
            " cnt AS (SELECT count(*) AS n FROM nodes),"
            " od AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d"
            "  FROM e GROUP BY a),"
            " r0 AS (SELECT node,"
            "  CAST(1000000000000 // c.n AS BIGINT) AS r"
            "  FROM nodes CROSS JOIN cnt c),"
            " s1 AS (SELECT e.b AS node,"
            "  CAST(sum(r.r // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN r0 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i1 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s1.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s1 ON s1.node = n.node),"
            " s2 AS (SELECT e.b AS node,"
            "  CAST(sum(r.r // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN i1 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i2 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s2.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s2 ON s2.node = n.node),"
            " s3 AS (SELECT e.b AS node,"
            "  CAST(sum(r.r // od.d) AS BIGINT) AS inc"
            "  FROM e JOIN i2 r ON e.a = r.node"
            "  JOIN od ON od.node = e.a GROUP BY e.b),"
            " i3 AS (SELECT n.node,"
            "  CAST((15 * (1000000000000 // c.n)) // 100"
            "   + (85 * COALESCE(s3.inc, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n CROSS JOIN cnt c"
            "  LEFT JOIN s3 ON s3.node = n.node)"
            " SELECT node, r AS rank_scaled FROM i3"
            " ORDER BY r DESC, node LIMIT 20"
        ),
        "orders_customer_integrity": (
            # child aggregated to (fk, rows) first, LEFT join to the
            # distinct parent key set — mirrors the operator plan
            "WITH fk AS (SELECT o_custkey AS k,"
            "  CAST(count(*) AS BIGINT) AS r FROM orders GROUP BY 1),"
            " pk AS (SELECT DISTINCT c_custkey AS p FROM customer),"
            " j AS (SELECT fk.k, fk.r, pk.p FROM fk"
            "  LEFT JOIN pk ON fk.k = pk.p)"
            " SELECT CAST(sum(r) AS BIGINT) AS child_rows,"
            " CAST(sum(CASE WHEN k IS NULL THEN r ELSE 0 END) AS BIGINT)"
            "  AS null_fk_rows,"
            " CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS distinct_fk,"
            " CAST(sum(CASE WHEN p IS NOT NULL THEN r ELSE 0 END)"
            "  AS BIGINT) AS matched_rows,"
            " CAST(sum(CASE WHEN k IS NOT NULL AND p IS NULL THEN r"
            "  ELSE 0 END) AS BIGINT) AS orphan_rows,"
            " CAST(sum(CASE WHEN k IS NOT NULL AND p IS NULL THEN 1"
            "  ELSE 0 END) AS BIGINT) AS orphan_distinct_fk,"
            " CAST(sum(CASE WHEN p IS NOT NULL THEN r ELSE 0 END)"
            "  AS BIGINT) / NULLIF(CAST(sum(r) AS BIGINT)"
            "  - CAST(sum(CASE WHEN k IS NULL THEN r ELSE 0 END)"
            "   AS BIGINT), 0) AS match_frac"
            " FROM j"
        ),
        "document_snapshot_diff": (
            # mirrors the deterministic mutation: bucket 2 removed,
            # bucket 1 upper-cased (changed only if the value actually
            # changes — null-safe), bucket 0 re-added under new ids
            "WITH d AS (SELECT doc_id, text, doc_id % 16 AS b"
            "  FROM documents),"
            " s AS ("
            "  SELECT 'added' AS status, CAST(count(*) AS BIGINT) AS n"
            "   FROM d WHERE b = 0"
            "  UNION ALL SELECT 'removed', CAST(count(*) AS BIGINT)"
            "   FROM d WHERE b = 2"
            "  UNION ALL SELECT 'changed', CAST(count(*) AS BIGINT)"
            "   FROM d WHERE b <> 2 AND NOT"
            "   (CASE WHEN b = 1 THEN upper(text) ELSE text END"
            "    IS NOT DISTINCT FROM text)"
            "  UNION ALL SELECT 'unchanged', CAST(count(*) AS BIGINT)"
            "   FROM d WHERE b <> 2 AND"
            "   (CASE WHEN b = 1 THEN upper(text) ELSE text END"
            "    IS NOT DISTINCT FROM text))"
            " SELECT status, n FROM s ORDER BY status"
        ),
        "event_transition_matrix": (
            # per-user lead with (ts, event_id) total order; from_total
            # as a window over the |types|^2 aggregate; sums CAST to
            # BIGINT (the HUGEINT trap)
            "WITH e AS (SELECT event_id, user_id, event_type, ts"
            "  FROM events WHERE user_id IS NOT NULL"
            "   AND ts IS NOT NULL AND event_type IS NOT NULL),"
            " s AS (SELECT event_type AS from_event,"
            "  lead(event_type) OVER (PARTITION BY user_id"
            "   ORDER BY ts, event_id) AS to_event FROM e),"
            " t AS (SELECT from_event, to_event,"
            "  CAST(count(*) AS BIGINT) AS n_transitions"
            "  FROM s WHERE to_event IS NOT NULL GROUP BY 1, 2)"
            " SELECT from_event, to_event, n_transitions,"
            " CAST(sum(n_transitions) OVER (PARTITION BY from_event)"
            "  AS BIGINT) AS from_total,"
            " n_transitions / CAST(sum(n_transitions) OVER"
            "  (PARTITION BY from_event) AS BIGINT) AS frac"
            " FROM t ORDER BY from_event, to_event"
        ),
        "regional_revenue": (
            # decimal-exact revenue sum cast to double (identical IEEE
            # value both engines); naive timestamps, no session tz
            "SELECT n_name,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            "  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
            "  AS revenue,"
            " CAST(count(*) AS BIGINT) AS n_items"
            " FROM lineitem"
            " JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN supplier ON l_suppkey = s_suppkey"
            "  AND c_nationkey = s_nationkey"
            " JOIN nation ON s_nationkey = n_nationkey"
            " JOIN region ON n_regionkey = r_regionkey"
            " WHERE r_name = 'ASIA'"
            "  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
            "  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
            " GROUP BY n_name ORDER BY n_name"
        ),
        "token_mass_histogram": (
            # weight = house token count, 0 for blank/NULL text (the
            # mixture_token_plan weight mirror); clamp-then-int-div bins
            "WITH w AS (SELECT CAST(n_chars AS BIGINT) AS x,"
            "  CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0"
            "   THEN 0 ELSE len(regexp_split_to_array(trim(text),"
            "    '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS BIGINT) AS tk"
            "  FROM documents WHERE n_chars IS NOT NULL),"
            " bins AS (SELECT unnest(range(6)) AS bin),"
            " c AS (SELECT GREATEST(0, LEAST(x, 599)) // 100 AS bin,"
            "  CAST(count(*) AS BIGINT) AS n,"
            "  CAST(sum(tk) AS BIGINT) AS mass"
            "  FROM w GROUP BY 1)"
            " SELECT CAST(b.bin AS BIGINT) AS bin,"
            " CAST(b.bin * 100 AS BIGINT) AS bin_lo,"
            " CAST((b.bin + 1) * 100 AS BIGINT) AS bin_hi,"
            " CAST(coalesce(c.n, 0) AS BIGINT) AS n,"
            " CAST(coalesce(c.mass, 0) AS BIGINT) AS mass"
            " FROM bins b LEFT JOIN c ON c.bin = b.bin"
            " ORDER BY bin"
        ),
        "repeated_span_coverage": (
            # spans pipeline + per-doc rollup, LEFT-joined so clean and
            # empty docs survive; dup_frac = one int/int division over
            # NULLIF
            "WITH g AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,"
            "  substr(text, CAST(t.i + 1 AS INT), 30) AS gram"
            "  FROM documents, unnest(range(length(text) - 29)) AS t(i)"
            "  WHERE text IS NOT NULL AND length(text) >= 30),"
            " c AS (SELECT doc_id, pos,"
            "  count(*) OVER (PARTITION BY gram) AS cnt FROM g),"
            " f AS (SELECT doc_id, pos FROM c WHERE cnt >= 2),"
            " w AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER"
            "   (PARTITION BY doc_id ORDER BY pos) > 30"
            "  THEN 1 ELSE 0 END AS brk FROM f),"
            " i AS (SELECT doc_id, pos, sum(brk) OVER"
            "  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)"
            "  AS isl FROM w),"
            " sp AS (SELECT doc_id,"
            "  CAST(max(pos) + 30 - min(pos) AS BIGINT) AS span_len"
            "  FROM i GROUP BY doc_id, isl),"
            " s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,"
            "  CAST(sum(span_len) AS BIGINT) AS dup_chars"
            "  FROM sp GROUP BY doc_id)"
            " SELECT d.doc_id,"
            " CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,"
            " CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,"
            " CAST(coalesce(s.dup_chars, 0) AS BIGINT) AS dup_chars,"
            " CAST(coalesce(s.dup_chars, 0) AS BIGINT)"
            "  / NULLIF(CAST(length(coalesce(d.text, '')) AS BIGINT), 0)"
            "  AS dup_frac"
            " FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id"
            " ORDER BY d.doc_id"
        ),
        "mixture_token_plan": (
            "WITH w(source, weight) AS (VALUES"
            "  ('src0', CAST(4 AS BIGINT)), ('src1', CAST(3 AS BIGINT)),"
            "  ('src2', CAST(2 AS BIGINT)), ('srcx', CAST(1 AS BIGINT))),"
            " c AS (SELECT CAST(source AS VARCHAR) AS source,"
            "  CAST(count(*) AS BIGINT) AS n_docs,"
            "  CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) = 0"
            "   THEN 0 ELSE len(regexp_split_to_array(trim(text),"
            "    '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END) AS BIGINT)"
            "   AS n_tokens"
            "  FROM documents"
            "  WHERE CAST(source AS VARCHAR)"
            "   IN ('src0', 'src1', 'src2', 'srcx')"
            "  GROUP BY 1)"
            " SELECT w.source,"
            " CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,"
            " CAST(coalesce(c.n_tokens, 0) AS BIGINT) AS n_tokens,"
            " w.weight,"
            " (1000000 * w.weight) // 10 AS target_tokens,"
            " CASE WHEN coalesce(c.n_tokens, 0) > 0"
            "  THEN ((1000000 * w.weight) // 10) // c.n_tokens END"
            "  AS epochs_full,"
            " CASE WHEN coalesce(c.n_tokens, 0) > 0"
            "  THEN ((1000000 * w.weight) // 10) % c.n_tokens END"
            "  AS extra_tokens"
            " FROM w LEFT JOIN c USING (source) ORDER BY w.source"
        ),
        "props_json_stats": (
            # mirror from_json('k BIGINT') STRICTNESS, not just the happy
            # path: malformed JSON and non-integer k (quoted "7", 87.5)
            # are NULL on the Spark side, so the oracle gates on
            # json_valid + an integer json_type before extracting —
            # ->> with a bare TRY_CAST would coerce quoted numerics and
            # raise on malformed rows
            "WITH e AS (SELECT event_type,"
            "  CASE WHEN props IS NOT NULL AND json_valid(props)"
            "   AND json_type(json_extract(props, '$.k'))"
            "    IN ('BIGINT', 'UBIGINT')"
            "   THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)"
            "   END AS k"
            "  FROM events)"
            " SELECT event_type,"
            " CAST(count(*) AS BIGINT) AS n_events,"
            " CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            "  AS n_missing_k,"
            " min(k) AS k_min,"
            " max(k) AS k_max,"
            " CAST(sum(k) AS BIGINT) AS k_sum"
            " FROM e GROUP BY event_type ORDER BY event_type"
        ),
        "rolling_active_users": (
            # integer-offset day expansion both sides (DATE + INT is a
            # DATE in DuckDB; date_add(col, col) in Spark) — no
            # generate_series/interval type drift
            "WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d"
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
            " mx AS (SELECT max(d) AS m FROM a),"
            # range() yields BIGINT; DATE + INTEGER only, so cast
            " c AS (SELECT a.u, a.d + o.i::INT AS day"
            "  FROM a, (SELECT unnest(range(7)) AS i) o)"
            " SELECT strftime(day, '%Y-%m-%d') AS day_s,"
            " CAST(count(DISTINCT u) AS BIGINT) AS active_users"
            " FROM c WHERE day <= (SELECT m FROM mx)"
            " GROUP BY day ORDER BY day_s"
        ),
        "event_funnel": (
            "WITH f AS (SELECT user_id AS u,"
            "  min(ts) FILTER (WHERE event_type = 'view') AS t0,"
            "  min(ts) FILTER (WHERE event_type = 'click') AS t1,"
            "  min(ts) FILTER (WHERE event_type = 'purchase') AS t2"
            "  FROM events"
            "  WHERE user_id IS NOT NULL AND ts IS NOT NULL"
            "   AND event_type IN ('view', 'click', 'purchase')"
            "  GROUP BY user_id),"
            " tot AS (SELECT"
            "  CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n0,"
            "  CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 > t0"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS n1,"
            "  CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS n2"
            "  FROM f)"
            " SELECT 1 AS step_rank, 'view' AS step, n0 AS n_users,"
            "  n0 / NULLIF(n0, 0) AS frac_of_first FROM tot"
            " UNION ALL SELECT 2, 'click', n1, n1 / NULLIF(n0, 0) FROM tot"
            " UNION ALL SELECT 3, 'purchase', n2, n2 / NULLIF(n0, 0)"
            "  FROM tot"
            " ORDER BY step_rank"
        ),
        "source_profile_report": (
            "SELECT source,"
            " CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,"
            " (CAST(count(*) AS BIGINT)"
            "  - CAST(count(DISTINCT text) AS BIGINT))"
            "  / CAST(count(*) AS BIGINT) AS dup_frac,"
            " CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0"
            "  ELSE len(regexp_split_to_array(trim(text),"
            "   '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END) AS BIGINT)"
            "  AS total_tokens,"
            " CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) = 0"
            "  THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_docs"
            " FROM documents GROUP BY source ORDER BY source"
        ),
        "retention_within_7": (
            "WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d"
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
            " g AS (SELECT u, d,"
            "  lead(d) OVER (PARTITION BY u ORDER BY d) AS nd FROM a)"
            " SELECT strftime(d, '%Y-%m-%d') AS day_s,"
            " CAST(count(*) AS BIGINT) AS active_users,"
            " CAST(sum(CASE WHEN date_diff('day', d, nd) <= 7"
            "  THEN 1 ELSE 0 END) AS BIGINT) AS retained_within_k,"
            " CAST(sum(CASE WHEN date_diff('day', d, nd) <= 7"
            "  THEN 1 ELSE 0 END) AS BIGINT)"
            "  / CAST(count(*) AS BIGINT) AS retention_rate"
            " FROM g GROUP BY d ORDER BY day_s"
        ),
        "sampled_customer_orders": (
            "SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,"
            " count(*) AS n_orders,"
            " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            f" WHERE {_sampling.sql_frac_expr('c_custkey', seed=7)}"
            f" < '{_sampling._threshold_hex(0.2)}'"
            " GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "length_decile_buckets": (
            "SELECT i AS bucket,"
            " (SELECT count(*) FROM documents) AS n_docs,"
            " TRUE AS frac_ok"
            " FROM (SELECT unnest(range(10)) AS i) ORDER BY bucket"
        ),
        "sketch_profile_report": (
            "SELECT lang, count(*) AS n_docs,"
            " count(DISTINCT sha256(text)) AS exact_distinct,"
            " TRUE AS kmv_ok, TRUE AS p50_ok"
            " FROM documents GROUP BY lang ORDER BY lang"
        ),
        "weighted_topk": (
            "SELECT o_orderpriority,"
            " CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
            "  AS BIGINT) AS total_cents"
            " FROM orders GROUP BY o_orderpriority"
            " ORDER BY total_cents DESC, o_orderpriority LIMIT 3"
        ),
        "weighted_quantile_bound": (
            "SELECT l_returnflag,"
            " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,"
            " TRUE AS within_bound"
            " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "quality_filter_funnel": (
            "WITH f AS (SELECT length(text) AS n_chars,"
            "  CASE WHEN length(trim(text)) = 0 THEN 0"
            "   ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n_tokens,"
            "  CASE WHEN length(trim(text)) = 0 THEN 0"
            "   ELSE len(list_distinct(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')))"
            "   END AS n_distinct"
            "  FROM documents),"
            " a AS (SELECT CAST(count(*) AS BIGINT) AS c0,"
            "  CAST(sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS c1,"
            "  CAST(sum(CASE WHEN n_chars >= 150 AND n_tokens >= 40"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS c2,"
            "  CAST(sum(CASE WHEN n_chars >= 150 AND n_tokens >= 40"
            "   AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.4"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS c3 FROM f)"
            " SELECT 0 AS stage_idx, 'all' AS stage, c0 AS n_docs FROM a"
            " UNION ALL SELECT 1, 'min_chars', c1 FROM a"
            " UNION ALL SELECT 2, 'min_tokens', c2 FROM a"
            " UNION ALL SELECT 3, 'repetition', c3 FROM a"
            " ORDER BY stage_idx"
        ),
        "ngram_contamination": _contam_oracle_sql(""),
        "bloom_contamination": _contam_oracle_sql(
            # the two Bloom-vs-exact agreement booleans: no false
            # negatives is the filter guarantee; the false-flag-rate
            # bound holds at any scale given fpr=1e-6 (see
            # _q_bloom_contamination's union-bound math)
            ", TRUE AS no_false_negatives, TRUE AS false_flag_rate_ok"
        ),
        "doc_boilerplate": (
            "WITH lab AS (SELECT doc_id,"
            "  regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+') AS words"
            "  FROM documents),"
            " g AS (SELECT unnest(range(1,"
            "   (SELECT max(len(words)) + 1 FROM lab))) AS i),"
            " prs AS (SELECT DISTINCT l.doc_id,"
            "   array_to_string(l.words[g.i::INT : g.i::INT + 2], ' ') AS sh"
            "   FROM lab l JOIN g ON g.i + 2 <= len(l.words)),"
            " c AS (SELECT sh, count(*) AS nd FROM prs GROUP BY sh),"
            " pd AS (SELECT p.doc_id, count(*) AS n_ngrams,"
            "   sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS n_shared"
            "   FROM prs p JOIN c USING (sh) GROUP BY p.doc_id)"
            " SELECT d.doc_id,"
            " CAST(coalesce(pd.n_ngrams, 0) AS BIGINT) AS n_ngrams,"
            " CAST(coalesce(pd.n_shared, 0) AS BIGINT) AS n_shared,"
            " CASE WHEN pd.n_ngrams IS NULL THEN NULL"
            "  ELSE pd.n_shared / pd.n_ngrams END AS shared_frac"
            " FROM (SELECT DISTINCT doc_id FROM documents) d"
            " LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"
        ),
        "weighted_kll_bound": (
            "SELECT lang,"
            " CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0"
            "   ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END)"
            "  AS BIGINT) AS total_tokens,"
            " TRUE AS within_bound"
            " FROM documents GROUP BY lang ORDER BY lang"
        ),
        "priority_customer_overlap": (
            "WITH du AS (SELECT DISTINCT o_orderpriority AS s, o_custkey AS k"
            "  FROM orders),"
            " c AS (SELECT s, count(*) AS c FROM du GROUP BY s),"
            " i AS (SELECT x.s AS a, y.s AS b, count(*) AS ix"
            "  FROM du x JOIN du y USING (k) WHERE x.s < y.s GROUP BY 1, 2)"
            " SELECT ca.s AS a, cb.s AS b,"
            " CAST(ca.c + cb.c - coalesce(i.ix, 0) AS BIGINT) AS exact_union,"
            " CAST(coalesce(i.ix, 0) AS BIGINT) AS exact_intersect,"
            " TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS jaccard_ok"
            " FROM c ca JOIN c cb ON ca.s < cb.s"
            " LEFT JOIN i ON i.a = ca.s AND i.b = cb.s"
            " ORDER BY a, b"
        ),
        "kmv_set_ops_bound": (
            "SELECT"
            " count(DISTINCT CASE WHEN o_orderstatus = 'O' OR o_totalprice > 150000"
            "   THEN o_orderkey END) AS exact_union,"
            " count(DISTINCT CASE WHEN o_orderstatus = 'O' AND o_totalprice > 150000"
            "   THEN o_orderkey END) AS exact_intersect,"
            " count(DISTINCT CASE WHEN o_orderstatus = 'O' AND NOT o_totalprice > 150000"
            "   THEN o_orderkey END) AS exact_diff,"
            " TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok,"
            " TRUE AS jaccard_ok"
            " FROM orders"
        ),
        "join_size_bound": (
            "WITH cross_exact AS ("
            " SELECT CAST(count(*) AS BIGINT) AS exact"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey),"
            " self_exact AS ("
            " SELECT CAST(sum(n * n) AS BIGINT) AS exact FROM ("
            "   SELECT count(*) AS n FROM events"
            "   WHERE user_id IS NOT NULL GROUP BY user_id))"
            " SELECT 'events_user_f2' AS metric, exact,"
            "  TRUE AS lower_ok, TRUE AS upper_ok FROM self_exact"
            " UNION ALL"
            " SELECT 'lineitem_orders' AS metric, exact,"
            "  TRUE AS lower_ok, TRUE AS upper_ok FROM cross_exact"
            " ORDER BY metric"
        ),
        # --- bound-boolean oracles: DuckDB recomputes the EXACT side and
        # states the bound holds; the Spark query computes both the sketch
        # estimate and the exact value and materializes the comparison ---
        "hll_text_by_lang": (
            "SELECT lang, count(DISTINCT sha256(text)) AS exact_distinct,"
            " TRUE AS within_bound FROM documents GROUP BY lang"
        ),
        "hll_users_global": (
            "SELECT count(DISTINCT user_id) AS exact_users,"
            " TRUE AS within_bound FROM events"
        ),
        "hll_v5_orderkey_by_flag": (
            "SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orderkeys,"
            " TRUE AS within_bound FROM lineitem GROUP BY l_returnflag"
        ),
        "rollup_estimates": (
            "SELECT event_type, count(DISTINCT user_id) AS exact_users,"
            " TRUE AS within_bound FROM events GROUP BY event_type"
            " UNION ALL SELECT '<all>', count(DISTINCT user_id), TRUE FROM events"
        ),
        "multi_distinct_report": (
            "WITH x AS ("
            " SELECT lang, 'source' AS metric,"
            "  count(DISTINCT source) AS exact_distinct FROM documents GROUP BY lang"
            " UNION ALL SELECT lang, 'content_sha',"
            "  count(DISTINCT sha256(text)) FROM documents GROUP BY lang"
            " UNION ALL SELECT '<all>', 'source',"
            "  count(DISTINCT source) FROM documents"
            " UNION ALL SELECT '<all>', 'content_sha',"
            "  count(DISTINCT sha256(text)) FROM documents)"
            " SELECT lang, metric, exact_distinct, TRUE AS within_bound FROM x"
        ),
        # --- exact ground-truth oracles: DuckDB enumerates ALL near-dup
        # pairs by exact character-k-gram Jaccard; the Spark queries reach
        # the same set via LSH/pigeonhole candidates + exact verification ---
        "incremental_dedup_pairs": (
            "WITH lab AS (SELECT doc_id, text,"
            f"  {_sampling.sql_split_expr('doc_id', _INGEST_SPLITS, seed=17)}"
            "   AS split FROM documents),"
            " g AS (SELECT unnest(range(1,"
            "  (SELECT max(length(text)) + 1 FROM lab))) AS i),"
            " sh AS ("
            " SELECT DISTINCT l.doc_id, l.split, substr(l.text, g.i::INT, 5) AS s"
            " FROM lab l JOIN g ON g.i <= length(l.text) - 4),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS ("
            "  SELECT a.doc_id AS id_new, b.doc_id AS id_base, count(*) AS i"
            "  FROM sh a JOIN sh b ON a.s = b.s"
            "  WHERE a.split = 'new' AND b.split = 'base'"
            "  GROUP BY 1, 2)"
            " SELECT id_new, id_base,"
            "  i::DOUBLE / (ca.n + cb.n - i) AS jaccard"
            " FROM inter JOIN cnt ca ON ca.doc_id = id_new"
            " JOIN cnt cb ON cb.doc_id = id_base"
            " WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.8"
            " ORDER BY id_new, id_base"
        ),
        "minhash_lsh_pairs": (
            "WITH g AS (SELECT unnest(range(1,"
            "  (SELECT max(length(text)) + 1 FROM documents))) AS i),"
            " sh AS ("
            " SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 5) AS s"
            " FROM documents d JOIN g ON g.i <= length(d.text) - 4),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            " SELECT id_a, id_b,"
            "  round(i::DOUBLE / (ca.n + cb.n - i), 4) AS jaccard_r"
            " FROM inter JOIN cnt ca ON ca.doc_id = id_a"
            " JOIN cnt cb ON cb.doc_id = id_b"
            " WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.8"
            " ORDER BY id_a, id_b"
        ),
        "containment_dups": (
            "WITH g AS (SELECT unnest(range(1,"
            "  (SELECT max(length(text)) + 1 FROM documents))) AS i),"
            " sh AS ("
            " SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 5) AS s"
            " FROM documents d JOIN g ON g.i <= length(d.text) - 4),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            " SELECT id_a, id_b, i::DOUBLE / ca.n AS containment"
            " FROM inter JOIN cnt ca ON ca.doc_id = id_a"
            " WHERE i::DOUBLE / ca.n >= 0.8"
            " ORDER BY id_a, id_b"
        ),
        "dedup_clusters": (
            _CLUSTER_CTE + " SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"
        ),
        "dedup_representatives": (
            _CLUSTER_CTE + " SELECT c.cluster_id, c.doc_id,"
            " length(d.text) AS n_chars"
            " FROM clusters c JOIN documents d USING (doc_id)"
            " QUALIFY row_number() OVER (PARTITION BY c.cluster_id"
            "  ORDER BY length(d.text) DESC, c.doc_id ASC) = 1"
            " ORDER BY c.cluster_id"
        ),
        "cluster_split": (
            _CLUSTER_CTE + " SELECT doc_id, cluster_id, "
            f"{_sampling.sql_split_expr('cluster_id', seed=11)} AS split"
            " FROM clusters ORDER BY doc_id"
        ),
        "simhash_near_dups": (
            "WITH g AS (SELECT unnest(range(1,"
            "  (SELECT max(length(text)) + 1 FROM documents))) AS i),"
            " sh AS ("
            " SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 4) AS s"
            " FROM documents d JOIN g ON g.i <= length(d.text) - 3),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            " SELECT id_a, id_b,"
            "  round(i::DOUBLE / (ca.n + cb.n - i), 4) AS jaccard_r"
            " FROM inter JOIN cnt ca ON ca.doc_id = id_a"
            " JOIN cnt cb ON cb.doc_id = id_b"
            " WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.9"
            " ORDER BY id_a, id_b"
        ),
        # --- heuristic mirrored in SQL: DuckDB recomputes the same
        # stopword/CJK language-ID rule (RE2 \p{L} == Java \p{L} here;
        # list_intersect == array_intersect: distinct common elements) ---
        "langid_distribution": (
            "WITH scored AS (SELECT"
            " regexp_matches(text, '[一-鿿]') AS has_cjk,"
            " len(list_intersect(regexp_split_to_array(lower(text), '[^\\p{L}]+'),"
            "  ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,"
            " len(list_intersect(regexp_split_to_array(lower(text), '[^\\p{L}]+'),"
            "  ['der','die','das','und','ist','nicht','ein','mit','sich','auf'])) AS s_de,"
            " len(list_intersect(regexp_split_to_array(lower(text), '[^\\p{L}]+'),"
            "  ['el','la','los','las','que','de','y','es','en','por'])) AS s_es,"
            " len(list_intersect(regexp_split_to_array(lower(text), '[^\\p{L}]+'),"
            "  ['le','la','les','et','est','des','une','dans','que','pour'])) AS s_fr"
            " FROM documents),"
            " p AS (SELECT CASE"
            "  WHEN has_cjk THEN 'zh'"
            "  WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'"
            "  WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'"
            "  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'"
            "  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'"
            "  ELSE 'de' END AS pred FROM scored)"
            " SELECT pred, count(*) AS cnt FROM p GROUP BY pred"
        ),
        # --- deterministic-contract oracles ---
        "ann_topk": (
            "SELECT CAST(10 AS BIGINT) AS k_returned, TRUE AS recall_ok"
        ),
        "multimodal_features": (
            "SELECT CAST(i AS BIGINT) AS media_id, TRUE AS meta_ok"
            " FROM range(64) t(i) ORDER BY media_id"
        ),
        "embedding_near_dups": (
            "WITH aug AS ("
            " SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings"
            " UNION ALL SELECT vec_id + 100000,"
            "  list_transform(embedding::DOUBLE[], x -> x * 1.001)"
            " FROM embeddings WHERE vec_id < 20)"
            " SELECT a.vec_id AS id_a, b.vec_id AS id_b"
            " FROM aug a JOIN aug b ON a.vec_id < b.vec_id"
            " WHERE list_cosine_similarity(a.e, b.e) >= 0.95"
            " ORDER BY id_a, id_b"
        ),
        "embedding_clusters": (
            "WITH RECURSIVE aug AS ("
            " SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings"
            " UNION ALL SELECT vec_id + 100000,"
            "  list_transform(embedding::DOUBLE[], x -> x * 1.001)"
            " FROM embeddings WHERE vec_id < 20),"
            " pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b"
            "  FROM aug a JOIN aug b ON a.vec_id < b.vec_id"
            "  WHERE list_cosine_similarity(a.e, b.e) >= 0.95),"
            " edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " reach(node, root) AS ("
            "  SELECT vec_id, vec_id FROM aug"
            "  UNION"
            "  SELECT e2.b, reach.root FROM reach JOIN edges e2 ON e2.a = reach.node),"
            " clusters AS (SELECT node AS vec_id, min(root) AS cluster_id"
            "  FROM reach GROUP BY node)"
            " SELECT cluster_id, count(*) AS n_members FROM clusters"
            " GROUP BY cluster_id ORDER BY cluster_id"
        ),
        "hll_time_rollup": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"
            "  AS bucket_s,"
            " count(DISTINCT user_id) AS exact_users, TRUE AS within_bound"
            " FROM events GROUP BY date_trunc('hour', ts) ORDER BY bucket_s"
        ),
        "hll_sliding_window": (
            "WITH ev AS (SELECT date_trunc('hour', ts) AS bk, user_id"
            "  FROM events),"
            " b AS (SELECT DISTINCT bk AS we FROM ev)"
            " SELECT strftime(b.we, '%Y-%m-%d %H:%M:%S') AS bucket_s,"
            " count(DISTINCT e.user_id) AS exact_users,"
            " TRUE AS within_bound"
            " FROM b JOIN ev e"
            "  ON e.bk >= b.we - INTERVAL 5 HOUR AND e.bk <= b.we"
            " GROUP BY b.we ORDER BY bucket_s"
        ),
        "video_frame_sample": (
            "SELECT CAST(i AS BIGINT) AS media_id,"
            " CAST((i % 5) * 3 + 3 AS BIGINT) AS n_sampled,"
            " CAST((i % 5) * 3 + 3 AS BIGINT) AS n_unique_sha"
            " FROM range(64) t(i) ORDER BY media_id"
        ),
        "text_stats": (
            # word-like tokens: the lookaround split counts alnum runs
            # plus every non-alnum non-space char (RE2 has no lookarounds,
            # so the oracle states that closed form directly)
            "WITH f AS (SELECT doc_id, text, length(text) AS n_chars,"
            " CASE WHEN length(trim(text)) = 0 THEN 0"
            "  ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}\\x{000C}]+')) END AS n_tok"
            " FROM documents)"
            " SELECT doc_id,"
            " len(regexp_extract_all(text, '[A-Za-z0-9]+'))"
            "  + length(regexp_replace(text, '[A-Za-z0-9]|\\s', '', 'g'))"
            "  AS n_word_tokens,"
            " n_chars::DOUBLE / greatest(n_tok::DOUBLE, 1.0) AS avg_token_len,"
            " (n_chars - length(regexp_replace(text, '[.,;:!?\"''`]', '', 'g')))"
            "  ::DOUBLE / greatest(n_chars::DOUBLE, 1.0) AS punct_ratio,"
            " (n_chars - length(regexp_replace(text, '[0-9]', '', 'g')))"
            "  ::DOUBLE / greatest(n_chars::DOUBLE, 1.0) AS digit_ratio,"
            " (n_chars - length(regexp_replace(text, '[A-Z]', '', 'g')))"
            "  ::DOUBLE / greatest(n_chars::DOUBLE, 1.0) AS upper_ratio,"
            " len(regexp_extract_all(text, '(?i)\\b(the|a|an|and|or|of|to|in"
            "|is|are|was|were|it|that|this|for|on|with|as)\\b'))"
            "  ::DOUBLE / greatest(n_tok::DOUBLE, 1.0) AS stopword_ratio"
            " FROM f"
        ),
        "dump_restore_roundtrip": (
            "SELECT lang, TRUE AS roundtrip_ok, TRUE AS cache_valid"
            " FROM documents GROUP BY lang ORDER BY lang"
        ),
        "sql_surface": (
            "WITH two AS (SELECT event_type FROM ("
            "  SELECT DISTINCT event_type FROM events) ORDER BY event_type LIMIT 2)"
            " SELECT count(DISTINCT user_id) AS exact_union,"
            "  TRUE AS within_bound, TRUE AS bytes_valid"
            " FROM events WHERE event_type IN (SELECT event_type FROM two)"
        ),
    }
    # streaming CDC must agree EXACTLY with the batch merge: latest-
    # version-wins is independent of micro-batch splits, so the
    # streaming query shares the batch QUALIFY-merge oracle verbatim
    oracles["streaming_upsert_snapshot"] = oracles["documents_upsert"]
    return oracles
