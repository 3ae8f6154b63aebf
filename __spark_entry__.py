"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Redis-wire-compatible HLL
distinct-content-sha256 per lang + global PFMERGE) on sf0.001.
``queries()`` exposes exact relational queries (DuckDB-oracled) plus the
sketch operators (rows-only driver check; their correctness gates are the
golden-fixture and error-bound pytest suites — see tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    # dimension side is small -> broadcast; decimal-exact sum cast to double
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("distinct_custs"),
        )
    )


def _q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1-shaped; decimal-exact sums cast to double for oracle hashing
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
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


def _q_hll_text_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hll(4)(
        spark, sf_dir, "documents", lambda d: F.sha2(F.col("text"), 256), ("lang",)
    )


def _q_hll_users_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pfutil_spark.operators import pf_count_distinct

    ev = _t(spark, sf_dir, "events").withColumn(
        "uid", F.col("user_id").cast("string")
    )
    return pf_count_distinct(ev, "uid", by=(), version=4)


def _q_hll_v5_orderkey_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hll(5)(
        spark, sf_dir, "lineitem",
        lambda d: F.col("l_orderkey").cast("string"), ("l_returnflag",),
    )


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # exact, DuckDB-oracled
        "sha256_rows": _q_sha256_rows,
        "exact_distinct_by_lang": _q_exact_distinct_by_lang,
        "events_distinct_users": _q_events_distinct_users,
        "orders_customer_join": _q_orders_customer_join,
        "lineitem_pricing": _q_lineitem_pricing,
        "top_users": _q_top_users,
        "nation_region_rollup": _q_nation_region_rollup,
        "hll_error_bound": _q_hll_error_bound,
        # sketch queries (rows-only driver check; pytest gates exactness)
        "hll_text_by_lang": _q_hll_text_by_lang,
        "hll_users_global": _q_hll_users_global,
        "hll_v5_orderkey_by_flag": _q_hll_v5_orderkey_by_flag,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
    }
