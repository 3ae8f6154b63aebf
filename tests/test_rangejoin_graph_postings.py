"""interval_join / triangle_count / build_postings: exact semantics on
crafted fixtures, brute-force differentials, and plan gates (no
cartesian product in the banded join; zero Python everywhere)."""

import itertools
import random

import pytest

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


def _brute_pairs(intervals, points, keyed=False):
    out = set()
    for iv in intervals:
        for p in points:
            if keyed and iv[-1] != p[-1]:
                continue
            if iv[1] is None or iv[2] is None or p[1] is None:
                continue
            if iv[1] <= p[1] < iv[2]:
                out.add((iv[0], p[0]))
    return out


def test_interval_join_matches_brute_force(spark):
    from pfutil_spark.operators.rangejoin import interval_join

    rng = random.Random(7)
    ivs = [
        (i, s, s + rng.randint(0, 40))
        for i, s in ((i, rng.randint(0, 200)) for i in range(60))
    ]
    pts = [(j, rng.randint(-10, 260)) for j in range(300)]
    idf = spark.createDataFrame(ivs, "iid long, s long, e long")
    pdf = spark.createDataFrame(pts, "pid long, p long")
    for w in (1, 7, 64):
        got = {
            (r["iid"], r["pid"])
            for r in interval_join(
                idf, pdf, "s", "e", "p", bucket_width=w
            ).collect()
        }
        assert got == _brute_pairs(ivs, pts), f"bucket_width={w}"


def test_interval_join_keys_boundaries_and_nulls(spark):
    from pfutil_spark.operators.rangejoin import interval_join

    idf = spark.createDataFrame(
        [(1, 0, 10, "a"), (2, 0, 10, "b"), (3, None, 10, "a"), (4, 5, 5, "a")],
        "iid long, s long, e long, k string",
    )
    pdf = spark.createDataFrame(
        [(1, 0, "a"), (2, 10, "a"), (3, 9, "b"), (4, None, "a"), (5, 5, "a")],
        "pid long, p long, k string",
    )
    got = {
        (r["iid"], r["pid"])
        for r in interval_join(
            idf, pdf, "s", "e", "p", keys=("k",), bucket_width=4
        ).collect()
    }
    # start inclusive, end exclusive; key must match; NULL endpoint /
    # point and empty band (4) match nothing
    assert got == {(1, 1), (1, 5), (2, 3)}


def test_interval_join_validation_and_fanout_guard(spark):
    from pfutil_spark.operators.rangejoin import interval_join

    idf = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, s long, e long")
    pdf = spark.createDataFrame([(1, 5)], "pid long, p long")
    with pytest.raises(ValueError):
        interval_join(idf, pdf, "s", "e", "p", bucket_width=0)
    with pytest.raises(ValueError):
        # clashing non-key column name
        interval_join(
            idf.withColumnRenamed("iid", "pid"), pdf, "s", "e", "p"
        )
    wide = interval_join(
        idf, pdf, "s", "e", "p", bucket_width=1, max_buckets_per_interval=100
    )
    with pytest.raises(Exception, match="spans more than 100 buckets"):
        wide.collect()


def test_interval_join_plan_no_cartesian_no_python(spark):
    from pfutil_spark.operators.rangejoin import interval_join

    idf = spark.range(100).select(
        F.col("id").alias("iid"),
        (F.col("id") * 3).alias("s"),
        (F.col("id") * 3 + 14).alias("e"),
    )
    pdf = spark.range(1000).select(
        F.col("id").alias("pid"), (F.col("id") % 331).alias("p")
    )
    plan = _plan(interval_join(idf, pdf, "s", "e", "p", bucket_width=16))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan, plan


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _brute_triangles(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        x, y = min(a, b), max(a, b)
        es.add((x, y))
    nodes = sorted({v for e in es for v in e})
    n = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            n += 1
    return len(nodes), len(es), n


def test_triangle_count_known_and_random(spark):
    from pfutil_spark.operators.stats import triangle_count

    # K4 with duplicate/reversed edges and a self-loop: C(4,3) = 4
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    k4 += [(0, 0), (1, 2), (2, 1)]
    df = spark.createDataFrame(k4, "a long, b long")
    [r] = triangle_count(df, "a", "b").collect()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)

    rng = random.Random(13)
    edges = [(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(160)]
    edges.append((None, 3))
    df2 = spark.createDataFrame(edges, "a long, b long")
    [r2] = triangle_count(df2, "a", "b").collect()
    assert (
        r2["n_nodes"], r2["n_edges"], r2["n_triangles"]
    ) == _brute_triangles(edges)


def test_triangle_count_triangle_free_and_empty(spark):
    from pfutil_spark.operators.stats import triangle_count

    # bipartite graphs are triangle-free
    bip = [(a, 100 + b) for a in range(5) for b in range(5)]
    [r] = triangle_count(
        spark.createDataFrame(bip, "a long, b long"), "a", "b"
    ).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (10, 25, 0)

    empty = spark.createDataFrame([], "a long, b long")
    [r2] = triangle_count(empty, "a", "b").collect()
    assert (r2["n_nodes"], r2["n_edges"], r2["n_triangles"]) == (0, 0, 0)


def test_triangle_count_plan_no_python(spark):
    from pfutil_spark.operators.stats import triangle_count

    df = spark.range(100).select(
        (F.col("id") % 31).alias("a"), (F.col("id") % 17).alias("b")
    )
    plan = _plan(triangle_count(df, "a", "b"))
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# build_postings
# ---------------------------------------------------------------------------


def test_build_postings_exact(spark):
    from pfutil_spark.operators.search import build_postings

    docs = [
        (10, "red blue"),
        (3, "blue  blue green"),
        (7, "red"),
        (5, None),
        (6, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["term"]: r for r in build_postings(df, head=2).collect()}
    assert set(rows) == {"red", "blue", "green"}
    assert (
        rows["red"]["doc_freq"], rows["red"]["min_id"], rows["red"]["max_id"],
        rows["red"]["sum_ids"], rows["red"]["postings_head"],
    ) == (2, 7, 10, 17, "7,10")
    # duplicate term in one doc counted once; head caps the list but
    # not the aggregates
    assert rows["blue"]["doc_freq"] == 2
    assert rows["blue"]["postings_head"] == "3,10"
    assert rows["green"]["postings_head"] == "3"

    pruned = {
        r["term"] for r in build_postings(df, min_df=2).collect()
    }
    assert pruned == {"red", "blue"}

    with pytest.raises(ValueError):
        build_postings(df, min_df=0)
    with pytest.raises(ValueError):
        build_postings(df, head=0)


def test_build_postings_head_bounds_list_not_stats(spark):
    from pfutil_spark.operators.search import build_postings

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("common word").alias("text")
    )
    rows = {r["term"]: r for r in build_postings(df, head=5).collect()}
    for t in ("common", "word"):
        assert rows[t]["doc_freq"] == 100
        assert rows[t]["sum_ids"] == 4950
        assert rows[t]["postings_head"] == "0,1,2,3,4"


def test_build_postings_plan_no_python(spark):
    from pfutil_spark.operators.search import build_postings

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = _plan(build_postings(df))
    assert "Python" not in plan, plan
