"""edit_distance_pairs / fuzzy_dedup_pairs / join_skew_report: exact
semantics on crafted fixtures, python differential for levenshtein,
plan gates."""

import pytest

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_edit_distance_pairs_matches_python(spark):
    from pfutil_spark.operators.dedup import edit_distance_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),
        (3, "a completely different sentence altogether here"),
        (4, "the quick brown fox"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "id_a long, id_b long"
    )
    texts = dict(docs)
    got = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in edit_distance_pairs(df, pairs, "text", "doc_id").collect()
    }
    assert got == {
        (a, b): _lev(texts[a], texts[b]) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3)]
    }
    # threshold form drops pairs above the band and keeps exact values
    # below it
    thr = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in edit_distance_pairs(
            df, pairs, "text", "doc_id", max_edits=5
        ).collect()
    }
    assert thr == {(1, 2): got[(1, 2)]}
    with pytest.raises(ValueError):
        edit_distance_pairs(df, pairs, "text", "doc_id", max_edits=-1)


def test_edit_distance_pairs_plan_no_python(spark):
    from pfutil_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = _plan(edit_distance_pairs(df, pairs, "text", "doc_id", max_edits=3))
    assert "Python" not in plan, plan


def test_fuzzy_dedup_pairs_finds_injected_neardups(spark):
    from pfutil_spark.operators.dedup import fuzzy_dedup_pairs

    base = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua"
    )
    docs = [(i, f"{base} tail{i:04d}") for i in range(40)]
    # 100/101: one-word edit of each other; 200/201: identical
    docs += [
        (100, base + " extra"),
        (101, base + " extro"),
        (200, "independent duplicate content block alpha beta gamma delta"),
        (201, "independent duplicate content block alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in fuzzy_dedup_pairs(
            df, "text", "doc_id", max_edits=4, min_jaccard=0.5
        ).collect()
    }
    assert got[(100, 101)] == 1
    assert got[(200, 201)] == 0
    # the tailNNNN docs differ by >= 1 digit edit but share the long
    # base: they may LSH-pair, but any reported pair's edit count is
    # exact and within the threshold
    assert all(0 <= e <= 4 for e in got.values())


def test_join_skew_report_exact(spark):
    from pfutil_spark.operators.audit import join_skew_report

    left = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 2 + [(3,)] * 1 + [(None,)] * 3, "k long"
    )
    right = spark.createDataFrame(
        [(1,)] * 4 + [(3,)] * 6 + [(9,)] * 2 + [(None,)], "k long"
    )
    rows = join_skew_report(left, right, "k", top=10).collect()
    got = [(r["key"], r["left_rows"], r["right_rows"], r["out_rows"]) for r in rows]
    # ordered by out_rows desc then key; one-sided keys kept at 0
    assert got == [(1, 5, 4, 20), (3, 1, 6, 6), (2, 2, 0, 0), (9, 0, 2, 0)]

    top1 = join_skew_report(left, right, "k", top=1).collect()
    assert [(r["key"], r["out_rows"]) for r in top1] == [(1, 20)]
    with pytest.raises(ValueError):
        join_skew_report(left, right, "k", top=0)


def test_join_skew_report_plan_no_python(spark):
    from pfutil_spark.operators.audit import join_skew_report

    l = spark.range(100).select((F.col("id") % 7).alias("a"))
    r = spark.range(100).select((F.col("id") % 5).alias("b"))
    plan = _plan(join_skew_report(l, r, "a", "b", top=5))
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
