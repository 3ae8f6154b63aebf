"""curate_corpus: stage semantics (dedup -> gates -> cap), determinism,
and plan hygiene."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # (doc_id, source, text)
        (1, "s1", "alpha beta gamma delta"),        # 4 tokens, kept
        (2, "s1", "alpha beta gamma delta"),        # exact dup of 1 -> dropped
        (3, "s1", "one two"),                       # too short (<3)
        (4, "s1", "a b c d e f g h i j k"),         # 11 tokens, too long (>10)
        (5, "s2", "lorem ipsum dolor sit"),         # kept
        (6, "s2", "quick brown fox jumps over"),    # kept (cap may bind)
        (7, "s2", "five six seven eight nine"),     # kept (cap may bind)
        (8, "s2", ""),                              # blank -> dropped
        (9, "s2", None),                            # NULL -> dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stages(spark, corpus):
    from pfutil_spark.operators.curation import curate_corpus

    out = curate_corpus(
        corpus, min_tokens=3, max_tokens=10, cap=2, seed=0
    ).collect()
    kept = sorted(r["doc_id"] for r in out)
    # doc 2 deduped, 3/4 gated, 8/9 blank/NULL gated; s2 capped 3 -> 2
    assert 1 in kept
    assert 2 not in kept and 3 not in kept and 4 not in kept
    assert 8 not in kept and 9 not in kept
    assert len([d for d in kept if d in (5, 6, 7)]) == 2
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_tokens"] == 4


def test_dedup_keeps_smallest_id(spark, corpus):
    from pfutil_spark.operators.curation import curate_corpus

    out = curate_corpus(corpus, min_tokens=3, max_tokens=10).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 in ids and 2 not in ids


def test_avg_token_len_gates(spark):
    from pfutil_spark.operators.curation import curate_corpus

    df = spark.createDataFrame(
        [
            (1, "s", "aa bb cc"),                    # avg 8/3 = 2.67
            (2, "s", "abcdefghij abcdefghij"),       # avg 21/2 = 10.5
            (3, "s", "a b c"),                       # avg 5/3 = 1.67
        ],
        "doc_id long, source string, text string",
    )
    out = curate_corpus(
        df, min_tokens=2, min_avg_token_len=2.0, max_avg_token_len=9.0
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [1]


def test_validation(spark, corpus):
    from pfutil_spark.operators.curation import curate_corpus

    with pytest.raises(ValueError):
        curate_corpus(corpus, min_tokens=0)
    with pytest.raises(ValueError):
        curate_corpus(corpus, min_tokens=5, max_tokens=4)


def test_partition_invariance(spark, corpus):
    from pfutil_spark.operators.curation import curate_corpus

    base = sorted(
        map(tuple, curate_corpus(corpus, min_tokens=3, max_tokens=10, cap=2).collect())
    )
    rep = sorted(
        map(
            tuple,
            curate_corpus(
                corpus.repartition(6), min_tokens=3, max_tokens=10, cap=2
            ).collect(),
        )
    )
    assert base == rep


def test_cap_subset_of_uncapped(spark, sf_dir):
    from pfutil_spark.operators.curation import curate_corpus

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = {
        r["doc_id"]
        for r in curate_corpus(d, min_tokens=20, max_tokens=80, cap=5, seed=3)
        .select("doc_id")
        .collect()
    }
    uncapped = {
        r["doc_id"]
        for r in curate_corpus(d, min_tokens=20, max_tokens=80, seed=3)
        .select("doc_id")
        .collect()
    }
    assert capped <= uncapped and len(capped) > 0


def test_plan_no_python_no_cartesian(spark, sf_dir):
    from pfutil_spark.operators.curation import curate_corpus

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = curate_corpus(d, min_tokens=20, max_tokens=80, cap=15, seed=3)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
