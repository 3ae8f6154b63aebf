"""stats (histogram / anomaly / degree), search (keyword top-k, word
pair lift), spans (repeated-substring spans + coverage): exact
semantics on crafted fixtures, brute-force differentials, plan gates.
"""

import hashlib

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


# ---------------------------------------------------------------------------
# fixed_width_histogram
# ---------------------------------------------------------------------------


def test_histogram_known(spark):
    from pfutil_spark.operators.stats import fixed_width_histogram

    df = spark.createDataFrame(
        [(-5,), (0,), (9,), (10,), (25,), (29,), (30,), (99,), (None,)],
        "x long",
    )
    rows = {
        r["bin"]: (r["bin_lo"], r["bin_hi"], r["n"])
        for r in fixed_width_histogram(df, "x", 0, 10, 3).collect()
    }
    # -5 clamps into bin 0; 30 and 99 clamp into bin 2; NULL dropped
    assert rows == {0: (0, 10, 3), 1: (10, 20, 1), 2: (20, 30, 4)}


def test_histogram_dense_by_group_and_sparse(spark):
    from pfutil_spark.operators.stats import fixed_width_histogram

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 15)], "g string, x long"
    )
    dense = fixed_width_histogram(df, "x", 0, 10, 2, by="g").collect()
    got = {(r["g"], r["bin"]): r["n"] for r in dense}
    assert got == {("a", 0): 2, ("a", 1): 0, ("b", 0): 0, ("b", 1): 1}
    sparse = fixed_width_histogram(df, "x", 0, 10, 2, by="g", dense=False)
    got_s = {(r["g"], r["bin"]): r["n"] for r in sparse.collect()}
    assert got_s == {("a", 0): 2, ("b", 1): 1}


def test_histogram_dense_null_group(spark):
    from pfutil_spark.operators.stats import fixed_width_histogram

    # a NULL group key is a real group: dense must report its true
    # counts (the zero-fill join is null-safe), matching dense=False
    df = spark.createDataFrame(
        [("a", 1), (None, 15), (None, 16)], "g string, x long"
    )
    dense = {
        (r["g"], r["bin"]): r["n"]
        for r in fixed_width_histogram(df, "x", 0, 10, 2, by="g").collect()
    }
    assert dense == {("a", 0): 1, ("a", 1): 0, (None, 0): 0, (None, 1): 2}


def test_histogram_weighted(spark):
    from pfutil_spark.operators.stats import fixed_width_histogram

    df = spark.createDataFrame(
        [(5, 10), (7, 20), (15, 1), (25, None)], "x long, w long"
    )
    rows = {
        r["bin"]: (r["n"], r["mass"])
        for r in fixed_width_histogram(df, "x", 0, 10, 3, weight="w").collect()
    }
    # NULL weight contributes 0 mass but still counts the row
    assert rows == {0: (2, 30), 1: (1, 1), 2: (1, 0)}
    sparse = fixed_width_histogram(
        df, "x", 0, 10, 3, weight="w", dense=False
    ).collect()
    assert {r["bin"]: (r["n"], r["mass"]) for r in sparse} == rows


def test_histogram_validation(spark):
    from pfutil_spark.operators.stats import fixed_width_histogram

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        fixed_width_histogram(df, "x", 0, 0, 3)
    with pytest.raises(ValueError):
        fixed_width_histogram(df, "x", 0, 10, 0)
    with pytest.raises(TypeError):
        fixed_width_histogram(df, "x", 0.5, 10, 3)
    with pytest.raises(ValueError):
        fixed_width_histogram(df, "x", 0, 2**40, 2**14)


# ---------------------------------------------------------------------------
# daily_count_anomalies
# ---------------------------------------------------------------------------


def test_anomaly_known_spike(spark):
    from pfutil_spark.operators.stats import daily_count_anomalies

    # type "a": days 1..5 have 10 events, day 6 has 100 -> spike
    rows = []
    eid = 0
    for d in range(1, 6):
        for _ in range(10):
            rows.append((eid, f"2024-01-0{d} 12:00:00", "a")); eid += 1
    for _ in range(100):
        rows.append((eid, "2024-01-06 12:00:00", "a")); eid += 1
    # type "b": constant 7/day -> variance 0, nothing flags
    for d in range(1, 7):
        for _ in range(7):
            rows.append((eid, f"2024-01-0{d} 12:00:00", "b")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type")

    out = daily_count_anomalies(df, z2=9).collect()
    got = {(r["event_type"], r["day_s"]): r for r in out}
    # manual: a-days counts [10]*5 + [100]; d=6, S=150, SS=500+10000=10500
    # dev(day6) = 6*100-150 = 450; dev^2 = 202500
    # var_scaled = 9*(6*10500 - 150^2) = 9*(63000-22500) = 364500
    # 202500 > 364500 is FALSE?? -> check dev for the 10-days:
    # dev = 60-150 = -90, dev^2=8100 -> not flagged. Spike day NOT at 3
    # sigma because one huge outlier inflates the variance itself.
    r6 = got[("a", "2024-01-06")]
    assert (r6["n"], r6["n_days"], r6["total"]) == (100, 6, 150)
    assert r6["dev_sq"] == 450 * 450
    assert r6["var_scaled"] == 9 * (6 * 10500 - 150 * 150)
    # at z2=1 (1 sigma) the spike day flags and normal days don't
    out1 = {
        (r["event_type"], r["day_s"]): r["is_anomaly"]
        for r in daily_count_anomalies(df, z2=1).collect()
    }
    assert out1[("a", "2024-01-06")] is True
    assert out1[("a", "2024-01-01")] is False
    for d in range(1, 7):
        assert out1[("b", f"2024-01-0{d}")] is False

    with pytest.raises(ValueError):
        daily_count_anomalies(df, z2=-1)
    with pytest.raises(ValueError):
        daily_count_anomalies(df, z2=2.5)


def test_anomaly_single_day_group(spark):
    from pfutil_spark.operators.stats import daily_count_anomalies

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "solo")],
        "event_id long, ts string, event_type string",
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type")
    [r] = daily_count_anomalies(df).collect()
    # one day: dev = 1*1-1 = 0, var 0 -> not an anomaly
    assert r["is_anomaly"] is False and r["n_days"] == 1


# ---------------------------------------------------------------------------
# degree_distribution
# ---------------------------------------------------------------------------


def test_degree_distribution_known(spark):
    from pfutil_spark.operators.stats import degree_distribution

    df = spark.createDataFrame(
        [
            (1, "a"), (1, "a"), (1, "b"),          # user 1: degree 2 (dup edge)
            (2, "a"),                                # user 2: degree 1
            (3, "a"), (3, "b"), (3, "c"),            # user 3: degree 3
            (4, None), (None, "a"),                  # NULL endpoints dropped
        ],
        "u long, t string",
    )
    got = {
        r["degree"]: r["n_nodes"]
        for r in degree_distribution(df, "u", "t").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# keyword_search_topk
# ---------------------------------------------------------------------------


def test_keyword_search_scores(spark):
    from pfutil_spark.operators.search import keyword_search_topk

    docs = spark.createDataFrame(
        [
            (1, "join join filter"),
            (2, "join window"),
            (3, "filter filter filter"),
            (4, "nothing relevant here"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    # N=5; df(join)=2, df(filter)=2, df(window)=1
    # scores: doc1 = 2*(5-2) + 1*(5-2) = 9; doc2 = 1*3 + 1*(5-1) = 7;
    #         doc3 = 3*3 = 9; doc4/5 absent
    out = keyword_search_topk(
        docs, ["join", "filter", "window"], k=10
    ).collect()
    assert [(r["doc_id"], r["n_hit_terms"], r["score"]) for r in out] == [
        (1, 2, 9),
        (3, 1, 9),
        (2, 2, 7),
    ]

    with pytest.raises(ValueError):
        keyword_search_topk(docs, [])
    with pytest.raises(ValueError):
        keyword_search_topk(docs, ["a", "a"])
    with pytest.raises(ValueError):
        keyword_search_topk(docs, ["a", ""])
    with pytest.raises(ValueError):
        keyword_search_topk(docs, ["a"], k=0)


def test_keyword_search_plan_no_python(spark, sf_dir):
    from pfutil_spark.operators.search import keyword_search_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = keyword_search_topk(d, ["join", "filter"], k=5)
    plan = _plan(df)
    assert "Python" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# word_pair_lift
# ---------------------------------------------------------------------------


def test_word_pair_lift_exact(spark):
    from pfutil_spark.operators.search import word_pair_lift

    docs = spark.createDataFrame(
        [
            (1, "x y z"),
            (2, "x y"),
            (3, "x q"),
            (4, "y q q"),  # duplicate token counts once per doc
        ],
        "doc_id long, text string",
    )
    # N=4; docs: x=3, y=3, q=2, z=1
    out = word_pair_lift(docs, top_v=10, min_pair_docs=1, k=50).collect()
    got = {
        (r["term_a"], r["term_b"]): (
            r["pair_docs"], r["docs_a"], r["docs_b"], r["lift"]
        )
        for r in out
    }
    assert got[("x", "y")] == (2, 3, 3, 2 * 4 / (3 * 3))
    assert got[("q", "y")] == (1, 2, 3, 1 * 4 / (2 * 3))
    assert got[("q", "x")] == (1, 2, 3, 4 / 6)
    assert got[("x", "z")] == (1, 3, 1, 4 / 3)
    # ordering: pair_docs desc then lexicographic
    assert out[0]["term_a"] == "x" and out[0]["term_b"] == "y"

    # min_pair_docs prunes singles
    pruned = word_pair_lift(docs, top_v=10, min_pair_docs=2, k=50).collect()
    assert [(r["term_a"], r["term_b"]) for r in pruned] == [("x", "y")]


def test_word_pair_lift_vocab_cutoff(spark):
    from pfutil_spark.operators.search import word_pair_lift

    # top_v=2 keeps x (3 docs) and then the tie q/y at 2 docs breaks by
    # term asc -> q survives, y does not
    docs = spark.createDataFrame(
        [(1, "x y q"), (2, "x q"), (3, "x y w")],
        "doc_id long, text string",
    )
    out = word_pair_lift(docs, top_v=2, min_pair_docs=1, k=50).collect()
    terms = {t for r in out for t in (r["term_a"], r["term_b"])}
    assert terms == {"x", "q"}

    with pytest.raises(ValueError):
        word_pair_lift(docs, top_v=1)
    with pytest.raises(ValueError):
        word_pair_lift(docs, min_pair_docs=0)
    with pytest.raises(ValueError):
        word_pair_lift(docs, k=0)


# ---------------------------------------------------------------------------
# repeated_spans / span_coverage
# ---------------------------------------------------------------------------


def _uniq(i: int, n: int) -> str:
    """Deterministic mostly-unique filler text of length >= n."""
    out = []
    j = 0
    while sum(len(s) for s in out) < n:
        out.append(hashlib.sha256(f"{i}:{j}".encode()).hexdigest())
        j += 1
    return "".join(out)[:n]


def _brute_spans(texts: dict, k: int, min_count: int):
    """Reference implementation: dict doc_id -> [(start, end, len, nw)]."""
    from collections import Counter

    cnt = Counter()
    for t in texts.values():
        if t is None or len(t) < k:
            continue
        for p in range(len(t) - k + 1):
            cnt[t[p:p + k]] += 1
    spans = {}
    for did, t in texts.items():
        if t is None or len(t) < k:
            continue
        cov = [p for p in range(len(t) - k + 1) if cnt[t[p:p + k]] >= min_count]
        out = []
        cur = None
        for p in cov:
            if cur is None or p - cur[-1] > k:
                cur = [p]
                out.append(cur)
            else:
                cur.append(p)
        spans[did] = [
            (c[0], c[-1] + k, c[-1] + k - c[0], len(c)) for c in out
        ]
    return spans


def test_repeated_spans_crafted(spark):
    from pfutil_spark.operators.spans import repeated_spans

    shared = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN"  # 49 chars
    texts = {
        1: _uniq(1, 60) + shared + _uniq(11, 60),
        2: _uniq(2, 30) + shared + _uniq(12, 90),
        3: _uniq(3, 200),                    # no duplication
        4: "short",                          # below k
        5: _uniq(5, 40) + "ABCDEFGHIJKLMNOPQRSTUVWXYZ" * 2 + _uniq(15, 40),
        # doc 5 self-repeats a 26-char unit -> within-doc duplication
        6: None,
    }
    k = 20
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {}
    for r in repeated_spans(df, k=k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"], r["n_windows"])
        )
    got = {d: sorted(v) for d, v in got.items()}
    exp = {d: v for d, v in _brute_spans(texts, k, 2).items() if v}
    assert got == exp
    # the shared passage is inside the doc-1 span
    (s, e, _, _), = got[1]
    assert s <= 60 and e >= 60 + len(shared)
    assert 3 not in got and 4 not in got and 6 not in got
    assert 5 in got  # within-doc repetition detected


def test_repeated_spans_hash_path_and_min_count(spark):
    from pfutil_spark.operators.spans import repeated_spans

    texts = {i: _uniq(i, 80) + "SHARED-PASSAGE-THAT-REPEATS-EVERYWHERE"
             for i in range(6)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    a = sorted(map(tuple, repeated_spans(df, k=16).collect()))
    b = sorted(map(tuple, repeated_spans(df, k=16, on_hash=True).collect()))
    assert a == b and len(a) == 6
    # min_count above the passage multiplicity -> nothing survives
    assert repeated_spans(df, k=16, min_count=7).count() == 0
    with pytest.raises(ValueError):
        repeated_spans(df, k=1)
    with pytest.raises(ValueError):
        repeated_spans(df, min_count=1)


def test_repeated_spans_brute_force_random(spark):
    from pfutil_spark.operators.spans import repeated_spans

    # deterministic corpus: unique filler + planted repeats at varying
    # positions, including abutting and overlapping window layouts
    plant = "0123456789abcdefghij"  # 20 chars, k=10 -> 11 windows each
    texts = {}
    for i in range(8):
        t = _uniq(i, 50)
        if i % 2 == 0:
            t += plant
        t += _uniq(100 + i, 30)
        if i % 3 == 0:
            t += plant[:15]  # prefix overlap: windows only partly covered
        texts[i] = t + _uniq(200 + i, 20)
    k = 10
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {}
    for r in repeated_spans(df, k=k).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"], r["n_windows"])
        )
    got = {d: sorted(v) for d, v in got.items()}
    exp = {d: sorted(v) for d, v in _brute_spans(texts, k, 2).items() if v}
    assert got == exp


def test_span_coverage(spark):
    from pfutil_spark.operators.spans import span_coverage

    texts = {
        1: _uniq(1, 50) + "A-REPEATED-PASSAGE-OF-MATERIAL" + _uniq(11, 20),
        2: _uniq(2, 10) + "A-REPEATED-PASSAGE-OF-MATERIAL",
        3: _uniq(3, 100),
        4: "",
        5: None,
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_coverage(df, k=12).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[3]["n_spans"] == 0 and got[3]["dup_chars"] == 0
    assert got[3]["dup_frac"] == 0.0
    assert got[4]["n_chars"] == 0 and got[4]["dup_frac"] is None
    assert got[5]["n_chars"] == 0 and got[5]["dup_frac"] is None
    for d in (1, 2):
        r = got[d]
        assert r["n_spans"] == 1 and r["dup_chars"] >= 30
        assert r["dup_frac"] == r["dup_chars"] / r["n_chars"]


def test_spans_plan_no_python(spark, sf_dir):
    from pfutil_spark.operators.spans import repeated_spans, span_coverage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        repeated_spans(d, k=30, on_hash=True),
        span_coverage(d, k=30, on_hash=True),
    ):
        plan = _plan(df)
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_regional_revenue_plan_broadcasts(spark, sf_dir):
    import __spark_entry__ as E

    df = E._q_regional_revenue(spark, sf_dir)
    plan = _plan(df)
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # all four dimension sides broadcast: the only hash-shuffled join
    # is lineitem-orders
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_stats_plans_no_python(spark, sf_dir):
    from pfutil_spark.operators.stats import (
        daily_count_anomalies,
        degree_distribution,
        fixed_width_histogram,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for df in (
        fixed_width_histogram(d, "n_chars", 0, 100, 6, by="lang"),
        daily_count_anomalies(ev),
        degree_distribution(ev, "user_id", "event_type"),
    ):
        plan = _plan(df)
        assert "Python" not in plan, plan
