"""Benchmark-contamination operator (operators/contamination.py):
word-shingle correctness, brute-force overlap parity, hash-vs-string
join equivalence, decontamination complement, and the scale-posture
plan gates (broadcast eval side, zero Python nodes)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators.contamination import (
    contaminated_ids,
    decontaminate,
    word_shingles_col,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


_PY_NODES = ("EvalPython", "PythonUDF", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas")


def _assert_no_python(plan: str) -> None:
    # NOTE: can't grep bare "Python" — createDataFrame test inputs scan
    # as "applySchemaToPythonRDD" RDDs, which is input plumbing, not a
    # Python eval node in the operator plan
    for node in _PY_NODES:
        assert node not in plan, plan


def _brute_force_flags(corpus_rows, eval_rows, n):
    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ev = set()
    for _, t in eval_rows:
        ev |= shingles(t or "")
    return {i for i, t in corpus_rows if t and shingles(t) & ev}


@pytest.fixture(scope="module")
def corpora(spark):
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    corpus_rows = [
        (i, " ".join(rng.choice(vocab, rng.integers(2, 30)))) for i in range(300)
    ]
    corpus_rows += [(300, ""), (301, "   "), (302, None), (303, "one two")]
    eval_rows = [
        (1000 + i, " ".join(rng.choice(vocab, rng.integers(5, 25))))
        for i in range(25)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string").repartition(5)
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    return corpus, ev, corpus_rows, eval_rows


class TestWordShingles:
    def test_values_and_edges(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b"), (3, ""), (4, "   "), (5, None)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["sh"]
            for r in df.select(
                "doc_id", word_shingles_col("text", 3).alias("sh")
            ).collect()
        }
        assert got[1] == ["a b c", "b c d", "c d e"]
        assert got[2] == [] and got[3] == [] and got[4] == []
        assert got[5] is None or got[5] == []  # null text -> no shingles

    def test_pure_jvm(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        plan = _plan(df.select(word_shingles_col("text", 2).alias("s")))
        _assert_no_python(plan)


class TestContaminationFlags:
    def test_matches_brute_force(self, corpora):
        corpus, ev, corpus_rows, eval_rows = corpora
        expect = _brute_force_flags(corpus_rows, eval_rows, 3)
        got = {
            r["doc_id"] for r in contaminated_ids(corpus, ev, n=3).collect()
        }
        assert got == expect and len(expect) > 0

    def test_hash_equals_string_join(self, corpora):
        corpus, ev, *_ = corpora
        a = {r["doc_id"] for r in contaminated_ids(corpus, ev, n=4, on_hash=True).collect()}
        b = {r["doc_id"] for r in contaminated_ids(corpus, ev, n=4, on_hash=False).collect()}
        assert a == b

    def test_broadcast_matches_shuffle(self, corpora):
        corpus, ev, *_ = corpora
        a = {
            r["doc_id"]
            for r in contaminated_ids(corpus, ev, n=3, broadcast_eval=True).collect()
        }
        b = {
            r["doc_id"]
            for r in contaminated_ids(corpus, ev, n=3, broadcast_eval=False).collect()
        }
        assert a == b

    def test_decontaminate_is_complement(self, corpora):
        corpus, ev, corpus_rows, _ = corpora
        flagged = {r["doc_id"] for r in contaminated_ids(corpus, ev, n=3).collect()}
        clean = {r["doc_id"] for r in decontaminate(corpus, ev, n=3).collect()}
        assert clean == {i for i, _ in corpus_rows} - flagged
        # all columns survive
        assert decontaminate(corpus, ev, n=3).columns == corpus.columns

    def test_no_eval_overlap_keeps_everything(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, "x y z q")], "doc_id long, text string")
        assert contaminated_ids(corpus, ev, n=3).count() == 0
        assert decontaminate(corpus, ev, n=3).count() == 2


class TestContaminationPlan:
    def test_broadcast_eval_and_no_python(self, corpora):
        """broadcast_eval must put the eval shingle set on a
        BroadcastExchange (map-only corpus pass — the 100 TB shape) and
        the whole flag plan must stay Python-free."""
        corpus, ev, *_ = corpora
        plan = _plan(contaminated_ids(corpus, ev, n=3, broadcast_eval=True))
        assert "BroadcastExchange" in plan, plan
        _assert_no_python(plan)

    def test_hash_keys_cross_the_join(self, corpora):
        """on_hash: the semi-join keys must be xxhash64 longs, not raw
        shingle strings (8-byte shuffle/broadcast payloads)."""
        corpus, ev, *_ = corpora
        plan = _plan(contaminated_ids(corpus, ev, n=3))
        assert "xxhash64" in plan, plan


def test_unigram_blank_documents_not_flagged(spark):
    """n=1 regression: split('', '\\s+') yields [''] — without the
    zero-token guard every blank corpus doc matched any blank eval doc
    via the phantom "" shingle and was silently deleted."""
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    blank_ev = spark.createDataFrame(
        [(100, ""), (101, "   ")], "doc_id long, text string"
    )
    assert contaminated_ids(corpus, blank_ev, n=1).count() == 0
    assert decontaminate(corpus, blank_ev, n=1).count() == 4
    # a real unigram overlap still flags
    ev = spark.createDataFrame([(102, "beta")], "doc_id long, text string")
    assert {
        r["doc_id"] for r in contaminated_ids(corpus, ev, n=1).collect()
    } == {0}
    # the documented contract: blank/null text -> EMPTY shingle array
    rows = corpus.select(
        "doc_id", word_shingles_col("text", 1).alias("s")
    ).collect()
    got = {r["doc_id"]: r["s"] for r in rows}
    assert got[0] == ["alpha", "beta"]
    assert got[1] == [] and got[2] == [] and got[3] == []


class TestSharedNgramStats:
    def test_matches_brute_force_and_hash_equivalence(self, spark):
        from pfutil_spark.operators.contamination import shared_ngram_stats

        rows = [
            (0, "a b c d e"),        # shares "a b c"/"b c d" with doc 1
            (1, "a b c d x"),
            (2, "q r s t"),          # unique
            (3, "m m m m"),          # within-doc repetition only
            (4, "m m m"),            # shares "m m m" with doc 3
            (5, ""), (6, None), (7, "one two"),  # < n tokens
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)

        def brute(n=3):
            sh = {
                i: {" ".join(t.split()[j : j + n])
                    for j in range(len(t.split()) - n + 1)}
                for i, t in rows if t
            }
            out = {}
            for i, _ in rows:
                mine = sh.get(i, set())
                other = set().union(*(s for k, s in sh.items() if k != i)) if sh else set()
                shared = len(mine & other)
                out[i] = (len(mine), shared,
                          shared / len(mine) if mine else None)
            return out

        exp = brute()
        for on_hash in (True, False):
            got = {
                r["doc_id"]: (r["n_ngrams"], r["n_shared"], r["shared_frac"])
                for r in shared_ngram_stats(corpus, n=3, on_hash=on_hash).collect()
            }
            assert set(got) == set(exp)
            for i, (nn, ns, fr) in exp.items():
                gn, gs, gf = got[i]
                assert (gn, gs) == (nn, ns), (on_hash, i)
                if fr is None:
                    assert gf is None
                else:
                    assert gf == fr  # single IEEE division, exact

    def test_within_doc_repetition_not_counted(self, spark):
        from pfutil_spark.operators.contamination import shared_ngram_stats

        corpus = spark.createDataFrame(
            [(0, "x y x y x y"), (1, "totally different words here")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_ngrams"], r["n_shared"])
            for r in shared_ngram_stats(corpus, n=2).collect()
        }
        # doc 0 distinct 2-grams: "x y", "y x" — repeated within the doc
        # but in no OTHER doc
        assert got[0] == (2, 0)
        assert got[1] == (3, 0)

    def test_plan_no_python_and_hash_join(self, spark):
        from pfutil_spark.operators.contamination import shared_ngram_stats

        corpus = spark.createDataFrame(
            [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
        )
        plan = _plan(shared_ngram_stats(corpus, n=2))
        _assert_no_python(plan)
        assert "xxhash64" in plan, plan


class TestBloomContamination:
    def test_exact_at_default_fpr_and_superset_always(self, corpora):
        from pfutil_spark.operators.contamination import bloom_contaminated_ids

        corpus, ev, corpus_rows, eval_rows = corpora
        exact = _brute_force_flags(corpus_rows, eval_rows, 3)
        got = {
            r["doc_id"]
            for r in bloom_contaminated_ids(corpus, ev, n=3).collect()
        }
        # no false negatives (the guarantee) ...
        assert got >= exact
        # ... and at fpr=1e-6 over a few-hundred-shingle corpus the
        # expected false-flag count is ~1e-3: exact equality
        assert got == exact

    def test_overfilled_filter_keeps_no_miss_guarantee(self, corpora):
        from pfutil_spark.operators.contamination import bloom_contaminated_ids

        corpus, ev, corpus_rows, eval_rows = corpora
        exact = _brute_force_flags(corpus_rows, eval_rows, 3)
        # expected_n=4 at fpr=0.5: the filter saturates -> false flags
        # galore, but NEVER a miss
        got = {
            r["doc_id"]
            for r in bloom_contaminated_ids(
                corpus, ev, n=3, fpr=0.5, expected_n=4
            ).collect()
        }
        assert got >= exact

    def test_corpus_plan_single_exchange(self, spark, corpora):
        import re

        from pfutil_spark.operators.contamination import bloom_contaminated_ids

        _, ev, corpus_rows, _ = corpora
        # fresh un-repartitioned corpus: the fixture's repartition(5)
        # would add its own round-robin Exchange to the plan under test
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        plan = _plan(bloom_contaminated_ids(corpus, ev, n=3))
        # corpus side is map-only up to the final distinct-ids agg: the
        # ONLY Exchange is the id distinct (eval side contributed just
        # the collected filter bytes, no node here). Formatted explain
        # prints each node twice (tree + detail) -> count unique ids.
        assert len(set(re.findall(r"\(\d+\) Exchange", plan))) == 1, plan
        # membership test is the single (Arrow-vectorized) Python node
        assert len(set(re.findall(r"\(\d+\) ArrowEvalPython", plan))) == 1, plan
        for node in ("FlatMapGroupsInPandas", "MapInPandas", "BatchEvalPython"):
            assert node not in plan, plan

    def test_empty_eval_flags_nothing(self, spark):
        from pfutil_spark.operators.contamination import bloom_contaminated_ids

        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([], "doc_id long, text string")
        assert bloom_contaminated_ids(corpus, ev, n=2).count() == 0

    def test_zero_partition_eval_plan(self, spark):
        # filter(lit(False)) folds to an empty LocalRelation backed by
        # emptyRDD -> ZERO partitions -> zero sketch partials; the
        # collect()-guard must handle the no-rows case (createDataFrame
        # of an empty list still has defaultParallelism partitions, so
        # it does NOT cover this)
        from pfutil_spark.operators.contamination import bloom_contaminated_ids
        from pfutil_spark.operators.sketch_agg import bloom_filter_join

        corpus = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
        )
        ev = corpus.filter(F.lit(False))
        assert bloom_contaminated_ids(corpus, ev, n=2).count() == 0
        joined = bloom_filter_join(
            corpus, ev.select("doc_id", F.col("text").alias("t2")), "doc_id"
        )
        assert joined.count() == 0
        assert set(joined.columns) == {"doc_id", "text", "t2"}


class TestBoilerplateClean:
    DOCS = [
        (0, "intro A\nCOOKIE BANNER\nbody text zero\nfooter nav"),
        (1, "COOKIE BANNER\nbody text one\nfooter nav"),
        (2, "body text two\nCOOKIE BANNER\nfooter nav"),
        (3, "COOKIE BANNER\nfooter nav"),  # all lines boilerplate
        (4, "unique only\nCOOKIE BANNER\nCOOKIE BANNER"),  # in-doc repeat
        (5, None),  # null text: zero lines
    ]

    def frame(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id int, text string")

    def test_removes_every_occurrence_keeps_order(self, spark):
        """Lines in >2 distinct docs are deleted wherever they occur
        (including within-doc repeats); surviving lines keep their
        original order; all-boiler docs come back empty; NULL text is
        zero lines, not one empty line."""
        from pfutil_spark.operators.contamination import remove_boilerplate_lines

        out = {
            r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_removed"])
            for r in remove_boilerplate_lines(
                self.frame(spark), "text", "doc_id", delim="\n", max_docs=2
            ).collect()
        }
        # COOKIE BANNER in 5 docs, footer nav in 4 -> both boilerplate
        assert out[0] == ("intro A\nbody text zero", 2, 2)
        assert out[1] == ("body text one", 1, 2)
        assert out[2] == ("body text two", 1, 2)
        assert out[3] == ("", 0, 2)
        assert out[4] == ("unique only", 1, 2)  # both in-doc repeats removed
        assert out[5] == ("", 0, 0)

    def test_threshold_counts_distinct_docs_not_occurrences(self, spark):
        """doc 4 repeats COOKIE BANNER twice, but the doc-count for the
        threshold is DISTINCT docs: with max_docs=5 (>= 5 docs contain
        it) nothing is boilerplate and every doc round-trips."""
        from pfutil_spark.operators.contamination import remove_boilerplate_lines

        out = {
            r["doc_id"]: r["clean_text"]
            for r in remove_boilerplate_lines(
                self.frame(spark), "text", "doc_id", delim="\n", max_docs=5
            ).collect()
        }
        for did, text in self.DOCS:
            assert out[did] == (text or "")

    def test_hash_and_string_keys_agree_and_partition_independent(self, spark):
        from pfutil_spark.operators.contamination import remove_boilerplate_lines

        d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        a = sorted(map(tuple, remove_boilerplate_lines(
            d, "text", "doc_id", delim=" ", max_docs=400, on_hash=True).collect()))
        b = sorted(map(tuple, remove_boilerplate_lines(
            d, "text", "doc_id", delim=" ", max_docs=400, on_hash=False).collect()))
        c = sorted(map(tuple, remove_boilerplate_lines(
            d.repartition(17), "text", "doc_id", delim=" ", max_docs=400).collect()))
        assert a == b == c
        assert any(r[3] > 0 for r in a)  # something was actually removed

    def test_line_counts_match_brute_force(self, spark):
        from collections import Counter

        from pfutil_spark.operators.contamination import boilerplate_line_counts

        got = {
            (r["line"], r["n_docs"])
            for r in boilerplate_line_counts(
                self.frame(spark), "text", "doc_id", delim="\n", min_docs=3
            ).collect()
        }
        cnt = Counter()
        for _, text in self.DOCS:
            for line in set((text or "").split("\n") if text else []):
                cnt[line] += 1
        assert got == {(l, n) for l, n in cnt.items() if n >= 3}

    def test_validation_and_pure_jvm_plan(self, spark):
        import pytest

        from pfutil_spark.operators.contamination import remove_boilerplate_lines

        d = self.frame(spark)
        with pytest.raises(ValueError, match="non-empty"):
            remove_boilerplate_lines(d, "text", "doc_id", delim="")
        with pytest.raises(ValueError, match="not supported"):
            remove_boilerplate_lines(d, "text", "doc_id", delim="a\\Eb")
        plan = (
            remove_boilerplate_lines(d, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan


class TestDedupLinesWithinDoc:
    def test_first_occurrence_kept_order_preserved(self, spark):
        from pfutil_spark.operators.contamination import dedup_lines_within_doc

        d = spark.createDataFrame(
            [
                (1, "a\nb\na\nc\nb\na"),   # repeats of a and b
                (2, "x\ny\nz"),             # all unique: identity
                (3, None),                   # NULL: zero lines
                (4, "q\nq\nq"),             # collapses to one line
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_removed"])
            for r in dedup_lines_within_doc(d).collect()
        }
        assert got[1] == ("a\nb\nc", 3, 3)
        assert got[2] == ("x\ny\nz", 3, 0)
        assert got[3] == ("", 0, 0)
        assert got[4] == ("q", 1, 2)

    def test_partition_independent_zero_python(self, spark):
        from pfutil_spark.operators.contamination import dedup_lines_within_doc

        d = spark.createDataFrame(
            [(i, " ".join(f"w{j % 5}" for j in range(i % 11))) for i in range(100)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, dedup_lines_within_doc(d, delim=" ").collect()))
        b = sorted(map(tuple, dedup_lines_within_doc(d.repartition(9), delim=" ").collect()))
        assert a == b
        plan = (
            dedup_lines_within_doc(d, delim=" ")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan


class TestNgramNovelty:
    def _frames(self, spark):
        probe = spark.createDataFrame(
            [
                (1, "a b c d"),      # grams: "a b c","b c d" - both seen
                (2, "a b c x y z"),  # 4 grams, "x y z" + "c x y"+"b c x" novel
                (3, "xx"),           # < 3 tokens -> NULL frac
            ],
            "doc_id long, text string",
        )
        ref = spark.createDataFrame(
            [(10, "a b c d e")],  # grams: "a b c","b c d","c d e"
            "doc_id long, text string",
        )
        return probe, ref

    def test_known_answer(self, spark):
        from pfutil_spark.operators.contamination import ngram_novelty_stats

        probe, ref = self._frames(spark)
        rows = {
            r["doc_id"]: (r["n_ngrams"], r["n_novel"], r["novelty_frac"])
            for r in ngram_novelty_stats(probe, ref, n=3).collect()
        }
        assert rows[1] == (2, 0, 0.0)
        assert rows[2] == (4, 3, 0.75)
        assert rows[3] == (0, 0, None)

    def test_hash_and_raw_agree(self, spark):
        from pfutil_spark.operators.contamination import ngram_novelty_stats

        probe, ref = self._frames(spark)
        h = sorted(map(tuple, ngram_novelty_stats(probe, ref, n=3, on_hash=True).collect()))
        s = sorted(map(tuple, ngram_novelty_stats(probe, ref, n=3, on_hash=False).collect()))
        assert h == s

    def test_broadcast_reference_parity_and_invariance(self, spark):
        from pfutil_spark.operators.contamination import ngram_novelty_stats

        probe, ref = self._frames(spark)
        base = sorted(map(tuple, ngram_novelty_stats(probe, ref, n=3).collect()))
        bc = sorted(
            map(
                tuple,
                ngram_novelty_stats(
                    probe, ref, n=3, broadcast_reference=True
                ).collect(),
            )
        )
        rep = sorted(
            map(
                tuple,
                ngram_novelty_stats(
                    probe.repartition(5), ref.repartition(3), n=3
                ).collect(),
            )
        )
        assert base == bc == rep

    def test_duplicate_ngrams_counted_once(self, spark):
        from pfutil_spark.operators.contamination import ngram_novelty_stats

        probe = spark.createDataFrame(
            [(1, "q w q w q w")],  # "q w q","w q w" repeat; distinct = 2
            "doc_id long, text string",
        )
        ref = spark.createDataFrame([(9, "nothing shared here")],
                                    "doc_id long, text string")
        r = ngram_novelty_stats(probe, ref, n=3).collect()[0]
        assert (r["n_ngrams"], r["n_novel"], r["novelty_frac"]) == (2, 2, 1.0)
