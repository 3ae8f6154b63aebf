"""Deterministic content-keyed sampling (operators/sampling.py): exact
reproducibility across partitionings, referential consistency across
tables, split disjointness, per-stratum rates, pure-JVM plan."""

import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators.sampling import (
    hash_frac_hex_col,
    hash_sample,
    hash_split_col,
    sql_frac_expr,
    sql_split_expr,
    stratified_hash_sample,
)


def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


class TestHashSample:
    def test_deterministic_across_partitionings_and_runs(self, spark):
        d = docs(spark)
        ids1 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.3).select("doc_id").collect()}
        ids2 = {
            r["doc_id"]
            for r in hash_sample(d.repartition(13), "doc_id", 0.3).select("doc_id").collect()
        }
        assert ids1 == ids2
        assert 0 < len(ids1) < 500

    def test_rate_monotone_nested_samples(self, spark):
        """Smaller rate => a SUBSET of the larger rate's rows (same seed):
        the hash draw per key is fixed, only the threshold moves."""
        d = docs(spark)
        small = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.1).select("doc_id").collect()}
        big = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.5).select("doc_id").collect()}
        assert small <= big

    def test_referential_consistency_across_tables(self, spark):
        """Sampling customers and orders on the shared custkey keeps the
        join closed: every sampled order's customer is sampled."""
        cst = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        kept_c = {
            r["c_custkey"]
            for r in hash_sample(cst, "c_custkey", 0.2, seed=3).select("c_custkey").collect()
        }
        kept_o = hash_sample(orders, "o_custkey", 0.2, seed=3)
        o_keys = {r["o_custkey"] for r in kept_o.select("o_custkey").distinct().collect()}
        assert o_keys <= kept_c
        # and it is all-or-nothing per key: every order of a sampled
        # customer is kept
        n_expected = orders.filter(F.col("o_custkey").isin(list(kept_c))).count()
        assert kept_o.count() == n_expected

    def test_rate_edges_and_validation(self, spark):
        d = docs(spark)
        assert hash_sample(d, "doc_id", 0.0).count() == 0
        assert hash_sample(d, "doc_id", 1.0).count() == 500
        with pytest.raises(ValueError, match="rate"):
            hash_sample(d, "doc_id", 1.5)

    def test_null_keys_never_sampled(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
        assert hash_sample(df, "k", 1.0).count() == 2

    def test_rate_one_keeps_maximal_draw(self, spark):
        """ADVICE r3: rate=1.0 must be the identity on non-null keys even
        for a key whose 60-bit draw is exactly 0xfffffffffffffff (the
        clamped threshold + strict compare would drop it)."""
        from pfutil_spark.operators.sampling import _keep_cond

        df = spark.createDataFrame([("f" * 15,), (None,)], "h string")
        assert df.filter(_keep_cond(F.col("h"), 1.0)).count() == 1
        # the old strict-compare shape indeed drops the all-f draw
        assert df.filter(F.col("h") < "f" * 15).count() == 0
        # stratified shares the same keep-condition for its 1.0 strata
        d2 = spark.createDataFrame([("f" * 15, "s")], "h string, g string")
        kept = stratified_hash_sample(
            d2.withColumnRenamed("h", "k"), "k", "g", {"s": 1.0}
        )
        assert kept.count() == 1

    def test_pure_jvm_plan(self, spark):
        """Zero Python nodes in EVERY sampling/split plan shape — a
        refactor must not silently reintroduce a UDF (VERDICT r3 #8)."""
        d = docs(spark)
        shapes = [
            hash_sample(d, "doc_id", 0.2),
            hash_sample(d, "doc_id", 1.0),  # short-circuit branch too
            d.select(hash_split_col("doc_id").alias("s")),
            stratified_hash_sample(d, "doc_id", "lang", {"en": 0.5, "zh": 1.0}),
        ]
        for df in shapes:
            plan = df._jdf.queryExecution().executedPlan().toString()
            for node in (
                "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "MapInArrow", "PythonUDTF",
            ):
                assert node not in plan


class TestHashSplit:
    def test_split_disjoint_exhaustive_and_proportional(self, spark):
        d = docs(spark)
        got = (
            d.select(hash_split_col("doc_id").alias("s"))
            .groupBy("s").count().collect()
        )
        counts = {r["s"]: r["count"] for r in got}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 500  # exhaustive, disjoint
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
        # binomial 3-sigma on 500 draws
        assert abs(counts["train"] - 400) < 3 * (500 * 0.8 * 0.2) ** 0.5 + 1

    def test_weights_must_sum_to_one(self, spark):
        with pytest.raises(ValueError, match="sum"):
            docs(spark).select(hash_split_col("doc_id", [("a", 0.5), ("b", 0.6)]))

    def test_sql_mirror_thresholds_bit_identical(self, spark):
        """The DuckDB mirror must use the same accumulated-float
        thresholds as the Spark column (0.8+0.1 != 0.9 exactly)."""
        import duckdb

        d = docs(spark)
        got = {
            r["doc_id"]: r["s"]
            for r in d.select("doc_id", hash_split_col("doc_id", seed=7).alias("s")).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'"
        )
        oracle = dict(
            con.execute(
                f"SELECT doc_id, {sql_split_expr('doc_id', seed=7)} FROM documents"
            ).fetchall()
        )
        assert got == oracle
        # frac mirror too
        gf = {
            r["doc_id"]: r["h"]
            for r in d.select("doc_id", hash_frac_hex_col("doc_id", 5).alias("h")).collect()
        }
        of = dict(
            con.execute(
                f"SELECT doc_id, {sql_frac_expr('doc_id', 5)} FROM documents"
            ).fetchall()
        )
        assert gf == of


class TestStratified:
    def test_per_stratum_rates(self, spark):
        d = docs(spark)
        out = stratified_hash_sample(
            d, "doc_id", "lang", {"zh": 1.0, "en": 0.0}, default_rate=0.5, seed=2
        )
        counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
        totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
        assert counts["zh"] == totals["zh"]  # rate 1.0 keeps everything
        assert "en" not in counts  # rate 0.0 drops everything
        for lang in ("de", "es", "fr"):  # default rate ~0.5, binomial 4-sigma
            n, tot = counts[lang], totals[lang]
            assert abs(n - 0.5 * tot) < 4 * (tot * 0.25) ** 0.5 + 1

    def test_stratified_consistent_with_plain_sample(self, spark):
        """A stratum at rate r keeps exactly the rows plain hash_sample
        at rate r keeps (same seed): the draw depends only on the key."""
        d = docs(spark)
        strat = stratified_hash_sample(
            d, "doc_id", "lang", {"en": 0.3}, default_rate=0.0, seed=9
        )
        plain = hash_sample(d.filter(F.col("lang") == "en"), "doc_id", 0.3, seed=9)
        a = {r["doc_id"] for r in strat.select("doc_id").collect()}
        b = {r["doc_id"] for r in plain.select("doc_id").collect()}
        assert a == b


class TestGeometricMixResample:
    def test_exact_per_stratum_sizes(self, spark):
        """Kept count per stratum is EXACTLY ceil(sqrt(n_s * n_min)) —
        the defining property (a Bernoulli sampler only hits it in
        expectation); the smallest stratum is kept whole."""
        import math

        from pfutil_spark.operators.sampling import geometric_mix_resample

        d = docs(spark)
        totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
        n_min = min(totals.values())
        out = geometric_mix_resample(d, "doc_id", "lang")
        kept = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
        for lang, n_s in totals.items():
            assert kept[lang] == math.ceil(math.sqrt(float(n_s) * n_min)), lang
        smallest = min(totals, key=lambda k: (totals[k], k))
        assert kept[smallest] == totals[smallest]

    def test_partition_independent_and_selects_smallest_draws(self, spark):
        """Same rows at any partitioning, and the kept rows per stratum
        are exactly the k_s smallest (draw, key) pairs recomputed
        independently from the full table."""
        import math

        from pfutil_spark.operators.sampling import geometric_mix_resample

        d = docs(spark)
        a = {(r["doc_id"], r["lang"])
             for r in geometric_mix_resample(d, "doc_id", "lang").select("doc_id", "lang").collect()}
        b = {(r["doc_id"], r["lang"])
             for r in geometric_mix_resample(d.repartition(17), "doc_id", "lang").select("doc_id", "lang").collect()}
        assert a == b
        rows = d.select("doc_id", "lang", hash_frac_hex_col("doc_id").alias("fr")).collect()
        by_lang: dict[str, list] = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append((r["fr"], r["doc_id"]))
        n_min = min(len(v) for v in by_lang.values())
        expect = set()
        for lang, pairs in by_lang.items():
            k = math.ceil(math.sqrt(float(len(pairs)) * n_min))
            for _, did in sorted(pairs)[:k]:
                expect.add((did, lang))
        assert a == expect

    def test_null_stratum_and_null_key(self, spark):
        """A null stratum forms its own group (eqNullSafe join); null
        keys draw null and sort LAST, so they are kept only when the
        stratum has fewer non-null keys than its quota."""
        rows = [(i, "a") for i in range(16)] + [(100 + i, None) for i in range(4)]
        rows += [(None, "a")]  # null key in the big stratum: must lose
        df = spark.createDataFrame(rows, "k int, s string")
        from pfutil_spark.operators.sampling import geometric_mix_resample

        out = geometric_mix_resample(df, "k", "s").collect()
        kept_a = [r for r in out if r["s"] == "a"]
        kept_null = [r for r in out if r["s"] is None]
        assert len(kept_null) == 4  # smallest stratum kept whole (k=4)
        assert len(kept_a) == 9  # ceil(sqrt(17*4)) = ceil(8.246) = 9
        assert all(r["k"] is not None for r in kept_a)  # null key sorted last
        # the SQL mirror must keep null strata too (IS NOT DISTINCT FROM
        # quota join — a USING join silently dropped them; r4 review)
        import duckdb

        from pfutil_spark.operators.sampling import sql_geometric_mix_expr

        con = duckdb.connect()
        con.sql("CREATE TABLE t(k INT, s VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [(r["k"], r["s"]) for r in df.collect()],
        )
        mirror = sorted(
            ((r[0], r[1]) for r in con.sql(
                sql_geometric_mix_expr("t", "k", "s")
            ).fetchall()),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )
        mine = sorted(
            ((r["k"], r["s"]) for r in out),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )
        assert mirror == mine

    def test_sql_mirror_exact_rowset(self, spark):
        import duckdb

        from pfutil_spark.operators.sampling import (
            geometric_mix_resample,
            sql_geometric_mix_expr,
        )

        d = docs(spark)
        a = sorted(
            (r["doc_id"], r["lang"])
            for r in geometric_mix_resample(d, "doc_id", "lang", seed=3)
            .select("doc_id", "lang")
            .collect()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS"
            " SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
        )
        b = sorted(
            tuple(r)
            for r in con.sql(
                sql_geometric_mix_expr("documents", "doc_id", "lang", seed=3)
            ).fetchall()
        )
        assert a == b


class TestCapPerGroup:
    def test_cap_respected_and_partition_independent(self, spark):
        from pfutil_spark.operators.sampling import cap_per_group

        d = docs(spark)
        out = cap_per_group(d, "doc_id", "source", 15, seed=11)
        per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
        assert all(v == 15 for v in per.values())  # every source has >= 15 docs here
        a = {r["doc_id"] for r in out.select("doc_id").collect()}
        b = {
            r["doc_id"]
            for r in cap_per_group(d.repartition(17), "doc_id", "source", 15, seed=11)
            .select("doc_id")
            .collect()
        }
        assert a == b

    def test_selects_smallest_draws_and_cap_above_size_is_identity(self, spark):
        from pfutil_spark.operators.sampling import cap_per_group

        d = docs(spark)
        rows = d.select("doc_id", "source", hash_frac_hex_col("doc_id", 11).alias("fr")).collect()
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append((r["fr"], r["doc_id"]))
        expect = {
            did for pairs in by_src.values() for _, did in sorted(pairs)[:15]
        }
        got = {
            r["doc_id"]
            for r in cap_per_group(d, "doc_id", "source", 15, seed=11).select("doc_id").collect()
        }
        assert got == expect
        assert cap_per_group(d, "doc_id", "source", 10_000).count() == d.count()
        assert cap_per_group(d, "doc_id", "source", 0).count() == 0

    def test_validation_and_schema_preserved(self, spark):
        from pfutil_spark.operators.sampling import cap_per_group

        d = docs(spark)
        with pytest.raises(ValueError, match="cap"):
            cap_per_group(d, "doc_id", "source", -1)
        assert cap_per_group(d, "doc_id", "source", 3).columns == d.columns

    def test_sql_mirror_exact_rowset(self, spark):
        import duckdb

        from pfutil_spark.operators.sampling import cap_per_group, sql_cap_select

        d = docs(spark)
        a = sorted(
            (r["doc_id"], r["source"])
            for r in cap_per_group(d, "doc_id", "source", 7, seed=2)
            .select("doc_id", "source")
            .collect()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS"
            " SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
        )
        b = sorted(
            tuple(r)
            for r in con.sql(
                sql_cap_select("documents", "doc_id", "source", 7, seed=2)
            ).fetchall()
        )
        assert a == b


class TestMixtureResample:
    WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}

    def test_exact_per_source_targets_and_epoch_structure(self, spark):
        """Output size per source is EXACTLY floor(T*w/W); every source
        row appears either floor(t_s/n_s) or floor(t_s/n_s)+1 times with
        contiguous 0-based epochs, and exactly t_s mod n_s rows get the
        extra epoch."""
        from pfutil_spark.operators.sampling import mixture_resample

        d = docs(spark)
        n_s = {r["source"]: r["count"] for r in d.groupBy("source").count().collect()}
        T = 2 * sum(n_s.values())
        W = sum(self.WEIGHTS.values())
        out = mixture_resample(d, "doc_id", "source", self.WEIGHTS, total_factor=2, seed=3)
        rows = out.select("doc_id", "source", "epoch").collect()
        per_src: dict[str, list] = {}
        for r in rows:
            per_src.setdefault(r["source"], []).append((r["doc_id"], r["epoch"]))
        for src, w in self.WEIGHTS.items():
            t_s = T * w // W
            got = per_src.get(src, [])
            assert len(got) == t_s, src
            full, rem = divmod(t_s, n_s[src])
            eps: dict[int, list] = {}
            for did, ep in got:
                eps.setdefault(did, []).append(ep)
            n_extra = 0
            for did, lst in eps.items():
                assert sorted(lst) == list(range(len(lst))), did  # contiguous
                assert len(lst) in (full, full + 1)
                n_extra += len(lst) == full + 1
            assert n_extra == rem, src

    def test_partition_independent_and_total_arg(self, spark):
        from pfutil_spark.operators.sampling import mixture_resample

        d = docs(spark)
        a = sorted(
            map(tuple, mixture_resample(d, "doc_id", "source", self.WEIGHTS, total=333, seed=1)
                .select("doc_id", "source", "epoch").collect())
        )
        b = sorted(
            map(tuple, mixture_resample(
                d.repartition(13), "doc_id", "source", self.WEIGHTS, total=333, seed=1)
                .select("doc_id", "source", "epoch").collect())
        )
        assert a == b
        assert len(a) == sum(333 * w // sum(self.WEIGHTS.values()) for w in self.WEIGHTS.values())

    def test_unweighted_and_null_sources_dropped(self, spark):
        from pfutil_spark.operators.sampling import mixture_resample

        rows = [(1, "a"), (2, "a"), (3, "b"), (4, None)]
        df = spark.createDataFrame(rows, "k int, s string")
        out = mixture_resample(df, "k", "s", {"a": 1}, total=4, seed=0).collect()
        assert {r["s"] for r in out} == {"a"}
        assert len(out) == 4  # both 'a' rows x 2 epochs

    def test_validation(self, spark):
        from pfutil_spark.operators.sampling import mixture_resample

        d = docs(spark)
        with pytest.raises(ValueError, match="exactly one"):
            mixture_resample(d, "doc_id", "source", {"a": 1})
        with pytest.raises(ValueError, match="exactly one"):
            mixture_resample(d, "doc_id", "source", {"a": 1}, total=5, total_factor=1)
        with pytest.raises(ValueError, match="positive ints"):
            mixture_resample(d, "doc_id", "source", {"a": 0.5}, total=5)
        with pytest.raises(ValueError, match="positive ints"):
            mixture_resample(d, "doc_id", "source", {"a": 0}, total=5)
        with pytest.raises(ValueError, match="positive ints"):
            mixture_resample(d, "doc_id", "source", {"a": True}, total=5)
        with pytest.raises(ValueError, match="non-empty"):
            mixture_resample(d, "doc_id", "source", {}, total=5)
        # floats must raise, not silently truncate (total_factor=0.5
        # would otherwise become a 0 budget and an empty result)
        with pytest.raises(ValueError, match="int"):
            mixture_resample(d, "doc_id", "source", {"a": 1}, total_factor=0.5)
        with pytest.raises(ValueError, match="int"):
            mixture_resample(d, "doc_id", "source", {"a": 1}, total=777.9)
        # keys that collide after str() coercion would fan the quota
        # join out and silently duplicate every output row of the source
        with pytest.raises(ValueError, match="collide"):
            mixture_resample(d, "doc_id", "source", {1: 2, "1": 3}, total=5)

    def test_quoted_source_names_in_sql_mirror(self, spark):
        """A source containing a single quote must survive the VALUES
        interpolation in the SQL mirror (doubled quotes)."""
        import duckdb

        from pfutil_spark.operators.sampling import mixture_resample, sql_mixture_select

        rows = [(1, "o'reilly"), (2, "o'reilly"), (3, "plain")]
        df = spark.createDataFrame(rows, "k int, s string")
        w = {"o'reilly": 2, "plain": 1}
        a = sorted(map(tuple, mixture_resample(df, "k", "s", w, total=6, seed=0)
                       .select("k", "s", "epoch").collect()))
        con = duckdb.connect()
        con.sql("CREATE TABLE t(k INT, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        b = sorted(tuple(r) for r in con.sql(
            sql_mixture_select("t", "k", "s", w, total=6, seed=0)).fetchall())
        assert a == b and len(a) == 6

    def test_sql_mirror_exact_rowset_both_budget_forms(self, spark):
        import duckdb

        from pfutil_spark.operators.sampling import mixture_resample, sql_mixture_select

        d = docs(spark)
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS"
            " SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
        )
        for kwargs in ({"total_factor": 2}, {"total": 777}):
            a = sorted(
                map(tuple, mixture_resample(d, "doc_id", "source", self.WEIGHTS, seed=5, **kwargs)
                    .select("doc_id", "source", "epoch").collect())
            )
            b = sorted(
                tuple(r)
                for r in con.sql(
                    sql_mixture_select(
                        "documents", "doc_id", "source", self.WEIGHTS, seed=5,
                        key_alias="doc_id", source_alias="source", **kwargs)
                ).fetchall()
            )
            assert a == b, kwargs

    def test_pure_jvm_plan(self, spark):
        """No Python evaluation anywhere in the mixture plan."""
        from pfutil_spark.operators.sampling import mixture_resample

        d = docs(spark)
        plan = (
            mixture_resample(d, "doc_id", "source", self.WEIGHTS, total_factor=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan


class TestMixtureTokenPlan:
    def test_known_plan(self, spark):
        from pfutil_spark.operators.sampling import mixture_token_plan

        df = spark.createDataFrame(
            [
                ("a", "one two three"),        # 3 tokens
                ("a", "four five"),            # 2 tokens
                ("b", "x"),                    # 1 token
                ("c", "never weighted"),
            ],
            "source string, text string",
        )
        rows = {
            r["source"]: (
                r["n_docs"], r["n_tokens"], r["weight"],
                r["target_tokens"], r["epochs_full"], r["extra_tokens"],
            )
            for r in mixture_token_plan(
                df, "source", {"a": 3, "b": 1, "zz": 1}, total_tokens=100
            ).collect()
        }
        # W=5; a: t=60, 5 tokens -> 12 epochs + 0; b: t=20, 1 token ->
        # 20 epochs + 0; zz: absent -> zero inventory, NULL epochs
        assert rows == {
            "a": (2, 5, 3, 60, 12, 0),
            "b": (1, 1, 1, 20, 20, 0),
            "zz": (0, 0, 1, 20, None, None),
        }
        assert "c" not in rows

    def test_remainder_tokens(self, spark):
        from pfutil_spark.operators.sampling import mixture_token_plan

        df = spark.createDataFrame(
            [("a", "one two three")], "source string, text string"
        )
        r = mixture_token_plan(df, "source", {"a": 1}, total_tokens=10).collect()[0]
        assert (r["target_tokens"], r["epochs_full"], r["extra_tokens"]) == (
            10, 3, 1,
        )

    def test_validation(self, spark):
        from pfutil_spark.operators.sampling import mixture_token_plan

        df = spark.createDataFrame([("a", "x")], "source string, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            mixture_token_plan(df, "source", {}, total_tokens=10)
        with _pytest.raises(ValueError):
            mixture_token_plan(df, "source", {"a": 0}, total_tokens=10)
        with _pytest.raises(ValueError):
            mixture_token_plan(df, "source", {"a": 1.5}, total_tokens=10)
        with _pytest.raises(ValueError):
            mixture_token_plan(df, "source", {"a": 1}, total_tokens=-1)
        with _pytest.raises(ValueError):
            mixture_token_plan(df, "source", {1: 1, "1": 2}, total_tokens=10)
