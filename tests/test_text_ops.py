"""Text analysis, dedup, and similarity operators over the documents /
embeddings test tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.functions.text import (
    lang_id_col,
    quality_features,
    token_count_col,
    word_like_token_count_col,
)
from pfutil_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    fingerprint_col_df,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from pfutil_spark.operators.similarity import (
    all_pairs_above,
    ann_topk_lsh,
    cosine_topk,
)


def docs(spark, sf="sf0.001"):
    return spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")


def embs(spark, sf="sf0.001"):
    return spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")


class TestText:
    def test_token_count_matches_python(self, spark):
        rows = (
            docs(spark)
            .select("doc_id", "text", token_count_col("text").alias("n"))
            .collect()[:50]
        )
        for r in rows:
            assert r["n"] == len(r["text"].split()), r["doc_id"]

    def test_word_like_tokens_positive(self, spark):
        rows = docs(spark).select(word_like_token_count_col("text").alias("n")).collect()
        assert all(r["n"] > 0 for r in rows)

    def test_quality_features_ranges(self, spark):
        q = quality_features(docs(spark)).collect()
        for r in q:
            assert r["n_chars_q"] == len(r["text"])
            assert 0 <= r["punct_ratio"] <= 1
            assert 0 <= r["digit_ratio"] <= 1
            assert 0 <= r["upper_ratio"] <= 1
            assert r["stopword_ratio"] >= 0

    def test_lang_id_on_curated_sentences(self, spark):
        # the documents table's lang label is independent of its synthetic
        # text, so accuracy is gated on real sentences instead
        import pandas as pd

        samples = [
            ("en", "The quick brown fox jumps over the lazy dog and it is fine."),
            ("en", "This is a test of the language detector for the English text."),
            ("de", "Der Hund ist nicht allein und die Katze schläft auf dem Sofa."),
            ("de", "Das ist ein einfacher Satz und die Antwort ist nicht schwer."),
            ("es", "El perro y el gato están en la casa que es de los abuelos."),
            ("es", "La vida es bella y el tiempo pasa rápido por las calles."),
            ("fr", "Le chien et le chat sont dans la maison pour la nuit."),
            ("fr", "C'est une belle journée et les enfants jouent dans le parc."),
            ("zh", "今天天气很好，我们一起去公园散步吧。"),
            ("zh", "这是一个测试句子，用来检测中文。"),
        ]
        df = spark.createDataFrame(pd.DataFrame(samples, columns=["lang", "text"]))
        rows = df.select("lang", lang_id_col("text").alias("pred")).collect()
        acc = sum(r["lang"] == r["pred"] for r in rows) / len(rows)
        assert acc >= 0.9, [(r["lang"], r["pred"]) for r in rows]
        # and on the documents table it runs and emits only known labels
        labels = {
            r["pred"]
            for r in docs(spark).select(lang_id_col("text").alias("pred")).collect()
        }
        assert labels <= {"en", "de", "es", "fr", "zh", "unknown"}


class TestDedup:
    def test_exact_dedup_groups_and_semijoin(self, spark):
        d = docs(spark)
        groups = exact_dedup_groups(d, "text", "doc_id")
        n_distinct = d.select("text").distinct().count()
        assert groups.count() == n_distinct
        deduped = exact_dedup(d, "text", "doc_id")
        assert deduped.count() == n_distinct
        assert deduped.select("text").distinct().count() == n_distinct

    def test_minhash_identical_docs_match(self, spark):
        import pandas as pd

        base = docs(spark).limit(5).toPandas()
        # duplicate each doc with a new id; append a lightly-edited copy
        dup = base.copy()
        dup["doc_id"] = dup["doc_id"] + 100_000
        df = spark.createDataFrame(pd.concat([base, dup]))
        sigs = {r["doc_id"]: r["sig"] for r in
                minhash_signatures(df, "text", "doc_id", 64, 5).collect()}
        for did in base["doc_id"]:
            assert sigs[did] == sigs[did + 100_000]

    def test_minhash_lsh_finds_near_dups(self, spark):
        import pandas as pd

        base = docs(spark).limit(20).toPandas()
        edited = base.copy()
        edited["doc_id"] = edited["doc_id"] + 100_000
        edited["text"] = edited["text"] + " tiny appended suffix"
        df = spark.createDataFrame(pd.concat([base, edited]))
        pairs = minhash_lsh_pairs(df, "text", "doc_id", 64, 16, 5, min_jaccard=0.5)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        expected = {(did, did + 100_000) for did in base["doc_id"]}
        found = len(expected & got) / len(expected)
        assert found >= 0.9, f"LSH recall {found}"
        # estimated jaccard roughly matches exact for found pairs
        exact = ngram_jaccard_pairs(df, pairs, "text", "doc_id", 5).collect()
        for r in exact:
            assert r["jaccard"] >= 0.4

    def test_simhash_identical_and_near(self, spark):
        import pandas as pd

        base = docs(spark).limit(10).toPandas()
        dup = base.copy()
        dup["doc_id"] = dup["doc_id"] + 100_000
        df = spark.createDataFrame(pd.concat([base, dup]))
        sigs = {r["doc_id"]: r["simhash"] for r in
                simhash_signatures(df, "text", "doc_id").collect()}
        for did in base["doc_id"]:
            assert sigs[did] == sigs[did + 100_000]
        pairs = simhash_near_dup_pairs(df, "text", "doc_id", max_hamming=3)
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
        for did in base["doc_id"]:
            assert got.get((did, did + 100_000)) == 0

    def test_fingerprint_deterministic_and_content_keyed(self, spark):
        d = docs(spark)
        fp1 = {r["doc_id"]: r["fingerprint"] for r in
               fingerprint_col_df(d, "text", "doc_id").collect()}
        fp2 = {r["doc_id"]: r["fingerprint"] for r in
               fingerprint_col_df(d.repartition(7), "text", "doc_id").collect()}
        assert fp1 == fp2
        # same text => same fingerprint
        pdf = d.select("doc_id", "text").toPandas()
        by_text = pdf.groupby("text")["doc_id"].apply(list)
        for ids in by_text:
            vals = {fp1[i] for i in ids}
            assert len(vals) == 1


class TestConnectedComponents:
    def test_chains_components_singletons(self, spark):
        """Min-label propagation: a 5-node chain (diameter > 1 round),
        a separate triangle, a 2-cycle, and singletons absent from the
        pair graph (cluster_id = own id via assign_dedup_clusters)."""
        from pfutil_spark.operators.dedup import (
            assign_dedup_clusters,
            connected_components,
        )

        pairs = spark.createDataFrame(
            [
                ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),  # chain b-f
                ("p", "q"), ("q", "r"), ("p", "r"),              # triangle
                ("x", "y"),
            ],
            "id_a string, id_b string",
        )
        comp = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert {k: v for k, v in comp.items() if k in "bcdef"} == {
            c: "b" for c in "bcdef"
        }
        assert {comp["p"], comp["q"], comp["r"]} == {"p"}
        assert comp["x"] == comp["y"] == "x"

        docs_df = spark.createDataFrame(
            [(i,) for i in ["a", "b", "c", "d", "e", "f", "p", "q", "r", "x", "y", "z"]],
            "doc_id string",
        )
        out = {
            r["doc_id"]: r["cluster_id"]
            for r in assign_dedup_clusters(docs_df, pairs, "doc_id").collect()
        }
        assert out["a"] == "a" and out["z"] == "z"  # singletons: own id
        assert out["f"] == "b" and out["r"] == "p"

    def test_shuffled_id_chain_converges(self, spark):
        """A 60-node path whose ids are RANDOMLY laid out along the
        chain — the case where naive min-label propagation degrades to
        O(diameter) (r4 review simulation); large-star/small-star must
        converge within the default cap and match union-find ground
        truth exactly."""
        import random

        from pfutil_spark.operators.dedup import connected_components

        rng = random.Random(7)
        ids = [f"d{i:03d}" for i in range(60)]
        perm = ids[:]
        rng.shuffle(perm)
        rows = [(perm[i], perm[i + 1]) for i in range(59)]
        pairs = spark.createDataFrame(rows, "id_a string, id_b string")
        got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
        assert len(got) == 60
        assert set(got.values()) == {"d000"}  # one component, min id root

    def test_nonconvergence_raises_not_silently_wrong(self, spark):
        """Exhausting the round cap must RAISE — an unconverged result
        would assign wrong cluster ids and leak near-dups across
        splits (r4 review finding)."""
        import pytest

        from pfutil_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iterations=0)


class TestSimilarity:
    def test_bruteforce_topk_matches_numpy(self, spark):
        e = embs(spark)
        pdf = e.toPandas()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        q = mat[0].tolist()
        got = cosine_topk(e, "embedding", "vec_id", q, k=5).collect()
        sims = (mat @ np.asarray(q)) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
        )
        order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))[:5]
        expected = pdf["vec_id"].to_numpy()[order].tolist()
        assert [r["vec_id"] for r in got] == expected
        assert got[0]["vec_id"] == pdf["vec_id"][0]
        assert abs(got[0]["cosine"] - 1.0) < 1e-9

    def test_ann_lsh_recall(self, spark):
        e = embs(spark)
        pdf = e.toPandas()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        hits = 0
        trials = 5
        for t in range(trials):
            q = mat[t * 7].tolist()
            exact = {r["vec_id"] for r in cosine_topk(e, "embedding", "vec_id", q, 5).collect()}
            approx = {r["vec_id"] for r in
                      ann_topk_lsh(e, "embedding", "vec_id", q, 5, n_planes=8).collect()}
            hits += len(exact & approx) / 5
        assert hits / trials >= 0.5, f"ANN recall {hits / trials}"

    def test_all_pairs_above_finds_duplicated_vectors(self, spark):
        import pandas as pd

        pdf = embs(spark).limit(30).toPandas()
        dup = pdf.copy()
        dup["vec_id"] = dup["vec_id"] + 100_000
        df = spark.createDataFrame(pd.concat([pdf, dup]))
        pairs = all_pairs_above(df, "embedding", "vec_id", min_cosine=0.999, n_planes=8)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        expected = {(v, v + 100_000) for v in pdf["vec_id"]}
        assert expected <= got


class TestIVF:
    def test_ivf_recall_and_determinism(self, spark):
        from pfutil_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk

        e = embs(spark)
        indexed, centroids = ivf_build(e, "embedding", n_lists=8, seed=42)
        indexed = indexed.persist()
        # deterministic assignment across partitionings
        a1 = {r["vec_id"]: r["__ivf_list"] for r in indexed.collect()}
        indexed2, cent2 = ivf_build(e.repartition(7), "embedding", n_lists=8, seed=42)
        import numpy as np

        assert np.allclose(centroids, cent2)
        a2 = {r["vec_id"]: r["__ivf_list"] for r in indexed2.collect()}
        assert a1 == a2
        # recall over several queries with generous probes
        pdf = e.toPandas()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        recall = 0.0
        trials = 5
        for t in range(trials):
            q = mat[13 * t].tolist()
            exact = {r["vec_id"] for r in cosine_topk(e, "embedding", "vec_id", q, 5).collect()}
            approx = {
                r["vec_id"]
                for r in ivf_topk(indexed, centroids, "embedding", "vec_id", q, 5, nprobe=4).collect()
            }
            recall += len(exact & approx) / 5
        assert recall / trials >= 0.5, recall / trials
        # the query vector itself is always found (it lives in its own probe-0 list)
        q = mat[0].tolist()
        top = ivf_topk(indexed, centroids, "embedding", "vec_id", q, 1, nprobe=1).collect()
        assert top[0]["vec_id"] == int(pdf["vec_id"][0])

    def test_ivf_persisted_index_prunes_partitions(self, spark, tmp_path):
        """VERDICT r1 item 7: a persisted IVF index stored partitioned by
        list id must turn the probe filter into source-level partition
        pruning (PartitionFilters on __ivf_list in the parquet scan),
        and the loaded index must return the same results."""
        import numpy as np

        from pfutil_spark.operators.similarity import (
            cosine_topk, ivf_build, ivf_read, ivf_topk, ivf_write,
        )

        e = embs(spark)
        indexed, centroids = ivf_build(e, "embedding", n_lists=8, seed=42)
        path = str(tmp_path / "ivf_index")
        ivf_write(indexed, centroids, path)
        loaded, cent2 = ivf_read(spark, path)
        assert np.allclose(centroids, cent2)

        pdf = e.toPandas()
        q = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)[7].tolist()
        df = ivf_topk(loaded, cent2, "embedding", "vec_id", q, 5, nprobe=2)
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "__ivf_list" in m.group(1), plan
        # loaded index == in-memory index results
        mem = {r["vec_id"] for r in ivf_topk(indexed, centroids, "embedding", "vec_id", q, 5, nprobe=2).collect()}
        disk = {r["vec_id"] for r in df.collect()}
        assert mem == disk


class TestOPH:
    def test_oph_identical_docs_and_lsh_recall(self, spark):
        import pandas as pd

        base = docs(spark).limit(20).toPandas()
        dup = base.copy()
        dup["doc_id"] = dup["doc_id"] + 100_000
        df = spark.createDataFrame(pd.concat([base, dup]))
        sigs = {r["doc_id"]: r["sig"] for r in
                minhash_signatures(df, "text", "doc_id", 64, 5, method="oph").collect()}
        for did in base["doc_id"]:
            assert sigs[did] == sigs[did + 100_000]
        # edited near-dups found through banding with OPH signatures
        edited = base.copy()
        edited["doc_id"] = edited["doc_id"] + 200_000
        edited["text"] = edited["text"] + " small tail edit"
        df2 = spark.createDataFrame(pd.concat([base, edited]))
        pairs = minhash_lsh_pairs(
            df2, "text", "doc_id", 64, 16, 5, min_jaccard=0.5, method="oph"
        )
        got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
        expected = {(did, did + 200_000) for did in base["doc_id"]}
        found = len(expected & set(got)) / len(expected)
        assert found >= 0.9, f"OPH LSH recall {found}"
        # estimated jaccard is in a sane band for near-identical docs
        for p in expected & set(got):
            assert got[p] >= 0.5

    def test_oph_estimates_track_exact_jaccard(self, spark):
        import pandas as pd

        base = docs(spark).limit(10).toPandas()
        edited = base.copy()
        edited["doc_id"] = edited["doc_id"] + 300_000
        edited["text"] = edited["text"].str.slice(0, 200) + " different ending text here"
        df = spark.createDataFrame(pd.concat([base, edited]))
        pairs_df = spark.createDataFrame(
            pd.DataFrame({"id_a": base["doc_id"], "id_b": base["doc_id"] + 300_000})
        )
        exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                 ngram_jaccard_pairs(df, pairs_df, "text", "doc_id", 5).collect()}
        sigs = {r["doc_id"]: np.array(r["sig"]) for r in
                minhash_signatures(df, "text", "doc_id", 64, 5, method="oph").collect()}
        for (a, b), jx in exact.items():
            est = (sigs[a] == sigs[b]).mean()
            assert abs(est - jx) <= 0.25, (a, b, est, jx)  # 64-slot variance


class TestOrganicNearDups:
    def test_lsh_finds_real_near_dups_with_accurate_estimates(self, spark):
        """sf0.01 documents contain organic near-duplicates (shared
        shingle space); the full LSH->verify pipeline must find them and
        estimate their Jaccard accurately."""
        d = docs(spark, "sf0.01")
        pairs = minhash_lsh_pairs(d, "text", "doc_id", 64, 16, 5, min_jaccard=0.9)
        exact = ngram_jaccard_pairs(d, pairs, "text", "doc_id", 5).join(
            pairs, ["id_a", "id_b"]
        ).collect()
        assert len(exact) >= 10  # organic near-dups exist in this corpus
        for r in exact:
            assert r["jaccard"] >= 0.7, (r["id_a"], r["id_b"], r["jaccard"])
            assert abs(r["est_jaccard"] - r["jaccard"]) <= 0.25


class TestSimhashChunkBounds:
    def test_all_allowed_max_hamming_values_build_and_find_identicals(self, spark):
        """Every permitted max_hamming (0..15) must produce a valid plan
        with non-degenerate chunks and find identical-text pairs (hamming
        0 is always within any bound)."""
        import pandas as pd

        from pfutil_spark.operators.dedup import simhash_near_dup_pairs

        rows = [(i, f"some shared document body number {i % 5} with text") for i in range(10)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        expected = {(a, a + 5) for a in range(5)}
        for h in (0, 3, 5, 8, 11, 13, 14, 15):
            got = {
                (r["id_a"], r["id_b"])
                for r in simhash_near_dup_pairs(df, "text", "doc_id", max_hamming=h).collect()
            }
            assert expected <= got, (h, got)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_hamming"):
            simhash_near_dup_pairs(df, "text", "doc_id", max_hamming=16)


class TestCacheScope:
    """VERDICT r2 item 5: persisted signature frames must be releasable —
    no executor-storage residue after candidate generation in a reused
    session (explicit CacheScope) and via release_cached on the default
    path (operator-internal scope attached to the result)."""

    @staticmethod
    def _n_cached_rdds(spark):
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    def test_explicit_scope_releases_storage(self, spark):
        from pfutil_spark.operators import CacheScope

        d = docs(spark).limit(50)
        before = self._n_cached_rdds(spark)
        with CacheScope() as cs:
            pairs = minhash_lsh_pairs(d, "text", "doc_id", cache=cs)
            pairs.count()  # action while signatures are cached
            assert self._n_cached_rdds(spark) > before, "signatures not cached"
            cs.release(blocking=True)
            assert self._n_cached_rdds(spark) == before
        # double release (context exit after explicit release) is a no-op

    def test_release_cached_on_default_path(self, spark):
        from pfutil_spark.operators import release_cached

        d = docs(spark).limit(50)
        e = embs(spark).limit(50)
        before = self._n_cached_rdds(spark)
        p1 = simhash_near_dup_pairs(d, "text", "doc_id")
        p1.count()
        p2 = all_pairs_above(e, "embedding", "vec_id", min_cosine=0.9, dim=64)
        p2.count()
        assert self._n_cached_rdds(spark) > before
        release_cached(p1, blocking=True)
        release_cached(p2, blocking=True)
        assert self._n_cached_rdds(spark) == before
        # plans still run (recompute, just uncached)
        p1.count(), p2.count()
        release_cached(p1, blocking=True), release_cached(p2, blocking=True)


class TestWordRepetition:
    def test_curated_docs_match_hand_computation(self, spark):
        from pfutil_spark.functions.text import word_repetition_stats

        rows = [
            (1, "a a b"),          # dup 1-2/3, top a @ 2/3
            (2, "b a b a"),        # tie a==b -> lexicographically min 'a'
            (3, "x"),              # single word
            (4, ""),               # empty text = one empty-string word
            (5, "c c c c"),        # all same
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = {r["doc_id"]: r for r in word_repetition_stats(df).collect()}
        r1 = out[1]
        assert (r1["n_words"], r1["n_distinct_words"]) == (3, 2)
        assert r1["dup_word_frac"] == 1.0 - 2 / 3
        assert (r1["top_word"], r1["top_word_frac"]) == ("a", 2 / 3)
        r2 = out[2]
        assert (r2["top_word"], r2["top_word_frac"]) == ("a", 0.5)
        r3 = out[3]
        assert (r3["n_words"], r3["dup_word_frac"], r3["top_word_frac"]) == (1, 0.0, 1.0)
        r4 = out[4]
        assert (r4["n_words"], r4["top_word"]) == (1, "")
        r5 = out[5]
        assert (r5["n_distinct_words"], r5["dup_word_frac"], r5["top_word_frac"]) == (
            1, 0.75, 1.0,
        )

    def test_matches_python_on_real_docs(self, spark):
        """Differential vs a pure-Python computation on sf0.001 —
        EXACT float equality: the fractions are unrounded single IEEE
        divisions, identical in numpy/Python/Spark/DuckDB. (The
        round(x,4) this replaced diverged between engines at boundary
        ratios like 1 - 83/160; see word_repetition_stats docstring.)"""
        from collections import Counter

        from pfutil_spark.functions.text import word_repetition_stats

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = {r["doc_id"]: r for r in word_repetition_stats(d).collect()}
        for row in d.select("doc_id", "text").collect():
            words = row["text"].split(" ")
            c = Counter(words)
            top_cnt = max(c.values())
            top_word = min(w for w, n in c.items() if n == top_cnt)
            g = got[row["doc_id"]]
            assert g["n_words"] == len(words)
            assert g["n_distinct_words"] == len(c)
            assert g["dup_word_frac"] == 1.0 - len(c) / len(words)
            assert g["top_word"] == top_word
            assert g["top_word_frac"] == top_cnt / len(words)


class TestKeepBestPerCluster:
    def test_keeps_argmax_with_ties_to_smallest_id(self, spark):
        from pyspark.sql import functions as F2

        from pfutil_spark.operators.dedup import keep_best_per_cluster

        rows = [
            # (doc_id, cluster_id, quality)
            (1, 1, 5.0), (2, 1, 9.0), (3, 1, 9.0),   # tie at 9 -> keep id 2
            (4, 4, 1.0),                               # singleton
            (5, 5, None), (6, 5, 2.0),                 # null quality loses
        ]
        df = spark.createDataFrame(rows, "doc_id int, cluster_id int, q double")
        kept = {
            r["cluster_id"]: r["doc_id"]
            for r in keep_best_per_cluster(
                df, "cluster_id",
                preference=[F2.col("q").desc_nulls_last(), F2.col("doc_id")],
            ).collect()
        }
        assert kept == {1: 2, 4: 4, 5: 6}

    def test_requires_explicit_preference(self, spark):
        import pytest

        from pfutil_spark.operators.dedup import keep_best_per_cluster

        df = spark.range(3).select(F.col("id").alias("cluster_id"))
        with pytest.raises(ValueError, match="preference"):
            keep_best_per_cluster(df, "cluster_id")


class TestTermProfile:
    def test_matches_brute_force_with_ties_and_edges(self, spark):
        from collections import Counter

        from pfutil_spark.functions.text import term_profile

        rows = [
            (1, "en", "a b b c c"),
            (2, "en", "c d"),
            (8, "fr", "x y x y"),             # tie x/y at 2 -> x ranks first
            (3, "de", "a a a"),
            (4, "de", ""),                    # blank: contributes nothing
            (5, "de", "   "),                 # whitespace-only: nothing
            (6, None, "a z"),                 # NULL group is still a group
            (7, "en", None),                  # NULL text: nothing
        ]
        got = term_profile(
            spark.createDataFrame(rows, "doc_id long, lang string, text string"),
            k=2,
        ).collect()

        # brute force
        tf: Counter = Counter()
        docs_with: dict = {}
        for i, lang, t in rows:
            for w in (t or "").split():
                tf[(lang, w)] += 1
                docs_with.setdefault(w, set()).add(i)
        by_lang: dict = {}
        for (lang, w), c in tf.items():
            by_lang.setdefault(lang, []).append((-c, w))
        want = set()
        for lang, terms in by_lang.items():
            for r, (nc, w) in enumerate(sorted(terms)[:2], start=1):
                want.add((lang, r, w, -nc, len(docs_with[w])))
        assert {
            (r["lang"], r["term_rank"], r["term"], r["term_count"], r["doc_freq"])
            for r in got
        } == want
        # en by count: c=3 then b=2; the fr tie: x before y at equal count
        en = {r["term_rank"]: r["term"] for r in got if r["lang"] == "en"}
        assert en == {1: "c", 2: "b"}
        fr = {r["term_rank"]: r["term"] for r in got if r["lang"] == "fr"}
        assert fr == {1: "x", 2: "y"}

    def test_zero_python_plan_and_validation(self, spark):
        from pfutil_spark.functions.text import term_profile

        df = spark.createDataFrame(
            [(1, "en", "a b")], "doc_id long, lang string, text string"
        )
        plan = term_profile(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        for node in ("EvalPython", "MapInPandas", "MapInArrow",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, plan
        # ONE corpus scan: doc_freq comes from a window over the shared
        # (by, id, term) aggregate, never a second scan or a join
        import re

        assert len(set(re.findall(r"\(\d+\) Scan \w+", plan))) == 1, plan
        assert "Join" not in plan, plan
        with pytest.raises(ValueError, match="k=0"):
            term_profile(df, k=0)


class TestDistinctiveTerms:
    def test_matches_brute_force_with_ties_and_edges(self, spark):
        from collections import Counter

        from pfutil_spark.functions.text import distinctive_terms

        rows = [
            (1, "the the rare common"),   # 'the' tf=2 but df=3; 'rare' df=1
            (2, "the common common"),
            (3, "the zebra"),
            (4, ""),                       # blank: no rows
            (5, "   "),                    # whitespace-only: no rows
            (6, None),                     # NULL text: no rows
            (7, "tie1 tie2"),              # equal scores -> term asc order
        ]
        got = distinctive_terms(
            spark.createDataFrame(rows, "doc_id long, text string"), k=2
        ).collect()

        tf: Counter = Counter()
        docs_with: dict = {}
        for i, t in rows:
            for w in (t or "").split():
                tf[(i, w)] += 1
                docs_with.setdefault(w, set()).add(i)
        want = set()
        per_doc: dict = {}
        for (i, w), c in tf.items():
            dfq = len(docs_with[w])
            per_doc.setdefault(i, []).append((-(c / dfq), w, c, dfq))
        for i, terms in per_doc.items():
            for r, (ns, w, c, dfq) in enumerate(sorted(terms)[:2], start=1):
                want.add((i, r, w, c, dfq, -ns))
        assert {
            (r["doc_id"], r["term_rank"], r["term"], r["tf"], r["doc_freq"],
             r["score"])
            for r in got
        } == want
        # doc 1: rare (1/1=1.0) beats the (2/3≈0.67) beats common (1/2)
        d1 = {r["term_rank"]: r["term"] for r in got if r["doc_id"] == 1}
        assert d1 == {1: "rare", 2: "the"}
        # tie doc: equal score 1.0/1.0 -> lexicographic
        d7 = {r["term_rank"]: r["term"] for r in got if r["doc_id"] == 7}
        assert d7 == {1: "tie1", 2: "tie2"}
        assert not any(r["doc_id"] in (4, 5, 6) for r in got)

    def test_zero_python_one_scan_plan(self, spark):
        from pfutil_spark.functions.text import distinctive_terms

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = distinctive_terms(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        for node in ("EvalPython", "MapInPandas", "MapInArrow",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, plan
        import re

        assert len(set(re.findall(r"\(\d+\) Scan \w+", plan))) == 1, plan
        assert "Join" not in plan, plan
        with pytest.raises(ValueError, match="k=0"):
            distinctive_terms(df, k=0)


class TestIncrementalDedup:
    def test_cross_pairs_only_and_recall(self, spark):
        from pfutil_spark.operators.dedup import lsh_pairs_between

        base = docs(spark).limit(20).toPandas()
        edited = base.copy()
        edited["doc_id"] = edited["doc_id"] + 100_000
        edited["text"] = edited["text"] + " tiny appended suffix"
        base_df = spark.createDataFrame(base)
        new_df = spark.createDataFrame(edited)
        sb = minhash_signatures(base_df, "text", "doc_id", 64, 5)
        sn = minhash_signatures(new_df, "text", "doc_id", 64, 5)
        got = {
            (r["id_new"], r["id_base"]): r["est_jaccard"]
            for r in lsh_pairs_between(sn, sb, min_jaccard=0.5).collect()
        }
        # every id_new is from the new side, every id_base from the base
        assert all(a >= 100_000 and b < 100_000 for a, b in got)
        expected = {(did + 100_000, did) for did in base["doc_id"]}
        recall = len(expected & set(got)) / len(expected)
        assert recall >= 0.9, f"cross-corpus LSH recall {recall}"

    def test_interop_with_stored_signatures(self, spark, tmp_path):
        # the base side read back from a parquet signature STORE pairs
        # byte-for-byte like freshly computed signatures
        from pfutil_spark.operators.dedup import lsh_pairs_between

        d = docs(spark).limit(30)
        store = str(tmp_path / "sigstore")
        minhash_signatures(d, "text", "doc_id", 64, 5).write.parquet(store)
        sb = spark.read.parquet(store)
        sn = minhash_signatures(
            d.select((F.col("doc_id") + 500_000).alias("doc_id"), "text"),
            "text", "doc_id", 64, 5,
        )
        got = {
            (r["id_new"], r["id_base"])
            for r in lsh_pairs_between(sn, sb, min_jaccard=0.99).collect()
        }
        # identical docs under shifted ids: every doc pairs with itself
        want = {(r["doc_id"] + 500_000, r["doc_id"]) for r in d.select("doc_id").collect()}
        assert got >= want

    def test_mismatched_store_params_fail_loudly(self, spark):
        # a store written with num_hashes=128 read at the default 64
        # must raise, not silently mis-band / inflate est_jaccard
        from pfutil_spark.operators.dedup import lsh_pairs_between

        d = docs(spark).limit(5)
        sb = minhash_signatures(d, "text", "doc_id", 128, 5)
        sn = minhash_signatures(d, "text", "doc_id", 64, 5)
        with pytest.raises(Exception, match="num_hashes=64"):
            lsh_pairs_between(sn, sb, num_hashes=64).collect()


class TestContainmentPairs:
    """r5: asymmetric containment near-dups — exact equality with the
    all-ordered-pairs brute force (candidate gate recall + exact
    verify), including the quoted-inside-a-larger-doc pairs symmetric
    Jaccard misses."""

    @staticmethod
    def _shingles(t, k=5):
        return {t[j : j + k] for j in range(len(t) - k + 1)}

    def test_matches_brute_force_and_finds_asymmetric(self, spark):
        import string

        import numpy as np

        from pfutil_spark.operators.dedup import containment_pairs

        rng = np.random.default_rng(5)
        alpha = list(string.ascii_lowercase + " ")

        def rand_text(n):
            return "".join(rng.choice(alpha, n))

        rows = [(i, rand_text(200)) for i in range(120)]
        # doc 1000+i = doc i embedded in a 2x wrapper: J ~ 0.4 (below a
        # 0.8 Jaccard reporter) but containment(A in B) ~ 1.0
        rows += [(1000 + i, rand_text(150) + rows[i][1] + rand_text(150)) for i in range(15)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(
                df, "text", "doc_id", k=5, sample=64, min_containment=0.8
            ).collect()
        }
        texts = dict(rows)
        exp = {}
        for a, ta in texts.items():
            for b, tb in texts.items():
                if a == b:
                    continue
                sa = self._shingles(ta)
                c = len(sa & self._shingles(tb)) / len(sa)
                if c >= 0.8:
                    exp[(a, b)] = c
        assert got == exp  # pair set AND exact values
        found_asym = [(i, 1000 + i) for i in range(15) if (i, 1000 + i) in got]
        assert len(found_asym) >= 14  # the pairs Jaccard-LSH can't see
        # ... and they really are Jaccard-invisible at the same bar
        for a, b in found_asym:
            sa, sb = self._shingles(texts[a]), self._shingles(texts[b])
            assert len(sa & sb) / len(sa | sb) < 0.8

    def test_hot_shingle_cap_drops_boilerplate_only_pairs(self, spark):
        from pfutil_spark.operators.dedup import containment_pairs

        boiler = "the same header on every page "  # >5 chars, shared by all
        rows = [(i, boiler + f"unique body {i} " * 10) for i in range(30)]
        rows.append((99, boiler))  # the pure-boilerplate doc: contained in ALL
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = containment_pairs(df, "text", "doc_id", min_containment=0.9)
        assert full.filter(F.col("id_a") == 99).count() == 30
        capped = containment_pairs(
            df, "text", "doc_id", min_containment=0.9, max_shingle_df=10
        )
        # shingles shared by all 31 docs leave the JOIN; the
        # boilerplate-only containments are the documented haircut
        assert capped.filter(F.col("id_a") == 99).count() == 0


class TestClusterSizeStats:
    def test_matches_brute_force_and_mass_conserved(self, spark):
        """Histogram equals a hand count over an assigned-clusters frame;
        n_docs sums to the corpus and frac_docs to 1.0 exactly (the
        fractions share one denominator)."""
        from collections import Counter

        from pfutil_spark.operators.dedup import cluster_size_stats

        rows = [(i, i % 7 if i < 70 else i) for i in range(100)]
        clusters = spark.createDataFrame(rows, "doc_id int, cluster_id int")
        got = {
            r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["frac_docs"])
            for r in cluster_size_stats(clusters).collect()
        }
        sizes = Counter(Counter(c for _, c in rows).values())
        assert {k: v[0] for k, v in got.items()} == dict(sizes)
        assert sum(v[1] for v in got.values()) == 100
        assert sum(v[0] * k for k, v in got.items()) == 100
        assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-12
        for k, v in got.items():
            assert v[2] == v[1] / 100  # the exact IEEE division

    def test_partition_independent_and_pure_jvm(self, spark):
        from pfutil_spark.operators.dedup import cluster_size_stats

        rows = [(i, i % 13) for i in range(200)]
        clusters = spark.createDataFrame(rows, "doc_id int, cluster_id int")
        a = sorted(map(tuple, cluster_size_stats(clusters).collect()))
        b = sorted(map(tuple, cluster_size_stats(clusters.repartition(17)).collect()))
        assert a == b
        plan = (
            cluster_size_stats(clusters)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan
        # ONE plan, ONE pass over the input: the frac denominator is a
        # window over the tiny histogram, not a broadcast-total branch
        # that would re-evaluate the input lineage a second time
        n_scans = sum(
            ln.lstrip().startswith(("Scan ", "LocalTableScan", "FileScan"))
            or "Scan ExistingRDD" in ln
            for ln in plan.splitlines()
        )
        assert n_scans == 1, plan


class TestBuildVocab:
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the dog and the cat"),
                (3, ""),
                (4, None),
                (5, "   "),
                (6, "zz yy xx the"),
            ],
            "doc_id long, text string",
        )

    def test_counts_min_count_and_cutoff_ties(self, spark):
        """Counts match a hand tally; min_count filters; the top_v
        cutoff breaks count ties by term ASC (deterministic SET, the
        property oov_stats' exact oracle rests on)."""
        from pfutil_spark.functions.text import build_vocab

        d = self.docs(spark)
        got = {r["term"]: r["term_count"] for r in build_vocab(d).collect()}
        assert got == {
            "the": 5, "cat": 2, "sat": 1, "on": 1, "mat": 1, "dog": 1,
            "and": 1, "zz": 1, "yy": 1, "xx": 1,
        }
        assert {
            r["term"] for r in build_vocab(d, min_count=2).collect()
        } == {"the", "cat"}
        # top_v=3 cuts inside the count=1 tie band: 'and' < 'dog' < ...
        assert {
            r["term"] for r in build_vocab(d, top_v=3).collect()
        } == {"the", "cat", "and"}

    def test_partition_independent_and_validation(self, spark):
        from pfutil_spark.functions.text import build_vocab

        d = self.docs(spark)
        a = sorted(map(tuple, build_vocab(d, top_v=4).collect()))
        b = sorted(map(tuple, build_vocab(d.repartition(7), top_v=4).collect()))
        assert a == b
        with pytest.raises(ValueError, match="top_v"):
            build_vocab(d, top_v=0)
        with pytest.raises(ValueError, match="min_count"):
            build_vocab(d, min_count=0)


class TestOovStats:
    def test_hand_counts_and_zero_token_docs(self, spark):
        """n_tokens counts every occurrence; n_oov counts occurrences
        outside the vocab; blank/NULL docs survive with n_tokens=0 and
        a NULL fraction (never counted as OOV)."""
        from pfutil_spark.functions.text import oov_stats

        d = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the dog"),
                (3, ""),
                (4, None),
                (5, "zz yy xx"),
            ],
            "doc_id long, text string",
        )
        # duplicate vocab rows must not fan the join out (distinct inside)
        v = spark.createDataFrame(
            [("the",), ("cat",), ("dog",), ("the",)], "term string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
            for r in oov_stats(d, v).collect()
        }
        assert got == {
            1: (6, 3, 0.5),
            2: (2, 0, 0.0),
            3: (0, 0, None),
            4: (0, 0, None),
            5: (3, 3, 1.0),
        }

    def test_shuffle_join_parity_and_plan(self, spark):
        from pfutil_spark.functions.text import build_vocab, oov_stats

        d = spark.createDataFrame(
            [(i, f"w{i % 7} w{i % 3} filler{i % 11}") for i in range(200)],
            "doc_id long, text string",
        )
        v = build_vocab(d, top_v=8)
        bc = sorted(map(tuple, oov_stats(d, v).collect()))
        sj = sorted(map(tuple, oov_stats(d, v, broadcast=False).collect()))
        assert bc == sj and len(bc) == 200
        plan = (
            oov_stats(d, v)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan
        assert "BroadcastHashJoin" in plan, plan


class TestScriptCounts:
    def test_curated_scripts(self, spark):
        from pfutil_spark.functions.text import script_counts

        d = spark.createDataFrame(
            [
                (1, "abc 123"),
                (2, "汉字かなハングル한"),
                (3, "Привет мир"),
                (4, "مرحبا"),
                (5, ""),
                (6, None),
                (7, "a.b,c!?"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (
                r["n_chars"], r["n_latin"], r["n_digit"], r["n_cjk"],
                r["n_cyrillic"], r["n_arabic"], r["n_whitespace"],
                r["n_other"], r["latin_frac"], r["cjk_frac"],
            )
            for r in script_counts(d).collect()
        }
        assert got[1] == (7, 3, 3, 0, 0, 0, 1, 0, 3 / 7, 0.0)
        assert got[2] == (9, 0, 0, 9, 0, 0, 0, 0, 0.0, 1.0)
        assert got[3] == (10, 0, 0, 0, 9, 0, 1, 0, 0.0, 0.0)
        assert got[4] == (5, 0, 0, 0, 0, 5, 0, 0, 0.0, 0.0)
        assert got[5] == (0, 0, 0, 0, 0, 0, 0, 0, None, None)
        assert got[6] == (0, 0, 0, 0, 0, 0, 0, 0, None, None)
        # punctuation falls into n_other; classes stay disjoint
        assert got[7] == (7, 3, 0, 0, 0, 0, 0, 4, 3 / 7, 0.0)

    def test_map_only_plan(self, spark):
        from pfutil_spark.functions.text import script_counts

        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            script_counts(d)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "Python" not in plan and "mapInArrow" not in plan


class TestCrossSourceDupMatrix:
    def test_hand_counts_null_sources_and_frac(self, spark):
        """Unordered normalization (one row per source combination),
        NULL sources land in the source_b slot regardless of arrival
        side, diagonal = within-source dups, fracs share one exact
        denominator."""
        from pfutil_spark.operators.dedup import cross_source_dup_matrix

        docs = spark.createDataFrame(
            [(1, "A"), (2, "B"), (3, "A"), (4, None), (5, "B"), (6, "A")],
            "doc_id long, source string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (3, 5), (1, 3), (4, 1), (6, 4)],
            "id_a long, id_b long",
        )
        got = {
            (r["source_a"], r["source_b"]): (r["n_pairs"], r["pair_frac"])
            for r in cross_source_dup_matrix(
                docs, pairs, "doc_id", "source"
            ).collect()
        }
        # (1,2)=(A,B) (3,5)=(A,B) (1,3)=(A,A) (4,1)=NULL,A -> (A,NULL)
        # (6,4)=(A,NULL) — both NULL-pairs group together
        assert got == {
            ("A", "B"): (2, 0.4),
            ("A", "A"): (1, 0.2),
            ("A", None): (2, 0.4),
        }

    def test_partition_independent_zero_python(self, spark):
        from pfutil_spark.operators.dedup import cross_source_dup_matrix

        docs = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
        )
        pairs = spark.createDataFrame(
            [(i, (i * 7) % 60) for i in range(0, 60, 2) if i != (i * 7) % 60],
            "id_a long, id_b long",
        )
        a = sorted(map(tuple, cross_source_dup_matrix(docs, pairs, "doc_id", "source").collect()))
        b = sorted(map(tuple, cross_source_dup_matrix(
            docs.repartition(7), pairs.repartition(5), "doc_id", "source").collect()))
        assert a == b
        plan = (
            cross_source_dup_matrix(docs, pairs, "doc_id", "source")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "mapInArrow" not in plan


class TestKnnJoin:
    def test_exact_matches_numpy_brute_force(self, spark):
        from pfutil_spark.operators.similarity import knn_join

        e = embs(spark)
        q = e.filter(F.col("vec_id") < 3)
        got = knn_join(e, q, k=5, exclude_same_id=True).collect()
        rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                for r in e.collect()}
        for qid in range(3):
            qv = rows[qid]
            scores = {
                bid: float(qv @ bv / (np.linalg.norm(qv) * np.linalg.norm(bv)))
                for bid, bv in rows.items() if bid != qid
            }
            want = [b for b, _ in sorted(
                scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
            mine = [r["base_id"] for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"])]
            assert mine == want, (qid, mine, want)
            for r in got:
                if r["query_id"] == qid:
                    assert abs(r["cosine"] - scores[r["base_id"]]) < 1e-9

    def test_exact_plan_broadcasts_queries(self, spark):
        from pfutil_spark.operators.similarity import knn_join

        e = embs(spark)
        plan = (
            knn_join(e, e.limit(2), k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Python" not in plan and "mapInArrow" not in plan

    def test_lsh_recall_and_determinism(self, spark):
        from pfutil_spark.operators.similarity import knn_join, knn_join_lsh

        e = embs(spark)
        q = e.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["base_id"])
            for r in knn_join(e, q, k=5, exclude_same_id=True).collect()
        }
        # synthetic embeddings are near-random (neighbors barely above
        # the background cosine), the hostile case for hyperplane LSH —
        # wider buckets (6 planes) and 8 tables give deterministic
        # recall 0.84 here; real clustered embeddings do far better
        ann_df = knn_join_lsh(
            e, q, k=5, n_planes=6, n_tables=8, exclude_same_id=True
        )
        ann = {(r["query_id"], r["base_id"]) for r in ann_df.collect()}
        recall = len(exact & ann) / len(exact)
        assert recall >= 0.7, f"LSH knn recall {recall}"
        again = {
            (r["query_id"], r["base_id"])
            for r in knn_join_lsh(
                e.repartition(7), q, k=5, n_planes=6, n_tables=8,
                exclude_same_id=True,
            ).collect()
        }
        assert ann == again  # deterministic buckets, partition-independent
        with pytest.raises(ValueError, match="k="):
            knn_join(e, q, k=0)

    def test_infer_dim_empty_base_raises_clearly(self, spark):
        from pfutil_spark.operators.similarity import knn_join_lsh

        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="pass dim="):
            knn_join_lsh(empty, empty, k=1)


class TestNgramProfile:
    def test_known_bigrams(self, spark):
        from pfutil_spark.functions.text import ngram_profile

        df = spark.createDataFrame(
            [
                ("en", "a b a b c"),
                ("en", "a b"),
                ("fr", "x y"),
                ("fr", ""),
                ("fr", None),
            ],
            "lang string, text string",
        )
        rows = [
            (r["lang"], r["ngram_rank"], r["ngram"], r["ngram_count"])
            for r in ngram_profile(df, "text", "lang", n=2, k=3)
            .orderBy("lang", "ngram_rank")
            .collect()
        ]
        # en bigrams: "a b" x3 ("a b a b c" has a-b, b-a, a-b + "a b"),
        # "b a" x1, "b c" x1 -> ties broken by ngram asc
        assert rows == [
            ("en", 1, "a b", 3),
            ("en", 2, "b a", 1),
            ("en", 3, "b c", 1),
            ("fr", 1, "x y", 1),
        ]

    def test_short_docs_contribute_nothing(self, spark):
        from pfutil_spark.functions.text import ngram_profile

        df = spark.createDataFrame(
            [("en", "solo"), ("en", "two words here")],
            "lang string, text string",
        )
        rows = ngram_profile(df, n=3, k=5).collect()
        assert [(r["ngram"], r["ngram_count"]) for r in rows] == [
            ("two words here", 1)
        ]

    def test_validation(self, spark):
        from pfutil_spark.functions.text import ngram_profile

        df = spark.createDataFrame([("en", "a b")], "lang string, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ngram_profile(df, k=0)
        with _pytest.raises(ValueError):
            ngram_profile(df, n=0)

    def test_partition_invariance(self, spark, sf_dir):
        from pfutil_spark.functions.text import ngram_profile

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = sorted(
            map(tuple, ngram_profile(d, n=2, k=5).collect())
        )
        rep = sorted(
            map(tuple, ngram_profile(d.repartition(7), n=2, k=5).collect())
        )
        assert base == rep
