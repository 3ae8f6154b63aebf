"""Token-budget shard packing (operators/packing.py)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pfutil_spark.functions.text import token_count_col
from pfutil_spark.operators.packing import (
    pack_token_shards,
    shard_stats,
    sql_pack_exprs,
)


def _py_draw(key, seed=0):
    return hashlib.sha256(f"{key}#{seed}".encode()).hexdigest()[:15]


def _py_pack(rows, budget, bucket_chars=1, seed=0):
    """Pure-Python reference: rows = [(key, tokens)] -> {key: (bucket, shard)}."""
    df = pd.DataFrame(rows, columns=["key", "tok"])
    df["draw"] = [_py_draw(k, seed) for k in df["key"]]
    df["bucket"] = df["draw"].str[:bucket_chars]
    out = {}
    for b, g in df.groupby("bucket"):
        g = g.sort_values(["draw", "key"])
        cum = 0
        for _, r in g.iterrows():
            out[r["key"]] = (b, cum // budget)
            cum += r["tok"]
    return out


class TestPacking:
    def _docs(self, spark, n=300):
        rows = [(i, 10 + (i * 37) % 90) for i in range(n)]
        return spark.createDataFrame(rows, "key long, tok long"), rows

    def test_matches_python_reference(self, spark):
        df, rows = self._docs(spark)
        got = {
            r["key"]: (r["pack_bucket"], r["pack_shard"])
            for r in pack_token_shards(df, "key", "tok", budget=500).collect()
        }
        assert got == _py_pack(rows, 500)

    def test_partition_independent(self, spark):
        df, _ = self._docs(spark)
        a = pack_token_shards(df, "key", "tok", budget=300).orderBy("key").collect()
        b = (
            pack_token_shards(df.repartition(13), "key", "tok", budget=300)
            .orderBy("key")
            .collect()
        )
        assert a == b

    def test_shard_start_offsets_partition_the_stream(self, spark):
        df, _ = self._docs(spark, n=500)
        packed = pack_token_shards(df, "key", "tok", budget=400).toPandas()
        for b, g in packed.groupby("pack_bucket"):
            shards = sorted(g["pack_shard"].unique())
            assert shards == list(range(len(shards)))  # contiguous from 0
            # recompute each doc's start offset; its shard must be the
            # chunk containing that offset
            g = g.sort_values(["pack_shard", "key"])
            draws = [_py_draw(k) for k in g["key"]]
            g = g.assign(d=draws).sort_values(["d", "key"])
            cum = 0
            for _, r in g.iterrows():
                assert r["pack_shard"] == cum // 400
                cum += r["tok"]

    def test_oversized_doc_keeps_starting_shard(self, spark):
        df = spark.createDataFrame([(1, 5000), (2, 10), (3, 10)], "key long, tok long")
        packed = {
            r["key"]: r["pack_shard"]
            for r in pack_token_shards(df, "key", "tok", budget=100).collect()
        }
        assert set(packed.values()) <= {0, 50, 51}  # giant doc spills 50 budgets

    def test_null_key_or_tokens_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (None, 10), (2, None)], "key long, tok long"
        )
        rows = {
            r["key"]: (r["pack_bucket"], r["pack_shard"])
            for r in pack_token_shards(df, "key", "tok", budget=100).collect()
        }
        # NULL key / NULL tokens have no position in the stream: excluded
        # (and never funneled through a single NULL window partition)
        assert set(rows) == {1}
        assert rows[1][0] is not None and rows[1][1] == 0

    def test_shard_index_is_long_via_integer_div(self, spark):
        packed = pack_token_shards(
            spark.createDataFrame([(1, 10)], "key long, tok long"),
            "key",
            "tok",
            budget=7,
        )
        assert dict(packed.dtypes)["pack_shard"] == "bigint"
        # floor(x / y) would float-round past 2^53; `div` stays integral
        # (floor() also yields bigint, so check the plan for the div node)
        plan = packed._jdf.queryExecution().analyzed().toString()
        assert " div " in plan and "FLOOR" not in plan.upper()
        assert packed.collect()[0]["pack_shard"] == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 10)], "key long, tok long")
        with pytest.raises(ValueError, match="budget"):
            pack_token_shards(df, "key", "tok", budget=0)
        with pytest.raises(ValueError, match="bucket_chars"):
            pack_token_shards(df, "key", "tok", budget=10, bucket_chars=0)

    def test_shard_stats_and_sql_mirror_on_documents(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        packed = pack_token_shards(
            docs, "doc_id", token_count_col("text"), budget=2000, seed=3
        )
        stats = (
            shard_stats(packed, token_count_col("text"))
            .orderBy("pack_bucket", "pack_shard")
            .toPandas()
        )
        assert (stats["n_docs"] > 0).all()
        import duckdb

        draw, bucket = sql_pack_exprs("doc_id", 1, seed=3)
        q = f"""
        WITH base AS (
          SELECT doc_id, {draw} AS d, {bucket} AS b,
                 CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        cum AS (
          SELECT b, tok,
                 sum(tok) OVER (PARTITION BY b ORDER BY d, doc_id
                                ROWS UNBOUNDED PRECEDING) AS c
          FROM base)
        SELECT b AS pack_bucket,
               CAST((c - tok) // 2000 AS BIGINT) AS pack_shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS n_tokens
        FROM cum GROUP BY 1, 2 ORDER BY 1, 2
        """
        oracle = duckdb.sql(q).df()
        pd.testing.assert_frame_equal(
            stats.reset_index(drop=True), oracle.reset_index(drop=True)
        )


class TestChunking:
    def test_matches_brute_force(self, spark):
        from pfutil_spark.operators.packing import chunk_documents

        rows = [
            (1, "a b c d e f g"),   # 7 toks, chunk 3 overlap 1 -> stride 2
            (2, "x"),                # single token -> one chunk
            (3, ""),                 # blank -> no rows
            (4, None),               # NULL text -> no rows
            (None, "p q r"),         # NULL id -> no rows
        ]
        got = {
            (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in chunk_documents(
                spark.createDataFrame(rows, "doc_id long, text string"),
                chunk_tokens=3,
                overlap=1,
            ).collect()
        }
        want = {}
        for did, t in rows:
            if did is None or not (t or "").strip():
                continue
            w = t.split()
            stride = 2
            for i, s in enumerate(range(0, len(w), stride)):
                piece = w[s : s + 3]
                want[(did, i)] = (len(piece), " ".join(piece))
        assert got == want
        # doc 1: starts 0,2,4,6 -> final chunk is the single token "g"
        assert got[(1, 3)] == (1, "g")

    def test_map_only_plan_and_validation(self, spark):
        from pfutil_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = chunk_documents(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan, plan
        for node in ("EvalPython", "MapInPandas", "MapInArrow"):
            assert node not in plan, plan
        # the HOF lambda re-evaluates its body PER ELEMENT: split() must
        # reference the materialized token-array attribute, never appear
        # inside the lambda (O(tokens x chunks) re-tokenization otherwise)
        opt = chunk_documents(df)._jdf.queryExecution().optimizedPlan().toString()

        def _lambda_bodies(s):  # balanced-paren extraction
            out, i = [], 0
            while (i := s.find("lambdafunction(", i)) != -1:
                j, depth = i + len("lambdafunction("), 1
                while depth and j < len(s):
                    depth += {"(": 1, ")": -1}.get(s[j], 0)
                    j += 1
                out.append(s[i:j])
                i = j
            return out

        bodies = _lambda_bodies(opt)
        assert bodies  # the extraction matched something
        for lam in bodies:
            assert "split(" not in lam, lam
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, overlap=5, chunk_tokens=5)
        with pytest.raises(ValueError, match="chunk_tokens"):
            chunk_documents(df, chunk_tokens=0)

    def test_blank_guard_matches_token_count_col(self, spark):
        # chunk_documents hand-rolls the blank-text token count (see the
        # comment in packing.py about CollapseProject); it must never
        # drift from functions.text.token_count_col
        from pfutil_spark.functions.text import token_count_col
        from pfutil_spark.operators.packing import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b"), (2, ""), (3, "   "), (4, "x")],
            "doc_id long, text string",
        )
        chunked = chunk_documents(df, chunk_tokens=10, overlap=0)
        got = {r["doc_id"]: r["n_chunk_tokens"] for r in chunked.collect()}
        want = {
            r["doc_id"]: r["n"]
            for r in df.select("doc_id", token_count_col("text").alias("n")).collect()
            if r["n"] > 0
        }
        assert got == want
