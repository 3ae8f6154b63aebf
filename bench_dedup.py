#!/usr/bin/env python
"""Dedup-at-scale benchmark: MinHash(OPH) + LSH banding over a synthetic
corpus far larger than the 500-row documents table — evidence that the
candidate-pair pipeline (signatures -> band equi-join -> exact verify)
holds up at corpus scale, not just at the contract-query size.

Corpus: ``PFUTIL_DEDUP_DOCS`` base documents (default 200k, ~310 chars
each, deterministic), 5% of them duplicated with a small deterministic
edit (one token appended) -> known ground-truth near-dup pairs. The
pipeline must recover >= 95% of them with exact-Jaccard precision 1.

Writes one JSON line and BENCH/BENCH_dedup_r{round}.json-style output to
stdout; run it manually (it is NOT part of the driver-graded bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("PFUTIL_DEDUP_DOCS", "200000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DUP_FRAC = 20  # 1 of every 20 docs gets a near-dup copy -> 5%


def corpus(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS, numPartitions=CPUS * 2).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.md5(F.concat(F.lit("d0-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d1-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d2-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d3-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d4-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d5-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d6-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d7-"), F.col("id").cast("string"))), F.lit(" "),
            F.md5(F.concat(F.lit("d8-"), F.col("id").cast("string"))),
        ).alias("text"),
    )
    near = base.filter(F.col("doc_id") % DUP_FRAC == 0).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return base.unionByName(near)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-dedup-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pfutil_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = corpus(spark).persist()
    n_total = docs.count()
    expected_pairs = N_DOCS // DUP_FRAC

    def run():
        cand = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16, k=5,
            min_jaccard=0.5, method="oph",
        )
        ver = ngram_jaccard_pairs(docs, cand.select("id_a", "id_b"), "text", "doc_id", 5)
        return ver.filter(F.col("jaccard") >= 0.8)

    run().count()  # untimed warmup (worker pool, numpy)
    reps = []
    found = 0
    truth_hits = 0
    for _ in range(2):
        t0 = time.time()
        pairs = run().collect()
        reps.append(round(time.time() - t0, 3))
        found = len(pairs)
        truth_hits = sum(
            1 for p in pairs if p["id_b"] == p["id_a"] + N_DOCS and p["id_a"] % DUP_FRAC == 0
        )
    best = min(reps)
    out = {
        "metric": "minhash-oph+lsh near-dup pipeline wall-clock",
        "value": best,
        "unit": "sec",
        "docs": n_total,
        "docs_per_sec": round(n_total / best),
        "expected_near_dup_pairs": expected_pairs,
        "found_pairs": found,
        "ground_truth_recalled": truth_hits,
        "recall": round(truth_hits / expected_pairs, 4),
        "false_pairs": found - truth_hits,
        "reps": reps,
        "cpus": CPUS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
