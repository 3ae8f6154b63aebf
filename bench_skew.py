#!/usr/bin/env python
"""Skew-join benchmark: salted_join vs the plain shuffle join on a
deliberately pathological key distribution — evidence that salting
(a) produces the identical result and (b) bounds the hot reducer.

Fact table: ``PFUTIL_SKEW_ROWS`` rows (default 5M) where ONE key owns
half of all rows and the rest spread over 100k keys; dim: 100k keys.
AQE's skew splitting already rescues sort-merge joins on this box, so
the wall-clock comparison is run BOTH with AQE on (honest default) and
with AQE skew handling off (the regime salting is for: shuffled-hash
build sides, aggregations feeding joins, engines without AQE). The
structural evidence — max reducer share of the hot key dropping from
100% to ~1/salt — is measured directly from the salted key space and
holds at any scale.

Writes one JSON line; run manually (NOT part of the graded bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("PFUTIL_SKEW_ROWS", "5000000"))
N_KEYS = 100_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SALT = 32
HOT_KEY = 7


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pfutil_spark.operators.skew import salted_join

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-skew-bench")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    facts = (
        spark.range(N_ROWS, numPartitions=CPUS * 2)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
            .otherwise(F.col("id") % N_KEYS)
            .alias("k"),
            F.col("id").alias("v"),
        )
        .persist()
    )
    dims = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("name")
    ).persist()
    facts.count(), dims.count()

    def timed(df):
        t0 = time.time()
        n = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("name")).alias("s")
        ).collect()[0]
        return time.time() - t0, (n["n"], n["s"])

    results = {}
    for aqe_skew in (True, False):
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower()
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tag = "aqe_skew_on" if aqe_skew else "aqe_skew_off"
        t_plain, sig_plain = timed(facts.join(dims, "k"))
        t_salt, sig_salt = timed(
            salted_join(
                facts, dims, on="k", salt=SALT, hot_keys=[HOT_KEY],
                salt_on=["v"],
            )
        )
        assert sig_plain == sig_salt, (sig_plain, sig_salt)
        results[tag] = {
            "plain_sec": round(t_plain, 3),
            "salted_sec": round(t_salt, 3),
            "rows_joined": sig_plain[0],
        }

    # structural evidence: the hot key's reducer share after salting
    per_salt = (
        facts.filter(F.col("k") == HOT_KEY)
        .select(F.pmod(F.xxhash64("v"), F.lit(SALT)).alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .collect()[0]
    )
    out = {
        "metric": "skew_join_bench",
        "rows": N_ROWS,
        "hot_share_of_rows": 0.5,
        "salt": SALT,
        "max_reducer_share_unsalted": 1.0,
        "max_reducer_share_salted": round(per_salt["mx"] / per_salt["tot"], 4),
        "results_identical": True,
        "loadavg": os.getloadavg()[0],
        **results,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
