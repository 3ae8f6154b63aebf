#!/usr/bin/env python
"""Standalone extreme-cardinality merge gate (VERDICT r2 top item).

Runs the full partial/merge/estimate pipeline at 1M and 12M rows of
near-unique keys in a FRESH JVM and prints one JSON line with timings
and row counts. The pytest gate (tests/test_highcard.py) invokes this
as a subprocess: measuring engine scaling inside the shared test
session is meaningless — after ~240 tests the 4GB JVM carries
localCheckpoint blocks, cached relations, and fragmented worker arenas,
and the 12M leg measures GC archaeology instead of the merge path
(observed: passes standalone in minutes, fails in-suite).

A-B-A protocol: the 1M leg is timed before AND after the 12M leg and
the larger value is the denominator, so a noise burst during the big
leg can't fake a regression (NOTES.md: bursts last minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pfutil_spark.operators import pf_count_distinct

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pfutil-highcard-gate")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:+AlwaysPreTouch")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def once(n: int):
        df = (
            spark.range(n)
            .select(
                F.concat(
                    F.lit("c"), (F.col("id") % int(n * 0.9)).cast("string")
                ).alias("commit"),
                F.sha2(F.col("id").cast("string"), 256).alias("elem"),
            )
            .repartition(8)
        )
        q = pf_count_distinct(df, "elem", by=("commit",))
        agg = q.agg(F.count(F.lit(1)).alias("g"), F.sum("estimate").alias("t"))
        t0 = time.time()
        row = agg.collect()[0]
        return round(time.time() - t0, 2), int(row["g"]), int(row["t"])

    once(200_000)  # warm worker pool + both partial/merge shapes
    t1a, g1, tot1 = once(1_000_000)
    t12, g12, tot12 = once(12_000_000)
    t1b, _, _ = once(1_000_000)
    print(
        json.dumps(
            {
                "t1": max(t1a, t1b),
                "t1_runs": [t1a, t1b],
                "t12": t12,
                "g1": g1,
                "g12": g12,
                "tot12": tot12,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
