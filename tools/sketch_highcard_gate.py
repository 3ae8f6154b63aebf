#!/usr/bin/env python
"""Extension-sketch extreme-cardinality gate (VERDICT r3 top item).

Runs every sketch family (r5: kmv/cms/bloom + kll/tdigest/spacesaving
and the weighted-KLL fold — select with PFUTIL_GATE_KINDS) through the
full partial/merge pipeline at 1M rows with a near-unique grouping key
(900k groups — the regime where the r3 per-group-Python aggregation
broke down) vs a low-card key (17 groups), in a FRESH JVM, and prints
one JSON line with timings.
Same rationale and A-B-A protocol as tools/highcard_gate.py: the shared
pytest session measures GC archaeology, and this host's noise comes in
multi-minute bursts, so the low-card leg is timed before AND after the
near-unique leg and the larger value is the denominator.

CMS runs at the DEFAULT depth/width: the sparse (v2) wire encoding keeps
a near-empty sketch at ~80 bytes regardless of width, so 900k per-key
sketches ship ~70MB instead of 900k x 82KB = 74GB of dense dumps — the
change that makes per-key CMS viable at all in this regime.
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

    from pfutil_spark.operators.sketch_agg import (
        SKETCH_COL,
        bloom_sketch,
        cms_sketch,
        kll_sketch,
        kll_weighted_sketch,
        kmv_sketch,
        spacesaving_sketch,
        tdigest_sketch,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pfutil-sketch-highcard-gate")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:+AlwaysPreTouch")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    N = 1_000_000

    def frame(n: int):
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("l"), (F.col("id") % 17).cast("string")).alias("lang"),
                F.concat(
                    F.lit("c"), (F.col("id") % int(n * 0.9)).cast("string")
                ).alias("commit"),
                F.col("id").cast("string").alias("elem"),
                (F.col("id") % 9973).cast("double").alias("val"),
                (F.col("id") % 37 + 1).cast("double").alias("wt"),
            )
            .repartition(8)
        )

    def build(kind: str, df, by):
        if kind == "kmv":
            return kmv_sketch(df, "elem", by=by, k=2048)
        if kind == "bloom":
            # default sizing (expected_n=1M -> m=2^24): feasible per-key
            # only because of the sparse v2 wire (~70B/near-empty filter)
            return bloom_sketch(df, "elem", by=by, expected_n=1_000_000)
        if kind == "kll":
            return kll_sketch(df, "val", by=by)
        if kind == "kll_weighted":  # the weighted-fold high-card property
            return kll_weighted_sketch(df, "val", "wt", by=by)
        if kind == "tdigest":
            return tdigest_sketch(df, "val", by=by)
        if kind == "spacesaving":
            return spacesaving_sketch(df, "elem", by=by)  # default m=256
        if kind == "cms":
            return cms_sketch(df, "elem", by=by)  # DEFAULT depth=5, width=2048
        raise ValueError(f"unknown gate kind {kind!r}")  # typo'd env var
        # must fail loudly, not silently benchmark CMS under a wrong label

    def once(kind: str, n: int, by):
        q = build(kind, frame(n), by)
        agg = q.agg(
            F.count(F.lit(1)).alias("g"), F.sum(F.length(SKETCH_COL)).alias("b")
        )
        t0 = time.time()
        row = agg.collect()[0]
        return round(time.time() - t0, 2), int(row["g"]), int(row["b"])

    kinds = os.environ.get(
        "PFUTIL_GATE_KINDS",
        "kmv,cms,bloom,kll,tdigest,spacesaving,kll_weighted",
    ).split(",")
    out = {}
    for kind in kinds:
        once(kind, 100_000, ("lang",))     # warm both shapes
        once(kind, 100_000, ("commit",))
        t_lo_a, g_lo, _ = once(kind, N, ("lang",))
        t_hi, g_hi, bytes_hi = once(kind, N, ("commit",))
        t_lo_b, _, _ = once(kind, N, ("lang",))
        out[kind] = {
            "t_lo": max(t_lo_a, t_lo_b),
            "t_lo_runs": [t_lo_a, t_lo_b],
            "t_hi": t_hi,
            "g_lo": g_lo,
            "g_hi": g_hi,
            "bytes_hi": bytes_hi,
        }
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
