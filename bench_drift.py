#!/usr/bin/env python
"""Drift-at-scale benchmark: pairwise KS over many strata from KLL
sketches vs the exact computation — evidence that the drift suite holds
up far beyond the 500-row contract tables.

Data: ``PFUTIL_DRIFT_ROWS`` rows (default 10M) across 20 strata,
``value ~ N(0,1)`` except three shifted strata at ``N(0.5,1)`` (true
KS vs unshifted = 2*Phi(0.25) - 1 ~= 0.197). The sketch path answers
ALL 190 stratum pairs from ONE scan; the exact path needs a
per-pair re-aggregation + a global-order window over the pair's
distinct values, so it is timed on 3 representative pairs and the
190-pair cost is the disclosed extrapolation.

Gates (hard-asserted, not just reported):
- every shifted-vs-unshifted pair estimates KS > 0.15, every
  same-distribution pair < 0.06 (perfect separation);
- on the 3 exactly-computed pairs, |est - exact| <= the analytic bound
  2 * KS_EPS_C / k.

Writes one JSON line to stdout; NOT part of the driver-graded bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("PFUTIL_DRIFT_ROWS", "10000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_STRATA = 20
SHIFTED = {"s17", "s18", "s19"}
K = 200


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from pfutil_spark.kernel import kll
    from pfutil_spark.operators.drift import drift_matrix

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-drift-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.range(N_ROWS, numPartitions=CPUS * 2)
        .select(
            F.concat(F.lit("s"), (F.col("id") % N_STRATA).cast("string")).alias(
                "stratum"
            ),
            (
                F.randn(seed=7)
                + F.when(
                    (F.col("id") % N_STRATA) >= N_STRATA - len(SHIFTED), 0.5
                ).otherwise(0.0)
            ).alias("value"),
        )
        .persist()
    )
    n_rows = df.count()  # materialize so both paths read identical data

    t0 = time.time()
    est_rows = drift_matrix(df, "value", "stratum", k=K).collect()
    sketch_sec = round(time.time() - t0, 3)
    est = {(r["a"], r["b"]): r["ks_est"] for r in est_rows}
    bound = 2 * kll.KS_EPS_C / K

    # separation gate over all 190 pairs
    sep_ok = True
    for (a, b), d in est.items():
        drifted = (a in SHIFTED) != (b in SHIFTED)
        sep_ok &= (d > 0.15) if drifted else (d < 0.06)
    assert sep_ok, sorted(est.items())

    # exact KS on 3 representative pairs (same data, same <= convention)
    def exact_pair(a: str, b: str) -> float:
        sub = df.filter(F.col("stratum").isin(a, b))
        n = {
            r["stratum"]: r["n"]
            for r in sub.groupBy("stratum").agg(F.count("*").alias("n")).collect()
        }
        marks = sub.groupBy("value").agg(
            F.sum((F.col("stratum") == a).cast("long")).alias("da"),
            F.sum((F.col("stratum") == b).cast("long")).alias("db"),
        )
        w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
        gaps = marks.select(
            F.abs(
                F.sum("da").over(w) / F.lit(n[a]) - F.sum("db").over(w) / F.lit(n[b])
            ).alias("gap")
        )
        return gaps.agg(F.max("gap")).first()[0]

    pairs3 = [("s0", "s1"), ("s0", "s17"), ("s17", "s18")]
    t1 = time.time()
    exact = {p: exact_pair(*p) for p in pairs3}
    exact_sec = round(time.time() - t1, 3)
    bound_ok = all(
        abs(est[p] - exact[p]) <= bound for p in pairs3
    )
    assert bound_ok, {p: (est[p], exact[p], bound) for p in pairs3}

    print(
        json.dumps(
            {
                "metric": f"drift_matrix {N_STRATA} strata / "
                f"{N_STRATA * (N_STRATA - 1) // 2} pairs, KS from KLL k={K}",
                "rows": n_rows,
                "sketch_all_pairs_sec": sketch_sec,
                "exact_3pairs_sec": exact_sec,
                "exact_190pairs_sec_extrapolated": round(
                    exact_sec / len(pairs3) * len(est), 1
                ),
                "separation_ok": sep_ok,
                "bound_ok": bound_ok,
                "bound": bound,
                "sample": {
                    "same_dist s0~s1": round(est[("s0", "s1")], 4),
                    "shifted s0~s17": round(est[("s0", "s17")], 4),
                    "both_shifted s17~s18": round(est[("s17", "s18")], 4),
                    "exact s0~s17": round(exact[("s0", "s17")], 4),
                },
                "cpus": CPUS,
                "loadavg": list(os.getloadavg()),
            }
        )
    )
    df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
