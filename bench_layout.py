#!/usr/bin/env python
"""Layout benchmark: does write_clustered's range clustering actually
buy scan-time skipping? Write the SAME ~20M-row table twice — once
range-clustered on the filter key, once in natural (scattered) layout —
and time a selective range-predicate aggregation on each. Parquet
min-max row-group stats make the clustered scan skip almost everything;
the scattered layout must touch every row group because every file's
[min, max] spans the whole domain.

Writes one JSON line; run manually (NOT part of the graded bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("PFUTIL_LAYOUT_ROWS", "20000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FILES = 64
REPS = 3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pfutil_spark.sources.io import write_clustered

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-layout-bench")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="pfutil_layout_")
    scattered, clustered = f"{root}/scattered", f"{root}/clustered"
    df = spark.range(N, numPartitions=FILES).select(
        ((F.col("id") * 2654435761) % N).alias("k"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.write.parquet(scattered)  # every file spans the whole k domain
    write_clustered(df, clustered, cluster_by=["k"], num_files=FILES)

    lo, hi = N // 2, N // 2 + N // 1000  # ~0.1% of the key domain

    def timed(path):
        best = float("inf")
        rows = None
        for _ in range(REPS):
            t0 = time.time()
            r = (
                spark.read.parquet(path)
                .filter(F.col("k").between(lo, hi))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("s"),
                    # read the WIDE column too: a skipped row group now
                    # saves real decode IO, not just a pushed filter
                    F.sum(F.length("payload")).alias("p"),
                )
                .collect()[0]
            )
            best = min(best, time.time() - t0)
            rows = (r["n"], r["s"], r["p"])
        return best, rows

    t_scat, rows_scat = timed(scattered)
    t_clus, rows_clus = timed(clustered)
    assert rows_scat == rows_clus, (rows_scat, rows_clus)

    out = {
        "metric": "layout_bench",
        "rows": N,
        "files": FILES,
        "selectivity": round((hi - lo) / N, 5),
        "rows_matched": rows_scat[0],
        "scattered_sec": round(t_scat, 3),
        "clustered_sec": round(t_clus, 3),
        "speedup": round(t_scat / t_clus, 2),
        "results_identical": True,
        "loadavg": os.getloadavg()[0],
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
