#!/usr/bin/env python
"""Round-6 optimization diagnostics (bench.py stays FROZEN — see task
rules). Runs the same 7 headline queries as bench.py with the same
session settings, but additionally:

* times each query with the noop sink (guide §1.4) so the measured time
  is computation, not collect();
* labels jobs (guide §1.5) and scrapes the UI REST API for per-stage
  task counts / runtimes — the scan-parallelism question (single-row-
  group parquet files bound splittable parallelism) needs real task
  counts, not guesses;
* can dump .explain("formatted") per query (PLANS argument).

Usage: python bench_extra.py [plans|diag] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # reuse the frozen query definitions verbatim

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MODE = sys.argv[1] if len(sys.argv) > 1 else "diag"


def build_spark_ui(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pfutil-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .getOrCreate()
    )


def rest(path: str):
    base = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def stage_report(app_id: str, after_stage: int):
    out = []
    for st in rest(f"/applications/{app_id}/stages?status=complete"):
        if st["stageId"] <= after_stage:
            continue
        out.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "runtime_ms": st["executorRunTime"],
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 2),
                "sh_write_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 2),
            }
        )
    return sorted(out, key=lambda s: s["stage"])


def main() -> None:
    spark = build_spark_ui(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    bench.SF_DIR = SF_DIR  # bench module caches its own SF_DIR at import

    if MODE == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        suffix = os.environ.get("PFUTIL_PLAN_SUFFIX", "before")
        for name, fn in bench.QUERIES.items():
            df = fn(spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
                f.write(p)
            print(f"wrote plans/r06/{name}_{suffix}.txt")
        spark.stop()
        return

    # diag: warmup once per shape (cold-vs-warm disclosed), then one
    # noop-sink timed run per query with stage scrape
    bench._flagship_input(spark)
    bench._flagship_input_full(spark)
    for name, fn in bench.QUERIES.items():
        fn(spark, SF_DIR).collect()

    results = {}
    for name, fn in bench.QUERIES.items():
        last_stage = max(
            [s["stageId"] for s in rest(f"/applications/{app_id}/stages")] or [-1]
        )
        spark.sparkContext.setJobDescription(f"diag:{name}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        results[name] = {"noop_wall_s": wall, "stages": stage_report(app_id, last_stage)}
        print(f"\n=== {name}: {wall}s (noop sink), loadavg {os.getloadavg()[0]:.1f}")
        for s in results[name]["stages"]:
            print(
                f"  stage {s['stage']:3d} tasks={s['tasks']:3d} "
                f"run={s['runtime_ms']:6d}ms in={s['input_mb']:8.1f}MB "
                f"shR={s['sh_read_mb']:7.2f}MB shW={s['sh_write_mb']:7.2f}MB  {s['name']}"
            )
    with open(f"/tmp/diag_{os.path.basename(SF_DIR)}.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
