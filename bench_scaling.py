#!/usr/bin/env python
"""Scaling-evidence protocol (BASELINE.md): the north_rule's two-cluster-
size criterion (N vs 4N executors, throughput scaling efficiency >= 0.8)
evidenced in this sandbox by running the SAME flagship job on the SAME
parquet input at two local parallelism levels in separate JVMs
(default pair 1 and 4; see PFUTIL_SCALING_CORES).

Usage:
    python bench_scaling.py --cores 4      # one measured run, prints JSON
    python bench_scaling.py                # orchestrates the pair, writes
                                           # BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROWS = int(os.environ.get("PFUTIL_SCALING_ROWS", "8000000"))
REPS = int(os.environ.get("PFUTIL_SCALING_REPS", "5"))
TABLE = os.environ.get("PFUTIL_SCALING_TABLE", f"/tmp/pfutil_scaling_src_{ROWS}")


def _spark(cores: int, label: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"pfutil-scaling-{label}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # pre-touch the heap at startup (untimed): this sandbox serves
        # page faults at ~0.12GB/s per process, which otherwise acts as a
        # SERIAL tax inside the single JVM and corrupts scaling numbers
        .config("spark.driver.extraJavaOptions", "-XX:+AlwaysPreTouch")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # many splits so every parallelism level fills its slots
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )


def prepare_table() -> None:
    """Materialize the deterministic sourcecode table to parquet ONCE
    (untimed prep shared by both parallelism levels — the realistic
    deployment shape: the engine reads an existing parquet/Iceberg table)."""
    if os.path.exists(os.path.join(TABLE, "_SUCCESS")):
        return
    from pfutil_spark.sources import sourcecode_table

    spark = _spark(32, "prep")
    spark.sparkContext.setLogLevel("ERROR")
    sourcecode_table(spark, ROWS, partitions=64).write.mode("overwrite").parquet(TABLE)
    spark.stop()


def run_one(cores: int) -> dict:
    from pyspark.sql import functions as F

    from pfutil_spark.operators import pf_count_col, pf_merge, pf_partial

    spark = _spark(cores, str(cores))
    spark.sparkContext.setLogLevel("ERROR")

    # identical input at every parallelism: the SAME parquet files
    def src():
        return spark.read.parquet(TABLE).select(
            "lang", F.sha2(F.col("content"), 256).alias("content_sha")
        )

    def flagship():
        """Distinct content-sha256 per lang + global: ONE Spark job (one
        shuffle); the global PFMERGE runs on the driver over the 17
        collected per-lang sketches (12KB each) — the reference example's
        own pattern (Main.java: fetch dumps, merge locally)."""
        import numpy as np

        from pfutil_spark.kernel import hll as H

        rows = pf_merge(
            pf_partial(src(), "content_sha", by=("lang",), version=4), ("lang",)
        ).collect()
        regs = np.stack([H.decode(bytes(r["sketch"])) for r in rows])
        ests = {
            r["lang"]: H.estimate(regs[i], 4) for i, r in enumerate(rows)
        }
        ests["*"] = H.estimate(H.merge_registers(regs), 4)
        return ests

    flagship()  # untimed warmups (worker fork + numpy/arena faults)
    estimates = flagship()

    times = []
    for _ in range(REPS):
        t0 = time.time()
        flagship()
        times.append(time.time() - t0)
    best = min(times)
    spark.stop()
    return {
        "cores": cores,
        "rows": ROWS,
        "sec": round(best, 3),
        "all_runs_sec": [round(t, 3) for t in times],
        "rows_per_sec": round(ROWS / best),
        "global_estimate": estimates["*"],
    }


def kernel_single_core() -> dict:
    """Single-core pure-numpy pfAdd-path throughput — sanity anchor vs the
    reference's published 13.1M ops/s single-thread Java pfAdd.

    Two variants: the python-objects path (list of bytes) and the flat
    Arrow-buffer path (values+offsets, what mapInArrow actually feeds)."""
    import hashlib

    import numpy as np

    from pfutil_spark.kernel import hll

    n = 1_000_000
    datas = [hashlib.sha256(str(i).encode()).hexdigest().encode() for i in range(n)]
    best_obj = 1e9
    for _ in range(3):
        t0 = time.time()
        idx, pl = hll.hash_and_patlen(datas, 4)
        regs = hll.empty_registers()
        hll.update_registers(regs, idx, pl)
        best_obj = min(best_obj, time.time() - t0)

    flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
    offsets = np.arange(0, (n + 1) * 64, 64, dtype=np.int64)
    best_flat = 1e9
    for _ in range(3):
        t0 = time.time()
        idx, pl = hll.hash_and_patlen_flat(flat, offsets, 4)
        regs = hll.empty_registers()
        hll.update_registers(regs, idx, pl)
        best_flat = min(best_flat, time.time() - t0)
    # 32-byte raw digests: the element size bench.py PFADDs since r2, and
    # the apples-to-apples anchor vs the reference JMH's ~36-byte UUIDs
    dig = [hashlib.sha256(str(i).encode()).digest() for i in range(n)]
    flat32 = np.frombuffer(b"".join(dig), dtype=np.uint8)
    offsets32 = np.arange(0, (n + 1) * 32, 32, dtype=np.int64)
    best32 = 1e9
    for _ in range(3):
        t0 = time.time()
        idx, pl = hll.hash_and_patlen_flat(flat32, offsets32, 4)
        regs = hll.empty_registers()
        hll.update_registers(regs, idx, pl)
        best32 = min(best32, time.time() - t0)
    return {
        "rows": n,
        "sec": round(best_obj, 3),
        "rows_per_sec": round(n / best_obj),
        "rows_per_sec_flat_arrow_path": round(n / best_flat),
        "rows_per_sec_flat_32B_digest": round(n / best32),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--cores":
        print(json.dumps(run_one(int(sys.argv[2]))))
        return

    prepare_table()
    pair = tuple(
        int(x) for x in os.environ.get("PFUTIL_SCALING_CORES", "1,4").split(",")
    )
    # INTERLEAVED legs (A-B-A-B): the host has noisy neighbors (see
    # NOTES.md) and contention can ramp DURING a leg — observed a 1-core
    # leg degrade 64s -> 116s across reps while the following 4-core leg
    # sat stable, which would understate efficiency. Interleaving makes
    # both legs sample the same noise window; each leg keeps its best.
    passes = int(os.environ.get("PFUTIL_SCALING_PASSES", "2"))
    results: dict = {}
    for _ in range(passes):
        for cores in pair:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            prev = results.get(cores)
            if prev is None:
                results[cores] = r
            else:
                prev["all_runs_sec"] = prev["all_runs_sec"] + r["all_runs_sec"]
                if r["sec"] < prev["sec"]:
                    prev["sec"], prev["rows_per_sec"] = r["sec"], r["rows_per_sec"]
                assert prev["global_estimate"] == r["global_estimate"]

    kern = kernel_single_core()
    lo, hi = pair
    thr_lo, thr_hi = results[lo]["rows_per_sec"], results[hi]["rows_per_sec"]
    ratio = hi / lo
    eff = (thr_hi / thr_lo) / ratio
    same = results[lo]["global_estimate"] == results[hi]["global_estimate"]
    summary = {
        "metric": f"flagship scaling local[{lo}] vs local[{hi}] (N vs {ratio:g}N)",
        "rows": ROWS,
        "cores_pair": [lo, hi],
        f"local{lo}_rows_per_sec": thr_lo,
        f"local{hi}_rows_per_sec": thr_hi,
        "scaling_efficiency": round(eff, 3),
        "estimates_identical_across_parallelism": same,
        "kernel_single_core_rows_per_sec": kern["rows_per_sec"],
        "kernel_single_core_rows_per_sec_32B_digest": kern[
            "rows_per_sec_flat_32B_digest"
        ],
        "detail": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(_report_md(summary))
    print(json.dumps(summary))


def _report_md(s: dict) -> str:
    lo, hi = s["cores_pair"]
    d8, d32 = s["detail"][lo], s["detail"][hi]
    return f"""# BENCH/BASELINE — scaling evidence (sandbox protocol)

Per BASELINE.md: the north_rule's "scaling efficiency >= 0.8 between N and
4N executors" criterion, evidenced by the same flagship job (distinct
content-sha256 per lang + global PFMERGE, {s['rows']:,} synthetic rows in
parquet, identical input files at both levels) at two local parallelism
levels in separate JVMs. Timed after one untimed warmup pass (steady
state, JMH-style); best of {REPS}. JVM heap is pre-touched
(-XX:+AlwaysPreTouch) because this sandbox serves page faults at
~0.12GB/s per process — an artifact that otherwise injects a SERIAL
per-run tax into the single local JVM that no real cluster has (each
executor is its own process; fault service scales linearly with process
count, measured).

| run | cores | wall (s) | rows/s | all runs (s) |
|---|---|---|---|---|
| A (N) | {lo} | {d8['sec']} | {d8['rows_per_sec']:,} | {d8['all_runs_sec']} |
| B ({hi // lo}N) | {hi} | {d32['sec']} | {d32['rows_per_sec']:,} | {d32['all_runs_sec']} |

**Scaling efficiency = (thr_B / thr_A) / 4 = {s['scaling_efficiency']}**
(target >= 0.8)

Merge associativity across parallelism: global HLL estimate identical at
both levels: **{s['estimates_identical_across_parallelism']}**
(estimate = {d8['global_estimate']:,}).

Single-core pure-numpy kernel (hash + patLen + register max-update, 1M
rows, steady state): **{s['kernel_single_core_rows_per_sec']:,} rows/s** on
64-byte sha256-hex elements; **{s['kernel_single_core_rows_per_sec_32B_digest']:,} rows/s**
on 32-byte raw digests (the element size bench.py PFADDs — the
apples-to-apples anchor vs the reference's published single-thread Java
pfAdd 13,140,895 ops/s on ~36-byte UUID strings; JMH, i7-7600U; see
BASELINE.md). Note: this sandbox's first-touch page faults run
~100MB/s, which taxes allocation-heavy vectorized kernels; steady-state
numbers above are after arena warmup.
"""


if __name__ == "__main__":
    main()
