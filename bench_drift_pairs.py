#!/usr/bin/env python
"""Drift pair-evaluator throughput at large stratum counts (r5 evidence,
VERDICT r4 item 2): the batch-decoded KS path must hold near-linear
pair throughput at >= 5*10^5 pairs — the regime where the old per-pair
Python decode was the latent bottleneck.

Two legs, one JSON line:

* kernel leg (no Spark, single core): L strata sketches (k=200,
  compacted), ALL L(L-1)/2 pairs through the PRODUCTION chunked
  pipeline (operators/drift.py::_iter_pair_chunks -> ks_pairs_flat;
  4MB pair slices, 2^17-item eval chunks — monolithic parsing hits
  this host's 0.12GB/s fresh-allocation wall, measured 873 vs 6500
  pairs/s), plus the measured per-pair cost of the OLD decode-per-pair
  path on a 2k sample for the disclosed speedup.
* Spark leg: operators/drift.py::drift_matrix at the same L over
  ``PFUTIL_DRIFT_ROWS`` rows (default 2M) — end-to-end including the
  one scan, one shuffle, broadcast self-join and Arrow transfer.

Env: PFUTIL_DRIFT_STRATA (default 1024), PFUTIL_DRIFT_ROWS (2M),
SPARK_GRAFT_CPUS. Not part of the driver-graded bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

L = int(os.environ.get("PFUTIL_DRIFT_STRATA", "1024"))
N_ROWS = int(os.environ.get("PFUTIL_DRIFT_ROWS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 200


def main() -> None:
    import numpy as np

    from pfutil_spark.kernel import kll

    rng = np.random.default_rng(7)
    per = max(N_ROWS // L, 200)
    sketches = []
    for i in range(L):
        sk = kll.KllSketch(K)
        sk.update(rng.normal(loc=0.5 * (i % 7 == 0), size=per))
        sketches.append(sk.encode())

    # all unordered pairs, flat
    ia, ib = np.triu_indices(L, k=1)
    n_pairs = len(ia)

    import pandas as pd

    from pfutil_spark.operators.drift import _iter_pair_chunks

    sa = pd.Series([sketches[i] for i in ia])
    sb = pd.Series([sketches[i] for i in ib])
    d = np.full(n_pairs, np.nan)
    t0 = time.time()
    for ids, pa, pb in _iter_pair_chunks(sa, sb):
        d[ids] = kll.ks_pairs_flat(pa, pb)[0]
    kernel_sec = time.time() - t0
    assert int(np.isfinite(d).sum()) == n_pairs

    # old path cost on a sample (decode per pair, like pre-r5)
    sample = rng.choice(n_pairs, 2000, replace=False)
    t0 = time.time()
    for s in sample:
        kll.ks_distance(
            kll.decode(sketches[ia[s]]), kll.decode(sketches[ib[s]])
        )
    old_per_pair = (time.time() - t0) / len(sample)

    # Spark end-to-end leg
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pfutil_spark.operators.drift import drift_matrix

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-drift-pairs-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(N_ROWS, numPartitions=CPUS * 2)
        .select(
            F.concat(F.lit("s"), (F.col("id") % L).cast("string")).alias("stratum"),
            F.randn(seed=7).alias("value"),
        )
        .persist()
    )
    df.count()
    t0 = time.time()
    n_out = drift_matrix(df, "value", "stratum", k=K).count()
    spark_sec = round(time.time() - t0, 3)
    spark.stop()

    print(
        json.dumps(
            {
                "strata": L,
                "pairs": n_pairs,
                "rows_per_stratum": per,
                "kernel_sec": round(kernel_sec, 3),
                "kernel_pairs_per_sec": round(n_pairs / kernel_sec),
                "old_decode_path_per_pair_sec": round(old_per_pair, 6),
                "old_path_extrapolated_sec": round(old_per_pair * n_pairs, 1),
                "spark_drift_matrix_sec": spark_sec,
                "spark_pairs_out": n_out,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
