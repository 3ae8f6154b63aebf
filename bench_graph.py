#!/usr/bin/env python
"""Graph-operator scale benchmark: integer-exact PageRank and BFS over
a synthetic directed graph far larger than the contract-query graph —
evidence the per-round join+aggregate shape holds at millions of edges,
and that the bigint fixed-point ranks stay IDENTICAL across
parallelism (the partition-invariance the EXACT oracle relies on).

Graph: ``PFUTIL_GRAPH_NODES`` nodes (default 1M), deterministic
out-edges (a multiplicative scatter + a ring edge per node, and every
100th node pointing at hub 0) -> ~2M directed edges. BFS runs on the
REVERSED graph from the hub ("which nodes can reach the hub in <= 3
hops") so the frontier actually fans out.

Writes one JSON line; run manually (NOT part of the graded bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("PFUTIL_GRAPH_NODES", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def edges_frame(spark):
    from pyspark.sql import functions as F

    ids = spark.range(N, numPartitions=CPUS * 2)
    scatter = ids.select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761) % N).alias("dst"),
    )
    ring = ids.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % N).alias("dst")
    )
    hub = ids.filter(F.col("id") % 100 == 0).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    return scatter.unionByName(ring).unionByName(hub)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pfutil_spark.operators.graph import bfs_distances, pagerank

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pfutil-graph-bench")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = edges_frame(spark)
    n_edges = e.count()

    t0 = time.time()
    pr = pagerank(e, iters=3)
    top = pr.orderBy(F.col("rank_scaled").desc(), "node").limit(5).collect()
    t_pr = time.time() - t0

    # partition invariance: identical top ranks under a different layout
    pr2 = pagerank(e.repartition(17, "dst"), iters=3)
    top2 = pr2.orderBy(F.col("rank_scaled").desc(), "node").limit(5).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in top2], (top, top2)

    t0 = time.time()
    srcs = spark.createDataFrame([(0,)], "node long")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    d = bfs_distances(rev, srcs, max_hops=3)
    per_hop = {
        r["dist"]: r["n"]
        for r in d.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t_bfs = time.time() - t0

    out = {
        "metric": "graph_bench",
        "nodes": N,
        "edges": n_edges,
        "pagerank_iters": 3,
        "pagerank_sec": round(t_pr, 3),
        "pagerank_edges_per_sec_per_round": int(n_edges * 3 / t_pr),
        "pagerank_top1": {"node": top[0]["node"], "rank_scaled": top[0]["rank_scaled"]},
        "ranks_identical_across_partitionings": True,
        "bfs_hops": 3,
        "bfs_sec": round(t_bfs, 3),
        "bfs_reached_per_hop": per_hop,
        "loadavg": os.getloadavg()[0],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
