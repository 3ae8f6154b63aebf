"""Checkpoint-resume semantics: stage skipping, lineage/metrics tables,
byte-identical results under resume."""

import os
import shutil

from pyspark.sql import functions as F

from pfutil_spark.operators import pf_count_col, pf_sketch
from pfutil_spark.sources.checkpoint import ResumableHllJob


def _df(spark):
    return (
        spark.range(5000)
        .withColumn("grp", (F.col("id") % 4).cast("string"))
        .withColumn("elem", F.concat(F.lit("x"), (F.col("id") % 1700).cast("string")))
        .repartition(6)
    )


def test_run_then_resume_skips_stages(spark, tmp_path):
    ckpt = str(tmp_path / "job1")
    job = ResumableHllJob(spark, ckpt, by=("grp",))
    out1 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), "elem").collect()}
    assert job.stages_complete() == {"partial": True, "merged": True, "metrics": True}

    # direct (non-checkpointed) computation gives byte-identical sketches
    direct = {
        r["grp"]: bytes(r["sketch"])
        for r in pf_sketch(_df(spark), "elem", by=("grp",)).collect()
    }
    assert out1 == direct

    # lineage: every input partition accounted for, row totals exact
    m = job.metrics().collect()
    assert sum(r["rows_seen"] for r in m) == 5000
    assert {r["_partition_id"] for r in m} == set(range(6))

    # simulate failure after partial stage: delete merged, resume
    shutil.rmtree(job.merged_path)
    partial_mtime = os.path.getmtime(os.path.join(job.partial_path, "_SUCCESS"))
    out2 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), "elem").collect()}
    assert out2 == out1
    # partial stage was NOT recomputed
    assert os.path.getmtime(os.path.join(job.partial_path, "_SUCCESS")) == partial_mtime

    # fully complete job: run() just reads the result back
    out3 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), "elem").collect()}
    assert out3 == out1


def test_checkpointed_estimates_match(spark, tmp_path):
    ckpt = str(tmp_path / "job2")
    job = ResumableHllJob(spark, ckpt, by=(), salt_buckets=2)
    merged = job.run(_df(spark), "elem")
    est = merged.select(pf_count_col("sketch", 4).alias("e")).collect()[0]["e"]
    exact = _df(spark).select(F.countDistinct("elem")).collect()[0][0]
    assert abs(est - exact) / exact <= 3 * 0.008125


def test_resumable_sketch_job_kmv(spark, tmp_path):
    """Generic spec checkpoint job: byte parity with the direct path,
    stage skipping under resume, per-partition metrics."""
    from pfutil_spark.operators.sketch_agg import kmv_spec, sketch_agg
    from pfutil_spark.sources.checkpoint import ResumableSketchJob

    ckpt = str(tmp_path / "job3")
    spec = kmv_spec(256)
    job = ResumableSketchJob(spark, ckpt, spec, by=("grp",))
    elem = F.xxhash64("elem")
    out1 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), elem).collect()}
    assert job.stages_complete() == {"partial": True, "merged": True, "metrics": True}
    direct = {
        r["grp"]: bytes(r["sketch"])
        for r in sketch_agg(_df(spark), elem, spec, by=("grp",)).collect()
    }
    assert out1 == direct  # KMV merge is a set function: byte-identical

    m = job.metrics().collect()
    assert sum(r["n_partial_sketches"] for r in m) > 0
    assert {r["_partition_id"] for r in m} <= set(range(6))

    shutil.rmtree(job.merged_path)
    partial_mtime = os.path.getmtime(os.path.join(job.partial_path, "_SUCCESS"))
    out2 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), elem).collect()}
    assert out2 == out1
    assert os.path.getmtime(os.path.join(job.partial_path, "_SUCCESS")) == partial_mtime
    out3 = {r["grp"]: bytes(r["sketch"]) for r in job.run(_df(spark), elem).collect()}
    assert out3 == out1


def test_sketch_job_refuses_resume_with_changed_params(spark, tmp_path):
    """Checkpointed partials bake in the element/weight expressions;
    resuming the same directory with different ones must raise, not
    silently merge stale partials (self-review r4 finding)."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from pfutil_spark.operators.sketch_agg import spacesaving_spec
    from pfutil_spark.sources.checkpoint import ResumableSketchJob

    df = spark.createDataFrame(
        pd.DataFrame({"val": ["a", "b", "a"], "w": [1, 2, 3]})
    )
    job = ResumableSketchJob(spark, str(tmp_path / "ck"), spacesaving_spec(8))
    job.run(df, F.col("val").cast("string"))
    # same params: resume fine
    job.run(df, F.col("val").cast("string"))
    # adding a weight (or changing the element) must refuse
    with pytest.raises(ValueError, match="different parameters"):
        job.run(df, F.col("val").cast("string"), weight=F.col("w").cast("long"))
    with pytest.raises(ValueError, match="different parameters"):
        job.run(df, F.col("w").cast("string"))


def test_sketch_multi_job_resumes_and_guards_params(spark, tmp_path):
    """ResumableSketchMultiJob: run -> byte-stable resume (KMV/CMS are
    byte-deterministic) -> params guard on changed metrics."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from pfutil_spark.operators.sketch_agg import (
        _null_safe_hash,
        cms_spec,
        kmv_spec,
    )
    from pfutil_spark.sources.checkpoint import ResumableSketchMultiJob

    pdf = pd.DataFrame({
        "grp": ["a"] * 40 + ["b"] * 40,
        "u": [str(i % 13) for i in range(80)],
        "w": list(range(1, 81)),
    })
    df = (
        spark.createDataFrame(pdf)
        .withColumn("hu", _null_safe_hash("u"))
        .repartition(3)
    )
    metrics = {
        "u_kmv": (F.col("hu"), kmv_spec(32)),
        "u_cms_w": (F.col("hu"), cms_spec(3, 128), F.col("w").cast("long")),
    }
    job = ResumableSketchMultiJob(spark, str(tmp_path / "multi"), metrics, by=("grp",))
    out1 = sorted(
        (r["grp"], bytes(r["u_kmv"]), bytes(r["u_cms_w"])) for r in job.run(df).collect()
    )
    assert len(out1) == 2
    # resume returns the checkpointed result byte-identically
    out2 = sorted(
        (r["grp"], bytes(r["u_kmv"]), bytes(r["u_cms_w"])) for r in job.run(df).collect()
    )
    assert out1 == out2
    # lineage metrics exist per partition
    m = job.job_metrics().collect()
    assert len(m) >= 1 and all(r["u_kmv_bytes"] > 0 for r in m)
    # changed metrics on the same dir refuse
    job2 = ResumableSketchMultiJob(
        spark, str(tmp_path / "multi"),
        {"u_kmv": (F.col("hu"), kmv_spec(64))}, by=("grp",),
    )
    with pytest.raises(ValueError, match="different parameters"):
        job2.run(df)
