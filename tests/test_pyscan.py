"""Round-6: python-native parquet scan fast path (operators/pyscan.py).

The fast path replaces the JVM scan -> row -> Arrow -> Python boundary
with a worker-side pyarrow columnar read when the partial's input is
exactly a projection over a small local parquet relation. These gates
pin (a) result equality against the JVM path for every supported shape,
(b) byte equality of MERGED sketches (canonical-encoder invariant), and
(c) that every unsupported plan feature falls back rather than engaging.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pfutil_spark.operators import pf_count_distinct, pf_partial, pf_sketch
from pfutil_spark.operators import pyscan
from pfutil_spark.operators.multi import pf_count_distinct_multi

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


def _with_pyscan(spark, enabled: bool):
    spark.conf.set("pfutil.pyscan.enabled", "true" if enabled else "false")


@pytest.fixture(autouse=True)
def _reset_conf(spark):
    yield
    spark.conf.unset("pfutil.pyscan.enabled")
    spark.conf.unset("pfutil.pyscan.maxInputBytes")


def _li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "ok", F.col("l_orderkey").cast("string")
    )


def test_pyscan_engages_on_cast_projection(spark):
    df = _li(spark)
    pruned = df.select("l_returnflag", "ok")
    plan = pyscan.try_parquet_pyscan(pruned, ["l_returnflag", "ok"])
    assert plan is not None
    assert plan.columns == {
        "l_returnflag": ("l_returnflag", False),
        "ok": ("l_orderkey", True),
    }
    # pyscan reads ONLY the two needed parquet columns (the column-
    # pruning property, now enforced on the python side)
    assert sorted({src for src, _ in plan.columns.values()}) == [
        "l_orderkey",
        "l_returnflag",
    ]
    total = sum(ln for _, _, _, ln in plan.specs)
    assert total == spark.read.parquet(f"{SF}/lineitem.parquet").count()


def test_pyscan_results_match_jvm_scan(spark):
    for by, version in [((), 4), (("l_returnflag",), 4), (("l_returnflag",), 5)]:
        _with_pyscan(spark, False)
        old = _rows(pf_count_distinct(_li(spark), "ok", by=by, version=version))
        _with_pyscan(spark, True)
        new = _rows(pf_count_distinct(_li(spark), "ok", by=by, version=version))
        assert old == new, (by, version)


def test_pyscan_merged_sketch_bytes_identical(spark):
    _with_pyscan(spark, False)
    old = _rows(pf_sketch(_li(spark), "ok", by=("l_returnflag",)))
    _with_pyscan(spark, True)
    new = _rows(pf_sketch(_li(spark), "ok", by=("l_returnflag",)))
    assert old == new  # includes the sketch BYTES — canonical encoding


def test_pyscan_multi_results_match(spark):
    def q():
        ev = (
            spark.read.parquet(f"{SF}/events.parquet")
            .withColumn("uid", F.col("user_id").cast("string"))
            .withColumn("eid", F.col("event_id").cast("string"))
        )
        return pf_count_distinct_multi(ev, ["uid", "eid"], by=("event_type",))

    _with_pyscan(spark, False)
    old = _rows(q())
    _with_pyscan(spark, True)
    new = _rows(q())
    assert old == new


def test_pyscan_null_elements_and_keys(spark, tmp_path):
    p = str(tmp_path / "nulls.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(["a", None, "a", "b", None, "b", "a", None]),
                "v": pa.array([1, 2, None, 4, 5, None, 7, 8], type=pa.int64()),
            }
        ),
        p,
    )
    df = spark.read.parquet(p).withColumn("vs", F.col("v").cast("string"))
    _with_pyscan(spark, True)
    assert pyscan.try_parquet_pyscan(df.select("k", "vs"), ["k", "vs"]) is not None
    new = _rows(pf_count_distinct(df, "vs", by=("k",)))
    _with_pyscan(spark, False)
    old = _rows(pf_count_distinct(df, "vs", by=("k",)))
    assert old == new


def test_pyscan_empty_and_multifile(spark, tmp_path):
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"v": pa.array([], type=pa.int64())}), empty)
    df = spark.read.parquet(empty).withColumn("vs", F.col("v").cast("string"))
    _with_pyscan(spark, True)
    assert _rows(pf_count_distinct(df, "vs", by=())) == [(0,)]

    multi = str(tmp_path / "multi")
    os.makedirs(multi)
    for i in range(3):
        pq.write_table(
            pa.table({"v": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}),
            f"{multi}/part-{i}.parquet",
        )
    df = spark.read.parquet(multi).withColumn("vs", F.col("v").cast("string"))
    plan = pyscan.try_parquet_pyscan(df.select("vs"), ["vs"])
    assert plan is not None and len(plan.files) == 3
    _with_pyscan(spark, False)
    old = _rows(pf_count_distinct(df, "vs", by=()))
    _with_pyscan(spark, True)
    assert _rows(pf_count_distinct(df, "vs", by=())) == old


def test_pyscan_falls_back_on_unsupported_plans(spark):
    li = _li(spark)
    # filter in the plan
    assert (
        pyscan.try_parquet_pyscan(
            li.filter(F.col("l_orderkey") > 5).select("ok"), ["ok"]
        )
        is None
    )
    # non-integral cast (double -> string rendering is engine-specific)
    d = li.withColumn("qs", F.col("l_quantity").cast("string"))
    assert pyscan.try_parquet_pyscan(d.select("qs"), ["qs"]) is None
    # computed expression
    e = li.withColumn("h", F.sha2(F.col("ok"), 256))
    assert pyscan.try_parquet_pyscan(e.select("h"), ["h"]) is None
    # size gate
    spark.conf.set("pfutil.pyscan.maxInputBytes", "1")
    assert pyscan.try_parquet_pyscan(li.select("ok"), ["ok"]) is None
    spark.conf.unset("pfutil.pyscan.maxInputBytes")
    # disabled by conf
    _with_pyscan(spark, False)
    assert pyscan.try_parquet_pyscan(li.select("ok"), ["ok"]) is None


def test_pyscan_falls_back_on_schema_evolution(spark, tmp_path):
    """A directory where one file predates a column (the JVM scan
    null-fills it) must use the JVM scan — the pyarrow read would drop
    the missing column and KeyError on the worker."""
    d = str(tmp_path / "evolved")
    os.makedirs(d)
    pq.write_table(
        pa.table({"v": pa.array([1, 2], type=pa.int64())}), f"{d}/old.parquet"
    )
    pq.write_table(
        pa.table(
            {"v": pa.array([3, 4], type=pa.int64()), "k": pa.array(["a", "b"])}
        ),
        f"{d}/new.parquet",
    )
    df = (
        spark.read.schema("v long, k string")
        .parquet(d)
        .withColumn("vs", F.col("v").cast("string"))
    )
    assert pyscan.try_parquet_pyscan(df.select("k", "vs"), ["k", "vs"]) is None
    # and the end-to-end query (JVM fallback) still answers
    got = _rows(pf_count_distinct(df, "vs", by=("k",)))
    assert len(got) == 3  # k in {a, b, NULL}


def test_pyscan_lineage_uses_jvm_scan(spark):
    part = pf_partial(_li(spark), "ok", by=(), lineage=True)
    assert "_partition_id" in part.columns
    # lineage partials must carry REAL scan partition ids — plan keeps
    # the parquet relation (no Range fast-path source)
    from tests.conftest import plan_of

    assert "Range" not in plan_of(part, "simple")


def test_fused_count_matches_two_stage(spark):
    """pf_count_distinct's fused merge+count == explicit merge then
    pf_count_col (the r5 two-stage structure)."""
    from pfutil_spark.operators import pf_count_col, pf_merge
    from pfutil_spark.operators.hll_agg import SKETCH_COL

    li = _li(spark)
    fused = _rows(pf_count_distinct(li, "ok", by=("l_returnflag",)))
    partials = pf_partial(_li(spark), "ok", by=("l_returnflag",))
    merged = pf_merge(partials, ["l_returnflag"])
    two_stage = _rows(
        merged.select("l_returnflag", pf_count_col(SKETCH_COL, 4).alias("estimate"))
    )
    assert fused == two_stage
