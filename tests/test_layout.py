"""morton_key_col / morton_sql_expr: bit-exact vs a python reference
interleave, Spark==DuckDB mirror equality, locality sanity."""

import duckdb
import pytest

from pyspark.sql import functions as F


def _ref_morton(a: int, b: int, bits: int = 16) -> int:
    m = (1 << bits) - 1
    a, b = a & m, b & m
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


FIXTURE = [
    (0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535), (65536, 2),  # wrap
    (12345, 54321), (2**31 - 1, 7), (40000, 1),
]


def test_morton_matches_reference(spark):
    from pfutil_spark.functions.layout import morton_key_col

    df = spark.createDataFrame(FIXTURE, "a long, b long")
    for bits in (4, 16, 31):
        got = (
            df.select("a", "b", morton_key_col("a", "b", bits).alias("k"))
            .collect()
        )
        for r in got:
            assert r["k"] == _ref_morton(r["a"], r["b"], bits), (r, bits)


def test_morton_sql_mirror_bit_equality(spark):
    from pfutil_spark.functions.layout import morton_key_col, morton_sql_expr

    rows = [
        (a, b, _ref_morton(a, b, bits), bits)
        for (a, b) in FIXTURE
        for bits in (4, 16, 31)
    ]
    for a, b, expect, bits in rows:
        [(got,)] = duckdb.sql(
            f"SELECT {morton_sql_expr(str(a), str(b), bits)}"
        ).fetchall()
        assert got == expect, (a, b, bits)


def test_morton_null_and_validation(spark):
    from pfutil_spark.functions.layout import morton_key_col, morton_sql_expr

    df = spark.createDataFrame([(None, 1), (1, None)], "a long, b long")
    vals = [r["k"] for r in df.select(morton_key_col("a", "b").alias("k")).collect()]
    assert vals == [None, None]
    for bad in (0, 32, 2.0):
        with pytest.raises(ValueError):
            morton_key_col("a", "b", bad)
        with pytest.raises(ValueError):
            morton_sql_expr("a", "b", bad)


def test_morton_locality_property(spark):
    # sorting by the morton key co-locates a 2D tile: all 16 cells of a
    # 4x4 tile aligned at a multiple of 4 are CONTIGUOUS in key order
    keys = sorted(
        _ref_morton(x, y) for x in range(8, 12) for y in range(4, 8)
    )
    assert keys == list(range(keys[0], keys[0] + 16))


def test_morton_plan_no_python(spark, sf_dir):
    from pfutil_spark.functions.layout import morton_key_col

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = o.select(
        morton_key_col(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")),
        ).alias("k")
    )
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Python" not in plan, plan


# ---------------------------------------------------------------------------
# write_clustered: the layout writer the morton key feeds
# ---------------------------------------------------------------------------

def test_write_clustered_files_cover_disjoint_ranges(spark, tmp_path):
    from pfutil_spark.sources.io import write_clustered

    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 10007).alias("k"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by=["k"], num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == 5000
    # per-FILE key ranges are pairwise disjoint: every occurrence of a
    # key value lands in exactly one file (range partitioner property),
    # which is what makes min-max skipping selective
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(ranges) == 8
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo1 <= hi1 < lo2
    # and the data is unchanged — clustering is layout, not semantics
    got = sorted((r["k"], r["v"]) for r in back.collect())
    want = sorted((r["k"], r["v"]) for r in df.collect())
    assert got == want


def test_write_clustered_accepts_morton_expression(spark, tmp_path):
    from pfutil_spark.functions.layout import morton_key_col
    from pfutil_spark.sources.io import write_clustered

    df = spark.range(0, 2000).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7) % 64).alias("y"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "zordered")
    write_clustered(
        df, out, cluster_by=[morton_key_col("x", "y", bits=6)], num_files=4
    )
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # per-file MORTON ranges are disjoint even though neither x nor y
    # alone is sorted — the z-order property the layout buys
    z = morton_key_col("x", "y", bits=6).alias("z")
    ranges = (
        back.select("*", z)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(ranges) == 4
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo1 <= hi1 < lo2


def test_write_clustered_validation(spark, tmp_path):
    from pfutil_spark.sources.io import write_clustered

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="num_files"):
        write_clustered(df, str(tmp_path / "x"), ["k"], num_files=0)
    with pytest.raises(ValueError, match="cluster_by"):
        write_clustered(df, str(tmp_path / "x"), [], num_files=2)
    with pytest.raises(ValueError, match="unsupported format"):
        write_clustered(df, str(tmp_path / "x"), ["k"], 2, fmt="avro")
