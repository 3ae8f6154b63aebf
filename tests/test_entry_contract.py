"""Simulates the driver's correctness gate: every queries() entry runs at
sf0.01; those with an oracle_sql() entry must match DuckDB exactly
(row count, column names, order-insensitive values)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 6) if math.isfinite(v) else str(v)
    return v


def _rowset(rows):
    # sort by a stringified key (the driver's own ordering — it sorts
    # stringified rows): tuples containing NULLs are not '<'-comparable
    # in Python, and any deterministic key is fine for multiset equality
    norm = [tuple(_norm(v) for v in r) for r in rows]
    # type-tagged so distinct values can't share a key (None vs 'None',
    # 1 vs '1' — a collision would let engine-dependent input order leak
    # through sorted()'s stability and falsely fail equal multisets)
    return sorted(norm, key=lambda r: tuple((type(x).__name__, str(x)) for x in r))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    langs = {r["lang"] for r in rows}
    assert "*" in langs  # global PFMERGE row present
    for r in rows:
        assert r["estimate"] >= 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_against_oracle(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_rows = df.collect()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 1  # rows-only check
        return
    con = _duck()
    duck = con.execute(oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    assert sorted(df.columns) == sorted(duck_cols), (df.columns, duck_cols)
    # align column order by name before comparing values
    perm = [df.columns.index(c) for c in sorted(df.columns)]
    dperm = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = _rowset([[r[i] for i in perm] for r in spark_rows])
    d = _rowset([[r[i] for i in dperm] for r in duck_rows])
    assert len(s) == len(d), (len(s), len(d))
    assert s == d

def test_weighted_kll_bound_degenerate_langs(spark, tmp_path):
    """Langs whose docs are all null-text (absent from the sketch
    output) or all zero-token (zero weight mass -> NULL rank) must
    still emit their oracle row with within_bound TRUE (vacuously: no
    token mass to rank) — a fixture regeneration can't break parity."""
    # 'cc' needs a near-continuous length CDF for the 4% rank check to
    # be meaningful (single-token docs of 100 distinct lengths)
    rows_in = [("aa", None), ("aa", None), ("bb", ""), ("bb", "   ")]
    rows_in += [("cc", "x" * i) for i in range(1, 101)]
    docs = spark.createDataFrame(rows_in, "lang string, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    df = entry_mod.queries()["weighted_kll_bound"](spark, str(tmp_path))
    rows = {r["lang"]: r for r in df.collect()}
    assert set(rows) == {"aa", "bb", "cc"}
    assert all(r["within_bound"] for r in rows.values())
    assert rows["aa"]["total_tokens"] is None  # all-null sum (oracle: NULL)
    assert rows["bb"]["total_tokens"] == 0
    assert rows["cc"]["total_tokens"] == 100
