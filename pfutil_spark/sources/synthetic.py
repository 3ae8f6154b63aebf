"""Deterministic synthetic "sourcecode" table — the north input shape
(BASELINE.json:input_hint): (repo, path, commit, lang, content).

Generated entirely with Spark built-in expressions over ``spark.range``:
distributed, codegen'd, seedless-deterministic (same rows for a given
n_rows at ANY partitioning/parallelism), and never materialized on the
driver — the generator itself scales to 10^12 rows.

Shape per FIXTURES.md §1: ~Zipf-skewed lang (JavaScript ~30%, …) to
exercise salted-merge skew handling; content values duplicated ~5x so
distinct-content << row-count; commit is high-cardinality 40-hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 100 slots -> Zipf-ish categorical over 17 languages (percent = weight)
_LANG_WEIGHTS = [
    ("JavaScript", 30),
    ("Python", 20),
    ("Java", 12),
    ("C", 8),
    ("C++", 6),
    ("Go", 5),
    ("TypeScript", 4),
    ("Ruby", 3),
    ("PHP", 3),
    ("C#", 2),
    ("Swift", 1),
    ("Kotlin", 1),
    ("Rust", 1),
    ("Scala", 1),
    ("Perl", 1),
    ("Haskell", 1),
    ("Lua", 1),
]
_LANG_SLOTS: list[str] = []
for _lang, _w in _LANG_WEIGHTS:
    _LANG_SLOTS.extend([_lang] * _w)
assert len(_LANG_SLOTS) == 100


def sourcecode_table(
    spark: SparkSession,
    n_rows: int,
    dup_factor: int = 5,
    partitions: int | None = None,
) -> DataFrame:
    """(repo, path, commit, lang, content) with ``n_rows`` rows;
    ``distinct content ~= n_rows / dup_factor``."""
    rng = spark.range(0, n_rows, numPartitions=partitions)
    # mix the id so lang/content/repo patterns aren't trivially aligned
    mixed = F.abs(F.xxhash64(F.col("id")))
    cid = (F.col("id") / F.lit(dup_factor)).cast("long")
    lang_arr = F.array(*[F.lit(x) for x in _LANG_SLOTS])
    # ~264 chars of deterministic pseudo-source per row, one md5 call
    content = F.repeat(
        F.concat(F.md5(F.concat(F.lit("content-"), cid.cast("string"))), F.lit("\n")),
        8,
    )
    return rng.select(
        F.concat(
            F.lit("org"), F.pmod(mixed, F.lit(97)).cast("string"),
            F.lit("/repo"), F.pmod(mixed, F.lit(1013)).cast("string"),
        ).alias("repo"),
        F.concat(
            F.lit("src/d"), F.pmod(F.col("id"), F.lit(7)).cast("string"),
            F.lit("/f"), F.pmod(F.col("id"), F.lit(13)).cast("string"),
            F.lit("/file_"), F.pmod(F.col("id"), F.lit(100000)).cast("string"),
            F.lit(".x"),
        ).alias("path"),
        F.substring(
            F.sha2(F.concat(F.lit("commit-"), F.col("id").cast("string")), 256), 1, 40
        ).alias("commit"),
        F.element_at(lang_arr, (F.pmod(mixed, F.lit(100)) + F.lit(1)).cast("int")).alias("lang"),
        content.alias("content"),
    )
