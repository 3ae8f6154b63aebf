"""Unicode normalization (functions/unicode.py): UAX#15 semantics,
NULL handling, whitespace-cleanup engine parity vs DuckDB's RE2, and
the contract query's structural deltas."""

import duckdb
import pytest

from pfutil_spark.functions.unicode import (
    clean_whitespace_col,
    normalize_col,
    unicode_stats,
)

DECOMPOSED = "Cafe\u0301"  # e + COMBINING ACUTE (5 code points)
PRECOMPOSED = "Caf\u00e9"  # precomposed e-acute (4 code points)


def _vals(spark, col, rows):
    df = spark.createDataFrame([(r,) for r in rows], "t string")
    return [r[0] for r in df.select(col.alias("v")).collect()]


class TestNormalizeCol:
    def test_nfc_composes(self, spark):
        out = _vals(spark, normalize_col("t"), [DECOMPOSED, PRECOMPOSED, "plain"])
        assert out == [PRECOMPOSED, PRECOMPOSED, "plain"]

    def test_nfkc_folds_compat(self, spark):
        # ligature fi and full-width A are NFKC-only folds (NFC keeps them)
        rows = ["\ufb01le", "\uff21BC"]
        nfkc = _vals(spark, normalize_col("t", "NFKC"), rows)
        nfc = _vals(spark, normalize_col("t", "NFC"), rows)
        assert nfkc == ["file", "ABC"]
        assert nfc == rows

    def test_nfd_decomposes(self, spark):
        assert _vals(spark, normalize_col("t", "NFD"), [PRECOMPOSED]) == [DECOMPOSED]

    def test_null_and_empty(self, spark):
        assert _vals(spark, normalize_col("t"), [None, ""]) == [None, ""]

    def test_bad_form_raises(self):
        with pytest.raises(ValueError, match="form must be one of"):
            normalize_col("t", "NFX")

    def test_matches_duckdb_nfc(self, spark):
        rows = [DECOMPOSED, PRECOMPOSED, "å ring", "no accents", "ñ"]
        got = _vals(spark, normalize_col("t"), rows)
        want = [
            duckdb.sql("select nfc_normalize(?)", params=[r]).fetchone()[0]
            for r in rows
        ]
        assert got == want


class TestCleanWhitespace:
    ROWS = [
        "  a\t\tb\nc  ",
        "a\x0bb\x0cc",  # vertical tab + form feed (the RE2 \s trap chars)
        "one two",
        "\t\n",
        "",
        None,
    ]

    def test_semantics(self, spark):
        got = _vals(spark, clean_whitespace_col("t"), self.ROWS)
        assert got == ["a b c", "a b c", "one two", "", "", None]

    def test_duckdb_mirror_parity(self, spark):
        got = _vals(spark, clean_whitespace_col("t"), self.ROWS)
        sql = (
            "select trim(regexp_replace(t,"
            " '[ \\t\\n\\r\\x{000B}\\x{000C}]+', ' ', 'g')) from frame"
        )
        con = duckdb.connect()
        con.execute("create table frame(t varchar)")
        con.executemany("insert into frame values (?)", [(r,) for r in self.ROWS])
        want = [r[0] for r in con.sql(sql).fetchall()]
        assert got == want


class TestUnicodeStats:
    def test_counts_and_null_row(self, spark):
        df = spark.createDataFrame(
            [("d1", DECOMPOSED + "  x"), ("d2", "ok"), ("d3", None)],
            "doc_id string, text string",
        )
        rows = {r["doc_id"]: r for r in unicode_stats(df).collect()}
        r1 = rows["d1"]
        assert (r1["n_chars"], r1["n_chars_norm"], r1["n_chars_clean"]) == (8, 7, 7)
        assert r1["norm_changed"] is True
        r2 = rows["d2"]
        assert (r2["n_chars"], r2["n_chars_norm"]) == (2, 2)
        assert r2["norm_changed"] is False
        r3 = rows["d3"]
        assert r3["n_chars"] is None and r3["norm_changed"] is None

    def test_extra_cols_pass_through(self, spark):
        df = spark.createDataFrame(
            [("d1", "en", "x")], "doc_id string, lang string, text string"
        )
        out = unicode_stats(df, extra_cols=("lang",))
        assert out.columns[:2] == ["doc_id", "lang"]
        assert out.first()["lang"] == "en"


class TestContractQuery:
    def test_structural_deltas(self, spark, sf_dir):
        """Every doc gains the decomposed suffix, so per-lang:
        nfc_chars == raw_chars - docs (one composition per doc) and
        clean_chars <= raw_chars - docs (double space collapses, plus
        any whitespace runs in the raw text)."""
        import __spark_entry__ as E

        df = E.queries()["unicode_normalization_stats"](spark, sf_dir)
        for r in df.collect():
            assert r["nfc_chars"] == r["raw_chars"] - r["docs"]
            assert r["clean_chars"] <= r["raw_chars"] - r["docs"]
            assert r["docs_nfc_changed"] == 0  # synthetic corpus is NFC already
