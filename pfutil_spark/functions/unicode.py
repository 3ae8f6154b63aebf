"""Unicode text normalization for training-data pipelines: NFC/NFKC
canonical forms plus engine-stable whitespace cleanup.

Spark has no built-in UAX#15 normalizer, so :func:`normalize_col` is
the sanctioned Python slow path — an Arrow-batched ``pandas_udf`` over
:mod:`unicodedata` (never a row-at-a-time ``@udf``; the per-element
``str`` work is inherent to normalization, not harness overhead). At
100 TB this runs map-only fused into the scan: no shuffle, no state,
and the UDF cost is one Arrow round-trip per batch. Everything else
here is pure JVM codegen.

Cross-engine notes (the oracle contract):
- DuckDB's ``nfc_normalize()`` implements the same UAX#15 NFC as
  Python's ``unicodedata`` — normalization results for assigned code
  points are stability-guaranteed by the Unicode standard, so the two
  libraries agree by construction.
- Both Spark's and DuckDB's ``length()`` count CODE POINTS (NOTES.md
  r5: the UTF-16 myth), so post-normalization lengths compare exactly.
- :func:`clean_whitespace_col` spells the Java-``\\s``-equivalent class
  ``[ \\t\\n\\r\\x0B\\x0C]`` explicitly (RE2's ``\\s`` has no vertical
  tab — NOTES.md r5 trap); the DuckDB mirror needs the ``'g'`` flag.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# Java regex class equivalent to \s, spelled explicitly so RE2 (DuckDB)
# and Java (Spark) agree: space, tab, LF, CR, VT, FF.
_WS_CLASS = "[ \\t\\n\\r\\x0B\\x0C]"
# the same class in DuckDB/RE2 spelling (for oracle SQL strings)
SQL_WS_CLASS = "[ \\t\\n\\r\\x{000B}\\x{000C}]"


def normalize_col(text: str | Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column to ``form`` (NFC/NFKC/NFD/
    NFKD). NULL stays NULL. Arrow-batched pandas UDF (no JVM
    equivalent exists); keep it map-side — normalize once at ingest,
    not per downstream query."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(text) if isinstance(text, str) else text

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm(c)


def clean_whitespace_col(text: str | Column) -> Column:
    """Collapse every run of whitespace (space/tab/LF/CR/VT/FF) to one
    space and trim the ends — pure JVM codegen (``regexp_replace`` +
    ``trim``). NULL stays NULL. DuckDB mirror:
    ``trim(regexp_replace(x, '[ \\t\\n\\r\\x{000B}\\x{000C}]+', ' ',
    'g'))`` (Spark replaces all matches by default; DuckDB needs
    ``'g'``; both ``trim``s strip ASCII spaces, which is all that can
    remain at the ends after the collapse)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, _WS_CLASS + "+", " "))


def unicode_stats(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
    form: str = "NFC",
) -> DataFrame:
    """Per-document normalization report: ``(id_col, *extra_cols,
    n_chars, n_chars_norm, n_chars_clean, norm_changed)`` — code-point
    counts before/after UAX#15 normalization and whitespace cleanup,
    plus whether normalization changed the value at all (the
    "is my corpus already NFC?" ingest monitor). NULL text yields NULL
    counts and NULL ``norm_changed`` (absence is signal, not 0). All
    counts are integers -> EXACT cross-engine."""
    c = F.col(text)
    norm = normalize_col(c, form)
    clean = clean_whitespace_col(c)
    return df.select(
        id_col,
        *extra_cols,
        F.length(c).cast("long").alias("n_chars"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.length(clean).cast("long").alias("n_chars_clean"),
        (norm != c).alias("norm_changed"),
    )
