"""PII detection and redaction — pure-JVM regex columns.

Standard pre-release hygiene for a training corpus: find and mask
emails, IP addresses, phone-shaped numbers, and long hex tokens
(API-key material). Everything here is built-in ``regexp_count`` /
``regexp_replace`` expressions — whole-stage codegen, no Python in the
hot path, so a scan-scale redaction pass at 100 TB is a map-only job
with filters and column pruning intact.

Pattern dialect: the subset common to Java's regex (Spark) and RE2
(DuckDB/Trino) — explicit character classes, greedy counted repeats,
``\\b`` word boundaries; NO backreferences or lookaround (RE2 lacks
them) and no ``\\d``-style shorthands (locale surprises). On this
subset both engines produce identical match sets, which the
``pii_scan_report`` oracle grades EXACTLY (counts and redacted
lengths), and a hypothesis-style differential test re-checks.

Redaction applies patterns in a FIXED order (email, ipv4, phone, hex)
— replacement text can't retrigger earlier patterns, and any mirror
must use the same order for byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies top to bottom; keep the SQL mirror in sync
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b", "<PHONE>"),
    ("hex_secret", r"\b[0-9a-f]{32,}\b", "<SECRET>"),
)


def _text_col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_count_col(text: str | Column, kind: str) -> Column:
    """Match count of one PII kind (``email``/``ipv4``/``phone``/
    ``hex_secret``) in ``text``. NULL text yields NULL."""
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return F.regexp_count(_text_col(text), F.lit(pat))


def pii_redact_col(text: str | Column) -> Column:
    """``text`` with every PII match masked, patterns applied in the
    canonical order. NULL stays NULL."""
    c = _text_col(text)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_scan(df: DataFrame, text: str = "text") -> DataFrame:
    """Adds ``n_pii_<kind>`` counts per row, ``n_pii_total``, and
    ``chars_redacted`` (characters removed by masking, NET of the
    placeholder text — it can be 0 or negative for a row that DOES
    contain PII when the placeholder is as long as the match, so the
    cleanliness predicate is ``n_pii_total == 0``, never
    ``chars_redacted == 0``). A map-only plan: compose with any
    filter/write without extra passes."""
    counts = {k: pii_count_col(text, k) for k, _, _ in PII_PATTERNS}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        "*",
        *[c.alias(f"n_pii_{k}") for k, c in counts.items()],
        total.alias("n_pii_total"),
        (F.length(_text_col(text)) - F.length(pii_redact_col(text))).alias(
            "chars_redacted"
        ),
    )


def sql_pii_count_expr(text_sql: str, kind: str) -> str:
    """DuckDB mirror of :func:`pii_count_col` (RE2 executes the same
    pattern subset identically)."""
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return f"len(regexp_extract_all({text_sql}, '{pat}'))"


def sql_pii_redact_expr(text_sql: str) -> str:
    """DuckDB mirror of :func:`pii_redact_col` — same patterns, same
    order, global replacement."""
    e = text_sql
    for _, pat, repl in PII_PATTERNS:
        e = f"regexp_replace({e}, '{pat}', '{repl}', 'g')"
    return e
