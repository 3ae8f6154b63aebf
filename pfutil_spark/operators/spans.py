"""Exact repeated-substring span detection — the character-level
"dedup the passages, not just the documents" operator from
"Deduplicating Training Data Makes Language Models Better"
(Lee et al. 2022, arXiv:2107.06499 — public paper). The suffix-array
formulation there is single-machine; the Spark-native shape is a
sliding char-k-gram stream: a position is DUPLICATED iff the k-gram
starting there occurs at least ``min_count`` times corpus-wide
(within- and cross-document occurrences both count), and overlapping/
adjacent duplicated windows merge into maximal spans. Every span of
length >= k that occurs >= min_count times is found exactly (any such
span makes all its k-window positions duplicated); nothing shorter
than k is ever flagged.

Complements the word-level suites: doc_boilerplate (cross-doc n-gram
keys), dedup_lines_within_doc (exact line repeats), MinHash/SimHash
(whole-doc near-dup). This is the passage-level exact signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _covered_positions(
    df: DataFrame, text: str, id_col: str, k: int, min_count: int,
    on_hash: bool,
) -> DataFrame:
    """(id_col, pos) rows whose k-gram occurs >= min_count times."""
    t = F.col(text)
    n = F.length(t)
    # docs shorter than k contribute nothing (empty array explodes away);
    # NULL text => n NULL => when() false => empty array too
    pos_arr = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = df.select(
        F.col(id_col), F.explode(pos_arr).alias("pos"), t.alias("__pf_t")
    ).select(
        id_col,
        "pos",
        F.col("__pf_t").substr(F.col("pos") + 1, F.lit(k)).alias("gram"),
    )
    key = F.xxhash64("gram") if on_hash else F.col("gram")
    counted = grams.withColumn(
        "__pf_cnt", F.count(F.lit(1)).over(Window.partitionBy(key))
    )
    return counted.filter(F.col("__pf_cnt") >= min_count).select(id_col, "pos")


def repeated_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_count: int = 2,
    on_hash: bool = False,
) -> DataFrame:
    """Maximal repeated character spans per document:
    ``(id_col, span_start, span_end, span_len, n_windows)`` with
    0-based ``[span_start, span_end)`` character offsets. Two
    duplicated window positions merge into one span when they are at
    most ``k`` apart (their k-char windows overlap or abut), so spans
    are maximal and pairwise DISJOINT within a document.

    ``on_hash=False`` (default) keys occurrence counting by the raw
    k-gram string — EXACT, and what the DuckDB oracle mirrors.
    ``on_hash=True`` keys by ``xxhash64(gram)`` — the 100-TB path: the
    shuffle carries 8-byte keys instead of k-char strings (k x corpus
    bytes otherwise); an (astronomically unlikely) collision can only
    ADD a false duplicated position, never lose a true one.

    Plan: one corpus scan explodes ``n_chars - k + 1`` windows per doc
    (the stream is k x corpus characters — linear, never pairwise);
    occurrence counting is ONE count-over-Window partitioned by the
    gram key (one shuffle; hash keys recommended at scale); island
    merging is a lag + running-sum window per document over the
    surviving (duplicated) positions only — integer arithmetic end to
    end, zero Python, EXACT cross-engine.
    """
    if k < 2:
        raise ValueError(f"k={k}: must be >= 2")
    if min_count < 2:
        raise ValueError(f"min_count={min_count}: must be >= 2")
    cov = _covered_positions(df, text, id_col, k, min_count, on_hash)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w_doc) > k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = cov.withColumn("__pf_brk", brk).withColumn(
        "__pf_island",
        F.sum("__pf_brk").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islands.groupBy(id_col, "__pf_island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + k).cast("long").alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    )
    return spans.select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_len"),
        "n_windows",
    )


def span_coverage(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_count: int = 2,
    on_hash: bool = False,
) -> DataFrame:
    """Per-document duplicated-character coverage:
    ``(id_col, n_chars, n_spans, dup_chars, dup_frac)`` — the
    "how much of this document is copy-pasted corpus material?"
    quality gate built on :func:`repeated_spans`. Spans are disjoint
    by construction, so ``dup_chars`` is a plain sum; ``dup_frac`` is
    ONE bigint/bigint IEEE division over NULLIF(n_chars, 0) — exact
    cross-engine, NULL for empty/NULL text. Every input document
    appears (zero-span docs with ``n_spans = 0``): the clean rows are
    the keep-list, dropping them would invert the filter.

    Plan: the spans pipeline (see :func:`repeated_spans`) plus one
    per-doc aggregate and a join back to the documents frame on
    ``id_col`` — the join is doc-keyed (near-unique), and the
    documents side carries only (id, length).
    """
    spans = repeated_spans(df, text, id_col, k, min_count, on_hash)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("dup_chars"),
    )
    base = df.select(
        F.col(id_col),
        F.length(F.coalesce(F.col(text), F.lit(""))).cast("long").alias(
            "n_chars_t"
        ),
    )
    joined = base.join(per_doc, [id_col], "left")
    return joined.select(
        id_col,
        F.col("n_chars_t").alias("n_chars"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        (
            F.coalesce("dup_chars", F.lit(0))
            / F.nullif(F.col("n_chars_t"), F.lit(0))
        ).alias("dup_frac"),
    )
