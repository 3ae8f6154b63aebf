"""End-to-end corpus curation: the standard pretraining-data pipeline
composed from this package's own operators — exact dedup, token-count /
token-length quality gates, and the per-source document cap — in the
order production pipelines run them (dedup BEFORE quality so duplicate
content can't vote itself through the funnel; cap LAST so the mix
decision sees only surviving documents).

No reference-repo counterpart (the reference is the sketch primitive
layer); this is the composition surface SURVEY.md §2.3 assigns
Spark-side. Every stage is an existing audited operator:

* :func:`pfutil_spark.operators.dedup.exact_dedup` — one shuffle on the
  content hash, smallest-id-wins determinism.
* token gates — map-only whole-stage codegen
  (:func:`pfutil_spark.functions.text.token_count_col`).
* :func:`pfutil_spark.operators.sampling.cap_per_group` — one rank
  window per source, deterministic sha-draw selection, referentially
  consistent with same-seed ``hash_sample`` draws.

Plan shape end to end: scan -> map-only quality columns -> Exchange on
content_sha (dedup) -> Exchange on source (cap window) -> manifest.
Two shuffles total, both on keys the stages need anyway; nothing is
per-row Python; filters run BEFORE both shuffles wherever legality
allows (the quality gate is applied pre-dedup-join on the probe side by
Catalyst since it references only scan columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pfutil_spark.functions.text import token_count_col
from pfutil_spark.operators.dedup import exact_dedup
from pfutil_spark.operators.sampling import cap_per_group

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 1,
    max_tokens: int | None = None,
    min_avg_token_len: float | None = None,
    max_avg_token_len: float | None = None,
    cap: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """The curated corpus: exact-deduplicated, quality-gated,
    per-source-capped rows of ``df`` with an ``n_tokens`` manifest
    column appended. Token counts are whitespace tokens (0 for
    blank/NULL text); the average-token-length gates divide characters
    by tokens and never see zero-token rows (those fail ``min_tokens``
    first — ``min_tokens >= 1`` is enforced for that reason)."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens={min_tokens}: must be >= 1")
    if max_tokens is not None and max_tokens < min_tokens:
        raise ValueError(
            f"max_tokens={max_tokens} < min_tokens={min_tokens}"
        )
    deduped = exact_dedup(df, text, id_col)
    n_tok = token_count_col(text)
    staged = deduped.withColumn("n_tokens", n_tok)
    cond = F.col("n_tokens") >= F.lit(min_tokens)
    if max_tokens is not None:
        cond = cond & (F.col("n_tokens") <= F.lit(max_tokens))
    if min_avg_token_len is not None or max_avg_token_len is not None:
        # chars-per-token over the trimmed text. try_divide, not `/`:
        # SQL conjunctions do NOT short-circuit (Catalyst may reorder
        # predicates), so a zero-token row can reach this expression
        # before the min_tokens conjunct prunes it — under ANSI mode
        # (default in Spark 4) a plain division would raise
        # DIVIDE_BY_ZERO; try_divide yields NULL and the NULL
        # comparison filters the row, same outcome as the token gate
        avg = F.try_divide(
            F.length(F.trim(F.coalesce(F.col(text), F.lit("")))),
            F.col("n_tokens"),
        )
        if min_avg_token_len is not None:
            cond = cond & (avg >= F.lit(float(min_avg_token_len)))
        if max_avg_token_len is not None:
            cond = cond & (avg <= F.lit(float(max_avg_token_len)))
    gated = staged.filter(cond)
    if cap is not None:
        gated = cap_per_group(gated, id_col, source_col, cap, seed=seed)
    return gated
