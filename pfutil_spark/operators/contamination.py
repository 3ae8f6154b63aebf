"""Benchmark-contamination checks for training corpora: flag corpus
documents sharing any word n-gram with an evaluation/benchmark set, and
produce the decontaminated corpus — the standard n-gram-overlap
decontamination step of large-scale training-data pipelines (no
reference-repo counterpart; provided Spark-side like SURVEY.md §2.3).

Scale posture (the part that matters at 100 TB):

* Shingle generation is pure JVM (``split`` / ``sequence`` /
  ``transform`` / ``slice`` / ``array_join`` — whole-stage codegen, no
  Python), exploding to ~one row per word per document.
* Each side is projected to ``xxhash64(shingle)`` IMMEDIATELY after the
  explode (8-byte join keys instead of raw strings) and deduplicated
  per side before the join — the distinct is the shuffle, and it
  shuffles fixed-width longs.
* The overlap test is a ``left_semi`` equi-join. Benchmark sets are
  tiny next to a 100 TB corpus, so ``broadcast_eval=True`` turns the
  whole check into a map-only pass over the corpus (no corpus shuffle
  at all) — the intended production shape. AQE handles the non-broadcast
  case.
* 64-bit hash equality stands in for string equality: a false flag
  needs an xxhash64 collision between two distinct shingles that also
  co-occur across corpus/eval (~n^2/2^64; at 10^9 distinct shingles
  ~5e-2 expected FALSE FLAGS corpus-wide — flags, not misses: the
  conservative direction for decontamination). ``on_hash=False`` joins
  on the raw shingle string for exactness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SH = "__pf_shingle"


def word_shingles_col(text: str | Column, n: int) -> Column:
    """array<string> of all ``n``-word shingles (space-rejoined runs of
    ``n`` consecutive whitespace tokens) of ``text``; empty array when
    the document has fewer than ``n`` tokens. Pure JVM expression."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(c), r"\s+")
    # split('', '\s+') yields [''] — one phantom token. Without the
    # zero-token guard, n=1 would emit the shingle "" for every blank
    # document and any blank eval doc would flag ALL blank corpus docs.
    n_tokens = F.when(F.length(F.trim(c)) > 0, F.size(words)).otherwise(
        F.lit(0)
    )
    m = n_tokens - F.lit(n - 1)
    arr = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    # sequence(1, m) with m < 1 would count DOWN (Spark infers step -1)
    return F.when(m >= 1, arr).otherwise(F.array().cast("array<string>"))


def _shingle_keys(
    df: DataFrame, text: str, n: int, on_hash: bool, extra: list[str]
) -> DataFrame:
    sh = F.explode(word_shingles_col(text, n)).alias(_SH)
    out = df.select(*extra, sh)
    if on_hash:
        out = out.select(*extra, F.xxhash64(_SH).alias(_SH))
    return out


def contaminated_ids(
    corpus: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    on_hash: bool = True,
    broadcast_eval: bool = False,
) -> DataFrame:
    """Distinct ``id_col`` values of corpus documents sharing at least
    one ``n``-word shingle with ANY eval document. ``broadcast_eval``
    ships the (deduplicated, hashed) eval shingle set to every executor
    — the no-corpus-shuffle path for the usual tiny-benchmark case."""
    ev = _shingle_keys(eval_df, text, n, on_hash, []).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _shingle_keys(corpus, text, n, on_hash, [id_col])
    return tr.join(ev, _SH, "left_semi").select(id_col).distinct()


def shared_ngram_stats(
    corpus: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    on_hash: bool = True,
) -> DataFrame:
    """Per-document cross-corpus n-gram sharing (the repeated-substring
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL 2022, at word-shingle granularity): of each
    document's DISTINCT word ``n``-grams, how many also occur in at
    least one OTHER document. Output ``(id_col, n_ngrams, n_shared,
    shared_frac)`` — ``shared_frac`` is the boilerplate fraction
    (NULL when the document has fewer than ``n`` tokens); the division
    is emitted unrounded (single IEEE op, exact cross-engine).

    Scale posture: the deduplicated ``(doc, shingle-key)`` pair set is
    the one big shuffle (fixed-width longs when ``on_hash``); per-key
    document counts GROUP BY on the same key, and joining them back
    matches each pair to exactly one count row — output never exceeds
    the pair count, so hot boilerplate n-grams (stop-phrase shingles
    present in millions of documents at 100 TB) do not amplify. All
    aggregations are map-side combinable; nothing is per-row Python."""
    pairs = _shingle_keys(corpus, text, n, on_hash, [id_col]).distinct()
    cnt = pairs.groupBy(_SH).agg(F.count(F.lit(1)).alias("__nd"))
    return _per_doc_ngram_fraction(
        corpus,
        pairs.join(cnt, _SH),
        id_col,
        F.col("__nd") >= 2,
        "n_shared",
        "shared_frac",
    )


def _per_doc_ngram_fraction(
    corpus: DataFrame,
    flagged_pairs: DataFrame,
    id_col: str,
    flag: Column,
    count_col: str,
    frac_col: str,
) -> DataFrame:
    """Shared tail of :func:`shared_ngram_stats` and
    :func:`ngram_novelty_stats`: reduce one-row-per-distinct-(doc,
    n-gram) ``flagged_pairs`` to per-document (total, flagged,
    fraction) with the common conventions — map-side-combinable counts,
    every corpus document kept (0/0 counts), short/blank docs get a
    NULL fraction (``try_divide`` sees the pre-coalesce NULLs)."""
    per_doc = flagged_pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias(count_col),
    )
    return (
        corpus.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce(count_col, F.lit(0)).alias(count_col),
            F.try_divide(F.col(count_col), F.col("n_ngrams")).alias(
                frac_col
            ),
        )
    )


def ngram_novelty_stats(
    corpus: DataFrame,
    reference: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    on_hash: bool = True,
    broadcast_reference: bool = False,
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: of each
    probe document's DISTINCT word ``n``-grams, how many are absent
    from the reference's n-gram set — the incremental-crawl curation
    signal ("is this newly crawled document new content, or a remix of
    what we already have?"); the per-document inverse of
    :func:`contaminated_ids`' any-overlap boolean.

    Output ``(id_col, n_ngrams, n_novel, novelty_frac)`` — all-integer
    counts plus ONE IEEE division; documents with fewer than ``n``
    tokens survive with zero counts and a NULL fraction (the
    :func:`shared_ngram_stats` convention).

    Scale posture: both sides deduplicate BEFORE the join (the probe
    side to distinct ``(doc, key)`` pairs, the reference to its
    distinct key set — fixed-width longs when ``on_hash``); the
    novelty test is one left join on the key followed by a map-side
    combinable per-document count, so hot reference n-grams never
    amplify (each probe pair matches at most one reference row).
    ``broadcast_reference=True`` ships the deduplicated reference key
    set to every executor — the no-probe-shuffle path when the
    reference fits the broadcast limit. With ``on_hash`` a collision
    can only mark a genuinely novel n-gram as seen (novelty is
    UNDER-counted, the conservative direction for "what is new");
    ``on_hash=False`` joins raw strings for exactness."""
    ref = _shingle_keys(reference, text, n, on_hash, []).distinct()
    if broadcast_reference:
        ref = F.broadcast(ref)
    pairs = _shingle_keys(corpus, text, n, on_hash, [id_col]).distinct()
    j = pairs.join(ref.withColumn("__pf_seen", F.lit(1)), _SH, "left")
    return _per_doc_ngram_fraction(
        corpus,
        j,
        id_col,
        F.col("__pf_seen").isNull(),
        "n_novel",
        "novelty_frac",
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    on_hash: bool = True,
    broadcast_eval: bool = False,
) -> DataFrame:
    """The corpus minus contaminated documents (left_anti on the flagged
    id set — all columns preserved)."""
    flagged = contaminated_ids(
        corpus, eval_df, text, id_col, n, on_hash, broadcast_eval
    )
    return corpus.join(flagged, id_col, "left_anti")


def _literal_regex(delim: str) -> str:
    """Java-regex literal quoting (\\Q...\\E) for a delimiter string.
    Rejects a delimiter containing the closing \\E marker — quoting it
    correctly needs splicing, and no real line delimiter contains it."""
    if not delim:
        raise ValueError("delim must be non-empty")
    if "\\E" in delim:
        raise ValueError(r"delim containing '\E' is not supported")
    return "\\Q" + delim + "\\E"


def _doc_lines(
    df: DataFrame, text: str, id_col: str, delim: str
) -> tuple[DataFrame, DataFrame]:
    """(base, lines): ``base`` = (id, array of lines), ``lines`` = one
    row per (id, position, line). NULL text yields ZERO lines (not one
    empty line — ``split(NULL)`` explodes to nothing and the empty-array
    guard keeps ``size`` at 0 instead of NULL)."""
    arr = F.split(F.col(text), _literal_regex(delim))
    base = df.select(
        id_col,
        F.when(F.col(text).isNotNull(), arr)
        .otherwise(F.array().cast("array<string>"))
        .alias("__pf_lines"),
    )
    lines = base.select(
        id_col, F.posexplode("__pf_lines").alias("__pf_pos", "__pf_line")
    )
    return base, lines


def boilerplate_line_counts(
    corpus: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_docs: int = 3,
) -> DataFrame:
    """The cross-document repeated LINES of a corpus: ``(line, n_docs)``
    for every line occurring in at least ``min_docs`` DISTINCT documents
    — the C4-style line-boilerplate table (nav menus, cookie banners,
    license headers). Repeats within one document count once.

    Scale posture: the deduplicated ``(doc, line)`` pair set is the one
    big shuffle; the per-line count groups on the line. Use this to
    INSPECT boilerplate; :func:`remove_boilerplate_lines` is the cleaner
    (which joins on 8-byte line hashes instead of raw strings)."""
    _, lines = _doc_lines(corpus, text, id_col, delim)
    return (
        lines.select(id_col, "__pf_line")
        .distinct()
        .groupBy(F.col("__pf_line").alias("line"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    corpus: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    max_docs: int = 2,
    on_hash: bool = True,
) -> DataFrame:
    """C4-style line-level boilerplate removal: delete every occurrence
    of any line that appears in MORE THAN ``max_docs`` distinct
    documents, and reassemble each document from its surviving lines in
    original order. Output: ``(id_col, clean_text, n_lines_kept,
    n_lines_removed)`` — one row per input document, ``clean_text = ''``
    when everything was boilerplate, and a NULL ``text`` counts zero
    lines.

    Plan (all JVM, no Python): split + posexplode per document; the
    deduplicated ``(doc, line-key)`` pair set is the one corpus-sized
    shuffle; per-key doc counts group on the key; cleaning is a
    ``left_anti`` join of the exploded lines against the (small)
    boilerplate key set; reassembly sorts each document's kept
    ``(pos, line)`` structs in one groupBy — per-task memory is bounded
    by the largest single document, same as any whole-doc transform.
    ``on_hash=True`` (default) keys lines by ``xxhash64`` — fixed-width
    8-byte shuffle/join keys; a false REMOVAL needs a 64-bit collision
    between a boilerplate line and a unique line (~n_lines^2/2^64
    corpus-wide). ``on_hash=False`` joins raw strings for exactness.
    """
    base, lines = _doc_lines(corpus, text, id_col, delim)
    key = F.xxhash64("__pf_line") if on_hash else F.col("__pf_line")
    keyed = lines.withColumn("__pf_k", key)
    boiler = (
        keyed.select(id_col, "__pf_k")
        .distinct()
        .groupBy("__pf_k")
        .agg(F.count(F.lit(1)).alias("__pf_nd"))
        .filter(F.col("__pf_nd") > max_docs)
        .select("__pf_k")
    )
    kept = keyed.join(boiler, "__pf_k", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pf_pos", "__pf_line"))),
                lambda x: x["__pf_line"],
            ),
        ).alias("__pf_clean"),
        F.count(F.lit(1)).alias("__pf_kept"),
    )
    totals = base.select(id_col, F.size("__pf_lines").alias("__pf_n_lines"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("__pf_clean", F.lit("")).alias("clean_text"),
        F.coalesce("__pf_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("__pf_n_lines") - F.coalesce("__pf_kept", F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
    )


def dedup_lines_within_doc(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Within-document repeated-line removal (the C4 self-repetition
    cleanup, complementing :func:`remove_boilerplate_lines`' CROSS-doc
    rule): keep only the FIRST occurrence of each distinct line inside
    each document, reassembled in original order. Same output schema
    as the boilerplate remover: ``(id_col, clean_text, n_lines_kept,
    n_lines_removed)``; NULL ``text`` counts zero lines and cleans to
    ``''``.

    Plan (all JVM, no Python): split + posexplode per document, then
    ``groupBy(doc, line).min(pos)`` — map-side-combinable (no
    window/sort over the corpus line stream) — and the same
    struct-sort reassembly; per-task memory bounded by the largest
    single document."""
    base, lines = _doc_lines(df, text, id_col, delim)
    kept = lines.groupBy(id_col, "__pf_line").agg(
        F.min("__pf_pos").alias("__pf_pos")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pf_pos", "__pf_line"))),
                lambda x: x["__pf_line"],
            ),
        ).alias("__pf_clean"),
        F.count(F.lit(1)).alias("__pf_kept"),
    )
    totals = base.select(id_col, F.size("__pf_lines").alias("__pf_n_lines"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("__pf_clean", F.lit("")).alias("clean_text"),
        F.coalesce("__pf_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("__pf_n_lines") - F.coalesce("__pf_kept", F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
    )


def bloom_contaminated_ids(
    corpus: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fpr: float = 1e-6,
    expected_n: int = 1_000_000,
) -> DataFrame:
    """:func:`contaminated_ids` with the eval shingle set compressed to
    a Bloom filter — the shape that survives a LARGE eval/blocklist
    side. ``broadcast_eval=True`` ships the deduplicated hash set
    (8 bytes x distinct shingles: ~8 GB at 10^9 shingles, per executor),
    and building it costs a distinct shuffle of the eval side. The
    Bloom filter is ``m_bits/8`` bytes REGARDLESS of eval size (~3.4 MB
    at the 1M/1e-6 defaults), and building it is one map-side
    aggregation pass — bits are idempotent under duplicates, so the
    eval side needs NO distinct and NO data shuffle; only constant-size
    filter partials move. The corpus side stays map-only: explode
    shingles, test membership, aggregate distinct ids.

    Guarantees: the result is a SUPERSET of
    ``contaminated_ids(on_hash=True)`` — Bloom filters have no false
    negatives, so nothing contaminated slips through (the conservative
    direction for decontamination). False flags are union-bounded by
    ``shingles_per_doc * fpr`` per clean document; size ``expected_n``
    at the DISTINCT eval shingle count to hold ``fpr`` (overfilling
    degrades the rate gracefully, never the no-miss guarantee).

    The collect() is a construction-time action building the
    constant-size index (same pattern as sketch_agg.bloom_filter_join);
    the filter bytes ship once per executor via a Spark broadcast."""
    from pfutil_spark.operators.sketch_agg import (
        SKETCH_COL,
        bloom_might_contain_col,
        bloom_sketch,
    )

    ev = _shingle_keys(eval_df, text, n, on_hash=False, extra=[])
    rows = bloom_sketch(ev, _SH, expected_n=expected_n, fpr=fpr).collect()
    if not rows:
        # an eval plan with ZERO partitions (empty parquet directory,
        # optimizer-folded empty LocalRelation) emits no partials at
        # all — nothing is contaminated
        return corpus.select(id_col).filter(F.lit(False))
    sk = bytes(rows[0][SKETCH_COL])
    tr = _shingle_keys(corpus, text, n, on_hash=False, extra=[id_col])
    return (
        tr.filter(bloom_might_contain_col(_SH, sk, spark=corpus.sparkSession))
        .select(id_col)
        .distinct()
    )
