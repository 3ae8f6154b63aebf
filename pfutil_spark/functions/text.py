"""Text-analysis columns for training-data pipelines: token counting,
quality scoring, language ID — all pure Spark built-in expressions
(JVM codegen, no Python in the hot path), so they compose with any scan
and stay SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def explode_terms(df: DataFrame, text: str, *keep: str | Column) -> DataFrame:
    """The house tokenizer as a frame transform: one ``term`` row per
    whitespace token of non-blank documents — trim, drop blank/NULL
    text, ``split`` on ``\\s+``, explode. ``keep`` columns (names or
    aliased Columns) pass through. This is THE tokenize contract every
    term pipeline shares (term_profile / distinctive_terms /
    build_vocab / search); its DuckDB mirror is
    ``unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\x{000B}
    \\x{000C}]+'))`` under ``length(trim(text)) > 0`` — the explicit
    Java-\\s-equivalent class (RE2's \\s has no vertical tab)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in keep]
    return df.filter(F.length(F.trim(F.col(text))) > 0).select(
        *cols,
        F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("term"),
    )


def token_count_col(text: str | Column) -> Column:
    """Whitespace-token count (0 for empty/blank)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_like_token_count_col(text: str | Column) -> Column:
    """BPE-ish token proxy: count of word/number/punctuation-run matches
    (regexp-based; a common pre-tokenizer shape)."""
    c = F.col(text) if isinstance(text, str) else text
    arr = F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(arr, lambda t: F.length(F.trim(t)) > 0))


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Adds standard quality-scoring features: n_chars, n_tokens,
    avg_token_len, punct_ratio, digit_ratio, upper_ratio, stopword_ratio
    (English stopword proxy)."""
    c = F.col(text)
    n_chars = F.length(c)
    n_tokens = token_count_col(c)
    stop = "(?i)\\b(the|a|an|and|or|of|to|in|is|are|was|were|it|that|this|for|on|with|as)\\b"
    n_stop = F.size(F.regexp_extract_all(c, F.lit(stop), F.lit(0)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[\.,;:!\?\"'`]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    safe = F.greatest(n_chars.cast("double"), F.lit(1.0))
    safe_t = F.greatest(n_tokens.cast("double"), F.lit(1.0))
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_chars / safe_t).alias("avg_token_len"),
        (n_punct / safe).alias("punct_ratio"),
        (n_digit / safe).alias("digit_ratio"),
        (n_upper / safe).alias("upper_ratio"),
        (n_stop / safe_t).alias("stopword_ratio"),
    )


def word_repetition_stats(
    df: DataFrame, key: str = "doc_id", text: str = "text", sep: str = " "
) -> DataFrame:
    """Gopher-style repetition signals per document: word count, distinct
    word count, duplicate-word fraction, and the most frequent word with
    its frequency fraction (the classic "excessive repetition" quality
    filters for pretraining corpora, cf. Rae et al. 2021 §A1.1 — public
    paper, arXiv:2112.11446).

    Output columns: ``key``, ``n_words``, ``n_distinct_words``,
    ``dup_word_frac`` (= 1 - distinct/total), ``top_word`` (ties broken
    by lexicographically smallest word), ``top_word_frac``. The two
    fractions are emitted UNROUNDED: each is one IEEE division (plus one
    subtraction), so the exact double — and its shortest string repr —
    is engine-independent, whereas ``round(x, 4)`` is NOT (Spark's
    BigDecimal HALF_UP vs DuckDB's scale-multiply disagree on boundary
    ratios like 1 - 83/160 = 0.48124999999999996).

    Plan shape (zero Python, fully oracle-able): explode the
    ``sep``-split token array, partial-aggregated groupBy (key, word),
    then groupBy key. Two shuffles, both map-side combined; the
    (key, word) shuffle carries ~one row per distinct (doc, word) after
    the combine — near-unique keys, no skew, survives a 100x scale-up.
    The top word comes from ``min(struct(-cnt, word))`` (struct
    comparison = max count then min word) so the second aggregation
    needs no re-join with the word-count frame.

    ``sep`` is a literal-character regex (default single space). Empty
    text yields one empty-string "word" in both Spark and DuckDB
    (``split``/``string_split`` keep the empty field), so cross-engine
    parity holds on that edge too.
    """
    k = F.col(key)
    wc = (
        df.select(k.alias("__k"), F.explode(F.split(F.col(text), sep, -1)).alias("word"))
        .groupBy("__k", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = wc.groupBy("__k").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("word").alias("w"))).alias("__top"),
    )
    n_words = F.col("n_words")
    return stats.select(
        F.col("__k").alias(key),
        n_words,
        F.col("n_distinct_words"),
        (
            F.lit(1.0) - F.col("n_distinct_words").cast("double") / n_words
        ).alias("dup_word_frac"),
        F.col("__top.w").alias("top_word"),
        ((-F.col("__top.nc")).cast("double") / n_words).alias("top_word_frac"),
    )


# language-ID: tiny per-language stopword/diacritic evidence lists.
# n-gram/stopword heuristics are the classic cheap langid approach; this is
# intentionally simple (and measured: see tests/test_text_ops.py accuracy
# gate on the documents table).
_LANG_EVIDENCE = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "es": ["el", "la", "los", "las", "que", "de", "y", "es", "en", "por"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
}


def lang_id_col(text: str | Column) -> Column:
    """Heuristic language ID over {en,de,es,fr,zh}: CJK characters win for
    zh; otherwise the language with the most stopword hits (ties break
    deterministically by the lexicographically greatest lang code, the
    struct-comparison semantics of greatest())."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    words = F.split(lowered, r"[^\p{L}]+")
    scores = []
    for lang, evidence in _LANG_EVIDENCE.items():
        ev = F.array(*[F.lit(w) for w in evidence])
        scores.append(
            F.struct(
                F.size(F.array_intersect(words, ev)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    has_cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", "")) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("unknown"))
    )


def distinctive_terms(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` terms of each document
    with the highest rarity-weighted frequency ``score = tf / doc_freq``
    — the rank-equivalent of tf-idf with a linear (not log) idf, chosen
    because a SINGLE integer-operand IEEE division is bit-identical
    across engines while ``log`` is libm-specific (the doc_repetition /
    geometric_mix precedent: every emitted float must be one exact op).
    The classic curation uses: per-doc topic keys, template detection
    (documents whose "distinctive" terms are boilerplate), routing.

    Output: ``id_col``, ``term_rank`` (1-based over (score desc, term
    asc) — total order, deterministic under ties), ``term``, ``tf``
    (in-document occurrences), ``doc_freq`` (corpus documents
    containing the term), ``score``.

    Plan shape (zero Python, ONE corpus scan — same skeleton as
    :func:`term_profile`, plan-gated there): explode -> one
    groupBy(id, term) with map-side combine; ``doc_freq`` is a
    count-over-Window partitioned by term ON that aggregate (one row
    per (doc, term) IS one document), so no second scan and no tf-df
    join; the top-k window partitions by document over per-doc
    vocabulary. Blank/NULL text yields no rows."""
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    toks = explode_terms(df, text, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn("score", F.col("tf") / F.col("doc_freq"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "term", "tf", "doc_freq", "score")
    )


def term_profile(
    df: DataFrame,
    text: str = "text",
    by: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-group term-frequency profile: the ``k`` most frequent
    whitespace tokens per ``by`` group, each with its in-group
    occurrence count AND its corpus-wide document frequency — the
    corpus-level vocabulary report (per-language top terms, stopword
    candidates, df-based term weighting inputs) that complements the
    per-document signals of :func:`word_repetition_stats`.

    Output: ``by``, ``term_rank`` (1-based ``row_number`` over
    (count desc, term asc) — a total order, deterministic under ties),
    ``term``, ``term_count`` (occurrences within the group),
    ``doc_freq`` (distinct documents corpus-wide containing the term;
    assumes one row per ``id_col`` value, as a documents table has).
    All-integer -> EXACT cross-engine parity.

    Plan shape (zero Python, ONE corpus scan — plan-gated): the explode
    feeds a single first-stage groupBy(by, id, term) with map-side
    combine (near-unique keys, no skew); document frequency is a
    count-over-Window partitioned by term ON that aggregate (one row
    per distinct (doc, term) — counting rows IS counting documents), so
    no second scan and no tf-vs-df join exist in the plan. Everything
    after the first aggregation is per-(doc,term)-sized, orders of
    magnitude smaller than the token stream; the final top-k window
    partitions by ``by`` over vocabulary-sized input. Blank / NULL text
    contributes nothing (the explode guard drops the phantom '' token
    that splitting an empty string emits)."""
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    toks = explode_terms(df, text, by, F.col(id_col).alias("__id"))
    pairs = toks.groupBy(by, "__id", "term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    tf = (
        pairs.withColumn(
            "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .groupBy(by, "term")
        .agg(
            F.sum("__c").alias("term_count"),
            F.max("doc_freq").alias("doc_freq"),
        )
    )
    w = Window.partitionBy(by).orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    )
    return tf.select(
        by, F.row_number().over(w).alias("term_rank"), "term",
        "term_count", "doc_freq",
    ).filter(F.col("term_rank") <= k)


# ---------------------------------------------------------------------------
# vocabulary + out-of-vocabulary statistics (r5): the fastText-style
# "does this document look like the corpus?" quality proxy. A fixed
# top-V vocabulary is the index; per-document OOV fraction is the
# signal (high OOV = boilerplate/garbled/wrong-language content).
# ---------------------------------------------------------------------------

def build_vocab(
    df: DataFrame,
    text: str = "text",
    top_v: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: ``(term, term_count)`` for the ``top_v`` most
    frequent whitespace tokens with ``term_count >= min_count``
    (same tokenization as :func:`term_profile`: split on ``\\s+`` after
    trim; blank/NULL text contributes nothing). Ties at the cutoff
    break deterministically by ``term`` ascending — the selected SET is
    reproducible cross-engine, which is what makes :func:`oov_stats`
    exactly oracle-able.

    Plan: one explode into a map-side-combined ``groupBy(term)`` (ONE
    corpus-sized shuffle); ``top_v`` lands as TakeOrderedAndProject —
    distributed per-partition top-V, never a global sort of the
    vocabulary. The result is index-sized (V rows): broadcast it into
    :func:`oov_stats`, or persist it as the corpus's vocabulary
    artifact. For V beyond driver comfort (~10^7) pass ``top_v=None``
    and cut by ``min_count`` alone — pure aggregation, nothing ever
    collects."""
    if top_v is not None and top_v < 1:
        raise ValueError(f"top_v={top_v}: must be >= 1 or None")
    if min_count < 1:
        raise ValueError(f"min_count={min_count}: must be >= 1")
    toks = explode_terms(df, text)
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("term_count"))
    if min_count > 1:
        counts = counts.filter(F.col("term_count") >= min_count)
    if top_v is not None:
        counts = counts.orderBy(
            F.col("term_count").desc(), F.col("term").asc()
        ).limit(top_v)
    return counts


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-document out-of-vocabulary statistics against a
    :func:`build_vocab` table (or any ``(term, ...)`` frame):
    ``(id_col, n_tokens, n_oov, oov_frac)``. ``oov_frac`` is ONE
    bigint/bigint IEEE division (exact cross-engine, emitted
    unrounded); zero-token documents (blank/NULL text) survive with
    ``n_tokens = 0`` and ``oov_frac`` NULL — a doc with no tokens is
    signal, not a row to drop.

    Plan: ONE corpus scan — ``explode_outer`` keeps zero-token docs as
    a NULL-token row (never counted as OOV), the vocab term set joins
    LEFT (broadcast by default; ``broadcast=False`` shuffles for
    vocabularies past the broadcast limits), and one
    map-side-combinable ``groupBy(id)`` closes it. Zero Python
    anywhere (plan-gated)."""
    t = F.trim(F.col(text))
    base = df.select(
        F.col(id_col),
        F.when(
            t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
        ).otherwise(F.split(t, r"\s+")).alias("__pf_toks"),
    )
    toks = base.select(
        id_col, F.explode_outer("__pf_toks").alias("__pf_tok")
    )
    vset = vocab.select(F.col("term").alias("__pf_term")).distinct()
    joined = toks.join(
        F.broadcast(vset) if broadcast else vset,
        toks["__pf_tok"] == vset["__pf_term"],
        "left",
    )
    n_tok = F.count(F.col("__pf_tok"))  # count() skips the NULL token row
    n_oov = F.count(
        F.when(F.col("__pf_tok").isNotNull() & F.col("__pf_term").isNull(), 1)
    )
    return joined.groupBy(id_col).agg(
        n_tok.alias("n_tokens"),
        n_oov.alias("n_oov"),
    ).select(
        id_col,
        "n_tokens",
        "n_oov",
        (F.col("n_oov") / F.nullif(F.col("n_tokens"), F.lit(0))).alias(
            "oov_frac"
        ),
    )


# ---------------------------------------------------------------------------
# unicode script profile (r5): per-document character-class counts via
# EXPLICIT BMP code-point ranges — identical semantics in Java regex
# (Spark) and RE2 (DuckDB), unlike \p{Han}-style script classes whose
# names and unicode tables differ per engine.
# ---------------------------------------------------------------------------

_SCRIPT_RANGES = {
    # class -> character-class body (explicit ranges only; BMP)
    "latin": "A-Za-z",
    "digit": "0-9",
    "cjk": "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}",
    "cyrillic": "\\x{0400}-\\x{04FF}",
    "arabic": "\\x{0600}-\\x{06FF}",
    "whitespace": " \\t\\n\\r\\x{000B}\\x{000C}",
}


def script_counts(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document unicode-script character profile:
    ``(id_col, n_chars, n_latin, n_digit, n_cjk, n_cyrillic, n_arabic,
    n_whitespace, n_other, latin_frac, cjk_frac)`` — the
    script-mix / mojibake / wrong-language signal that complements
    :func:`lang_id_col`'s stopword heuristic. Counts are
    length-minus-replaced (Spark ``regexp_replace`` replaces ALL
    matches; the DuckDB mirror needs the ``'g'`` flag); classes use
    explicit BMP code-point ranges so Java and RE2 agree by
    construction. CJK = unified ideographs + kana + hangul syllables.
    Fractions are single bigint/bigint divisions over NULLIF(n_chars,0)
    (exact cross-engine; NULL for empty/NULL text). Astral-plane chars
    (emoji etc.) fall into ``n_other`` — both Spark's and DuckDB's
    ``length`` count code points, so they agree there too; the classes
    themselves are BMP ranges only. ``extra_cols`` pass through
    untouched (group keys for a
    downstream aggregate — per-lang/per-source script mix from the same
    single scan). Map-only, zero shuffles, zero Python (plan-gated)."""
    c = F.coalesce(F.col(text), F.lit(""))
    n_chars = F.length(c).cast("long").alias("n_chars")
    counts = [
        (F.length(c) - F.length(F.regexp_replace(c, f"[{body}]", "")))
        .cast("long")
        .alias(f"n_{name}")
        for name, body in _SCRIPT_RANGES.items()
    ]
    known = None
    for name in _SCRIPT_RANGES:
        col = F.col(f"n_{name}")
        known = col if known is None else known + col
    keep = [F.col(x) for x in (id_col, *extra_cols)]
    out = df.select(*keep, n_chars, *counts).select(
        "*", (F.col("n_chars") - known).alias("n_other")
    )
    denom = F.nullif(F.col("n_chars"), F.lit(0))
    return out.select(
        "*",
        (F.col("n_latin") / denom).alias("latin_frac"),
        (F.col("n_cjk") / denom).alias("cjk_frac"),
    )


def ngram_profile(
    df: DataFrame,
    text: str = "text",
    by: str = "lang",
    n: int = 2,
    k: int = 10,
) -> DataFrame:
    """Per-group top-``k`` word ``n``-grams (collocations): the
    phrase-level companion of :func:`term_profile` — per-language
    bigram/trigram frequency profiles feed stop-phrase lists,
    boilerplate candidates, and tokenizer-merge (BPE pair) diagnostics.

    Output: ``by``, ``ngram_rank`` (1-based over (count desc, ngram
    asc) — a total order, deterministic under ties), ``ngram`` (the
    ``n`` tokens space-rejoined), ``ngram_count``. All-integer ->
    EXACT cross-engine parity.

    Plan shape (zero Python, ONE corpus scan): shingle generation is
    the same pure-JVM expression the decontamination suite uses
    (``word_shingles_col`` — codegen ``split``/``sequence``/``slice``,
    documents with fewer than ``n`` tokens contribute nothing), the
    explode feeds one map-side-combined groupBy(by, ngram), and the
    final top-k window partitions by ``by`` over vocabulary-sized
    input. The n-gram key space is larger than the term space but the
    shuffle carries (group, ngram, partial-count) rows, never raw
    documents."""
    from pfutil_spark.operators.contamination import word_shingles_col

    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    if n < 1:
        raise ValueError(f"n={n}: must be >= 1")
    grams = df.select(
        F.col(by),
        F.explode(word_shingles_col(F.col(text), n)).alias("ngram"),
    )
    counts = grams.groupBy(by, "ngram").agg(
        F.count(F.lit(1)).alias("ngram_count")
    )
    w = Window.partitionBy(by).orderBy(
        F.col("ngram_count").desc(), F.col("ngram").asc()
    )
    return counts.select(
        by,
        F.row_number().over(w).alias("ngram_rank"),
        "ngram",
        "ngram_count",
    ).filter(F.col("ngram_rank") <= k)
