"""Inverted-index text retrieval and co-occurrence mining over a
documents table — the "find me training examples like X" /
"which terms travel together" layer on top of the text-analysis
columns (functions/text.py). Tokenization is the house whitespace
split (trim + ``\\s+``, the term_profile contract), scores are
integer-arithmetic-only (linear idf — the distinctive_terms precedent:
one int-operand IEEE division is bit-identical across engines, log()
is libm-specific), so every output is EXACT and DuckDB-oracle-able.

Beyond-reference operators; reuse the reference repo's design rules
(one scan, no driver actions at construction, broadcast small sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens(df: DataFrame, text: str, id_col: str) -> DataFrame:
    from pfutil_spark.functions.text import explode_terms

    return explode_terms(df, text, id_col)


def keyword_search_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query, scored by
    rarity-weighted term frequency:

        score = sum over query terms t present in the doc of
                tf(doc, t) * (N - df(t))

    — tf-idf with a LINEAR idf (``N - df`` instead of ``log(N/df)``),
    rank-equivalent per term and all-bigint, hence EXACT cross-engine
    (the distinctive_terms precedent). ``N`` is the total document
    count including blank docs (a stable corpus constant). Ties break
    by ``id_col`` ascending — a total order, deterministic.

    Output: ``(id_col, n_hit_terms, score)``, ``k`` rows at most; docs
    matching no query term never appear (their score is 0).

    Plan: ONE corpus scan. The explode is filtered to the query-term
    set IMMEDIATELY (``isin`` over a literal array, evaluated map-side
    before any shuffle), so the groupBy(doc, term) aggregate and
    everything after it carry only query-term hits — at most
    |terms| rows per document. Document frequency is a count-over-
    Window partitioned by term ON that aggregate (no second scan, no
    tf-df join); the corpus size joins in as a broadcast 1-row
    aggregate (lazy — no ``.count()`` driver action at construction).
    The top-k lands as TakeOrderedAndProject. Zero Python.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    if any(t is None or t == "" for t in terms):
        raise ValueError(f"blank/None query term: {terms}")
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("__pf_n"))
    toks = _tokens(df, text, id_col).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "__pf_df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(n_docs))
    scored = with_df.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.sum(F.col("tf") * (F.col("__pf_n") - F.col("__pf_df")))
        .cast("long")
        .alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def word_pair_lift(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_v: int = 256,
    min_pair_docs: int = 2,
    k: int = 20,
) -> DataFrame:
    """Term co-occurrence mining: the ``k`` strongest word pairs by
    document co-occurrence count, with an EXACT association score

        lift = pair_docs * N / (docs_a * docs_b)

    (> 1 means the pair co-occurs more than independence predicts —
    the PMI exponential, kept as one bigint-product / bigint-product
    IEEE division so cross-engine parity is exact; log-PMI would be
    libm-specific). ``N`` is the total document count.

    The pair space is bounded BEFORE any join: only the ``top_v`` most
    frequent terms (ties at the cutoff break by term ascending — a
    reproducible vocabulary, the build_vocab contract) participate, so
    the per-document fan-out is at most ``min(v_doc, top_v)^2 / 2``
    and the candidate volume is capped by construction — this is what
    keeps the operator alive at corpus scale; raise ``top_v``
    consciously. Pairs are unordered (``term_a < term_b``) and counted
    once per document. ``min_pair_docs`` prunes the long tail before
    the final top-k.

    Output: ``(term_a, term_b, pair_docs, docs_a, docs_b, lift)``,
    ordered by (pair_docs desc, term_a, term_b) — total order — and
    limited to ``k`` (TakeOrderedAndProject).

    Plan: ONE corpus token scan -> distinct (doc, term); the top-V
    vocabulary (with per-term doc counts) derives from that same
    aggregate and joins back BROADCAST; the pair join is an equi-join
    on ``id_col`` of the vocab-filtered frame with itself (never a
    cartesian); the pair aggregate is map-side combined. Zero Python.
    """
    if top_v < 2:
        raise ValueError(f"top_v={top_v}: must be >= 2")
    if min_pair_docs < 1:
        raise ValueError(f"min_pair_docs={min_pair_docs}: must be >= 1")
    if k < 1:
        raise ValueError(f"k={k}: must be >= 1")
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("__pf_n"))
    dt = _tokens(df, text, id_col).distinct()
    vocab = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("term_docs"))
        .orderBy(F.col("term_docs").desc(), F.col("term").asc())
        .limit(top_v)
    )
    dv = dt.join(F.broadcast(vocab), "term")
    a = dv.select(
        F.col(id_col).alias("__pf_id"),
        F.col("term").alias("term_a"),
        F.col("term_docs").alias("docs_a"),
    )
    b = dv.select(
        F.col(id_col).alias("__pf_id"),
        F.col("term").alias("term_b"),
        F.col("term_docs").alias("docs_b"),
    )
    pairs = (
        a.join(b, "__pf_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "docs_a", "docs_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_pair_docs)
    )
    out = pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        "pair_docs",
        "docs_a",
        "docs_b",
        (
            (F.col("pair_docs") * F.col("__pf_n"))
            / (F.col("docs_a") * F.col("docs_b"))
        ).alias("lift"),
    )
    return out.orderBy(
        F.col("pair_docs").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(k)


def build_postings(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    head: int = 32,
) -> DataFrame:
    """Inverted-index posting lists: one row per term with
    ``(term, doc_freq, min_id, max_id, sum_ids, postings_head)`` —
    ``postings_head`` is the first ``head`` doc ids of the SORTED
    posting list joined with commas (the index shard you'd ship to a
    serving tier), and (min, max, sum, count) are integer-exact
    summaries of the FULL list, so two engines agreeing on them agree
    on the whole list with overwhelming probability without ever
    materialising an unbounded string for stopword-grade terms.

    Tokenization is the house whitespace contract (explode_terms);
    a document contributes each distinct term once (posting lists are
    sets). ``min_df`` prunes the hapax tail BEFORE any list is built.

    Plan: one scan -> explode -> (term, id) distinct (map-side
    combined; keyed by the near-unique pair, no hot-term skew) -> ONE
    row_number window per term (rank ids ascending) -> one groupBy
    that reuses the window's term partitioning. The collected head
    list is bounded to ``head`` ids BEFORE collection (collect_list
    skips the NULLed rank>head rows), so a stopword present in every
    document never materialises its full posting list in one task.
    All-bigint + strings -> EXACT cross-engine.
    """
    if min_df < 1:
        raise ValueError(f"min_df={min_df}: must be >= 1")
    if head < 1:
        raise ValueError(f"head={head}: must be >= 1")
    pairs = _tokens(df, text, id_col).select("term", id_col).distinct()
    w = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    ranked = pairs.withColumn("__pf_rn", F.row_number().over(w))
    agg = ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.min(id_col).cast("long").alias("min_id"),
        F.max(id_col).cast("long").alias("max_id"),
        F.sum(id_col).cast("long").alias("sum_ids"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__pf_rn") <= head, F.col(id_col))
                    )
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("postings_head"),
    )
    if min_df > 1:
        agg = agg.filter(F.col("doc_freq") >= min_df)
    return agg
