"""Deduplication operators for training-data pipelines.

* exact dedup — hash-groupBy (pure DataFrame ops, SQL-oracle-able)
* MinHash + LSH banding (Broder 1997; Leskovec/Rajaraman/Ullman MMDS ch.3)
  — near-duplicate candidate pairs at scale via band-bucket equi-join
* SimHash (Charikar 2002; Manku et al. WWW'07 pigeonhole chunking)
* exact n-gram Jaccard verification for candidate pairs

The per-document shingling is fully vectorized: character k-gram hashes
are computed over the WHOLE Arrow batch buffer with k shifted
multiply-adds (no per-row Python, no recurrence), then per-document
aggregations use ``np.minimum.reduceat`` / ``np.add.reduceat`` over the
Arrow offsets. Signatures travel as compact arrays; candidate generation
is a plain shuffle join on (band, band_hash) — the plan Spark optimizes
like any other equi-join.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from pfutil_spark.kernel.sketch_common import splitmix64
from pfutil_spark.operators._cache import CacheScope

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for k-gram hashing


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """One row per distinct content hash: (content_sha, keep_id, dup_cnt).
    Keep-policy: smallest id wins (deterministic)."""
    return (
        df.select(F.sha2(F.col(text), 256).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def exact_dedup(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """The deduplicated table: keeps the smallest-id row per content."""
    keep = exact_dedup_groups(df, text, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# vectorized k-gram machinery (shared by MinHash / SimHash / fingerprints)
# ---------------------------------------------------------------------------

def _kgram_hashes(data: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-gram (character shingle) hashes of every document in a batch.

    Returns (window_hashes, window_doc_starts): hashes laid out doc-major;
    ``window_doc_starts`` has len n_docs+1 (reduceat-ready segment bounds).
    Windows never cross document boundaries. Docs shorter than k get zero
    windows.
    """
    offsets = offsets.astype(np.int64, copy=False)
    lens = np.diff(offsets)
    n_docs = len(lens)
    seg = np.ascontiguousarray(data[int(offsets[0]) : int(offsets[-1])])
    total = len(seg)
    if total < k:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    # h[i] = sum_j seg[i+j] * B^j  — k shifted multiply-adds, no recurrence
    with np.errstate(over="ignore"):
        h = np.zeros(total - k + 1, dtype=np.uint64)
        mult = np.uint64(1)
        for j in range(k):
            h += seg[j : total - k + 1 + j].astype(np.uint64) * mult
            mult = mult * _B
        h = splitmix64(h)
    # valid window starts for doc d: [offsets[d], offsets[d+1]-k] (rel seg)
    starts_rel = offsets[:-1] - offsets[0]
    ends_rel = offsets[1:] - offsets[0]
    n_windows = np.maximum(ends_rel - starts_rel - (k - 1), 0)
    doc_bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_windows, out=doc_bounds[1:])
    # gather: for each doc, its window hashes are h[starts_rel[d] : starts_rel[d]+n_windows[d]]
    gather_idx = np.repeat(starts_rel, n_windows) + (
        np.arange(doc_bounds[-1], dtype=np.int64) - np.repeat(doc_bounds[:-1], n_windows)
    )
    return h[gather_idx], doc_bounds


def _segment_min(values: np.ndarray, bounds: np.ndarray, empty_val: int) -> np.ndarray:
    """Per-segment min with empty-segment handling."""
    n = len(bounds) - 1
    out = np.full(n, empty_val, dtype=np.uint64)
    nonempty = bounds[:-1] < bounds[1:]
    if nonempty.any():
        starts = bounds[:-1][nonempty]
        mins = np.minimum.reduceat(values, starts)
        out[nonempty] = mins
    return out


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

def _oph_batch(
    wh: np.ndarray, bounds: np.ndarray, num_hashes: int
) -> np.ndarray:
    """One-Permutation Hashing signatures (Li, Owen & Zhang, NIPS 2012)
    with rotation densification (Shrivastava & Li, ICML 2014): ONE pass
    over the window hashes — the top log2(H) bits pick the bin, the
    hash value is the bin's min — instead of H independent re-hash
    passes. Empty bins borrow (re-mixed) from the next non-empty bin."""
    from pfutil_spark.kernel.sketch_common import splitmix64

    n_docs = len(bounds) - 1
    H = num_hashes
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    shift = np.uint64(64 - int(np.log2(H)))
    sig = np.full(n_docs * H, sentinel, dtype=np.uint64)
    if len(wh):
        doc_idx = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(bounds)
        )
        flat = doc_idx * H + (wh >> shift).astype(np.int64)
        np.minimum.at(sig, flat, wh)
    sig = sig.reshape(n_docs, H)
    # rotation densification: empty bin j takes mix(next non-empty, dist)
    orig = sig.copy()
    empty = orig == sentinel
    for dist in range(1, H):
        if not empty.any():
            break
        shifted = np.roll(orig, -dist, axis=1)
        fill = empty & (shifted != sentinel)
        if fill.any():
            with np.errstate(over="ignore"):
                sig[fill] = splitmix64(shifted[fill] ^ np.uint64(dist))
            empty &= ~fill
    return sig


def minhash_signatures(
    df: DataFrame, text: str, id_col: str,
    num_hashes: int = 64, k: int = 5,
    method: str = "classic",
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature per document.
    Jaccard(A,B) ~= fraction of matching signature positions.

    ``method='classic'``: H independent hash passes (textbook MinHash).
    ``method='oph'``: one-permutation hashing — ONE pass regardless of H
    (~H-times less hash work; the scale path for long documents)."""
    from pfutil_spark.operators.hll_agg import _varbin_buffers

    import pyarrow as pa
    import pyarrow.compute as pc

    pruned = df.select(id_col, text)
    schema = StructType(
        [df.schema[id_col], StructField("sig", ArrayType(LongType()), False)]
    )
    seeds = splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            t = batch.column(text)
            if t.null_count:
                batch = batch.filter(pc.is_valid(t))
                t = batch.column(text)
            if len(batch) == 0:
                continue
            data, offsets = _varbin_buffers(t)
            wh, bounds = _kgram_hashes(data, offsets, k)
            n_docs = len(bounds) - 1
            if method == "oph":
                sig_rows = _oph_batch(wh, bounds, num_hashes)
            else:
                sig = np.empty((num_hashes, n_docs), dtype=np.uint64)
                for j in range(num_hashes):
                    with np.errstate(over="ignore"):
                        mixed = wh ^ seeds[j]
                        mixed = splitmix64(mixed)
                    sig[j] = _segment_min(mixed, bounds, int(sentinel))
                sig_rows = np.ascontiguousarray(sig.T)
            sig_i64 = sig_rows.view(np.int64)
            list_offsets = pa.array(
                np.arange(0, (n_docs + 1) * num_hashes, num_hashes, dtype=np.int32)
            )
            sig_arr = pa.ListArray.from_arrays(list_offsets, pa.array(sig_i64.ravel()))
            yield pa.record_batch(
                [batch.column(id_col), sig_arr], names=[id_col, "sig"]
            )

    return pruned.mapInArrow(fn, schema)


def _band_cols(num_hashes: int, bands: int) -> "list[Column]":
    """The LSH band-bucket hash columns over a ``sig`` array — ONE
    definition shared by within-corpus and cross-corpus pairing, so
    signatures stored by one path always band identically in the
    other."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    return [
        F.xxhash64(
            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band),
            F.lit(i),
        ).alias(f"b{i}")
        for i in range(bands)
    ]


def _est_jaccard_col(num_hashes: int) -> Column:
    """Signature-agreement Jaccard estimate over sig_a/sig_b columns."""
    return (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
        )
        / F.lit(float(num_hashes))
    ).alias("est_jaccard")


def _melt_bands(sigs: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, band_hash) long form of a signature frame — the other
    half of the shared banding contract (_band_cols): one definition of
    the melt shape so the within-corpus and cross-corpus paths can never
    band or name columns differently."""
    return sigs.select(id_col, *_band_cols(num_hashes, bands)).unpivot(
        [id_col], [f"b{i}" for i in range(bands)], "band", "band_hash"
    )


def _checked_sigs(sigs: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """Project a signature frame to (id, sig), failing LOUDLY at run time
    if any signature's length differs from ``num_hashes`` — the easy
    drift when the base side is a parquet store written with different
    parameters (silently mis-banding and dividing the agreement count by
    the wrong H would otherwise yield wrong pairs, or est_jaccard > 1)."""
    msg = F.concat(
        F.lit(f"signature length != num_hashes={num_hashes}: got "),
        F.size("sig").cast("string"),
        F.lit(" — was this store written with different MinHash params?"),
    )
    checked = (
        F.when(F.size("sig") == num_hashes, F.col("sig"))
        .otherwise(F.raise_error(msg))
        .alias("sig")
    )
    return sigs.select(id_col, checked)


def minhash_lsh_pairs(
    df: DataFrame, text: str, id_col: str,
    num_hashes: int = 64, bands: int = 16, k: int = 5,
    min_jaccard: float = 0.5, method: str = "classic",
    cache: "CacheScope | None" = None,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b, est_jaccard) via LSH
    banding: docs sharing any band bucket become candidates; their full
    signatures estimate Jaccard; filter at ``min_jaccard``.

    Scale shape: explode to (band, band_hash, id) -> shuffle join on the
    band bucket (equi-join, broadcast-able statistics, AQE-skew-safe) ->
    distinct pairs -> signature re-check. Never quadratic in corpus size,
    only in per-bucket membership.

    The signature frame is persisted (the plan reads it three times);
    pass ``cache=CacheScope()`` and release it after the action, or call
    ``release_cached(result)`` — see operators/_cache.py.
    """
    scope = cache if cache is not None else CacheScope()
    sigs = scope.persist(minhash_signatures(df, text, id_col, num_hashes, k, method))

    melted = _melt_bands(sigs, id_col, num_hashes, bands)
    left = melted.alias("l")
    right = melted.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", _est_jaccard_col(num_hashes))
    )
    out = est.filter(F.col("est_jaccard") >= min_jaccard)
    if cache is None:
        out._pfutil_cache_scope = scope
    return out


def lsh_pairs_between(
    sigs_new: DataFrame,
    sigs_base: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.5,
    cache: "CacheScope | None" = None,
) -> DataFrame:
    """Cross-corpus near-duplicate candidates — the INCREMENTAL
    ingestion shape: pair each new document against an existing corpus,
    never new-vs-new or base-vs-base. Inputs are SIGNATURE frames
    (``(id, sig)`` from :func:`minhash_signatures`), so the base side
    can be a persisted signature store read back from parquet — the
    historical corpus is never re-read or re-hashed; a daily ingest
    touches raw text only for the new batch and appends its signatures
    to the store afterwards.

    Output: (``id_new``, ``id_base``, ``est_jaccard >= min_jaccard``).
    Banding is :func:`_band_cols` — identical to
    :func:`minhash_lsh_pairs`, so signatures and stores interoperate
    across both (same ``num_hashes``/``bands`` required, and the two
    sides must share the shingle ``k`` used at signature time).

    Scale shape: both sides melt to (band, band_hash, id) and meet in a
    band-bucket equi-join — cost is per-bucket membership products, not
    |new| x |base|; the new side is typically tiny, so AQE broadcasts
    its melted table and the base side never shuffles. Only the NEW
    side is persisted (it is a freshly-computed mapInArrow pass read
    twice); the base side is read twice as-is — for a parquet-backed
    store, two columnar scans beat materializing the whole store into
    executor cache, and the function never persists caller-owned frames
    behind the caller's back. Signature lengths are validated at run
    time against ``num_hashes`` (_checked_sigs) so a store written with
    different parameters fails loudly instead of mis-banding."""
    scope = cache if cache is not None else CacheScope()
    sigs_new = scope.persist(_checked_sigs(sigs_new, id_col, num_hashes))
    sigs_base = _checked_sigs(sigs_base, id_col, num_hashes)
    melt_new = _melt_bands(sigs_new, id_col, num_hashes, bands)
    melt_base = _melt_bands(sigs_base, id_col, num_hashes, bands)
    cand = (
        melt_new.alias("l")
        .join(
            melt_base.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_new"),
            F.col(f"r.{id_col}").alias("id_base"),
        )
        .distinct()
    )
    sa = sigs_new.select(F.col(id_col).alias("id_new"), F.col("sig").alias("sig_a"))
    sb = sigs_base.select(F.col(id_col).alias("id_base"), F.col("sig").alias("sig_b"))
    out = (
        cand.join(sa, "id_new")
        .join(sb, "id_base")
        .select("id_new", "id_base", _est_jaccard_col(num_hashes))
        .filter(F.col("est_jaccard") >= min_jaccard)
    )
    if cache is None:
        out._pfutil_cache_scope = scope
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text: str, id_col: str, k: int = 4) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over character k-gram hashes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pfutil_spark.operators.hll_agg import _varbin_buffers

    pruned = df.select(id_col, text)
    schema = StructType([df.schema[id_col], StructField("simhash", LongType(), False)])

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            t = batch.column(text)
            if t.null_count:
                batch = batch.filter(pc.is_valid(t))
                t = batch.column(text)
            if len(batch) == 0:
                continue
            data, offsets = _varbin_buffers(t)
            wh, bounds = _kgram_hashes(data, offsets, k)
            n_docs = len(bounds) - 1
            votes = np.zeros((64, n_docs), dtype=np.int64)
            n_windows = np.diff(bounds)
            nonempty = bounds[:-1] < bounds[1:]
            starts = bounds[:-1][nonempty]
            for b in range(64):
                bit = ((wh >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                if nonempty.any():
                    ones = np.add.reduceat(bit, starts)
                    votes[b][nonempty] = 2 * ones - n_windows[nonempty]
            sim = np.zeros(n_docs, dtype=np.uint64)
            for b in range(64):
                sim |= (votes[b] > 0).astype(np.uint64) << np.uint64(b)
            yield pa.record_batch(
                [batch.column(id_col), pa.array(sim.view(np.int64))],
                names=[id_col, "simhash"],
            )

    return pruned.mapInArrow(fn, schema)


def simhash_near_dup_pairs(
    df: DataFrame, text: str, id_col: str,
    max_hamming: int = 3, k: int = 4,
    cache: "CacheScope | None" = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming distance <= max_hamming,
    found via pigeonhole chunking (Manku et al.): split the 64-bit
    signature into ``max_hamming + 1`` chunks — a pair within distance d
    can differ in at most d chunks, so it shares at least one exact chunk
    (pigeonhole), and candidates come from ``max_hamming + 1`` equi-joins,
    never a cross join.

    More chunks = narrower chunks = bigger buckets, so candidate volume
    grows with ``max_hamming``; at 100-TB scale keep it small (<= 7, i.e.
    >= 8-bit chunks) and let the exact hamming filter do the rest.
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError(
            f"max_hamming={max_hamming}: pigeonhole chunking needs "
            "0 <= max_hamming <= 15 (chunks of >= 4 bits)"
        )
    n_chunks = max_hamming + 1
    # distribute 64 bits as evenly as possible: the first (64 % n_chunks)
    # chunks get one extra bit — every chunk is non-empty for any
    # n_chunks <= 64 (a ceil-width split would create empty/overshooting
    # chunks for e.g. 9, 12, 14, 15 chunks)
    base, extra = divmod(64, n_chunks)
    bounds = []
    lo = 0
    for i in range(n_chunks):
        hi = lo + base + (1 if i < extra else 0)
        bounds.append((lo, hi))
        lo = hi

    def _chunk_col(lo: int, hi: int) -> Column:
        w = hi - lo
        shifted = F.shiftrightunsigned("simhash", lo)
        if w >= 64:  # whole signature: mask (1<<64)-1 overflows LongType
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w) - 1))

    scope = cache if cache is not None else CacheScope()
    sigs = scope.persist(simhash_signatures(df, text, id_col, k))
    chunks = sigs.select(
        id_col,
        "simhash",
        *[_chunk_col(lo, hi).alias(f"c{i}") for i, (lo, hi) in enumerate(bounds)],
    )
    cands = None
    for i in range(n_chunks):
        l = chunks.alias("l")
        r = chunks.alias("r")
        c = l.join(
            r,
            (F.col(f"l.c{i}") == F.col(f"r.c{i}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        ).select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        cands = c if cands is None else cands.unionByName(c)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = (
        cands.distinct()
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    if cache is None:
        out._pfutil_cache_scope = scope
    return out


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint
# ---------------------------------------------------------------------------

def fingerprint_col_df(df: DataFrame, text: str, id_col: str, k: int = 8) -> DataFrame:
    """(id, fingerprint: long) — min k-gram rolling hash per document
    (the winnowing family's doc-level fingerprint; identical content =>
    identical fingerprint, robust to reordering of large blocks)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pfutil_spark.operators.hll_agg import _varbin_buffers

    pruned = df.select(id_col, text)
    schema = StructType([df.schema[id_col], StructField("fingerprint", LongType(), False)])
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            t = batch.column(text)
            if t.null_count:
                batch = batch.filter(pc.is_valid(t))
                t = batch.column(text)
            if len(batch) == 0:
                continue
            data, offsets = _varbin_buffers(t)
            wh, bounds = _kgram_hashes(data, offsets, k)
            fp = _segment_min(wh, bounds, int(sentinel))
            yield pa.record_batch(
                [batch.column(id_col), pa.array(fp.view(np.int64))],
                names=[id_col, "fingerprint"],
            )

    return pruned.mapInArrow(fn, schema)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification of candidate pairs)
# ---------------------------------------------------------------------------

def _pair_shingle_scores(
    df: DataFrame,
    pairs: DataFrame,
    text: str,
    id_col: str,
    k: int,
    score,
    out_name: str,
) -> DataFrame:
    """Shared verify-stage machinery: join candidate (id_a, id_b) pairs
    back to their texts and score each pair's character-k-gram sets with
    ``score(sx, sy) -> float`` (a plain-Python set function; empty-set
    conventions live in the score fn). Candidate sets are small by
    construction (post-LSH / post-candidate-join), so the per-pair loop
    runs on joined pair rows only, never per corpus row."""
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text).alias("text_a"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text).alias("text_b"))
    joined = pairs.join(ta, "id_a").join(tb, "id_b")

    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _score(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):  # per candidate PAIR only
            sx = {x[j : j + k] for j in range(max(len(x) - k + 1, 0))}
            sy = {y[j : j + k] for j in range(max(len(y) - k + 1, 0))}
            out[i] = score(sx, sy)
        return pd.Series(out)

    return joined.select(
        "id_a", "id_b", _score("text_a", "text_b").alias(out_name)
    )


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact character-k-gram Jaccard for given (id_a, id_b) pairs
    (the post-LSH verify stage; see :func:`_pair_shingle_scores`)."""

    def jac(sx: set, sy: set) -> float:
        u = len(sx | sy)
        return (len(sx & sy) / u) if u else 1.0

    return _pair_shingle_scores(df, pairs, text, id_col, k, jac, "jaccard")


# ---------------------------------------------------------------------------
# near-duplicate clusters: connected components over the candidate-pair
# graph. This is what leakage-free splits key on (operators/sampling.py:
# hash_split_col "keyed by a dedup-cluster id") and what keep-one-per-
# cluster dedup needs beyond pairwise candidates.
# ---------------------------------------------------------------------------

def _symmetrize(e: DataFrame) -> DataFrame:
    return e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to that
    node's minimum neighborhood member (Kiveris et al., COSN'14)."""
    both = _symmetrize(e)
    m = both.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", "u").alias("m"))
    return (
        both.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor (and the node itself) to
    the minimum of that smaller neighborhood."""
    both = _symmetrize(e)
    smaller = both.filter(F.col("v") <= F.col("u"))
    m = smaller.groupBy("u").agg(F.min("v").alias("m"))  # m <= u already
    linked = smaller.join(m, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return (
        linked.union(self_link).filter(F.col("u") != F.col("v")).distinct()
    )


def _canon_edges(e: DataFrame) -> DataFrame:
    return e.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) over the undirected pair graph; ``component`` is
    the MINIMUM node id of the connected component (deterministic,
    engine-independent — the DuckDB oracle reproduces it with a
    recursive CTE).

    Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
    Mirrokni, Rastogi & Vassilvitskii, "Connected Components in
    MapReduce and Beyond", COSN 2014) — each round is two
    groupBy-min + join passes over the candidate-PAIR graph (LSH
    output, tiny relative to the corpus), and convergence is
    O(log^2 n) rounds REGARDLESS of how node ids are laid out along
    paths (an r4 review simulation showed naive min-label propagation
    + pointer jumping degrading to O(diameter) on shuffled-id chains).
    At the fixpoint every component is a star centered on its minimum
    node. The round count is the inherent driver-side action of any
    fixpoint algorithm; edges are localCheckpoint-ed once up front (the
    upstream LSH/verify pipeline runs exactly once) and per round so
    lineage stays flat. RAISES if the cap is exhausted before
    convergence — silently-wrong cluster ids would defeat the
    leakage-free-split contract built on top of this."""
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # pairs pipeline (LSH + verify) runs ONCE
    )
    prev = _canon_edges(e).localCheckpoint()
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _canon_edges(e).localCheckpoint()
        changed = (
            cur.count() != prev.count()
            or cur.exceptAll(prev).count() != 0
        )
        prev = cur
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; raise max_iterations (components are stars at the "
            "fixpoint — an unconverged result would assign WRONG cluster "
            "ids and leak near-duplicates across splits)"
        )
    roots = prev.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    members = prev.select(F.col("b").alias("node"), F.col("a").alias("component"))
    return members.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def keep_best_per_cluster(
    df: DataFrame,
    cluster_col: str = "cluster_id",
    preference: "Sequence[Column] | None" = None,
) -> DataFrame:
    """The dedup OUTPUT table: one representative row per near-dup
    cluster, chosen by the ``preference`` ordering (first column is the
    primary criterion — e.g. ``[F.col("quality").desc(),
    F.col("doc_id")]`` keeps the highest-quality doc, ties to the
    smallest id). ``preference`` is REQUIRED — a silent default
    ordering here would silently pick arbitrary representatives, so the
    choice must be explicit (always end it with a unique id column to
    make the result deterministic).

    Composes with :func:`assign_dedup_clusters`:
    ``keep_best_per_cluster(assign_dedup_clusters(df, pairs, "doc_id"),
    preference=[F.length("text").desc(), F.col("doc_id")])``.

    Scale: one rank window partitioned by ``cluster_col`` — cluster ids
    are near-unique (singletons keep their own id), so the window
    shuffle is as balanced as the data itself; no skew beyond a
    pathological single giant cluster (which a dedup pipeline should
    cap upstream anyway)."""
    from pyspark.sql import Window

    if preference is None:
        raise ValueError("pass an explicit preference ordering (e.g. [quality.desc(), id])")
    w = Window.partitionBy(cluster_col).orderBy(*preference)
    return (
        df.withColumn("__kb_rn", F.row_number().over(w))
        .filter(F.col("__kb_rn") == 1)
        .drop("__kb_rn")
    )


def assign_dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """``df`` + a ``cluster_id`` column: the connected-component id over
    the near-dup pair graph, with singletons keeping their own id —
    all-or-nothing split keys (``hash_split_col(cluster_id)``) and
    keep-one-per-cluster dedup (``filter(col(id) == col("cluster_id"))``
    when ids order the keep preference) fall out directly."""
    # join strategy left to AQE: the component table is sized by the
    # number of near-dup NODES — usually broadcastable, but a
    # heavily-duplicated corpus can make it arbitrarily large
    comp = (
        connected_components(pairs, src, dst)
        .withColumnRenamed("node", id_col)
        .withColumnRenamed("component", "__cc_component")  # collision-safe
    )
    return df.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce("__cc_component", F.col(id_col))
    ).drop("__cc_component")


def cluster_size_stats(
    clusters: DataFrame, cluster_col: str = "cluster_id"
) -> DataFrame:
    """The duplication PROFILE of a corpus: histogram of near-dup
    cluster sizes from an assigned-clusters table (the
    :func:`assign_dedup_clusters` output). Output per distinct size:
    ``(cluster_size, n_clusters, n_docs, frac_docs)`` — ``frac_docs`` is
    the fraction of all documents living in clusters of that size (one
    long/long IEEE division, exact cross-engine). The size-1 row is the
    unique mass; everything else is what dedup would collapse —
    ``sum((size-1) * n_clusters)`` rows removable by keep-one-per-cluster.

    Plan: two map-side-combinable aggregations (per-cluster size, then
    per-size histogram), then the denominator as a global window SUM
    over the histogram itself — the histogram is at most ``max cluster
    size`` rows, so the single-partition window is trivial, and the
    whole thing is ONE plan (a separate broadcast-total job would
    re-evaluate the input lineage — corpus scan + components join —
    twice); nothing is per-row Python and no raw text moves."""
    from pyspark.sql.window import Window

    sizes = clusters.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )
    return hist.select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        (
            F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy())
        ).alias("frac_docs"),
    )


def edit_distance_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text: str,
    id_col: str,
    max_edits: int | None = None,
) -> DataFrame:
    """Exact Levenshtein edit distance for given (id_a, id_b) candidate
    pairs — the character-level verify stage (the sibling of
    :func:`ngram_jaccard_pairs`, but pure JVM codegen: Spark's builtin
    ``levenshtein``, no Python). With ``max_edits`` set, the BANDED DP
    runs in O(len * max_edits) instead of O(len^2) and pairs above the
    threshold are DROPPED (Spark returns -1 for them) — the scale path
    for long documents. Returns (id_a, id_b, edits).

    Cross-engine caveat (tested): Spark counts CODE POINTS while
    DuckDB's ``levenshtein`` counts UTF-8 BYTES — identical on ASCII
    corpora only ('Ä'->'A' is 1 in Spark, 2 in DuckDB). The contract
    query's corpus is verified pure ASCII at every SF.
    """
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text).alias("__pf_ta"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text).alias("__pf_tb"))
    joined = pairs.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")
    if max_edits is None:
        edits = F.levenshtein("__pf_ta", "__pf_tb")
    else:
        if max_edits < 0:
            raise ValueError(f"max_edits={max_edits}: must be >= 0")
        edits = F.levenshtein("__pf_ta", "__pf_tb", max_edits)
    out = joined.select(
        "id_a", "id_b", edits.cast("long").alias("edits")
    )
    if max_edits is not None:
        out = out.filter(F.col("edits") >= 0)
    return out


def fuzzy_dedup_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    max_edits: int,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    min_jaccard: float = 0.5,
    cache: "CacheScope | None" = None,
) -> DataFrame:
    """Edit-distance near-duplicate pairs: MinHash-LSH candidate
    generation (never all-pairs) followed by the exact banded
    Levenshtein verify at ``max_edits`` — "same doc up to a few edits"
    dedup, character-exact where Jaccard only bounds. Returns
    (id_a, id_b, edits), id_a < id_b.

    Recall contract: a pair at edit distance e shares all but at most
    ``k*e`` of its character k-grams, so true near-dups at small
    ``max_edits`` sit at high Jaccard — size ``min_jaccard`` /
    ``bands`` so the LSH stage keeps them (the usual LSH recall
    argument; the verify stage makes precision exact).
    """
    scope = cache if cache is not None else CacheScope()
    cand = minhash_lsh_pairs(
        df, text, id_col, num_hashes, bands, k, min_jaccard, cache=scope
    )
    out = edit_distance_pairs(df, cand, text, id_col, max_edits)
    if cache is None:
        out._pfutil_cache_scope = scope
    return out


def cross_source_dup_matrix(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    source: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Source-level duplication/leakage matrix: given near-dup pairs
    (any candidate+verify pipeline's output) and the corpus's
    ``(id, source)`` mapping, count pairs per UNORDERED source
    combination — "how much of source A is duplicated in source B" is
    the dataset-mixing and eval-leakage question the pair list itself
    doesn't answer. Output per (source_a, source_b) with
    ``source_a <= source_b``: ``(source_a, source_b, n_pairs,
    pair_frac)``; ``pair_frac`` = fraction of all near-dup pairs (one
    bigint/bigint division, exact cross-engine). A NULL source
    normalizes to the ``source_b`` slot (both-NULL pairs group
    together); diagonal rows (A, A) are within-source duplication.

    Plan: two hash joins of the PAIR table (near-dup-pair-sized, far
    smaller than the corpus) against the 2-column (id, source)
    projection, one shrinking groupBy, and the total as a window sum
    over the tiny matrix (ONE plan, no broadcast-total re-evaluation).
    Zero Python."""
    from pyspark.sql.window import Window

    s = df.select(F.col(id_col), F.col(source))
    sa = s.select(
        F.col(id_col).alias(src), F.col(source).alias("__pf_sa")
    )
    sb = s.select(
        F.col(id_col).alias(dst), F.col(source).alias("__pf_sb")
    )
    joined = pairs.select(src, dst).join(sa, src).join(sb, dst)
    # null-safe unordered normalization: NULL always lands in the
    # source_b slot (sa<=sb is NULL-valued when either side is NULL,
    # so the bare comparison alone would send NULLs to different
    # slots depending on which side they arrive in)
    a_first = (
        F.col("__pf_sb").isNull() & F.col("__pf_sa").isNotNull()
    ) | (F.col("__pf_sa") <= F.col("__pf_sb"))
    lo = F.when(a_first, F.col("__pf_sa")).otherwise(F.col("__pf_sb"))
    hi = F.when(a_first, F.col("__pf_sb")).otherwise(F.col("__pf_sa"))
    agg = (
        joined.select(lo.alias("source_a"), hi.alias("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return agg.select(
        "source_a",
        "source_b",
        "n_pairs",
        (
            F.col("n_pairs") / F.sum("n_pairs").over(Window.partitionBy())
        ).alias("pair_frac"),
    )


# ---------------------------------------------------------------------------
# asymmetric containment near-dups (r5): C(A in B) = |S_A ∩ S_B| / |S_A|.
# Symmetric Jaccard LSH structurally MISSES a small doc quoted inside a
# much larger one (J <= |A|/|B| no matter how complete the quote); this
# is the "doc A is substantially contained in doc B" detector —
# quote/expansion/boilerplate-wrapper discovery.
# ---------------------------------------------------------------------------

def shingle_pairs_df(
    df: DataFrame, text: str, id_col: str, k: int = 5, sample: int | None = None
) -> DataFrame:
    """(id, shingle: long[, n_sampled: int]) — each document's DISTINCT
    character-k-gram hashes, vectorized over Arrow buffers (the shared
    rolling-hash machinery). With ``sample=s`` only the s SMALLEST
    distinct hashes survive (a bottom-s signature: min-wise hashing
    makes it a uniform without-replacement sample of the doc's shingle
    set) and ``n_sampled`` carries the per-doc sample size — the query
    side of the containment join. Docs with no k-grams emit nothing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pfutil_spark.operators.hll_agg import _varbin_buffers

    pruned = df.select(id_col, text)
    fields = [df.schema[id_col], StructField("shingle", LongType(), False)]
    if sample is not None:
        fields.append(StructField("n_sampled", LongType(), False))
    schema = StructType(fields)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pfutil_spark.kernel.sketch_common import segment_ranks

        for batch in batches:
            t = batch.column(text)
            if t.null_count:
                batch = batch.filter(pc.is_valid(t))
                t = batch.column(text)
            if len(batch) == 0:
                continue
            data, offsets = _varbin_buffers(t)
            wh, bounds = _kgram_hashes(data, offsets, k)
            doc = np.repeat(
                np.arange(len(bounds) - 1, dtype=np.int64), np.diff(bounds)
            )
            order = np.lexsort((wh, doc))
            doc_s, wh_s = doc[order], wh[order]
            first = np.ones(len(doc_s), dtype=bool)
            first[1:] = (doc_s[1:] != doc_s[:-1]) | (wh_s[1:] != wh_s[:-1])
            doc_s, wh_s = doc_s[first], wh_s[first]
            if sample is not None:
                keep = segment_ranks(doc_s) < sample
                doc_s, wh_s = doc_s[keep], wh_s[keep]
            arrays = [
                batch.column(id_col).take(pa.array(doc_s)),
                pa.array(wh_s.view(np.int64)),
            ]
            names = [id_col, "shingle"]
            if sample is not None:
                n_s = np.bincount(doc_s, minlength=len(bounds) - 1)[doc_s]
                arrays.append(pa.array(n_s.astype(np.int64)))
                names.append("n_sampled")
            yield pa.record_batch(arrays, names=names)

    return pruned.mapInArrow(fn, schema)


def containment_exact_pairs(
    df: DataFrame, pairs: DataFrame, text: str, id_col: str, k: int = 5
) -> DataFrame:
    """EXACT containment |S_a ∩ S_b| / |S_a| for given (id_a, id_b)
    pairs — the candidate-bounded verify stage (shared machinery:
    :func:`_pair_shingle_scores`; never runs per corpus row)."""

    def cont(sx: set, sy: set) -> float:
        return (len(sx & sy) / len(sx)) if sx else 1.0

    return _pair_shingle_scores(df, pairs, text, id_col, k, cont, "containment")


def containment_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 5,
    sample: int = 64,
    min_containment: float = 0.8,
    candidate_floor: float | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Ordered near-dup pairs (id_a, id_b, containment) with EXACT
    containment of A's k-gram set in B's >= ``min_containment``.

    Plan (the 100-TB shape): the query side ships only each doc's
    bottom-``sample`` shingle signature (<= s rows/doc); the corpus side
    is the distinct (doc, shingle) table — ONE equi-join on the shingle
    hash (the decontamination-join shape, never all-pairs), a count
    aggregate, the hypergeometric candidate gate, then exact
    verification on the surviving pairs only. The bottom-s signature is
    a uniform sample of A's shingles, so overlap/s estimates C(A in B)
    with binomial error ~ sqrt(C(1-C)/s); the default gate
    ``candidate_floor = min_containment / 2`` puts the miss probability
    at the hypergeometric tail P[X < s/2 | C >= 0.8] ~ 1e-10 at s=64 —
    effectively recall 1, then exact verify removes every false accept.

    ``max_shingle_df`` (scale knob, default off) drops shingles whose
    corpus doc-frequency exceeds the cap from the JOIN only —
    ubiquitous boilerplate shingles otherwise fan a single signature
    row out to millions of candidates; capped runs trade a documented
    recall haircut on pairs whose overlap is ONLY boilerplate."""
    if candidate_floor is None:
        candidate_floor = min_containment / 2.0
    a = shingle_pairs_df(df, text, id_col, k, sample=sample).select(
        F.col(id_col).alias("id_a"), "shingle", "n_sampled"
    )
    b = shingle_pairs_df(df, text, id_col, k).select(
        F.col(id_col).alias("id_b"), "shingle"
    )
    if max_shingle_df is not None:
        hot = (
            b.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__pf_df"))
            .filter(F.col("__pf_df") > max_shingle_df)
            .select("shingle")
        )
        b = b.join(F.broadcast(hot), "shingle", "left_anti")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b", "n_sampled")
        .agg(F.count(F.lit(1)).alias("__pf_m"))
        .filter(
            F.col("__pf_m")
            >= F.greatest(
                F.lit(1), F.ceil(F.lit(candidate_floor) * F.col("n_sampled"))
            )
        )
        .select("id_a", "id_b")
    )
    verified = containment_exact_pairs(df, cand, text, id_col, k)
    return verified.filter(F.col("containment") >= min_containment)
