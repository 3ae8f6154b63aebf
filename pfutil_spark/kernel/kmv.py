"""KMV (k-minimum-values) / theta sketch for distinct counting under
set operations (Beyer, Haas, Reinwald, Sismanis & Gemulla, "On synopses
for distinct-value estimation under multiset operations", SIGMOD 2007;
the threshold framework follows the Apache DataSketches theta-sketch
formulation). No reference-repo counterpart (SURVEY.md §2.4 extension
family) — same zero/update/merge/estimate/dump/restore contract as the
other kernels.

Why it exists next to HLL: HLL intersections go through
inclusion-exclusion, so their error is relative to the UNION — a small
intersection of two large sets drowns. KMV keeps an actual uniform
sample of the distinct-hash space (the k smallest 64-bit hashes), so
intersections / differences / Jaccard are estimated directly on the
sample with error relative to the threshold-scaled result:
RSE ≈ 1/sqrt(k-2) for the distinct estimate (k=2048 → ~2.2%).

State: the sorted array of the k smallest DISTINCT uint64 hashes seen.
That set is a pure function of the input value set — updates and merges
in ANY partitioning / order produce byte-identical sketches (the
library's north-star invariant, stronger than DataSketches' own
union-order guarantee).

Estimator (unbiased KMV): with fewer than k entries the sketch IS the
distinct set (exact); at capacity, E[distinct] = (k-1) / U_(k) where
U_(k) = entries[k-1] / 2^64 is the k-th smallest normalized hash.

Set ops use the inclusive threshold L = min over inputs of thr(X),
thr(X) = 2^64-1 exact-regime else entries[k-1]; every true member of the
combined set survives into the op's sample iff its hash <= L (uniform
with probability (L+1)/2^64), so |sample| / P is the estimate and the
exact regime falls out with P = 1.
"""

from __future__ import annotations

import numpy as np

from .sketch_common import read_le_flat, segment_ranks, to_u64, write_le_flat

MAGIC = b"KMVS"
DEFAULT_K = 2048
_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)
_SPAN = float(2**64)


class KmvSketch:
    __slots__ = ("k", "entries")

    def __init__(self, k: int = DEFAULT_K):
        if k < 3:
            raise ValueError(f"kmv k={k}: need k >= 3 for the (k-1)/U_k estimator")
        self.k = int(k)
        self.entries = np.empty(0, dtype=np.uint64)  # sorted, distinct

    # -- building ----------------------------------------------------------

    def update(self, hashes: np.ndarray) -> "KmvSketch":
        """Fold a batch of 64-bit hashes (int64 from Spark's xxhash64 or
        uint64) into the sketch: k smallest distinct overall."""
        h = to_u64(np.asarray(hashes))
        if len(h) == 0:
            return self
        # np.unique sorts; pre-truncating the batch keeps the concat small
        hu = np.unique(h)
        if len(hu) > self.k:
            hu = hu[: self.k]
        cand = np.unique(np.concatenate([self.entries, hu]))
        self.entries = cand[: self.k]
        return self

    def merge(self, other: "KmvSketch") -> "KmvSketch":
        if other.k != self.k:
            raise ValueError(f"kmv merge: k mismatch {self.k} vs {other.k}")
        cand = np.unique(np.concatenate([self.entries, other.entries]))
        self.entries = cand[: self.k]
        return self

    # -- estimation --------------------------------------------------------

    @property
    def threshold(self) -> np.uint64:
        """Inclusive retention bound: a hash is in the sketch iff it was
        seen and h <= threshold."""
        return self.entries[self.k - 1] if len(self.entries) >= self.k else _FULL

    def estimate(self) -> float:
        if len(self.entries) < self.k:
            return float(len(self.entries))
        u_k = float(self.entries[self.k - 1]) / _SPAN
        return (self.k - 1) / u_k

    # -- wire --------------------------------------------------------------

    def encode(self) -> bytes:
        head = MAGIC + np.array([1, self.k, len(self.entries)], dtype="<u4").tobytes()
        return head + self.entries.astype("<u8").tobytes()


def decode(buf: bytes) -> KmvSketch:
    buf = bytes(buf)
    if len(buf) < 16 or buf[:4] != MAGIC:
        raise ValueError("Invalid KMV representation")
    ver, k, n = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported KMV version {ver}")
    if len(buf) != 16 + 8 * int(n) or n > k:
        raise ValueError("Invalid KMV representation")
    sk = KmvSketch(int(k))
    ent = np.frombuffer(buf, dtype="<u8", count=int(n), offset=16)
    # strictly increasing (np.diff would WRAP on uint64, hiding inversions)
    if n and not np.all(ent[1:] > ent[:-1]):
        raise ValueError("Invalid KMV representation")  # must be sorted distinct
    sk.entries = ent.astype(np.uint64)
    return sk


def merge_all(sketches: list[KmvSketch]) -> KmvSketch:
    out = sketches[0]
    for s in sketches[1:]:
        out.merge(s)
    return out


# ---------------------------------------------------------------------------
# vectorized grouped fold / merge over flat buffers (zero per-group Python
# — the same machinery family as kernel/hll.py's flat opcode scanner).
# Byte parity with the scalar path is free: the sketch state (k smallest
# distinct hashes, sorted) is a pure SET function of the inputs, and the
# wire format is a direct dump of that state.
# ---------------------------------------------------------------------------

def _fold_pairs(
    g: np.ndarray, h: np.ndarray, n_groups: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(group, hash) pairs -> encoded per-group k-min-distinct sketches.
    Returns ``(data, offsets)`` flat wire buffers (Arrow-binary-ready)."""
    order = np.lexsort((h, g))
    gs, hs = g[order], h[order]
    if len(gs):
        keep = np.empty(len(gs), dtype=bool)
        keep[0] = True
        keep[1:] = (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1])
        gs, hs = gs[keep], hs[keep]
        sel = segment_ranks(gs) < k
        gs, hs = gs[sel], hs[sel]
    counts = np.bincount(gs, minlength=n_groups).astype(np.int64)
    offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(16 + 8 * counts, out=offsets[1:])
    data = np.zeros(int(offsets[-1]), dtype=np.uint8)
    hp = offsets[:-1]
    for i, byte in enumerate(MAGIC):
        data[hp + i] = byte
    ones = np.ones(n_groups, dtype=np.int64)
    write_le_flat(data, hp + 4, ones, 4)         # version
    write_le_flat(data, hp + 8, ones * k, 4)     # k
    write_le_flat(data, hp + 12, counts, 4)      # n entries
    if len(gs):
        pos = offsets[gs] + 16 + 8 * segment_ranks(gs)
        write_le_flat(data, pos, hs, 8)          # sorted ascending per group
    return data, offsets


def fold_groups_hashes(
    hashes: np.ndarray, inverse: np.ndarray, n_groups: int, k: int = DEFAULT_K
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped KMV fold: rows ``(inverse[i], hashes[i])`` -> one encoded
    sketch per group code 0..n_groups-1, byte-identical to per-group
    ``KmvSketch.update + encode`` in any order/partitioning."""
    return _fold_pairs(
        np.asarray(inverse, dtype=np.int64), to_u64(np.asarray(hashes)), n_groups, k
    )


def entries_flat(
    data: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Validated flat parse of many wire buffers -> ``(seg_ids, entries)``
    (uint64, ascending within each segment). Raises like :func:`decode`
    on any structurally invalid buffer; also enforces the uniform ``k``
    the grouped merge requires (mirrors ``KmvSketch.merge``)."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if (lens < 16).any():
        raise ValueError("Invalid KMV representation")
    hp = offsets[:-1]
    ok = np.ones(n, dtype=bool)
    for i, byte in enumerate(MAGIC):
        ok &= data[hp + i] == byte
    if not ok.all():
        raise ValueError("Invalid KMV representation")
    ver = read_le_flat(data, hp + 4, 4)
    if (ver != 1).any():
        raise ValueError(f"unsupported KMV version {int(ver[ver != 1][0])}")
    kk = read_le_flat(data, hp + 8, 4).astype(np.int64)
    if (kk != k).any():
        raise ValueError(f"kmv merge: k mismatch {k} vs {int(kk[kk != k][0])}")
    nn = read_le_flat(data, hp + 12, 4).astype(np.int64)
    if (lens != 16 + 8 * nn).any() or (nn > kk).any():
        raise ValueError("Invalid KMV representation")
    seg = np.repeat(np.arange(n, dtype=np.int64), nn)
    ent = read_le_flat(data, offsets[seg] + 16 + 8 * segment_ranks(seg), 8)
    if len(ent) > 1:
        bad = (seg[1:] == seg[:-1]) & (ent[1:] <= ent[:-1])
        if bad.any():
            raise ValueError("Invalid KMV representation")  # not sorted distinct
    return seg, ent


def merge_groups_flat(
    data: np.ndarray,
    offsets: np.ndarray,
    group_codes: np.ndarray,
    n_groups: int,
    k: int = DEFAULT_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped KMV merge: wire buffers labeled by ``group_codes`` fold to
    one sketch per group — byte-identical to ``merge_all`` over each
    group's decodes, in one vectorized pass."""
    seg, ent = entries_flat(data, offsets, k)
    g = np.asarray(group_codes, dtype=np.int64)[seg]
    return _fold_pairs(g, ent, n_groups, k)


def valid_flat(data: np.ndarray, offsets: np.ndarray, k: int) -> np.ndarray:
    """Non-raising per-buffer validity (merge passthrough probe): same
    checks as :func:`entries_flat`, returned as a bool mask. Any valid
    KMV buffer is canonical (the encoding is a direct dump of the sorted
    distinct entry set), so validity alone gates passthrough."""
    from .sketch_common import probe_headers

    ok, hp, lens = probe_headers(data, offsets, MAGIC, 16)
    if not ok.any():
        return ok
    ok &= read_le_flat(data, hp + 4, 4) == 1
    ok &= read_le_flat(data, hp + 8, 4).astype(np.int64) == k
    nn = read_le_flat(data, hp + 12, 4).astype(np.int64)
    ok &= (lens == 16 + 8 * nn) & (nn <= k)
    rows = np.flatnonzero(ok)
    if len(rows):
        seg = np.repeat(np.arange(len(rows), dtype=np.int64), nn[rows])
        ent = read_le_flat(
            data, offsets[rows][seg] + 16 + 8 * segment_ranks(seg), 8
        )
        if len(ent) > 1:
            bad = (seg[1:] == seg[:-1]) & (ent[1:] <= ent[:-1])
            ok[rows[np.unique(seg[:-1][bad])]] = False
    return ok


# ---------------------------------------------------------------------------
# set operations (threshold framework)
# ---------------------------------------------------------------------------

def _op_scale(sketches: list[KmvSketch]) -> tuple[np.uint64, float]:
    """(inclusive threshold L, inverse sampling probability 2^64/(L+1))."""
    L = min(s.threshold for s in sketches)
    if L == _FULL:
        return L, 1.0
    return L, _SPAN / float(int(L) + 1)


def union(sketches: list[KmvSketch]) -> KmvSketch:
    """The union sketch IS the merge (k smallest distinct of the combined
    value set) — exact set semantics, byte-deterministic."""
    out = KmvSketch(sketches[0].k)
    out.entries = sketches[0].entries.copy()
    for s in sketches[1:]:
        out.merge(s)
    return out


def union_estimate(sketches: list[KmvSketch]) -> float:
    return union(sketches).estimate()


def intersect_estimate(a: KmvSketch, b: KmvSketch) -> float:
    """|A ∩ B| with error relative to the threshold-scaled sample —
    NOT inclusion-exclusion, so small intersections of large sets stay
    accurate."""
    L, scale = _op_scale([a, b])
    common = np.intersect1d(a.entries, b.entries, assume_unique=True)
    n = int(np.count_nonzero(common <= L))
    return n * scale


def a_not_b_estimate(a: KmvSketch, b: KmvSketch) -> float:
    """|A \\ B| over the shared sample below the combined threshold."""
    L, scale = _op_scale([a, b])
    only = np.setdiff1d(a.entries[a.entries <= L], b.entries, assume_unique=True)
    return len(only) * scale


def jaccard_estimate(a: KmvSketch, b: KmvSketch) -> float:
    """|A ∩ B| / |A ∪ B| from the shared sample below the combined
    threshold (both counts scale identically, so the ratio needs no
    rescaling)."""
    L, _ = _op_scale([a, b])
    sa = a.entries[a.entries <= L]
    sb = b.entries[b.entries <= L]
    n_union = len(np.union1d(sa, sb))
    if n_union == 0:
        return 0.0
    n_common = len(np.intersect1d(sa, sb, assume_unique=True))
    return n_common / n_union
