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

from .sketch_common import to_u64

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
