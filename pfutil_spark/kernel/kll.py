"""KLL quantile sketch kernel (Karnin, Lang & Liberty, "Optimal quantile
approximation in streams", FOCS 2016). No reference-repo counterpart
(SURVEY.md §2.4) — mergeable zero/update/merge/quantile/rank/dump/restore
contract.

Rank error eps = O(1/k * sqrt(log(1/delta))) with O(k * log log n) space.
Compaction randomness is seeded deterministically from the sketch's own
compaction counter, so a single-threaded replay is reproducible; across
arbitrary merge orders the ESTIMATES (not bytes) are stable within the
rank-error bound — the property the tests assert.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"KLLS"
DEFAULT_K = 200
_C = 2.0 / 3.0
_MIN_CAP = 8


class KllSketch:
    __slots__ = ("k", "levels", "n", "compactions")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.compactions = 0

    # -- capacities ---------------------------------------------------------

    def _cap(self, level: int) -> int:
        """Capacity of ``level``: k at the top, shrinking by c going down."""
        height = len(self.levels) - 1 - level
        return max(_MIN_CAP, int(np.ceil(self.k * (_C ** height))))

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- update / compact ---------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for i in range(len(self.levels)):
                if len(self.levels[i]) > self._cap(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        buf = np.sort(self.levels[i])
        # deterministic coin: seeded by (compaction index, level)
        rng = np.random.default_rng(1_000_003 * self.compactions + i)
        self.compactions += 1
        offset = int(rng.integers(0, 2))
        promoted = buf[offset::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "KllSketch") -> "KllSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self.compactions = max(self.compactions, other.compactions) + 1
        self._compress()
        return self

    # -- queries --------------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        """Value(s) at normalized rank(s) q in [0, 1]."""
        it, wt = self._weighted()
        if len(it) == 0:
            return np.full(np.shape(q) or (), np.nan)
        cum = np.cumsum(wt)
        targets = np.atleast_1d(np.asarray(q, dtype=np.float64)) * cum[-1]
        pos = np.searchsorted(cum, targets, side="left")
        pos = np.clip(pos, 0, len(it) - 1)
        out = it[pos]
        return out if np.ndim(q) else out[0]

    def rank(self, value: float | np.ndarray) -> np.ndarray:
        """Estimated normalized rank(s) of value(s)."""
        it, wt = self._weighted()
        if len(it) == 0:
            return np.full(np.shape(value) or (), np.nan)
        cum = np.concatenate(([0], np.cumsum(wt)))
        pos = np.searchsorted(it, np.atleast_1d(value), side="right")
        out = cum[pos] / cum[-1]
        return out if np.ndim(value) else out[0]

    # -- serialization ----------------------------------------------------------

    def encode(self) -> bytes:
        head = MAGIC + np.array(
            [1, self.k, len(self.levels), self.compactions], dtype="<u4"
        ).tobytes()
        head += np.array([self.n], dtype="<i8").tobytes()
        sizes = np.array([len(lv) for lv in self.levels], dtype="<u4").tobytes()
        body = b"".join(lv.astype("<f8").tobytes() for lv in self.levels)
        return head + sizes + body


def decode(buf: bytes) -> KllSketch:
    if buf[:4] != MAGIC:
        raise ValueError("Invalid KLL representation")
    ver, k, n_levels, compactions = np.frombuffer(buf, dtype="<u4", count=4, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported KLL version {ver}")
    n = int(np.frombuffer(buf, dtype="<i8", count=1, offset=20)[0])
    sizes = np.frombuffer(buf, dtype="<u4", count=int(n_levels), offset=28)
    sk = KllSketch(int(k))
    sk.n = n
    sk.compactions = int(compactions)
    sk.levels = []
    off = 28 + 4 * int(n_levels)
    for s in sizes:
        sk.levels.append(
            np.frombuffer(buf, dtype="<f8", count=int(s), offset=off).copy()
        )
        off += 8 * int(s)
    return sk


def merge_all(sketches: list[KllSketch]) -> KllSketch:
    out = sketches[0]
    for s in sketches[1:]:
        out.merge(s)
    return out


# ---------------------------------------------------------------------------
# vectorized grouped fold over flat buffers (zero per-group Python).
# ---------------------------------------------------------------------------

def fold_groups_level0(
    values: np.ndarray, inverse: np.ndarray, n_groups: int, k: int = DEFAULT_K
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped direct-emit fold for the high-cardinality regime: each
    group's (NaN-filtered) values become a single level-0 buffer —
    byte-identical to ``KllSketch(k).update(group_values)``. Groups that
    exceed the level-0 capacity (rare by construction in the near-unique
    regime, but a skewed key can concentrate a batch) are compacted
    through the scalar sketch so the emitted buffer never exceeds the
    O(k log log n) space contract. Returns flat wire buffers
    ``(data, offsets)``."""
    from .sketch_common import segment_ranks, write_le_flat

    v = np.asarray(values, dtype=np.float64)
    g = np.asarray(inverse, dtype=np.int64)
    m = ~np.isnan(v)
    v, g = v[m], g[m]
    order = np.argsort(g, kind="stable")  # within-group original order
    v, g = v[order], g[order]
    counts = np.bincount(g, minlength=n_groups).astype(np.int64)
    big = counts > max(_MIN_CAP, k)  # level-0 capacity: update would compact
    enc_big: dict[int, bytes] = {}
    if big.any():
        gstarts = np.concatenate(([0], np.cumsum(counts)))
        for gi in np.flatnonzero(big):
            sk = KllSketch(k)
            sk.update(v[gstarts[gi] : gstarts[gi + 1]])
            enc_big[int(gi)] = sk.encode()
    row_len = 32 + 8 * counts
    if enc_big:
        for gi, b in enc_big.items():
            row_len[gi] = len(b)
    offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(row_len, out=offsets[1:])
    data = np.zeros(int(offsets[-1]), dtype=np.uint8)
    small = ~big
    hp = offsets[:-1][small]
    for i, byte in enumerate(MAGIC):
        data[hp + i] = byte
    ones = np.ones(int(small.sum()), dtype=np.int64)
    cs = counts[small]
    write_le_flat(data, hp + 4, ones, 4)            # version
    write_le_flat(data, hp + 8, ones * k, 4)        # k
    write_le_flat(data, hp + 12, ones, 4)           # n_levels = 1
    write_le_flat(data, hp + 16, ones * 0, 4)       # compactions = 0
    write_le_flat(data, hp + 20, cs, 8)             # n (<i8, nonnegative)
    write_le_flat(data, hp + 28, cs, 4)             # sizes[0]
    vsel = small[g]
    if vsel.any():
        gs = g[vsel]
        pos = offsets[gs] + 32 + 8 * segment_ranks(gs)
        write_le_flat(data, pos, v[vsel].view(np.uint64), 8)
    for gi, b in enc_big.items():
        data[offsets[gi] : offsets[gi] + len(b)] = np.frombuffer(b, dtype=np.uint8)
    return data, offsets


def valid_flat(data: np.ndarray, offsets: np.ndarray, k: int) -> np.ndarray:
    """Non-raising per-buffer structural validity (merge passthrough
    probe): magic / version / matching k / level-size bookkeeping
    consistent with the buffer length. ``encode(decode(b)) == b`` for
    every structurally valid buffer, so validity gates passthrough."""
    from .sketch_common import probe_headers, read_le_flat, segment_ranks

    ok, hp, lens = probe_headers(data, offsets, MAGIC, 32)
    if not ok.any():
        return ok
    ok &= read_le_flat(data, hp + 4, 4) == 1
    ok &= read_le_flat(data, hp + 8, 4).astype(np.int64) == k
    nlv = read_le_flat(data, hp + 12, 4).astype(np.int64)
    ok &= (nlv >= 1) & (lens >= 28 + 4 * nlv)
    rows = np.flatnonzero(ok)
    if len(rows):
        seg = np.repeat(np.arange(len(rows), dtype=np.int64), nlv[rows])
        sizes = read_le_flat(
            data, offsets[rows][seg] + 28 + 4 * segment_ranks(seg), 4
        ).astype(np.int64)
        tot = np.bincount(seg, weights=sizes.astype(np.float64), minlength=len(rows))
        ok[rows] = lens[rows] == 28 + 4 * nlv[rows] + 8 * tot.astype(np.int64)
    return ok
