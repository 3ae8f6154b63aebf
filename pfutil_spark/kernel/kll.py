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
