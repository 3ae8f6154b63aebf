"""t-digest kernel (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", arXiv:1902.04023). No reference-repo
counterpart (SURVEY.md §2.4) — mergeable zero/update/merge/quantile/
dump/restore contract.

This is the *merging* variant with the normalized arcsine scale function
k(q) = delta * (asin(2q-1)/pi + 1/2), implemented by k-space bucket
quantization so a whole Arrow batch compresses in one vectorized pass
(no per-point Python loop). Relative accuracy concentrates at the tails;
centroid count is bounded by ~delta.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"TDIG"
DEFAULT_DELTA = 100


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = DEFAULT_DELTA):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self._compress(
            np.concatenate([self.means, values]),
            np.concatenate([self.weights, np.ones(len(values))]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means):
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
            self._compress(
                np.concatenate([self.means, other.means]),
                np.concatenate([self.weights, other.weights]),
            )
        return self

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """One vectorized pass: sort by mean, quantize cumulative rank into
        k-space buckets, aggregate each bucket into one centroid."""
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        q_mid = (np.cumsum(w) - 0.5 * w) / total
        k = self.delta * (np.arcsin(2.0 * np.clip(q_mid, 0.0, 1.0) - 1.0) / np.pi + 0.5)
        bucket = np.floor(k).astype(np.int64)
        # aggregate per bucket (weighted mean), preserving order
        uniq, inv = np.unique(bucket, return_inverse=True)
        wsum = np.bincount(inv, weights=w)
        msum = np.bincount(inv, weights=w * m)
        self.means = msum / wsum
        self.weights = wsum

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        """Interpolated value(s) at quantile(s) q in [0, 1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return out if np.ndim(q) else out[0]
        w = self.weights
        total = w.sum()
        cum_mid = np.cumsum(w) - 0.5 * w  # centroid midpoints in rank space
        targets = np.clip(qs, 0.0, 1.0) * total
        xs = np.concatenate(([0.0], cum_mid, [total]))
        ys = np.concatenate(([self.vmin], self.means, [self.vmax]))
        out = np.interp(targets, xs, ys)
        return out if np.ndim(q) else out[0]

    def cdf(self, value: float | np.ndarray) -> np.ndarray:
        vs = np.atleast_1d(np.asarray(value, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(vs), np.nan)
            return out if np.ndim(value) else out[0]
        total = self.weights.sum()
        cum_mid = np.cumsum(self.weights) - 0.5 * self.weights
        xs = np.concatenate(([self.vmin], self.means, [self.vmax]))
        ys = np.concatenate(([0.0], cum_mid, [total])) / total
        out = np.interp(vs, xs, ys)
        return out if np.ndim(value) else out[0]

    def encode(self) -> bytes:
        head = MAGIC + np.array([1, self.delta, len(self.means)], dtype="<u4").tobytes()
        head += np.array([self.vmin, self.vmax], dtype="<f8").tobytes()
        return head + self.means.astype("<f8").tobytes() + self.weights.astype("<f8").tobytes()


def decode(buf: bytes) -> TDigest:
    if buf[:4] != MAGIC:
        raise ValueError("Invalid t-digest representation")
    ver, delta, n_c = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported t-digest version {ver}")
    td = TDigest(int(delta))
    td.vmin, td.vmax = np.frombuffer(buf, dtype="<f8", count=2, offset=16)
    off = 32
    td.means = np.frombuffer(buf, dtype="<f8", count=int(n_c), offset=off).copy()
    off += 8 * int(n_c)
    td.weights = np.frombuffer(buf, dtype="<f8", count=int(n_c), offset=off).copy()
    return td


def merge_all(digests: list[TDigest]) -> TDigest:
    out = digests[0]
    for d in digests[1:]:
        out.merge(d)
    return out
