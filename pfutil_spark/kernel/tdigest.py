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

    def update_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Weighted batch update: each value carries ``weight`` units of
        rank mass (byte-weighted length quantiles, duration-weighted
        latencies, ...). Rows with NaN value/weight or weight <= 0 are
        dropped. NOTE: unlike the unit-weight path, weighted folds make
        no bit-exactness claim across batch splits (the cumulative-rank
        terms are no longer exact integers) — merges remain
        estimate-stable, same as t-digest merges generally."""
        v = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        m = ~np.isnan(v) & ~np.isnan(w) & (w > 0)
        v, w = v[m], w[m]
        if len(v) == 0:
            return
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress(
            np.concatenate([self.means, v]), np.concatenate([self.weights, w])
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


# ---------------------------------------------------------------------------
# vectorized grouped fold over flat buffers (zero per-group Python).
# ---------------------------------------------------------------------------

def _emit_groups(
    means: np.ndarray,
    wsum: np.ndarray,
    cent_g: np.ndarray,
    vmin: np.ndarray,
    vmax: np.ndarray,
    n_groups: int,
    delta: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Serialize per-group centroid lists (sorted by group, then mean)
    into flat wire buffers — the single definition of the t-digest
    layout (header 32B: MAGIC/version/delta/n_c/vmin/vmax, then means,
    then weights) shared by the unit-weight and weighted folds."""
    from .sketch_common import segment_ranks, write_le_flat

    n_cent = np.bincount(cent_g, minlength=n_groups).astype(np.int64)
    offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(32 + 16 * n_cent, out=offsets[1:])
    data = np.zeros(int(offsets[-1]), dtype=np.uint8)
    hp = offsets[:-1]
    for i, byte in enumerate(MAGIC):
        data[hp + i] = byte
    ones = np.ones(n_groups, dtype=np.int64)
    write_le_flat(data, hp + 4, ones, 4)             # version
    write_le_flat(data, hp + 8, ones * delta, 4)     # delta
    write_le_flat(data, hp + 12, n_cent, 4)          # centroid count
    write_le_flat(data, hp + 16, vmin.view(np.uint64), 8)
    write_le_flat(data, hp + 24, vmax.view(np.uint64), 8)
    if len(cent_g):
        rank = segment_ranks(cent_g)
        mpos = offsets[cent_g] + 32 + 8 * rank
        wpos = offsets[cent_g] + 32 + 8 * n_cent[cent_g] + 8 * rank
        write_le_flat(data, mpos, means.view(np.uint64), 8)
        write_le_flat(data, wpos, wsum.view(np.uint64), 8)
    return data, offsets

def fold_groups(
    values: np.ndarray, inverse: np.ndarray, n_groups: int, delta: int = DEFAULT_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped direct-emit fold: run the k-space bucket compression for
    ALL groups in one flat pass — byte-identical to
    ``TDigest(delta).update(group_values)`` per group (unit weights make
    every cumulative-rank term an exact integer, so the within-group
    arithmetic matches the scalar path bit for bit). Returns flat wire
    buffers ``(data, offsets)``."""
    v = np.asarray(values, dtype=np.float64)
    g = np.asarray(inverse, dtype=np.int64)
    m = ~np.isnan(v)
    v, g = v[m], g[m]
    order = np.lexsort((v, g))  # stable sort by value within group
    v, g = v[order], g[order]
    counts = np.bincount(g, minlength=n_groups).astype(np.int64)
    gstarts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    # within-group midpoint ranks (exact integers + one division, same
    # float ops as _compress with unit weights)
    idx_in = np.arange(len(v), dtype=np.float64) - np.repeat(
        gstarts.astype(np.float64), counts
    )
    q_mid = (idx_in + 0.5) / np.repeat(counts.astype(np.float64), counts)
    k_ = delta * (np.arcsin(2.0 * np.clip(q_mid, 0.0, 1.0) - 1.0) / np.pi + 0.5)
    bucket = np.floor(k_).astype(np.int64)
    stride = delta + 2  # k in [0, delta] (+1 slack for fp round-up)
    key = g * stride + bucket
    uniq, inv2 = np.unique(key, return_inverse=True)
    wsum = np.bincount(inv2, weights=np.ones(len(v)))
    msum = np.bincount(inv2, weights=v)
    means = msum / wsum
    cent_g = uniq // stride
    # per-group vmin/vmax from the group-sorted values
    vmin = np.full(n_groups, np.inf)
    vmax = np.full(n_groups, -np.inf)
    nz = np.flatnonzero(counts)
    if len(nz):
        vmin[nz] = v[gstarts[nz]]
        vmax[nz] = v[gstarts[nz] + counts[nz] - 1]
    return _emit_groups(means, wsum, cent_g, vmin, vmax, n_groups, delta)


def fold_groups_weighted(
    values: np.ndarray,
    weights: np.ndarray,
    inverse: np.ndarray,
    n_groups: int,
    delta: int = DEFAULT_DELTA,
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted grouped direct-emit fold: the same flat k-space bucket
    compression as :func:`fold_groups`, with each value carrying its
    weight of rank mass. Per-group cumulative weights come from one flat
    ``cumsum`` minus the group-start prefix (float association differs
    from an isolated per-group cumsum by ulps — fine: the weighted path
    is estimate-stable, not bit-exact; see ``update_weighted``).
    Groups whose rows are all dropped (NaN / non-positive weight) emit
    the canonical empty digest."""
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    g = np.asarray(inverse, dtype=np.int64)
    m = ~np.isnan(v) & ~np.isnan(w) & (w > 0)
    v, w, g = v[m], w[m], g[m]
    order = np.lexsort((v, g))  # stable sort by value within group
    v, w, g = v[order], w[order], g[order]
    counts = np.bincount(g, minlength=n_groups).astype(np.int64)
    gstarts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    totals = np.bincount(g, weights=w, minlength=n_groups)
    totals = np.where(counts > 0, totals, 1.0)  # avoid 0/0 for empty groups
    cw = np.cumsum(w)
    base = np.concatenate(([0.0], cw))[gstarts]
    q_mid = (cw - np.repeat(base, counts) - 0.5 * w) / np.repeat(
        totals, counts
    )
    k_ = delta * (np.arcsin(2.0 * np.clip(q_mid, 0.0, 1.0) - 1.0) / np.pi + 0.5)
    bucket = np.floor(k_).astype(np.int64)
    stride = delta + 2
    key = g * stride + bucket
    uniq, inv2 = np.unique(key, return_inverse=True)
    wsum = np.bincount(inv2, weights=w)
    msum = np.bincount(inv2, weights=w * v)
    means = msum / wsum
    cent_g = uniq // stride
    vmin = np.full(n_groups, np.inf)
    vmax = np.full(n_groups, -np.inf)
    nz = np.flatnonzero(counts)
    if len(nz):
        vmin[nz] = v[gstarts[nz]]
        vmax[nz] = v[gstarts[nz] + counts[nz] - 1]
    return _emit_groups(means, wsum, cent_g, vmin, vmax, n_groups, delta)


def merge_groups_flat(
    data: np.ndarray,
    offsets: np.ndarray,
    group_codes: np.ndarray,
    n_groups: int,
    delta: int = DEFAULT_DELTA,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped t-digest merge over flat wire buffers (``group_codes``
    non-decreasing, every code present): gather every partial's
    centroids in one vectorized parse, then run the k-space bucket
    compression for ALL multi-partial groups in one flat pass — the
    compress-once multiway merge, zero per-group Python.

    Groups with at most one non-empty partial emit that partial's
    centroids unchanged (byte-identical to scalar ``merge_all``, which
    skips compression when ``other`` is empty). Multi-source groups are
    estimate-stable, not byte-stable, vs the sequential scalar merge —
    the documented t-digest merge contract (NOTES.md r2): the flat
    cumulative-rank terms differ from an isolated per-group cumsum by
    ulps, and compress-once vs pairwise bucketization differ anyway.
    Compressing the union once never exceeds the error of sequential
    pairwise merges."""
    from .sketch_common import read_le_flat

    n_rows = len(offsets) - 1
    offsets = np.asarray(offsets, dtype=np.int64)
    g_row = np.asarray(group_codes, dtype=np.int64)
    if n_rows == 0 or len(g_row) == 0:
        raise ValueError("merge_groups_flat needs at least one buffer")
    lens = np.diff(offsets)
    if (lens < 32).any():
        raise ValueError("Invalid t-digest representation")
    hp = offsets[:-1]
    ok = np.ones(n_rows, dtype=bool)
    for i, byte in enumerate(MAGIC):
        ok &= data[hp + i] == byte
    if not ok.all():
        raise ValueError("Invalid t-digest representation")
    if (read_le_flat(data, hp + 4, 4) != 1).any():
        raise ValueError("unsupported t-digest version")
    if (read_le_flat(data, hp + 8, 4).astype(np.int64) != delta).any():
        raise ValueError("Invalid t-digest representation")  # param mismatch
    n_c = read_le_flat(data, hp + 12, 4).astype(np.int64)
    if (lens != 32 + 16 * n_c).any():
        raise ValueError("Invalid t-digest representation")
    vmin_r = read_le_flat(data, hp + 16, 8).view(np.float64)
    vmax_r = read_le_flat(data, hp + 24, 8).view(np.float64)

    counts_rows = np.bincount(g_row, minlength=n_groups).astype(np.int64)
    gstarts = np.minimum(
        np.concatenate(([0], np.cumsum(counts_rows)))[:-1], n_rows - 1
    )
    vmin = np.minimum.reduceat(vmin_r, gstarts)
    vmax = np.maximum.reduceat(vmax_r, gstarts)
    # groups fed by >= 2 non-empty partials recompress; others pass
    # their (already bucket-compressed, mean-sorted) centroids through
    src = np.bincount(g_row[n_c > 0], minlength=n_groups)
    multi = src >= 2

    from .sketch_common import gather_f8_runs

    cent_row = np.repeat(np.arange(n_rows, dtype=np.int64), n_c)
    means = gather_f8_runs(data, hp + 32, n_c)
    wts = gather_f8_runs(data, hp + 32 + 8 * n_c, n_c)
    cent_g = g_row[cent_row]
    sel = multi[cent_g]
    out_m = [means[~sel]]
    out_w = [wts[~sel]]
    out_g = [cent_g[~sel]]
    if sel.any():
        v, w, g = means[sel], wts[sel], cent_g[sel]
        order = np.lexsort((v, g))  # stable sort by mean within group
        v, w, g = v[order], w[order], g[order]
        ccounts = np.bincount(g, minlength=n_groups).astype(np.int64)
        cstarts = np.minimum(
            np.concatenate(([0], np.cumsum(ccounts)))[:-1], len(v) - 1
        )
        totals = np.bincount(g, weights=w, minlength=n_groups)
        totals = np.where(ccounts > 0, totals, 1.0)
        cw = np.cumsum(w)
        base = np.concatenate(([0.0], cw))[cstarts]
        q_mid = (cw - np.repeat(base, ccounts) - 0.5 * w) / np.repeat(
            totals, ccounts
        )
        k_ = delta * (
            np.arcsin(2.0 * np.clip(q_mid, 0.0, 1.0) - 1.0) / np.pi + 0.5
        )
        bucket = np.floor(k_).astype(np.int64)
        stride = delta + 2
        key = g * stride + bucket
        uniq, inv2 = np.unique(key, return_inverse=True)
        out_w.append(np.bincount(inv2, weights=w))
        out_m.append(np.bincount(inv2, weights=w * v) / out_w[-1])
        out_g.append(uniq // stride)
    means_o = np.concatenate(out_m)
    wts_o = np.concatenate(out_w)
    g_o = np.concatenate(out_g)
    order = np.lexsort((means_o, g_o))
    return _emit_groups(
        means_o[order], wts_o[order], g_o[order], vmin, vmax, n_groups, delta
    )


def valid_flat(data: np.ndarray, offsets: np.ndarray, delta: int) -> np.ndarray:
    """Non-raising per-buffer structural validity (merge passthrough
    probe): magic / version / matching delta / length == 32 + 16*n_c.
    ``encode(decode(b)) == b`` for every such buffer."""
    from .sketch_common import probe_headers, read_le_flat

    ok, hp, lens = probe_headers(data, offsets, MAGIC, 32)
    if not ok.any():
        return ok
    ok &= read_le_flat(data, hp + 4, 4) == 1
    ok &= read_le_flat(data, hp + 8, 4).astype(np.int64) == delta
    n_c = read_le_flat(data, hp + 12, 4).astype(np.int64)
    ok &= lens == 32 + 16 * n_c
    return ok
