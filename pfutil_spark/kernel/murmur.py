"""Vectorized 64-bit MurmurHash2 (MurmurHash64A), Redis-HLL compatible.

Re-implements the exact semantics of the reference's scalar Java version
(`/root/reference/core/src/main/java/com/mayreh/pfutil/HllUtil.java:19-66`:
constants m=0xc6a4a7935bd1e995, r=47, little-endian 8-byte chunks, 1-7 byte
tail XOR + one extra multiply, 3-step finalization) but vectorized ACROSS
ROWS with numpy uint64 modular arithmetic: the only Python-level loop is
over chunk *columns*, bounded by the longest element in the batch, never
over rows.

Pinned by the reference test vector
(`core/src/test/java/com/mayreh/pfutil/HllUtilTest.java:19-25`):
murmur64a(b"Lorem ipsum dolor sit amet, consectetur adipisicing elit",
seed=0xe17a1465) == 0x0920e0c1b7eeb261.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)

# Redis HLL hash seed (reference: v4/HllhdrV4.java:53, v5/HllhdrV5.java:48)
HLL_SEED = 0xADC83B19


def _pack_rows(datas: Sequence[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length byte strings into an (n, width) uint64
    little-endian chunk matrix (zero padded) plus a length vector.

    No per-row Python: the scatter is one fancy-indexed assignment.
    """
    n = len(datas)
    lens = np.fromiter((len(d) for d in datas), count=n, dtype=np.int64)
    if n == 0:
        return np.zeros((0, 1), dtype=np.uint64), lens
    max_len = int(lens.max(initial=0))
    width = max((max_len + 7) // 8, 1)

    if max_len > 0 and bool((lens == max_len).all()):
        # uniform-width fast path (e.g. sha256 hex = 64 bytes): no scatter
        flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
        if max_len % 8 == 0:
            u64 = flat.reshape(n, max_len).view("<u8")
            return u64, lens
        padded = np.zeros((n, width * 8), dtype=np.uint8)
        padded[:, :max_len] = flat.reshape(n, max_len)
        return padded.view("<u8"), lens

    padded = np.zeros((n, width * 8), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        col_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        padded[row_idx, col_idx] = flat
    return padded.view("<u8"), lens


def _pack_flat(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack rows described by Arrow-style (values, offsets) buffers —
    row i is ``data[offsets[i]:offsets[i+1]]`` — into the (n, width)
    uint64 chunk matrix. Fully zero-copy for uniform multiple-of-8 row
    widths (e.g. sha256 hex); one vectorized scatter otherwise."""
    offsets = offsets.astype(np.int64, copy=False)
    lens = np.diff(offsets)
    n = len(lens)
    if n == 0:
        return np.zeros((0, 1), dtype=np.uint64), lens
    max_len = int(lens.max(initial=0))
    width = max((max_len + 7) // 8, 1)
    seg = data[int(offsets[0]) : int(offsets[-1])]
    if max_len > 0 and bool((lens == max_len).all()):
        if max_len % 8 == 0:
            seg = np.ascontiguousarray(seg)
            return seg.reshape(n, max_len).view("<u8"), lens
        padded = np.zeros((n, width * 8), dtype=np.uint8)
        padded[:, :max_len] = seg.reshape(n, max_len)
        return padded.view("<u8"), lens
    padded = np.zeros((n, width * 8), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts_rel = offsets[:-1] - offsets[0]
        col_idx = np.arange(total, dtype=np.int64) - np.repeat(starts_rel, lens)
        padded[row_idx, col_idx] = seg
    return padded.view("<u8"), lens


def murmur64a_flat(
    data: np.ndarray, offsets: np.ndarray, seed: int = HLL_SEED
) -> np.ndarray:
    """MurmurHash64A over Arrow (values, offsets) buffers — the zero-copy
    hot path used by the mapInArrow partial stage."""
    u64, lens = _pack_flat(data, offsets)
    return murmur64a_packed(u64, lens, seed)


def murmur64a(datas: Sequence[bytes], seed: int = HLL_SEED) -> np.ndarray:
    """MurmurHash64A of each byte string; returns (n,) uint64.

    Exact parity with the Java reference including wrap-around multiply,
    unsigned right shifts, and the tail-byte handling.
    """
    u64, lens = _pack_rows(datas)
    return murmur64a_packed(u64, lens, seed)


def murmur64a_packed(u64: np.ndarray, lens: np.ndarray, seed: int = HLL_SEED) -> np.ndarray:
    n, width = u64.shape
    with np.errstate(over="ignore"):
        lens_u = lens.astype(np.uint64)
        h = np.uint64(seed & 0xFFFFFFFF) ^ (lens_u * _M)
        if n == 0:
            return h
        nchunks = (lens >> 3).astype(np.int64)
        tail = (lens & 7).astype(np.uint64)
        has_tail = tail > 0

        max_chunks = int(nchunks.max(initial=0))
        uniform = bool((lens == lens[0]).all())

        for c in range(min(width, max_chunks + 1)):
            k = u64[:, c]
            if uniform:
                # every row takes the same branch at column c
                if c < int(nchunks[0]):
                    k = k * _M
                    k = k ^ (k >> _R)
                    k = k * _M
                    h = (h ^ k) * _M
                elif bool(has_tail[0]):
                    mask = (np.uint64(1) << (tail * np.uint64(8))) - np.uint64(1)
                    h = (h ^ (k & mask)) * _M
                continue
            full = nchunks > c
            kk = k * _M
            kk = kk ^ (kk >> _R)
            kk = kk * _M
            h_full = (h ^ kk) * _M
            is_tail = (nchunks == c) & has_tail
            tmask = (np.uint64(1) << (tail * np.uint64(8))) - np.uint64(1)
            h_tail = (h ^ (k & tmask)) * _M
            h = np.where(full, h_full, np.where(is_tail, h_tail, h))

        h = h ^ (h >> _R)
        h = h * _M
        h = h ^ (h >> _R)
    return h


def murmur64a_scalar(data: bytes, seed: int = HLL_SEED) -> int:
    """Plain-Python reference implementation (for differential testing of
    the vectorized kernel only — never used in the Spark hot path)."""
    mask = (1 << 64) - 1
    m = 0xC6A4A7935BD1E995
    h = ((seed & 0xFFFFFFFF) ^ (len(data) * m)) & mask
    end = len(data) - (len(data) & 7)
    for p in range(0, end, 8):
        k = int.from_bytes(data[p : p + 8], "little")
        k = (k * m) & mask
        k ^= k >> 47
        k = (k * m) & mask
        h ^= k
        h = (h * m) & mask
    t = len(data) & 7
    if t:
        h ^= int.from_bytes(data[end:], "little")
        h = (h * m) & mask
    h ^= h >> 47
    h = (h * m) & mask
    h ^= h >> 47
    return h
