"""Bloom filter kernel (Bloom 1970; k-hash construction via the
Kirsch-Mitzenmacher double-hashing theorem, ESA 2006). No reference-repo
counterpart (SURVEY.md §2.4) — mergeable zero/update/merge/contains/
dump/restore contract; merge = bitwise OR (idempotent, like HLL max).

FPR ~= (1 - e^(-k*n/m))^k; no false negatives. Usable as a broadcast
semi-join pre-filter (see operators.bloom).
"""

from __future__ import annotations

import math

import numpy as np

from .sketch_common import hash_family, to_u64

MAGIC = b"BLMF"
DEFAULT_BITS = 1 << 20
DEFAULT_K = 7


def params_for(expected_n: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) sized for ``expected_n`` items at target FPR."""
    m = max(64, int(-expected_n * math.log(fpr) / (math.log(2) ** 2)))
    m = 1 << (m - 1).bit_length()  # power of two for cheap modulo
    k = max(1, round(m / max(expected_n, 1) * math.log(2)))
    return m, min(k, 30)


def empty(m_bits: int = DEFAULT_BITS) -> np.ndarray:
    return np.zeros(m_bits >> 3, dtype=np.uint8)


def _positions(h: np.ndarray, m_bits: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(n*k,) bit positions via double hashing h1 + i*h2 (mod m)."""
    h1 = hash_family(h, 0)
    h2 = hash_family(h, 1) | np.uint64(1)  # odd stride
    mu = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        pos = np.concatenate([(h1 + np.uint64(i) * h2) % mu for i in range(k)])
    return (pos >> np.uint64(3)).astype(np.int64), (pos & np.uint64(7)).astype(np.uint8)


def update(state: np.ndarray, hashes: np.ndarray, k: int = DEFAULT_K) -> None:
    byte_idx, bit_idx = _positions(to_u64(np.asarray(hashes)), len(state) << 3, k)
    np.bitwise_or.at(state, byte_idx, np.uint8(1) << bit_idx)


def merge(states: list[np.ndarray]) -> np.ndarray:
    out = states[0].copy()
    for s in states[1:]:
        np.bitwise_or(out, s, out=out)
    return out


def contains(state: np.ndarray, hashes: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """Boolean per queried item; no false negatives."""
    h = to_u64(np.asarray(hashes))
    n = len(h)
    byte_idx, bit_idx = _positions(h, len(state) << 3, k)
    hits = (state[byte_idx] >> bit_idx) & np.uint8(1)
    return hits.reshape(k, n).all(axis=0)


def fill_ratio(state: np.ndarray) -> float:
    return float(np.unpackbits(state).mean())


def encode(state: np.ndarray, k: int = DEFAULT_K) -> bytes:
    head = MAGIC + np.array([1, len(state) << 3, k], dtype="<u4").tobytes()
    return head + state.tobytes()


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """-> (bit array bytes, k)."""
    if buf[:4] != MAGIC:
        raise ValueError("Invalid Bloom representation")
    ver, m_bits, k = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported Bloom version {ver}")
    state = np.frombuffer(buf, dtype=np.uint8, offset=16, count=int(m_bits) >> 3).copy()
    return state, int(k)
