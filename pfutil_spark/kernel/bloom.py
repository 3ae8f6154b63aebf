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


# ---------------------------------------------------------------------------
# vectorized grouped fold / merge over flat buffers (zero per-group
# Python). Bit-OR is exact and order-free, so both paths are
# byte-identical to the scalar update/merge under any partitioning.
# ---------------------------------------------------------------------------

def encode_groups(states: np.ndarray, m_bits: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_groups, m_bits/8) uint8 bit-array stack -> flat wire buffers
    ``(data, offsets)`` — per-row bytes identical to :func:`encode`."""
    n_groups, m_bytes = states.shape
    row_len = 16 + m_bytes
    out = np.zeros((n_groups, row_len), dtype=np.uint8)
    out[:, 0:4] = np.frombuffer(MAGIC, dtype=np.uint8)
    out[:, 4:16] = np.frombuffer(
        np.array([1, m_bits, k], dtype="<u4").tobytes(), dtype=np.uint8
    )
    out[:, 16:] = states
    offsets = np.arange(n_groups + 1, dtype=np.int64) * row_len
    return out.reshape(-1), offsets


def _or_bits_flat(state_flat: np.ndarray, bit_positions: np.ndarray) -> None:
    """OR the given global bit positions into a flat uint8 bit array:
    unique positions, then one ``np.bitwise_or.reduceat`` per run of
    equal target byte — no ufunc.at, no per-bit Python."""
    ub = np.unique(bit_positions)
    if len(ub) == 0:
        return
    byte = (ub >> 3).astype(np.int64)
    vals = (np.uint8(1) << (ub & 7).astype(np.uint8))
    starts = np.flatnonzero(np.diff(byte, prepend=-1))
    orred = np.bitwise_or.reduceat(vals, starts)
    state_flat[byte[starts]] |= orred


def fold_groups(
    hashes: np.ndarray,
    inverse: np.ndarray,
    n_groups: int,
    m_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped Bloom fold: all k bit positions of all rows, offset into a
    per-group global bit space, OR'd in one pass."""
    h = to_u64(np.asarray(hashes))
    g = np.asarray(inverse, dtype=np.int64)
    h1 = hash_family(h, 0)
    h2 = hash_family(h, 1) | np.uint64(1)
    mu = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        pos = np.concatenate([(h1 + np.uint64(i) * h2) % mu for i in range(k)])
    gbit = np.tile(g, k) * np.int64(m_bits) + pos.astype(np.int64)
    state = np.zeros((n_groups, m_bits >> 3), dtype=np.uint8)
    _or_bits_flat(state.reshape(-1), gbit)
    return encode_groups(state, m_bits, k)


def _decode_stack(
    data: np.ndarray, offsets: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """Validated flat parse of uniform Bloom buffers -> (n, m/8) uint8."""
    from .sketch_common import gather_uniform_rows, read_le_flat

    n = len(offsets) - 1
    m_bytes = m_bits >> 3
    if (np.diff(offsets) != 16 + m_bytes).any():
        raise ValueError("Invalid Bloom representation")
    hp = offsets[:-1]
    ok = np.ones(n, dtype=bool)
    for i, byte in enumerate(MAGIC):
        ok &= data[hp + i] == byte
    if not ok.all():
        raise ValueError("Invalid Bloom representation")
    ver = read_le_flat(data, hp + 4, 4)
    if (ver != 1).any():
        raise ValueError(f"unsupported Bloom version {int(ver[ver != 1][0])}")
    mm = read_le_flat(data, hp + 8, 4)
    kk = read_le_flat(data, hp + 12, 4)
    if (mm != m_bits).any() or (kk != k).any():
        raise ValueError("Invalid Bloom representation")  # param mismatch
    return gather_uniform_rows(data, hp + 16, m_bytes)


def merge_groups_flat(
    data: np.ndarray,
    offsets: np.ndarray,
    group_codes: np.ndarray,
    n_groups: int,
    m_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped Bloom merge (``group_codes`` non-decreasing, all codes
    present): one ``np.bitwise_or.reduceat`` over the stacked arrays."""
    mats = _decode_stack(data, offsets, m_bits, k)
    g = np.asarray(group_codes, dtype=np.int64)
    starts = np.flatnonzero(np.diff(g, prepend=-1))
    orred = np.bitwise_or.reduceat(mats, starts, axis=0)
    return encode_groups(orred, m_bits, k)


def valid_flat(
    data: np.ndarray, offsets: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """Non-raising per-buffer validity (merge passthrough probe). Any
    valid Bloom buffer is canonical (direct bit-array dump)."""
    from .sketch_common import read_le_flat

    n = len(offsets) - 1
    if len(data) < 16:
        return np.zeros(n, dtype=bool)
    lens = np.diff(offsets)
    hp = np.minimum(offsets[:-1], len(data) - 16)
    ok = lens == 16 + (m_bits >> 3)
    for i, byte in enumerate(MAGIC):
        ok &= data[hp + i] == byte
    ok &= read_le_flat(data, hp + 4, 4) == 1
    ok &= read_le_flat(data, hp + 8, 4) == m_bits
    ok &= read_le_flat(data, hp + 12, 4) == k
    return ok
