"""Count-min sketch kernel (Cormode & Muthukrishnan, "An improved data
stream summary: the count-min sketch and its applications", J. Algorithms
2005). No reference-repo counterpart (SURVEY.md §2.4) — same mergeable
zero/update/merge/estimate/dump/restore contract as the HLL kernel.

State: (d, w) int64 counter matrix. Point-query overcount <= eps*N with
probability 1-delta for w = ceil(e/eps), d = ceil(ln 1/delta); merge is
element-wise addition (exact, associative, commutative).
"""

from __future__ import annotations

import numpy as np

from .sketch_common import hash_family, to_u64

MAGIC = b"CMSK"
DEFAULT_DEPTH = 5
DEFAULT_WIDTH = 2048


def empty(depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def update(state: np.ndarray, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
    """Add rows (pre-hashed uint64/int64) to the sketch, in place.
    ``counts`` adds a weight per row (default 1)."""
    d, w = state.shape
    h = to_u64(hashes)
    wu = np.uint64(w)
    for j in range(d):
        pos = (hash_family(h, j) % wu).astype(np.int64)
        if counts is None:
            np.add.at(state[j], pos, 1)
        else:
            np.add.at(state[j], pos, counts)


def merge(states: list[np.ndarray]) -> np.ndarray:
    out = states[0].copy()
    for s in states[1:]:
        out += s
    return out


def query(state: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Estimated count per queried item: min_j state[j, h_j(x)]."""
    d, w = state.shape
    h = to_u64(np.asarray(hashes))
    wu = np.uint64(w)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(d):
        pos = (hash_family(h, j) % wu).astype(np.int64)
        np.minimum(est, state[j, pos], out=est)
    return est


def total(state: np.ndarray) -> int:
    """Total weight N (any row sums to it)."""
    return int(state[0].sum())


def error_bound(depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH) -> tuple[float, float]:
    """(eps, delta): overcount <= eps*N with prob >= 1-delta."""
    return float(np.e) / width, float(np.exp(-depth))


def encode(state: np.ndarray) -> bytes:
    d, w = state.shape
    head = MAGIC + np.array([1, d, w], dtype="<u4").tobytes()
    return head + state.astype("<i8").tobytes()


def decode(buf: bytes) -> np.ndarray:
    if buf[:4] != MAGIC:
        raise ValueError("Invalid CMS representation")
    ver, d, w = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported CMS version {ver}")
    body = np.frombuffer(buf, dtype="<i8", offset=16, count=int(d) * int(w))
    return body.reshape(int(d), int(w)).copy()
