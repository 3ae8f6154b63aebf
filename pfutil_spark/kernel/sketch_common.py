"""Shared utilities for the extension sketches (count-min, Bloom, KLL,
t-digest).

These have no Redis wire-compat constraint (reference repo is HLL-only;
see SURVEY.md §2.4), so hashing is free to be fast: the Spark operator
computes ``xxhash64(col)`` JVM-side (codegen, 8 bytes/row across Arrow
instead of raw strings) and the kernels derive the per-row hash family
from that single 64-bit value with splitmix64 finalizer chains
(Steele, Lea & Flood, "Fast Splittable Pseudorandom Number Generators",
OOPSLA 2014 — public algorithm).
"""

from __future__ import annotations

import numpy as np

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 -> uint64, bijective)."""
    with np.errstate(over="ignore"):
        z = x + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_family(h: np.ndarray, i: int) -> np.ndarray:
    """i-th independent 64-bit hash derived from a base hash vector."""
    with np.errstate(over="ignore"):
        return splitmix64(h ^ (np.uint64(i + 1) * _SM_GAMMA))


def to_u64(col: np.ndarray) -> np.ndarray:
    """int64 hashes (e.g. Spark xxhash64 output) viewed as uint64."""
    return np.ascontiguousarray(col).view(np.uint64)
