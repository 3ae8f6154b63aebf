"""Data-layout keys: Z-order (Morton) interleaving for multi-dimension
locality — sort/range-partition a 100-TB table by a Morton key of two
pruning dimensions and min-max file skipping works for BOTH predicates
instead of one (the standard lakehouse OPTIMIZE ZORDER trick, public
technique). Pure bigint shift/mask codegen (no Python, no UDF), and the
bit arithmetic is identical in any engine with 64-bit integers, so it
is EXACT DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic spread masks: interleave zeros between the low 32 bits
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(c: Column) -> Column:
    for shift, mask in _SPREAD:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton_key_col(a: str | Column, b: str | Column, bits: int = 16) -> Column:
    """64-bit Morton (Z-order) key interleaving the low ``bits`` bits of
    two non-negative integer columns: bit i of ``a`` lands at position
    2i, bit i of ``b`` at 2i+1. Inputs are masked to ``bits`` bits
    (callers bucket/clamp their dimensions first — masking wraps, it
    does not clamp); ``bits`` must be in [1, 31] so the key stays a
    positive int64. NULL in either input yields a NULL key.

    Implementation is the classic shift-and-mask bit spread (5 steps
    per dimension) — pure JVM codegen, exactly reproducible in any
    64-bit-integer engine. Spread(x) for x < 2^32 never overflows:
    every step masks back below 2^63.
    """
    if not isinstance(bits, int) or not 1 <= bits <= 31:
        raise ValueError(f"bits={bits}: must be an int in [1, 31]")
    m = (1 << bits) - 1
    ca = (F.col(a) if isinstance(a, str) else a).cast("long").bitwiseAND(F.lit(m))
    cb = (F.col(b) if isinstance(b, str) else b).cast("long").bitwiseAND(F.lit(m))
    return _spread_bits(ca).bitwiseOR(F.shiftleft(_spread_bits(cb), 1))


def morton_sql_expr(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The ANSI-SQL spelling of :func:`morton_key_col` over two SQL
    expressions — for registering layout keys in external engines and
    for the DuckDB oracles. Same masks, same order of operations;
    ``a_expr``/``b_expr`` must be SQL fragments you control (this
    composes strings — never pass user input)."""
    if not isinstance(bits, int) or not 1 <= bits <= 31:
        raise ValueError(f"bits={bits}: must be an int in [1, 31]")
    m = (1 << bits) - 1

    def spread(e: str) -> str:
        out = f"(CAST({e} AS BIGINT) & {m})"
        for shift, mask in _SPREAD:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    return f"({spread(a_expr)} | ({spread(b_expr)} << 1))"
