"""Skew-safe shuffle join: salt the hot keys of the big side and
replicate the matching rows of the small side so no single reducer
owns a hot key's entire row set.

Why this exists even with AQE: adaptive skew-join splitting only fires
for sort-merge joins whose skewed PARTITIONS it can subdivide, after
the map stage has already materialized them; it cannot help a
shuffled-hash build side, a skewed aggregation feeding the join, or a
key so hot that one (key) group alone exceeds executor memory. Salting
restructures the key space itself: the hot key becomes ``salt``
distinct shuffle keys, bounding any reducer's share at ``1/salt`` of
the hot key's rows. The join RESULT is provably identical to the
plain equi-join — salting only changes partitioning — which is what
the EXACT driver oracle grades.

Cost model (why ``hot_keys`` matters at 100 TB): replicating the whole
right side ``salt``x is fine for a dimension table but wasteful when
only a handful of keys are hot. With ``hot_keys`` given, ONLY those
keys' right rows replicate (cold rows ship once with salt 0), so the
overhead is ``|hot dim rows| * salt`` extra rows — constants, found
beforehand with :func:`pfutil_spark.operators.audit.join_skew_report`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__pf_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    salt: int = 16,
    hot_keys: Sequence | None = None,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join ``left`` (big, skewed) to ``right`` (replicated side)
    on ``on`` == ``right_on or on``, salted into ``salt`` sub-keys.

    ``left`` rows get a deterministic salt in ``[0, salt)`` hashed from
    ``salt_on`` (default: every left column — identical full rows share
    a salt, which only matters if a hot key's rows are near-duplicates;
    pass e.g. a row-id column to pin the spread). ``right`` rows are
    exploded to all ``salt`` values so every (key, salt) probe finds its
    match; the join runs on (key, salt) — a plain equi-join, never a
    cartesian (plan-gated in tests/test_skew_join.py).

    ``hot_keys``: optional driver-known list of hot key VALUES (e.g.
    the top of ``join_skew_report``). When given, only those keys are
    salted; everything else keeps salt 0 and the right side ships cold
    rows exactly once. NULL keys never match an inner equi-join; under
    ``how='left'`` NULL/cold left keys take salt 0 and survive as
    usual.

    ``how``: ``inner`` or ``left``. Right/full outer are deliberately
    unsupported: an unmatched right row would surface once PER SALT
    replica, a silent row-duplication hazard.
    """
    rk = right_on or on
    if salt < 1:
        raise ValueError(f"salt={salt}: must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: only inner/left keep replicated right rows "
            "from duplicating unmatched output"
        )
    if on not in left.columns:
        raise ValueError(f"left key {on!r} not in {left.columns}")
    if rk not in right.columns:
        raise ValueError(f"right key {rk!r} not in {right.columns}")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"reserved column name {_SALT!r} present in input")
    salt_cols = list(salt_on) if salt_on is not None else list(left.columns)
    if not salt_cols:
        raise ValueError(
            "salt_on is empty: a constant salt defeats the spread — "
            "pass None to hash all left columns"
        )
    missing = [c for c in salt_cols if c not in left.columns]
    if missing:
        raise ValueError(f"salt_on columns {missing} not in left frame")
    hk = list(hot_keys) if hot_keys is not None else None

    salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))
    if hk is not None:
        if not hk:
            raise ValueError("hot_keys is empty: pass None to salt all keys")
        is_hot_l = F.coalesce(F.col(on).isin(hk), F.lit(False))
        salt_expr = F.when(is_hot_l, salt_expr).otherwise(F.lit(0))
    l2 = left.withColumn(_SALT, salt_expr.cast("int"))

    replicas = F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1))
    ).alias(_SALT)
    if hk is None:
        r2 = right.select("*", replicas)
    else:
        is_hot_r = F.coalesce(F.col(rk).isin(hk), F.lit(False))
        r_hot = right.filter(is_hot_r).select("*", replicas)
        r_cold = right.filter(~is_hot_r).withColumn(
            _SALT, F.lit(0).cast("int")
        )
        r2 = r_hot.unionByName(r_cold)

    cond = (l2[on] == r2[rk]) & (l2[_SALT] == r2[_SALT])
    j = l2.join(r2, cond, how)
    out = [l2[c] for c in left.columns]
    out += [r2[c] for c in right.columns if c != rk or rk != on]
    return j.select(*out)
