"""Skew-resilient aggregation — the salting pattern for hot keys.

AQE's skew-join splitting handles joins automatically, but a groupBy on a
power-law key (the 100 TB norm: one user/domain generating 1% of rows)
still lands entire hot keys on single reducers. Salted two-phase
aggregation bounds the largest partial: phase 1 aggregates on
(key, salt), phase 2 merges the ≤n_salts partials per key.

Works for any algebraic aggregate (sum/count/min/max); averages compose
from (sum, count) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: out_col -> (in_col_or_'*', fn) with fn in
    {'sum','count','min','max'}. Example:
        salted_agg(df, ["user"], {"n": ("*", "count"), "v": ("value", "sum")})

    The salt derives from xxhash64 of the whole row (deterministic), so
    phase-1 partials spread hot keys over ``n_salts`` reducers; phase 2
    shuffles only |keys|×n_salts rows.
    """
    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % n_salts).alias("__salt")
    phase1_exprs: list[Column] = []
    phase2_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(out))
            phase2_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(out))
            phase2_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn!r} (not algebraic)")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join for skewed keys: every left row gets a
    deterministic salt in [0, n_salts); the (small-ish) right side is
    replicated once per salt value. The shuffle then partitions on
    (key, salt), so a hot key's rows spread over ``n_salts`` reducers
    instead of landing on one.

    Use when AQE's skew-join split can't help — e.g. the skewed side
    feeds a same-keyed aggregation afterwards and you want one
    partitioning for both, or the planner lacks runtime stats. The right
    side's shuffle volume multiplies by ``n_salts``; keep it the smaller
    input.

    Only join types that don't duplicate unmatched RIGHT rows are legal
    (an unmatched right row exists ``n_salts`` times): inner, left/
    left_outer, left_semi, left_anti.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"how={how!r} not supported with salting (use one of {sorted(allowed)})")
    on = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")
