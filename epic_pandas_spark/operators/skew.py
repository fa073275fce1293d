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
