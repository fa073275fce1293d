"""Insert-or-update by key — the reference's `upsert`
(/root/reference/epic/pandas/utils.py:469-489): keep original rows whose
key is absent from the new frame, append all new rows. Row order is
explicitly not guaranteed by the reference (utils.py:487), which matches
Spark's unordered semantics exactly.

Spark-first shape: LEFT ANTI join + UNION ALL. Both sides shuffle on the
key once; when `new` is small (the common upsert case) Catalyst broadcasts
it and the anti-join is shuffle-free. At 100 TB this is the minimal-motion
plan: only the key column of `new` needs to reach `orig`'s partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from epic_pandas_spark.keyed import as_keys


def upsert(
    orig: DataFrame,
    new: DataFrame,
    key: str | Sequence[str] | None = None,
    broadcast_new: bool = True,
) -> DataFrame:
    """orig ⟕̸ new ∪ new  (anti-join + union-by-name).

    ``broadcast_new=True`` hints the usual small-delta case; pass False when
    the delta is comparable in size to the base so Catalyst picks a
    shuffle join (AQE will still re-plan if the hint is wrong).
    """
    from functools import reduce

    keys = as_keys(key)
    anti_side = F.broadcast(new.select(*keys)) if broadcast_new else new.select(*keys)
    # NULL-SAFE anti-join (<=>): pandas Index.isin matches NaN to NaN
    # (hash-based), so the reference DROPS orig's null-key rows whenever
    # new carries a null key (utils.py:489). A plain on=keys anti-join
    # would keep them (null never equi-joins) — a silent parity break on
    # null keys. EqualNullSafe remains a hash-joinable key, so the
    # broadcast anti-join plan is unchanged.
    o, n = orig.alias("__ups_o"), anti_side.alias("__ups_n")
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__ups_o.{k}").eqNullSafe(F.col(f"__ups_n.{k}"))
            for k in keys
        ],
    )
    kept = o.join(n, on=cond, how="left_anti")
    return kept.unionByName(new, allowMissingColumns=False)
