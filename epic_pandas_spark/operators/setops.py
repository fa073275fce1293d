"""Set operations on frames and key sets (SURVEY.md §2.7).

The reference does set math on indexes: concat = UNION ALL
(/root/reference/epic/pandas/utils.py:489), `index.intersection`
(utils.py:338), `index.symmetric_difference` (utils.py:512), `index.isin`
membership (utils.py:489). Spark's set operators shuffle on the full row;
key-level ops project first so only the key columns move.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from epic_pandas_spark.keyed import as_keys, null_safe_key_cond as _null_safe_cond


def union_all(*dfs: DataFrame, allow_missing_columns: bool = True) -> DataFrame:
    """Row-wise concat of any number of frames, by column name, null-filling
    columns absent on one side (schema union, create.py:144-160)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing_columns)
    return out


def intersect_keys(df1: DataFrame, df2: DataFrame, key: str | Sequence[str] | None = None) -> DataFrame:
    """Key-set intersection as ONE grouped aggregate (same single-shuffle
    shape as symmetric_difference; Spark's INTERSECT plans a distinct plus
    a join). GROUP BY's null-equality keeps pandas' NaN-matching
    intersection semantics."""
    keys = as_keys(key)
    a = df1.select(*keys).withColumn("__side", F.lit(1))
    b = df2.select(*keys).withColumn("__side", F.lit(2))
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.max(F.col("__side") == 1).alias("__in_a"),
            F.max(F.col("__side") == 2).alias("__in_b"),
        )
        .filter(F.col("__in_a") & F.col("__in_b"))
        .select(*keys)
    )


def symmetric_difference(
    df1: DataFrame, df2: DataFrame, key: str | Sequence[str] | None = None
) -> DataFrame:
    """(A∖B) ∪ (B∖A) on key sets — UNION ALL with side markers into ONE
    grouped aggregate: each key groups its occurrences from both sides,
    and a key seen on both is dropped. One shuffle total (the full-outer
    formulation costs two distinct shuffles plus the join's, and its
    null-safe variant re-exchanges both sides). Null-safe for free:
    GROUP BY treats nulls as equal (SQL semantics), matching pandas
    Index.symmetric_difference's NaN cancellation."""
    keys = as_keys(key)
    a = df1.select(*keys).withColumn("__side", F.lit(1))
    b = df2.select(*keys).withColumn("__side", F.lit(2))
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.max(F.col("__side") == 1).alias("__in_a"),
            F.max(F.col("__side") == 2).alias("__in_b"),
        )
        .filter(~(F.col("__in_a") & F.col("__in_b")))
        .select(*keys)
    )


def semi_join(df: DataFrame, keys_df: DataFrame, key: str | Sequence[str] | None = None) -> DataFrame:
    """`index.isin` membership filter (utils.py:489) as a LEFT SEMI join —
    Catalyst broadcasts the key side when small. Null-safe: pandas isin
    matches NaN, so a null key in ``keys_df`` admits null-key rows."""
    keys = as_keys(key)
    o, n = df.alias("__sj_o"), keys_df.select(*keys).alias("__sj_n")
    return o.join(n, on=_null_safe_cond("__sj_o", "__sj_n", keys), how="left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, key: str | Sequence[str] | None = None) -> DataFrame:
    keys = as_keys(key)
    o, n = df.alias("__aj_o"), keys_df.select(*keys).alias("__aj_n")
    return o.join(n, on=_null_safe_cond("__aj_o", "__aj_n", keys), how="left_anti")
