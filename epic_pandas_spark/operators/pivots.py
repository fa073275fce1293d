"""Pivot-shaped aggregation pipelines from the reference's plotting layer —
the data transforms behind two_level_pie and group_bar_hist
(/root/reference/epic/pandas/matplotlib/plot.py:197-241, 485-496). Rendering
is out of scope (SURVEY.md §7.3 item 6); these produce the exact tables the
plots consume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def grouped_value_counts_pivot(
    df: DataFrame,
    by: str,
    col: str,
    by_values: Sequence[str] | None = None,
    normalize: bool = True,
    mul: float = 1.0,
) -> DataFrame:
    """`groupby(by)[col].value_counts(normalize=True).mul(m).unstack(level=0)`
    (plot.py:485): rows = values of ``col``, columns = groups of ``by``,
    cells = (optionally normalized) counts.

    One hash-agg with pivot; passing ``by_values`` explicitly skips the
    extra distinct-discovery pass Spark otherwise needs — at scale the
    pivot columns should always be enumerated.
    Normalization divides by per-group totals computed from the pivoted
    result itself (column sums over a tiny |values|×|groups| table).
    """
    pivoted = (
        df.groupBy(col)
        .pivot(by, list(by_values) if by_values is not None else None)
        .agg(F.count(F.lit(1)))
    )
    group_cols = [c for c in pivoted.columns if c != col]
    filled = pivoted.na.fill({c: 0 for c in group_cols})
    if not normalize:
        return filled
    totals = filled.agg(*[F.sum(c).alias(c) for c in group_cols])
    return (
        filled.crossJoin(F.broadcast(totals.select(*[F.col(c).alias(f"__t_{c}") for c in group_cols])))
        .select(
            col,
            *[(F.col(c) / F.col(f"__t_{c}") * F.lit(mul)).alias(c) for c in group_cols],
        )
    )


def collapse_small_categories(
    df: DataFrame,
    group: str,
    subcat: str,
    threshold: float,
    others_label: str = "Others",
    count_col: str = "count",
) -> DataFrame:
    """Group-wise Others-collapse (plot.py:208-218): within each group,
    subcategories whose share ≤ threshold are re-keyed to ``others_label``
    and re-aggregated. Two hash-aggs + a window over the (small) aggregated
    counts — zero per-group Python."""
    counts = df.groupBy(group, subcat).agg(F.count(F.lit(1)).alias(count_col))
    w = Window.partitionBy(group)
    rekeyed = counts.withColumn(
        subcat,
        F.when(
            F.col(count_col) / F.sum(count_col).over(w) <= F.lit(threshold),
            F.lit(others_label),
        ).otherwise(F.col(subcat)),
    )
    return rekeyed.groupBy(group, subcat).agg(F.sum(count_col).alias(count_col))


def topk(
    df: DataFrame,
    order_col: str,
    k: int,
    tiebreak: Sequence[str] = (),
    ascending: bool = False,
) -> DataFrame:
    """Sorted head (plot.py:495-496): global top-k executed as
    per-partition partial top-k + single merge (TakeOrdered), never a full
    sort of the data."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(k)
