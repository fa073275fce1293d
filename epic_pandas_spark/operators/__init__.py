"""Composite relational operators over pyspark.sql.

Each module re-expresses one operator family from the reference
(SURVEY.md §2) as lazy DataFrame transformations — Catalyst plans the
physical execution; nothing here materializes data on the driver beyond
tiny aggregates (stratum counts, bin edges).
"""

from epic_pandas_spark.operators.value_counts import (
    value_counts,
    value_counts_binned,
    grouped_histogram,
)
from epic_pandas_spark.operators.upsert import upsert
from epic_pandas_spark.operators.dedup import drop_duplicates_by_key, unique_row_ids
from epic_pandas_spark.operators.stats import column_stats, weighted_average, estimate_size_bytes
from epic_pandas_spark.operators.sampling import (
    sample_at_most,
    sample_with_distribution,
    sample_with_replacement,
    split_train_val,
)
from epic_pandas_spark.operators.nulls import fillna, dropna
from epic_pandas_spark.operators.windows import (
    cumsum,
    diff,
    smooth_with_gaussian,
    split_with_overlap,
    even_slices,
    pack_sequences,
    gaussian_kernel,
)
from epic_pandas_spark.operators.pivots import (
    grouped_value_counts_pivot,
    collapse_small_categories,
    topk,
)
from epic_pandas_spark.operators.setops import union_all, intersect_keys, symmetric_difference
from epic_pandas_spark.operators.sparse import (
    dfdiag,
    coo_density,
    coo_is_square,
    coo_transpose,
    coo_elementwise,
    coo_scale,
    spmm,
)

__all__ = [
    "value_counts", "value_counts_binned", "upsert",
    "drop_duplicates_by_key", "unique_row_ids",
    "column_stats", "weighted_average",
    "sample_at_most", "sample_with_distribution", "sample_with_replacement",
    "split_train_val",
    "fillna", "dropna",
    "cumsum", "diff", "smooth_with_gaussian", "split_with_overlap",
    "union_all", "intersect_keys", "symmetric_difference",
    "dfdiag", "coo_density", "coo_is_square", "coo_transpose",
    "coo_elementwise", "coo_scale", "spmm",
    "grouped_histogram", "even_slices", "pack_sequences", "gaussian_kernel",
    "grouped_value_counts_pivot", "collapse_small_categories", "topk",
    "estimate_size_bytes",
]
