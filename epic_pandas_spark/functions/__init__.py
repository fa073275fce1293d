from epic_pandas_spark.functions.entropy import (
    char_histogram,
    shannon_entropy,
    kullback_leibler,
)
from epic_pandas_spark.functions.text import (
    token_count_expr,
    quality_score_exprs,
    lang_id_expr,
    fingerprint_expr,
)
from epic_pandas_spark.functions.vectors import cosine_similarity_expr, dot_expr, norm_expr

__all__ = [
    "char_histogram", "shannon_entropy", "kullback_leibler",
    "token_count_expr", "quality_score_exprs", "lang_id_expr", "fingerprint_expr",
    "cosine_similarity_expr", "dot_expr", "norm_expr",
]
