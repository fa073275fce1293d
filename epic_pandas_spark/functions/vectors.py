"""Vector expression builders over ARRAY<FLOAT/DOUBLE> embedding columns
(extension layer: similarity search over `embeddings.embedding`).

Pure higher-order-function expressions (`zip_with` + `aggregate`): the dot
product and norms execute in the JVM inside codegen — no Python, no UDF.
A vectorized numpy pandas_udf alternative lives in extensions.similarity
for the brute-force top-k scan where batch BLAS wins.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))
