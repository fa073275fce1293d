"""Sparse matrices as COO long-format frames.

The reference's `SparseDataFrame` (/root/reference/epic/pandas/sparse.py:22-167)
wraps a scipy CSR matrix with row/column labels. The distributed-native
representation is the COO long format `(row_key, col_key, value)` — exactly
what its `stack()` emits (sparse.py:153-167). Density/shape/diag become
aggregations and filters; `todense` is a pivot. Parquet's RLE/dictionary
encoding stores the elided zeros for free (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROW, COL, VAL = "row_key", "col_key", "value"


def dfdiag(coo: DataFrame, row: str = ROW, col: str = COL) -> DataFrame:
    """Diagonal extraction — keys present as both row and column label
    (reference utils.py:323-338, `index.intersection(columns)` at 338).
    On COO this is a pure filter — no join, no shuffle."""
    return coo.filter(F.col(row) == F.col(col))


def coo_is_square(coo: DataFrame, row: str = ROW, col: str = COL) -> DataFrame:
    """True iff row-label set == column-label set (sparse.py:97-100) —
    full-outer join of the two distinct label sets, zero mismatches."""
    r = coo.select(F.col(row).alias("k")).distinct().withColumn("__l", F.lit(1))
    c = coo.select(F.col(col).alias("k")).distinct().withColumn("__r", F.lit(1))
    return (
        r.join(c, on="k", how="full_outer")
        .agg(
            (F.sum(F.when(F.col("__l").isNull() | F.col("__r").isNull(), 1).otherwise(0)) == 0)
            .alias("is_square")
        )
    )


def coo_density(coo: DataFrame, row: str = ROW, col: str = COL) -> DataFrame:
    """nnz / (n_rows * n_cols) (sparse.py:105-108) — one aggregate."""
    return coo.agg(
        (
            F.count(F.lit(1)).cast("double")
            / (F.count_distinct(F.col(row)) * F.count_distinct(F.col(col)))
        ).alias("density")
    )


def coo_transpose(coo: DataFrame, row: str = ROW, col: str = COL) -> DataFrame:
    """Transpose = swap the label columns (sparse.py:117-120); free."""
    others = [c for c in coo.columns if c not in (row, col)]
    return coo.select(F.col(col).alias(row), F.col(row).alias(col), *others)


def coo_todense(coo: DataFrame, row: str = ROW, col: str = COL, val: str = VAL, fill=0.0) -> DataFrame:
    """Pivot to wide/dense form (sparse.py:131-140 `toarray`). Only for
    modest column cardinality — a dense 100 TB matrix is the thing this
    representation exists to avoid."""
    return coo.groupBy(row).pivot(col).agg(F.first(val)).na.fill(fill)


def stack(df: DataFrame, key_col: str, value_cols: list[str], dropna: bool = True) -> DataFrame:
    """Wide → COO long (`stack()`, sparse.py:153-167): unpivot the value
    columns into (row_key, col_key, value) rows."""
    n = len(value_cols)
    args = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    out = df.selectExpr(key_col, f"stack({n}, {args}) as (`{COL}`, `{VAL}`)").withColumnRenamed(
        key_col, ROW
    )
    return out.filter(F.col(VAL).isNotNull()) if dropna else out


def spmm(
    a: DataFrame,
    b: DataFrame,
    row: str = ROW,
    col: str = COL,
    val: str = VAL,
    broadcast_right: bool = False,
) -> DataFrame:
    """Sparse matrix product C = A @ B over COO frames — the matmul the
    reference's `SparseDataFrame` inherits from scipy's csr_matrix
    (sparse.py:22-167). Classic distributed SpGEMM: equi-join A's column
    key to B's row key, multiply, hash-aggregate per output cell
    (partial map-side combine). Zero cells never materialize.

    One shuffle on the inner key + one on the output cell; pass
    ``broadcast_right=True`` when B is a small projection/embedding matrix
    to skip the join shuffle entirely."""
    lhs = a.select(
        F.col(row).alias("__r"), F.col(col).alias("__k"), F.col(val).alias("__va")
    )
    rhs = b.select(
        F.col(row).alias("__k"), F.col(col).alias("__c"), F.col(val).alias("__vb")
    )
    if broadcast_right:
        rhs = F.broadcast(rhs)
    return (
        lhs.join(rhs, on="__k")
        .groupBy("__r", "__c")
        .agg(F.sum(F.col("__va") * F.col("__vb")).alias(val))
        .select(F.col("__r").alias(row), F.col("__c").alias(col), F.col(val))
    )


def coo_elementwise(
    a: DataFrame,
    b: DataFrame,
    op: str = "add",
    row: str = ROW,
    col: str = COL,
    val: str = VAL,
) -> DataFrame:
    """Elementwise COO arithmetic (csr_matrix `+`/`-`/`.multiply` parity,
    sparse.py:22). add/sub: full-outer join on the cell key with absent
    cells as 0 — the result keeps the union of supports. multiply
    (Hadamard): inner join — zero times anything is an elided zero, so the
    support intersects and the join prunes instead of padding."""
    lhs = a.select(row, col, F.col(val).alias("__va"))
    rhs = b.select(row, col, F.col(val).alias("__vb"))
    if op == "multiply":
        out = lhs.join(rhs, on=[row, col]).select(
            row, col, (F.col("__va") * F.col("__vb")).alias(val)
        )
        return out
    if op not in ("add", "sub"):
        raise ValueError("op must be add, sub or multiply")
    sign = F.lit(1.0) if op == "add" else F.lit(-1.0)
    return (
        lhs.join(rhs, on=[row, col], how="full_outer")
        .select(
            row,
            col,
            (
                F.coalesce(F.col("__va"), F.lit(0.0))
                + sign * F.coalesce(F.col("__vb"), F.lit(0.0))
            ).alias(val),
        )
    )


def coo_scale(coo: DataFrame, alpha: float, val: str = VAL) -> DataFrame:
    """Scalar multiply — a pure projection, no shuffle."""
    return coo.withColumn(val, F.col(val) * F.lit(alpha))


def coo_to_ml_vectors(coo: DataFrame, size: int, row: str = ROW, col_idx: str = COL, val: str = VAL) -> DataFrame:
    """COO long format → one `pyspark.ml.linalg.SparseVector` per row key
    (the ML-interop path of SURVEY.md §1.1: SparseDataFrame ⇄ Spark ML).
    ``col_idx`` must already be an integer dimension index; `size` is the
    vector dimensionality. Collect per row happens via sorted struct
    aggregation — one shuffle on the row key.

    The vector column is built ARROW-BATCHED: VectorUDT serializes as its
    sqlType struct (type, size, indices, values), so a pandas_udf can emit
    that struct as a DataFrame directly — no per-row pickled Python UDF,
    no SparseVector object construction on the worker. The plan shows
    ArrowEvalPython, never BatchEvalPython."""
    import numpy as np
    import pandas as pd
    from pyspark.ml.linalg import VectorUDT

    assembled = (
        coo.groupBy(row)
        .agg(F.array_sort(F.collect_list(F.struct(F.col(col_idx).cast("int").alias("i"), F.col(val).cast("double").alias("v")))).alias("ents"))
    )

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint inference rejects; hint-less defaults to the
    # scalar eval type, where a pd.DataFrame return maps to the struct-backed
    # UDT (ents: pd.Series -> pd.DataFrame)
    @F.pandas_udf(VectorUDT())
    def to_vec(ents):
        # sqlType of VectorUDT: type=0 marks sparse; indices must be sorted
        # ascending, which the array_sort above guarantees
        return pd.DataFrame(
            {
                "type": np.zeros(len(ents), dtype=np.int8),
                "size": np.full(len(ents), size, dtype=np.int32),
                "indices": ents.map(lambda es: [int(e["i"]) for e in es]),
                "values": ents.map(lambda es: [float(e["v"]) for e in es]),
            }
        )

    return assembled.select(F.col(row), to_vec("ents").alias("features"))


class CooFrame:
    """Thin class facade over the COO tier mirroring the reference's
    `SparseDataFrame` operator surface (sparse.py:22-167 subclasses
    csr_matrix, so users write `a @ b`, `a + b`, `a.T`, `.density()`).
    Holds a (row_key, col_key, value) DataFrame; every method delegates to
    the module-level operators, so plans stay lazy and composable."""

    def __init__(self, df: DataFrame, row: str = ROW, col: str = COL, val: str = VAL):
        missing = {row, col, val} - set(df.columns)
        if missing:
            raise ValueError(f"COO frame missing columns: {sorted(missing)}")
        self.df = df
        self._rcv = (row, col, val)

    def _wrap(self, df: DataFrame) -> "CooFrame":
        return CooFrame(df, *self._rcv)

    @property
    def T(self) -> "CooFrame":
        r, c, v = self._rcv
        return self._wrap(coo_transpose(self.df, row=r, col=c))

    def __matmul__(self, other: "CooFrame") -> "CooFrame":
        r, c, v = self._rcv
        return self._wrap(spmm(self.df, other.df, row=r, col=c, val=v))

    def __add__(self, other: "CooFrame") -> "CooFrame":
        r, c, v = self._rcv
        return self._wrap(coo_elementwise(self.df, other.df, op="add", row=r, col=c, val=v))

    def __sub__(self, other: "CooFrame") -> "CooFrame":
        r, c, v = self._rcv
        return self._wrap(coo_elementwise(self.df, other.df, op="sub", row=r, col=c, val=v))

    def multiply(self, other: "CooFrame") -> "CooFrame":
        """Elementwise (Hadamard) product, csr_matrix.multiply parity."""
        r, c, v = self._rcv
        return self._wrap(coo_elementwise(self.df, other.df, op="multiply", row=r, col=c, val=v))

    def __mul__(self, alpha: float) -> "CooFrame":
        v = self._rcv[2]
        return self._wrap(coo_scale(self.df, float(alpha), val=v))

    __rmul__ = __mul__

    def diagonal(self) -> DataFrame:
        r, c, _ = self._rcv
        return dfdiag(self.df, row=r, col=c)

    def density(self) -> DataFrame:
        r, c, _ = self._rcv
        return coo_density(self.df, row=r, col=c)

    def is_square(self) -> DataFrame:
        r, c, _ = self._rcv
        return coo_is_square(self.df, row=r, col=c)

    def todense(self, fill=0.0) -> DataFrame:
        r, c, v = self._rcv
        return coo_todense(self.df, row=r, col=c, val=v, fill=fill)
