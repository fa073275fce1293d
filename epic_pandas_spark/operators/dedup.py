"""Key-based deduplication and row-id assignment.

- `drop_duplicates_by_key` — the reference's `drop_duplicates_by_index`
  (/root/reference/epic/pandas/utils.py:352-372): keep first/last/none of the
  rows sharing a key. pandas "first/last" means positional order; Spark rows
  are unordered, so the caller supplies the ordering columns that define
  first/last (SURVEY.md §7.3 item 4).
- `unique_row_ids` — the reference's factorize+compress pipeline
  (utils.py:811-841): one id per distinct combination of the columns.

Scale notes: keep='first'/'last' is a window over partitionBy(key) — one
shuffle on the key, streams within each partition. `unique_row_ids` offers
two strategies: `hash` (xxhash64 — shuffle-free, ids stable and unique
w.h.p., THE choice at 100 TB) and `dense` (dense_rank over a global
ordering — exact 0..k-1 ids, but a total sort; only for oracle-comparable
small dictionaries).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from epic_pandas_spark.keyed import as_keys


def drop_duplicates_by_key(
    df: DataFrame,
    key: str | Sequence[str] | None = None,
    keep: str | bool = "first",
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Dedup by key keeping 'first' / 'last' / False (= drop all rows whose
    key appears more than once, utils.py:368-372).

    ``order_by`` defines what "first" means; required for first/last.
    """
    keys = as_keys(key)
    if keep is False or keep == "none":
        w = Window.partitionBy(*keys)
        return (
            df.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
    if order_by is None:
        raise ValueError("keep='first'/'last' needs order_by columns (Spark rows are unordered)")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if keep == "last":
        cols = [c.desc() for c in cols]
    elif keep != "first":
        raise ValueError(f"keep must be 'first', 'last' or False, got {keep!r}")
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def unique_row_ids(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    strategy: str = "hash",
    out_col: str = "row_id",
) -> DataFrame:
    """Assign one id per distinct combination of ``columns``
    (reference: factorize per column + get_compressed_ids, utils.py:833-841).

    strategy='hash': ``xxhash64`` over the columns — embarrassingly parallel,
    no shuffle, stable across runs; ids are sparse 64-bit. The 100 TB path.

    strategy='dense': contiguous 0..k-1 ids via dense_rank over the column
    tuple. Exact parity with the reference's dense codes, but requires a
    global sort of the distinct combos — use when |distinct| is modest.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if strategy == "hash":
        return df.withColumn(out_col, F.xxhash64(*[F.col(c) for c in cols]))
    if strategy == "dense":
        # rank the distinct combos then broadcast-join back. The ranking is
        # TWO-PHASE (same trick as sampling._two_phase_positions): range-
        # partition the distinct set on the ordering columns (global order
        # preserved across partitions), row_number per partition (parallel
        # windows), then add driver-collected partition offsets (n_parts
        # rows — tiny) via a broadcast join. No unpartitioned window, so no
        # single-reducer sort of the distinct set.
        order_exprs = [F.col(c).asc_nulls_first() for c in cols]
        n_parts = 32
        parted = (
            df.select(*cols)
            .distinct()
            .repartitionByRange(n_parts, *order_exprs)
            .withColumn("__pid", F.spark_partition_id())
            # checkpoint: the pid must be identical in the counts job and
            # the ranking job (a recompute could re-partition differently)
            .localCheckpoint(eager=False)
        )
        counts = {
            int(r["__pid"]): int(r["n"])
            for r in parted.groupBy("__pid").agg(F.count("*").alias("n")).collect()
        }
        offs, cum = [], 0
        for p in sorted(counts):
            offs.append((p, cum))
            cum += counts[p]
        spark = df.sparkSession
        off_df = F.broadcast(
            spark.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
        )
        w = Window.partitionBy("__pid").orderBy(*order_exprs)
        ids = (
            parted.withColumn("__rn", F.row_number().over(w))
            .join(off_df, on="__pid", how="inner")
            .withColumn(out_col, (F.col("__off") + F.col("__rn") - 1).cast("int"))
            .drop("__pid", "__rn", "__off")
        )
        # eqNullSafe join keys: a plain equi-join would never match combos
        # containing nulls, leaving those rows with a null id
        renamed = ids.select(
            *[F.col(c).alias(f"__i_{c}") for c in cols], F.col(out_col)
        )
        cond = None
        for c in cols:
            term = F.col(c).eqNullSafe(F.col(f"__i_{c}"))
            cond = term if cond is None else (cond & term)
        joined = df.join(F.broadcast(renamed), on=cond, how="left")
        return joined.drop(*[f"__i_{c}" for c in cols])
    raise ValueError(f"unknown strategy {strategy!r}")


def n_distinct_rows(df: DataFrame, columns: Sequence[str] | None = None, exact: bool = True) -> DataFrame:
    """Count distinct row combinations — `len(factorize(...))` analog.
    ``exact=False`` switches to HyperLogLog (approx_count_distinct), the
    constant-memory variant for very high cardinalities."""
    cols = [F.col(c) for c in (columns if columns is not None else df.columns)]
    agg = F.count_distinct(*cols) if exact else F.approx_count_distinct(F.struct(*cols))
    return df.agg(agg.alias("n_distinct"))
