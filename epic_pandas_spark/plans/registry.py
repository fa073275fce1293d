"""Query registry: every implemented operator exposed as a
(spark_callable, oracle_sql) pair — the driver contract of
``__spark_entry__.py`` and the local correctness harness both read this.

Conventions (SURVEY.md §5, §7.3):
- every computed column is aliased identically in Spark and SQL;
- double-valued aggregates are rounded to 6 decimals on BOTH sides;
- money-like sums go through DECIMAL so both engines sum exactly, then the
  final division/rounding happens in double on identical inputs —
  eliminating accumulation-order fp drift between Spark and DuckDB;
- sampling queries compare per-stratum COUNTS, not row identity.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from epic_pandas_spark.operators import (
    value_counts,
    value_counts_binned,
    upsert,
    drop_duplicates_by_key,
    unique_row_ids,
    column_stats,
    weighted_average,
    sample_at_most,
    sample_with_distribution,
    cumsum,
    diff,
    symmetric_difference,
)
from epic_pandas_spark.operators.dedup import n_distinct_rows
from epic_pandas_spark.session import load_table

# name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}


def _dec(col, scale: int = 4):
    """Exact-sum staging: cast to a wide decimal so Spark and DuckDB both
    sum exactly (fp-order-proof oracle comparison)."""
    return F.col(col).cast(f"decimal(30,{scale})") if isinstance(col, str) else col.cast(f"decimal(30,{scale})")


# ---------------------------------------------------------------------------
# §2.4 value_counts family
# ---------------------------------------------------------------------------

@register(
    "value_counts",
    """
    SELECT l_returnflag AS value, COUNT(*) AS count,
           ROUND(COUNT(*) / (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NOT NULL), 6) AS fraction
    FROM lineitem WHERE l_returnflag IS NOT NULL
    GROUP BY l_returnflag
    """,
)
def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return value_counts(li, "l_returnflag").select(
        "value", "count", F.round("fraction", 6).alias("fraction")
    )


@register(
    "value_counts_binned",
    """
    WITH b AS (
      SELECT LEAST(10, GREATEST(1, CAST(FLOOR(l_quantity / 5.0) AS INT) + 1)) AS bin
      FROM lineitem WHERE l_quantity IS NOT NULL
    )
    SELECT bin, (bin-1)*5.0 AS bin_lo, bin*5.0 AS bin_hi, COUNT(*) AS count,
           ROUND(COUNT(*) / (SELECT COUNT(*) FROM b), 6) AS fraction
    FROM b GROUP BY bin
    """,
)
def q_value_counts_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return value_counts_binned(li, "l_quantity", lo=0.0, hi=50.0, n_bins=10).select(
        "bin", "bin_lo", "bin_hi", "count", F.round("fraction", 6).alias("fraction")
    )


@register(
    "weighted_average",
    """
    SELECT ROUND(
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
      / CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE), 6) AS wavg
    FROM lineitem
    """,
)
def q_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        _dec("l_extendedprice").alias("x"), _dec("l_quantity").alias("w")
    )
    return weighted_average(li, "x", "w").select(F.round(F.col("wavg").cast("double"), 6).alias("wavg"))


# ---------------------------------------------------------------------------
# §2.3 joins: upsert / reindex / set ops
# ---------------------------------------------------------------------------

@register(
    "upsert",
    """
    WITH delta AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
    UNION ALL SELECT * FROM delta
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    delta = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
    )
    return upsert(cust, delta, key="c_custkey")


@register(
    "reindex_align",
    """
    SELECT c.c_custkey, o.n_orders
    FROM customer c LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_reindex_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reindex: left-join aggregated orders onto the customer key set —
    missing keys null-filled (SURVEY.md §2.3 reindex row)."""
    from epic_pandas_spark.keyed import reindex

    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return reindex(per_cust, cust, key="c_custkey").select("c_custkey", "n_orders")


@register(
    "symmetric_difference",
    """
    SELECT c_custkey FROM (
      SELECT DISTINCT c_custkey FROM customer
      EXCEPT SELECT DISTINCT o_custkey FROM orders
    ) UNION ALL
    SELECT o_custkey FROM (
      SELECT DISTINCT o_custkey FROM orders
      EXCEPT SELECT DISTINCT c_custkey FROM customer
    )
    """,
)
def q_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey"))
    ords = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return symmetric_difference(cust, ords, key="c_custkey")


# ---------------------------------------------------------------------------
# §2.2 dedup by key
# ---------------------------------------------------------------------------

@register(
    "drop_duplicates_keep_first",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_drop_duplicates_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    return drop_duplicates_by_key(
        li, key="l_orderkey", keep="first", order_by=["l_linenumber", "l_quantity"]
    )


@register(
    "drop_duplicates_keep_none",
    """
    SELECT l_orderkey, l_linenumber FROM (
      SELECT l_orderkey, l_linenumber, COUNT(*) OVER (PARTITION BY l_orderkey) AS n
      FROM lineitem
    ) WHERE n = 1
    """,
)
def q_drop_duplicates_keep_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return drop_duplicates_by_key(li, key="l_orderkey", keep=False)


@register(
    "unique_row_ids_dense",
    """
    SELECT l_returnflag, l_linestatus,
           DENSE_RANK() OVER (ORDER BY l_returnflag, l_linestatus) - 1 AS row_id
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    """,
)
def q_unique_row_ids_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    return unique_row_ids(li, ["l_returnflag", "l_linestatus"], strategy="dense")


@register(
    "n_distinct_hash",
    """
    SELECT COUNT(*) AS n_distinct FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    """,
)
def q_n_distinct_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-strategy row ids: the count of distinct xxhash64 ids must equal
    the count of distinct column combos (collision-free at this scale) —
    an oracle-checkable proxy for id correctness."""
    li = load_table(spark, sf_dir, "lineitem")
    with_ids = unique_row_ids(li, ["l_partkey", "l_suppkey"], strategy="hash")
    return with_ids.agg(F.count_distinct("row_id").alias("n_distinct"))


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

@register(
    "cumsum_diff",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS qty_running,
           ROUND(l_extendedprice - LAG(l_extendedprice) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice), 6) AS price_diff
    FROM lineitem
    """,
)
def q_cumsum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordering includes every projected value column: tie rows become
    # interchangeable, so the windowed output is deterministic even though
    # (l_orderkey, l_linenumber) is not unique in the synthetic data
    order = ["l_linenumber", "l_quantity", "l_extendedprice"]
    li = load_table(spark, sf_dir, "lineitem")
    out = cumsum(li, "l_quantity", order_by=order, partition_by=["l_orderkey"], out_col="qty_running")
    out = diff(out, "l_extendedprice", order_by=order, partition_by=["l_orderkey"], out_col="price_diff")
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("qty_running", 6).alias("qty_running"),
        F.round("price_diff", 6).alias("price_diff"),
    )


@register(
    "grouped_transform",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey), 6) AS qty_share
    FROM lineitem
    """,
)
def q_grouped_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grp.transform('sum') broadcast-agg-back-to-rows (plot.py:223,226) as
    a partitioned window — no join."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / F.sum("l_quantity").over(w), 6).alias("qty_share"),
    )


# ---------------------------------------------------------------------------
# §2.6 top-k
# ---------------------------------------------------------------------------

@register(
    "topk_customers",
    """
    SELECT c_custkey, total_spent FROM (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey
    ) ORDER BY total_spent DESC, c_custkey ASC LIMIT 10
    """,
)
def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders")
    return (
        ords.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.4 column_stats
# ---------------------------------------------------------------------------

@register(
    "column_stats",
    """
    WITH t AS (
      SELECT CAST(c_mktsegment AS VARCHAR) AS v FROM customer WHERE c_mktsegment IS NOT NULL
    ), vc AS (
      SELECT v, COUNT(*) AS cnt, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, v ASC) AS rn
      FROM t GROUP BY v
    )
    SELECT 'c_mktsegment' AS "column",
           (SELECT COUNT(DISTINCT c_mktsegment) FROM customer) AS n_unique,
           (SELECT COUNT(*) FROM customer WHERE c_mktsegment IS NULL) AS n_null,
           (SELECT v FROM vc WHERE rn = 1) AS top_value,
           (SELECT cnt FROM vc WHERE rn = 1) AS top_count,
           (SELECT v FROM vc WHERE rn = 2) AS second_value
    """,
)
def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return column_stats(cust, ["c_mktsegment"]).drop("dtype")


# ---------------------------------------------------------------------------
# §2.9 sampling (count-based oracle)
# ---------------------------------------------------------------------------

@register(
    "sample_at_most_n",
    "SELECT LEAST(500, (SELECT COUNT(*) FROM orders)) AS n_sampled",
)
def q_sample_at_most_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders")
    return sample_at_most(ords, n=500, seed=42).agg(F.count(F.lit(1)).alias("n_sampled"))


@register(
    "stratified_sample_counts",
    """
    WITH dist(stratum, p) AS (VALUES ('O', 0.5), ('F', 0.3), ('P', 0.2)),
    alloc AS (
      SELECT stratum,
             CAST(ROUND(SUM(p) OVER (ORDER BY stratum ROWS UNBOUNDED PRECEDING) * 300, 0)
               - COALESCE(ROUND(SUM(p) OVER (ORDER BY stratum ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) * 300, 0), 0)
             AS BIGINT) AS n_sampled
      FROM dist
    )
    SELECT stratum AS o_orderstatus, n_sampled FROM alloc
    """,
)
def q_stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling, checked on per-stratum counts: the
    largest-remainder allocation is deterministic, so the sampled counts
    must equal the oracle's windowed cumsum-round-diff allocation.
    NOTE: strata iterate in sorted order so Spark and SQL allocate
    identically."""
    ords = load_table(spark, sf_dir, "orders")
    dist = {"F": 0.3, "O": 0.5, "P": 0.2}  # sorted keys == ORDER BY stratum
    sampled = sample_with_distribution(ords, "o_orderstatus", 300, dist, seed=42)
    return sampled.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_sampled"))
