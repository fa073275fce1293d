"""Headline analytical queries (TPC-H-style) over the driver tables —
the benchmark workhorses exercising scan → filter-pushdown → hash-agg,
multi-way broadcast joins, and top-k.

These have no reference analog (the reference is a utility layer, not a
query engine); they exist to prove the engine composes into real analytics
and to anchor BENCH numbers. All money sums go through DECIMAL staging so
the DuckDB oracle matches bit-for-bit (see plans.registry docstring).

Scale notes baked into the plans:
- Q1: single shuffle on the two grouping columns; partial aggregation is
  map-side, so 100 TB reduces to |groups| rows before the exchange.
- Q3/Q5: dimension tables (region/nation/customer/supplier at TPC-H
  ratios) are broadcast; only lineitem/orders shuffle — and only when the
  join key isn't already co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from epic_pandas_spark.session import load_table


def _dec(col: str):
    return F.col(col).cast("decimal(30,4)")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: groupBy(returnflag, linestatus) + 8 aggregates over
    shipped lineitems. Filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(30,4)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(30,4)") + _dec("l_tax"))
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn("avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6))
        .withColumn("sum_disc_price", F.round("sum_disc_price", 6))
        .withColumn("sum_charge", F.round("sum_charge", 6))
    )
    return out.orderBy("l_returnflag", "l_linestatus")


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4)))) AS DOUBLE), 6) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4))) * (CAST(1 AS DECIMAL(30,4)) + CAST(l_tax AS DECIMAL(30,4)))) AS DOUBLE), 6) AS sum_charge,
       COUNT(*) AS count_order,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority: BUILDING-segment customers ⋈ orders ⋈ lineitem,
    revenue per order, top 10. customer is broadcast (dimension-sized);
    orders⋈lineitem shuffles on the orderkey once."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(30,4)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(revenue).cast("double"), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


TPCH_Q3_SQL = """
SELECT l_orderkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4)))) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: the full star join. region/nation/customer/
    supplier all broadcast; the fact tables shuffle once on orderkey."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(30,4)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 6).alias("revenue"))
    )


TPCH_Q5_SQL = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)) * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4)))) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape adapted to the driver schema —
    no partsupp table ships, so p_retailprice*0.8*l_quantity stands in for
    ps_supplycost*l_quantity): profit per (nation, order year) over parts
    whose name matches a substring.

    Plan shape this exists to exercise (the skew-heavy multi-join q1/q3/q5
    don't): a selective dimension filter (p_name LIKE) that must PRUNE THE
    FACT SCAN via the broadcast hash join, a second fact-fact join
    (lineitem⋈orders on orderkey) that shuffles both sides, and a
    two-level group key (n_name × year). part/supplier/nation broadcast;
    only the two fact tables exchange — and AQE's skew-join splitting
    covers a hot part or nation key."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amount = _dec("l_extendedprice") * (F.lit(1).cast("decimal(30,4)") - _dec("l_discount")) \
        - _dec("p_retailprice") * F.lit(0.8).cast("decimal(30,4)") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount).cast("double"), 6).alias("sum_profit"))
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(30,4)) * (CAST(1 AS DECIMAL(30,4)) - CAST(l_discount AS DECIMAL(30,4)))
         - CAST(p_retailprice AS DECIMAL(30,4)) * CAST(0.8 AS DECIMAL(30,4)) * CAST(l_quantity AS DECIMAL(30,4))
       ) AS DOUBLE), 6) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds a threshold, joined back to customer and
    re-aggregated.

    Plan shape this exists to exercise: a full-fact aggregation
    (groupBy l_orderkey over ALL of lineitem — the biggest shuffle in the
    schema), whose selective HAVING output then drives a SEMI-join-like
    reduction of the same fact table. The qualifying-order set is small
    (selectivity of the threshold), so Spark broadcasts it back against
    lineitem/orders instead of a second full shuffle — the
    aggregate-then-broadcast-reduce pattern that makes Q18 survivable at
    100 TB. customer broadcasts; deterministic full ordering for the
    oracle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(200).cast("decimal(30,4)"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


TPCH_Q18_SQL = """
SELECT c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(30,4))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 200
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape adapted to the driver
    schema — no p_container, so p_brand + p_size stand in): revenue lost
    to orders of a part below 20% of that part's average order quantity.

    Plan shape this exists to exercise: a CORRELATED SCALAR SUBQUERY
    (per-part average) decorrelated into an aggregate + self-join — the
    canonical Catalyst rewrite. The selective part filter broadcasts TWICE
    (once to restrict the threshold aggregation's input, once for the
    final probe), so the per-part averages are computed over only the
    filtered parts' lineitems, never the full fact table; the threshold
    table (one row per qualifying part) broadcasts back against the fact.
    No SortMergeJoin anywhere: every join side except the fact scan is
    dimension-sized. l_quantity is integral in the data, so the 0.2*avg
    threshold (exact integer sums => identical double avg in any engine)
    is bit-deterministic."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_parts = li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = li_parts.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li_parts.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


TPCH_Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4' AND p_size <= 10
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape adapted to the
    driver schema — no receipt/commit dates ship, so "late" means
    l_shipdate > o_orderdate + 90 days): per supplier in one nation, count
    lineitems where THIS supplier was late on a finished multi-supplier
    order and NO OTHER supplier was.

    Plan shape this exists to exercise: the EXISTS / NOT-EXISTS pair over
    the same fact table. A naive translation is two extra fact self-joins
    (semi + anti); instead both predicates collapse into ONE per-order
    aggregate — n_suppliers and n_late_suppliers per order — because
    "another supplier exists" == n_supp >= 2 and "no other supplier was
    late" == n_late == 1 given the probe row itself is late. That turns
    Q21 into: fact⋈fact join (lineitem⋈orders, both shuffle on orderkey),
    one re-use of that partitioning for the groupBy(orderkey), a
    co-partitioned probe join, and a broadcast supplier⋈nation dim — the
    aggregate-rewrite that keeps Q21 to a single fact shuffle chain at
    100 TB. The DuckDB oracle deliberately keeps the EXISTS/NOT-EXISTS
    form, so the rewrite's equivalence is itself oracle-checked."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    lone_late_orders = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).select("l_orderkey")
    sup_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("late"))
        .join(lone_late_orders, "l_orderkey")
        .join(F.broadcast(sup_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


TPCH_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders o, nation
WHERE s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY s_name
"""
