"""Batch relational plans over the star schema (TPC-H-style).

The reference has no relational query layer (its "queries" are PromQL); this
module is the new batch-analytics capability over the driver's star schema.
All plans are declarative DataFrame programs: Catalyst gets full freedom for
join reordering, predicate pushdown into the parquet scans, and AQE runtime
re-planning.

Scale notes (100 TB):
- region/nation/supplier are broadcast explicitly (SMALL_DIMS) — no shuffle
  of the fact side for those joins;
- customer/orders joins shuffle on their keys; at production scale these
  tables would be bucketed by key so the shuffle disappears (see
  sinks.write_bucketed);
- aggregates are partial (map-side combine) since every plan is a plain
  groupBy over low-cardinality keys.

Money sums are rounded to 2 decimals, averages to 4, inside both the Spark
plan and the oracle SQL so float summation-order differences can't flip the
value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top revenue among not-yet-shipped orders."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking via semi join (no shuffle of
    lineitem payload columns — only the key reaches the join)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    # commit-date column doesn't exist in this schema; emulate "late line item"
    # as quantity > 45 (deterministic predicate on an existing column).
    late = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue joined through region->nation->(cust, supp).

    nation/region/supplier are broadcast; the orders<->lineitem join shuffles
    on orderkey.
    """
    region = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, (li.l_suppkey == supplier.s_suppkey) & (customer.c_nationkey == supplier.s_nationkey))
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: revenue per customer nation (broadcast dims)."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count("*").alias("order_count"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function ranking: top 3 customers by revenue within nation."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    per_cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_name", "revenue", "rnk")
    )


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation with distinct counts + conditional aggregates on part."""
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_brand").alias("n_brands"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        F.round(F.sum(F.when(F.col("p_size") > 25, F.col("p_retailprice")).otherwise(F.lit(0.0))), 2).alias(
            "large_part_value"
        ),
    )


def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders —
    a left ANTI join (only keys cross the shuffle, payload never moves)."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items below 50% of their part's
    average quantity — the correlated scalar subquery decorrelated into an
    aggregate-then-join (the per-part aggregate is small -> broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(part_avg), "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order dates (bounded subset) — the
    cumulative-window shape (partitioned running sum, no global sort)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    )


def returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (grouping sets): per (returnflag,
    linestatus), per returnflag, and grand total in one pass — map-side
    partial aggregation covers all grouping sets without re-scanning."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.grouping_id().alias("grp"),
        )
    )


QUERIES = {
    "tpch_pricing_summary": pricing_summary,
    "tpch_top_unshipped_orders": top_unshipped_orders,
    "tpch_order_priority_count": order_priority_count,
    "tpch_local_supplier_volume": local_supplier_volume,
    "tpch_revenue_by_nation": revenue_by_nation,
    "tpch_top_customers": top_customers,
    "tpch_part_type_stats": part_type_stats,
    "tpch_idle_customers": idle_customers,
    "tpch_small_qty_revenue": small_quantity_revenue,
    "tpch_running_totals": customer_running_totals,
    "tpch_returnflag_rollup": returnflag_rollup,
}

ORACLES = {
    "tpch_idle_customers": """
        WITH rich AS (
            SELECT * FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        )
        SELECT c_mktsegment,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM rich r
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey)
        GROUP BY c_mktsegment
    """,
    "tpch_small_qty_revenue": """
        WITH part_avg AS (
            SELECT l_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
        JOIN part_avg a ON l.l_partkey = a.l_partkey
        WHERE l.l_quantity < a.half_avg_qty
    """,
    "tpch_running_totals": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_revenue,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS order_seq
        FROM orders
        WHERE o_custkey < 50
    """,
    "tpch_returnflag_rollup": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price,
               CASE WHEN grouping(l_returnflag) = 1 AND grouping(l_linestatus) = 1 THEN 3
                    WHEN grouping(l_linestatus) = 1 THEN 1
                    ELSE 0 END AS grp
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "tpch_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_top_unshipped_orders": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "tpch_order_priority_count": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
    """,
    "tpch_local_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "tpch_revenue_by_nation": """
        SELECT r_name, n_name,
               round(sum(o_totalprice), 2) AS total_revenue,
               count(*) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "tpch_top_customers": """
        WITH per_cust AS (
            SELECT n_name, c_custkey, c_name,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name, c_custkey, c_name
        )
        SELECT n_name, c_custkey, c_name, revenue, rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY n_name
                       ORDER BY revenue DESC, c_custkey) AS rnk
            FROM per_cust
        ) WHERE rnk <= 3
    """,
    "tpch_part_type_stats": """
        SELECT p_type,
               count(*) AS n_parts,
               count(DISTINCT p_brand) AS n_brands,
               round(avg(p_retailprice), 4) AS avg_price,
               round(sum(CASE WHEN p_size > 25 THEN p_retailprice ELSE 0.0 END), 2)
                   AS large_part_value
        FROM part
        GROUP BY p_type
    """,
}
