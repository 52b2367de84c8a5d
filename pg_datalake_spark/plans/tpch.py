"""TPC-H-style analytical queries adapted to the driver's star schema.

The reference ships a TPC-H harness (reference: pg_lake_benchmark/src/tpch.c:59-223,
22 fixed-parameter queries); the driver's synthetic schema carries a
subset of the TPC-H columns, so each query here is the classic shape
adapted to the available columns. Every query is written with the
DataFrame API (Catalyst plans filter-pushdown/broadcast joins itself)
and paired with DuckDB oracle SQL.

Scale notes (100 TB): lineitem/orders are the fact tables — every join
below joins fact to a dimension or fact-to-fact on the join key both
sides are naturally clustered on (l_orderkey/o_orderkey). Broadcast
hints are FORCED only for tables bounded by schema (nation, region,
single-row scalar aggregates); SF-scaled tables (customer, supplier,
part and their derivatives) carry no hint — AQE decides from runtime
stats, so the same plan is safe at sf0.01 and at 100 TB where a forced
broadcast of a several-GB build side would OOM the executors.
Aggregations are partial-agg friendly (sum/count/min/max/avg), so
map-side combine keeps shuffle volume ~|groups|, not |rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_datalake_spark.catalog import load_tables
from pg_datalake_spark.plans.registry import register


def ts(lit: str) -> F.Column:
    """TIMESTAMP_NTZ literal (matches parquet timestamp_ntz columns)."""
    return F.expr(f"TIMESTAMP_NTZ '{lit}'")


def disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def dsum(col: F.Column, scale: int = 4) -> F.Column:
    """Order-independent money sum for the exact-hash gate.

    A plain double sum varies in the last ulps with partitioning /
    merge order, so two engines (or two runs) disagree bit-for-bit.
    Per-row: both engines hold the identical IEEE double, and casting
    it to DECIMAL rounds deterministically; the decimal accumulation is
    exact integer arithmetic (order-independent); the final cast back
    to double is one deterministic rounding of the same exact value.
    Scales are chosen so the per-row value is captured exactly
    (prices have 2 decimals, discount factors add 2 more per multiply)
    while keeping the scaled sum below 2^53 at gate scale factors.
    """
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: F.Column, scale: int = 2) -> F.Column:
    """Order-independent average: exact decimal sum / non-null count."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double") / F.count(col)


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6)))
                AS DOUBLE)                                       AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(l_extendedprice)
             AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact in any order
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price(), 4).alias("sum_disc_price"),
            dsum(disc_price() * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < ts("1998-03-15 00:00:00"))
    li = t["lineitem"].filter(F.col("l_shipdate") > ts("1996-03-15 00:00:00"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(disc_price()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-10-01 00:00:00"))
    )
    big = t["lineitem"].filter(F.col("l_quantity") > 45)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation", "region"]
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    # dimension chain region→nation→supplier is tiny: broadcast it once
    dims = (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            dims,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(disc_price()).alias("revenue"))
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(ts("1995-01-01 00:00:00"), ts("1996-12-31 00:00:00"))
    )
    joined = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
    )


@register(
    "q09_product_type_profit",
    oracle="""
    SELECT n_name AS nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(30,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "part", "supplier", "nation"]
    )
    green = t["part"].filter(F.col("p_name").like("%red%"))
    return (
        t["lineitem"]
        .join(green, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN l_quantity <  25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT 100.00 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-10-01 00:00:00"))
    )
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * dsum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(F.lit(0.0)))
                / dsum(disc_price())
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(disc_price()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_types",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    return (
        t["lineitem"]
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (
        SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                      / count(l_quantity))
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    # correlated scalar subquery → per-part average via a pre-aggregated
    # broadcast join (cheaper than a window over the fact at scale)
    part_avg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(davg(F.col("l_quantity")).alias("avg_qty"))
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#2")
    return (
        t["lineitem"]
        .join(brand, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice"), 2) / 7.0).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 rewrite (guide §2.3 "aggregate before you shuffle"): the
    HAVING-sum subquery already computes the outer query's only
    aggregate — the outer GROUP BY keys include o_orderkey, which is
    unique in orders, so each output group IS one qualifying order.
    Aggregating lineitem once and joining the ≥200-qty orders to their
    order/customer rows returns the identical result while dropping a
    second full scan of the fact table, a fact-sized semi-join shuffle,
    and the regroup (plan: 2 fewer Exchanges, 1 fewer lineitem scan;
    0.61 s → 0.50 s at sf0.1, output bit-identical)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))  # integral doubles: exact in any order
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(disc_price()).alias("revenue"))
    )


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders"])
    li = t["lineitem"]
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    base = l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        t["supplier"], F.col("l_suppkey") == F.col("s_suppkey")
    )
    with_other = base.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey")) & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    no_other_r = with_other.join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey")) & (F.col("l3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return no_other_r.groupBy("s_name").agg(F.count("*").alias("numwait"))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT n_name AS cntry, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "nation"])
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("ab"))
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            t["orders"].filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(F.count("*").alias("numcust"), dsum(F.col("c_acctbal"), 2).alias("totacctbal"))
    )


@register(
    "q08_market_share",
    oracle="""
    SELECT o_year,
           CAST(sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END
                         AS DECIMAL(30,4))) AS DOUBLE)
           / CAST(sum(CAST(volume AS DECIMAL(30,4))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"],
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    econ = t["part"].filter(F.col("p_type") == "ECONOMY")
    orders = t["orders"].filter(
        F.col("o_orderdate").between(ts("1995-01-01 00:00:00"), ts("1996-12-31 00:00:00"))
    )
    joined = (
        t["lineitem"]
        .join(econ, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == F.col("r_regionkey"))
    )
    vol = disc_price()
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / dsum(F.col("volume"))
            ).alias("mkt_share")
        )
    )


@register(
    "q20_excess_inventory_suppliers",
    oracle="""
    SELECT s_name, s_nationkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100.0)
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "part"])
    red = t["part"].filter(F.col("p_name").like("red%"))
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        )
        .join(red, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100.0)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_nationkey")
    )


@register(
    "q11_important_stock",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,2))) AS DOUBLE)
             AS stock_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,2))) AS DOUBLE) > (
      SELECT CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,2))) AS DOUBLE) * 0.05
      FROM lineitem)
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (value concentration with a scalar-subquery HAVING
    threshold) adapted to lineitem value per supplier nation."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    value = F.col("l_extendedprice") * F.col("l_quantity")
    total = t["lineitem"].agg((dsum(value, 2) * 0.05).alias("threshold"))
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(value, 2).alias("stock_value"))
        .join(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("threshold"))
        .select("n_name", "stock_value")
    )


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost AS supplycost
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size <= 25 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND cost = (SELECT min(ps2.cost)
                  FROM ps ps2, supplier s2, nation n2, region r2
                  WHERE ps2.l_partkey = p_partkey
                    AND s2.s_suppkey = ps2.l_suppkey
                    AND s2.s_nationkey = n2.n_nationkey
                    AND n2.n_regionkey = r2.r_regionkey
                    AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier; reference runs the classic form
    in its benchmark harness). The driver schema has no partsupp table,
    so the part-supplier catalog is derived from lineitem: supplycost =
    min unit price ever charged by that supplier for that part.

    The correlated min-cost subquery decorrelates into a pre-aggregated
    per-part minimum joined back on (partkey, cost) — one extra shuffle
    on p_partkey instead of a per-row subquery; at 100 TB both the ps
    aggregate and the min-join shuffle on the same key, so AQE can
    coalesce them, and no SF-scaled table is force-broadcast."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "part", "nation", "region"])
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    eur_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eur = ps.join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = ps_eur.groupBy(F.col("l_partkey").alias("mc_pk")).agg(
        F.min("cost").alias("min_cost")
    )
    parts = t["part"].filter((F.col("p_size") <= 25) & (F.col("p_type") == "STANDARD"))
    return (
        ps_eur.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_pk")) & (F.col("cost") == F.col("min_cost")),
        )
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
