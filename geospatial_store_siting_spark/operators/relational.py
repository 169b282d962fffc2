"""Core relational operator coverage over the TPC-H-style base tables.

These queries exercise the full SURVEY §2 relational inventory that the
geo pipeline doesn't already cover — multi-way joins with reordering,
semi/anti joins (J13/J18), set ops (U1-U4), percentile_approx→exact
median (A9), stddev (A10), pivot-style conditional aggregation (A8),
top-k (O1), IN-lists (P7), BETWEEN (P8), regex predicates (P9).

Money sums are cast to DECIMAL(18,4) before aggregation: decimal addition
is exact, so engine-order differences cannot perturb value hashes (double
sums over 10^5 rows would drift in the last bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dround

DEC = "decimal(18,4)"


def pricing_summary(spark: SparkSession) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + wide grouped aggregation
    (map-side partial agg; the canonical Catalyst hash-agg plan)."""
    l = spark.table("lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    # dround the per-row product BEFORE the decimal cast: the 3-factor
    # product has >4 decimal digits and Spark's double→decimal cast rounds
    # HALF_UP while DuckDB rounds HALF_EVEN at exact half-way points.
    disc_price = dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(DEC)
    charge = dround(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 4
    ).cast(DEC)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            dround(F.avg("l_quantity"), 6).alias("avg_qty"),
            dround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_summary_oracle_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST((FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST((FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5) / 10000.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
       (FLOOR((AVG(l_quantity)) * 1000000.0 + 0.5) / 1000000.0) AS avg_qty,
       (FLOOR((AVG(l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def top_unshipped_orders(spark: SparkSession, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + filter + agg + top-k
    (TakeOrderedAndProject)."""
    c = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = spark.table("lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    revenue = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def top_unshipped_orders_oracle_sql(k: int = 10) -> str:
    return f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT {k}"""


def regional_revenue(spark: SparkSession) -> DataFrame:
    """TPC-H Q5 shape: 5-way join chain (Catalyst join reordering +
    broadcast of the dim chain) with region→nation→customer lineage."""
    revenue = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
    return (
        spark.table("region")
        .join(spark.table("nation"), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(spark.table("customer"), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(spark.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(spark.table("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("r_name")
        .agg(revenue.cast("double").alias("revenue"), F.countDistinct("o_orderkey").alias("n_orders"))
    )


def regional_revenue_oracle_sql() -> str:
    return """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM region
JOIN nation ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY r_name"""


def customers_without_orders(spark: SparkSession) -> DataFrame:
    """Left-anti join (J13 — the reference's orphan-detection gate,
    `notebooks/00_quality_checks.py:159-167`): customers with no order
    above the threshold (the FK graph is dense, so the unfiltered
    anti join would be vacuously empty)."""
    c = spark.table("customer")
    o = spark.table("orders").filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_mktsegment")


def customers_without_orders_oracle_sql() -> str:
    return """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)"""


def big_spenders_semi(spark: SparkSession) -> DataFrame:
    """Left-semi join (J18 IN-subquery shape): customers holding at least
    one order above 400k, with market-segment distribution."""
    c = spark.table("customer")
    o = spark.table("orders").filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(o, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"))
    )


def big_spenders_semi_oracle_sql() -> str:
    return """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment"""


def part_type_pivot(spark: SparkSession) -> DataFrame:
    """Pivot-style conditional aggregation (A8) + exact median (A9) +
    stddev (A10) per brand."""
    p = spark.table("part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.when(F.col("p_size") < 10, F.lit(1))).alias("n_small"),
            F.count(F.when((F.col("p_size") >= 10) & (F.col("p_size") < 30), F.lit(1))).alias("n_mid"),
            F.count(F.when(F.col("p_size") >= 30, F.lit(1))).alias("n_large"),
            F.expr("percentile(p_retailprice, 0.5)").alias("median_price_raw"),
            dround(F.stddev("p_retailprice"), 4).alias("price_stddev"),
        )
        .withColumn("median_price", dround(F.col("median_price_raw"), 4))
        .drop("median_price_raw")
    )


def part_type_pivot_oracle_sql() -> str:
    return """
SELECT p_brand,
       COUNT(CASE WHEN p_size < 10 THEN 1 END) AS n_small,
       COUNT(CASE WHEN p_size >= 10 AND p_size < 30 THEN 1 END) AS n_mid,
       COUNT(CASE WHEN p_size >= 30 THEN 1 END) AS n_large,
       (FLOOR((STDDEV_SAMP(p_retailprice)) * 10000.0 + 0.5) / 10000.0) AS price_stddev,
       (FLOOR((QUANTILE_CONT(p_retailprice, 0.5)) * 10000.0 + 0.5) / 10000.0) AS median_price
FROM part
GROUP BY p_brand"""


def order_priority_counts(spark: SparkSession) -> DataFrame:
    """IN-list (P7) + BETWEEN (P8) + regex predicate (P9) + distinct union
    (U2/U3): priority histogram of 1996 orders for two segments."""
    o = spark.table("orders")
    c = spark.table("customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_name").rlike("^Customer#")
    )
    j = o.join(c, o.o_custkey == c.c_custkey).filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    )
    return j.groupBy("o_orderpriority", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
    )


def order_priority_counts_oracle_sql() -> str:
    return """
SELECT o_orderpriority, c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND REGEXP_MATCHES(c_name, '^Customer#')
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
GROUP BY o_orderpriority, c_mktsegment"""


def supplier_part_union(spark: SparkSession) -> DataFrame:
    """Set ops (U1 unionByName + U3 distinct): the id universe of two
    entity tables with per-source counts."""
    s = spark.table("supplier").select(
        F.col("s_suppkey").alias("entity_id"), F.lit("supplier").alias("src")
    )
    p = spark.table("part").select(
        F.col("p_partkey").alias("entity_id"), F.lit("part").alias("src")
    )
    return s.unionByName(p).distinct().groupBy("src").agg(
        F.count(F.lit(1)).alias("n"), F.max("entity_id").alias("max_id")
    )


def supplier_part_union_oracle_sql() -> str:
    return """
SELECT src, COUNT(*) AS n, MAX(entity_id) AS max_id FROM (
  SELECT DISTINCT * FROM (
    SELECT s_suppkey AS entity_id, 'supplier' AS src FROM supplier
    UNION ALL
    SELECT p_partkey AS entity_id, 'part' AS src FROM part
  ) __u
) __d GROUP BY src"""


def rollup_revenue(spark: SparkSession) -> DataFrame:
    """ROLLUP grouping-sets aggregation (beyond the reference, which has
    none — SURVEY §2.4 'no grouping sets anywhere')."""
    o = spark.table("orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


def rollup_revenue_oracle_sql() -> str:
    return """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""


def cube_revenue(spark: SparkSession) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of status × priority)."""
    o = spark.table("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


def cube_revenue_oracle_sql() -> str:
    return """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)"""


def grouping_sets_revenue(spark: SparkSession) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    per-status totals, per-priority totals, and the grand total — but NOT
    the (status, priority) cross, which CUBE would force.  Spark SQL's
    GROUPING SETS clause plans the same single-Expand aggregate as
    rollup/cube."""
    return spark.sql(
        """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
    )


def grouping_sets_revenue_oracle_sql() -> str:
    return """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
