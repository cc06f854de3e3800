"""TPC-H-style analytics over the driver's star schema.

Relational operator coverage the reference lacks entirely
(SURVEY.md §2.4 records its absence): multi-way joins
(broadcast + shuffle), semi/anti joins, window functions, rollup,
distinct aggregation, set operations, top-k. Written DataFrame-first;
Catalyst owns physical strategy, with explicit ``F.broadcast`` only
on dimensions that stay small at any scale (region/nation/supplier).

Float discipline for the correctness gate: money aggregates rounded
to 2dp, averages to 4dp, on both the Spark and the oracle side —
summation order across engines differs in the last ulp, rounding
re-converges the values.

Averages of 2dp money use ``round(sum, 2) / count``: the true sum is
an exact multiple of 0.01, so rounding the sum first recovers it
bit-identically regardless of summation order, and the division +
final round are then deterministic. A naive ``round(avg, 4)`` is
fragile — 2dp money averaged over integer counts frequently lands
EXACTLY on 4dp rounding boundaries, where last-ulp summation noise
(which varies with partition count!) flips the rounded digit; caught
by a gate simulation under a different shuffle-partition setting.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table


def _stable_avg(sum_col, count_col, digits: int = 4):
    """Order-independent avg of 2dp-money: round the sum to cents
    first (exact), then divide and round."""
    return F.round(F.round(sum_col, 2) / count_col, digits)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1: pricing summary (scan + filter + wide aggregation) -----------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (l.filter(F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 _stable_avg(F.sum("l_quantity"), F.count(F.lit(1))).alias("avg_qty"),
                 _stable_avg(F.sum("l_extendedprice"), F.count(F.lit(1))).alias("avg_price"),
                 _stable_avg(F.sum("l_discount"), F.count(F.lit(1))).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 4) AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 4) AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q6: forecasting revenue change (pure scan+filter+agg) ------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pushdown showcase: every predicate reaches the parquet scan
    (min/max row-group pruning at scale), no join, no shuffle beyond
    the single scalar aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows")))


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


# --- Q3-style: top revenue orders (3-way join + top-k) ----------------------

def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(revenue, 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
            .select("o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                    "revenue"))


Q3_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- Q5-style: revenue by nation within a region (6-way join) ---------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the dimension chain (region→nation→supplier), shuffle
    only the two fact tables on the join keys — at 100 TB the facts
    shuffle once and every dimension join is map-side."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    l = _t(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(F.round(revenue, 2).alias("revenue")))


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- top customers by revenue (join + agg + top-k) --------------------------

def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey", "c_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
            .limit(10))


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spent,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


# --- group-by stats on a dimension -----------------------------------------

def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (p.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 _stable_avg(F.sum("p_retailprice"),
                             F.count(F.lit(1))).alias("avg_price"),
                 F.max("p_size").alias("max_size"),
                 F.count_distinct(F.col("p_type")).alias("n_types")))


PART_BRAND_STATS_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(round(sum(p_retailprice), 2) / count(*), 4) AS avg_price,
       max(p_size) AS max_size,
       CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand
"""


# --- semi / anti joins ------------------------------------------------------

def big_spender_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment counts of customers having >= 1 order over 50k —
    EXISTS as a left-semi join (no duplication, no distinct pass)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers")))


BIG_SPENDER_SEGMENTS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
GROUP BY c_mktsegment
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join, counted per nation (broadcast
    dim). The anti side is orders above 400k so the result is
    non-trivial at every scale factor (every customer has *some*
    order in the synthetic data)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    n = _t(spark, sf_dir, "nation")
    return (c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_customers")))


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT n_name, count(*) AS n_customers
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
GROUP BY n_name
"""


# --- window functions -------------------------------------------------------

def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"), "rn"))


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
FROM orders
QUALIFY rn <= 3
"""


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over time (frame-based window).
    Restricted to custkey < 100 to keep gate output compact."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (o.select("o_custkey", "o_orderkey",
                     F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spent")))


RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spent
FROM orders WHERE o_custkey < 100
"""


# --- rollup / grouping sets -------------------------------------------------

def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .rollup("c_mktsegment", "o_orderstatus")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders")))


ROLLUP_REVENUE_SQL = """
SELECT c_mktsegment, o_orderstatus,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


# --- distinct aggregation ---------------------------------------------------

def distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
                 F.count_distinct(F.col("l_partkey")).alias("n_parts"),
                 F.count(F.lit(1)).alias("n_rows")))


DISTINCT_STATS_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- set operations ---------------------------------------------------------

def _active_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.filter((F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp")))
            .select("o_custkey").distinct())


def retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custkeys active in both 1995 and 1996 (INTERSECT)."""
    return _active_custkeys(spark, sf_dir, 1995).intersect(
        _active_custkeys(spark, sf_dir, 1996))


RETAINED_CUSTOMERS_SQL = """
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custkeys active in 1995 but not 1996 (EXCEPT)."""
    return _active_custkeys(spark, sf_dir, 1995).exceptAll(
        _active_custkeys(spark, sf_dir, 1996)).distinct()


CHURNED_CUSTOMERS_SQL = """
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


QUERIES = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL),
    "q3_top_orders": QuerySpec(q3_top_orders, Q3_SQL),
    "q5_region_revenue": QuerySpec(q5_region_revenue, Q5_SQL),
    "top_customers": QuerySpec(top_customers, TOP_CUSTOMERS_SQL),
    "part_brand_stats": QuerySpec(part_brand_stats, PART_BRAND_STATS_SQL),
    "big_spender_segments": QuerySpec(big_spender_segments, BIG_SPENDER_SEGMENTS_SQL),
    "customers_without_orders": QuerySpec(customers_without_orders,
                                          CUSTOMERS_WITHOUT_ORDERS_SQL),
    "top_orders_per_customer": QuerySpec(top_orders_per_customer,
                                         TOP_ORDERS_PER_CUSTOMER_SQL),
    "running_revenue": QuerySpec(running_revenue, RUNNING_REVENUE_SQL),
    "rollup_revenue": QuerySpec(rollup_revenue, ROLLUP_REVENUE_SQL),
    "distinct_stats": QuerySpec(distinct_stats, DISTINCT_STATS_SQL),
    "retained_customers": QuerySpec(retained_customers, RETAINED_CUSTOMERS_SQL),
    "churned_customers": QuerySpec(churned_customers, CHURNED_CUSTOMERS_SQL),
}
