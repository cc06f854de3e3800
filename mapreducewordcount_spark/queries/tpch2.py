"""Second TPC-H-derived batch: the query shapes round 1 left out.

Adapted to the driver schema (no partsupp table; lineitem carries no
commitdate/receiptdate/shipmode; see TESTDATA.md), keeping each
query's *operator* content intact: EXISTS with an inequality on both
relations (Q4), bi-directional nation pairs (Q7), conditional-ratio
aggregation (Q8/Q14), top-k over a returned-items join (Q10), double
aggregation with zero-preserving outer join (Q13), scalar-subquery
max (Q15), correlated per-group average threshold (Q17), HAVING on a
grouped fact (Q18), disjunctive multi-column pushdown (Q19), and the
exactly-one-offender blame analysis (Q21).

Reference parity note: the reference engine
(/root/reference/src/worker.py, launcher.py) has no relational layer
at all — SURVEY.md §2.4 records the absence; this module is part of
the §2.5 extension surface.

Float discipline, upgraded from tpch.py's round-the-sum trick:
revenue sums here run in DECIMAL. ``round(sum(double), 2)`` is only
*probabilistically* order-independent — building this module caught
two groups (q9, q10) whose true sum sits exactly on a half-cent, so
last-ulp summation noise (different between Spark's 16-partition
tree and DuckDB's single stream) flipped the rounded cent. Casting
the 2dp-money doubles to ``decimal(18,4)`` first makes every product
and the whole sum EXACT in any order on both engines (the doubles
are 1e-13 from their decimal values, so the cast quantization is
itself unambiguous); the final cast back to double is one
deterministic operation. This is also the right call at 100 TB:
money columns should be decimal from ingest, not repaired at query
time. Quantity sums are small integers in doubles — exact in any
order — and safe to compare raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,4)"


def _rev() -> F.Column:
    """Per-row discounted revenue, exact: decimal * decimal never
    rounds. A function, not a module constant — ``F.lit`` needs a
    live SparkContext, and the registry must import before the
    driver has built its session."""
    return (F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)))


#: exact-decimal SQL mirror of ``_rev()`` for the DuckDB oracles
_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,4))"
            " * (1 - CAST(l_discount AS DECIMAL(18,4)))")


def _money_sum(expr) -> F.Column:
    """Exact decimal sum, rounded to cents IN DECIMAL, then rendered
    as a double. The round must happen before the cast: exact
    half-cent sums (they occur in this data — customer 249's Q10
    revenue is 307843.595 exactly) round differently once the value
    is a double, because Spark rounds the shortest decimal
    representation (BigDecimal.valueOf) while DuckDB rounds the
    binary value. Decimal round is HALF_UP in both engines; the 2dp
    result converts to double exactly the same way everywhere."""
    return F.round(F.sum(expr), 2).cast("double")


# --- Q4: orders with a late-shipping lineitem, by priority ------------------

def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS whose predicate references BOTH relations
    (l_shipdate > o_orderdate + 60 days) — compiles to a left-semi
    hash join on the equi-part with the inequality as join residual,
    so each order is counted once however many lineitems are late."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
    l = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (o.join(l, (F.col("o_orderkey") == F.col("l_orderkey")) & late,
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders")))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --- Q7: volume shipping between two nations --------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation x customer-nation trade volume, both
    directions, by ship year. Nation joins broadcast; the only
    shuffles are fact⋈fact and the final group-by."""
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(_money_sum(_rev()).alias("revenue")))


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         {_REV_SQL} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share ----------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of AMERICA-region PROMO-part revenue supplied by
    NATION_1, per order year. Conditional aggregation: one pass, no
    self-join; the share divides two cent-rounded sums so the double
    quotient is identical across engines."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").startswith("PROMO"))
    nat_rev = F.sum(F.when(F.col("supp_nation") == "NATION_1", _rev())
                    .otherwise(F.lit(0).cast(_DEC)))
    tot_rev = F.sum(_rev())
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n_cust),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(nat_rev.cast("double") / tot_rev.cast("double"), 6)
                 .alias("mkt_share"),
                 F.round(tot_rev, 2).cast("double").alias("total_revenue")))


Q8_SQL = f"""
SELECT o_year,
       round(CAST(nat_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE), 6) AS mkt_share,
       CAST(round(tot_rev, 2) AS DOUBLE) AS total_revenue
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         sum(CASE WHEN n2.n_name = 'NATION_1'
             THEN {_REV_SQL} ELSE 0 END) AS nat_rev,
         sum({_REV_SQL}) AS tot_rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND p_type LIKE 'PROMO%'
  GROUP BY 1
) t
"""


# --- Q9: product-line profit by nation and year -----------------------------

def q9_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue (no supplycost column exists, so profit = discounted
    revenue) for parts whose name contains 'widget', by supplier
    nation and order year — the classic Q9 shape: pattern filter on a
    dimension, two fact joins, two-level grouping."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(_money_sum(_rev()).alias("profit")))


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --- Q10: returned-item revenue, top customers ------------------------------

def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(_money_sum(_rev()).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", F.round("c_acctbal", 2)
                    .alias("c_acctbal"), "n_name", "revenue"))


Q10_SQL = f"""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q13: distribution of orders per customer -------------------------------

def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double aggregation with a zero-preserving outer join: count
    orders per customer (left join keeps order-less customers at 0 —
    ``count(o_orderkey)`` skips nulls in both engines), then histogram
    the counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- Q14: promotion revenue share -------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    p = _t(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type").startswith("PROMO"), _rev())
                  .otherwise(F.lit(0).cast(_DEC)))
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(F.lit(100.0) * promo.cast("double")
                         / F.sum(_rev()).cast("double"), 6)
                 .alias("promo_share")))


Q14_SQL = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE), 6)
       AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --- Q15: top supplier(s) by quarter revenue --------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery max: supplier(s) whose quarter revenue equals
    the global maximum. The max is computed over cent-rounded sums,
    making the equality order-independent; the one-row max side is
    cross-broadcast, never collected on the driver."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    s = _t(spark, sf_dir, "supplier")
    rev = (l.groupBy("l_suppkey")
           .agg(_money_sum(_rev()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev"))


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


# --- Q17: small-quantity-order revenue --------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-part average threshold: Brand#1 lineitems with
    quantity under 20%% of that part's average quantity. Quantities
    are small integers — their sums are exact in doubles in any
    order, so the 0.2*avg threshold is engine-independent without
    rounding tricks. The per-part agg shuffles the (already
    part-filtered) fact once; the threshold join is broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    thresholds = (lp.groupBy(F.col("l_partkey").alias("t_partkey"))
                  .agg((F.lit(0.2) * (F.sum("l_quantity")
                                      / F.count(F.lit(1))))
                       .alias("qty_threshold")))
    return (lp.join(thresholds,
                    F.col("l_partkey") == F.col("t_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_threshold"))
            .agg(F.round(F.sum(F.col("l_extendedprice").cast(_DEC))
                         .cast("double") / 7.0, 2)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_rows")))


Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * (sum(l2.l_quantity) / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


# --- Q18: large-volume orders -----------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING on a grouped fact, then enrich: the quantity rollup
    runs FIRST and only qualifying orderkeys (a few dozen at any SF)
    join back — broadcast — against orders and customer."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (l.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > 300))
    return (o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.round("sum_qty", 0).alias("sum_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100))


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum_qty, 0) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
  ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- Q19: disjunctive predicate revenue -------------------------------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides — the optimizer splits the
    common conjunct (the equi-key) from the residual disjunction;
    per-branch part predicates still prune the broadcast build side."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    branch = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30))))
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .filter(branch)
            .agg(_money_sum(_rev()).alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


Q19_SQL = f"""
SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q21: the one supplier who held up the order ----------------------------

def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blame analysis (Q21's EXISTS/NOT-EXISTS pair, stated as one
    grouped pass): in finished multi-supplier orders, find the orders
    where EXACTLY ONE supplier shipped late (> 90 days after the
    order date) and charge that supplier. One fact⋈fact join, one
    per-order aggregation; the exactly-one rule makes
    ``max(late_suppkey)`` the offender without a second join back."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    per_order = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(late, F.col("l_suppkey")))
                      .alias("n_late"),
                      F.max(F.when(late, F.col("l_suppkey")))
                      .alias("late_supp")))
    return (per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
            .groupBy("late_supp")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(s, F.col("late_supp") == F.col("s_suppkey"))
            .orderBy(F.col("numwait").desc(), F.col("s_name"))
            .limit(10)
            .select("s_name", "numwait"))


Q21_SQL = """
SELECT s_name, numwait
FROM (
  SELECT late_supp, count(*) AS numwait
  FROM (
    SELECT o_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                               THEN l_suppkey END) AS n_late,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN l_suppkey END) AS late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderkey
  ) per_order
  WHERE n_supp > 1 AND n_late = 1
  GROUP BY late_supp
) blamed
JOIN supplier ON late_supp = s_suppkey
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES = {
    "q4_priority_late": QuerySpec(q4_priority_late, Q4_SQL),
    "q7_nation_volume": QuerySpec(q7_nation_volume, Q7_SQL),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "q9_type_profit": QuerySpec(q9_type_profit, Q9_SQL),
    "q10_returned_customers": QuerySpec(q10_returned_customers, Q10_SQL),
    "q13_order_count_dist": QuerySpec(q13_order_count_dist, Q13_SQL),
    "q14_promo_revenue": QuerySpec(q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": QuerySpec(q18_large_orders, Q18_SQL),
    "q19_disjunctive": QuerySpec(q19_disjunctive, Q19_SQL),
    "q21_late_suppliers": QuerySpec(q21_late_suppliers, Q21_SQL),
}
