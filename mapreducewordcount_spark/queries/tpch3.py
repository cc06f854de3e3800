"""Third TPC-H-derived batch: the six queries the first two left out
(Q2, Q11, Q12, Q16, Q20, Q22), completing the 22-query shape set.

Four of these lean on ``partsupp``, which the driver schema does not
generate; the supplier-part relation is derived from ``lineitem``
instead (``groupBy(l_partkey, l_suppkey)``), which preserves each
query's *operator* content exactly:

- Q2  — correlated scalar-min subquery (min supply cost per part over
        a region-restricted supplier set) joined back on equality,
        plus a multi-dim join and a total-ordered top-k.
- Q11 — grouped value with a HAVING threshold that is a scalar
        aggregate over the whole grouped relation (value > 0.1% of
        the total), i.e. a self-referential global threshold.
- Q12 — conditional two-way aggregation over a fact⋈fact join keyed
        by a derived range bucket (shipping-delay class stands in for
        the missing ``l_shipmode``/receipt-commit dates).
- Q16 — count-distinct suppliers per part attribute triple with a
        NOT-IN exclusion subquery (negative-balance suppliers stand
        in for the missing comment-based complaint filter).
- Q20 — nested aggregation threshold: supplier-part volume compared
        against a correlated per-part total (availqty > ½ yearly
        demand becomes supplied-share > 30% of the part's 1996
        volume), feeding a left-semi join into ``supplier``.
- Q22 — anti-join against recent orders plus a strict comparison to a
        scalar-subquery average (nationkey stands in for the missing
        phone country code; "no orders at all" never happens in this
        data — every customer has one — so "idle" means no order
        since 2000-01-01).

Reference parity note: the reference engine
(/root/reference/src/worker.py, launcher.py) has no relational layer;
SURVEY.md §2.4 records the absence and §2.5 claims this extension
surface.

Float discipline (see tpch2.py's module docstring for the full
argument): money sums run in ``decimal(18,4)`` and are rounded to
cents in decimal before the final cast to double. Two extra rules
appear in this batch:

- Q2's ``supply_cost`` is a single IEEE division of two parquet
  doubles — bit-identical in any engine — so it is emitted RAW, and
  the min-equality join compares raw doubles. Rounding it would
  *create* divergence (Spark rounds the shortest decimal rendering,
  DuckDB the binary value).
- Q11/Q20's thresholds avoid non-integer literals: ``val > 0.001 *
  total`` is algebraically restated as ``1000 * val > total`` (exact
  decimal-by-integer product) and Q20's 30% share as ``10 * sp_qty >
  3 * p_qty`` (quantities are small integers in doubles — every
  product is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,4)"


def _supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``partsupp`` stand-in: one row per (partkey, suppkey) ever
    shipped, with the best unit price that pair ever offered. One
    shuffle on the composite key; map-side partial min."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy(F.col("l_partkey"), F.col("l_suppkey"))
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("supply_cost")))


_PS_SQL = """
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY 1, 2
"""


# --- Q2: minimum-cost supplier per part -------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small STANDARD part, the EUROPE supplier(s) offering
    it at the region-wide minimum unit cost. The correlated scalar
    min becomes a per-part aggregate joined back on (partkey, cost)
    equality — two shuffles on partkey, suppliers broadcast both
    times. Top-k is a total order (acctbal desc, partkey, name), so
    LIMIT is deterministic under ties."""
    ps = _supplier_parts(spark, sf_dir)
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (_t(spark, sf_dir, "supplier")
          .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
         .select("p_partkey", "p_name"))
    eu_ps = ps.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = (eu_ps.groupBy(F.col("l_partkey").alias("mc_partkey"))
                .agg(F.min("supply_cost").alias("min_cost")))
    return (eu_ps
            .join(min_cost, (F.col("l_partkey") == F.col("mc_partkey"))
                  & (F.col("supply_cost") == F.col("min_cost")))
            .join(p, F.col("l_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                    "supply_cost")
            .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"),
                     F.col("s_name"))
            .limit(100))


Q2_SQL = f"""
WITH ps AS ({_PS_SQL}),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM part
JOIN ps ON p_partkey = ps.l_partkey
JOIN eu ON ps.l_suppkey = eu.s_suppkey
WHERE p_type = 'STANDARD' AND p_size <= 10
  AND supply_cost = (SELECT min(ps2.supply_cost)
                     FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
                     WHERE ps2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


# --- Q11: important part values ---------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipped value per part restricted to NATION_1 suppliers,
    keeping parts worth more than 0.1% of the total. The HAVING
    threshold is a scalar aggregate of the grouped relation itself:
    computed once, broadcast back as a 1-row cross join (no driver
    action, no second scan of lineitem — the grouped frame feeds
    both sides). Stated as ``1000 * val > total`` so every compare
    is exact decimal arithmetic."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey"))
    l = _t(spark, sf_dir, "lineitem")
    val = (l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("val")))
    total = val.agg(F.sum("val").alias("total"))
    return (val.crossJoin(F.broadcast(total))
            .filter(F.col("val") * F.lit(1000) > F.col("total"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.round(F.col("val"), 2).cast("double").alias("value")))


Q11_SQL = """
WITH v AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY 1)
SELECT l_partkey AS p_partkey, CAST(round(val, 2) AS DOUBLE) AS value
FROM v WHERE 1000 * val > (SELECT sum(val) FROM v)
"""


# --- Q12: order priority by shipping-speed class ----------------------------

def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional two-way aggregation over the orders⋈lineitem join:
    per shipping-speed class (days from order to ship — the derived
    bucket standing in for TPC-H's ship mode), how many lines belong
    to critical vs other priorities. One fact⋈fact shuffle, then a
    3-group aggregate; both CASE sums run in one pass."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (F.when(delay >= 90, F.lit("LATE"))
             .when(delay >= 30, F.lit("SLOW"))
             .otherwise(F.lit("FAST")))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(speed.alias("speed"))
            .agg(F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count")))


Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 90 THEN 'LATE'
            WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'SLOW'
            ELSE 'FAST' END AS speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --- Q16: supplier counts by part attributes --------------------------------

def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) over selected sizes,
    excluding brand 1 / PROMO parts and every negative-balance
    supplier (the NOT-IN subquery → a broadcast left-anti join on a
    six-row exclusion set). The distinct-pairs aggregate shuffles
    16 bytes per pair; part is broadcast."""
    pairs = (_t(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)))
    return (pairs
            .join(bad,
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(p, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --- Q20: suppliers with an outsized share of a part's volume ---------------

def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 30% of some 'small *' part's
    total 1996 volume. Nested aggregation threshold: the per-
    (part, supplier) sum is compared against the correlated per-part
    total — both aggregates reuse one filtered scan, the totals join
    back on partkey, and qualifying suppkeys feed a left-semi join
    into supplier. ``10·sp > 3·total`` keeps the compare exact
    (quantities are small integers)."""
    l_96 = (_t(spark, sf_dir, "lineitem")
            .filter((F.col("l_shipdate")
                     >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("l_shipdate")
                       < F.lit("1997-01-01").cast("timestamp")))
            .select("l_partkey", "l_suppkey", "l_quantity"))
    small = (_t(spark, sf_dir, "part")
             .filter(F.col("p_name").startswith("small"))
             .select("p_partkey"))
    l_96 = l_96.join(small,
                     F.col("l_partkey") == F.col("p_partkey"))
    sp = (l_96.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("sp_qty")))
    tot = (sp.groupBy(F.col("l_partkey").alias("t_partkey"))
           .agg(F.sum("sp_qty").alias("p_qty")))
    big = (sp.join(tot, F.col("l_partkey") == F.col("t_partkey"))
           .filter(F.col("sp_qty") * 10 > F.col("p_qty") * 3)
           .select("l_suppkey").distinct())
    return (_t(spark, sf_dir, "supplier")
            .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select("s_name", "s_acctbal"))


Q20_SQL = """
WITH sp AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND p_name LIKE 'small%'
  GROUP BY 1, 2),
tot AS (SELECT l_partkey, sum(sp_qty) AS p_qty FROM sp GROUP BY 1)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT sp.l_suppkey FROM sp
                    JOIN tot ON sp.l_partkey = tot.l_partkey
                    WHERE sp.sp_qty * 10 > tot.p_qty * 3)
"""


# --- Q22: wealthy customers gone idle ---------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers whose balance beats the positive-balance
    average but who placed no order since 2000 (every customer here
    has *some* order, so the classic no-orders NOT EXISTS becomes an
    anti-join against recent orders). The average is a scalar
    subquery made order-independent the decimal way — exact sum,
    round in decimal, one double division — so the strict ``>`` picks
    identical rows on both engines."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg((F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2)
                     .cast("double")
                     / F.count(F.lit(1))).alias("avg_bal")))
    recent = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      >= F.lit("2000-01-01").cast("timestamp"))
              .select("o_custkey"))
    return (c.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2)
                 .cast("double").alias("totacctbal")))


Q22_SQL = """
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2)
                               AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


QUERIES = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL),
    "q11_important_parts": QuerySpec(q11_important_parts, Q11_SQL),
    "q12_ship_priority": QuerySpec(q12_ship_priority, Q12_SQL),
    "q16_part_supplier_counts": QuerySpec(q16_part_supplier_counts, Q16_SQL),
    "q20_excess_share_suppliers": QuerySpec(q20_excess_share_suppliers,
                                            Q20_SQL),
    "q22_idle_customers": QuerySpec(q22_idle_customers, Q22_SQL),
}
