"""Second analytics batch: pivot / unpivot / cube / exact percentiles.

Completes the relational-operator families a warehouse user expects
(all absent from the reference — SURVEY.md §2.4). Oracle discipline
as everywhere: identical aliases both sides, conditional-aggregation
SQL for pivot (engine-portable), linear-interpolation percentiles on
both engines, money rounded 2dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table


def _joined_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey"))


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matrix segment × order-status via ``pivot`` (explicit
    value list → no extra distinct scan, stable column order)."""
    df = (_joined_orders(spark, sf_dir)
          .groupBy("c_mktsegment")
          .pivot("o_orderstatus", ["O", "F", "P"])
          .agg(F.round(F.sum("o_totalprice"), 2)))
    return df.select("c_mktsegment", F.col("O").alias("rev_o"),
                     F.col("F").alias("rev_f"), F.col("P").alias("rev_p"))


PIVOT_SQL = """
SELECT c_mktsegment,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part wide columns → long (measure, value) rows + aggregate;
    ``unpivot``/``melt`` is the Spark-native stack."""
    p = load_table(spark, sf_dir, "part")
    long = p.unpivot("p_brand", ["p_size", "p_retailprice"],
                     "measure", "value")
    return (long.groupBy("p_brand", "measure")
            # round(sum,2)/count: order-independent avg of 2dp values
            .agg(F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 4)
                 .alias("avg_value"),
                 F.count(F.lit(1)).alias("n")))


UNPIVOT_SQL = """
SELECT p_brand, measure,
       round(round(sum(value), 2) / count(*), 4) AS avg_value, count(*) AS n
FROM (
  SELECT p_brand, 'p_size' AS measure, p_size::DOUBLE AS value FROM part
  UNION ALL
  SELECT p_brand, 'p_retailprice' AS measure, p_retailprice AS value FROM part
) t
GROUP BY p_brand, measure
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, status): all 4 grouping-set combinations."""
    return (_joined_orders(spark, sf_dir)
            .cube("c_mktsegment", "o_orderstatus")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders")))


CUBE_SQL = """
SELECT c_mktsegment, o_orderstatus,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
"""


def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact *discrete* percentiles per segment: the element at rank
    ``ceil(q·n)`` (1-based) — no interpolation, so the value is an
    actual data point and cross-engine float-boundary flips can't
    occur (continuous interpolation of 2dp money lands on exact .005
    ties that engines round differently). One window pass; at scale
    ``approx_percentile`` is the single-pass sketch alternative."""
    from pyspark.sql import Window

    df = _joined_orders(spark, sf_dir).select("c_mktsegment", "o_totalprice",
                                              "o_orderkey")
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    ranked = (df.withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("c_mktsegment"))))
    picks = [F.round(F.max(F.when(
        F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("o_totalprice"))), 2)
        .alias(name) for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))]
    return ranked.groupBy("c_mktsegment").agg(*picks)


QUANTILES_SQL = """
WITH ranked AS (
  SELECT c_mktsegment, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       round(max(CASE WHEN rn = ceil(0.5 * n) THEN o_totalprice END), 2) AS p50,
       round(max(CASE WHEN rn = ceil(0.9 * n) THEN o_totalprice END), 2) AS p90,
       round(max(CASE WHEN rn = ceil(0.99 * n) THEN o_totalprice END), 2) AS p99
FROM ranked
GROUP BY c_mktsegment
"""


def rollup_with_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + ``grouping()`` flags: lets consumers distinguish a
    real NULL group key from a rollup subtotal row — required for
    correct subtotal rendering when the data itself contains NULLs."""
    return (_joined_orders(spark, sf_dir)
            .rollup("c_mktsegment", "o_orderstatus")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.grouping("c_mktsegment").cast("int").alias("g_seg"),
                 F.grouping("o_orderstatus").cast("int").alias("g_status")))


ROLLUP_FLAGS_SQL = """
SELECT c_mktsegment, o_orderstatus,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(grouping(c_mktsegment) AS INT) AS g_seg,
       CAST(grouping(o_orderstatus) AS INT) AS g_status
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


def orders_nearby_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per order, how many of the same customer's
    orders fall within ±30 days — a physical range frame over an
    epoch-days ordering column (RANGE frames need a numeric key in
    both engines). Restricted to custkey < 50 for gate compactness."""
    from pyspark.sql import Window

    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 50)
         .withColumn("day", F.datediff("o_orderdate",
                                       F.lit("1990-01-01").cast("date"))))
    w = (Window.partitionBy("o_custkey").orderBy("day")
         .rangeBetween(-30, 30))
    return (o.select("o_custkey", "o_orderkey",
                     F.count(F.lit(1)).over(w).alias("n_nearby")))


ORDERS_NEARBY_SQL = """
WITH d AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1990-01-01', o_orderdate::DATE) AS day
  FROM orders WHERE o_custkey < 50
)
SELECT o_custkey, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS n_nearby
FROM d
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE can't
    express: revenue by (segment), by (status, priority), and the
    grand total, with ``grouping()`` flags disambiguating subtotal
    rows from real NULL keys. One Expand + one aggregate in the plan
    (each input row fans out once per set — 3× here, constant), so
    the shape scales like any partial-agg groupBy; column pruning
    still reaches the scan. Spark 4's native ``DataFrame.
    groupingSets`` (round-10 addition to the relational family)."""
    return (_joined_orders(spark, sf_dir)
            .groupingSets([["c_mktsegment"],
                           ["o_orderstatus", "o_orderpriority"], []],
                          "c_mktsegment", "o_orderstatus",
                          "o_orderpriority")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.grouping("c_mktsegment").cast("int").alias("g_seg"),
                 F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int")
                 .alias("g_prio")))


GROUPING_SETS_SQL = """
SELECT c_mktsegment, o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
       CAST(grouping(c_mktsegment) AS INT) AS g_seg,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment),
                        (o_orderstatus, o_orderpriority), ())
"""


QUERIES = {
    "pivot_status_by_segment": QuerySpec(pivot_status_by_segment, PIVOT_SQL),
    "grouping_sets_revenue": QuerySpec(grouping_sets_revenue,
                                       GROUPING_SETS_SQL),
    "unpivot_part_measures": QuerySpec(unpivot_part_measures, UNPIVOT_SQL),
    "cube_revenue": QuerySpec(cube_revenue, CUBE_SQL),
    "segment_price_quantiles": QuerySpec(segment_price_quantiles, QUANTILES_SQL),
    "rollup_with_grouping_flags": QuerySpec(rollup_with_grouping_flags,
                                            ROLLUP_FLAGS_SQL),
    "orders_nearby_window": QuerySpec(orders_nearby_window, ORDERS_NEARBY_SQL),
}
