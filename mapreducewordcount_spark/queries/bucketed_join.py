"""Bucketed fact⋈fact join as a gate-checked query (SCALE.md lever #1).

The recurring-join cost lever at 100 TB: co-bucket both fact tables
on the join key at WRITE time (``bucketBy`` + ``saveAsTable``), and
every subsequent join on that key runs with zero Exchange — the
shuffle is prepaid once instead of on every query. The Exchange-free
plan is pinned in tests/test_bucketed_stateful.py; this query gives
the same path a driver CORRECTNESS row (VERDICT r1 stretch #9):
results must equal the plain-parquet join bit-for-bit, since
bucketing is a physical layout choice, never a semantics change.

The write step happens inside the query (the gate hands us only
(spark, sf_dir)) — in production it is a one-time table-build;
``ivf_build`` has the same write-time/read-time shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.bucketed import write_bucketed
from mapreducewordcount_spark.sources.tables import load_table


def bucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority via the co-bucketed join path."""
    o = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    write_bucketed(o, "gate_orders_b", ["o_orderkey"], 8)
    write_bucketed(l, "gate_lineitem_b", ["l_orderkey"], 8)
    ob = spark.table("gate_orders_b")
    lb = spark.table("gate_lineitem_b")
    return (lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


BUCKETED_REVENUE_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "bucketed_order_revenue": QuerySpec(bucketed_order_revenue,
                                        BUCKETED_REVENUE_SQL),
}
