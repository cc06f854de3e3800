"""Bucketed-table writes: shuffle-free recurring joins.

The single biggest recurring-cost lever at 100 TB: two fact tables
co-bucketed on their join key join with **zero Exchange** — the
shuffle is paid once at write time instead of on every query.
``bucketBy`` requires a catalog table (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.

Recipe (verified in tests/test_bucketed.py):

    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 32)
    write_bucketed(orders,  "orders_b",  ["o_orderkey"], 32)
    spark.table("lineitem_b").join(spark.table("orders_b"),
        on=[l_orderkey == o_orderkey])   # SortMergeJoin, no Exchange

Same bucket count on both sides is required; Spark then lines
buckets up 1:1. Combine with ``sortBy`` on the key to also skip the
per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort: bool = True) -> None:
    spark = df.sparkSession
    # ``mode("overwrite")`` only replaces tables the CURRENT catalog
    # knows about; a warehouse directory left by a previous session
    # (catalog entry gone, files still on disk) fails the write with
    # LOCATION_ALREADY_EXISTS. Drop both the entry and the location.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(loc, True)
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, keys[0], *keys[1:])
         .format("parquet"))
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
