"""Grouped Arrow-path operator (applyInPandas) correctness."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.grouped import grouped_ntile


def test_grouped_ntile_matches_window_ntile(spark):
    """The pandas-side ntile math must equal Spark's distributed
    ntile window for every group size mod k, including n < k."""
    rng = random.Random(3)
    rows = [(i, f"g{rng.randint(0, 6)}", rng.randint(0, 1000))
            for i in range(500)]
    # group g7 has 3 rows < k=10 (each row its own bucket)
    rows += [(1000, "g7", 5), (1001, "g7", 2), (1002, "g7", 9)]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    got = {(r.id, r.decile) for r in
           grouped_ntile(df, ["grp"], ["v", "id"], 10, "decile").collect()}
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = {(r.id, r.decile) for r in
            df.withColumn("decile", F.ntile(10).over(w)).collect()}
    assert got == want


def test_grouped_ntile_deterministic_across_partitionings(spark):
    """Output is a function of the data, not of arrival order."""
    rows = [(i, "g", i % 37) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    a = sorted((r.id, r.decile) for r in
               grouped_ntile(df, ["grp"], ["v", "id"], 7, "decile").collect())
    b = sorted((r.id, r.decile) for r in
               grouped_ntile(df.repartition(17), ["grp"], ["v", "id"], 7,
                             "decile").collect())
    assert a == b


def test_grouped_ntile_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "g", 1)], "id long, grp string, v long")
    with pytest.raises(ValueError):
        grouped_ntile(df, ["grp"], ["v", "id"], 0)
