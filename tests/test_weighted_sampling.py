"""A-ES weighted sampling-without-replacement: key mechanics, weight
effect, and the top-k plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.sampling import weighted_sample_key


def _py_key(key: int, weight: int) -> str:
    return max(hashlib.md5(f"{key}:{j}".encode()).hexdigest()
               for j in range(1, weight + 1))


def test_key_matches_reference_recompute(spark):
    """The Spark expression reproduces max-of-w md5 draws bit-exactly
    (the same recompute the DuckDB oracle runs)."""
    df = spark.createDataFrame([(7, 1), (7, 5), (123, 8), (0, 3)],
                               "id long, w int")
    got = {(r["id"], r["w"]): r["k"] for r in df.select(
        "id", "w",
        weighted_sample_key(F.col("id"), F.col("w")).alias("k")).collect()}
    for (i, w), k in got.items():
        assert k == _py_key(i, w), (i, w)
    # more draws can only raise the max: the w=5 key dominates w=1
    assert got[(7, 5)] >= got[(7, 1)]


def test_weights_shift_inclusion(spark):
    """Sampling 2k of 20k rows split between weight 1 and weight 8:
    the weight-8 half must dominate the sample (its inclusion odds
    are ~8x per A-ES; the deterministic corpus makes this a fixed,
    reproducible count rather than a flaky statistical bound)."""
    rows = spark.range(0, 20000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(8)).otherwise(F.lit(1))
        .alias("w"))
    top = (rows
           .select("id", "w",
                   weighted_sample_key(F.col("id"), F.col("w"))
                   .alias("key"))
           .orderBy(F.desc("key"), "id")
           .limit(2000))
    heavy = top.filter(F.col("w") == 8).count()
    assert heavy > 1500  # ~8:1 odds -> expect ~1778 of 2000


def test_topk_plans_as_take_ordered(spark):
    rows = spark.range(0, 1000).select(
        F.col("id"), F.lit(3).alias("w"))
    top = (rows
           .select("id", weighted_sample_key(F.col("id"), F.col("w"))
                   .alias("key"))
           .orderBy(F.desc("key"), "id")
           .limit(100))
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort for a top-k
