"""Two-phase salted aggregation equals direct aggregation (hot keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.buckets import salted_key


def test_salted_two_phase_agg_matches_direct(spark):
    # Zipfian-ish corpus: one word dominates (the hot-key case)
    rows = [("the",)] * 5000 + [("rare%d" % i,) for i in range(200)]
    df = spark.createDataFrame(rows, "word string").repartition(16)

    direct = {r.word: r.n for r in
              df.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()}

    phase1 = (df.withColumn("sk", salted_key("word", 8))
              .groupBy("sk").agg(F.count(F.lit(1)).alias("n")))
    phase2 = (phase1
              .withColumn("word", F.substring_index("sk", "#", 1))
              .groupBy("word").agg(F.sum("n").alias("n")))
    salted = {r.word: r.n for r in phase2.collect()}

    assert salted == direct
    # and the salt actually spread the hot key over multiple groups
    n_hot_groups = phase1.filter(F.col("sk").startswith("the#")).count()
    assert n_hot_groups > 1
