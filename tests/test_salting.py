"""Two-phase salted aggregation equals direct aggregation (hot keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.buckets import salted_key


def test_salted_two_phase_agg_matches_direct(spark):
    # Zipfian-ish corpus: one word dominates (the hot-key case); the
    # row id is the deterministic per-row discriminator the salt needs
    rows = [(i, "the") for i in range(5000)] + \
        [(5000 + i, "rare%d" % i) for i in range(200)]
    df = spark.createDataFrame(rows, "row_id long, word string").repartition(16)

    direct = {r.word: r.n for r in
              df.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()}

    phase1 = (df.withColumn("sk", salted_key("word", 8, salt_from="row_id"))
              .groupBy("sk").agg(F.count(F.lit(1)).alias("n")))
    phase2 = (phase1
              .withColumn("word", F.substring_index("sk", "#", 1))
              .groupBy("word").agg(F.sum("n").alias("n")))
    salted = {r.word: r.n for r in phase2.collect()}

    assert salted == direct
    # and the salt actually spread the hot key over multiple groups
    n_hot_groups = phase1.filter(F.col("sk").startswith("the#")).count()
    assert n_hot_groups > 1


def test_salt_is_deterministic_per_row(spark):
    """Same rows → same salted keys on every evaluation (retry safety)."""
    df = spark.createDataFrame([(i, "k") for i in range(100)],
                               "row_id long, word string")
    sk = df.select(salted_key("word", 8, salt_from="row_id").alias("sk"),
                   "row_id")
    a = {r.row_id: r.sk for r in sk.collect()}
    b = {r.row_id: r.sk for r in sk.repartition(7).collect()}
    assert a == b


def test_salt_requires_discriminator():
    with pytest.raises(ValueError, match="salt_from"):
        salted_key("word", 8)
