"""salted_join equals the plain join under planted skew, and the
salt actually spreads the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.skewjoin import salted_join


@pytest.fixture()
def skewed(spark):
    # one mega-key (9/10 of rows) + a long tail; small side has keys
    # with 0, 1 and 2 matching rows to exercise multiplicity
    big = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 7, f"v{i}") for i in range(3000)],
        "row_id long, k long, payload string")
    small = spark.createDataFrame(
        [(0, "hot"), (1, "one"), (2, "two-a"), (2, "two-b"), (99, "miss")],
        "k long, name string")
    return big, small


def _counts(df):
    return {tuple(r) for r in df.collect()}


def test_inner_matches_plain_join(spark, skewed):
    big, small = skewed
    got = salted_join(big, small, "k", salt_from="row_id", buckets=8)
    want = big.join(small, "k")
    assert got.count() == want.count()
    assert _counts(got.select("row_id", "k", "name")) \
        == _counts(want.select("row_id", "k", "name"))


def test_left_keeps_unmatched_big_rows(spark, skewed):
    big, small = skewed
    got = salted_join(big, small, "k", salt_from="row_id", buckets=4,
                      how="left")
    want = big.join(small, "k", "left")
    assert got.count() == want.count()
    nulls = got.filter(F.col("name").isNull()).count()
    assert nulls == big.join(small, "k", "left_anti").count() > 0


def test_hot_key_spreads_over_salt_buckets(spark, skewed):
    big, _ = skewed
    salted = big.withColumn(
        "salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
    n_buckets = (salted.filter(F.col("k") == 0)
                 .select("salt").distinct().count())
    assert n_buckets == 8  # 2700 hot rows land in every bucket


def test_rejects_bad_args(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salt_from="row_id", how="full")
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salt_from="row_id", buckets=0)
    with pytest.raises(ValueError):
        salted_join(big.withColumn("name", F.lit("x")), small, "k",
                    salt_from="row_id")
