"""Two-pass heavy hitters: Misra-Gries bound/completeness on a
planted long-tail corpus where capacity << distinct keys, and
exactness of the verified output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries_summaries,
)


def _longtail(spark, parts=8):
    # 500 x hot, 120 x warm, 60 x edge, 1 x each of 320 tail keys.
    # n = 1000; distinct = 323 — far above the MG capacity used below.
    rows = ([("hot",)] * 500 + [("warm",)] * 120 + [("edge",)] * 60
            + [(f"tail{i:03d}",) for i in range(320)])
    return spark.createDataFrame(rows, "key string").repartition(parts)


def test_summary_respects_capacity(spark):
    df = _longtail(spark, parts=4)
    summ = misra_gries_summaries(df, "key", capacity=16)
    per_part = (summ.groupBy(F.spark_partition_id().alias("p"))
                    .count().collect())
    assert per_part  # non-empty
    assert all(r["count"] <= 16 for r in per_part)


def test_merged_summary_contains_every_heavy_key(spark):
    # undercount across any merge is <= n/(capacity+1) = 1000/33 < 31,
    # so every key with count >= 31 must survive with positive weight.
    df = _longtail(spark)
    merged = (misra_gries_summaries(df, "key", capacity=32)
              .groupBy("key").agg(F.sum("weight").alias("w")))
    got = {r["key"]: r["w"] for r in merged.collect()}
    for key, true in (("hot", 500), ("warm", 120), ("edge", 60)):
        assert key in got
        assert got[key] >= true - 1000 // 33


def test_output_is_exact_vs_bruteforce(spark):
    df = _longtail(spark)
    got = {(r["key"], r["n_occurrences"], r["share_ppm"])
           for r in heavy_hitters(df, "key", phi_num=1, phi_denom=20,
                                  capacity=32).collect()}
    # brute force: phi = 1/20 of n=1000 -> count >= 50
    want = {("hot", 500, 500_000), ("warm", 120, 120_000),
            ("edge", 60, 60_000)}
    assert got == want


def test_threshold_boundary_is_inclusive(spark):
    # 50*20 >= 1000 exactly — 'edge50' sits ON the threshold.
    rows = [("edge50",)] * 50 + [(f"t{i}",) for i in range(950)]
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {r["key"] for r in heavy_hitters(df, "key", phi_num=1,
                                           phi_denom=20).collect()}
    assert "edge50" in got


def test_null_keys_ignored(spark):
    rows = [("a",)] * 10 + [(None,)] * 90
    df = spark.createDataFrame(rows, "key string")
    got = heavy_hitters(df, "key", phi_num=1, phi_denom=2).collect()
    # n counts only non-null keys: a holds 10/10 = 100% of the stream
    assert [(r["key"], r["n_occurrences"], r["share_ppm"])
            for r in got] == [("a", 10, 1_000_000)]


def test_insufficient_capacity_rejected(spark):
    df = _longtail(spark)
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, "key", phi_num=1, phi_denom=100, capacity=50)


def test_summary_capacity_validation(spark):
    df = _longtail(spark)
    with pytest.raises(ValueError, match="capacity"):
        misra_gries_summaries(df, "key", capacity=0)
