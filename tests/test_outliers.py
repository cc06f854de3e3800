"""Robust median/MAD outlier detection: planted outliers, integer
exactness, group isolation, and edge cases (tiny groups, even
counts where the median interpolates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.outliers import (
    robust_group_stats,
    robust_outlier_flags,
    robust_outlier_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_planted_outlier_flagged_only_in_its_group(spark):
    rows = ([("a", 100 + i) for i in range(9)] + [("a", 10_000)]
            + [("b", 100 + i) for i in range(10)])
    flagged = robust_outlier_flags(_df(spark, rows), "g", "v")
    out = [(r.g, r.v) for r in
           flagged.filter(F.col("is_outlier") == 1).collect()]
    assert out == [("a", 10_000)]


def test_median_and_mad_are_exact_quarter_units(spark):
    # odd count: median 3 -> med4 12; devs |v-3| = 2,1,0,1,2
    # -> dev4 = 8,4,0,4,8 -> MAD 1 -> mad8 8
    stats = {r.grp: (r.med4, r.mad8) for r in
             robust_group_stats(_df(spark, [("a", 1), ("a", 2), ("a", 3),
                                            ("a", 4), ("a", 5)]),
                                "g", "v").collect()}
    assert stats == {"a": (12, 8)}
    # even count: median of (1,2,3,4) = 2.5 -> med4 10 (exact);
    # dev4 = 6,2,2,6 -> median(dev4) = 4 -> mad8 8
    stats = {r.grp: (r.med4, r.mad8) for r in
             robust_group_stats(_df(spark, [("a", 1), ("a", 2), ("a", 3),
                                            ("a", 4)]),
                                "g", "v").collect()}
    assert stats == {"a": (10, 8)}


def test_singleton_and_constant_groups_never_flag(spark):
    rows = [("solo", 42), ("c", 7), ("c", 7), ("c", 7)]
    flagged = robust_outlier_flags(_df(spark, rows), "g", "v")
    assert flagged.filter(F.col("is_outlier") == 1).count() == 0


def test_k_ratio_threshold(spark):
    # uniform 1..9: median 5, MAD 2; v=9 has dev 4 = 2*MAD — flagged
    # at k=1.5 (2*dev4 > 3*mad8/2 ... k_num=3, k_denom=2), not at k=3
    rows = [("a", i) for i in range(1, 10)]
    strict = robust_outlier_flags(_df(spark, rows), "g", "v",
                                  k_num=3, k_denom=1)
    assert strict.filter(F.col("is_outlier") == 1).count() == 0
    loose = robust_outlier_flags(_df(spark, rows), "g", "v",
                                 k_num=3, k_denom=2)
    got = sorted(r.v for r in
                 loose.filter(F.col("is_outlier") == 1).collect())
    assert got == [1, 9]  # dev 4 > 1.5 * MAD(2) = 3


def test_report_counts_match_flags(spark):
    rows = ([("a", 100 + i) for i in range(9)] + [("a", 10_000)]
            + [("b", 100 + i) for i in range(10)])
    rep = {r.grp: (r.n_rows, r.n_outliers) for r in
           robust_outlier_report(_df(spark, rows), "g", "v").collect()}
    assert rep == {"a": (10, 1), "b": (10, 0)}


def test_partitioning_invariance(spark):
    rows = [("g" + str(i % 4), (i * 37) % 101) for i in range(200)]
    a = robust_outlier_report(_df(spark, rows).repartition(1),
                              "g", "v").collect()
    b = robust_outlier_report(_df(spark, rows).repartition(16),
                              "g", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
