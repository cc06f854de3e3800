"""Range-join operator: bucketed equi-join semantics + guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.rangejoin import point_in_interval_join


def _dfs(spark):
    points = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 99.9), (3, 10, 100.0), (4, 10, 150.0),
         (5, 20, 5.0), (6, 10, 250.0)],
        "pid long, k long, t double")
    intervals = spark.createDataFrame(
        # [0,100) for key 10; [100,200) for key 10; [0,50) for key 30
        [(100, 10, 0.0, 100.0), (101, 10, 100.0, 200.0), (102, 30, 0.0, 50.0)],
        "iid long, ik long, s double, e double")
    return points, intervals


def test_point_in_interval_semantics(spark):
    points, intervals = _dfs(spark)
    got = {(r.pid, r.iid) for r in point_in_interval_join(
        points, intervals, "k", "ik", "t", "s", "e",
        bucket_width=100.0).collect()}
    # half-open [s, e): t=100.0 belongs to the SECOND interval only;
    # key 20 has no intervals; t=250 beyond all intervals
    assert got == {(1, 100), (2, 100), (3, 101), (4, 101)}


def test_interval_crossing_bucket_boundary(spark):
    points = spark.createDataFrame([(1, 7, 95.0), (2, 7, 105.0)],
                                   "pid long, k long, t double")
    intervals = spark.createDataFrame([(9, 7, 90.0, 120.0)],
                                      "iid long, ik long, s double, e double")
    got = {(r.pid, r.iid) for r in point_in_interval_join(
        points, intervals, "k", "ik", "t", "s", "e",
        bucket_width=50.0).collect()}
    assert got == {(1, 9), (2, 9)}  # both sides of the bucket edge


def test_oversized_interval_raises(spark):
    points = spark.createDataFrame([(1, 7, 95.0)], "pid long, k long, t double")
    intervals = spark.createDataFrame([(9, 7, 0.0, 500.0)],
                                      "iid long, ik long, s double, e double")
    with pytest.raises(Exception, match="bucket_width"):
        point_in_interval_join(points, intervals, "k", "ik", "t", "s", "e",
                               bucket_width=100.0).collect()


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _dfs(spark)
    rows = point_in_interval_join(points, intervals, "k", "ik", "t", "s", "e",
                                  bucket_width=100.0, how="left").collect()
    got = {(r.pid, r.iid) for r in rows}
    # matched pairs identical to inner; unmatched points (5: no key-20
    # interval, 6: t beyond every interval) survive with null iid —
    # a naive 'left' pass-through drops them at the exact-predicate
    # filter (null predicate) and silently degenerates to inner
    assert got == {(1, 100), (2, 100), (3, 101), (4, 101),
                   (5, None), (6, None)}
    assert len(rows) == 6


def test_unsupported_join_type_raises(spark):
    points, intervals = _dfs(spark)
    with pytest.raises(ValueError, match="how"):
        point_in_interval_join(points, intervals, "k", "ik", "t", "s", "e",
                               bucket_width=100.0, how="full")


def test_plan_is_equi_join_not_nested_loop(spark):
    from mapreducewordcount_spark.plans import explain_str

    points, intervals = _dfs(spark)
    df = point_in_interval_join(points, intervals, "k", "ik", "t", "s", "e",
                                bucket_width=100.0)
    plan = explain_str(df, mode="simple")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
