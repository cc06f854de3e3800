"""Compaction planner semantics: bin boundaries, oversize files,
layout-order preservation, per-partition independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.compaction import plan_compaction


def _files(spark, rows):
    return spark.createDataFrame(rows, "part string, path string, bytes long")


def _bins(df):
    return {(r["part"], r["path"]): r["bin"] for r in df.collect()}


def test_running_sum_bins(spark):
    files = _files(spark, [
        ("p", "a", 40), ("p", "b", 40), ("p", "c", 40),  # 0,0,0 (cum 0,40,80)
        ("p", "d", 40),                                  # cum 120 -> bin 1
        ("p", "e", 100),                                 # cum 160 -> bin 1
    ])
    got = _bins(plan_compaction(files, ["part"], ["path"], "bytes", 100))
    assert got == {("p", "a"): 0, ("p", "b"): 0, ("p", "c"): 0,
                   ("p", "d"): 1, ("p", "e"): 1}


def test_oversize_file_gets_own_region(spark):
    files = _files(spark, [
        ("p", "a", 10), ("p", "b", 500), ("p", "c", 10)])
    got = _bins(plan_compaction(files, ["part"], ["path"], "bytes", 100))
    # b starts at cum 10 (bin 0, overflowing it); c lands past the
    # oversize file in its own later bin — never merged back across it
    assert got[("p", "a")] == 0 and got[("p", "b")] == 0
    assert got[("p", "c")] == 5  # cum 510 div 100


def test_partitions_pack_independently(spark):
    files = _files(spark, [
        ("p1", "a", 90), ("p1", "b", 90),
        ("p2", "a", 90), ("p2", "b", 90)])
    got = _bins(plan_compaction(files, ["part"], ["path"], "bytes", 100))
    assert got[("p1", "b")] == 0  # cum 90 < 100
    assert got[("p2", "b")] == 0  # p2's cumsum restarts at zero


def test_bins_are_contiguous_in_order(spark):
    rows = [("p", f"f{i:03d}", 37) for i in range(100)]
    got = plan_compaction(_files(spark, rows), ["part"], ["path"],
                          "bytes", 100).orderBy("path").collect()
    bins = [r["bin"] for r in got]
    assert bins == sorted(bins)  # packing preserves layout order
    assert bins[-1] == (99 * 37) // 100


def test_target_must_be_positive(spark):
    with pytest.raises(ValueError):
        plan_compaction(_files(spark, [("p", "a", 1)]),
                        ["part"], ["path"], "bytes", 0)


def test_plan_shuffles_only_on_partition(spark):
    files = _files(spark, [("p", "a", 1)])
    plan = (plan_compaction(files, ["part"], ["path"], "bytes", 100)
            ._jdf.queryExecution().executedPlan().toString())
    # the listing window partitions by the table partition — no
    # single-partition global window (Exchange SinglePartition)
    assert "SinglePartition" not in plan
