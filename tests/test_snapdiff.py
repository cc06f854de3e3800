"""Snapshot diff: classification, null-safe comparison, unchanged
suppression, multi-column compare."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.snapdiff import snapshot_diff


def _t(spark, rows, schema="k long, v double, s string"):
    return spark.createDataFrame(rows, schema)


def test_classification(spark):
    old = _t(spark, [(1, 1.0, "x"), (2, 2.0, "y"), (3, 3.0, "z")])
    new = _t(spark, [(1, 1.0, "x"), (2, 2.5, "y"), (4, 4.0, "w")])
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 silent


def test_old_new_values_carried(spark):
    old = _t(spark, [(2, 2.0, "y")])
    new = _t(spark, [(2, 2.5, "y")])
    row = snapshot_diff(old, new, ["k"], ["v"]).collect()[0]
    assert (row["old_v"], row["new_v"]) == (2.0, 2.5)


def test_null_safe_compare(spark):
    old = _t(spark, [(1, None, "x"), (2, None, "y")])
    new = _t(spark, [(1, None, "x"), (2, 2.0, "y")])
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # null == null must NOT report key 1; null -> value must report 2
    assert got == {2: "changed"}


def test_any_compared_column_triggers(spark):
    old = _t(spark, [(1, 1.0, "x")])
    new = _t(spark, [(1, 1.0, "CHANGED")])
    got = snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    assert len(got) == 1 and got[0]["change"] == "changed"


def test_identical_snapshots_empty(spark):
    old = _t(spark, [(1, 1.0, "x"), (2, 2.0, "y")])
    assert snapshot_diff(old, old, ["k"], ["v", "s"]).count() == 0


def test_empty_compare_rejected(spark):
    old = _t(spark, [(1, 1.0, "x")])
    with pytest.raises(ValueError):
        snapshot_diff(old, old, ["k"], [])
