"""CDC merge/upsert semantics (operators/merge.py): latest-wins,
delete precedence, insert pass-through, target-side plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.merge import (
    latest_changes,
    merge_upsert,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, attr string, val double")


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, val double, _version int, _op string")


def test_latest_wins_and_delete_precedence(spark):
    target = _target(spark)
    updates = _upd(spark, [
        (1, "a1", 11.0, 2, "U"),      # stale update ...
        (1, "a2", 12.0, 3, "U"),      # ... overridden by this one
        (2, "b", 20.0, 2, "U"),       # updated then deleted later
        (2, "b", 20.0, 5, "D"),
        (3, "c-del", 0.0, 2, "D"),    # plain delete
        (9, "new", 90.0, 1, "U"),     # insert (key absent from target)
    ])
    got = sorted(tuple(r) for r in
                 merge_upsert(target, updates, ["k"]).collect())
    assert got == [(1, "a2", 12.0), (4, "d", 40.0), (9, "new", 90.0)]


def test_latest_changes_is_per_key(spark):
    updates = _upd(spark, [
        (1, "x", 1.0, 1, "U"), (1, "y", 2.0, 2, "U"),
        (2, "z", 3.0, 7, "U"),
    ])
    got = {r["k"]: (r["attr"], r["_version"])
           for r in latest_changes(updates, ["k"]).collect()}
    assert got == {1: ("y", 2), 2: ("z", 7)}


def test_untouched_target_passes_through_unchanged(spark):
    target = _target(spark)
    updates = _upd(spark, [(2, "B", 22.0, 1, "U")])
    merged = merge_upsert(target, updates, ["k"])
    untouched = sorted(tuple(r) for r in
                       merged.filter(F.col("k") != 2).collect())
    assert untouched == [(1, "a", 10.0), (3, "c", 30.0), (4, "d", 40.0)]
    assert merged.columns == target.columns


def test_target_side_never_shuffles(spark):
    """The snapshot's only operation is the anti probe: no Exchange
    may hash-partition the target rows. The change batch aggregates
    (its row_number window) — that is the small side by contract."""
    target = _target(spark).select(
        F.col("k"), F.col("attr").alias("target_attr"),
        F.col("val").alias("target_val"))
    updates = spark.createDataFrame(
        [(2, "B", 22.0, 1, "U")],
        "k int, target_attr string, target_val double,"
        " _version int, _op string")
    merged = merge_upsert(target, updates, ["k"])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    import re
    bad = [ln for ln in plan.splitlines()
           if re.search(r"\bExchange\b", ln)
           and "broadcast" not in ln.lower()
           and "target_" in ln]
    assert bad == [], bad
