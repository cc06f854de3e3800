"""Incremental view maintenance: delta refresh equals full
recompute under updates, deletes, inserts, conflicting versions,
group moves, and group extinction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.ivm import incremental_agg_refresh


def _snap(spark):
    # (key, group, value-cents)
    return spark.createDataFrame(
        [(1, "a", 100), (2, "a", 200), (3, "b", 300), (4, "b", 400),
         (5, "c", 500)],
        "k long, grp string, v long")


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k long, grp string, v long, _version int, _op string")


def _refresh(spark, rows):
    got = incremental_agg_refresh(_snap(spark), _chg(spark, rows),
                                  ["k"], "grp", "v")
    return {r["grp"]: (r["n_rows"], r["total"]) for r in got.collect()}


def _recompute(spark, rows):
    """Independent check: merge-then-aggregate from scratch."""
    from mapreducewordcount_spark.operators.merge import merge_upsert

    merged = merge_upsert(_snap(spark), _chg(spark, rows), ["k"])
    got = merged.groupBy("grp").agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("v").alias("t"))
    return {r["grp"]: (r["n"], r["t"]) for r in got.collect()}


CASES = {
    "update_in_place": [(1, "a", 150, 2, "U")],
    "delete": [(3, "b", 0, 2, "D")],
    "insert": [(9, "c", 900, 2, "U")],
    "latest_version_wins": [(1, "a", 150, 2, "U"), (1, "a", 175, 3, "U")],
    "update_then_delete": [(1, "a", 150, 2, "U"), (1, "a", 0, 3, "D")],
    "group_move": [(1, "b", 100, 2, "U")],  # a -> b
    "group_extinction": [(5, "c", 0, 2, "D")],
    "mixed": [(1, "a", 111, 2, "U"), (2, "b", 222, 2, "U"),
              (3, "b", 0, 2, "D"), (8, "c", 800, 2, "U")],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_delta_refresh_equals_full_recompute(spark, name):
    rows = CASES[name]
    assert _refresh(spark, rows) == _recompute(spark, rows)


def test_extinct_group_dropped(spark):
    got = _refresh(spark, [(5, "c", 0, 2, "D")])
    assert "c" not in got
    assert got["a"] == (2, 300) and got["b"] == (2, 700)


def test_untouched_groups_pass_through(spark):
    got = _refresh(spark, [(1, "a", 150, 2, "U")])
    assert got["b"] == (2, 700) and got["c"] == (1, 500)
    assert got["a"] == (2, 350)
