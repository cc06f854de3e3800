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


# --- property: random change batches vs full recompute ----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.integers(min_value=0, max_value=9)
_grp = st.sampled_from(["a", "b", "c"])
_val = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    snap=st.lists(st.tuples(_key, _grp, _val), min_size=0, max_size=20,
                  unique_by=lambda r: r[0]),
    # (key, grp, val, op); version = list position + 2, so versions
    # are unique per key by construction after dedup below
    chg=st.lists(st.tuples(_key, _grp, _val, st.sampled_from(["U", "D"])),
                 min_size=0, max_size=25),
)
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_delta_refresh_property(spark, snap, chg):
    snap_df = spark.createDataFrame(snap or [(99, "a", 0)],
                                    "k long, grp string, v long")
    if not snap:
        snap_df = snap_df.filter("k < 0")  # truly empty, typed
    rows = [(k, g, v, i + 2, op) for i, (k, g, v, op) in enumerate(chg)]
    chg_df = spark.createDataFrame(
        rows or [(99, "a", 0, 2, "U")],
        "k long, grp string, v long, _version int, _op string")
    if not rows:
        chg_df = chg_df.filter("k < 0")

    from mapreducewordcount_spark.operators.merge import merge_upsert

    got = {r["grp"]: (r["n_rows"], r["total"]) for r in
           incremental_agg_refresh(snap_df, chg_df, ["k"], "grp", "v")
           .collect()}
    merged = merge_upsert(snap_df, chg_df, ["k"])
    want = {r["grp"]: (r["n"], r["t"]) for r in
            merged.groupBy("grp")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("v").alias("t")).collect()}
    assert got == want


# --- min/max delta rules (VERDICT r7 next#5) --------------------------------

from mapreducewordcount_spark.operators.ivm import incremental_minmax_refresh


def _refresh_mm(spark, rows):
    got = incremental_minmax_refresh(_snap(spark), _chg(spark, rows),
                                     ["k"], "grp", "v")
    return {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"])
            for r in got.collect()}


def _recompute_mm(spark, rows):
    from mapreducewordcount_spark.operators.merge import merge_upsert

    merged = merge_upsert(_snap(spark), _chg(spark, rows), ["k"])
    got = merged.groupBy("grp").agg(F.count(F.lit(1)).alias("n"),
                                    F.min("v").alias("lo"),
                                    F.max("v").alias("hi"))
    return {r["grp"]: (r["n"], r["lo"], r["hi"]) for r in got.collect()}


MM_CASES = dict(CASES)
MM_CASES.update({
    # the cases the split rules exist for: extremum-row deletion
    # forces the per-group recompute, non-extremum changes stay cheap
    "delete_group_min": [(1, "a", 0, 2, "D")],     # 100 is a's min
    "delete_group_max": [(2, "a", 0, 2, "D")],     # 200 is a's max
    "update_extremum_away": [(4, "b", 350, 2, "U")],  # b's max shrinks
    "update_extremum_tighter": [(4, "b", 450, 2, "U")],
    "insert_new_extremes": [(8, "a", 50, 2, "U"), (9, "a", 900, 3, "U")],
    "delete_both_extremes": [(3, "b", 0, 2, "D"), (4, "b", 0, 3, "D")],
})


@pytest.mark.parametrize("name", sorted(MM_CASES))
def test_minmax_delta_equals_full_recompute(spark, name):
    rows = MM_CASES[name]
    assert _refresh_mm(spark, rows) == _recompute_mm(spark, rows)


def test_minmax_duplicate_extremum_is_conservative_but_correct(spark):
    """Deleting ONE of two rows tied at the min must keep the min
    (the conservative touched-group recompute, not the cheap path)."""
    snap = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "a", 300)],
        "k long, grp string, v long")
    chg = spark.createDataFrame([(1, "a", 0, 2, "D")],
                                "k long, grp string, v long,"
                                " _version int, _op string")
    got = {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"]) for r in
           incremental_minmax_refresh(snap, chg, ["k"], "grp", "v")
           .collect()}
    assert got == {"a": (2, 100, 300)}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    snap=st.lists(st.tuples(_key, _grp, _val), min_size=0, max_size=20,
                  unique_by=lambda r: r[0]),
    chg=st.lists(st.tuples(_key, _grp, _val, st.sampled_from(["U", "D"])),
                 min_size=0, max_size=25),
)
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_minmax_delta_property(spark, snap, chg):
    snap_df = spark.createDataFrame(snap or [(99, "a", 0)],
                                    "k long, grp string, v long")
    if not snap:
        snap_df = snap_df.filter("k < 0")
    rows = [(k, g, v, i + 2, op) for i, (k, g, v, op) in enumerate(chg)]
    chg_df = spark.createDataFrame(
        rows or [(99, "a", 0, 2, "U")],
        "k long, grp string, v long, _version int, _op string")
    if not rows:
        chg_df = chg_df.filter("k < 0")

    from mapreducewordcount_spark.operators.merge import merge_upsert

    got = {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"]) for r in
           incremental_minmax_refresh(snap_df, chg_df, ["k"], "grp", "v")
           .collect()}
    merged = merge_upsert(snap_df, chg_df, ["k"])
    want = {r["grp"]: (r["n"], r["lo"], r["hi"]) for r in
            merged.groupBy("grp")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.min("v").alias("lo"),
                       F.max("v").alias("hi")).collect()}
    assert got == want
