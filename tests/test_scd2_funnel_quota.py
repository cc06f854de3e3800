"""SCD2 interval semantics, strict-order funnel, per-group quota cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.funnel import funnel_counts
from mapreducewordcount_spark.operators.quota import (
    group_quota_cap,
    quota_cap_report,
)
from mapreducewordcount_spark.operators.scd2 import scd2_history


# --- SCD2 -------------------------------------------------------------------

def _scd2(spark, changes_rows):
    snap = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    chg = spark.createDataFrame(changes_rows,
                                "k long, v double, _version int, _op string")
    return scd2_history(snap, chg, ["k"])


def test_scd2_update_chain(spark):
    hist = _scd2(spark, [(1, 11.0, 2, "U"), (1, 12.0, 5, "U")])
    rows = {(r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
            for r in hist.collect()}
    assert rows[(1, 0)] == (10.0, 2, 0)
    assert rows[(1, 2)] == (11.0, 5, 0)
    assert rows[(1, 5)] == (12.0, None, 1)
    assert rows[(2, 0)] == (20.0, None, 1)


def test_scd2_delete_closes_without_emitting(spark):
    hist = _scd2(spark, [(1, 11.0, 2, "U"), (1, 0.0, 3, "D")])
    rows = {(r["k"], r["valid_from"]): (r["valid_to"], r["is_current"])
            for r in hist.collect()}
    # the delete terminates version 2 but adds no interval: key 1 has
    # no current row
    assert rows[(1, 2)] == (3, 0)
    assert (1, 3) not in rows
    assert all(r["is_current"] == 0 for (k, _), r in
               [((k, vf), dict(valid_to=vt, is_current=c))
                for (k, vf), (vt, c) in rows.items()] if k == 1)


def test_scd2_insert_only_key_is_current_from_v(spark):
    hist = _scd2(spark, [(9, 99.0, 4, "U")])
    row = [r for r in hist.collect() if r["k"] == 9][0]
    assert (row["valid_from"], row["valid_to"], row["is_current"]) \
        == (4, None, 1)


def test_scd2_missing_columns_rejected(spark):
    snap = spark.createDataFrame([(1, 10.0)], "k long, v double")
    bad = spark.createDataFrame([(1, 11.0)], "k long, v double")
    with pytest.raises(ValueError, match="missing"):
        scd2_history(snap, bad, ["k"])


# --- funnel -----------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts long")


def test_funnel_strict_ordering(spark):
    ev = _events(spark, [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full
        (2, "view", 10), (2, "click", 5),                        # click BEFORE view
        (3, "click", 1), (3, "view", 2),                         # never clicks after
        (4, "view", 10), (4, "click", 10),                       # tie is NOT after
        (5, "purchase", 1),                                      # no view at all
    ])
    got = {r["step"]: (r["event_type"], r["n_users"], r["conversion_ppm"])
           for r in funnel_counts(ev, ("view", "click", "purchase")).collect()}
    assert got[1] == ("view", 4, 1_000_000)
    assert got[2] == ("click", 1, 250_000)
    assert got[3] == ("purchase", 1, 250_000)


def test_funnel_uses_first_qualifying_frontier(spark):
    # user views at 10; clicks at 5 (ignored) and 15 (counts); a
    # purchase at 12 is before the qualifying click -> not converted
    ev = _events(spark, [
        (1, "view", 10), (1, "click", 5), (1, "click", 15),
        (1, "purchase", 12),
    ])
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ("view", "click", "purchase")).collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_funnel_empty_steps_rejected(spark):
    ev = _events(spark, [(1, "view", 1)])
    with pytest.raises(ValueError):
        funnel_counts(ev, ())


# --- quota cap --------------------------------------------------------------

def _docs(spark):
    rows = [("a", i, float(i % 5)) for i in range(20)]
    rows += [("b", 100 + i, 1.0) for i in range(3)]
    return spark.createDataFrame(rows, "src string, id long, q double")


def test_quota_keeps_best_k_deterministically(spark):
    kept = group_quota_cap(_docs(spark), ["src"],
                           [F.col("q").desc(), F.col("id")], k=4)
    got = {r["src"]: sorted((r2["id"] for r2 in kept.collect()
                             if r2["src"] == r["src"]))
           for r in kept.collect()}
    # src a: q=4.0 at ids 4,9,14,19 — exactly the quota, tie-break id
    assert got["a"] == [4, 9, 14, 19]
    assert got["b"] == [100, 101, 102]  # under quota: all kept


def test_quota_rank_column_and_bounds(spark):
    kept = group_quota_cap(_docs(spark), ["src"],
                           [F.col("q").desc(), F.col("id")], k=7)
    assert kept.agg(F.max("quota_rank")).collect()[0][0] <= 7


def test_quota_report_counts(spark):
    rep = {r["src"]: r for r in
           quota_cap_report(_docs(spark), ["src"],
                            [F.col("q").desc(), F.col("id")], k=4,
                            score=F.col("q")).collect()}
    assert (rep["a"]["n_docs"], rep["a"]["n_kept"],
            rep["a"]["n_dropped"]) == (20, 4, 16)
    assert rep["a"]["cutoff_score"] == 4.0
    assert (rep["b"]["n_docs"], rep["b"]["n_kept"],
            rep["b"]["n_dropped"]) == (3, 3, 0)


def test_quota_validation(spark):
    with pytest.raises(ValueError):
        group_quota_cap(_docs(spark), ["src"], [F.col("id")], k=0)
