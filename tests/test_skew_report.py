"""Hot-key skew diagnostics: exact shares, running concentration,
salting recommendation, null keys, tie-break determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.skewjoin import key_skew_report


def _df(spark, counts: dict, nulls: int = 0):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    rows += [(None,)] * nulls
    return spark.createDataFrame(rows, "k string").repartition(4)


def test_shares_and_salt_exact(spark):
    df = _df(spark, {"mega": 700, "mid": 200, "small": 100})
    got = key_skew_report(df, "k", top_n=3,
                          target_rows_per_task=100).collect()
    by_key = {r["k"]: r for r in got}
    assert [r["k"] for r in got] == ["mega", "mid", "small"]
    assert by_key["mega"]["share_ppm"] == 700_000
    assert by_key["mega"]["salt_buckets"] == 7
    assert by_key["mid"]["salt_buckets"] == 2
    assert by_key["small"]["salt_buckets"] == 1
    assert by_key["small"]["cum_share_ppm"] == 1_000_000
    assert all(r["total_rows"] == 1000 and r["n_keys"] == 3 for r in got)


def test_ceil_division_on_salt(spark):
    df = _df(spark, {"a": 101, "b": 100, "c": 99})
    got = {r["k"]: r["salt_buckets"]
           for r in key_skew_report(df, "k", top_n=3,
                                    target_rows_per_task=100).collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_null_key_is_reported(spark):
    df = _df(spark, {"a": 10}, nulls=90)
    got = key_skew_report(df, "k", top_n=2,
                          target_rows_per_task=50).collect()
    assert got[0]["k"] is None and got[0]["n_rows"] == 90
    assert got[0]["salt_buckets"] == 2
    # null sorts LAST among equal counts (ANSI/DuckDB parity) but
    # count ordering dominates here
    assert got[1]["k"] == "a"


def test_tie_break_is_key_ascending_nulls_last(spark):
    df = _df(spark, {"b": 5, "a": 5, "c": 5}, nulls=5)
    got = [r["k"] for r in
           key_skew_report(df, "k", top_n=4,
                           target_rows_per_task=10).collect()]
    assert got == ["a", "b", "c", None]


def test_top_n_cuts_before_window(spark):
    df = _df(spark, {f"k{i}": i + 1 for i in range(20)})
    got = key_skew_report(df, "k", top_n=5).collect()
    assert len(got) == 5
    assert [r["n_rows"] for r in got] == [20, 19, 18, 17, 16]
    # cum share covers only the reported keys
    assert got[-1]["cum_share_ppm"] == sum(r["share_ppm"] for r in got)


def test_validation(spark):
    df = _df(spark, {"a": 1})
    with pytest.raises(ValueError):
        key_skew_report(df, "k", top_n=0)
    with pytest.raises(ValueError):
        key_skew_report(df, "k", target_rows_per_task=0)
