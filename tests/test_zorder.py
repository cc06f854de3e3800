"""Z-order layout: interleave correctness (vs DuckDB and by hand),
rank rescale bounds, and the pruning win the layout exists for."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.zorder import (
    interleave_bits,
    interleave_sql,
    zorder_file_stats,
    zorder_layout,
)


def test_interleave_hand_cases(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (65535, 0), (0, 65535)], "x long, y long")
    got = [r["z"] for r in
           df.select(interleave_bits(F.col("x"), F.col("y"), 16)
                     .alias("z")).collect()]
    # x -> even bits, y -> odd bits
    assert got[0] == 0
    assert got[1] == 0b0111        # x=11, y=01 -> 7
    assert got[2] == 0b1011        # x=01, y=11 -> 11
    assert got[3] == sum(1 << (2 * i) for i in range(16))
    assert got[4] == sum(1 << (2 * i + 1) for i in range(16))


def test_interleave_sql_matches_spark(spark):
    rows = [(x, y) for x in (0, 1, 5, 123, 65535) for y in (0, 2, 77, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y",
                     interleave_bits(F.col("x"), F.col("y"), 16)
                     .alias("z")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {(x, y): z for x, y, z in con.sql(
        f"SELECT x, y, {interleave_sql('x', 'y', 16)} FROM t").fetchall()}
    assert got == want


def test_rank_bounds_and_file_ids(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 7 % 997).alias("a"), (F.col("id") % 61).alias("b"))
    laid = zorder_layout(df, "a", "b", bits=16, file_bits=6)
    agg = laid.agg(F.min("zvalue"), F.max("zvalue"),
                   F.min("file_id"), F.max("file_id")).collect()[0]
    assert agg[0] >= 0 and agg[1] < 1 << 32
    assert agg[2] >= 0 and agg[3] < 64
    # min of each dim lands in rank 0 => contributes z prefix 0
    assert laid.count() == 1000


def test_zone_maps_prune_on_both_dimensions(spark):
    # uniform 2-D grid; a narrow band predicate on EITHER dimension
    # must touch a small fraction of z-ordered files, where a linear
    # (x-sorted) layout prunes nothing for the y predicate.
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    stats = zorder_file_stats(df, "x", "y", bits=16, file_bits=6).collect()
    assert len(stats) == 64
    files_hit_y = [r for r in stats if r["min_y"] <= 3 and r["max_y"] >= 0]
    files_hit_x = [r for r in stats if r["min_x"] <= 3 and r["max_x"] >= 0]
    assert len(files_hit_y) <= len(stats) // 4
    assert len(files_hit_x) <= len(stats) // 4
    # zone maps are consistent: every row is inside its file's bounds
    total = sum(r["n_rows"] for r in stats)
    assert total == 4096


def test_degenerate_single_value_dimension(spark):
    df = spark.range(0, 100).select(
        F.lit(7).cast("long").alias("x"), F.col("id").alias("y"))
    laid = zorder_layout(df, "x", "y", bits=16, file_bits=4)
    # (x - min) div (max - min + 1) = 0 for all rows: layout degrades
    # to a clean 1-D y-sort, no crash, files still bounded
    assert laid.select(F.max("file_id")).collect()[0][0] < 16


def test_file_bits_validation(spark):
    df = spark.range(2).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", bits=8, file_bits=17)
