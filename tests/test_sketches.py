"""Sketch-aggregate accuracy vs exact (no SQL oracle possible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.queries.analytics3 import sketch_stats
from mapreducewordcount_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_sketches_within_tolerance_of_exact(spark):
    approx = {r.l_returnflag: r for r in
              sketch_stats(spark, SF_ORACLE).collect()}
    l = load_table(spark, SF_ORACLE, "lineitem")
    exact = {r.l_returnflag: r for r in
             (l.groupBy("l_returnflag")
              .agg(F.count_distinct(F.col("l_partkey")).alias("parts"),
                   F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
              .collect())}
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_parts - e.parts) / e.parts < 0.05   # 2% rsd sketch
        assert abs(a.approx_p50 - e.p50) / e.p50 < 0.05         # GK at 1e4 acc


def test_hll_and_count_are_partition_invariant(spark):
    """The artifact-oracle boundary for sketch_stats: HLL++ merges by
    register-wise max (merge-order-free) and count is exact, so both
    are identical under any partitioning; GK approx_percentile is
    merge-ORDER-sensitive (measured at sf0.01: p50(A) = 52826.91 /
    52832.76 / 52833.8 at 32/1/64 partitions), which is exactly why
    sketch_stats stays rows-only instead of artifact-oracled."""
    l = load_table(spark, SF_ORACLE, "lineitem")
    outs = []
    for parts in (1, 7, 64):
        rows = (l.repartition(parts).groupBy("l_returnflag")
                .agg(F.approx_count_distinct("l_partkey", rsd=0.02)
                     .alias("ap"),
                     F.count(F.lit(1)).alias("n"))
                .orderBy("l_returnflag").collect())
        outs.append([(r.l_returnflag, r.ap, r.n) for r in rows])
    assert outs[0] == outs[1] == outs[2]
