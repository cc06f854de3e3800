"""Sketch-aggregate accuracy vs exact.

Round-7 split: ``sketch_hll_report`` (HLL half) is artifact-oracled
in the registry sweep; ``sketch_stats`` (GK percentiles) is the one
remaining rows-only output, its residue justified by the
merge-order-sensitivity pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.queries.analytics3 import (
    sketch_hll_report,
    sketch_stats,
)
from mapreducewordcount_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_sketches_within_tolerance_of_exact(spark):
    gk = {r.l_returnflag: r for r in
          sketch_stats(spark, SF_ORACLE).collect()}
    hll = {r.l_returnflag: r for r in
           sketch_hll_report(spark, SF_ORACLE).collect()}
    l = load_table(spark, SF_ORACLE, "lineitem")
    exact = {r.l_returnflag: r for r in
             (l.groupBy("l_returnflag")
              .agg(F.count_distinct(F.col("l_partkey")).alias("parts"),
                   F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
              .collect())}
    assert set(gk) == set(exact) == set(hll)
    for flag, e in exact.items():
        h = hll[flag]
        assert h.n_parts_exact == e.parts  # the report's exact half
        assert abs(h.approx_parts - e.parts) / e.parts < 0.05  # 2% rsd
        assert h.within_3rsd
        assert abs(gk[flag].approx_p50 - e.p50) / e.p50 < 0.05  # GK 1e4


def test_hll_and_count_are_partition_invariant(spark):
    """The artifact-oracle boundary for the sketch family: HLL++
    merges by register-wise max (merge-order-free) and count is
    exact, so both are identical under any partitioning — which is
    what lets sketch_hll_report pin Spark's HLL values in a committed
    artifact; GK approx_percentile is merge-ORDER-sensitive (measured
    at sf0.01: p50(A) = 52826.91 / 52832.76 / 52833.8 at 32/1/64
    partitions), which is exactly why sketch_stats stays rows-only."""
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
