"""Plan hygiene for the third TPC-H batch (queries/tpch3.py).

Same stance as test_tpch2_plans.py: hash joins only, small sides
broadcast, anti/semi shapes preserved, selective predicates at the
scan — the physical properties that decide the 100 TB bill.
"""

from __future__ import annotations

import pytest

from mapreducewordcount_spark.plans import (
    explain_str,
    has_broadcast_hash_join,
    has_pushed_filters,
)
from mapreducewordcount_spark.queries import tpch3
from tests.conftest import SF_ORACLE


# q11/q22 cross-join a broadcast 1-ROW aggregate (the scalar
# threshold); Spark plans a keyless broadcast join as
# BroadcastNestedLoopJoin, which with a single-row build side is the
# right O(n) scalar-subquery plan, not a quadratic blowup — they get
# their own shape tests below.
SCALAR_CROSS = {"q11_important_parts", "q22_idle_customers"}


@pytest.mark.parametrize("name", sorted(set(tpch3.QUERIES) - SCALAR_CROSS))
def test_no_nested_loop_or_cartesian(spark, name):
    plan = explain_str(tpch3.QUERIES[name].spark_fn(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_q2_supplier_and_part_broadcast(spark):
    """The region-filtered supplier set and the size/type-filtered
    part set both broadcast; the only shuffles key on partkey (the
    ps aggregate and the min-cost join)."""
    df = tpch3.q2_min_cost_supplier(spark, SF_ORACLE)
    assert has_broadcast_hash_join(df)
    assert has_pushed_filters(df, "EqualTo(p_type,STANDARD)")
    assert has_pushed_filters(df, "EqualTo(r_name,EUROPE)")


def test_q11_threshold_is_broadcast_not_collected(spark):
    """The scalar total joins back as a broadcast 1-row aggregate —
    no driver-side action in the plan, lineitem scanned once."""
    df = tpch3.q11_important_parts(spark, SF_ORACLE)
    plan = explain_str(df)
    # the NATION_1 supplier set joins by hash; the scalar total is the
    # single-row BroadcastNestedLoopJoin (no CartesianProduct ever)
    assert has_broadcast_hash_join(df)
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan parquet") <= 3  # lineitem+supplier+nation


def test_q12_single_fact_shuffle(spark):
    """orders⋈lineitem is the one real shuffle; the conditional
    aggregation is a 3-row group-by with map-side partials."""
    plan = explain_str(tpch3.q12_ship_priority(spark, SF_ORACLE))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_q16_not_in_is_broadcast_anti_join(spark):
    """The NOT-IN exclusion must plan as a broadcast anti join on the
    six-row negative-balance set, never a nested loop (the classic
    NOT-IN-with-nulls trap: suppkeys are non-null, so Catalyst may
    keep the equi anti form)."""
    plan = explain_str(tpch3.q16_part_supplier_counts(spark, SF_ORACLE))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_semi_join_and_name_pushdown(spark):
    plan = explain_str(tpch3.q20_excess_share_suppliers(spark, SF_ORACLE))
    assert "LeftSemi" in plan
    df = tpch3.q20_excess_share_suppliers(spark, SF_ORACLE)
    assert has_pushed_filters(df, "StringStartsWith(p_name,small")


def test_q22_anti_join_with_date_pushdown(spark):
    df = tpch3.q22_idle_customers(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the 2000-01-01 cutoff prunes the orders scan
    assert has_pushed_filters(df, "GreaterThanOrEqual(o_orderdate")
