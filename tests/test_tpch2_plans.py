"""Plan hygiene for the second TPC-H batch (queries/tpch2.py).

Same stance as test_plans.py: pin the physical properties that
decide the 100 TB bill — semi joins stay joins (not row-duplicating
inner joins plus distinct), small sides broadcast, nothing
degenerates into a nested-loop or cartesian product, and selective
predicates reach the parquet scan.
"""

from __future__ import annotations

import pytest

from mapreducewordcount_spark.plans import (
    explain_str,
    has_broadcast_hash_join,
    has_pushed_filters,
)
from mapreducewordcount_spark.queries import tpch2
from tests.conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(tpch2.QUERIES))
def test_no_nested_loop_or_cartesian(spark, name):
    """Every tpch2 query must plan as hash/sort-merge joins only.
    A BroadcastNestedLoopJoin or CartesianProduct here means a join
    condition fell out of the equi-join path — the exact failure mode
    VERDICT r1 flagged in the embedding-LSH operator."""
    plan = explain_str(tpch2.QUERIES[name].spark_fn(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_q4_exists_is_semi_join(spark):
    """The EXISTS with an inequality on both relations must stay a
    LEFT SEMI join (order counted once) with the date condition as
    join residual, not an inner join + distinct."""
    plan = explain_str(tpch2.q4_priority_late(spark, SF_ORACLE))
    assert "LeftSemi" in plan
    assert "Distinct" not in plan


def test_q8_dimension_joins_broadcast(spark):
    df = tpch2.q8_market_share(spark, SF_ORACLE)
    assert has_broadcast_hash_join(df)
    # the PROMO filter prunes the broadcast build side at the scan
    assert has_pushed_filters(df, "StringStartsWith(p_type,PROMO")


def test_q15_max_side_is_broadcast_not_collected(spark):
    """The scalar-subquery max joins as a broadcast of a 1-row agg —
    the plan must contain no driver-side collect of the revenue
    table (no local relation materialization of it)."""
    df = tpch2.q15_top_supplier(spark, SF_ORACLE)
    assert has_broadcast_hash_join(df)


def test_q18_having_before_enrichment(spark):
    """The quantity rollup must aggregate lineitem BEFORE joining
    orders/customer: the plan's first join input is the filtered
    aggregate, broadcast (a few dozen orderkeys at any SF)."""
    plan = explain_str(tpch2.q18_large_orders(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # the lineitem rollup is the ONLY shuffle: orders and customer
    # join against the broadcast HAVING result without re-partitioning
    assert plan.count("hashpartitioning") == 1


def test_q19_equi_key_extracted_from_disjunction(spark):
    """The OR-of-ANDs must not break the equi-join: the partkey
    equality is the join key, the disjunction a post-join filter or
    residual — never a nested loop."""
    plan = explain_str(tpch2.q19_disjunctive(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q9_name_filter_pushed(spark):
    df = tpch2.q9_type_profit(spark, SF_ORACLE)
    assert has_pushed_filters(df, "StringContains(p_name,widget")
