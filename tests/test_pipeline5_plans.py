"""Plan-shape pins for the round-7 session-3 operators: the shapes
that make them scale are asserted, not hoped."""

from __future__ import annotations

import re

import pytest

from mapreducewordcount_spark.plans import explain_str
from mapreducewordcount_spark.queries import pipeline5
from tests.conftest import SF_SMOKE


def _tree(spark, name: str) -> str:
    df = pipeline5.QUERIES[name].spark_fn(spark, SF_SMOKE)
    return explain_str(df).split("\n\n")[0]


def _exchanges(tree: str) -> int:
    return len([l for l in tree.splitlines()
                if re.search(r"\bExchange\b", l)])


def test_scd2_is_single_exchange(spark):
    tree = _tree(spark, "orders_scd2_history")
    # union is shuffle-free; ONE hash exchange on the key feeds the
    # lead() window; no sort-merge join, no global sort
    assert _exchanges(tree) == 1
    assert "SortMergeJoin" not in tree and "Sort " not in tree.split(
        "Window")[0].split("Exchange")[0]


def test_zorder_layout_plan(spark):
    tree = _tree(spark, "lineitem_zorder_layout")
    # min/max aggregate (single-partition exchange) broadcast back +
    # the final per-file aggregate: nothing else shuffles
    assert _exchanges(tree) <= 3
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree


def test_skew_report_topn_is_take_ordered(spark):
    plan = explain_str(
        pipeline5.QUERIES["join_skew_report"].spark_fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_quota_window_is_group_partitioned(spark):
    plan = explain_str(
        pipeline5.QUERIES["source_quota_cap"].spark_fn(spark, SF_SMOKE))
    # the ranking window must be partitioned by the group key — a
    # partition-less window here would serialize the whole corpus
    assert re.search(r"hashpartitioning\(source", plan)
    assert "SortMergeJoin" not in plan


def test_funnel_keys_every_stage_on_user(spark):
    plan = explain_str(
        pipeline5.QUERIES["events_funnel"].spark_fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # every wide stage keys on the user column; no other shuffle key
    # appears (the 1-row count frames join broadcast)
    keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert keys <= {"u"}, keys


def test_heavy_hitters_verify_join_is_broadcast(spark):
    plan = explain_str(
        pipeline5.QUERIES["heavy_hitters_words"].spark_fn(spark, SF_SMOKE))
    # pass-2 exact verify joins the bounded candidate frame broadcast
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_no_vocabulary_wide_shuffle(spark):
    plan = explain_str(
        pipeline5.QUERIES["doc_bm25_topk"].spark_fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
