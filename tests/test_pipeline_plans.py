"""Plan hygiene for the corpus-hygiene queries (pipeline_queries.py)
and the skew/salting paths: the scale-deciding physical properties,
pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.skewjoin import salted_join
from mapreducewordcount_spark.plans import explain_str
from mapreducewordcount_spark.queries import pipeline_queries
from mapreducewordcount_spark.queries.wordcount_queries import (
    word_count_salted,
)
from mapreducewordcount_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_decontam_eval_ngrams_broadcast(spark):
    """The eval n-gram set must reach the candidate join as a
    broadcast (training side never shuffles documents); no nested
    loop anywhere."""
    plan = explain_str(
        pipeline_queries.decontam_report(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_is_scan_side_filter(spark):
    """Deterministic sampling is a row-local predicate: no shuffle,
    no join, no window in the plan — one scan, one filter."""
    plan = explain_str(
        pipeline_queries.stratified_sample_docs(spark, SF_ORACLE))
    for op in ("Exchange", "Join", "Window", "Sort"):
        assert op not in plan, op


def test_pii_scrub_single_aggregation(spark):
    """PII counting/scrubbing is pure codegen'd expressions feeding
    one aggregate: exactly one shuffle (the groupBy source), no joins."""
    plan = explain_str(pipeline_queries.pii_scrub_stats(spark, SF_ORACLE))
    assert "Join" not in plan
    assert plan.count("+- Exchange") == 1


def test_salted_wc_two_aggregations(spark):
    """The salted word count must show BOTH aggregation rounds —
    (word, salt) then word — i.e. two exchanges, the signature of the
    two-phase skew recipe."""
    plan = explain_str(word_count_salted(spark, SF_ORACLE))
    assert plan.count("+- Exchange") == 2


def test_salted_join_is_hash_join_on_composite_key(spark):
    o = (load_table(spark, SF_ORACLE, "orders")
         .withColumnRenamed("o_custkey", "c_custkey"))
    c = load_table(spark, SF_ORACLE, "customer").select(
        "c_custkey", "c_mktsegment")
    plan = explain_str(
        salted_join(o, c, "c_custkey", salt_from="o_orderkey", buckets=6))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__salt" in plan  # the composite key actually carries the salt
