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


def test_doc_length_deciles_single_group_exchange(spark):
    """The grouped-Arrow path must cost exactly its contract: one
    exchange hash-partitioned on the group key feeding FlatMapGroups
    (plus the deliberate spread() of the compact source), nothing
    else — no extra shuffle sneaks between the repartition and the
    groupBy."""
    plan = explain_str(
        pipeline_queries.doc_length_deciles(spark, SF_ORACLE))
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges <= 2, \
        f"expected spread + group-key exchanges only, got {n_exchanges}:\n{plan}"
    assert "hashpartitioning(pred_lang" in plan


def test_media_features_is_map_only_after_repartition(spark):
    """Multimodal extraction is map-shaped: one byte-budget
    round-robin/hash repartition, then mapInPandas — no joins, no
    aggregates, no second exchange."""
    plan = explain_str(
        pipeline_queries.media_image_features(spark, SF_ORACLE))
    assert "MapInPandas" in plan
    assert plan.count("Exchange ") == 1, plan
    for op in ("Join", "HashAggregate", "Sort "):
        assert op not in plan, f"unexpected {op} in map-only plan:\n{plan}"


# --- round-3 pipeline batch (pipeline2.py) ----------------------------------

def test_repetition_stats_no_shuffle_beyond_spread(spark):
    """Repetition signals are a narrow map: no join/window/agg
    shuffle — only the deliberate spread() repartition may appear."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.doc_repetition_stats(spark, SF_ORACLE))
    for op in ("Join", "Window", "HashAggregate", "Sort"):
        assert op not in plan, op
    assert plan.count("+- Exchange") <= 1  # the spread() only


def test_boilerplate_partial_agg_no_hot_key_window(spark):
    """Boilerplate doc-frequency must be a partial-aggregated
    groupBy + equi-join-back — NEVER a window over the corpus line
    hash (a window has no map-side combine and AQE cannot split its
    partitions: a universal line becomes one straggler task at
    100 TB). The count side + probe side each derive the exploded
    frame (≤2 Generates), and the join is a hash equi-join."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.boilerplate_lines(spark, SF_ORACLE))
    assert "Window" not in plan, f"hot-key window reintroduced:\n{plan}"
    assert plan.count(") Generate") <= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_one_window_no_join(spark):
    """Packing is pure window algebra: one Window, zero joins; the
    window partitioning is (source, shard) — shard-parallel, never a
    single global sort."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.pack_training_sequences(spark, SF_ORACLE))
    assert plan.count(") Window") <= 1 or "Window" in plan
    assert "Join" not in plan
    assert "shard" in plan  # partition key includes the shard column


def test_mixture_plan_broadcasts_weights(spark):
    """The weights side must broadcast; the corpus side aggregates
    with map-side partials (one exchange for the groupBy)."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.training_mixture_plan(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lm_quality_apply_is_map_side(spark):
    """The unigram model applies as a literal-map fold: zero joins,
    zero explode; only the deliberate spread() exchange."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.doc_lm_quality(spark, SF_ORACLE))
    assert "Join" not in plan
    assert ") Generate" not in plan
    assert plan.count("+- Exchange") <= 1


def test_dup_spans_partial_agg_no_hot_key_window(spark):
    """Span frequency must be a partial-aggregated groupBy +
    equi-join-back — never a window over the corpus span hash (the
    100 TB straggler shape) and never a self-join of raw spans."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.doc_dup_spans(spark, SF_ORACLE))
    assert "Window" not in plan, f"hot-key window reintroduced:\n{plan}"
    assert plan.count(") Generate") <= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_c4_line_dedup_first_occurrence_is_partial_agg(spark):
    """The C4 first-occurrence decision must be
    groupBy(line_hash).agg(min(struct...)) — a partial aggregate that
    map-side-combines a corpus-universal line — never a
    row_number window partitioned by the line hash. partial_merge
    in the aggregate modes is the map-side combine made visible."""
    from mapreducewordcount_spark.queries import pipeline2

    plan = explain_str(pipeline2.c4_line_dedup(spark, SF_ORACLE))
    assert "Window" not in plan, f"hot-key window reintroduced:\n{plan}"
    assert "partial_merge" in plan or "partial" in plan.lower()
    assert "xxhash64" in plan  # shuffle keyed on the 8-byte hash


def test_exact_substring_plan_shape(spark):
    """The exact-substring rewrite's scale-deciding properties:
    L-gram frequency is a partial-agg groupBy + equi-join-back keyed
    on the 8-byte hash (never a window over the corpus key, never a
    self-join of raw spans); the only windows are the per-DOC
    gaps-and-islands pair; the rewrite joins spans back as an array
    (no position-level range join -> no nested loop)."""
    from mapreducewordcount_spark.queries import pipeline4

    plan = explain_str(pipeline4.exact_substring_dedup(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "xxhash64" in plan          # hashed shuffle keys, not strings
    assert "partial" in plan.lower()   # map-side combine on the counts
    # both windows run per-document (bounded state, no cross-doc skew)
    import re

    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "doc_id" for s in specs), specs
