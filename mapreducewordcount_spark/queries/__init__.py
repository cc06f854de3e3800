"""Query registry: every operator exposed as (Spark impl, oracle SQL).

Each entry is ``name -> QuerySpec(spark_fn, oracle_sql)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` is the DataFrame-first
implementation and ``oracle_sql`` is equivalent ANSI SQL a DuckDB
instance can run over the same parquet tables (None for ops whose
semantics are hash-family-specific and not SQL-expressible — the
driver then records a rows-only check; pytest covers them against
planted ground truth instead).

Column names are part of the contract: the correctness gate sorts
columns by name and hashes values, so every computed column is
aliased identically on both sides, floating-point aggregates are
rounded on both sides (money 2dp, ratios/scores 4-6dp), and
timestamp group keys are rendered as strings to pin formatting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: Optional[str]


def all_queries() -> dict[str, QuerySpec]:
    from mapreducewordcount_spark.queries import (
        analytics,
        analytics2,
        analytics3,
        bucketed_join,
        curation,
        tpch2,
        tpch3,
        dedup_queries,
        pipeline_queries,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        text_queries,
        tpch,
        wordcount_queries,
    )

    # Order matters: the driver gate walks this dict in insertion
    # order and records rows for the first ~50 entries only; the tail
    # is covered locally by tests/test_oracle.py's full-registry
    # sweep. The gate window is ROTATED per round so every query gets
    # a hash-green driver row across rounds:
    #   r1+r2 window — word-count, curation, dedup/ANN ladder,
    #   hygiene + grouped-Arrow + multimodal, TPC-H batch 1, bucketed
    #   join, events family, text family (all hash-green in
    #   CORRECTNESS_r01/r02);
    #   r3 window — the never-driver-checked TPC-H batches 2/3 and
    #   nation_balance_reconciliation, the r1-only analytics2/3
    #   families, the full events/doc analytics family, plus the six
    #   round-3 operators (47/50 green; 2 oracle-typing reds fixed
    #   this round);
    #   r4 window — the last two never-driver-checked entries,
    #   HUGEINT-fix re-verification, the round-4 operators, then the
    #   core families (41/41 oracled rows green);
    #   r5 window — the fourteen round-5 operators and the new
    #   mixture→packing composition (first-ever rows), then the r5
    #   plan-changed set, then core-family rotation (39/39 oracled
    #   green, 11 rows-only);
    #   r6 window — the eleven rows-only → artifact-oracle flips,
    #   the remaining plan changes, the 16 r4-rotated-out queries,
    #   the r2 cohort, and 13 of the r3 cohort (50/50 green);
    #   r7 window (below) — VERDICT r6 next#1: the 29 queries whose
    #   last driver row is round 3 lead the window (TPC-H batches 2/3,
    #   the doc/analytics families, pivot/cube/grouping-sets reps), so
    #   after this round every registry query's last green is ≥ r5.
    #   Then the round-7 first-ever rows (exact_substring_dedup — the
    #   Lee et al. 2022 operator; sketch_hll_report — the HLL half of
    #   the sketch split, now artifact-oracled; part_name_fuzzy_pairs
    #   — the PassJoin edit-distance join with an independent
    #   brute-force oracle; decontam_bloom_report — the Bloom
    #   prefilter + exact-verify decontamination variant;
    #   orders_cdc_merge — the MERGE/upsert snapshot-refresh
    #   primitive; weighted_sample_docs — integer-exact A-ES weighted
    #   sampling without replacement; events_compaction_plan — the
    #   small-file compaction planner; doc_bm25_topk — rational-idf
    #   BM25 retrieval; heavy_hitters_words — Misra-Gries two-pass
    #   exact heavy hitters; lineitem_zorder_layout — Morton-curve
    #   layout planner; join_skew_report — hot-key salting
    #   diagnostics; source_quota_cap — per-domain best-k cap;
    #   orders_scd2_history — SCD2 validity intervals from the CDC
    #   log; events_funnel — strict-order funnel conversion;
    #   supplier_part_pagerank — fixed-point iterative PageRank with
    #   an unrolled-CTE oracle; dsir_selection — DSIR importance
    #   resampling with the bucket log-weight table as the committed
    #   model artifact; doc_bm25_multi — the many-query batch BM25
    #   decontamination shape; orders_agg_ivm — incremental view
    #   maintenance, delta refresh vs full-recompute oracle), then
    #   this round's changed queries (sketch_stats — trimmed to the
    #   GK residue; doc_bpe_tokens — forced vocab-table broadcast
    #   dropped; doc_quality — oracle reassembled from the shared
    #   QUALITY_M_CTE). The full 37-query r5-last-green cohort
    #   (incl. wc_word_count, boilerplate_lines, knn_label_accuracy,
    #   incremental_dedup_report, dedup_survivors, the dedup ladder,
    #   ann_cosine_topk, curate_corpus/_best, wc_word_count_salted)
    #   rotates through r8 — it MUST lead the r8 window.
    full: dict[str, QuerySpec] = {}
    for mod in (wordcount_queries, curation, dedup_queries,
                pipeline_queries, pipeline2, pipeline3, pipeline4,
                pipeline5,
                tpch, bucketed_join, analytics, text_queries,
                analytics2, analytics3, tpch2, tpch3):
        full.update(mod.QUERIES)

    gate_first = (
        # the 29 r3-stale queries (VERDICT r6 next#1) — every one of
        # these has its last green driver row in round 3
        "q9_type_profit", "q10_returned_customers",
        "q11_important_parts", "q12_ship_priority",
        "q13_order_count_dist", "q14_promo_revenue",
        "q15_top_supplier", "q16_part_supplier_counts",
        "q17_small_qty_revenue", "q18_large_orders",
        "q19_disjunctive", "q20_excess_share_suppliers",
        "q21_late_suppliers", "q22_idle_customers",
        "nation_balance_reconciliation", "above_avg_customers",
        "acctbal_histogram", "part_name_features", "orders_by_month",
        "label_centroid_norms", "orders_nearby_window",
        "pivot_status_by_segment", "unpivot_part_measures",
        "cube_revenue", "segment_price_quantiles",
        "rollup_with_grouping_flags", "doc_stats", "doc_language_id",
        "doc_fingerprints",
        # round-7 first-ever rows
        "exact_substring_dedup", "sketch_hll_report",
        "part_name_fuzzy_pairs", "decontam_bloom_report",
        "orders_cdc_merge", "weighted_sample_docs",
        "events_compaction_plan",
        "doc_bm25_topk", "heavy_hitters_words",
        "lineitem_zorder_layout", "join_skew_report",
        "source_quota_cap", "orders_scd2_history", "events_funnel",
        "supplier_part_pagerank", "dsir_selection", "doc_bm25_multi",
        "orders_agg_ivm",
        # (orders_snapshot_diff, the 19th session-3 op, did NOT fit
        # the 50-row window — it is covered by the local full-registry
        # oracle sweep + all five gate_sim axes this round and leads
        # the r8 first-ever group)
        # changed this round: sketch split residue (rows-only),
        # dropped vocab-table broadcast, doc_quality (r3-stale AND
        # its oracle now assembles from the shared QUALITY_M_CTE;
        # orders_cdc_merge's cdc_change_batch refactor is covered by
        # its first-ever slot above). The 18 session-3 first-evers
        # consumed every r5-rotation slot — the whole r5-last-green
        # cohort (incl. wc_word_count, pytest/bench-covered every
        # round) rotates through r8.
        "sketch_stats", "doc_bpe_tokens", "doc_quality",
    )
    out = {n: full[n] for n in gate_first}
    out.update(full)  # remainder keeps its original relative order
    return out
