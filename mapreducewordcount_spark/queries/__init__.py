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
    #   r6 window (below) — the ELEVEN queries whose rows-only checks
    #   flip to full artifact oracles this round (signature Hamming
    #   joins, banded embedding LSH, LSH/IVF/PQ ANN, SemDeDup prune,
    #   k-means cluster stats, zlib byte counts, the BPE word
    #   table —
    #   sources/sig_artifacts.py), then the
    #   remaining plan/operating-point changes (128-hash incremental
    #   near-dup, integer-div chunking), then
    #   the 16 queries that rotated out of r5's window (their last
    #   green is r4 — VERDICT r5 next#7 keeps every operator's last
    #   green ≤2 rounds old), then the stalest core families (last
    #   green r2, then a 15-query slice of the r3 cohort; the
    #   remaining r3 queries rotate through r7).
    full: dict[str, QuerySpec] = {}
    for mod in (wordcount_queries, curation, dedup_queries,
                pipeline_queries, pipeline2, pipeline3, pipeline4,
                tpch, bucketed_join, analytics, text_queries,
                analytics2, analytics3, tpch2, tpch3):
        full.update(mod.QUERIES)

    gate_first = (
        # rows-only → artifact-oracle flips: first-ever ORACLED rows
        "dedup_simhash_pairs", "media_image_dhash_pairs",
        "media_audio_fp_pairs", "dedup_embedding_pairs_lsh",
        "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
        "semantic_dedup_embeddings",
        "embedding_cluster_stats", "doc_compression_ratio",
        "doc_bpe_tokens",
        # plan / operating-point changes this round
        "incremental_neardup_report", "doc_chunks",
        # rotated out of the r5 window (last green r4)
        "doc_length_deciles", "media_image_features",
        "media_audio_features", "q1_pricing_summary",
        "q6_forecast_revenue", "q3_top_orders", "q5_region_revenue",
        "top_orders_per_customer", "rollup_revenue",
        "bucketed_order_revenue", "doc_keywords_tfidf",
        "curriculum_epoch_order", "doc_repetition_stats",
        "pack_training_sequences", "doc_lm_quality", "wc_bucket_hist",
        # stalest core families: last green r2
        "big_spender_segments", "churned_customers",
        "content_word_counts", "customers_without_orders",
        "distinct_stats", "part_brand_stats", "retained_customers",
        "running_revenue", "top_bigrams", "top_customers", "wc_top20",
        # last green r3: events family, TPC-H batch-2 reps, text reps
        "events_asof_orders", "events_sessions", "events_hourly",
        "events_json_stats", "events_props_keys",
        "events_after_purchase", "q2_min_cost_supplier",
        "q4_priority_late", "q7_nation_volume", "q8_market_share",
    )
    out = {n: full[n] for n in gate_first}
    out.update(full)  # remainder keeps its original relative order
    return out
