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
    #   r5 window (below) — the fourteen round-5 operators and the new
    #   mixture→packing composition (first-ever rows), then every
    #   query whose PLAN changed this round (the hot-key window
    #   rewrites, the banded lsh_topk, the single-pass entropy, the
    #   kmeans guard) so the reworks get fresh driver evidence, then
    #   the usual rotation of core families (q1/q6/audio-features
    #   rotate out at the 50-slot boundary; their green rows stand).
    full: dict[str, QuerySpec] = {}
    for mod in (wordcount_queries, curation, dedup_queries,
                pipeline_queries, pipeline2, pipeline3, tpch,
                bucketed_join, analytics, text_queries, analytics2,
                analytics3, tpch2, tpch3):
        full.update(mod.QUERIES)

    gate_first = (
        # round-5 operators: first-ever driver rows
        "doc_chunks", "dedup_survivors", "seq_length_histogram",
        "events_gapfill", "source_overlap_matrix", "media_video_frames",
        "dataset_split_stats", "doc_ngram_novelty", "curate_corpus_best",
        "media_image_dhash_pairs", "media_audio_fp_pairs",
        "incremental_dedup_report", "incremental_neardup_report",
        "knn_label_accuracy",
        # round-5 composition: first-ever driver row
        "pack_mixture_corpus",
        # plan-changed this round: hot-key window rewrites
        "c4_line_dedup", "boilerplate_lines", "doc_dup_spans",
        # plan-changed: banded LSH top-k (rows-only) + entropy rewrite
        "ann_lsh_topk", "doc_char_entropy",
        # guard-changed kmeans path + mixture selector (docstring-only
        # but shares apply_mixture with the new composition)
        "embedding_cluster_stats", "mixture_applied_sample",
        # round-4 first-rows kept fresh
        "pack_curated_corpus", "ann_pq_topk", "training_mixture_plan",
        "doc_quality", "curate_corpus",
        "bpe_pair_stats", "doc_bpe_tokens", "epoch_shuffle_order",
        "doc_quality_features", "doc_compression_ratio",
        "semantic_dedup_embeddings",
        # core families
        "wc_word_count", "wc_word_count_salted",
        *dedup_queries.QUERIES,
        *pipeline_queries.QUERIES,
        # TPC-H batch 1: bench headliners + one grouping-sets rep
        "q1_pricing_summary", "q6_forecast_revenue", "q3_top_orders",
        "q5_region_revenue", "top_orders_per_customer",
        "rollup_revenue",
        *bucketed_join.QUERIES,
        "doc_keywords_tfidf", "curriculum_epoch_order",
        "doc_repetition_stats", "pack_training_sequences",
        "doc_lm_quality",
    )
    out = {n: full[n] for n in gate_first}
    out.update(full)  # remainder keeps its original relative order
    return out
