"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries

R6_COHORT = (
    "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
    "dedup_simhash_pairs", "semantic_dedup_embeddings",
    "embedding_cluster_stats", "curriculum_epoch_order",
    "incremental_neardup_report", "doc_chunks",
    "media_image_features", "media_audio_features",
    "media_image_dhash_pairs", "media_audio_fp_pairs",
    "doc_length_deciles", "doc_repetition_stats",
    "pack_training_sequences", "doc_lm_quality",
    "doc_compression_ratio", "doc_keywords_tfidf",
    "top_bigrams", "content_word_counts",
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_top_orders",
    "q4_priority_late", "q5_region_revenue", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share",
    "events_hourly", "events_json_stats", "events_sessions",
    "events_asof_orders", "events_after_purchase",
    "events_props_keys",
    "top_customers", "part_brand_stats", "big_spender_segments",
    "customers_without_orders", "top_orders_per_customer",
    "running_revenue", "rollup_revenue", "distinct_stats",
    "retained_customers", "churned_customers",
    "bucketed_order_revenue", "wc_bucket_hist",
    "wc_top20")


def test_gate_window_rotation_round9():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r8 next#1: the value-changed calibrated query and the
    # two round-9 first-evers lead, then the 48-query r6-last-green
    # cohort; wc_top20 holds the 51st slot (the designated spill if
    # the driver cuts at 50 — it leads r10 with the r7 cohort)
    assert names[:3] == ["doc_quality_calibrated",
                         "doc_cdc_chunk_dedup", "doc_hybrid_bm25"]
    assert names[3:51] == list(R6_COHORT)
    assert len(names) >= 51 and len(window) == 50
    # freshly green in r8 → correctly rotated OUT this round
    for q in ("orders_snapshot_diff", "orders_cdc_e2e",
              "orders_agg_ivm_minmax", "doc_length_outliers",
              "bigram_collocations", "lineitem_profile",
              "events_rate_cusum", "doc_hybrid_search",
              "doc_cdc_chunks", "heavy_hitters_words",
              "weighted_sample_docs", "dedup_embedding_pairs_lsh",
              "decontam_bloom_report", "wc_word_count",
              "dedup_exact", "training_mixture_plan",
              # r7 cohort stays queued for r10
              "q9_type_profit", "doc_bm25_topk", "sketch_stats"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
