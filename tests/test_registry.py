"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries

def test_gate_window_rotation_round13():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r12 next#2: the 22-query r9-last-green cohort leads
    # unconditionally (the only rows older than r10 in the cumulative
    # driver record), then the three r13 first-evers
    assert names[:25] == [
        "big_spender_segments", "bucketed_order_revenue",
        "churned_customers", "content_word_counts",
        "curriculum_epoch_order", "customers_without_orders",
        "distinct_stats", "embedding_cluster_stats",
        "events_sessions", "media_audio_features",
        "media_audio_fp_pairs", "media_image_dhash_pairs",
        "media_image_features", "pack_training_sequences",
        "part_brand_stats", "retained_customers", "rollup_revenue",
        "running_revenue", "top_bigrams", "top_customers",
        "top_orders_per_customer", "wc_bucket_hist",
        "ivfpq_append_report", "doc_stratified_reservoir",
        "leakage_safe_splits"]
    # the oldest r10-last-green rows fill the window
    r10_cohort_head = {
        "above_avg_customers", "acctbal_histogram", "cube_revenue",
        "doc_bm25_topk", "doc_fingerprints", "doc_language_id",
        "doc_quality", "dsir_selection", "events_funnel",
        "exact_substring_dedup", "join_skew_report",
        "orders_cdc_merge"}
    assert r10_cohort_head <= window
    assert len(window) == 50
    # sketch_stats' exact-percentile operator changed plan in the r13
    # optimization round (percentile_disc buffers -> cume_dist
    # window, value-identical): per the r11 changed-query precedent
    # it takes a fresh driver row THIS round instead of waiting in
    # the r14 spill set (part_name_features spilled to make room)
    assert "sketch_stats" in window
    # freshly green in r11/r12 -> correctly rotated OUT this round
    for q in ("bigram_collocations", "curate_corpus_best",
              "doc_hybrid_search", "vocab_overlap_hll_sketch",
              "ivfpq_recall_curve", "doc_reservoir_sample",
              "events_retention_cohorts", "dedup_cluster_stats",
              "q1_pricing_summary", "ann_ivf_topk",
              "semantic_dedup_embeddings", "events_hourly",
              # r14 leads (the remaining r10 cohort) stay out too
              "q10_returned_customers", "wc_top20",
              "part_name_fuzzy_pairs",
              "part_name_features", "supplier_part_pagerank"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
