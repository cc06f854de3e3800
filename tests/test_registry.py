"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries

def test_gate_window_rotation_round12():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r11 next#2: the 17-query r8-last-green tail leads
    # unconditionally (the only rows older than r9 in the cumulative
    # driver record), then the five r12 first-evers
    assert names[:22] == [
        "bigram_collocations", "curate_corpus_best", "dedup_survivors",
        "doc_cdc_chunks", "doc_hybrid_search", "doc_length_outliers",
        "events_gapfill", "events_rate_cusum", "heavy_hitters_words",
        "incremental_dedup_report", "knn_label_accuracy",
        "lineitem_profile", "orders_agg_ivm_minmax", "orders_cdc_e2e",
        "orders_snapshot_diff", "seq_length_histogram",
        "source_overlap_matrix",
        "vocab_overlap_hll_sketch", "ivfpq_recall_curve",
        "doc_reservoir_sample", "events_retention_cohorts",
        "dedup_cluster_stats"]
    # the oldest r9-last-green rows fill the window
    r9_cohort_head = {
        "q1_pricing_summary", "q5_region_revenue", "ann_ivf_topk",
        "ann_pq_topk", "dedup_simhash_pairs", "doc_hybrid_bm25",
        "doc_quality_calibrated", "events_asof_orders",
        "events_hourly", "doc_keywords_tfidf"}
    assert r9_cohort_head <= window
    # positions 51-55: designated spills (tail of the r9 cohort)
    assert names[50:55] == ["events_sessions", "media_audio_features",
                            "media_audio_fp_pairs",
                            "media_image_dhash_pairs",
                            "media_image_features"]
    assert len(window) == 50
    # freshly green in r10/r11 -> correctly rotated OUT this round
    for q in ("doc_language_ngram", "ann_ivfpq_topk",
              "vocab_overlap_hll", "mixture_ipf_grid",
              "basket_cap_report", "source_drift_tv",
              "bpe_fertility_by_lang", "part_pair_affinity",
              "decontam_minhash_report", "events_type_transitions",
              "doc_nfc_stats", "grouping_sets_revenue",
              "mixture_on_predicted_lang", "wc_top20",
              # r13 leads (the remaining r9 cohort) stay out too
              "big_spender_segments", "wc_bucket_hist",
              "top_bigrams", "rollup_revenue"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
