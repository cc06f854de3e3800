"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries

def test_gate_window_rotation_round11():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r10 next#1: value-changed queries and r11 first-evers
    # lead, then the six never-driver-checked r10 late additions,
    # the artifact-renamed mixture, and the five r7-stale rows
    assert names[:18] == [
        "doc_language_ngram", "ann_ivfpq_topk",
        "vocab_overlap_hll", "mixture_ipf_grid", "basket_cap_report",
        "source_drift_tv", "bpe_fertility_by_lang",
        "part_pair_affinity", "decontam_minhash_report",
        "events_type_transitions", "doc_nfc_stats",
        "grouping_sets_revenue", "mixture_on_predicted_lang",
        "rollup_with_grouping_flags", "unpivot_part_measures",
        "orders_by_month", "pivot_status_by_segment",
        "label_centroid_norms"]
    # the 34 oldest r8-last-green rows fill the window
    r8_cohort_head = {
        "wc_word_count", "curate_corpus", "ann_cosine_topk",
        "dedup_exact", "dedup_minhash_pairs", "dedup_groups",
        "decontam_report", "decontam_bloom_report", "pii_scrub_stats",
        "boilerplate_lines", "training_mixture_plan",
        "pack_curated_corpus", "bpe_pair_stats", "c4_line_dedup",
        "doc_quality_features", "media_video_frames"}
    assert r8_cohort_head <= window
    # positions 51-55: designated spills (next five r8 rows)
    assert names[50:57] == ["curate_corpus_best",
                            "incremental_dedup_report",
                            "knn_label_accuracy", "dedup_survivors",
                            "seq_length_histogram", "events_gapfill",
                            "source_overlap_matrix"]
    assert len(window) == 50
    # freshly green in r9/r10 -> correctly rotated OUT this round
    for q in ("sketch_stats", "sketch_cms_words",
              "doc_chunk_share_pairs", "hybrid_rank_overlap",
              "semantic_decontam_report", "wc_top20",
              "q9_type_profit", "doc_bpe_tokens", "orders_cdc_merge",
              "doc_quality_calibrated", "doc_cdc_chunk_dedup",
              "ann_lsh_topk", "q1_pricing_summary",
              "dedup_simhash_pairs", "wc_bucket_hist",
              # the r8 tail that leads r12 stays out too
              "heavy_hitters_words", "orders_snapshot_diff",
              "orders_cdc_e2e", "doc_hybrid_search", "doc_cdc_chunks"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
