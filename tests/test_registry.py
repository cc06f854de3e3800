"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries

R5_COHORT = (
    "wc_word_count", "wc_word_count_salted",
    "ann_cosine_topk", "boilerplate_lines", "bpe_pair_stats",
    "c4_line_dedup", "curate_corpus", "curate_corpus_best",
    "dataset_split_stats", "decontam_report",
    "dedup_embedding_pairs", "dedup_exact", "dedup_groups",
    "dedup_minhash_pairs", "dedup_ngram_pairs",
    "dedup_prefix_pairs", "dedup_survivors", "dedup_winnow_pairs",
    "doc_char_entropy", "doc_dup_spans", "doc_ngram_novelty",
    "doc_quality_features", "doc_winnow_fingerprints",
    "epoch_shuffle_order", "events_gapfill",
    "incremental_dedup_report", "knn_label_accuracy",
    "media_video_frames", "mixture_applied_sample",
    "pack_curated_corpus", "pack_mixture_corpus",
    "pii_scrub_stats", "seq_length_histogram",
    "source_overlap_matrix", "stratified_sample_docs",
    "training_mixture_plan")


def test_gate_window_rotation_round8():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r7 next#1 / wrong#1: orders_snapshot_diff's first-ever
    # driver row leads, then the round-8 first-evers and this round's
    # plan-changed queries
    assert names[:14] == ["orders_snapshot_diff",
                          "orders_cdc_e2e", "orders_agg_ivm_minmax",
                          "doc_length_outliers", "doc_quality_calibrated",
                          "bigram_collocations", "lineitem_profile",
                          "events_rate_cusum", "doc_hybrid_search",
                          "doc_cdc_chunks",
                          "heavy_hitters_words", "weighted_sample_docs",
                          "dedup_embedding_pairs_lsh",
                          "decontam_bloom_report"]
    # the full 36-query r5-last-green cohort — after r8 every
    # registry query's last green driver row is >= r6
    assert names[14:50] == list(R5_COHORT)
    assert len(names) >= 50 and len(window) == 50
    # freshly green in r7 → correctly rotated OUT this round
    for q in ("q9_type_profit", "exact_substring_dedup",
              "sketch_hll_report", "part_name_fuzzy_pairs",
              "orders_cdc_merge", "doc_bm25_topk", "orders_agg_ivm",
              "orders_scd2_history", "supplier_part_pagerank",
              "dsir_selection", "sketch_stats", "doc_bpe_tokens",
              "doc_quality", "doc_stats", "cube_revenue",
              "dedup_simhash_pairs", "ann_lsh_topk"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
