"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries


def test_gate_window_rotation_round4():
    names = list(all_queries())
    window = set(names[:50])
    # the last two never-driver-checked entries take gate slots
    for q in ("pack_curated_corpus", "ann_pq_topk"):
        assert q in window, q
    # the two HUGEINT-fix rows and the two DECIMAL-normalized
    # oracles must re-earn hash-green driver rows
    for q in ("training_mixture_plan", "doc_dup_spans",
              "doc_quality", "curate_corpus"):
        assert q in window, q
    # round-4 operators take their first driver rows
    for q in ("bpe_pair_stats", "doc_bpe_tokens", "epoch_shuffle_order",
              "c4_line_dedup", "doc_quality_features", "doc_char_entropy",
              "doc_compression_ratio", "semantic_dedup_embeddings",
              # late-round-4 additions (each displaced a double-green
              # r1+r2 refresher: wc_bucket_hist/wc_top20/
              # content_word_counts/top_bigrams)
              "mixture_applied_sample", "embedding_cluster_stats",
              "media_audio_features", "curriculum_epoch_order"):
        assert q in window, q
    # core families whose latest rows are r1/r2 rotate back in
    for q in ("wc_word_count", "dedup_minhash_pairs", "dedup_exact",
              "q1_pricing_summary", "q6_forecast_revenue",
              "bucketed_order_revenue", "doc_keywords_tfidf",
              "decontam_report", "stratified_sample_docs"):
        assert q in window, q
    # round-3 operator representatives keep fresh evidence
    for q in ("doc_repetition_stats", "pack_training_sequences",
              "doc_lm_quality"):
        assert q in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
