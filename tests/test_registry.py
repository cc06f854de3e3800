"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries


def test_gate_window_rotation_round5():
    names = list(all_queries())
    window = set(names[:50])
    # the fourteen round-5 operators and the mixture→packing composition
    # take their first-ever driver rows, up front — first-ever rows
    # outrank keeping already-green rows fresh, so several
    # round-4-green queries (curriculum_epoch_order,
    # bucketed_order_revenue, doc_keywords_tfidf, doc_repetition_stats,
    # pack_training_sequences, q6_forecast_revenue, ...) rotate OUT of
    # the 50-slot window this round; their r4 hash-green rows stand.
    assert names[:15] == [
        "doc_chunks", "dedup_survivors", "seq_length_histogram",
        "events_gapfill", "source_overlap_matrix", "media_video_frames",
        "dataset_split_stats", "doc_ngram_novelty", "curate_corpus_best",
        "media_image_dhash_pairs", "media_audio_fp_pairs",
        "incremental_dedup_report", "incremental_neardup_report",
        "knn_label_accuracy", "pack_mixture_corpus"]
    # every query whose PLAN changed in round 5 must re-earn driver
    # evidence: the hot-key window rewrites, the banded lsh_topk, the
    # single-pass entropy, the kmeans-guard path, and the mixture
    # selector the new composition shares
    for q in ("c4_line_dedup", "boilerplate_lines", "doc_dup_spans",
              "ann_lsh_topk", "doc_char_entropy",
              "embedding_cluster_stats", "mixture_applied_sample"):
        assert q in window, q
    # round-4 first-rows stay fresh (media_audio_features rotated
    # out at the 50-slot boundary this round — r4 hash-green stands)
    for q in ("pack_curated_corpus", "ann_pq_topk",
              "training_mixture_plan", "doc_quality", "curate_corpus",
              "bpe_pair_stats", "doc_bpe_tokens", "epoch_shuffle_order",
              "doc_quality_features", "doc_compression_ratio",
              "semantic_dedup_embeddings"):
        assert q in window, q
    # core families rotate through (q1/q6/TPC-H reps rotated out this
    # round — each has hash-green rows in all of r1-r4)
    for q in ("wc_word_count", "dedup_minhash_pairs", "dedup_exact",
              "decontam_report", "stratified_sample_docs"):
        assert q in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
