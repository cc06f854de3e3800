"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries


def test_gate_window_rotation_round6():
    names = list(all_queries())
    window = set(names[:50])
    # the eleven queries whose rows-only checks flip to full artifact
    # oracles this round take the head (first-ever ORACLED rows),
    # then the remaining plan/operating-point changes (128-hash
    # incremental near-dup, integer-div chunking)
    assert names[:13] == [
        "dedup_simhash_pairs", "media_image_dhash_pairs",
        "media_audio_fp_pairs", "dedup_embedding_pairs_lsh",
        "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
        "semantic_dedup_embeddings", "embedding_cluster_stats",
        "doc_compression_ratio", "doc_bpe_tokens",
        "incremental_neardup_report", "doc_chunks"]
    # the 16 queries that rotated out of the r5 window re-verify
    # (last green r4 — VERDICT r5 next#7: every operator's last green
    # stays ≤2 rounds old)
    for q in ("doc_length_deciles", "media_image_features",
              "media_audio_features", "q1_pricing_summary",
              "q6_forecast_revenue", "q3_top_orders",
              "q5_region_revenue", "top_orders_per_customer",
              "rollup_revenue", "bucketed_order_revenue",
              "doc_keywords_tfidf", "curriculum_epoch_order",
              "doc_repetition_stats", "pack_training_sequences",
              "doc_lm_quality", "wc_bucket_hist"):
        assert q in window, q
    # stalest core families fill the remaining slots: the full
    # last-green-r2 cohort and a 15-query slice of the r3 cohort
    for q in ("big_spender_segments", "wc_top20", "running_revenue",
              "events_asof_orders", "events_sessions",
              "q7_nation_volume"):
        assert q in window, q
    # every r5-window query is freshly green (CORRECTNESS_r05) and
    # correctly rotates OUT this round
    for q in ("doc_chunks", "incremental_neardup_report"):
        assert q in window  # unless its plan changed again (above)
    assert "wc_word_count" not in window  # green in r1/r2/r5


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
