"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries


def test_gate_window_rotation_round7():
    names = list(all_queries())
    window = set(names[:50])
    # VERDICT r6 next#1: the 29 queries whose last green driver row
    # is round 3 lead the window — after r7 every registry query's
    # last green is ≥ r5
    r3_stale = (
        "q9_type_profit", "q10_returned_customers",
        "q11_important_parts", "q12_ship_priority",
        "q13_order_count_dist", "q14_promo_revenue",
        "q15_top_supplier", "q16_part_supplier_counts",
        "q17_small_qty_revenue", "q18_large_orders",
        "q19_disjunctive", "q20_excess_share_suppliers",
        "q21_late_suppliers", "q22_idle_customers",
        "nation_balance_reconciliation", "above_avg_customers",
        "acctbal_histogram", "part_name_features", "orders_by_month",
        "label_centroid_norms", "orders_nearby_window",
        "pivot_status_by_segment", "unpivot_part_measures",
        "cube_revenue", "segment_price_quantiles",
        "rollup_with_grouping_flags", "doc_stats", "doc_language_id",
        "doc_fingerprints")
    assert names[:29] == list(r3_stale)
    # round-7 first-ever rows + this round's changed queries
    assert names[29:50] == ["exact_substring_dedup",
                            "sketch_hll_report",
                            "part_name_fuzzy_pairs",
                            "decontam_bloom_report",
                            "orders_cdc_merge", "weighted_sample_docs",
                            "events_compaction_plan",
                            "doc_bm25_topk", "heavy_hitters_words",
                            "lineitem_zorder_layout",
                            "join_skew_report",
                            "source_quota_cap", "orders_scd2_history",
                            "events_funnel", "supplier_part_pagerank",
                            "dsir_selection", "doc_bm25_multi",
                            "orders_agg_ivm",
                            "sketch_stats", "doc_bpe_tokens",
                            "doc_quality"]
    assert len(names) >= 50 and len(window) == 50
    # freshly green in r6 → correctly rotated OUT this round; the
    # later ones ceded their slots to the session-3 first-evers and
    # lead the r8 cohort instead
    for q in ("dedup_simhash_pairs", "ann_lsh_topk", "doc_chunks",
              "q1_pricing_summary", "events_asof_orders",
              "dedup_ngram_pairs", "dedup_winnow_pairs",
              "dedup_embedding_pairs", "curate_corpus",
              "curate_corpus_best", "wc_word_count_salted",
              "dedup_prefix_pairs", "dedup_groups",
              "dedup_minhash_pairs", "dedup_exact", "ann_cosine_topk",
              "wc_word_count"):
        assert q not in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
