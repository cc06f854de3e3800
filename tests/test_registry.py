"""Registry contract: the driver-gate window (first ~50 entries) is a
curated coverage decision — pin it so refactors can't silently
displace queries out of their round's gate slots."""

from __future__ import annotations

from mapreducewordcount_spark.queries import all_queries


def test_gate_window_rotation_round3():
    names = list(all_queries())
    window = set(names[:50])
    # never-driver-checked families must hold gate slots this round
    for q in ("q4_priority_late", "q21_late_suppliers",
              "q2_min_cost_supplier", "q22_idle_customers",
              "nation_balance_reconciliation"):
        assert q in window, q
    # the repaired events family must re-earn hash-green driver rows
    for q in ("events_sessions", "events_after_purchase"):
        assert q in window, q
    # round-3 operators take their first driver rows
    for q in ("doc_repetition_stats", "boilerplate_lines",
              "pack_training_sequences", "training_mixture_plan",
              "doc_lm_quality", "doc_dup_spans"):
        assert q in window, q
    # one live representative per already-green core family
    for q in ("wc_word_count", "dedup_minhash_pairs",
              "media_image_features"):
        assert q in window, q


def test_registry_is_complete_and_unique():
    qs = all_queries()
    assert len(qs) >= 86
    # every spec is callable; oracle entries are non-empty strings
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name
        assert spec.oracle_sql is None or (
            isinstance(spec.oracle_sql, str) and spec.oracle_sql.strip()), name
