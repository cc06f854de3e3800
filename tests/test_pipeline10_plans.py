"""Plan hygiene for the round-11 queries: the scale-deciding
physical properties, pinned (the test_pipeline_plans pattern)."""

from __future__ import annotations

from mapreducewordcount_spark.plans import explain_str
from mapreducewordcount_spark.queries import pipeline9, pipeline10
from tests.conftest import SF_ORACLE


def test_vocab_overlap_no_cartesian_and_registers_partial_agg(spark):
    """Pairwise overlap must never cartesian the corpus: the only
    nested-loop joins are the bounded source-pair frames, the word
    self-join is hash-keyed, and the register build is a partial
    aggregate (map-side combine before its exchange)."""
    plan = explain_str(pipeline10.vocab_overlap_hll(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    # register/exact builds aggregate partially before shuffling
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan  # word self-join is hash-keyed


def test_vocab_overlap_sketch_mode_has_no_word_level_join(spark):
    """``calibrate=False`` is the runnable 100 TB contract (VERDICT
    r11 wrong#3/next#4): the exact-calibration legs — the only
    word-keyed joins — must be gone from the PLAN. Formatted explain
    lists every join with its keys/condition in a ``(N) <Op>Join``
    detail block; none may reference a word column. The register
    build must still aggregate partially (map-side combine before
    the one shuffle to ≤ |sources|×256 rows)."""
    from mapreducewordcount_spark.queries.pipeline10 import (
        vocab_overlap_hll,
    )

    df = vocab_overlap_hll(spark, SF_ORACLE, calibrate=False)
    assert df.columns == ["src_a", "src_b", "est_a", "est_b",
                          "est_union", "est_overlap"]
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    join_blocks = [b for b in plan.split("\n\n")
                   if b.lstrip().startswith("(")
                   and "Join" in b.splitlines()[0]]
    assert join_blocks, "pair/register algebra still joins"
    offenders = [b.splitlines()[0] for b in join_blocks
                 if "word#" in b]
    assert not offenders, offenders
    assert "HashAggregate" in plan
    # sketch mode also drops the corpus-wide distinct: no
    # (source, word)-keyed aggregate anywhere, only register folds
    agg_blocks = [b for b in plan.split("\n\n")
                  if "HashAggregate" in b.splitlines()[0:1][0]
                  if b.lstrip().startswith("(")]
    assert not [b for b in agg_blocks
                if "word#" in b.split("Results")[0]]

    # and the estimates agree with calibrate=True's sketch columns
    # (same registers either way: max absorbs duplicates)
    sketch = {tuple(r) for r in df.collect()}
    full = {tuple(r) for r in
            vocab_overlap_hll(spark, SF_ORACLE)
            .select("src_a", "src_b", "est_a", "est_b", "est_union",
                    "est_overlap").collect()}
    assert sketch == full


def test_source_drift_single_corpus_pass(spark):
    """The drift report materializes the (grp, bucket) counts ONCE:
    every downstream consumer (totals, grid join, top-bucket,
    numerator) reads the persisted block, not a re-run of the corpus
    explode. Textual ``Scan parquet`` still appears inside each
    InMemoryRelation's printed child plan, so the pin is the
    InMemoryTableScan wiring, not a scan count."""
    plan = explain_str(pipeline10.source_drift_tv(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    # >= 4 consumers read the cached counts grid
    assert plan.count("InMemoryTableScan") >= 4
    assert "partial_count" in plan or "HashAggregate" in plan


def test_basket_cap_one_shuffle_one_row(spark):
    """Cap audit: one basket shuffle (the distinct-count groupBy),
    then a single global aggregate — no joins anywhere."""
    plan = explain_str(pipeline9.basket_cap_report(spark, SF_ORACLE))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_ipf_grid_single_aggregate_plus_artifact_join(spark):
    """The engine-side cost is ONE corpus aggregate; the fitted grid
    comes back as a broadcast-sized artifact join (the fit itself ran
    driver-side during query construction)."""
    plan = explain_str(pipeline10.mixture_ipf_grid(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "Scan parquet" in plan
    # inventory join with the tiny artifact: hash join, never NL
    assert "BroadcastNestedLoopJoin" not in plan
