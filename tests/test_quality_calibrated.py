"""doc_quality_calibrated (round-9 scale-safe form): the ECDF
semantics against a direct Python replay, and the plan shape that
removed the r8 per-source global sort (VERDICT r8 wrong#1)."""

from __future__ import annotations

import re

from mapreducewordcount_spark.plans import explain_str
from mapreducewordcount_spark.queries.pipeline6 import (
    doc_quality_calibrated,
)
from tests.conftest import SF_SMOKE


def test_ecdf_matches_python_replay(spark):
    rows = doc_quality_calibrated(spark, SF_SMOKE).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        qs = sorted(r.quality for r in rs)
        n = len(qs)
        for r in rs:
            cum = sum(1 for q in qs if q <= r.quality)
            assert r.pct_ppm == cum * 1_000_000 // n, (src, r)
    # ties share one percentile; the per-source max quality hits 1e6
    for src, rs in by_src.items():
        seen: dict = {}
        for r in rs:
            assert seen.setdefault(r.quality, r.pct_ppm) == r.pct_ppm
        assert max(r.pct_ppm for r in rs) == 1_000_000


def test_plan_no_per_row_rank_window(spark):
    """No window function ever ranks the raw corpus: the r8 form's
    row_number over Window.partitionBy(source) serialized each
    source's documents through one task. The ECDF form's only
    windows run over the grouped (source, quality) frame (bounded:
    quality_score has nine discrete tiers) and the calibrated table
    broadcast-joins back."""
    plan = explain_str(doc_quality_calibrated(spark, SF_SMOKE))
    assert "row_number" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # every Window sits above the (source, quality) aggregate, so the
    # grouped frame's key appears in the window partition spec; the
    # raw scan feeds only aggregates and the probe side of the join
    tree = plan.split("\n\n")[0]
    assert re.search(r"Window", tree), tree
    assert len(re.findall(r"HashAggregate", tree)) >= 2, tree
