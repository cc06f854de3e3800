"""Bench report contract (VERDICT r10 wrong#4): the printed line must
lead with the regression instrument (queries map + core_total before
any fingerprint material) and the full report must go to the
committed artifact — so a truncated driver capture still yields every
per-query row to tools/compare_bench.py."""

from __future__ import annotations

import json
import sys


def test_emit_orders_line_and_writes_artifact(tmp_path, monkeypatch,
                                              capsys):
    import bench

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    report = {"metric": "headline_total", "value": 1.0, "unit": "sec",
              "core_total": 0.5, "queries": {"q1": 0.1, "q2": 0.2},
              "sf": "x", "env": [{"start": {"big": "blob" * 100}}]}
    line_report = {**report, "env": [{"start": {"cpu_score_ms": 93.0}}]}
    bench._emit(report, line=line_report)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    keys = list(d)
    # queries + core_total precede env on the line (truncation-proof)
    assert keys.index("core_total") < keys.index("env")
    assert keys.index("queries") < keys.index("env")
    # the line carries the slim env, the artifact the full one
    assert d["env"] == [{"start": {"cpu_score_ms": 93.0}}]
    assert d["artifact"] == "artifacts/bench_latest.json"
    art = json.load(open(tmp_path / "artifacts" / "bench_latest.json"))
    assert art["env"][0]["start"]["big"] == "blob" * 100
    assert art["queries"] == {"q1": 0.1, "q2": 0.2}


def test_salvage_recovers_leading_queries_from_truncation():
    sys.path.insert(0, "tools")
    from compare_bench import _salvage

    line = json.dumps({"metric": "headline_total", "value": 9.9,
                       "unit": "sec", "core_total": 3.3,
                       "queries": {f"q{i}_name": 0.5 + i
                                   for i in range(60)},
                       "sf": "d", "sessions": {"n": 2, "min": 1.0}})
    rep = _salvage(line[:len(line) // 2])  # cut mid-queries
    assert len(rep["queries"]) >= 20
    assert rep["core_total"] == 3.3
    assert all(k.startswith("q") for k in rep["queries"])
