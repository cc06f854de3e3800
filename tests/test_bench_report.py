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
    # the line carries the slim env, the artifact the full one;
    # with no BENCH_r*.json in the (tmp) repo root the round is 1
    assert d["env"] == [{"start": {"cpu_score_ms": 93.0}}]
    assert d["artifact"] == "artifacts/bench_r1.json"
    art = json.load(open(tmp_path / "artifacts" / "bench_r1.json"))
    assert art["env"][0]["start"]["big"] == "blob" * 100
    assert art["queries"] == {"q1": 0.1, "q2": 0.2}
    # bench_latest.json stays as the mutable convenience copy
    latest = json.load(open(tmp_path / "artifacts" / "bench_latest.json"))
    assert latest == art


def test_emit_per_round_artifacts_are_immutable(tmp_path, monkeypatch,
                                                capsys):
    """VERDICT r11 wrong#1: a second same-round run must NOT replace
    the round's committed record — each _emit lands in a fresh file."""
    import bench

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "12")
    first = {"metric": "headline_total", "value": 1.0, "unit": "sec",
             "queries": {"q1": 0.1}}
    second = {"metric": "headline_total", "value": 2.0, "unit": "sec",
              "queries": {"q1": 0.9}}
    bench._emit(first)
    bench._emit(second)
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["artifact"] == "artifacts/bench_r12.json"
    assert lines[1]["artifact"] == "artifacts/bench_r12.2.json"
    a1 = json.load(open(tmp_path / "artifacts" / "bench_r12.json"))
    a2 = json.load(open(tmp_path / "artifacts" / "bench_r12.2.json"))
    assert a1["value"] == 1.0 and a2["value"] == 2.0  # both survive
    latest = json.load(open(tmp_path / "artifacts" / "bench_latest.json"))
    assert latest["value"] == 2.0  # convenience copy tracks the last run


def test_round_no_from_committed_bench_files(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert bench._round_no() == 1
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r11.json").write_text("{}")
    assert bench._round_no() == 12


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
