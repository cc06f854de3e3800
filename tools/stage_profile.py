#!/usr/bin/env python
"""Per-stage profile of named registry queries (VERDICT r12 next#1b).

Runs each query warm (median-of-N wall clocks) in a session with the
Spark event log enabled, then parses the log's TaskEnd/StageCompleted
events into a per-stage table: wall span, summed executor run/CPU/GC
time, shuffle bytes, input bytes, and the stage's callsite name. The
run/CPU split plus the callsite is what attributes a wall-clock delta
to a STAGE (e.g. the Arrow argmax assign vs the banded self-join)
instead of to the query as a whole — the events_gapfill/
doc_length_deciles precedent, now mechanical.

A membw_gbps + cpu_score fingerprint (the bench.py probes) brackets
the run so the profile records the machine state it was taken under —
stage attribution without that context is exactly the mistake the
fingerprint rule exists to prevent.

Usage:
  python tools/stage_profile.py QUERY [QUERY ...] [--sf DIR] [--reps N]

Output: one JSON line per query with the fingerprints, wall medians,
and the top stages by executor run time.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _fingerprint() -> dict:
    import bench

    fp = bench._env_fingerprint()
    return {"cpu_score_ms": fp.get("cpu_score_ms"),
            "membw_gbps": fp.get("membw_gbps")}


def _parse_event_log(log_dir: str) -> dict[int, dict]:
    """Aggregate every app log in ``log_dir``: stage_id → metrics."""
    stages: dict[int, dict] = defaultdict(lambda: {
        "name": None, "wall_ms": 0, "run_ms": 0, "cpu_ms": 0,
        "gc_ms": 0, "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
        "input_mb": 0.0, "tasks": 0})
    for log in Path(log_dir).glob("*"):
        if log.is_dir():
            continue
        with open(log, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerStageCompleted":
                    info = ev["Stage Info"]
                    s = stages[info["Stage ID"]]
                    s["name"] = info.get("Stage Name")
                    sub = info.get("Submission Time")
                    comp = info.get("Completion Time")
                    if sub and comp:
                        s["wall_ms"] += comp - sub
                elif kind == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    s = stages[ev["Stage ID"]]
                    s["tasks"] += 1
                    s["run_ms"] += m.get("Executor Run Time", 0)
                    s["cpu_ms"] += (m.get("Executor CPU Time", 0)
                                    // 1_000_000)
                    s["gc_ms"] += m.get("JVM GC Time", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    s["shuffle_read_mb"] += (
                        srm.get("Remote Bytes Read", 0)
                        + srm.get("Local Bytes Read", 0)) / 1e6
                    swm = m.get("Shuffle Write Metrics") or {}
                    s["shuffle_write_mb"] += \
                        swm.get("Shuffle Bytes Written", 0) / 1e6
                    im = m.get("Input Metrics") or {}
                    s["input_mb"] += im.get("Bytes Read", 0) / 1e6
    return dict(stages)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        raise SystemExit(__doc__)

    fp_start = _fingerprint()

    from pyspark.sql import SparkSession

    from mapreducewordcount_spark.queries import all_queries

    specs = all_queries()
    for n in names:
        if n not in specs:
            raise SystemExit(f"unknown query: {n}")

    for name in names:
        log_dir = tempfile.mkdtemp(prefix=f"stgprof_{name}_")
        spark = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file:{log_dir}")
            # single PLAIN file — Spark 4 defaults to a rolled
            # zstd-compressed directory this parser can't read
            .config("spark.eventLog.rolling.enabled", "false")
            .config("spark.eventLog.compress", "false")
            .appName(f"stage-profile-{name}").getOrCreate())
        # warm the JVM on one throwaway evaluation, then measure —
        # the bench convention (first run absorbs codegen/JIT)
        walls: list[float] = []
        for rep in range(reps + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            specs[name].spark_fn(spark, sf).write \
                .mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if rep:  # rep 0 is the warmup
                walls.append(dt)
        spark.stop()
        time.sleep(1.0)  # let the event log flush
        stages = _parse_event_log(log_dir)
        top = sorted(stages.items(), key=lambda kv: -kv[1]["run_ms"])
        fp_end = _fingerprint()
        print(json.dumps({
            "query": name, "sf": sf, "reps": reps,
            "wall_median_s": round(statistics.median(walls), 3),
            "wall_all_s": [round(w, 3) for w in walls],
            "fp_start": fp_start, "fp_end": fp_end,
            "note": ("stage metrics aggregate ALL reps + warmup; "
                     "read run_ms SHARES, not absolutes"),
            "stages": [{
                "id": sid,
                "name": (s["name"] or "")[:80],
                "run_ms": s["run_ms"], "cpu_ms": s["cpu_ms"],
                "gc_ms": s["gc_ms"], "tasks": s["tasks"],
                "shuffle_read_mb": round(s["shuffle_read_mb"], 1),
                "shuffle_write_mb": round(s["shuffle_write_mb"], 1),
                "input_mb": round(s["input_mb"], 1),
            } for sid, s in top[:12]],
        }))


if __name__ == "__main__":
    main()
