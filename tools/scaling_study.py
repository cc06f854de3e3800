#!/usr/bin/env python
"""Scaling study: headline queries across sf0.001 / sf0.01 / sf0.1.

Measures each bench headline query (median of 3, cache-cleared
between queries — bench.py's methodology) at three scale factors
spanning 100x in data volume, and prints a markdown table with the
10x-step time ratios. The point: a query whose plan is scan-bound or
partial-agg-bound should grow sublinearly at these sizes (fixed
scheduling/JIT floor dominates small SFs); anything growing FASTER
than data is a red flag to investigate before 1000x.

Usage: python tools/scaling_study.py [sf_dir ...]
"""

from __future__ import annotations

import gc
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402
from mapreducewordcount_spark.queries import all_queries  # noqa: E402
from mapreducewordcount_spark.session import get_spark  # noqa: E402

SFS = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1"]


def main() -> None:
    spark = get_spark("scaling-study")
    specs = all_queries()

    # warm the JVM once so sf0.001 doesn't absorb all codegen/JIT cost
    specs["q1_pricing_summary"].spark_fn(spark, SFS[0]).write \
        .mode("overwrite").format("noop").save()

    results: dict[str, list[float | None]] = {}
    for name in HEADLINE:
        results[name] = []
        for sf in SFS:
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
            try:
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            except Exception:  # noqa: BLE001
                pass
            gc.collect()
            try:
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    specs[name].spark_fn(spark, sf).write \
                        .mode("overwrite").format("noop").save()
                    runs.append(time.perf_counter() - t0)
                results[name].append(round(statistics.median(runs), 3))
            except Exception as exc:  # noqa: BLE001
                print(f"{name} @ {sf}: {exc}", file=sys.stderr)
                results[name].append(None)

    labels = [Path(sf).name for sf in SFS]
    print("| Query | " + " | ".join(labels)
          + " | x per 10x step |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name, times in results.items():
        ratios = []
        for a, b in zip(times, times[1:]):
            ratios.append(f"{b / a:.1f}x" if a and b else "-")
        cells = [f"{t:.3f}" if t is not None else "err" for t in times]
        print(f"| {name} | " + " | ".join(cells)
              + " | " + ", ".join(ratios) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
