#!/usr/bin/env python
"""Split each headline query's wall time into plan-CONSTRUCTION time
(the ``spark_fn`` call — driver-side Python/py4j, any bounded model
fits) and EXECUTION time (the noop save) — the instrument behind the
round-13 py4j findings (ivf_build F.lit loops, minhash lambda
Columns): a query whose construction share dominates is driver-bound
and no cluster will make it faster.

Usage: python tools/construct_profile.py [query ...]
Prints one line per query: construct_s, exec_s (each min-of-2, warm).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from bench import HEADLINE
    from mapreducewordcount_spark.queries import all_queries
    from mapreducewordcount_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("construct-profile")
    specs = all_queries()
    names = sys.argv[1:] or list(HEADLINE)

    # JVM warmup
    specs["q1_pricing_summary"].spark_fn(spark, sf_dir).write \
        .mode("overwrite").format("noop").save()

    print(f"{'query':34s} {'construct_s':>11s} {'exec_s':>8s} {'c_share':>8s}")
    rows = []
    for name in names:
        cs, es = [], []
        try:
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = specs[name].spark_fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                t2 = time.perf_counter()
                cs.append(t1 - t0)
                es.append(t2 - t1)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:34s} FAILED {type(exc).__name__}: {exc}"[:200])
            continue
        c, e = min(cs), min(es)
        rows.append((name, c, e))
        print(f"{name:34s} {c:11.3f} {e:8.3f} {c / (c + e):8.1%}")
    tot_c = sum(r[1] for r in rows)
    tot_e = sum(r[2] for r in rows)
    print(f"{'TOTAL':34s} {tot_c:11.3f} {tot_e:8.3f} "
          f"{tot_c / (tot_c + tot_e):8.1%}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
