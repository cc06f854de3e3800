#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline queries to text files.

Usage: python tools/dump_plans.py <outdir> [suffix] [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` (suffix defaults to
``before``) for every named query, or every HEADLINE query when none
are named. Plan capture only — nothing is executed, so this is safe
to run in a contended window. The optimization-round deliverable
(``plans/r13/*_{before,after}.txt``) is produced with this tool so
the judge can diff plan claims against committed text.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from bench import HEADLINE
    from mapreducewordcount_spark.queries import all_queries
    from mapreducewordcount_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    specs = all_queries()
    if not names:
        names = list(HEADLINE)
    rc = 0
    for name in names:
        try:
            df = specs[name].spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
            print(f"{name}: ok")
        except Exception as exc:  # noqa: BLE001
            rc = 1
            print(f"{name}: FAILED {type(exc).__name__}: {exc}"[:300])
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
