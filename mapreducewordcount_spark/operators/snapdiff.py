"""Snapshot diff: classify every key across two table states.

The audit companion to ``operators/merge.py`` (which PRODUCES a new
state) and ``operators/scd2.py`` (which keeps history): given two
snapshots of the same keyed table, emit one row per key that
differs — ``added`` / ``removed`` / ``changed`` — plus the old and
new values of the compared columns. Pipelines run this to validate
a CDC feed against a trusted rebuild, to review what a backfill is
about to do, and to quantify drift between dataset versions.

Plan shape: one full-outer join on the key — the same single
shuffle any diff must pay — with change detection as a null-safe
column comparison (``<=>`` semantics via ``eqNullSafe``), so rows
equal in all compared columns are filtered before anything leaves
the join stage. With both snapshots bucketed or clustered on the
key the join co-locates and the diff is shuffle-free. Output is
proportional to the CHANGES, not the table.

Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare: Sequence[str]) -> DataFrame:
    """Per-key difference of ``old`` vs ``new``.

    Returns ``(*keys, change, old_<c>..., new_<c>...)`` where
    ``change`` is 'added' (key only in new), 'removed' (only in
    old), or 'changed' (present in both, differing in at least one
    ``compare`` column; null-safe). Unchanged keys emit nothing.
    """
    if not compare:
        raise ValueError("compare must name at least one column")
    klist = list(keys)
    o = old.select(*klist, *[F.col(c).alias(f"old_{c}") for c in compare],
                   F.lit(1).alias("__in_old"))
    n = new.select(*klist, *[F.col(c).alias(f"new_{c}") for c in compare],
                   F.lit(1).alias("__in_new"))
    j = o.join(n, klist, "full_outer")

    same = reduce(lambda a, b: a & b,
                  [F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
                   for c in compare])
    change = (F.when(F.col("__in_old").isNull(), F.lit("added"))
               .when(F.col("__in_new").isNull(), F.lit("removed"))
               .otherwise(F.lit("changed")))
    return (j.filter(F.col("__in_old").isNull()
                     | F.col("__in_new").isNull() | ~same)
             .select(*klist, change.alias("change"),
                     *[f"old_{c}" for c in compare],
                     *[f"new_{c}" for c in compare]))
