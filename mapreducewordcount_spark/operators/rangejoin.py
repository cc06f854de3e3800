"""Range (point-in-interval) join — an operator Spark lacks natively.

Naive formulations of ``point BETWEEN start AND end`` become
broadcast-nested-loop or cross joins — O(|points|×|intervals|) at
100 TB. The standard scalable composition (used by every
range-join-capable engine) is **bucketization**:

1. choose a bucket width ≥ the maximum interval length;
2. each point maps to one bucket: ``floor(point / width)``;
3. each interval spans at most TWO buckets (length ≤ width), so it
   is exploded to its covered buckets;
4. equi-join on (key, bucket) — a plain shuffle-hash join — then
   re-check the exact predicate on the (small) co-bucketed set.

Cost: one shuffle of each side on (key, bucket), interval rows at
most doubled. The exact predicate filters inside codegen. Intervals
longer than the width raise — widening silently would explode rows;
the caller picks a width from domain knowledge (e.g. max fulfillment
window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_key: str, interval_key: str,
                           point_col: str, start_col: str, end_col: str,
                           bucket_width: float,
                           how: str = "inner") -> DataFrame:
    """Join point rows to interval rows with
    ``key match AND start <= point < end`` via bucketed equi-join.

    All of ``point_col``/``start_col``/``end_col`` must be numeric in
    the same unit (cast timestamps with ``.cast('double')`` — epoch
    seconds). Intervals longer than ``bucket_width`` are rejected at
    runtime (they would need >2 buckets).

    ``how``: ``'inner'`` or ``'left'`` (point rows with no matching
    interval kept with null interval columns). Other join types raise
    — the exact predicate is applied as a post-join filter, so e.g. a
    naive ``'left'`` pass-through would silently drop the unmatched
    rows (null predicate) and degenerate to inner; ``'left'`` is
    instead built as inner ∪ (points ⟕anti matched).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} not supported: the exact range predicate is a "
            "post-join filter, which silently degenerates outer joins to "
            "inner; use 'inner' or 'left'")
    w = float(bucket_width)

    def bucket(col: Column) -> Column:
        return F.floor(col / F.lit(w)).cast("long")

    p = points.withColumn("__bp", bucket(F.col(point_col)))
    if how == "left":
        # row identity for the unmatched re-attach; ids must not shift
        # between the inner and anti branches, so pin the frame
        p = (p.withColumn("__pid", F.monotonically_increasing_id())
             .localCheckpoint(eager=True))
    too_long = F.col(end_col) - F.col(start_col) > w
    # the length guard lives INSIDE the exploded expression — a
    # separate validation column would be pruned away unevaluated
    covered = F.when(too_long, F.raise_error(F.concat(
        F.lit("interval longer than bucket_width at key="),
        F.col(interval_key).cast("string")))) \
        .otherwise(F.array_distinct(F.array(bucket(F.col(start_col)),
                                            bucket(F.col(end_col)))))
    iv = intervals.withColumn("__bi", F.explode(covered))
    matched = (p.join(iv, (F.col(point_key) == F.col(interval_key))
                      & (F.col("__bp") == F.col("__bi")), "inner")
               .filter((F.col(point_col) >= F.col(start_col))
                       & (F.col(point_col) < F.col(end_col))))
    if how == "inner":
        return matched.drop("__bp", "__bi")
    unmatched = p.join(matched.select("__pid"), "__pid", "left_anti")
    for c in iv.columns:
        if c != "__bi":
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(iv.dtypes)[c]))
    return matched.unionByName(unmatched.withColumn("__bi", F.lit(None)
                                                    .cast("long"))) \
        .drop("__bp", "__bi", "__pid")
