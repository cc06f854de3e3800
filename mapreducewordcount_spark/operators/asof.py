"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the *merge-on-union* composition of built-in ops
(SURVEY.md §2.5 preference order: composition > pandas UDF >
mapPartitions):

    union(left tagged, right tagged)
      → window partitionBy(key) orderBy(time, tag)
      → last(right payload, ignoreNulls) over rows-unbounded-preceding
      → keep left rows

One shuffle on the join key, no range-explosion cross join, no
per-group pandas: each partition is processed as a single ordered
stream, which is exactly the classic sorted-merge as-of algorithm —
and Spark's window execution gives it spill-to-disk for free. Skewed
keys are handled by AQE; at extreme skew pre-split hot keys with a
time-bucket secondary key.

Semantics: ``direction='backward'`` matches the latest right row with
``right_time <= left_time`` per key (DuckDB/pandas ``merge_asof``
default). Right-side ties on time resolve deterministically by a
content hash of the right payload — a stable but arbitrary winner;
pre-dedupe the right side when a semantic tie-break (e.g. max id
wins) is required, as ``events_asof_orders`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, left_on: str,
                       right_on: str, left_time: str, right_time: str,
                       right_cols: list[str] | None = None,
                       how: str = "inner") -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    its timestamp, matching ``left_on = right_on``.

    ``right_cols`` — right payload columns to carry (default: all
    non-key, non-time columns). ``how='left'`` keeps unmatched left
    rows with null payload; ``'inner'`` drops them.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_on, right_time)]

    l_tag = (left
             .withColumn("__t", F.col(left_time))
             .withColumn("__side", F.lit(1))
             .select("*"))
    r_tag = (right
             .withColumn("__t", F.col(right_time))
             .withColumn("__side", F.lit(0)))

    l_cols = [c for c in left.columns]
    merged = (
        l_tag.select(F.col(left_on).alias("__k"), "__t", "__side",
                     F.struct(*l_cols).alias("__l"),
                     F.lit(None).cast(
                         r_tag.select(F.struct(*right_cols).alias("s"))
                         .schema["s"].dataType.simpleString()).alias("__r"))
        .unionByName(
            r_tag.select(F.col(right_on).alias("__k"), "__t", "__side",
                         F.lit(None).cast(
                             l_tag.select(F.struct(*l_cols).alias("s"))
                             .schema["s"].dataType.simpleString()).alias("__l"),
                         F.struct(*right_cols).alias("__r"))))

    # right rows (__side=0) sort before left rows at equal time, so a
    # right row timestamped exactly at left_time IS eligible (<=).
    # hash(__r) is the deterministic tiebreak among right rows sharing
    # a timestamp: content-derived, so re-runs and retries pick the
    # same winner (callers wanting a semantic tiebreak pre-dedupe the
    # right side, as events_asof_orders does).
    w = (Window.partitionBy("__k").orderBy("__t", "__side", F.hash("__r"))
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (merged
               .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    return matched.select(*[F.col("__l")[c].alias(c) for c in l_cols],
                          *[F.col("__match")[c].alias(c) for c in right_cols])
