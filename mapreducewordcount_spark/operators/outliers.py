"""Robust per-group outlier detection (median / MAD), integer-exact.

The data-cleaning pass a corpus pipeline runs before training: flag
rows whose value sits more than ``k`` median-absolute-deviations from
their group's median (the robust analog of a z-score — mean/stddev
move with the outliers they're meant to catch; median/MAD don't,
breakdown point 50%).

Everything is kept integer so the flag is bit-stable cross-engine:
values enter as BIGINTs (cents, bytes, token counts), the median is
carried as ``med4 = 4·median`` (the median of ints is an int or a
half-int — ×4 is exact in both engines' doubles, then cast), the MAD
as ``mad8 = 2·median(dev4)`` where ``dev4 = |4·value − med4|``, and
the flag is the pure-integer compare

    2 · dev4 · k_denom  >  k_num · mad8        (⇔ dev > k · MAD)

so no float ever crosses an engine boundary.

Plan shape: two grouped aggregates over the value column (median,
then MAD of deviations) with the per-group stats frames — O(groups)
rows — broadcast back. ``percentile`` here is Spark's EXACT
percentile, which buffers each group's values in executor memory:
right for oracle-exact gate checks and for any group that fits
(millions of longs), but at 100 TB-scale group sizes swap in
``approx_percentile`` at a documented accuracy cost — approximate
medians move the THRESHOLD, not the semantics (note: GK sketches are
merge-order-sensitive, so the approx form trades the bit-stability
this module otherwise guarantees; see queries/analytics3.py's
sketch_stats proof).

Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def robust_group_stats(df: DataFrame, group_col: str,
                       value: Column | str) -> DataFrame:
    """Per-group ``(grp, n_rows, med4, mad8)`` of an integer value.

    ``value`` must be integer-typed (cast upstream); ``med4`` is
    4·median, ``mad8`` is 8·MAD — both BIGINT-exact.
    """
    v = F.col(value) if isinstance(value, str) else value
    x = df.select(F.col(group_col).alias("grp"), v.alias("c"))
    med = x.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.percentile("c", F.lit(0.5)) * 4).cast("long").alias("med4"))
    dev = (x.join(F.broadcast(med), "grp")
            .withColumn("dev4", F.abs(F.col("c") * 4 - F.col("med4"))))
    return (dev.groupBy("grp", "n_rows", "med4")
               .agg((F.percentile("dev4", F.lit(0.5)) * 2)
                    .cast("long").alias("mad8")))


def robust_outlier_flags(df: DataFrame, group_col: str,
                         value: Column | str, *,
                         k_num: int = 3, k_denom: int = 1) -> DataFrame:
    """``df`` plus ``(dev4, mad8, is_outlier)`` — every input row,
    flagged when ``|value − median| > (k_num/k_denom) · MAD`` within
    its group. Pure integer compare; rows in size-1 groups (MAD 0,
    dev 0) are never outliers."""
    v = F.col(value) if isinstance(value, str) else value
    stats = robust_group_stats(df, group_col, v).select(
        F.col("grp").alias(group_col), "med4", "mad8")
    return (df.join(F.broadcast(stats), [group_col])
            .withColumn("dev4", F.abs(v * 4 - F.col("med4")))
            .withColumn("is_outlier",
                        (F.col("dev4") * 2 * k_denom
                         > F.lit(k_num) * F.col("mad8")).cast("int")))


def robust_outlier_report(df: DataFrame, group_col: str,
                          value: Column | str, *,
                          k_num: int = 3, k_denom: int = 1) -> DataFrame:
    """Per-group cleaning summary: ``(grp, n_rows, med4, mad8,
    n_outliers, max_dev4)`` — never empty, O(groups) output, the
    shape a pipeline persists per corpus drop."""
    flagged = robust_outlier_flags(df, group_col, value,
                                   k_num=k_num, k_denom=k_denom)
    return (flagged.groupBy(F.col(group_col).alias("grp"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.first("med4").alias("med4"),
                 F.first("mad8").alias("mad8"),
                 F.sum("is_outlier").cast("long").alias("n_outliers"),
                 F.max("dev4").alias("max_dev4")))
