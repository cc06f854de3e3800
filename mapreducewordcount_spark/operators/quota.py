"""Per-group quota cap (domain cap) for corpus curation.

Web-scale training corpora cap how many documents any single domain
may contribute (Gopher/FineWeb-style "per-domain cap"): without it,
the biggest domains dominate the mixture no matter how good the
quality filter is. The cap keeps the BEST k per group, not a random
k — ordering by a caller-supplied ranking (quality score descending,
id ascending as the deterministic tie-break).

This is rank-based (exact top-k per group), complementing
``functions/sampling.py``'s rate-based stratified hash sample: a
quota holds group contributions CONSTANT, a rate holds them
PROPORTIONAL.

Plan: one window partitioned by the group — a single hash exchange
on the group key, no global sort. Group skew (one domain with 10^9
docs) is bounded by the window being rank-only: Spark's WindowExec
streams each partition's sorted run and the filter drops rows past
k immediately; nothing per-group is materialized beyond the sort
spill, which is the unavoidable cost of exact per-group top-k. For
rank-free approximate caps at extreme skew, compose the hash sample
instead. Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_quota_cap(df: DataFrame, group_cols: Sequence[str],
                    order_by: Sequence[Column], k: int) -> DataFrame:
    """Keep the top-``k`` rows of every group under ``order_by``.

    ``order_by`` must be a deterministic total order within each
    group (include a unique-id tie-break) — otherwise the kept set is
    engine-dependent. Returns ``df``'s columns plus ``quota_rank``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn("quota_rank", F.row_number().over(w))
              .filter(F.col("quota_rank") <= k))


def quota_cap_report(df: DataFrame, group_cols: Sequence[str],
                     order_by: Sequence[Column], k: int,
                     score: Column) -> DataFrame:
    """Per-group cap summary: group size, kept/dropped counts, and
    the cutoff (minimum kept) ``score``."""
    kept = group_quota_cap(df, group_cols, order_by, k)
    sizes = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"))
    kept_stats = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min(score).alias("cutoff_score"))
    return (sizes.join(kept_stats, list(group_cols))
            .select(*group_cols, "n_docs", "n_kept",
                    (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
                    "cutoff_score"))
