"""Ordered funnel analysis over an event stream.

"How many users did step1, then step2 strictly after it, then step3
strictly after that" — the classic product-analytics query, and the
same shape data pipelines use for multi-stage processing audits
(fetched -> parsed -> kept). Strict ordering matters: a purchase
BEFORE the first view must not count as conversion.

Plan: one earliest-qualifying-timestamp aggregate per step, each
seeded by the previous step's per-user frontier. All aggregates and
joins share the user key, so after the first exchange AQE reuses the
partitioning; per-step frames only ever shrink (funnel monotonicity).
The final report collapses to one row per step — counts and ppm
conversion are integers, so the result is deterministic and
hash-oracleable. Timestamps are only COMPARED, never emitted: the
events scan may surface ts as nanos-long or timestamp depending on
reader flags, and ordering is invariant to that choice.

Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps: Sequence[str], *,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Per-step funnel: users whose first qualifying ``steps[i]``
    event happens strictly after their step ``i-1`` frontier.

    Returns ``(step INT, event_type, n_users BIGINT, conversion_ppm
    BIGINT)`` — ppm relative to step 1's cohort.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("t"),
                       F.col(ts_col).alias("ts"))

    frontier = (ev.filter(F.col("t") == steps[0])
                  .groupBy("u").agg(F.min("ts").alias("ft")))
    cohorts = [frontier]
    for step in steps[1:]:
        prev = cohorts[-1].select("u", "ft")
        nxt = (ev.filter(F.col("t") == step)
                 .join(prev, "u")
                 .filter(F.col("ts") > F.col("ft"))
                 .groupBy("u").agg(F.min("ts").alias("ft")))
        cohorts.append(nxt)

    # per-step counts: one 1-row aggregate each, unioned into the
    # report (step count is a handful; these are metadata-sized).
    parts = []
    for i, (step, cohort) in enumerate(zip(steps, cohorts), start=1):
        parts.append(cohort.agg(F.count(F.lit(1)).alias("n_users"))
                     .select(F.lit(i).alias("step"),
                             F.lit(step).alias("event_type"), "n_users"))
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)

    base = (cohorts[0].agg(F.count(F.lit(1)).alias("base_users")))
    return (report.join(F.broadcast(base))
            .select("step", "event_type", "n_users",
                    F.expr("n_users * 1000000 div base_users")
                     .alias("conversion_ppm")))
