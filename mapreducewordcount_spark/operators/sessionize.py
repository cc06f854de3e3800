"""Sessionization — gap-based event grouping (batch form).

Classic lag/cumsum composition (the streaming form uses
``session_window``; see ``streaming/``):

    lag(ts) over (user order by ts)
      → new_session = gap > threshold
      → session_id = running sum of new_session flags

Two window passes over one shuffle on ``user_id`` — no state store
needed in batch, deterministic given a total per-user ordering
(``ts`` plus an id tiebreak for equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: int = 30) -> DataFrame:
    """events + ``session_id`` (0-based per user, time-ordered)."""
    order = [F.col(ts_col), F.col(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    # cast via timestamp first: NTZ→double is not castable directly,
    # timestamp→double is; double keeps sub-second precision
    # (unix_timestamp truncates)
    as_sec = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    new_session = (
        prev.isNull()
        | ((as_sec(F.col(ts_col)) - as_sec(prev)) > gap_s)
    ).cast("long")
    return (events
            .withColumn("__new", new_session)
            .withColumn("session_id",
                        F.sum("__new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
            .drop("__new"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: session count + events per session."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    return (s.groupBy(user_col)
            .agg((F.max("session_id") + 1).alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))
