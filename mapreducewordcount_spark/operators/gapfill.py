"""Time-series gap-fill: resample events to a fixed grid, emitting
explicit zero rows for empty buckets.

The hypertable-rollup companion every time-series engine ships
(TimescaleDB ``time_bucket_gapfill``, InfluxDB ``fill()``): downstream
consumers (dashboards, anomaly detectors, forecasting featurizers)
need a dense grid — a silent hole is indistinguishable from missing
data unless the engine materializes it as an explicit zero row.

Scale shape — the grid is generated from the AGGREGATE, never the raw
rows: one shuffle aggregates events to (key, bucket) partial-combined
counts; the per-key [min, max] bucket span is a second agg over that
already-small frame; ``sequence``/``explode`` expands the span to the
dense grid driver-free; the final left join runs against the compact
aggregate (broadcast-able when the key × bucket space is small, plain
hash join on (key, bucket) otherwise — never against raw events).
Grid cardinality is bounded by key_count × span/bucket regardless of
input row count, so a 100 TB events table costs one aggregation
shuffle plus work proportional to the OUTPUT grid.

Reference parity: no time-series surface in the 549-LoC reference;
SURVEY.md §2.5 extension scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill_series(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type",
                   value_col: str = "value",
                   bucket: str = "15 minutes") -> DataFrame:
    """events → dense (key, bucket) grid with zero-filled gaps.

    Output: (key, bucket_start string, n, sum_value, gap_filled) —
    one row per bucket in [min, max] of each key's observed span, with
    ``n = 0`` / ``sum_value = 0.0`` / ``gap_filled = 1`` where the key
    had no events. Buckets are ``F.window`` epoch-aligned tumbling
    windows, rendered as strings under the session's pinned-UTC clock
    (same contract as ``events_hourly``).
    """
    agg = (events
           .groupBy(F.window(ts_col, bucket).alias("w"), key_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum(value_col), 2).alias("sum_value"))
           .select(key_col, F.col("w.start").alias("bucket"),
                   "n", "sum_value"))
    span = agg.groupBy(key_col).agg(F.min("bucket").alias("lo"),
                                    F.max("bucket").alias("hi"))
    grid = span.select(
        key_col,
        F.explode(F.sequence("lo", "hi",
                             F.expr(f"INTERVAL {bucket}"))).alias("bucket"))
    return (grid
            .join(agg, [key_col, "bucket"], "left")
            .select(F.col(key_col),
                    F.date_format("bucket",
                                  "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
                    F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
                    F.round(F.coalesce(F.col("sum_value"), F.lit(0.0)),
                            2).alias("sum_value"),
                    F.col("n").isNull().cast("int").alias("gap_filled")))
