"""MERGE / upsert emulation without a lakehouse format.

Parquet alone has no MERGE INTO; the composition below implements the
same semantics with two built-in ops (the classic CDC recipe —
anti-join out the rows being replaced, union the new versions):

    merged = target ⟕anti updates  ∪  updates

For SCD2-style history, ``scd2_apply`` instead closes the current
version (sets ``valid_to``) and appends the new one — pure column
ops, no per-row logic.

Scale: the anti-join shuffles on the key (or broadcasts small update
batches — the common CDC case, pinned here with ``F.broadcast`` when
the updates side is small); rewriting only affected partitions is the
job of a table format (Delta/Iceberg, gated in sources/io.py) — this
operator is the engine-level semantics those formats optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: below this row-count estimate the updates side gets a broadcast hint
_SMALL_UPDATES = 1_000_000


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str | list[str]) -> DataFrame:
    """Last-writer-wins merge: rows from ``updates`` replace same-key
    rows in ``target``; unmatched update rows are inserts."""
    keys = [key] if isinstance(key, str) else list(key)
    anti_side = updates.select(*keys).distinct()
    kept = target.join(F.broadcast(anti_side), on=keys, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(history: DataFrame, updates: DataFrame, key: str,
               ts_col: str, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension type 2: close current versions touched
    by ``updates`` (their ``valid_to`` becomes the update timestamp)
    and append the updates as new open versions (``valid_to`` null).

    ``history`` schema: payload + key + valid_from + valid_to (null =
    current). ``updates`` schema: payload + key + ts_col.
    """
    upd_times = (updates.groupBy(key)
                 .agg(F.min(ts_col).alias("__new_from")))
    closed = (history.join(F.broadcast(upd_times), on=key, how="left")
              .withColumn(
                  valid_to,
                  F.when(F.col(valid_to).isNull()
                         & F.col("__new_from").isNotNull(),
                         F.col("__new_from"))
                  .otherwise(F.col(valid_to)))
              .drop("__new_from"))
    opened = (updates
              .withColumn(valid_from, F.col(ts_col))
              .withColumn(valid_to, F.lit(None).cast(
                  dict(history.dtypes)[valid_to]))
              .drop(ts_col))
    return closed.unionByName(opened)
