"""MERGE / upsert emulation without a lakehouse format.

Parquet alone has no MERGE INTO; the composition below implements the
same semantics with two built-in ops (the classic CDC recipe —
anti-join out the rows being replaced, union the new versions):

    merged = target ⟕anti updates  ∪  updates

For SCD2-style history, ``scd2_apply`` instead closes superseded
versions (sets ``valid_to``) and appends the new ones — pure column
ops, no per-row logic.

Scale: the anti-join shuffles on the key; when the update batch is
small (the common CDC case) AQE converts it to a broadcast join at
runtime from actual sizes — no unconditional broadcast hint here,
because a forced broadcast of a large backfill batch would OOM the
driver where a shuffled anti-join just works. Rewriting only affected
partitions is the job of a table format (Delta/Iceberg, gated in
sources/io.py) — this operator is the engine-level semantics those
formats optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str | list[str],
                 version_col: str | None = None) -> DataFrame:
    """Last-writer-wins merge: rows from ``updates`` replace same-key
    rows in ``target``; unmatched update rows are inserts.

    When the update batch can carry several rows for one key, pass
    ``version_col`` (a timestamp/sequence column): only the latest row
    per key survives (ties break arbitrarily-but-deterministically on
    the version value ordering). Without it the batch is unioned
    as-is, so callers must supply one row per key — otherwise every
    batch row survives and the merged output holds duplicate keys.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
        updates = (updates.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1).drop("__rn"))
    anti_side = updates.select(*keys).distinct()
    kept = target.join(anti_side, on=keys, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(history: DataFrame, updates: DataFrame, key: str,
               ts_col: str, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension type 2, multi-update-safe.

    Within an update batch a key may change several times; each
    version's ``valid_to`` must be the NEXT change's timestamp so
    exactly one version per key stays open. Concretely:

    - current history rows touched by the batch close at the key's
      *earliest* update timestamp;
    - each update row closes at the key's *next* update timestamp
      (``lead`` over the per-key time order), the last one staying
      open (``valid_to`` null).

    ``history`` schema: payload + key + valid_from + valid_to (null =
    current). ``updates`` schema: payload + key + ts_col.
    """
    upd_times = (updates.groupBy(key)
                 .agg(F.min(ts_col).alias("__new_from")))
    closed = (history.join(upd_times, on=key, how="left")
              .withColumn(
                  valid_to,
                  F.when(F.col(valid_to).isNull()
                         & F.col("__new_from").isNotNull(),
                         F.col("__new_from"))
                  .otherwise(F.col(valid_to)))
              .drop("__new_from"))
    w = Window.partitionBy(key).orderBy(ts_col)
    opened = (updates
              .withColumn(valid_from, F.col(ts_col))
              .withColumn(valid_to, F.lead(ts_col).over(w).cast(
                  dict(history.dtypes)[valid_to]))
              .drop(ts_col))
    return closed.unionByName(opened)
