"""CDC merge / upsert without a table format: apply a change batch
(upserts + deletes, latest-wins per key) to a snapshot.

The SQL MERGE statement — and the Delta/Iceberg/Hudi merge-on-write
path — reduces to exactly this relational shape when expressed over
plain DataFrames:

  1. collapse the change batch to its LATEST row per key
     (row_number over (key) ordered by version desc — the batch is
     the small side; this is its only shuffle);
  2. pass through every target row whose key is untouched
     (LEFT ANTI join against the distinct changed keys — AQE
     broadcasts the key set whenever the batch is small, so the
     100 TB target never shuffles and never rewrites untouched
     partitions, the same asymmetry table formats get from file
     pruning);
  3. append the surviving upserts (latest change per key that is not
     a delete), projected to the target schema.

Semantics pinned by tests: latest version wins among conflicting
updates to one key; a delete at the latest version removes the key
even if earlier versions updated it; inserts (keys absent from the
target) flow through step 3 unchanged.

Reference parity note: the reference engine (/root/reference/src/)
has no mutation path at all — outputs are write-once word-count
files (worker.py). This is SURVEY.md §2.4/§2.5 extension surface:
the data-management primitive a training-corpus store needs for
snapshot refresh (re-crawled documents, takedown deletes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(updates: DataFrame, keys: Sequence[str],
                   version_col: str = "_version") -> DataFrame:
    """Collapse a change batch to its single latest row per key.

    ``version_col`` must totally order the changes WITHIN each key
    (a commit timestamp, log offset, or batch sequence number) —
    with ties the winner would be nondeterministic, so callers give
    every change to one key a distinct version.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (updates
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str], version_col: str = "_version",
                 op_col: str = "_op",
                 delete_op: str = "D") -> DataFrame:
    """Apply ``updates`` to ``target`` with MERGE semantics and
    return the new snapshot (same schema as ``target``).

    ``updates`` carries the target columns plus ``version_col`` and
    ``op_col`` (any value except ``delete_op`` means upsert). The
    target side stays shuffle-free: its only operation is a LEFT ANTI
    probe against the distinct changed keys.
    """
    latest = latest_changes(updates, keys, version_col)
    changed_keys = latest.select(*keys)
    keep = target.join(changed_keys, list(keys), "left_anti")
    upserts = (latest
               .filter(F.col(op_col) != delete_op)
               .select(*target.columns))
    return keep.unionByName(upserts)
