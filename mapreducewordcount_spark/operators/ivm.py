"""Incremental view maintenance: refresh an aggregate from a CDC
batch without recomputing the base table.

At 100 TB the nightly "recompute revenue-by-status" job reads the
whole fact table to absorb a day's worth of changes — a million-fold
write amplification. The IVM identity for distributive aggregates
(count, sum — and avg as sum/count):

    new_agg = old_agg  (+) delta(changes)

where the delta touches ONLY the changed keys: each update
contributes ``new_value - old_value``, each delete ``-old_value``,
each insert ``+new_value``. The old values come from the snapshot
restricted to the changed keys — a broadcast semi-join (the change
batch is small by assumption), so the refresh cost is
O(|changes| + |groups|), not O(|base|); with the snapshot
partitioned/z-ordered on the key, that probe also prunes at the
file level.

The operator mirrors published IVM semantics (delta rules for
SPJ+aggregation views); groups whose count reaches zero are dropped
from the refreshed view, groups never touched pass through
unchanged (and at scale never leave their storage). The correctness
contract — refreshed view == full recompute over the merged state —
is exactly what the gate oracle checks (the oracle recomputes from
scratch; the engine must arrive at the same table the cheap way).

Changes use ``operators/merge.py``'s CDC contract: latest-wins
``(_version, _op)`` rows with op 'U' (upsert) / 'D' (delete).
Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def incremental_agg_refresh(snapshot: DataFrame, changes: DataFrame,
                            keys: Sequence[str], group_col: str,
                            value_col: str, *,
                            version_col: str = "_version",
                            op_col: str = "_op") -> DataFrame:
    """Refresh ``group_col -> (n_rows, total)`` over the merged state
    of ``snapshot`` + ``changes`` WITHOUT rescanning the snapshot.

    Returns ``(group, n_rows BIGINT, total)`` for every group
    non-empty after the merge. The snapshot is only read through a
    changed-key semi-join (bounded by the change batch) plus the
    one-time base aggregate the caller is maintaining anyway —
    recomputed here for self-containment, reused from storage in a
    real deployment.

    Exactness contract: the delta path sums in a DIFFERENT order
    than a full recompute, so for bit-stable results pass an
    integer-scaled ``value_col`` (money in cents) — integer addition
    is associative, floats are not. The operator is type-agnostic.
    """
    klist = list(keys)

    # the view being maintained (in production this is the stored
    # materialized view, not a recompute)
    base = snapshot.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias("total"))

    # latest change per key wins (CDC contract)
    w = Window.partitionBy(*klist).orderBy(F.col(version_col).desc())
    latest = (changes.withColumn("__rn", F.row_number().over(w))
                     .filter(F.col("__rn") == 1).drop("__rn"))

    # pre-images: ONLY the changed keys' old rows leave the snapshot
    change_keys = latest.select(*klist).distinct()
    old = snapshot.join(F.broadcast(change_keys), klist, "left_semi")

    minus = old.select(F.col(group_col).alias("grp"),
                       F.lit(-1).alias("dn"),
                       (-F.col(value_col)).alias("dv"))
    plus = (latest.filter(F.col(op_col) == "U")
                  .select(F.col(group_col).alias("grp"),
                          F.lit(1).alias("dn"),
                          F.col(value_col).alias("dv")))
    delta = (minus.unionByName(plus)
                  .groupBy("grp")
                  .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv")))

    merged = (base.join(delta, "grp", "full_outer")
              .select("grp",
                      (F.coalesce("n_rows", F.lit(0))
                       + F.coalesce("dn", F.lit(0))).alias("n_rows"),
                      (F.coalesce("total", F.lit(0))
                       + F.coalesce("dv", F.lit(0))).alias("total")))
    return (merged.filter(F.col("n_rows") > 0)
                  .select(F.col("grp").alias(group_col),
                          F.col("n_rows").cast("long").alias("n_rows"),
                          "total"))


def incremental_minmax_refresh(snapshot: DataFrame, changes: DataFrame,
                               keys: Sequence[str], group_col: str,
                               value_col: str, *,
                               version_col: str = "_version",
                               op_col: str = "_op") -> DataFrame:
    """Refresh ``group_col -> (n_rows, min_v, max_v)`` from a CDC
    batch. MIN/MAX are NOT fully incrementally maintainable the way
    SUM/COUNT are: an insert can only tighten an extremum
    (``least``/``greatest`` against the stored value — pure delta),
    but deleting the extremum row invalidates it, and no O(delta)
    state can say what the runner-up was. The published delta-rule
    treatment splits the groups:

    - **cheap groups** — no removed row's value equals the stored
      extremum (conservative: a duplicated extremum value also
      triggers the expensive path, since multiplicity is unknown):
      ``min' = least(min, min(inserted))``, count as in the SUM
      rules. No base-table access beyond the changed-key pre-images.
    - **touched groups** — a removed value ties the stored min or
      max: recompute exactly, but ONLY over those groups' rows
      (a group semi-join the storage layout prunes at file level
      when the snapshot is partitioned/clustered on the group), so
      the cost is O(changes + rows-of-touched-groups), never
      O(base).

    Values are compared, never summed, so doubles are engine-exact
    here (unlike the SUM path's integer-cents contract). Groups
    emptied by the merge drop out; new groups appear via the insert
    side. Returns ``(group, n_rows BIGINT, min_v, max_v)``.
    """
    klist = list(keys)

    # the stored view being maintained (recomputed here for
    # self-containment, read from storage in a real deployment)
    base = snapshot.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"))

    w = Window.partitionBy(*klist).orderBy(F.col(version_col).desc())
    latest = (changes.withColumn("__rn", F.row_number().over(w))
                     .filter(F.col("__rn") == 1).drop("__rn"))
    change_keys = latest.select(*klist).distinct()

    # pre-images (removed rows): only the changed keys leave the base
    old = snapshot.join(F.broadcast(change_keys), klist, "left_semi")
    rem = old.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("rn"),
        F.min(value_col).alias("rmin"),
        F.max(value_col).alias("rmax"))

    ins_rows = latest.filter(F.col(op_col) == "U")
    ins = ins_rows.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("inn"),
        F.min(value_col).alias("imin"),
        F.max(value_col).alias("imax"))

    st = (base.join(rem, "grp", "left")
              .join(ins, "grp", "full_outer"))
    # entire-group removal always ties the extremum, so rn==n_rows
    # implies touched — emptied groups exit via the expensive path
    touched = F.coalesce((F.col("rmin") == F.col("min_v"))
                         | (F.col("rmax") == F.col("max_v")),
                         F.lit(False))

    cheap = (st.filter(~touched)
             .select("grp",
                     (F.coalesce("n_rows", F.lit(0))
                      - F.coalesce("rn", F.lit(0))
                      + F.coalesce("inn", F.lit(0))).alias("n_rows"),
                     F.least("min_v", "imin").alias("min_v"),
                     F.greatest("max_v", "imax").alias("max_v")))

    # touched groups: exact recompute restricted to those groups —
    # group semi-join FIRST (prunable), then the changed-key anti
    aff = st.filter(touched).select(F.col("grp").alias(group_col))
    survivors = (snapshot
                 .join(F.broadcast(aff), [group_col], "left_semi")
                 .join(F.broadcast(change_keys), klist, "left_anti")
                 .select(group_col, value_col))
    inserted = (ins_rows
                .join(F.broadcast(aff), [group_col], "left_semi")
                .select(group_col, value_col))
    recomputed = (survivors.unionByName(inserted)
                  .groupBy(F.col(group_col).alias("grp"))
                  .agg(F.count(F.lit(1)).alias("n_rows"),
                       F.min(value_col).alias("min_v"),
                       F.max(value_col).alias("max_v")))

    return (cheap.unionByName(recomputed)
            .filter(F.col("n_rows") > 0)
            .select(F.col("grp").alias(group_col),
                    F.col("n_rows").cast("long").alias("n_rows"),
                    "min_v", "max_v"))
