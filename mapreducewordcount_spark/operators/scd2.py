"""SCD2 history builder: change log -> validity intervals.

``operators/merge.py`` answers "what does the table look like NOW"
(one row per key, latest wins). The warehouse-standard complement is
slowly-changing-dimension type 2: keep EVERY version as a row with a
validity interval, so any past state can be reconstructed with
``WHERE v BETWEEN valid_from AND valid_to``. Training-data pipelines
need the same primitive to pin which snapshot of a crawl/label table
a given training run saw.

Semantics (version numbers, not wall clocks, order the log — the
caller owns totality of the order per key):

- the current snapshot enters the log as version-``base_version``
  upserts; change rows carry ``(version, op)`` with op ``U`` or ``D``;
- each ``U`` row opens an interval at its version; the interval
  closes at the NEXT change of the same key (whether that change is
  an update or a delete) — ``valid_to`` is that version, NULL while
  still current;
- a ``D`` row emits no interval of its own: it only terminates the
  previous one (so a deleted key has no current row).

Plan shape: one ``unionByName`` (no shuffle), one window partitioned
by key ordered by version — a single hash exchange on the key, the
same partitioning the downstream point-in-time join would want. At
100 TB the log is append-only and the window state per key is the
handful of versions that key ever had; no global sort, no driver
state. Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(snapshot: DataFrame, changes: DataFrame,
                 keys: Sequence[str], *, version_col: str = "_version",
                 op_col: str = "_op", base_version: int = 0) -> DataFrame:
    """Build the SCD2 interval table from ``snapshot`` + ``changes``.

    ``changes`` must carry ``snapshot``'s columns plus
    ``version_col`` (int, > ``base_version``, unique per key) and
    ``op_col`` ('U' inserts/updates, 'D' deletes). Returns one row
    per (key, U-version) with ``valid_from``, ``valid_to`` (NULL =
    current) and ``is_current`` (int 0/1) appended.
    """
    missing = {version_col, op_col} - set(changes.columns)
    if missing:
        raise ValueError(f"changes is missing columns {sorted(missing)}")

    snap = (snapshot.withColumn(version_col, F.lit(base_version))
                    .withColumn(op_col, F.lit("U")))
    log = snap.unionByName(changes)

    w = Window.partitionBy(*keys).orderBy(version_col)
    hist = log.withColumn("valid_to", F.lead(version_col).over(w))
    return (hist.filter(F.col(op_col) == "U")
                .withColumn("valid_from", F.col(version_col))
                .withColumn("is_current",
                            F.col("valid_to").isNull().cast("int"))
                .drop(version_col, op_col))
