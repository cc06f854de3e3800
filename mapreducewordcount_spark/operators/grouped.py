"""Grouped Arrow-path custom operators (``applyInPandas``).

This is the engine's sanctioned escape hatch for per-group logic the
DataFrame algebra can't express (group-local model scoring, custom
normalization, order-dependent resampling): one shuffle on the group
key, then each group arrives in a worker as a single Arrow-backed
pandas frame.

``grouped_ntile`` is the verifiable instance: its math (exact
``ntile`` semantics) is also window-expressible, which is precisely
why it's the one wired into the correctness gate — the DuckDB oracle
pins the whole Arrow path (shuffle → Arrow serialization → pandas →
schema-checked return) to an integer-exact contract that summation
order can't flip. Production users swap the body, keeping the shape.

Scale notes:
- cost is ONE shuffle on the group key; no further exchanges.
- each group must fit in one executor's memory (Arrow materializes
  the group). Fine for many-small-groups layouts (per-language,
  per-tenant); for a handful of giant groups use the distributed
  window form (``F.ntile().over(...)``) instead — Spark sorts those
  within partitions and never materializes a group.
- results are deterministic regardless of arrival order: the body
  sorts by a caller-supplied TOTAL order before assigning buckets
  (a partial order would make output depend on shuffle arrival).

Reference parity: no counterpart (the reference has no grouped
compute at all beyond count-by-key, /root/reference/src/worker.py);
SURVEY.md §2.5 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_ntile(df: DataFrame, group_cols: list[str],
                  order_cols: list[str], k: int,
                  out_col: str = "bucket") -> DataFrame:
    """Append exact ``ntile(k)`` per group, computed group-locally in
    pandas: rows ordered by ``order_cols`` (must be a total order —
    include a unique id as the last key), the first ``n mod k``
    buckets hold one extra row, matching SQL ``ntile`` exactly.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.IntegerType(), False)])

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort",
                              ignore_index=True)
        n = len(pdf)
        q, rem = divmod(n, k)
        head = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
        buckets = [
            (r // (q + 1)) + 1 if r < head else rem + (r - head) // q + 1
            for r in range(n)
        ]
        pdf[out_col] = pd.array(buckets, dtype="int32")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(assign, schema)
