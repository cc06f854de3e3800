"""Physical-plan inspection helpers.

The scale contract of this engine is enforced in tests, not prose:
filters must reach the parquet scan (``PushedFilters``), column
pruning must shrink ``ReadSchema``, small-dimension joins must be
``BroadcastHashJoin``, and hot expressions must sit inside
``WholeStageCodegen`` spans. These helpers parse
``explain("formatted")`` output so tests can assert those properties
and fail when a refactor silently regresses the plan.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears inside some PushedFilters list."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))
    return all(f in pushed for f in fragments)


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets read by each file scan (one set per scan)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count whole-stage-codegen subtrees (``explain('codegen')``).

    AQE wraps the plan in AdaptiveSparkPlan and defers codegen to
    stage execution, hiding the spans from a pre-execution explain —
    so AQE is toggled off just for this probe (physical planning
    happens at explain time, making the toggle effective).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = explain_str(df, mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
