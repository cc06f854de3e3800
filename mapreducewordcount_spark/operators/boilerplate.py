"""Cross-document boilerplate-line detection.

Per-doc repetition (``functions/repetition.py``) is a narrow map;
*boilerplate* — the same nav header / footer / cookie banner line
appearing across many documents of one source — is inherently a
corpus-level aggregate: the unit of repetition spans documents, so
one shuffle is unavoidable. The scale discipline is to make that
shuffle as narrow as possible:

- explode **distinct** lines per doc (duplicate lines inside a doc
  don't change the doc-frequency count, so dedup before the shuffle);
- shuffle ``(group, xxhash64(line))`` — a 16-ish-byte key — instead
  of raw line strings (a cookie banner is hundreds of bytes ×
  billions of rows). Collision risk is n²/2⁶⁵ per group — negligible
  below ~10⁹ distinct lines per source; go 128-bit (two seeds) past
  that;
- explode ONCE: doc-frequency is attached to each exploded line via
  a ``count() over (partition by group, hash)`` window instead of a
  separate aggregate + join back — the whole operator is one scan,
  one shuffle on ``(group, hash)``, one shuffle on doc_id (the
  per-doc rollup). The naive three-branch formulation (counts /
  flagged / totals as separate joins) re-scans and re-explodes the
  corpus three times — confirmed by ``.explain`` and rejected.

No reference parity: the reference (549-line word-count,
/root/reference/src/) has no document pipeline; extension scope per
SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.repetition import lines


def boilerplate_report(docs: DataFrame, min_docs: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       group_col: str = "source") -> DataFrame:
    """Per doc: distinct-line count, how many of those lines are
    boilerplate (appear in ≥ ``min_docs`` docs of the same group),
    and the boilerplate fraction.

    Returns one row per input doc (zero counts for line-less docs).
    """
    from pyspark.sql import Window

    base = docs.select(id_col, group_col, text_col)
    per_doc_lines = (base
                     .select(id_col, group_col,
                             F.explode(F.array_distinct(lines(text_col)))
                             .alias("line"))
                     .withColumn("line_key", F.xxhash64("line"))
                     .drop("line"))
    # doc-frequency attached in place: lines are distinct per doc, so
    # count(*) over (group, line_key) == number of docs with the line
    df_w = F.count(F.lit(1)).over(
        Window.partitionBy(group_col, "line_key"))
    per_doc = (per_doc_lines
               .withColumn("df", df_w)
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    F.sum((F.col("df") >= min_docs).cast("long"))
                    .alias("n_boiler_lines")))
    out = (base.select(id_col)
           .join(per_doc, id_col, "left")
           .select(
               F.col(id_col),
               F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
               F.coalesce("n_boiler_lines", F.lit(0))
               .alias("n_boiler_lines")))
    return out.withColumn(
        "boiler_fraction",
        F.when(F.col("n_lines") > 0,
               F.round(F.col("n_boiler_lines").cast("double")
                       / F.col("n_lines"), 6)).otherwise(F.lit(0.0)))
