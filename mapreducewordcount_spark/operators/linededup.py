"""Corpus-wide duplicate-line removal (the C4 rule, as a rewrite).

``operators/boilerplate.py`` *measures* cross-document repetition;
this operator *applies* the classic C4 cleanup (public method:
Raffel et al. 2020, *Exploring the Limits of Transfer Learning…*,
§2.2: "we discarded all but one of any three-sentence span occurring
more than once" — the line-granular variant every web pipeline runs):
every line occurrence except the corpus-wide FIRST one is removed,
and documents are rebuilt from their surviving lines in original
order.

Determinism contract: "first" = smallest (doc_id, line position) —
the same total order on any engine, so the whole rewrite is
DuckDB-oracle-checkable.

Scale shape (same discipline as boilerplate/dupspans):

- explode lines ONCE with positions;
- the first-occurrence decision is a ``row_number`` window
  partitioned by ``xxhash64(line)`` — the shuffle is keyed on an
  8-byte hash, never on raw line strings (the row still carries its
  line for the rebuild, but hot boilerplate lines hash-spread
  instead of clustering a text key); 2⁻⁶⁴ collisions would merge
  two distinct lines — the standard accepted trade, and the reason
  the 128-bit ``operators.boilerplate.hash_key`` escape hatch
  exists;
- the rebuild is one groupBy(doc_id) assembling surviving lines via
  an in-array sort on position — no second corpus scan, no window
  over the full text.

Two shuffles total (line-hash, doc_id) at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.repetition import lines


def strip_duplicate_lines(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """→ (doc_id, text_clean, n_lines, n_kept): every doc rebuilt
    with only the corpus-wide first occurrence of each line.

    Docs whose every line was seen earlier come back with
    ``text_clean = ''`` (drop or keep downstream is a policy call —
    curation usually drops empties at the quality gate).
    """
    occ = (docs
           .select(F.col(id_col).alias("doc_id"),
                   F.posexplode(lines(text_col)).alias("pos", "line")))
    w = (Window.partitionBy(F.xxhash64("line"))
         .orderBy("doc_id", "pos"))
    kept = (occ
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    rebuilt = (kept
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("text_clean")))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.size(lines(text_col)).alias("n_lines"))
    return (base
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))
