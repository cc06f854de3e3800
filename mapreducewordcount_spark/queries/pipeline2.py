"""Training-data pipeline batch 2 (round 3): repetition signals,
cross-document boilerplate, sequence packing, mixture planning.

Extension scope per SURVEY.md §2.5 — the reference engine
(/root/reference/src/, 549-line word-count) has no document
pipeline; these are the Gopher-rule / dataset-assembly passes a
100 TB training-data build runs after dedup and hygiene.

Oracle discipline (same as pipeline_queries.py): integer counts and
length arithmetic wherever possible; the only doubles are ratios
rounded to 6dp on both sides; window frames and orderings are total
(doc_id tiebreaks) so both engines resolve identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.repetition import (
    _lines,
    dup_line_char_fraction,
    dup_line_fraction,
    top_word_fraction,
)
from mapreducewordcount_spark.operators.boilerplate import boilerplate_report
from mapreducewordcount_spark.operators.packing import (
    mixture_plan,
    pack_sequences,
)
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table, spread

#: DuckDB twin of functions/repetition._lines — split on newline,
#: trim, drop empties (Spark F.trim / DuckDB trim both strip spaces).
_LINES_CTE = r"""
ln AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS ls
  FROM documents
)
"""


# --- per-doc repetition signals ---------------------------------------------

def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition signals per document — duplicate-line
    fraction, duplicate-line *character* fraction, top-word
    dominance. Narrow map over the scan: no shuffle at all."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.round(dup_line_fraction("text"), 6).alias("dup_line_frac"),
        F.round(dup_line_char_fraction("text"), 6).alias("dup_char_frac"),
        F.round(top_word_fraction("text"), 6).alias("top_word_frac"))


DOC_REPETITION_SQL = rf"""
WITH {_LINES_CTE},
w AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x, '^[!-/:-@\[-`{{-~]+|[!-/:-@\[-`{{-~]+$', '', 'g')),
           x -> x <> '') AS words
  FROM documents
),
tw AS (SELECT doc_id, unnest(words) AS word FROM w),
twc AS (SELECT doc_id, word, count(*) AS c FROM tw GROUP BY 1, 2),
twa AS (SELECT doc_id, max(c) AS best, sum(c) AS n FROM twc GROUP BY 1)
SELECT d.doc_id,
       round(CASE WHEN len(ln.ls) > 0
             THEN 1.0 - CAST(len(list_distinct(ln.ls)) AS DOUBLE) / len(ln.ls)
             ELSE 0.0 END, 6) AS dup_line_frac,
       round(CASE WHEN COALESCE(list_sum(list_transform(ln.ls, x -> length(x))), 0) > 0
             THEN CAST(list_sum(list_transform(ln.ls, x -> length(x)))
                       - list_sum(list_transform(list_distinct(ln.ls), x -> length(x))) AS DOUBLE)
                  / list_sum(list_transform(ln.ls, x -> length(x)))
             ELSE 0.0 END, 6) AS dup_char_frac,
       round(CASE WHEN COALESCE(twa.n, 0) > 0
             THEN CAST(twa.best AS DOUBLE) / twa.n
             ELSE 0.0 END, 6) AS top_word_frac
FROM documents d
JOIN ln USING (doc_id)
LEFT JOIN twa USING (doc_id)
"""


# --- cross-document boilerplate ---------------------------------------------

def boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: distinct lines, lines shared by ≥3 docs of the same
    source (boilerplate), and the boilerplate fraction."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return boilerplate_report(docs, min_docs=3)


BOILERPLATE_SQL = rf"""
WITH {_LINES_CTE},
dl AS (SELECT doc_id, unnest(list_distinct(ls)) AS line FROM ln),
docsrc AS (SELECT doc_id, source FROM documents),
df AS (
  SELECT s.source, d.line, count(*) AS n_docs
  FROM dl d JOIN docsrc s USING (doc_id)
  GROUP BY 1, 2
),
boiler AS (SELECT source, line FROM df WHERE n_docs >= 3),
flagged AS (
  SELECT d.doc_id, count(*) AS n_boiler_lines
  FROM dl d JOIN docsrc s USING (doc_id)
  JOIN boiler b ON b.source = s.source AND b.line = d.line
  GROUP BY 1
),
counts AS (SELECT doc_id, count(*) AS n_lines FROM dl GROUP BY 1)
SELECT d.doc_id,
       COALESCE(c.n_lines, 0) AS n_lines,
       COALESCE(f.n_boiler_lines, 0) AS n_boiler_lines,
       CASE WHEN COALESCE(c.n_lines, 0) > 0
            THEN round(CAST(COALESCE(f.n_boiler_lines, 0) AS DOUBLE)
                       / c.n_lines, 6)
            ELSE 0.0 END AS boiler_fraction
FROM documents d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN flagged f USING (doc_id)
"""


# --- sequence packing -------------------------------------------------------

def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token training sequences, 4 shards per
    source (see operators/packing.py for the shard-parallel design)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return pack_sequences(docs, budget_tokens=512, n_shards=4)


PACK_SQL = r"""
WITH d AS (
  SELECT doc_id, source, doc_id % 4 AS shard,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, source, shard, n_tokens,
       CAST(floor(COALESCE(sum(n_tokens) OVER (
             PARTITION BY source, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 512.0) AS BIGINT) AS seq_id
FROM d
"""


# --- mixture planning -------------------------------------------------------

#: target language mixture (fixed so the oracle can embed it)
MIX_WEIGHTS = {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1}
MIX_BUDGET = 1_000_000


def training_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token inventory + sampling rate per language for a 1M-token
    mixture at the MIX_WEIGHTS targets."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return mixture_plan(docs, MIX_WEIGHTS, MIX_BUDGET, group_col="lang")


_WEIGHTS_SQL = "(VALUES " + ", ".join(
    f"('{k}', {v})" for k, v in MIX_WEIGHTS.items()) + ") AS wt(lang, w)"

MIXTURE_SQL = rf"""
WITH inv AS (
  SELECT lang, count(*) AS n_docs,
         sum(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT)) AS tokens_available
  FROM documents GROUP BY 1
)
SELECT inv.lang, inv.n_docs, inv.tokens_available,
       round(COALESCE(wt.w, 0.0) / {sum(MIX_WEIGHTS.values())!r}, 6) AS weight,
       CAST(floor(COALESCE(wt.w, 0.0) / {sum(MIX_WEIGHTS.values())!r} * {MIX_BUDGET}) AS BIGINT) AS tokens_target,
       round(CAST(floor(COALESCE(wt.w, 0.0) / {sum(MIX_WEIGHTS.values())!r} * {MIX_BUDGET}) AS BIGINT)
             / CAST(inv.tokens_available AS DOUBLE), 6) AS sample_rate
FROM inv LEFT JOIN {_WEIGHTS_SQL} ON inv.lang = wt.lang
"""


QUERIES = {
    "doc_repetition_stats": QuerySpec(doc_repetition_stats,
                                      DOC_REPETITION_SQL),
    "boilerplate_lines": QuerySpec(boilerplate_lines, BOILERPLATE_SQL),
    "pack_training_sequences": QuerySpec(pack_training_sequences, PACK_SQL),
    "training_mixture_plan": QuerySpec(training_mixture_plan, MIXTURE_SQL),
}
