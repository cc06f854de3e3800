"""Eval-set decontamination: drop training documents that overlap a
benchmark/eval corpus by shared word n-grams.

The standard LLM-training hygiene pass (the GPT-3/PaLM reports
describe 8-13-gram overlap scrubbing): a training document is
contaminated when it shares at least ``min_hits`` distinct n-grams
with ANY eval document.

Scale shape — the asymmetry is the whole design: eval corpora are
megabytes while training corpora are the 100 TB side, so the eval
n-gram set is collected into a broadcast and the training side never
shuffles *documents* at all:

  train → shingles (pure column exprs, zero shuffle)
        → explode → broadcast-hash semi vs eval n-grams
        → per-doc distinct-hit count (shuffles doc_id+ngram pairs
          ONLY for docs that hit at least once — the overwhelming
          majority of clean docs exit at the broadcast probe)

Reference parity note: the reference engine
(/root/reference/src/worker.py) has no document pipeline; SURVEY.md
§2.5 claims this extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.text_metrics import shingles


def eval_ngram_set(eval_docs: DataFrame, text_col: str = "text",
                   n: int = 3) -> DataFrame:
    """Distinct word n-grams over the eval corpus — one ``ngram``
    column, deduplicated, small enough to broadcast by construction
    (benchmarks are tiny relative to training data)."""
    return (eval_docs
            .select(F.explode(shingles(text_col, n)).alias("ngram"))
            .distinct())


def contamination_report(train: DataFrame, eval_docs: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3) -> DataFrame:
    """Per contaminated training doc: how many distinct eval n-grams
    it contains. Docs with zero hits do not appear (at scale that is
    almost all of them — keep the report sparse)."""
    ngrams = eval_ngram_set(eval_docs, text_col, n)
    exploded = (train
                .select(F.col(id_col), F.explode_outer(
                    F.array_distinct(shingles(text_col, n))).alias("ngram"))
                .filter(F.col("ngram").isNotNull()))
    return (exploded
            .join(F.broadcast(ngrams), "ngram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, min_hits: int = 1) -> DataFrame:
    """Training rows minus those sharing ≥ ``min_hits`` distinct
    n-grams with the eval corpus (broadcast probe + anti join on the
    small contaminated-id set)."""
    hits = (contamination_report(train, eval_docs, id_col, text_col, n)
            .filter(F.col("n_hits") >= min_hits)
            .select(id_col))
    return train.join(hits, id_col, "left_anti")
