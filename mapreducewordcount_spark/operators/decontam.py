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


def source_ngram_overlap(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         source_col: str = "source",
                         n: int = 3) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources,
    how many distinct word n-grams they share, plus set-Jaccard.

    The corpus-curation generalization of eval decontamination: when
    the train/eval split is BY SOURCE (the common case — "train on
    crawl, eval on curated"), the leakage signal is the n-gram overlap
    between sources, and a high-Jaccard pair means the split leaks.

    Scale shape (the point is what this NEVER does — join documents
    against documents):

    1. distinct (source, ngram) — one shuffle with partial-distinct
       combine; output is bounded by vocabulary × sources, not rows;
    2. groupBy(ngram) + collect_set(source) — the per-key value is
       bounded by the SOURCE COUNT (a handful), so there is no hot-key
       blowup regardless of how universal an n-gram is — the map-side
       partial set caps every task's contribution at |sources|;
    3. pair expansion from each sorted source-set (≤ |sources|² per
       n-gram, in-row transform/flatten — no join);
    4. per-pair count + a broadcast join against the tiny per-source
       totals for the Jaccard denominator.

    Output: (source_a < source_b, shared_ngrams, n_a, n_b, jaccard).
    """
    from mapreducewordcount_spark.sources.tables import spread

    e = (spread(docs)
         .select(F.col(source_col).alias("source"),
                 F.explode(shingles(text_col, n)).alias("ngram"))
         .distinct())
    tot = e.groupBy("source").agg(F.count(F.lit(1)).alias("n_ngrams"))
    # sorted source set per n-gram, expanded to ordered (a, b) pairs
    # entirely in-row: transform-with-index over the set against its
    # own tail slice, flattened — no self-join on the n-gram key.
    pairs = (e.groupBy("ngram")
             .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
             .filter(F.size("srcs") >= 2)
             .select(F.explode(F.expr(
                 "flatten(transform(srcs, (a, i) -> "
                 "transform(slice(srcs, i + 2, size(srcs)), "
                 "b -> struct(a AS source_a, b AS source_b))))")).alias("p"))
             .select("p.source_a", "p.source_b")
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("shared_ngrams")))
    ta = tot.select(F.col("source").alias("source_a"),
                    F.col("n_ngrams").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"),
                    F.col("n_ngrams").alias("n_b"))
    return (pairs
            .join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b", "shared_ngrams", "n_a", "n_b",
                    F.round(F.col("shared_ngrams").cast("double")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("shared_ngrams")), 6).alias("jaccard")))
