"""Unigram language-model quality scoring.

The next rung above heuristic quality signals
(``functions/text_metrics.quality_score``): score each document by
its mean per-token log-probability under a corpus-level unigram
model with Laplace smoothing. Real pipelines use a trained KenLM /
classifier here; the unigram form keeps the exact same *shape* —
(1) a corpus pass builds a small model artifact, (2) a model-apply
pass scores documents map-side — with fully checkable math.

Scale design:

- **Build** is one partially-aggregated ``groupBy(word)`` (shuffle
  volume = distinct words, not tokens) + a top-V cut. The vocab is a
  *model artifact*, bounded by construction (``v_max`` rows) — it is
  collected to the driver exactly like IVF centroids
  (``operators/similarity.py``): a deliberate, bounded lineage cut.
- **Score** is zero-shuffle: the vocab becomes a literal map
  expression, and each doc folds its words array in order —
  whole-stage codegen, no explode, no join, no Python. At 100 TB the
  scoring pass is a narrow map over the scan, which is the only
  acceptable shape for a per-doc model apply.
- The fold accumulates in array order (deterministic), and the
  oracle pins the same order via ``sum(... ORDER BY position)`` —
  float summation order is part of the contract, not luck.

Smoothing contract (mirrored exactly in the oracle SQL):
``total`` = corpus token count, ``V`` = retained vocab size,
``logp(w) = ln((c_w + 1) / (total + V + 1))`` for vocab words,
``ln(1 / (total + V + 1))`` for OOV.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.text_metrics import words


def build_unigram_model(docs: DataFrame, v_max: int = 16,
                        text_col: str = "text") -> tuple[dict, float]:
    """Corpus pass → ({word: logp}, oov_logp).

    Returns plain Python values (the model artifact): ``v_max`` is
    small by construction, so the collect is a bounded k-row pull,
    not a data-path collect.
    """
    counts = (docs
              .select(F.explode(words(text_col)).alias("word"))
              .groupBy("word")
              .agg(F.count(F.lit(1)).alias("c")))
    # two actions (top-V cut, then the total) read counts — persist
    # so the corpus explode+groupBy lineage executes once, and
    # unpersist immediately: both consumers are driver-side collects,
    # so nothing lazy outlives this function (ADVICE r3).
    counts = counts.persist()
    try:
        top = (counts
               .orderBy(F.col("c").desc(), F.col("word"))
               .limit(v_max)
               .collect())
        total = counts.agg(F.sum("c").alias("t")).collect()[0].t or 0
    finally:
        counts.unpersist()
    v = len(top)
    denom = float(total + v + 1)
    vocab = {r.word: math.log((r.c + 1) / denom) for r in top}
    return vocab, math.log(1.0 / denom)


def unigram_logprob(docs: DataFrame, vocab: dict, oov_logp: float,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Model-apply pass: doc → (n_words, mean token logprob).

    Pure column expressions — the vocab rides along as a literal map,
    the per-doc fold runs in array order, zero shuffle.
    """
    if vocab:
        keys = sorted(vocab)
        m = F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]),
            F.array(*[F.lit(vocab[k]) for k in keys]))
        logp = lambda w: F.coalesce(  # noqa: E731
            F.element_at(m, w), F.lit(oov_logp))
    else:
        logp = lambda w: F.lit(oov_logp)  # noqa: E731
    # let-bind the words array (tokenize once per row, not per use)
    def per(ws):
        total_lp = F.aggregate(ws, F.lit(0.0),
                               lambda acc, w: acc + logp(w))
        n = F.size(ws)
        return F.struct(
            n.alias("n"),
            F.when(n > 0, F.round(total_lp / n, 4))
            .otherwise(F.lit(0.0)).alias("s"))

    sig = F.transform(F.array(words(text_col)), per)[0]
    return docs.select(
        F.col(id_col),
        sig["n"].alias("n_words"),
        sig["s"].alias("lm_score"))
