"""DSIR importance scoring: weight-model arithmetic, feature
determinism, score monotonicity toward the target distribution."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.dsir import (
    LOG_SCALE,
    N_BUCKETS,
    SMOOTH,
    doc_bucket_counts,
    dsir_scores,
    dsir_weight_rows,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weight_rows_hand_arithmetic():
    src = {0: 90, 1: 10}
    tgt = {0: 10, 1: 90}
    rows = dict(dsir_weight_rows(src, tgt))
    assert len(rows) == N_BUCKETS
    s_tot = 100 + SMOOTH * N_BUCKETS
    t_tot = 100 + SMOOTH * N_BUCKETS
    want0 = round(LOG_SCALE * (math.log(10.5 / t_tot)
                               - math.log(90.5 / s_tot)))
    assert rows[0] == want0
    assert rows[1] > 0 > rows[0]  # target-heavy bucket up, other down
    # unseen buckets: identical smoothed mass, same totals -> 0
    assert rows[500] == 0


def test_bucket_counts_deterministic_and_bounded(spark):
    docs = _docs(spark, [(1, "alpha beta gamma alpha"), (2, "")])
    a = {(r["doc_id"], r["bucket"]): r["c"]
         for r in doc_bucket_counts(docs).collect()}
    b = {(r["doc_id"], r["bucket"]): r["c"]
         for r in doc_bucket_counts(docs.repartition(7)).collect()}
    assert a == b
    assert all(0 <= k[1] < N_BUCKETS for k in a)
    # doc 1: 4 unigrams + 3 bigrams = 7 feature occurrences
    assert sum(c for (d, _), c in a.items() if d == 1) == 7
    # blank doc: no features
    assert not any(d == 2 for d, _ in a)


def test_scores_prefer_target_like_docs(spark):
    # pool: two sublanguages; target = the "good" one. Among docs of
    # EQUAL length (DSIR's raw log-ratio sum is length-sensitive —
    # every extra feature adds its log-ratio, so cross-length
    # comparisons are not monotone), more target-like must score
    # higher.
    good = "alpha beta gamma delta"
    bad = "omega psi chi phi"
    mixed = "alpha beta omega psi"
    docs = _docs(spark, [(1, good), (2, bad), (3, good), (4, bad),
                         (5, mixed)])
    target = docs.filter(F.col("doc_id").isin([1, 3]))
    w = dsir_weights(docs, target)
    got = {r["doc_id"]: r["dsir_score_micro"]
           for r in dsir_scores(docs, w).collect()}
    assert got[1] == got[3]          # identical text -> identical score
    assert got[1] > got[5] > got[2]  # good > mixed > bad (same length)
    assert len(got) == 5


def test_blank_doc_scores_zero(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "")])
    w = dsir_weights(docs, docs.filter(F.col("doc_id") == 1))
    got = {r["doc_id"]: r["dsir_score_micro"]
           for r in dsir_scores(docs, w).collect()}
    assert got[2] == 0
