"""Count-min sketch: the never-underestimate guarantee, exactness in
the collision-free regime, partition invariance (the property that
makes it fully oracle-able where GK percentiles are not), and the
classic error bound on a heavy stream."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.cms import (
    DEPTH,
    WIDTH,
    cms_build,
    cms_estimate,
)


def _words(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "word string")


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    """Estimates dominate true counts ALWAYS; on a vocabulary tiny
    relative to WIDTH the min-over-rows almost surely removes every
    collision, and here exactly (checked, not assumed)."""
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(40)]
    truth = {w: rng.randint(1, 30) for w in vocab}
    stream = [w for w, c in truth.items() for _ in range(c)]
    rng.shuffle(stream)
    words = _words(spark, stream)
    sketch = cms_build(words)
    est = {r.word: r.cms_count for r in
           cms_estimate(_words(spark, vocab), sketch).collect()}
    assert set(est) == set(truth)
    for w, c in truth.items():
        assert est[w] >= c, (w, c, est[w])
    assert est == truth  # 40 words × 4 rows of 2048 cells: no collision


def test_cms_partition_invariant(spark):
    """Cell sums are integer adds over hash-selected rows — identical
    under any partitioning (the GK contrast; what lets the gate hash
    the sketch's derived estimates)."""
    stream = [f"w{i % 97}" for i in range(3000)]
    outs = []
    for parts in (1, 7, 32):
        sk = cms_build(_words(spark, stream).repartition(parts))
        outs.append(sorted(map(tuple, sk.collect())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) <= DEPTH * WIDTH


def test_cms_error_bound_on_heavy_stream(spark):
    """The classic bound, instantiated: with N total tokens, each
    estimate exceeds truth by at most eps·N with high probability
    (eps = e/WIDTH ≈ 0.0013). A 50k-token zipf-ish stream over 5k
    distinct words must keep every probed overcount under eps·N —
    far looser than observed, but it pins the CONTRACT."""
    rng = random.Random(5)
    stream = [f"z{int(rng.paretovariate(1.2)) % 5000}"
              for _ in range(50_000)]
    words = _words(spark, stream)
    sketch = cms_build(words)
    exact = {r.word: r.n for r in
             words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    probes = list(exact)[:500]
    est = {r.word: r.cms_count for r in
           cms_estimate(_words(spark, probes), sketch).collect()}
    n_total = len(stream)
    bound = (2.718281828 / WIDTH) * n_total
    for w in probes:
        over = est[w] - exact[w]
        assert 0 <= over <= bound, (w, exact[w], est[w], bound)
