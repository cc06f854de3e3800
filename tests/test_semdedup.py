"""Planted-ground-truth tests for SemDeDup (cluster-then-prune
semantic dedup, operators/semdedup.py)."""

from __future__ import annotations

import pytest

from mapreducewordcount_spark.operators.semdedup import semantic_dedup


def _planted(spark):
    """Two well-separated directions; near-dups planted inside each.

    Cluster A points along +x (ids 0-3: 0,1,2 are ≈identical, 3 is
    distinct-but-same-direction at 45° within the x-y plane so it
    clusters with A but clears no 0.9-threshold pair). Cluster B
    points along +z (ids 10-11 ≈identical).
    """
    d = 8

    def vec(axis, eps=0.0, eps_axis=1):
        v = [0.0] * d
        v[axis] = 1.0
        v[eps_axis] = eps
        return v

    rows = [
        (0, vec(0)), (1, vec(0, 1e-3)), (2, vec(0, 2e-3)),
        (3, [0.7, 0.7] + [0.0] * (d - 2)),  # same cluster, cos≈0.707
        (10, vec(4)), (11, vec(4, 1e-3, 5)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_planted_components(spark):
    out = {r.vec_id: r for r in
           semantic_dedup(_planted(spark), n_lists=2, threshold=0.9,
                          kmeans_iters=2).collect()}
    assert len(out) == 6
    # {0,1,2} one component, keeper 0
    assert out[0].group_id == 0 and out[0].keep == 1
    assert out[1].group_id == 0 and out[1].keep == 0
    assert out[2].group_id == 0 and out[2].keep == 0
    # 3 is in A's cluster but below threshold → its own keeper
    assert out[3].group_id == 3 and out[3].keep == 1
    # {10,11} one component, keeper 10
    assert out[10].group_id == 10 and out[10].keep == 1
    assert out[11].group_id == 10 and out[11].keep == 0


def test_semantic_dedup_is_deterministic(spark):
    emb = _planted(spark)
    a = sorted(map(tuple, semantic_dedup(emb, n_lists=2, threshold=0.9,
                                         kmeans_iters=2).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, n_lists=2, threshold=0.9,
                                         kmeans_iters=2).collect()))
    assert a == b


def test_semantic_dedup_rejects_bad_threshold(spark):
    emb = _planted(spark)
    for bad in (0.0, -1.0, 1.0001):
        with pytest.raises(ValueError):
            semantic_dedup(emb, threshold=bad)


def test_semantic_dedup_no_pairs_keeps_everything(spark):
    """With an unreachable threshold every vector is its own keeper."""
    d = 8
    rows = [(i, [float(j == i) for j in range(d)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, n_lists=2, threshold=0.999).collect()
    assert all(r.keep == 1 and r.group_id == r.vec_id for r in out)


def test_semantic_dedup_at_sqrt_n_lists(spark):
    """The SCALE.md story depends on the n_lists knob: at a realistic
    operating point (n_lists ≈ √n, the paper's regime rather than the
    gate query's fixed 16) the pair space must collapse from n² to
    Σ|cluster|² AND the planted near-dup components must still be
    recovered. 400 vectors in 20 well-separated directions, a
    3-member near-identical trio planted per direction."""
    import math

    from pyspark.sql import functions as F

    from mapreducewordcount_spark.operators.semdedup import ivf_build

    d, n_dirs, per_dir = 32, 20, 20
    rows = []
    for c in range(n_dirs):
        for m in range(per_dir):
            v = [0.0] * d
            v[c] = 1.0
            if m < 3:
                # planted trio: within 1e-3 of the axis → cos ≈ 1
                v[(c + 7) % d] = m * 1e-3
            else:
                # distinct member: 0.1-0.3 jitter on a member-specific
                # coordinate keeps cos vs anything else ≤ ~0.995
                v[(c + 3 + m) % d] = 0.1 + (m % 5) * 0.05
            rows.append((c * 100 + m, v))
    n = len(rows)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_lists = int(math.isqrt(n))  # 20

    # (a) pair-space reduction at the √n operating point
    assigned, _ = ivf_build(emb, n_lists=n_lists, kmeans_iters=2)
    sizes = [r.c for r in
             assigned.groupBy("list_id").agg(F.count("*").alias("c"))
             .collect()]
    ratio = sum(s * s for s in sizes) / float(n * n)
    assert ratio < 0.3, \
        f"Σ|cluster|²/n² = {ratio:.3f} — clustering is not bounding " \
        "the quadratic pair stage"

    # (b) recall: planted trios survive as single components
    out = {r.vec_id: r for r in
           semantic_dedup(emb, n_lists=n_lists, threshold=0.999,
                          kmeans_iters=2).collect()}
    assert len(out) == n
    recovered = 0
    for c in range(n_dirs):
        trio = [out[c * 100 + m] for m in range(3)]
        if (len({r.group_id for r in trio}) == 1
                and sum(r.keep for r in trio) == 1):
            recovered += 1
    assert recovered >= 18, \
        f"only {recovered}/20 planted trios recovered at n_lists=√n"
    # distinct members never collapse into the trio components
    for c in range(n_dirs):
        for m in range(3, per_dir):
            assert out[c * 100 + m].keep == 1, (c, m)


def test_semantic_dedup_pairs_stay_in_cluster_join(spark):
    """The pair stage must be the list_id equi-join (Σ|cluster|²),
    never a corpus-wide nested-loop pair scan."""
    from mapreducewordcount_spark.operators.semdedup import ivf_build
    from mapreducewordcount_spark.plans import explain_str
    from mapreducewordcount_spark.functions.vectors import dot, norm
    from pyspark.sql import functions as F

    emb = _planted(spark)
    assigned, _ = ivf_build(emb, n_lists=2, kmeans_iters=0)
    base = assigned.select("list_id", F.col("neighbor_id").alias("id"),
                           F.col("c_vec").alias("vec"),
                           norm("c_vec").alias("nrm"))
    a = base.select("list_id", F.col("id").alias("a_id"),
                    F.col("vec").alias("a_vec"), F.col("nrm").alias("a_n"))
    b = base.select("list_id", F.col("id").alias("b_id"),
                    F.col("vec").alias("b_vec"), F.col("nrm").alias("b_n"))
    pairs = (a.join(b, "list_id")
             .filter(F.col("a_id") < F.col("b_id"))
             .withColumn("cos", dot("a_vec", "b_vec")
                         / (F.col("a_n") * F.col("b_n")))
             .filter(F.col("cos") >= 0.9))
    plan = explain_str(pairs)
    assert "CartesianProduct" not in plan
