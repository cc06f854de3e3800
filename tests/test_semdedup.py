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
