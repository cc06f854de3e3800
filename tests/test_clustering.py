"""k-means clustering: planted-cluster recovery, stats, sampling."""

from __future__ import annotations

import pytest

from mapreducewordcount_spark.operators.clustering import (
    cluster_balanced_sample,
    cluster_stats,
    kmeans,
)


@pytest.fixture(scope="module")
def planted(spark):
    """60 vectors in 3 well-separated directions (unit-ish axes with
    small deterministic jitter) — any sane k-means recovers them."""
    rows = []
    axes = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    for i in range(60):
        ax = axes[i % 3]
        jit = ((i * 37) % 10) / 100.0  # 0.00-0.09, deterministic
        vec = [c + (jit if j == (i % 2) else 0.0)
               for j, c in enumerate(ax)]
        rows.append((i, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark, planted):
    assigned, cent = kmeans(planted, k=3, iters=4)
    rows = assigned.collect()
    assert len(rows) == 60
    assert cent.count() == 3
    # every planted group (i % 3) lands in exactly one cluster
    by_group = {}
    for r in rows:
        by_group.setdefault(r.vec_id % 3, set()).add(r.cluster_id)
    assert all(len(cids) == 1 for cids in by_group.values())
    # and the three groups land in three DIFFERENT clusters
    assert len({next(iter(c)) for c in by_group.values()}) == 3
    # cosine-to-centroid is high for tight planted clusters
    assert all(r.cos > 0.9 for r in rows)


def test_kmeans_is_deterministic(spark, planted):
    a1, _ = kmeans(planted, k=3, iters=2)
    a2, _ = kmeans(planted, k=3, iters=2)
    assert sorted(map(tuple, a1.collect())) == \
        sorted(map(tuple, a2.collect()))


def test_kmeans_validates_args(spark, planted):
    with pytest.raises(ValueError):
        kmeans(planted, k=0)
    with pytest.raises(ValueError):
        kmeans(planted, k=2, iters=-1)


def test_kmeans_rejects_k_larger_than_corpus(spark, planted):
    """A corpus with fewer than k vectors cannot seed k centroids —
    the docstring promises a k-row model table, so the sub-k case
    must raise instead of silently shrinking (ADVICE r4)."""
    tiny = planted.limit(2)
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans(tiny, k=5, iters=0)


def test_cluster_stats_shapes_and_exemplar(spark, planted):
    assigned, _ = kmeans(planted, k=3, iters=4)
    stats = cluster_stats(assigned).collect()
    assert len(stats) == 3
    assert sum(r.n_members for r in stats) == 60
    by_cluster = {}
    for r in assigned.collect():
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for s in stats:
        members = by_cluster[s.cluster_id]
        assert s.n_members == len(members)
        best = max(members, key=lambda r: (r.cos, -r.vec_id))
        assert s.exemplar_id == best.vec_id
        assert s.min_cos <= s.mean_cos


def test_kmeans_assignment_plan_is_broadcast_only(spark, planted):
    """The scale-deciding shapes, pinned: cosine-to-centroid attaches
    via a BROADCAST hash join against the k-row model table (never a
    shuffled join of the corpus), and assignment itself adds no
    Exchange beyond what the broadcast needs."""
    from mapreducewordcount_spark.plans import explain_str

    assigned, _ = kmeans(planted, k=3, iters=0)
    plan = explain_str(assigned)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_stats_single_aggregation(spark, planted):
    """cluster_stats is one partial-agg groupBy emitting k rows: the
    only Exchanges are the aggregate's hash shuffle and the k-row
    output sort — no window, no extra join beyond the broadcast."""
    from mapreducewordcount_spark.plans import explain_str

    assigned, _ = kmeans(planted, k=3, iters=0)
    plan = explain_str(cluster_stats(assigned))
    assert "Window" not in plan
    # max_by(struct) is a TypedImperativeAggregate → SortAggregate,
    # still partial+final (map-side combine) like HashAggregate
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert "SortMergeJoin" not in plan


def test_cluster_balanced_sample_caps_every_cluster(spark, planted):
    assigned, _ = kmeans(planted, k=3, iters=4)
    sample = cluster_balanced_sample(assigned, per_cluster=5).collect()
    per = {}
    for r in sample:
        per.setdefault(r.cluster_id, []).append(r)
    assert len(per) == 3
    assert all(len(v) == 5 for v in per.values())
    # takes the members NEAREST the centroid, deterministically
    by_cluster = {}
    for r in assigned.collect():
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, got in per.items():
        want = sorted(by_cluster[cid],
                      key=lambda r: (-r.cos, r.vec_id))[:5]
        assert sorted(r.vec_id for r in got) == \
            sorted(r.vec_id for r in want)
    with pytest.raises(ValueError):
        cluster_balanced_sample(assigned, per_cluster=0)
