"""Distributed k-means clustering over embedding columns.

First-class clustering for training-data curation: domain discovery,
cluster-balanced sampling, and the cluster step of SemDeDup all need
"assign every vector to one of k centroids" as a standalone
operator, not buried inside the ANN index build. This module exposes
the engine's spherical k-means (cosine assignment — the right metric
for normalized text embeddings) with the same scale posture as
``operators.similarity.ivf_build``, which it composes:

- **Train** — deterministic hash-sampled seeds + Lloyd rounds; each
  round is one codegen'd scan (per-cluster mean = ``dim`` parallel
  ``avg`` partial-aggs, map-side combined) plus a bounded
  ``k``-row centroid collect — the deliberate lineage cut every
  write-time index build makes (FAISS trains centrally too).
- **Assign** — broadcast-centroid argmax as a pure column
  expression: zero shuffle, zero join; the corpus is touched once.
- **Summarize** — ``cluster_stats`` is a single partial-agg
  ``groupBy(cluster_id)``: k output rows regardless of corpus size.

At 100 TB: the only driver-side state is the k×dim centroid table
(k ≈ 10⁴ for web scale per the SemDeDup paper ⇒ ~30 MB at
dim=768 — broadcast-sized); everything else is narrow maps and one
k-row aggregate. K-means is seed/iteration-dependent → rows-only
gate entry; membership recovery on planted well-separated clusters
is pinned in ``tests/test_clustering.py``.

No reference parity: the reference (/root/reference/src/, 549-line
word-count) has no vector surface; extension scope per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.vectors import cosine
from mapreducewordcount_spark.operators.similarity import ivf_build


def kmeans(df: DataFrame, k: int, iters: int = 4,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Spherical k-means: → ``(assignments, centroids)``.

    ``assignments`` is ``(id_col, cluster_id, cos)`` — every input
    vector with its nearest centroid and the cosine to it;
    ``centroids`` is the k-row ``(cluster_id, cent_vec)`` model
    table. Deterministic for a given input (hash-sampled seeds, fixed
    iteration count) — no RNG, so retries and test runs agree.

    Raises ``ValueError`` when the corpus has fewer than ``k``
    vectors — the seed sample (``limit(k)``) can only produce as many
    centroids as there are rows, so a silent sub-k model would break
    the documented k-row centroid contract (ADVICE r4).
    """
    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    if iters < 0:
        raise ValueError(f"iters={iters} must be >= 0")
    assigned, cent = ivf_build(df, id_col=id_col, vec_col=vec_col,
                               n_lists=k, kmeans_iters=iters)
    # cent is a driver-local k-row frame — counting it is free and
    # catches corpora smaller than k loudly instead of returning a
    # quietly smaller model
    n_seeded = cent.count()
    if n_seeded < k:
        raise ValueError(
            f"k={k} but the corpus has only {n_seeded} vectors — "
            "k-means cannot seed more centroids than rows; lower k "
            "or use the corpus as its own cluster set")
    cent = cent.withColumnRenamed("list_id", "cluster_id")
    # cosine-to-centroid via a broadcast join against the k-row model
    # table (NOT a k-deep CASE expression — k can be 10⁴ at scale):
    # broadcast hash join on cluster_id, cosine in codegen, still a
    # narrow plan for the big side.
    out = (assigned.select(F.col("neighbor_id").alias(id_col),
                           F.col("list_id").alias("cluster_id"),
                           F.col("c_vec").alias("__vec"))
           .join(F.broadcast(cent), "cluster_id")
           .withColumn("cos", F.round(cosine("__vec", "cent_vec"), 6))
           .select(id_col, "cluster_id", "cos"))
    return out, cent


def cluster_stats(assignments: DataFrame,
                  id_col: str = "vec_id") -> DataFrame:
    """Per-cluster summary: size, mean/min cosine-to-centroid, and a
    deterministic exemplar (the member closest to the centroid,
    min-id tie-break) — k rows out, one partial-agg shuffle.

    The exemplar is picked with a ``max_by`` over a struct ordered
    (cos desc, id asc) — no window, no second shuffle.

    ``mean_cos`` is computed ORDER-INDEPENDENTLY: the input ``cos``
    values are 6dp-rounded, so scaling by 10⁶ and rounding to long is
    exact, the integer sum is associative (no float summation-order
    ulps), and one final double division + round is deterministic on
    any engine. A plain ``avg(double)`` was observed 1 ulp across the
    6dp rounding boundary between Spark's shuffle order and DuckDB's
    sequential sum (round-6 gate work) — this form hash-matches by
    construction.
    """
    pick = F.struct(F.col("cos").alias("c"),
                    (-F.col(id_col)).alias("negid"))
    scaled = F.round(F.col("cos") * F.lit(1000000.0)).cast("long")
    return (assignments.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum(scaled).alias("__sum6"),
                 F.round(F.min("cos"), 6).alias("min_cos"),
                 F.max_by(F.col(id_col), pick).alias("exemplar_id"))
            .withColumn("mean_cos",
                        F.round(F.col("__sum6")
                                / (F.col("n_members") * F.lit(1000000.0)),
                                6))
            .select("cluster_id", "n_members", "mean_cos", "min_cos",
                    "exemplar_id")
            .orderBy("cluster_id"))


def cluster_balanced_sample(assignments: DataFrame, per_cluster: int,
                            id_col: str = "vec_id") -> DataFrame:
    """Take the ``per_cluster`` members nearest their centroid from
    every cluster — the cluster-balanced curation sample (keeps rare
    domains represented instead of letting head clusters dominate).

    One hash shuffle on ``cluster_id``; the per-cluster top-k is a
    window over already-colocated rows. Deterministic (cos desc, id
    asc ordering).
    """
    from pyspark.sql import Window

    if per_cluster < 1:
        raise ValueError(f"per_cluster={per_cluster} must be >= 1")
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.col("cos").desc(), F.col(id_col)))
    return (assignments.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= per_cluster).drop("__rk"))
