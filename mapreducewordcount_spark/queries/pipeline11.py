"""Round-12 additions: deterministic bottom-k reservoir sampling,
event retention cohorts, and the dedup cluster-size report.

Reference parity: none — extension surface (SURVEY.md §2.5); the
reference engine (/root/reference/src, 549 LoC) has no sampling,
cohort, or clustering layer.

Oracle notes: all three are FULLY SQL-expressible — no artifacts.
The reservoir sample rides the repo's cross-engine md5 recipe; the
retention cohort arithmetic is integer month indexes (no interval
arithmetic, which the two engines round differently); the cluster
stats reuse ``dedup_groups``'s recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.sampling import (
    RSV_SALT as _RSV_SALT,
    reservoir_hash,
)
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table

#: per-source reservoir capacity for the gate query
RESERVOIR_K = 20


def doc_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per source — the distributed form of
    reservoir sampling (Vitter 1985 Algorithm R semantics): keep the
    ``k`` items with the SMALLEST uniform hash per group (bottom-k).
    Both yield a uniform k-subset, but bottom-k is mergeable —
    ``merge(R_a, R_b) = bottom_k(R_a ∪ R_b)`` — so partitions sample
    independently and a partial-agg/top-k heap combines them with no
    sequential scan, no RNG state, and replay-stable results (the
    hash IS the randomness; a retried task picks the same rows).
    That mergeability is also the streaming story: yesterday's
    reservoir plus today's batch re-merge in register time.

    Plan shape: one window top-k per source (rank over
    ``md5(salt‖doc_id)``) — Catalyst runs it as a partial top-k
    before the shuffle, so the wire carries ≤ k rows per source per
    partition, never the corpus. ``n_in_source`` (the group size the
    sample represents) rides the same window pass.

    Output: (source, sample_rank, doc_id, n_chars, n_in_source).
    """
    docs = load_table(spark, sf_dir, "documents")
    hk = reservoir_hash("doc_id")
    w = Window.partitionBy("source").orderBy(hk, "doc_id")
    wn = Window.partitionBy("source")
    return (docs
            .select("source", "doc_id", "n_chars")
            .withColumn("sample_rank", F.row_number().over(w))
            .withColumn("n_in_source",
                        F.count(F.lit(1)).over(wn).cast("long"))
            .filter(F.col("sample_rank") <= RESERVOIR_K)
            .select("source", F.col("sample_rank").cast("int"),
                    "doc_id", "n_chars", "n_in_source"))


DOC_RESERVOIR_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('{_RSV_SALT}' || doc_id),
                                     doc_id) AS sample_rank,
         count(*) OVER (PARTITION BY source) AS n_in_source
  FROM documents
)
SELECT source, CAST(sample_rank AS INT) AS sample_rank, doc_id,
       n_chars, CAST(n_in_source AS BIGINT) AS n_in_source
FROM ranked WHERE sample_rank <= {RESERVOIR_K}
"""


#: per-(source, quality-tier) capacity for the stratified sample
STRATUM_K = 5


def doc_stratified_reservoir(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Quality-stratified reservoir (VERDICT r12 next#6 — the two
    r12 primitives COMPOSED): ``STRATUM_K`` docs per (source,
    quality tier), i.e. the sample a human-eval batch actually
    draws — uniform within each stratum so low-quality strata are
    represented instead of drowned out by volume. Reuses the
    bottom-k-by-hash reservoir verbatim (``operators/sampling`` —
    same salt, same mergeability/replay story as
    :func:`doc_reservoir_sample`, only the partition key widens to
    the stratum) and the discrete quality tiers of the curriculum
    query (``quality_score`` sums of {.3,.2,.3,.2} weights: ≥0.8
    high, ≥0.5 mid, else low — a CASE, no window/ntile needed).

    Plan shape: one tokenizer pass for the quality signals, then a
    single window top-k per stratum (partial top-k before the
    shuffle: ≤ k rows per stratum per partition on the wire, never
    the corpus). ``n_in_stratum`` — the population the k rows
    represent, the Horvitz-Thompson denominator when re-weighting
    eval results — rides the same window pass.

    Output: (source, tier, sample_rank, doc_id, quality,
    n_in_stratum).
    """
    from mapreducewordcount_spark.functions import text_metrics as tm
    from mapreducewordcount_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "source", "doc_id",
        F.round(tm.quality_score("text"), 4).alias("quality"))
    scored = scored.withColumn(
        "tier",
        F.when(F.col("quality") >= 0.8, F.lit("high"))
        .when(F.col("quality") >= 0.5, F.lit("mid"))
        .otherwise(F.lit("low")))
    hk = reservoir_hash("doc_id")
    w = Window.partitionBy("source", "tier").orderBy(hk, "doc_id")
    wn = Window.partitionBy("source", "tier")
    return (scored
            .withColumn("sample_rank", F.row_number().over(w))
            .withColumn("n_in_stratum",
                        F.count(F.lit(1)).over(wn).cast("long"))
            .filter(F.col("sample_rank") <= STRATUM_K)
            .select("source", "tier",
                    F.col("sample_rank").cast("int").alias("sample_rank"),
                    "doc_id", "quality", "n_in_stratum"))


def _stratified_reservoir_sql() -> str:
    from mapreducewordcount_spark.queries.analytics import (
        DOC_QUALITY_SQL,
    )

    return f"""
WITH dq AS ({DOC_QUALITY_SQL}),
t AS (
  SELECT d.source, dq.doc_id, dq.quality,
         CASE WHEN dq.quality >= 0.8 THEN 'high'
              WHEN dq.quality >= 0.5 THEN 'mid'
              ELSE 'low' END AS tier
  FROM dq JOIN documents d ON dq.doc_id = d.doc_id
),
ranked AS (
  SELECT source, tier, doc_id, quality,
         row_number() OVER (PARTITION BY source, tier
                            ORDER BY md5('{_RSV_SALT}' || doc_id),
                                     doc_id) AS sample_rank,
         count(*) OVER (PARTITION BY source, tier) AS n_in_stratum
  FROM t
)
SELECT source, tier, CAST(sample_rank AS INT) AS sample_rank, doc_id,
       quality, CAST(n_in_stratum AS BIGINT) AS n_in_stratum
FROM ranked WHERE sample_rank <= {STRATUM_K}
"""


#: retention horizon (week offsets 0..N reported)
RETENTION_MAX_OFFSET = 6


def events_retention_cohorts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle over the events stream:
    users are cohorted by the WEEK of their FIRST event; for each
    (cohort, week offset) the report counts users active that week
    and the retention rate vs the cohort's size — the table every
    growth dashboard draws, and at pipeline scale the health monitor
    for a user-interaction corpus (a cohort whose retention cliff
    moves is a collection change). Weekly, not monthly: weeks are a
    FIXED-WIDTH integer division of epoch days, so offsets are exact
    subtraction with no calendar arithmetic (month lengths are where
    engines disagree), and the gate corpus — a single month of
    events at every SF — still yields a real triangle.

    Plan shape: one distinct to user-week activity (the corpus
    touch), a per-user min (partial agg), one self-join on user_id
    sharded by the grouping — no window over the raw stream.

    Output: (cohort, offset, cohort_size, n_active, retention);
    ``cohort`` is the ISO date of the week's first day (epoch-aligned
    weeks: day 0 = 1970-01-01).
    """
    ev = load_table(spark, sf_dir, "events")
    epoch = F.to_date(F.lit("1970-01-01"))
    um = (ev.select("user_id",
                    F.floor(F.datediff(F.col("ts").cast("date"),
                                       epoch) / 7)
                    .cast("long").alias("widx"))
          .distinct())
    first = um.groupBy("user_id").agg(F.min("widx").alias("cidx"))
    act = (um.join(first, "user_id")
           .select("user_id", "cidx",
                   (F.col("widx") - F.col("cidx")).cast("int")
                   .alias("offset"))
           .filter(F.col("offset") <= RETENTION_MAX_OFFSET))
    cohort = F.date_add(epoch, (F.col("cidx") * 7).cast("int")) \
        .cast("string")
    by_off = (act.groupBy(cohort.alias("cohort"), "offset")
              .agg(F.countDistinct("user_id").alias("n_active")))
    size = (by_off.filter(F.col("offset") == 0)
            .select("cohort", F.col("n_active").alias("cohort_size")))
    return (by_off.join(size, "cohort")
            .select("cohort", "offset", "cohort_size", "n_active",
                    F.round(F.col("n_active")
                            / F.col("cohort_size").cast("double"), 4)
                    .alias("retention")))


EVENTS_RETENTION_SQL = f"""
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) // 7 AS BIGINT) AS widx
  FROM events
),
first AS (SELECT user_id, min(widx) AS cidx FROM um GROUP BY 1),
act AS (
  SELECT um.user_id, f.cidx,
         CAST(um.widx - f.cidx AS INT) AS "offset"
  FROM um JOIN first f USING (user_id)
  WHERE um.widx - f.cidx <= {RETENTION_MAX_OFFSET}
),
by_off AS (
  SELECT CAST(DATE '1970-01-01' + CAST(cidx * 7 AS INT) AS VARCHAR)
           AS cohort,
         "offset", CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM act GROUP BY 1, 2
),
size AS (SELECT cohort, n_active AS cohort_size FROM by_off
         WHERE "offset" = 0)
SELECT b.cohort, b."offset" AS offset, s.cohort_size, b.n_active,
       round(b.n_active / CAST(s.cohort_size AS DOUBLE), 4)
         AS retention
FROM by_off b JOIN size s USING (cohort)
"""


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over near-dup connected components —
    the capacity-planning view of a dedup run: how many clusters of
    each size exist, how many documents they hold, and how many rows
    survivor-selection will drop (``size − 1`` per cluster). The
    histogram is what decides whether dedup output is dominated by
    pair noise (many 2-clusters) or template explosions (few huge
    clusters — the rows that blow up survivor selection and deserve
    a manual look BEFORE a 100 TB pass commits to keep-one).

    Composes the committed near-dup pipeline (``shingle_jaccard_pairs``
    → ``dup_groups`` min-label components) with two bounded
    aggregates; singleton documents (never in any pair) are reported
    as size-1 clusters from set difference, not a join back to pairs.

    Output: (cluster_size, n_clusters, n_docs, n_dropped).
    """
    from mapreducewordcount_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.shingle_jaccard_pairs(docs, threshold=0.5)
    groups = dd.dup_groups(pairs)
    sizes = (groups.groupBy("group_id")
             .agg(F.count(F.lit(1)).alias("sz")))
    multi = (sizes.groupBy(F.col("sz").cast("long")
                           .alias("cluster_size"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"),
                  F.sum("sz").cast("long").alias("n_docs")))
    # singletons: total − grouped, two 1-row aggregates (bounded BNLJ)
    single = (docs.agg(F.count(F.lit(1)).alias("__total"))
              .crossJoin(groups.agg(F.count(F.lit(1))
                                    .alias("__grouped")))
              .select(F.lit(1).cast("long").alias("cluster_size"),
                      (F.col("__total") - F.col("__grouped"))
                      .cast("long").alias("n_clusters"),
                      (F.col("__total") - F.col("__grouped"))
                      .cast("long").alias("n_docs")))
    return (multi.unionByName(single)
            .withColumn("n_dropped",
                        (F.col("n_docs") - F.col("n_clusters"))
                        .cast("long")))


def _dedup_cluster_stats_sql() -> str:
    from mapreducewordcount_spark.queries.dedup_queries import (
        _SHINGLES_CTE,
        _WORDS_CTE,
    )

    return f"""
WITH RECURSIVE {_WORDS_CTE}, {_SHINGLES_CTE},
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= 0.5
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
comp AS (SELECT id AS doc_id, min(r) AS group_id
         FROM reach GROUP BY id),
sizes AS (SELECT group_id, count(*) AS sz FROM comp GROUP BY 1),
multi AS (
  SELECT CAST(sz AS BIGINT) AS cluster_size,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(sum(sz) AS BIGINT) AS n_docs
  FROM sizes GROUP BY 1
),
tot AS (SELECT count(*) AS total FROM documents),
grp AS (SELECT count(*) AS grouped FROM comp),
single AS (
  SELECT CAST(1 AS BIGINT) AS cluster_size,
         CAST(tot.total - grp.grouped AS BIGINT) AS n_clusters,
         CAST(tot.total - grp.grouped AS BIGINT) AS n_docs
  FROM tot, grp
)
SELECT cluster_size, n_clusters, n_docs,
       CAST(n_docs - n_clusters AS BIGINT) AS n_dropped
FROM (SELECT * FROM multi UNION ALL SELECT * FROM single)
"""


QUERIES = {
    "doc_reservoir_sample": QuerySpec(doc_reservoir_sample,
                                      DOC_RESERVOIR_SQL),
    "doc_stratified_reservoir": QuerySpec(doc_stratified_reservoir,
                                          _stratified_reservoir_sql()),
    "events_retention_cohorts": QuerySpec(events_retention_cohorts,
                                          EVENTS_RETENTION_SQL),
    "dedup_cluster_stats": QuerySpec(dedup_cluster_stats,
                                     _dedup_cluster_stats_sql()),
}
