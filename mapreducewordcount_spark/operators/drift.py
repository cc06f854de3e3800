"""Corpus drift: per-source total-variation distance from the rest
of the corpus over hashed token buckets — the distribution-shift
monitor a training pipeline runs across crawl snapshots and feeds
(which source moved? which vocabulary region moved it?) before any
model-based quality signal reacts.

Why total variation and why this arithmetic: TV = ½ Σ_b |p_b − q_b|
over a FIXED hashed vocabulary (the DSIR bucket recipe:
md5-hex4(salt+word) mod N_BUCKETS — exactly uniform, cross-engine).
The per-bucket term cross-multiplies to integers,

    |c_sb · N_r − c_rb · N_s|   (c = bucket counts, N = totals),

so the whole statistic is an exact BIGINT sum — merge-order and
partition invariant, no float accumulation — divided ONCE by
2·N_s·N_r for the reported distance (a single IEEE divide both
engines perform identically; the KL/JSD alternatives need per-bucket
logs, which is what keeps them off the gate). Overflow headroom:
c·N ≤ 2⁶³ holds to ~3×10⁹ tokens per side; past that the sum column
moves to DECIMAL(38,0) with identical semantics (SCALE.md).

Scale shape: one partial-agg groupBy to (source, bucket) —
≤ |sources| × N_BUCKETS rows — then the dense grid (totals ×
sources, a broadcast-sized frame) left-joined with the counts;
everything after the first aggregate is bucket algebra, never a
second corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 1024    # must divide 65536 (exact-uniform md5 fold)
_SALT = "drift:"


def token_bucket_counts(docs: DataFrame, group_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """(group, bucket, c) hashed unigram counts — one explode + one
    partial-agg groupBy; ≤ |groups| × N_BUCKETS rows out."""
    from mapreducewordcount_spark.functions.tokenize import tokenize_expr

    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(_SALT), F.col("word"))), 1, 4),
            16, 10).cast("long"),
        F.lit(N_BUCKETS))
    return (docs
            .select(F.col(group_col).alias("grp"),
                    F.explode(tokenize_expr(text_col)).alias("word"))
            .select("grp", bucket.alias("bucket"))
            .groupBy("grp", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def tv_drift_vs_rest(counts: DataFrame) -> DataFrame:
    """Per-group drift report from a (grp, bucket, c) frame:
    ``n_tokens``, ``tv_vs_rest`` (exact-integer numerator, one final
    divide, 6dp), and the most-drifted bucket (``top_bucket``, ties →
    smallest id) with its integer cross-difference ``top_diff``."""
    tot_b = counts.groupBy("bucket").agg(F.sum("c").alias("c_all"))
    tot_g = counts.groupBy("grp").agg(F.sum("c").alias("n_g"))
    n_all = counts.agg(F.sum("c").alias("n_all"))
    # dense grid: every (group, bucket-with-mass) cell, zero-filled —
    # a one-sided bucket still contributes its full cross-difference
    grid = (tot_g.crossJoin(F.broadcast(tot_b))
            .join(counts, ["grp", "bucket"], "left")
            .crossJoin(F.broadcast(n_all))
            .select("grp", "bucket", "n_g", "n_all",
                    F.coalesce("c", F.lit(0)).alias("c_g"),
                    (F.col("c_all") - F.coalesce("c", F.lit(0)))
                    .alias("c_r")))
    diff = F.abs(F.col("c_g") * (F.col("n_all") - F.col("n_g"))
                 - F.col("c_r") * F.col("n_g"))
    cells = grid.select("grp", "bucket", "n_g", "n_all",
                        diff.alias("diff"))
    w = (Window.partitionBy("grp")
         .orderBy(F.col("diff").desc(), F.col("bucket")))
    top = (cells.withColumn("__r", F.row_number().over(w))
           .filter(F.col("__r") == 1)
           .select("grp", F.col("bucket").alias("top_bucket"),
                   F.col("diff").alias("top_diff")))
    agg = (cells.groupBy("grp", "n_g", "n_all")
           .agg(F.sum("diff").alias("num")))
    n_r = F.col("n_all") - F.col("n_g")
    tv = F.when((F.col("n_g") > 0) & (n_r > 0),
                F.round(F.col("num")
                        / (2.0 * F.col("n_g") * n_r), 6)) \
        .otherwise(F.lit(0.0))
    return (agg.join(top, "grp")
            .select(F.col("grp").alias("source"),
                    F.col("n_g").alias("n_tokens"),
                    tv.alias("tv_vs_rest"),
                    "top_bucket", "top_diff"))
