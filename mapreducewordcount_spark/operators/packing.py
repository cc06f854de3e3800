"""Sequence packing + mixture planning for training-data assembly.

``pack_sequences`` assigns documents to fixed-token-budget training
sequences; ``mixture_plan`` turns target mixture weights into
per-group sampling rates. Both are the *planning* half of a dataset
build — deterministic, oracle-checkable DataFrame math; the
*materialization* half (concatenate/tokenize/pad) is a narrow map
over the plan.

Scale design for packing: a single global greedy pack is a sequential
fold — the classic anti-pattern (one task, total order). Instead the
corpus is sharded deterministically (``doc_id % n_shards`` inside
each group) and each shard packs independently via a window cumsum:
every shard fills its own sequences, boundary waste is at most one
under-full sequence per shard, and the window runs as a normal
per-partition sort — embarrassingly parallel at any corpus size.
Choose ``n_shards`` ≈ cluster parallelism × a small factor; the
semantics stay exact and reproducible (pure function of doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.text_metrics import token_count


def pack_sequences(docs: DataFrame, budget_tokens: int = 512,
                   n_shards: int = 4, id_col: str = "doc_id",
                   group_col: str = "source", text_col: str = "text",
                   token_expr: Column | None = None) -> DataFrame:
    """doc → (shard, n_tokens, seq_id) packing assignment.

    Within each (group, shard), docs are laid out in ``id_col`` order
    and cut into sequences of ``budget_tokens`` by exclusive-prefix
    cumsum: ``seq_id = floor(prefix_tokens / budget)``. A document
    never splits; a sequence may overflow by at most one document —
    the standard "greedy contiguous" packing approximation, chosen
    because it is exact window algebra (same result in any engine)
    rather than a stateful fold.
    """
    tokens = token_expr if token_expr is not None else token_count(text_col)
    d = docs.select(
        F.col(id_col), F.col(group_col),
        (F.col(id_col) % n_shards).alias("shard"),
        tokens.cast("long").alias("n_tokens"))
    w = (Window.partitionBy(group_col, "shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn(
        "seq_id", F.floor(prefix / F.lit(float(budget_tokens))))


def mixture_plan(docs: DataFrame, weights: dict[str, float],
                 budget_tokens: int, group_col: str = "lang",
                 text_col: str = "text",
                 token_expr: Column | None = None) -> DataFrame:
    """Target mixture weights → per-group sampling rates.

    For each group: its token inventory, normalized target weight,
    token allocation out of ``budget_tokens``, and the sampling rate
    ``alloc / inventory`` (>1 ⇒ upsample / multiple epochs). Groups
    absent from ``weights`` get weight 0 (dropped from the mix but
    still reported).

    The weights table is a handful of rows — joined via
    ``F.broadcast`` so the fact side never shuffles; the whole plan
    is one partial-aggregated groupBy at any corpus size.
    """
    spark = docs.sparkSession
    tokens = token_expr if token_expr is not None else token_count(text_col)
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError(
            f"mixture weights must sum to > 0, got {total_w!r} "
            f"from {len(weights)} entries — an all-zero/empty mix has "
            "no defined sampling rates")
    wdf = spark.createDataFrame(
        [(k, v / total_w) for k, v in weights.items()],
        f"{group_col} string, weight double")
    inv = (docs
           .select(F.col(group_col), tokens.cast("long").alias("n_tokens"))
           .groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("tokens_available")))
    return (inv
            .join(F.broadcast(wdf), group_col, "left")
            .select(
                group_col, "n_docs", "tokens_available",
                F.round(F.coalesce("weight", F.lit(0.0)), 6).alias("weight"),
                F.floor(F.coalesce("weight", F.lit(0.0))
                        * budget_tokens).alias("tokens_target"))
            .withColumn(
                "sample_rate",
                # a group can aggregate to 0 available tokens (all
                # empty texts); 0.0 beats a NULL from 0-division
                F.when(F.col("tokens_available") > 0,
                       F.round(F.col("tokens_target")
                               / F.col("tokens_available").cast("double"), 6))
                .otherwise(F.lit(0.0))))


def apply_mixture(docs: DataFrame, plan: DataFrame,
                  group_col: str = "lang",
                  key_col: str = "doc_id") -> DataFrame:
    """EXECUTE a mixture plan: per-group deterministic hash-Bernoulli
    selection at each group's ``sample_rate``.

    The plan→execution half that ``mixture_plan`` leaves open. The
    selector is the engine's standard reproducible sampler
    (``functions/sampling.py`` rationale): ``md5(key)``'s first 4 hex
    digits as a fraction of 65536 compared against the group's rate —
    a row-local predicate, same rows kept on any engine/partitioning/
    day. Re-applying a plan on the same key NESTS (keeps the
    min-rate slice — both passes rank rows by the same digest), it
    does not multiply; salt the key per application for independent
    draws (``functions/sampling.py`` rationale). md5 (not xxhash64)
    so an oracle engine replicates the exact selection.

    Rates ≥ 1 (upsampling groups) keep every row — repetition across
    epochs is ``epoch_shuffle`` territory, not a sampler concern.
    The plan side is a handful of rows → broadcast join; the corpus
    never shuffles. 4 hex digits ⇒ 1/65536 rate granularity.
    """
    frac = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4),
                   16, 10).cast("double") / 65536.0)
    return (docs.join(F.broadcast(plan.select(group_col, "sample_rate")),
                      group_col)
            .filter(frac < F.col("sample_rate")))
