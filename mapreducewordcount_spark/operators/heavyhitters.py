"""Two-pass distributed heavy hitters (Misra-Gries + exact verify).

``groupBy(key).count()`` finds frequent keys exactly, but at 100 TB
its shuffle carries EVERY distinct key — for token streams that is
the whole vocabulary (billions of keys for web-scale n-grams). The
communication-optimal classic:

- **Pass 1 (candidates)**: each partition folds its stream into a
  Misra-Gries summary of ``capacity`` counters — O(capacity) memory,
  one pass, no shuffle. The summaries (``<= capacity × partitions``
  rows, vs one row per distinct key) are unioned and summed; MG
  summaries are mergeable (Agarwal et al., "Mergeable Summaries",
  PODS 2012): total undercount after any merge tree is at most
  ``n/(capacity+1)``, so every key with true count ``>= n/(capacity+1)``
  survives into the merged summary. With ``capacity + 1 > 1/phi`` the
  candidate set provably contains every phi-heavy hitter.
- **Pass 2 (exact verify)**: the candidate frame is tiny; broadcast
  it back over the stream and count candidates exactly, keeping those
  with ``count * denom >= n`` (the threshold compare is integer —
  no float anywhere in the operator, so the output is deterministic
  and DuckDB-oracleable despite the partition-dependent summaries).

The output is therefore EXACT — identical to the full groupBy answer
— while the only vocabulary-wide structure ever materialized is the
bounded summary. Reference parity: none (extension surface §2.5);
the stream being summarized is the reference's D8 word stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(tokens: DataFrame, col: str,
                          capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``col`` stream.

    Returns ``(key STRING, weight BIGINT)`` with at most ``capacity``
    rows per input partition. Weights UNDERCOUNT by at most
    ``n_partition/(capacity+1)``; they are candidates, not counts.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    # Vectorized fold (VERDICT r7 next#3): instead of the classic
    # per-token decrement loop (row-at-a-time Python — the per-
    # executor throughput ceiling at 100 TB), count each Arrow batch
    # EXACTLY with pandas value_counts (C-speed hash aggregation),
    # then MG-MERGE the batch counts into the bounded summary. An
    # exact count is a zero-error MG summary, and the mergeable-
    # summaries COMBINE (Agarwal et al., PODS 2012) — sum counters,
    # then subtract the (capacity+1)-th largest weight from all and
    # drop non-positives — preserves the total undercount bound
    # <= n/(capacity+1), so candidate completeness is unchanged. The
    # Python dict work is now O(distinct-per-batch + capacity) per
    # batch instead of O(tokens). The candidate SET can differ from
    # the per-token fold's (both are valid MG summaries); pass 2's
    # exact verify makes the operator's OUTPUT identical either way.
    # Measured ceiling (SCALE.md round 8): 3.6 -> 5.0 M tokens/s/core
    # on a zipf text-like stream; on NEAR-UNIFORM keys (distinct per
    # batch ~ batch size) the per-distinct merge degenerates to
    # per-token work and the classic loop is ~2x better — but no
    # uniform stream has phi-heavy hitters worth finding, so the
    # zipf regime is the design point.
    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict[str, int] = {}
        for batch in batches:
            for key, cnt in batch[col].value_counts(dropna=True).items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > capacity:
                vals = np.fromiter(counters.values(), dtype=np.int64,
                                   count=len(counters))
                # (capacity+1)-th largest weight; keys strictly above
                # it survive — at most `capacity` of them by definition
                thresh = np.partition(vals, len(vals) - capacity - 1)[
                    len(vals) - capacity - 1]
                counters = {k: v - int(thresh)
                            for k, v in counters.items() if v > thresh}
        if counters:
            yield pd.DataFrame({"key": list(counters.keys()),
                                "weight": list(counters.values())})

    return tokens.select(F.col(col).alias(col)).mapInPandas(
        fold, schema="key string, weight long")


def heavy_hitters(tokens: DataFrame, col: str, *,
                  phi_num: int = 1, phi_denom: int = 100,
                  capacity: int | None = None) -> DataFrame:
    """Exact phi-heavy hitters of the ``col`` stream, two-pass.

    ``phi = phi_num/phi_denom`` as a rational so the threshold
    compare is integer-exact. ``capacity`` defaults to the smallest
    power of two > 1/phi (the completeness bound).

    Returns ``(key, n_occurrences BIGINT, share_ppm BIGINT)`` for
    every key with ``count * phi_denom >= n * phi_num``; ``share_ppm``
    is ``count * 1_000_000 div n`` (integer, order-invariant).
    """
    need = phi_denom // phi_num + 1
    if capacity is None:
        capacity = 1
        while capacity < need:
            capacity *= 2
    if capacity + 1 <= phi_denom / phi_num:
        raise ValueError(
            f"capacity {capacity} cannot guarantee completeness at "
            f"phi={phi_num}/{phi_denom}; need capacity+1 > 1/phi")

    stream = tokens.select(F.col(col).cast("string").alias("key")) \
                   .filter(F.col("key").isNotNull())

    # pass 1: bounded summaries -> merged candidate frame (tiny).
    cands = (misra_gries_summaries(stream, "key", capacity)
             .groupBy("key").agg(F.sum("weight").alias("w"))
             .select("key"))

    total = stream.agg(F.count(F.lit(1)).alias("n"))

    # pass 2: exact counts of candidates only — the broadcast join
    # keeps the groupBy shuffle bounded by the candidate set.
    exact = (stream.join(F.broadcast(cands), "key")
                   .groupBy("key")
                   .agg(F.count(F.lit(1)).alias("n_occurrences")))

    return (exact.join(F.broadcast(total))
            .filter(F.col("n_occurrences") * F.lit(phi_denom)
                    >= F.col("n") * F.lit(phi_num))
            .select("key", "n_occurrences",
                    F.expr("n_occurrences * 1000000 div n")
                     .alias("share_ppm")))
