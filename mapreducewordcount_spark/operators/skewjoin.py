"""Salted equi-join for skewed keys.

AQE's skew-join splitting (on in the session defaults) handles most
skew by splitting oversized shuffle partitions, but it only works for
sort-merge joins after stats exist, and it cannot help when one
logical KEY (not partition) is hot enough that a single join task
still receives it whole. The classic manual remedy, exposed here as a
first-class operator:

- the BIG side appends a deterministic salt in ``[0, buckets)``
  hashed from a caller-owned per-row discriminator (same invariant as
  ``functions.buckets.salted_key``: retries must reproduce the salt,
  so ``rand()`` is forbidden);
- the SMALL side is replicated ``buckets``× via an exploded literal
  array (rows × buckets, so pick buckets to taste — this is the cost
  knob);
- the join runs on ``(key, salt)``, spreading each hot key over
  ``buckets`` reducers.

Result equals the plain equi-join exactly (inner/left semantics
preserved: replication is keyed, each big-side row still meets each
matching small-side row exactly once).

At 100 TB: use this when ONE key holds >~1 shuffle partition of rows
(null-heavy foreign keys, a mega-customer, the word "the") and the
small side is too big to broadcast outright but cheap to replicate
k×. Otherwise prefer broadcast (no shuffle at all) or AQE.

Reference parity note: the reference's ``ord(w[0]) % M`` partitioner
is the skew *exhibit* (SURVEY.md §1.4); this is the cure, no
reference counterpart (§2.5 extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_from: str, buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key spread.

    ``salt_from``: deterministic per-row discriminator column on the
    big side. ``how``: 'inner' or 'left' (the semantics where the big
    side drives the result; right/full would need the small side
    de-replicated and are out of scope)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    overlap = (set(big.columns) & set(small.columns)) - {key}
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}")

    b = big.withColumn(_SALT, F.pmod(F.xxhash64(salt_from), F.lit(buckets)))
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return b.join(s, [key, _SALT], how).drop(_SALT)


def key_skew_report(df: DataFrame, key: str, *, top_n: int = 10,
                    target_rows_per_task: int = 100_000) -> DataFrame:
    """Hot-key diagnostics for a join/agg key — the report that tells
    you whether ``salted_join`` (and with how many ``buckets``) is
    worth it before you burn a 100 TB shuffle discovering it.

    Per hottest key (top ``top_n`` by count, key ascending on ties):

    - ``n_rows``, ``share_ppm`` (``count * 1e6 div total`` — integer,
      so the report is deterministic and oracle-exact; no floats
      anywhere in the operator);
    - ``cum_share_ppm`` — running concentration over the ranked keys;
    - ``salt_buckets`` — ``ceil(n_rows / target_rows_per_task)``, the
      ``buckets`` argument that would cap this key's largest join
      task at the target (1 = no salting needed);
    - corpus context repeated per row: ``total_rows``, ``n_keys``.

    Plan shape: one groupBy(key) aggregate (the same shuffle the real
    join would do, but carrying only the key and a count), a 1-row
    totals frame joined broadcast, and top-n via orderBy+limit
    (``TakeOrderedAndProject``); the running-sum window runs over the
    already-cut ``top_n``-row frame. NULL keys are counted like any
    other value (they hash to one reducer too — often THE hot key).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if target_rows_per_task < 1:
        raise ValueError("target_rows_per_task must be >= 1")

    counts = df.groupBy(F.col(key).alias("key")) \
               .agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(F.sum("n_rows").alias("total_rows"),
                        F.count(F.lit(1)).alias("n_keys"))
    # nulls LAST on the tie-break, matching ANSI/DuckDB default ASC
    # ordering (Spark's default is nulls-first) — a NULL hot key at
    # the top_n boundary must cut identically in both engines.
    order = (F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    top = (counts.orderBy(*order)
                 .limit(top_n)
                 .join(F.broadcast(totals)))
    w = (Window.orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = target_rows_per_task
    return top.select(
        F.col("key").alias(key),
        "n_rows",
        F.expr("n_rows * 1000000 div total_rows").alias("share_ppm"),
        (F.sum(F.expr("n_rows * 1000000 div total_rows")).over(w)
         ).alias("cum_share_ppm"),
        F.expr(f"(n_rows + {t - 1}) div {t}").alias("salt_buckets"),
        "total_rows", "n_keys")
