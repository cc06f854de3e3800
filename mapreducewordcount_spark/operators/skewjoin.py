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

from pyspark.sql import Column, DataFrame
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
