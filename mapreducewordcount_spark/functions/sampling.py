"""Deterministic content-hash sampling.

``rand()``-based sampling is non-reproducible across reruns, engines,
and partition layouts — useless for a training-data pipeline that
must be re-derivable. The standard fix: hash a stable key and keep
rows whose digest falls below a threshold. Same rows selected on any
engine, any partitioning, any day; re-applications on the SAME key
NEST rather than multiply (a 25% pass over a 50% sample keeps the
min(25%, 50%) = 25% slice, because both passes rank rows by the same
digest — deterministic subsetting, which is usually what a pipeline
wants: lowering a rate shrinks the sample in place). For independent
draws, salt the key per application (``md5(key || salt)``) — then
rates multiply. It needs no shuffle, no state, no seed bookkeeping —
it is a pure row-local predicate that pipelines into the scan.

Granularity note: thresholds are expressed as a 2-hex-digit prefix
bound (1/256 steps ≈ 0.4%). Widen the prefix for finer rates; the
comparison stays a plain string compare either way (hex digits sort
lexicographically by value).

Reference parity note: no counterpart in the reference engine
(SURVEY.md §2.5 extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bernoulli(key: Column | str, threshold_hex: str) -> Column:
    """True for rows whose md5(key) 2-hex-digit prefix is below
    ``threshold_hex`` — a deterministic Bernoulli(threshold/256)
    selection on the key's content."""
    if not (len(threshold_hex) == 2
            and all(c in "0123456789abcdef" for c in threshold_hex)):
        raise ValueError(f"threshold_hex must be 2 lowercase hex digits, "
                         f"got {threshold_hex!r}")
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(k.cast("string")), 1, 2) < F.lit(threshold_hex)


def stratified_hash_sample(strata_col: Column | str,
                           key: Column | str,
                           rates: dict[str, str],
                           default_hex: str = "00") -> Column:
    """Per-stratum deterministic sampling predicate: ``rates`` maps a
    stratum value to its 2-hex-digit threshold; unlisted strata use
    ``default_hex`` ('00' = drop). The predicate is row-local — at
    100 TB this is a scan-side filter, never a shuffle."""
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    pred = hash_bernoulli(key, default_hex) if default_hex != "00" \
        else F.lit(False)
    for value, thresh in rates.items():
        pred = F.when(s == value, hash_bernoulli(key, thresh)).otherwise(pred)
    return pred


def epoch_shuffle_key(key: Column | str, epoch: int) -> Column:
    """Deterministic per-epoch shuffle key: ``md5(key ':' epoch)``.

    Training runs need a REPRODUCIBLE corpus order that still changes
    between epochs; ordering by a salted content hash gives exactly
    that — same (key, epoch) → same position on any engine, any
    partitioning, any day, while different epochs decorrelate the
    order. md5 (not xxhash64) on purpose: the oracle engine computes
    the identical hex string, so the order itself is oracle-checkable.
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(k.cast("string"), F.lit(f":{int(epoch)}")))


def epoch_shard(key: Column | str, epoch: int, n_shards: int) -> Column:
    """Deterministic shard assignment for the epoch: the shuffle
    key's first 4 hex digits as an integer (uniform on [0, 65536)),
    folded to ``[0, n_shards)``.

    The earlier form folded raw ``ascii()`` codes of the hex chars —
    but hex ascii codes occupy two disjoint bands (48-57, 97-102),
    so for power-of-two n_shards > 8 whole shards received ZERO rows
    (measured: n_shards=16 left shards 10-15 empty; even n_shards=8
    was 3× load-skewed). Parsing the digits to their 0-15 values
    first makes the fold uniform for any n_shards ≤ 65536; an oracle
    engine replicates it with per-digit ``instr`` arithmetic.

    Shard count is the parallelism knob: at cluster scale pick
    n_shards ≈ writers × small factor; within a shard, order by
    ``epoch_shuffle_key`` — a per-shard sort, never a global one.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards={n_shards} must be positive")
    h = epoch_shuffle_key(key, epoch)
    v = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    return F.pmod(v, F.lit(n_shards))


def dataset_split(key: Column | str, fracs: dict[str, float],
                  salt: str = "split") -> Column:
    """Deterministic train/val/test split assignment.

    ``md5(key ':' salt)``'s first 4 hex digits give a uniform integer
    on [0, 65536); cumulative ``floor(frac · 65536)`` thresholds carve
    it into one band per split, so every row's split is a pure
    function of its key — stable across engines, partitionings and
    reruns, and disjoint/exhaustive by construction. The salt
    decorrelates the split from every other md5-keyed decision in the
    pipeline (sampling, epoch shuffle), so "is in val" is independent
    of "was sampled". Row-local predicate — a scan-side projection at
    any scale, no shuffle.

    ``fracs`` is ordered (insertion order = band order) and must sum
    to 1 within 1/65536; the LAST split absorbs the rounding tail so
    the bands always cover the full range.
    """
    if not fracs:
        raise ValueError("fracs must name at least one split")
    total = sum(fracs.values())
    if abs(total - 1.0) > 1.0 / 65536:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(
        F.md5(F.concat(k.cast("string"), F.lit(f":{salt}"))), 1, 4),
        16, 10).cast("long")
    names = list(fracs)
    expr = F.lit(names[-1])  # last band absorbs the rounding tail
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += fracs[name]
        bounds.append((name, int(cum * 65536)))
    for name, bound in reversed(bounds):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return expr


def weighted_sample_key(key: Column | str, weight: Column) -> Column:
    """Efraimidis–Spirakis weighted sampling-WITHOUT-replacement key,
    in an integer-exact form: the max of ``weight`` independent
    deterministic md5 draws.

    A-ES ranks rows by u^(1/w) (u uniform) and takes the top-k; for
    integer weights the same rank distribution comes from
    max(u_1..u_w), since P(max of w uniforms < x) = x^w — which is
    exactly the CDF of u^(1/w). Using the md5 hex strings themselves
    as the uniforms (fixed-length hex compares lexicographically =
    numerically) removes every float from the scheme: no pow/ln libm
    calls whose final-ulp differences could flip a rank cross-engine.

    Row-local expression — at 100 TB this is a scan-side projection;
    the top-k that follows is a per-partition heap + single reduce
    (TakeOrderedAndProject), never a full sort. Weights must be
    positive integers, small by design (they multiply per-row hash
    work); quantize real-valued weights to a small integer grid
    first. Invalid weights (NULL or < 1) yield a NULL key, so those
    rows lose every top-k comparison instead of silently inverting
    the distribution: Spark's ``sequence(1, 0)`` counts DOWN, so an
    unguarded weight of 0 would take TWO md5 draws (j=1, j=0) and
    make zero-weight rows MORE likely to win than weight-1 rows
    (ADVICE r7).
    """
    k = F.col(key) if isinstance(key, str) else key
    draw = F.array_max(F.transform(
        F.sequence(F.lit(1), weight),
        lambda j: F.md5(F.concat_ws(
            ":", k.cast("string"), j.cast("string")))))
    return F.when(weight >= 1, draw).otherwise(F.lit(None).cast("string"))
