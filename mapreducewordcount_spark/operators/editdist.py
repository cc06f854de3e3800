"""Edit-distance similarity join: exact pairs within Levenshtein τ.

The classic data-cleaning / entity-resolution operator (fuzzy name
matching, near-duplicate titles). Published method: the PassJoin
partition scheme (Li, Deng, Jiang, Feng 2011, "PassJoin: A
Partition-based Method for Similarity Joins"): split every string
into τ+1 contiguous segments — τ edits can damage at most τ of them,
so for any pair within distance τ at least one segment of either
string survives UNTOUCHED and therefore occurs verbatim in the other
string, displaced by at most the net indels before it (≤ τ). That
pigeonhole turns the quadratic join into an equi-join on
(segment_text, segment_index, source_length) keys plus a
Levenshtein verify — no all-pairs comparison anywhere.

This implementation uses the SAFE position window (every shift in
[-τ, τ] is probed rather than PassJoin's tighter multi-match
windows): slightly more candidates, recall provably 1 — and the gate
oracle recomputes the answer with an INDEPENDENT brute-force
levenshtein join, so any recall bug fails the value hash rather than
hiding.

Scale shape:

- Segment side: τ+1 rows per string; probe side: ≤ (2τ+1)²·(τ+1)
  rows per string (τ=2 → ≤ 75) — constant fan-out, one narrow
  projection each, no window.
- The join key carries (segment text, index, partner length): the
  length component folds the |len(a)−len(b)| ≤ τ filter into the
  equi-join, and the index component keeps a common fragment at
  position 0 from colliding with the same fragment at position 2.
  Key skew comes from the DATA (a constant prefix shared by every
  row, e.g. "Customer#", concentrates one bucket); that is a
  candidate-count cost amplified through an AQE-splittable equi-join,
  never a correctness risk — the verify prunes exactly.
- Strings ride the candidate rows (names/titles are tens of bytes;
  at longer-string domains switch to id-only keys + a join-back, the
  ``dupspans`` discipline).
- Strings shorter than τ+1 cannot host τ+1 non-empty segments; they
  go through a brute short-pool join (length-bounded: partners are
  themselves ≤ 2τ+1 chars). That branch is a nested-loop of two
  frames that are tiny in any name-matching domain — the operator
  docstring contract, asserted nowhere because short-heavy corpora
  are legitimate inputs with legitimately quadratic short pools.

Reference parity: no similarity join exists in the 549-LoC reference
(SURVEY.md §2.4 — joins: none); extension scope per §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(length: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start, len) of segment i (0-based) in the even k-partition of
    a string of ``length`` chars — 1-based start for ``substring``.
    Segments differ by at most one char: the first (length mod k)
    segments take the extra char."""
    q = F.floor(length / k).cast("int")
    r = (length % k).cast("int")
    seg_len = q + F.when(F.lit(i) < r, 1).otherwise(0)
    start = F.lit(1) + F.lit(i) * q + F.least(F.lit(i), r)
    return start, seg_len


def _segment_rows(df: DataFrame, id_col: str, str_col: str,
                  tau: int) -> DataFrame:
    """(id, s, la, i, seg): the τ+1 segments of every string of
    length ≥ τ+1."""
    k = tau + 1
    la = F.length(str_col)
    # expr-built substrings: F.substring needs literal pos/len, the
    # SQL form accepts expressions; _sql_pos/_sql_len with la_off=0
    # are the segment's own bounds
    segs = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.expr(f"substring({str_col}, "
                   f"{_sql_pos(str_col, i, k, 0, 0)}, "
                   f"{_sql_len(str_col, i, k, 0)})").alias("seg"))
        for i in range(k)])
    return (df.filter(la >= k)
            .select(F.col(id_col).alias("id"),
                    F.col(str_col).alias("s"),
                    la.alias("la"),
                    F.explode(segs).alias("e"))
            .select("id", "s", "la",
                    F.col("e.i").alias("i"), F.col("e.seg").alias("seg")))


def _probe_rows(df: DataFrame, id_col: str, str_col: str,
                tau: int) -> DataFrame:
    """(id, s, la, i, seg): every substring of each string that could
    equal segment i of a partner of length ``la`` within distance τ —
    partner lengths lb−τ..lb+τ, positions start_i(la) − τ ..
    start_i(la) + τ (the safe shift window)."""
    k = tau + 1
    lb = F.length(str_col)
    cands = []
    for la_off in range(-tau, tau + 1):
        for i in range(k):
            for shift in range(-tau, tau + 1):
                la = lb + la_off
                start, seg_len = _seg_bounds(la, i, k)
                pos = start + shift
                valid = ((la >= k) & (seg_len >= 1) & (pos >= 1)
                         & (pos + seg_len - 1 <= lb))
                cands.append(F.when(valid, F.struct(
                    la.cast("int").alias("la"),
                    F.lit(i).alias("i"),
                    F.expr(f"substring({str_col}, "
                           f"({{pos}}), ({{len}}))"
                           .format(pos=_sql_pos(str_col, i, k, la_off,
                                                shift),
                                   len=_sql_len(str_col, i, k, la_off))
                           ).alias("seg"))))
    arr = F.array_compact(F.array(*cands))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(str_col).alias("s"),
                      lb.alias("lb"),
                      F.explode(arr).alias("e"))
            .select("id", "s", "lb",
                    F.col("e.la").alias("la"), F.col("e.i").alias("i"),
                    F.col("e.seg").alias("seg"))
            .dropDuplicates(["id", "la", "i", "seg"]))


def _sql_pos(str_col: str, i: int, k: int, la_off: int,
             shift: int) -> str:
    la = f"(length({str_col}) + ({la_off}))"
    q = f"CAST(floor({la} / {k}) AS INT)"
    r = f"CAST({la} % {k} AS INT)"
    return f"(1 + {i} * {q} + least({i}, {r}) + ({shift}))"


def _sql_len(str_col: str, i: int, k: int, la_off: int) -> str:
    la = f"(length({str_col}) + ({la_off}))"
    q = f"CAST(floor({la} / {k}) AS INT)"
    return (f"({q} + (CASE WHEN {i} < {la} % {k} "
            f"THEN 1 ELSE 0 END))")


def editdist_pairs(df: DataFrame, id_col: str, str_col: str,
                   tau: int = 2,
                   collapse_identical: bool = False) -> DataFrame:
    """All (a_id < b_id) pairs with levenshtein ≤ τ, exactly.

    Output: (a_id, b_id, dist). Candidates come from the PassJoin
    segment/probe equi-join (module docstring); strings shorter than
    τ+1 chars go through the brute short-pool branch. Either ordered
    assignment of (segment side, probe side) detects a true pair, so
    the join restricts to segment.id < probe.id directly.

    ``collapse_identical`` is the scale switch for clique-heavy data
    (the ``signature_hamming_pairs`` star contract): identical
    strings emit (min-id representative, member, 0) STAR rows instead
    of the full O(clique²) pairwise clique, and the banded join runs
    over DISTINCT strings only. Connected components — the thing a
    dedup/resolution pipeline actually consumes — are identical to
    the full form (pinned in tests); a name appearing 10⁵ times
    (placeholder titles, "Customer#...") costs 10⁵−1 rows instead of
    ~5·10⁹.
    """
    if tau < 1:
        raise ValueError("tau must be >= 1; use dropDuplicates for "
                         "exact matching")
    if collapse_identical:
        # (string, rep-id) feeds three subtrees (star join, segment
        # side, probe side); Catalyst's ReuseExchange deduplicates
        # the identical distinct-shuffle in the single DAG, and the
        # downstream joins stay AQE-broadcastable. Persisting here
        # was MEASURED SLOWER (7.0s vs 3.0s at sf0.1): an
        # InMemoryRelation hides size statistics, flipping the tiny
        # reps joins from broadcast to sort-merge.
        reps_base = (df.groupBy(F.col(str_col).alias("s"))
                     .agg(F.min(id_col).alias("rid")))
        star = (df.select(F.col(id_col).alias("mid"),
                          F.col(str_col).alias("s"))
                .join(reps_base, "s")
                .filter(F.col("mid") != F.col("rid"))
                .select(F.col("rid").alias("a_id"),
                        F.col("mid").alias("b_id"),
                        F.lit(0).alias("dist")))
        reps = reps_base.select(F.col("rid").alias(id_col),
                                F.col("s").alias(str_col))
        near = editdist_pairs(reps, id_col, str_col, tau,
                              collapse_identical=False)
        return star.unionByName(near)
    segs = _segment_rows(df, id_col, str_col, tau)
    probes = _probe_rows(df, id_col, str_col, tau)
    cand = (segs.alias("a")
            .join(probes.alias("b"),
                  (F.col("a.i") == F.col("b.i"))
                  & (F.col("a.la") == F.col("b.la"))
                  & (F.col("a.seg") == F.col("b.seg"))
                  & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("a_id"),
                    F.col("a.s").alias("a_s"),
                    F.col("b.id").alias("b_id"),
                    F.col("b.s").alias("b_s"))
            .distinct())
    banded = (cand
              .withColumn("dist", F.levenshtein("a_s", "b_s"))
              .filter(F.col("dist") <= tau)
              .select("a_id", "b_id", "dist"))

    k = tau + 1
    shorts = df.filter(F.length(str_col) < k).select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    near_shorts = df.filter(F.length(str_col) <= 2 * tau + 1).select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    short_pairs = (shorts.alias("a")
                   .join(near_shorts.alias("b"),
                         F.col("a.id") != F.col("b.id"))
                   .select(F.least("a.id", "b.id").alias("a_id"),
                           F.greatest("a.id", "b.id").alias("b_id"),
                           F.levenshtein("a.s", "b.s").alias("dist"))
                   .filter(F.col("dist") <= tau)
                   .distinct())
    return banded.unionByName(short_pairs).dropDuplicates(
        ["a_id", "b_id"])
