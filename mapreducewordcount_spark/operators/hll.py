"""Explicit-register HyperLogLog — the MERGEABLE distinct sketch,
register-level, fully cross-engine (Flajolet et al. 2007).

``sketch_hll_report`` (queries/analytics3.py) validates Spark's
built-in HLL++ against exact counts via a committed artifact, because
the builtin's registers are opaque. This module is the complementary
form: the registers themselves are engine-computed columns addressed
by the repo's cross-engine md5 recipe, so BOTH engines rebuild the
identical sketch from raw text and the gate needs NO artifact — the
count-min precedent (operators/cms.py), applied to distinct counting.

Why the whole pipeline is deterministic across engines and
partitionings:

- register index = md5 hex digits 1–4 mod M (M = 256 divides 65536 —
  exactly uniform); rank ``rho`` = leading-zero count of hex digits
  5–8 (16 bits) + 1 — both integer expressions shared verbatim
  between Spark and DuckDB;
- the sketch is ``max(rho)`` per register — max is commutative and
  idempotent, so the register table is merge-order/partition
  invariant AND register-wise max over two corpora's sketches IS the
  sketch of their union (the property that makes HLL the cross-shard
  distinct-count answer at 100 TB);
- the raw estimate ``alpha·M² / Σ 2^−rho`` is EXACT floating point:
  every term 2^−rho (rho ≤ 17) and every partial sum is a dyadic
  rational on ≤ 25 mantissa bits, so IEEE addition is exact and
  order-invariant — the float never depends on summation order, and
  one literal-for-literal division finishes identically on both
  engines. (No small-range linear-counting branch: that needs ln,
  which is libm-dependent; the RAW estimate is the contract. Its
  small-range behavior is a FLOOR of α·M ≈ 184 — mostly-empty
  registers each contribute 2⁰ — so below ~2.5·M ≈ 640 distinct
  items the raw value OVER-estimates, crossing exact near 640; the
  envelope is pinned in tests/test_hll_overlap.py. Consumers must
  read any estimate ≲ 640 as "at most ~640", not as a count.)

Scale shape: one distinct + one partial-agg groupBy per sketch
build (≤ |groups| × M rows out); every union/overlap after that
touches registers only — replacing the cross-source self-join a
naive overlap matrix would pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_REGISTERS = 256   # must divide 65536 (exact-uniform md5-hex4 fold)
_SALT = "hll:"
#: alpha_256 · 256² precomputed ONCE in Python and embedded as the
#: same literal in both engines' expressions
ALPHA_M2 = 0.7213 / (1 + 1.079 / M_REGISTERS) * M_REGISTERS ** 2


def rho_case_sql(v_expr: str) -> str:
    """Leading-zero rank of a 16-bit integer expression, as a CASE
    chain shared VERBATIM by Spark (F.expr) and DuckDB: rho = 1 for
    the top bit set … 16 for value 1, 17 for value 0."""
    branches = " ".join(
        f"WHEN {v_expr} >= {1 << (16 - r)} THEN {r}"
        for r in range(1, 17))
    return f"(CASE {branches} ELSE 17 END)"


def hll_registers(items: DataFrame, item_col: str,
                  group_cols: list[str]) -> DataFrame:
    """Per-group explicit HLL registers: (group_cols…, reg, rho) with
    ``rho = max`` over the group's items — ≤ |groups| × M rows. Input
    need not be distinct (max absorbs duplicates exactly)."""
    h = F.md5(F.concat(F.lit(_SALT), F.col(item_col).cast("string")))
    reg = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"),
                 F.lit(M_REGISTERS))
    v16 = F.conv(F.substring(h, 5, 4), 16, 10).cast("long")
    return (items
            .select(*group_cols, reg.alias("reg"), v16.alias("__v"))
            .withColumn("rho", F.expr(rho_case_sql("__v")))
            .groupBy(*group_cols, "reg")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 est_col: str = "hll_est") -> DataFrame:
    """Raw HLL estimate per group from a register table:
    ``alpha·M²/denom`` with ``denom = (M − present) + Σ 2^−rho``
    (absent registers contribute 2⁰ = 1). Exact-dyadic denominator —
    see module docstring — rounded 4dp."""
    denom = ((F.lit(M_REGISTERS) - F.count(F.lit(1))).cast("double")
             + F.sum(F.pow(F.lit(2.0), -F.col("rho"))))
    return (regs.groupBy(*group_cols)
            .agg(F.round(F.lit(ALPHA_M2) / denom, 4).alias(est_col)))


def hll_estimate_small_range(regs: DataFrame, group_cols: list[str],
                             est_col: str = "hll_est",
                             corrected_col: str = "hll_est_corrected"
                             ) -> DataFrame:
    """REPORT-ONLY companion to :func:`hll_estimate` (the GK-swap
    precedent — never on the oracle gate): the raw estimate PLUS the
    standard small-range correction of Flajolet et al. 2007 §4 —
    linear counting ``M·ln(M/V)`` (V = empty registers) whenever the
    raw estimate is ≤ 2.5·M and V > 0. The correction needs ``ln``,
    whose libm dependence is exactly what the raw-dyadic gate
    contract excludes, so consumers get BOTH columns: the mergeable
    cross-engine raw value and the human-readable corrected one
    (within ~15% down to n ≈ M/10, pytest-pinned — vs the raw
    value's ×19 floor inflation at n = 10)."""
    present = F.count(F.lit(1))
    denom = ((F.lit(M_REGISTERS) - present).cast("double")
             + F.sum(F.pow(F.lit(2.0), -F.col("rho"))))
    raw = F.lit(ALPHA_M2) / denom
    v_empty = (F.lit(M_REGISTERS) - present).cast("double")
    corrected = F.when(
        (raw <= 2.5 * M_REGISTERS) & (v_empty > 0),
        F.lit(float(M_REGISTERS))
        * F.log(F.lit(float(M_REGISTERS)) / v_empty)
    ).otherwise(raw)
    return (regs.groupBy(*group_cols)
            .agg(F.round(raw, 4).alias(est_col),
                 F.round(corrected, 4).alias(corrected_col)))


def hll_denom_sql(rho_expr: str = "rho") -> str:
    """The per-group denominator in DuckDB SQL, mirroring
    ``hll_estimate`` term for term (use inside a GROUP BY)."""
    return (f"(({M_REGISTERS} - count(*)) * 1.0"
            f" + sum(power(2.0, -{rho_expr})))")
