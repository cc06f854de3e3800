"""Explicit-register HLL: partition invariance, the register-wise-max
merge property (union sketch == sketch of union), Python replay of
the exact-dyadic estimate arithmetic, and accuracy on a planted
corpus."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.hll import (
    ALPHA_M2,
    M_REGISTERS,
    _SALT,
    hll_estimate,
    hll_registers,
)


def _df(spark, words, src="s0"):
    return spark.createDataFrame([(src, w) for w in words],
                                 "source string, word string")


def _py_registers(words):
    regs: dict[int, int] = {}
    for w in set(words):
        hx = hashlib.md5((_SALT + w).encode()).hexdigest()
        reg = int(hx[:4], 16) % M_REGISTERS
        v = int(hx[4:8], 16)
        rho = 17 if v == 0 else (17 - v.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _py_estimate(regs):
    denom = (M_REGISTERS - len(regs)) * 1.0 + sum(
        2.0 ** -r for r in regs.values())
    return round(ALPHA_M2 / denom, 4)


def test_registers_match_python_replay_and_partitioning(spark):
    words = [f"w{i}" for i in range(500)] + ["w1", "w2"]  # dups absorbed
    df = _df(spark, words)
    got = {r.reg: r.rho for r in
           hll_registers(df, "word", ["source"]).collect()}
    assert got == _py_registers(words)
    got7 = {r.reg: r.rho for r in
            hll_registers(df.repartition(7), "word",
                          ["source"]).collect()}
    assert got7 == got


def test_union_of_sketches_is_sketch_of_union(spark):
    """THE HLL property: register-wise max of two groups' registers
    equals the registers of the concatenated corpus — what makes
    cross-shard distinct counting a metadata merge at 100 TB."""
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(200)] + a[:100]  # overlap
    regs = hll_registers(
        _df(spark, a, "sa").unionByName(_df(spark, b, "sb")),
        "word", ["source"])
    merged = (regs.groupBy("reg").agg(F.max("rho").alias("rho")))
    got = {r.reg: r.rho for r in merged.collect()}
    assert got == _py_registers(a + b)


def test_estimate_matches_replay_and_is_accurate(spark):
    words = [f"tok{i}" for i in range(2000)]
    df = _df(spark, words)
    est = hll_estimate(hll_registers(df, "word", ["source"]),
                       ["source"]).collect()[0].hll_est
    assert est == _py_estimate(_py_registers(words))
    # raw-estimate accuracy at n/m ≈ 8: within 20% of the truth
    # (1.04/sqrt(256) ≈ 6.5% rsd; 3σ margin)
    assert abs(est - 2000) / 2000 < 0.20, est


def test_raw_estimate_small_range_bias_envelope(spark):
    """VERDICT r11 next#6 — the small-n disclosure, pinned: the RAW
    estimate (deliberately no linear-counting branch; that needs ln,
    which is libm-dependent and would break the cross-engine dyadic
    contract) has a FLOOR of ~alpha·M ≈ 184 when most registers are
    empty, so below the classic 2.5·M ≈ 640 threshold it
    OVER-estimates — wildly at tiny n (×19 at n=10) — then crosses
    exact near 640 and stays within a few percent above. A consumer
    reading per-source vocabulary estimates must treat any value
    ≲ 2.5·M as "at most ~640", not as a count. The envelope below is
    deterministic (fixed hash family), so these are constants."""
    # n=0: the analytic floor alpha·M^2 / M, exactly
    assert round(ALPHA_M2 / M_REGISTERS, 1) == 183.9

    expected_ratio = {10: (15.0, 25.0),    # floor-dominated
                      50: (3.0, 6.0),
                      200: (1.2, 2.0),     # still above exact
                      640: (0.9, 1.1),     # the 2.5·M crossover
                      5000: (0.90, 1.05)}  # asymptotic regime
    for n, (lo, hi) in expected_ratio.items():
        est = _py_estimate(_py_registers([f"env{i}" for i in range(n)]))
        assert lo <= est / n <= hi, (n, est)
    # spot-check one point through the Spark expressions too
    df = _df(spark, [f"env{i}" for i in range(640)])
    est = hll_estimate(hll_registers(df, "word", ["source"]),
                       ["source"]).collect()[0].hll_est
    assert est == _py_estimate(
        _py_registers([f"env{i}" for i in range(640)]))


def test_small_range_corrected_estimate_report_column(spark):
    """The report-only linear-counting companion (never on the gate
    — it needs ln): corrected estimate within ~15% down to n ≈ M/10,
    where the raw value is floor-inflated ×19; above 2.5·M the
    correction hands back exactly the raw estimate."""
    import math

    from mapreducewordcount_spark.operators.hll import (
        hll_estimate_small_range,
    )

    def both(n):
        df = _df(spark, [f"env{i}" for i in range(n)])
        row = hll_estimate_small_range(
            hll_registers(df, "word", ["source"]),
            ["source"]).collect()[0]
        return row.hll_est, row.hll_est_corrected

    for n, tol in ((25, 0.20), (100, 0.15), (400, 0.15)):
        raw, corr = both(n)
        assert abs(corr - n) / n <= tol, (n, raw, corr)
        assert corr < raw  # the raw value is floor-inflated here
    # python replay of the linear-counting branch at one point
    regs = _py_registers([f"env{i}" for i in range(100)])
    v = M_REGISTERS - len(regs)
    want = round(M_REGISTERS * math.log(M_REGISTERS / v), 4)
    assert both(100)[1] == want
    # large n: raw > 2.5·M → corrected IS the raw estimate
    raw, corr = both(5000)
    assert corr == raw
