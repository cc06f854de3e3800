"""Iterative proportional fitting (IPF / raking) for two-marginal
training-mixture calibration.

``mixture_plan`` (operators/packing.py) allocates a token budget
along ONE key (language). Real curation briefs pin TWO marginals at
once — "equal source representation AND this language mix" — and no
per-cell weight table satisfies both unless it is fitted: that is
IPF (Deming & Stephan 1940; the raking step behind survey weighting
and RecDP-style mixture tools). Seeded with the observed token
inventory, alternately scale every row to its row target and every
column to its column target; the limit (when it exists) is the
unique table matching both marginals while staying proportional to
the seed within rows/columns (minimum KL divergence from the
inventory — so the fit distorts the natural mix as little as
possible).

Engine discipline (the langid/BPE/k-means bounded-model contract):
the grid is a |sources| × |langs| aggregate — corpus-size-independent
— collected ONCE; the float iteration runs driver-side in a fixed
deterministic order, and the committed artifact carries integer
micro-tokens, so no accumulated float path crosses engines. At
100 TB the plan is one partial-agg groupBy + a broadcast of the
fitted table back onto the corpus.

Zero handling: empty cells stay zero (IPF preserves the seed's
support); a zero row/column target drains its line to zero; a
NONZERO target over an all-zero line is unsatisfiable and raises
(surfaced, not silently dropped — the no-silent-caps rule).
"""

from __future__ import annotations

MICRO = 1_000_000


def ipf_fit(avail: dict[tuple[str, str], float],
            row_targets: dict[str, float],
            col_targets: dict[str, float],
            n_iters: int = 25) -> dict[tuple[str, str], float]:
    """→ per-cell fitted targets, same key set as ``avail``.

    ``row_targets``/``col_targets`` must cover every row/col key in
    ``avail`` (missing = 0 is NOT assumed — pass explicit zeros) and
    sum to the same total within 1e-6 relative, else the alternating
    scaling oscillates instead of converging.
    """
    rows = sorted({r for r, _c in avail})
    cols = sorted({c for _r, c in avail})
    missing = [r for r in rows if r not in row_targets] + \
              [c for c in cols if c not in col_targets]
    if missing:
        raise ValueError(f"targets missing for keys: {missing}")
    tr = sum(row_targets[r] for r in rows)
    tc = sum(col_targets[c] for c in cols)
    if tr > 0 and abs(tr - tc) > 1e-6 * max(tr, tc):
        raise ValueError(
            f"marginal totals disagree: rows {tr!r} vs cols {tc!r} — "
            "IPF alternation cannot satisfy both")
    t = {k: float(v) for k, v in avail.items()}
    for r in rows:
        if row_targets[r] > 0 and not any(
                t.get((r, c), 0.0) > 0 for c in cols):
            raise ValueError(
                f"row {r!r} has target {row_targets[r]!r} but zero "
                "available tokens — unsatisfiable marginal")
    for c in cols:
        if col_targets[c] > 0 and not any(
                t.get((r, c), 0.0) > 0 for r in rows):
            raise ValueError(
                f"col {c!r} has target {col_targets[c]!r} but zero "
                "available tokens — unsatisfiable marginal")
    for _ in range(n_iters):
        for r in rows:  # row scaling pass
            s = sum(t.get((r, c), 0.0) for c in cols)
            if s > 0:
                f = row_targets[r] / s
                for c in cols:
                    if (r, c) in t:
                        t[r, c] *= f
        for c in cols:  # column scaling pass
            s = sum(t.get((r, c), 0.0) for r in rows)
            if s > 0:
                f = col_targets[c] / s
                for r in rows:
                    if (r, c) in t:
                        t[r, c] *= f
    return t


def ipf_residuals(t: dict[tuple[str, str], float],
                  row_targets: dict[str, float],
                  col_targets: dict[str, float]) -> tuple[float, float]:
    """Max relative marginal error (rows, cols) — the convergence
    audit a caller asserts before trusting the fit."""
    def err(targets, axis):
        worst = 0.0
        for key, want in targets.items():
            got = sum(v for (r, c), v in t.items()
                      if (r if axis == 0 else c) == key)
            if want > 0:
                worst = max(worst, abs(got - want) / want)
            elif got > 0:
                worst = max(worst, 1.0)
        return worst
    return err(row_targets, 0), err(col_targets, 1)
