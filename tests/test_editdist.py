"""Edit-distance similarity join (operators/editdist.py) vs a local
brute-force Levenshtein oracle — exact recall is the whole contract.

The registry-level check (part_name_fuzzy_pairs) compares against an
independent brute-force DuckDB oracle; here we pin the operator on
corpora where the adversarial cases are constructed explicitly:
insertions/deletions that SHIFT segment alignment (the case a naive
same-position banding silently misses), strings shorter than the
segment count, and identical-string cliques (star mode).
"""

from __future__ import annotations

import random

import pytest

from mapreducewordcount_spark.operators.editdist import editdist_pairs


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def _brute(rows, tau):
    return {(i, j, _lev(a, b)) for (i, a) in rows for (j, b) in rows
            if i < j and _lev(a, b) <= tau}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string")


@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_matches_brute_force_with_indels(spark):
    """Random corpus + planted substitution/insert/delete mutants;
    every τ compared pair-for-pair against brute force."""
    rng = random.Random(11)
    base = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 12)))
            for _ in range(70)]
    muts = []
    for i, s in enumerate(base[:30]):
        t = list(s)
        if i % 3 == 0 and t:
            t[rng.randrange(len(t))] = rng.choice("abcd")
        elif i % 3 == 1:
            t.insert(rng.randrange(len(t) + 1), rng.choice("abcd"))
        elif len(t) > 1:
            del t[rng.randrange(len(t))]
        muts.append("".join(t))
    rows = list(enumerate(base + muts))
    df = _df(spark, rows)
    for tau in (1, 2, 3):
        got = {tuple(r) for r in
               editdist_pairs(df, "id", "s", tau).collect()}
        assert got == _brute(rows, tau), f"tau={tau}"


@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_leading_indel_shifts_every_segment(spark):
    """A single LEADING insertion displaces every downstream segment
    by one — same-index banding with no shift window finds zero
    matching segments. The safe window must still pair them."""
    rows = [(0, "abcdefghij"), (1, "xabcdefghij"),   # leading insert
            (2, "abcdefghi"),                         # trailing delete
            (3, "abXdefghij")]                        # substitution
    df = _df(spark, rows)
    got = {(r.a_id, r.b_id) for r in
           editdist_pairs(df, "id", "s", tau=1).collect()}
    assert {(0, 1), (0, 2), (0, 3)} <= got
    got2 = {tuple(r) for r in editdist_pairs(df, "id", "s", 2).collect()}
    assert got2 == _brute(rows, 2)


@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_short_strings_take_the_brute_pool(spark):
    # lengths < tau+1 cannot host tau+1 non-empty segments
    rows = [(0, "a"), (1, "b"), (2, "ab"), (3, "abc"), (4, "abcdefg")]
    df = _df(spark, rows)
    for tau in (1, 2):
        got = {tuple(r) for r in
               editdist_pairs(df, "id", "s", tau).collect()}
        assert got == _brute(rows, tau), f"tau={tau}"


@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_star_mode_collapses_cliques(spark):
    """A k-clique of identical strings must emit k−1 star rows (rep →
    member, dist 0), and near rows must connect REPRESENTATIVES; the
    connected components equal the full form's."""
    rows = ([(i, "duplicate") for i in range(10, 16)]
            + [(1, "duplicatX"), (30, "unrelated string")])
    df = _df(spark, rows)
    star = editdist_pairs(df, "id", "s", tau=1,
                          collapse_identical=True).collect()
    zero = sorted((r.a_id, r.b_id) for r in star if r.dist == 0)
    assert zero == [(10, i) for i in range(11, 16)]
    near = [(r.a_id, r.b_id, r.dist) for r in star if r.dist > 0]
    assert near == [(1, 10, 1)]

    # component equality vs the full pairwise form
    def comps(pairs, ids):
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        groups = {}
        for i in ids:
            groups.setdefault(find(i), set()).add(i)
        return {frozenset(g) for g in groups.values()}

    ids = [i for i, _ in rows]
    full = {(r.a_id, r.b_id) for r in
            editdist_pairs(df, "id", "s", tau=1).collect()}
    assert comps({(a, b) for a, b, _ in
                  [(r[0], r[1], r[2]) for r in
                   [(s.a_id, s.b_id, s.dist) for s in star]]}, ids) \
        == comps(full, ids)


def test_tau_zero_rejected(spark):
    with pytest.raises(ValueError):
        editdist_pairs(_df(spark, [(0, "x")]), "id", "s", tau=0)


def test_gate_query_nontrivial(spark):
    from mapreducewordcount_spark.queries.pipeline4 import (
        part_name_fuzzy_pairs,
    )
    from tests.conftest import SF_ORACLE

    out = part_name_fuzzy_pairs(spark, SF_ORACLE)
    rows = out.collect()
    assert any(r.dist == 0 for r in rows)   # star rows exist
    assert any(r.dist > 0 for r in rows)    # near rows exist
