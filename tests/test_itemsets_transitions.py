"""Planted ground truth for the round-10 late additions: basket-pair
affinity mining, the MinHash decontamination leg, and event-type
transition mining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.itemsets import (
    basket_pairs,
    basket_sets,
    pair_affinity,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


# --- basket pairs -------------------------------------------------------------

def test_basket_pairs_planted(spark):
    # baskets: {1,2,3}, {1,2}, {2,3}, {4} — pair counts by hand
    items = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3),
         (20, 1), (20, 2),
         (30, 2), (30, 3),
         (40, 4)], ["b", "i"])
    got = _rows(basket_pairs(basket_sets(items, "b", "i")))
    assert got == {(1, 2, 2), (1, 3, 1), (2, 3, 2)}


def test_basket_pairs_dedupes_repeated_item_rows(spark):
    # the same (basket, item) arriving twice (two lineitems of one
    # part in one order) must count once
    items = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2)], ["b", "i"])
    got = _rows(basket_pairs(basket_sets(items, "b", "i")))
    assert got == {(1, 2, 1)}


def test_basket_cap_drops_mega_basket(spark):
    big = [(99, i) for i in range(10)]
    items = spark.createDataFrame(big + [(1, 1), (1, 2)], ["b", "i"])
    got = _rows(basket_pairs(basket_sets(items, "b", "i", max_basket=8)))
    # the 10-item basket is dropped whole; only the small basket pairs
    assert got == {(1, 2, 1)}


def test_basket_cap_stats_planted(spark):
    """The cap-audit companion (VERDICT r10 wrong#3): planted
    mega-basket + duplicates, counts checked by hand."""
    from mapreducewordcount_spark.operators.itemsets import (
        basket_cap_stats,
    )

    big = [(99, i) for i in range(10)]
    # (1, 1) repeated: distinct-count semantics must count it once
    items = spark.createDataFrame(
        big + [(1, 1), (1, 1), (1, 2), (2, 5)], ["b", "i"])
    row = basket_cap_stats(items, "b", "i", max_basket=8).collect()[0]
    assert row.asDict() == {"n_baskets_total": 3, "n_baskets_kept": 2,
                            "n_baskets_dropped": 1,
                            "n_items_dropped": 10,
                            "max_basket_size": 10}
    # cap not binding: dropped counts are zero, never NULL
    row = basket_cap_stats(items, "b", "i", max_basket=64).collect()[0]
    assert (row.n_baskets_dropped, row.n_items_dropped) == (0, 0)


def test_pair_affinity_lift_by_hand(spark):
    # 4 baskets; pair (1,2) in 2 of them, n_1 = 3, n_2 = 2
    # conf(1→2) = 2/3 = 0.6667, conf(2→1) = 2/2 = 1.0,
    # lift = 2*4 / (3*2) = 1.3333
    items = spark.createDataFrame(
        [(10, 1), (10, 2),
         (20, 1), (20, 2),
         (30, 1), (30, 3),
         (40, 4)], ["b", "i"])
    got = _rows(pair_affinity(items, "b", "i", min_support=2))
    assert got == {(1, 2, 2, 3, 2, 0.6667, 1.0, 1.3333)}


def test_pair_affinity_min_support_filters(spark):
    items = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 2), (20, 3)], ["b", "i"])
    assert pair_affinity(items, "b", "i", min_support=2).count() == 0
    assert pair_affinity(items, "b", "i", min_support=1).count() == 2


# --- minhash decontamination ---------------------------------------------------

def test_decontam_minhash_planted_recall(spark):
    """A training doc that is a light edit of an eval doc is flagged;
    an unrelated doc is not. doc_id % 25 == 0 plays eval."""
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen astronauts compile spark plans under moonlight "
            "and every shuffle partition hums a different tune " * 3)
    docs = spark.createDataFrame(
        [(25, base),                                  # eval
         (1, base + " extra closing words appended here"),  # near-dup
         (2, "completely different content about database join "
             "strategies and columnar storage layouts with nothing "
             "shared beyond grammar " * 4)],           # clean
        ["doc_id", "text"]).withColumn(
            "lang", F.lit("en")).withColumn(
            "source", F.lit("t")).withColumn(
            "n_chars", F.length("text"))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        from mapreducewordcount_spark.queries.pipeline9 import (
            decontam_minhash_report,
        )
        got = {r["doc_id"]: (r["n_eval_hits"], r["max_jaccard"])
               for r in decontam_minhash_report(spark, d).collect()}
    assert set(got) == {1}
    hits, jac = got[1]
    assert hits == 1 and jac >= 0.7


# --- event transitions ---------------------------------------------------------

def test_event_transitions_planted(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a
        (1, t0, 1, "a"), (2, t0 + dt.timedelta(minutes=1), 1, "b"),
        (3, t0 + dt.timedelta(minutes=2), 1, "a"),
        # user 2: a -> b
        (4, t0, 2, "a"), (5, t0 + dt.timedelta(minutes=1), 2, "b"),
    ]
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        (e.withColumn("value", F.lit(1.0))
          .withColumn("props", F.lit("{}"))
          .write.parquet(f"{d}/events.parquet"))
        from mapreducewordcount_spark.queries.pipeline9 import (
            events_type_transitions,
        )
        got = _rows(events_type_transitions(spark, d))
    # transitions: a->b twice (p=1.0), b->a once (p=0.5... no:
    # from b there are 2 outgoing? user1 b->a, user2 b has no next.
    # outgoing from a: 2 (both a->b); from b: 1 (b->a) -> p=1.0
    assert got == {("a", "b", 2, 1.0), ("b", "a", 1, 1.0)}


def test_event_transitions_ties_break_on_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, t0, 1, "b"), (1, t0, 1, "a")]  # same ts: order by id
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        (e.withColumn("value", F.lit(1.0))
          .withColumn("props", F.lit("{}"))
          .write.parquet(f"{d}/events.parquet"))
        from mapreducewordcount_spark.queries.pipeline9 import (
            events_type_transitions,
        )
        got = _rows(events_type_transitions(spark, d))
    assert got == {("a", "b", 1, 1.0)}


# --- unicode normalization -----------------------------------------------------

def test_nfc_stats_planted(spark):
    """Decomposed text counts as changed with the right char delta;
    composed text and ASCII do not change."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "plain ascii"),                 # odd, not %3/%7: unchanged
         (2, "x"),                           # %2: gets e+U+0301 -> -1
         (6, "y"),                           # %2 and %3: two marks -> -2
         (7, "z"),                           # %7: composed only -> 0
         ], ["doc_id", "text"]).withColumn(
            "lang", F.lit("en")).withColumn(
            "source", F.lit("s")).withColumn(
            "n_chars", F.length("text"))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        from mapreducewordcount_spark.queries.pipeline9 import (
            doc_nfc_stats,
        )
        rows = doc_nfc_stats(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_docs"], r["n_changed"], r["chars_delta"]) == (4, 2, 3)


# --- property: Spark pair mining == brute-force Python spec --------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _round4(x: float) -> float:
    """Spark's round(): HALF_UP on the shortest decimal repr — NOT
    Python's banker's round (0.28125 → 0.2813, not 0.2812)."""
    import decimal

    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))


def _brute_affinity(rows, min_support, max_basket):
    """Independent Python spec of pair_affinity (itertools, no Spark)."""
    import itertools

    baskets: dict = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    baskets = {b: s for b, s in baskets.items() if len(s) <= max_basket}
    n = len(baskets)
    marg: dict = {}
    for s in baskets.values():
        for i in s:
            marg[i] = marg.get(i, 0) + 1
    pairs: dict = {}
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    out = set()
    for (a, b), c in pairs.items():
        if c >= min_support:
            out.add((a, b, c, marg[a], marg[b],
                     _round4(c / marg[a]), _round4(c / marg[b]),
                     _round4(c * n / (marg[a] * marg[b]))))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 6)),
                     min_size=1, max_size=60),
       min_support=st.integers(1, 3))
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_pair_affinity_matches_brute_force(spark, rows, min_support):
    df = spark.createDataFrame(rows, ["b", "i"])
    got = _rows(pair_affinity(df, "b", "i", min_support=min_support,
                              max_basket=4))
    assert got == _brute_affinity(rows, min_support, max_basket=4)
