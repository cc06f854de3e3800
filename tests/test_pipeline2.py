"""Planted-ground-truth tests for the round-3 pipeline batch:
repetition signals, boilerplate detection, packing, mixture plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.repetition import (
    dup_line_char_fraction,
    dup_line_fraction,
    top_word_fraction,
)
from mapreducewordcount_spark.operators.boilerplate import boilerplate_report
from mapreducewordcount_spark.operators.packing import (
    mixture_plan,
    pack_sequences,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first().v


def test_dup_line_fraction_planted(spark):
    # 4 lines, 3 distinct → 1 - 3/4 = 0.25
    text = "menu\nhello world\nmenu\nbye"
    assert _one(spark, text, dup_line_fraction("text")) == 0.25
    assert _one(spark, "a\nb\nc", dup_line_fraction("text")) == 0.0
    assert _one(spark, "   \n  ", dup_line_fraction("text")) == 0.0  # no lines


def test_dup_line_char_fraction_planted(spark):
    # lines: menu(4) hello(5) menu(4) → total 13, uniq 9 → 4/13
    got = _one(spark, "menu\nhello\nmenu", dup_line_char_fraction("text"))
    assert abs(got - 4 / 13) < 1e-12
    assert _one(spark, "a\nb", dup_line_char_fraction("text")) == 0.0


def test_top_word_fraction_planted(spark):
    # spam ×3 of 5 words → 0.6
    assert _one(spark, "spam ham spam eggs spam",
                top_word_fraction("text")) == 0.6
    # all distinct → 1/4
    assert _one(spark, "a b c d", top_word_fraction("text")) == 0.25
    assert _one(spark, "", top_word_fraction("text")) == 0.0
    # normalization applies before counting: "The the THE." is one word ×3
    assert _one(spark, "The the THE.", top_word_fraction("text")) == 1.0


def test_boilerplate_report_planted(spark):
    header = "COOKIE BANNER"
    rows = [(i, "srcA", f"{header}\nunique body {i}") for i in range(4)]
    rows += [(4, "srcA", "no banner here")]
    # same banner in a DIFFERENT source, only 2 docs → below min_docs
    rows += [(5, "srcB", f"{header}\nb5"), (6, "srcB", f"{header}\nb6")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_lines, r.n_boiler_lines, r.boiler_fraction)
           for r in boilerplate_report(docs, min_docs=3).collect()}
    assert len(got) == 7
    for i in range(4):
        assert got[i] == (2, 1, 0.5)
    assert got[4] == (1, 0, 0.0)
    assert got[5] == (2, 0, 0.0) and got[6] == (2, 0, 0.0)


def test_pack_sequences_budget_property(spark):
    # 10 docs × 100 tokens ("w " * 100), one source, one shard,
    # budget 250 → seq boundaries at exclusive-prefix 0,100,200|300,...
    rows = [(i, "s", "w " * 100) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_sequences(docs, budget_tokens=250, n_shards=1)
    got = {r.doc_id: (r.n_tokens, r.seq_id) for r in out.collect()}
    assert all(v[0] == 100 for v in got.values())
    # floor(100*i / 250): docs 0-2 → seq 0, 3-4 → 1, 5-7 → 2, 8-9 → 3
    want = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}
    assert {k: v[1] for k, v in got.items()} == want


def test_pack_sequences_sharding_is_deterministic(spark):
    rows = [(i, "s", "tok " * (i + 1)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(map(tuple, pack_sequences(docs, 64, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 64, n_shards=4).collect()))
    assert a == b
    # every doc appears exactly once, shard = doc_id % 4
    assert all(r[2] == r[0] % 4 for r in a) and len(a) == 20


def test_mixture_plan_planted(spark):
    rows = [(i, "en", "tok " * 10) for i in range(8)]
    rows += [(100 + i, "de", "tok " * 10) for i in range(2)]
    rows += [(200, "xx", "tok " * 10)]  # not in weights → rate 0
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plan = {r.lang: r for r in
            mixture_plan(docs, {"en": 3, "de": 1}, budget_tokens=40,
                         group_col="lang").collect()}
    assert plan["en"].tokens_available == 80
    assert plan["en"].weight == 0.75 and plan["en"].tokens_target == 30
    assert plan["en"].sample_rate == 0.375
    assert plan["de"].tokens_target == 10 and plan["de"].sample_rate == 0.5
    assert plan["xx"].weight == 0.0 and plan["xx"].sample_rate == 0.0
