"""Planted-ground-truth tests for C4-style duplicate-line removal
(operators/linededup.py)."""

from __future__ import annotations

from mapreducewordcount_spark.operators.linededup import (
    strip_duplicate_lines,
)


def test_strip_duplicate_lines_planted(spark):
    docs = spark.createDataFrame(
        [(1, "COOKIE BANNER\nreal content one"),
         (2, "COOKIE BANNER\nreal content two"),
         (3, "real content one\nfresh line"),
         (4, "COOKIE BANNER"),  # everything dropped
         (5, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in strip_duplicate_lines(docs).collect()}
    assert len(got) == 5
    # doc 1 owns the first occurrence of both its lines
    assert got[1].text_clean == "COOKIE BANNER\nreal content one"
    assert (got[1].n_lines, got[1].n_kept) == (2, 2)
    # doc 2 loses the banner, keeps its unique line
    assert got[2].text_clean == "real content two"
    assert (got[2].n_lines, got[2].n_kept) == (2, 1)
    # doc 3 loses "real content one" (doc 1 had it first)
    assert got[3].text_clean == "fresh line"
    # doc 4 entirely boilerplate → emptied, not dropped
    assert got[4].text_clean == "" and got[4].n_kept == 0
    assert got[5].text_clean == "" and got[5].n_lines == 0


def test_strip_duplicate_lines_intra_doc_repeats(spark):
    """The rule also collapses repeats WITHIN one document (only the
    first positional occurrence survives)."""
    docs = spark.createDataFrame(
        [(1, "menu\nbody\nmenu\nmenu")], "doc_id long, text string")
    got = strip_duplicate_lines(docs).collect()[0]
    assert got.text_clean == "menu\nbody"
    assert (got.n_lines, got.n_kept) == (4, 2)


def test_strip_duplicate_lines_preserves_order_and_trims(spark):
    docs = spark.createDataFrame(
        [(1, "  z last  \n  a first  ")], "doc_id long, text string")
    got = strip_duplicate_lines(docs).collect()[0]
    # original order kept (z before a), lines trimmed like lines()
    assert got.text_clean == "z last\na first"
