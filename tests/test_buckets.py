"""Partitioner parity: bucket_expr vs Python ``ord(w[0].lower()) % m``.

FIXTURES.md §F3: a-z, digits, non-ASCII first char, m ∈ {1, 4, 7};
reference semantics at ``src/worker.py:76``.
"""

from __future__ import annotations

import string

import pytest

from mapreducewordcount_spark.functions.buckets import bucket_expr

WORDS = (
    [c + "word" for c in string.ascii_lowercase]
    + [str(d) for d in range(10)]
    + ["été", "élan", "ñu", "über", "o.k", "n't", "z"]
)


@pytest.mark.parametrize("m", [1, 4, 7])
def test_bucket_matches_python_ord(spark, m):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    got = {r.word: r.b for r in df.select("word", bucket_expr("word", m).alias("b")).collect()}
    want = {w: ord(w[0].lower()) % m for w in WORDS}
    assert got == want


def test_pinned_default_m4():
    # empirical pins from SURVEY.md §1.4
    assert ord("a") % 4 == 1 and ord("b") % 4 == 2 and ord("o") % 4 == 3
    assert ord("0") % 4 == 0 and ord("é") % 4 == 1


def test_empty_bucket_is_empty_output(spark):
    """The reference KeyErrors on an empty bucket (src/worker.py:126).

    This engine must instead produce an empty group — no failure mode.
    With m=7 and words all starting 'a' (ord 97 % 7 == 6), buckets 0-5
    are empty and the pipeline still succeeds.
    """
    df = spark.createDataFrame([("apple",), ("ant",)], "word string")
    rows = df.select(bucket_expr("word", 7).alias("b")).groupBy("b").count().collect()
    assert {r.b for r in rows} == {97 % 7}
