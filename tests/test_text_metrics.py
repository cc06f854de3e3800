"""Text-metric edge cases: null / empty / punct-only / short docs.

The driver corpus is clean; real 100 TB corpora are not. Every
metric must return a well-defined value (not NaN, not a crash) for
degenerate documents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions import text_metrics as tm

CASES = [
    (0, None),            # null text
    (1, ""),              # empty
    (2, "   "),           # whitespace only
    (3, "!!! ... ---"),   # punctuation only -> zero words
    (4, "ab"),            # single short word (< shingle size)
    (5, "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


def test_all_metrics_defined_on_degenerate_docs(spark, docs):
    out = docs.select(
        "doc_id",
        tm.n_words("text").alias("nw"),
        tm.n_distinct_words("text").alias("nd"),
        tm.avg_word_len("text").alias("awl"),
        tm.stopword_ratio("text").alias("sr"),
        tm.punct_ratio("text").alias("pr"),
        tm.quality_score("text").alias("q"),
        tm.token_count("text").alias("tc"),
        tm.language_id("text").alias("lang"),
        F.size(tm.shingles("text")).alias("nsh"),
        tm.fingerprint_md5("text").alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}

    # null text: everything null-or-neutral, nothing throws
    r0 = by_id[0]
    assert r0.nw is None or r0.nw == 0

    # empty / whitespace / punct-only: zero words, zero ratios
    for i in (1, 2, 3):
        r = by_id[i]
        assert r.nw == 0 and r.nd == 0
        assert r.awl == 0.0 and r.sr == 0.0
        assert r.q is not None and not (r.q != r.q)  # not NaN
        assert r.lang == "und"
        assert r.nsh == 0
    assert by_id[3].pr == 1.0  # all non-space chars are punctuation

    # short doc: no shingles but valid metrics
    r4 = by_id[4]
    assert r4.nw == 1 and r4.nsh == 0 and r4.awl == 2.0

    # normal doc sanity
    r5 = by_id[5]
    assert r5.nw == 9 and r5.nsh == 7
    assert r5.lang == "en" and 0 < r5.sr < 1


def test_fingerprints_ignore_whitespace_noise(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "  alpha   beta\tgamma ")],
        "doc_id long, text string")
    fps = [r.fp for r in df.select(tm.fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_dedup_ops_survive_degenerate_docs(spark, docs):
    from mapreducewordcount_spark.operators import dedup as dd

    # none of these should throw on null/empty/short docs
    assert dd.exact_dedup(docs).count() >= 1
    assert dd.shingle_jaccard_pairs(docs, threshold=0.5).count() == 0
    assert dd.minhash_lsh_pairs(docs, threshold=0.5).count() == 0
    assert dd.simhash_pairs(docs, max_hamming=3).count() >= 0


def test_char_entropy_planted(spark):
    import math

    from mapreducewordcount_spark.functions.text_metrics import char_entropy
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string")
    got = {r.doc_id: r.e for r in
           df.select("doc_id",
                     F.round(char_entropy("text"), 6).alias("e")).collect()}
    assert got[1] == 0.0                      # single symbol
    assert abs(got[2] - 1.0) < 1e-9           # two equiprobable symbols
    assert abs(got[3] - 2.0) < 1e-9           # four equiprobable symbols
    assert got[4] == 0.0                      # empty


def test_compression_ratio_separates_spam_from_prose(spark):
    from mapreducewordcount_spark.functions.text_metrics import (
        compression_ratio_udf,
    )
    from pyspark.sql import functions as F

    spam = "buy now " * 200
    prose = ("The quick brown fox jumps over the lazy dog while seventeen "
             "zebras quietly examined jugs of bad venom from Oxford.") * 3
    df = spark.createDataFrame(
        [(1, spam), (2, prose), (3, "")], "doc_id long, text string")
    got = {r.doc_id: r.z for r in
           df.select("doc_id",
                     compression_ratio_udf()("text").alias("z")).collect()}
    assert got[1] < 0.1 < got[2] <= 1.2       # spam compresses far better
    assert got[3] == 0.0
    # deterministic across invocations (fixed level, stdlib zlib)
    again = {r.doc_id: r.z for r in
             df.select("doc_id",
                       compression_ratio_udf()("text").alias("z")).collect()}
    assert got == again
