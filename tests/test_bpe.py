"""Planted-ground-truth tests for BPE tokenizer induction
(operators/bpe.py): pair counts, merge training, encode/apply."""

from __future__ import annotations

from mapreducewordcount_spark.operators.bpe import (
    bpe_encode_word,
    bpe_pair_counts,
    bpe_token_stats,
    bpe_train,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_pair_counts_planted(spark):
    # corpus: "aa ab" + "aa" → words: aa×2, ab×1
    docs = _docs(spark, ["aa ab", "aa"])
    got = {(r.a, r.b): r.pair_count
           for r in bpe_pair_counts(docs).collect()}
    assert got == {("a", "a"): 2, ("a", "b"): 1}


def test_pair_counts_weighted_by_word_freq_not_doc(spark):
    # "abab" appears 3× (freq weighting): pairs per word = ab, ba, ab
    docs = _docs(spark, ["abab abab", "abab"])
    got = {(r.a, r.b): r.pair_count
           for r in bpe_pair_counts(docs).collect()}
    assert got == {("a", "b"): 6, ("b", "a"): 3}


def test_bpe_train_classic_example(spark):
    # Sennrich-style toy: "low" ×5, "lower" ×2 → first merges build
    # up the shared stem; deterministic tie-breaks
    docs = _docs(spark, [" ".join(["low"] * 5 + ["lower"] * 2)])
    merges = bpe_train(docs, n_merges=3)
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2, (e,r)=2
    # tie 7/7 → lexicographically smallest pair ('l','o') merges first
    assert merges[0] == ("l", "o")
    # round 2: ('lo','w')=7 dominates
    assert merges[1] == ("lo", "w")
    # round 3: ('e','r')=2 vs ('low','e')=2 → 'e','r' is smaller
    assert merges[2] == ("e", "r")


def test_bpe_encode_word_applies_rank_order(spark):
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert bpe_encode_word("low", ranks) == ["low"]
    assert bpe_encode_word("lower", ranks) == ["low", "er"]
    assert bpe_encode_word("wool", ranks) == ["w", "o", "o", "l"]
    assert bpe_encode_word("", ranks) == []


def test_bpe_token_stats_end_to_end(spark):
    docs = _docs(spark, [" ".join(["low"] * 5 + ["lower"] * 2),
                         "low lower", ""])
    merges = bpe_train(docs, n_merges=3)
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_stats(docs, merges).collect()}
    # after merges [l+o, lo+w, e+r]: low→[low] (1 token),
    # lower→[low, er] (2 tokens)
    assert got[0] == (7, 5 * 1 + 2 * 2)
    assert got[1] == (2, 1 + 2)
    assert got[2] == (0, 0)


def test_bpe_train_is_deterministic(spark):
    docs = _docs(spark, ["the cat sat on the mat", "a cat ate the rat"])
    a = bpe_train(docs, n_merges=8)
    b = bpe_train(docs, n_merges=8)
    assert a == b and len(a) == 8


def test_bpe_tokens_never_exceed_chars_and_never_below_words(spark):
    """Subword counts must sit between word count and character
    count — the invariant that makes them a budget pricing unit."""
    from pyspark.sql import functions as F
    from mapreducewordcount_spark.functions.text_metrics import words

    docs = _docs(spark, ["some words repeat some words",
                         "entirely novel phrasing here"])
    merges = bpe_train(docs, n_merges=16)
    stats = bpe_token_stats(docs, merges)
    chars = docs.select(
        "doc_id",
        F.aggregate(words("text"), F.lit(0),
                    lambda acc, w: acc + F.length(w)).alias("n_chars"))
    joined = {r.doc_id: r for r in stats.join(chars, "doc_id").collect()}
    for r in joined.values():
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars


def test_bpe_token_stats_tolerates_null_text(spark):
    """A NULL text degrades to 0 tokens (like the SQL-expression
    operators) instead of TypeError-ing the whole task."""
    docs = spark.createDataFrame([(0, "aa ab"), (1, None)],
                                 "doc_id long, text string")
    merges = bpe_train(docs.filter("text is not null"), n_merges=4)
    got = {r.doc_id: r for r in bpe_token_stats(docs, merges).collect()}
    assert got[0].n_words == 2
    assert got[1].n_words == 0 and got[1].n_bpe_tokens == 0
