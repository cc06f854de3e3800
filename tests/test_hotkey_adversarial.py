"""Adversarial hot-key corpus: one line and one 5-gram present in
EVERY document — exactly the input shape that made the round-3/4
Window-based frequency passes a single-task straggler. The round-5
partial-agg rewrites must stay CORRECT on it (the plan tests pin that
they stay window-free; these tests pin the answers).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_DOCS = 200
HOT_LINE = "subscribe to our newsletter today"
HOT_RUN = "terms of service apply here"  # one shared 5-gram


def _corpus(spark):
    rows = [(i,
             f"unique opening line number {i}\n"
             f"{HOT_LINE}\n"
             f"{HOT_RUN} plus unique tail {i} content",
             "en", "s", 0)
            for i in range(N_DOCS)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_c4_line_dedup_hot_line_single_survivor(spark):
    """The universal line survives ONLY in doc 0 (corpus-first
    occurrence); every doc keeps its unique lines."""
    from mapreducewordcount_spark.operators.linededup import (
        strip_duplicate_lines,
    )

    out = {r.doc_id: r for r in
           strip_duplicate_lines(_corpus(spark)).collect()}
    assert len(out) == N_DOCS
    assert HOT_LINE in out[0].text_clean
    hot_survivors = [d for d, r in out.items() if HOT_LINE in r.text_clean]
    assert hot_survivors == [0]
    # unique lines always survive
    assert all(f"unique opening line number {d}" in r.text_clean
               for d, r in out.items())


def test_boilerplate_flags_universal_line_everywhere(spark):
    """Every doc reports the universal line as boilerplate; unique
    lines never count."""
    from mapreducewordcount_spark.operators.boilerplate import (
        boilerplate_report,
    )

    out = boilerplate_report(_corpus(spark), min_docs=3).collect()
    assert len(out) == N_DOCS
    assert all(r.n_boiler_lines == 1 for r in out), \
        [(r.doc_id, r.n_boiler_lines) for r in out[:5]]


def test_ngram_novelty_hot_ngram_first_doc_only(spark, tmp_path):
    """The shared run's 3-grams are novel only for doc 0; later docs'
    novelty counts only their unique material."""
    from mapreducewordcount_spark.queries.pipeline3 import doc_ngram_novelty

    d = tmp_path / "docs"
    _corpus(spark).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in doc_ngram_novelty(spark, str(d)).collect()}
    assert len(got) == N_DOCS
    # doc 0 introduces everything it contains
    assert got[0].n_novel == got[0].n_shingles
    # later docs: novelty strictly below total (the hot material is
    # never novel again) but nonzero (unique ids make fresh 3-grams)
    later = [got[i] for i in range(1, N_DOCS)]
    assert all(0 < r.n_novel < r.n_shingles for r in later)


def test_source_overlap_hot_ngram_counts_once_per_source(spark):
    """A 3-gram shared by every doc of both sources contributes
    exactly ONE unit to shared_ngrams — the distinct-set semantics
    that keep the hot key bounded."""
    from mapreducewordcount_spark.operators.decontam import (
        source_ngram_overlap,
    )

    rows = ([(i, f"{HOT_RUN} alpha{i} beta{i} gamma{i}", "s1")
             for i in range(50)]
            + [(100 + i, f"{HOT_RUN} delta{i} eps{i} zeta{i}", "s2")
               for i in range(50)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    got = {(r.source_a, r.source_b): r
           for r in source_ngram_overlap(docs).collect()}
    r = got[("s1", "s2")]
    # shared = exactly the 3 shingles of the 5-word hot run
    assert r.shared_ngrams == 3, r
