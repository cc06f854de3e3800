"""Bloom-prefiltered decontamination: exactness, no false negatives,
measured false-positive rate, and the map-side probe plan shape.

The operator's contract is that Bloom parameters move WORK, not
answers — the prefilter may only ever pass extra candidates, and the
exact verify join removes them. These tests pin each half of that
contract separately, then the end-to-end equality with the plain
broadcast-semi operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.decontam import (
    bloom_ngram_filter,
    bloom_probe,
    contamination_report,
    contamination_report_bloom,
)
from mapreducewordcount_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


def _split(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    return tr, ev


def test_bloom_report_equals_exact_report(spark):
    tr, ev = _split(spark)
    exact = contamination_report(tr, ev, "doc_id", "text", n=3)
    bloom = contamination_report_bloom(tr, ev, "doc_id", "text", n=3)
    a = sorted(tuple(r) for r in exact.collect())
    b = sorted(tuple(r) for r in bloom.collect())
    assert a == b
    assert len(a) > 0  # the corpus actually exercises the operator


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("member-ngram-"), F.col("id")).alias("ngram"))
    bits, m = bloom_ngram_filter(members, "ngram")
    # every member must pass all k bit tests — Bloom filters have no
    # false negatives, and a miss here means the probe hashes diverge
    # from the build hashes
    assert bloom_probe(members, "ngram", bits, m).count() == 2000
    # disjoint probes: the deterministic xxhash64 positions give a
    # fixed fp count; pin it well under the 16-bits/elem design point
    probes = spark.range(0, 4000).select(
        F.concat(F.lit("absent-ngram-"), F.col("id")).alias("ngram"))
    fp = bloom_probe(probes, "ngram", bits, m).count()
    assert fp / 4000.0 < 0.02  # design fpp ~0.24% at 16 bits, k=4


def test_bloom_prefilter_actually_filters(spark):
    """Survivor count must sit at true-hits plus at most the design
    false-positive slack — i.e. the prefilter does the work the scale
    story claims, rather than waving everything through to verify."""
    from mapreducewordcount_spark.functions.text_metrics import shingles
    from mapreducewordcount_spark.operators.decontam import eval_ngram_set

    tr, ev = _split(spark)
    ngrams = eval_ngram_set(ev, "text", 3)
    bits, m = bloom_ngram_filter(ngrams, "ngram")
    exploded = tr.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", 3))).alias("ngram"))
    total = exploded.count()
    survivors = bloom_probe(exploded, "ngram", bits, m).count()
    true_hits = exploded.join(ngrams, "ngram", "left_semi").count()
    assert true_hits <= survivors  # verify side never loses a hit
    assert survivors <= true_hits + max(50, int(0.01 * total))
    assert survivors < total  # it filtered something


def test_bloom_probe_plan_is_mapside(spark):
    """The probe stage must be k broadcast-hash joins — no Exchange of
    the probed rows before the candidate filter."""
    tr, ev = _split(spark)
    from mapreducewordcount_spark.operators.decontam import eval_ngram_set

    ngrams = eval_ngram_set(ev, "text", 3)
    bits, m = bloom_ngram_filter(ngrams, "ngram")
    probed = bloom_probe(tr.select("doc_id",
                                   F.col("text").alias("probe_ngram")),
                         "probe_ngram", bits, m, k=4)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    # the probe input never shuffles: the bit-table BUILD side may
    # aggregate (it is small by construction), but no shuffle Exchange
    # may partition on anything the probe side carries (its uniquely
    # named column, the row id, or the _p* probe positions)
    import re
    bad = [ln for ln in plan.splitlines()
           if re.search(r"\bExchange\b", ln)
           and "broadcast" not in ln.lower()
           and re.search(r"probe_ngram|doc_id|_p\d", ln)]
    assert bad == [], bad
