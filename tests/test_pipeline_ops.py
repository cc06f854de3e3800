"""Unit semantics for the corpus-hygiene operators: decontamination,
PII scrubbing, deterministic sampling — planted ground truth, not
oracle agreement (tests/test_oracle.py covers that side).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.pii import pii_counts, scrub_pii
from mapreducewordcount_spark.functions.sampling import (
    hash_bernoulli,
    stratified_hash_sample,
)
from mapreducewordcount_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_drops_exactly_overlapping_docs(spark):
    evald = _docs(spark, [(100, "the quick brown fox jumps high")])
    train = _docs(spark, [
        (1, "the quick brown fox runs away"),      # shares 2 eval 3-grams
        (2, "a completely different document here"),
        (3, "quick brown fox jumps over things"),  # shares 2
        (4, "nothing in common at all today"),
    ])
    report = {r.doc_id: r.n_hits
              for r in contamination_report(train, evald).collect()}
    assert report == {1: 2, 3: 2}
    clean = decontaminate(train, evald)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 4]
    # min_hits raises the bar: nobody shares 3 distinct 3-grams
    assert sorted(r.doc_id for r in
                  decontaminate(train, evald, min_hits=3).collect()) \
        == [1, 2, 3, 4]


def test_decontaminate_keeps_schema(spark):
    evald = _docs(spark, [(9, "x y z w")])
    train = _docs(spark, [(1, "p q r s")])
    assert decontaminate(train, evald).columns == train.columns


def test_pii_scrub_and_counts(spark):
    text = ("mail a.user+tag@sub.example.org or bob@x.io, "
            "call 555-123-4567 or 555.987.6543, "
            "ssn 123-45-6789, host 192.168.0.1 done")
    row = (spark.range(1)
           .select(scrub_pii(F.lit(text)).alias("s"),
                   pii_counts(F.lit(text)).alias("c"))
           .collect()[0])
    assert row.s == ("mail <EMAIL> or <EMAIL>, "
                     "call <PHONE> or <PHONE>, "
                     "ssn <SSN>, host <IP> done")
    assert (row.c.n_email, row.c.n_ipv4, row.c.n_phone, row.c.n_ssn) \
        == (2, 1, 2, 1)


def test_pii_clean_text_untouched(spark):
    text = "no identifiers here, just 3.14 and version 1.2.3 and 12-34"
    row = (spark.range(1)
           .select(scrub_pii(F.lit(text)).alias("s"),
                   pii_counts(F.lit(text)).alias("c"))
           .collect()[0])
    assert row.s == text
    assert (row.c.n_email, row.c.n_ipv4, row.c.n_phone, row.c.n_ssn) \
        == (0, 0, 0, 0)


def test_hash_bernoulli_matches_python_md5(spark):
    df = spark.range(500).select(F.col("id").alias("k"))
    got = sorted(r.k for r in
                 df.filter(hash_bernoulli("k", "40")).collect())
    want = sorted(i for i in range(500)
                  if hashlib.md5(str(i).encode()).hexdigest()[:2] < "40")
    assert got == want
    assert 0 < len(got) < 500


def test_hash_sample_rates_compose(spark):
    """A tighter threshold selects a subset of a looser one — rates
    compose, the property rand() sampling lacks."""
    df = spark.range(2000).select(F.col("id").alias("k"))
    loose = set(r.k for r in df.filter(hash_bernoulli("k", "80")).collect())
    tight = set(r.k for r in df.filter(hash_bernoulli("k", "20")).collect())
    assert tight < loose


def test_hash_bernoulli_rejects_bad_threshold():
    with pytest.raises(ValueError):
        hash_bernoulli("k", "8")
    with pytest.raises(ValueError):
        hash_bernoulli("k", "XY")


def test_stratified_rates_apply_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        "k long, s string")
    keep = stratified_hash_sample("s", "k", {"a": "ff"}, default_hex="00")
    got = df.filter(keep).groupBy("s").count().collect()
    by = {r.s: r["count"] for r in got}
    # stratum a: threshold ff keeps ~255/256 of rows; stratum b: dropped
    assert by.get("b", 0) == 0
    assert by["a"] >= 490
