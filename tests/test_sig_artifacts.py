"""Signature-artifact oracle plumbing (sources/sig_artifacts.py).

The full three-check comparison of the signature queries against
their artifact oracles runs in tests/test_oracle.py's registry sweep;
here we pin the plumbing that sweep relies on: the cross-engine
corpus key, and the artifact's byte-stable layout.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreducewordcount_spark.sources.sig_artifacts import (
    ARTIFACT_ROOT,
    corpus_key,
    materialize_signatures,
)
from tests.conftest import SF_ORACLE


def test_corpus_key_matches_duckdb(spark):
    """The Spark side of the key must equal what the oracle's WHERE
    clause computes — (count(*), sum(length(text))) — or the glob scan
    selects no artifact and the oracle silently returns zero rows."""
    from mapreducewordcount_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    n, chars = corpus_key(docs)
    dn, dchars = duckdb.sql(
        f"SELECT count(*), sum(length(text)) "
        f"FROM '{SF_ORACLE}/documents.parquet'").fetchone()
    assert (n, chars) == (dn, dchars)


def test_corpus_key_distinguishes_driver_corpora(spark):
    """sf0.001 and sf0.01 both have 500 documents; the chars component
    must tell them apart or their artifacts would collide."""
    from mapreducewordcount_spark.sources.tables import load_table

    keys = {corpus_key(load_table(spark, sf, "documents"))
            for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")}
    assert len(keys) == 2


def test_materialize_roundtrip_and_stable_layout(spark, tmp_path):
    sigs = spark.createDataFrame(
        [(3, 7), (1, -5), (2, 0)], "doc_id long, s long")
    key = (3, 42)
    # writes into the committed artifacts tree (materialize_signatures
    # has no root override by design) — clean up even on assert failure
    # or the leftover pollutes git status and later glob-scanning runs
    import shutil

    try:
        back = materialize_signatures(sigs, "test_roundtrip", key,
                                      "doc_id", "s")
        assert {(r.id, r.sig) for r in back.collect()} \
            == {(3, 7), (1, -5), (2, 0)}
        art = ARTIFACT_ROOT / "test_roundtrip" / "k=3_42"
        assert [p.name for p in art.iterdir()] == ["sig.parquet"]
        # key columns ride every row so the oracle's WHERE can select
        row = duckdb.sql(f"SELECT DISTINCT n_docs, text_chars "
                         f"FROM '{art}/sig.parquet'").fetchone()
        assert row == (3, 42)
    finally:
        shutil.rmtree(ARTIFACT_ROOT / "test_roundtrip",
                      ignore_errors=True)


def test_committed_artifact_matches_fresh_recompute(spark):
    """The committed artifact bytes are what make the oracle
    independent of execution order (a fresh checkout's oracle may
    read them before the engine ever runs). If an operator's hash
    family changes without regenerating artifacts, the gate would
    self-heal (Spark runs first and overwrites) but the
    committed-bytes guarantee would silently rot — pin it here for
    the cheapest signature query."""
    import hashlib

    from mapreducewordcount_spark.operators.dedup import simhash_docs
    from mapreducewordcount_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    n, chars = corpus_key(docs)
    art = (ARTIFACT_ROOT / "dedup_simhash_pairs" / f"k={n}_{chars}"
           / "sig.parquet")
    assert art.exists(), "artifact for the gate corpus must be committed"
    before = hashlib.md5(art.read_bytes()).hexdigest()
    materialize_signatures(simhash_docs(docs), "dedup_simhash_pairs",
                           (n, chars), "doc_id", "simhash")
    assert hashlib.md5(art.read_bytes()).hexdigest() == before, \
        "regenerated artifact differs from the committed bytes — " \
        "the hash family changed; re-run the three-sf generation and " \
        "commit the new artifacts"


def test_artifact_query_paths_match_one_shot_operators(spark):
    """The gate queries route through materialize→readback; their
    docstrings claim output identical to the one-shot operators for
    the same parameters. Pin it — a drifted default (band count,
    refine, k) would silently decouple what the gate verifies from
    what the library ships."""
    from mapreducewordcount_spark.operators import dedup as dd
    from mapreducewordcount_spark.operators.pq import pq_topk
    from mapreducewordcount_spark.operators.similarity import lsh_topk
    from mapreducewordcount_spark.queries.dedup_queries import (
        ann_lsh_topk,
        ann_pq_topk,
        dedup_embedding_pairs_lsh,
    )
    from mapreducewordcount_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))

    via_artifact = {tuple(r) for r in
                    dedup_embedding_pairs_lsh(spark, SF_ORACLE).collect()}
    direct = {tuple(r) for r in
              dd.embedding_dup_pairs_lsh(emb, threshold=0.45).collect()}
    assert via_artifact == direct

    via_artifact = {tuple(r) for r in
                    ann_lsh_topk(spark, SF_ORACLE).collect()}
    direct = {tuple(r) for r in lsh_topk(emb, queries, k=5).collect()}
    assert via_artifact == direct

    via_artifact = {tuple(r) for r in ann_pq_topk(spark, SF_ORACLE).collect()}
    direct = {tuple(r) for r in pq_topk(emb, queries, k=5).collect()}
    assert via_artifact == direct
