#!/usr/bin/env python
"""Chunk-family stress: chunk_share_pairs growth on synthetic chunk
tables 10x-100x beyond the gate testdata.

The operator's scale claim is that the fanout cap bounds pair space
by construction; this measures it. Synthesizes a chunk table of
``n_docs`` documents x ~20 chunks each where chunk hashes are drawn
zipf-ish from a vocabulary (real chunk stores are heavy-tailed:
boilerplate chunks occur everywhere, content chunks are near-unique),
plants 100 near-dup doc pairs (80% chunk overlap), then measures:

- kept rows after the fanout cap (how much of the table survives),
- wall-clock of the full pair operator, pair count, and
- planted recall (every planted pair must surface with
  n_shared >= min_shared).

Results feed SCALE.md's round-9 section.

Usage: python tools/chunk_stress.py [n_docs ...]
Default: 100000 1000000.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from mapreducewordcount_spark.operators.cdchunk import chunk_share_pairs

CHUNKS_PER_DOC = 20
PLANTED = 100
OVERLAP = 16          # shared chunks per planted pair (>= min_shared)
SEED = 7


def synth_chunks(spark, n_docs: int):
    """(doc_id, chunk_md5, length) rows: per-doc chunk ids drawn from
    a heavy-tailed vocabulary sized to the corpus (~unique content
    chunks + ubiquitous boilerplate), plus planted near-dup pairs."""
    rng = np.random.default_rng(SEED)
    vocab = n_docs * CHUNKS_PER_DOC // 2
    # zipf-ish: rank r gets mass ~ 1/r; the head ranks are the
    # boilerplate the fanout cap exists for
    ranks = rng.zipf(1.3, size=n_docs * CHUNKS_PER_DOC)
    ranks = np.minimum(ranks, vocab) - 1
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64),
                        CHUNKS_PER_DOC)
    # planted pairs: docs (i, n_docs + i) share OVERLAP private chunks
    pd_ids, pd_hash = [], []
    for i in range(PLANTED):
        private = vocab + i * OVERLAP + np.arange(OVERLAP)
        for d in (n_docs + 2 * i, n_docs + 2 * i + 1):
            pd_ids.extend([d] * OVERLAP)
            pd_hash.extend(private.tolist())
    all_ids = np.concatenate([doc_ids,
                              np.array(pd_ids, dtype=np.int64)])
    all_hash = np.concatenate([ranks,
                               np.array(pd_hash, dtype=np.int64)])
    import pandas as pdl
    pdf = pdl.DataFrame({"doc_id": all_ids,
                         "h": all_hash.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F
    return (df.select("doc_id",
                      F.md5(F.col("h").cast("string")).alias("chunk_md5"),
                      F.lit(100).alias("length")))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             # one local JVM holds driver+executors: size it for the
             # 20M-row synthetic table (default 1g OOMs at n=1e6)
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    for n in sizes:
        chunks = synth_chunks(spark, n)
        t0 = time.perf_counter()
        pairs = chunk_share_pairs(chunks).persist()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        got = {(r.a_id, r.b_id) for r in
               pairs.select("a_id", "b_id").collect()}
        pairs.unpersist()
        planted = {(n + 2 * i, n + 2 * i + 1) for i in range(PLANTED)}
        recall = len(planted & got)
        print(f"n_docs={n} rows={(n * CHUNKS_PER_DOC)} "
              f"pairs={n_pairs} wall={wall:.1f}s "
              f"planted_recall={recall}/{PLANTED}")
        assert recall == PLANTED, "planted pair missed"
    spark.stop()


if __name__ == "__main__":
    main()
