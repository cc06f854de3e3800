"""RAG-style document chunking: fixed-size overlapping token windows.

The retrieval-pipeline primitive: split every document into
``chunk_size``-token chunks advancing by ``stride = chunk_size -
overlap`` tokens, so consecutive chunks share ``overlap`` tokens of
context. Deterministic (pure function of the text), whitespace-token
based (chunking must preserve the original text, so no lowercasing or
punct-stripping — unlike the dedup tokenizer).

Scale shape: a narrow map + explode — ``regexp_extract_all`` to the
token array, ``sequence``/``explode`` to one row per chunk, ``slice``
to the window. ZERO shuffles, zero UDFs; the whole plan rides the
scan in one WholeStageCodegen span (asserted in tests/test_plans
style plan tests), so throughput at 100 TB is scan-bound. Chunk count
is integer arithmetic (no float log/ceil), identical on any engine.

Reference parity: the reference (549-LoC word count,
/root/reference/src/worker.py) has no chunking surface; SURVEY.md
§2.5 claims this as LLM-pipeline extension scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_size: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """docs → one row per (doc, chunk): chunk_index, token count, text.

    Chunks cover every token: the last chunk may be shorter than
    ``chunk_size`` (never empty); a doc with <= chunk_size tokens
    yields exactly one chunk; empty docs yield no rows. The number of
    chunks for n tokens is ``1 + ceil((n - chunk_size) / stride)``
    computed as ``(n - chunk_size + stride - 1) div stride + 1`` so
    no floating point touches the row count.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got "
                         f"overlap={overlap} chunk_size={chunk_size}")
    stride = chunk_size - overlap

    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(r"\S+"), F.lit(0))
    base = (docs
            .select(F.col(id_col), toks.alias("toks"))
            .withColumn("n", F.size("toks"))
            .filter(F.col("n") > 0)
            .withColumn(
                "n_chunks",
                F.when(F.col("n") <= chunk_size, F.lit(1))
                # `div` is true integer division — Spark's `/` is
                # double division, whose rounding could (in principle)
                # diverge from the oracle's integer `//` at extreme
                # token counts (ADVICE r5); integer-only keeps the
                # documented "no floating point touches the row count"
                # contract literally true
                .otherwise(F.expr(
                    f"(n - {chunk_size} + {stride - 1}) div {stride}")
                    .cast("int") + 1)))
    chunk_toks = F.slice(F.col("toks"),
                         F.col("chunk_index") * stride + 1,
                         F.lit(chunk_size))
    return (base
            .select(id_col, "toks",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_chunks") - 1)).alias("chunk_index"))
            .select(F.col(id_col),
                    F.col("chunk_index").cast("int").alias("chunk_index"),
                    F.size(chunk_toks).alias("n_chunk_tokens"),
                    F.concat_ws(" ", chunk_toks).alias("chunk_text")))
