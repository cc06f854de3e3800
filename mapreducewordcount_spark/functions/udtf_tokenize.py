"""The tokenizer as a SQL-callable Python UDTF.

SURVEY.md §2.4 observes the reference's ``separate_words``
(``src/worker.py:37-53``) is "the moral equivalent of one UDTF
(string → rows of words)". This module makes that literal: a
registered table function usable from SQL —

    SELECT t.word FROM lines, LATERAL tokenize_words(value) t

This is the *extensibility demo* (user-defined table functions are a
surface the engine exposes); the production wordcount path stays on
the codegen'd column expressions in ``functions/tokenize.py`` — a
row-based Python UDTF is the slow path and says so here.
"""

from __future__ import annotations

import string

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word string")
class TokenizeWords:
    """line → one row per normalized word (reference D4-D7 semantics,
    native mode: whitespace split, ends-strip, lower, drop empties)."""

    def eval(self, line: str):  # noqa: D102 - UDTF contract
        if line is None:
            return
        for raw in line.split():
            w = raw.strip(string.punctuation).lower()
            if w:
                yield (w,)


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's table functions for SQL use."""
    spark.udtf.register("tokenize_words", TokenizeWords)
