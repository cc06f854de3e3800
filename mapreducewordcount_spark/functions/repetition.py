"""Repetition / boilerplate quality signals (Gopher-rule family).

The classic "repetitious document" filters used on web text before
LLM training (Rae et al. 2021, *Scaling Language Models* — the
"Gopher rules"; public paper): fraction of duplicate lines, fraction
of characters in duplicate lines, top-word dominance. High values
mean navigation menus, SEO spam, or generator loops.

All pure ``pyspark.sql.functions`` array/lambda compositions — one
tokenize/split per document, whole-stage-codegen'd, zero Python in
the hot path. At 100 TB these run as a narrow map over the scan with
no shuffle of their own (``spread()`` in front of them is a no-op
once the scan has full parallelism — see ``sources/tables.py``);
only the corpus-level *boilerplate* detector
(``operators/boilerplate.py``) needs a shuffle, because its unit of
repetition is cross-document.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.text_metrics import words


def lines(col: Column | str) -> Column:
    """text → array of non-empty trimmed lines.

    The trim lambda MUST be unary: ``F.transform`` inspects the
    callable's arity and a bare ``F.trim`` (signature
    ``trim(col, trim=None)``) gets called as the BINARY form
    ``trim(element, index)`` — i.e. the element index becomes the
    set of characters to strip, so nothing (or worse, index digits)
    gets trimmed. Caught by the round-4 line-dedup whitespace test.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.transform(F.split(c, r"\n"), lambda x: F.trim(x)),
                    lambda x: F.length(x) > 0)


def dup_line_fraction(col: Column | str) -> Column:
    """1 − distinct_lines/lines; 0.0 for docs with no lines."""
    ls = lines(col)
    n = F.size(ls)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(ls)).cast("double") / n
                  ).otherwise(F.lit(0.0))


def dup_line_char_fraction(col: Column | str) -> Column:
    """Characters inside *repeated* line occurrences / total line chars.

    A line occurring k times contributes (k−1)·len(line) duplicated
    characters — i.e. total chars minus chars of one copy of each
    distinct line. 0.0 for docs with no lines.
    """
    ls = lines(col)
    tot = F.aggregate(ls, F.lit(0).cast("long"),
                      lambda acc, x: acc + F.length(x))
    uniq = F.aggregate(F.array_distinct(ls), F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))
    return F.when(tot > 0,
                  (tot - uniq).cast("double") / tot).otherwise(F.lit(0.0))


def top_word_fraction(col: Column | str) -> Column:
    """Occurrences of the single most frequent word / total words.

    Computed without exploding: sort the word array, then fold once
    counting the longest run of equal adjacent words. 0.0 for empty
    docs.
    """
    ws = F.array_sort(words(col))
    n = F.size(ws)
    # fold state: (current run word index start encoded as run length,
    # best run length). acc.run counts the streak ending at position i.
    init = F.named_struct(F.lit("run"), F.lit(0).cast("long"),
                          F.lit("best"), F.lit(0).cast("long"),
                          F.lit("prev"), F.lit(None).cast("string"))
    step = lambda acc, w: F.named_struct(  # noqa: E731
        F.lit("run"),
        F.when(acc["prev"].isNotNull() & (acc["prev"] == w),
               acc["run"] + 1).otherwise(F.lit(1).cast("long")),
        F.lit("best"),
        F.greatest(acc["best"],
                   F.when(acc["prev"].isNotNull() & (acc["prev"] == w),
                          acc["run"] + 1).otherwise(F.lit(1).cast("long"))),
        F.lit("prev"), w)
    best = F.aggregate(ws, init, step)["best"]
    return F.when(n > 0, best.cast("double") / n).otherwise(F.lit(0.0))
