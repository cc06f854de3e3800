"""Property-based tests (hypothesis) for the scalar-function core.

Spark-vs-Python equivalence on *generated* inputs — the tokenizer and
bucket expressions must agree with their pure-Python specifications
on arbitrary text, not just the golden fixtures. Batched: hypothesis
generates corpora driver-side, one Spark job checks the whole batch
(per-example Spark jobs would be minutes per property).
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducewordcount_spark.functions.buckets import bucket_expr
from mapreducewordcount_spark.functions.tokenize import tokenize_expr

# words over a latin-1-ish alphabet incl. punctuation and digits
_word = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation + "éàüñøπ",
    min_size=1, max_size=12)
_line = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _native_reference(line: str) -> list[str]:
    out = []
    for raw in line.split():
        w = raw.strip(string.punctuation).lower()
        if w:
            out.append(w)
    return out


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(_line, min_size=1, max_size=40))
def test_native_tokenizer_matches_python_spec(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = [r.w for r in df.select(tokenize_expr("value").alias("w")).collect()]
    assert got == [_native_reference(ln) for ln in lines]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(_word.filter(lambda w: w.strip()), min_size=1, max_size=60),
       m=st.sampled_from([1, 2, 4, 7, 26]))
def test_bucket_expr_matches_python_ord(spark, words, m):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = [r.b for r in df.select(bucket_expr("word", m).alias("b")).collect()]
    assert got == [ord(w[0].lower()) % m for w in words]
