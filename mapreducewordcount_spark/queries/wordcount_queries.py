"""Word-count family over the ``documents`` table.

The reference's entire query surface (SURVEY.md §2.1 D1-D13)
re-expressed against the driver's documents corpus so the DuckDB
oracle can check it: tokenize → normalize → count-by-key, the
first-character bucket partitioner, and the top-k cut.

The oracle SQL mirrors the *native* tokenizer exactly: whitespace
split, ASCII-punctuation ends-strip, lowercase, drop empties
(reference ``src/worker.py:48-53`` semantics minus Treebank
contraction splitting — see functions/tokenize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.buckets import bucket_expr
from mapreducewordcount_spark.functions.tokenize import tokenize_expr
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table

# DuckDB rendering of the native tokenizer; the char class is
# string.punctuation as ranges, same pattern Spark runs (tokenize.py).
_ORACLE_WORDS = r"""
  SELECT lower(regexp_replace(
           unnest(regexp_split_to_array(text, '\s+')),
           '^[!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]+$', '', 'g')) AS word
  FROM documents
"""


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread() here: the groupBy's own exchange redistributes right
    # after tokenize, and a pre-shuffle measured net-negative (the
    # doc_* metric queries DO spread — they keep all work pre-shuffle)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokenize_expr("text")).alias("word"))


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D11: count-by-word over the whole corpus."""
    return _words(spark, sf_dir).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt"))


WORD_COUNT_SQL = f"""
SELECT word, count(*) AS cnt
FROM ({_ORACLE_WORDS}) t
WHERE word <> ''
GROUP BY word
"""


def word_count_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 partitioner as an aggregation dimension: per-bucket totals
    under the reference's ``ord(first_char) % 4`` partitioner —
    also the skew exhibit (vowel buckets dominate; SURVEY.md §1.4)."""
    return (_words(spark, sf_dir)
            .withColumn("bucket", bucket_expr("word", 4))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.count_distinct(F.col("word")).alias("n_distinct_words")))


WORD_COUNT_BUCKETS_SQL = f"""
SELECT CAST(ascii(word) % 4 AS INT) AS bucket,
       count(*) AS n_occurrences,
       CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words
FROM ({_ORACLE_WORDS}) t
WHERE word <> ''
GROUP BY 1
"""


def word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 words (rank + count), deterministic tie-break.

    ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` —
    each partition keeps a k-row heap and only k rows per partition
    reach the driver-side merge. The rank window then runs over the
    already-cut 20-row result (single tiny partition), never over the
    full vocabulary; a partition-less window BEFORE the cut would
    sort the whole corpus vocabulary on one task (the degenerate plan
    SCALE.md warns about, pinned away in tests/test_plans.py).
    """
    counts = word_count(spark, sf_dir)
    top = counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(20)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "word", "cnt"))


WORD_COUNT_TOPK_SQL = f"""
WITH counts AS ({WORD_COUNT_SQL})
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INT) AS rank, word, cnt
FROM counts
QUALIFY rank <= 20
"""


def word_count_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew path, gate-checked: two-phase salted aggregation —
    count on ``(word, salt)`` (the hot word spreads over 8 reducers,
    map-side combine still applies), then re-sum on ``word``. Same
    answer as ``wc_word_count`` by construction, so it shares that
    oracle. The salt hashes the deterministic doc_id so stage retries
    reproduce identical counts (the invariant functions/buckets.py
    documents); grouping on the (word, salt) COLUMN PAIR rather than
    a concatenated string key sidesteps the separator-collision
    hazard for words that contain the separator."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id",
                        F.explode(tokenize_expr("text")).alias("word"))
    phase1 = (words
              .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
              .groupBy("word", "salt")
              .agg(F.count(F.lit(1)).alias("n")))
    return phase1.groupBy("word").agg(F.sum("n").alias("cnt"))


QUERIES = {
    "wc_word_count": QuerySpec(word_count, WORD_COUNT_SQL),
    "wc_bucket_hist": QuerySpec(word_count_buckets, WORD_COUNT_BUCKETS_SQL),
    "wc_top20": QuerySpec(word_count_topk, WORD_COUNT_TOPK_SQL),
    "wc_word_count_salted": QuerySpec(word_count_salted, WORD_COUNT_SQL),
}
