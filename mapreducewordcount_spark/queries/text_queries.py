"""Text-pipeline batch 2: n-grams, stopword filtering, TF-IDF.

The SURVEY §2.5 extension surface named n-gram and stop-word handling
explicitly (ml.feature.NGram / StopWordsRemover equivalents); TF-IDF
is the classic keyword-extraction composition on top — all expressed
as column expressions + two aggregations, no MLlib pipeline objects
needed (and the DuckDB oracle covers every step, ln() included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.text_metrics import EN_STOPWORDS, words
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table, spread

_WORDS_CTE = r"""
w AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x, '^[!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]+$', '', 'g')),
           x -> x <> '') AS words
  FROM documents
)
"""

_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", F.explode(words("text")).alias("word"))


def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 word bigrams (NGram-equivalent, n=2).

    Bigrams are built per-document with ``zip_with`` over the words
    array and its tail — arrays never leave the row, the only shuffle
    is the final count."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    ws = words("text")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    # top-k via TakeOrderedAndProject (per-partition heaps), rank
    # derived on the 25-row cut — not a partition-less window over the
    # full bigram table (see word_count_topk)
    top = (docs.select(F.explode(bigrams).alias("bigram"))
           .groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.col("n").desc(), F.col("bigram")).limit(25))
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "bigram", "n"))


TOP_BIGRAMS_SQL = f"""
WITH {_WORDS_CTE},
b AS (
  SELECT unnest([words[i] || ' ' || words[i+1]
                 for i in range(1, greatest(len(words) - 1, 0) + 1)]) AS bigram
  FROM w
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, bigram) AS INT) AS rank, bigram, n
FROM (SELECT bigram, count(*) AS n FROM b GROUP BY bigram)
QUALIFY rank <= 25
"""


def content_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count with stopwords removed (StopWordsRemover-equivalent):
    the fixed list is folded into the plan as an array literal —
    a broadcast-by-value the optimizer constant-folds."""
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return (_doc_words(spark, sf_dir)
            .filter(~F.array_contains(stops, F.col("word")))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


CONTENT_WORDS_SQL = f"""
WITH {_WORDS_CTE}
SELECT word, count(*) AS cnt
FROM (SELECT unnest(words) AS word FROM w)
WHERE NOT list_contains({_STOPS_SQL}, word)
GROUP BY word
"""


def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by smoothed TF-IDF.

    tf = in-doc count; idf = ln((N+1)/(df+1)) + 1 (sklearn-style
    smoothing). Two aggregations + one broadcast join of the
    vocabulary-sized df table; ln() is IEEE-identical across engines
    so the oracle rounds at 4dp safely.

    N enters as a broadcast 1-row aggregate crossed into the plan —
    not a driver-side ``docs.count()``, which would run an extra job
    (and an extra corpus scan) before the query even starts.
    """
    dw = _doc_words(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = dw.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (tf.groupBy("word")
              .agg(F.count(F.lit(1)).alias("df")))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("tfidf").desc(), F.col("word")))
    return (tf.join(F.broadcast(df_tbl), "word")
            .crossJoin(F.broadcast(n_docs))
            .withColumn("tfidf", F.round(
                F.col("tf") * (F.log((F.col("n_docs") + F.lit(1)).cast("double")
                                     / (F.col("df") + 1)) + 1), 4))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "rank", "word", "tfidf"))


TFIDF_SQL = f"""
WITH {_WORDS_CTE},
dw AS (SELECT doc_id, unnest(words) AS word FROM w),
tf AS (SELECT doc_id, word, count(*) AS tf FROM dw GROUP BY doc_id, word),
dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY round(tf * (ln((n_docs + 1.0) / (df + 1)) + 1), 4) DESC,
                                        word) AS INT) AS rank,
       word,
       round(tf * (ln((n_docs + 1.0) / (df + 1)) + 1), 4) AS tfidf
FROM tf JOIN dfq USING (word) CROSS JOIN n
QUALIFY rank <= 3
"""


QUERIES = {
    "top_bigrams": QuerySpec(top_bigrams, TOP_BIGRAMS_SQL),
    "content_word_counts": QuerySpec(content_word_counts, CONTENT_WORDS_SQL),
    "doc_keywords_tfidf": QuerySpec(doc_keywords_tfidf, TFIDF_SQL),
}
