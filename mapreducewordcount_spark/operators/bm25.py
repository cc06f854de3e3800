"""BM25 ranked retrieval over a document corpus.

Query-time keyword retrieval is the curation primitive the registry's
per-document features (``doc_keywords_tfidf``) don't cover: given a
small set of query terms, rank every matching document by BM25 and
return the top-k. Training-data pipelines use exactly this shape to
pull benchmark-adjacent documents for decontamination review and to
mine targeted subsets ("all docs about X") out of a web crawl.

Spark-first plan (reference has no counterpart — §2.5 extension
surface; the tokenizer itself is reference stages D4-D7,
``src/worker.py:37-53``):

- tokenize with the native codegen expression
  (``functions.tokenize.tokenize_expr``) — no Python in the scan;
- **filter postings to the query terms immediately after the
  explode**, so the only shuffle aggregates ``(doc, term)`` rows for
  terms that can score — at 100 TB the shuffle carries the postings
  of |Q| terms, not the corpus vocabulary;
- term document-frequencies form a ≤|Q|-row frame and the corpus
  (N, total_len) statistics a 1-row frame — both joined back
  broadcast, so scoring is a map-side projection;
- top-k lands in ``TakeOrderedAndProject`` (orderBy + limit), never a
  global sort; the row_number rank is assigned on the already-cut
  ≤k-row frame.

Cross-engine exactness (the DuckDB oracle hash-matches bit-for-bit):

- idf uses the **rational "odds" form** ``(N - df + 0.5)/(df + 0.5)``
  — monotone in df like the canonical ``ln`` form but built from
  IEEE-exact ``+ - * /`` only. ``ln`` is libm-implementation-defined
  and a 1-ulp JVM/DuckDB divergence would flip rounded scores.
- every float literal is injected via ``repr(float)`` into BOTH
  engines, so each parses to the identical double;
- per-(doc, term) contributions are rounded to integer micro-units
  **before** the per-document sum — integer addition is
  order-invariant, so partitioning cannot reorder a float sum
  (the ``cluster_stats`` mean trick).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.tokenize import tokenize_expr

#: score quantum: contributions are rounded to 1e-6 units.
SCALE = 1_000_000


def bm25_topk(docs: DataFrame, terms: Sequence[str], *,
              k1: float = 1.2, b: float = 0.75, k: int = 20,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` documents by BM25 over ``terms``.

    Returns ``(doc_id, score DOUBLE, rank INT)`` ordered by score
    descending, ``id_col`` ascending on ties (integer-quantized
    scores make the tie-break deterministic cross-engine).
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    words = docs.select(F.col(id_col).alias("doc_id"),
                        tokenize_expr(text_col).alias("words"))
    wl = words.select("doc_id", F.size("words").alias("dl"), "words")

    # corpus statistics: every document counts toward N and avgdl,
    # including ones matching no query term (blank docs have dl=0).
    stats = wl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").alias("total_len"))

    # postings restricted to the query terms BEFORE any aggregation:
    # the groupBy shuffle only ever sees |Q| terms' worth of rows.
    tf = (wl.select("doc_id", "dl", F.explode("words").alias("term"))
            .filter(F.col("term").isin(list(terms)))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf")))

    # document frequency per term: <= |Q| rows, broadcast back.
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (tf.join(F.broadcast(df_t), "term")
                .join(F.broadcast(stats)))

    avgdl = (F.col("total_len").cast("double")
             / F.col("n_docs").cast("double"))
    idf = (((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
           / (F.col("df").cast("double") + F.lit(0.5)))
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (F.lit(one_minus_b)
                                + F.lit(b) * (F.col("dl").cast("double")
                                              / avgdl))
    contrib = idf * ((tf_d * F.lit(k1p1)) / denom)
    c_units = F.round(contrib * F.lit(float(SCALE)), 0).cast("long")

    per_doc = (scored.select("doc_id", c_units.alias("c_units"))
                     .groupBy("doc_id")
                     .agg(F.sum("c_units").alias("score_units")))

    topk = (per_doc
            .orderBy(F.col("score_units").desc(), F.col("doc_id"))
            .limit(k))
    # rank over the already-cut <=k-row frame (TakeOrderedAndProject
    # did the global work); the partition-less window is scale-safe.
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score_units").desc(), F.col("doc_id"))
    return (topk.withColumn("rank", F.row_number().over(w))
                .select("doc_id",
                        (F.col("score_units").cast("double")
                         / F.lit(float(SCALE))).alias("score"),
                        "rank"))


def bm25_batch_topk(docs: DataFrame, queries: DataFrame, *,
                    k1: float = 1.2, b: float = 0.75, k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    query_id_col: str = "query_id",
                    terms_col: str = "terms") -> DataFrame:
    """Many-query BM25: per-query top-``k`` over a query TABLE.

    The production decontamination shape — thousands of benchmark
    questions scored against the corpus at once. Same arithmetic as
    :func:`bm25_topk` (rational idf, integer-quantized
    contributions; a query's terms score as a set, qtf=1), but the
    plan generalizes:

    - the union of all query terms drives ONE posting filter (a
      broadcast semi-join replaces the literal IN — the corpus is
      still scanned once no matter how many queries);
    - per-term statistics are computed once and shared by every
      query that uses the term;
    - the (query, term) fan-out joins broadcast (queries are small
      vs the corpus by assumption);
    - per-query top-k is a window PARTITIONED by query — each
      query's ranking is an independent partition, no global sort.

    Returns ``(query_id, doc_id, score, rank)``.
    """
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    q_terms = (queries.select(F.col(query_id_col).alias("query_id"),
                              F.explode(terms_col).alias("term"))
                      .distinct())
    all_terms = q_terms.select("term").distinct()

    words = docs.select(F.col(id_col).alias("doc_id"),
                        tokenize_expr(text_col).alias("words"))
    wl = words.select("doc_id", F.size("words").alias("dl"), "words")
    stats = wl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").alias("total_len"))

    tf = (wl.select("doc_id", "dl", F.explode("words").alias("term"))
            .join(F.broadcast(all_terms), "term", "left_semi")
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (tf.join(F.broadcast(df_t), "term")
                .join(F.broadcast(stats)))
    avgdl = (F.col("total_len").cast("double")
             / F.col("n_docs").cast("double"))
    idf = (((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
           / (F.col("df").cast("double") + F.lit(0.5)))
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (F.lit(one_minus_b)
                                + F.lit(b) * (F.col("dl").cast("double")
                                              / avgdl))
    contrib = idf * ((tf_d * F.lit(k1p1)) / denom)
    c_units = F.round(contrib * F.lit(float(SCALE)), 0).cast("long")

    per_qd = (scored.select("term", "doc_id", c_units.alias("c_units"))
                    .join(F.broadcast(q_terms), "term")
                    .groupBy("query_id", "doc_id")
                    .agg(F.sum("c_units").alias("score_units")))

    from pyspark.sql import Window
    w = (Window.partitionBy("query_id")
               .orderBy(F.col("score_units").desc(), F.col("doc_id")))
    return (per_qd.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "doc_id",
                          (F.col("score_units").cast("double")
                           / F.lit(float(SCALE))).alias("score"),
                          "rank"))


def bm25_oracle_sql(terms: Sequence[str], words_cte: str, *,
                    k1: float = 1.2, b: float = 0.75, k: int = 20) -> str:
    """DuckDB SQL computing the identical BM25 top-k over the same
    tokenization CTE; float literals injected via ``repr`` so both
    engines parse the same doubles."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {words_cte},
wl AS (SELECT doc_id, len(words) AS dl, words FROM w),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM wl),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(words) AS term FROM wl)
  WHERE term IN ({term_list})
  GROUP BY 1, 2, 3
),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         CAST(round(
           ((CAST(s.n_docs - dft.df AS DOUBLE) + 0.5)
            / (CAST(dft.df AS DOUBLE) + 0.5))
           * ((CAST(tf.tf AS DOUBLE) * {k1 + 1.0!r})
              / (CAST(tf.tf AS DOUBLE)
                 + {k1!r} * ({1.0 - b!r}
                             + {b!r} * (CAST(tf.dl AS DOUBLE)
                                        / (CAST(s.total_len AS DOUBLE)
                                           / CAST(s.n_docs AS DOUBLE))))))
           * {float(SCALE)!r}) AS BIGINT) AS c_units
  FROM tf JOIN dft USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, CAST(sum(c_units) AS BIGINT) AS score_units
  FROM contrib GROUP BY 1
),
topk AS (
  SELECT doc_id, score_units
  FROM per_doc ORDER BY score_units DESC, doc_id LIMIT {k}
)
SELECT doc_id,
       CAST(score_units AS DOUBLE) / {float(SCALE)!r} AS score,
       CAST(row_number() OVER (ORDER BY score_units DESC, doc_id)
            AS INT) AS rank
FROM topk
"""
