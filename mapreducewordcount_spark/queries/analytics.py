"""Event-stream analytics (batch form) + text-analysis queries.

Covers: tumbling-window aggregation, JSON extraction, gap-based
sessionization, as-of join, and the documents-table text metrics
(language ID, quality scoring, token counting, fingerprinting).
The streaming forms of the window/sessionize ops live in
``streaming/``; these batch forms share the same expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions import text_metrics as tm
from mapreducewordcount_spark.operators.asof import asof_join_backward
from mapreducewordcount_spark.operators.sessionize import session_stats
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table, spread


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- tumbling-window aggregation -------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type (batch form of the
    streaming windowed agg; ``F.window`` is the same construct
    Structured Streaming uses, so this plan is stream-ready)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format(F.col("w.start"),
                                  "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
                    "event_type", "n", "sum_value"))


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- JSON extraction --------------------------------------------------------

def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group on a value extracted from the JSON ``props`` column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.withColumn("k", k)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"),
                 # round(sum,2)/count: order-independent avg of 2dp
                 # values (see queries/tpch.py float discipline note)
                 F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 4)
                 .alias("avg_value")))


EVENTS_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
       count(*) AS n,
       round(round(sum(value), 2) / count(*), 4) AS avg_value
FROM events GROUP BY 1
"""


# --- sessionization ---------------------------------------------------------

def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return session_stats(e, gap_minutes=30)


EVENTS_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM flagged GROUP BY user_id
"""


# --- as-of join -------------------------------------------------------------

def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each event's user's most recent order at-or-before the
    event time (point-in-time join, ``operators/asof.py``).

    The right side is first reduced to one row per (custkey, date) —
    max orderkey wins — because as-of tie-breaking among equal
    timestamps is engine-defined; pinning it makes the operator
    deterministic (and the oracle well-defined).
    """
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window
    w = (Window.partitionBy("o_custkey", "o_orderdate")
         .orderBy(F.col("o_orderkey").desc()))
    o1 = (o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"))
    joined = asof_join_backward(
        e, o1, left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], how="inner")
    # events.user_id range overlaps o_custkey range, so matches exist
    return joined.select("event_id", "user_id", "o_orderkey",
                         F.round("o_totalprice", 2).alias("o_totalprice"))


EVENTS_ASOF_SQL = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, o1.o_orderkey,
       round(o1.o_totalprice, 2) AS o_totalprice
FROM events e
ASOF JOIN o1 ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
"""


# --- range (point-in-interval) join -----------------------------------------

def events_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many of the same user's events fall in
    the hour starting at the purchase (purchase itself included).

    The range join runs through the bucketed composition
    (``operators/rangejoin.py``) — an equi-join on (user, time
    bucket), never a nested-loop — with timestamps as epoch seconds.
    """
    from mapreducewordcount_spark.operators.rangejoin import point_in_interval_join

    e = _t(spark, sf_dir, "events")
    # cast via timestamp first so the query survives either parquet
    # encoding of ts (NTZ→double is not castable; timestamp→double is)
    t = F.col("ts").cast("timestamp").cast("double")
    points = e.select(F.col("event_id"), F.col("user_id").alias("p_user"),
                      t.alias("t"))
    intervals = (e.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("i_user"),
                         t.alias("t_start"),
                         (t + 3600.0).alias("t_end")))
    joined = point_in_interval_join(
        points, intervals, point_key="p_user", interval_key="i_user",
        point_col="t", start_col="t_start", end_col="t_end",
        bucket_width=3600.0)
    return (joined.groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_events_within_hour")))


EVENTS_AFTER_PURCHASE_SQL = """
SELECT p.event_id AS purchase_id, count(*) AS n_events_within_hour
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# --- text analysis ----------------------------------------------------------

def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tm.n_words("text").alias("n_words"),
        tm.n_distinct_words("text").alias("n_distinct_words"),
        F.round(tm.avg_word_len("text"), 4).alias("avg_word_len"),
        F.length("text").cast("long").alias("n_chars"))


# mirrors the native tokenizer: whitespace split, ASCII-punct
# ends-strip, lower, drop empties (functions/tokenize.py)
_WORDS_CTE = r"""
w AS (
  SELECT doc_id, text,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x, '^[!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]+$', '', 'g')),
           x -> x <> '') AS words
  FROM documents
)
"""

DOC_STATS_SQL = f"""
WITH {_WORDS_CTE}
SELECT doc_id,
       CAST(len(words) AS INT) AS n_words,
       CAST(len(list_distinct(words)) AS INT) AS n_distinct_words,
       round(CASE WHEN len(words) > 0
                  THEN list_sum(list_transform(words, x -> strlen(x)))::DOUBLE / len(words)
                  ELSE 0.0 END, 4) AS avg_word_len,
       CAST(strlen(text) AS BIGINT) AS n_chars
FROM w
"""


def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language guess + English stopword ratio."""
    d = spread(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tm.language_id("text").alias("pred_lang"),
        F.round(tm.stopword_ratio("text"), 4).alias("en_stop_ratio"))


_EN_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in tm.EN_STOPWORDS) + "]"

# tie-break = alphabetically-largest language among the max scores,
# matching the Spark argmax over (score, lang) structs
DOC_LANGUAGE_SQL = f"""
WITH {_WORDS_CTE},
scored AS (
  SELECT doc_id, words,
         len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
         len(list_filter(words, x -> list_contains(['el','la','de','que','los','por','una'], x))) AS s_es,
         len(list_filter(words, x -> list_contains(['le','la','les','des','est','dans','pour'], x))) AS s_fr,
         len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','mit'], x))) AS s_de
  FROM w
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
            WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
            WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
            ELSE 'de' END AS pred_lang,
       round(CASE WHEN len(words) > 0
                  THEN len(list_filter(words, x -> list_contains({_EN_STOPS_SQL}, x)))::DOUBLE / len(words)
                  ELSE 0.0 END, 4) AS en_stop_ratio
FROM scored
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(_t(spark, sf_dir, "documents"))
    return d.select("doc_id",
                    F.round(tm.quality_score("text"), 4).alias("quality"),
                    tm.token_count("text").alias("n_tokens"))


# quality-score building blocks, shared with the quota-cap oracle
# (queries/pipeline5.py): the m-CTE computes the four raw signals,
# QUALITY_EXPR_SQL folds them into the weighted score. The CAST
# before round matters: decimal-literal arithmetic yields
# DECIMAL(7,2) in DuckDB, which the driver gate hashes differently
# than Spark's double even for equal values.
QUALITY_M_CTE = f"""m AS (
  SELECT doc_id, text, words,
         len(words) AS nw,
         CASE WHEN len(words) > 0
              THEN list_sum(list_transform(words, x -> strlen(x)))::DOUBLE / len(words)
              ELSE 0.0 END AS awl,
         CASE WHEN len(words) > 0
              THEN len(list_filter(words, x -> list_contains({_EN_STOPS_SQL}, x)))::DOUBLE / len(words)
              ELSE 0.0 END AS sr,
         CASE WHEN strlen(regexp_replace(text, '\\s+', '', 'g')) > 0
              THEN (strlen(text) - strlen(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE
                   / strlen(regexp_replace(text, '\\s+', '', 'g'))
              ELSE 0.0 END AS pr
  FROM w
)"""

QUALITY_EXPR_SQL = """round(CAST(0.3 * (CASE WHEN nw BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
           + 0.3 * (CASE WHEN sr >= 0.01 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END) AS DOUBLE), 4)"""

DOC_QUALITY_SQL = f"""
WITH {_WORDS_CTE},
{QUALITY_M_CTE}
SELECT doc_id,
       {QUALITY_EXPR_SQL} AS quality,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens
FROM m
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(_t(spark, sf_dir, "documents"))
    return d.select("doc_id",
                    tm.fingerprint_md5("text").alias("fp_md5"),
                    tm.fingerprint_winnow("text").alias("fp_winnow"))


DOC_FINGERPRINTS_SQL = f"""
WITH {_WORDS_CTE},
sh AS (
  SELECT doc_id, words,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in range(1, greatest(len(words) - 2, 0) + 1)]) AS shingles
  FROM w
)
SELECT doc_id,
       md5(array_to_string(words, ' ')) AS fp_md5,
       array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:4], '|') AS fp_winnow
FROM sh
"""


COMPACT_TARGET = 2000


def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over a synthetic small-file listing — one
    "file" per (day, hour) of events, sized by payload bytes — packed
    into ~2 KB output bins per day in hour order
    (operators/compaction.py). Per-bin rollup: file count, bytes, and
    the hour range each compacted output will cover. Integer bytes
    and integer division end-to-end, so the oracle is exact."""
    from mapreducewordcount_spark.operators.compaction import plan_compaction

    e = load_table(spark, sf_dir, "events")
    files = (e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"),
                       F.date_format("ts", "HH").cast("int").alias("hour"))
             .agg(F.sum(F.length("props") + F.lit(32)).alias("bytes")))
    binned = plan_compaction(files, ["dt"], ["hour"], "bytes",
                             COMPACT_TARGET)
    return (binned
            .groupBy("dt", "bin")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("bytes").alias("total_bytes"),
                 F.min("hour").alias("first_hour"),
                 F.max("hour").alias("last_hour")))


EVENTS_COMPACTION_SQL = f"""
WITH f AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
         CAST(strftime(ts, '%H') AS INT) AS hour,
         CAST(sum(length(props) + 32) AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT dt, hour, bytes,
         CAST(floor(coalesce(sum(bytes) OVER (
                PARTITION BY dt ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {COMPACT_TARGET}) AS INT) AS bin
  FROM f
)
SELECT dt, bin, count(*) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       min(hour) AS first_hour, max(hour) AS last_hour
FROM b GROUP BY 1, 2
"""


QUERIES = {
    "events_hourly": QuerySpec(events_hourly, EVENTS_HOURLY_SQL),
    "events_compaction_plan": QuerySpec(events_compaction_plan,
                                        EVENTS_COMPACTION_SQL),
    "events_json_stats": QuerySpec(events_json_stats, EVENTS_JSON_SQL),
    "events_sessions": QuerySpec(events_sessions, EVENTS_SESSIONS_SQL),
    "events_asof_orders": QuerySpec(events_asof_orders, EVENTS_ASOF_SQL),
    "events_after_purchase": QuerySpec(events_after_purchase,
                                       EVENTS_AFTER_PURCHASE_SQL),
    "doc_stats": QuerySpec(doc_stats, DOC_STATS_SQL),
    "doc_language_id": QuerySpec(doc_language_id, DOC_LANGUAGE_SQL),
    "doc_quality": QuerySpec(doc_quality, DOC_QUALITY_SQL),
    "doc_fingerprints": QuerySpec(doc_fingerprints, DOC_FINGERPRINTS_SQL),
}
