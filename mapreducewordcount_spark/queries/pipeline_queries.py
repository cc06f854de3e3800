"""Training-data pipeline queries: decontamination, PII scrubbing,
deterministic sampling — the corpus-hygiene passes that run before
any LLM training job, expressed over the ``documents`` table.

Reference parity note: the reference engine (/root/reference/src/)
has no document pipeline; SURVEY.md §2.5 claims this extension
surface.

Oracle discipline: everything here is integer counts, string
equality, or length arithmetic — no floats anywhere, so the only
cross-engine risks are regex dialect (patterns restricted to the
Java∩RE2 subset, see functions/pii.py) and tokenizer parity (the
words/shingles CTEs mirror functions/tokenize.py, shared with
queries/dedup_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcount_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    scrub_pii,
)
from mapreducewordcount_spark.functions.sampling import (
    stratified_hash_sample,
    weighted_sample_key,
)
from mapreducewordcount_spark.operators.decontam import (
    contamination_report,
    contamination_report_bloom,
)
from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.queries.dedup_queries import (
    _SHINGLES_CTE,
    _WORDS_CTE,
)
from mapreducewordcount_spark.sources.tables import load_table, spread


# --- decontamination --------------------------------------------------------

def decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 20th document plays the benchmark/eval corpus; the rest
    are training docs. Report each training doc sharing ≥1 distinct
    3-gram with any eval doc, with its distinct-hit count."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return contamination_report(train, eval_docs, "doc_id", "text", n=3)


DECONTAM_SQL = f"""
WITH {_WORDS_CTE}, {_SHINGLES_CTE},
ev AS (SELECT DISTINCT unnest(shingles) AS ngram FROM sh
       WHERE doc_id % 20 = 0),
tr AS (SELECT doc_id, unnest(shingles) AS ngram FROM sh
       WHERE doc_id % 20 <> 0)
SELECT doc_id, count(*) AS n_hits
FROM tr JOIN ev USING (ngram)
GROUP BY 1
"""


def decontam_bloom_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-prefiltered variant at a heavier contamination bar:
    every 10th document is the held-out side, and a training doc is
    reported only with ≥2 distinct shared 3-grams. The Bloom pass is
    exact-by-construction (prefilter + exact verify), so the oracle is
    the plain semi-join semantics — Bloom parameters move work, not
    answers (operators/decontam.py: contamination_report_bloom)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    rep = contamination_report_bloom(train, eval_docs, "doc_id", "text",
                                     n=3)
    return rep.filter(F.col("n_hits") >= 2)


DECONTAM_BLOOM_SQL = f"""
WITH {_WORDS_CTE}, {_SHINGLES_CTE},
ev AS (SELECT DISTINCT unnest(shingles) AS ngram FROM sh
       WHERE doc_id % 10 = 0),
tr AS (SELECT doc_id, unnest(shingles) AS ngram FROM sh
       WHERE doc_id % 10 <> 0)
SELECT doc_id, count(*) AS n_hits
FROM tr JOIN ev USING (ngram)
GROUP BY 1
HAVING count(*) >= 2
"""


# --- PII scrubbing ----------------------------------------------------------

#: deterministic PII planted into the synthetic corpus (which has
#: none) so the scrub query exercises every pattern with nonzero,
#: doc-varying counts. Built identically in Spark and the oracle.
def _planted(doc_id, text):
    return F.concat(
        text,
        F.lit(" contact user"), doc_id.cast("string"),
        F.lit("@example.com from 10.0.0."), (doc_id % 200).cast("string"),
        F.when(doc_id % 3 == 0, F.lit(" call 555-123-4567"))
        .otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit(" ssn 123-45-6789"))
        .otherwise(F.lit("")))


_PLANTED_SQL = """
  text || ' contact user' || CAST(doc_id AS VARCHAR)
       || '@example.com from 10.0.0.' || CAST(doc_id % 200 AS VARCHAR)
       || CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567' ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END
"""


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: documents, match counts per PII class, and total
    characters redacted (planted-text length minus scrubbed length —
    pure row-local expressions, aggregated once)."""
    docs = load_table(spark, sf_dir, "documents")
    planted = _planted(F.col("doc_id"), F.col("text"))
    counts = pii_counts(planted)
    return (docs
            .select("source",
                    counts.alias("c"),
                    (F.length(planted) - F.length(scrub_pii(planted)))
                    .alias("delta"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("c.n_email").alias("n_email"),
                 F.sum("c.n_ipv4").alias("n_ipv4"),
                 F.sum("c.n_phone").alias("n_phone"),
                 F.sum("c.n_ssn").alias("n_ssn"),
                 F.sum("delta").alias("chars_redacted")))


def _pii_sql() -> str:
    # the same patterns, verbatim, via RE2; counts from
    # regexp_extract_all, scrubbing via global regexp_replace
    # CAST every sum: DuckDB sums integers into HUGEINT, which does
    # not hash like the BIGINT the Spark side produces
    count_cols = ", ".join(
        f"CAST(sum(len(regexp_extract_all(planted, '{pat}')))"
        f" AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    scrub = "planted"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
WITH p AS (SELECT source, {_PLANTED_SQL} AS planted FROM documents)
SELECT source, count(*) AS n_docs, {count_cols},
       CAST(sum(length(planted) - length({scrub})) AS BIGINT)
         AS chars_redacted
FROM p GROUP BY source
"""


# --- deterministic sampling -------------------------------------------------

#: per-language sampling thresholds (md5 2-hex-digit prefix bound):
#: half the English, a quarter of the German, an eighth of the rest.
_RATES = {"en": "80", "de": "40"}
_DEFAULT = "20"


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic stratified sample itself — selected doc_ids
    with their stratum. Reproducible on any engine: the oracle
    reproduces the exact row set from the same md5 predicate."""
    docs = load_table(spark, sf_dir, "documents")
    keep = stratified_hash_sample("lang", "doc_id", _RATES,
                                  default_hex=_DEFAULT)
    return docs.filter(keep).select("doc_id", "lang", "source")


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE lang WHEN 'en' THEN '{_RATES["en"]}'
                WHEN 'de' THEN '{_RATES["de"]}'
                ELSE '{_DEFAULT}' END
"""


WEIGHTED_K = 150


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    top-150 docs by the integer-exact A-ES key
    (functions/sampling.py: weighted_sample_key), with per-source
    weights 1..8 derived from the source number. The top-k plans as
    TakeOrderedAndProject (per-partition heap + one reduce — never a
    full sort); the rank window runs over the already-cut 150-row
    frame. The oracle replays the identical max-of-w md5 draws, so
    a single rank flip anywhere fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(1)
         + F.pmod(F.substring("source", 4, 10).cast("int"), F.lit(8)))
    key = weighted_sample_key(F.col("doc_id"), w)
    top = (docs
           .select("doc_id", "source", w.alias("weight"),
                   key.alias("draw_key"))
           .orderBy(F.desc("draw_key"), "doc_id")
           .limit(WEIGHTED_K))
    rank_w = Window.orderBy(F.desc("draw_key"), "doc_id")
    return (top
            .withColumn("rank", F.row_number().over(rank_w).cast("int"))
            .select("rank", "doc_id", "source", "weight"))


WEIGHTED_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         1 + (CAST(substr(source, 4) AS INT) % 8) AS weight
  FROM documents
),
k AS (
  SELECT doc_id, source, weight,
         list_aggregate(
           [md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))
            for j in range(1, weight + 1)], 'max') AS draw_key
  FROM d
),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY draw_key DESC, doc_id)
              AS INT) AS rank,
         doc_id, source, weight
  FROM k
)
SELECT rank, doc_id, source, weight FROM r
WHERE rank <= {WEIGHTED_K}
"""


def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length deciles — the mixture/curriculum
    stratification pass of a training pipeline — computed through the
    grouped-Arrow custom-operator path (``applyInPandas``).

    The decile math is exact ``ntile(10)`` over the total order
    ``(n_tokens, doc_id)``, so the DuckDB window oracle pins the
    entire Arrow round-trip (shuffle on group key → pandas → typed
    return) to an integer-exact, order-independent contract; see
    ``operators/grouped.py`` for why the verifiable instance matters.
    """
    from mapreducewordcount_spark.functions import text_metrics as tm
    from mapreducewordcount_spark.operators.grouped import grouped_ntile

    d = spread(load_table(spark, sf_dir, "documents"))
    base = d.select("doc_id",
                    tm.language_id("text").alias("pred_lang"),
                    tm.token_count("text").alias("n_tokens"))
    return grouped_ntile(base, ["pred_lang"], ["n_tokens", "doc_id"],
                         k=10, out_col="decile")


# lang CASE mirrors queries/analytics.py DOC_LANGUAGE_SQL (same
# argmax-with-alphabetic-tiebreak), token regex = text_metrics.TOKEN_REGEX
DOC_LENGTH_DECILES_SQL = f"""
WITH {_WORDS_CTE},
scored AS (
  SELECT doc_id,
         len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS s_en,
         len(list_filter(words, x -> list_contains(['el','la','de','que','los','por','una'], x))) AS s_es,
         len(list_filter(words, x -> list_contains(['le','la','les','des','est','dans','pour'], x))) AS s_fr,
         len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','mit'], x))) AS s_de
  FROM w
),
lang AS (
  SELECT doc_id,
         CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
              WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
              WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
              ELSE 'de' END AS pred_lang
  FROM scored
),
tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens
  FROM documents
)
SELECT l.doc_id, l.pred_lang, t.n_tokens,
       CAST(ntile(10) OVER (PARTITION BY l.pred_lang
                            ORDER BY t.n_tokens, l.doc_id) AS INT) AS decile
FROM lang l JOIN tok t USING (doc_id)
"""


def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal plumbing, end-to-end in the hard gate: text
    bytes play opaque media payloads (this container ships no codecs,
    and the gate tables carry no binary columns), flowing through the
    REAL pipeline — binary column + typed metadata, byte-budget
    repartition (``size_bucketed``), Arrow-batched ``mapInPandas``
    feature extraction with the deterministic fake decoder.

    The fake decoder derives features from sha256(payload), which the
    DuckDB oracle replicates byte-for-byte — so the gate pins the
    Arrow binary round-trip and batch iteration, exactly the parts
    that stay when a real codec replaces ``_fake_decode``.
    """
    from mapreducewordcount_spark.operators.multimodal import (
        extract_image_features,
        size_bucketed,
    )

    d = load_table(spark, sf_dir, "documents")
    media = d.select(F.col("doc_id").alias("media_id"),
                     F.encode("text", "UTF-8").alias("payload"),
                     F.lit("txt").alias("format"))
    return extract_image_features(size_bucketed(media), fake=True)


def _wav_synth(batches):
    """Manufacture REAL RIFF/WAVE containers from document bytes.

    Sample byte ``i`` is ``ascii(text[i]) + 32`` — shifting printable
    ASCII so lowercase letters (97+) land above the unsigned-8-bit
    midpoint (128) while spaces/punctuation land below, which makes
    the zero-crossing rate a meaningful signal instead of a constant.
    Deterministic, so the DuckDB oracle can replicate every feature
    analytically while the Spark side does a genuine container parse.
    """
    import pandas as pd

    from mapreducewordcount_spark.operators.multimodal import wav_encode_pcm

    for pdf in batches:
        # ascii-with-replacement (one '?' per non-encodable char)
        # keeps sample count == char count, which the character-level
        # oracle arithmetic depends on; current corpora are pure
        # ASCII so this is a forward-compat guard, not a behavior
        # change
        payloads = [
            wav_encode_pcm(bytes((b + 32) & 0xFF
                                 for b in t.encode("ascii", "replace")))
            for t in pdf["text"]
        ]
        yield pd.DataFrame({"media_id": pdf["doc_id"],
                            "payload": payloads})


def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio leg of the multimodal seam, end-to-end in the hard
    gate with a REAL decoder: documents → genuine WAV containers
    (``wav_encode_pcm``, canonical 44-byte header + 8-bit PCM) →
    byte-budget repartition → Arrow-batched ``mapInPandas`` with
    ``wav_decode`` doing an actual RIFF chunk walk + PCM DSP (RMS,
    zero-crossing rate). Unlike ``media_image_features`` (fake
    decoder), nothing here is stubbed — encode and decode are
    independent stdlib implementations and the oracle recomputes the
    features analytically from the text bytes.
    """
    from mapreducewordcount_spark.operators.multimodal import (
        extract_audio_features,
        size_bucketed,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = d.mapInPandas(_wav_synth, schema="media_id long, payload binary")
    return extract_audio_features(size_bucketed(media))


MEDIA_AUDIO_SQL = r"""
WITH s AS (
  -- mirror the synth's ascii-with-replacement: one '?' per
  -- non-ASCII char, so character arithmetic == sample arithmetic
  SELECT doc_id AS media_id,
         length(regexp_replace(text, '[^\x00-\x7F]', '?', 'g')) AS n,
         regexp_replace(text, '[^\x00-\x7F]', '?', 'g') AS text
  FROM documents
)
SELECT media_id,
       CAST(44 + n AS INT) AS n_bytes,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       round(n / 8000.0, 6) AS duration_s,
       -- n = 0 must yield 0.0 (the decoder's empty-payload branch),
       -- not sqrt(NULL)
       CASE WHEN n > 0 THEN round(sqrt(list_avg(list_transform(range(1, n + 1),
             i -> ((ascii(text[i]) - 96) / 128.0) ^ 2))), 6)
            ELSE 0.0 END AS rms,
       CASE WHEN n > 1 THEN round(list_sum(list_transform(range(2, n + 1),
             i -> CAST((ascii(text[i]) >= 96) <> (ascii(text[i-1]) >= 96)
                  AS INT))) / (n - 1.0), 6)
            ELSE 0.0 END AS zcr
FROM s
"""


def _hexbyte_sql(pos: int) -> str:
    """SQL for byte ``pos`` (0-based) of the sha256 hex digest ``d``."""
    c1, c2 = 2 * pos + 1, 2 * pos + 2
    hx = "'0123456789abcdef'"
    return (f"(instr({hx}, substr(d, {c1}, 1)) - 1) * 16"
            f" + (instr({hx}, substr(d, {c2}, 1)) - 1)")


MEDIA_FEATURES_SQL = f"""
WITH h AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS d
  FROM documents
),
b AS (
  SELECT media_id, n_bytes,
         {_hexbyte_sql(0)} AS h0,
         {_hexbyte_sql(1)} AS h1,
         {_hexbyte_sql(2)} AS h2,
         {_hexbyte_sql(3)} AS h3,
         {_hexbyte_sql(4)} AS h4
  FROM h
)
SELECT media_id, CAST(n_bytes AS INT) AS n_bytes, 'txt' AS format,
       CAST(16 + h0 % 64 AS INT) AS width,
       CAST(16 + h1 % 64 AS INT) AS height,
       round(h2 / 255.0, 6) AS mean_r,
       round(h3 / 255.0, 6) AS mean_g,
       round(h4 / 255.0, 6) AS mean_b
FROM b
"""


QUERIES = {
    "decontam_report": QuerySpec(decontam_report, DECONTAM_SQL),
    "decontam_bloom_report": QuerySpec(decontam_bloom_report,
                                       DECONTAM_BLOOM_SQL),
    "pii_scrub_stats": QuerySpec(pii_scrub_stats, _pii_sql()),
    "stratified_sample_docs": QuerySpec(stratified_sample_docs,
                                        STRATIFIED_SAMPLE_SQL),
    "weighted_sample_docs": QuerySpec(weighted_sample_docs,
                                      WEIGHTED_SAMPLE_SQL),
    "doc_length_deciles": QuerySpec(doc_length_deciles,
                                    DOC_LENGTH_DECILES_SQL),
    "media_image_features": QuerySpec(media_image_features,
                                      MEDIA_FEATURES_SQL),
    "media_audio_features": QuerySpec(media_audio_features,
                                      MEDIA_AUDIO_SQL),
}
