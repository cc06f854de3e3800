"""Round-10 operators: hashed char-n-gram language identification.

Reference parity: none — extension surface (SURVEY.md §2.5); the
reference engine (549 LoC, /root/reference/src) has no classifier of
any kind.

Oracle notes:

- ``doc_language_ngram`` — the weight table (the model a production
  pipeline would train offline and ship) is the committed artifact
  (``sources/sig_artifacts``): its ``math.log`` micro-nat weights are
  computed once, driver-side, so no libm crosses engines. Everything
  else is SQL-expressible on both sides: the trigram bucket hash is
  the DSIR md5-hex4 recipe, scores are integer sums, the argmax is
  the ordered-struct max / ``row_number`` pair with the registry's
  standing tie-break (code-point-largest lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table, spread


def doc_language_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion report (VERDICT r9 next#3): train the
    hashed char-trigram multinomial NB (``operators/langid``) on the
    labeled corpus, predict every document, and report
    ``(lang, pred_lang, n_docs)`` — the per-language diagnostic a
    curation pipeline reads before trusting ``lang`` downstream
    (mixture planning, quotas). Featurization runs ONCE (persisted)
    and is shared by the fit and the scoring pass — the DSIR recipe;
    the weight table is the committed model artifact both engines
    join."""
    from mapreducewordcount_spark.operators import langid
    from mapreducewordcount_spark.sources import sig_artifacts

    docs = spread(load_table(spark, sf_dir, "documents"))
    feats = langid.char_ngram_counts(docs).persist()
    weights = langid.langid_weights(docs, feats=feats)
    wt = sig_artifacts.materialize_frame(
        weights, "doc_language_ngram", sig_artifacts.corpus_key(docs),
        ["lang", "bucket"])
    pred = langid.langid_scores(docs, wt, feats=feats)
    return (docs.select("doc_id", "lang").join(pred, "doc_id")
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def _language_ngram_sql() -> str:
    from mapreducewordcount_spark.operators.langid import (
        N_BUCKETS,
        NGRAM,
        PRIOR_BUCKET,
        _SALT,
    )
    from mapreducewordcount_spark.queries.pipeline2 import _hex4_sql
    from mapreducewordcount_spark.sources import sig_artifacts

    md5_expr = f"md5('{_SALT}' || g)"
    bucket = f"({_hex4_sql(md5_expr)}) % {N_BUCKETS}"
    return f"""
WITH {sig_artifacts.frame_cte('wt', 'doc_language_ngram',
                              sig_artifacts.DOC_KEY_SQL)},
tg AS (
  SELECT doc_id, {bucket} AS bucket, count(*) AS c
  FROM (
    SELECT doc_id, substr(lower(text), i, {NGRAM}) AS g
    FROM documents,
         unnest(range(1, greatest(length(lower(text)) - {NGRAM - 1}, 0)
                         + 1)) t(i)
  ) GROUP BY 1, 2
),
sc AS (
  SELECT t.doc_id, w.lang, sum(t.c * w.w_micro) AS s
  FROM tg t JOIN wt w ON t.bucket = w.bucket
  WHERE w.bucket <> {PRIOR_BUCKET}
  GROUP BY 1, 2
),
tot AS (
  SELECT sc.doc_id, sc.lang, sc.s + p.w_micro AS score
  FROM sc JOIN wt p ON p.bucket = {PRIOR_BUCKET} AND p.lang = sc.lang
),
pred AS (
  SELECT doc_id, lang AS pred_lang
  FROM (SELECT doc_id, lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang DESC) AS rn
        FROM tot)
  WHERE rn = 1
),
fb AS (
  SELECT lang AS fb_lang FROM wt WHERE bucket = {PRIOR_BUCKET}
  ORDER BY w_micro DESC, lang DESC LIMIT 1
)
SELECT d.lang, coalesce(p.pred_lang, fb.fb_lang) AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
LEFT JOIN pred p ON d.doc_id = p.doc_id
CROSS JOIN fb
GROUP BY 1, 2
"""


QUERIES = {
    "doc_language_ngram": QuerySpec(doc_language_ngram,
                                    _language_ngram_sql()),
}
