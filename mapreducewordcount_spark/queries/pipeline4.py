"""Round-7 training-data operators: exact-substring dedup.

Oracle notes:

- ``exact_substring_dedup`` — the engine shuffles ``xxhash64`` L-gram
  keys while the oracle groups the L-gram STRINGS themselves (the
  ``doc_dup_spans`` precedent: equality of the two relations is exact
  up to a 2^-64 birthday collision in the hash, which the committed
  corpora don't exhibit and which ``wide_keys`` retires at scale).
  Everything downstream — occurrence counting, interval merge
  (gaps-and-islands), span stats, and the token-level rewrite — is
  replicated in portable SQL; the cleaned TEXT itself is hash-checked,
  so a single off-by-one span boundary fails the gate. The oracle
  rebuilds kept text with a position anti-join; the Spark side uses an
  indexed array filter instead because a position-level range join
  would plan as a broadcast nested loop (see
  ``operators/exact_substring.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.queries.dedup_queries import _WORDS_CTE
from mapreducewordcount_spark.sources.tables import load_table, spread

# Lee et al. 2022 publish L=50 (BPE tokens); the synthetic corpus
# averages ~54 words/doc, so the gate runs the same operator at L=15 —
# long enough that no span arises by chance, short enough that the
# planted near-identical docs produce real spans to verify.
ESD_MIN_TOKENS = 15


def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022 ExactSubstr semantics):
    per doc, every duplicated >=L-token span located, merged maximal,
    and removed from the token stream."""
    from mapreducewordcount_spark.operators.exact_substring import (
        exact_substring_dedup as esd,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    return esd(docs, min_tokens=ESD_MIN_TOKENS, min_count=2)


_L = ESD_MIN_TOKENS

EXACT_SUBSTRING_SQL = rf"""
WITH {_WORDS_CTE},
g AS (
  SELECT doc_id, i AS s,
         array_to_string(words[i:i+{_L - 1}], ' ') AS ng
  FROM w, unnest(range(1, len(words) - {_L - 2})) AS t(i)
),
dup AS (SELECT ng FROM g GROUP BY ng HAVING count(*) >= 2),
cov AS (SELECT g.doc_id, g.s, g.s + {_L - 1} AS e
        FROM g JOIN dup USING (ng)),
brk AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                  PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1) + 1
              THEN 1 ELSE 0 END AS b
  FROM cov
),
isl AS (
  SELECT doc_id, s, e,
         sum(b) OVER (PARTITION BY doc_id ORDER BY s) AS sid
  FROM brk
),
spans AS (
  SELECT doc_id, min(s) AS ss, max(e) AS se
  FROM isl GROUP BY doc_id, sid
),
per AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(se - ss + 1) AS BIGINT) AS n_dup_tokens
  FROM spans GROUP BY 1
),
tok AS (
  SELECT doc_id, i AS pos, words[i] AS word
  FROM w, unnest(range(1, len(words) + 1)) AS t(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM spans sp
                    WHERE sp.doc_id = t.doc_id
                      AND t.pos BETWEEN sp.ss AND sp.se)
),
ct AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY 1
)
SELECT w.doc_id,
       CAST(len(w.words) AS BIGINT) AS n_tokens,
       CAST(coalesce(per.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(per.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       coalesce(ct.cleaned_text, '') AS cleaned_text
FROM w LEFT JOIN per USING (doc_id) LEFT JOIN ct USING (doc_id)
"""


QUERIES = {
    "exact_substring_dedup": QuerySpec(exact_substring_dedup,
                                       EXACT_SUBSTRING_SQL),
}
