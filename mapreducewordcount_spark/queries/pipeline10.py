"""Round-11 additions: cross-source vocabulary overlap at sketch
cost (explicit-register HLL — union via register-wise max), and the
IPF-calibrated two-marginal training mixture.

Reference parity: none — extension surface (SURVEY.md §2.5); the
reference engine (/root/reference/src, 549 LoC) has no sketch or
planning layer.

Oracle notes:

- ``vocab_overlap_hll`` — FULLY oracled with no artifact (the
  count-min precedent): registers are integer max-aggregates over
  md5-addressed ranks, and the raw-estimate float arithmetic is
  exact-dyadic (operators/hll.py docstring) — DuckDB rebuilds sketch,
  union, and estimates from raw text. The per-pair EXACT overlap
  columns ride a word-level self-join that exists for calibration
  only; at 100 TB only the sketch columns survive (the
  sketch_hll_report contract).
- ``mixture_ipf_grid`` — the IPF iteration is a driver-side float
  fit over the BOUNDED (source × lang) grid, so its output is the
  committed artifact in integer micro-tokens (the langid micro-nat
  discipline); DuckDB recomputes the inventory from raw text and the
  rate arithmetic downstream of the artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcount_spark.queries import QuerySpec
from mapreducewordcount_spark.sources.tables import load_table, spread


# --- cross-source vocabulary overlap (explicit-register HLL) -----------------

def vocab_overlap_hll(spark: SparkSession, sf_dir: str,
                      calibrate: bool = True) -> DataFrame:
    """Pairwise source-vocabulary overlap report: for every source
    pair, exact distinct-word counts and intersections (calibration
    columns) next to the explicit-register HLL estimates — per-source,
    union (register-wise max: the merge no exact structure has), and
    the inclusion–exclusion overlap ``est_a + est_b − est_union``.

    The curation question this answers at 100 TB: which crawl sources
    share vocabulary (near-duplicate feeds, mirrored sites) BEFORE
    paying for document-level cross-source dedup — |sources|² pair
    estimates from |sources| × 256 register rows, no cross-source
    data join. Plan: one distinct + one partial-agg register build;
    everything pairwise reads the persisted ≤ |sources|×256 register
    table. Estimates are raw HLL — with an ~α·M ≈ 184 FLOOR, so
    below the classic 2.5·M ≈ 640 threshold they OVER-estimate
    (visible in the calibration columns; the contract is the
    ranking/merge algebra, not small-n accuracy — the envelope is
    pinned in tests/test_hll_overlap.py so a consumer can't misread
    a small estimate as a count).

    ``calibrate=False`` is the RUNNABLE 100 TB contract (VERDICT r11
    wrong#3/next#4): the exact legs — the word-level self-join and
    the per-source exact distinct counts, which exist only to show
    the estimates next to ground truth at gate scale — are dropped
    from the PLAN, not just the projection. What remains never
    touches a word after the register build: one tokenize+groupBy to
    ≤ |sources|×256 register rows (``max`` absorbs duplicates
    exactly, so the corpus-wide ``distinct`` is dropped too — the
    partial agg does its work map-side), then pure register algebra.
    Output keeps the sketch columns only; the plan-pin test asserts
    no join on a word column survives.
    """
    from mapreducewordcount_spark.cache import (
        persist_tracked,
        release_query_cache,
    )
    from mapreducewordcount_spark.functions.tokenize import tokenize_expr
    from mapreducewordcount_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    release_query_cache()
    tok = docs.select("source",
                      F.explode(tokenize_expr("text")).alias("word"))
    if calibrate:
        # distinct (source, word) feeds BOTH the exact calibration
        # side and the register build; registers feed three consumers
        ex = persist_tracked(tok.distinct())
        regs = persist_tracked(hll_registers(ex, "word", ["source"]))
        srcs = ex.select("source").distinct()
    else:
        # sketch-only: registers straight off the token stream (max
        # absorbs duplicates), sources off the register table
        ex = None
        regs = persist_tracked(hll_registers(tok, "word", ["source"]))
        srcs = regs.select("source").distinct()
    pairs = (srcs.select(F.col("source").alias("src_a"))
             .join(srcs.select(F.col("source").alias("src_b")),
                   F.col("src_a") < F.col("src_b")))

    est = hll_estimate(regs, ["source"])
    est_a = est.select(F.col("source").alias("src_a"),
                       F.col("hll_est").alias("est_a"))
    est_b = est.select(F.col("source").alias("src_b"),
                       F.col("hll_est").alias("est_b"))

    ra = pairs.join(regs.select(F.col("source").alias("src_a"),
                                "reg", F.col("rho").alias("rho_a")),
                    "src_a")
    rb = pairs.join(regs.select(F.col("source").alias("src_b"),
                                "reg", F.col("rho").alias("rho_b")),
                    "src_b")
    from mapreducewordcount_spark.operators.hll import (
        ALPHA_M2,
        M_REGISTERS,
    )
    eff = F.greatest(F.coalesce("rho_a", F.lit(0)),
                     F.coalesce("rho_b", F.lit(0)))
    udenom = ((F.lit(M_REGISTERS) - F.count(F.lit(1))).cast("double")
              + F.sum(F.pow(F.lit(2.0), -eff)))
    uni = (ra.join(rb, ["src_a", "src_b", "reg"], "full")
           .groupBy("src_a", "src_b")
           .agg(F.round(F.lit(ALPHA_M2) / udenom, 4)
                .alias("est_union")))

    if not calibrate:
        return (pairs
                .join(est_a, "src_a").join(est_b, "src_b")
                .join(uni, ["src_a", "src_b"])
                .select("src_a", "src_b", "est_a", "est_b",
                        "est_union",
                        F.round(F.col("est_a") + F.col("est_b")
                                - F.col("est_union"), 4)
                        .alias("est_overlap")))

    n_src = ex.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"))
    n_a = n_src.select(F.col("source").alias("src_a"),
                       F.col("n_words").alias("n_words_a"))
    n_b = n_src.select(F.col("source").alias("src_b"),
                       F.col("n_words").alias("n_words_b"))
    both = (ex.select(F.col("source").alias("src_a"), "word")
            .join(ex.select(F.col("source").alias("src_b"), "word"),
                  "word")
            .filter(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).alias("n_words_both")))

    return (pairs
            .join(n_a, "src_a").join(n_b, "src_b")
            .join(both, ["src_a", "src_b"], "left")
            .join(est_a, "src_a").join(est_b, "src_b")
            .join(uni, ["src_a", "src_b"])
            .select("src_a", "src_b", "n_words_a", "n_words_b",
                    F.coalesce("n_words_both", F.lit(0)).cast("long")
                    .alias("n_words_both"),
                    "est_a", "est_b", "est_union",
                    F.round(F.col("est_a") + F.col("est_b")
                            - F.col("est_union"), 4)
                    .alias("est_overlap")))


def vocab_overlap_hll_sketch(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """``vocab_overlap_hll`` with ``calibrate=False`` — the runnable
    100 TB contract: sketch columns only, no word-level join anywhere
    in the plan (see the flag's docstring; plan-pinned)."""
    return vocab_overlap_hll(spark, sf_dir, calibrate=False)


def _hexat_sql(expr: str, start: int) -> str:
    """DuckDB: 4 hex digits of ``expr`` starting at 1-based ``start``
    as an integer (the pipeline2 recipe, position-parametrized)."""
    hx = "'0123456789abcdef'"
    terms = " + ".join(
        f"(instr({hx}, substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (3 - i)}" for i in range(4))
    return f"({terms})"


def _vocab_overlap_sql() -> str:
    from mapreducewordcount_spark.operators.hll import (
        ALPHA_M2,
        M_REGISTERS,
        _SALT,
        hll_denom_sql,
        rho_case_sql,
    )

    rho = rho_case_sql(_hexat_sql("hx", 5))
    reg = f"({_hexat_sql('hx', 1)}) % {M_REGISTERS}"
    return rf"""
WITH sw AS (
  SELECT source,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x,
                            '^[!-/:-@\[-`{{-~]+|[!-/:-@\[-`{{-~]+$',
                            '', 'g')),
           x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT DISTINCT source, word
        FROM (SELECT source, unnest(words) AS word FROM sw)),
h AS (SELECT source, md5('{_SALT}' || word) AS hx FROM tok),
regs AS (SELECT source, {reg} AS reg, max({rho}) AS rho
         FROM h GROUP BY 1, 2),
est AS (SELECT source,
               round({ALPHA_M2!r} / {hll_denom_sql()}, 4) AS e
        FROM regs GROUP BY source),
srcs AS (SELECT DISTINCT source FROM tok),
pairs AS (SELECT a.source AS src_a, b.source AS src_b
          FROM srcs a JOIN srcs b ON a.source < b.source),
ra AS (SELECT p.src_a, p.src_b, r.reg, r.rho AS rho_a
       FROM pairs p JOIN regs r ON r.source = p.src_a),
rb AS (SELECT p.src_a, p.src_b, r.reg, r.rho AS rho_b
       FROM pairs p JOIN regs r ON r.source = p.src_b),
uni AS (
  SELECT src_a, src_b,
         round({ALPHA_M2!r} / (({M_REGISTERS} - count(*)) * 1.0
               + sum(power(2.0, -greatest(coalesce(rho_a, 0),
                                          coalesce(rho_b, 0))))), 4)
           AS est_union
  FROM ra FULL JOIN rb USING (src_a, src_b, reg)
  GROUP BY 1, 2
),
n_src AS (SELECT source, count(*) AS n_words FROM tok GROUP BY 1),
ovl AS (SELECT a.source AS src_a, b.source AS src_b,
                count(*) AS n_both
         FROM tok a JOIN tok b
           ON a.word = b.word AND a.source < b.source
         GROUP BY 1, 2)
SELECT p.src_a, p.src_b,
       CAST(na.n_words AS BIGINT) AS n_words_a,
       CAST(nb.n_words AS BIGINT) AS n_words_b,
       CAST(coalesce(bo.n_both, 0) AS BIGINT) AS n_words_both,
       ea.e AS est_a, eb.e AS est_b, u.est_union,
       round(ea.e + eb.e - u.est_union, 4) AS est_overlap
FROM pairs p
JOIN n_src na ON na.source = p.src_a
JOIN n_src nb ON nb.source = p.src_b
LEFT JOIN ovl bo ON bo.src_a = p.src_a AND bo.src_b = p.src_b
JOIN est ea ON ea.source = p.src_a
JOIN est eb ON eb.source = p.src_b
JOIN uni u ON u.src_a = p.src_a AND u.src_b = p.src_b
"""


def _vocab_overlap_sketch_sql() -> str:
    from mapreducewordcount_spark.operators.hll import (
        ALPHA_M2,
        M_REGISTERS,
        _SALT,
        hll_denom_sql,
        rho_case_sql,
    )

    rho = rho_case_sql(_hexat_sql("hx", 5))
    reg = f"({_hexat_sql('hx', 1)}) % {M_REGISTERS}"
    return rf"""
WITH sw AS (
  SELECT source,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x,
                            '^[!-/:-@\[-`{{-~]+|[!-/:-@\[-`{{-~]+$',
                            '', 'g')),
           x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT source, word
        FROM (SELECT source, unnest(words) AS word FROM sw)),
h AS (SELECT source, md5('{_SALT}' || word) AS hx FROM tok),
regs AS (SELECT source, {reg} AS reg, max({rho}) AS rho
         FROM h GROUP BY 1, 2),
est AS (SELECT source,
               round({ALPHA_M2!r} / {hll_denom_sql()}, 4) AS e
        FROM regs GROUP BY source),
srcs AS (SELECT DISTINCT source FROM regs),
pairs AS (SELECT a.source AS src_a, b.source AS src_b
          FROM srcs a JOIN srcs b ON a.source < b.source),
ra AS (SELECT p.src_a, p.src_b, r.reg, r.rho AS rho_a
       FROM pairs p JOIN regs r ON r.source = p.src_a),
rb AS (SELECT p.src_a, p.src_b, r.reg, r.rho AS rho_b
       FROM pairs p JOIN regs r ON r.source = p.src_b),
uni AS (
  SELECT src_a, src_b,
         round({ALPHA_M2!r} / (({M_REGISTERS} - count(*)) * 1.0
               + sum(power(2.0, -greatest(coalesce(rho_a, 0),
                                          coalesce(rho_b, 0))))), 4)
           AS est_union
  FROM ra FULL JOIN rb USING (src_a, src_b, reg)
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, ea.e AS est_a, eb.e AS est_b, u.est_union,
       round(ea.e + eb.e - u.est_union, 4) AS est_overlap
FROM pairs p
JOIN est ea ON ea.source = p.src_a
JOIN est eb ON eb.source = p.src_b
JOIN uni u ON u.src_a = p.src_a AND u.src_b = p.src_b
"""


# --- IPF two-marginal mixture calibration ------------------------------------

#: fixed alternating row/col scaling passes; residuals are asserted
#: below (and pytest-pinned), not hoped for
IPF_ITERS = 25
#: max relative marginal error accepted from the fit
IPF_TOL = 1e-4


def mixture_ipf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-marginal training-mixture calibration (``operators/ipf``):
    fit per-(source, lang) token targets whose ROW sums give every
    source an equal share of MIX_BUDGET and whose COLUMN sums hit the
    MIX_WEIGHTS language mix — the brief ``mixture_plan`` can't
    satisfy with any single-key weight table. Output per observed
    cell: inventory (n_docs, tokens_available), the fitted
    ``target_micro`` (integer micro-tokens — the committed artifact),
    and the sampling rate a pipeline applies.

    Plan shape: ONE partial-agg groupBy builds the grid; the IPF
    alternation runs driver-side on the corpus-size-independent
    |sources| × |langs| table (the bounded-model-collect contract —
    langid weights, BPE merges, k-means); the fitted table broadcasts
    back. Languages outside MIX_WEIGHTS get explicit zero column
    targets (drained, still reported); marginal residuals above
    IPF_TOL raise rather than ship a bad plan."""
    from mapreducewordcount_spark.functions.text_metrics import (
        token_count,
    )
    from mapreducewordcount_spark.operators.ipf import (
        MICRO,
        ipf_fit,
        ipf_residuals,
    )
    from mapreducewordcount_spark.queries.pipeline2 import (
        MIX_BUDGET,
        MIX_WEIGHTS,
    )
    from mapreducewordcount_spark.sources import sig_artifacts

    docs = spread(load_table(spark, sf_dir, "documents"))
    inv = (docs
           .select("source", "lang",
                   token_count("text").cast("long").alias("n_tok"))
           .groupBy("source", "lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").alias("tokens_available")))
    def _fit_grid():
        # the bounded grid collect + driver IPF alternation, behind
        # the lazy-artifact thunk (round 13): a session that has
        # already verified this artifact serves the committed bytes
        # without re-collecting the grid or re-running the fit
        cells = {(r["source"], r["lang"]): float(r["tokens_available"])
                 for r in inv.collect()}
        srcs = sorted({s for s, _l in cells})
        langs = sorted({l for _s, l in cells})
        total_w = sum(MIX_WEIGHTS.values())
        row_t = {s: MIX_BUDGET / len(srcs) for s in srcs}
        col_t = {l: MIX_WEIGHTS.get(l, 0.0) / total_w * MIX_BUDGET
                 for l in langs}
        fit = ipf_fit(cells, row_t, col_t, n_iters=IPF_ITERS)
        res = ipf_residuals(fit, row_t, col_t)
        if max(res) > IPF_TOL:
            raise ValueError(
                f"IPF marginal residuals {res} exceed {IPF_TOL} after "
                f"{IPF_ITERS} iterations — grid too sparse for the brief")
        return spark.createDataFrame(
            sorted((s, l, round(v * MICRO)) for (s, l), v in fit.items()),
            "source string, lang string, target_micro long")

    wt = sig_artifacts.materialize_frame(
        _fit_grid, "mixture_ipf_grid", sig_artifacts.corpus_key(docs),
        ["source", "lang"], memo_token="ipf-grid-equal-src-mix-lang",
        columns=["source", "lang", "target_micro"], spark=spark)
    target_tok = F.col("target_micro") / F.lit(float(MICRO))
    return (inv.join(wt, ["source", "lang"])
            .select("source", "lang", "n_docs", "tokens_available",
                    "target_micro",
                    F.when(F.col("tokens_available") > 0,
                           F.round(target_tok
                                   / F.col("tokens_available")
                                   .cast("double"), 6))
                    .otherwise(F.lit(0.0)).alias("sample_rate")))


def _mixture_ipf_sql() -> str:
    from mapreducewordcount_spark.operators.ipf import MICRO
    from mapreducewordcount_spark.sources import sig_artifacts

    return rf"""
WITH {sig_artifacts.frame_cte('wt', 'mixture_ipf_grid',
                              sig_artifacts.DOC_KEY_SQL)},
inv AS (
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT)) AS BIGINT)
           AS tokens_available
  FROM documents
  GROUP BY 1, 2
)
SELECT inv.source, inv.lang, CAST(inv.n_docs AS BIGINT) AS n_docs,
       inv.tokens_available, wt.target_micro,
       CASE WHEN inv.tokens_available > 0
            THEN round(wt.target_micro / {float(MICRO)!r}
                       / CAST(inv.tokens_available AS DOUBLE), 6)
            ELSE 0.0 END AS sample_rate
FROM inv JOIN wt ON inv.source = wt.source AND inv.lang = wt.lang
"""


# --- corpus drift -------------------------------------------------------------

def source_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-shift report (``operators/drift``):
    total-variation distance of each source's hashed-token
    distribution from the REST of the corpus, with the most-drifted
    bucket — the monitor that flags a feed gone off-distribution
    (template change, language flip, spam burst) before model-based
    quality signals react. The statistic's numerator is an exact
    integer (cross-multiplied counts, merge-order invariant); one
    final divide produces the reported distance — which is why TV,
    not KL/JSD (per-bucket logs), is the gate form."""
    from mapreducewordcount_spark.cache import (
        persist_tracked,
        release_query_cache,
    )
    from mapreducewordcount_spark.operators.drift import (
        token_bucket_counts,
        tv_drift_vs_rest,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    # the bucket-count grid feeds four consumers (totals, grid join,
    # top-bucket, numerator); persisted, the corpus explode+groupBy
    # lineage runs ONCE (plan-pinned: docs scanned at most twice)
    release_query_cache()
    counts = persist_tracked(token_bucket_counts(docs))
    return tv_drift_vs_rest(counts)


def _source_drift_sql() -> str:
    from mapreducewordcount_spark.operators.drift import (
        N_BUCKETS,
        _SALT,
    )

    bucket = f"({_hexat_sql('hx', 1)}) % {N_BUCKETS}"
    return rf"""
WITH sw AS (
  SELECT source,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x,
                            '^[!-/:-@\[-`{{-~]+|[!-/:-@\[-`{{-~]+$',
                            '', 'g')),
           x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT source AS grp, md5('{_SALT}' || word) AS hx
        FROM (SELECT source, unnest(words) AS word FROM sw)),
cnt AS (SELECT grp, {bucket} AS bucket, count(*) AS c
        FROM tok GROUP BY 1, 2),
tot_b AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c_all
          FROM cnt GROUP BY 1),
tot_g AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g
          FROM cnt GROUP BY 1),
na AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cnt),
cells AS (
  SELECT g.grp, b.bucket, g.n_g, na.n_all,
         abs(coalesce(cnt.c, 0) * (na.n_all - g.n_g)
             - (b.c_all - coalesce(cnt.c, 0)) * g.n_g) AS diff
  FROM tot_g g
  CROSS JOIN tot_b b
  LEFT JOIN cnt ON cnt.grp = g.grp AND cnt.bucket = b.bucket
  CROSS JOIN na
),
top AS (
  SELECT grp, bucket AS top_bucket, diff AS top_diff
  FROM (SELECT grp, bucket, diff,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY diff DESC, bucket) AS rn
        FROM cells)
  WHERE rn = 1
),
agg AS (SELECT grp, n_g, n_all, sum(diff) AS num
        FROM cells GROUP BY 1, 2, 3)
SELECT agg.grp AS source, agg.n_g AS n_tokens,
       CASE WHEN agg.n_g > 0 AND (agg.n_all - agg.n_g) > 0
            THEN round(num / (2.0 * agg.n_g * (agg.n_all - agg.n_g)),
                       6)
            ELSE 0.0 END AS tv_vs_rest,
       CAST(top.top_bucket AS BIGINT) AS top_bucket,
       CAST(top.top_diff AS BIGINT) AS top_diff
FROM agg JOIN top USING (grp)
"""




# --- per-language tokenizer fertility -----------------------------------------

def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report: per language, words / BPE tokens /
    characters and the two ratios a multilingual mixture designer
    actually reads — ``chars_per_token`` (compression: how much text a
    token buys, the metric that exposes languages a shared vocabulary
    serves badly) and ``tokens_per_word`` (fertility proper). Budgets
    are TOKEN-denominated (mixture_plan, pack_training_sequences), so
    a low-chars-per-token language silently gets less TEXT per token
    budgeted — this report is where that shows up before training.

    Composes the committed BPE serving table (the ``doc_bpe_tokens``
    word→token-count artifact — same family, same builder expression)
    with a per-LANG rollup instead of per-doc: one tokenize explode +
    the vocabulary join + a |langs|-row aggregate. Oracle recomputes
    everything downstream of the artifact."""
    from mapreducewordcount_spark.functions.text_metrics import words
    from mapreducewordcount_spark.operators.bpe import (
        bpe_train,
        bpe_vocab_token_counts,
    )
    from mapreducewordcount_spark.sources import sig_artifacts

    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = bpe_train(docs, n_merges=32, v_max_words=4096)
    vt = sig_artifacts.materialize_frame(
        bpe_vocab_token_counts(docs, merges), "doc_bpe_tokens",
        sig_artifacts.corpus_key(docs), ["word"])
    tok = docs.select("lang", F.explode(words("text")).alias("word"))
    # no broadcast hint on vt (the doc_bpe_tokens policy): it holds
    # every distinct corpus word and grows with vocabulary
    agg = (tok.join(vt, "word")
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_words"),
                F.sum("n_tokens").alias("n_bpe_tokens"),
                F.sum(F.length("word")).alias("n_chars")))
    nd = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (nd.join(agg, "lang", "left")
            .select("lang", "n_docs",
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0))
                    .alias("n_bpe_tokens"),
                    F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
                    F.when(F.col("n_bpe_tokens") > 0,
                           F.round(F.col("n_chars")
                                   / F.col("n_bpe_tokens")
                                   .cast("double"), 4))
                    .otherwise(F.lit(0.0)).alias("chars_per_token"),
                    F.when(F.col("n_words") > 0,
                           F.round(F.col("n_bpe_tokens")
                                   / F.col("n_words").cast("double"),
                                   4))
                    .otherwise(F.lit(0.0)).alias("tokens_per_word")))


def _bpe_fertility_sql() -> str:
    from mapreducewordcount_spark.sources import sig_artifacts

    return rf"""
WITH lw AS (
  SELECT lang,
         list_filter(
           list_transform(regexp_split_to_array(lower(text), '\s+'),
                          x -> regexp_replace(x,
                            '^[!-/:-@\[-`{{-~]+|[!-/:-@\[-`{{-~]+$',
                            '', 'g')),
           x -> x <> '') AS words
  FROM documents
),
{sig_artifacts.frame_cte('vt', 'doc_bpe_tokens',
                         sig_artifacts.DOC_KEY_SQL)},
tok AS (SELECT lang, unnest(words) AS word FROM lw),
agg AS (
  SELECT t.lang, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(vt.n_tokens) AS BIGINT) AS n_bpe_tokens,
         CAST(sum(length(t.word)) AS BIGINT) AS n_chars
  FROM tok t JOIN vt USING (word)
  GROUP BY 1
),
nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       FROM documents GROUP BY 1)
SELECT nd.lang, nd.n_docs,
       coalesce(agg.n_words, 0) AS n_words,
       coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
       coalesce(agg.n_chars, 0) AS n_chars,
       CASE WHEN coalesce(agg.n_bpe_tokens, 0) > 0
            THEN round(coalesce(agg.n_chars, 0)
                       / CAST(agg.n_bpe_tokens AS DOUBLE), 4)
            ELSE 0.0 END AS chars_per_token,
       CASE WHEN coalesce(agg.n_words, 0) > 0
            THEN round(coalesce(agg.n_bpe_tokens, 0)
                       / CAST(agg.n_words AS DOUBLE), 4)
            ELSE 0.0 END AS tokens_per_word
FROM nd LEFT JOIN agg ON nd.lang = agg.lang
"""


QUERIES = {
    "vocab_overlap_hll": QuerySpec(vocab_overlap_hll,
                                   _vocab_overlap_sql()),
    "vocab_overlap_hll_sketch": QuerySpec(vocab_overlap_hll_sketch,
                                          _vocab_overlap_sketch_sql()),
    "mixture_ipf_grid": QuerySpec(mixture_ipf_grid,
                                  _mixture_ipf_sql()),
    "source_drift_tv": QuerySpec(source_drift_tv,
                                 _source_drift_sql()),
    "bpe_fertility_by_lang": QuerySpec(bpe_fertility_by_lang,
                                       _bpe_fertility_sql()),
}
