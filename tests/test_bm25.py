"""BM25 retrieval: hand-checked scores vs an independent Python
reference, ranking monotonicity, plan shape, and input contracts."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.bm25 import (
    SCALE,
    bm25_batch_topk,
    bm25_topk,
)

K1, B = 1.2, 0.75


def _ref_bm25(texts: dict[int, str], terms: list[str],
              k1: float = K1, b: float = B) -> dict[int, float]:
    """Independent reference: same rational-idf BM25, same integer
    quantization, computed with plain Python floats."""
    toks = {d: [w for w in re.split(r"\s+", t.lower()) if w]
            for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df: dict[str, int] = {}
    for words in toks.values():
        for t in set(words) & set(terms):
            df[t] = df.get(t, 0) + 1
    out: dict[int, float] = {}
    for d, words in toks.items():
        units = 0
        for t in terms:
            tf = words.count(t)
            if not tf or t not in df:
                continue
            idf = ((n - df[t]) + 0.5) / (df[t] + 0.5)
            dl = len(words)
            contrib = idf * ((tf * (k1 + 1.0))
                             / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
            units += round(contrib * SCALE)
        if units:
            out[d] = units / SCALE
    return out


CORPUS = {
    1: "spark spark join filter scan",
    2: "join join join hash hash merge sort",
    3: "spark hash",
    4: "filter scan merge sort window",          # matches no term
    5: "",                                        # blank doc, counts in N
}
TERMS = ["spark", "join", "hash"]


def _docs(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string")


def test_scores_match_reference(spark):
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(_docs(spark), TERMS, k=10).collect()}
    want = _ref_bm25(CORPUS, TERMS)
    assert got == pytest.approx(want, abs=1.5 / SCALE)
    assert 4 not in got and 5 not in got  # no matching term -> no row


def test_rank_order_and_tiebreak(spark):
    rows = bm25_topk(_docs(spark), TERMS, k=10).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_more_occurrences_same_length_scores_higher(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spark pad"), (2, "spark pad pad pad"),
         (3, "pad pad pad pad")], "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert got[1] > got[2]
    assert 3 not in got


def test_topk_cuts(spark):
    rows = bm25_topk(_docs(spark), TERMS, k=2).collect()
    assert len(rows) == 2 and rows[0]["rank"] == 1


def test_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [])


def test_batch_matches_single_query_runs(spark):
    # df(t) is a property of the corpus, not the query set, so each
    # query's batch result must equal its standalone run exactly
    qsets = {1: ["spark", "join"], 2: ["hash"], 3: ["join", "hash"]}
    queries = spark.createDataFrame(
        [(qid, terms) for qid, terms in qsets.items()],
        "query_id long, terms array<string>")
    batch = bm25_batch_topk(_docs(spark), queries, k=10).collect()
    for qid, terms in qsets.items():
        single = {(r["doc_id"], r["rank"]): r["score"]
                  for r in bm25_topk(_docs(spark), terms, k=10).collect()}
        got = {(r["doc_id"], r["rank"]): r["score"]
               for r in batch if r["query_id"] == qid}
        assert got == single, qid


def test_batch_window_is_query_partitioned(spark):
    import re

    from mapreducewordcount_spark.plans import explain_str

    queries = spark.createDataFrame(
        [(1, ["spark"]), (2, ["hash"])], "query_id long, terms array<string>")
    plan = explain_str(bm25_batch_topk(_docs(spark), queries, k=5))
    # per-query ranking must partition the window by query_id — a
    # partition-less window here would serialize all queries' results
    assert re.search(r"hashpartitioning\(query_id", plan)


def test_plan_shape(spark):
    from mapreducewordcount_spark.plans import explain_str

    plan = explain_str(bm25_topk(_docs(spark), TERMS, k=5))
    # global top-k must be TakeOrderedAndProject, never a full Sort
    assert "TakeOrderedAndProject" in plan
    # df/corpus statistics join back broadcast — no shuffled join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # postings are filtered to the query terms BEFORE the tf
    # aggregate: the IN-filter node number is smaller than every
    # HashAggregate's (formatted explain numbers nodes bottom-up
    # within each subtree, so the filter feeding the aggregate must
    # appear in the tree above it — assert on tree order instead)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    f_idx = [i for i, l in enumerate(lines)
             if "Filter" in l and "Isnotnull" not in l]
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert f_idx and agg_idx
    # the deepest (last-listed) aggregate consumes an already-filtered
    # child: some Filter sits strictly below it in the printed tree
    assert max(f_idx) > min(agg_idx)
