"""Mirror of the driver's correctness gate, run locally at sf0.01.

For every query with an oracle: run the Spark implementation and the
DuckDB SQL side-by-side, then compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted by all
columns, exact equality after the per-query rounding baked into both
sides). This is intentionally *stricter* than approximate float
comparison — the driver hashes values, so we must be bit-stable.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from mapreducewordcount_spark.queries import all_queries
from tests.conftest import SF_ORACLE

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle_sql)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle_sql)

#: the heaviest oracle rows (≥8 s each at sf0.01 in the r14 timing
#: sweep — dedup component pipelines, BM25 legs, curation
#: composites). Marked ``slow`` so the default (driver-budget) tier
#: skips them; they remain covered by the full-suite builder gate,
#: by ``tools/gate_sim.py`` (full registry, all axes) and most by
#: the driver's own rotating correctness window. Keep this list
#: SHORT and timing-justified — everything else stays default-tier.
SLOW_ORACLE = frozenset({
    "curate_corpus", "curate_corpus_best", "dedup_cluster_stats",
    "dedup_groups", "dedup_minhash_pairs", "dedup_ngram_pairs",
    "dedup_prefix_pairs", "dedup_survivors", "dedup_winnow_pairs",
    "doc_bm25_multi", "doc_bm25_topk", "doc_cdc_chunk_dedup",
    "doc_hybrid_bm25", "doc_hybrid_search", "doc_keywords_tfidf",
    "doc_language_ngram", "leakage_safe_splits", "pack_curated_corpus",
    "part_name_fuzzy_pairs",
})


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b or (pd.isna(a) and pd.isna(b))


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in SLOW_ORACLE else n
     for n in WITH_ORACLE])
def test_query_matches_duckdb_oracle(spark, duck, name):
    spec = SPECS[name]
    got = _canon(spec.spark_fn(spark, SF_ORACLE).toPandas())

    # The driver gate hashes the oracle result as DuckDB emits it, so
    # dtypes the _canon() below would silently normalize still fail
    # there: sum() promoting BIGINT→HUGEINT renders "460013.0" vs
    # Spark's "460013", and decimal-literal math yields DECIMAL(n,s).
    # Reject them here so the local sweep predicts the gate (oracles
    # must CAST to BIGINT/DOUBLE at the source).
    rel = duck.sql(spec.oracle_sql)
    drifty = [(c, t) for c, t in
              zip(rel.columns, (str(t).upper() for t in rel.types))
              if "HUGEINT" in t or t.startswith("DECIMAL")]
    assert not drifty, (
        f"{name}: oracle emits gate-unsafe dtypes {drifty}; "
        "CAST the offending expression to BIGINT/DOUBLE in the SQL")
    want = _canon(rel.df())

    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(ga, wa))
               if not _values_equal(x, y)]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


@pytest.mark.parametrize(
    "name", ROWS_ONLY or [pytest.param(
        "__registry_fully_oracled__",
        marks=pytest.mark.skip(
            reason="no rows-only queries left — every registry entry "
                   "has a DuckDB/artifact oracle (round 10)"))])
def test_rows_only_queries_run(spark, name):
    df = SPECS[name].spark_fn(spark, SF_ORACLE)
    assert df.count() >= 0 and len(df.schema) > 0
