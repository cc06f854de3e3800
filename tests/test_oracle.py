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


@pytest.mark.parametrize("name", WITH_ORACLE)
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
