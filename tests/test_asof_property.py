"""Property test: asof_join_backward vs pandas merge_asof on random data.

The DuckDB oracle covers the sf0.01 shape; this probes the operator
on adversarial generated shapes — keys with no matches, left rows
before any right row, dense/sparse time collisions across keys.
Right timestamps are unique per key (exact-tie choice among equal
right times is engine-defined; the query layer pins it by pre-dedup).
"""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducewordcount_spark.operators.asof import asof_join_backward

_key = st.integers(min_value=0, max_value=4)
_time = st.integers(min_value=0, max_value=10 ** 6)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(_key, _time), min_size=1, max_size=40),
    right=st.lists(st.tuples(_key, _time), min_size=1, max_size=40,
                   unique_by=lambda r: (r[0], r[1])),
)
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 1000 + i) for i, (k, t) in enumerate(right)]

    ldf = spark.createDataFrame(left_rows, "event_id long, k long, t long") \
        .withColumn("ts", pd_ts("t"))
    rdf = spark.createDataFrame(right_rows, "k long, t long, payload long") \
        .withColumn("rts", pd_ts("t")).drop("t")

    got = {r.event_id: r.payload for r in asof_join_backward(
        ldf, rdf, left_on="k", right_on="k", left_time="ts",
        right_time="rts", right_cols=["payload"], how="left").collect()}

    lp = pd.DataFrame(left_rows, columns=["event_id", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "payload"]).sort_values("t", kind="stable")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {int(r.event_id): (None if pd.isna(r.payload) else int(r.payload))
            for r in merged.itertuples()}

    assert got == want


def pd_ts(col: str):
    from pyspark.sql import functions as F

    return F.timestamp_seconds(F.col(col))
