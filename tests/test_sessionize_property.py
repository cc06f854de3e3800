"""Property test: sessionize vs a pure-Python reference implementation."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducewordcount_spark.operators.sessionize import session_stats

_EPOCH = dt.datetime(2024, 1, 1)


def _py_sessions(events, gap_minutes):
    """events: list of (event_id, user_id, offset_seconds)."""
    by_user = {}
    for eid, uid, off in events:
        by_user.setdefault(uid, []).append((off, eid))
    out = {}
    for uid, rows in by_user.items():
        rows.sort()
        n_sessions, prev = 0, None
        for off, _eid in rows:
            if prev is None or off - prev > gap_minutes * 60:
                n_sessions += 1
            prev = off
        out[uid] = (n_sessions, len(rows))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(
    st.tuples(st.integers(0, 10 ** 6),          # event offset seconds
              st.integers(0, 3)),               # user id
    min_size=1, max_size=60))
@pytest.mark.slow  # heavy sweep: default tier skips (pytest.ini, r14)
def test_session_stats_matches_python(spark, events):
    rows = [(i, uid, _EPOCH + dt.timedelta(seconds=off))
            for i, (off, uid) in enumerate(events)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in session_stats(df, gap_minutes=30).collect()}
    want = _py_sessions([(i, uid, off) for i, (off, uid) in enumerate(events)],
                        gap_minutes=30)
    assert got == want
