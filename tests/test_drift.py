"""Source-drift TV report: Python replay of the bucket hash and the
exact-integer statistic, identical-distribution zero, and bounds."""

from __future__ import annotations

import hashlib
import re

from mapreducewordcount_spark.operators.drift import (
    N_BUCKETS,
    _SALT,
    token_bucket_counts,
    tv_drift_vs_rest,
)

_PUNCT = r"^[!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]+$"


def _tokens(text):
    out = []
    for raw in text.lower().split():
        w = re.sub(_PUNCT, "", raw)
        if w:
            out.append(w)
    return out


def _bucket(word):
    hx = hashlib.md5((_SALT + word).encode()).hexdigest()
    return int(hx[:4], 16) % N_BUCKETS


def _py_report(rows):
    cnt: dict[tuple[str, int], int] = {}
    for src, text in rows:
        for w in _tokens(text):
            k = (src, _bucket(w))
            cnt[k] = cnt.get(k, 0) + 1
    srcs = sorted({s for s, _b in cnt})
    n_g = {s: sum(c for (ss, _b), c in cnt.items() if ss == s)
           for s in srcs}
    n_all = sum(n_g.values())
    buckets = sorted({b for _s, b in cnt})
    rep = {}
    for s in srcs:
        num, top = 0, (-1, -1)
        for b in buckets:
            c_g = cnt.get((s, b), 0)
            c_r = sum(cnt.get((o, b), 0) for o in srcs if o != s)
            d = abs(c_g * (n_all - n_g[s]) - c_r * n_g[s])
            num += d
            if d > top[0]:  # ascending b: first max IS smallest bucket
                top = (d, b)
        n_r = n_all - n_g[s]
        tv = round(num / (2.0 * n_g[s] * n_r), 6) if n_g[s] and n_r \
            else 0.0
        rep[s] = (n_g[s], tv, top[1], top[0])
    return rep


def _run(spark, rows):
    docs = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string")
    return {r.source: (r.n_tokens, r.tv_vs_rest, r.top_bucket,
                       r.top_diff)
            for r in tv_drift_vs_rest(token_bucket_counts(docs))
            .collect()}


def test_drift_matches_python_replay(spark):
    rows = [("sa", "alpha beta beta gamma gamma gamma"),
            ("sa", "alpha delta epsilon"),
            ("sb", "zeta zeta zeta eta theta alpha"),
            ("sb", "iota kappa kappa")]
    assert _run(spark, rows) == _py_report(rows)


def test_identical_distributions_drift_zero(spark):
    text = "the same words every time here"
    rows = [("sa", text), ("sa", text), ("sb", text)]
    got = _run(spark, rows)
    assert got["sa"][1] == 0.0 and got["sb"][1] == 0.0
    assert all(v[3] == 0 for v in got.values())  # top_diff 0 too


def test_disjoint_vocabularies_drift_one(spark):
    rows = [("sa", "aaa bbb ccc ddd"), ("sb", "eee fff ggg hhh")]
    got = _run(spark, rows)
    # fully disjoint supports (no bucket collision here): TV = 1
    assert got["sa"][1] == 1.0 and got["sb"][1] == 1.0
