"""Content-defined chunking: tiling exactness, size bounds,
determinism, and the property the whole family exists for —
insertion robustness (an edit disturbs only nearby chunks, unlike
fixed-size chunking where one inserted character shifts every later
boundary)."""

from __future__ import annotations

import hashlib
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreducewordcount_spark.operators.cdchunk import (
    DEFAULT_MAX_CHUNK,
    DEFAULT_MIN_CHUNK,
    cdc_chunk_table,
    chunk_dedup_report,
)


def _text(n, seed=7):
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_tile_each_document_exactly(spark):
    rows = [(1, _text(2000)), (2, _text(10)), (3, ""), (4, None)]
    got = cdc_chunk_table(_docs(spark, rows)).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}  # empty/None docs emit nothing
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        text = dict(rows)[doc_id]
        pos = 0
        for c in chunks:
            assert c.offset == pos
            assert c.chunk_md5 == hashlib.md5(
                text[c.offset:c.offset + c.length].encode()).hexdigest()
            pos += c.length
        assert pos == len(text)


def test_cut_positions_forced_cut_min_size(spark):
    """ADVICE r8 repro: a candidate within min_chunk of a boundary the
    max-size loop just forced must be SKIPPED, not emitted as a
    sub-min chunk (candidates [513, 700], n=900 used to yield chunk
    lengths [512, 1, 187, 200])."""
    from mapreducewordcount_spark.operators.cdchunk import cut_positions

    cuts = cut_positions([513, 700], 900, 32, 512)
    assert cuts == [512, 700, 900]
    lengths = [b - a for a, b in zip([0] + cuts, cuts)]
    assert all(ln >= 32 for ln in lengths[:-1])
    # candidate exactly AT a forced cut (c - prev == 0) is also skipped
    cuts = cut_positions([512, 1024], 1100, 32, 512)
    assert cuts == [512, 1024, 1100]


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_cut_positions_envelope_property(data):
    """For ANY candidate list: cuts tile [0, n] exactly, every chunk
    except the final tail has length in [min, max], and the tail has
    length in (0, max] (n > 0)."""
    from mapreducewordcount_spark.operators.cdchunk import cut_positions

    n = data.draw(st.integers(min_value=1, max_value=5000))
    min_c = data.draw(st.integers(min_value=1, max_value=64))
    max_c = data.draw(st.integers(min_value=min_c, max_value=600))
    cand = sorted(data.draw(st.sets(
        st.integers(min_value=1, max_value=n), max_size=60)))
    cuts = cut_positions(cand, n, min_c, max_c)
    assert cuts == sorted(set(cuts)) and cuts[-1] == n
    lengths = [b - a for a, b in zip([0] + cuts, cuts)]
    assert all(0 < ln <= max_c for ln in lengths)
    assert all(ln >= min_c for ln in lengths[:-1])


def test_chunk_size_bounds(spark):
    got = cdc_chunk_table(_docs(spark, [(1, _text(20000))])).collect()
    assert len(got) > 10
    for c in got:
        assert c.length <= DEFAULT_MAX_CHUNK
    # all but the final tail respect the minimum
    for c in sorted(got, key=lambda r: r.chunk_idx)[:-1]:
        assert c.length >= DEFAULT_MIN_CHUNK


def test_partitioning_invariance(spark):
    rows = [(i, _text(1500, seed=i)) for i in range(20)]
    a = sorted(map(tuple, cdc_chunk_table(
        _docs(spark, rows).repartition(1)).collect()))
    b = sorted(map(tuple, cdc_chunk_table(
        _docs(spark, rows).repartition(16)).collect()))
    assert a == b


def test_insertion_robustness_vs_fixed_chunking(spark):
    """Insert a few characters at the FRONT of a long document: CDC
    boundaries resynchronize after the edit, so most chunk hashes
    survive — the property fixed-size chunking lacks (every chunk
    after the edit shifts)."""
    base = _text(20000)
    edited = "XYZZY" + base
    table = cdc_chunk_table(_docs(spark, [(1, base), (2, edited)]))
    rows = table.collect()
    h1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    h2 = {r.chunk_md5 for r in rows if r.doc_id == 2}
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.8, shared
    # fixed-size control: every 256-char block after the insertion
    # point differs
    fixed1 = {hashlib.md5(base[i:i + 256].encode()).hexdigest()
              for i in range(0, len(base), 256)}
    fixed2 = {hashlib.md5(edited[i:i + 256].encode()).hexdigest()
              for i in range(0, len(edited), 256)}
    assert len(fixed1 & fixed2) / len(fixed1) < 0.05


def test_dedup_report_counts_duplicate_mass(spark):
    shared = _text(5000, seed=1)
    docs = spark.createDataFrame(
        [(1, "s1", shared), (2, "s1", shared), (3, "s1", _text(500, 9))],
        "doc_id long, source string, text string")
    chunks = cdc_chunk_table(docs)
    rep = {r.grp: r for r in chunk_dedup_report(chunks, docs).collect()}
    r = rep["s1"]
    assert r.n_verify_fail == 0
    # the two identical docs chunk identically: duplicate mass at
    # least the shared doc's length
    assert r.dup_chars >= len(shared)
    assert r.total_chars == 2 * len(shared) + 500


def test_incremental_report_planted_edit(spark):
    """The VERDICT r8 next#4 contract: a re-crawled page with one
    mid-document insertion must re-flag only the chunks the edit
    touches — boundaries resynchronize, so the bulk of its bytes
    still probe as dup_of_index (fixed-size chunking would re-flag
    everything after the edit)."""
    from mapreducewordcount_spark.operators.cdchunk import (
        chunk_incremental_report,
    )

    base = _text(20000)
    edited = base[:10000] + "INSERTED!" + base[10000:]
    fresh = _text(3000, seed=99)
    docs = spark.createDataFrame(
        [(1, "src0", base),        # the indexed history
         (2, "srcA", edited),      # re-crawl with one insertion
         (3, "srcB", fresh)],      # genuinely new content
        "doc_id long, source string, text string")
    chunks = cdc_chunk_table(docs)
    rep = {r.grp: r for r in
           chunk_incremental_report(chunks, docs, "src0").collect()}
    assert set(rep) == {"srcA", "srcB"}  # the index source emits no row
    a = rep["srcA"]
    # the edit disturbs only nearby chunks: >=80% of the re-crawl's
    # bytes are recognized as already indexed
    assert a.dup_index_chars / a.total_chars >= 0.8, a
    assert a.n_new >= 1                    # the touched chunk(s)
    assert a.total_chars == len(edited)
    assert a.n_chunks == (a.n_dup_index + a.n_dup_batch + a.n_new)
    b = rep["srcB"]
    assert b.n_dup_index == 0 and b.new_chars == len(fresh), b


def test_incremental_report_within_batch_dups(spark):
    """A chunk hash absent from the index but repeated inside the
    batch: its FIRST occurrence (by (doc_id, chunk_idx) order) is
    'new', later ones 'dup_in_batch' — and an indexed hash is
    dup_of_index in EVERY batch occurrence."""
    from mapreducewordcount_spark.operators.cdchunk import (
        chunk_incremental_report,
    )

    shared = _text(5000, seed=3)
    docs = spark.createDataFrame(
        [(1, "src0", _text(4000, seed=4)),
         (2, "srcA", shared), (3, "srcA", shared)],
        "doc_id long, source string, text string")
    chunks = cdc_chunk_table(docs)
    rep = {r.grp: r for r in
           chunk_incremental_report(chunks, docs, "src0").collect()}
    a = rep["srcA"]
    # doc 2 and doc 3 chunk identically: doc 3's chunks are all
    # within-batch dups of doc 2's
    assert a.n_dup_batch >= a.n_new >= 1
    assert a.dup_batch_chars >= len(shared)
    assert a.n_dup_index == 0


def test_unicode_code_point_offsets(spark):
    """Offsets/lengths are CODE POINTS and md5 is over utf-8 bytes —
    pinned on text mixing 1-, 2-, 3- and 4-byte characters (accents,
    CJK, an astral-plane emoji), where byte offsets and code-point
    offsets diverge hard."""
    base = ("héllo wörld 中文字符串 🜁🜂🜃🜄 " * 200) + "tail"
    got = sorted(cdc_chunk_table(
        _docs(spark, [(1, base)])).collect(),
        key=lambda r: r.chunk_idx)
    assert len(got) > 3
    pos = 0
    for c in got:
        sub = base[c.offset:c.offset + c.length]  # code-point slice
        assert c.offset == pos
        assert c.chunk_md5 == hashlib.md5(sub.encode("utf-8")).hexdigest()
        pos += c.length
    assert pos == len(base)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.text(min_size=0, max_size=3000))
def test_tiling_property_any_unicode(spark, text):
    got = sorted(cdc_chunk_table(
        _docs(spark, [(1, text)])).collect(),
        key=lambda r: r.chunk_idx)
    pos = 0
    for c in got:
        assert c.offset == pos
        assert c.chunk_md5 == hashlib.md5(
            text[c.offset:c.offset + c.length].encode("utf-8")).hexdigest()
        pos += c.length
    assert pos == len(text)


def test_packed_rank_guard_raises_on_oversized_doc(spark):
    """The rk packing guard (ADVICE/VERDICT r9): a chunk_idx at or
    above RK_STRIDE would bleed into the next doc_id's rank space and
    silently misattribute first-in-batch status / GC ownership — the
    guarded packing must FAIL the job instead. Planted directly at
    the chunk-table level (a real >32 M-char document is the only way
    to produce it through the chunker)."""
    import pytest

    from mapreducewordcount_spark.operators.cdchunk import (
        RK_STRIDE,
        chunk_incremental_report,
        packed_rank,
    )

    bad_chunks = spark.createDataFrame(
        [(7, RK_STRIDE, 0, 40, "d" * 32)],
        "doc_id long, chunk_idx long, offset int, length int, "
        "chunk_md5 string")
    docs = spark.createDataFrame([(7, "srcA")],
                                 "doc_id long, source string")
    with pytest.raises(Exception, match="rk packing|assert"):
        chunk_incremental_report(bad_chunks, docs, "src0").collect()
    # happy path: packing values are the exact pre-guard arithmetic
    ok = spark.createDataFrame([(3, 5), (3, RK_STRIDE - 1)],
                               "doc_id long, chunk_idx long")
    got = [r.rk for r in ok.select(
        packed_rank(F.col("doc_id"), F.col("chunk_idx"))
        .alias("rk")).collect()]
    assert got == [3 * RK_STRIDE + 5, 4 * RK_STRIDE - 1]


def test_packed_rank_guard_duckdb_mirror():
    """The DuckDB oracle mirrors the guard: same overflow input, same
    failure (instead of a silent wrong owner)."""
    import duckdb
    import pytest

    from mapreducewordcount_spark.operators.cdchunk import (
        RK_STRIDE,
        packed_rank_sql,
    )

    con = duckdb.connect()
    ok = con.execute(
        f"SELECT {packed_rank_sql('3', '5')}").fetchone()[0]
    assert ok == 3 * RK_STRIDE + 5
    with pytest.raises(Exception, match="chunk_idx overflow"):
        con.execute(
            f"SELECT {packed_rank_sql('7', str(RK_STRIDE))}").fetchall()
