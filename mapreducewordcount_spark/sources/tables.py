"""Parquet star-schema table loaders (TESTDATA.md tables).

Columnar parquet is the engine's canonical storage: column pruning
and predicate pushdown reach the scan (visible as ``ReadSchema`` /
``PushedFilters`` in ``.explain("formatted")``), which is the single
biggest lever at 100 TB — a query touching 3 of 11 lineitem columns
reads ~27% of the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: dimensions small enough to broadcast at any realistic scale —
#: used by queries to pin broadcast-hash joins regardless of stats.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to µs ``TimestampType`` whatever the
    parquet encoding delivered:

    - ``LongType`` (TIMESTAMP(NANOS) under ``nanosAsLong``) — nanos →
      µs with integer arithmetic (a double division would lose
      precision at 1e18-scale nanos);
    - ``TimestampNTZType`` (``timestamp[us]`` without tz) —
      ``cast("timestamp")``, value-preserving under the pinned UTC
      session timezone;
    - ``TimestampType`` — passthrough.

    Used by both the batch loader and the streaming test fixtures so
    testdata regeneration can't silently change the time contract.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: session-scoped table-handle cache: (applicationId, path) →
#: (dir_fingerprint, DataFrame). Re-analyzing an immutable input per
#: query construction cost ~100 ms each (directory listing + footer
#: read + schema conversion) — ~40 s across a full bench session for
#: plans that are identical every time (round 13). This is the
#: CATALOG shape, not result caching: no data is persisted (every
#: execution still scans the parquet bytes), only the analyzed scan
#: relation is reused — exactly what a metastore-backed table or
#: Spark's own ``filesourcePartitionFileCacheSize`` listing cache
#: does at 100 TB (guide §6). The fingerprint (entry name/size/mtime
#: per file, recursive) invalidates the handle the moment anything
#: rewrites the path, so overwrite-then-reload callers always see
#: fresh bytes.
#:
#: Key soundness note (ADVICE r13): the key uses ``id(spark)``, which
#: is only sound because the cached DataFrame holds a STRONG reference
#: to its session — a live cache entry therefore pins the session
#: object alive, so its ``id()`` can never be recycled onto a new
#: session while the entry exists. Do not weaken that reference or add
#: eviction without re-keying (e.g. per-session dict stored on the
#: session object); the no-evict choice is load-bearing, not an
#: oversight. Lifetime is bounded: one entry per (session, table
#: path) over a ten-table star schema.
_TABLE_CACHE: dict = {}


def _dir_fingerprint(path: str) -> tuple | None:
    """Name/size/mtime of every file under ``path``, RECURSIVELY: a
    partitioned directory table keeps its part files in subdirectories,
    and an in-place rewrite down there changes neither the top-level
    names nor the top dir's mtime — a one-level scan would serve the
    stale handle (ADVICE r13). Depth is bounded by the table layout
    (partition dirs), and the walk is the same listing Spark's own
    file index performs."""
    import os

    try:
        if not os.path.isdir(path):  # single-file parquet
            st = os.stat(path)
            return (("", st.st_size, st.st_mtime_ns),)
        out = []
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            for fn in files:
                st = os.stat(os.path.join(root, fn))
                out.append((os.path.join(rel, fn),
                            st.st_size, st.st_mtime_ns))
        return tuple(sorted(out))
    except OSError:
        return None


def reset_session_memos() -> None:
    """Drop every Python-side session memo this module (and the
    artifact layer) holds: the table-handle cache — and with it the
    per-frame ``spread``-probe and corpus-key statistic memos that
    ride the cached frame objects — plus ``sig_artifacts``'s
    verified-artifact set.

    Exists for the BENCH harness (VERDICT r13 next#1): the bench's
    per-rep quiesce calls this so every timed repetition re-analyzes
    its inputs and re-runs the full compute+verify path instead of
    serving session state the previous rep warmed. Production and
    gate paths never call it — the memos stay available there."""
    from mapreducewordcount_spark.sources import sig_artifacts

    _TABLE_CACHE.clear()
    sig_artifacts._SESSION_VERIFIED.clear()  # noqa: SLF001


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # self-defensive: callers may hand us a session built without our
    # defaults (the correctness driver does). Queries whose closures
    # live in this package (mapInPandas media stages, pandas_udf
    # signatures) need the package importable on executor Python
    # workers — a foreign session launched from another CWD throws
    # ModuleNotFoundError otherwise (caught by a foreign-session sweep
    # of the rows-only queries, round 5). Ship once per context.
    _ensure_package_on_executors(spark)
    if name == "events":
        # both confs are runtime-settable. nanosAsLong is required to
        # scan events.ts; UTC pins timestamp rendering to match
        # UTC-naive oracles on any host timezone. Re-asserted on every
        # call (cache hit included): they are session state, not plan
        # state.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — dying context: skip the cache
        app_id = None
    fp = _dir_fingerprint(path) if app_id is not None else None
    # keyed on the SESSION object too (not just the application): a
    # DataFrame is session-bound, and two sessions over one context
    # may differ in runtime conf — never serve one session's handle
    # to another
    cache_key = (app_id, id(spark), path)
    if fp is not None:
        hit = _TABLE_CACHE.get(cache_key)
        if hit is not None and hit[0] == fp:
            return hit[1]
    df = spark.read.parquet(path)
    if name == "events":
        # events.ts has drifted across testdata generations
        # (TIMESTAMP(NANOS) → timestamp[us]-NTZ); normalize every
        # arrival type to one TimestampType contract.
        df = normalize_events_ts(df)
    if fp is not None:
        # mark fingerprint-guarded handles: derived per-table
        # statistics (sig_artifacts corpus keys) may memoize on the
        # object, because a byte change at the path yields a NEW
        # handle — object identity ⟺ same underlying bytes
        try:
            df._mrwc_from_table_cache = True
        except Exception:  # noqa: BLE001
            pass
        _TABLE_CACHE[cache_key] = (fp, df)
    return df


def _ensure_package_on_executors(spark: SparkSession) -> None:
    """Idempotent per-SparkContext package shipping (session.py's
    ``_ship_package``, guarded so hot loaders don't re-zip/re-add)."""
    sc = spark.sparkContext
    if getattr(sc, "_mrwc_pkg_shipped", False):
        return
    from mapreducewordcount_spark.session import _ship_package

    try:
        _ship_package(spark)
        # flag only on SUCCESS: a transient zip/addPyFile failure must
        # leave the next load_table free to retry, or every later
        # Python-worker stage on this context hits the executor
        # ModuleNotFoundError this helper exists to prevent
        sc._mrwc_pkg_shipped = True
    except Exception:  # noqa: BLE001 — shipping is best-effort; a
        # same-CWD session imports the package fine without it
        pass


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread(df: DataFrame) -> DataFrame:
    """Repartition an UNDER-parallel source to full parallelism
    before a CPU-bound stage — and stay out of the way otherwise.

    Small/one-file parquet arrives as one split; tokenizers,
    hash/shingle builders and vector math are compute-bound, so a
    cheap shuffle of the raw rows buys cluster-wide parallelism at
    test scale. At 100 TB the source already has thousands of splits
    and an unconditional repartition would be a full shuffle of the
    corpus bytes in front of a narrow map — so this is a true no-op
    (returns ``df`` unchanged, no Exchange in the plan) whenever the
    scan already carries >= defaultParallelism partitions.

    Probe order matters: ``df.rdd`` is NOT free on a shuffle-bearing
    plan — under AQE, converting to an RDD finalizes the plan and can
    EXECUTE its intermediate query stages at DataFrame-construction
    time. So shuffle-bearing inputs short-circuit first (a plan that
    already shuffles runs at ``spark.sql.shuffle.partitions`` — it
    does not need a parallelism top-up); only for shuffle-free plans
    (scans/narrow maps, where ``.rdd`` is pure plan analysis) does
    the partition-count probe run.
    """
    import re

    from mapreducewordcount_spark.plans import explain_str

    # the probe (one explain + possibly an .rdd analysis — ~50 ms of
    # py4j) is deterministic for a given frame in a given session, so
    # its outcome rides the frame object; with load_table's handle
    # cache this makes repeated constructions of the same query pay
    # the probe once per session (round 13)
    cached = getattr(df, "_mrwc_spread_out", None)
    if cached is not None:
        return cached
    target = df.sparkSession.sparkContext.defaultParallelism
    # SHUFFLE exchanges only — a bare "Exchange" substring also
    # matches BroadcastExchange, and a broadcast-join-only plan may
    # still carry a one-split scan on its big side that needs the
    # top-up (ADVICE r4)
    if re.search(r"\bExchange (hashpartitioning|rangepartitioning"
                 r"|SinglePartition|RoundRobinPartitioning)",
                 explain_str(df, mode="simple")):
        out = df
    elif df.rdd.getNumPartitions() >= target:
        out = df
    else:
        out = df.repartition(target)
    try:
        df._mrwc_spread_out = out
        # propagate statistic-memo eligibility: out's identity is tied
        # to df's (this memo), and df's to the file bytes (the handle
        # cache), so per-table statistics may ride out too
        if out is not df and getattr(df, "_mrwc_from_table_cache",
                                     False):
            out._mrwc_from_table_cache = True
    except Exception:  # noqa: BLE001 — memo is best-effort
        pass
    return out


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL entry points."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
