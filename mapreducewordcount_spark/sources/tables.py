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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # self-defensive: callers may hand us a session built without
        # our defaults (the correctness driver does); both confs are
        # runtime-settable. nanosAsLong is required to scan events.ts;
        # UTC pins timestamp rendering to match UTC-naive oracles on
        # any host timezone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — Spark reads it as
        # long nanos (legacy.parquet.nanosAsLong); convert to a real
        # timestamp at µs precision with integer arithmetic (a double
        # division would lose precision at 1e18-scale nanos)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread(df: DataFrame) -> DataFrame:
    """Repartition a compact source to full parallelism before a
    CPU-bound stage.

    Small/one-file parquet arrives as one partition; tokenizers,
    hash/shingle builders and vector math are compute-bound, so a
    cheap shuffle of the raw rows buys cluster-wide parallelism.
    No-op-cheap at scale (big sources already have many partitions —
    still, prefer calling this only in front of heavy expressions).
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL entry points."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
