"""Generic source/sink helpers beyond the reference's local text files.

The reference reads/writes only newline text on a shared local
filesystem (SURVEY.md §2.4). This engine's canonical interchange is
parquet (columnar, pushdown, splittable); CSV/JSON are supported as
explicit-schema edges — ``inferSchema`` is banned in pipeline code
because it triggers an extra full scan and produces drifting types.

Delta/Iceberg/Hudi connectors need jars not present in this image;
``open_table_format_available`` gates them behind an import-try so
deployments with the jars get them and tests skip cleanly without.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def open_table_format_available(spark: SparkSession, fmt: str = "delta") -> bool:
    """True when a lakehouse table format's classes are on the classpath."""
    classes = {"delta": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
               "iceberg": "org.apache.iceberg.spark.SparkCatalog"}
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(classes[fmt])
        return True
    except Exception:
        return False
