"""Iceberg table IO — gated behind an import/classpath probe.

The north rule targets Iceberg tables; this container ships no Iceberg
runtime jars, so the engine reads/writes plain parquet datasets with
the same layout and exposes the exact Iceberg swap points here. On a
cluster with `iceberg-spark-runtime` on the classpath these functions
switch to the catalog API; the index format and every query plan are
unchanged (the manifest/ generation files are this engine's snapshot
mechanism and map 1:1 to Iceberg snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_webtext(spark: SparkSession, location: str) -> DataFrame:
    """location: an Iceberg table name (catalog.db.tbl) when the runtime
    is present, else a parquet directory path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_snapshot(df: DataFrame, location: str, mode: str = "append") -> None:
    """Append a doc batch as a new snapshot/generation."""
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        # real cluster: ACID append -> Iceberg snapshot
        df.writeTo(location).append() if mode == "append" else df.writeTo(
            location
        ).createOrReplace()
        return
    df.write.mode(mode).parquet(location)
