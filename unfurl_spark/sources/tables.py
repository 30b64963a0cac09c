"""Table-format shim: Iceberg first, parquet fallback.

The production deployment (BASELINE.json north_rule) reads and writes
Iceberg tables — partition-pruned scans, snapshot isolation, and
`overwritePartitions` give the driver's bucket resume its atomicity.
This sandbox ships no Iceberg catalog jars, so the shim makes the
format a runtime capability probe instead of a code fork: callers use
`read_table` / `write_bucketed` / `append_metrics` and get Iceberg
semantics when the catalog is present, parquet
dynamic-partition-overwrite otherwise (same idempotence contract,
verified by tests/test_driver_resume.py and test_spark_submit.py).

Identifier convention: values containing "/" are paths (parquet);
other values are catalog table identifiers (Iceberg).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=4)
def iceberg_available(spark_id: str) -> bool:
    """True when an Iceberg catalog is importable in this JVM."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:  # noqa: BLE001 — jar probe
        return False


def _is_path(identifier: str) -> bool:
    return "/" in identifier or identifier.endswith(".parquet")


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Scan a documents/side table by path (parquet) or name (Iceberg)."""
    if _is_path(identifier):
        return spark.read.parquet(identifier)
    if iceberg_available(spark.sparkContext.applicationId):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.table(identifier)


def write_bucketed(df: DataFrame, identifier: str,
                   partition_col: str = "bucket") -> None:
    """Idempotent bucket commit: replace exactly the buckets present in
    `df`, never duplicate — Iceberg `overwritePartitions` or parquet
    dynamic partition overwrite."""
    spark = df.sparkSession
    if not _is_path(identifier) and iceberg_available(
            spark.sparkContext.applicationId):
        df.writeTo(identifier).overwritePartitions()
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partition_col) \
        .parquet(identifier)


def append_metrics(df: DataFrame, identifier: str) -> None:
    """Append-only lineage/metrics table."""
    spark = df.sparkSession
    if not _is_path(identifier) and iceberg_available(
            spark.sparkContext.applicationId):
        df.writeTo(identifier).append()
        return
    df.write.mode("append").parquet(identifier)
