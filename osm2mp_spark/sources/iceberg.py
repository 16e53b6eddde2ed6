"""Iceberg source/sink — import-try gated (the runtime image ships no
Iceberg jars; BASELINE.json names Iceberg as the production table format).

On a cluster with `iceberg-spark-runtime` on the classpath, `images_table`
reads `spark.read.format("iceberg")` and `write_iceberg` appends with
fanout-enabled partitioned commits. In this sandbox both fall back to
parquet datasets with the identical schema and partitioning, so every
pipeline stays runnable; the format switch is a config, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def iceberg_available(spark: SparkSession) -> bool:
    # NB: a bare `spark._jvm.org.apache.iceberg.Table` attribute access never
    # throws — py4j resolves packages lazily — so force real class loading
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier_or_path: str) -> DataFrame:
    """Read an Iceberg table by identifier, or a parquet dataset by path
    when Iceberg isn't on the classpath (sandbox fallback)."""
    if iceberg_available(spark) and "/" not in identifier_or_path:
        return spark.read.format("iceberg").load(identifier_or_path)
    return spark.read.parquet(identifier_or_path)


def write_table(
    df: DataFrame,
    identifier_or_path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if iceberg_available(df.sparkSession) and "/" not in identifier_or_path:
        writer.format("iceberg").saveAsTable(identifier_or_path)
    else:
        writer.parquet(identifier_or_path)
