"""Event-time windowed aggregation — batch and Structured Streaming twins.

The reference is batch-only (SURVEY §2.10); the engine still exposes the
streaming surface for event feeds: tumbling event-time windows with
watermarked late-data handling. `windowed_counts_batch` is the exact batch
equivalent (and the DuckDB-oracle-comparable form: epoch-microsecond integer
bucketing, no timezone arithmetic); `windowed_counts_stream` runs the same
logical plan through readStream, used by tests via the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WINDOW_US = 300_000_000  # 5 minutes


def windowed_counts_batch(events: DataFrame) -> DataFrame:
    # parquet timestamps arrive as TIMESTAMP_NTZ; with the session TZ pinned
    # to UTC the cast makes unix_micros equal DuckDB's epoch_us(naive ts)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        events.withColumn(
            "window_start_us", us - F.pmod(us, F.lit(WINDOW_US))
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value")).alias("total_value"),
        )
    )


def windowed_counts_stream(spark: SparkSession, events_path: str, schema) -> DataFrame:
    """The streaming twin: same tumbling window via F.window + watermark."""
    stream = (
        spark.readStream.schema(schema).parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event-time type
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )
    return stream
