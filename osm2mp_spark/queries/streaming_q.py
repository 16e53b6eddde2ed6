"""Streaming-surface queries (batch-equivalent forms are oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.windows import windowed_counts_batch
from . import register


@register(
    "windowed_agg",
    oracle="""
SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS total_cents
FROM events GROUP BY 1, 2
""",
)
def windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-min event-time windows (the batch twin of the Structured
    Streaming pipeline in streaming.windows; equivalence is pytest-checked).
    total_value sums doubles — exact only because each window's values are
    summed in both engines from identical parquet row groups; tolerance
    handled by comparing rounded cents."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_counts_batch(e)
    # compare cents as exact integers (double sum order varies by engine)
    return out.select(
        "window_start_us",
        "event_type",
        "n",
        F.expr("CAST(ROUND(total_value * 100) AS BIGINT)").alias("total_cents"),
    )


from ..streaming.sessions import SESSION_ORACLE_SQL, sessionize_batch


@register("sessionize", oracle=SESSION_ORACLE_SQL)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) — the gaps-and-islands window pattern on
    event time; the stateful-streaming twin (applyInPandasWithState) is
    equivalence-tested in tests/test_checkpoint_streaming.py."""
    return sessionize_batch(spark.read.parquet(f"{sf_dir}/events.parquet"))
