"""Streaming multimodal ingest — the image payload path as a file stream.

A 10^12-image corpus doesn't arrive as one batch: it lands as files. This
module runs the SAME decode → perceptual-hash kernel as the batch path
(operators.images.dhash_images) over `readStream`, so micro-batches of
newly-landed image files are decoded incrementally — each file processed
exactly once, tracked by the Structured Streaming checkpoint (file-source
offsets + sink commit log), surviving restarts without reprocessing.

The transformation is stateless (mapInPandas), so no watermark is needed;
exactly-once here is the file-source/checkpoint contract, tested by
tests/test_checkpoint_streaming.py::TestImageIngestStream with a
mid-stream restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.images import dhash_images


def image_dhash_stream(
    spark: SparkSession, images_path: str, schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over an image-file directory → the batch dHash kernel.
    `max_files_per_trigger` bounds per-micro-batch decode work (the
    rate-limiting knob for a backlogged landing zone)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(images_path)
    return dhash_images(stream)
