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


def sessionize_stateful(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    gap_seconds: int = 1800,
    max_files_per_trigger: int | None = None,
):
    """Custom stateful streaming operator: gap-based sessionization per
    user via ``applyInPandasWithState`` (the engine's demonstration of
    arbitrary stateful processing — the reference has no streaming, so
    this is a first-class engine extension, SURVEY.md §G).

    State per user: (session_start, last_ts, n_events, sum_cents).
    An event more than ``gap_seconds`` after the previous one closes the
    session (emitted with closed=true) and opens a new one; at the end
    of EVERY batch the still-open session is emitted as a closed=false
    snapshot. Consumer contract for the append-only sink, per
    (user_id, session_start): keep the closed=true row if one exists
    (a session that closes in a LATER batch shares its key with its own
    earlier closed=false snapshots, which must then be discarded — not
    merely superseded by a newer snapshot); otherwise keep the snapshot
    with max session_end, since a still-open session spanning k batches
    leaves k progressively-larger snapshots. Under a single-batch drain
    (one input file, the
    AvailableNow default) there is exactly one snapshot per open session
    and closed sessions + snapshots partition the events. No timeout is
    used: with Trigger.AvailableNow a processing-time timeout would keep
    scheduling state-cleanup batches and the query would never drain.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    if max_files_per_trigger is not None:
        # force multi-batch processing (cross-batch state continuity is
        # what applyInPandasWithState exists for; tests drive it this way)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_cents long, closed boolean"
    )
    state_schema = "start long, last long, n long, cents long"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        start = last = n = cents = None
        if state.exists:
            start, last, n, cents = state.get
        # a group larger than one Arrow chunk arrives as SEVERAL pdfs in
        # arbitrary shuffle order — concatenate and sort ONCE, or the
        # gap test runs against out-of-order timestamps
        chunks = list(pdf_iter)
        if chunks:
            merged = pd.concat(chunks, ignore_index=True).sort_values("ts")
        else:
            merged = pd.DataFrame()
        if len(merged):
            for r in merged.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                c = int(r.value * 100.0 // 1)
                if start is None:
                    start, last, n, cents = ts_us, ts_us, 1, c
                elif ts_us - last > gap_seconds * 1_000_000:
                    rows.append((user_id, start, last, n, cents, True))
                    start, last, n, cents = ts_us, ts_us, 1, c
                else:
                    last = ts_us
                    n += 1
                    cents += c
        if start is not None:
            state.update((start, last, n, cents))
            rows.append((user_id, start, last, n, cents, False))  # running session snapshot
        if rows:
            yield pd.DataFrame([{
                "user_id": u,
                "session_start": pd.Timestamp(s, unit="us"),
                "session_end": pd.Timestamp(e, unit="us"),
                "n_events": k, "sum_cents": cc, "closed": cl,
            } for (u, s, e, k, cc, cl) in rows])

    # "append" output: the parquet sink only supports append; each batch
    # appends closed sessions plus the current running-session snapshot
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
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
