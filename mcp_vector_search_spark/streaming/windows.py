"""Event-time streaming aggregations — the Structured Streaming
equivalents of the batch operators in ``operators/events.py``.

The reference has no event-time semantics (its only stream is the FS
change feed, SURVEY §2.10 "Not present") — these are part of the
engine's training-data-pipeline surface: the same logical windows as
the batch `hourly_rollup`/`sessionize`, expressed with watermarks so
late data is bounded and state is evictable on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_hourly_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h count+sum per event_type with a late-data watermark.
    In append mode a window finalizes (and its state evicts) once the
    watermark passes its end — bounded state on an unbounded stream."""
    # watermarks demand TIMESTAMP (not NTZ); the session is UTC-pinned
    # so the cast is value-identical
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("hour_us"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with an inactivity gap — the streaming
    twin of the batch `sessionize` (same 30-min gap), via the native
    `session_window` (state merges adjacent windows within the gap)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
            "n_events",
        )
    )
