"""Streaming twins of ops.events: watermarked windowed aggregation and
session windows over an event stream.

The reference has no streaming at all (SURVEY.md §2.10), so these are the
Spark-native extensions the training-pipeline brief asks for: late data is
handled by watermarks (events older than the watermark relative to max
seen ts are dropped from open aggregates); sessionization uses Spark's
native ``session_window`` (dynamic-gap windows merged by the state store)
— the declarative equivalent of ops.events.sessionize's lag/gap/cumsum
batch pattern, with state cleanup for free.

Scale notes: both are single-shuffle stateful aggregations keyed on
(window/user) — state per key is one aggregate row, bounded by watermark
expiry; with RocksDB state store this runs at arbitrary key cardinality.
Outputs in append mode emit only FINALIZED windows (watermark passed), so
downstream sinks see each window exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with late-data
    handling — the streaming twin of ops.events.windowed_counts.

    Works on a streaming OR batch DataFrame (watermark is a no-op in
    batch, which is how the tests pin stream==batch parity).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user (gap-merged by the state store) — the
    streaming twin of ops.events.sessionize.

    Returns (user_id, session_start, session_end, n_events, sum_value).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )
