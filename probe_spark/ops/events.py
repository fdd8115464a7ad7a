"""Event-stream batch operators: sessionization + windowed aggregation.

Sessionization is the transcript-engine analog of the reference's block
merging (/root/reference/src/search/block_merging.rs:18-167: adjacent blocks
within a line threshold merge into one) — here, events of a user within a
time gap threshold merge into one session.  Expressed as the classic
lag -> gap-flag -> running-sum pattern: one shuffle on user_id, everything
else window-local, so it scales linearly in partitions.

The streaming twins of these (watermarked windows / applyInPandasWithState
sessions) live in probe_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType
from pyspark.sql.window import Window


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds since epoch, timezone-independent: NTZ timestamps are
    taken at face value (naive == UTC, matching DuckDB's epoch_us), LTZ via
    unix_micros.  Never routes through the session timezone."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" {ts_col})"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end, sum_value).

    session_id is 1-based per user in time order — deterministic given the
    (ts, order_col) tie-break.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    ts_us = epoch_micros(df, ts_col)
    gap = ts_us - F.lag(ts_us).over(w)
    flagged = df.withColumn(
        "_new_session",
        # > (boundary merges): an event exactly gap_minutes after the
        # previous one extends the session — verified to match Structured
        # Streaming's session_window on boundary-aligned timestamps
        # (tests/test_ops.py::test_sessionize_boundary_matches_session_window)
        F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1).otherwise(0),
    )
    with_sid = flagged.withColumn(
        "session_id", F.sum("_new_session").over(w).cast("long")
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling 1-hour window x event_type: count + rounded sum(value)."""
    return (
        df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )
