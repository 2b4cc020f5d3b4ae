"""Structured Streaming window aggregations (SURVEY.md §2.b X7).

Streaming twins of ``plans/events.py``: the same logical aggregations
under watermarks for late data. The reference has no watermark concept —
its late-data policy is 'whenever the trigger fires, re-merge'
(SURVEY.md §2 O19/O15); these are the principled replacements.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_tumbling_counts(
    events: DataFrame, watermark: str = "1 hour", window_len: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.
    Batch twin: plans/events.tumbling_hourly (date_trunc buckets)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_session_values(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows (built-in session_window) per user; batch twin is
    the gaps-and-islands definition in plans/events.sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup within the watermark horizon — the
    streaming twin of operators/dedup.exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
