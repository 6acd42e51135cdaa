"""Event-time windowing on streams: tumbling windows (P9's streaming
twin) and session windows (X4's streaming twin). Each must produce
byte-identical results to its batch counterpart when run with
``availableNow`` over the same data — quiescence ≙ batch semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.functions.money import cents


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour counts/sums per event type over a streaming
    events frame: (w, event_type, n, total_cents).

    Uses window() + watermark (state eviction at scale); the window
    start equals batch date_trunc('hour'). Complete-mode output when
    memory-sinked; append works with the watermark on a real sink."""
    w = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("total_cents"),
        )
    )
    return w.select(F.col("window.start").alias("w"), "event_type", "n", "total_cents")


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in
    exactly two overlapping windows. (w, event_type, n)."""
    w = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return w.select(F.col("window.start").alias("w"), "event_type", "n")


def session_windows_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows via session_window (30-minute gap):
    one row per (session, user) with its event count. Sessions merge
    while consecutive events are < gap apart — the streaming-native
    form of X4's lag() rule.

    Only ONE stateful aggregation is allowed per streaming query, so
    the per-user session count is a batch aggregation on the sunk
    result (see plans.extensions.s4_session_stream)."""
    sess = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sess.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
    )
