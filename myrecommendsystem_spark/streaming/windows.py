"""Event-time windows, watermarks, dedup — engine extensions.

The reference's DStream job has none of these (SURVEY.md §2.9 "absent"
list): no event-time semantics, no late-data handling, no exactly-once
dedup.  Structured Streaming gives them nearly free; each helper here works
identically on batch and streaming DataFrames (``withWatermark`` is a no-op
in batch), so the batch twins are oracle-checkable
(``plans.streaming_queries.events_tumbling_hourly``) while the streaming
behavior is exercised in tests with file sources + availableNow triggers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.functions.compat import round_stable


def tumbling_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Per-tumbling-window event count + mean value, watermarked.

    Late rows beyond ``watermark`` are dropped in streaming mode; in batch
    mode the watermark is a no-op and the result equals a plain
    group-by-time-bucket.  Output: (window_start, window_end, cnt,
    avg_value).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            round_stable(F.avg(value_col), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
            "avg_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each row lands in window/slide buckets)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
        )
    )


def session_event_stats(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: events of a key merge while gaps stay < ``gap``.

    ``session_window`` sessions are half-open — an event exactly ``gap``
    after the previous one opens a NEW session (the batch oracle's
    gaps-and-islands SQL uses the same strict inequality).  Output:
    (key, session_start, session_end, cnt, avg_value).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            round_stable(F.avg(value_col), 4).alias("avg_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "avg_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key dedup bounded by the watermark horizon.

    Streaming state stays O(keys within the watermark window) instead of
    growing forever — the scale-safe form of ``dropDuplicates``.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
