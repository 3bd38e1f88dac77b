"""Watermarked time-window aggregation over event streams.

The reference engine has no continuous-time semantics (SURVEY.md §2.8) —
this is the standard Structured Streaming skin a crawl pipeline needs
around the link-graph core: per-window event counts/sums with late-data
handling. One declarative plan serves both execution modes: on a streaming
DataFrame the watermark bounds state and drops rows later than the
threshold (append mode emits a window once the watermark passes its end);
on a batch DataFrame the same expression is a plain windowed group-by,
which is how the unit oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-(window, key) count and value sum.

    Returns (window_start, window_end, <key_col>, n, sum_value). Tumbling
    windows by default; pass ``slide`` for sliding windows. Streaming
    inputs get ``withWatermark`` so state is bounded and late rows (older
    than ``watermark`` behind the max seen event time) are discarded.
    """
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(ts_col, window, slide or window)
    return (
        df.groupBy(win.alias("win"), key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, session) aggregation with gap-based session windows.

    A session is a maximal run of a key's events where consecutive gaps are
    strictly below ``gap``; ``session_end`` is last event time + gap (Spark
    ``session_window`` semantics — a dynamic-length window, state merged
    incrementally). Returns (``key_col``, session_start, session_end, n,
    sum_value). Works identically on batch frames (the gaps-and-islands
    equivalent) and streams (watermark bounds the session state; a session
    emits once the watermark passes its end).
    """
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.session_window(ts_col, gap)
    return (
        df.groupBy(win.alias("win"), key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )
