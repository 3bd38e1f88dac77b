"""Watermarked stream-stream interval join — event attribution.

The reference engine has no continuous-time semantics (SURVEY.md §2.8);
this is the remaining first-class Structured Streaming surface a crawl /
clickstream pipeline needs beyond windows, sessions, dedup and custom
state: joining two live event streams on key + event-time range (every
click by the same user within a horizon before each purchase).

One declarative plan serves both execution modes. On streaming inputs the
event-time range condition plus the per-side watermarks let Spark bound
the join state: a buffered click is dropped once the purchase-side
watermark passes ``click_ts + horizon``, so state is O(events inside the
horizon + watermark window), never O(stream). On batch DataFrames the
watermark is a no-op and the same expression is a plain range join — which
is exactly how the unit test and the DuckDB oracle pin the semantics: the
streamed result (time-ordered files, append mode) must equal the batch
join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """All (purchase, click) pairs with the same ``user_id`` where the click
    happened in ``[purchase_ts - horizon, purchase_ts]``.

    Inputs carry (event_id, ts, user_id); returns
    (purchase_id, click_id, user_id, lag_us) with ``lag_us`` the exact
    microsecond gap — integer, so the comparison against the SQL oracle is
    exact rather than float-noisy.

    This is the all-matches interval join; the latest-click-only variant is
    the batch as-of join (``operators/asof.py``).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts")
           >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .alias("lag_us"),
    )
