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


def run_attribution_stream(
    spark,
    events: DataFrame,
    *,
    cut: str,
    horizon: str = "4 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive :func:`interval_attribution` as a LIVE 2-batch file stream and
    return the collected append-mode output (localCheckpointed — the temp
    event/checkpoint dirs are removed before returning, success or failure).

    ``events`` carries (event_id, ts, user_id, event_type) with types
    'click' and 'purchase'; ``cut`` is the event-time split point. The split
    is on event time, so no row is late across batches, and the two files'
    mtimes are pinned a minute apart: both parquet writes can land within
    the file source's millisecond mtime granularity, and an mtime tie lets
    Spark process the late file first — advancing the watermark past every
    early-file row and silently dropping them from the join.
    """
    import os
    import shutil
    import tempfile
    import time
    import uuid

    d = tempfile.mkdtemp(prefix="attr_events_")
    ckpt = tempfile.mkdtemp(prefix="attr_events_ckpt_")
    try:
        now = time.time()
        for i, pred in enumerate([F.col("ts") < cut, F.col("ts") >= cut]):
            path = f"{d}/b{i}.parquet"
            # pandas defaults to nanosecond timestamps, which Spark's
            # vectorized parquet reader rejects — coerce to micros
            events.filter(pred).toPandas().to_parquet(
                path, coerce_timestamps="us",
                allow_truncated_timestamps=True)
            os.utime(path, (now + 60 * i, now + 60 * i))
        stream = (
            spark.readStream
            .schema("event_id long, ts timestamp, user_id long, "
                    "event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = interval_attribution(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
            horizon=horizon, watermark=watermark,
        )
        name = "attr_" + uuid.uuid4().hex[:8]
        query = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        # memory-sink rows live in driver memory; localCheckpoint pins them
        # so the temp dirs can go
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
