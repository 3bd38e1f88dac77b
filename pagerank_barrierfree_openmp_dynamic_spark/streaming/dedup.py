"""Streaming exact deduplication of documents.

The batch pipeline dedups with a hash-groupBy (``functions/dedup.py``,
deterministic min-id representative). On a continuous ingest stream that
shape needs unbounded "seen hashes" state; the standard web-pipeline
compromise is time-bounded exactness: two copies of a document arriving
within the watermark horizon dedup exactly, copies farther apart than the
horizon may both survive (and are caught by the periodic batch dedup).

Spark-native: ``dropDuplicatesWithinWatermark`` keeps per-key state only
until the event-time watermark passes the first-seen timestamp + delay —
O(distinct keys per horizon) state, hash-partitioned by the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival exact dedup of a document stream by content hash.

    Emits each distinct ``md5(text_col)`` once per watermark horizon (the
    first arrival wins; duplicates whose event time is within ``watermark``
    of the first copy are dropped, state for older hashes is evicted).
    On a batch DataFrame the same expression degrades to a plain
    ``dropDuplicates`` on the hash — the all-time-exact semantics, since a
    batch has no horizon.
    """
    hashed = docs.withColumn("_h", F.md5(F.col(text_col)))
    if hashed.isStreaming:
        out = (
            hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_h"])
        )
    else:
        out = hashed.dropDuplicates(["_h"])
    return out.drop("_h")
