"""As-of (point-in-time) join — the time-series companion operator.

Matches every left row to the most recent right row with the same keys at
or before the left row's timestamp (``direction='backward'``, inclusive —
the classic "purchase joined to the click that preceded it" /
market-data-lookup semantics, what DuckDB spells ``ASOF JOIN`` and pandas
``merge_asof``). Spark has no built-in; the naive SQL formulation is a
range join that Catalyst executes as a per-key cartesian product.

Implementation is the canonical Spark shape instead: UNION the two sides
with a tag column, then one window pass per key ordered by
``(ts, tag)`` carrying ``last(right_value, ignorenulls=True)`` forward —
right rows sort BEFORE left rows at equal timestamps, which is exactly
the inclusive-backward semantics.

Scale shape (the 100-TB story): ONE shuffle total (the window's hash
partition by key) over left+right concatenated, then a linear
partition-local sort+scan — no join explosion, no range-join quadratic
blowup, skew bounded by the hottest key exactly like any keyed window.

Right-side rows must be unique per (keys, ts): with duplicates the
carried value would depend on intra-timestamp sort order. Pre-aggregate
the right side (the driver query keeps ``max(event_id)`` per instant).

Reference tie-in: no analogue in the reference repo (graph kernels only);
added as part of the relational shelf over the events table
(SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts_col: str = "ts",
              value_cols: tuple[str, ...] = ("value",),
              prefix: str = "asof_",
              tolerance_seconds: float | None = None) -> DataFrame:
    """left.* plus ``prefix+ts_col`` and ``prefix+c`` for each value col —
    NULL where no right row precedes the left row (left-outer semantics).

    ``tolerance_seconds`` optionally voids matches older than the given
    horizon (both the matched timestamp and its carried values go NULL),
    mirroring ``pandas.merge_asof(tolerance=...)``.
    """
    lcols = left.columns
    reserved = {"_rts", "_tag"} | {f"_rv_{c}" for c in value_cols}
    clash = reserved & set(lcols)
    if clash:
        raise ValueError(f"left columns collide with asof_join "
                         f"internals: {sorted(clash)}")
    tagged = left.select(
        *lcols,
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols],
        F.lit(1).alias("_tag"),
    ).unionByName(
        right.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              if c not in on and c != ts_col else F.col(c)
              for c in lcols],
            F.col(ts_col).alias("_rts"),
            *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
            F.lit(0).alias("_tag"),
        )
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        *lcols, "_tag",
        F.last("_rts", ignorenulls=True).over(w).alias(f"{prefix}{ts_col}"),
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
          for c in value_cols],
    ).filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_seconds is not None:
        ok = (
            F.col(ts_col).cast("double")
            - F.col(f"{prefix}{ts_col}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.select(
            *lcols,
            F.when(ok, F.col(f"{prefix}{ts_col}")).alias(f"{prefix}{ts_col}"),
            *[F.when(ok, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
              for c in value_cols],
        )
    return carried
