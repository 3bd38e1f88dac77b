"""Rank-vector norms (``/root/reference/src/_vector.hxx:250-461``).

Each is a single partial+final aggregation over the join of two
(id, rank) DataFrames — the Spark analogue of the OpenMP
``reduction(+:a)`` / ``reduction(max:a)`` two-phase reductions.
L2 is intentionally *not* rooted, matching ``l2Norm`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _joined(a: DataFrame, b: DataFrame, col: str = "rank") -> DataFrame:
    left = a.select(F.col("id"), F.col(col).alias("_x"))
    right = b.select(F.col("id"), F.col(col).alias("_y"))
    return left.join(right, "id", "full").select(
        (F.coalesce("_x", F.lit(0.0)) - F.coalesce("_y", F.lit(0.0))).alias("_d")
    )


def l1_norm(a: DataFrame, b: DataFrame, col: str = "rank") -> float:
    return _joined(a, b, col).agg(F.sum(F.abs("_d"))).collect()[0][0] or 0.0


def l2_norm(a: DataFrame, b: DataFrame, col: str = "rank") -> float:
    return _joined(a, b, col).agg(F.sum(F.col("_d") * F.col("_d"))).collect()[0][0] or 0.0


def li_norm(a: DataFrame, b: DataFrame, col: str = "rank") -> float:
    """L∞ — the reference's rank-comparison metric (``main.cxx:198``) and the
    1e-6 allclose criterion."""
    return _joined(a, b, col).agg(F.max(F.abs("_d"))).collect()[0][0] or 0.0
