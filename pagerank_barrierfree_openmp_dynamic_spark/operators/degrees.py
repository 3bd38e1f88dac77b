"""Degree queries and top-k convenience operators
(``/root/reference/src/Graph.hxx:181-198``; top-k is a query convenience
noted in SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").alias("deg"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("dst").agg(F.count("*").alias("deg"))


def top_k(df: DataFrame, col: str, k: int, key: str = "id") -> DataFrame:
    """Deterministic top-k: order by value desc, key asc as tie-break.
    Spark executes this as a TakeOrderedAndProject — per-partition heaps,
    no global sort."""
    return df.orderBy(F.col(col).desc(), F.col(key).asc()).limit(k)
