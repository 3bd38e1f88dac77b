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


def graph_stats(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """One-row graph inspection summary (the numbers the reference prints
    per run, ``/root/reference/main.cxx:186-196``, as a queryable result):
    vertex/edge counts, self-loops, max out/in degree, average out degree
    over all vertices, and dead-end count (vertices with no out-edge —
    what the teleport correction pays for).

    Shape: two partial aggregations (by src, by dst) reduced to scalars
    plus scalar counts — every stage is a map-side-combinable hash-agg, no
    row explosion, safe at any scale.
    """
    n = vertices.count()
    od = out_degrees(edges).agg(
        F.max("deg").alias("max_out_degree"),
        F.count("*").alias("_n_src"),
        F.sum("deg").alias("_m"),
    )
    spark = edges.sparkSession
    row = od.collect()[0]
    in_row = in_degrees(edges).agg(F.max("deg").alias("mi")).collect()[0]
    m = int(row["_m"] or 0)
    n_src = int(row["_n_src"] or 0)
    self_loops = edges.filter(F.col("src") == F.col("dst")).count()
    return spark.createDataFrame(
        [(
            int(n), m, int(self_loops),
            int(row["max_out_degree"] or 0), int(in_row["mi"] or 0),
            round(m / n, 6) if n else 0.0,
            int(n - n_src),
        )],
        "n_vertices long, n_edges long, n_self_loops long, "
        "max_out_degree long, max_in_degree long, avg_out_degree double, "
        "n_dead_ends long",
    )
