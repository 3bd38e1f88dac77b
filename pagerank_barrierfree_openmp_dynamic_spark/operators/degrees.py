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

    Shape: ONE pass over the edge table — per-endpoint degree partials via
    an explode into (vertex, is_src) pairs, two chained map-side-combinable
    hash-aggs reduced to a single scalar row — plus one vertex count. No
    row explosion beyond 2×|E| pre-combine, safe at any scale.
    """
    n = vertices.count()
    per_vertex = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("v"), F.lit(1).alias("is_src")),
                    F.struct(F.col("dst").alias("v"), F.lit(0).alias("is_src")),
                )
            ).alias("e"),
            (F.col("src") == F.col("dst")).cast("long").alias("loop"),
        )
        .groupBy(F.col("e.v").alias("v"))
        .agg(
            F.sum("e.is_src").alias("od"),
            F.sum(1 - F.col("e.is_src")).alias("id_"),
            # each self-loop contributes its loop flag twice (src+dst row)
            (F.sum(F.col("e.is_src") * F.col("loop"))).alias("loops"),
        )
    )
    row = per_vertex.agg(
        F.max("od").alias("mo"),
        F.max("id_").alias("mi"),
        F.sum("od").alias("m"),
        F.sum("loops").alias("sl"),
        F.sum((F.col("od") > 0).cast("long")).alias("n_src"),
    ).collect()[0]
    m = int(row["m"] or 0)
    return edges.sparkSession.createDataFrame(
        [(
            int(n), m, int(row["sl"] or 0),
            int(row["mo"] or 0), int(row["mi"] or 0),
            round(m / n, 6) if n else 0.0,
            int(n - int(row["n_src"] or 0)),
        )],
        "n_vertices long, n_edges long, n_self_loops long, "
        "max_out_degree long, max_in_degree long, avg_out_degree double, "
        "n_dead_ends long",
    )


def degree_histogram(edges: DataFrame, vertices: DataFrame,
                     direction: str = "out") -> DataFrame:
    """(deg, n_vertices) distribution including the zero-degree bucket —
    the power-law profile every link-graph analysis starts with. Two
    map-side-combinable aggregates; degree-0 vertices come from one
    anti-join against the endpoint set, so nothing is ever widened to
    per-vertex rows beyond the first groupBy."""
    if direction not in ("out", "in"):
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    key = "src" if direction == "out" else "dst"
    per_v = edges.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("deg"))
    n_zero = vertices.join(per_v, "id", "left_anti").count()
    hist = per_v.groupBy("deg").agg(F.count("*").alias("n_vertices"))
    if n_zero:
        zero = edges.sparkSession.createDataFrame(
            [(0, n_zero)], "deg long, n_vertices long")
        hist = hist.unionByName(zero)
    return hist


def powerlaw_alpha(edges: DataFrame, dmin: int = 2,
                   direction: str = "out") -> DataFrame:
    """Discrete power-law exponent MLE for the degree tail (Clauset,
    Shalizi & Newman 2009, eq. 3.7 continuous approximation):
    ``alpha = 1 + n_tail / sum(ln(deg / (dmin - 0.5)))`` over vertices
    with degree >= dmin. One row: (direction, dmin, n_tail, alpha).

    One map-side-combinable aggregation over the per-vertex degree table —
    a scalar diagnostic at any scale. The web-graph sanity check: crawls
    typically land in alpha ~ 2.1 (in-degree); a wildly different value on
    an extracted edge table flags an extraction bug before any kernel runs.
    """
    if direction not in ("out", "in"):
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    key = "src" if direction == "out" else "dst"
    per_v = edges.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("deg"))
    tail = per_v.filter(F.col("deg") >= dmin)
    row = tail.agg(
        F.count("*").alias("n"),
        F.sum(F.log(F.col("deg") / (dmin - 0.5))).alias("s"),
    ).collect()[0]
    n, s = int(row["n"] or 0), float(row["s"] or 0.0)
    alpha = round(1.0 + n / s, 6) if s > 0 else None
    return edges.sparkSession.createDataFrame(
        [(direction, dmin, n, alpha)],
        "direction string, dmin long, n_tail long, alpha double")
