"""Triangle counting over the undirected view of the edge table.

Not in the reference repo (BASELINE.json adds it). Algorithm: degree
orientation + path join — the standard shuffle-efficient formulation:

1. canonicalize edges to undirected distinct pairs (self-loops dropped);
2. orient each edge from the endpoint with smaller (degree, id) to the
   larger — every triangle is counted exactly once, and the join fan-out is
   bounded because hub vertices only *receive* oriented edges;
3. wedges = oriented ⋈ oriented on the middle vertex; triangles = wedges
   semi-joined against the oriented edge set.

Exact counts; verified against a brute-force set-intersection oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph


def _oriented(graph: LinkGraph) -> DataFrame:
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def triangles(graph: LinkGraph) -> DataFrame:
    """All triangles as (x, y, z) vertex triples (each exactly once)."""
    o = _oriented(graph).persist()
    o.count()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    e3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(e3, ["x", "z"], "left_semi").select("x", "y", "z")
    return tri


def triangle_count(graph: LinkGraph) -> int:
    return triangles(graph).count()


def triangles_per_vertex(graph: LinkGraph) -> DataFrame:
    """(id, tri_count) — number of triangles each vertex participates in;
    vertices in no triangle get 0."""
    t = triangles(graph)
    parts = (
        t.select(F.col("x").alias("id"))
        .unionByName(t.select(F.col("y").alias("id")))
        .unionByName(t.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri_count"))
    )
    return graph.vertices.join(parts, "id", "left").select(
        "id", F.coalesce("tri_count", F.lit(0)).alias("tri_count")
    )
