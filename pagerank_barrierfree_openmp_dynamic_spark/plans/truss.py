"""k-truss decomposition over the undirected view of the edge table.

Not in the reference repo (PageRank-only, ``/root/reference/src/
pagerank.hxx``); the k-truss — the maximal subgraph where every edge
sits in ≥ k−2 triangles — is the standard edge-level cohesion kernel
next to k-core (``plans/kcore.py``), the community-core detector used
on web/social graphs (Cohen 2008).

Algorithm: distributed support peeling. Each round (1) counts per-edge
triangle support with the same degree-orientation + path-join shape as
``plans/triangles.py`` (hub vertices only *receive* oriented edges, so
the wedge fan-out is degree-bounded), (2) drops edges with support
< k−2, (3) repeats until no edge drops. Every round is triangles + one
aggregation + one join — no per-row Python anywhere; lineage is
truncated per round with an eager localCheckpoint (the same iterative
hygiene as the label kernels; see memory on Spark 4 stats blowup).

:func:`ktruss_peel` exposes ONE fixed number of peel rounds — a
deterministic, SQL-unrollable operator (the driver oracle) whose
fixpoint :func:`ktruss` is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution


def _und(graph: LinkGraph) -> DataFrame:
    """Canonical undirected edge set: (u < v), self-loops dropped."""
    return (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def _support(und: DataFrame) -> DataFrame:
    """(u, v, support): per-edge triangle count within ``und`` (canonical
    pairs). Degree orientation bounds the wedge join; each triangle
    contributes one support unit to each of its three canonical edges."""
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        und.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")),
                 "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")),
              "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"], "left_semi")
    sides = tri.select(
        F.explode(F.array(
            F.struct(F.least("x", "y").alias("u"),
                     F.greatest("x", "y").alias("v")),
            F.struct(F.least("x", "z").alias("u"),
                     F.greatest("x", "z").alias("v")),
            F.struct(F.least("y", "z").alias("u"),
                     F.greatest("y", "z").alias("v")),
        )).alias("e")
    ).select("e.u", "e.v")
    sup = sides.groupBy("u", "v").agg(F.count("*").alias("support"))
    return und.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).alias("support"))


def ktruss_peel(graph: LinkGraph, k: int, rounds: int) -> DataFrame:
    """Exactly ``rounds`` support-filter sweeps: keep edges whose triangle
    support within the CURRENT survivor set is ≥ k−2. Deterministic for a
    fixed round count (the driver-oracle form); :func:`ktruss` iterates
    this to its fixpoint."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is the whole graph)")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = graph.edges.sparkSession
    und = _und(graph)
    with adaptive_execution(spark, False):
        for _ in range(rounds):
            und = (
                _support(und)
                .filter(F.col("support") >= k - 2)
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
    return und


def ktruss(graph: LinkGraph, k: int, max_rounds: int = 1000) -> DataFrame:
    """The k-truss edge set: peel until no edge drops. Returns the
    surviving canonical (u, v) pairs (possibly empty)."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k=2 is the whole graph)")
    spark = graph.edges.sparkSession
    und = _und(graph).localCheckpoint(eager=True)
    n = und.count()
    with adaptive_execution(spark, False):
        for _ in range(max_rounds):
            if n == 0:
                break
            und = (
                _support(und)
                .filter(F.col("support") >= k - 2)
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            m = und.count()
            if m == n:
                break
            n = m
    return und
