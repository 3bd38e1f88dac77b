"""Weighted single-source shortest paths — frontier-pruned distributed
Bellman-Ford over the edge table.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); this completes the distance shelf
next to :mod:`.distances` (hop-count BFS sketches): same long-format
``(id, source, dist)`` state, same frontier discipline, but edge weights
enter the relaxation, so the loop is Bellman-Ford rounds instead of BFS
levels.

Invariant (standard Bellman-Ford): after round t the state holds, for
every (vertex, source) pair, the exact minimum weight over all paths of
**at most t edges** — which is what the fixed-round SQL oracle checks,
and which converges to true shortest distances once t reaches the
longest shortest path's hop count.

Scale shape: state is long format — k sources cost k rows per reached
vertex, never a k-wide column. Each round relaxes ONLY the frontier
(pairs whose distance improved last round) through one join against the
src-partitioned edge table, takes the per-(dst, source) min map-side,
then left-joins current state to keep strict improvements —
O(frontier·outdeg) work per round, the textbook frontier Bellman-Ford.
All JVM-side DataFrame ops; no Python in the loop. ``eager_state``
truncates lineage per round (the Spark 4 self-join stats blowup fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def sssp(
    graph: LinkGraph,
    sources: DataFrame,
    weight: F.Column | str | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Shortest weighted distances from every vertex of ``sources`` (an
    ``id``-column DataFrame): returns ``(id, source, dist)`` with one row
    per reached (vertex, source) pair; ``dist = 0.0`` for the source
    itself; unreached pairs are absent (infinite distance).

    ``weight``: an expression/column name evaluated against the edge
    table (default: the graph's ``weight`` column if present, else 1.0
    per edge — which degenerates to hop-count BFS). Weights must be
    non-negative: Bellman-Ford tolerates negative edges but this loop
    stops when no distance improves, which on a negative cycle would
    never happen — ``max_rounds`` is the guard.

    ``max_rounds``: stop after t rounds → exact minimum over paths of
    ≤ t edges (the fixed-round form the DuckDB oracle mirrors). Default:
    run to the fixpoint (≤ |V|−1 rounds).
    """
    spark = graph.edges.sparkSession
    if weight is None:
        w = (F.col("weight").cast("double")
             if "weight" in graph.edges.columns else F.lit(1.0))
    elif isinstance(weight, str):
        w = F.col(weight).cast("double")
    else:
        w = weight.cast("double")
    edges = (graph.edges.withColumn("_w", w)
             .select("src", "dst", "_w")
             .filter(F.col("src") != F.col("dst")))

    state = sources.select(
        F.col("id"), F.col("id").alias("source"),
        F.lit(0.0).alias("dist")).localCheckpoint(eager=True)
    frontier = state
    t = 0
    limit = max_rounds if max_rounds is not None else graph.num_vertices - 1
    with adaptive_execution(spark, False):
        while t < limit:
            t += 1
            # relax the frontier; per-(dst, source) min is map-side
            # combinable, so a hub's fan-in never concentrates on one task
            cand = (
                frontier.join(edges, frontier.id == edges.src)
                .groupBy(F.col("dst").alias("id"), "source")
                .agg(F.min(frontier.dist + F.col("_w")).alias("dist"))
            )
            # keep strict improvements only
            prev = state.select(F.col("id").alias("_ki"),
                                F.col("source").alias("_ks"),
                                F.col("dist").alias("_kd"))
            improved = eager_state(
                cand.join(prev, (cand.id == F.col("_ki"))
                          & (cand.source == F.col("_ks")), "left")
                .filter(F.col("_kd").isNull() | (cand.dist < F.col("_kd")))
                .select("id", "source", "dist"))
            if improved.isEmpty():
                break
            # merge: min per pair of (old state, improvements)
            state = eager_state(
                state.unionByName(improved)
                .groupBy("id", "source").agg(F.min("dist").alias("dist")))
            frontier = improved
    return state


def derived_edge_weights(graph: LinkGraph) -> F.Column:
    """Deterministic synthetic weights for unweighted fixtures:
    ``1 + (src*7 + dst*3) mod 5`` — engine-portable (the DuckDB oracle
    recomputes the same affine form), strictly positive, hub-asymmetric
    enough to make weighted and hop-count shortest paths disagree."""
    return (F.lit(1) + (F.col("src") * 7 + F.col("dst") * 3) % 5).cast("double")
