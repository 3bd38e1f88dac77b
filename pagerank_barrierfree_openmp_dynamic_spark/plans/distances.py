"""Landmark distance sketches — multi-source BFS from a pivot set, the
standard building block for approximate shortest-path / distance-oracle
queries on web graphs (d(u,v) ≲ min_l d(u,l) + d(l,v)).

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); the traversal shape is the same
frontier expansion as ``plans/traversal.reachable_set`` generalized to
(a) many sources at once and (b) hop counts instead of a membership flag.

Scale shape: the state is LONG FORMAT ``(id, landmark, dist)`` — k
landmarks cost k state rows per reached vertex, never a k-wide dense
column, so landmark count and vertex count scale independently. Each
round expands only the previous round's FRONTIER (rows discovered last
round) through one join against the src-partitioned edge table, then
anti-joins known state — O(frontier·outdeg) work per round, the BFS
optimum. All JVM-side DataFrame ops; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def top_degree_landmarks(graph: LinkGraph, k: int) -> DataFrame:
    """Deterministic pivot choice: the k highest out-degree vertices
    (ties broken by smaller id) — high-coverage sources for forward
    distance sketches."""
    deg = graph.edges.groupBy("src").agg(F.count("*").alias("_d"))
    return (
        deg.orderBy(F.desc("_d"), F.asc("src")).limit(k)
        .select(F.col("src").alias("id"))
    )


def landmark_distances(
    graph: LinkGraph,
    landmarks: DataFrame | int,
    max_t: int | None = None,
    direction: str = "forward",
) -> DataFrame:
    """BFS hop distances from every landmark: ``(id, landmark, dist)``
    with one row per (reached vertex, landmark) pair, ``dist = 0`` for
    the landmark itself. ``landmarks`` is a DataFrame with an ``id``
    column or an int k (→ :func:`top_degree_landmarks`).
    ``direction="forward"`` follows edges (d(l, v));
    ``"backward"`` runs over reversed edges (d(v, l) — what a
    distance-oracle upper bound d(u,v) <= d(u,l)+d(l,v) needs on the
    query side). Unreached pairs are absent (infinite distance)."""
    if direction not in ("forward", "backward"):
        raise ValueError(
            f"direction must be 'forward' or 'backward', got {direction!r}")
    spark = graph.edges.sparkSession
    if isinstance(landmarks, int):
        landmarks = top_degree_landmarks(graph, landmarks)
    if direction == "forward":
        edges = graph.edges.select("src", "dst")
    else:
        edges = graph.edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))
    edges = edges.filter(F.col("src") != F.col("dst"))

    state = landmarks.select(
        F.col("id"), F.col("id").alias("landmark"),
        F.lit(0).alias("dist")).localCheckpoint(eager=True)
    frontier = state
    t, limit = 0, max_t if max_t is not None else graph.num_vertices
    with adaptive_execution(spark, False):
        while t < limit:
            t += 1
            reached = (
                frontier.join(edges, frontier.id == edges.src)
                .select(F.col("dst").alias("id"), "landmark",
                        F.lit(t).alias("dist"))
                .dropDuplicates(["id", "landmark"])
            )
            frontier = eager_state(
                reached.join(state.select(F.col("id").alias("_ki"),
                                          F.col("landmark").alias("_kl")),
                             (reached.id == F.col("_ki"))
                             & (reached.landmark == F.col("_kl")),
                             "left_anti"))
            if frontier.isEmpty():
                break
            state = eager_state(state.unionByName(frontier))
    return state


def diameter_lower_bound(
    graph: LinkGraph,
    k: int = 4,
    max_t: int | None = None,
) -> int:
    """Classic multi-sweep diameter LOWER bound: the largest finite hop
    distance observed by BFS from k top-degree landmarks (forward
    sweeps). Exact on any graph whose true eccentricity is realized from
    a landmark; always ≤ the true directed diameter. One scalar
    aggregation over :func:`landmark_distances`."""
    d = landmark_distances(graph, k, max_t=max_t)
    row = d.agg(F.max("dist")).collect()[0][0]
    return int(row or 0)
