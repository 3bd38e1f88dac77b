"""Reachability closure + Dynamic Traversal PageRank (T4 / P8 / B6).

The reference's Traversal strategy marks every vertex DFS-reachable from a
batch endpoint as affected (``dfsVisitedForEachW``,
``/root/reference/src/dfs.hxx:21-55``; ``pagerankBasicDynamicTraversal``,
``src/pagerankBasic.hxx:128-153``). Only the *visited set* matters, not the
visit order, so the Spark formulation is an iterative frontier-expansion
BFS closure over joins — each round is one broadcast semi-join against the
persisted edge table. The reference's own experiments exclude Traversal as
slower than Dynamic Frontier (README.md:19-21); provided for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.batch import batch_endpoints_frontier
from ..operators.graph import LinkGraph
from ..session import adaptive_execution
from .pagerank import PageRankOptions, PageRankResult, pagerank_dynamic_frontier


def reachable_set(graph: LinkGraph, sources: DataFrame,
                  max_depth: int = 1000) -> DataFrame:
    """All vertices reachable from ``sources`` (id,) following out-edges,
    sources included — the visited set of ``dfsVisitedForEachW``."""
    visited = sources.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    with adaptive_execution(graph.edges.sparkSession, False):
        for _ in range(max_depth):
            nxt = (
                graph.edges.join(F.broadcast(frontier),
                                 graph.edges.src == frontier.id, "left_semi")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    return visited


def pagerank_dynamic_traversal(
    graph_old: LinkGraph,
    graph_new: LinkGraph,
    batch: DataFrame,
    prev_ranks: DataFrame,
    opts: PageRankOptions | None = None,
) -> PageRankResult:
    """Dynamic Traversal re-rank: affected = reachability closure of the
    batch endpoints' out-neighborhoods (``pagerankBasicDynamicTraversal``,
    ``src/pagerankBasic.hxx:128-153``); then the frontier-restricted loop.
    The closure is a superset of any frontier Dynamic Frontier would grow,
    so no further expansion is needed — but reusing the frontier loop keeps
    the same convergence rule and costs nothing extra."""
    seeds = batch_endpoints_frontier(graph_old, graph_new, batch)
    closure = reachable_set(graph_new, seeds)
    return pagerank_dynamic_frontier(
        graph_old, graph_new, batch, prev_ranks, opts, frontier=closure
    )
