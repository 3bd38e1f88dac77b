"""Dynamic edge-batch application — the engine's DML.

Mirrors the reference's staged add/remove + ``updateOmpU`` commit
(``/root/reference/src/Graph.hxx:344-379``, ``src/update.hxx:70-99``):
insertions are union+dedup, deletions are an anti-join, and the commit is
the re-partition/re-sort/persist performed by :func:`...graph.build_graph`.
Graphs are immutable snapshots (DataFrame lineage replaces ``duplicate()``,
``/root/reference/src/duplicate.hxx:10-24``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import LinkGraph, build_graph


def apply_batch(
    graph: LinkGraph,
    batch: DataFrame,
    partitions: int | None = None,
) -> LinkGraph:
    """Apply a (src, dst, op['ins'|'del']) batch; return the updated graph.

    Deletions are applied first, then insertions (the reference's protocol
    deletes a random batch then re-inserts it, ``main.cxx:38-66``). Vertex
    set is preserved (vertices never vanish — ``vexists`` model); self-loops
    are re-asserted by the rebuild, mirroring ``main.cxx:84-85`` re-running
    ``selfLoopOmpU`` after each batch.
    """
    dels = batch.filter(F.col("op") == "del").select("src", "dst")
    ins = batch.filter(F.col("op") == "ins").select("src", "dst")

    base = graph.edges
    if graph.self_loops:
        # Never delete the normalization self-loops.
        dels = dels.filter(F.col("src") != F.col("dst"))
    new_edges = (
        base.join(dels, ["src", "dst"], "left_anti")
        .unionByName(ins.select(F.col("src").cast("long"), F.col("dst").cast("long")))
    )
    return build_graph(
        new_edges,
        vertices=graph.vertices,
        add_self_loops=graph.self_loops,
        partitions=partitions or graph.partitions,
    )


def batch_endpoints_frontier(
    graph_old: LinkGraph, graph_new: LinkGraph, batch: DataFrame
) -> DataFrame:
    """Seed affected set for Dynamic Frontier: the out-neighbors of every
    deletion source in the OLD graph and of every insertion source in the
    NEW graph (``pagerankAffectedFrontierW``,
    ``/root/reference/src/pagerank.hxx:367-410``). Returns (id,) distinct.

    The batch is tiny relative to the graph — broadcast it into the edge
    join so no edge shuffle happens.
    """
    del_src = batch.filter(F.col("op") == "del").select("src").distinct()
    ins_src = batch.filter(F.col("op") == "ins").select("src").distinct()
    aff_del = graph_old.edges.join(
        F.broadcast(del_src), "src", "left_semi"
    ).select(F.col("dst").alias("id"))
    aff_ins = graph_new.edges.join(
        F.broadcast(ins_src), "src", "left_semi"
    ).select(F.col("dst").alias("id"))
    return aff_del.unionByName(aff_ins).distinct()
