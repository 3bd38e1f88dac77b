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
from ..session import adaptive_execution


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
    ins = batch.filter(F.col("op") == "ins")
    if graph.weighted:
        # Weighted graphs: an inserted edge carries batch.weight (default
        # 1.0); inserting an already-present edge merges additively, the
        # same parallel-edge rule as build_graph.
        w = (F.col("weight").cast("double") if "weight" in ins.columns
             else F.lit(1.0))
        ins = ins.select(F.col("src").cast("long"), F.col("dst").cast("long"),
                         w.alias("weight"))
    else:
        ins = ins.select(F.col("src").cast("long"), F.col("dst").cast("long"))

    base = graph.edges
    if graph.self_loops:
        # Never delete the normalization self-loops.
        dels = dels.filter(F.col("src") != F.col("dst"))
    new_edges = base.join(dels, ["src", "dst"], "left_anti").unionByName(ins)
    return build_graph(
        new_edges,
        vertices=graph.vertices,
        add_self_loops=graph.self_loops,
        partitions=partitions or graph.partitions,
        weight_col="weight" if graph.weighted else None,
    )


def apply_batch_dense(graph: LinkGraph, dense, batch: DataFrame):
    """O(batch) dynamic update for the Arrow dense kernel: compute the NET
    edge changes against the current edge set with broadcast semi/anti
    joins, then overlay them as a delta generation on the resident slice
    files (``DenseGraph.apply_delta``) — no graph rebuild, no re-shuffle.

    Returns ``(new_graph, new_dense)``: a lightweight LinkGraph whose
    ``edges`` DataFrame reflects the update lazily (for frontier seeding /
    DataFrame consumers) and the delta-overlay DenseGraph view.

    Constraints: batch endpoints must be existing vertices (dense id space
    is fixed — a batch introducing new pages goes through the full
    ``apply_batch`` rebuild), and normalization self-loops are protected
    from deletion, mirroring ``apply_batch``.
    """
    import numpy as np

    from ..plans.pagerank_arrow import DenseGraph  # noqa: F401  (type only)

    if graph.weighted:
        raise ValueError(
            "apply_batch_dense supports unweighted graphs (weighted deltas "
            "re-scale sibling edges); use apply_batch (rebuild) instead")

    dels = batch.filter(F.col("op") == "del").select("src", "dst")
    ins = batch.filter(F.col("op") == "ins").select("src", "dst")
    if graph.self_loops:
        dels = dels.filter(F.col("src") != F.col("dst"))

    # E' = (E \ D) ∪ I, so the net overlay against E is
    #   net-delete = (D ∩ E) \ I   (deleted and not re-inserted)
    #   net-insert = I \ E         (inserted and not already present —
    #                               delete-then-reinsert is net ZERO, the
    #                               reference's standard batch protocol,
    #                               main.cxx:38-66)
    # Fixed-shape broadcast joins against the persisted edge table — same
    # known-sizes argument as the superstep loops, so AQE off while we
    # materialize the (tiny) net-change sets.
    d_in_e = dels.join(graph.edges, ["src", "dst"], "left_semi")
    net_del_df = d_in_e.join(ins, ["src", "dst"], "left_anti").distinct()
    net_ins_df = ins.join(graph.edges, ["src", "dst"], "left_anti").distinct()

    def to_idx(df: DataFrame) -> np.ndarray:
        pdf = df.toPandas()
        if len(pdf) == 0:
            return np.empty((0, 2), dtype=np.int64)
        ids = dense.ids
        out = np.empty((len(pdf), 2), dtype=np.int64)
        for j, col in enumerate(("src", "dst")):
            vals = pdf[col].to_numpy()
            i = np.searchsorted(ids, vals)
            bad = (i >= len(ids)) | (ids[np.minimum(i, len(ids) - 1)] != vals)
            if bad.any():
                raise ValueError(
                    "apply_batch_dense: batch references vertices outside the "
                    "dense id space; use apply_batch (full rebuild) instead")
            out[:, j] = i
        return out

    with adaptive_execution(graph.edges.sparkSession, False):
        net_ins = to_idx(net_ins_df)
        net_del = to_idx(net_del_df)
    new_dense = dense.apply_delta(net_ins, net_del)

    new_edges = (
        graph.edges.join(F.broadcast(net_del_df), ["src", "dst"], "left_anti")
        .unionByName(net_ins_df)
    )
    new_graph = LinkGraph(
        edges=new_edges,
        vertices=graph.vertices,
        adj=None,  # not materialized for the light view; rebuild if needed
        num_vertices=graph.num_vertices,
        num_edges=graph.num_edges + len(net_ins) - len(net_del),
        partitions=graph.partitions,
        self_loops=graph.self_loops,
    )
    new_dense.graph = new_graph
    return new_graph, new_dense


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
