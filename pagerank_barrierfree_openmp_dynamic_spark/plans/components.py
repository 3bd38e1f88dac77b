"""Connected components over the undirected view of the edge table.

Not present in the reference repo (BASELINE.json adds it as a standard
kernel over the same edge table). Algorithm: iterative minimum-label
propagation with POINTER JUMPING — every vertex's component id converges to
the smallest vertex id in its (weakly) connected component, so labels are
canonical and exactly comparable to a union-find oracle.

Each iteration does (1) the neighbor-min gather (same join+groupBy shuffle
shape as the PageRank scatter, reusing the persisted edge partitioning) and
(2) a shortcut step comp <- min(comp, comp[comp]) — the label mapping is
itself a forest pointing at smaller ids in the same component, so jumping
through it halves path lengths and convergence needs O(log diameter)
iterations instead of O(diameter) (the classic Shiloach-Vishkin /
large-star shortcut, standard in distributed CC). Lineage is truncated per
iteration with eager localCheckpoint; the loop stops when no label changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def connected_components(graph: LinkGraph, max_iterations: int = 200,
                         init_labels: DataFrame | None = None) -> DataFrame:
    """Returns (id, comp) with comp = min vertex id of the component.

    ``init_labels`` (id, comp) warm-starts the propagation — the
    INSERT-ONLY incremental path: after a batch of edge insertions, the
    old labels are still vertex ids inside each vertex's (now possibly
    merged) component, so min-label propagation from them converges to
    the new canonical labels, and only the merged regions actually
    propagate (everything else is converged at iteration 0 and the
    change-count early exit sees it). Vertices absent from
    ``init_labels`` (newly inserted) start at their own id. Labels must
    be vertex ids within the same component (any prior
    ``connected_components`` output qualifies); deletions invalidate
    this — recompute from scratch for delete batches.
    """
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    und = und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.dropDuplicates(["src", "dst"]).repartition(graph.partitions, "src")
    und = und.persist()
    und.count()

    spark = graph.edges.sparkSession
    if init_labels is not None:
        prev = init_labels.select(F.col("id").alias("pid"),
                                  F.col("comp").alias("pcomp"))
        labels = (
            graph.vertices.join(prev, graph.vertices.id == prev.pid, "left")
            .select("id", F.coalesce("pcomp", "id").alias("comp"))
        ).localCheckpoint(eager=True)
    else:
        labels = graph.vertices.select(
            "id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    with adaptive_execution(spark, False):
        for _ in range(max_iterations):
            nmin = (
                und.join(labels, und.src == labels.id)
                .groupBy("dst")
                .agg(F.min("comp").alias("ncomp"))
            )
            step = labels.join(nmin, labels.id == nmin.dst, "left").select(
                labels.id,
                F.col("comp").alias("old"),
                F.least(labels.comp, F.coalesce("ncomp", labels.comp)).alias("mid"),
            )
            # pointer jump: comp <- min(comp, comp[comp]). comp values are
            # vertex ids within the same component, so shortcutting through
            # the label mapping is safe and compresses paths exponentially.
            jump = step.select(F.col("id").alias("jid"), F.col("mid").alias("jcomp"))
            # ONE eager job per iteration: the checkpointed frame carries the
            # change flag, so the convergence count is a cached scan and the
            # next iteration's labels are a projection of the same data.
            # eager_state: labels sit on both sides (gather + pointer jump),
            # so bare localCheckpoint would compound size estimates
            # geometrically with the iteration count — harmless at the test
            # fixture's ~7 iterations, minutes-per-checkpoint by ~20 on a
            # larger-diameter graph (see session.eager_state)
            nxt = eager_state(
                step.join(jump, step.mid == jump.jid, "left")
                .select(
                    step.id,
                    F.least(step.mid, F.coalesce("jcomp", step.mid)).alias("comp"),
                    (F.least(step.mid, F.coalesce("jcomp", step.mid))
                     < F.col("old")).alias("chg"),
                )
            )
            changed = nxt.filter(F.col("chg")).count()
            labels = nxt.select("id", "comp")
            if changed == 0:
                break
    und.unpersist()
    return labels


def connected_components_dynamic(
    graph_new: LinkGraph,
    labels_old: DataFrame,
    batch: DataFrame,
    max_iterations: int = 200,
    use_arrow: bool = False,
) -> DataFrame:
    """Full dynamic CC after a delete+insert batch — the reference's
    batch-update protocol (``/root/reference/main.cxx:38-85``) applied to
    connected components, completing the insert-only warm start above with
    a deletion side.

    The two halves of the batch act in opposite directions and each has a
    cheap containment argument:

    - deletions can only SPLIT components that contain a deleted edge — so
      those components' labels are reset to own-id (everything else keeps
      its old canonical label, which is still a vertex id inside its
      component);
    - insertions can only MERGE components — which the warm-started
      min-label propagation on the NEW graph handles: unchanged regions are
      converged at iteration 0 and only reset/merged regions propagate
      (the change-count early exit sees everything else immediately).

    Iteration count is bounded by the affected regions' diameter (with
    pointer jumping, its log), not the graph's. Per-iteration cost is still
    one gather over the full edge table — the same shape as every other
    kernel superstep here, co-partitioned and exchange-free. Returns
    (id, comp) with canonical min-vertex-id labels, exactly equal to a
    from-scratch ``connected_components(graph_new)``.

    ``use_arrow=True`` runs the same warm start on the dense label kernel
    (measured 7 s — dense build included — vs 12-20 s join-agg at the
    sf0.1 bench; a pre-materialized dense view drops it to ~2 s) — the
    choice mirrors the PageRank story: dense while the label vector fits
    driver memory (N ≈ 1e9), join-agg as the fully-sharded fallback where
    iterations are what you pay for and the warm start localizes them to
    the batch-affected regions.
    """
    # Only deletions that actually REMOVE an undirected pair can split:
    # a del of an absent edge, of one orientation of a surviving reciprocal
    # pair, or of a pair the same batch re-inserts leaves connectivity
    # intact — check pair survival against the NEW graph (one broadcast
    # semi-join scan, no shuffle) before marking components affected.
    # A genuinely removed pair still resets its WHOLE component (whether it
    # was a bridge is not knowable without spanning-forest maintenance), so
    # on a giant-WCC web graph a real deletion degrades this warm start to
    # a full propagation over that component — the honest bound.
    dels = batch.filter(F.col("op") == "del").select("src", "dst")
    p = (
        dels.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    e_nl = graph_new.edges.filter(F.col("src") != F.col("dst"))
    surviving = (
        e_nl.join(
            F.broadcast(p),
            (F.least("src", "dst") == F.col("u"))
            & (F.greatest("src", "dst") == F.col("v")),
            "left_semi",
        )
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    gone = p.join(surviving, ["u", "v"], "left_anti")
    ends = gone.select(
        F.explode(F.array("u", "v")).alias("id")
    ).distinct()
    affected = (
        labels_old.join(ends, "id", "left_semi")
        .select("comp").distinct()
        .withColumn("affected", F.lit(True))
    )
    init = labels_old.join(F.broadcast(affected), "comp", "left").select(
        "id",
        F.when(F.col("affected"), F.col("id"))
        .otherwise(F.col("comp")).alias("comp"),
    )
    if use_arrow:
        return connected_components_arrow(
            graph_new, max_iterations=max_iterations, init_labels=init)
    return connected_components(graph_new, max_iterations=max_iterations,
                                init_labels=init)


def connected_components_arrow(
    graph: LinkGraph, *, dense=None, max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Dense Arrow-kernel connected components (same output as
    :func:`connected_components`): labels live in one driver-side int64
    vector, each superstep is ONE narrow job over the resident slice files
    (base slice = in-edges, reverse slice = out-edges of the same vertex
    residue class — see ``DenseGraph.materialize_reverse``), and the driver
    runs pointer jumping to a fixpoint between supersteps (labels point at
    smaller vertex indices of the same component, so ``lab[lab]`` chases are
    safe). Hash-min + full path compression converges in a handful of outer
    supersteps. ``dense_ids`` assigns dense indices in sorted-id order, so
    the min over indices is the min over original ids. The path while the
    label vector fits driver memory (N ≈ 1e9); beyond that, the join-based
    :func:`connected_components` is the fully-sharded fallback.

    ``init_labels`` (id, comp) warm-starts the propagation — same contract
    as the join-agg path: every label must be a vertex id within the
    vertex's component of THIS graph (any prior CC output after an
    insert-only batch qualifies; for delete batches reset affected
    components first — :func:`connected_components_dynamic` does). Vertices
    absent from ``init_labels`` start at their own id."""
    from .pagerank_arrow import DenseGraph, _cc_min_fn, dense_label_loop

    def jump(new: np.ndarray) -> np.ndarray:
        # driver-side pointer jumping to fixpoint (full path compression)
        while True:
            j = new[new]
            if np.array_equal(j, new):
                return new
            new = j

    store = None
    if checkpoint_dir is not None:
        from ..checkpoint import CheckpointStore

        store = CheckpointStore(checkpoint_dir)
    caller_dense = dense
    init = None
    if init_labels is not None:
        dense = dense or DenseGraph(graph)
        dense.materialize()
        pdf = init_labels.select("id", "comp").toPandas()
        ids = dense.ids
        pos_id = np.searchsorted(ids, pdf["id"].to_numpy())
        pos_comp = np.searchsorted(ids, pdf["comp"].to_numpy())
        if (pos_id >= len(ids)).any() or (ids[pos_id] != pdf["id"]).any():
            raise ValueError("init_labels contains ids not in the graph")
        if (pos_comp >= len(ids)).any() or (ids[pos_comp] != pdf["comp"]).any():
            raise ValueError("init_labels comp values must be vertex ids")
        init = np.arange(dense.n, dtype=np.int64)
        init[pos_id] = pos_comp
    dg, lab = dense_label_loop(
        graph, dense,
        lambda dg, lab_bc: _cc_min_fn(dg.resident_dir, dg.epoch,
                                      dg.n_slices, lab_bc),
        post=jump, max_iterations=max_iterations,
        store=store, mode="cc-arrow", init=init,
    )
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame({"id": dg.ids, "comp": dg.ids[lab]}))
    if caller_dense is None:
        # own the dense view if the CALLER didn't pass one (the init_labels
        # branch may have built it above — that one is ours to clean up;
        # `out` is driver-side pandas, independent of the slice files)
        dg.unpersist()
    return out


def resume_connected_components_arrow(
    graph: LinkGraph, checkpoint_dir: str, *, dense=None,
    max_iterations: int = 200,
) -> DataFrame:
    """Continue :func:`connected_components_arrow` from its latest committed
    superstep (north rule: runs resume mid-convergence). The label state is
    deterministic, so resumed output is identical to an uninterrupted run;
    further supersteps keep appending to the same checkpoint directory with
    the original run_id."""
    from ..checkpoint import CheckpointStore
    from .pagerank_arrow import _cc_min_fn, dense_label_loop, load_label_checkpoint

    store = CheckpointStore(checkpoint_dir)
    dg, init, it, run_id = load_label_checkpoint(graph, dense, store,
                                                 expect_mode="cc-arrow")

    def jump(new: np.ndarray) -> np.ndarray:
        while True:
            j = new[new]
            if np.array_equal(j, new):
                return new
            new = j

    dg, lab = dense_label_loop(
        graph, dg,
        lambda dg, lab_bc: _cc_min_fn(dg.resident_dir, dg.epoch,
                                      dg.n_slices, lab_bc),
        post=jump, max_iterations=max(0, max_iterations - it),
        store=store, mode="cc-arrow", init=init, start_iter=it,
        run_id=run_id,
    )
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame({"id": dg.ids, "comp": dg.ids[lab]}))
    if dense is None:
        dg.unpersist()
    return out
