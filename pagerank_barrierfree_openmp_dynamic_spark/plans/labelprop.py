"""Synchronous label propagation (community detection) over the undirected
edge view. Not in the reference repo (BASELINE.json adds it).

Determinism (SURVEY.md §7 hard part e): synchronous updates with a total
tie-break order — a vertex adopts the label with the highest neighbor count,
ties broken by the smallest label id — for a fixed number of iterations.
The result is independent of partitioning/row order, so it matches a NumPy
oracle exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def label_propagation(graph: LinkGraph, iterations: int = 5) -> DataFrame:
    """Returns (id, label) after ``iterations`` synchronous rounds; labels
    start as vertex ids. Vertices with no (non-self) neighbors keep their own
    label."""
    und = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    und = und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.dropDuplicates(["src", "dst"]).repartition(graph.partitions, "src")
    und = und.persist()
    und.count()

    labels = graph.vertices.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("label").asc())
    with adaptive_execution(graph.edges.sparkSession, False):
        for _ in range(iterations):
            votes = (
                und.join(labels, und.src == labels.id)
                .groupBy("dst", "label")
                .agg(F.count("*").alias("cnt"))
            )
            winner = (
                votes.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(F.col("dst").alias("id"), F.col("label").alias("new_label"))
            )
            # eager_state: labels sit on both sides of this join (winner
            # derives from labels), so bare localCheckpoint would compound
            # size estimates geometrically (see session.eager_state)
            labels = eager_state(
                labels.join(winner, "id", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
            )
    und.unpersist()
    return labels


def label_propagation_arrow(
    graph: LinkGraph, iterations: int = 5, *, dense=None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Dense Arrow-kernel label propagation — same synchronous rounds and
    (max count, smallest label) tie-break as :func:`label_propagation`,
    exact-match output. Each round is one narrow job over the resident
    slices (base + reverse blocks give each slice its vertices' full
    undirected neighbor sets — ``DenseGraph.materialize_reverse``); the
    label vector is broadcast, per-slice voting is a vectorized
    sort/unique, and compact segments come back. Dense indices preserve id
    order, so the smallest-label tie-break agrees across domains."""
    from .pagerank_arrow import _lpa_vote_fn, dense_label_loop

    store = None
    if checkpoint_dir is not None:
        from ..checkpoint import CheckpointStore

        store = CheckpointStore(checkpoint_dir)
    dg, lab = dense_label_loop(
        graph, dense,
        lambda dg, lab_bc: _lpa_vote_fn(dg.resident_dir, dg.epoch, dg.n,
                                        dg.n_slices, lab_bc),
        rounds=iterations, store=store, mode="lpa-arrow",
    )
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame({"id": dg.ids, "label": dg.ids[lab]}))
    if dense is None:
        dg.unpersist()
    return out


def resume_label_propagation_arrow(
    graph: LinkGraph, checkpoint_dir: str, iterations: int = 5, *, dense=None
) -> DataFrame:
    """Continue :func:`label_propagation_arrow` from its latest committed
    round up to ``iterations`` TOTAL rounds. Synchronous rounds with a total
    tie-break order are deterministic, so the resumed output is identical
    to an uninterrupted ``iterations``-round run."""
    from ..checkpoint import CheckpointStore
    from .pagerank_arrow import (
        _lpa_vote_fn,
        dense_label_loop,
        load_label_checkpoint,
    )

    store = CheckpointStore(checkpoint_dir)
    dg, init, it, run_id = load_label_checkpoint(graph, dense, store,
                                                 expect_mode="lpa-arrow")
    if iterations < it:
        if dense is None:
            dg.unpersist()
        raise ValueError(
            f"checkpoint already committed {it} rounds > requested total "
            f"{iterations}; LPA labels are not monotone, so an earlier "
            "round cannot be recovered from a later checkpoint — rerun "
            "from scratch instead")
    dg, lab = dense_label_loop(
        graph, dg,
        lambda dg, lab_bc: _lpa_vote_fn(dg.resident_dir, dg.epoch, dg.n,
                                        dg.n_slices, lab_bc),
        rounds=max(0, iterations - it), store=store, mode="lpa-arrow",
        init=init, start_iter=it, run_id=run_id,
    )
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame({"id": dg.ids, "label": dg.ids[lab]}))
    if dense is None:
        dg.unpersist()
    return out
