"""Synchronous label propagation (community detection) over the undirected
edge view. Not in the reference repo (BASELINE.json adds it).

Determinism (SURVEY.md §7 hard part e): synchronous updates with a total
tie-break order — a vertex adopts the label with the highest neighbor count,
ties broken by the smallest label id — for a fixed number of iterations.
The result is independent of partitioning/row order, so it matches a NumPy
oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution


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
            labels = (
                labels.join(winner, "id", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
                .localCheckpoint(eager=True)
            )
    und.unpersist()
    return labels
