"""Maximal independent set — deterministic Luby rounds.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); MIS is the classic symmetry-
breaking primitive behind distributed coloring/scheduling on graphs
(Luby 1986). This implementation replaces Luby's coin flips with a
DETERMINISTIC per-round priority

    P(v, r) = (v · 1103515245 + r · 12345) mod 2147483647

(an LCG step — products stay below 2^63, so the same integer arithmetic
runs overflow-free in Spark AND ANSI SQL; ties are impossible because
the comparison key is the pair (P, id)). Per round, over the undirected
simple view:

- an undecided vertex joins the set when its key is strictly smaller
  than every undecided neighbor's key (or it has none) — one
  edges⋈state join + a per-vertex MIN aggregation;
- neighbors of new members become excluded — one more semi-join.

Expected O(log n) rounds (Luby's analysis carries over to random-like
priorities); each round is two map-side-combinable aggregations over
the undirected edge table. The fixed-round prefix is bit-reproducible,
which is what the driver oracle checks (``luby_mis_r3``); run with
``rounds=None`` to the fixpoint for a certified maximal set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state

_A, _B, _M = 1103515245, 12345, 2147483647


def luby_mis(graph: LinkGraph, rounds: int | None = None) -> DataFrame:
    """Returns ``(id, state)`` for every vertex, ``state`` ∈
    ``{'in', 'out', 'undecided'}`` — ``undecided`` only when a fixed
    ``rounds`` cut the run short; with ``rounds=None`` the fixpoint is a
    maximal independent set of the undirected simple view (every vertex
    'in' or 'out', no two 'in' adjacent, every 'out' has an 'in'
    neighbor)."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.count()

    decided = None  # (id, state in {'in','out'})
    undecided = graph.vertices.select("id").localCheckpoint(eager=True)
    r = 0
    with adaptive_execution(spark, False):
        while rounds is None or r < rounds:
            r += 1
            if undecided.isEmpty():
                break
            pri = undecided.select(
                "id",
                ((F.col("id") * _A + F.lit(r * _B)) % _M).alias("_p"))
            nbr = (
                und.join(pri.select(F.col("id").alias("_u"),
                                    F.col("_p").alias("_up")),
                         und.src == F.col("_u"))
                .join(pri.select(F.col("id").alias("_v"),
                                 F.col("_p").alias("_vp")),
                      und.dst == F.col("_v"))
                .groupBy(F.col("_u").alias("id"))
                .agg(F.min(F.struct(F.col("_vp"), F.col("_v"))).alias("_m"))
            )
            winners = (
                pri.join(nbr, "id", "left")
                .filter(F.col("_m").isNull()
                        | (F.struct(F.col("_p"), F.col("id")) < F.col("_m")))
                .select("id")
            ).localCheckpoint(eager=True)
            if winners.isEmpty():
                # priorities always pick at least one local minimum per
                # undecided component; empty means nothing undecided left
                break
            losers = (
                und.join(winners.select(F.col("id").alias("_w")),
                         und.src == F.col("_w"))
                .select(F.col("dst").alias("id")).distinct()
                .join(undecided, "id", "left_semi")
                .join(winners, "id", "left_anti")
            )
            newly = winners.select("id", F.lit("in").alias("state")) \
                .unionByName(losers.select("id", F.lit("out").alias("state")))
            decided = newly if decided is None else eager_state(
                decided.unionByName(newly))
            undecided = eager_state(
                undecided.join(newly.select("id"), "id", "left_anti"))
    out = undecided.select("id", F.lit("undecided").alias("state"))
    if decided is not None:
        out = decided.unionByName(out)
    und.unpersist()
    return out
