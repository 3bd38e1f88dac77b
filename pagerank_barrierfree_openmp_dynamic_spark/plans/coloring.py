"""Distributed greedy graph coloring via deterministic Luby-MIS peeling.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); coloring is the classic
scheduling/conflict-partitioning primitive layered on the MIS
symmetry-breaker (``plans/mis.py``): peel a maximal independent set off
the undirected simple view, assign it color 0, remove it, repeat. Each
peel's set is independent, so the result is a proper coloring; with
fixpoint peels (``luby_rounds=None``) every vertex colored ``c`` is
adjacent to at least one vertex of every color ``< c`` (it lost each
earlier peel to a neighbor), i.e. the coloring is greedy-irredundant.

Determinism: identical LCG priorities to :func:`~.mis.luby_mis`
(``P(v, r) = (v·1103515245 + r·12345) mod 2147483647`` with the round
counter restarting at 1 inside every peel), so a fixed
``(max_colors, luby_rounds)`` prefix is bit-reproducible and exactly
mirrorable in ANSI SQL — the driver checks ``coloring_c2r2`` against
the fully unrolled two-peel/two-round recurrence.

Scale shape per round: one join of the (persisted) undirected edge
table against the undecided-priority frame + a map-side-combinable MIN,
then two semi/anti-joins — the same shuffle pattern as the MIS and CC
fixpoints; per-peel driver traffic is one emptiness scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state
from .mis import _A, _B, _M


def greedy_coloring(
    graph: LinkGraph,
    max_colors: int | None = None,
    luby_rounds: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """Returns ``(id, color)`` over the undirected simple view. With
    ``max_colors=None`` every vertex is colored (proper by
    construction); with a bound, vertices not reached within
    ``max_colors`` peels get ``color = -1``. ``luby_rounds`` bounds the
    Luby rounds *inside* each peel (``None`` = run each peel's MIS to
    its fixpoint — required for the greedy-irredundant guarantee)."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.count()

    av = graph.vertices.select("id").localCheckpoint(eager=True)
    parts: list[DataFrame] = []
    c = 0
    with adaptive_execution(spark, False):
        while max_colors is None or c < max_colors:
            if av.isEmpty():
                break
            if c >= max_rounds:
                raise RuntimeError(
                    f"coloring exceeded {max_rounds} peels — "
                    "pathological input or a bug")
            undecided = av
            peeled: DataFrame | None = None
            r = 0
            while luby_rounds is None or r < luby_rounds:
                r += 1
                if r > max_rounds:
                    raise RuntimeError(
                        f"peel {c} exceeded {max_rounds} Luby rounds")
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
                    break
                losers = (
                    und.join(winners.select(F.col("id").alias("_w")),
                             und.src == F.col("_w"))
                    .select(F.col("dst").alias("id")).distinct()
                    .join(undecided, "id", "left_semi")
                    .join(winners, "id", "left_anti")
                )
                peeled = winners if peeled is None else eager_state(
                    peeled.unionByName(winners))
                undecided = eager_state(
                    undecided.join(winners, "id", "left_anti")
                    .join(losers, "id", "left_anti"))
            if peeled is None:
                break
            parts.append(peeled.select(
                "id", F.lit(c).cast("int").alias("color")))
            av = eager_state(av.join(peeled, "id", "left_anti"))
            c += 1
    out = av.select("id", F.lit(-1).cast("int").alias("color"))
    for part in parts:
        out = out.unionByName(part)
    und.unpersist()
    return out
