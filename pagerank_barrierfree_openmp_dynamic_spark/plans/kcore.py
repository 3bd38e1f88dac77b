"""k-core decomposition (coreness) over the undirected simple view.

Not in the reference repo (PageRank-only); coreness is the standard
link-graph density measure — spam farms and boilerplate link blocks show
up as abnormally high-core subgraphs, which makes this a first-class
filter in a web-graph pipeline.

Algorithm: distributed H-INDEX ITERATION (Montresor-De Pellegrini-Miorandi
2011; Lü et al. 2016 prove the fixed point IS the coreness):

    core_0(v) = deg(v)
    core_t(v) = h-index of { core_{t-1}(u) : u ~ v }

where h-index(S) = the largest h such that at least h values in S are
>= h. The sequence is monotonically non-increasing and converges to the
exact peeling coreness — no sequential min-degree peel loop, so it
parallelizes as a per-vertex aggregate. The classic sequential peeling
(Batagelj-Zaversnik) is inherently ordered and is what the test oracle
uses.

The h-index is computed entirely JVM-side with a window:
sort each vertex's neighbor core estimates descending, rank them, and
take MAX(LEAST(estimate, rank)) — max over i of min(c_i, i) for a
descending sequence is exactly the h-index, and it is tie-order
independent (equal estimates give the same LEAST no matter how the rank
breaks the tie), so the result is deterministic under any partitioning.

Scale shape: one shuffled join (neighbor estimates, co-partitioned with
the persisted undirected edge table) + one window shuffle on vertex id
per round. Rounds to converge are typically O(10) on web-shaped graphs
(bounded by the longest strictly-decreasing estimate chain). State never
leaves the executors; the driver sees a change-count scalar per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def coreness(graph: LinkGraph, max_rounds: int = 200) -> DataFrame:
    """Returns (id, core) — the exact k-core number of every vertex over
    the undirected simple view of the edge table (self-loops dropped,
    symmetrized, deduplicated; isolated vertices have core 0)."""
    spark = graph.edges.sparkSession

    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    und = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = (
        und.dropDuplicates(["src", "dst"])
        .repartition(graph.partitions, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.count()

    deg = und.groupBy("src").agg(F.count("*").alias("core"))
    core = (
        graph.vertices.join(deg, graph.vertices.id == deg.src, "left")
        .select("id", F.coalesce("core", F.lit(0)).cast("long").alias("core"))
        .localCheckpoint(eager=True)
    )

    w = Window.partitionBy("src").orderBy(F.col("_c").desc())
    with adaptive_execution(spark, False):
        for _ in range(max_rounds):
            nb = und.join(
                core.select(F.col("id").alias("_nid"), F.col("core").alias("_c")),
                und.dst == F.col("_nid"),
            ).select("src", "_c")
            h = (
                nb.withColumn("_rn", F.row_number().over(w))
                .groupBy("src")
                .agg(F.max(F.least(F.col("_c"), F.col("_rn"))).alias("h"))
            )
            # eager_state: core sits on both sides of this join, so bare
            # localCheckpoint would compound size estimates geometrically
            # with the round count (see session.eager_state)
            nxt = eager_state(
                core.join(h, core.id == h.src, "left")
                .select(
                    core.id,
                    F.coalesce("h", F.lit(0)).cast("long").alias("core"),
                    (F.coalesce("h", F.lit(0)) < core.core).alias("chg"),
                )
            )
            changed = nxt.filter(F.col("chg")).count()
            core = nxt.select("id", "core")
            if changed == 0:
                break
        else:
            raise RuntimeError(f"coreness did not converge in {max_rounds} rounds")
    und.unpersist()
    return core


def core_histogram(graph: LinkGraph, max_rounds: int = 200) -> DataFrame:
    """(core, n_vertices) distribution — the degeneracy profile of the
    graph (max core = degeneracy)."""
    return (
        coreness(graph, max_rounds)
        .groupBy("core")
        .agg(F.count("*").alias("n_vertices"))
    )
