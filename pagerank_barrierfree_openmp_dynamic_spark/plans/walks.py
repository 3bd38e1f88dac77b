"""Seeded random-walk corpus generation — the DeepWalk/node2vec front-end
a link-graph feeds to embedding training.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); this is the standard
web/training-data-pipeline step that turns the SAME deduplicated
``(src, dst)`` edge table into a corpus of vertex sequences ("sentences")
for skip-gram embedding training (Perozzi et al., DeepWalk, KDD 2014).

Execution shape (scale-first — this is NOT the naive gather-all-neighbors
join): the adjacency is ranked ONCE per call — ``rn = row_number() over
(partition by src order by dst)`` plus the out-degree — reusing the edge
table's persisted src partitioning (one window, no extra exchange). Every
walk step then picks its next vertex by computing the chosen rank
DIRECTLY (``rn = 1 + mix(start, walk, step) % outdeg``) and equi-joining
``(cur = src, rn)`` — one lookup row per live walk per step, never
``deg(cur)`` candidate rows, so a hub with 10^6 out-edges costs a walk
exactly one joined row. Dead ends terminate the walk (inner join drops
it); all steps union into one long-format DataFrame.

Two selection strategies:

- ``strategy="hash"`` (default): ``mix = xxhash64(seed, start, walk,
  step)`` — JVM-side, well-mixed, deterministic for a fixed seed, the
  production choice.
- ``strategy="affine"``: ``mix = start*31 + walk*13 + step*7`` — a weak
  mixer kept because it is expressible in ANSI SQL integer arithmetic,
  making the whole operator DuckDB-oracle-checkable end-to-end (driver
  query ``random_walks``). Same plan shape, same cost.

Output: ``(start long, walk int, step int, vertex long)`` — one row per
visited vertex, ``step = 0`` is the start itself. Long format (pure
scalar columns) so downstream ops (windowed skip-gram pair extraction,
per-walk collect_list) stay relational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution


def random_walks(
    graph: LinkGraph,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 42,
    strategy: str = "hash",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Generate ``walks_per_vertex`` deterministic pseudo-random walks of
    up to ``walk_length`` steps from every vertex (or from ``starts``,
    a DataFrame with an ``id`` column). Returns the long-format corpus
    ``(start, walk, step, vertex)``."""
    if strategy not in ("hash", "affine"):
        raise ValueError(f"strategy must be 'hash' or 'affine', got "
                         f"{strategy!r}")
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    spark = graph.edges.sparkSession

    # Ranked adjacency + out-degree, built once: the window runs over the
    # edge table's existing src hash-partitioning (sorted within
    # partitions), so this adds no exchange beyond what build_graph paid.
    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        graph.edges.select("src", "dst")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("outdeg", F.count("*").over(Window.partitionBy("src")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()

    base = (starts if starts is not None else graph.vertices).select("id")
    state = base.crossJoin(
        spark.range(walks_per_vertex).select(
            F.col("id").cast("int").alias("walk"))
    ).select(F.col("id").alias("start"), "walk",
             F.col("id").alias("vertex"))

    def _mix(step: int):
        if strategy == "hash":
            return F.xxhash64(F.lit(int(seed)), F.col("start"),
                              F.col("walk"), F.lit(step))
        return (F.col("start") * F.lit(31) + F.col("walk") * F.lit(13)
                + F.lit(step * 7))

    out = [state.select("start", "walk", F.lit(0).alias("step"), "vertex")]
    with adaptive_execution(spark, False):
        for step in range(1, walk_length + 1):
            chosen = F.lit(1) + F.pmod(_mix(step), F.col("outdeg"))
            state = (
                state.join(adj, state.vertex == adj.src)
                .filter(F.col("rn") == chosen)
                .select("start", "walk", F.col("dst").alias("vertex"))
            )
            if step < walk_length:
                # pin each frontier so the k-step join chain doesn't
                # re-execute from the top under every downstream action
                state = state.localCheckpoint(eager=True)
            out.append(state.select(
                "start", "walk", F.lit(step).alias("step"), "vertex"))
    corpus = out[0]
    for df in out[1:]:
        corpus = corpus.unionByName(df)
    adj.unpersist()
    return corpus


def skipgram_pairs(corpus: DataFrame, window: int = 2) -> DataFrame:
    """Turn a long-format walk corpus into (center, context) skip-gram
    training pairs: for each walk, every ordered pair of vertices within
    ``window`` steps of each other. One self-join per call, partitioned
    by (start, walk) — the walk key — so pair generation shuffles each
    walk once regardless of corpus size."""
    a = corpus.select(F.col("start"), F.col("walk"),
                      F.col("step").alias("_sa"),
                      F.col("vertex").alias("center"))
    b = corpus.select(F.col("start").alias("_st"), F.col("walk").alias("_w"),
                      F.col("step").alias("_sb"),
                      F.col("vertex").alias("context"))
    return (
        a.join(b, (a.start == F.col("_st")) & (a.walk == F.col("_w")))
        .filter((F.col("_sa") != F.col("_sb"))
                & (F.abs(F.col("_sa") - F.col("_sb")) <= window))
        .select("center", "context")
    )
