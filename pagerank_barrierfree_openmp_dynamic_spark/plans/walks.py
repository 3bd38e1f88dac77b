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
    if graph.weighted:
        # the rank-directed lookup draws neighbors UNIFORMLY; silently
        # ignoring weights would be wrong — the weighted first-order walk
        # is node2vec_walks(p=1, q=1), whose inverse-CDF draw honors w
        raise ValueError(
            "random_walks draws uniformly and would ignore edge weights; "
            "use node2vec_walks(p=1.0, q=1.0) for weight-proportional "
            "first-order walks")
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


def node2vec_walks(
    graph: LinkGraph,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    strategy: str = "hash",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec, node2vec, KDD 2016):
    from state (prev, cur), each out-edge (cur, dst) is weighted by the
    search bias α — ``1/p`` if dst == prev (return), ``1`` if
    (prev, dst) is an edge (BFS-ish stay-local), else ``1/q``
    (DFS-ish explore) — times the edge weight on weighted graphs, and the
    next vertex is drawn by inverse-CDF over the dst-ordered cumulative
    weights with a deterministic per-(walk, step) uniform.

    Unlike :func:`random_walks`'s rank-directed O(1)-row lookup, the
    second-order bias genuinely needs cur's candidate out-edges plus a
    (prev, dst)-membership probe — cost O(deg(cur)) rows per live walk
    per step, node2vec's inherent cost. The membership probe is an
    equi-join on (prev, dst) against the src-partitioned edge table; the
    inverse-CDF pick is a per-(start, walk) window cumsum — both
    deterministic in dst order, so ``strategy="affine"`` is reproducible
    in ANSI SQL end-to-end (driver query ``node2vec_walks``) and
    ``"hash"`` (xxhash64) is the production draw. First step: prev is
    seeded to the start itself, making α uniform (= a first-order step)
    unless the graph has self-loops back into the start.

    Returns the same long format as :func:`random_walks`:
    ``(start, walk, step, vertex)``."""
    if strategy not in ("hash", "affine"):
        raise ValueError(f"strategy must be 'hash' or 'affine', got "
                         f"{strategy!r}")
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    spark = graph.edges.sparkSession
    M = 1 << 20

    if graph.weighted:
        adj = graph.edges.select(
            "src", "dst", F.col("weight").cast("double").alias("_ew"))
    else:
        adj = graph.edges.select("src", "dst", F.lit(1.0).alias("_ew"))
    adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    member = adj.select(F.col("src").alias("_ps"),
                        F.col("dst").alias("_pd"),
                        F.lit(1).alias("_nb"))

    base = (starts if starts is not None else graph.vertices).select("id")
    state = base.crossJoin(
        spark.range(walks_per_vertex).select(
            F.col("id").cast("int").alias("walk"))
    ).select(F.col("id").alias("start"), "walk",
             F.col("id").alias("prev"), F.col("id").alias("cur"))

    def _unif(step: int):
        if strategy == "hash":
            mix = F.xxhash64(F.lit(int(seed)), F.col("start"),
                             F.col("walk"), F.lit(step))
        else:
            mix = (F.col("start") * F.lit(31) + F.col("walk") * F.lit(13)
                   + F.lit(step * 7))
        return F.pmod(mix, F.lit(M)).cast("double") / F.lit(float(M))

    out = [state.select("start", "walk", F.lit(0).alias("step"),
                        F.col("cur").alias("vertex"))]
    w_cum = Window.partitionBy("start", "walk").orderBy("dst")
    w_tot = Window.partitionBy("start", "walk")
    with adaptive_execution(spark, False):
        for step in range(1, walk_length + 1):
            cand = (
                state.join(adj, state.cur == adj.src)
                .join(member, (F.col("prev") == F.col("_ps"))
                      & (F.col("dst") == F.col("_pd")), "left")
                .select(
                    "start", "walk", "prev", "cur", "dst",
                    (F.col("_ew") * F.when(
                        F.col("dst") == F.col("prev"), F.lit(1.0 / p))
                     .when(F.col("_nb") == 1, F.lit(1.0))
                     .otherwise(F.lit(1.0 / q))).alias("wgt"),
                )
            )
            # tot = MAX of the ordered cumsum, not an unordered SUM over
            # the partition: the cumsum's addition order is pinned by the
            # dst sort, so its final value is bit-identical in any engine,
            # while a free-order SUM could differ by an ulp and flip the
            # inverse-CDF pick at a boundary
            cand = cand.select(
                "*", F.sum("wgt").over(w_cum).alias("cum"))
            cand = cand.select(
                "*",
                F.max("cum").over(w_tot).alias("tot"),
                _unif(step).alias("u"),
            )
            state = (
                cand.filter(F.col("cum") > F.col("u") * F.col("tot"))
                .groupBy("start", "walk")
                .agg(F.min("dst").alias("_next"),
                     F.first("cur").alias("prev"))
                .select("start", "walk", "prev",
                        F.col("_next").alias("cur"))
            )
            if step < walk_length:
                state = state.localCheckpoint(eager=True)
            out.append(state.select(
                "start", "walk", F.lit(step).alias("step"),
                F.col("cur").alias("vertex")))
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
