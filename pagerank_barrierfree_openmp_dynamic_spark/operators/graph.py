"""Graph build & maintenance over a (src, dst) edge DataFrame.

The reference's graph container (``/root/reference/src/Graph.hxx:529-578``,
LazyBitset adjacency ``src/_bitset.hxx:149-230``) maps to:

- ``edges`` hash-partitioned by ``src`` and sorted within partitions —
  CSR-shaped blocks; the chunk-ownership insert trick
  (``src/_openmp.hxx:16-26``) is exactly Spark hash partitioning;
- ``update()``'s deferred dedup/sort (``src/_bitset.hxx:179-217``) is
  ``dropDuplicates`` + ``repartition`` + ``sortWithinPartitions`` + persist;
- self-loop normalization (``src/selfLoop.hxx:45-69``, README.md:8-9):
  a self-loop on every vertex removes dead ends so the teleport term is the
  constant ``(1-d)/N`` — required to match reference ranks;
- the transpose-with-degree (``src/transpose.hxx:53-89``) is never
  materialized: ``adj`` carries ``w = 1/outdeg`` per edge and the
  rank-gather is a join+groupBy whose shuffle direction *is* the transpose.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel


def dense_ids(df: DataFrame, col: str | list[str], partitions: int,
              out_col: str = "idx") -> DataFrame:
    """Distributed dense rank ``0..N-1`` of ``df`` rows by sorted ``col``
    (a single column name or a list of columns for composite orderings).

    Pure-DataFrame zipWithIndex: range-repartition by the key, per-partition
    ``row_number`` (JVM window, parallel), plus a per-partition offset
    cascade from one small ``collect``. No single-partition window, no
    Python row serialization — the id-assignment path stays JVM-side at any
    scale (the reference's span-index assignment,
    ``/root/reference/src/Graph.hxx:472``, done distributively).
    """
    cols = [col] if isinstance(col, str) else list(col)
    # Eager snapshot: repartitionByRange SAMPLES its boundaries, so two
    # evaluations of the same plan can partition differently — the offset
    # cascade must see the exact partitioning the final plan uses.
    sorted_df = (
        df.repartitionByRange(partitions, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        sorted_df.withColumn(
            out_col,
            (F.row_number().over(w).cast("long") - 1 + omap[F.col("_pid")]),
        )
        .drop("_pid")
    )


@dataclass
class LinkGraph:
    """Immutable snapshot of a link graph, ready for iterative kernels.

    edges:    (src, dst) deduplicated, self-loops included if requested,
              hash-partitioned by src, sorted within partitions, persisted.
    vertices: (id,) every vertex (pages with no links included), persisted.
    adj:      (src, dst, w=1/outdeg(src)) — scatter-ready edge table,
              persisted with the same partitioning as edges.
    """

    edges: DataFrame
    vertices: DataFrame
    adj: DataFrame
    num_vertices: int
    num_edges: int
    partitions: int
    self_loops: bool = True
    weighted: bool = False
    _persisted: list[DataFrame] = field(default_factory=list, repr=False)

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy("src").agg(F.count("*").alias("deg"))

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy("dst").agg(F.count("*").alias("deg"))

    def unpersist(self) -> None:
        for df in self._persisted:
            df.unpersist()


def build_graph(
    edges_raw: DataFrame,
    vertices: DataFrame | None = None,
    add_self_loops: bool = True,
    symmetric: bool = False,
    partitions: int | None = None,
    weight_col: str | None = None,
) -> LinkGraph:
    """Materialize a :class:`LinkGraph` from a raw (src, dst) DataFrame.

    ``vertices`` (id,) may be supplied (e.g. the url dictionary — pages with
    no links are still vertices, the ``vexists`` analogue of
    ``/root/reference/src/Graph.hxx:472``); otherwise derived from edges.
    ``symmetric=True`` mirrors the MTX symmetric-graph rule
    (``/root/reference/src/mtx.hxx:68-73``): add the reverse of every edge.
    ``weight_col`` names an edge-weight column (the MTX ``weighted`` third
    column, ``src/mtx.hxx:68-73``): rank then flows proportionally to
    weight/Σ(out-weights). Parallel (src,dst) duplicates merge by SUMMING
    weights (order-insensitive, hence deterministic under any partitioning);
    added self-loops get weight 1.0.
    """
    spark = edges_raw.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    weighted = weight_col is not None

    raw = edges_raw.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        *([F.col(weight_col).cast("double").alias("weight")] if weighted else []),
    )
    if symmetric:
        raw = raw.unionByName(raw.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([F.col("weight")] if weighted else []),
        ))
    # Persist the raw edge source once: vertices and edges both derive from
    # it (the source may be an expensive extraction pipeline).
    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)

    if vertices is None:
        v = (
            raw.select(F.col("src").alias("id"))
            .unionByName(raw.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        v = vertices.select(F.col(vertices.columns[-1] if "id" not in vertices.columns else "id").alias("id"))
    v = v.repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = v.count()

    e = raw
    if add_self_loops:
        loop_v = v
        if weighted:
            # Weighted merge SUMS duplicates, so a blanket union is not
            # idempotent (rebuilds would inflate existing self-loop weight);
            # add weight-1.0 loops only where missing. (Unweighted dedup
            # makes the blanket union idempotent for free.)
            have = (
                raw.filter(F.col("src") == F.col("dst"))
                .select(F.col("src").alias("id"))
                .distinct()
            )
            loop_v = v.join(have, "id", "left_anti")
        loops = loop_v.select(
            F.col("id").alias("src"), F.col("id").alias("dst"),
            *([F.lit(1.0).alias("weight")] if weighted else []),
        )
        e = e.unionByName(loops)

    # One shuffle total: hash-partition by src FIRST; the (src,dst) dedup's
    # ClusteredDistribution is satisfied by the src partitioning (all
    # duplicates colocated), so no second exchange is planned. (The weighted
    # groupBy merge obeys the same rule: grouping keys ⊇ partitioning keys.)
    e = e.repartition(p, "src")
    if weighted:
        e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    else:
        e = e.dropDuplicates(["src", "dst"])
    e = (
        e.sortWithinPartitions("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = e.count()
    raw.unpersist()

    # e is already hash-partitioned by src and the aggregate reuses that
    # partitioning, so the join needs no new exchange of the edge side and
    # the output keeps e's partitioning — no repartition/sort here.
    if weighted:
        outw = e.groupBy("src").agg(F.sum("weight").alias("wsum"))
        adj = (
            e.join(outw, "src")
            .select("src", "dst", (F.col("weight") / F.col("wsum")).alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        adj = (
            e.join(outdeg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    adj.count()

    return LinkGraph(
        edges=e,
        vertices=v,
        adj=adj,
        num_vertices=n,
        num_edges=m,
        partitions=p,
        self_loops=add_self_loops,
        weighted=weighted,
        _persisted=[v, e, adj],
    )


def _ids_df(graph: LinkGraph, ids) -> tuple[DataFrame, bool]:
    """Normalize a removal target to an (id,) DataFrame.

    Returns (df, small): ``small`` is True for driver-side iterables —
    those are broadcast into the anti-join (the common case: a handful of
    vertices); a DataFrame target is left to Catalyst/AQE to size.
    """
    if isinstance(ids, DataFrame):
        col = "id" if "id" in ids.columns else ids.columns[0]
        return ids.select(F.col(col).cast("long").alias("id")), False
    spark = graph.edges.sparkSession
    return (
        spark.createDataFrame([(int(i),) for i in ids], "id long"),
        True,
    )


def remove_out_edges(graph: LinkGraph, ids) -> LinkGraph:
    """``removeEdges(u)`` for a set of sources
    (``/root/reference/src/Graph.hxx:383-404``): drop every out-edge of the
    given vertices and commit (rebuild). The vertices themselves remain
    (``vexists`` model); with ``self_loops`` the rebuild re-asserts their
    normalization self-loop, exactly as the reference re-runs
    ``selfLoopOmpU`` after structural updates (``main.cxx:84-85``).

    One anti-join (broadcast for driver-side id lists) + the one-shuffle
    rebuild — no full-graph scan beyond the filter.
    """
    idf, small = _ids_df(graph, ids)
    key = F.broadcast(idf) if small else idf
    e = graph.edges.join(
        key.select(F.col("id").alias("src")), "src", "left_anti")
    return build_graph(e, vertices=graph.vertices,
                       add_self_loops=graph.self_loops,
                       partitions=graph.partitions,
                       weight_col="weight" if graph.weighted else None)


def remove_in_edges(graph: LinkGraph, ids) -> LinkGraph:
    """``removeInEdges(v)`` for a set of destinations
    (``/root/reference/src/Graph.hxx:406-427``, via the transposed view):
    drop every in-edge of the given vertices and commit."""
    idf, small = _ids_df(graph, ids)
    key = F.broadcast(idf) if small else idf
    e = graph.edges.join(
        key.select(F.col("id").alias("dst")), "dst", "left_anti")
    return build_graph(e, vertices=graph.vertices,
                       add_self_loops=graph.self_loops,
                       partitions=graph.partitions,
                       weight_col="weight" if graph.weighted else None)


def remove_vertices(graph: LinkGraph, ids) -> LinkGraph:
    """``removeVertex(u)`` for a set of vertices
    (``/root/reference/src/Graph.hxx:429-448``): drop the vertices and every
    incident edge (both directions), shrink the vertex set, and commit."""
    idf, small = _ids_df(graph, ids)
    key = F.broadcast(idf) if small else idf
    e = (
        graph.edges
        .join(key.select(F.col("id").alias("src")), "src", "left_anti")
        .join(key.select(F.col("id").alias("dst")), "dst", "left_anti")
    )
    v = graph.vertices.join(key, "id", "left_anti")
    return build_graph(e, vertices=v,
                       add_self_loops=graph.self_loops,
                       partitions=graph.partitions,
                       weight_col="weight" if graph.weighted else None)


def respan(graph: LinkGraph, n: int) -> LinkGraph:
    """``respan(n)`` (``/root/reference/src/Graph.hxx:299-311``): change
    the vertex-ID span to ``[0, n)``.

    Shrinking drops every vertex with ``id >= n`` together with ALL
    incident edges, both directions — the reference's ``resize(n)``
    discards the adjacency rows of dropped vertices but would leave
    in-edges pointing at ids >= n dangling inside surviving bitsets;
    callers there never shrink without rebuilding, so this operator
    performs the well-formed version (no dangling endpoints). Growing
    the span only reserves ID slots with ``vexists`` false — vertices
    do not come into existence — which in this engine's explicit
    vertex-table model is the identity: ids are unconstrained longs and
    existence is table membership, so there is nothing to reserve.
    """
    if n < 0:
        raise ValueError("span must be >= 0")
    e = graph.edges.filter((F.col("src") < n) & (F.col("dst") < n))
    v = graph.vertices.filter(F.col("id") < n)
    return build_graph(e, vertices=v,
                       add_self_loops=graph.self_loops,
                       partitions=graph.partitions,
                       weight_col="weight" if graph.weighted else None)


def self_loop_count(edges: DataFrame) -> int:
    """``selfLoopCount`` (``/root/reference/src/selfLoop.hxx:30-36``)."""
    return edges.filter(F.col("src") == F.col("dst")).count()


def transpose(edges: DataFrame) -> DataFrame:
    """``transposeW`` (``/root/reference/src/transpose.hxx:12-44``)."""
    return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def contract_edges(
    edges: DataFrame,
    mapping: DataFrame,
    *,
    weight_col: str | None = None,
    group_col: str = "group",
    drop_self_loops: bool = False,
) -> DataFrame:
    """Quotient (contracted) edge table — the page→host/domain aggregation
    every web-graph analysis runs before host-level ranking (not a
    reference operator; the reference ranks the raw vertex set only).
    ``mapping`` is ``(id, group)``; every edge becomes
    ``(group(src), group(dst))`` and parallel contracted edges merge by
    SUMMING weight (count when unweighted) — so the result feeds
    ``build_graph(weight_col="weight")`` and rank flows proportionally to
    inter-group link mass.

    Scale shape: two equi-joins on src/dst (mapping is O(V) — NOT
    broadcast; both joins shuffle on the same keys the edge table is
    already partitioned by, so on a real cluster the src-side join is
    co-partitioned with ``adj``) followed by one map-side-combinable
    hash aggregation on the (much smaller) group keys.
    """
    m_src = mapping.select(F.col("id").alias("src"),
                           F.col(group_col).alias("_gsrc"))
    m_dst = mapping.select(F.col("id").alias("dst"),
                           F.col(group_col).alias("_gdst"))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    out = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .select(F.col("_gsrc").alias("src"), F.col("_gdst").alias("dst"),
                w.alias("_w"))
    )
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out.groupBy("src", "dst").agg(F.sum("_w").alias("weight"))
