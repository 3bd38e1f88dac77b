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


class DenseIdSpaceError(ValueError):
    """Batch references vertices outside the dense id space. The dense
    delta-overlay path cannot grow the vertex set; callers that can,
    fall back to the full :func:`apply_batch` rebuild on THIS error
    specifically — other ``ValueError``s (e.g. the weighted zero
    out-weight-sum validation) signal data problems that a rebuild
    would silently carry through, and must propagate."""


def apply_batch(
    graph: LinkGraph,
    batch: DataFrame,
    partitions: int | None = None,
) -> LinkGraph:
    """Apply a (src, dst, op['ins'|'del']) batch; return the updated graph.

    Deletions are applied first, then insertions (the reference's protocol
    deletes a random batch then re-inserts it, ``main.cxx:38-66``). Vertices
    never vanish (``vexists`` model) and insertion endpoints GROW the
    vertex set (the reference's ``addVertexU``/``respan``,
    ``/root/reference/src/Graph.hxx:344-360``): without the union, an
    edge to a newly-discovered page stays in the edge table but falls out
    of the id dictionary, and every downstream dense build silently drops
    it. Self-loops are re-asserted by the rebuild, mirroring
    ``main.cxx:84-85`` re-running ``selfLoopOmpU`` after each batch.
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
    ins_v = (ins.select(F.col("src").alias("id"))
             .unionByName(ins.select(F.col("dst").alias("id"))))
    new_vertices = (graph.vertices.select("id")
                    .unionByName(ins_v).distinct())
    return build_graph(
        new_edges,
        vertices=new_vertices,
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
        return _apply_batch_dense_weighted(graph, dense, batch)

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

    def to_idx(pdf) -> np.ndarray:
        if len(pdf) == 0:
            return np.empty((0, 2), dtype=np.int64)
        ids = dense.ids
        out = np.empty((len(pdf), 2), dtype=np.int64)
        for j, col in enumerate(("src", "dst")):
            vals = pdf[col].to_numpy()
            i = np.searchsorted(ids, vals)
            bad = (i >= len(ids)) | (ids[np.minimum(i, len(ids) - 1)] != vals)
            if bad.any():
                raise DenseIdSpaceError(
                    "apply_batch_dense: batch references vertices outside the "
                    "dense id space; use apply_batch (full rebuild) instead")
            out[:, j] = i
        return out

    spark = graph.edges.sparkSession
    with adaptive_execution(spark, False):
        ins_pdf = net_ins_df.select("src", "dst").toPandas()
        del_pdf = net_del_df.select("src", "dst").toPandas()
    net_ins = to_idx(ins_pdf)
    net_del = to_idx(del_pdf)
    new_dense = dense.apply_delta(net_ins, net_del)

    # rebuild the (tiny, already-collected) net rows as literal DataFrames:
    # chaining batches otherwise stacks the semi/anti joins — and a
    # reference to the incoming micro-batch DataFrame — into the light
    # view's edge lineage, so every later action re-runs the whole chain
    # (quadratic in batch count for streaming callers)
    net_del_lit = spark.createDataFrame(del_pdf, schema="src long, dst long")
    net_ins_lit = spark.createDataFrame(ins_pdf, schema="src long, dst long")
    new_edges = (
        graph.edges.join(F.broadcast(net_del_lit), ["src", "dst"], "left_anti")
        .unionByName(net_ins_lit)
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


def _apply_batch_dense_weighted(graph: LinkGraph, dense, batch: DataFrame):
    """Weighted O(touched) dynamic update, DISTRIBUTED replay. A weighted
    insert/delete changes its source's Σ(out-weights) and therefore
    re-scales EVERY sibling edge's transition weight
    ``w = weight/Σ(out-weights)`` — a per-edge net overlay cannot express
    that. Instead the overlay REPLACES each touched source's full
    out-adjacency: 'del' rows carry all its current edges at their old
    normalized weights, 'ins' rows its updated edge set at the new
    normalization. Overlay size = O(Σ degree(touched sources)).

    Scale shape: the touched adjacency NEVER lands on the driver. The
    replay is pure DataFrame algebra — broadcast semi-join of the touched
    sources against the persisted edge table, broadcast anti-join of the
    deletions, union+groupBy merge of the insertions, per-source Σ-weight
    normalization via a broadcast totals join — and the per-slice delta
    files are written by the workers (``DenseGraph.apply_delta_df``). A
    batch touching a web-scale hub (10⁷-10⁸ out-edges) costs one
    distributed pass over that adjacency; driver traffic is O(batch) for
    the collected batch plus O(touched sources) for the degree deltas.

    Batch semantics mirror :func:`apply_batch`: deletions first (self-loops
    protected, deleting an absent edge is a no-op), then insertions with
    ``weight`` (default 1.0), merging additively into existing edges —
    the parallel-edge rule of ``build_graph``.
    """
    import numpy as np
    import pandas as pd

    spark = graph.edges.sparkSession
    dels = batch.filter(F.col("op") == "del").select(
        F.col("src").cast("long"), F.col("dst").cast("long"))
    ins = batch.filter(F.col("op") == "ins")
    w = (F.col("weight").cast("double") if "weight" in ins.columns
         else F.lit(1.0))
    ins = ins.select(F.col("src").cast("long"), F.col("dst").cast("long"),
                     w.alias("weight"))
    if graph.self_loops:
        dels = dels.filter(F.col("src") != F.col("dst"))

    # The batch itself is tiny relative to the graph: collect it once
    # (O(batch)) to validate endpoints and derive the touched-source list.
    with adaptive_execution(spark, False):
        dels_pdf = dels.distinct().toPandas()
        ins_pdf = (ins.groupBy("src", "dst")
                   .agg(F.sum("weight").alias("weight")).toPandas())

    ids = dense.ids
    endpoints = np.unique(np.concatenate([
        dels_pdf["src"].to_numpy(np.int64), dels_pdf["dst"].to_numpy(np.int64),
        ins_pdf["src"].to_numpy(np.int64), ins_pdf["dst"].to_numpy(np.int64),
    ])) if (len(dels_pdf) or len(ins_pdf)) else np.empty(0, np.int64)
    pos = np.searchsorted(ids, endpoints)
    bad = (pos >= len(ids)) | (ids[np.minimum(pos, len(ids) - 1)] != endpoints)
    if bad.any():
        raise DenseIdSpaceError(
            "apply_batch_dense: batch references vertices outside "
            "the dense id space; use apply_batch (full rebuild)")

    touched = np.unique(np.concatenate([
        dels_pdf["src"].to_numpy(np.int64),
        ins_pdf["src"].to_numpy(np.int64)]))
    t_df = spark.createDataFrame(
        pd.DataFrame({"src": touched}), schema="src long")
    dels_sdf = spark.createDataFrame(dels_pdf, schema="src long, dst long")
    ins_sdf = spark.createDataFrame(
        ins_pdf, schema="src long, dst long, weight double")

    # distributed replay over the touched sources' raw out-adjacency
    old = (
        graph.edges.join(F.broadcast(t_df), "src", "left_semi")
        .select("src", "dst", F.col("weight").cast("double").alias("weight"))
        .persist()
    )
    new_raw = (
        old.join(F.broadcast(dels_sdf), ["src", "dst"], "left_anti")
        .unionByName(ins_sdf)
        .groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
        .persist()
    )
    # ONE aggregation pass per side: per-source count (degree deltas) and
    # Σ(weight) (normalization denominators) come from the same
    # O(touched sources) collected rows, instead of separate tot and cnt
    # aggregation jobs over the same persisted frames. Validating the
    # denominators HERE — before the normalization joins are even built —
    # matters: Spark's Divide returns NULL (-> NaN through Arrow) on
    # tot=0 where the old pandas replay raised, so a touched source whose
    # out-weights sum to zero must fail loudly, not corrupt ranks.
    with adaptive_execution(spark, False):
        old_cnt = (old.groupBy("src")
                   .agg(F.count("*").alias("count"),
                        F.sum("weight").alias("tot")).toPandas())
        new_cnt = (new_raw.groupBy("src")
                   .agg(F.count("*").alias("count"),
                        F.sum("weight").alias("tot")).toPandas())
    for cnt_pdf, side in ((old_cnt, "existing"), (new_cnt, "updated")):
        tots = cnt_pdf["tot"].to_numpy(np.float64)
        if len(tots) and (~(tots != 0.0)).any():  # catches 0.0 and NaN
            bad_src = cnt_pdf["src"].to_numpy(np.int64)[~(tots != 0.0)]
            raise ValueError(
                "apply_batch_dense: zero/NaN out-weight sum for "
                f"{side} adjacency of source(s) {bad_src[:5].tolist()}; "
                "transition weights w/Σw are undefined")

    old_tot = spark.createDataFrame(
        old_cnt[["src", "tot"]], schema="src long, tot double")
    new_tot = spark.createDataFrame(
        new_cnt[["src", "tot"]], schema="src long, tot double")
    del_rows = old.join(F.broadcast(old_tot), "src").select(
        "src", "dst", (F.col("weight") / F.col("tot")).alias("w"),
        F.lit("del").alias("tag"))
    ins_rows = new_raw.join(F.broadcast(new_tot), "src").select(
        "src", "dst", (F.col("weight") / F.col("tot")).alias("w"),
        F.lit("ins").alias("tag"))

    # id -> dense idx, vectorized in the workers against the broadcast
    # sorted ids array (old rows are in the id space by build_graph
    # invariant; batch endpoints were validated above)
    ids_bc = spark.sparkContext.broadcast(ids)

    def to_idx_fn(batches):
        idv = ids_bc.value
        for pdf in batches:
            yield pd.DataFrame({
                "tag": pdf["tag"],
                "src_idx": np.searchsorted(
                    idv, pdf["src"].to_numpy(np.int64)).astype(np.int32),
                "dst_idx": np.searchsorted(
                    idv, pdf["dst"].to_numpy(np.int64)).astype(np.int32),
                "w": pdf["w"].to_numpy(np.float64),
            })

    overlay_rows = del_rows.unionByName(ins_rows).mapInPandas(
        to_idx_fn, "tag string, src_idx int, dst_idx int, w double")

    # per-source out-degree deltas: reuse the counts collected (and
    # validated) above — no extra job
    oc = np.zeros(len(touched), dtype=np.float64)
    nc = np.zeros(len(touched), dtype=np.float64)
    if len(old_cnt):
        oc[np.searchsorted(touched, old_cnt["src"].to_numpy(np.int64))] = \
            old_cnt["count"].to_numpy(np.float64)
    if len(new_cnt):
        nc[np.searchsorted(touched, new_cnt["src"].to_numpy(np.int64))] = \
            new_cnt["count"].to_numpy(np.float64)

    new_dense = dense.apply_delta_df(
        overlay_rows, (np.searchsorted(ids, touched), nc - oc))
    ids_bc.destroy()
    old.unpersist()
    # new_raw stays persisted: it is unioned into the returned graph's
    # edge lineage below, and its cache (already populated by the counts
    # and delta-write actions) is what keeps later actions over
    # new_graph.edges from re-running the replay joins. Storage is
    # bounded O(Σ degree(touched)) and is reclaimed by Spark's
    # ContextCleaner once the returned graph is garbage-collected.

    kept = graph.edges.join(F.broadcast(t_df), "src", "left_anti")
    new_edges = kept.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    ).unionByName(new_raw.select("src", "dst", "weight"))
    new_graph = LinkGraph(
        edges=new_edges,
        vertices=graph.vertices,
        adj=None,
        num_vertices=graph.num_vertices,
        num_edges=graph.num_edges - int(oc.sum()) + int(nc.sum()),
        partitions=graph.partitions,
        self_loops=graph.self_loops,
        weighted=True,
    )
    new_dense.graph = new_graph
    return new_graph, new_dense


def batch_endpoints_frontier_dense(dense_old, dense_new,
                                   batch: DataFrame) -> DataFrame:
    """Reference-exact Dynamic Frontier seed (``pagerankAffectedFrontierW``,
    ``/root/reference/src/pagerank.hxx:386-410``: out-neighbors of every
    deletion source in the OLD graph and insertion source in the NEW
    graph) computed from the RESIDENT index instead of the edge table.

    ``batch_endpoints_frontier`` evaluates two broadcast semi-joins over
    the full edge DataFrame — one complete edge scan + distinct per call,
    which at web scale dwarfs the entire frontier re-rank it seeds (the
    re-rank is O(affected), the seed was O(E)). This variant binary-
    searches the src-sorted ``esort`` slice files (mmap, written by
    ``DenseGraph.materialize_masked``) and nets each view's delta
    overlays in-RAM: O(|batch| log E + Σ out-degree(batch sources)) per
    slice, one 1-row-per-slice job, no edge bytes shuffled.

    Both views must share one resident slice directory (the
    ``apply_batch_dense`` delta-overlay protocol). Returns (id,)
    distinct, identical to ``batch_endpoints_frontier``."""
    import numpy as np
    import pandas as pd

    from ..plans.pagerank_arrow import _load_slice, _ragged_take

    spark = batch.sparkSession
    if (dense_new.resident_dir != dense_old.resident_dir
            or dense_new.epoch != dense_old.epoch):
        # the insertion-side lookup below resolves dense_new's overlay
        # tags under dense_old's directory — with views from two
        # different base builds every delta file would be "legitimately
        # absent" and the seed silently incomplete
        raise ValueError(
            "batch_endpoints_frontier_dense: dense_new must be an overlay "
            "view of dense_old (shared resident_dir/epoch, the "
            "apply_batch_dense protocol); got two unrelated dense views")
    dense_old.materialize_masked()
    ids = dense_old.ids
    n = dense_old.n

    def to_idx(vals: np.ndarray) -> np.ndarray:
        i = np.searchsorted(ids, vals)
        ok = (i < n) & (ids[np.minimum(i, n - 1)] == vals)
        if not ok.all():
            raise DenseIdSpaceError(
                "batch_endpoints_frontier_dense: batch references vertices "
                "outside the dense id space")
        return i

    with adaptive_execution(spark, False):
        bpdf = batch.select("src", "op").toPandas()
    del_src = np.unique(to_idx(
        bpdf.loc[bpdf["op"] == "del", "src"].to_numpy("int64")))
    ins_src = np.unique(to_idx(
        bpdf.loc[bpdf["op"] == "ins", "src"].to_numpy("int64")))

    d = dense_old.resident_dir
    epoch = dense_old.epoch
    P = dense_old.n_slices
    ov_old = tuple(dense_old.overlays)
    ov_new = tuple(dense_new.overlays)
    weighted = dense_old.weighted

    def fn(batches):
        def view_dsts(srcs: np.ndarray, overlays: tuple, s: int):
            """dsts of `srcs`' live out-edges in the view = base ∪ net
            overlay effect, restricted to slice s's dst residue."""
            es = np.load(f"{d}/esort_{s}_src.npy", mmap_mode="r")
            ed = np.load(f"{d}/esort_{s}_dst.npy", mmap_mode="r")
            pairs_src, pairs_dst, signs = [], [], []
            if len(es) and srcs.size:
                lo = np.searchsorted(es, srcs, "left")
                hi = np.searchsorted(es, srcs, "right")
                pos = _ragged_take(lo, hi - lo)
                if pos.size:
                    pairs_src.append(np.asarray(es[pos], dtype=np.int64))
                    pairs_dst.append(np.asarray(ed[pos], dtype=np.int64))
                    signs.append(np.ones(pos.size))
            if overlays:
                _b1, _b2, _b3, deltas = _load_slice(d, epoch, s, overlays,
                                                    weighted)
                for dsrc, ddst, _dw, sign in deltas:
                    dsrc = np.asarray(dsrc, dtype=np.int64)
                    m = np.isin(dsrc, srcs)
                    if m.any():
                        pairs_src.append(dsrc[m])
                        pairs_dst.append(
                            np.asarray(ddst, dtype=np.int64)[m])
                        signs.append(np.full(int(m.sum()), float(sign)))
            if not pairs_src:
                return np.empty(0, np.int64)
            ps = np.concatenate(pairs_src)
            pdst = np.concatenate(pairs_dst)
            sg = np.concatenate(signs)
            key = ps * np.int64(n) + pdst
            uk, inv = np.unique(key, return_inverse=True)
            net = np.bincount(inv, weights=sg)
            return (uk[net > 0] % np.int64(n))

        for pdf in batches:
            out = []
            for s in pdf["id"].to_numpy():
                s = int(s)
                out.append(view_dsts(del_src, ov_old, s))
                out.append(view_dsts(ins_src, ov_new, s))
            dsts = (np.unique(np.concatenate(out)) if out
                    else np.empty(0, np.int64))
            yield pd.DataFrame({"dst_idx": dsts})

    with adaptive_execution(spark, False):
        pdf = (spark.range(0, P, 1, P)
               .mapInPandas(fn, "dst_idx long").toPandas())
    seed = np.unique(pdf["dst_idx"].to_numpy("int64"))
    return spark.createDataFrame(
        pd.DataFrame({"id": ids[seed]}), schema="id long")


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


def graph_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """The inverse of :func:`apply_batch`: derive the (src, dst, op) batch
    that turns one edge snapshot into another — how a crawl-to-crawl
    pipeline feeds the dynamic kernels when it receives full snapshots
    instead of change streams (the reference synthesizes its batches,
    ``main.cxx:38-66``; a production crawler diffs consecutive crawls).

    Two anti-joins on the edge key, each a single co-partitionable
    hash-shuffle; output is O(changed edges). Self-loops present on both
    sides (normalization loops) cancel out.

    When BOTH snapshots carry a ``weight`` column, the key includes it: a
    weight change surfaces as del(old) + ins(new weight) and the 'ins' rows
    carry ``weight`` (which ``apply_batch`` consumes on weighted graphs).
    Mixed inputs — one weighted, one not — are refused rather than
    silently diffed on the unweighted key.

    Roundtrip law (tested):
    ``apply_batch(g_old, graph_diff(g_old.edges, g_new.edges))`` has
    g_new's edge set (and, for weighted graphs, its weights).
    """
    weighted_old = "weight" in old_edges.columns
    weighted_new = "weight" in new_edges.columns
    if weighted_old != weighted_new:
        raise ValueError(
            "graph_diff needs both snapshots weighted or both unweighted — "
            f"got old weighted={weighted_old}, new weighted={weighted_new}")
    if weighted_old:
        key = ["src", "dst", "weight"]
        old = old_edges.select("src", "dst", "weight")
        new = new_edges.select("src", "dst", "weight")
        # a del row's weight is irrelevant to apply_batch (deletion is by
        # (src, dst)); keep the column so the union lines up
        dels = old.join(new, key, "left_anti").withColumn("op", F.lit("del"))
        ins = new.join(old, key, "left_anti").withColumn("op", F.lit("ins"))
        return dels.unionByName(ins)
    old = old_edges.select("src", "dst")
    new = new_edges.select("src", "dst")
    dels = old.join(new, ["src", "dst"], "left_anti") \
        .withColumn("op", F.lit("del"))
    ins = new.join(old, ["src", "dst"], "left_anti") \
        .withColumn("op", F.lit("ins"))
    return dels.unionByName(ins)
