"""HITS (hubs & authorities) over the directed edge table.

Not present in the reference repo (its only kernel is PageRank,
``/root/reference/src/pagerank.hxx``); HITS is the other classic
link-analysis fixed point over exactly the same (src, dst) edge table and
shuffle shapes, so a link-graph engine user expects it next to PageRank.

Recurrence (Kleinberg 1998, L1-normalized so scores are comparable across
graph sizes and SQL-reproducible without a square root):

    auth_t(v) = Σ_{(u,v) ∈ E} hub_{t-1}(u)    then auth_t /= Σ auth_t
    hub_t(u)  = Σ_{(u,v) ∈ E} auth_t(v)       then hub_t  /= Σ hub_t

with hub_0 = 1/N. Vertices with no in-edges have auth 0, no out-edges hub
0. The L1 norm and the L2 norm of the classic formulation yield the same
fixed-point *direction* (both are the principal eigenvectors of AᵀA / AAᵀ);
L1 keeps every superstep a plain SUM — one aggregate, no rsqrt — and makes
the unrolled DuckDB oracle exact.

Scale shape: the auth gather joins the src-partitioned edge table against
the hub state (broadcast when N ≤ broadcast_vertices, else a shuffled
hash join on src); the hub gather joins a ONCE-per-call dst-partitioned
copy of the edges against the auth state. Both aggregates are map-side
combinable groupBys. State frames are (id, score) — never collected; the
only driver-side values are the two scalar norm sums and the L∞ error per
superstep, which ride along with the state-materialization jobs as
CollectMetrics observations (``df.observe``) — zero standalone scalar-agg
actions per superstep.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


@dataclass
class HitsResult:
    scores: DataFrame  # (id, hub, auth)
    iterations: int
    err: float


def hits(
    graph: LinkGraph,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    broadcast_vertices: int = 2_000_000,
) -> HitsResult:
    """Iterate the HITS recurrence to an L∞ fixed point (or a fixed number
    of sweeps with ``tolerance=0.0``). Returns (id, hub, auth) for every
    vertex.

    Run this on a graph built with ``add_self_loops=False``: a self-loop
    makes a page its own endorser, which PageRank's teleport correction
    needs but HITS semantics do not.
    """
    spark = graph.edges.sparkSession
    n = graph.num_vertices
    small = n <= broadcast_vertices

    edges = graph.edges.select("src", "dst")
    # The hub gather groups by src and can reuse the persisted src
    # partitioning; the auth->hub join keys on dst, so materialize a
    # dst-partitioned copy ONCE (one shuffle per call, not per superstep).
    edges_by_dst = (
        edges.repartition(graph.partitions, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_by_dst.count()

    def _bcast(state: DataFrame) -> DataFrame:
        return F.broadcast(state) if small else state

    vtx = graph.vertices
    state = vtx.select(
        "id",
        F.lit(1.0 / n).alias("hub"),
        F.lit(0.0).alias("auth"),
    ).localCheckpoint(eager=True)

    it = 0
    err = float("inf")
    with adaptive_execution(spark, False):
        while it < max_iterations:
            # Scalar norm sums and the L∞ error ride along with the state
            # materialization jobs via CollectMetrics (df.observe) — ZERO
            # standalone scalar-agg actions per superstep (a 500-iteration
            # run used to pay ~1500 extra driver round-trips for them).
            hub_in = _bcast(
                state.select(F.col("id").alias("_hid"), F.col("hub").alias("_h")))
            a_obs = Observation()
            a_raw = (
                edges.join(hub_in, edges.src == F.col("_hid"))
                .groupBy("dst")
                .agg(F.sum("_h").alias("_a"))
                .observe(a_obs, F.sum("_a").alias("tot"))
            ).localCheckpoint(eager=True)
            a_tot = a_obs.get["tot"] or 1.0
            auth = vtx.join(a_raw, vtx.id == a_raw.dst, "left").select(
                vtx.id, (F.coalesce("_a", F.lit(0.0)) / F.lit(a_tot)).alias("auth"))

            auth_in = _bcast(
                auth.select(F.col("id").alias("_aid"), F.col("auth").alias("_a")))
            h_obs = Observation()
            h_raw = (
                edges_by_dst.join(auth_in, edges_by_dst.dst == F.col("_aid"))
                .groupBy("src")
                .agg(F.sum("_a").alias("_h"))
                .observe(h_obs, F.sum("_h").alias("tot"))
            ).localCheckpoint(eager=True)
            h_tot = h_obs.get["tot"] or 1.0
            hub = vtx.join(h_raw, vtx.id == h_raw.src, "left").select(
                vtx.id, (F.coalesce("_h", F.lit(0.0)) / F.lit(h_tot)).alias("hub"))

            # eager_state, not bare localCheckpoint: the state sits on both
            # sides of this join, so inherited size ESTIMATES would compound
            # geometrically with the iteration count (see session.eager_state)
            e_obs = Observation()
            nxt = eager_state(
                hub.join(auth, "id")
                .join(state.select(F.col("id"), F.col("hub").alias("_ph"),
                                   F.col("auth").alias("_pa")), "id")
                .select(
                    "id", "hub", "auth",
                    F.greatest(
                        F.abs(F.col("hub") - F.col("_ph")),
                        F.abs(F.col("auth") - F.col("_pa")),
                    ).alias("_d"),
                )
                .observe(e_obs, F.max("_d").alias("err"))
            )
            err = e_obs.get["err"] or 0.0
            state = nxt.select("id", "hub", "auth")
            it += 1
            if tolerance > 0.0 and err <= tolerance:
                break
    edges_by_dst.unpersist()
    return HitsResult(scores=state, iterations=it, err=float(err))


def hits_arrow(
    graph: LinkGraph,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    *,
    dense=None,
) -> HitsResult:
    """Dense Arrow-kernel HITS — same recurrence and output as
    :func:`hits`, FP-identical up to summation order. Each superstep is
    TWO narrow jobs over the resident slice files: the auth gather over
    the base (dst-residue) slices and the hub gather over the reverse
    (src-residue) slices — the same slice pair the CC/LPA kernels use
    (``_cc_min_fn``); no edge bytes move after warmup. The hub/auth
    vectors live driver-side (the documented O(N) bound shared with
    ``pagerank_arrow``; beyond it, :func:`hits` is the fully-sharded
    fallback), normalization and the L∞ check are NumPy ops between
    jobs."""
    import numpy as np
    import pandas as pd

    from ..session import adaptive_execution
    from .pagerank_arrow import DenseGraph, _hits_gather_fn, _load_rslice  # noqa: F401

    dg = dense or DenseGraph(graph)
    if dg.overlays:
        raise ValueError(
            "hits_arrow needs gen-0 slices — rebuild the dense view via "
            "build_graph + DenseGraph after applying batches")
    dg.materialize()
    dg.materialize_reverse()
    spark = graph.edges.sparkSession
    sc = spark.sparkContext
    n, P = dg.n, dg.n_slices
    slice_df = spark.range(0, P, 1, P)

    def _gather(vec: "np.ndarray", direction: str) -> "np.ndarray":
        vec_bc = sc.broadcast(vec)
        parts = slice_df.mapInPandas(
            _hits_gather_fn(dg.resident_dir, dg.epoch, P, vec_bc, direction),
            "slice int, seg binary",
        ).toPandas()
        out = np.empty_like(vec)
        for s, blob in zip(parts["slice"], parts["seg"]):
            out[int(s)::P] = np.frombuffer(blob, dtype=np.float64)
        vec_bc.destroy()
        return out

    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    it, err = 0, float("inf")
    with adaptive_execution(spark, False):
        while it < max_iterations:
            a_new = _gather(hub, "auth")
            s = a_new.sum()
            if s > 0:
                a_new /= s
            h_new = _gather(a_new, "hub")
            s = h_new.sum()
            if s > 0:
                h_new /= s
            err = float(max(np.abs(h_new - hub).max(),
                            np.abs(a_new - auth).max()))
            hub, auth = h_new, a_new
            it += 1
            if tolerance > 0.0 and err <= tolerance:
                break
    scores = spark.createDataFrame(
        pd.DataFrame({"id": dg.ids, "hub": hub, "auth": auth}))
    if dense is None:
        dg.unpersist()
    return HitsResult(scores=scores, iterations=it, err=err)
