"""SALSA (Stochastic Approach for Link-Structure Analysis) over the
directed edge table.

Not present in the reference repo (its only kernel is PageRank,
``/root/reference/src/pagerank.hxx``); SALSA (Lempel & Moran 2000) is the
third classic link-analysis fixed point after PageRank and HITS, and the
one production web-search stacks historically shipped next to PageRank —
it fixes HITS's topic-drift (TKC) effect by replacing the raw adjacency
sums with random-walk steps on the bipartite hub/authority graph.

Recurrence (power iteration on the two walk chains, L1-normalized each
half-step so scores are comparable across graph sizes and the unrolled
DuckDB oracle is exact):

    auth_t(v) = Σ_{(u,v) ∈ E} hub_{t-1}(u) · w(u,v)/W_out(u)   then /= Σ
    hub_t(u)  = Σ_{(u,v) ∈ E} auth_t(v) · w(u,v)/W_in(v)       then /= Σ

with hub_0 = 1/N, W_out(u) = Σ_{(u,·)} w, W_in(v) = Σ_{(·,v)} w (counts on
unweighted graphs). This is exactly HITS with column-stochastic walk
matrices: auth = Wᵣᵀ·hub and hub = W_c·auth where Wᵣ is the row-normalized
and W_c the column-normalized adjacency. At the fixed point the authority
score of v inside its bipartite component is proportional to indeg(v) — a
property the tests exploit as an independent closed-form check.

Like HITS, run it on a graph built with ``add_self_loops=False``
(a self-loop makes a page its own endorser).

Scale shape: the auth gather reuses ``graph.adj`` VERBATIM — the
(src, dst, w = weight/Σ out-weights) scatter table PageRank already
persists, src-partitioned, so no new edge shuffle for the forward walk.
The hub gather needs the column-normalized transpose, materialized ONCE
per call as a dst-partitioned persisted copy (one shuffle per call, not
per superstep — the HITS ``edges_by_dst`` pattern). Both gathers are
map-side-combinable groupBys against a broadcast (N ≤ broadcast_vertices)
or shuffled-hash state frame; the only driver-side values per superstep
are two scalar norm sums and the L∞ error, which ride along with the
state-materialization jobs as CollectMetrics observations (``df.observe``)
— zero standalone scalar-agg actions per superstep.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


@dataclass
class SalsaResult:
    scores: DataFrame  # (id, hub, auth)
    iterations: int
    err: float


def salsa(
    graph: LinkGraph,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    broadcast_vertices: int = 2_000_000,
) -> SalsaResult:
    """Iterate the SALSA recurrence to an L∞ fixed point (or a fixed
    number of sweeps with ``tolerance=0.0``). Returns (id, hub, auth) for
    every vertex. Weighted graphs walk proportionally to edge weight on
    both chains."""
    spark = graph.edges.sparkSession
    n = graph.num_vertices
    small = n <= broadcast_vertices

    # Forward walk matrix = graph.adj as-is (src, dst, w/W_out), already
    # src-partitioned + persisted by build_graph. Backward walk matrix is
    # built once: column-normalize, then dst-partition.
    fwd = graph.adj
    if graph.weighted:
        inw = graph.edges.groupBy("dst").agg(F.sum("weight").alias("_iw"))
        bwd = (
            graph.edges.join(inw, "dst")
            .select("src", "dst", (F.col("weight") / F.col("_iw")).alias("w"))
        )
    else:
        ind = graph.edges.groupBy("dst").agg(F.count("*").alias("_id"))
        bwd = (
            graph.edges.join(ind, "dst")
            .select("src", "dst", (F.lit(1.0) / F.col("_id")).alias("w"))
        )
    bwd = (
        bwd.repartition(graph.partitions, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bwd.count()

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
            # standalone scalar-agg actions per superstep.
            hub_in = _bcast(
                state.select(F.col("id").alias("_hid"), F.col("hub").alias("_h")))
            a_obs = Observation()
            a_raw = (
                fwd.join(hub_in, fwd.src == F.col("_hid"))
                .groupBy("dst")
                .agg(F.sum(F.col("_h") * F.col("w")).alias("_a"))
                .observe(a_obs, F.sum("_a").alias("tot"))
            ).localCheckpoint(eager=True)
            a_tot = a_obs.get["tot"] or 1.0
            auth = vtx.join(a_raw, vtx.id == a_raw.dst, "left").select(
                vtx.id, (F.coalesce("_a", F.lit(0.0)) / F.lit(a_tot)).alias("auth"))

            auth_in = _bcast(
                auth.select(F.col("id").alias("_aid"), F.col("auth").alias("_a")))
            h_obs = Observation()
            h_raw = (
                bwd.join(auth_in, bwd.dst == F.col("_aid"))
                .groupBy("src")
                .agg(F.sum(F.col("_a") * F.col("w")).alias("_h"))
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
    bwd.unpersist()
    return SalsaResult(scores=state, iterations=it, err=float(err))


def salsa_arrow(
    graph: LinkGraph,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    *,
    dense=None,
) -> SalsaResult:
    """Dense Arrow-kernel SALSA — same recurrence and output as
    :func:`salsa`, FP-identical up to summation order. The walk division
    happens in the DRIVER (q = hub/outdeg resp. auth/indeg, O(N) NumPy),
    so each half-superstep is exactly a HITS gather over the resident
    slices (``_hits_gather_fn`` reused verbatim): the auth gather over the
    base dst-residue slices, the hub gather over the reverse src-residue
    slices — no edge bytes move after warmup. The in-degree vector is
    computed once per call as one gather of ones. Unweighted graphs only
    (the resident slices carry no per-edge walk weights for the backward
    chain); :func:`salsa` is the weighted / >O(N)-driver fallback."""
    import numpy as np
    import pandas as pd

    from .pagerank_arrow import DenseGraph, _hits_gather_fn

    if graph.weighted:
        raise ValueError(
            "salsa_arrow supports unweighted graphs only — use salsa() "
            "for weight-proportional walks")
    dg = dense or DenseGraph(graph)
    if dg.overlays:
        raise ValueError(
            "salsa_arrow needs gen-0 slices — rebuild the dense view via "
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

    inv_out = dg.inv_deg()
    indeg = _gather(np.ones(n), "auth")
    inv_in = np.where(indeg > 0, 1.0 / np.maximum(indeg, 1.0), 0.0)

    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    it, err = 0, float("inf")
    with adaptive_execution(spark, False):
        while it < max_iterations:
            a_new = _gather(hub * inv_out, "auth")
            s = a_new.sum()
            if s > 0:
                a_new /= s
            h_new = _gather(a_new * inv_in, "hub")
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
    return SalsaResult(scores=scores, iterations=it, err=err)
