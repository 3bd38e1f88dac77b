"""Katz and eigenvector centrality over the directed edge table.

Not in the reference repo (its only kernel is PageRank,
``/root/reference/src/pagerank.hxx``); Katz (1953) and eigenvector
centrality are the other two members of the classic spectral-ranking
family a link-graph engine user expects next to PageRank and HITS —
PageRank IS Katz with the per-source out-degree normalization and a
stochastic teleport, and eigenvector centrality is its α→1/λ limit.

Recurrences (both gather over IN-edges — prestige flows along links):

    eigenvector:  x_t(v) = Σ_{(u,v) ∈ E} w(u,v) · x_{t-1}(u),
                  then x_t /= Σ x_t          (L1, SQL-exact, x_0 = 1/N)
    Katz:         x_t(v) = β + α · Σ_{(u,v) ∈ E} w(u,v) · x_{t-1}(u),
                  x_0 = β; optional final L1 normalization

L1 rather than the textbook L2 normalization: same fixed-point
*direction* (scalar multiples), but every superstep stays one SUM — no
rsqrt — which keeps the unrolled DuckDB oracle exact (same argument as
``plans/hits.py``). Run on a graph built with ``add_self_loops=False``:
a self-loop makes a page endorse itself, which PageRank's teleport
correction needs but these semantics do not.

Scale shape (identical to the HITS auth gather): the state frame
(id, score) is broadcast when N ≤ ``broadcast_vertices`` (the edge table
never moves — the join is map-side against the persisted src
partitioning), else a shuffled hash join on src; the gather is a
map-side-combinable groupBy(dst). Driver-side values are one scalar
norm / error per superstep, riding along with the state-materialization
jobs as CollectMetrics observations (``df.observe``) — zero standalone
scalar-agg actions; state is never collected.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


@dataclass
class CentralityResult:
    scores: DataFrame  # (id, score)
    iterations: int
    err: float


def _in_gather(edges: DataFrame, state: DataFrame, small: bool,
               weighted: bool) -> DataFrame:
    """Σ over in-edges of w·score: (dst, _s) partial sums, map-side
    combinable; the edge table keeps its persisted src partitioning."""
    s = state.select(F.col("id").alias("_sid"), F.col("score").alias("_x"))
    if small:
        s = F.broadcast(s)
    contrib = (F.col("_x") * F.col("weight")) if weighted else F.col("_x")
    return (
        edges.join(s, edges.src == F.col("_sid"))
        .groupBy("dst")
        .agg(F.sum(contrib).alias("_s"))
    )


def eigenvector_centrality(
    graph: LinkGraph,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    broadcast_vertices: int = 2_000_000,
) -> CentralityResult:
    """Power iteration on the (weighted) in-adjacency, L1-normalized each
    superstep; stops at L∞ ≤ tolerance (or a fixed sweep count with
    ``tolerance=0.0``). Vertices with no in-edges score 0."""
    spark = graph.edges.sparkSession
    n = graph.num_vertices
    small = n <= broadcast_vertices
    weighted = "weight" in graph.edges.columns
    edges = graph.edges
    vtx = graph.vertices

    state = vtx.select("id", F.lit(1.0 / n).alias("score")).localCheckpoint(
        eager=True)
    it, err = 0, float("inf")
    with adaptive_execution(spark, False):
        while it < max_iterations:
            # norm sum and L∞ error ride along with the two state
            # materialization jobs via CollectMetrics (df.observe) — ZERO
            # standalone scalar-agg actions per superstep
            t_obs = Observation()
            raw = (
                _in_gather(edges, state, small, weighted)
                .observe(t_obs, F.sum("_s").alias("tot"))
            ).localCheckpoint(eager=True)
            tot = t_obs.get["tot"] or 1.0
            e_obs = Observation()
            nxt = eager_state(
                vtx.join(raw, vtx.id == raw.dst, "left")
                .join(state.select(F.col("id"), F.col("score").alias("_p")),
                      "id")
                .select(
                    "id",
                    (F.coalesce("_s", F.lit(0.0)) / F.lit(tot)).alias("score"),
                    "_p",
                )
                .observe(e_obs,
                         F.max(F.abs(F.col("score") - F.col("_p"))).alias("err"))
            )
            err = e_obs.get["err"] or 0.0
            state = nxt.select("id", "score")
            it += 1
            if tolerance > 0.0 and err <= tolerance:
                break
    return CentralityResult(scores=state, iterations=it, err=float(err))


def katz_centrality(
    graph: LinkGraph,
    alpha: float | str = "auto",
    beta: float = 1.0,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    broadcast_vertices: int = 2_000_000,
    normalized: bool = True,
) -> CentralityResult:
    """Katz centrality x = β·1 + α·Aᵀx by fixed-point iteration from
    x_0 = β. Converges iff α < 1/λ_max(A); ``alpha="auto"`` picks
    0.85 / min(max out-degree, max in-degree) — a guaranteed-convergent
    bound on 1/λ_max for a non-negative adjacency (Perron–Frobenius: λ_max
    is at most the smaller of the max row/column sums), computed in one
    edge-table aggregation. An explicit α is the caller's modeling knob
    (the way the reference picks the PageRank damping factor); if the
    iteration diverges under it the loop raises instead of returning
    garbage. ``normalized=True`` L1-normalizes the final vector so scores
    are comparable across graph sizes."""
    spark = graph.edges.sparkSession
    n = graph.num_vertices
    small = n <= broadcast_vertices
    weighted = "weight" in graph.edges.columns
    edges = graph.edges
    vtx = graph.vertices

    if alpha == "auto":
        wcol = F.col("weight") if weighted else F.lit(1.0)
        per = edges.select(
            F.explode(F.array(
                F.struct(F.col("src").alias("v"), wcol.alias("ow"),
                         F.lit(0.0).alias("iw")),
                F.struct(F.col("dst").alias("v"), F.lit(0.0).alias("ow"),
                         wcol.alias("iw")),
            )).alias("e")
        ).groupBy("e.v").agg(F.sum("e.ow").alias("ow"),
                             F.sum("e.iw").alias("iw"))
        row = per.agg(F.max("ow"), F.max("iw")).collect()[0]
        bound = min(float(row[0] or 1.0), float(row[1] or 1.0))
        alpha = 0.85 / max(bound, 1.0)
    elif not (isinstance(alpha, (int, float)) and 0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1) or 'auto'")

    state = vtx.select("id", F.lit(float(beta)).alias("score")).localCheckpoint(
        eager=True)
    it, err = 0, float("inf")
    with adaptive_execution(spark, False):
        while it < max_iterations:
            raw = _in_gather(edges, state, small, weighted)
            # L∞ error rides along with the state materialization via
            # CollectMetrics (df.observe) — no standalone scalar-agg action
            e_obs = Observation()
            nxt = eager_state(
                vtx.join(raw, vtx.id == raw.dst, "left")
                .join(state.select(F.col("id"), F.col("score").alias("_p")),
                      "id")
                .select(
                    "id",
                    (F.lit(float(beta))
                     + F.lit(float(alpha)) * F.coalesce("_s", F.lit(0.0))
                     ).alias("score"),
                    "_p",
                )
                .observe(e_obs,
                         F.max(F.abs(F.col("score") - F.col("_p"))).alias("err"))
            )
            err = e_obs.get["err"] or 0.0
            if not math.isfinite(err) or err > 1e15 * abs(beta):
                raise ValueError(
                    f"Katz iteration diverged (L-inf step {err:.3g} at sweep "
                    f"{it + 1}): alpha={alpha} >= 1/lambda_max for this "
                    "graph — lower alpha or use alpha='auto'")
            state = nxt.select("id", "score")
            it += 1
            if tolerance > 0.0 and err <= tolerance:
                break
    if normalized:
        tot = state.agg(F.sum("score")).collect()[0][0] or 1.0
        state = state.select("id", (F.col("score") / F.lit(tot)).alias("score"))
    return CentralityResult(scores=state, iterations=it, err=float(err))
