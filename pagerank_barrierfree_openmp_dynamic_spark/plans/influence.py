"""Influence-spread estimation over the link graph — Monte-Carlo
independent-cascade reachability with DETERMINISTIC hash-sampled edge
liveness.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); this is the standard
influence-maximization measurement (Kempe-Kleinberg-Tardos, KDD 2003):
under the independent-cascade model with uniform activation probability
``p``, a seed's expected spread is the expected number of vertices
reachable from it in a random subgraph keeping each edge independently
with probability ``p``. The Monte-Carlo estimator averages the exact
reach over R sampled subgraphs.

Execution shape (scale-first):

- Edge liveness is a PURE FUNCTION of (src, dst, seed+replica) via the
  engine's affine+quadratic mod hash (``functions/sampling.py``) — no
  rand(), so samples are retry-stable under task re-execution, identical
  across engines (the DuckDB oracle re-derives every subgraph), and the
  R replicas need NO materialized copies: one edge-table scan per BFS
  round evaluates all replicas' filters.
- The BFS state is long-format ``(replica, seed, vertex)`` — the same
  sparse multi-source frontier shape as batched PPR/SSSP — advanced
  ``t`` rounds by frontier ⋈ edges equi-joins on ``src`` (reusing the
  edge table's persisted partitioning) with a distinct per round.
  Frontier-only expansion: only newly reached vertices join the next
  round, so a converged replica costs nothing further.
- The estimate is one hash aggregation: reach counts per
  (seed, replica), then mean over replicas — integers until one final
  IEEE division, so the oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.sampling import _A, _B, _M
from ..operators.graph import LinkGraph

# Replica multiplier for the per-edge liveness draw: a full-period MLCG
# multiplier mod 2^31-1 (Fishman & Moore 1986), distinct from the
# engine hash's _A/_B so the replica term mixes multiplicatively rather
# than by shifting src — replica draws stay independent on any vertex-id
# span (an additive src offset would alias replica r at src s with
# replica r+1 at src s-offset).
_R = 1566083941


def _edge_draw(src, dst, rep):
    """Deterministic per-(src, dst, replica) draw in [0, _M): the
    engine's affine+quadratic hash with the replica folded in via its
    own multiplier.  Two-step pmod keeps every intermediate below
    2^62 (no 64-bit overflow)."""
    x = F.pmod(
        F.pmod(src.cast("long"), F.lit(_M)) * F.lit(_A)
        + F.pmod(dst.cast("long"), F.lit(_M)) * F.lit(_B),
        F.lit(_M))
    h = F.pmod(x + F.pmod(rep.cast("long"), F.lit(_M)) * F.lit(_R),
               F.lit(_M))
    return F.pmod(h * h + h, F.lit(_M))


def influence_estimate(graph: LinkGraph, seeds: DataFrame, t: int = 2,
                       replicas: int = 3, p: float = 0.5,
                       seed: int = 7) -> DataFrame:
    """Expected t-hop spread per seed under independent cascade with
    uniform edge probability ``p``, averaged over ``replicas``
    deterministic hash-sampled subgraphs.

    ``seeds``: DataFrame with column ``id``. Returns (id, avg_reach,
    min_reach, max_reach) where reach counts include the seed itself;
    ``avg_reach`` is rounded to 6 dp after the single integer/replicas
    division.
    """
    edges = graph.edges.filter(F.col("src") != F.col("dst")) \
        .select("src", "dst")
    thresh = int(p * _M)
    reps = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")

    # (rep, seed, vertex) frontier, t rounds of frontier-only expansion
    state = seeds.select(reps, F.col("id").alias("s"),
                         F.col("id").alias("v")).distinct() \
        .localCheckpoint(eager=True)
    frontier = state
    for _ in range(t):
        # The replica enters the draw via its own multiplier (_R), not
        # an additive src offset, so draws are independent across
        # replicas regardless of the vertex-id span — still a pure
        # column expression evaluable in the join stage.
        step = (
            frontier.join(edges, frontier.v == edges.src)
            .filter(
                _edge_draw(F.col("src"), F.col("dst"),
                           F.col("rep") + seed) < thresh)
            .select("rep", "s", F.col("dst").alias("v"))
            .distinct()
            .join(state, ["rep", "s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        state = state.unionByName(step).localCheckpoint(eager=True)
        frontier = step
        if step.isEmpty():
            break

    per_rep = state.groupBy("s", "rep").agg(F.count("*").alias("n"))
    return per_rep.groupBy("s").agg(
        F.round(F.sum("n").cast("double") / F.lit(float(replicas)), 6)
        .alias("avg_reach"),
        F.min("n").alias("min_reach"),
        F.max("n").alias("max_reach"),
    ).select(F.col("s").alias("id"), "avg_reach", "min_reach", "max_reach")
