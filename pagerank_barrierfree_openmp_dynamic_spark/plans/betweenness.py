"""Betweenness centrality — sampled exact Brandes, plus an exact 2-hop
variant.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); betweenness is the standard
"broker" centrality, and Brandes (2001) with source sampling is how it
is computed at web scale (exact all-sources is Θ(nm)).

:func:`betweenness_sampled` — exact Brandes dependency accumulation from
a set of sample sources, all phases as DataFrame joins in long format:

- forward BFS: frontier rows ``(s, v, dist, sigma)`` where ``sigma``
  counts shortest s→v paths; each level is one frontier⋈edges join, an
  anti-join against visited pairs, and a (s, v) sigma-sum — the
  multi-source generalization of ``plans/distances.landmark_distances``
  with path counts.
- backward sweep: levels processed deepest-first; level t's dependency
  is one join of (s, v)@t against its successors (s, w)@t+1:
  ``delta(v) += Σ sigma_v/sigma_w · (1 + delta_w)``.

State is Σ_s |reachable(s)| rows — source count and vertex count scale
independently, the same contract as the landmark sketches. Scores are
the raw sums over the given sources (callers rescale by n/k for the
unbiased estimator).

:func:`two_hop_betweenness` — the exact horizon-2 metric: for every
ordered pair (s, t) at distance exactly 2, each middle vertex of an
s→v→t shortest path receives ``1/σ₂(s,t)`` (σ₂ = number of such
middles). One wedge self-join (the triangle-counting shape) + two
aggregations — no iteration, fully SQL-expressible, driver-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def two_hop_betweenness(graph: LinkGraph) -> DataFrame:
    """Exact 2-hop betweenness ``(id, score)`` for every vertex that
    mediates at least one distance-2 pair; vertices with score 0 are
    absent (sparse)."""
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    direct = e.select(F.col("src").alias("_s"), F.col("dst").alias("_t"))
    wedges = (
        e.alias("x").join(e.alias("y"), F.col("x.dst") == F.col("y.src"))
        .filter(F.col("x.src") != F.col("y.dst"))
        .select(F.col("x.src").alias("s"), F.col("x.dst").alias("v"),
                F.col("y.dst").alias("t"))
        # d(s,t)=2 requires no direct edge s->t
        .join(direct, (F.col("s") == F.col("_s"))
              & (F.col("t") == F.col("_t")), "left_anti")
    )
    sigma = wedges.groupBy("s", "t").agg(F.count("*").alias("_sig"))
    return (
        wedges.join(sigma, ["s", "t"])
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("_sig")).alias("score"))
    )


def betweenness_sampled(
    graph: LinkGraph,
    sources: DataFrame | int,
    max_depth: int | None = None,
) -> DataFrame:
    """Exact Brandes betweenness restricted to the given sample sources
    (an ``id`` DataFrame, or an int k → ``top_degree_landmarks``).
    Returns ``(id, score)`` — raw dependency sums; endpoints excluded
    per the standard definition. ``max_depth`` truncates the BFS (a
    horizon-bounded variant) when given."""
    from .distances import top_degree_landmarks

    spark = graph.edges.sparkSession
    if isinstance(sources, int):
        sources = top_degree_landmarks(graph, sources)
    edges = (graph.edges.select("src", "dst")
             .filter(F.col("src") != F.col("dst")))

    frontier = sources.select(
        F.col("id").alias("s"), F.col("id").alias("v"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma")).localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier
    t, limit = 0, max_depth if max_depth is not None else graph.num_vertices
    with adaptive_execution(spark, False):
        while t < limit:
            t += 1
            nxt = (
                frontier.join(edges, frontier.v == edges.src)
                .select("s", F.col("dst").alias("v"), "sigma")
                .join(visited.select(F.col("s").alias("_ks"),
                                     F.col("v").alias("_kv")),
                      (F.col("s") == F.col("_ks"))
                      & (F.col("v") == F.col("_kv")), "left_anti")
                .groupBy("s", "v")
                .agg(F.sum("sigma").alias("sigma"))
                .select("s", "v", F.lit(t).alias("dist"), "sigma")
            )
            frontier = eager_state(nxt)
            if frontier.isEmpty():
                t -= 1
                break
            levels.append(frontier)
            visited = eager_state(visited.unionByName(frontier))

        # backward sweep, deepest level first; delta starts at 0
        delta = levels[-1].select(
            "s", "v", "sigma", F.lit(0.0).alias("delta"))
        acc = None  # (id, score) partial sums, endpoints excluded
        for depth in range(len(levels) - 1, 0, -1):
            contrib = delta.select(F.col("s"), F.col("v").alias("id"),
                                   (F.col("delta")).alias("_d")) \
                .groupBy("id").agg(F.sum("_d").alias("score"))
            acc = contrib if acc is None else eager_state(
                acc.unionByName(contrib).groupBy("id")
                .agg(F.sum("score").alias("score")))
            up = levels[depth - 1]
            succ = delta.select(F.col("s").alias("_ws"),
                                F.col("v").alias("_wv"),
                                F.col("sigma").alias("_wsig"),
                                F.col("delta").alias("_wd"))
            dep = (
                up.join(edges, up.v == edges.src)
                .join(succ, (F.col("s") == F.col("_ws"))
                      & (F.col("dst") == F.col("_wv")))
                .select("s", "v", "sigma",
                        (F.col("sigma") / F.col("_wsig")
                         * (F.lit(1.0) + F.col("_wd"))).alias("_c"))
                .groupBy("s", "v", "sigma")
                .agg(F.sum("_c").alias("delta"))
            )
            # vertices at this level with no DAG successor keep delta 0
            delta = eager_state(
                up.join(dep.select(F.col("s").alias("_ds"),
                                   F.col("v").alias("_dv"),
                                   F.col("delta")),
                        (up.s == F.col("_ds")) & (up.v == F.col("_dv")),
                        "left")
                .select("s", "v", "sigma",
                        F.coalesce("delta", F.lit(0.0)).alias("delta")))
        final = delta.filter(F.col("v") != F.col("s")).select(
            F.col("v").alias("id"), F.col("delta").alias("score")) \
            .groupBy("id").agg(F.sum("score").alias("score"))
        acc = final if acc is None else (
            acc.unionByName(final).groupBy("id")
            .agg(F.sum("score").alias("score")))
    return acc.filter(F.col("score") > 0.0)
