"""TrustRank and spam mass — seeded anti-spam ranking.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); TrustRank (Gyöngyi, Garcia-Molina,
Pedersen 2004) is the canonical web-spam defense built ON PageRank: run
personalized PageRank whose teleport is restricted to a small trusted
seed set, so rank can only flow out of trust. A page whose ordinary
PageRank vastly exceeds its TrustRank earns that rank from outside the
trusted region — its **spam mass** ``(PR − TR) / PR`` approaches 1.

Everything here composes the engine's existing kernels — the point of the
design: ``trustrank`` IS ``pagerank(personalization=seeds)`` (same
options, same convergence machinery, same dense/join-agg paths), seed
selection IS ``pagerank`` on the transposed graph (inverse PageRank —
pages that REACH many pages fast, the paper's seed heuristic), and spam
mass is one join of the two rank vectors. No new iteration loop, no new
shuffle shape; scale behavior is exactly the PageRank section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph, build_graph
from .pagerank import PageRankOptions, pagerank


def _transposed(graph: LinkGraph) -> LinkGraph:
    """The reversed graph, weights (if any) carried along, self-loops
    preserved as-is (transpose fixes them), no re-normalization pass."""
    weighted = "weight" in graph.edges.columns
    e = graph.edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        *(["weight"] if weighted else []))
    return build_graph(
        e,
        vertices=graph.vertices,
        add_self_loops=False,
        weight_col="weight" if weighted else None,
    )


def inverse_pagerank(
    graph: LinkGraph, options: PageRankOptions | None = None
) -> DataFrame:
    """PageRank on the transposed graph — scores pages by how quickly
    trust placed on them reaches the rest of the web (TrustRank §4.2's
    seed-selection heuristic). Returns ``(id, rank)``."""
    tg = _transposed(graph)
    try:
        return pagerank(tg, options or PageRankOptions()).ranks
    finally:
        tg.unpersist()


def select_seeds(
    graph: LinkGraph,
    n_seeds: int,
    options: PageRankOptions | None = None,
) -> DataFrame:
    """Top ``n_seeds`` vertices by inverse PageRank (deterministic
    tie-break by id) — the automated stand-in for the paper's
    human-curated oracle step. Returns an ``id`` column."""
    if n_seeds < 1:
        raise ValueError("n_seeds must be >= 1")
    inv = inverse_pagerank(graph, options)
    return (inv.orderBy(F.desc("rank"), F.asc("id")).limit(n_seeds)
            .select("id"))


def trustrank(
    graph: LinkGraph,
    seeds: DataFrame,
    options: PageRankOptions | None = None,
):
    """Personalized PageRank with uniform teleport over ``seeds`` (an
    ``id`` column) — trust propagates only out of the seed set. Returns
    the full PageRank result object (ranks/iterations/err/metrics)."""
    pers = seeds.select("id", F.lit(1.0).alias("p"))
    return pagerank(graph, options or PageRankOptions(),
                    personalization=pers)


def spam_mass(
    graph: LinkGraph,
    seeds: DataFrame,
    options: PageRankOptions | None = None,
) -> DataFrame:
    """``(id, rank, trust, spam_mass)``: ordinary PageRank, TrustRank
    from ``seeds``, and relative spam mass ``(rank − trust) / rank`` —
    near 1 for pages whose rank arrives from outside the trusted region,
    near 0 (or negative) for well-connected trusted pages. Both runs use
    the same ``options`` so the two vectors are comparable."""
    opts = options or PageRankOptions()
    pr = pagerank(graph, opts).ranks
    tr = trustrank(graph, seeds, opts).ranks.select(
        "id", F.col("rank").alias("trust"))
    return (
        pr.join(tr, "id")
        .select(
            "id", "rank", "trust",
            ((F.col("rank") - F.col("trust")) / F.col("rank"))
            .alias("spam_mass"),
        )
    )
