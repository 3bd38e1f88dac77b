"""Local community detection: personalized-PageRank sweep cut
(Andersen-Chung-Lang 2006 / PageRank-Nibble shape).

Not a reference operator (the reference ranks globally,
``/root/reference/src/pagerank.hxx``); this is the seed-centric
complement to Louvain: "the community around THIS page". The classic
recipe — run PPR from the seed, order vertices by rank/degree, take the
prefix with minimum conductance — expressed fully relationally:

- the PPR vector comes from :func:`plans.ppr.personalized_pagerank_batch`
  (sparse long-format state, one gather join per superstep);
- the sweep ORDER is a distributed top-k (``orderBy().limit()`` →
  TakeOrderedAndProject — never a global single-partition window over
  the full PPR support);
- prefix cut counts come from the **delta trick**: an undirected edge
  with endpoint sweep-positions (p_lo ≤ p_hi) is cut for every prefix
  k in [p_lo, p_hi): it contributes +1 at p_lo and −1 at p_hi, so
  cut(k) is one running sum over positions. No per-prefix edge rescan
  — the whole sweep is two broadcast joins of the edge table against
  the k_max-row prefix plus window cumsums over k_max rows.

Determinism: PPR at fixed iterations is bit-reproducible (at most two
addends per (seed, id) group — see the `ppr_batch_3iter` oracle note);
the sweep key rank/deg divides by an integer, so ordering and the
resulting sweep table match the DuckDB mirror exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.graph import LinkGraph
from .ppr import personalized_pagerank_batch


def sweep_cut(
    graph: LinkGraph,
    scores: DataFrame,
    k_max: int = 50,
    score_col: str = "rank",
) -> DataFrame:
    """Conductance sweep over the top-``k_max`` vertices of ``scores``
    ordered by score/undirected-degree (ties by id). Returns one row per
    prefix: (k, id, score, cut, volume, conductance) where row k's
    ``id`` is the k-th vertex added and cut/volume/conductance describe
    the prefix set {1..k} on the loop-free undirected view. Vertices
    with no undirected edge are excluded (they cannot change any cut)."""
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    und = und.persist()
    m = und.count()
    degu = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id").agg(F.count("*").alias("deg"))
    )
    # ROUNDED ordering key: distributed PPR sums carry run-to-run FP noise
    # (~1e-18 absolute at these magnitudes) in their addend order, and
    # symmetric vertices produce true score/deg ties — ranking the raw
    # double made the k-th vertex a lottery between runs AND engines.
    # Rounding at 1e-12 (far below any real score gap, far above the
    # noise) collapses true ties so the id tie-break decides identically
    # everywhere; the DuckDB oracle ranks on the same rounded key.
    key = F.round(F.col(score_col) / F.col("deg"), 12).alias("key")
    top = (
        scores.join(degu, "id")
        .select("id", F.col(score_col).alias("score"), "deg", key)
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(k_max)
    )
    wpos = Window.orderBy(F.desc("key"), F.asc("id"))
    top = top.withColumn("pos", F.row_number().over(wpos)) \
        .localCheckpoint(eager=True)
    pa = top.select(F.col("id").alias("a"), F.col("pos").alias("pa"))
    pb = top.select(F.col("id").alias("b"), F.col("pos").alias("pb"))
    epos = (
        und.join(F.broadcast(pa), "a", "left")
        .join(F.broadcast(pb), "b", "left")
        .select(
            F.when(F.col("pa").isNull(), F.col("pb"))
            .when(F.col("pb").isNull(), F.col("pa"))
            .otherwise(F.least("pa", "pb")).alias("p_lo"),
            F.when(F.col("pa").isNull() | F.col("pb").isNull(), F.lit(None))
            .otherwise(F.greatest("pa", "pb")).alias("p_hi"),
        )
    )
    deltas = (
        epos.filter(F.col("p_lo").isNotNull())
        .select(F.col("p_lo").alias("pos"), F.lit(1).alias("dv"))
        .unionByName(
            epos.filter(F.col("p_hi").isNotNull())
            .select(F.col("p_hi").alias("pos"), F.lit(-1).alias("dv")))
        .groupBy("pos").agg(F.sum("dv").alias("dv"))
    )
    und.unpersist()
    wcum = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    two_m = 2 * m
    sweep = (
        top.join(deltas, "pos", "left")
        .withColumn("cut", F.sum(F.coalesce("dv", F.lit(0))).over(wcum))
        .withColumn("volume", F.sum("deg").over(wcum))
        .select(
            F.col("pos").alias("k"), "id", "score", "cut", "volume",
            # a prefix covering the whole (or none of the) edge support
            # has undefined conductance — NULL, never a fake best cut
            F.when(
                F.least(F.col("volume"), F.lit(two_m) - F.col("volume")) > 0,
                F.col("cut") / F.least(F.col("volume"),
                                       F.lit(two_m) - F.col("volume")))
            .otherwise(F.lit(None).cast("double")).alias("conductance"),
        )
    )
    return sweep


def local_community(
    graph: LinkGraph,
    seed: int,
    iterations: int = 3,
    damping: float = 0.85,
    k_max: int = 50,
) -> DataFrame:
    """ACL-style local community around ``seed``: the PPR sweep table
    (k, id, score, cut, volume, conductance). The community is the
    prefix minimizing conductance; the full table is returned so callers
    can apply their own stopping rule (and so the result is a pure
    function checkable against a SQL mirror)."""
    spark = graph.edges.sparkSession
    seeds = spark.createDataFrame([(int(seed),)], "id long")
    apr = personalized_pagerank_batch(
        graph, seeds, iterations=iterations, damping=damping
    ).drop("seed")
    return sweep_cut(graph, apr, k_max=k_max, score_col="rank")


def best_cut(sweep: DataFrame) -> DataFrame:
    """One-row best prefix: minimum conductance, smallest k on ties;
    degenerate prefixes (NULL conductance) never win."""
    w = Window.orderBy(F.asc("conductance"), F.asc("k"))
    return (
        sweep.filter(F.col("conductance").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
