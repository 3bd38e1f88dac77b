"""Link prediction over the link graph — Adamic–Adar and friends.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); Adamic–Adar (2003) is the classic
common-neighbor link-prediction score: a missing link (a, b) is likely
when many pages cite BOTH a and b, with each shared citer w discounted
by how indiscriminately it links — weight ``1/ln(fanout(w))``. The
``resource_allocation`` variant (Zhou 2009) discounts harder with
``1/fanout(w)``; ``common_neighbors`` is the unweighted count.

Directed adaptation: "neighbors" are in-neighbors (citers), the same
convention as co-citation (``plans/cocitation.py``) — a shared citer is
evidence that a and b belong together, and the citer's discount uses its
out-degree (its fan). A citer generating a pair necessarily has fan ≥ 2,
so ``ln(fan) ≥ ln 2 > 0`` — no singular weights by construction.

Scale shape — identical to the co-citation join and the MinHash verify:
pairs materialize ONLY through shared citers (edge self-join on src), so
the cost is Σ_w fan(w)², never |V|². The quadratic hazard is a directory
page citing k pages (k²/2 pair rows); ``max_fan`` drops such citers
BEFORE the join — principled here beyond the usual k² cap, because the
Adamic–Adar weight of a huge-fan citer is ~0 anyway (that is the whole
point of the discount). One self-join + one map-side-combinable pair
aggregation + a broadcast-sized fan join; the optional known-link
anti-join is a left_anti on the symmetrized pair key. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph

_MODES = ("adamic_adar", "resource_allocation", "common_neighbors")


def adamic_adar(
    graph: LinkGraph,
    min_shared: int = 1,
    max_fan: int | None = None,
    exclude_linked: bool = True,
    mode: str = "adamic_adar",
) -> DataFrame:
    """Scored candidate links ``(a, b, shared, score)`` with ``a < b``:
    ``shared`` = number of common citers (pages linking to both a and b),
    ``score`` = Σ over shared citers w of ``1/ln(fan(w))`` (Adamic–Adar),
    ``1/fan(w)`` (resource allocation) or ``1`` (common neighbors), where
    ``fan(w)`` is w's out-degree after self-loop removal (and after the
    ``max_fan`` cut, so the discount matches the pair-generating set).
    Self-loops are ignored. With ``exclude_linked`` (the link-prediction
    default) pairs already connected in either direction are dropped —
    the score then ranks MISSING links only."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # citers with fan < 2 can't generate a pair — drop them before the
    # weight projection (also keeps ln(fan) ≥ ln 2, ANSI-safe) and before
    # the broadcast, which only carries pair-generating citers
    fan = (e.groupBy("src").agg(F.count("*").alias("_fan"))
           .filter(F.col("_fan") >= 2))
    if max_fan is not None:
        fan = fan.filter(F.col("_fan") <= max_fan)
    if mode == "adamic_adar":
        w = (F.lit(1.0) / F.log(F.col("_fan").cast("double"))).alias("_w")
    elif mode == "resource_allocation":
        w = (F.lit(1.0) / F.col("_fan").cast("double")).alias("_w")
    else:
        w = F.lit(1.0).alias("_w")
    # fan is one row per pair-generating citer — broadcast-sized relative
    # to edges; the inner join doubles as the fan ≥ 2 / max_fan cut
    ew = e.join(F.broadcast(fan.select("src", w)), "src")
    pairs = (
        ew.alias("x").join(ew.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").alias("shared"), F.sum("x._w").alias("score"))
        .filter(F.col("shared") >= min_shared)
    )
    if exclude_linked:
        linked = e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).distinct()
        pairs = pairs.join(linked, ["a", "b"], "left_anti")
    return pairs.select("a", "b", "shared", F.col("score").cast("double"))
