"""Co-citation similarity — link-structure "related pages".

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); co-citation (Small 1973) is the
classic link-based relatedness signal: pages a and b are similar when
many pages link to BOTH. The score here is the Jaccard of in-neighbor
sets, ``|N⁻(a) ∩ N⁻(b)| / |N⁻(a) ∪ N⁻(b)|``; swapping edge direction
gives bibliographic coupling (shared out-links).

Scale shape — candidate-bounded, like the MinHash verify: pairs are
generated ONLY through shared citers (a self-join of the edge table on
src), so a pair with zero common in-neighbors never materializes. The
quadratic hazard is a high-out-degree citer (a directory/boilerplate
page linking k pages yields k²/2 pair rows); ``max_fan`` drops citers
above the threshold BEFORE the join — the standard co-citation practice
(a page linking to everything carries no similarity signal) and the
same degenerate-bucket k² cap the LSH joins use. One edge self-join +
one map-side-combinable pair aggregation + a broadcast-sized degree
join; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph


def cocitation_similarity(
    graph: LinkGraph,
    min_shared: int = 1,
    max_fan: int | None = None,
    direction: str = "in",
) -> DataFrame:
    """Pairs ``(a, b, shared, jaccard)`` with ``a < b``:
    ``shared`` = number of common in-neighbors (``direction="in"``,
    co-citation) or common out-neighbors (``"out"``, bibliographic
    coupling), ``jaccard`` = shared / (deg(a) + deg(b) − shared) over
    the corresponding neighbor sets. Self-loops are ignored. Citers
    with fan-out above ``max_fan`` are excluded from pair generation
    AND from the degrees, keeping the score consistent under the cap."""
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "out":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if max_fan is not None:
        ok = (e.groupBy("src").agg(F.count("*").alias("_f"))
              .filter(F.col("_f") <= max_fan).select("src"))
        e = e.join(F.broadcast(ok), "src", "left_semi")
    deg = e.groupBy("dst").agg(F.count("*").alias("_d"))
    pairs = (
        e.alias("x").join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs
        .join(deg.select(F.col("dst").alias("a"), F.col("_d").alias("_da")),
              "a")
        .join(deg.select(F.col("dst").alias("b"), F.col("_d").alias("_db")),
              "b")
        .select(
            "a", "b", "shared",
            (F.col("shared").cast("double")
             / (F.col("_da") + F.col("_db") - F.col("shared"))
             .cast("double")).alias("jaccard"),
        )
    )
