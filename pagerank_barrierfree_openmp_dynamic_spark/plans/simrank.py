"""Truncated SimRank — "two pages are similar when similar pages link
to them".

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); SimRank (Jeh & Widom, KDD 2002)
is the classic recursive link-similarity measure, the natural step past
co-citation (``plans/cocitation.py``): first-iteration SimRank IS
normalized co-citation, and the second iteration also rewards pairs
whose in-neighbors are merely SIMILAR rather than identical.

    s(a,a) = 1
    s(a,b) = C / (|I(a)||I(b)|) · Σ_{u∈I(a)} Σ_{v∈I(b)} s(u,v)

Exact all-pairs SimRank is O(n²) state — a non-starter at link-graph
scale. This implementation makes the two standard truncations, both
explicit and both mirrored by the oracle:

- **Candidate-bounded support**: scores are computed only for pairs
  with ≥1 common in-neighbor (the co-citation candidate set), the same
  "pairs only through shared citers" shape as
  ``cocitation_similarity`` and the MinHash verify. Pairs similar only
  transitively never materialize; their true score is small (≤ C²·s of
  the supporting pair) and pruning them is the standard SimRank-join
  practice.
- **Two iterations** (s₂): one recursive step past co-citation.
  Closed form used here, writing cc(a,b) = |I(a) ∩ I(b)| and
  d = in-degree over the fan-capped edge set:

      s₁(a,b) = C · cc(a,b) / (d(a)·d(b))
      s₂(a,b) = C · (cc(a,b) + T(a,b)) / (d(a)·d(b)),
      T(a,b)  = Σ_{u∈I(a), v∈I(b), u≠v} s₁(u, v)

  (the u=v diagonal contributes s(u,u)=1 each, giving the cc term).

Scale shape: pair generation is the capped co-citation self-join
(``max_fan`` drops citers above the threshold BEFORE the join — a
directory page linking k pages would otherwise yield k²/2 rows); the
recursive term is s₁ ⋈ out-edges ⋈ out-edges, ≤ max_fan² expansions
per s₁ pair, every join a hashed equi-join. No Python anywhere.

Order stability: T sums doubles, and partial-aggregation order differs
between engines — each s₁ term is rounded to an integer at 1e12 scale
before the sum (exact integer aggregation, same trick as
``functions/corpus.token_drift``), so the 6-dp output can never flip on
reassociation noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph

_SCALE = 1e12


def simrank_2iter(
    graph: LinkGraph,
    c: float = 0.8,
    max_fan: int | None = 64,
    min_shared: int = 1,
) -> DataFrame:
    """Two-iteration candidate-bounded SimRank.

    Returns ``(a, b, shared, score)`` with ``a < b``: ``shared`` = the
    number of common in-neighbors over the fan-capped edge set,
    ``score`` = s₂(a,b) rounded to 6 dp. Self-loops are ignored;
    citers with out-degree above ``max_fan`` are excluded from BOTH
    pair generation and the in-degrees (keeping the score a
    self-consistent SimRank on the capped subgraph)."""
    if not 0.0 < c < 1.0:
        raise ValueError("decay c must be in (0, 1)")
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if max_fan is not None:
        ok = (e.groupBy("src").agg(F.count("*").alias("_f"))
              .filter(F.col("_f") <= max_fan).select("src"))
        e = e.join(F.broadcast(ok), "src", "left_semi")
    e = e.localCheckpoint(eager=True)  # reused by three joins below
    deg = e.groupBy("dst").agg(F.count("*").alias("_d"))

    cc = (
        e.alias("x").join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    withd = (
        cc.join(deg.select(F.col("dst").alias("a"), F.col("_d").alias("da")),
                "a")
        .join(deg.select(F.col("dst").alias("b"), F.col("_d").alias("db")),
              "b")
    )
    # s1 scaled to an exact integer so the T aggregation is order-stable
    s1 = withd.select(
        "a", "b",
        F.round(F.lit(c) * F.col("shared")
                / (F.col("da") * F.col("db")) * F.lit(_SCALE))
        .cast("long").alias("s1i"),
    )
    s1sym = s1.unionByName(
        s1.select(F.col("b").alias("a"), F.col("a").alias("b"), "s1i"))
    # T(a,b): s1 pairs (u,v) expanded through out-edges u->a, v->b
    t = (
        s1sym.alias("p")
        .join(e.alias("ea"), F.col("ea.src") == F.col("p.a"))
        .join(e.alias("eb"), F.col("eb.src") == F.col("p.b"))
        .filter(F.col("ea.dst") < F.col("eb.dst"))
        .groupBy(F.col("ea.dst").alias("a"), F.col("eb.dst").alias("b"))
        .agg(F.sum("s1i").alias("ti"))
    )
    return (
        withd.join(t, ["a", "b"], "left")
        .select(
            "a", "b", "shared",
            F.round(F.lit(c)
                    * (F.col("shared")
                       + F.coalesce(F.col("ti"), F.lit(0)) / F.lit(_SCALE))
                    / (F.col("da") * F.col("db")), 6).alias("score"),
        )
    )
