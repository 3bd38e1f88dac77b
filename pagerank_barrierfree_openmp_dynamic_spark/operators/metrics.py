"""Graph-quality metrics: directed modularity and degree assortativity.

Not reference operators (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``) — the two standard one-number
diagnostics a web-graph pipeline reports next to its community labels and
degree histograms:

- :func:`modularity` — Leicht & Newman's directed modularity of a vertex
  partition, ``Q = Σ_c [ e_c/m − γ·(kout_c·kin_c)/m² ]`` where ``e_c`` is
  the number of edges inside community c, ``kout_c``/``kin_c`` the total
  out-/in-degree of its members, and ``m`` the edge count. The quality
  score for LPA/CC community assignments.
- :func:`degree_assortativity` — Pearson correlation across edges of
  (degree of source, degree of target); Newman's assortativity
  coefficient, the classic "do hubs link to hubs?" statistic (web graphs
  are famously disassortative).

Scale shape: both are label/degree joins onto the edge table followed by
map-side-combinable aggregations to a scalar — no state beyond
per-community/per-vertex partials, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import LinkGraph


def modularity(
    graph: LinkGraph,
    labels: DataFrame,
    label_col: str = "label",
    gamma: float = 1.0,
    exclude_self_loops: bool = True,
) -> DataFrame:
    """One-row ``(modularity double, n_communities long, m long)`` for the
    partition in ``labels`` (``id`` + ``label_col``). Self-loops are
    excluded by default (LPA/CC labels are computed on the loop-free
    undirected view, and ``build_graph(add_self_loops=True)`` adds a loop
    per vertex that would otherwise dominate small graphs)."""
    lab = labels.select(F.col("id"), F.col(label_col).alias("_c"))
    e = graph.edges.select("src", "dst")
    if exclude_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    e2 = (
        e.join(lab.select(F.col("id").alias("_sid"),
                          F.col("_c").alias("lsrc")),
               e.src == F.col("_sid"))
        .join(lab.select(F.col("id").alias("_did"),
                         F.col("_c").alias("ldst")),
              F.col("dst") == F.col("_did"))
        .select("lsrc", "ldst")
    )
    per_c = (
        e2.select(
            F.col("lsrc").alias("c"),
            F.lit(1).alias("_o"),
            F.lit(0).alias("_i"),
            (F.col("lsrc") == F.col("ldst")).cast("long").alias("_w"),
        )
        .unionByName(e2.select(
            F.col("ldst").alias("c"),
            F.lit(0).alias("_o"),
            F.lit(1).alias("_i"),
            F.lit(0).cast("long").alias("_w"),
        ))
        .groupBy("c")
        .agg(F.sum("_o").alias("ko"), F.sum("_i").alias("ki"),
             F.sum("_w").alias("ec"))
    )
    row = per_c.agg(
        F.sum("ko").alias("m"),
        F.count("*").alias("nc"),
        F.sum(F.col("ec")).alias("ec_tot"),
        F.sum(F.col("ko").cast("double") * F.col("ki")).alias("koki"),
    ).collect()[0]
    m = int(row["m"] or 0)
    if m == 0:
        q = 0.0
    else:
        # Σ_c ec/m − γ·Σ_c ko·ki/m² — two exact integer totals divided
        # once each, so the FP result is order-independent and matches the
        # SQL oracle bit-for-bit
        q = float(row["ec_tot"]) / m - gamma * float(row["koki"]) / m / m
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(q, int(row["nc"] or 0), m)],
        "modularity double, n_communities long, m long")


def reciprocity(graph: LinkGraph, exclude_self_loops: bool = True) -> DataFrame:
    """One-row ``(reciprocity double, m long)``: fraction of directed
    edges whose reverse edge also exists — the classic "mutual links"
    statistic of directed web/social graphs. One left-semi self-join of
    the edge table against its transpose (src-partitioned both sides)."""
    e = graph.edges.select("src", "dst")
    if exclude_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    both = e.join(rev, ["src", "dst"], "left_semi").count()
    m = e.count()
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(both / m if m else 0.0, m)], "reciprocity double, m long")


def clustering_coefficient(graph: LinkGraph) -> DataFrame:
    """One-row ``(global_cc double, avg_cc double, n_triangles long)``
    over the undirected simple view (the triangle-counting orientation):
    global = 3·triangles / open-or-closed triads
    (Σ_v deg(v)·(deg(v)−1)/2), average = mean over vertices with
    deg ≥ 2 of tri(v) / (deg(v) choose 2) — Watts-Strogatz. Reuses the
    per-vertex triangle kernel (``plans/triangles.py``) plus one
    undirected-degree aggregation."""
    from ..plans.triangles import triangles_per_vertex

    tri = triangles_per_vertex(graph)  # (id, tri_count), all vertices
    e = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )
    deg = und.groupBy("src").agg(F.count("*").alias("_d")) \
        .select(F.col("src").alias("id"), "_d")
    j = tri.join(deg, "id", "left") \
        .select("id", "tri_count",
                F.coalesce("_d", F.lit(0)).alias("d"))
    row = j.agg(
        F.sum("tri_count").alias("tri3"),   # Σ_v tri(v) = 3 · #triangles
        F.sum(F.col("d").cast("double") * (F.col("d") - 1) / 2.0)
         .alias("triads"),
        F.avg(
            F.when(F.col("d") >= 2,
                   F.col("tri_count")
                   / (F.col("d").cast("double") * (F.col("d") - 1) / 2.0))
        ).alias("avg_cc"),
    ).collect()[0]
    tri3 = int(row["tri3"] or 0)
    triads = float(row["triads"] or 0.0)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(tri3 / triads if triads else 0.0,
          float(row["avg_cc"]) if row["avg_cc"] is not None else 0.0,
          tri3 // 3)],
        "global_cc double, avg_cc double, n_triangles long")


def degree_assortativity(
    graph: LinkGraph,
    mode: str = "out-in",
) -> DataFrame:
    """One-row ``(assortativity double, m long)``: Pearson correlation
    over directed edges of (src degree, dst degree). ``mode`` picks the
    degree convention at each endpoint — ``"out-in"`` (default; Newman's
    directed r), ``"in-out"``, ``"out-out"`` or ``"in-in"``."""
    try:
        src_kind, dst_kind = mode.split("-")
        assert src_kind in ("out", "in") and dst_kind in ("out", "in")
    except (ValueError, AssertionError):
        raise ValueError(f"mode must be 'out-in'/'in-out'/'out-out'/'in-in',"
                         f" got {mode!r}") from None
    e = graph.edges.select("src", "dst")
    outd = e.groupBy("src").agg(F.count("*").alias("_d")) \
        .select(F.col("src").alias("_v"), "_d")
    ind = e.groupBy("dst").agg(F.count("*").alias("_d")) \
        .select(F.col("dst").alias("_v"), "_d")
    dsrc = outd if src_kind == "out" else ind
    ddst = ind if dst_kind == "in" else outd
    joined = (
        e.join(dsrc.select(F.col("_v").alias("_sv"),
                           F.col("_d").alias("ds")),
               e.src == F.col("_sv"), "left")
        .join(ddst.select(F.col("_v").alias("_dv"),
                          F.col("_d").alias("dd")),
              F.col("dst") == F.col("_dv"), "left")
        .select(F.coalesce(F.col("ds"), F.lit(0)).cast("double").alias("ds"),
                F.coalesce(F.col("dd"), F.lit(0)).cast("double").alias("dd"))
    )
    row = joined.agg(
        F.corr("ds", "dd").alias("r"), F.count("*").alias("m")).collect()[0]
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(float(row["r"]) if row["r"] is not None else float("nan"),
          int(row["m"]))],
        "assortativity double, m long")


def community_conductance(
    graph: LinkGraph,
    labels: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """Per-community conductance over the loop-free undirected view (the
    same view Louvain/LPA optimize): for community c with volume
    ``vol(c) = Σ_{v∈c} deg(v)`` and cut ``cut(c)`` = number of undirected
    edges with exactly one endpoint in c,

        φ(c) = cut(c) / min(vol(c), 2m − vol(c))

    (0 when the denominator is 0 — an edgeless or whole-graph community).
    The standard community-quality diagnostic next to modularity: low
    conductance = few escape edges relative to internal mass.

    Returns (community, cut, volume, conductance), one row per community
    in ``labels`` (including edgeless ones).

    Scale shape: one symmetric edge view joined twice against the label
    table, then a single map-side-combinable groupBy community — per-row
    work O(1), state O(communities); no Python in the plan.
    """
    lab = labels.select("id", F.col(label_col).alias("_c"))
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .unionByName(und.select(F.col("b").alias("src"),
                                F.col("a").alias("dst")))
    j = (
        sym.join(lab.select(F.col("id").alias("src"),
                            F.col("_c").alias("cs")), "src")
        .join(lab.select(F.col("id").alias("dst"),
                         F.col("_c").alias("cd")), "dst")
    )
    per = j.groupBy(F.col("cs").alias("community")).agg(
        F.count("*").alias("volume"),
        F.sum((F.col("cs") != F.col("cd")).cast("long")).alias("cut"),
    )
    all_c = lab.select(F.col("_c").alias("community")).distinct()
    per = all_c.join(per, "community", "left").select(
        "community",
        F.coalesce("cut", F.lit(0)).alias("cut"),
        F.coalesce("volume", F.lit(0)).alias("volume"),
    )
    # total volume = 2m (each undirected edge counted twice)
    total = per.agg(F.sum("volume").alias("t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "community", "cut", "volume",
            F.when(F.least(F.col("volume"), F.col("t") - F.col("volume")) > 0,
                   F.col("cut")
                   / F.least(F.col("volume"), F.col("t") - F.col("volume")))
            .otherwise(F.lit(0.0)).alias("conductance"),
        )
    )
