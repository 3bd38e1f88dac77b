"""Triangle counting over the undirected view of the edge table.

Not in the reference repo (BASELINE.json adds it). Algorithm: degree
orientation + path join — the standard shuffle-efficient formulation:

1. canonicalize edges to undirected distinct pairs (self-loops dropped);
2. orient each edge from the endpoint with smaller (degree, id) to the
   larger — every triangle is counted exactly once, and the join fan-out is
   bounded because hub vertices only *receive* oriented edges;
3. wedges = oriented ⋈ oriented on the middle vertex; triangles = wedges
   semi-joined against the oriented edge set.

Exact counts; verified against a brute-force set-intersection oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph


def _und(edges: DataFrame) -> DataFrame:
    """Canonical undirected view: distinct (u < v) pairs, self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )


def _oriented(graph: LinkGraph) -> DataFrame:
    return _oriented_from_und(_und(graph.edges))


def _oriented_from_und(und: DataFrame) -> DataFrame:
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def triangles(graph: LinkGraph) -> DataFrame:
    """All triangles as (x, y, z) vertex triples (each exactly once)."""
    o = _oriented(graph).persist()
    o.count()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    e3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(e3, ["x", "z"], "left_semi").select("x", "y", "z")
    return tri


def triangle_count(graph: LinkGraph) -> int:
    return triangles(graph).count()


def _count_from_und(und: DataFrame) -> int:
    o = _oriented_from_und(und).persist()
    try:
        o.count()
        e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
        return e1.join(e2, "y").join(e3, ["x", "z"], "left_semi").count()
    finally:
        o.unpersist()


def _incident_delta(und: DataFrame, b: DataFrame, deletions: bool) -> int:
    return _delta_candidates(und, b, deletions).count()


def _delta_candidates(und: DataFrame, b: DataFrame, deletions: bool) -> DataFrame:
    """Count triangles of the undirected edge set ``und`` that contain at
    least one batch edge from ``b``, each triangle exactly once.

    A triangle with k >= 1 batch edges is attributed to exactly one of them
    by lexicographic (u, v) order — the smallest for deletions (side edges
    must be un-deleted or deleted *later*), the largest for insertions
    (side edges must be pre-existing or inserted *earlier*). This replaces
    inclusion-exclusion with a total order and needs no window/rank column.

    Scale shape: ``b`` is a batch (small) — both adjacency probes broadcast
    it, so the cost is O(sum of endpoint degrees over the batch), never a
    full triangle recount. The common-neighbor join keys on (batch edge,
    witness vertex), bounded by the same quantity.
    """
    adj = und.select(F.col("u").alias("x"), F.col("v").alias("w")).unionByName(
        und.select(F.col("v").alias("x"), F.col("u").alias("w"))
    )
    bb = b.select(F.col("u").alias("bu"), F.col("v").alias("bv"))
    cu = (
        adj.join(F.broadcast(bb), F.col("x") == F.col("bu"))
        .filter(F.col("w") != F.col("bv"))
        .select("bu", "bv", "w")
    )
    cv = (
        adj.join(F.broadcast(bb), F.col("x") == F.col("bv"))
        .filter(F.col("w") != F.col("bu"))
        .select("bu", "bv", "w")
    )
    common = (
        cu.join(cv, ["bu", "bv", "w"])
        .withColumn("s1a", F.least("bu", "w"))
        .withColumn("s1b", F.greatest("bu", "w"))
        .withColumn("s2a", F.least("bv", "w"))
        .withColumn("s2b", F.greatest("bv", "w"))
    )
    m1 = bb.select(F.col("bu").alias("s1a"), F.col("bv").alias("s1b"),
                   F.lit(True).alias("in1"))
    m2 = bb.select(F.col("bu").alias("s2a"), F.col("bv").alias("s2b"),
                   F.lit(True).alias("in2"))
    j = (common.join(F.broadcast(m1), ["s1a", "s1b"], "left")
               .join(F.broadcast(m2), ["s2a", "s2b"], "left"))

    def _lex(a, bcol, after: bool):
        # (a, b) strictly after/before (bu, bv) lexicographically
        if after:
            return (F.col(a) > F.col("bu")) | (
                (F.col(a) == F.col("bu")) & (F.col(bcol) > F.col("bv")))
        return (F.col(a) < F.col("bu")) | (
            (F.col(a) == F.col("bu")) & (F.col(bcol) < F.col("bv")))

    cond1 = F.col("in1").isNull() | _lex("s1a", "s1b", after=deletions)
    cond2 = F.col("in2").isNull() | _lex("s2a", "s2b", after=deletions)
    return j.filter(cond1 & cond2)


def triangle_count_incremental(
    graph: LinkGraph, batch: DataFrame, t_old: int | None = None
) -> DataFrame:
    """Incremental triangle maintenance after a (src, dst, op) edge batch —
    the reference's dynamic-update design (batch delete + insert, then
    update only what the batch touched, ``/root/reference/main.cxx:38-85``)
    applied to the triangle kernel instead of PageRank.

    Deletions are applied first, then insertions, on DIRECTED edges —
    exactly ``apply_batch``'s protocol, so the invariant is
    ``t_new == triangle_count(apply_batch(graph, batch))``: deleting one
    orientation of a reciprocal pair leaves the undirected edge (and its
    triangles) intact. Returns one row
    ``(t_old, t_removed, t_added, t_new)``:

    - ``t_removed`` = triangles of the OLD graph containing >= 1 deleted
      edge, counted incrementally in O(batch * avg-degree);
    - ``t_added`` = triangles of the NEW graph containing >= 1 inserted
      edge, same cost;
    - ``t_new = t_old - t_removed + t_added`` — no recount of the updated
      graph. Pass a cached ``t_old`` (e.g. from the previous batch's
      ``t_new``) to skip the only full-graph pass; when omitted it is
      computed once from the old edge set.
    """
    spark = graph.edges.sparkSession
    e_nl = graph.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und_old = _und(graph.edges).persist()
    try:
        # Deletions remove DIRECTED edges (apply_batch semantics): an
        # undirected pair vanishes only when no orientation survives. The
        # candidate pairs are batch-sized; one broadcast semi-join scan of
        # the edge table finds the surviving orientations — no shuffle.
        delsd = (
            batch.filter(F.col("op") == "del").select("src", "dst").distinct()
            .join(e_nl, ["src", "dst"], "left_semi")
        )
        p = _und(delsd)
        e_touch = e_nl.join(
            F.broadcast(p),
            (F.least("src", "dst") == F.col("u"))
            & (F.greatest("src", "dst") == F.col("v")),
            "left_semi",
        )
        surv = _und(e_touch.join(delsd, ["src", "dst"], "left_anti"))
        d = p.join(surv, ["u", "v"], "left_anti").persist()
        und_mid = und_old.join(d, ["u", "v"], "left_anti")
        ins = _und(batch.filter(F.col("op") == "ins").select("src", "dst"))
        i = ins.join(und_mid, ["u", "v"], "left_anti").persist()
        und_new = und_mid.unionByName(i).persist()
        try:
            told = int(t_old) if t_old is not None else _count_from_und(und_old)
            t_rem = _incident_delta(und_old, d, deletions=True)
            t_add = _incident_delta(und_new, i, deletions=False)
            return spark.createDataFrame(
                [(told, t_rem, t_add, told - t_rem + t_add)],
                "t_old long, t_removed long, t_added long, t_new long",
            )
        finally:
            d.unpersist()
            i.unpersist()
            und_new.unpersist()
    finally:
        und_old.unpersist()


def four_cycle_count(graph: LinkGraph) -> DataFrame:
    """Number of 4-cycles (rectangles, non-induced) in the undirected view —
    a standard link-spam / link-farm density signal: organic web graphs are
    triangle-rich but rectangle-sparse, link exchanges produce the reverse.

    Diagonal-pair formulation: every 4-cycle a-b-c-d has exactly two
    diagonals (a,c) and (b,d), so
    ``n = sum over vertex pairs of C(common_neighbors, 2) / 2``
    — computed as one wedge self-join (adjacency joined on the middle
    vertex, endpoints ordered x < y) and a (x, y) count aggregate, all
    map-side-combinable. The division runs as integer ``div`` on the raw
    ``sum c*(c-1)`` so the result is exact at any scale.

    Skew note: a degree-d hub contributes C(d, 2) wedges as the middle
    vertex, so at 100 TB the wedge stage inherits the engine's hub
    treatment — split hub adjacency (plans/pagerank.py hub-split) or cap
    with a sampled estimator; at bench scales the exact join is the plan
    you want.
    """
    und = _und(graph.edges)
    adj = und.select(F.col("u").alias("x"), F.col("v").alias("w")).unionByName(
        und.select(F.col("v").alias("x"), F.col("u").alias("w"))
    )
    a = adj.alias("a")
    b = adj.select(F.col("x").alias("y"), F.col("w").alias("w")).alias("b")
    wedges = a.join(b, ["w"]).filter(F.col("x") < F.col("y"))
    cnt = wedges.groupBy("x", "y").agg(F.count("*").alias("c"))
    return cnt.agg(
        F.expr("sum(c * (c - 1)) div 4").alias("n_four_cycles")
    )


def triangles_per_vertex(graph: LinkGraph) -> DataFrame:
    """(id, tri_count) — number of triangles each vertex participates in;
    vertices in no triangle get 0."""
    t = triangles(graph)
    parts = (
        t.select(F.col("x").alias("id"))
        .unionByName(t.select(F.col("y").alias("id")))
        .unionByName(t.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri_count"))
    )
    return graph.vertices.join(parts, "id", "left").select(
        "id", F.coalesce("tri_count", F.lit(0)).alias("tri_count")
    )
