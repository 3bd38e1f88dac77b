"""Minimum spanning forest via distributed Borůvka.

Not present in the reference repo (graph-PageRank kernels only —
``/root/reference/src/pagerank.hxx``); added as a standard link-graph
kernel over the same weighted edge table (BASELINE.json input shape), the
classic "web backbone" / cheapest-connectivity analysis.

Algorithm: Borůvka's, the textbook distributed MST — every round each
component selects its lightest incident cross-component edge, selected
edges join the forest, touched components merge, repeat. Components at
least halve per round, so O(log N) rounds total. Edge comparisons use the
TOTAL order ``(w, u, v)`` (weight, then canonical endpoints), which makes
the forest unique even with duplicate weights — the same order a
Kruskal oracle uses, so results are exactly comparable (set equality).

Scale shape (the 100-TB story): per round, ONE map-side-combinable min-agg
keyed by component picks the candidate edges (the shuffle moves one struct
per component, not the edge table) after two hash joins against the label
table; the merge step runs min-label pointer jumping on the COMPONENT
graph, whose size is bounded by the (geometrically shrinking) component
count — by round 3 it is a rounding error next to the edge scan. The edge
table itself is canonicalized once, persisted partitioned by ``u``, and
never reshuffled. Labels are pinned per round with
``session.eager_state`` (they sit on both sides of the round's joins —
see the sizeInBytes-estimate note there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..session import adaptive_execution, eager_state


def _merge_labels(medges: DataFrame, max_jumps: int = 64) -> DataFrame:
    """Min-label closure over the (small) component-merge graph:
    (c, nc) with nc = min component id reachable through ``medges``.
    Gather-min + pointer jumping, O(log chain-length) iterations — the
    per-round merge graph is a pseudoforest whose chains can be O(round's
    component count) in the worst case (a weight-sorted path), so plain
    one-hop propagation would be linear."""
    und = medges.unionByName(
        medges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        und.select(F.col("a").alias("c")).distinct()
        .select("c", F.col("c").alias("nc"))
    )
    labels = eager_state(labels)
    for _ in range(max_jumps):
        gather = (
            und.join(labels, und.a == labels.c)
            .groupBy(F.col("b").alias("gc"))
            .agg(F.min("nc").alias("gmin"))
        )
        step = labels.join(gather, labels.c == F.col("gc"), "left").select(
            labels.c,
            F.col("nc").alias("old"),
            F.least(labels.nc, F.coalesce("gmin", labels.nc)).alias("mid"),
        )
        jump = step.select(F.col("c").alias("jc"), F.col("mid").alias("jnc"))
        nxt = eager_state(
            step.join(jump, step.mid == jump.jc, "left").select(
                step.c,
                F.least(step.mid, F.coalesce("jnc", step.mid)).alias("nc"),
                (F.least(step.mid, F.coalesce("jnc", step.mid))
                 < F.col("old")).alias("chg"),
            )
        )
        changed = nxt.filter(F.col("chg")).count()
        labels = nxt.select("c", "nc")
        if changed == 0:
            break
    return labels


def _merge_labels_driver(medges: DataFrame) -> DataFrame:
    """Driver-side union-find over the collected merge graph, broadcast
    back as a mapping frame. The merge graph has at most one edge per
    component, so its size is the CURRENT component count — collecting it
    is the same O(components) driver bound the dense PageRank path
    documents (fine to ~1e8 rows); :func:`_merge_labels` is the
    all-distributed fallback above it."""
    spark = medges.sparkSession
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in medges.collect():
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            # union by min id so labels stay canonical (min of the set)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(c, find(c)) for c in parent]
    return spark.createDataFrame(rows, "c long, nc long")


def minimum_spanning_forest(edges: DataFrame, weight_col: str = "weight",
                            max_rounds: int = 64,
                            partitions: int | None = None,
                            driver_merge_bound: int = 5_000_000) -> DataFrame:
    """MSF of the undirected view of ``edges`` (src, dst, weight_col).

    Self-loops are dropped; parallel/reversed edges collapse to the
    canonical pair ``u = least, v = greatest`` keeping the MINIMUM weight
    (only the lightest parallel edge can ever be in the forest). Returns
    the forest edge list (u, v, w) — ``n_vertices - n_components`` rows,
    unique under the (w, u, v) total order.
    """
    spark = edges.sparkSession
    npart = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("u", "v").agg(F.min("w").alias("w"))
        .repartition(npart, "u")
        .persist()
    )
    und.count()

    labels = (
        und.select(F.col("u").alias("id"))
        .union(und.select("v")).distinct()
        .select("id", F.col("id").alias("comp"))
    )
    labels = eager_state(labels)
    forest: DataFrame | None = None
    empty = spark.createDataFrame([], "u long, v long, w double")

    with adaptive_execution(spark, False):
        for _ in range(max_rounds):
            lu = labels.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
            lv = labels.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
            ec = (
                und.join(lu, "u").join(lv, "v")
                .filter(F.col("cu") != F.col("cv"))
            )
            # each component's lightest incident edge under (w, u, v):
            # every cross edge is a candidate from BOTH endpoints' sides
            both = ec.select(F.col("cu").alias("comp"), "w", "u", "v") \
                .unionByName(ec.select(F.col("cv").alias("comp"), "w", "u", "v"))
            sel = (
                both.groupBy("comp")
                .agg(F.min(F.struct("w", "u", "v")).alias("m"))
                .select(F.col("m.u").alias("u"), F.col("m.v").alias("v"),
                        F.col("m.w").alias("w"))
                .dropDuplicates(["u", "v"])
            )
            sel = sel.localCheckpoint(eager=True)
            n_sel = sel.count()
            if n_sel == 0:
                break
            forest = sel if forest is None else \
                forest.unionByName(sel).localCheckpoint(eager=True)
            # contract: selected edges induce merges on the COMPONENT graph
            # (≤ one edge per live component — the geometrically shrinking
            # side of Borůvka)
            medges = (
                sel.join(lu, "u").join(lv, "v")
                .select(
                    F.least("cu", "cv").alias("a"),
                    F.greatest("cu", "cv").alias("b"),
                )
            )
            relab = (_merge_labels_driver(medges)
                     if n_sel <= driver_merge_bound
                     else _merge_labels(medges))
            labels = eager_state(
                labels.join(relab, labels.comp == relab.c, "left")
                .select("id", F.coalesce("nc", "comp").alias("comp"))
            )
    und.unpersist()
    return forest if forest is not None else empty


def msf_weight_by_component(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """Per-tree rollup of the forest: (comp, n_edges, total_w) keyed by the
    minimum vertex id in each tree (one CC pass over the forest itself —
    the forest is N-1 rows, a rounding error next to the input)."""
    forest = minimum_spanning_forest(edges, weight_col).persist()
    n = forest.count()
    fe = forest.select(F.col("u").alias("a"), F.col("v").alias("b"))
    relab = _merge_labels_driver(fe) if n <= 5_000_000 else _merge_labels(fe)
    out = (
        forest.join(relab, forest.u == relab.c)
        .groupBy(F.col("nc").alias("comp"))
        .agg(F.count("*").alias("n_edges"),
             F.round(F.sum("w"), 6).alias("total_w"))
    )
    out = out.localCheckpoint(eager=True)
    forest.unpersist()
    return out
