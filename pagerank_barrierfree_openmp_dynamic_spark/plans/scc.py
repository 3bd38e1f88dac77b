"""Strongly connected components over the DIRECTED edge table.

Not in the reference repo (PageRank-only); SCC is the canonical directed
companion to the undirected CC kernel here (``plans/components.py``) and
the building block of the classic web-graph "bowtie" decomposition
(Broder et al. 2000) — the analysis a Common-Crawl-scale link graph
exists for.

Algorithm: distributed FW-BW coloring with trimming (Orzan 2004 /
Slota-Rajamanickam-Madduri 2014), the standard label-propagation SCC for
vertex-centric / DataFrame engines — NOT Tarjan (inherently sequential
DFS). Each round over the remaining active subgraph:

1. TRIM — vertices with no in-edges or no out-edges inside the active
   subgraph are singleton SCCs; peel them to a fixpoint (handles the DAG
   fringe — tendrils — in bulk).
2. COLOR — forward min-label propagation to a fixpoint:
   color(v) = min id that can reach v (forward edges), computed with the
   same neighbor-min + POINTER-JUMP step as undirected CC. The jump
   color(v) <- min(color(v), color[color(v)]) is sound for directed
   reachability by transitivity (if c reaches v and c' reaches c, then
   c' reaches v), so the fixpoint needs O(log diameter) rounds, not
   O(diameter).
3. MARK — within each color class, the pivot is the vertex whose id
   equals its color (the minimum id of the class, which reaches every
   member). Propagate "reaches the pivot" BACKWARD from the pivot along
   edges restricted to the same color, to a fixpoint. Marked vertices are
   exactly {v : pivot reaches v and v reaches pivot within the class} =
   the pivot's SCC (the color restriction is safe: any cycle through v
   and its pivot lies entirely inside one color class).
4. Emit marked vertices with comp = color, remove them and ALL their
   incident edges (a finished SCC cannot be inside another), loop.

Every round finalizes each color class's pivot SCC, so rounds are
bounded; on web-shaped graphs (one giant SCC + shallow DAG fringe)
trimming plus coloring finishes in a handful of rounds. All three inner
fixpoints are the shuffle shape the engine already optimizes: a join of
the (persisted, src-partitioned) active edge table against a small label
frame plus a map-side-combinable min aggregate / semi-join. Labels are
never collected; per-iteration driver traffic is one change-count scalar.

Output: (id, comp) with comp = min vertex id of the SCC — canonical, so
exactly comparable to a Tarjan oracle and to the recursive-SQL
mutual-reachability oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.graph import LinkGraph
from ..session import adaptive_execution, eager_state


def _restrict(ae: DataFrame, av: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints in av (id,) — two broadcast-able
    semi-joins, then an eager checkpoint to truncate lineage."""
    return (
        ae.join(av, ae.src == av.id, "left_semi")
        .join(av.select(F.col("id").alias("_d")), ae.dst == F.col("_d"),
              "left_semi")
        .localCheckpoint(eager=True)
    )


def _fix_forward_min(ae: DataFrame, av: DataFrame, max_iterations: int) -> DataFrame:
    """Forward min-label fixpoint: returns (id, col) with
    col(v) = min{u in av : u reaches v along ae} (v reaches itself)."""
    labels = av.select("id", F.col("id").alias("col")).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        nmin = (
            ae.join(labels, ae.src == labels.id)
            .groupBy("dst")
            .agg(F.min("col").alias("ncol"))
        )
        step = labels.join(nmin, labels.id == nmin.dst, "left").select(
            labels.id,
            F.col("col").alias("old"),
            F.least(labels.col, F.coalesce("ncol", labels.col)).alias("mid"),
        )
        # pointer jump through the label mapping (sound by transitivity)
        jump = step.select(F.col("id").alias("jid"), F.col("mid").alias("jcol"))
        # eager_state: labels sit on both sides (gather + pointer jump), so
        # bare localCheckpoint would compound size estimates geometrically
        # with the iteration count (see session.eager_state)
        nxt = eager_state(
            step.join(jump, step.mid == jump.jid, "left")
            .select(
                step.id,
                F.least(step.mid, F.coalesce("jcol", step.mid)).alias("col"),
                (F.least(step.mid, F.coalesce("jcol", step.mid))
                 < F.col("old")).alias("chg"),
            )
        )
        changed = nxt.filter(F.col("chg")).count()
        labels = nxt.select("id", "col")
        if changed == 0:
            break
    return labels


def strongly_connected_components(
    graph: LinkGraph, max_rounds: int = 64, max_iterations: int = 200,
) -> DataFrame:
    """Returns (id, comp) with comp = min vertex id of the strongly
    connected component. Run on a graph built with
    ``add_self_loops=False`` (self-loops never change SCCs; they are
    dropped here anyway to keep the trim step exact)."""
    spark = graph.edges.sparkSession
    done_parts: list[DataFrame] = []

    ae = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    av = graph.vertices.select("id").localCheckpoint(eager=True)

    with adaptive_execution(spark, False):
        for _ in range(max_rounds):
            # -- TRIM to a fixpoint: no in-edge or no out-edge => own SCC.
            for _ in range(max_iterations):
                srcs = ae.select(F.col("src").alias("id")).distinct()
                dsts = ae.select(F.col("dst").alias("id")).distinct()
                keep = av.join(srcs, "id", "left_semi").join(
                    dsts, "id", "left_semi").localCheckpoint(eager=True)
                trimmed = av.join(keep, "id", "left_anti")
                if trimmed.isEmpty():
                    av = keep
                    break
                done_parts.append(
                    trimmed.select("id", F.col("id").alias("comp"))
                    .localCheckpoint(eager=True))
                av = keep
                if av.isEmpty():
                    break
                ae = _restrict(ae, av)
            if av.isEmpty():
                break

            # -- COLOR: forward min-reachability labels
            colors = _fix_forward_min(ae, av, max_iterations)

            # -- MARK: backward fixpoint from pivots inside each color class
            ce = (
                ae.join(colors.select(F.col("id").alias("src"),
                                      F.col("col").alias("cs")), "src")
                .join(colors.select(F.col("id").alias("dst"),
                                    F.col("col").alias("cd")), "dst")
                .filter(F.col("cs") == F.col("cd"))
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            marked = colors.filter(F.col("id") == F.col("col")).select(
                "id").localCheckpoint(eager=True)
            for _ in range(max_iterations):
                grown = (
                    ce.join(marked, ce.dst == marked.id, "left_semi")
                    .select(F.col("src").alias("id"))
                    .distinct()
                    .join(marked, "id", "left_anti")
                    .localCheckpoint(eager=True)
                )
                if grown.isEmpty():
                    break
                marked = marked.unionByName(grown).localCheckpoint(eager=True)

            # -- emit the pivots' SCCs, shrink the active subgraph
            done_parts.append(
                colors.join(marked, "id", "left_semi")
                .select("id", F.col("col").alias("comp"))
                .localCheckpoint(eager=True))
            av = av.join(marked, "id", "left_anti").localCheckpoint(eager=True)
            if av.isEmpty():
                break
            ae = _restrict(ae, av)
        else:
            raise RuntimeError(f"SCC did not finish within {max_rounds} rounds")

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out


def _closure(edges: DataFrame, seeds: DataFrame, direction: str,
             max_depth: int = 1000) -> DataFrame:
    """BFS closure (id,) from ``seeds`` following out-edges
    (direction='fwd') or in-edges ('bwd'); seeds included. Same broadcast
    semi-join round shape as plans/traversal.reachable_set."""
    here, there = ("src", "dst") if direction == "fwd" else ("dst", "src")
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_depth):
        nxt = (
            edges.join(F.broadcast(frontier),
                       edges[here] == frontier.id, "left_semi")
            .select(F.col(there).alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bowtie(graph: LinkGraph) -> DataFrame:
    """Web-graph bowtie decomposition (Broder et al. 2000): per-vertex
    region relative to the largest SCC. Returns (id, region) with region in
    {'CORE', 'IN', 'OUT', 'OTHER'}:

    - CORE  — the largest SCC (ties broken by smaller canonical label);
    - IN    — can reach the core but is not in it;
    - OUT   — reachable from the core but not in it;
    - OTHER — tendrils, tubes, and disconnected components.

    One SCC run + two BFS closures from the core (forward = OUT side,
    backward = IN side); the region column is two anti-joinable flags, no
    per-vertex driver state."""
    comp = strongly_connected_components(graph).localCheckpoint(eager=True)
    core_lab = (
        comp.groupBy("comp").agg(F.count("*").alias("sz"))
        .orderBy(F.col("sz").desc(), F.col("comp").asc())
        .limit(1)
        .collect()[0]["comp"]
    )
    core = comp.filter(F.col("comp") == core_lab).select("id")
    edges = graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    fwd = _closure(edges, core, "fwd")
    bwd = _closure(edges, core, "bwd")
    return comp.select(
        "id",
        F.when(F.col("comp") == core_lab, F.lit("CORE")).otherwise(None).alias("_c"),
    ).join(bwd.select("id", F.lit(True).alias("_in")), "id", "left") \
     .join(fwd.select("id", F.lit(True).alias("_out")), "id", "left") \
     .select(
        "id",
        F.coalesce(
            F.col("_c"),
            F.when(F.col("_in").isNotNull(), F.lit("IN")),
            F.when(F.col("_out").isNotNull(), F.lit("OUT")),
            F.lit("OTHER"),
        ).alias("region"),
    )


def scc_stats(graph: LinkGraph) -> DataFrame:
    """One-row SCC summary: component count, largest-SCC size, trivial
    (size-1) count — the numbers the bowtie analysis starts from."""
    comp = strongly_connected_components(graph)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_sccs"),
        F.max("sz").alias("largest_scc"),
        F.sum((F.col("sz") == 1).cast("long")).alias("n_trivial"),
    )


def condensation(graph: LinkGraph) -> DataFrame:
    """SCC quotient (condensation) DAG — the web graph's DAG skeleton
    after the bowtie collapse: every SCC becomes one vertex (labeled by
    its canonical min-id ``comp``), every cross-SCC edge becomes a
    weighted DAG edge with weight = number of original edges between the
    two components. Returns ``(src, dst, weight)`` — acyclic by
    construction, so it feeds the longest-path level assignment
    (:func:`dag_levels`) and any DAG-only analysis directly.

    Scale shape: one SCC run plus :func:`~..operators.graph.contract_edges`
    (two mapping joins co-partitioned with the edge table + one map-side
    combinable aggregation on the much smaller component keys)."""
    from ..operators.graph import contract_edges

    comp = strongly_connected_components(graph)
    mapping = comp.select("id", F.col("comp").alias("group"))
    return contract_edges(graph.edges.select("src", "dst"), mapping,
                          drop_self_loops=True)


def dag_levels(graph: LinkGraph, max_iterations: int = 200) -> DataFrame:
    """Topological (longest-path) level of every SCC in the condensation
    DAG: ``level(c) = 0`` for source components, else
    ``1 + max(level(u))`` over in-neighbors — i.e. the length of the
    longest path from any source to ``c``. The iteration
    ``level <- max(level, in-neighbor level + 1)`` starting from all-zero
    is monotone and reaches that fixpoint in depth(DAG) rounds —
    termination is guaranteed because the condensation is acyclic.

    Returns ``(comp, level)`` with one row per SCC (isolated components
    stay at level 0). Per round: one join of the (small) condensation
    edge table against the level frame + one map-side-combinable max —
    the same shuffle shape as every label fixpoint here."""
    from ..operators.graph import contract_edges

    spark = graph.edges.sparkSession
    comp = strongly_connected_components(graph).localCheckpoint(eager=True)
    mapping = comp.select("id", F.col("comp").alias("group"))
    ce = (
        contract_edges(graph.edges.select("src", "dst"), mapping,
                       drop_self_loops=True)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    levels = (
        comp.select("comp").distinct()
        .select("comp", F.lit(0).alias("level"))
        .localCheckpoint(eager=True)
    )
    with adaptive_execution(spark, False):
        for _ in range(max_iterations):
            upd = (
                ce.join(levels, ce.src == levels.comp)
                .groupBy("dst")
                .agg((F.max("level") + F.lit(1)).alias("_nl"))
            )
            nxt = levels.join(upd, levels.comp == upd.dst, "left").select(
                levels.comp,
                F.col("level").alias("_old"),
                F.greatest(levels.level,
                           F.coalesce("_nl", levels.level)).alias("_new"),
            )
            nxt = nxt.localCheckpoint(eager=True)
            done = nxt.filter(F.col("_new") > F.col("_old")).isEmpty()
            levels = nxt.select("comp", F.col("_new").alias("level"))
            if done:
                break
        else:
            raise RuntimeError(
                f"dag_levels did not converge in {max_iterations} rounds")
    return levels.select("comp", F.col("level").cast("int").alias("level"))
