"""Alias/redirect chain resolution by pointer doubling.

Not a reference operator (the reference is PageRank-only,
``/root/reference/src/pagerank.hxx``); this is the crawl-side
canonicalization step every web link graph needs before ranking: HTTP
301/meta-refresh redirects and URL aliases form a functional graph
``src -> dst`` (each source has exactly one forward target), and every
source must be resolved to its chain's terminal target so edges can be
rewritten onto canonical vertices.

Execution shape (scale-first): POINTER DOUBLING — the same shortcutting
idea the CC kernel uses (``plans/components.py``), specialized to a
functional graph.  Each round composes the current mapping with itself
(``m <- m . m`` where defined), so after k rounds every source points
``2^k`` hops ahead; a chain of length L resolves in ``ceil(log2 L)``
rounds, each one equi-join shuffle hashed on the join key.  The naive
alternative — following one hop per round — is O(L) shuffles and loses
badly on the long redirect chains real crawls contain.  Live rows whose
target is still itself a source shrink every round; an eager
localCheckpoint per round truncates lineage exactly like the other
iterative kernels here.

Cycles: a redirect cycle (A -> B -> A) never terminates, matching real
crawlers which bound redirect depth and drop loops.  The loop detects a
fixpoint (live count stops shrinking while targets keep moving in a
cycle is impossible under doubling — a row is live iff its current
target is in the domain, and a pure cycle stays live forever), so after
``max_rounds`` any still-live rows are returned with ``resolved =
false`` rather than looping; acyclic inputs always finish with every
row resolved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_chains(mapping: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Resolve every ``src`` to its chain-terminal ``target``.

    ``mapping`` is a functional graph ``(src, dst)`` — one row per
    ``src`` (callers dedup first; duplicate sources would make the
    composition join multiply rows).  Returns ``(src, target, hops,
    resolved)`` where ``target`` is the first vertex not itself a
    source (chain terminal) and ``resolved = false`` only for rows
    still inside a cycle after ``max_rounds`` doubling rounds (2^40
    hops covers any acyclic chain that fits in storage).

    ``hops`` is the number of original edges followed; for cyclic
    (unresolved) rows it is NULL — the doubling would otherwise return a
    ~2^rounds counter artifact with no relation to chain position, so
    the column is nulled where ``resolved = false`` instead of leaking
    an undefined number.
    """
    cur = mapping.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("target"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # m(x) composed with itself: x -> m(m(x)) where m(x) is a source.
        nxt = cur.select(
            F.col("src").alias("jsrc"),
            F.col("target").alias("jtarget"),
            F.col("hops").alias("jhops"),
        )
        step = cur.join(nxt, cur.target == nxt.jsrc, "left").select(
            cur.src,
            F.coalesce("jtarget", cur.target).alias("target"),
            (cur.hops + F.coalesce("jhops", F.lit(0))).alias("hops"),
            F.col("jsrc").isNotNull().alias("moved"),
        )
        step = step.localCheckpoint(eager=True)
        moved = step.filter("moved").count()
        cur = step.drop("moved")
        if moved == 0:
            break
    srcs = mapping.select(F.col("src").cast("long").alias("dsrc")).distinct()
    return cur.join(srcs, cur.target == srcs.dsrc, "left").select(
        "src", "target",
        F.when(F.col("dsrc").isNull(), F.col("hops")).alias("hops"),
        F.col("dsrc").isNull().alias("resolved"),
    )


def rewrite_edges(edges: DataFrame, resolved: DataFrame) -> DataFrame:
    """Rewrite an edge table onto canonical (chain-terminal) vertices.

    Every endpoint that appears as a chain source is replaced by its
    resolved target (unresolved/cyclic rows are left untouched).  The
    output is a DEDUPED, LOOP-FREE edge SET: ALL self-loops and ALL
    duplicate edges are dropped — including ones already present in the
    input — not only those the collapse created (canonical link graphs
    downstream want a simple graph, and distinguishing pre-existing
    loops/dups from collapse-created ones would cost an extra join for
    no consumer).  Callers needing multiplicities must aggregate before
    rewriting.
    Two hash joins + one dedup shuffle — the mapping side is the set of
    redirect sources, orders of magnitude smaller than the edge table,
    so Spark broadcasts it when stats allow.
    """
    m = resolved.filter("resolved").select(
        F.col("src").alias("alias_id"), F.col("target").alias("canon_id"))
    out = (
        edges.join(m, edges.src == m.alias_id, "left")
        .select(F.coalesce("canon_id", "src").alias("src"), "dst")
        .join(m, F.col("dst") == m.alias_id, "left")
        .select("src", F.coalesce("canon_id", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out
