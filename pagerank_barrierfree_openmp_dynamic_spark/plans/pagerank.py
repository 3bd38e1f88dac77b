"""Damped PageRank: static, naive-dynamic, and Dynamic Frontier modes.

Semantics are lifted from the reference and re-expressed as BSP supersteps:

- recurrence (``pagerankCalculateRank``, ``/root/reference/src/pagerank.hxx:203-213``)::

      a[v] = C0 + d * sum_{u in in(v)} r[u] / outdeg(u)

  with ``C0 = (1-d)/N`` because self-loops on every vertex eliminate dead
  ends (README.md:8-9; dead-end teleport ``pagerankTeleport`` is also
  implemented for graphs built without self-loops).
- loop (``pagerankBasicOmpLoop``, ``src/pagerankBasic.hxx:53-67``): sweep,
  error = norm(new, old) (L1/L2/L∞, ``src/_vector.hxx:250-461``), stop at
  ``err < tolerance`` or ``max_iterations``. Defaults match
  ``PagerankOptions`` (``src/pagerank.hxx:50``): d=0.85, tol=1e-10 L∞, 500.
- static vs naive-dynamic differ ONLY in the initial vector — 1/N vs the
  previous ranks (``src/pagerank.hxx:443-444, 488-489``).
- Dynamic Frontier (``src/pagerankBasic.hxx:174-201``): recompute only the
  affected set; a vertex whose rank moved by more than ``D = 0.001·tol``
  marks its out-neighbors affected; error is L∞ over the affected deltas
  (unaffected vertices contribute zero — in the reference they keep
  ``a[v]==r[v]``). The affected set only grows (the contracting variant is
  available behind ``contracting=True``; the reference found it slightly
  slower, README.md "Dynamic Contracting Frontier").
- barrier-free equivalence: the async OpenMP execution converges to the
  same fixed point as with-barrier (README.md:61-63) — and so does a BSP
  run whose convergence check happens every ``check_every`` supersteps
  (threads "running ahead" of the check is exactly what barrier-free
  permits). Per-vertex convergence flags
  (``src/pagerankBarrierfree.hxx:68-122``) correspond to the
  ``contracting`` active-set bookkeeping here. Match criterion is converged
  ranks at L∞ ≤ 1e-6, which all of these satisfy.

Physical plan per superstep: one join of the persisted, src-partitioned
``adj`` table with the rank state (broadcast when ranks are small, else
co-partitioned sort-merge — ``adj`` never re-shuffles), one
``groupBy(dst)`` shuffle with map-side partial aggregation (the transpose
direction is realized by the shuffle itself, replacing
``transposeWithDegree``), then a rank-state update join. Every superstep is
materialized eagerly (one job over persisted parents); ``check_every > 1``
skips only the convergence reduction between checks. Lineage is truncated at
every check via eager ``localCheckpoint`` (plus durable parquet/Iceberg
checkpoints for resume), and the loop runs with AQE off
(:func:`..session.adaptive_execution` — superstep shapes are fully known).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import METRICS_SCHEMA, CheckpointStore
from ..operators.batch import batch_endpoints_frontier
from ..operators.graph import LinkGraph
from ..session import adaptive_execution

_NORM_AGG = {
    "L1": lambda c: F.sum(F.abs(c)),
    "L2": lambda c: F.sum(c * c),
    "Li": lambda c: F.max(F.abs(c)),
}


@dataclass
class PageRankOptions:
    """Defaults mirror ``/root/reference/src/pagerank.hxx:34-52``."""

    damping: float = 0.85
    tolerance: float = 1e-10
    tolerance_norm: str = "Li"  # L1 | L2 | Li
    max_iterations: int = 500
    frontier_tolerance_factor: float = 0.001  # D = factor * tolerance
    dead_end_teleport: bool = False  # DEAD=true variant (pagerank.hxx:158-184)
    contracting: bool = False  # skip converged vertices (approach-cfrontier)
    # Asynchronous rank updates (reference ASYNC=true,
    # src/pagerankBarrierfree.hxx:213-235, src/pagerank.hxx:446,491):
    # within an update pass, later vertices read already-updated ranks, so
    # convergence takes fewer iterations than synchronous Jacobi. Arrow
    # resident kernel only. None = synchronous (Jacobi/BSP). "slice" =
    # per-slice chunked Gauss-Seidel — cluster-safe: each task processes
    # its dst-residue segment in ordered chunks and reads updated ranks
    # for its OWN already-processed sources (freshness ~1/n_slices of the
    # reference's shared-memory mix). "shared" = single-node barrier-free:
    # the rank vector lives in one mmap'd buffer that every slice task
    # updates in place and reads the freshest mix of old/new ranks from —
    # the reference's OpenMP execution model verbatim (requires all
    # executors on one host, the reference's own setting; use "slice" on
    # a multi-node cluster). Both reach the same fixed point as Jacobi.
    async_updates: str | None = None
    async_chunks: int = 16  # Gauss-Seidel chunks per slice (freshness grain)
    # Local sweeps per distributed superstep (async modes only). The
    # reference's barrier-free threads never wait at an iteration boundary —
    # they keep updating with whatever fresh ranks exist. The Spark analogue:
    # each slice task re-sweeps its own segment ``async_sweeps`` times before
    # the exchange, reading its own fresh values (and, in "shared" mode,
    # every other concurrently-running slice's). Extra sweeps cost worker
    # CPU only — no extra job/broadcast/barrier — and cut the number of
    # distributed supersteps (measured ~25% at 2, ~35% at 3 on synth webgraphs;
    # the cross-slice coupling bounds further gains). 1 = plain chunked GS.
    async_sweeps: int = 1
    # Salt the rank⋈adj join against hub sources: >0 forces that many salt
    # buckets, 0 disables, None (default) auto-detects — when the join is a
    # shuffle join (N above broadcast_vertices) AND the graph's out-degree
    # skew crosses salt_skew_threshold with an absolute hub of at least
    # salt_min_degree out-edges, the loop turns on salt_auto_buckets. The
    # stats come from one edges agg, amortized over every superstep; ranks
    # are bitwise-identical either way (test_salted_scatter_same_result).
    salt_buckets: int | None = None
    salt_skew_threshold: float = 8.0  # hub outdeg vs per-task |E|/P trigger
    salt_min_degree: int = 100_000  # absolute hub floor (rows per join task)
    salt_auto_buckets: int = 8  # cap on auto-chosen buckets
    check_every: int = 1  # supersteps between convergence checks (barrier-free spirit)
    # Broadcast the rank state into the scatter/update joins when the vertex
    # count is at most this (the persisted, src-partitioned edge table then
    # never shuffles). Above it, joins stay co-partitioned sort-merge. The
    # engine knows N exactly — better than Catalyst's unknown-stats guess
    # for checkpointed iterative state.
    broadcast_vertices: int = 2_000_000
    # Keep AQE on inside the superstep loop. Off by default: superstep plans
    # have fully-known shapes (N, |E|, broadcast sides, salt buckets are all
    # explicit), so AQE's per-action re-planning only adds latency — measured
    # 3-4x per superstep at bench scale. The session default (AQE on) is
    # restored after the loop; scan/build phases keep it.
    adaptive_supersteps: bool = False
    checkpoint_dir: str | None = None  # durable resume checkpoints
    checkpoint_every: int = 1  # in units of checks
    metrics_level: str = "iteration"  # none | iteration | partition
    run_id: str | None = None
    # Fault injection (reference runSleepFailures / runCrashFailures,
    # /root/reference/main.cxx:137-170): deterministic per (fault_seed,
    # iteration, slice) via fault_draw(), so the driver can predict every
    # injected fault. Spark's unit of failure is the task; its remedies
    # are exact where the reference's are best-effort: a crashed task is
    # RETRIED against the same immutable slice files + broadcast ranks
    # (bit-identical result; requires a retry-enabled master —
    # get_spark(task_retries=...) / spark.task.maxFailures>1, enforced
    # upfront), and a sleeping task is a straggler whose barrier cost the
    # barrier-free modes amortize over ~40% fewer supersteps (plus
    # spark.speculation on a cluster, jobs/run_pagerank.py). Arrow
    # resident kernels only; crash injection fires on first attempts
    # only, so every retry succeeds. scripts/fault_experiment.py records
    # the measured evidence.
    fault_crash_prob: float = 0.0  # per (iteration, slice) task-crash prob
    fault_sleep_prob: float = 0.0  # per (iteration, slice) sleep prob
    fault_sleep_ms: int = 0  # sleep duration (reference FAILURE_DURATION)
    fault_seed: int = 0


@dataclass
class PageRankResult:
    """Analogue of ``PagerankResult`` (``src/pagerank.hxx:60-76``)."""

    ranks: DataFrame
    iterations: int
    err: float
    time_s: float
    metrics: list[dict] = field(default_factory=list)


def _init_ranks(graph: LinkGraph, init: DataFrame | None) -> DataFrame:
    n = graph.num_vertices
    if init is None:
        return graph.vertices.select("id", F.lit(1.0 / n).alias("rank"))
    # Align previous ranks to the current vertex set; vertices unseen in the
    # previous run start at 1/N (new pages after a batch).
    return graph.vertices.join(init, "id", "left").select(
        "id", F.coalesce("rank", F.lit(1.0 / n)).alias("rank")
    )


def _dead_rank_sum(ranks: DataFrame, dead: DataFrame) -> float:
    """Dead-end handling ``pagerankTeleport`` (``src/pagerank.hxx:158-184``):
    the rank mass sitting on zero-out-degree vertices this superstep, to be
    redistributed through the teleport term (uniformly, or ∝ p when
    personalized). ``dead`` (id,) is graph-static, computed once per graph."""
    return float(
        ranks.join(F.broadcast(dead), "id", "left_semi")
        .agg(F.sum("rank"))
        .collect()[0][0]
        or 0.0
    )


def _resolve_salt(
    graph: LinkGraph, o: PageRankOptions, small: bool
) -> tuple[int, list[int] | None]:
    """Resolve ``salt_buckets=None`` (auto) into (buckets, hub id list).

    Only a shuffle join can have a hot partition (the broadcast-rank plan
    never shuffles adj), and only a hub whose out-edge count dwarfs the
    per-task average (|E|/partitions) creates a straggler. Auto mode salts
    the HUB KEYS ONLY: the hub rows' rank entries are replicated R ways and
    everyone else keeps one row — measured on this box, replicating the
    whole rank table costs more than the straggler it removes even at 9x
    hot-partition skew, while key-subset salting adds only |hubs|·R rows.
    One edges agg + a tiny hub collect, amortized over every superstep.

    Explicit ``salt_buckets=k`` keeps the uniform all-key salting (hub_ids
    None) for forced/benchmark use; auto mode returns buckets=0 plus the
    hub id list — the loop handles hubs by SPLITTING them out of the
    co-partitioned join instead of salting (see ``_loop``): a two-key
    (src, _salt) join would forfeit adj's persisted src-partitioning and
    re-shuffle the whole edge table every superstep, which measures slower
    than the straggler it removes.
    """
    if o.salt_buckets is not None:
        return o.salt_buckets, None
    if small:
        return 0, None
    per_task = max(1.0, graph.num_edges / max(1, graph.partitions))
    floor = max(o.salt_min_degree, o.salt_skew_threshold * per_task)
    hubs = (
        graph.edges.groupBy("src")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= floor)
        .orderBy(F.col("c").desc())
        .limit(1024)
        .collect()
    )
    if not hubs:
        return 0, None
    return 0, [int(r["src"]) for r in hubs]


def _scatter(
    graph: LinkGraph,
    ranks: DataFrame,
    dst_filter: DataFrame | None,
    salt_buckets: int,
    small: bool = False,
    hub_split: tuple | None = None,
) -> DataFrame:
    """Contribution gather: SUM over in-edges of rank/outdeg, grouped by dst.

    Returns (dst, s). ``dst_filter`` (id,) restricts output to an affected
    set by semi-joining the edge table before the shuffle (frontier mode —
    the frontier side is broadcast). ``salt_buckets > 0`` (forced) salts
    every key: rank rows replicate R ways and the join key becomes
    (src, _salt). ``hub_split`` (auto skew handling) is
    ``(adj_rest, adj_hub, hub_ids)``: adj_rest keeps the persisted
    src-partitioning for the co-partitioned join, adj_hub is the hubs'
    adjacency spread EVENLY by round-robin and joined against a BROADCAST
    of just the hub ranks — no straggler task, no adj re-shuffle, extra
    volume = |hubs| broadcast rows. The ``groupBy(dst)`` partial agg
    recombines both branches.
    """
    if hub_split is not None:
        adj_rest, adj_hub, hub_ids = hub_split
    else:
        adj_rest, adj_hub = graph.adj, None
    if dst_filter is not None:
        adj_rest = adj_rest.join(
            F.broadcast(dst_filter), adj_rest.dst == dst_filter.id, "left_semi")
        if adj_hub is not None:
            adj_hub = adj_hub.join(
                F.broadcast(dst_filter), adj_hub.dst == dst_filter.id,
                "left_semi")
    r = ranks.select(F.col("id").alias("_rid"), F.col("rank").alias("_r"))
    if salt_buckets > 0:
        adj_rest = adj_rest.withColumn(
            "_salt", F.pmod(F.xxhash64("src", "dst"), F.lit(salt_buckets))
        )
        rs = r.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
        if small:
            rs = F.broadcast(rs)
        joined = adj_rest.join(
            rs, (adj_rest.src == rs._rid) & (adj_rest._salt == rs._salt))
    else:
        rr = F.broadcast(r) if small else r
        joined = adj_rest.join(rr, adj_rest.src == F.col("_rid"))
    if adj_hub is not None:
        r_hub = F.broadcast(r.filter(F.col("_rid").isin(hub_ids)))
        joined = joined.select("dst", "_r", "w").unionByName(
            adj_hub.join(r_hub, adj_hub.src == F.col("_rid"))
            .select("dst", "_r", "w"))
    return joined.groupBy("dst").agg(F.sum(F.col("_r") * F.col("w")).alias("s"))


def pagerank(
    graph: LinkGraph,
    opts: PageRankOptions | None = None,
    init: DataFrame | None = None,
    personalization: DataFrame | None = None,
) -> PageRankResult:
    """Static (init=None) or naive-dynamic (init=previous ranks) PageRank —
    ``pagerankBasicOmp`` (``src/pagerankBasic.hxx:97-107``). Full sweeps,
    global-norm stop.

    ``personalization`` (id, p) replaces the uniform teleport with a vector
    one: a[v] = (1-d)·p[v] + d·Σ r[u]·w(u,v) (p is normalized to sum 1;
    vertices absent from the frame get p=0; dead-end mass, when enabled,
    also redistributes ∝ p). Uniform p = 1/N reduces to the reference
    recurrence exactly. Not in the reference (its teleport is uniform-only,
    ``src/pagerank.hxx:158-184``) — a standard engine extension for
    topic-/seed-biased link analysis.
    """
    o = opts or PageRankOptions()
    mode = "static" if init is None else "naive-dynamic"
    if personalization is not None:
        mode = f"personalized-{mode}"
    return _loop(graph, _init_ranks(graph, init), None, o, mode,
                 personalization=personalization)


def pagerank_dynamic_frontier(
    graph_old: LinkGraph,
    graph_new: LinkGraph,
    batch: DataFrame,
    prev_ranks: DataFrame,
    opts: PageRankOptions | None = None,
    frontier: DataFrame | None = None,
) -> PageRankResult:
    """Dynamic Frontier re-rank after an edge batch —
    ``pagerankBasicDynamicFrontierOmp`` / barrier-free variant
    (``src/pagerankBasic.hxx:174-201``, ``src/pagerankBarrierfree.hxx:319-330``).
    ``frontier`` overrides the seed affected set (used by the Traversal
    strategy, which seeds with the full reachability closure).
    """
    o = opts or PageRankOptions()
    if frontier is None:
        frontier = batch_endpoints_frontier(graph_old, graph_new, batch)
    return _loop(
        graph_new, _init_ranks(graph_new, prev_ranks), frontier, o, "dynamic-frontier"
    )


def resume(graph: LinkGraph, opts: PageRankOptions) -> PageRankResult:
    """Continue a checkpointed run from its latest committed superstep
    (north rule: runs resume mid-convergence)."""
    if not opts.checkpoint_dir:
        raise ValueError("resume requires opts.checkpoint_dir")
    store = CheckpointStore(opts.checkpoint_dir)
    it = store.latest()
    if it is None:
        raise FileNotFoundError(f"no committed iteration under {opts.checkpoint_dir}")
    spark = graph.edges.sparkSession
    ranks = store.load_ranks(spark, it)
    frontier = store.load_frontier(spark, it)
    info = store.commit_info(it)
    return _loop(
        graph,
        ranks,
        frontier,
        replace(opts, run_id=info.get("run_id")),
        info.get("mode", "resumed"),
        start_iteration=it,
        personalization=store.load_personalization(spark),
    )


def _loop(
    graph: LinkGraph,
    ranks0: DataFrame,
    frontier0: DataFrame | None,
    o: PageRankOptions,
    mode: str,
    start_iteration: int = 0,
    personalization: DataFrame | None = None,
) -> PageRankResult:
    if graph.adj is None:
        raise ValueError(
            "graph has no adj table (light view from apply_batch_dense) — "
            "use pagerank_arrow with its delta DenseGraph, or rebuild via "
            "build_graph(graph.edges, ...) for the join-agg path")
    spark = graph.edges.sparkSession
    n, d = graph.num_vertices, o.damping
    tol = o.tolerance
    D = o.frontier_tolerance_factor * tol
    norm_agg = _NORM_AGG[o.tolerance_norm]
    run_id = o.run_id or uuid.uuid4().hex[:12]
    store = CheckpointStore(o.checkpoint_dir) if o.checkpoint_dir else None
    dead_mode = o.dead_end_teleport and not graph.self_loops
    check_every = 1 if dead_mode else max(1, o.check_every)
    small = n <= o.broadcast_vertices
    dead = None
    if dead_mode:
        dead = (
            graph.vertices.join(
                graph.adj.select(F.col("src").alias("id")), "id", "left_anti"
            )
            .localCheckpoint(eager=True)
        )

    pvec = None
    if personalization is not None:
        tot = float(
            personalization.agg(F.sum("p")).collect()[0][0] or 0.0
        )
        if tot <= 0.0:
            raise ValueError("personalization weights must sum to > 0")
        pvec = (
            graph.vertices.join(personalization.select("id", "p"), "id", "left")
            .select(
                "id",
                (F.coalesce("p", F.lit(0.0)) / F.lit(tot)).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        pvec_b = F.broadcast(pvec) if small else pvec
        if store is not None:
            # iteration-independent: saved once so resume() re-applies the
            # same teleport vector
            store.save_personalization(pvec)

    salt, hub_ids = _resolve_salt(graph, o, small)
    hub_split = None
    adj_hub = None
    if hub_ids:
        # Split detected hubs out of the co-partitioned join ONCE: their
        # adjacency spread evenly (round-robin), persisted for the run;
        # their (few) ranks broadcast per superstep. adj_rest's filter
        # preserves the persisted src-partitioning, so the main join still
        # plans with no adj exchange.
        adj_rest = graph.adj.filter(~F.col("src").isin(hub_ids))
        adj_hub = (
            graph.adj.filter(F.col("src").isin(hub_ids))
            .repartition(graph.partitions)
            .persist()
        )
        adj_hub.count()
        hub_split = (adj_rest, adj_hub, hub_ids)

    ranks = ranks0.localCheckpoint(eager=True)
    frontier = (
        frontier0.distinct().localCheckpoint(eager=True) if frontier0 is not None else None
    )
    # Contracting mode: the live active set starts as the frontier and loses
    # vertices whose delta drops below tol (they re-enter on neighbor push).
    active = frontier if o.contracting else None

    metrics: list[dict] = []
    err = float("inf")
    it = start_iteration
    checks = 0
    t0 = time.monotonic()
    pending: list[DataFrame] = []  # persisted intermediates since last check

    with adaptive_execution(spark, o.adaptive_supersteps):
        while it < o.max_iterations:
            t_it = time.monotonic()
            s_dead = _dead_rank_sum(ranks, dead) if dead_mode else 0.0
            scope = active if o.contracting else frontier  # None => full sweep
            sums = _scatter(graph, ranks, scope, salt, small, hub_split)
            if small:
                sums = F.broadcast(sums)
            if pvec is None:
                tele = F.lit((1.0 - d) / n + d * s_dead / n)
            else:
                # vector teleport: (1-d)·p[v] (+ dead-end mass ∝ p[v])
                tele = F.col("p") * F.lit((1.0 - d) + d * s_dead)
            new_rank = tele + F.lit(d) * F.coalesce("s", F.lit(0.0))

            if scope is None:
                base = ranks if pvec is None else ranks.join(pvec_b, "id")
                state = base.join(sums, base.id == sums.dst, "left").select(
                    base.id,
                    new_rank.alias("rank"),
                    F.abs(new_rank - base.rank).alias("delta"),
                )
                state.persist()
                pending.append(state)
                ranks_next = state.select("id", "rank")
            else:
                upd = (F.broadcast(scope) if small else scope).join(ranks, "id")
                if pvec is not None:
                    upd = upd.join(pvec_b, "id")
                upd = (
                    upd.join(sums, F.col("id") == sums.dst, "left")
                    .select(
                        F.col("id"),
                        new_rank.alias("new_rank"),
                        F.abs(new_rank - F.col("rank")).alias("delta"),
                    )
                )
                upd.persist()
                pending.append(upd)
                state = upd.select("id", F.col("new_rank").alias("rank"), "delta")
                upd_small = upd.select("id", "new_rank")
                if small:
                    upd_small = F.broadcast(upd_small)
                ranks_next = ranks.join(upd_small, "id", "left").select(
                    "id", F.coalesce("new_rank", "rank").alias("rank")
                )
                ranks_next.persist()
                pending.append(ranks_next)
            it += 1

            # Frontier expansion (fr): out-neighbors of vertices that moved > D.
            if frontier is not None:
                movers = state.filter(F.col("delta") > D).select("id")
                expand = graph.edges.join(
                    F.broadcast(movers), graph.edges.src == movers.id, "left_semi"
                ).select(F.col("dst").alias("id"))
                frontier = frontier.unionByName(expand).distinct().persist()
                pending.append(frontier)
                if o.contracting:
                    still = state.filter(F.col("delta") > tol).select("id")
                    active = still.unionByName(expand).distinct().persist()
                    pending.append(active)

            at_check = (it - start_iteration) % check_every == 0 or it >= o.max_iterations
            if not at_check:
                # Materialize this superstep NOW (one job over persisted
                # parents). check_every>1 skips only the convergence reduction
                # (the barrier-free "threads run ahead of the check"); chained
                # lazy supersteps would re-execute under the later action.
                ranks_next.count()
                if frontier is not None:
                    frontier.count()
                    if o.contracting:
                        active.count()
                ranks = ranks_next
                continue

            # ---- convergence check: the norm reduction over the (cached)
            # superstep state; lineage is truncated afterwards. ----
            checks += 1
            row = state.agg(
                norm_agg(F.col("delta")).alias("err"),
                F.max(F.abs("delta")).alias("linf"),
                F.count("*").alias("rows"),
            ).collect()[0]
            err = float(row["err"] or 0.0)
            linf = float(row["linf"] or 0.0)
            rows = int(row["rows"])

            ranks = ranks_next.localCheckpoint(eager=True)
            if frontier is not None:
                frontier = frontier.localCheckpoint(eager=True)
                if o.contracting:
                    active = active.localCheckpoint(eager=True)
            for df in pending:
                df.unpersist()
            pending = []

            ms = (time.monotonic() - t_it) * 1000.0
            if o.metrics_level != "none":
                metrics.append(
                    dict(run_id=run_id, mode=mode, iteration=it, partition_id=-1,
                         rows_processed=rows, edges_processed=graph.num_edges,
                         delta_linf=linf, elapsed_ms=ms)
                )
                if o.metrics_level == "partition":
                    per = (
                        state.groupBy(F.spark_partition_id().alias("pid"))
                        .agg(F.count("*").alias("cnt"), F.max(F.abs("delta")).alias("dmax"))
                        .collect()
                    )
                    metrics.extend(
                        dict(run_id=run_id, mode=mode, iteration=it,
                             partition_id=int(r2["pid"]), rows_processed=int(r2["cnt"]),
                             edges_processed=-1, delta_linf=float(r2["dmax"] or 0.0),
                             elapsed_ms=-1.0)
                        for r2 in per
                    )

            if store and (checks % o.checkpoint_every == 0):
                mdf = (
                    spark.createDataFrame(
                        [tuple(m[f.name] for f in METRICS_SCHEMA.fields) for m in metrics],
                        METRICS_SCHEMA,
                    )
                    if o.metrics_level != "none"
                    else None
                )
                store.save(it, ranks, frontier, mdf,
                           extra={"run_id": run_id, "mode": mode, "err": err})

            if err < tol:
                break
            if o.contracting and rows == 0:
                break

    if adj_hub is not None:
        adj_hub.unpersist()
    return PageRankResult(
        ranks=ranks,
        iterations=it - start_iteration,
        err=err,
        time_s=time.monotonic() - t0,
        metrics=metrics,
    )
