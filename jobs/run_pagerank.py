#!/usr/bin/env python
"""spark-submit entrypoint: pages -> link extraction -> graph -> PageRank.

Cluster launch (north rule):

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_pagerank.py \
        --pages <iceberg-table-or-parquet-path> \
        --output /path/ranks --checkpoint /path/ckpt [--mode arrow|joinagg] \
        [--kernel pagerank|cc|lpa|triangles] [--weight-col weight] \
        [--personalization /path/p.parquet] \
        [--tolerance 1e-10] [--max-iterations 500] [--resume]

On a real cluster the session comes from spark-submit's conf (executors,
memory, AQE) — ``SparkSession.builder.getOrCreate()`` here inherits it; the
``local[N]`` factory in ``session.py`` is only the sandbox stand-in.

Fault tolerance (the reference's sleep/crash fault-injection experiment,
``/root/reference/main.cxx:137-178``, E3): Spark's task retry
(``spark.task.maxFailures``, default 4) and stage re-execution subsume
injected thread crashes — a failed slice task replays from the persisted
edge blocks / resident slice files with no driver involvement, and
``--checkpoint`` covers driver loss mid-convergence (``--resume``). For
straggling (the "sleep" injection), enable speculative execution:

    --conf spark.speculation=true \
    --conf spark.speculation.multiplier=3 \
    --conf spark.speculation.quantile=0.9

Superstep kernels are pure functions of (broadcast ranks, immutable slice
files), so a speculative duplicate of a slow task is always safe; the
"shared" async mode is the one exception (worker-local mmap writes) — keep
speculation off for ``async_updates='shared'``, which is single-host anyway.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
    pagerank,
    resume as resume_run,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    pagerank_arrow,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (  # noqa: E402
    connected_components,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import (  # noqa: E402
    label_propagation,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (  # noqa: E402
    triangle_count,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import pages_to_edges  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet dir or iceberg table)")
    ap.add_argument("--canonicalize", action="store_true",
                    help="canonicalize urls before edge building (collapse "
                         "www./default-port/tracking-param/fragment variants)")
    ap.add_argument("--drop-nofollow", action="store_true",
                    help="exclude rel=nofollow links from edge building")
    ap.add_argument("--edges", help="pre-extracted (src,dst) parquet path")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint")
    ap.add_argument("--mode", default="joinagg", choices=["joinagg", "arrow"])
    ap.add_argument("--kernel", default="pagerank",
                    choices=["pagerank", "cc", "lpa", "triangles"])
    ap.add_argument("--weight-col", help="edge weight column (weighted PageRank)")
    ap.add_argument("--personalization",
                    help="parquet path with (id, p) teleport weights")
    ap.add_argument("--lpa-iterations", type=int, default=5)
    ap.add_argument("--dense-index",
                    help="arrow mode: directory for the persisted dense "
                         "index (loaded if present, else built and saved)")
    ap.add_argument("--tolerance", type=float, default=1e-10)
    ap.add_argument("--max-iterations", type=int, default=500)
    ap.add_argument("--async-updates", choices=["slice", "shared"],
                    help="arrow mode: barrier-free Gauss-Seidel updates "
                         "(reference ASYNC=true); 'shared' is single-host")
    ap.add_argument("--async-sweeps", type=int, default=1,
                    help="local sweeps per distributed superstep (async)")
    ap.add_argument("--fault-crash-prob", type=float, default=0.0,
                    help="inject deterministic first-attempt task crashes "
                         "per (superstep, slice) — requires "
                         "spark.task.maxFailures > 1; recovered by retry "
                         "bit-identically (reference runCrashFailures)")
    ap.add_argument("--fault-sleep-prob", type=float, default=0.0,
                    help="straggler injection probability per (superstep, "
                         "slice) (reference runSleepFailures)")
    ap.add_argument("--fault-sleep-ms", type=int, default=0)
    ap.add_argument("--fault-seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-pagerank").getOrCreate()

    if args.edges:
        edges = spark.read.format(args.format).load(args.edges)
        vertices = None
    elif args.pages:
        pages = spark.read.format(args.format).load(args.pages)
        edges, d = pages_to_edges(pages, canonicalize=args.canonicalize,
                                  drop_nofollow=args.drop_nofollow)
        vertices = d.select("id")
    else:
        ap.error("one of --pages / --edges is required")

    g = build_graph(edges, vertices=vertices, weight_col=args.weight_col)

    if args.kernel != "pagerank":
        if args.kernel == "cc":
            out = connected_components(g)
        elif args.kernel == "lpa":
            out = label_propagation(g, iterations=args.lpa_iterations)
        else:
            n_tri = triangle_count(g)
            out = spark.createDataFrame([(n_tri,)], "n_triangles long")
        out.write.mode("overwrite").format(args.format).save(args.output)
        print(json.dumps({
            "kernel": args.kernel,
            "n_vertices": g.num_vertices, "n_edges": g.num_edges,
        }))
        return

    pers = (spark.read.parquet(args.personalization)
            if args.personalization else None)
    if args.async_updates and args.mode != "arrow":
        ap.error("--async-updates requires --mode arrow")
    if args.async_updates == "shared":
        # the mmap'd shared rank buffer is only write-coherent when every
        # executor shares one host's page cache (the reference's own
        # shared-memory setting) — over NFS on a multi-node cluster the
        # barrier-free mix silently degrades; refuse instead
        master = spark.sparkContext.master or ""
        if not master.startswith("local"):
            ap.error(
                "--async-updates shared requires a single-host (local[*]) "
                f"master — got {master!r}; use --async-updates slice on "
                "multi-node clusters (cluster-safe chunked Gauss-Seidel)")
    opts = PageRankOptions(
        tolerance=args.tolerance,
        max_iterations=args.max_iterations,
        checkpoint_dir=args.checkpoint,
        metrics_level="partition" if args.checkpoint else "iteration",
        async_updates=args.async_updates,
        async_sweeps=args.async_sweeps,
        fault_crash_prob=args.fault_crash_prob,
        fault_sleep_prob=args.fault_sleep_prob,
        fault_sleep_ms=args.fault_sleep_ms,
        fault_seed=args.fault_seed,
    )
    if (args.fault_crash_prob or args.fault_sleep_prob) and args.mode != "arrow":
        ap.error("--fault-* injection targets the arrow resident kernels")
    if args.resume:
        if not args.checkpoint:
            ap.error("--resume requires --checkpoint")
        res = resume_run(g, opts)
    elif args.mode == "arrow":
        dense = None
        if args.dense_index:
            from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
                DenseGraph,
            )

            if os.path.exists(os.path.join(args.dense_index, "meta.json")):
                dense = DenseGraph.load(g, args.dense_index)
            else:
                dense = DenseGraph(g)
                dense.save(args.dense_index)
        res = pagerank_arrow(
            g, opts, dense=dense, personalization=pers,
            resident=(True if dense is not None or args.async_updates
                      or args.fault_crash_prob or args.fault_sleep_prob
                      else None))
    else:
        res = pagerank(g, opts, personalization=pers)

    res.ranks.write.mode("overwrite").format(args.format).save(args.output)
    print(json.dumps({
        "iterations": res.iterations, "err": res.err,
        "seconds": round(res.time_s, 3),
        "n_vertices": g.num_vertices, "n_edges": g.num_edges,
    }))


if __name__ == "__main__":
    main()
