#!/usr/bin/env python
"""One scaling-run data point: the flagship pipeline (synthetic pages ->
link extraction -> url dictionary -> graph build -> PageRank supersteps)
at local[CPUS]. Prints one JSON line with phase timings.

All inputs are generated distributively (mapInPandas over spark.range) so
the run measures engine throughput at the chosen parallelism, not driver
datagen. Same job at two parallelism levels = the sandbox stand-in for the
north rule's N-vs-4N-executor scaling requirement.

Usage: python scripts/scaling_run.py CPUS [N_PAGES] [ITERS] [MODE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark import datagen  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
    pagerank,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    DenseGraph,
    pagerank_arrow,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import pages_to_edges  # noqa: E402


def _stub_graph(spark, meta: dict, partitions: int):
    """Session-anchored LinkGraph shell for a LOADED dense index: resident
    supersteps never read the logical edge/vertex tables (the kernel reads
    only the slice files), so the shell carries counts + the session."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        LinkGraph,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    return LinkGraph(
        edges=empty,
        vertices=spark.createDataFrame([], "id long"),
        adj=None,
        num_vertices=int(meta["n"]),
        num_edges=int(meta["m"]),
        partitions=partitions,
        self_loops=True,
        weighted=bool(meta.get("weighted", False)),
    )


def kernel_main(cpus: int, n_edges: int, n_vertices: int, iters: int,
                async_mode: str | None = None, sweeps: int = 1):
    """Kernel-only scaling point: JVM-generated skewed random graph (no
    Python datagen), resident Arrow supersteps. Sized so per-superstep
    compute dominates local-mode fixed costs.

    $SPARK_GRAFT_INDEX_DIR: persist/reuse the dense index across sessions —
    the first session builds the graph and saves the index; later sessions
    (the other parallelism level, the other interleaved pairs) load it and
    measure ONLY supersteps. Same physical input bytes at every level, and
    the N-vs-4N pair is not diluted by a single-core graph build that a
    real cluster performs once."""
    import json as _json

    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"scalek-{cpus}", cpus=cpus)
    phases = {}
    index_dir = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    t = time.monotonic()
    if index_dir and os.path.exists(os.path.join(index_dir, "meta.json")):
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = _json.load(f)
        g = _stub_graph(spark, meta, cpus)
        dense = DenseGraph.load(g, index_dir)
        phases["index_load"] = round(time.monotonic() - t, 3)
    else:
        h1 = F.abs(F.xxhash64(F.col("id")))
        h2 = F.abs(F.xxhash64(F.col("id") + 1_000_000_007))
        # 10% of edges point into a 0.1% hub set -> web-like in-degree skew
        dst = F.when(h1 % 10 == 0, h2 % max(1, n_vertices // 1000)).otherwise(
            h2 % n_vertices)
        raw = spark.range(n_edges).select(
            (h1 % n_vertices).alias("src"), dst.alias("dst"))
        g = build_graph(raw)
        phases["build"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        dense = DenseGraph(g).materialize()
        if index_dir:
            dense.save(index_dir)
        phases["dense_build"] = round(time.monotonic() - t, 3)
    # warmup (slice mmap + worker spin-up), then several measured repeats —
    # the sandbox shows intermittent 3-6x slow periods (noisy-neighbor VM),
    # so each data point is the BEST of 3 runs in one session
    opts = dict(tolerance=0.0, metrics_level="none",
                async_updates=async_mode, async_sweeps=sweeps)
    pagerank_arrow(g, PageRankOptions(max_iterations=2, **opts),
                   dense=dense, resident=True)
    runs = []
    for _ in range(3):
        t = time.monotonic()
        res = pagerank_arrow(g, PageRankOptions(max_iterations=iters, **opts),
                             dense=dense, resident=True)
        runs.append(time.monotonic() - t)
    dt = min(runs)
    phases["pagerank"] = round(dt, 3)
    print(json.dumps({
        "cpus": cpus, "mode": f"kernel-{async_mode}" if async_mode else "kernel",
        "n_vertices": g.num_vertices,
        "n_edges": g.num_edges, "supersteps": res.iterations, "phases": phases,
        "seconds": round(dt, 3), "all_runs": [round(x, 3) for x in runs],
        "sec_per_superstep": round(dt / res.iterations, 3),
        "edges_per_sec_per_superstep": round(
            g.num_edges * res.iterations / dt, 1),
    }))


def extract_main(cpus: int, n_pages: int, pages_path: str):
    """Extraction-only scaling point: read a pre-materialized pages parquet
    (written once, same file at every parallelism level) and time the
    mapInPandas href-extraction pass. This is the CPU-bound Python-worker
    phase — the N-vs-4N pair that isolates compute scaling from the single
    box's shared memory-bandwidth ceiling."""
    from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
        extract_links_arrow as extract_links,
    )

    spark = get_spark(app_name=f"scalex-{cpus}", cpus=cpus)
    if not os.path.isdir(pages_path):
        # one-time datagen, excluded from timing (run once at high cpus)
        datagen.pages_df_dist(spark, n_pages).repartition(64).write.parquet(
            pages_path)
    pages = spark.read.parquet(pages_path)
    n_rows = pages.count()
    # warmup: spin up Python workers + pull the parquet into page cache
    extract_links(pages).count()
    runs = []
    for _ in range(3):
        t = time.monotonic()
        n_links = extract_links(pages).count()
        runs.append(time.monotonic() - t)
    dt = min(runs)
    print(json.dumps({
        "cpus": cpus, "mode": "extract", "n_pages": n_rows,
        "n_links": n_links, "seconds": round(dt, 3),
        "all_runs": [round(x, 3) for x in runs],
        "pages_per_sec": round(n_rows / dt, 1),
    }))


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "arrow"
    if mode in ("kernel", "kernel-async", "kernel-async-shared"):
        # argv[2] = edge count; argv[5] = avg out-degree (default 16 —
        # use ~40 for reference-corpus-like web density, e.g. uk-2005);
        # kernel-async[-shared]: barrier-free Gauss-Seidel updates, argv[6]
        # = local sweeps per superstep (default 2)
        deg = int(sys.argv[5]) if len(sys.argv) > 5 else 16
        am = None
        if mode != "kernel":
            am = "shared" if mode.endswith("shared") else "slice"
        sweeps = int(sys.argv[6]) if len(sys.argv) > 6 else (2 if am else 1)
        kernel_main(cpus, n_pages, max(1, n_pages // deg), iters,
                    async_mode=am, sweeps=sweeps)
        return
    if mode == "extract":
        extract_main(cpus, n_pages,
                     sys.argv[5] if len(sys.argv) > 5
                     else "/tmp/scaling_pages.parquet")
        return

    spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
    phases: dict[str, float] = {}
    t_all = time.monotonic()

    t = time.monotonic()
    pages = datagen.pages_df_dist(spark, n_pages).persist()
    n_rows = pages.count()
    phases["generate_pages"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    edges, d = pages_to_edges(pages)
    g = build_graph(edges, vertices=d.select("id"))
    phases["extract_build"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    if mode == "arrow":
        dense = DenseGraph(g).materialize()
        phases["dense_build"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               metrics_level="none"),
            dense=dense, resident=True)
    else:
        res = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               check_every=5, metrics_level="none"))
    res.ranks.count()
    phases["pagerank"] = round(time.monotonic() - t, 3)

    total = round(time.monotonic() - t_all, 3)
    print(json.dumps({
        "cpus": cpus, "mode": mode, "n_pages": n_rows,
        "n_vertices": g.num_vertices, "n_edges": g.num_edges,
        "supersteps": res.iterations, "phases": phases,
        "seconds": total,
        "pages_per_sec": round(n_rows / total, 1),
        "sec_per_superstep": round(phases["pagerank"] / max(1, res.iterations), 3),
        "edges_per_sec_per_superstep": round(
            g.num_edges * res.iterations / phases["pagerank"], 1),
    }))


if __name__ == "__main__":
    main()
