#!/usr/bin/env python
"""One scaling-run data point: static PageRank (fixed supersteps) on a
large synthetic graph at local[CPUS]. Prints one JSON line.

The graph is generated distributively (spark.range + xxhash64 — no driver
materialization) so the benchmark measures kernel throughput, not datagen.
Usage: python scripts/scaling_run.py CPUS [N_EDGES] [N_VERTICES] [ITERS] [MODE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
    pagerank,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    DenseGraph,
    pagerank_arrow,
)


def main():
    cpus = int(sys.argv[1])
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    n_vertices = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    mode = sys.argv[5] if len(sys.argv) > 5 else "arrow"

    spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
    raw = spark.range(n_edges).select(
        (F.abs(F.xxhash64(F.col("id"))) % n_vertices).alias("src"),
        (F.abs(F.xxhash64(F.col("id") + 1_000_000_007)) % n_vertices).alias("dst"),
    )
    g = build_graph(raw)
    dense = DenseGraph(g) if mode == "arrow" else None

    t0 = time.monotonic()
    if mode == "arrow":
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               metrics_level="none"), dense=dense)
    else:
        res = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               check_every=4, metrics_level="none"))
    res.ranks.count()
    dt = time.monotonic() - t0

    print(json.dumps({
        "cpus": cpus, "mode": mode, "n_vertices": g.num_vertices,
        "n_edges": g.num_edges, "supersteps": res.iterations,
        "seconds": round(dt, 3),
        "sec_per_superstep": round(dt / res.iterations, 3),
        "edges_per_sec_per_superstep": round(g.num_edges * res.iterations / dt, 1),
    }))


if __name__ == "__main__":
    main()
