#!/usr/bin/env python
"""spark-submit entrypoint: crawl-to-crawl delta analytics.

Production crawlers hand the pipeline full snapshots, not change streams.
This job turns two consecutive edge snapshots into a batch
(``graph_diff``, the inverse of ``apply_batch``) and then runs every
dynamic kernel on the delta instead of recomputing from scratch — the
reference's whole thesis (``/root/reference/README.md:47-58``: dynamic
beats static when the batch is small) applied across the kernel shelf:

- Dynamic Frontier PageRank seeded from the old converged ranks
  (only batch-affected vertices and their out-trees re-rank);
- full dynamic connected components (deletion-split components reset,
  insert merges warm-started — everything else converged at iteration 0);
- incremental triangle maintenance (O(batch * avg-degree) delta count,
  never a recount).

Cluster launch:

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_crawl_diff.py \
        --old <parquet-or-iceberg edges: src,dst> --new <same shape> \
        --output /path/out [--tolerance 1e-10] [--damping 0.85] \
        [--prev-ranks /prior/out/ranks] \
        [--prev-components /prior/out/components] [--t-old N]

Outputs under --output: ``batch/`` (the derived ins/del batch),
``ranks/`` (re-ranked PageRank), ``components/`` (new labels) and a
one-line JSON metrics summary on stdout (batch size, frontier
iterations, triangle delta). The first run bootstraps old-snapshot state
(one static PR + CC + triangle count); every later run feeds the prior
run's outputs back via the ``--prev-*``/``--t-old`` flags so nothing is
recomputed from scratch again.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (  # noqa: E402
    apply_batch,
    graph_diff,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (  # noqa: E402
    build_graph,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (  # noqa: E402
    connected_components,
    connected_components_dynamic,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
    pagerank,
    pagerank_dynamic_frontier,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (  # noqa: E402
    triangle_count,
    triangle_count_incremental,
)


def run(spark: SparkSession, old_path: str, new_path: str,
        output: str | None = None, tolerance: float = 1e-10,
        damping: float = 0.85, prev_ranks: str | None = None,
        prev_components: str | None = None,
        t_old: int | None = None) -> dict:
    """Programmatic core (also the unit-test surface): returns the metrics
    dict; writes parquet outputs when ``output`` is given.

    ``prev_ranks`` / ``prev_components`` / ``t_old`` feed the PREVIOUS
    run's outputs back in (the ranks/ and components/ parquet written under
    --output, and the metrics line's t_new) so the old snapshot's state is
    never recomputed — that's where the dynamic kernels actually pay off
    across consecutive crawls. They must describe the ``--old`` snapshot
    over the same vertex universe (i.e. the prior run's ``--new``). Cold
    start (no flags) computes them once."""
    old_edges = spark.read.parquet(old_path).select("src", "dst")
    new_edges = spark.read.parquet(new_path).select("src", "dst")

    # vertex universe = union of both snapshots' endpoints: apply_batch
    # preserves the vertex set, so vertices appearing only in the new crawl
    # must be present from the start (and pages that lost every link keep a
    # row — they still hold teleport rank and a component label)
    from pyspark.sql import functions as F
    verts = (
        old_edges.select(F.col("src").alias("id"))
        .unionByName(old_edges.select(F.col("dst").alias("id")))
        .unionByName(new_edges.select(F.col("src").alias("id")))
        .unionByName(new_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    g_old = build_graph(old_edges, vertices=verts)
    # diff the RAW snapshots: g_old.edges carries normalization self-loops
    # that the new snapshot doesn't, and diffing those would pollute the
    # batch with bogus per-vertex 'del' rows (apply_batch protects the
    # loops, so the graph would still come out right — but the emitted
    # batch, the del count, and the frontier seed set would all be wrong)
    batch = graph_diff(old_edges, new_edges).localCheckpoint(eager=True)
    n_ins = batch.filter("op = 'ins'").count()
    n_del = batch.filter("op = 'del'").count()

    g_new = apply_batch(g_old, batch)

    opts = PageRankOptions(tolerance=tolerance, damping=damping,
                           metrics_level="none")
    prev_ranks_df = (spark.read.parquet(prev_ranks) if prev_ranks
                     else pagerank(g_old, opts).ranks)
    res = pagerank_dynamic_frontier(g_old, g_new, batch, prev_ranks_df, opts)

    labels_old = (spark.read.parquet(prev_components) if prev_components
                  else connected_components(g_old))
    labels_new = connected_components_dynamic(g_new, labels_old, batch)

    # takes the OLD graph plus the batch — it applies the delta itself
    t_old_val = int(t_old) if t_old is not None else triangle_count(g_old)
    tri = triangle_count_incremental(g_old, batch,
                                     t_old=t_old_val).collect()[0]

    if output:
        batch.write.mode("overwrite").parquet(f"{output}/batch")
        res.ranks.write.mode("overwrite").parquet(f"{output}/ranks")
        labels_new.write.mode("overwrite").parquet(f"{output}/components")

    metrics = {
        "batch_ins": n_ins,
        "batch_del": n_del,
        "frontier_iterations": res.iterations,
        "rank_err": res.err,
        "n_components_new": labels_new.select("comp").distinct().count(),
        "t_old": tri.t_old,
        "t_removed": tri.t_removed,
        "t_added": tri.t_added,
        "t_new": tri.t_new,
        "warm_inputs": bool(prev_ranks or prev_components
                            or t_old is not None),
    }
    return metrics


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--tolerance", type=float, default=1e-10)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--prev-ranks", default=None,
                    help="prior run's ranks/ parquet (over --old)")
    ap.add_argument("--prev-components", default=None,
                    help="prior run's components/ parquet (over --old)")
    ap.add_argument("--t-old", type=int, default=None,
                    help="prior run's t_new triangle count (over --old)")
    args = ap.parse_args(argv)
    spark = SparkSession.builder.getOrCreate()
    metrics = run(spark, args.old, args.new, args.output,
                  args.tolerance, args.damping,
                  prev_ranks=args.prev_ranks,
                  prev_components=args.prev_components,
                  t_old=args.t_old)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
