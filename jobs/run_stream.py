#!/usr/bin/env python
"""spark-submit entrypoint: the composed streaming pipeline.

Edge-event stream (one parquet file per micro-batch of (src, dst, op)
rows, op > 0 insert / op <= 0 delete) -> stateful degree tracking
(``applyInPandasWithState``, real state store) -> frontier seed from the
state-emitted changed sources -> O(batch) delta overlay -> dynamic
frontier re-rank (``pagerankAffectedFrontierW`` semantics,
/root/reference/src/pagerank.hxx:367-410) -> converged ranks written per
batch. This is the job-shaped twin of
``tests/test_streaming.py::test_stream_rerank_full_pipeline_matches_golden``.

Cluster launch (north rule):

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_stream.py \
        --edges /path/initial_edges --events /path/event_stream \
        --checkpoint /path/ckpt --output /path/ranks \
        [--pages <pages-table> instead of --edges] [--follow] \
        [--tolerance 1e-9] [--format parquet|iceberg]

``--checkpoint`` is the Structured Streaming checkpoint (offsets +
degree-tracker state store) and must be a SIBLING of --events, never
inside it (the file source lists the event dir recursively). With
``--follow`` the query runs until externally stopped, picking up new
event files as they land; without it, one availableNow pass drains the
currently-present files and exits (the batch-backfill mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import pages_to_edges  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.streaming import (  # noqa: E402
    StreamingReRank,
    stream_rerank,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", help="initial (src,dst) parquet/iceberg path")
    ap.add_argument("--pages", help="pages table to extract the initial graph from")
    ap.add_argument("--events", required=True,
                    help="directory of (src,dst,op) parquet event files")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (sibling of --events)")
    ap.add_argument("--output", help="write final converged ranks here")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--tolerance", type=float, default=1e-9)
    ap.add_argument("--max-iterations", type=int, default=500)
    ap.add_argument("--follow", action="store_true",
                    help="keep running on new event files (default: drain "
                         "available files once and exit)")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-stream-rerank").getOrCreate()

    if args.edges:
        edges = spark.read.format(args.format).load(args.edges)
        vertices = None
    elif args.pages:
        pages = spark.read.format(args.format).load(args.pages)
        edges, d = pages_to_edges(pages)
        vertices = d.select("id")
    else:
        ap.error("one of --pages / --edges is required")

    g = build_graph(edges, vertices=vertices)
    engine = StreamingReRank(
        g,
        PageRankOptions(tolerance=args.tolerance,
                        max_iterations=args.max_iterations,
                        metrics_level="none"),
    )
    print(json.dumps({
        "phase": "initial", "n_vertices": g.num_vertices,
        "n_edges": g.num_edges,
        "iterations": engine.summaries[0]["iterations"],
    }), flush=True)

    q = stream_rerank(spark, args.events, engine, args.checkpoint,
                      available_now=not args.follow)
    q.awaitTermination()

    if args.output:
        engine.ranks.write.mode("overwrite").format(args.format).save(
            args.output)
    print(json.dumps({
        "phase": "done", "batches": len(engine.summaries) - 1,
        "n_edges_final": engine.graph.num_edges,
        "summaries": engine.summaries,
    }), flush=True)


if __name__ == "__main__":
    main()
