#!/usr/bin/env python
"""spark-submit entrypoint: edge table -> random-walk corpus (-> skip-gram
pairs) — the DeepWalk/node2vec embedding-training front-end as a
deployable job.

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_walks.py \
        --edges <parquet-path-or-iceberg-table> --output /path/corpus \
        [--walk-length 10] [--walks-per-vertex 4] [--seed 42] \
        [--strategy hash|affine] [--pairs-window 0]

Writes the long-format corpus ``(start, walk, step, vertex)`` to
``<output>/corpus``; with ``--pairs-window W > 0`` also writes the
windowed skip-gram ``(center, context)`` pairs to ``<output>/pairs``.
Prints a one-line JSON summary (rows, live walks per step, timings).

On a real cluster the session comes from spark-submit's conf;
``getOrCreate()`` inherits it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (  # noqa: E402
    build_graph,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (  # noqa: E402
    random_walks,
    skipgram_pairs,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True,
                    help="(src,dst) edge table path (parquet dir or iceberg)")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--walk-length", type=int, default=10)
    ap.add_argument("--walks-per-vertex", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--strategy", default="hash", choices=["hash", "affine"])
    ap.add_argument("--p", type=float, default=None,
                    help="node2vec return bias; giving --p/--q switches to "
                         "second-order biased walks")
    ap.add_argument("--q", type=float, default=None,
                    help="node2vec in-out (explore) bias")
    ap.add_argument("--pairs-window", type=int, default=0,
                    help="also write skip-gram pairs within this window "
                         "(0 = corpus only)")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-walks").getOrCreate()
    t0 = time.monotonic()
    edges = spark.read.format(args.format).load(args.edges)
    g = build_graph(edges, add_self_loops=False)
    t_build = time.monotonic() - t0

    t0 = time.monotonic()
    if args.p is not None or args.q is not None:
        from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
            node2vec_walks,
        )

        corpus = node2vec_walks(
            g, walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            p=args.p if args.p is not None else 1.0,
            q=args.q if args.q is not None else 1.0,
            seed=args.seed, strategy=args.strategy,
        )
    else:
        corpus = random_walks(
            g, walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
            seed=args.seed, strategy=args.strategy,
        )
    out = args.output.rstrip("/")
    corpus.write.mode("overwrite").format(args.format).save(f"{out}/corpus")
    t_walks = time.monotonic() - t0

    corpus_w = spark.read.format(args.format).load(f"{out}/corpus")
    per_step = {int(r["step"]): int(r["n"]) for r in
                corpus_w.groupBy("step").agg(F.count("*").alias("n"))
                .collect()}

    summary = {
        "n_vertices": g.num_vertices,
        "n_edges": g.num_edges,
        "corpus_rows": sum(per_step.values()),
        "walks": per_step.get(0, 0),
        "live_walks_per_step": [per_step.get(s, 0)
                                for s in sorted(per_step)],
        "build_sec": round(t_build, 3),
        "walks_sec": round(t_walks, 3),
        "mode": ("node2vec" if (args.p is not None or args.q is not None)
                 else "first-order"),
    }
    if args.pairs_window > 0:
        t0 = time.monotonic()
        pairs = skipgram_pairs(corpus_w, window=args.pairs_window)
        pairs.write.mode("overwrite").format(args.format) \
            .save(f"{out}/pairs")
        summary["pairs_rows"] = spark.read.format(args.format) \
            .load(f"{out}/pairs").count()
        summary["pairs_sec"] = round(time.monotonic() - t0, 3)
    g.unpersist()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
