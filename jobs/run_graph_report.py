#!/usr/bin/env python
"""spark-submit entrypoint: one-shot web-graph STRUCTURE REPORT — the
measurements the classic web-graph papers publish (Broder et al.'s bowtie,
HyperANF's effective diameter) plus this engine's kernel shelf, over any
pages table or pre-extracted edge list:

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_graph_report.py \
        --edges /path/edges.parquet --output /path/report \
        [--host-expr "src % 1000"] [--hll-b 8] [--topk 100]

Writes one parquet per section under --output:
  stats/              one-row graph summary (graph_stats)
  degree_hist_out/    (deg, n_vertices) out-degree distribution
  degree_hist_in/     in-degree distribution
  components/         (comp, n_vertices) weakly-connected sizes
  scc_stats/          one-row SCC summary
  bowtie/             (region, n_vertices) CORE/IN/OUT/OTHER sizes
  core_hist/          (core, n_vertices) coreness distribution
  neighborhood/       (t, n_pairs) HLL neighborhood function
  pagerank_topk/      top-k static ranks
  harmonic_topk/      top-k harmonic centrality (HLL ball sweep)
  closeness_topk/     top-k Lin centrality (+closeness; same sweep)
  host_graph/         contracted host-level edges   [with --host-expr]
  host_ranks/         host-level weighted PageRank  [with --host-expr]

and prints ONE JSON summary line (counts, effective diameter, timings).
Every section is independent — a failure in one is reported and skipped,
the rest still land (useful on a long cluster run)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.operators.degrees import (  # noqa: E402
    degree_histogram,
    graph_stats,
    top_k,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (  # noqa: E402
    build_graph,
    contract_edges,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import pages_to_edges  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet dir or iceberg)")
    ap.add_argument("--edges", help="pre-extracted (src,dst) parquet path")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--host-expr",
                    help="SQL expression over vertex id defining the host/"
                         "group key (e.g. 'id % 1000'); enables the "
                         "host_graph and host_ranks sections")
    ap.add_argument("--hll-b", type=int, default=8,
                    help="HLL precision for the neighborhood function "
                         "(2^b registers per vertex)")
    ap.add_argument("--max-t", type=int, default=None,
                    help="cap the neighborhood-function rounds (default: "
                         "run to the register fixpoint)")
    ap.add_argument("--topk", type=int, default=100)
    ap.add_argument("--tolerance", type=float, default=1e-9)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-report").getOrCreate()

    if args.edges:
        edges = spark.read.format(args.format).load(args.edges)
        vertices = None
    elif args.pages:
        pages = spark.read.format(args.format).load(args.pages)
        edges, d = pages_to_edges(pages)
        vertices = d.select("id")
    else:
        ap.error("one of --pages / --edges is required")

    g = build_graph(edges, vertices=vertices, add_self_loops=False)
    summary: dict = {"n_vertices": g.num_vertices, "n_edges": g.num_edges}
    timings: dict = {}
    failures: dict = {}

    def section(name, fn):
        t0 = time.monotonic()
        try:
            out = fn()
            if out is not None:
                out.write.mode("overwrite").format(args.format).save(
                    f"{args.output.rstrip('/')}/{name}")
        except Exception as exc:  # noqa: BLE001 — independent sections
            failures[name] = f"{type(exc).__name__}: {exc}"
        timings[name] = round(time.monotonic() - t0, 3)

    section("stats", lambda: graph_stats(g.edges, g.vertices))
    section("degree_hist_out",
            lambda: degree_histogram(g.edges, g.vertices, "out"))
    section("degree_hist_in",
            lambda: degree_histogram(g.edges, g.vertices, "in"))

    def _components():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (
            connected_components,
        )

        cc = connected_components(g)
        sizes = cc.groupBy("comp").agg(F.count("*").alias("n_vertices"))
        summary["n_components"] = sizes.count()
        return sizes

    section("components", _components)

    def _scc_stats():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import scc_stats

        out = scc_stats(g)
        row = out.collect()[0]
        summary["n_sccs"] = int(row["n_sccs"])
        summary["largest_scc"] = int(row["largest_scc"])
        return out

    section("scc_stats", _scc_stats)

    def _bowtie():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import bowtie

        return bowtie(g).groupBy("region").agg(
            F.count("*").alias("n_vertices"))

    section("bowtie", _bowtie)

    def _core_hist():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.kcore import (
            core_histogram,
        )

        out = core_histogram(g)
        summary["degeneracy"] = int(
            out.agg(F.max("core")).collect()[0][0])
        return out

    section("core_hist", _core_hist)

    def _neighborhood():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
            neighborhood_function,
        )

        nf = neighborhood_function(g, max_t=args.max_t, mode="hll",
                                   b=args.hll_b)
        pdf = nf.toPandas().sort_values("t")
        vals = pdf["n_pairs"].to_numpy(dtype=np.float64)
        target = 0.9 * vals[-1]
        if vals[0] >= target:
            eff = 0.0
        else:
            i = int(np.argmax(vals >= target))
            eff = (i - 1 + (target - vals[i - 1]) / (vals[i] - vals[i - 1])
                   if vals[i] > vals[i - 1] else float(i))
        summary["effective_diameter"] = round(float(eff), 3)
        summary["neighborhood_rounds"] = int(pdf["t"].max())
        return nf

    section("neighborhood", _neighborhood)

    def _pagerank_topk():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
            PageRankOptions,
            pagerank,
        )

        res = pagerank(g, PageRankOptions(tolerance=args.tolerance,
                                          dead_end_teleport=True,
                                          metrics_level="none"))
        summary["pagerank_iterations"] = res.iterations
        return top_k(res.ranks, "rank", args.topk)

    section("pagerank_topk", _pagerank_topk)

    def _salsa_topk():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import (
            salsa_arrow,
        )

        res = salsa_arrow(g, tolerance=args.tolerance, max_iterations=200)
        summary["salsa_iterations"] = res.iterations
        hubs = top_k(res.scores.select("id", "hub"), "hub", args.topk) \
            .withColumn("kind", F.lit("hub"))
        auths = top_k(res.scores.select(
            "id", F.col("auth").alias("hub")), "hub", args.topk) \
            .withColumn("kind", F.lit("authority"))
        return hubs.unionByName(auths) \
            .withColumnRenamed("hub", "score")

    section("salsa_topk", _salsa_topk)

    # harmonic + closeness/Lin share ONE ball sweep (ball_centralities) —
    # the cached frame feeds both sections
    _bc_cache: list = []

    def _ball_cent():
        if not _bc_cache:
            from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
                ball_centralities,
            )

            _bc_cache.append(
                ball_centralities(g, mode="hll", b=args.hll_b).persist())
        return _bc_cache[0]

    section("harmonic_topk",
            lambda: top_k(_ball_cent().select("id", "harmonic"),
                          "harmonic", args.topk))
    section("closeness_topk",
            lambda: top_k(_ball_cent().select(
                "id", "reachable", "total_dist", "closeness", "lin"),
                "lin", args.topk))
    if _bc_cache:
        _bc_cache[0].unpersist()

    def _communities():
        from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
            degree_assortativity,
            modularity,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import (
            label_propagation,
        )

        lab = label_propagation(g, iterations=5)
        mrow = modularity(g, lab).collect()[0]
        summary["lpa_modularity"] = round(float(mrow["modularity"]), 6)
        summary["lpa_communities"] = int(mrow["n_communities"])
        arow = degree_assortativity(g, mode="out-in").collect()[0]
        summary["degree_assortativity"] = round(float(arow["assortativity"]), 6)
        from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
            clustering_coefficient,
            reciprocity,
        )

        rrow = reciprocity(g).collect()[0]
        summary["reciprocity"] = round(float(rrow["reciprocity"]), 6)
        crow = clustering_coefficient(g).collect()[0]
        summary["global_clustering"] = round(float(crow["global_cc"]), 6)
        summary["avg_clustering"] = round(float(crow["avg_cc"]), 6)
        return lab

    section("communities", _communities)

    def _louvain():
        from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
            community_conductance,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.louvain import (
            louvain,
        )

        res = louvain(g, max_passes=2, max_sweeps=6)
        summary["louvain_modularity"] = round(res.modularity, 6)
        summary["louvain_passes"] = res.passes
        cond = community_conductance(g, res.labels, "community")
        crow = cond.agg(
            F.count("*").alias("nc"),
            F.expr("median(conductance)").alias("med")).collect()[0]
        summary["louvain_communities"] = int(crow["nc"])
        summary["louvain_median_conductance"] = round(float(crow["med"]), 6)
        return res.labels

    section("louvain", _louvain)

    def _betweenness_topk():
        from pagerank_barrierfree_openmp_dynamic_spark.plans.betweenness import (
            two_hop_betweenness,
        )

        return top_k(two_hop_betweenness(g), "score", args.topk)

    section("betweenness_topk", _betweenness_topk)

    if args.host_expr:
        mapping = g.vertices.select(
            "id", F.expr(args.host_expr).alias("group"))
        host_edges = contract_edges(g.edges, mapping).persist()

        section("host_graph", lambda: host_edges)

        def _host_ranks():
            from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
                PageRankOptions,
                pagerank,
            )

            hg = build_graph(host_edges, weight_col="weight")
            res = pagerank(hg, PageRankOptions(tolerance=args.tolerance,
                                               metrics_level="none"))
            summary["n_hosts"] = hg.num_vertices
            return res.ranks

        section("host_ranks", _host_ranks)
        host_edges.unpersist()

    summary["timings_sec"] = timings
    if failures:
        summary["failures"] = failures
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
