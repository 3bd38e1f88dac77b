#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...extras}

Noise control (this sandbox shows intermittent 3-6x noisy-neighbor
slowdowns): the WHOLE suite runs $SPARK_GRAFT_BENCH_REPEATS times (default
3) interleaved — every key is re-measured in every repeat, so a noise
spike hits one repeat's sample, not one key's only sample. The reported
"queries" are per-key BESTS across repeats (the engine's attainable
number), "queries_median"/"samples" record the distribution, and "value"
is the sum of bests. Round-over-round comparisons should use the bests.

Headline numbers (BASELINE.md targets):
  - pagerank_arrow: converged static PageRank (tol 1e-6 L-inf) via the
    fused Arrow dense kernel — iterations and edges/sec/superstep
  - pagerank_async: barrier-free (chunked Gauss-Seidel) variant
  - dynamic_frontier: incremental re-rank after a 1e-4·|E| batch
  - pagerank_joinagg: 5 supersteps of the sharded join-agg path with the
    rank state BROADCAST (N <= broadcast_vertices)
  - pagerank_joinagg_sortmerge: same 5 supersteps FORCED onto the
    co-partitioned sort-merge plan (broadcast_vertices=0) — the
    >1e9-vertex scale path, rank-checked against the arrow kernel
  - extract / build_graph / cc / triangles / minhash_dedup /
    embedding_topk: pipeline front-end and other kernels
  - recall@k / pair-recall for every approximate path vs its exact
    baseline (one-shot, reported in "recall")
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark import datagen  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (  # noqa: E402
    apply_batch_dense,
    batch_endpoints_frontier_dense,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (  # noqa: E402
    connected_components_arrow,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
    pagerank,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    DenseGraph,
    pagerank_arrow,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import triangle_count  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import pages_to_edges  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.functions import (  # noqa: E402
    brute_force_topk,
    minhash_near_dup_pairs,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.similarity import (  # noqa: E402
    ivf_topk,
    lsh_topk,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (  # noqa: E402
    simhash,
    simhash_near_dup_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def lineitem_edges(spark, sf_dir):
    """Deterministic web-scale-shaped digraph from the lineitem table:
    ~|lineitem| edges over a 100k-vertex id space (has cycles/triangles)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") % 100000).cast("long").alias("src"),
        ((F.col("l_partkey") * 7 + F.col("l_suppkey")) % 100000).cast("long").alias("dst"),
    ).distinct()


def run_suite(spark, extras: dict) -> dict[str, float]:
    """One full pass over every benchmark key; returns {key: seconds}.
    ``extras`` is (re)filled with the run's result values — identical in
    every repeat (determinism is itself asserted by CORRECTNESS_r*)."""
    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t = time.monotonic()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t, 3)

        return _T()

    # -- extraction front-end on synthetic pages --
    with timed("extract"):
        pages = spark.createDataFrame(
            datagen.render_pages_pdf(
                N_PAGES, datagen.synth_edges(N_PAGES, seed=42, avg_deg=6.0)
            ),
            schema=datagen.PAGES_SCHEMA,
        )
        edges_x, _d = pages_to_edges(pages)
        extras["extract_edges"] = edges_x.count()

    # -- graph build --
    with timed("build_graph"):
        g = build_graph(lineitem_edges(spark, SF_DIR))
    extras["n_vertices"] = g.num_vertices
    extras["n_edges"] = g.num_edges

    with timed("dense_build"):
        dense = DenseGraph(g)

    # -- headline: converged PageRank, fused Arrow dense kernel --
    with timed("pagerank_arrow"):
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-6, metrics_level="none"), dense=dense
        )
        res.ranks.count()
    extras["pagerank"] = {
        "iterations": res.iterations,
        "err_linf": res.err,
        "edges_per_sec_per_superstep": round(
            g.num_edges * res.iterations / timings["pagerank_arrow"], 1
        ),
    }

    # -- barrier-free (async Gauss-Seidel) kernel: 2 local sweeps per
    # superstep trade worker CPU for fewer distributed supersteps
    # (reference ASYNC=true speed property)
    with timed("pagerank_async"):
        res_gs = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-6, metrics_level="none",
                               async_updates="slice", async_sweeps=2),
            dense=dense, resident=True,
        )
        res_gs.ranks.count()
    extras["pagerank_async"] = {
        "iterations": res_gs.iterations,
        "superstep_reduction_vs_sync": round(
            1.0 - res_gs.iterations / max(1, res.iterations), 3
        ),
    }

    # -- dynamic frontier after a 1e-4|E| batch (the reference's headline
    # batch size, README.md:144-152): O(batch) delta overlay, no rebuild.
    # Batch synthesis is test scaffolding, not engine work — untimed.
    edges_pdf = g.edges.filter(F.col("src") != F.col("dst")).limit(
        max(10, int(g.num_edges * 1e-4))
    ).toPandas()
    dels = edges_pdf.copy()
    dels["op"] = "del"
    ins = dels.iloc[: len(dels) // 2].copy()
    ins["op"] = "ins"
    batch = spark.createDataFrame(
        pd.concat([dels, ins]), schema="src long, dst long, op string"
    )
    with timed("dynamic_frontier"):
        g2, dense2 = apply_batch_dense(g, dense, batch)
        frontier = batch_endpoints_frontier_dense(dense, dense2, batch)
        res_dyn = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-6, metrics_level="none"),
            init=res.ranks, frontier=frontier, dense=dense2, resident=True,
        )
        res_dyn.ranks.count()
    extras["dynamic_frontier_iterations"] = res_dyn.iterations

    # -- join-agg scale path, 5 supersteps: rank state broadcast --
    with timed("pagerank_joinagg"):
        res_j = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=5, check_every=5,
                               metrics_level="none")
        )
        res_j.ranks.count()
    extras["joinagg_sec_per_superstep"] = round(timings["pagerank_joinagg"] / 5, 3)

    # -- join-agg FORCED sort-merge (broadcast_vertices=0): the plan the
    # engine runs when N exceeds any broadcast bound (>1e9 vertices) —
    # rank state stays sharded, adj keeps its persisted src-partitioning,
    # the scatter is a co-partitioned sort-merge join + groupBy(dst).
    with timed("pagerank_joinagg_sortmerge"):
        res_sm = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=5, check_every=5,
                               metrics_level="none", broadcast_vertices=0)
        )
        res_sm.ranks.count()
    extras["sortmerge_sec_per_superstep"] = round(
        timings["pagerank_joinagg_sortmerge"] / 5, 3)

    # cross-check: all three paths at 5 supersteps agree to FP precision
    res_a5 = pagerank_arrow(
        g, PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none"),
        dense=dense,
    )
    both = res_a5.ranks.withColumnRenamed("rank", "ra").join(res_j.ranks, "id")
    extras["arrow_vs_joinagg_linf_5it"] = float(
        both.agg(F.max(F.abs(F.col("ra") - F.col("rank")))).collect()[0][0]
    )
    both_sm = res_a5.ranks.withColumnRenamed("rank", "ra").join(res_sm.ranks, "id")
    extras["arrow_vs_sortmerge_linf_5it"] = float(
        both_sm.agg(F.max(F.abs(F.col("ra") - F.col("rank")))).collect()[0][0]
    )

    # -- other kernels --
    with timed("cc"):
        cc = connected_components_arrow(g, dense=dense)
        extras["n_components"] = cc.select("comp").distinct().count()

    with timed("triangles"):
        extras["n_triangles"] = triangle_count(g)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with timed("minhash_dedup"):
        extras["near_dup_pairs"] = minhash_near_dup_pairs(
            docs, threshold=0.5
        ).count()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with timed("embedding_topk"):
        extras["topk_rows"] = brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 100), k=10
        ).count()

    g.unpersist()
    dense.unpersist()
    return timings


def _pair_recall(approx_pdf, exact_pdf) -> float:
    """Fraction of exact (a,b) pairs the approximate path recovered."""
    ex = set(map(tuple, exact_pdf[["a", "b"]].to_numpy()))
    ap = set(map(tuple, approx_pdf[["a", "b"]].to_numpy()))
    return round(len(ex & ap) / len(ex), 4) if ex else 1.0


def _topk_recall(approx_pdf, exact_pdf) -> float:
    """Mean per-query overlap of approximate vs exact top-k neighbor sets."""
    ex = exact_pdf.groupby("q_id")["n_id"].apply(set)
    ap = approx_pdf.groupby("q_id")["n_id"].apply(set)
    fr = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex.index if ex[q]]
    return round(float(np.mean(fr)), 4) if fr else 1.0


def recall_eval(spark) -> dict:
    """Measured recall of every approximate path vs its exact baseline at
    bench scale (the pytest asserts cover toy scale only). One shot —
    recall is deterministic, repeats would re-measure the same number."""
    out: dict = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 100)

    # ANN recall@10 vs exact brute-force cosine, at two operating points
    # each — the recall/cost trade the knobs (multiprobe, n_probe) buy.
    # Synthetic 64-dim embeddings are near-isotropic (few clusters), the
    # HARD case for bucketed ANN: single-bucket probes are honest-low and
    # widening probes recovers recall at linear candidate cost.
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    for mp in (1, 3):
        out[f"lsh_ann_recall_at_10_mp{mp}"] = _topk_recall(
            lsh_topk(emb, queries, dim=64, k=10, multiprobe=mp).toPandas(),
            exact)
    from pagerank_barrierfree_openmp_dynamic_spark.functions.similarity import (
        ivf_train_centroids,
    )

    cents = ivf_train_centroids(emb, n_centroids=16)
    for npb in (2, 6):
        out[f"ivf_ann_recall_at_10_probe{npb}"] = _topk_recall(
            ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=npb,
                     centroids=cents).toPandas(),
            exact)

    # Clustered fixture — the REALISTIC case. Real text/image embeddings
    # are strongly clustered; the sf fixture above is near-isotropic (the
    # hard case). Planted 32-cluster vectors at the same size/dim/knobs
    # measure where the SAME operating points sit on clustered data
    # (within-cluster cosine ~0.85, 125 members/cluster).
    rng = np.random.default_rng(1234)
    cl = rng.normal(size=(32, 64))
    cl /= np.linalg.norm(cl, axis=1, keepdims=True)
    pts = cl[np.arange(4000) % 32] + 0.08 * rng.normal(size=(4000, 64))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb_cl = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(4000),
                      "embedding": [r.astype("float32").tolist()
                                    for r in pts]}),
        schema="vec_id long, embedding array<float>").persist()
    q_cl = emb_cl.filter(F.col("vec_id") < 100)
    try:
        exact_cl = brute_force_topk(emb_cl, q_cl, k=10).toPandas()
        for mp in (1, 3):
            out[f"lsh_ann_recall_at_10_mp{mp}_clustered"] = _topk_recall(
                lsh_topk(emb_cl, q_cl, dim=64, k=10,
                         multiprobe=mp).toPandas(),
                exact_cl)
        cents_cl = ivf_train_centroids(emb_cl, n_centroids=16)
        for npb in (2, 6):
            out[f"ivf_ann_recall_at_10_probe{npb}_clustered"] = _topk_recall(
                ivf_topk(emb_cl, q_cl, k=10, n_centroids=16, n_probe=npb,
                         centroids=cents_cl).toPandas(),
                exact_cl)
    finally:
        emb_cl.unpersist()

    # MinHash-LSH pair recall vs exact all-pairs n-gram Jaccard
    exact_j = ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    approx_j = minhash_near_dup_pairs(docs, threshold=0.5).toPandas()
    out["minhash_pair_recall"] = _pair_recall(approx_j, exact_j)
    out["exact_jaccard_pairs"] = int(len(exact_j))

    # SimHash blocked-join pair recall vs exact all-pairs Hamming<=2
    sig = simhash(docs).persist()
    try:
        a = sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
        b = sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
        exact_h = (
            a.join(b, F.col("a") < F.col("b"))
            .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 2)
            .select("a", "b")
            .toPandas()
        )
        approx_h = simhash_near_dup_pairs(sig, max_hamming=2).toPandas()
        out["simhash_pair_recall"] = _pair_recall(approx_h, exact_h)
        out["exact_simhash_pairs"] = int(len(exact_h))
    finally:
        sig.unpersist()
    return out


def kernel_extras(spark) -> dict:
    """One-shot timings for the round-3 kernel shelf (HITS / SCC /
    coreness) on the same 100k-vertex bench graph — kept OUT of the
    3-repeat suite so the noise-controlled round-over-round keys stay
    comparable; recorded here so the kernels have a measured number at
    bench scale (correctness is CORRECTNESS_r*'s job)."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.hits import (
        hits,
        hits_arrow,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.kcore import coreness
    from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import (
        strongly_connected_components,
    )

    out: dict = {}
    g = build_graph(lineitem_edges(spark, SF_DIR), add_self_loops=False)
    try:
        t = time.monotonic()
        hits(g, tolerance=0.0, max_iterations=5).scores.count()
        out["hits_5iter_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        hits_arrow(g, tolerance=0.0, max_iterations=5).scores.count()
        out["hits_arrow_5iter_sec"] = round(time.monotonic() - t, 3)
        from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import (
            salsa_arrow,
        )

        t = time.monotonic()
        salsa_arrow(g, tolerance=0.0, max_iterations=5).scores.count()
        out["salsa_arrow_5iter_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        c = coreness(g)
        out["degeneracy"] = int(c.agg(F.max("core")).collect()[0][0])
        out["coreness_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        s = strongly_connected_components(g)
        out["n_sccs"] = int(s.select("comp").distinct().count())
        out["scc_sec"] = round(time.monotonic() - t, 3)
        # HyperANF neighborhood function: dense HLL kernel to the
        # fixpoint, plus 4 rounds of the sharded join-agg scale path
        from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
            neighborhood_function,
            neighborhood_function_sharded,
        )

        t = time.monotonic()
        nf = neighborhood_function(g, mode="hll", b=6).toPandas()
        out["neighborhood_hll_sec"] = round(time.monotonic() - t, 3)
        from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
            harmonic_centrality,
        )

        t = time.monotonic()
        harmonic_centrality(g, mode="hll", b=6).count()
        out["harmonic_hll_sec"] = round(time.monotonic() - t, 3)
        vals = nf.sort_values("t")["n_pairs"].to_numpy()
        out["neighborhood_rounds"] = int(nf["t"].max())
        target = 0.9 * vals[-1]
        i = int((vals >= target).argmax())
        out["effective_diameter_hll"] = round(
            float(i - 1 + (target - vals[i - 1]) / (vals[i] - vals[i - 1]))
            if i and vals[i] > vals[i - 1] else float(i), 3)
        t = time.monotonic()
        neighborhood_function_sharded(g, max_t=4, b=6)
        out["neighborhood_sharded_4r_sec"] = round(time.monotonic() - t, 3)
        # walk corpus + batched PPR at bench scale (single samples)
        from pagerank_barrierfree_openmp_dynamic_spark.plans.ppr import (
            personalized_pagerank_batch,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
            random_walks,
        )

        t = time.monotonic()
        nrows = random_walks(g, walk_length=10, walks_per_vertex=1).count()
        out["walks_10step_sec"] = round(time.monotonic() - t, 3)
        out["walks_corpus_rows"] = int(nrows)
        seeds = g.vertices.limit(64).localCheckpoint(eager=True)
        t = time.monotonic()
        nppr = personalized_pagerank_batch(g, seeds, iterations=3).count()
        out["ppr_64seed_3iter_sec"] = round(time.monotonic() - t, 3)
        out["ppr_state_rows"] = int(nppr)
        # spectral + anti-spam + rank-order family (single samples)
        from pagerank_barrierfree_openmp_dynamic_spark.operators.rankcmp import (
            spearman,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.centrality import (
            eigenvector_centrality,
            katz_centrality,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
            PageRankOptions,
            pagerank,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.trustrank import (
            spam_mass,
        )

        t = time.monotonic()
        eigenvector_centrality(g, tolerance=0.0,
                               max_iterations=5).scores.count()
        out["eigencent_5iter_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        kr = katz_centrality(g, alpha="auto", tolerance=1e-8,
                             max_iterations=100)
        kr.scores.count()
        out["katz_auto_sec"] = round(time.monotonic() - t, 3)
        out["katz_iterations"] = kr.iterations
        t = time.monotonic()
        sm = spam_mass(
            g, g.vertices.filter(F.col("id") % 25 == 0),
            PageRankOptions(tolerance=0.0, max_iterations=5,
                            dead_end_teleport=True, metrics_level="none"))
        sm.count()
        out["spam_mass_5iter_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        rk = pagerank(g, PageRankOptions(
            tolerance=0.0, max_iterations=3, dead_end_teleport=True,
            metrics_level="none")).ranks
        deg = g.in_degrees().select(
            F.col("dst").alias("id"), F.col("deg").cast("double").alias("rank"))
        row = spearman(rk, deg).collect()[0]
        out["rank_degree_spearman"] = round(float(row["spearman"]), 4)
        out["spearman_sec"] = round(time.monotonic() - t, 3)

        from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
            community_conductance,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.louvain import (
            louvain,
        )

        t = time.monotonic()
        louv = louvain(g, max_passes=2, max_sweeps=6)
        out["louvain_sec"] = round(time.monotonic() - t, 3)
        out["louvain_modularity"] = round(louv.modularity, 4)
        out["louvain_passes"] = louv.passes
        out["louvain_sweeps"] = louv.sweeps
        t = time.monotonic()
        cond = community_conductance(g, louv.labels, "community")
        row = cond.agg(
            F.count("*").alias("nc"),
            F.expr("median(conductance)").alias("medc")).collect()[0]
        out["louvain_communities"] = int(row["nc"])
        out["louvain_median_conductance"] = round(float(row["medc"]), 4)
        out["conductance_sec"] = round(time.monotonic() - t, 3)

        from pagerank_barrierfree_openmp_dynamic_spark.plans.distances import (
            top_degree_landmarks,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.sssp import (
            derived_edge_weights,
            sssp,
        )

        t = time.monotonic()
        n_pairs = sssp(g, top_degree_landmarks(g, 4),
                       weight=derived_edge_weights(g)).count()
        out["sssp_4src_sec"] = round(time.monotonic() - t, 3)
        out["sssp_4src_pairs"] = int(n_pairs)

        from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
            boilerplate_stats,
            decontaminate,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t = time.monotonic()
        nb = (boilerplate_stats(docs, seg_len=6, min_docs=2)
              .filter(F.col("n_boiler") > 0).count())
        out["boilerplate_sec"] = round(time.monotonic() - t, 3)
        out["boilerplate_docs"] = int(nb)
        t = time.monotonic()
        ev = docs.filter(F.col("doc_id") % 97 == 0)
        corp = docs.filter(F.col("doc_id") % 97 != 0)
        out["decontaminate_hits"] = int(decontaminate(corp, ev, k=4).count())
        out["decontaminate_sec"] = round(time.monotonic() - t, 3)

        # late round-3 shelf one-shots: MSF, as-of join, span dedup, PII
        from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
            duplicate_spans,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.functions.pii import (
            pii_scan,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.operators.asof import (
            asof_join,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.msf import (
            minimum_spanning_forest,
        )

        t = time.monotonic()
        mst = minimum_spanning_forest(
            g.edges.withColumn("weight", F.lit(1.0)))
        out["msf_edges_rows"] = int(mst.count())
        out["msf_sec"] = round(time.monotonic() - t, 3)
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        t = time.monotonic()
        right = (events.filter(F.col("event_type") == "click")
                 .dropDuplicates(["user_id", "ts"])
                 .select("user_id", "ts", "value"))
        left = events.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts")
        out["asof_rows"] = int(asof_join(left, right, on=["user_id"]).count())
        out["asof_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        dup = duplicate_spans(docs, k=4)
        out["dup_span_docs"] = int(
            dup.filter(F.col("n_dup_spans") > 0).count())
        out["duplicate_spans_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        out["pii_total"] = int(pii_scan(docs).agg(
            F.sum("pii_total")).collect()[0][0] or 0)
        out["pii_scan_sec"] = round(time.monotonic() - t, 3)

        # final-shelf one-shots: incremental triangles / dynamic CC /
        # 4-cycles / stream-stream attribution join
        from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (
            connected_components,
            connected_components_dynamic,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (
            four_cycle_count,
            triangle_count_incremental,
        )

        # ~0.1% deterministic batch: delete (src+dst)%997==0, insert shifted
        dels = g.edges.filter((F.col("src") + F.col("dst")) % 997 == 0)
        batch = dels.select("src", "dst", F.lit("del").alias("op")) \
            .unionByName(dels.select(
                F.col("dst").alias("src"),
                ((F.col("src") * 13 + 7) % 99991).alias("dst"),
                F.lit("ins").alias("op"))).localCheckpoint(eager=True)
        out["tri_incr_batch_rows"] = int(batch.count())
        t = time.monotonic()
        # t_old passed -> times ONLY the O(batch*deg) delta count, the
        # number that matters (the full recount is the `triangles` suite key)
        tri = triangle_count_incremental(g, batch, t_old=0).collect()[0]
        out["tri_incr_delta_sec"] = round(time.monotonic() - t, 3)
        out["tri_incr_removed"] = int(tri.t_removed)
        out["tri_incr_added"] = int(tri.t_added)

        labels0 = connected_components(g).localCheckpoint(eager=True)
        from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
            apply_batch,
        )

        g2b = apply_batch(g, batch)
        t = time.monotonic()
        ncomp = (connected_components_dynamic(g2b, labels0, batch)
                 .select("comp").distinct().count())
        out["cc_dynamic_sec"] = round(time.monotonic() - t, 3)
        out["cc_dynamic_components"] = int(ncomp)
        t = time.monotonic()
        ncomp_a = (connected_components_dynamic(g2b, labels0, batch,
                                                use_arrow=True)
                   .select("comp").distinct().count())
        out["cc_dynamic_arrow_sec"] = round(time.monotonic() - t, 3)
        assert ncomp_a == ncomp
        g2b.unpersist()

        t = time.monotonic()
        out["four_cycles"] = int(
            four_cycle_count(g).collect()[0].n_four_cycles)
        out["four_cycles_sec"] = round(time.monotonic() - t, 3)

        # live watermarked stream-stream join over a 2-file time split
        from pagerank_barrierfree_openmp_dynamic_spark.streaming.joins import (
            run_attribution_stream,
        )

        ev2 = events.select("event_id", "ts", "user_id", "event_type") \
            .filter(F.col("event_type").isin("click", "purchase"))
        t = time.monotonic()
        res_attr = run_attribution_stream(spark, ev2, cut="2024-01-16",
                                          horizon="4 hours",
                                          watermark="10 minutes")
        out["stream_attr_rows"] = int(res_attr.count())
        out["stream_attr_sec"] = round(time.monotonic() - t, 3)

        # corpus-composition one-shots: sequence packing + mixture/curriculum
        from pagerank_barrierfree_openmp_dynamic_spark.functions.mixture import (
            curriculum_buckets,
            source_mixture_weights,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.functions.packing import (
            pack_concat,
            pack_greedy,
            packing_fill,
        )

        t = time.monotonic()
        out["pack_concat_rows"] = int(pack_concat(docs, 2048, 32).count())
        out["pack_concat_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        fill_row = (packing_fill(pack_greedy(docs, 2048, 32), 2048)
                    .agg(F.count("*").alias("nb"),
                         F.avg("fill_ppm").alias("fp")).collect()[0])
        out["pack_greedy_bins"] = int(fill_row["nb"])
        out["pack_greedy_avg_fill_ppm"] = int(fill_row["fp"])
        out["pack_greedy_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        out["mixture_sources"] = int(source_mixture_weights(docs).count())
        out["curriculum_rows"] = int(curriculum_buckets(docs, 10).count())
        out["mixture_curriculum_sec"] = round(time.monotonic() - t, 3)

        # real-codec one-shots: decode throughput over synthesized
        # 64x64 BMPs (~12.3 KB each) and 1s 16-bit WAVs (~16 KB each)
        from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (
            audio_stats,
            image_stats,
            synth_bmp_media,
            synth_wav_media,
        )

        # repartition the id column across cores BEFORE synthesis: the
        # documents parquet at this sf is 1-2 files, and decode is a
        # per-row mapInPandas that inherits input partitioning — without
        # the spread the decode numbers measure one core, not the engine
        ids = docs.select("doc_id").repartition(CPUS)
        bmps = synth_bmp_media(ids, w=64, h=64).localCheckpoint(eager=True)
        n_img = bmps.count()
        t = time.monotonic()
        assert image_stats(bmps).count() == n_img
        dt = time.monotonic() - t
        out["image_decode_rows"] = n_img
        out["image_decode_sec"] = round(dt, 3)
        out["image_decode_mb_per_s"] = round(
            n_img * (64 * 64 * 3 + 54) / 1e6 / dt, 1)
        bmps.unpersist()
        # compressed path: same 64x64 pattern through the pure-NumPy PNG
        # codec (mixed filters — inflate + full un-filtering per image);
        # mb/s is measured on DECODED bytes to be comparable with BMP
        from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (
            synth_png_media,
        )

        pngs = synth_png_media(ids, w=64, h=64).localCheckpoint(eager=True)
        n_png = pngs.count()
        t = time.monotonic()
        assert image_stats(pngs).count() == n_png
        dt = time.monotonic() - t
        out["png_decode_rows"] = n_png
        out["png_decode_sec"] = round(dt, 3)
        out["png_decode_mb_per_s"] = round(
            n_png * (64 * 64 * 3) / 1e6 / dt, 1)
        pngs.unpersist()
        # baseline JPEG (functions/jpeg.py): Huffman entropy decode is a
        # per-symbol Python loop — the honest pure-Python cost, reported
        # on DECODED bytes like the others (PNG/BMP stay the fast paths)
        from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (
            synth_jpeg_media,
        )

        jpgs = synth_jpeg_media(ids, w=64, h=64).localCheckpoint(eager=True)
        n_jpg = jpgs.count()
        t = time.monotonic()
        assert image_stats(jpgs).count() == n_jpg
        dt = time.monotonic() - t
        out["jpeg_decode_rows"] = n_jpg
        out["jpeg_decode_sec"] = round(dt, 3)
        out["jpeg_decode_mb_per_s"] = round(
            n_jpg * (64 * 64 * 3) / 1e6 / dt, 1)
        jpgs.unpersist()
        wavs = synth_wav_media(ids, n=8000, rate=8000) \
            .localCheckpoint(eager=True)
        n_wav = wavs.count()
        t = time.monotonic()
        assert audio_stats(wavs).count() == n_wav
        dt = time.monotonic() - t
        out["audio_decode_rows"] = n_wav
        out["audio_decode_sec"] = round(dt, 3)
        out["audio_decode_mb_per_s"] = round(n_wav * 16044 / 1e6 / dt, 1)
        wavs.unpersist()

        # session-3 shelf one-shots: canonicalization + tokenizer prep
        from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
            latest_snapshot,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.functions.dedup import (
            containment_verify,
            lsh_candidate_pairs,
            minhash_signatures,
            shingles,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
            priority_sample,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.functions.vocab import (
            bpe_learn,
            bpe_pair_counts,
            vocab_coverage,
        )
        from pagerank_barrierfree_openmp_dynamic_spark.plans.chains import (
            resolve_chains,
        )

        # redirect chains over the bench edge table (dst<src mapping)
        mapping = (g.edges.filter(F.col("dst") < F.col("src"))
                   .groupBy("src").agg(F.max("dst").alias("dst")))
        t = time.monotonic()
        resolved = resolve_chains(mapping).localCheckpoint(eager=True)
        out["redirect_chains"] = int(resolved.count())
        out["redirect_max_hops"] = int(
            resolved.agg(F.max("hops")).collect()[0][0])
        out["redirect_resolve_sec"] = round(time.monotonic() - t, 3)

        # LSH-pruned containment (the scale path pairing of
        # lsh_candidate_pairs + containment_verify)
        sh = shingles(docs).persist()
        t = time.monotonic()
        cand = lsh_candidate_pairs(minhash_signatures(sh, bands=8),
                                   max_bucket=64)
        out["containment_pairs"] = int(
            containment_verify(sh, cand, threshold=0.8).count())
        out["containment_lsh_sec"] = round(time.monotonic() - t, 3)
        sh.unpersist()

        t = time.monotonic()
        out["vocab_rows"] = int(vocab_coverage(docs, top_v=1000).count())
        out["vocab_coverage_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        out["bpe_pairs"] = int(bpe_pair_counts(docs, top_k=100).count())
        out["bpe_pair_counts_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        out["bpe_merges"] = int(bpe_learn(docs, n_merges=5).count())
        out["bpe_learn5_sec"] = round(time.monotonic() - t, 3)

        t = time.monotonic()
        out["priority_sample_rows"] = int(
            priority_sample(docs.select("doc_id", "n_chars"),
                            "n_chars", 1000, "doc_id").count())
        out["priority_sample_sec"] = round(time.monotonic() - t, 3)
        t = time.monotonic()
        out["latest_snapshot_rows"] = int(
            latest_snapshot(events, "user_id", "ts", "event_id").count())
        out["latest_snapshot_sec"] = round(time.monotonic() - t, 3)
    finally:
        g.unpersist()
    return out


def main():
    spark = get_spark(app_name="bench", cpus=CPUS)

    # Spawn the Python workers once before timing: process startup is an
    # artifact of the fresh local session (5-20s for 32 workers), not engine
    # work — a cluster's executors keep reusable workers alive.
    def _ident(it):
        for pdf in it:
            yield pdf

    spark.range(0, CPUS, 1, CPUS).mapInPandas(_ident, "id long").count()

    extras: dict = {}
    samples: list[dict[str, float]] = []
    totals: list[float] = []
    for rep in range(max(1, REPEATS)):
        t0 = time.monotonic()
        samples.append(run_suite(spark, extras))
        totals.append(round(time.monotonic() - t0, 3))

    keys = list(samples[0].keys())
    best = {k: min(s[k] for s in samples) for k in keys}
    med = {k: round(statistics.median(s[k] for s in samples), 3) for k in keys}
    # headline throughput from the BEST pagerank sample (noise-controlled)
    extras["pagerank"]["edges_per_sec_per_superstep"] = round(
        extras["n_edges"] * extras["pagerank"]["iterations"]
        / best["pagerank_arrow"], 1)
    extras["joinagg_sec_per_superstep"] = round(
        best["pagerank_joinagg"] / 5, 3)
    extras["sortmerge_sec_per_superstep"] = round(
        best["pagerank_joinagg_sortmerge"] / 5, 3)

    t0 = time.monotonic()
    extras["recall"] = recall_eval(spark)
    recall_sec = round(time.monotonic() - t0, 3)
    extras["kernels_oneshot"] = kernel_extras(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "linkgraph-suite-seconds",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "queries_median": med,
        "samples": samples,
        "suite_totals": totals,
        "repeats": max(1, REPEATS),
        "recall_eval_sec": recall_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        **extras,
    }))


if __name__ == "__main__":
    main()
