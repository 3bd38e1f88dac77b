"""Distributed datagen + resident Arrow-kernel supersteps: extraction
matches the pure link function; resident and streaming kernels agree."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
    DenseGraph,
    pagerank_arrow,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
    pages_to_edges,
    url_dictionary,
)

N = 500


@pytest.fixture(scope="module")
def dist_pages(spark):
    return datagen.pages_df_dist(spark, N).cache()


def test_dist_extraction_matches_ground_truth(spark, dist_pages):
    edges, d = pages_to_edges(dist_pages)
    dmap = dict(d.toPandas()[["url", "id"]].values)
    truth = {
        (dmap[datagen.url_of(v, 64)], dmap[datagen.url_of(t, 64)])
        for v in range(N)
        for t in datagen.links_of(v, N)
    }
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == truth
    # edges_df_dist agrees with links_of too
    got2 = {(r["src"], r["dst"]) for r in datagen.edges_df_dist(spark, N).collect()}
    assert got2 == {(v, t) for v in range(N) for t in datagen.links_of(v, N)}


def test_dist_dictionary_dense_and_deterministic(spark, dist_pages):
    d1 = url_dictionary(dist_pages).toPandas().sort_values("url")
    assert sorted(d1["id"]) == list(range(N))
    # ids assigned in url sort order
    assert list(d1["id"]) == list(range(N))


def test_resident_kernel_matches_streaming(spark):
    edges = datagen.edges_df_dist(spark, N)
    g = build_graph(edges, vertices=spark.range(N).select("id"))
    try:
        opts = PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none")
        dense = DenseGraph(g)
        r_stream = pagerank_arrow(g, opts, dense=dense, resident=False)
        dense.materialize()
        r_res = pagerank_arrow(g, opts, dense=dense, resident=True)
        a = r_stream.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        b = r_res.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        assert np.allclose(a, b, atol=1e-15)
        dense.unpersist()
    finally:
        g.unpersist()


def test_dense_ids_is_permutation(spark):
    """Regression: dense_ids must assign a permutation of [0, N) — an eager
    snapshot guards against repartitionByRange re-sampling between the
    offset collect and the final plan (which silently corrupted ids)."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import dense_ids

    n = 50_000
    df = spark.range(n).select((F.col("id") * 7919 % 1_000_003).alias("k"))
    out = dense_ids(df.distinct(), "k", 16).toPandas()
    assert sorted(out["idx"]) == list(range(len(out)))
    # idx order must follow key order
    srt = out.sort_values("k")
    assert list(srt["idx"]) == list(range(len(out)))


def test_arrow_resident_mass_conservation(spark):
    """With self-loops (no dead ends) total rank mass stays exactly 1 every
    superstep — catches any duplicate/lost edges in the resident slices."""
    edges = datagen.edges_df_dist(spark, 2000)
    g = build_graph(edges, vertices=spark.range(2000).select("id"))
    try:
        dense = DenseGraph(g).materialize()
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=4,
                               metrics_level="none"),
            dense=dense, resident=True)
        total = res.ranks.agg(F.sum("rank")).collect()[0][0]
        assert abs(total - 1.0) < 1e-9
        dense.unpersist()
    finally:
        g.unpersist()
