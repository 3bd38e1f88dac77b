"""Static PageRank vs the NumPy golden oracle (reference protocol:
tight-tolerance golden ranks, L∞ allclose — /root/reference/main.cxx:191).

Fixed-iteration tests assert FP-exact agreement with the oracle recurrence
(pins C0, damping, self-loop normalization, gather semantics); one
full-convergence test exercises the stop rule end-to-end.
"""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
    build_graph,
    self_loop_count,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
    PageRankOptions,
    pagerank,
)

from oracle import pagerank_oracle


def _ranks_array(result, n):
    pdf = result.ranks.toPandas().sort_values("id")
    assert list(pdf["id"]) == list(range(n))
    return pdf["rank"].to_numpy()


@pytest.fixture(scope="module")
def tiny_graph(spark):
    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    yield g
    g.unpersist()


def test_graph_build_self_loops(spark, tiny_graph):
    assert tiny_graph.num_vertices == 10
    assert self_loop_count(tiny_graph.edges) == 10
    # every vertex has outdeg >= 1 after self-loops
    assert tiny_graph.out_degrees().count() == 10


def test_static_pagerank_converges_to_golden(spark, tiny_graph):
    """Full convergence loop: stop rule err(L∞) < tol; ranks allclose 1e-6
    vs a tol-1e-14 golden run (the reference's own check, main.cxx:191)."""
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=1e-14, max_iter=500)
    res = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=1e-7, check_every=4, metrics_level="none"),
    )
    got = _ranks_array(res, 10)
    assert np.allclose(got, golden, atol=1e-6)
    assert res.err < 1e-7
    assert abs(got.sum() - 1.0) < 1e-6  # probability distribution


def test_fixed_iterations_exact_recurrence(spark, tiny_graph):
    """5 supersteps must equal 5 oracle iterations to FP precision — pins the
    recurrence (C0, damping, self-loops) exactly."""
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=5)
    res = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none"),
    )
    got = _ranks_array(res, 10)
    assert res.iterations == 5
    assert np.allclose(got, golden, atol=1e-12)


def test_static_pagerank_small_graph_fixed_iters(spark):
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=3)
    edges = spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA)
    g = build_graph(edges, vertices=spark.range(n).select("id"))
    try:
        golden, _ = pagerank_oracle(
            n, list(edges_pdf.itertuples(index=False)), tol=0.0, max_iter=12
        )
        res = pagerank(
            g,
            PageRankOptions(tolerance=0.0, max_iterations=12, check_every=4,
                            metrics_level="none"),
        )
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)
    finally:
        g.unpersist()


def test_salted_scatter_same_result(spark, tiny_graph):
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=4)
    res = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=4, salt_buckets=3,
                        metrics_level="none"),
    )
    assert np.allclose(_ranks_array(res, 10), golden, atol=1e-12)


def test_sort_merge_path_same_result(spark, tiny_graph):
    """Force the at-scale plan (no rank broadcast: co-partitioned SMJ) and
    check identical results."""
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=4)
    res = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=4, broadcast_vertices=0,
                        metrics_level="none"),
    )
    assert np.allclose(_ranks_array(res, 10), golden, atol=1e-12)


def test_dead_end_teleport_mode(spark):
    """DEAD=true variant on a graph *without* self-loops
    (/root/reference/src/pagerank.hxx:158-184), fixed iterations, FP-exact."""
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]  # 3 is a dead end
    n, iters, d = 4, 10, 0.85
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]),
                               schema=datagen.EDGES_SCHEMA)
    g = build_graph(df, vertices=spark.range(n).select("id"), add_self_loops=False)
    try:
        r = np.full(n, 1.0 / n)
        deg = np.zeros(n)
        for a, _ in edges:
            deg[a] += 1
        for _ in range(iters):
            dead_mass = r[deg == 0].sum()
            c0 = (1 - d) / n + d * dead_mass / n
            acc = np.zeros(n)
            for a, b in edges:
                acc[b] += r[a] / deg[a]
            r = c0 + d * acc
        res = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               dead_end_teleport=True, metrics_level="none"))
        assert np.allclose(_ranks_array(res, n), r, atol=1e-12)
    finally:
        g.unpersist()


def test_auto_salt_decision(spark):
    """salt_buckets=None auto-enables only for shuffle joins on skewed
    graphs (hub floor AND skew ratio), and never for broadcast plans."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        _resolve_salt,
    )

    n = 60
    # one hub source with out-edges to everyone, everyone else degree ~1
    hub = [(0, i) for i in range(n)] + [(i, (i + 1) % n) for i in range(1, n)]
    g = build_graph(
        spark.createDataFrame(hub, "src long, dst long"),
        vertices=spark.range(n).select("id"),
    )
    try:
        # hub deg 61 vs per-task |E|/P = 44.5 (4 shuffle partitions in
        # tests): threshold 1.0 puts the floor right below the hub
        tuned = PageRankOptions(salt_min_degree=10, salt_skew_threshold=1.0,
                                salt_auto_buckets=5)
        # broadcast plan (small=True): never salts
        assert _resolve_salt(g, tuned, small=True) == (0, None)
        # shuffle plan + hub above per-task floor: hub-split mode (no salt
        # keys — the hub's adjacency leaves the co-partitioned join)
        buckets, hubs = _resolve_salt(g, tuned, small=False)
        assert buckets == 0 and hubs == [0]
        # absolute hub floor not met: no salt
        assert _resolve_salt(
            g, PageRankOptions(salt_min_degree=10_000),
            small=False) == (0, None)
        # explicit override wins both ways (uniform all-key salting)
        assert _resolve_salt(
            g, PageRankOptions(salt_buckets=3), small=True) == (3, None)
        assert _resolve_salt(
            g, PageRankOptions(salt_buckets=0, salt_min_degree=1),
            small=False) == (0, None)
        # end-to-end: auto-salted shuffle run matches the oracle exactly
        golden, _ = pagerank_oracle(n, hub, tol=0.0, max_iter=4)
        res = pagerank(
            g,
            PageRankOptions(tolerance=0.0, max_iterations=4,
                            broadcast_vertices=0, salt_min_degree=10,
                            salt_skew_threshold=1.0, metrics_level="none"),
        )
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)
    finally:
        g.unpersist()
