"""Katz / eigenvector centrality (``plans/centrality.py``) vs inline
NumPy oracles: fixed-sweep exactness, converged sanity on a star graph,
and the weighted gather."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.centrality import (
    eigenvector_centrality,
    katz_centrality,
)


def _eig_oracle(n, edges, iters, w=None):
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        nx_ = np.zeros(n)
        for k, (u, v) in enumerate(edges):
            nx_[v] += x[u] * (1.0 if w is None else w[k])
        x = nx_ / (nx_.sum() or 1.0)
    return x


def _katz_oracle(n, edges, alpha, beta, iters, w=None):
    x = np.full(n, beta)
    for _ in range(iters):
        nx_ = np.full(n, beta)
        for k, (u, v) in enumerate(edges):
            nx_[v] += alpha * x[u] * (1.0 if w is None else w[k])
        x = nx_
    return x


@pytest.fixture(scope="module")
def small(spark):
    n = 120
    edges_pdf = datagen.synth_edges(n, seed=31)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    raw = list(zip(edges_pdf["src"], edges_pdf["dst"]))
    yield g, raw, n
    g.unpersist()


def _scores(df, n):
    pdf = df.toPandas().sort_values("id")
    assert list(pdf["id"]) == list(range(n))
    return pdf["score"].to_numpy()


def test_eigenvector_matches_oracle_fixed_sweeps(small):
    g, raw, n = small
    golden = _eig_oracle(n, raw, 4)
    res = eigenvector_centrality(g, tolerance=0.0, max_iterations=4)
    assert res.iterations == 4
    assert np.max(np.abs(_scores(res.scores, n) - golden)) < 1e-12


def test_katz_matches_oracle_fixed_sweeps(small):
    g, raw, n = small
    golden = _katz_oracle(n, raw, 0.1, 1.0, 3)
    golden = golden / golden.sum()
    res = katz_centrality(g, alpha=0.1, beta=1.0, tolerance=0.0,
                          max_iterations=3)
    assert np.max(np.abs(_scores(res.scores, n) - golden)) < 1e-12
    # un-normalized keeps the raw fixed-point scale (min = beta exactly
    # for any vertex with no in-edges; >= beta everywhere)
    raw_res = katz_centrality(g, alpha=0.1, beta=1.0, tolerance=0.0,
                              max_iterations=3, normalized=False)
    assert (_scores(raw_res.scores, n) >= 1.0 - 1e-12).all()


def test_eigenvector_converged_star(spark):
    # bidirectional star + explicit hub self-loop: the self-loop breaks the
    # period-2 oscillation a bipartite star would give power iteration
    edges = ([(i, 0) for i in range(1, 30)]
             + [(0, i) for i in range(1, 30)] + [(0, 0)])
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=spark.range(30).select("id"),
        add_self_loops=False,
    )
    try:
        res = eigenvector_centrality(g, tolerance=1e-10, max_iterations=200)
        pdf = res.scores.toPandas().set_index("id")["score"]
        assert res.err <= 1e-10
        assert pdf.idxmax() == 0
        # L1-normalized every sweep
        assert abs(pdf.sum() - 1.0) < 1e-9
    finally:
        g.unpersist()


def test_katz_weighted_gather(spark):
    edges = [(0, 2, 3.0), (1, 2, 1.0), (2, 3, 2.0), (3, 0, 1.0)]
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long, w double"),
        vertices=spark.range(4).select("id"),
        add_self_loops=False,
        weight_col="w",
    )
    try:
        golden = _katz_oracle(4, [(s, d) for s, d, _ in edges], 0.2, 1.0, 5,
                              w=[w for _, _, w in edges])
        golden = golden / golden.sum()
        res = katz_centrality(g, alpha=0.2, beta=1.0, tolerance=0.0,
                              max_iterations=5)
        got = res.scores.toPandas().sort_values("id")["score"].to_numpy()
        assert np.max(np.abs(got - golden)) < 1e-12
    finally:
        g.unpersist()


def test_katz_rejects_bad_alpha(small):
    g, _, _ = small
    with pytest.raises(ValueError):
        katz_centrality(g, alpha=1.5)


def test_katz_auto_alpha_converges(small):
    # auto alpha = 0.85/min(max out-deg, max in-deg) <= 0.85/lambda_max:
    # guaranteed contraction, so the tolerance loop terminates early
    g, _, n = small
    res = katz_centrality(g, alpha="auto", tolerance=1e-10,
                          max_iterations=500)
    assert res.iterations < 500
    assert res.err <= 1e-10
    pdf = res.scores.toPandas()
    assert len(pdf) == n and abs(pdf["score"].sum() - 1.0) < 1e-9


def test_katz_divergence_raises(spark):
    # a 4-clique has lambda_max = 3; alpha = 0.9 >> 1/3 diverges and must
    # raise instead of returning garbage
    edges = [(i, j) for i in range(4) for j in range(4) if i != j]
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=spark.range(4).select("id"),
        add_self_loops=False,
    )
    try:
        with pytest.raises(ValueError, match="diverged"):
            katz_centrality(g, alpha=0.9, tolerance=1e-10,
                            max_iterations=500)
    finally:
        g.unpersist()
