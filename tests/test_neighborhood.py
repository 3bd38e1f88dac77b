"""Neighborhood function / effective diameter (HyperANF-style kernel,
``plans/neighborhood.py``): exact bitset kernel vs the BFS oracle, HLL
estimate error bounds, and the sharded join-agg path's register-exactness
vs the dense kernel."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
    effective_diameter,
    hll_estimate,
    hll_init,
    neighborhood_function,
    neighborhood_function_sharded,
)
from oracle import neighborhood_oracle


@pytest.fixture(scope="module")
def small_graph(spark):
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=5)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


@pytest.fixture(scope="module")
def chain_graph(spark):
    """0->1->...->9 plus a detached triangle — known distances, tests the
    fixpoint stop and the unreachable-pair exclusion."""
    edges = [(i, i + 1) for i in range(9)] + [(10, 11), (11, 12), (12, 10)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(13).select("id"),
                    add_self_loops=False)
    g._edge_list = edges
    yield g
    g.unpersist()


def test_exact_matches_bfs_oracle_chain(spark, chain_graph):
    nf = neighborhood_function(chain_graph, mode="exact").toPandas()
    nf = nf.sort_values("t").reset_index(drop=True)
    want = neighborhood_oracle(13, chain_graph._edge_list)
    assert list(map(tuple, nf.to_numpy())) == want
    # chain diameter 9: fixpoint must run the full 9 rounds
    assert nf["t"].max() == 9


def test_exact_matches_bfs_oracle_small(spark, small_graph):
    nf = neighborhood_function(small_graph, mode="exact").toPandas()
    nf = nf.sort_values("t").reset_index(drop=True)
    edges = [(int(r.src), int(r.dst))
             for r in small_graph._edges_pdf.itertuples(index=False)]
    want = neighborhood_oracle(300, edges)
    assert list(map(tuple, nf.to_numpy())) == want


def test_exact_max_t_truncates(spark, chain_graph):
    nf = neighborhood_function(chain_graph, max_t=3, mode="exact").toPandas()
    want = neighborhood_oracle(13, chain_graph._edge_list, max_t=3)
    assert list(map(tuple, nf.sort_values("t").to_numpy())) == want


def test_effective_diameter_chain(spark, chain_graph):
    # exact N(t) on the chain+triangle: target = 0.9 * N(inf), landing
    # between integer rounds -> interpolated value vs the oracle curve
    want = neighborhood_oracle(13, chain_graph._edge_list)
    vals = np.array([c for _, c in want], dtype=float)
    target = 0.9 * vals[-1]
    i = int(np.argmax(vals >= target))
    expect = i - 1 + (target - vals[i - 1]) / (vals[i] - vals[i - 1])
    got = effective_diameter(chain_graph, alpha=0.9, mode="exact")
    assert abs(got - expect) < 1e-12


def test_hll_estimate_error_bounded(spark, small_graph):
    """N(t) error bounds. NOTE the estimator's errors are CORRELATED
    across vertices (balls overlap; at saturation every ball is V and all
    rows share ONE register realization), so the sum does NOT average down
    to per-vertex-error/sqrt(n) — the honest bound at b=6 is the
    single-HLL ~1.04/sqrt(64)=13% std (measured 17.4% here, one
    deterministic draw), and widening registers is what tightens it
    (b=10: measured 1.8%)."""
    exact = neighborhood_function(small_graph, mode="exact").toPandas()
    exact = exact.sort_values("t").reset_index(drop=True)
    approx = neighborhood_function(
        small_graph, max_t=int(exact["t"].max()), mode="hll", b=6
    ).toPandas().sort_values("t").reset_index(drop=True)
    # HLL may stop early if registers stabilize before the true fixpoint
    merged = exact.merge(approx, on="t", suffixes=("_x", "_a"))
    assert len(merged) >= len(exact) - 1
    rel = np.abs(merged["n_pairs_a"] / merged["n_pairs_x"] - 1.0)
    assert rel.max() < 0.20, rel
    # higher precision tightens the estimate
    approx10 = neighborhood_function(
        small_graph, max_t=int(exact["t"].max()), mode="hll", b=10
    ).toPandas().sort_values("t").reset_index(drop=True)
    m10 = exact.merge(approx10, on="t", suffixes=("_x", "_a"))
    rel10 = np.abs(m10["n_pairs_a"] / m10["n_pairs_x"] - 1.0)
    assert rel10.max() < 0.05, rel10
    assert rel10.max() < rel.max()


def test_hll_init_register_semantics():
    ids = np.arange(1000, dtype=np.int64)
    regs = hll_init(ids, 6)
    assert regs.shape == (1000, 64)
    # exactly one nonzero register per singleton ball
    assert ((regs > 0).sum(axis=1) == 1).all()
    # singleton estimates: linear counting with one hit = m*ln(m/(m-1))
    est = hll_estimate(regs)
    want = 64 * np.log(64 / 63)
    assert np.allclose(est, want)


def test_sharded_matches_dense_hll(spark, chain_graph):
    """The join-agg sharded path and the broadcast dense kernel run the
    SAME registers — per-round totals equal up to summation order."""
    dense = neighborhood_function(
        chain_graph, max_t=4, mode="hll", b=5).toPandas()
    sharded = neighborhood_function_sharded(
        chain_graph, max_t=4, b=5).toPandas()
    d = dense.sort_values("t")["n_pairs"].to_numpy()
    s = sharded.sort_values("t")["n_pairs"].to_numpy()
    # dense may stop at an earlier fixpoint; compare the shared prefix
    k = min(len(d), len(s))
    assert k >= 4
    assert np.allclose(d[:k], s[:k], rtol=1e-9)


# ------------------------------------------------------ harmonic centrality


def test_harmonic_chain_closed_form(spark, chain_graph):
    """On the 0->1->...->9 chain H_in(v) = Σ_{t=1..v} 1/t (every earlier
    vertex at its exact distance); the detached triangle vertices each see
    the other two at distances 1 and 2."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
        harmonic_centrality,
    )

    got = harmonic_centrality(chain_graph, mode="exact").toPandas() \
        .sort_values("id")["harmonic"].to_numpy()
    want = np.zeros(13)
    for v in range(10):
        want[v] = sum(1.0 / t for t in range(1, v + 1))
    want[10] = want[11] = want[12] = 1.0 + 0.5
    assert np.allclose(got, want, atol=1e-12)


def test_harmonic_matches_bfs_oracle_small(spark, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
        harmonic_centrality,
    )
    from oracle import harmonic_oracle

    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = harmonic_centrality(small_graph, mode="exact").toPandas() \
        .sort_values("id")["harmonic"].to_numpy()
    assert np.allclose(got, harmonic_oracle(300, edges), atol=1e-10)
    # outward variant + horizon truncation
    got3 = harmonic_centrality(small_graph, max_t=3, mode="exact",
                               direction="out").toPandas() \
        .sort_values("id")["harmonic"].to_numpy()
    assert np.allclose(
        got3, harmonic_oracle(300, edges, max_t=3, direction="out"),
        atol=1e-10)


def test_closeness_chain_closed_form(spark, chain_graph):
    """On the 0->1->...->9 chain, vertex v sees v earlier vertices at
    incoming distances 1..v: r = v+1, S = v(v+1)/2, closeness = 2/(v+1),
    lin = 2(v+1)/v. Vertex 0 has S=0: closeness 0, lin 1 (Boldi-Vigna
    convention). Triangle vertices: r=3, S=1+2=3."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
        closeness_centrality,
    )

    got = closeness_centrality(chain_graph, mode="exact").toPandas() \
        .sort_values("id").reset_index(drop=True)
    for v in range(10):
        assert got["reachable"][v] == v + 1
        assert got["total_dist"][v] == v * (v + 1) / 2
        if v == 0:
            assert got["closeness"][v] == 0.0 and got["lin"][v] == 1.0
        else:
            assert abs(got["closeness"][v] - 2.0 / (v + 1)) < 1e-12
            assert abs(got["lin"][v] - 2.0 * (v + 1) / v) < 1e-12
    for v in (10, 11, 12):
        assert got["reachable"][v] == 3 and got["total_dist"][v] == 3
        assert abs(got["closeness"][v] - 2.0 / 3.0) < 1e-12
        assert abs(got["lin"][v] - 3.0) < 1e-12


def test_closeness_matches_bfs_oracle_small(spark, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
        closeness_centrality,
    )
    from oracle import closeness_oracle

    edges = [(int(r.src), int(r.dst))
             for r in small_graph._edges_pdf.itertuples(index=False)]
    got = closeness_centrality(small_graph, mode="exact").toPandas() \
        .sort_values("id").reset_index(drop=True)
    r, s, c, lin = closeness_oracle(300, edges)
    assert np.allclose(got["reachable"], r)
    assert np.allclose(got["total_dist"], s)
    assert np.allclose(got["closeness"], c, atol=1e-12)
    assert np.allclose(got["lin"], lin, atol=1e-10)
    # outward variant + horizon truncation
    got3 = closeness_centrality(small_graph, max_t=3, mode="exact",
                                direction="out").toPandas() \
        .sort_values("id").reset_index(drop=True)
    r3, s3, c3, lin3 = closeness_oracle(300, edges, max_t=3,
                                        direction="out")
    assert np.allclose(got3["reachable"], r3)
    assert np.allclose(got3["total_dist"], s3)
    assert np.allclose(got3["closeness"], c3, atol=1e-12)


def test_harmonic_hll_tracks_exact(spark, small_graph):
    """HLL-mode harmonic centrality is a noisy but strongly rank-correlated
    estimate of the exact scores (b=8 → ~6.5% register error)."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.neighborhood import (
        harmonic_centrality,
    )

    ex = harmonic_centrality(small_graph, mode="exact").toPandas() \
        .sort_values("id")["harmonic"].to_numpy()
    ap = harmonic_centrality(small_graph, mode="hll", b=8).toPandas() \
        .sort_values("id")["harmonic"].to_numpy()
    nz = ex > 0
    assert nz.any()
    rel = np.abs(ap[nz] - ex[nz]) / ex[nz]
    assert np.median(rel) < 0.25
    # rank correlation (Spearman via argsort of argsort)
    r1 = np.argsort(np.argsort(ex))
    r2 = np.argsort(np.argsort(ap))
    rho = np.corrcoef(r1, r2)[0, 1]
    assert rho > 0.9
