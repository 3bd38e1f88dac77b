"""Arrow dense-kernel PageRank vs the NumPy oracle and vs the join-agg
path: identical recurrence, identical results (static / naive-dynamic /
dynamic-frontier)."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
    apply_batch,
    batch_endpoints_frontier,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
    DenseGraph,
    pagerank_arrow,
)

from oracle import pagerank_oracle


@pytest.fixture(scope="module")
def tiny_graph(spark):
    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    yield g
    g.unpersist()


def _ranks_array(res, n):
    pdf = res.ranks.toPandas().sort_values("id")
    assert list(pdf["id"]) == list(range(n))
    return pdf["rank"].to_numpy()


def test_arrow_fixed_iters_exact(spark, tiny_graph):
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=5)
    res = pagerank_arrow(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=5, metrics_level="none"),
    )
    assert res.iterations == 5
    assert np.allclose(_ranks_array(res, 10), golden, atol=1e-12)


def test_arrow_converged_small(spark):
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=3)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    try:
        golden, _ = pagerank_oracle(
            n, list(edges_pdf.itertuples(index=False)), tol=1e-14)
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none"))
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-6)
        assert res.err < 1e-9
    finally:
        g.unpersist()


def test_arrow_dense_reuse_and_naive_dynamic(spark, tiny_graph):
    dense = DenseGraph(tiny_graph)
    try:
        res1 = pagerank_arrow(
            tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            dense=dense)
        # naive-dynamic: warm-start from previous ranks, same fixed point
        res2 = pagerank_arrow(
            tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            init=res1.ranks, dense=dense)
        assert res2.iterations <= res1.iterations
        assert np.allclose(_ranks_array(res1, 10), _ranks_array(res2, 10),
                           atol=1e-9)
    finally:
        dense.unpersist()


def test_arrow_dynamic_frontier_matches_golden(spark):
    n = 200
    edges_pdf = datagen.synth_edges(n, seed=11)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    batch_pdf = datagen.random_batch(edges_pdf, 0.05, seed=9)
    # make it a real change: drop the reinsert of half the batch
    dels = batch_pdf[batch_pdf.op == "del"]
    ins = batch_pdf[batch_pdf.op == "ins"].iloc[: len(dels) // 2]
    batch_pdf = pd.concat([dels, ins])
    batch = spark.createDataFrame(batch_pdf, schema="src long, dst long, op string")
    g2 = apply_batch(g, batch)
    try:
        es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
        es -= set(map(tuple, dels[["src", "dst"]].itertuples(index=False)))
        es |= set(map(tuple, ins[["src", "dst"]].itertuples(index=False)))
        golden_new, _ = pagerank_oracle(n, sorted(es), tol=1e-14)

        prev = pagerank_arrow(g, PageRankOptions(tolerance=1e-9, metrics_level="none"))
        frontier = batch_endpoints_frontier(g, g2, batch)
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            init=prev.ranks, frontier=frontier)
        assert np.allclose(_ranks_array(res, n), golden_new, atol=1e-6)
    finally:
        g.unpersist()
        g2.unpersist()


def test_arrow_dead_end_teleport(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
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
            c0 = (1 - d) / n + d * r[deg == 0].sum() / n
            acc = np.zeros(n)
            for a, b in edges:
                acc[b] += r[a] / deg[a]
            r = c0 + d * acc
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=iters,
                               dead_end_teleport=True, metrics_level="none"))
        assert np.allclose(_ranks_array(res, n), r, atol=1e-12)
    finally:
        g.unpersist()


def test_apply_batch_dense_delta_overlay(spark):
    """O(batch) delta overlay == full rebuild == oracle on the updated
    graph (static re-rank, fixed iterations, FP-exact)."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
    )

    n = 300
    edges_pdf = datagen.synth_edges(n, seed=21)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    rng = np.random.default_rng(5)
    k = max(1, len(edges_pdf) // 20)
    idx = rng.choice(len(edges_pdf), size=k, replace=False)
    dels = edges_pdf.iloc[idx][["src", "dst"]].copy()
    dels["op"] = "del"
    new_src = rng.integers(0, n, k)
    new_dst = (new_src + 1 + rng.integers(0, n - 1, k)) % n
    ins = pd.DataFrame({"src": new_src, "dst": new_dst, "op": "ins"})
    batch_pdf = pd.concat([dels, ins], ignore_index=True)
    batch = spark.createDataFrame(batch_pdf, schema="src long, dst long, op string")

    try:
        g2, dense2 = apply_batch_dense(g, dense, batch)
        # oracle on the updated edge set
        es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
        es -= set(map(tuple, dels[["src", "dst"]].itertuples(index=False)))
        es |= set(map(tuple, ins[["src", "dst"]].itertuples(index=False)))
        golden, _ = pagerank_oracle(n, sorted(es), tol=0.0, max_iter=8)
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=0.0, max_iterations=8,
                                metrics_level="none"),
            dense=dense2, resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)
        # edge-set parity of the light DataFrame view
        want = set(es) | {(i, i) for i in range(n)}
        got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
        assert got == want
        # num_edges bookkeeping
        assert g2.num_edges == len(want)
    finally:
        dense.unpersist()
        g.unpersist()


def test_apply_batch_dense_frontier(spark):
    """Dynamic frontier on a delta-overlay view matches golden ranks."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
        batch_endpoints_frontier,
    )

    n = 200
    edges_pdf = datagen.synth_edges(n, seed=31)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    rng = np.random.default_rng(6)
    k = max(1, len(edges_pdf) // 50)
    idx = rng.choice(len(edges_pdf), size=k, replace=False)
    dels = edges_pdf.iloc[idx][["src", "dst"]].copy()
    dels["op"] = "del"
    batch = spark.createDataFrame(dels, schema="src long, dst long, op string")
    try:
        prev = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            dense=dense, resident=True)
        g2, dense2 = apply_batch_dense(g, dense, batch)
        frontier = batch_endpoints_frontier(g, g2, batch)
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            init=prev.ranks, frontier=frontier, dense=dense2, resident=True)
        es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
        es -= set(map(tuple, dels[["src", "dst"]].itertuples(index=False)))
        golden, _ = pagerank_oracle(n, sorted(es), tol=1e-14)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-6)
    finally:
        dense.unpersist()
        g.unpersist()


def test_arrow_contracting_frontier_matches_golden(spark):
    """Per-vertex convergence flags (B2/B3) in the dense kernel: the active
    set contracts as deltas fall below tol, re-enters on neighbor push;
    final ranks still match golden on the updated graph."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
        batch_endpoints_frontier,
    )

    n = 200
    edges_pdf = datagen.synth_edges(n, seed=41)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    rng = np.random.default_rng(7)
    idx = rng.choice(len(edges_pdf), size=8, replace=False)
    dels = edges_pdf.iloc[idx][["src", "dst"]].copy()
    dels["op"] = "del"
    batch = spark.createDataFrame(dels, schema="src long, dst long, op string")
    try:
        prev = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            dense=dense, resident=True)
        g2, dense2 = apply_batch_dense(g, dense, batch)
        frontier = batch_endpoints_frontier(g, g2, batch)
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=1e-9, contracting=True,
                                metrics_level="iteration"),
            init=prev.ranks, frontier=frontier, dense=dense2, resident=True)
        es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
        es -= set(map(tuple, dels[["src", "dst"]].itertuples(index=False)))
        golden, _ = pagerank_oracle(n, sorted(es), tol=1e-14)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-6)
        # active set contracts: later iterations touch fewer rows than peak
        touched = [m["rows_processed"] for m in res.metrics]
        assert touched[-1] <= max(touched)
    finally:
        dense.unpersist()
        g.unpersist()


def test_apply_batch_dense_delete_then_reinsert_is_net_zero(spark):
    """The reference's standard protocol (main.cxx:38-66) deletes a batch
    then RE-INSERTS the same edges — net change zero. The delta overlay must
    produce the identical graph (degrees, superstep results), i.e.
    net-insert = I \\ E, not I \\ (E \\ D)."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
    )

    n = 200
    edges_pdf = datagen.synth_edges(n, seed=33)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    try:
        batch_pdf = datagen.random_batch(edges_pdf, frac=0.1, seed=3)
        batch = spark.createDataFrame(batch_pdf,
                                      schema="src long, dst long, op string")
        g2, dense2 = apply_batch_dense(g, dense, batch)
        assert np.array_equal(dense2.deg, dense.deg)
        assert g2.num_edges == g.num_edges
        golden, _ = pagerank_oracle(
            n, list(map(tuple, edges_pdf.itertuples(index=False))),
            tol=0.0, max_iter=6)
        res = pagerank_arrow(
            g2, PageRankOptions(tolerance=0.0, max_iterations=6,
                                metrics_level="none"),
            dense=dense2, resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)
    finally:
        dense.unpersist()
        g.unpersist()


def test_dense_index_save_load_roundtrip(spark, tmp_path):
    """DenseGraph.save + .load restores the index across views: resident
    supersteps FP-match the freshly-built kernel, and delta overlays apply
    on the loaded index."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
    )

    n = 200
    edges_pdf = datagen.synth_edges(n, seed=9)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g)
    try:
        d = dense.save(str(tmp_path / "index"))
        golden, _ = pagerank_oracle(
            n, list(map(tuple, edges_pdf.itertuples(index=False))),
            tol=0.0, max_iter=6)

        loaded = DenseGraph.load(g, d)
        assert loaded.n == dense.n
        assert np.array_equal(loaded.ids, dense.ids)
        assert np.array_equal(loaded.deg, dense.deg)
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=6,
                               metrics_level="none"),
            dense=loaded, resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)

        # streaming mode is not available on a loaded index
        with pytest.raises(ValueError, match="resident"):
            pagerank_arrow(g, PageRankOptions(tolerance=0.0, max_iterations=1,
                                              metrics_level="none"),
                           dense=loaded, resident=False)

        # delta overlay on the loaded index
        dels = edges_pdf.iloc[:5][["src", "dst"]].copy()
        dels["op"] = "del"
        batch = spark.createDataFrame(dels, schema="src long, dst long, op string")
        g2, loaded2 = apply_batch_dense(g, loaded, batch)
        es = set(map(tuple, edges_pdf.itertuples(index=False)))
        es -= set(map(tuple, dels[["src", "dst"]].itertuples(index=False)))
        golden2, _ = pagerank_oracle(n, sorted(es), tol=0.0, max_iter=6)
        res2 = pagerank_arrow(
            g2, PageRankOptions(tolerance=0.0, max_iterations=6,
                                metrics_level="none"),
            dense=loaded2, resident=True)
        assert np.allclose(_ranks_array(res2, n), golden2, atol=1e-12)
    finally:
        dense.unpersist()
        g.unpersist()


def test_dense_index_save_after_materialize_snapshots_to_path(spark, tmp_path):
    """save(path) after a prior materialize() (tempdir) must snapshot the
    slice files into *path* — not silently write the index metadata into
    the old tempdir (which vanishes on unpersist)."""
    import os

    n = 120
    edges_pdf = datagen.synth_edges(n, seed=11)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()  # tempdir residency first
    try:
        d = dense.save(str(tmp_path / "idx2"))
        assert d == str(tmp_path / "idx2")
        assert os.path.exists(os.path.join(d, "meta.json"))
        golden, _ = pagerank_oracle(
            n, list(map(tuple, edges_pdf.itertuples(index=False))),
            tol=0.0, max_iter=4)
        loaded = DenseGraph.load(g, d)
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=0.0, max_iterations=4,
                               metrics_level="none"),
            dense=loaded, resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-12)
    finally:
        dense.unpersist()
        g.unpersist()


def test_dense_index_load_validates_against_graph(spark, tmp_path):
    """A persisted index for a DIFFERENT graph must fail loudly on load:
    the kernel reads only the slice files, so a stale index would silently
    rank the old edges."""
    n = 100
    edges_pdf = datagen.synth_edges(n, seed=13)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g)
    try:
        d = dense.save(str(tmp_path / "idx"))

        # vertex-count mismatch
        g_small = build_graph(
            spark.createDataFrame(
                edges_pdf[(edges_pdf["src"] < 50) & (edges_pdf["dst"] < 50)],
                schema=datagen.EDGES_SCHEMA),
            vertices=spark.range(50).select("id"),
        )
        with pytest.raises(ValueError, match="rebuild"):
            DenseGraph.load(g_small, d)
        g_small.unpersist()

        # same vertex span, different edge set (edge-count mismatch)
        g_fewer = build_graph(
            spark.createDataFrame(edges_pdf.iloc[:-5],
                                  schema=datagen.EDGES_SCHEMA),
            vertices=spark.range(n).select("id"),
        )
        with pytest.raises(ValueError, match="rebuild"):
            DenseGraph.load(g_fewer, d)
        g_fewer.unpersist()
    finally:
        dense.unpersist()
        g.unpersist()


def test_weighted_missing_w_slice_hard_fails(spark):
    """A weighted graph whose _w slice file is lost must hard-fail: silently
    scattering with implicit weight 1.0 produces badly wrong ranks (weighted
    mode does not fold 1/outdeg into the broadcast q)."""
    import os

    rng = np.random.default_rng(7)
    n = 60
    es = pd.DataFrame({
        "src": rng.integers(0, n, 400),
        "dst": rng.integers(0, n, 400),
        "weight": rng.uniform(0.5, 2.0, 400),
    }).drop_duplicates(["src", "dst"])
    g = build_graph(
        spark.createDataFrame(es, schema="src long, dst long, weight double"),
        vertices=spark.range(n).select("id"),
        weight_col="weight",
    )
    dense = DenseGraph(g).materialize()
    try:
        # remove the weight file of a slice that has edges
        removed = False
        for s in range(dense.n_slices):
            src = np.load(f"{dense.resident_dir}/slice_{s}_src.npy")
            wpath = f"{dense.resident_dir}/slice_{s}_w.npy"
            if src.size and os.path.exists(wpath):
                os.remove(wpath)
                removed = True
                break
        assert removed
        with pytest.raises(Exception, match="slice_.*_w.npy|No such file"):
            pagerank_arrow(
                g, PageRankOptions(tolerance=0.0, max_iterations=1,
                                   metrics_level="none"),
                dense=dense, resident=True)
    finally:
        dense.unpersist()
        g.unpersist()


# ---------------------------------------------------------------------------
# Asynchronous (Gauss-Seidel / barrier-free) update modes — reference
# ASYNC=true (src/pagerankBarrierfree.hxx:213-235): same fixed point as the
# synchronous kernel; with local sweeps (threads running ahead of the
# barrier) in measurably FEWER distributed supersteps.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["slice", "shared"])
def test_arrow_async_matches_golden(spark, mode):
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=11)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    try:
        golden, _ = pagerank_oracle(
            n, list(edges_pdf.itertuples(index=False)), tol=1e-14)
        sync = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none"),
            resident=True)
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none",
                               async_updates=mode),
            resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-6)
        # barrier-free acceleration: 2 local sweeps per superstep → fewer
        # distributed supersteps (reference README.md:59-63 speed claim;
        # the extra sweep is worker-local CPU, no extra job/barrier)
        res2 = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-9, metrics_level="none",
                               async_updates=mode, async_sweeps=2),
            resident=True)
        assert np.allclose(_ranks_array(res2, n), golden, atol=1e-6)
        assert res2.iterations < sync.iterations
    finally:
        g.unpersist()


def test_arrow_async_dynamic_frontier_matches_golden(spark):
    """Async + dynamic frontier (the reference flagship combination,
    pagerankBarrierfreeOmp<true> + Dynamic Frontier)."""
    n = 200
    rng = np.random.default_rng(23)
    base = datagen.synth_edges(n, seed=23)
    extra = pd.DataFrame({
        "src": rng.integers(0, n, 12),
        "dst": rng.integers(0, n, 12),
    }).drop_duplicates()
    full = (
        pd.concat([base, extra]).drop_duplicates().reset_index(drop=True)
    )
    g_old = build_graph(
        spark.createDataFrame(base, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    g_new = build_graph(
        spark.createDataFrame(full, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    try:
        old = pagerank_arrow(
            g_old, PageRankOptions(tolerance=1e-10, metrics_level="none"),
            resident=True)
        golden, _ = pagerank_oracle(
            n, list(full.itertuples(index=False)), tol=1e-14)
        seeds = spark.createDataFrame(
            pd.DataFrame({"id": pd.concat([extra["src"], extra["dst"]])
                          .unique()}))
        res = pagerank_arrow(
            g_new,
            PageRankOptions(tolerance=1e-9, metrics_level="none",
                            async_updates="slice"),
            init=old.ranks, frontier=seeds, resident=True)
        assert np.allclose(_ranks_array(res, n), golden, atol=1e-6)
    finally:
        g_old.unpersist()
        g_new.unpersist()


def test_arrow_async_weighted_matches_sync(spark):
    n = 120
    rng = np.random.default_rng(31)
    es = pd.DataFrame({
        "src": rng.integers(0, n, 500),
        "dst": rng.integers(0, n, 500),
        "weight": rng.uniform(0.5, 2.0, 500),
    }).drop_duplicates(["src", "dst"])
    g = build_graph(
        spark.createDataFrame(es, schema="src long, dst long, weight double"),
        vertices=spark.range(n).select("id"),
        weight_col="weight",
    )
    try:
        sync = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-10, metrics_level="none"),
            resident=True)
        res = pagerank_arrow(
            g, PageRankOptions(tolerance=1e-10, metrics_level="none",
                               async_updates="slice"),
            resident=True)
        assert np.allclose(_ranks_array(res, n), _ranks_array(sync, n),
                           atol=1e-8)
    finally:
        g.unpersist()


def test_arrow_async_validation(spark, tiny_graph):
    with pytest.raises(ValueError, match="resident"):
        pagerank_arrow(
            tiny_graph,
            PageRankOptions(async_updates="slice", metrics_level="none"),
            resident=False)
    with pytest.raises(ValueError, match="slice.*shared|None"):
        pagerank_arrow(
            tiny_graph,
            PageRankOptions(async_updates="bogus", metrics_level="none"),
            resident=True)
    # 'shared' is the single-node mmap model: refuse on a non-local master
    # instead of silently degrading (ADVICE r2)
    sc = spark.sparkContext
    real_master = sc.master
    sc.master = "spark://fake-cluster:7077"
    try:
        with pytest.raises(ValueError, match="single-host"):
            pagerank_arrow(
                tiny_graph,
                PageRankOptions(async_updates="shared", metrics_level="none"),
                resident=True)
    finally:
        sc.master = real_master


def test_fused_resident_matches_streaming_and_oracle(spark):
    """The FUSED resident update kernel (worker-side rank update + norm
    reduction, _resident_update_fn) must produce the same ranks and the
    same iteration count as the streaming accumulator path and converge to
    the NumPy oracle."""
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=7)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g)
    try:
        dense.materialize()
        opts = PageRankOptions(tolerance=1e-9, metrics_level="none")
        res_f = pagerank_arrow(g, opts, dense=dense, resident=True)
        res_s = pagerank_arrow(g, opts, dense=dense, resident=False)
        assert res_f.iterations == res_s.iterations
        assert np.allclose(_ranks_array(res_f, n), _ranks_array(res_s, n),
                           atol=1e-13)
        golden, _ = pagerank_oracle(
            n, list(edges_pdf.itertuples(index=False)), tol=1e-14)
        assert np.allclose(_ranks_array(res_f, n), golden, atol=1e-6)
    finally:
        dense.unpersist()
        g.unpersist()


def test_fused_resident_dead_end_teleport(spark):
    """Fused kernel under dead-end teleport: the per-superstep scalar c0
    (driver-computed dead mass) flows into the worker-side update."""
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    n, iters = 4, 10
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]),
                               schema=datagen.EDGES_SCHEMA)
    g = build_graph(df, vertices=spark.range(n).select("id"),
                    add_self_loops=False)
    try:
        opts = PageRankOptions(tolerance=0.0, max_iterations=iters,
                               dead_end_teleport=True, metrics_level="none")
        res_f = pagerank_arrow(g, opts, resident=True)
        res_s = pagerank_arrow(g, opts, resident=False)
        assert np.allclose(_ranks_array(res_f, n), _ranks_array(res_s, n),
                           atol=1e-14)
    finally:
        g.unpersist()


def test_block_cache_lru_evicts_oldest_first():
    """Per-key LRU: touched keys survive inserts; eviction removes the
    least-recently-used entry, never the whole cache (the round-2 clear-all
    dumped every slice's argsort work when one run exceeded the cap)."""
    import importlib

    pa = importlib.import_module(
        "pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow")

    saved = dict(pa._BLOCK_CACHE)
    pa._BLOCK_CACHE.clear()
    try:
        cap = pa._BLOCK_CACHE_MAX
        for i in range(cap):
            pa._cache_put(("e", "res", i), i)
        assert len(pa._BLOCK_CACHE) == cap
        # touch key 0 -> key 1 becomes LRU
        assert pa._cache_get(("e", "res", 0)) == 0
        pa._cache_put(("e", "res", cap), cap)
        assert len(pa._BLOCK_CACHE) == cap
        assert pa._cache_get(("e", "res", 0)) == 0      # refreshed: kept
        assert pa._cache_get(("e", "res", 1)) is None   # LRU: evicted
        assert pa._cache_get(("e", "res", 2)) == 2      # everything else kept
    finally:
        pa._BLOCK_CACHE.clear()
        pa._BLOCK_CACHE.update(saved)


def test_checkpoint_iceberg_gated(tmp_path, spark):
    """fmt='iceberg' is a loud NotImplementedError while the Iceberg runtime
    jar is absent (this sandbox) instead of an accepted-but-dead flag that
    silently writes parquet."""
    import pytest as _pytest

    from pagerank_barrierfree_openmp_dynamic_spark.checkpoint import CheckpointStore

    with _pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        CheckpointStore(str(tmp_path / "ck"), fmt="iceberg")


def test_sibling_delta_views_do_not_cross_contaminate(spark):
    """Regression: two delta-overlay views derived from the SAME base dense
    index (the run_experiment shape — one batch per fraction over one base
    graph) must not read each other's deltas. With sequential generation
    numbers both siblings were 'gen 1' with identical overlay file names
    and worker-cache keys, so the second view silently computed on the
    first view's edge set (surfaced as identical 8e-5 errors across
    techniques in the crossover sweep). Unique overlay tags fix both the
    disk and the cache namespace."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
    )

    n = 300
    edges_pdf = datagen.synth_edges(n, seed=31)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    try:
        es0 = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))

        def mk_batch(k, seed):
            rng = np.random.default_rng(seed)
            cur = sorted(es0)
            idx = rng.choice(len(cur), size=k, replace=False)
            dels = [cur[i] for i in idx]
            ins = []
            while len(ins) < k:
                s = int(rng.integers(0, n))
                t = (s + 1 + int(rng.integers(0, n - 1))) % n
                if (s, t) not in es0:
                    ins.append((s, t))
            pdf = pd.DataFrame(
                [(a, b, "del") for a, b in dels]
                + [(a, b, "ins") for a, b in ins],
                columns=["src", "dst", "op"])
            es = (es0 - set(dels)) | set(ins)
            return (spark.createDataFrame(
                pdf, schema="src long, dst long, op string"), es)

        batch_a, es_a = mk_batch(8, 1)
        batch_b, es_b = mk_batch(8, 2)
        assert es_a != es_b
        ga, da = apply_batch_dense(g, dense, batch_a)
        gb, db = apply_batch_dense(g, dense, batch_b)
        assert da.overlays != db.overlays
        opts = PageRankOptions(tolerance=0.0, max_iterations=8,
                               metrics_level="none")
        # interleave A and B repeatedly so a poisoned worker cache WOULD
        # serve view A's deltas to view B's tasks
        for _ in range(2):
            res_a = pagerank_arrow(ga, opts, dense=da, resident=True)
            res_b = pagerank_arrow(gb, opts, dense=db, resident=True)
        gold_a, _ = pagerank_oracle(n, sorted(es_a), tol=0.0, max_iter=8)
        gold_b, _ = pagerank_oracle(n, sorted(es_b), tol=0.0, max_iter=8)
        assert np.allclose(_ranks_array(res_a, n), gold_a, atol=1e-12)
        assert np.allclose(_ranks_array(res_b, n), gold_b, atol=1e-12)
    finally:
        dense.unpersist()
        g.unpersist()


def test_driver_state_budget_guard_and_auto_fallback(spark, monkeypatch):
    """VERDICT r4 next-round #7: the dense path's O(N) driver state is
    budget-guarded. Under a tiny budget DenseGraph construction refuses
    with a clear error and pagerank_auto falls back to the join-agg plan
    (identical ranks); under the default budget pagerank_auto runs the
    Arrow kernel and matches the join-agg plan FP-exactly."""
    import importlib

    # plans/__init__ re-exports a same-named function, so attribute-style
    # module import would resolve to the function — fetch the module
    pa = importlib.import_module(
        "pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow")
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import pagerank
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        dense_state_fits,
        pagerank_auto,
    )

    n = 50
    es = sorted({(s, (s * 3 + 1) % n) for s in range(n)} | {(0, 7), (7, 9)})
    g = build_graph(
        spark.createDataFrame(pd.DataFrame(es, columns=["src", "dst"]),
                              schema="src long, dst long"),
        vertices=spark.range(n).select("id"))
    o = PageRankOptions(tolerance=0.0, max_iterations=4,
                        metrics_level="none")
    golden = pagerank(g, o).ranks.toPandas().sort_values("id")

    assert dense_state_fits(n)
    assert not dense_state_fits(10 ** 12)  # 48 TB of driver state: never

    # within budget: auto picks the Arrow kernel, FP-identical ranks
    got = pagerank_auto(g, o).ranks.toPandas().sort_values("id")
    assert np.allclose(got["rank"].to_numpy(), golden["rank"].to_numpy(),
                       atol=0.0)

    # tiny budget: DenseGraph refuses...
    monkeypatch.setattr(pa, "DRIVER_STATE_BUDGET", 64)
    with pytest.raises(ValueError, match="driver-resident state"):
        DenseGraph(g)
    # ...auto falls back to join-agg with identical ranks...
    got2 = pagerank_auto(g, o).ranks.toPandas().sort_values("id")
    assert np.allclose(got2["rank"].to_numpy(), golden["rank"].to_numpy(),
                       atol=0.0)
    # ...and refuses to silently drop dense-only options
    with pytest.raises(ValueError, match="dense-kernel options"):
        pagerank_auto(g, o, resident=True)
    g.unpersist()


def test_apply_batch_dense_light_view_lineage_is_literal(spark):
    """The light view's edge lineage must embed the NET change rows as
    literal DataFrames, not as the semi/anti joins that derived them:
    chained streaming batches otherwise re-run the whole derivation
    chain (and pin the incoming micro-batch DataFrame) on every later
    action. Post-fix the optimized plan contains no LeftSemi (the
    dels-in-E derivation) at any stacking depth."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        apply_batch_dense,
    )

    n = 60
    edges_pdf = datagen.synth_edges(n, seed=9)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    try:
        gv, dv = g, dense
        for i in range(3):  # stack three generations
            row = edges_pdf.iloc[[i]][["src", "dst"]]
            batch = spark.createDataFrame(
                pd.concat([row.assign(op="del"),
                           pd.DataFrame({"src": [int(row["src"].iloc[0])],
                                         "dst": [(int(row["dst"].iloc[0])
                                                  + 7) % n],
                                         "op": ["ins"]})],
                          ignore_index=True),
                schema="src long, dst long, op string")
            gv, dv = apply_batch_dense(gv, dv, batch)
        plan = gv.edges._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" not in plan, (
            "net-change derivation joins leaked into the light view's "
            "lineage")
        assert gv.edges.count() == gv.num_edges
    finally:
        dense.unpersist()
        g.unpersist()
