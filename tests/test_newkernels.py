"""HITS / SCC / k-core / degree histogram vs exact oracles.

These kernels have no reference counterpart (the reference is
PageRank-only); semantics are the standard ones, pinned by the
independent oracles in tests/oracle.py (L1-normalized HITS power
iteration, iterative Tarjan, Batagelj-Zaversnik peeling)."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.degrees import degree_histogram
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.hits import hits
from pagerank_barrierfree_openmp_dynamic_spark.plans.kcore import (
    core_histogram,
    coreness,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import (
    bowtie,
    scc_stats,
    strongly_connected_components,
)

from oracle import (bowtie_oracle, coreness_oracle, hits_oracle, salsa_oracle,
                    scc_oracle)


@pytest.fixture(scope="module")
def tiny_graph_noloops(spark):
    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"),
                    add_self_loops=False)
    yield g
    g.unpersist()


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
def cycle_chain_graph(spark):
    """Five 3-cycles chained by single DAG edges plus a pendant tail —
    forces the SCC loop through multiple color/mark rounds (the coloring
    pivot only finalizes one chained SCC per round) and the trim phase
    (the tail is a trimmable DAG fringe)."""
    edges = []
    for c in range(5):
        b = 3 * c
        edges += [(b, b + 1), (b + 1, b + 2), (b + 2, b)]
        if c:
            edges.append((b - 1, b))
    edges += [(14, 15), (15, 16)]  # pendant tail off the last cycle
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(17).select("id"),
                    add_self_loops=False)
    g._edge_list = edges
    yield g
    g.unpersist()


def _col(df, n, key, val):
    pdf = df.toPandas().sort_values(key)
    assert list(pdf[key]) == list(range(n))
    return pdf[val].to_numpy()


# ---------------------------------------------------------------- HITS


def test_hits_tiny_fixed_iterations_exact(spark, tiny_graph_noloops):
    res = hits(tiny_graph_noloops, tolerance=0.0, max_iterations=3)
    assert res.iterations == 3
    hub = _col(res.scores.select("id", "hub"), 10, "id", "hub")
    auth = _col(res.scores.select("id", "auth"), 10, "id", "auth")
    h, a, _ = hits_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=3)
    assert np.allclose(hub, h, atol=1e-12)
    assert np.allclose(auth, a, atol=1e-12)


def test_hits_small_converged(spark, small_graph):
    res = hits(small_graph, tolerance=1e-10, max_iterations=300)
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    h, a, _ = hits_oracle(300, edges, tol=1e-12, max_iter=1000)
    hub = _col(res.scores.select("id", "hub"), 300, "id", "hub")
    auth = _col(res.scores.select("id", "auth"), 300, "id", "auth")
    assert np.allclose(hub, h, atol=1e-7)
    assert np.allclose(auth, a, atol=1e-7)
    # L1 normalization invariant
    assert abs(hub.sum() - 1.0) < 1e-9
    assert abs(auth.sum() - 1.0) < 1e-9


def test_hits_arrow_matches_join_path_and_oracle(spark, small_graph):
    """Dense Arrow HITS kernel (resident slices, two narrow jobs per
    superstep) is FP-identical to the join-agg path and exact vs the
    NumPy oracle at fixed iteration count."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.hits import hits_arrow

    res_a = hits_arrow(small_graph, tolerance=0.0, max_iterations=6)
    res_j = hits(small_graph, tolerance=0.0, max_iterations=6)
    assert res_a.iterations == res_j.iterations == 6
    hub_a = _col(res_a.scores.select("id", "hub"), 300, "id", "hub")
    auth_a = _col(res_a.scores.select("id", "auth"), 300, "id", "auth")
    hub_j = _col(res_j.scores.select("id", "hub"), 300, "id", "hub")
    auth_j = _col(res_j.scores.select("id", "auth"), 300, "id", "auth")
    assert np.allclose(hub_a, hub_j, atol=1e-14)
    assert np.allclose(auth_a, auth_j, atol=1e-14)
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    h, a, _ = hits_oracle(300, edges, tol=0.0, max_iter=6)
    assert np.allclose(hub_a, h, atol=1e-12)
    assert np.allclose(auth_a, a, atol=1e-12)


def test_hits_arrow_converged_tracks_err(spark, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.hits import hits_arrow

    res = hits_arrow(small_graph, tolerance=1e-10, max_iterations=300)
    assert res.err <= 1e-10
    hub = _col(res.scores.select("id", "hub"), 300, "id", "hub")
    assert abs(hub.sum() - 1.0) < 1e-9


# ----------------------------------------------------------------- SCC


def test_scc_tiny_exact(spark, tiny_graph_noloops):
    got = _col(strongly_connected_components(tiny_graph_noloops), 10, "id", "comp")
    want = scc_oracle(10, datagen.tiny_edges())
    assert (got == want).all()


def test_scc_cycle_chain_exact(spark, cycle_chain_graph):
    got = _col(strongly_connected_components(cycle_chain_graph), 17, "id", "comp")
    want = scc_oracle(17, cycle_chain_graph._edge_list)
    assert (got == want).all()
    # planted structure: each 3-cycle is one SCC, tail vertices are trivial
    assert list(got[:6]) == [0, 0, 0, 3, 3, 3]
    assert got[15] == 15 and got[16] == 16


def test_scc_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(strongly_connected_components(small_graph), 300, "id", "comp")
    want = scc_oracle(300, edges)
    assert (got == want).all()


def test_scc_stats_matches_oracle(spark, cycle_chain_graph):
    row = scc_stats(cycle_chain_graph).collect()[0]
    want = scc_oracle(17, cycle_chain_graph._edge_list)
    _, counts = np.unique(want, return_counts=True)
    assert row["n_sccs"] == len(counts)
    assert row["largest_scc"] == counts.max()
    assert row["n_trivial"] == int((counts == 1).sum())


def test_bowtie_regions_exact(spark, cycle_chain_graph):
    got = bowtie(cycle_chain_graph).toPandas().sort_values("id")
    want = bowtie_oracle(17, cycle_chain_graph._edge_list)
    assert list(got["region"]) == want
    # planted: cycle 0 is the (tie-broken) core, everything downstream OUT
    assert want[:3] == ["CORE"] * 3 and want[3:] == ["OUT"] * 14


def test_bowtie_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = bowtie(small_graph).toPandas().sort_values("id")
    want = bowtie_oracle(300, edges)
    assert list(got["region"]) == want


# -------------------------------------------------------------- k-core


def test_coreness_tiny_exact(spark, tiny_graph_noloops):
    got = _col(coreness(tiny_graph_noloops), 10, "id", "core")
    want = coreness_oracle(10, datagen.tiny_edges())
    assert (got == want).all()


def test_coreness_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(coreness(small_graph), 300, "id", "core")
    want = coreness_oracle(300, edges)
    assert (got == want).all()


def test_core_histogram_sums_to_n(spark, small_graph):
    pdf = core_histogram(small_graph).toPandas()
    assert pdf["n_vertices"].sum() == 300
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    want = coreness_oracle(300, edges)
    for _, r in pdf.iterrows():
        assert (want == r["core"]).sum() == r["n_vertices"]


# -------------------------------------------------- degree histogram


def test_degree_histogram_matches_degrees(spark, small_graph):
    pdf = degree_histogram(small_graph.edges, small_graph.vertices,
                           "out").toPandas()
    assert pdf["n_vertices"].sum() == 300
    edges = small_graph._edges_pdf
    deg = np.zeros(300, dtype=np.int64)
    src, counts = np.unique(
        edges.drop_duplicates(subset=["src", "dst"])["src"].to_numpy(),
        return_counts=True)
    deg[src] = counts
    for _, r in pdf.iterrows():
        assert (deg == r["deg"]).sum() == r["n_vertices"]
    with pytest.raises(ValueError):
        degree_histogram(small_graph.edges, small_graph.vertices, "sideways")


# ---------------------------------------------------- graph contraction


def test_contract_edges_weighted_and_loops(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        contract_edges,
    )

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2, 3, 4, 5],
                      "dst": [2, 3, 4, 5, 0, 1],
                      "w":   [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}))
    mapping = spark.createDataFrame(
        pd.DataFrame({"id": range(6), "group": [0, 0, 1, 1, 2, 2]}))
    got = contract_edges(edges, mapping, weight_col="w").toPandas()
    got = {(r.src, r.dst): r.weight for r in got.itertuples(index=False)}
    # 0->2, 1->3 both map to (0,1): weights 1+2; 2->4,3->5 -> (1,2): 3+4;
    # 4->0,5->1 -> (2,0): 5+6
    assert got == {(0, 1): 3.0, (1, 2): 7.0, (2, 0): 11.0}

    # unweighted counts + contracted self-loop dropping
    mapping2 = spark.createDataFrame(
        pd.DataFrame({"id": range(6), "group": [0, 0, 0, 0, 1, 1]}))
    got2 = contract_edges(edges, mapping2, drop_self_loops=True).toPandas()
    got2 = {(r.src, r.dst): r.weight for r in got2.itertuples(index=False)}
    # inside-group 0: 0->2, 1->3 dropped; inside-group 1: none
    assert got2 == {(0, 1): 2.0, (1, 0): 2.0}


# ---------------------------------------------------------------- SALSA


def test_salsa_tiny_fixed_iterations_exact(spark, tiny_graph_noloops):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import salsa

    res = salsa(tiny_graph_noloops, tolerance=0.0, max_iterations=3)
    assert res.iterations == 3
    hub = _col(res.scores.select("id", "hub"), 10, "id", "hub")
    auth = _col(res.scores.select("id", "auth"), 10, "id", "auth")
    h, a, _ = salsa_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=3)
    assert np.allclose(hub, h, atol=1e-12)
    assert np.allclose(auth, a, atol=1e-12)


def test_salsa_arrow_matches_join_path_and_oracle(spark, small_graph):
    """Dense Arrow SALSA (driver-side walk division + the HITS gather
    kernel) is FP-close to the join-agg path and exact vs the NumPy
    oracle at fixed iteration count."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import (
        salsa,
        salsa_arrow,
    )

    res_a = salsa_arrow(small_graph, tolerance=0.0, max_iterations=6)
    res_j = salsa(small_graph, tolerance=0.0, max_iterations=6)
    assert res_a.iterations == res_j.iterations == 6
    hub_a = _col(res_a.scores.select("id", "hub"), 300, "id", "hub")
    auth_a = _col(res_a.scores.select("id", "auth"), 300, "id", "auth")
    hub_j = _col(res_j.scores.select("id", "hub"), 300, "id", "hub")
    auth_j = _col(res_j.scores.select("id", "auth"), 300, "id", "auth")
    assert np.allclose(hub_a, hub_j, atol=1e-13)
    assert np.allclose(auth_a, auth_j, atol=1e-13)
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    h, a, _ = salsa_oracle(300, edges, tol=0.0, max_iter=6)
    assert np.allclose(hub_a, h, atol=1e-12)
    assert np.allclose(auth_a, a, atol=1e-12)


def test_salsa_stationary_is_degree_proportional(spark):
    """Lempel & Moran's closed form: when the co-citation (resp.
    bibliographic-coupling) graph is connected, the SALSA authority
    (resp. hub) fixed point is EXACTLY indeg/Σindeg (resp.
    outdeg/Σoutdeg) — an independent check no iteration count shares."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import salsa

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4),
             (3, 4), (3, 5), (4, 5), (4, 1), (5, 1), (5, 0)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(6).select("id"),
                    add_self_loops=False)
    try:
        res = salsa(g, tolerance=1e-12, max_iterations=400)
        hub = _col(res.scores.select("id", "hub"), 6, "id", "hub")
        auth = _col(res.scores.select("id", "auth"), 6, "id", "auth")
        indeg = np.zeros(6)
        outdeg = np.zeros(6)
        for s, d in edges:
            outdeg[s] += 1
            indeg[d] += 1
        assert np.allclose(auth, indeg / indeg.sum(), atol=1e-9)
        assert np.allclose(hub, outdeg / outdeg.sum(), atol=1e-9)
    finally:
        g.unpersist()


def test_salsa_weighted_walks_match_oracle(spark):
    """Weighted SALSA walks proportionally to edge weight on BOTH chains
    (forward w/W_out, backward w/W_in); salsa_arrow refuses weighted."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import (
        salsa,
        salsa_arrow,
    )

    rng = np.random.default_rng(11)
    n = 40
    src = rng.integers(0, n, 160)
    dst = (src + 1 + rng.integers(0, n - 1, 160)) % n
    w = (src * 7 + dst * 13) % 5 + 1.0
    pdf = pd.DataFrame({"src": src, "dst": dst, "w": w.astype(float)})
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(n).select("id"),
                    add_self_loops=False, weight_col="w")
    try:
        res = salsa(g, tolerance=0.0, max_iterations=4)
        hub = _col(res.scores.select("id", "hub"), n, "id", "hub")
        auth = _col(res.scores.select("id", "auth"), n, "id", "auth")
        h, a, _ = salsa_oracle(
            n, list(zip(src.tolist(), dst.tolist())),
            weights=w.tolist(), tol=0.0, max_iter=4)
        assert np.allclose(hub, h, atol=1e-12)
        assert np.allclose(auth, a, atol=1e-12)
        with pytest.raises(ValueError, match="unweighted"):
            salsa_arrow(g)
    finally:
        g.unpersist()


def test_powerlaw_alpha_matches_mle_mirror(spark, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.operators.degrees import (
        powerlaw_alpha,
    )

    row = powerlaw_alpha(small_graph.edges, dmin=2, direction="out").collect()[0]
    e = small_graph.edges.select("src").toPandas()["src"].to_numpy()
    _, counts = np.unique(e, return_counts=True)
    tail = counts[counts >= 2]
    want = 1.0 + len(tail) / np.log(tail / 1.5).sum()
    assert row.n_tail == len(tail)
    assert row.alpha == pytest.approx(round(want, 6), abs=1e-9)
    with pytest.raises(ValueError):
        powerlaw_alpha(small_graph.edges, direction="sideways")


# ------------------------------------------------- condensation DAG


def _cond_oracle(n, edges):
    """(cross-comp weighted edge dict, longest-path level per comp)."""
    comp = scc_oracle(n, edges)
    w: dict[tuple[int, int], int] = {}
    for a, b in set((int(a), int(b)) for a, b in edges):
        ca, cb = int(comp[a]), int(comp[b])
        if ca != cb:
            w[(ca, cb)] = w.get((ca, cb), 0) + 1
    lvl = {int(c): 0 for c in set(comp.tolist())}
    changed = True
    while changed:
        changed = False
        for (a, b) in w:
            if lvl[b] < lvl[a] + 1:
                lvl[b] = lvl[a] + 1
                changed = True
    return w, lvl


def test_condensation_cycle_chain_exact(spark, cycle_chain_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import condensation

    want_w, _ = _cond_oracle(17, cycle_chain_graph._edge_list)
    got = {(r["src"], r["dst"]): r["weight"]
           for r in condensation(cycle_chain_graph).collect()}
    assert got == {k: float(v) for k, v in want_w.items()}
    # planted: 5 chained cycle-SCCs + 2 tail singletons => a 6-link path
    assert len(got) == 6


def test_dag_levels_cycle_chain_exact(spark, cycle_chain_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import dag_levels

    _, want = _cond_oracle(17, cycle_chain_graph._edge_list)
    got = {r["comp"]: r["level"] for r in dag_levels(cycle_chain_graph).collect()}
    assert got == want
    # chain depth: cycle c at level c, tail extends two more
    assert got[0] == 0 and got[12] == 4 and got[16] == 6


def test_dag_levels_small_exact(spark, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.scc import dag_levels

    edges = list(small_graph._edges_pdf.itertuples(index=False))
    _, want = _cond_oracle(300, edges)
    got = {r["comp"]: r["level"] for r in dag_levels(small_graph).collect()}
    assert got == want
