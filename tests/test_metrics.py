"""Graph-quality metrics (operators/metrics.py): directed modularity and
degree assortativity vs NumPy mirrors and hand-checkable fixtures."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
    degree_assortativity,
    modularity,
)


@pytest.fixture(scope="module")
def two_cliques(spark):
    """Two directed 3-cliques joined by one bridge edge — a partition
    along the cliques has high modularity, the all-one-community partition
    has zero."""
    edges = []
    for base in (0, 3):
        for a in range(3):
            for b in range(3):
                if a != b:
                    edges.append((base + a, base + b))
    edges.append((2, 3))
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(6).select("id"),
                    add_self_loops=False)
    g._edge_list = edges
    yield g
    g.unpersist()


def _modularity_mirror(edges, labels, gamma=1.0):
    m = len(edges)
    ec, ko, ki = {}, {}, {}
    for s, d in edges:
        ko[labels[s]] = ko.get(labels[s], 0) + 1
        ki[labels[d]] = ki.get(labels[d], 0) + 1
        if labels[s] == labels[d]:
            ec[labels[s]] = ec.get(labels[s], 0) + 1
    ec_tot = sum(ec.values())
    koki = sum(ko.get(c, 0) * ki.get(c, 0) for c in set(ko) | set(ki))
    return float(ec_tot) / m - gamma * float(koki) / m / m


def test_modularity_two_cliques(spark, two_cliques):
    labels = spark.createDataFrame(
        pd.DataFrame({"id": range(6), "label": [0, 0, 0, 1, 1, 1]}))
    row = modularity(two_cliques, labels).collect()[0]
    want = _modularity_mirror(two_cliques._edge_list,
                              {i: i // 3 for i in range(6)})
    assert row["n_communities"] == 2
    assert row["m"] == 13
    assert abs(row["modularity"] - want) < 1e-12
    assert row["modularity"] > 0.4  # cliques are real communities

    # degenerate all-in-one partition: Q = e/m - 1 * (m*m)/m^2 = 0
    one = spark.createDataFrame(
        pd.DataFrame({"id": range(6), "label": [7] * 6}))
    assert abs(modularity(two_cliques, one).collect()[0]["modularity"]) < 1e-12


def test_modularity_random_matches_mirror(spark):
    n = 80
    edges_pdf = datagen.synth_edges(n, seed=13)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"), add_self_loops=False)
    try:
        edges = sorted(set(map(tuple, edges_pdf.itertuples(index=False))))
        edges = [(s, d) for s, d in edges if s != d]
        labels = {i: i % 5 for i in range(n)}
        lab_df = spark.createDataFrame(
            pd.DataFrame({"id": list(range(n)),
                          "label": [labels[i] for i in range(n)]}))
        got = modularity(g, lab_df, gamma=1.3).collect()[0]["modularity"]
        want = _modularity_mirror(edges, labels, gamma=1.3)
        assert abs(got - want) < 1e-12
    finally:
        g.unpersist()


def test_assortativity_star_is_disassortative(spark):
    """A hub pointing at leaves that point back: high-degree endpoints
    always pair with degree-1 endpoints -> r = -1 on the 2-point degree
    pattern... verified against the NumPy corrcoef mirror instead of a
    closed form."""
    n = 8
    edges = [(0, i) for i in range(1, n)] + [(i, 0) for i in range(1, n)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(n).select("id"),
                    add_self_loops=False)
    try:
        outd = {}
        ind = {}
        for s, d in edges:
            outd[s] = outd.get(s, 0) + 1
            ind[d] = ind.get(d, 0) + 1
        xs = np.array([outd[s] for s, _ in edges], dtype=float)
        ys = np.array([ind[d] for _, d in edges], dtype=float)
        want = float(np.corrcoef(xs, ys)[0, 1])
        got = degree_assortativity(g, mode="out-in").collect()[0]
        assert got["m"] == len(edges)
        assert abs(got["assortativity"] - want) < 1e-9
        assert got["assortativity"] < -0.9  # star: strongly disassortative
    finally:
        g.unpersist()


def test_assortativity_modes_and_validation(spark):
    n = 50
    edges_pdf = datagen.synth_edges(n, seed=21)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"), add_self_loops=False)
    try:
        edges = sorted(set(map(tuple, edges_pdf.itertuples(index=False))))
        outd, ind = {}, {}
        for s, d in edges:
            outd[s] = outd.get(s, 0) + 1
            ind[d] = ind.get(d, 0) + 1
        for mode in ("out-in", "in-out", "out-out", "in-in"):
            sk, dk = mode.split("-")
            xs = np.array([(outd if sk == "out" else ind).get(s, 0)
                           for s, _ in edges], dtype=float)
            ys = np.array([(ind if dk == "in" else outd).get(d, 0)
                           for _, d in edges], dtype=float)
            want = float(np.corrcoef(xs, ys)[0, 1])
            got = degree_assortativity(g, mode=mode).collect()[0][
                "assortativity"]
            assert abs(got - want) < 1e-9, mode
        with pytest.raises(ValueError, match="mode"):
            degree_assortativity(g, mode="sideways")
    finally:
        g.unpersist()


def test_reciprocity_known_fixture(spark, two_cliques):
    """Both 3-cliques are fully reciprocated (12 edges); the bridge
    (2,3) is not: r = 12/13."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
        reciprocity,
    )

    row = reciprocity(two_cliques).collect()[0]
    assert row["m"] == 13
    assert abs(row["reciprocity"] - 12.0 / 13.0) < 1e-12


def test_clustering_coefficient_clique_and_mirror(spark, two_cliques):
    """Undirected view: two triangles; vertices 2 and 3 gain the bridge
    degree. Checked against a brute-force mirror."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
        clustering_coefficient,
    )

    und = set()
    for s, d in two_cliques._edge_list:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tris = [t for t in
            (tuple(sorted(c)) for c in
             __import__("itertools").combinations(range(6), 3))
            if all((min(a, b), max(a, b)) in und
                   for a, b in __import__("itertools").combinations(t, 2))]
    tri_v = {v: sum(v in t for t in tris) for v in range(6)}
    triads = sum(d * (d - 1) / 2.0 for d in deg.values())
    want_global = 3.0 * len(tris) / triads
    ccs = [tri_v[v] / (deg[v] * (deg[v] - 1) / 2.0)
           for v in range(6) if deg.get(v, 0) >= 2]
    want_avg = sum(ccs) / len(ccs)
    row = clustering_coefficient(two_cliques).collect()[0]
    assert row["n_triangles"] == len(tris) == 2
    assert abs(row["global_cc"] - want_global) < 1e-12
    assert abs(row["avg_cc"] - want_avg) < 1e-12


def test_cocitation_jaccard_mirror_and_cap(spark):
    """Co-citation Jaccard vs brute force, both directions, and the
    max_fan cap excluding boilerplate citers from pairs AND degrees."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.cocitation import (
        cocitation_similarity,
    )

    n = 40
    edges_pdf = datagen.synth_edges(n, seed=29)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"), add_self_loops=False)
    try:
        edges = sorted(set(map(tuple, edges_pdf.itertuples(index=False))))
        edges = [(s, d) for s, d in edges if s != d]

        def mirror(es, min_shared):
            inn = {}
            for s, d in es:
                inn.setdefault(d, set()).add(s)
            out = {}
            vs = sorted(inn)
            for i, a in enumerate(vs):
                for b in vs[i + 1:]:
                    sh = len(inn[a] & inn[b])
                    if sh >= min_shared:
                        out[(a, b)] = (sh, sh / len(inn[a] | inn[b]))
            return out

        got = cocitation_similarity(g, min_shared=2).toPandas()
        got_map = {(r.a, r.b): (r.shared, r.jaccard)
                   for r in got.itertuples(index=False)}
        want = mirror(edges, 2)
        assert set(got_map) == set(want)
        for k in want:
            assert got_map[k][0] == want[k][0]
            assert abs(got_map[k][1] - want[k][1]) < 1e-12

        # bibliographic coupling = co-citation on the reversed graph
        got_out = cocitation_similarity(g, min_shared=2,
                                        direction="out").toPandas()
        want_out = mirror([(d, s) for s, d in edges], 2)
        assert {(r.a, r.b) for r in got_out.itertuples(index=False)} \
            == set(want_out)

        # fan cap: recompute the mirror on the capped edge set
        outdeg = {}
        for s, _ in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        capped_edges = [(s, d) for s, d in edges if outdeg[s] <= 5]
        got_cap = cocitation_similarity(g, min_shared=1,
                                        max_fan=5).toPandas()
        want_cap = mirror(capped_edges, 1)
        got_cap_map = {(r.a, r.b): (r.shared, r.jaccard)
                       for r in got_cap.itertuples(index=False)}
        assert set(got_cap_map) == set(want_cap)
        for k in want_cap:
            assert abs(got_cap_map[k][1] - want_cap[k][1]) < 1e-12
        with pytest.raises(ValueError, match="min_shared"):
            cocitation_similarity(g, min_shared=0)
    finally:
        g.unpersist()


def test_community_conductance_matches_mirror(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import (
        community_conductance,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.louvain import louvain

    n = 120
    pdf = datagen.synth_edges(n, seed=37)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    verts = spark.createDataFrame(pd.DataFrame({"id": range(n)}).astype("int64"))
    g = build_graph(df, vertices=verts)
    res = louvain(g, max_passes=2, max_sweeps=6)
    got = (
        community_conductance(g, res.labels, label_col="community")
        .toPandas().sort_values("community").reset_index(drop=True)
    )

    lab = res.labels.toPandas().set_index("id")["community"].to_dict()
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    vol, cut = {}, {}
    for c in set(lab.values()):
        vol[c] = 0
        cut[c] = 0
    for a, b in und:
        vol[lab[a]] += 1
        vol[lab[b]] += 1
        if lab[a] != lab[b]:
            cut[lab[a]] += 1
            cut[lab[b]] += 1
    two_m = 2 * len(und)
    for _, row in got.iterrows():
        c = row["community"]
        assert row["volume"] == vol[c]
        assert row["cut"] == cut[c]
        denom = min(vol[c], two_m - vol[c])
        want = cut[c] / denom if denom > 0 else 0.0
        assert abs(row["conductance"] - want) < 1e-15
    assert set(got["community"]) == set(lab.values())
    # real communities exist: some multi-member community keeps most of
    # its edge mass inside (leftover singletons sit at exactly 1.0)
    assert (got["conductance"] < 0.75).any()
    assert got["conductance"].between(0.0, 1.0).all()
    g.unpersist()
