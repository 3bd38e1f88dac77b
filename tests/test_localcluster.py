"""PPR sweep cut (plans/localcluster.py): the delta-trick sweep table vs
a brute-force per-prefix mirror, end-to-end local_community vs a sparse
PPR mirror, and best_cut on a planted two-clique graph."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.localcluster import (
    best_cut,
    local_community,
    sweep_cut,
)


def _mirror_ppr(edges_with_loops, seed, iterations=3, d=0.85):
    """Sparse mirror of personalized_pagerank_batch for one seed."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, t in edges_with_loops:
        outdeg[s] += 1
    r = {seed: 1.0}
    for _ in range(iterations):
        g = defaultdict(float)
        for s, t in edges_with_loops:
            if s in r:
                g[t] += d * r[s] * (1.0 / outdeg[s])
        g[seed] += 1.0 - d
        r = dict(g)
    return r


def _mirror_sweep(edges, scores, k_max):
    """Brute-force per-prefix sweep: independent of the delta trick."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    two_m = 2 * len(und)
    ranked = sorted(
        ((v, s) for v, s in scores.items() if v in deg),
        key=lambda t: (-t[1] / deg[t[0]], t[0]))[:k_max]
    out = []
    S = set()
    vol = 0
    for k, (v, s) in enumerate(ranked, start=1):
        S.add(v)
        vol += deg[v]
        cut = sum(1 for a, b in und if (a in S) != (b in S))
        denom = min(vol, two_m - vol)
        cond = cut / denom if denom > 0 else None
        out.append((k, v, cut, vol, cond))
    return out


def test_local_community_matches_mirror(spark):
    n = 150
    pdf = datagen.synth_edges(n, seed=13)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    verts = spark.createDataFrame(pd.DataFrame({"id": range(n)}).astype("int64"))
    g = build_graph(df, vertices=verts)  # adds self-loops
    seed = 4
    got = local_community(g, seed, iterations=3, k_max=30) \
        .toPandas().sort_values("k").reset_index(drop=True)

    loops = sorted(set((a, b) for a, b in edges) | {(i, i) for i in range(n)})
    apr = _mirror_ppr(loops, seed, iterations=3)
    want = _mirror_sweep(edges, apr, k_max=30)
    assert len(got) == len(want)
    for row, (k, v, cut, vol, cond) in zip(got.itertuples(), want):
        assert row.k == k and row.id == v
        assert row.cut == cut and row.volume == vol
        if cond is None:
            assert pd.isna(row.conductance)
        else:
            assert abs(row.conductance - cond) < 1e-12
        assert abs(row.score - apr[v]) < 1e-12
    g.unpersist()


def test_sweep_cut_and_best_cut_two_cliques(spark):
    # two 6-cliques + one bridge; seeding PPR in clique A must sweep to
    # exactly clique A (conductance minimized at k=6: cut=1)
    edges = []
    for base in (0, 6):
        for a in range(base, base + 6):
            for b in range(base, base + 6):
                if a != b:
                    edges.append((a, b))
    edges.append((0, 6))
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    verts = spark.createDataFrame(pd.DataFrame({"id": range(12)}).astype("int64"))
    g = build_graph(df, vertices=verts)
    sweep = local_community(g, seed=2, iterations=4, k_max=12).toPandas()
    best = best_cut(local_community(g, seed=2, iterations=4, k_max=12)) \
        .collect()[0]
    assert best["k"] == 6
    assert best["cut"] == 1
    six = set(sweep.sort_values("k").head(6)["id"])
    assert six == {0, 1, 2, 3, 4, 5}
    g.unpersist()


def test_sweep_cut_excludes_isolated(spark):
    # scores on vertices with no undirected edges never enter the sweep
    edges = [(0, 1), (1, 0), (2, 2)]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    verts = spark.createDataFrame(pd.DataFrame({"id": range(4)}).astype("int64"))
    g = build_graph(df, vertices=verts)
    scores = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2, 3],
                      "rank": [1.0, 0.5, 9.0, 9.0]}))
    out = sweep_cut(g, scores, k_max=10).toPandas()
    assert set(out["id"]) == {0, 1}
    srt = out.sort_values("k")["conductance"]
    assert srt.iloc[0] == 1.0 and pd.isna(srt.iloc[1])
    g.unpersist()
