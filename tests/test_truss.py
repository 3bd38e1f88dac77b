"""k-truss (``plans/truss.py``) vs a brute-force set-peeling oracle:
fixed-round peel exactness, fixpoint equality, hand-checkable shapes."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.truss import (
    ktruss,
    ktruss_peel,
)


def _brute_support(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return {(u, v): len(adj[u] & adj[v]) for u, v in edges}


def _brute_peel(edges, k, rounds=None):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    r = 0
    while es and (rounds is None or r < rounds):
        sup = _brute_support(es)
        keep = {e for e in es if sup[e] >= k - 2}
        r += 1
        if keep == es:
            if rounds is None:
                break
            es = keep
            continue
        es = keep
    return es


def _got(df):
    return {(r["u"], r["v"]) for r in df.collect()}


@pytest.fixture(scope="module")
def small(spark):
    n = 80
    edges_pdf = datagen.synth_edges(n, seed=41, avg_deg=6.0)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    raw = list(zip(edges_pdf["src"], edges_pdf["dst"]))
    yield g, raw
    g.unpersist()


def test_peel_rounds_match_brute(small):
    g, raw = small
    for k, rounds in [(3, 1), (3, 2), (4, 2)]:
        assert _got(ktruss_peel(g, k, rounds)) == _brute_peel(
            raw, k, rounds=rounds), (k, rounds)


def test_fixpoint_matches_brute(small):
    g, raw = small
    for k in (3, 4):
        assert _got(ktruss(g, k)) == _brute_peel(raw, k), k


def test_clique_survives_pendant_drops(spark):
    # 5-clique (every edge in 3 triangles) + a pendant path: the 4-truss
    # is exactly the clique, the path peels away
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 5), (5, 6)]
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=spark.range(7).select("id"),
        add_self_loops=False,
    )
    try:
        got = _got(ktruss(g, 4))
        assert got == {(i, j) for i in range(5) for j in range(i + 1, 5)}
        assert _got(ktruss(g, 6)) == set()  # clique is K5 -> max truss 5
        assert _got(ktruss(g, 5)) == got
    finally:
        g.unpersist()


def test_rejects_bad_params(small):
    g, _ = small
    with pytest.raises(ValueError):
        ktruss(g, 2)
    with pytest.raises(ValueError):
        ktruss_peel(g, 3, 0)
