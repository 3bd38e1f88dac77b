"""Luby MIS (plans/mis.py): fixpoint validity (independent + maximal),
deterministic fixed-round prefix vs a Python mirror, path-graph check."""

import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.mis import luby_mis

_A, _B, _M = 1103515245, 12345, 2147483647


def _mirror(n, und_adj, rounds):
    undecided = set(range(n))
    state = {}
    r = 0
    while rounds is None or r < rounds:
        r += 1
        if not undecided:
            break
        pri = {v: (v * _A + r * _B) % _M for v in undecided}
        winners = set()
        for v in undecided:
            nb = [u for u in und_adj.get(v, ()) if u in undecided]
            if all((pri[v], v) < (pri[u], u) for u in nb):
                winners.add(v)
        if not winners:
            break
        losers = set()
        for w in winners:
            for u in und_adj.get(w, ()):
                if u in undecided and u not in winners:
                    losers.add(u)
        for w in winners:
            state[w] = "in"
        for l in losers:
            state[l] = "out"
        undecided -= winners | losers
    for v in undecided:
        state[v] = "undecided"
    return state


def _und_adj(edges):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    return adj


@pytest.fixture(scope="module")
def mis_graph(spark):
    n = 60
    edges_pdf = datagen.synth_edges(n, seed=37)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"), add_self_loops=False)
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


def test_mis_fixed_rounds_match_mirror(spark, mis_graph):
    edges = list(map(tuple, mis_graph._edges_pdf.itertuples(index=False)))
    got = {r.id: r.state for r in
           luby_mis(mis_graph, rounds=2).toPandas().itertuples(index=False)}
    assert got == _mirror(60, _und_adj(edges), 2)


def test_mis_fixpoint_is_maximal_independent(spark, mis_graph):
    edges = list(map(tuple, mis_graph._edges_pdf.itertuples(index=False)))
    adj = _und_adj(edges)
    got = {r.id: r.state for r in
           luby_mis(mis_graph).toPandas().itertuples(index=False)}
    assert set(got) == set(range(60))
    assert "undecided" not in got.values()
    ins = {v for v, s in got.items() if s == "in"}
    # independence
    for v in ins:
        assert not (adj.get(v, set()) & ins)
    # maximality: every 'out' vertex has an 'in' neighbor
    for v, s in got.items():
        if s == "out":
            assert adj.get(v, set()) & ins
    # matches the mirror run to ITS fixpoint
    assert got == _mirror(60, adj, None)


def test_mis_path_graph(spark):
    g = build_graph(
        spark.createDataFrame(pd.DataFrame(
            {"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})),
        vertices=spark.range(5).select("id"), add_self_loops=False)
    try:
        got = {r.id: r.state for r in
               luby_mis(g).toPandas().itertuples(index=False)}
        assert got == _mirror(5, _und_adj([(0, 1), (1, 2), (2, 3), (3, 4)]),
                              None)
    finally:
        g.unpersist()
