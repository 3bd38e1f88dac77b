"""Greedy Luby-peeling coloring vs an exact Python mirror of the same
deterministic recurrence, plus the proper-coloring and
greedy-irredundancy invariants."""

import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.coloring import greedy_coloring

_A, _B, _M = 1103515245, 12345, 2147483647


def _mirror(n, edges, max_colors=None, luby_rounds=None):
    und = {}
    for a, b in set((int(a), int(b)) for a, b in edges):
        if a != b:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
    av = set(range(n))
    color = {}
    c = 0
    while av and (max_colors is None or c < max_colors):
        undecided = set(av)
        peeled = set()
        r = 0
        while luby_rounds is None or r < luby_rounds:
            r += 1
            if not undecided:
                break
            key = {v: ((v * _A + r * _B) % _M, v) for v in undecided}
            winners = {
                v for v in undecided
                if all(key[v] < key[u]
                       for u in und.get(v, ()) if u in undecided)
            }
            if not winners:
                break
            losers = {
                u for v in winners for u in und.get(v, ())
                if u in undecided and u not in winners
            }
            peeled |= winners
            undecided -= winners | losers
        if not peeled:
            break
        for v in peeled:
            color[v] = c
        av -= peeled
        c += 1
    for v in av:
        color[v] = -1
    return color


@pytest.fixture(scope="module")
def small(spark):
    n = 120
    pdf = datagen.synth_edges(n, seed=9)
    g = build_graph(spark.createDataFrame(pdf, schema=datagen.EDGES_SCHEMA),
                    vertices=spark.range(n).select("id"),
                    add_self_loops=False)
    g._n = n
    g._edge_list = [(int(r.src), int(r.dst))
                    for r in pdf.itertuples(index=False)]
    yield g
    g.unpersist()


def test_coloring_fixpoint_matches_mirror_and_is_proper(spark, small):
    got = {r["id"]: r["color"] for r in greedy_coloring(small).collect()}
    want = _mirror(small._n, small._edge_list)
    assert got == want
    # proper: no monochrome edge
    for a, b in small._edge_list:
        if a != b:
            assert got[a] != got[b]
    # everything colored at the fixpoint
    assert all(c >= 0 for c in got.values())
    # greedy-irredundant: a vertex of color c has a neighbor of every
    # smaller color (it lost every earlier peel to one)
    und = {}
    for a, b in set(small._edge_list):
        if a != b:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
    for v, c in got.items():
        ncols = {got[u] for u in und.get(v, ())}
        for lower in range(c):
            assert lower in ncols


def test_coloring_bounded_prefix_matches_mirror(spark, small):
    got = {r["id"]: r["color"]
           for r in greedy_coloring(small, max_colors=2,
                                    luby_rounds=2).collect()}
    want = _mirror(small._n, small._edge_list, max_colors=2, luby_rounds=2)
    assert got == want
    assert -1 in got.values()  # the bounded prefix leaves some uncolored


def test_coloring_tiny_planted(spark):
    # path 0-1-2 plus isolated 3: peel 1 takes the local minima
    pdf = pd.DataFrame([(0, 1), (1, 2)], columns=["src", "dst"])
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(4).select("id"),
                    add_self_loops=False)
    got = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert got == _mirror(4, [(0, 1), (1, 2)])
    assert got[3] == 0          # isolated vertex wins round 1 unopposed
    assert got[0] != got[1] and got[1] != got[2]
    g.unpersist()
