"""Distributed Borůvka minimum spanning forest vs a pure-Python Kruskal
mirror using the identical (w, u, v) total order — forests must be
SET-EQUAL (the total order makes the MSF unique even with tied weights)."""

import random

import pytest

from pagerank_barrierfree_openmp_dynamic_spark.plans.msf import (
    minimum_spanning_forest,
    msf_weight_by_component,
)


def kruskal_oracle(edges):
    """edges: iterable of (src, dst, w). Returns the unique MSF under the
    (w, u, v) total order, as a set of (u, v, w) canonical tuples."""
    best = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = (s, d) if s <= d else (d, s)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = float(w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {(r.u, r.v, r.w)
           for r in minimum_spanning_forest(df, partitions=4, **kw).collect()}
    assert got == kruskal_oracle(rows)
    return got


def test_msf_hand_graph(spark):
    # two components + a self-loop + a parallel edge + reversed duplicate
    rows = [
        (0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0),   # triangle: drop (0,2)
        (2, 0, 0.5),                              # parallel, lighter: keep
        (3, 3, 0.1),                              # self-loop: ignored
        (4, 5, 7.0),                              # separate component
    ]
    got = _run(spark, rows)
    # lightest parallel (0,2) edge + (0,1) span the triangle; (4,5) alone
    assert got == {(0, 2, 0.5), (0, 1, 1.0), (4, 5, 7.0)}


def test_msf_tied_weights_path_chain(spark):
    # weight-sorted path: round-1 merge graph is one long chain — stresses
    # the DISTRIBUTED pointer-jumping merge (driver_merge_bound=0 forces
    # the all-distributed fallback); all weights TIED stresses the (u, v)
    # tie-break
    n = 40
    rows = [(i, i + 1, 1.0) for i in range(n - 1)]
    got = _run(spark, rows, driver_merge_bound=0)
    assert len(got) == n - 1


def test_msf_random_graphs_vs_kruskal(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 50
        rows = []
        for _ in range(300):
            s, d = rng.randrange(n), rng.randrange(n)
            # integer weights -> many ties; includes self-loops/parallels
            rows.append((s, d, float(rng.randrange(5))))
        # force a disconnected extra blob
        rows += [(100 + i, 100 + i + 1, 0.5) for i in range(5)]
        _run(spark, rows)


def test_msf_component_rollup(spark):
    rows = [(0, 1, 1.0), (1, 2, 2.0), (4, 5, 7.0), (5, 6, 1.5)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    out = {r.comp: (r.n_edges, r.total_w)
           for r in msf_weight_by_component(df).collect()}
    assert out == {0: (2, 3.0), 4: (2, 8.5)}
