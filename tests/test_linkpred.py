"""Link prediction (``plans/linkpred.py``): Adamic–Adar / resource
allocation / common neighbors vs a brute-force pure-Python oracle, plus
the max_fan cap and known-link exclusion semantics."""

import math
from collections import defaultdict

import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.linkpred import adamic_adar


def _oracle(edges, mode, min_shared=1, max_fan=None, exclude_linked=True):
    """Brute force: group citers, weight, accumulate per unordered pair."""
    e = sorted({(int(s), int(d)) for s, d in edges if s != d})
    outs = defaultdict(set)
    for s, d in e:
        outs[s].add(d)
    linked = {(min(s, d), max(s, d)) for s, d in e}
    acc = defaultdict(lambda: [0, 0.0])
    for _, ds in outs.items():
        if max_fan is not None and len(ds) > max_fan:
            continue
        fan = len(ds)
        if mode == "adamic_adar":
            w = 1.0 / math.log(fan) if fan > 1 else float("inf")
        elif mode == "resource_allocation":
            w = 1.0 / fan
        else:
            w = 1.0
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                a, b = ds[i], ds[j]
                acc[(a, b)][0] += 1
                acc[(a, b)][1] += w
    out = {}
    for (a, b), (shared, score) in acc.items():
        if shared < min_shared:
            continue
        if exclude_linked and (a, b) in linked:
            continue
        out[(a, b)] = (shared, score)
    return out


@pytest.fixture(scope="module")
def small(spark):
    n = 200
    edges_pdf = datagen.synth_edges(n, seed=11)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    raw = list(zip(edges_pdf["src"], edges_pdf["dst"]))
    yield g, raw
    g.unpersist()


@pytest.mark.parametrize("mode", ["adamic_adar", "resource_allocation",
                                  "common_neighbors"])
def test_modes_match_oracle(small, mode):
    g, raw = small
    golden = _oracle(raw, mode)
    got = {(r["a"], r["b"]): (r["shared"], r["score"])
           for r in adamic_adar(g, mode=mode).collect()}
    assert set(got) == set(golden)
    for k, (shared, score) in golden.items():
        assert got[k][0] == shared, k
        assert got[k][1] == pytest.approx(score, rel=1e-12), k


def test_max_fan_and_min_shared(small):
    g, raw = small
    golden = _oracle(raw, "adamic_adar", min_shared=2, max_fan=8)
    got = {(r["a"], r["b"]): (r["shared"], r["score"])
           for r in adamic_adar(g, min_shared=2, max_fan=8).collect()}
    assert got.keys() == golden.keys()
    for k, (shared, score) in golden.items():
        assert got[k] == (shared, pytest.approx(score, rel=1e-12))


def test_exclude_linked_toggle(spark):
    # citers 10,11 both cite the linked pair (0,1) and the unlinked (2,3)
    edges = [(10, 0), (10, 1), (11, 0), (11, 1),
             (10, 2), (10, 3), (11, 2), (11, 3), (0, 1)]
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=spark.range(12).select("id"),
        add_self_loops=False,
    )
    try:
        kept = {(r["a"], r["b"]) for r in adamic_adar(g).collect()}
        assert (0, 1) not in kept and (2, 3) in kept
        both = {(r["a"], r["b"]): r["shared"]
                for r in adamic_adar(g, exclude_linked=False).collect()}
        assert both[(0, 1)] == 2 and both[(2, 3)] == 2
    finally:
        g.unpersist()


def test_bad_args(small):
    g, _ = small
    with pytest.raises(ValueError):
        adamic_adar(g, mode="katz")
    with pytest.raises(ValueError):
        adamic_adar(g, min_shared=0)
