"""Weighted SSSP (plans/sssp.py): Dijkstra mirror at the fixpoint,
fixed-round Bellman-Ford invariant, multi-source, default weights."""

import heapq

import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.sssp import (
    derived_edge_weights,
    sssp,
)


@pytest.fixture(scope="module")
def wgraph(spark):
    n = 60
    edges_pdf = datagen.synth_edges(n, seed=23)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    # the deterministic derived weights the driver oracle also recomputes
    pairs = {(int(s), int(d)) for s, d in edges_pdf.values if s != d}
    g._wadj = {}
    for s, d in pairs:
        g._wadj.setdefault(s, []).append((d, float(1 + (s * 7 + d * 3) % 5)))
    yield g
    g.unpersist()


def _dijkstra(wadj, src):
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in wadj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _bf_rounds(wadj, src, t):
    """Exact min over paths of <= t edges (synchronous Bellman-Ford)."""
    dist = {src: 0.0}
    for _ in range(t):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in wadj.get(u, []):
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt
    return dist


def test_sssp_fixpoint_matches_dijkstra(wgraph, spark):
    src = 0
    got = {r.id: r.dist for r in sssp(
        wgraph, spark.createDataFrame([(src,)], "id long"),
        weight=derived_edge_weights(wgraph)).collect()}
    want = _dijkstra(wgraph._wadj, src)
    assert got == pytest.approx(want)
    assert set(got) == set(want)


def test_sssp_fixed_rounds_is_bounded_hop_minimum(wgraph, spark):
    src = 3
    for t in (1, 2, 3):
        got = {r.id: r.dist for r in sssp(
            wgraph, spark.createDataFrame([(src,)], "id long"),
            weight=derived_edge_weights(wgraph), max_rounds=t).collect()}
        assert got == pytest.approx(_bf_rounds(wgraph._wadj, src, t))


def test_sssp_multi_source_long_format(wgraph, spark):
    srcs = [0, 7, 11]
    rows = sssp(wgraph, spark.createDataFrame([(s,) for s in srcs], "id long"),
                weight=derived_edge_weights(wgraph)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.id] = r.dist
    assert set(by_src) == set(srcs)
    for s in srcs:
        assert by_src[s] == pytest.approx(_dijkstra(wgraph._wadj, s))


def test_sssp_default_weight_is_hop_count(wgraph, spark):
    got = {r.id: r.dist for r in sssp(
        wgraph, spark.createDataFrame([(0,)], "id long")).collect()}
    hop = _dijkstra({u: [(v, 1.0) for v, _ in nbrs]
                     for u, nbrs in wgraph._wadj.items()}, 0)
    assert got == pytest.approx(hop)
