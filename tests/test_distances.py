"""Landmark distance sketches (plans/distances.py): BFS mirror, direction
semantics, horizon truncation, deterministic pivot choice."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.distances import (
    landmark_distances,
    top_degree_landmarks,
)


@pytest.fixture(scope="module")
def dist_graph(spark):
    n = 80
    edges_pdf = datagen.synth_edges(n, seed=17)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


def _bfs(n, edges, sources, max_t, reverse=False):
    adj = {}
    for s, d in set(map(tuple, edges)):
        if s == d:
            continue
        if reverse:
            s, d = d, s
        adj.setdefault(s, []).append(d)
    out = {}
    for l in sources:
        dist = {l: 0}
        frontier = [l]
        t = 0
        while frontier and t < max_t:
            t += 1
            nxt = []
            for x in frontier:
                for y in adj.get(x, []):
                    if y not in dist:
                        dist[y] = t
                        nxt.append(y)
            frontier = nxt
        for v, d in dist.items():
            out[(v, l)] = d
    return out


def test_landmark_distances_match_bfs(spark, dist_graph):
    edges = list(dist_graph._edges_pdf.itertuples(index=False))
    lms = [r["id"] for r in top_degree_landmarks(dist_graph, 3).collect()]
    assert len(lms) == 3
    got = landmark_distances(dist_graph, 3, max_t=4).toPandas()
    got_map = {(r.id, r.landmark): r.dist
               for r in got.itertuples(index=False)}
    assert got_map == _bfs(80, edges, lms, 4)


def test_landmark_distances_backward(spark, dist_graph):
    edges = list(dist_graph._edges_pdf.itertuples(index=False))
    lm_df = spark.createDataFrame(pd.DataFrame({"id": [0, 1]}))
    got = landmark_distances(dist_graph, lm_df, max_t=3,
                             direction="backward").toPandas()
    got_map = {(r.id, r.landmark): r.dist
               for r in got.itertuples(index=False)}
    assert got_map == _bfs(80, edges, [0, 1], 3, reverse=True)
    with pytest.raises(ValueError, match="direction"):
        landmark_distances(dist_graph, lm_df, direction="sideways")


def test_landmark_distances_runs_to_fixpoint(spark):
    """Chain 0->1->...->7: distances from {0} reach the whole chain when
    max_t is None (frontier empties), capped at 2 otherwise."""
    g = build_graph(
        spark.createDataFrame(pd.DataFrame(
            {"src": list(range(7)), "dst": list(range(1, 8))})),
        vertices=spark.range(8).select("id"), add_self_loops=False)
    try:
        lm = spark.createDataFrame(pd.DataFrame({"id": [0]}))
        full = landmark_distances(g, lm).toPandas()
        assert {(r.id, r.dist) for r in full.itertuples(index=False)} == \
            {(i, i) for i in range(8)}
        capped = landmark_distances(g, lm, max_t=2).toPandas()
        assert sorted(capped["dist"]) == [0, 1, 2]
    finally:
        g.unpersist()


def test_top_degree_landmarks_deterministic(spark, dist_graph):
    a = [r["id"] for r in top_degree_landmarks(dist_graph, 5).collect()]
    b = [r["id"] for r in top_degree_landmarks(dist_graph, 5).collect()]
    assert a == b
    degs = (dist_graph.edges.groupBy("src").count().toPandas()
            .set_index("src")["count"])
    want = sorted(degs.index, key=lambda v: (-degs[v], v))[:5]
    assert a == want


def test_diameter_lower_bound_chain(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.distances import (
        diameter_lower_bound,
    )

    g = build_graph(
        spark.createDataFrame(pd.DataFrame(
            {"src": list(range(7)), "dst": list(range(1, 8))})),
        vertices=spark.range(8).select("id"), add_self_loops=False)
    try:
        # vertex 0 has out-degree 1 like everyone; landmarks include low
        # ids on ties -> the sweep from 0 realizes the true diameter 7
        assert diameter_lower_bound(g, k=8) == 7
        assert diameter_lower_bound(g, k=8, max_t=3) == 3
    finally:
        g.unpersist()
