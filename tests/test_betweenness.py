"""Betweenness (plans/betweenness.py): sampled Brandes vs the NumPy
oracle (all-sources and subsets, with and without horizon), and the
exact 2-hop variant vs brute force."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.betweenness import (
    betweenness_sampled,
    two_hop_betweenness,
)
from oracle import brandes_oracle


@pytest.fixture(scope="module")
def bt_graph(spark):
    n = 50
    edges_pdf = datagen.synth_edges(n, seed=31)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


def _dense(df, n):
    out = np.zeros(n)
    for r in df.itertuples(index=False):
        out[r.id] = r.score
    return out


def test_brandes_path_graph_closed_form(spark):
    """On the path 0->1->...->5 betweenness(v) = v*(5-v) (ordered pairs
    through v) — the textbook check."""
    g = build_graph(
        spark.createDataFrame(pd.DataFrame(
            {"src": list(range(5)), "dst": list(range(1, 6))})),
        vertices=spark.range(6).select("id"), add_self_loops=False)
    try:
        got = _dense(betweenness_sampled(g, g.vertices).toPandas(), 6)
        want = np.array([v * (5 - v) for v in range(6)], dtype=float)
        assert np.allclose(got, want, atol=1e-9)
    finally:
        g.unpersist()


def test_brandes_all_sources_matches_oracle(spark, bt_graph):
    edges = list(bt_graph._edges_pdf.itertuples(index=False))
    got = _dense(betweenness_sampled(bt_graph, bt_graph.vertices)
                 .toPandas(), 50)
    want = brandes_oracle(50, edges)
    assert np.allclose(got, want, atol=1e-8)


def test_brandes_sampled_and_horizon(spark, bt_graph):
    edges = list(bt_graph._edges_pdf.itertuples(index=False))
    srcs = [3, 11, 29]
    sd = spark.createDataFrame(pd.DataFrame({"id": srcs}))
    got = _dense(betweenness_sampled(bt_graph, sd).toPandas(), 50)
    want = brandes_oracle(50, edges, sources=srcs)
    assert np.allclose(got, want, atol=1e-8)
    got_h = _dense(betweenness_sampled(bt_graph, sd, max_depth=2)
                   .toPandas(), 50)
    want_h = brandes_oracle(50, edges, sources=srcs, max_depth=2)
    assert np.allclose(got_h, want_h, atol=1e-8)


def test_two_hop_betweenness_mirror(spark, bt_graph):
    edges = sorted(set(map(tuple, bt_graph._edges_pdf.itertuples(
        index=False))))
    edges = [(s, d) for s, d in edges if s != d]
    eset = set(edges)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want = {}
    for s in adj:
        for t in range(50):
            if t == s or (s, t) in eset:
                continue
            mids = [v for v in adj[s] if (v, t) in eset and v != s and v != t]
            for v in mids:
                want[v] = want.get(v, 0.0) + 1.0 / len(mids)
    got = two_hop_betweenness(bt_graph).toPandas()
    got_map = {r.id: r.score for r in got.itertuples(index=False)}
    assert set(got_map) == set(want)
    for v in want:
        assert abs(got_map[v] - want[v]) < 1e-9
