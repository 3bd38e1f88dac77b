"""Influence-spread estimation (plans/influence.py) vs a pure-Python
independent-cascade mirror over the same deterministic hash-sampled
subgraphs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
    _A, _B, _M,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.influence import _R
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.influence import (
    influence_estimate,
)


def _edge_live(src, dst, rep, seed, p):
    x = ((src % _M) * _A + (dst % _M) * _B) % _M
    h = (x + ((rep + seed) % _M) * _R) % _M
    return (h * h + h) % _M < int(p * _M)


def _mirror(edges, seeds, t, replicas, p, seed):
    out = {}
    for s in seeds:
        counts = []
        for rep in range(replicas):
            live = [(u, v) for u, v in edges
                    if u != v and _edge_live(u, v, rep, seed, p)]
            adj = {}
            for u, v in live:
                adj.setdefault(u, set()).add(v)
            reached, frontier = {s}, {s}
            for _ in range(t):
                nxt = set()
                for u in frontier:
                    nxt |= adj.get(u, set())
                frontier = nxt - reached
                reached |= nxt
                if not frontier:
                    break
            counts.append(len(reached))
        out[s] = (round(sum(counts) / replicas, 6), min(counts), max(counts))
    return out


def test_influence_matches_mirror(spark):
    n = 80
    edges_pdf = datagen.synth_edges(n, seed=11)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    seeds = spark.createDataFrame(pd.DataFrame({"id": [0, 7, 33, 61]}))
    got = influence_estimate(g, seeds, t=2, replicas=3, p=0.5, seed=7) \
        .toPandas().set_index("id").sort_index()
    exp = _mirror(list(map(tuple, edges_pdf[["src", "dst"]]
                           .itertuples(index=False))),
                  [0, 7, 33, 61], t=2, replicas=3, p=0.5, seed=7)
    for s, (avg, lo, hi) in exp.items():
        assert got.loc[s, "avg_reach"] == pytest.approx(avg)
        assert got.loc[s, "min_reach"] == lo
        assert got.loc[s, "max_reach"] == hi
    g.unpersist()


def test_influence_p_one_is_plain_reachability(spark):
    # p=1 keeps every edge in every replica: avg == min == max == exact
    # t-hop reachable-set size
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]}))
    g = build_graph(edges, add_self_loops=False)
    got = influence_estimate(
        g, spark.createDataFrame(pd.DataFrame({"id": [1]})),
        t=2, replicas=2, p=1.0) \
        .toPandas().iloc[0]
    assert got.avg_reach == 3.0  # {1, 2, 3}
    assert got.min_reach == got.max_reach == 3
    g.unpersist()
