"""Louvain community detection (plans/louvain.py): exact label match vs
the NumPy mirror (parity-gated synchronous sweeps + contraction are a pure
function of the graph, independent of partitioning), modularity history
agreement, partition sanity, and a planted two-clique smoke check."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.operators.metrics import modularity
from pagerank_barrierfree_openmp_dynamic_spark.plans.louvain import louvain

from oracle import louvain_oracle


def _graph(spark, edges, n):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    verts = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype="int64")}))
    return build_graph(df, vertices=verts)


def _labels_of(res):
    pdf = res.labels.toPandas().sort_values("id")
    return pdf["community"].to_numpy()


def test_louvain_matches_oracle_tiny(spark):
    edges = datagen.tiny_edges()
    n = 10
    g = _graph(spark, edges, n)
    res = louvain(g, max_passes=3, max_sweeps=10)
    got = _labels_of(res)
    want, hist = louvain_oracle(n, edges, max_passes=3, max_sweeps=10)
    assert got.tolist() == want.tolist()
    assert len(res.history) == len(hist)
    for a, b in zip(res.history, hist):
        assert abs(a - b) < 1e-12
    g.unpersist()


@pytest.mark.parametrize("seed,n", [(37, 120), (91, 200)])
def test_louvain_matches_oracle_synth(spark, seed, n):
    pdf = datagen.synth_edges(n, seed=seed)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    g = _graph(spark, edges, n)
    res = louvain(g, max_passes=3, max_sweeps=8)
    got = _labels_of(res)
    want, hist = louvain_oracle(n, edges, max_passes=3, max_sweeps=8)
    assert got.tolist() == want.tolist()
    for a, b in zip(res.history, hist):
        assert abs(a - b) < 1e-12
    # community ids are always drawn from original vertex ids (stable,
    # partition-independent identities; the representative vertex itself
    # may move away in a later pass, so no stronger invariant holds)
    assert all(0 <= c < n for c in got)
    g.unpersist()


def test_louvain_two_cliques(spark):
    # two 6-cliques joined by one bridge edge: Louvain must find exactly
    # the two cliques, and modularity must be near the ideal ~0.5
    edges = []
    for base in (0, 6):
        for a in range(base, base + 6):
            for b in range(base, base + 6):
                if a != b:
                    edges.append((a, b))
    edges.append((0, 6))
    g = _graph(spark, edges, 12)
    res = louvain(g, max_passes=3, max_sweeps=10)
    got = _labels_of(res)
    assert len(set(got[:6])) == 1 and len(set(got[6:])) == 1
    assert got[0] != got[6]
    assert res.modularity > 0.40
    want, _ = louvain_oracle(12, edges, max_passes=3, max_sweeps=10)
    assert got.tolist() == want.tolist()
    g.unpersist()


def test_louvain_modularity_non_decreasing(spark):
    pdf = datagen.synth_edges(150, seed=11)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    g = _graph(spark, edges, 150)
    res = louvain(g, max_passes=4, max_sweeps=8)
    # each pass's local moves only apply strictly-improving or
    # neutral-coalescing moves, so per-pass modularity never drops
    for a, b in zip(res.history, res.history[1:]):
        assert b >= a - 1e-12
    # the final partition scores positively under the repo's independent
    # modularity metric too (directed variant, same graph)
    q = modularity(
        g, res.labels.withColumnRenamed("community", "label")
    ).collect()[0]["modularity"]
    assert q > 0.0
    g.unpersist()


def test_louvain_empty_and_isolated(spark):
    # edgeless graph: everyone stays their own community, Q = 0
    df = spark.createDataFrame(
        pd.DataFrame({"src": pd.Series([], dtype="int64"),
                      "dst": pd.Series([], dtype="int64")}),
        schema="src long, dst long")
    verts = spark.createDataFrame(pd.DataFrame({"id": [0, 1, 2]}))
    g = build_graph(df, vertices=verts)
    res = louvain(g)
    got = _labels_of(res)
    assert got.tolist() == [0, 1, 2]
    assert res.modularity == 0.0
    g.unpersist()


def test_louvain_weighted_host_graph(spark):
    # weighted Louvain on a contracted (host-style) graph: undirected
    # weight = sum of directed link counts; exact match vs the weighted
    # NumPy mirror
    from pyspark.sql import functions as F

    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        contract_edges,
    )

    n = 300
    pdf = datagen.synth_edges(n, seed=23)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": pdf["src"], "dst": pdf["dst"]}).astype("int64"))
    mapping = spark.range(n).select(
        F.col("id"), (F.col("id") % 40).alias("group"))
    hosts = contract_edges(edges, mapping)
    g = build_graph(hosts, weight_col="weight", add_self_loops=False)
    assert g.weighted
    res = louvain(g, max_passes=2, max_sweeps=6)
    got = res.labels.toPandas().sort_values("id")
    hp = hosts.toPandas()
    want, hist = louvain_oracle(
        40, list(zip(hp["src"].astype(int), hp["dst"].astype(int))),
        max_passes=2, max_sweeps=6, weights=hp["weight"].tolist())
    want_map = {i: c for i, c in enumerate(want)}
    for _, row in got.iterrows():
        assert want_map[int(row["id"])] == int(row["community"])
    for a, b in zip(res.history, hist):
        assert abs(a - b) < 1e-12
    # weighted run must differ from unweighted on this fixture or the
    # weights aren't reaching the objective (guard against silent w=1)
    res_u = louvain(g, max_passes=2, max_sweeps=6, use_weights=False)
    hu = res_u.history
    assert hu != res.history or (
        res_u.labels.toPandas().sort_values("id")["community"].tolist()
        != got["community"].tolist())
    g.unpersist()
