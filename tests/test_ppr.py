"""Batched personalized PageRank (plans/ppr.py): NumPy mirror, sparsity,
mass conservation on self-loop graphs, related-pages top-k."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.ppr import (
    personalized_pagerank_batch,
    related_pages,
)


@pytest.fixture(scope="module")
def ppr_graph(spark):
    n = 70
    edges_pdf = datagen.synth_edges(n, seed=23)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=True,
    )
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


def _ppr_mirror(n, edges, seeds, iterations, d=0.85):
    es = sorted(set((int(a), int(b)) for a, b in edges) |
                {(i, i) for i in range(n)})
    src = np.array([a for a, _ in es])
    dst = np.array([b for _, b in es])
    outdeg = np.bincount(src, minlength=n).astype(float)
    w = 1.0 / outdeg[src]
    out = {}
    for s in seeds:
        r = np.zeros(n)
        r[s] = 1.0
        for _ in range(iterations):
            nr = np.zeros(n)
            np.add.at(nr, dst, d * r[src] * w)
            nr[s] += 1.0 - d
            r = nr
        out[s] = r
    return out


def test_ppr_batch_matches_mirror(spark, ppr_graph):
    edges = list(ppr_graph._edges_pdf.itertuples(index=False))
    seeds = [0, 7, 33]
    sd = spark.createDataFrame(pd.DataFrame({"id": seeds}))
    got = personalized_pagerank_batch(ppr_graph, sd, iterations=3).toPandas()
    want = _ppr_mirror(70, edges, seeds, 3)
    # sparse: absent rows are exact zeros in the mirror
    for s in seeds:
        rows = got[got.seed == s].set_index("id")["rank"]
        dense = np.zeros(70)
        dense[rows.index.to_numpy()] = rows.to_numpy()
        assert np.allclose(dense, want[s], atol=1e-12)
        absent = np.setdiff1d(np.arange(70), rows.index.to_numpy())
        assert np.all(want[s][absent] == 0.0)
        # self-loop graph: no dead ends -> per-seed mass conserved exactly
        assert abs(rows.sum() - 1.0) < 1e-12


def test_related_pages_topk(spark, ppr_graph):
    sd = spark.createDataFrame(pd.DataFrame({"id": [0, 7]}))
    top = related_pages(ppr_graph, sd, k=5, iterations=3).toPandas()
    assert set(top.seed) == {0, 7}
    for s, grp in top.groupby("seed"):
        assert len(grp) <= 5
        assert s not in set(grp["id"])
        # ranked descending
        r = grp.sort_values(["rank", "id"], ascending=[False, True])
        assert list(r["rank"]) == sorted(r["rank"], reverse=True)
    with pytest.raises(ValueError, match="iterations"):
        personalized_pagerank_batch(ppr_graph, sd, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        personalized_pagerank_batch(ppr_graph, sd, damping=1.5)
