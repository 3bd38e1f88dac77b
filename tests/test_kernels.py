"""Connected components / label propagation / triangle counting vs exact
oracles (north rule: exact match). These kernels have no reference
counterpart (SURVEY.md §7 step 6) — semantics are the standard ones, pinned
by the brute-force oracles in tests/oracle.py."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.components import connected_components
from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import label_propagation
from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (
    triangle_count,
    triangles_per_vertex,
)

from oracle import cc_oracle, lpa_oracle, triangle_oracle


@pytest.fixture(scope="module")
def tiny_graph(spark):
    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    yield g
    g.unpersist()


@pytest.fixture(scope="module")
def small_graph(spark):
    n = 300
    edges_pdf = datagen.synth_edges(n, seed=5)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    g._edges_pdf = edges_pdf  # stash for oracle
    yield g
    g.unpersist()


def _col(df, n, key, val):
    pdf = df.toPandas().sort_values(key)
    assert list(pdf[key]) == list(range(n))
    return pdf[val].to_numpy()


def test_cc_tiny_exact(spark, tiny_graph):
    got = _col(connected_components(tiny_graph), 10, "id", "comp")
    want = cc_oracle(10, datagen.tiny_edges())
    assert (got == want).all()
    # planted structure: vertex 9 is isolated -> its own component
    assert got[9] == 9


def test_cc_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(connected_components(small_graph), 300, "id", "comp")
    want = cc_oracle(300, edges)
    assert (got == want).all()
    assert len(set(want)) >= 2  # planted disconnected block exists


def test_cc_arrow_exact(spark, tiny_graph, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (
        connected_components_arrow,
    )

    got = _col(connected_components_arrow(tiny_graph), 10, "id", "comp")
    assert (got == cc_oracle(10, datagen.tiny_edges())).all()
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(connected_components_arrow(small_graph), 300, "id", "comp")
    assert (got == cc_oracle(300, edges)).all()


def test_lpa_arrow_exact(spark, tiny_graph, small_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import (
        label_propagation_arrow,
    )

    got = _col(label_propagation_arrow(tiny_graph, iterations=4), 10, "id", "label")
    assert (got == lpa_oracle(10, datagen.tiny_edges(), iterations=4)).all()
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(label_propagation_arrow(small_graph, iterations=3), 300, "id", "label")
    assert (got == lpa_oracle(300, edges, iterations=3)).all()


def test_lpa_tiny_exact(spark, tiny_graph):
    got = _col(label_propagation(tiny_graph, iterations=4), 10, "id", "label")
    want = lpa_oracle(10, datagen.tiny_edges(), iterations=4)
    assert (got == want).all()


def test_lpa_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    got = _col(label_propagation(small_graph, iterations=3), 300, "id", "label")
    want = lpa_oracle(300, edges, iterations=3)
    assert (got == want).all()


def test_triangles_tiny_exact(spark, tiny_graph):
    total, per = triangle_oracle(10, datagen.tiny_edges())
    assert triangle_count(tiny_graph) == total
    got = _col(triangles_per_vertex(tiny_graph), 10, "id", "tri_count")
    assert (got == per).all()


def test_triangles_small_exact(spark, small_graph):
    edges = list(small_graph._edges_pdf.itertuples(index=False))
    total, per = triangle_oracle(300, edges)
    assert total > 0  # planted 3-cliques exist
    assert triangle_count(small_graph) == total
    got = _col(triangles_per_vertex(small_graph), 300, "id", "tri_count")
    assert (got == per).all()


def test_four_cycle_count_matches_brute(spark):
    """Diagonal-pair rectangle count vs brute-force common-neighbor pairs."""
    import numpy as np

    from pagerank_barrierfree_openmp_dynamic_spark import datagen
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (
        four_cycle_count,
    )

    n = 60
    epdf = datagen.synth_edges(n, seed=23)
    g = build_graph(
        spark.createDataFrame(epdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    got = four_cycle_count(g).collect()[0].n_four_cycles

    pairs = {(min(s, d), max(s, d))
             for s, d in epdf[["src", "dst"]].itertuples(index=False)
             if s != d}
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    ids = sorted(adj)
    total = 0
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            c = len(adj[u] & adj[v])
            total += c * (c - 1) // 2
    assert got == total // 2
    g.unpersist()
