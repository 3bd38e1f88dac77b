"""TrustRank / spam mass (``plans/trustrank.py``): seeded-teleport ranks
vs the personalized NumPy oracle, inverse-PageRank seed selection vs the
oracle on the reversed edge list, and the spam-mass signal on a planted
spam farm."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions
from pagerank_barrierfree_openmp_dynamic_spark.plans.trustrank import (
    inverse_pagerank,
    select_seeds,
    spam_mass,
    trustrank,
)
from oracle import pagerank_general_oracle


@pytest.fixture(scope="module")
def small(spark):
    n = 120
    edges_pdf = datagen.synth_edges(n, seed=23)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    raw = list(zip(edges_pdf["src"], edges_pdf["dst"]))
    yield g, raw, n
    g.unpersist()


def _ranks(df, n, col="rank"):
    pdf = df.toPandas().sort_values("id")
    assert list(pdf["id"]) == list(range(n))
    return pdf[col].to_numpy()


def test_trustrank_matches_personalized_oracle(small):
    g, raw, n = small
    seeds = [i for i in range(n) if i % 30 == 0]
    p = np.zeros(n)
    p[seeds] = 1.0
    golden, _ = pagerank_general_oracle(n, raw, tol=0.0, max_iter=7,
                                        personalization=p)
    res = trustrank(
        g,
        g.vertices.filter((g.vertices.id % 30) == 0),
        PageRankOptions(tolerance=0.0, max_iterations=7,
                        metrics_level="none"),
    )
    got = _ranks(res.ranks, n)
    assert np.max(np.abs(got - golden)) < 1e-12


def test_inverse_pagerank_is_pagerank_on_reverse(small):
    g, raw, n = small
    rev = [(b, a) for a, b in raw]
    golden, _ = pagerank_general_oracle(n, rev, tol=0.0, max_iter=5)
    got = _ranks(
        inverse_pagerank(g, PageRankOptions(tolerance=0.0, max_iterations=5,
                                            metrics_level="none")),
        n,
    )
    assert np.max(np.abs(got - golden)) < 1e-12
    top = select_seeds(g, 5, PageRankOptions(tolerance=0.0, max_iterations=5,
                                             metrics_level="none"))
    order = np.lexsort((np.arange(n), -golden))[:5]
    assert sorted(r["id"] for r in top.collect()) == sorted(order.tolist())


def test_spam_mass_flags_spam_farm(spark):
    # trusted core: 0-9 densely interlinked; spam farm: 20-49 all boosting
    # page 19, which never receives a trusted link
    edges = [(i, j) for i in range(10) for j in range(10) if i != j]
    edges += [(i, 19) for i in range(20, 50)]
    edges += [(19, i) for i in range(20, 50)]
    g = build_graph(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=spark.range(50).select("id"),
    )
    try:
        sm = spam_mass(
            g,
            g.vertices.filter(g.vertices.id < 10),
            PageRankOptions(tolerance=1e-10, metrics_level="none"),
        ).toPandas().set_index("id")
        # the farm target's rank is almost entirely untrusted mass
        assert sm.loc[19, "spam_mass"] > 0.9
        # trusted pages keep most of their rank as trust
        assert (sm.loc[range(10), "spam_mass"] < 0.5).all()
        assert {"rank", "trust", "spam_mass"} <= set(sm.columns)
    finally:
        g.unpersist()
