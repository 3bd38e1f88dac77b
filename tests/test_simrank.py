"""Truncated SimRank (plans/simrank.py) vs a NumPy full-matrix mirror
of the Jeh-Widom recurrence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.simrank import simrank_2iter


def _full_simrank(edges, n, c, iters):
    """Exact dense SimRank: S0 = I; S_{k+1}(a,b) =
    c/(d(a)d(b)) * sum_{u in I(a), v in I(b)} S_k(u,v), diagonal 1."""
    col = np.zeros((n, n))  # col[u, a] = 1 iff edge u -> a
    for u, v in edges:
        col[u, v] = 1.0
    d = col.sum(axis=0)
    s = np.eye(n)
    for _ in range(iters):
        t = col.T @ s @ col  # t[a, b] = sum over in-neighbor pairs
        with np.errstate(divide="ignore", invalid="ignore"):
            nxt = c * t / np.outer(d, d)
        nxt[~np.isfinite(nxt)] = 0.0
        np.fill_diagonal(nxt, 1.0)
        s = nxt
    return s


def _rand_graph(rng, n=40, m=160):
    es = set()
    while len(es) < m:
        a, b = int(rng.integers(n)), int(rng.integers(n))
        if a != b:
            es.add((a, b))
    return sorted(es)


def test_simrank2_matches_dense_mirror(spark):
    rng = np.random.default_rng(17)
    edges = _rand_graph(rng)
    n = 40
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    g = build_graph(e, add_self_loops=False)
    got = simrank_2iter(g, c=0.8, max_fan=None).toPandas()

    s2 = _full_simrank(edges, n, c=0.8, iters=2)
    # candidate set: pairs with >= 1 common in-neighbor
    col = np.zeros((n, n))
    for u, v in edges:
        col[u, v] = 1.0
    cc = col.T @ col
    expect_pairs = {(a, b) for a in range(n) for b in range(a + 1, n)
                    if cc[a, b] >= 1}
    assert {(int(r.a), int(r.b)) for r in got.itertuples()} == expect_pairs

    for r in got.itertuples():
        assert int(r.shared) == int(cc[r.a, r.b])
        # truncation: the mirror's s1 support equals the candidate set
        # (s1 is zero off-support), so on-support s2 values agree to the
        # 1e-12 integer-scaling quantization + 6-dp rounding
        assert abs(r.score - s2[r.a, r.b]) < 2e-6, (r.a, r.b)


def test_simrank1_is_normalized_cocitation(spark):
    """With one unrolled iteration the closed form says s1 = c*cc/(da*db);
    simrank_2iter's shared column and the known s1 must satisfy
    score >= s1 (the recursive term only adds mass)."""
    edges = [(0, 2), (1, 2), (0, 3), (1, 3), (4, 2), (4, 3)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    g = build_graph(e, add_self_loops=False)
    got = simrank_2iter(g, c=0.8, max_fan=None).toPandas()
    # only candidate pair: (2, 3), shared in-neighbors {0, 1, 4}
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.a, r.b, r.shared) == (2, 3, 3)
    s1 = 0.8 * 3 / (3 * 3)
    assert r.score >= s1 - 1e-9
    # dense mirror agrees exactly
    s2 = _full_simrank(edges, 5, c=0.8, iters=2)
    assert abs(r.score - s2[2, 3]) < 2e-6


def test_simrank_fan_cap_excludes_directory_pages(spark):
    # citer 9 links to everything (a directory page); with the cap it
    # must contribute neither pairs nor degrees
    edges = [(0, 2), (1, 2), (0, 3), (1, 3)] + [(9, k) for k in range(8)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    g = build_graph(e, add_self_loops=False)
    capped = simrank_2iter(g, c=0.8, max_fan=4).toPandas()
    sub = _full_simrank([(0, 2), (1, 2), (0, 3), (1, 3)], 4, 0.8, 2)
    assert len(capped) == 1
    r = capped.iloc[0]
    assert (r.a, r.b, r.shared) == (2, 3, 2)
    assert abs(r.score - sub[2, 3]) < 2e-6


def test_simrank_rejects_bad_decay(spark):
    e = spark.createDataFrame(pd.DataFrame([(0, 1)], columns=["src", "dst"]))
    g = build_graph(e, add_self_loops=False)
    with pytest.raises(ValueError):
        simrank_2iter(g, c=1.5)
