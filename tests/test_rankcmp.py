"""Rank-comparison operators (``operators/rankcmp.py``) vs pandas
oracles: Spearman with average-tie handling, extremes, and top-k overlap
determinism under ties."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.operators.rankcmp import (
    spearman,
    topk_overlap,
)


def _df(spark, vals):
    return spark.createDataFrame(
        pd.DataFrame({"id": range(len(vals)), "rank": vals}))


def test_spearman_matches_pandas_with_ties(spark):
    rng = np.random.default_rng(5)
    a = np.round(rng.random(200), 1)   # heavy ties
    b = np.round(rng.random(200), 1)
    got = spearman(_df(spark, a), _df(spark, b)).collect()[0]
    # spearman = Pearson on average-tie rank positions (pandas' spearman
    # path needs scipy, absent here — same math by hand)
    ra = pd.Series(a).rank(method="average").to_numpy()
    rb = pd.Series(b).rank(method="average").to_numpy()
    exp = float(np.corrcoef(ra, rb)[0, 1])
    assert got["n"] == 200
    assert abs(got["spearman"] - exp) < 1e-12


def test_spearman_extremes(spark):
    a = np.arange(50, dtype=float)
    assert abs(spearman(_df(spark, a), _df(spark, a)).collect()[0]["spearman"]
               - 1.0) < 1e-12
    assert abs(spearman(_df(spark, a), _df(spark, a[::-1].copy()))
               .collect()[0]["spearman"] + 1.0) < 1e-12


def test_spearman_inner_join_universe(spark):
    # ids 0..9 on one side, 5..14 on the other -> n = overlap only
    a = spark.createDataFrame(
        pd.DataFrame({"id": range(10), "rank": np.arange(10.0)}))
    b = spark.createDataFrame(
        pd.DataFrame({"id": range(5, 15), "rank": np.arange(10.0)}))
    assert spearman(a, b).collect()[0]["n"] == 5


def test_topk_overlap_deterministic_ties(spark):
    # a: top-3 under (value desc, id asc) = {0, 1, 2} (all value 5 ties)
    a = _df(spark, [5.0, 5.0, 5.0, 5.0, 1.0])
    # b: top-3 = {2, 3, 4}
    b = _df(spark, [0.0, 0.0, 7.0, 6.0, 5.0])
    row = topk_overlap(a, b, 3).collect()[0]
    assert (row["intersection"], row["union_size"], row["k"]) == (1, 5, 3)
    assert abs(row["jaccard"] - 0.2) < 1e-15


def test_topk_overlap_identical(spark):
    a = _df(spark, list(np.arange(30.0)))
    row = topk_overlap(a, a, 10).collect()[0]
    assert row["intersection"] == 10 and abs(row["jaccard"] - 1.0) < 1e-15


def test_topk_rejects_bad_k(spark):
    a = _df(spark, [1.0])
    with pytest.raises(ValueError):
        topk_overlap(a, a, 0)
