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


def test_rrf_fusion_matches_mirror(spark):
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark.operators.rankcmp import (
        rrf_fusion,
    )

    a = pd.DataFrame({"id": [1, 2, 3, 4], "rank": [0.4, 0.3, 0.2, 0.1]})
    b = pd.DataFrame({"id": [2, 3, 5], "rank": [9.0, 1.0, 5.0]})
    got = rrf_fusion([spark.createDataFrame(a), spark.createDataFrame(b)],
                     k=60).toPandas().set_index("id").sort_index()

    def pos(df):
        s = df.sort_values(["rank", "id"], ascending=[False, True])
        return {i: p + 1 for p, i in enumerate(s.id)}

    pa, pb = pos(a), pos(b)
    for i in {1, 2, 3, 4, 5}:
        exp = (1.0 / (60 + pa[i]) if i in pa else 0.0) + \
              (1.0 / (60 + pb[i]) if i in pb else 0.0)
        assert got.loc[i, "rrf"] == pytest.approx(exp, abs=1e-15)
        assert got.loc[i, "n_lists"] == (i in pa) + (i in pb)


def test_rrf_fusion_ties_break_on_id(spark):
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark.operators.rankcmp import (
        rrf_fusion,
    )

    # equal scores: smaller id gets the better position
    df = spark.createDataFrame(
        pd.DataFrame({"id": [7, 3, 5], "rank": [1.0, 1.0, 1.0]}))
    got = rrf_fusion([df], k=0).toPandas().set_index("id")
    assert got.loc[3, "rrf"] > got.loc[5, "rrf"] > got.loc[7, "rrf"]
