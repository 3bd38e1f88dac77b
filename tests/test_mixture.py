"""Mixture weighting + curriculum bucketing vs pure-Python mirrors."""

import math

import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions.mixture import (
    curriculum_buckets, source_mixture_weights)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        src = ["wiki", "web", "code"][i % 3]
        n = (i % 13) + 1 + (20 if src == "web" else 0)  # web is the big source
        rows.append((i, " ".join(f"t{j}" for j in range(n)), src))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]))


def test_mixture_weights_mirror(spark, docs):
    got = {r["source"]: r for r in source_mixture_weights(docs, 0.75).collect()}
    pdf = docs.toPandas()
    pdf["n_tok"] = pdf["text"].str.split(" ").map(
        lambda ts: len([t for t in ts if t]))
    per = pdf.groupby("source")["n_tok"].agg(["count", "sum"])
    total = per["sum"].sum()
    raw = {s: per.loc[s, "sum"] ** 0.75 for s in per.index}
    z = sum(raw.values())
    assert set(got) == set(per.index)
    for s in per.index:
        r = got[s]
        assert r["n_docs"] == per.loc[s, "count"]
        assert r["n_tokens"] == per.loc[s, "sum"]
        assert math.isclose(r["token_share"],
                            round(per.loc[s, "sum"] / total, 6), abs_tol=1e-9)
        assert math.isclose(r["weight"], round(raw[s] / z, 6), abs_tol=1e-9)
    # alpha<1 upsamples small sources: weight > token_share for the smallest
    small = per["sum"].idxmin()
    big = per["sum"].idxmax()
    assert got[small]["weight"] > got[small]["token_share"]
    assert got[big]["weight"] < got[big]["token_share"]
    # weights sum to 1 (up to rounding)
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-4


def test_curriculum_buckets_deterministic_and_ordered(spark, docs):
    got = curriculum_buckets(docs, n_buckets=4).collect()
    assert len(got) == 120
    # NTILE(4) over 120 rows: four buckets of exactly 30
    sizes = {}
    for r in got:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 30, 2: 30, 3: 30, 4: 30}
    # bucket order respects (quality, doc_id) order
    ordered = sorted(got, key=lambda r: (r["quality"], r["doc_id"]))
    assert [r["bucket"] for r in ordered] == sorted(
        r["bucket"] for r in ordered)
    # deterministic across evaluations
    again = curriculum_buckets(docs, n_buckets=4).collect()
    assert sorted((r["doc_id"], r["bucket"]) for r in again) == \
        sorted((r["doc_id"], r["bucket"]) for r in got)


@pytest.mark.parametrize("k", [3, 7, 10, 200])
def test_curriculum_equals_ansi_ntile(spark, docs, k):
    """The distributed arithmetic must equal NTILE exactly, including the
    first-(n mod k)-buckets-larger rule and the n < k degenerate case."""
    from pyspark.sql import Window, functions as F
    from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
        quality_score)

    got = {r["doc_id"]: r["bucket"]
           for r in curriculum_buckets(docs, n_buckets=k).collect()}
    w = Window.orderBy(F.col("quality").asc(), F.col("doc_id").asc())
    ref = {r["doc_id"]: r["bucket"] for r in quality_score(docs)
           .select("doc_id", F.ntile(k).over(w).alias("bucket")).collect()}
    assert got == ref
