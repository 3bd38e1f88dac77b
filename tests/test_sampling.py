"""Deterministic hash-split sampling (functions/sampling.py): split
disjointness/coverage/stability, fraction accuracy, key-consistency
across tables, pure-Python mirror parity, and the shuffle-free plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
    _A, _B, _C, _M,
    assign_split,
    hash_bucket,
    sample_by_key,
    sample_edges,
    sample_vertices_induced,
)


def _mirror_hash(key, seed, other=None):
    h = (key % _M) * _A + seed * _C
    if other is not None:
        h += (other % _M) * _B
    x = h % _M
    return (x * x + x) % _M


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(5000)})).localCheckpoint(eager=True)


def test_split_disjoint_exhaustive_stable(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(docs, "doc_id", w, seed=7).toPandas()
    assert len(out) == 5000
    counts = out["split"].value_counts()
    # fraction accuracy at n=5000: within a few percent absolute
    assert abs(counts.get("train", 0) / 5000 - 0.8) < 0.03
    assert abs(counts.get("val", 0) / 5000 - 0.1) < 0.02
    assert abs(counts.get("test", 0) / 5000 - 0.1) < 0.02
    # stability: re-running yields the identical assignment
    out2 = assign_split(docs, "doc_id", w, seed=7).toPandas()
    m1 = out.set_index("doc_id")["split"].to_dict()
    m2 = out2.set_index("doc_id")["split"].to_dict()
    assert m1 == m2
    # different seed reshuffles
    out3 = assign_split(docs, "doc_id", w, seed=8).toPandas()
    m3 = out3.set_index("doc_id")["split"].to_dict()
    assert m1 != m3


def test_split_matches_python_mirror(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(docs, "doc_id", w, seed=7).toPandas()
    t_train = int(0.8 * _M)
    t_val = int(0.9 * _M)
    for _, row in out.iterrows():
        h = _mirror_hash(int(row["doc_id"]), 7)
        want = ("train" if h < t_train
                else "val" if h < t_val else "test")
        assert row["split"] == want


def test_sample_by_key_consistent_across_tables(spark, docs):
    # a second table keyed the same way lands on the same side
    other = docs.select(F.col("doc_id"),
                        (F.col("doc_id") * 3).alias("payload"))
    a = set(sample_by_key(docs, "doc_id", 0.25, seed=11)
            .toPandas()["doc_id"])
    b = set(sample_by_key(other, "doc_id", 0.25, seed=11)
            .toPandas()["doc_id"])
    assert a == b
    assert abs(len(a) / 5000 - 0.25) < 0.03


def test_edge_and_vertex_induced_sampling(spark):
    from pagerank_barrierfree_openmp_dynamic_spark import datagen

    pdf = datagen.synth_edges(400, seed=5)
    edges = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    n_e = edges.count()
    es = sample_edges(edges, 0.3, seed=3)
    assert abs(es.count() / n_e - 0.3) < 0.06
    vs = sample_vertices_induced(edges, 0.5, seed=3).toPandas()
    # both endpoints of every kept edge pass the vertex filter
    t = int(0.5 * _M)
    for _, r in vs.iterrows():
        assert _mirror_hash(int(r["src"]), 3) < t
        assert _mirror_hash(int(r["dst"]), 3) < t
    # vertex-induced keeps roughly frac^2 of edges (endpoint hashes are
    # near-independent; synth graphs are skewed so allow a wide band)
    assert 0.05 < len(vs) / n_e < 0.6


def test_sampling_plan_is_shuffle_free(spark, docs):
    plan = sample_by_key(docs, "doc_id", 0.5, seed=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    w = {"train": 0.9, "test": 0.1}
    plan2 = assign_split(docs, "doc_id", w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan2


def test_bad_weights_rejected(spark, docs):
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", {"a": 0.5, "b": 0.1})


def test_priority_sample_matches_mirror_and_is_pps(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
        priority_sample,
    )

    pdf = pd.DataFrame({
        "doc_id": range(2000),
        "w": [1.0 + (i % 17) for i in range(2000)],
    })
    df = spark.createDataFrame(pdf)
    out = priority_sample(df, "w", 50, "doc_id", seed=7).toPandas()
    assert len(out) == 50
    # mirror: q = w / u, u = (hash+1)/M, k largest with (priority desc, id)
    qs = []
    for i, w in zip(pdf.doc_id, pdf.w):
        u = (_mirror_hash(i, 7) + 1) / _M
        qs.append((-(w / u), i))
    expect = sorted(qs)[:50]
    got = sorted(zip(-out.priority, out.doc_id))
    for (eq, ei), (gq, gi) in zip(expect, got):
        assert ei == gi
        assert abs(eq - gq) < 1e-12 * abs(eq)
    # PPS sanity: sampled mean weight exceeds population mean (heavier
    # rows are more likely in)
    assert out.w.mean() > pdf.w.mean()


def test_priority_sample_drops_nonpositive_and_is_stable(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
        priority_sample,
    )

    pdf = pd.DataFrame({"doc_id": range(100),
                        "w": [0.0 if i % 10 == 0 else float(i) for i in range(100)]})
    df = spark.createDataFrame(pdf)
    a = priority_sample(df, "w", 20, "doc_id").toPandas()
    b = priority_sample(df, "w", 20, "doc_id").toPandas()
    assert (a.w > 0).all()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
