"""Count-min sketch (functions/sketch.py): estimates vs a NumPy mirror,
the no-underestimate guarantee, sketch mergeability, and exact-verified
heavy hitters."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions.sketch import (
    _hash_params,
    cms_build,
    cms_query,
    heavy_hitters,
)

_P = 2147483647


def _mirror_sketch(vals, width, depth, seed):
    params = _hash_params(depth, seed)
    tbl = np.zeros((depth, width), dtype=np.int64)
    for x in vals:
        for i, (a, b) in enumerate(params):
            tbl[i, ((int(x) * a + b) % _P) % width] += 1
    return tbl


@pytest.fixture(scope="module")
def skew_vals():
    rng = np.random.default_rng(3)
    # zipf-ish: a few heavy keys over a long tail
    return np.concatenate([
        np.repeat([5, 17, 99], [400, 250, 120]),
        rng.integers(1000, 5000, 800),
    ])


def test_cms_matches_mirror_and_never_underestimates(spark, skew_vals):
    df = spark.createDataFrame(pd.DataFrame({"k": skew_vals}))
    sk = cms_build(df, "k", width=64, depth=4, seed=7).toPandas()
    tbl = _mirror_sketch(skew_vals, 64, 4, 7)
    got = np.zeros_like(tbl)
    for r in sk.itertuples(index=False):
        got[r.row, r.bucket] = r.count
    assert (got == tbl).all()
    # point queries: min over rows, >= truth always
    keys = spark.createDataFrame(pd.DataFrame(
        {"key": [5, 17, 99, 1234, 777777]}))
    est = {r.key: r.estimate for r in
           cms_query(spark.createDataFrame(sk), keys, width=64, depth=4,
                     seed=7).toPandas().itertuples(index=False)}
    true = pd.Series(skew_vals).value_counts()
    for k, e in est.items():
        t = int(true.get(k, 0))
        assert e >= t
        assert e == min(tbl[i, ((k * a + b) % _P) % 64]
                        for i, (a, b) in enumerate(_hash_params(4, 7)))


def test_cms_merge_is_addition(spark, skew_vals):
    half = len(skew_vals) // 2
    d1 = spark.createDataFrame(pd.DataFrame({"k": skew_vals[:half]}))
    d2 = spark.createDataFrame(pd.DataFrame({"k": skew_vals[half:]}))
    s1 = cms_build(d1, "k", width=64, depth=3, seed=9)
    s2 = cms_build(d2, "k", width=64, depth=3, seed=9)
    from pyspark.sql import functions as F

    merged = (s1.unionByName(s2).groupBy("row", "bucket")
              .agg(F.sum("count").alias("count")).toPandas())
    full = cms_build(
        spark.createDataFrame(pd.DataFrame({"k": skew_vals})),
        "k", width=64, depth=3, seed=9).toPandas()
    key = ["row", "bucket"]
    pd.testing.assert_frame_equal(
        merged.sort_values(key).reset_index(drop=True),
        full.sort_values(key).reset_index(drop=True))


def test_heavy_hitters_exact(spark, skew_vals):
    df = spark.createDataFrame(pd.DataFrame({"k": skew_vals}))
    got = {r.key: r.count for r in
           heavy_hitters(df, "k", threshold=100, width=256, depth=4)
           .toPandas().itertuples(index=False)}
    true = pd.Series(skew_vals).value_counts()
    want = {int(k): int(c) for k, c in true.items() if c >= 100}
    assert got == want
    with pytest.raises(ValueError, match="threshold"):
        heavy_hitters(df, "k", threshold=0)


def test_streaming_cms_equals_batch_build(spark, tmp_path, skew_vals):
    """Drive the streaming sketch over file micro-batches; the final
    state equals the batch cms_build over everything consumed."""
    import uuid

    from pagerank_barrierfree_openmp_dynamic_spark.streaming.sketch import (
        streaming_cms,
    )

    d = tmp_path / "events"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    third = len(skew_vals) // 3
    for i, chunk in enumerate((skew_vals[:third], skew_vals[third:2 * third],
                               skew_vals[2 * third:])):
        pd.DataFrame({"k": chunk}).to_parquet(d / f"b{i}.parquet")
    name = "cms_" + uuid.uuid4().hex[:8]
    stream = spark.readStream.schema("k long").parquet(str(d))
    query = (
        streaming_cms(stream, "k", width=64, depth=3, seed=9)
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    from pyspark.sql import Window, functions as F

    # latest emission per row is the live sketch
    w = Window.partitionBy("row").orderBy(
        F.desc(F.monotonically_increasing_id()))
    latest = (spark.table(name)
              .withColumn("_rn", F.row_number().over(w))
              .filter("_rn = 1").select("row", "counts").toPandas())
    got = np.zeros((3, 64), dtype=np.int64)
    for r in latest.itertuples(index=False):
        got[r.row] = np.array(r.counts)
    want = _mirror_sketch(skew_vals, 64, 3, 9)
    assert (got == want).all()
