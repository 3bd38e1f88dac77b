"""Physical-plan shape guards — the properties BENCH/BASELINE.md §6 claims.

These are regression tests for plan structure, not timings: a change that
reintroduces a second exchange into the graph build, de-broadcasts the rank
side of the scatter, or routes text analysis through row-at-a-time Python
would silently destroy at-scale performance while staying correct on test
data. Asserting on the executed plan catches that in CI.
"""

import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import _scatter
from pagerank_barrierfree_openmp_dynamic_spark.functions import quality_score, lang_id


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def g(spark):
    gr = build_graph(
        spark.createDataFrame(datagen.synth_edges(300, seed=3),
                              schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(300).select("id"),
    )
    yield gr
    gr.unpersist()


def test_build_graph_dedup_single_exchange(spark):
    """repartition(src) satisfies dropDuplicates(src,dst)'s clustered
    distribution — exactly ONE exchange in the dedup plan."""
    raw = spark.createDataFrame(datagen.synth_edges(300, seed=4),
                                schema=datagen.EDGES_SCHEMA)
    deduped = raw.repartition(4, "src").dropDuplicates(["src", "dst"])
    plan = _plan(deduped)
    # count only shuffle exchanges (broadcast exchanges would be a bug here)
    n_exchange = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchange == 1, plan
    assert "BroadcastExchange" not in plan


def test_scatter_broadcasts_rank_side(spark, g):
    """Small-N scatter: rank side broadcast, persisted adj read from cache,
    one shuffle for the groupBy(dst)."""
    ranks = g.vertices.select("id", F.lit(1.0 / 300).alias("rank"))
    plan = _plan(_scatter(g, ranks, None, 0, small=True))
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan  # adj comes from the persisted cache
    assert "SortMergeJoin" not in plan


def test_scatter_sort_merge_at_scale_setting(spark, g):
    """small=False (the >broadcast_vertices path) must not FORCE a broadcast
    of the rank state. Catalyst still auto-broadcasts tiny test inputs by
    stats, so disable the auto threshold to isolate the engine's hint."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        ranks = g.vertices.select("id", F.lit(1.0 / 300).alias("rank"))
        plan = _plan(_scatter(g, ranks, None, 0, small=False))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and with the hint, broadcast happens even at threshold -1
        plan_b = _plan(_scatter(g, ranks, None, 0, small=True))
        assert "BroadcastHashJoin" in plan_b
    finally:
        spark.conf.set(key, prev)


def test_text_ops_stay_jvm_side(spark):
    """Quality scoring and language id compile to JVM expressions — no
    BatchEvalPython / ArrowEvalPython stage in their plans."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    for out in (quality_score(docs), lang_id(docs)):
        plan = _plan(out)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
