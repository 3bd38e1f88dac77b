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


def test_remove_edge_operators(spark):
    """M4 named operators (reference Graph.hxx:383-448): out-edge / in-edge /
    vertex removal with vexists semantics and self-loop re-assertion."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        remove_in_edges,
        remove_out_edges,
        remove_vertices,
    )

    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    edges0 = {(r.src, r.dst) for r in g.edges.collect()}

    g1 = remove_out_edges(g, [0, 3])
    e1 = {(r.src, r.dst) for r in g1.edges.collect()}
    # non-loop out-edges of 0 and 3 gone; normalization self-loops re-added
    assert e1 == {(s, d) for s, d in edges0 if s not in (0, 3) or s == d}
    assert g1.num_vertices == 10  # vertices remain (vexists)

    g2 = remove_in_edges(g, spark.createDataFrame([(5,)], "id long"))
    e2 = {(r.src, r.dst) for r in g2.edges.collect()}
    assert e2 == {(s, d) for s, d in edges0 if d != 5 or s == d}

    g3 = remove_vertices(g, [7])
    e3 = {(r.src, r.dst) for r in g3.edges.collect()}
    assert e3 == {(s, d) for s, d in edges0 if s != 7 and d != 7}
    assert g3.num_vertices == 9
    assert g3.vertices.filter(F.col("id") == 7).count() == 0

    for gg in (g1, g2, g3):
        gg.unpersist()
    g.unpersist()


def test_remove_out_edges_weighted_preserves_other_weights(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        remove_out_edges,
    )

    pdf = [(0, 1, 2.0), (1, 2, 3.0), (2, 0, 4.0)]
    g = build_graph(
        spark.createDataFrame(pdf, "src long, dst long, weight double"),
        vertices=spark.range(3).select("id"), weight_col="weight",
    )
    g1 = remove_out_edges(g, [0])
    rows = {(r.src, r.dst): r.weight for r in g1.edges.collect()}
    assert (0, 1) not in rows
    assert rows[(1, 2)] == 3.0 and rows[(2, 0)] == 4.0
    # 0 keeps a fresh weight-1.0 normalization loop
    assert rows[(0, 0)] == 1.0
    g1.unpersist()
    g.unpersist()


def test_hub_split_scatter_plan_no_adj_exchange(spark, g):
    """The hub-split design's core plan property: filtering hubs out of adj
    PRESERVES its persisted src-partitioning (join plans with the same
    exchange count as the unfiltered join), whereas any two-key
    (src, _salt) salted join forces an extra Exchange of the edge table —
    the measured reason salting loses. Plus: hub ranks enter as a
    broadcast, and the split scatter's sums match the plain scatter."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        _scatter,
    )

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        ranks = g.vertices.select("id", F.lit(1.0 / 300).alias("rank"))
        r = ranks.select(F.col("id").alias("_rid"), F.col("rank").alias("_r"))
        hub_ids = [0]

        j_base = g.adj.join(r, g.adj.src == F.col("_rid"))
        adj_rest = g.adj.filter(~F.col("src").isin(hub_ids))
        j_rest = adj_rest.join(r, adj_rest.src == F.col("_rid"))
        assert (_plan(j_rest).count("Exchange")
                == _plan(j_base).count("Exchange"))

        adj_salt = g.adj.withColumn(
            "_salt", F.pmod(F.xxhash64("src", "dst"), F.lit(3)))
        r_salt = r.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(3)])))
        j_salt = adj_salt.join(
            r_salt, (adj_salt.src == r_salt._rid)
            & (adj_salt._salt == r_salt._salt))
        assert (_plan(j_salt).count("Exchange")
                > _plan(j_base).count("Exchange"))

        adj_hub = g.adj.filter(F.col("src").isin(hub_ids)).repartition(4)
        split = _plan(_scatter(g, ranks, None, 0, small=False,
                               hub_split=(adj_rest, adj_hub, hub_ids)))
        # the hub ranks go in as a broadcast even with auto-broadcast off
        assert "BroadcastHashJoin" in split
        # and both plans produce identical sums
        a = (_scatter(g, ranks, None, 0, small=False)
             .toPandas().sort_values("dst"))
        b = (_scatter(g, ranks, None, 0, small=False,
                      hub_split=(adj_rest, adj_hub, hub_ids))
             .toPandas().sort_values("dst"))
        import numpy as np

        assert list(a["dst"]) == list(b["dst"])
        assert np.allclose(a["s"].to_numpy(), b["s"].to_numpy(), atol=1e-15)
    finally:
        spark.conf.set(key, prev)


def test_graph_stats_summary(spark):
    """graph_stats on a hand-checkable graph WITHOUT self-loops: dead ends
    and degree maxima are exact."""
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark.operators.degrees import (
        graph_stats,
    )

    # 0->1, 0->2, 1->2, 3->3 (self-loop); vertex 2 and 4 have no out-edges
    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 0, 1, 3], "dst": [1, 2, 2, 3]}))
    v = spark.range(5).select("id")
    row = graph_stats(e, v).collect()[0]
    assert row.n_vertices == 5
    assert row.n_edges == 4
    assert row.n_self_loops == 1
    assert row.max_out_degree == 2      # vertex 0
    assert row.max_in_degree == 2       # vertex 2
    assert row.avg_out_degree == 0.8    # 4 / 5
    assert row.n_dead_ends == 2         # vertices 2 and 4


def test_sortmerge_scale_path_matches_arrow(spark):
    """The >broadcast_vertices scale path (broadcast_vertices=0 forces the
    co-partitioned sort-merge superstep) computes THE SAME ranks as the
    arrow dense kernel — the correctness half of the BENCH_r03
    pagerank_joinagg_sortmerge section."""
    import numpy as np

    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        PageRankOptions,
        pagerank,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        pagerank_arrow,
    )

    gr = build_graph(
        spark.createDataFrame(datagen.synth_edges(400, seed=9),
                              schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(400).select("id"),
    )
    try:
        o = dict(tolerance=0.0, max_iterations=5, metrics_level="none")
        res_sm = pagerank(gr, PageRankOptions(check_every=5,
                                              broadcast_vertices=0, **o))
        res_a = pagerank_arrow(gr, PageRankOptions(**o))
        a = res_a.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        b = res_sm.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        assert np.allclose(a, b, atol=1e-12)
    finally:
        gr.unpersist()


def test_sortmerge_scatter_no_adj_exchange(spark, g):
    """On the sort-merge scale path the persisted src-partitioned adj table
    must NOT re-shuffle: the scatter plan's only shuffle exchanges are the
    rank side's hash partitioning and the groupBy(dst) aggregation. An adj
    Exchange here would re-shuffle the 100-TB edge table every superstep."""
    from pyspark.sql import functions as F2

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        ranks = g.vertices.select("id", F2.lit(1.0 / 300).alias("rank"))
        plan = _plan(_scatter(g, ranks, None, 0, small=False))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the adj (left) branch of the join reads STRAIGHT off the persisted
        # cache — no Exchange, no Sort (persisted pre-partitioned/sorted by
        # src). The first line under the join must be the cache scan.
        join_at = plan.find("SortMergeJoin")
        lines = plan[join_at:].splitlines()
        assert lines[1].strip().startswith(":- InMemoryTableScan"), plan
        # above the join: exactly ONE shuffle exchange (the groupBy(dst)
        # partial agg); the plan text below the join line includes cached
        # build internals, so count only the live region above it
        assert plan[:join_at].count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set(key, prev)


def test_bucketed_tables_join_and_agg_without_exchange(spark, tmp_path):
    """Catalog-bucketed edge tables: a src-src join of two bucketed tables
    and a groupBy(src) agg both plan with ZERO Exchange — the cross-job
    analogue of the kernels' persisted co-partitioning."""
    from pagerank_barrierfree_openmp_dynamic_spark.sources.bucketed import (
        read_bucketed,
        save_bucketed,
    )

    e = spark.createDataFrame(datagen.synth_edges(200, seed=5),
                              schema=datagen.EDGES_SCHEMA)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the fixture is tiny: a broadcast join would preempt the bucketed
    # sort-merge plan this test is about (at real scale neither side fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(e, "e_b1", buckets=4, path=str(tmp_path / "b1"))
        save_bucketed(e.selectExpr("src", "dst AS dst2"), "e_b2",
                      buckets=4, path=str(tmp_path / "b2"))
        t1, t2 = read_bucketed(spark, "e_b1"), read_bucketed(spark, "e_b2")
        j = t1.join(t2, "src")
        j.count()
        assert "Exchange" not in _plan(j)
        agg = t1.groupBy("src").count()
        agg.count()
        assert "Exchange" not in _plan(agg)
        # control: the same join over plain (unbucketed) parquet shuffles
        e.write.mode("overwrite").parquet(str(tmp_path / "plain"))
        p = spark.read.parquet(str(tmp_path / "plain"))
        jp = p.join(p.selectExpr("src", "dst AS dst2"), "src")
        jp.count()
        assert "Exchange" in _plan(jp)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS e_b1")
        spark.sql("DROP TABLE IF EXISTS e_b2")


def test_incident_delta_broadcasts_batch_side(spark):
    """triangle_count_incremental's adjacency probes must broadcast the
    batch side (it is O(batch)); a sort-merge or cartesian there would scan
    and shuffle the full adjacency per probe."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (
        _delta_candidates, _incident_delta, _und,
    )

    raw = spark.createDataFrame(datagen.synth_edges(300, seed=9),
                                schema=datagen.EDGES_SCHEMA)
    g = build_graph(raw)
    und = _und(g.edges)
    b = und.limit(5)

    # explain the PRODUCTION frame the count runs on — both adjacency
    # probes and the side-edge membership marks must broadcast the batch
    plan = _plan(_delta_candidates(und, b, deletions=True))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    # and the full helper runs + returns a bounded count
    n = _incident_delta(und, b, deletions=True)
    assert n >= 0
    g.unpersist()


def test_respan_shrinks_span_and_grow_is_identity(spark):
    """M1 respan (reference Graph.hxx:299-311): shrinking to [0, n) drops
    vertices >= n with all incident edges; growing reserves nothing in
    the explicit-vertex model (identity)."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import respan

    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    edges0 = {(r.src, r.dst) for r in g.edges.collect()}

    g_small = respan(g, 6)
    e_small = {(r.src, r.dst) for r in g_small.edges.collect()}
    assert e_small == {(s, d) for s, d in edges0 if s < 6 and d < 6}
    assert g_small.num_vertices == 6
    assert {r.id for r in g_small.vertices.collect()} == set(range(6))

    g_big = respan(g, 99)
    assert g_big.num_vertices == 10
    assert {(r.src, r.dst) for r in g_big.edges.collect()} == edges0

    import pytest as _pt
    with _pt.raises(ValueError):
        respan(g, -1)


def _jobs_in_group(spark, group, fn):
    """Run ``fn()`` under a job group and return the number of Spark jobs
    it submitted."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))


def test_iterative_kernels_no_standalone_scalar_agg_jobs(spark):
    """VERDICT r4 weak #3: per-superstep scalar norms/errors must ride
    along with the state-materialization jobs (df.observe), never as
    separate collect() actions. Empirical per-extra-iteration budgets
    (checkpoint + broadcast-build + eager_state count jobs): hits/salsa 7,
    eigenvector 5, katz 4 — the pre-fix loops paid 10/10/7/5 (the delta IS
    the standalone scalar collects), so any regression re-adds at least
    one job and trips the budget."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.centrality import (
        eigenvector_centrality, katz_centrality)
    from pagerank_barrierfree_openmp_dynamic_spark.plans.hits import hits
    from pagerank_barrierfree_openmp_dynamic_spark.plans.salsa import salsa

    gr = build_graph(
        spark.createDataFrame(datagen.synth_edges(200, seed=9),
                              schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(200).select("id"),
        add_self_loops=False,
    )
    budgets = {
        "hits": (lambda k: hits(gr, tolerance=0.0, max_iterations=k), 7),
        "salsa": (lambda k: salsa(gr, tolerance=0.0, max_iterations=k), 7),
        "eig": (lambda k: eigenvector_centrality(
            gr, tolerance=0.0, max_iterations=k), 5),
        "katz": (lambda k: katz_centrality(
            gr, alpha=0.05, tolerance=0.0, max_iterations=k,
            normalized=False), 4),
    }
    try:
        for name, (run, budget) in budgets.items():
            j1 = _jobs_in_group(spark, f"sagg-{name}-1", lambda: run(1))
            j3 = _jobs_in_group(spark, f"sagg-{name}-3", lambda: run(3))
            per_iter = (j3 - j1) / 2
            assert per_iter <= budget, (
                f"{name}: {per_iter} jobs per extra iteration "
                f"(budget {budget}) — a standalone scalar-agg action "
                "crept back into the superstep loop")
    finally:
        gr.unpersist()
