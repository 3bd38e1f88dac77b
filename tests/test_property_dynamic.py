"""Property-based dynamic-batch tests (hypothesis), mirroring the
reference's randomized experiment protocol (REPEAT_BATCH random batches per
size, /root/reference/main.cxx:24-26, 38-66; README.md:49-51): for ANY
edge batch, (a) the committed edge set equals the set-algebra oracle
(E \\ D) ∪ I plus self-loops, and (b) the Dynamic Frontier re-rank from the
previous fixed point equals static ranks on the updated graph within the
reference's own allclose criterion (1e-6 L∞).

Spark sessions are expensive, so examples are few but adversarial: the
strategy generates overlapping delete/insert sets (delete-then-reinsert,
inserts of already-present edges, deletes of absent edges — the cases where
net-change bookkeeping can go wrong).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import apply_batch
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
    PageRankOptions,
    pagerank,
    pagerank_dynamic_frontier,
)

from oracle import pagerank_oracle

N = 24

edge_st = st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)).filter(
    lambda e: e[0] != e[1]
)
graph_st = st.sets(edge_st, min_size=N, max_size=3 * N)
# batches deliberately overlap the graph's edge universe so deletes hit
# real edges and inserts collide with existing ones
batch_st = st.tuples(st.sets(edge_st, max_size=10), st.sets(edge_st, max_size=10))


def _df(spark, rows, schema):
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=graph_st, batch=batch_st)
def test_apply_batch_matches_set_algebra(sess, edges, batch):
    dels, ins = batch
    g = build_graph(
        _df(sess, sorted(edges), "src long, dst long"),
        vertices=sess.range(N).select("id"),
    )
    try:
        bpdf = pd.DataFrame(
            [(s, t, "del") for s, t in sorted(dels)]
            + [(s, t, "ins") for s, t in sorted(ins)],
            columns=["src", "dst", "op"],
        )
        if len(bpdf) == 0:
            return
        g2 = apply_batch(g, _df(sess, bpdf, "src long, dst long, op string"))
        try:
            want = ((set(edges) - set(dels)) | set(ins)) | {
                (i, i) for i in range(N)
            }
            got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
            assert got == want
            assert g2.num_edges == len(want)
        finally:
            g2.unpersist()
    finally:
        g.unpersist()


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=graph_st, batch=batch_st)
def test_dynamic_frontier_matches_static_on_updated(sess, edges, batch):
    dels, ins = batch
    g = build_graph(
        _df(sess, sorted(edges), "src long, dst long"),
        vertices=sess.range(N).select("id"),
    )
    g2 = None
    try:
        bpdf = pd.DataFrame(
            [(s, t, "del") for s, t in sorted(dels)]
            + [(s, t, "ins") for s, t in sorted(ins)],
            columns=["src", "dst", "op"],
        )
        if len(bpdf) == 0:
            return
        batch_df = _df(sess, bpdf, "src long, dst long, op string")
        prev = pagerank(g, PageRankOptions(tolerance=1e-8, metrics_level="none"))
        g2 = apply_batch(g, batch_df)
        dyn = pagerank_dynamic_frontier(
            g, g2, batch_df, prev.ranks,
            PageRankOptions(tolerance=1e-8, metrics_level="none"),
        )
        updated = sorted((set(edges) - set(dels)) | set(ins))
        golden, _ = pagerank_oracle(N, updated, tol=1e-14)
        got = dyn.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        assert np.max(np.abs(got - golden)) <= 1e-6
    finally:
        if g2 is not None:
            g2.unpersist()
        g.unpersist()


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=graph_st, batch=batch_st)
def test_triangle_incremental_matches_recount(sess, edges, batch):
    """For ANY overlapping delete/insert batch (reinsertion, duplicate
    inserts, deletes of absent or reciprocal edges), the incremental
    triangle delta equals the recount on the apply_batch-updated graph."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.triangles import (
        triangle_count,
        triangle_count_incremental,
    )

    dels, ins = batch
    bpdf = pd.DataFrame(
        [(s, t, "del") for s, t in sorted(dels)]
        + [(s, t, "ins") for s, t in sorted(ins)],
        columns=["src", "dst", "op"],
    )
    if len(bpdf) == 0:
        return
    g = build_graph(
        _df(sess, sorted(edges), "src long, dst long"),
        vertices=sess.range(N).select("id"),
        add_self_loops=False,
    )
    g2 = None
    try:
        batch_df = _df(sess, bpdf, "src long, dst long, op string")
        row = triangle_count_incremental(g, batch_df).collect()[0]
        g2 = apply_batch(g, batch_df)
        assert row.t_new == row.t_old - row.t_removed + row.t_added
        assert row.t_old == triangle_count(g)
        assert row.t_new == triangle_count(g2)
    finally:
        g.unpersist()
        if g2 is not None:
            g2.unpersist()


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=graph_st, edges2=graph_st)
def test_graph_diff_roundtrip_property(sess, edges, edges2):
    """graph_diff(A, B) applied to A reproduces B for ANY two snapshots."""
    from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (
        graph_diff,
    )

    a = _df(sess, sorted(edges), "src long, dst long")
    b = _df(sess, sorted(edges2), "src long, dst long")
    batch = graph_diff(a, b)
    g = build_graph(a, vertices=sess.range(N).select("id"),
                    add_self_loops=False)
    g2 = None
    try:
        g2 = apply_batch(g, batch)
        got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
        assert got == set(edges2)
    finally:
        g.unpersist()
        if g2 is not None:
            g2.unpersist()
