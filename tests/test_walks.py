"""Random-walk corpus generation (plans/walks.py): affine strategy vs a
NumPy mirror, hash-strategy walk validity/determinism, dead-end
termination, and skip-gram pair extraction."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
    random_walks,
    skipgram_pairs,
)


@pytest.fixture(scope="module")
def walk_graph(spark):
    n = 60
    edges_pdf = datagen.synth_edges(n, seed=9)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
        add_self_loops=False,
    )
    g._edges_pdf = edges_pdf
    yield g
    g.unpersist()


def _walks_mirror(n, edges, walk_length, walks_per_vertex):
    """Pure-Python mirror of the affine strategy."""
    adj = {}
    for s, d in sorted(set(map(tuple, edges))):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in range(n):
        for wi in range(walks_per_vertex):
            cur = start
            rows.append((start, wi, 0, cur))
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[(start * 31 + wi * 13 + step * 7) % len(nbrs)]
                rows.append((start, wi, step, cur))
    return rows


def test_affine_matches_mirror(spark, walk_graph):
    edges = list(walk_graph._edges_pdf.itertuples(index=False))
    got = random_walks(walk_graph, walk_length=4, walks_per_vertex=2,
                       strategy="affine").toPandas()
    got_set = set(map(tuple, got.to_numpy()))
    want = set(_walks_mirror(60, edges, 4, 2))
    assert got_set == want


def test_hash_walks_are_valid_and_deterministic(spark, walk_graph):
    edges = set(map(tuple, walk_graph._edges_pdf.itertuples(index=False)))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    c1 = random_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                      seed=7).toPandas()
    c2 = random_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                      seed=7).toPandas()
    key = ["start", "walk", "step"]
    p1 = c1.sort_values(key).reset_index(drop=True)
    p2 = c2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)
    # every consecutive hop is a real edge; walks only stop at dead ends
    for (start, wi), grp in p1.groupby(["start", "walk"]):
        grp = grp.sort_values("step")
        vs = grp["vertex"].tolist()
        assert grp["step"].tolist() == list(range(len(vs)))
        for a, b in zip(vs, vs[1:]):
            assert (a, b) in edges
        if len(vs) < 6:  # terminated early -> last vertex is a dead end
            assert outdeg.get(vs[-1], 0) == 0
    # a different seed changes at least one walk on a branching graph
    c3 = random_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                      seed=8).toPandas().sort_values(key).reset_index(drop=True)
    assert not p1.equals(c3)


def test_starts_subset_and_validation(spark, walk_graph):
    starts = walk_graph.vertices.filter("id < 5")
    c = random_walks(walk_graph, walk_length=3, walks_per_vertex=1,
                     starts=starts).toPandas()
    assert set(c["start"]) <= set(range(5))
    assert (c["step"] == 0).sum() == 5
    with pytest.raises(ValueError, match="strategy"):
        random_walks(walk_graph, strategy="bogus")
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(walk_graph, walk_length=0)


def test_skipgram_pairs_on_chain(spark):
    """A single 5-vertex path walk yields the closed-form pair count:
    ordered pairs within window w of each other = 2*(w*L - w*(w+1)/2)
    for L+1 vertices."""
    g = build_graph(
        spark.createDataFrame(pd.DataFrame(
            {"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})),
        vertices=spark.range(5).select("id"),
        add_self_loops=False,
    )
    try:
        corpus = random_walks(g, walk_length=4, walks_per_vertex=1,
                              starts=spark.range(1).select("id"))
        pairs = skipgram_pairs(corpus, window=2).toPandas()
        # vertices 0..4 in a line; pairs within distance 2: for L=4 steps
        # (5 vertices): 2*(2*4 - 3) = 10... enumerate exactly:
        want = set()
        for i in range(5):
            for j in range(5):
                if i != j and abs(i - j) <= 2:
                    want.add((i, j))
        assert set(map(tuple, pairs.to_numpy())) == want
    finally:
        g.unpersist()


def test_run_walks_job(spark, tmp_path):
    """The spark-submit walk job end-to-end: edges parquet in, corpus +
    skip-gram pairs parquet out, consistent JSON summary."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    edges_pdf = datagen.synth_edges(40, seed=4)
    ep = str(tmp_path / "edges.parquet")
    spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA) \
        .write.parquet(ep)
    sys.path.insert(0, "/root/repo/jobs")
    import run_walks

    out = str(tmp_path / "walks")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_walks.main(["--edges", ep, "--output", out,
                             "--walk-length", "3", "--walks-per-vertex", "2",
                             "--pairs-window", "2"])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == summary["corpus_rows"]
    assert summary["walks"] == summary["n_vertices"] * 2
    # live walks never increase step-over-step (dead ends only shrink)
    live = summary["live_walks_per_step"]
    assert all(a >= b for a, b in zip(live, live[1:]))
    pairs = spark.read.parquet(f"{out}/pairs")
    assert pairs.count() == summary["pairs_rows"] > 0


# ------------------------------------------------------------- node2vec


def _n2v_mirror(n, edges, walk_length, walks_per_vertex, p, q):
    """Pure-Python mirror of the affine-strategy node2vec walk, including
    the dst-ordered cumulative-sum inverse-CDF draw."""
    M = 1 << 20
    adj = {}
    eset = set()
    for s, d in sorted(set(map(tuple, edges))):
        adj.setdefault(s, []).append(d)
        eset.add((s, d))
    rows = []
    for start in range(n):
        for wi in range(walks_per_vertex):
            prev = cur = start
            rows.append((start, wi, 0, cur))
            for step in range(1, walk_length + 1):
                cands = adj.get(cur)
                if not cands:
                    break
                u = ((start * 31 + wi * 13 + step * 7) % M) / M
                cum = []
                acc = 0.0
                for d in cands:  # ascending dst order
                    if d == prev:
                        a = 1.0 / p
                    elif (prev, d) in eset:
                        a = 1.0
                    else:
                        a = 1.0 / q
                    acc += 1.0 * a
                    cum.append(acc)
                tot = cum[-1]
                nxt = next(d for d, c in zip(cands, cum) if c > u * tot)
                prev, cur = cur, nxt
                rows.append((start, wi, step, cur))
    return rows


def test_node2vec_matches_mirror(spark, walk_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
        node2vec_walks,
    )

    edges = list(walk_graph._edges_pdf.itertuples(index=False))
    got = node2vec_walks(walk_graph, walk_length=4, walks_per_vertex=2,
                         p=0.5, q=2.0, strategy="affine").toPandas()
    got_set = set(map(tuple, got.to_numpy()))
    want = set(_n2v_mirror(60, edges, 4, 2, 0.5, 2.0))
    assert got_set == want
    # p=q=1: unbiased second-order = plain inverse-CDF uniform draw
    got1 = node2vec_walks(walk_graph, walk_length=3, walks_per_vertex=1,
                          p=1.0, q=1.0, strategy="affine").toPandas()
    want1 = set(_n2v_mirror(60, edges, 3, 1, 1.0, 1.0))
    assert set(map(tuple, got1.to_numpy())) == want1


def test_node2vec_hash_valid_and_bias_sensitivity(spark, walk_graph):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
        node2vec_walks,
    )
    import pytest as _pt

    edges = set(map(tuple, walk_graph._edges_pdf.itertuples(index=False)))
    c1 = node2vec_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                        p=0.25, q=4.0, seed=5).toPandas()
    key = ["start", "walk", "step"]
    p1 = c1.sort_values(key).reset_index(drop=True)
    for (_, _), grp in p1.groupby(["start", "walk"]):
        vs = grp.sort_values("step")["vertex"].tolist()
        for a, b in zip(vs, vs[1:]):
            assert (a, b) in edges
    # determinism for fixed seed
    c2 = node2vec_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                        p=0.25, q=4.0, seed=5).toPandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, c2)
    # strong return-bias (small p) vs strong explore-bias must differ
    c3 = node2vec_walks(walk_graph, walk_length=5, walks_per_vertex=2,
                        p=4.0, q=0.25, seed=5).toPandas() \
        .sort_values(key).reset_index(drop=True)
    assert not p1.equals(c3)
    with _pt.raises(ValueError, match="positive"):
        node2vec_walks(walk_graph, p=0.0)


def test_run_walks_job_node2vec_mode(spark, tmp_path):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    edges_pdf = datagen.synth_edges(30, seed=6)
    ep = str(tmp_path / "edges.parquet")
    spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA) \
        .write.parquet(ep)
    sys.path.insert(0, "/root/repo/jobs")
    import run_walks

    out = str(tmp_path / "n2v")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_walks.main(["--edges", ep, "--output", out,
                             "--walk-length", "3", "--walks-per-vertex", "1",
                             "--p", "0.5", "--q", "2.0"])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["mode"] == "node2vec"
    assert spark.read.parquet(f"{out}/corpus").count() \
        == summary["corpus_rows"] > 0


def test_random_walks_refuses_weighted(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.walks import (
        node2vec_walks,
    )

    pdf = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 2, 0],
                        "w": [1.0, 3.0, 1.0, 1.0]})
    g = build_graph(spark.createDataFrame(pdf),
                    vertices=spark.range(3).select("id"),
                    add_self_loops=False, weight_col="w")
    try:
        with pytest.raises(ValueError, match="node2vec_walks"):
            random_walks(g, walk_length=2)
        # the weighted path works and produces valid hops
        c = node2vec_walks(g, walk_length=3, walks_per_vertex=1,
                           strategy="affine").toPandas()
        assert len(c) > 0
    finally:
        g.unpersist()
