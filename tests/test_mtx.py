"""MTX reader/writer parity with the reference's format rules
(1-based ids, pre-added vertices, symmetric reverse edges)."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
    PageRankOptions,
    pagerank,
)
from pagerank_barrierfree_openmp_dynamic_spark.sources.mtx import (
    read_mtx,
    read_mtx_header,
    write_mtx,
)

from oracle import pagerank_oracle


def _write(path, banner, n, edges):
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {banner}\n")
        f.write("% a comment line\n")
        f.write(f"{n} {n} {len(edges)}\n")
        for s, d in edges:
            f.write(f"{s} {d}\n")


def test_read_general(spark, tmp_path):
    edges = [(s + 1, d + 1) for s, d in datagen.tiny_edges()]
    p = str(tmp_path / "g.mtx")
    _write(p, "pattern general", 10, edges)
    e, v, hdr = read_mtx(spark, p)
    assert hdr["n"] == 10 and not hdr["symmetric"]
    assert v.count() == 10
    assert {(r["src"], r["dst"]) for r in e.collect()} == set(edges)


def test_read_symmetric_adds_reverse(spark, tmp_path):
    edges = [(1, 2), (2, 3), (1, 4)]
    p = str(tmp_path / "s.mtx")
    _write(p, "pattern symmetric", 4, edges)
    e, v, hdr = read_mtx(spark, p)
    want = set(edges) | {(b, a) for a, b in edges}
    assert {(r["src"], r["dst"]) for r in e.collect()} == want


def test_size_line_collision(spark, tmp_path):
    """An edge equal to (rows, cols) must survive; only the size line is
    dropped."""
    n = 5
    edges = [(5, 5), (1, 2), (2, 1)]
    p = str(tmp_path / "c.mtx")
    _write(p, "pattern general", n, edges)
    e, _, _ = read_mtx(spark, p)
    got = sorted((r["src"], r["dst"]) for r in e.collect())
    assert got == sorted(edges)


def test_roundtrip_and_pagerank(spark, tmp_path):
    edges1 = [(s + 1, d + 1) for s, d in datagen.tiny_edges()]
    p = str(tmp_path / "rt.mtx")
    _write(p, "pattern general", 10, edges1)
    e, v, _ = read_mtx(spark, p)
    p2 = str(tmp_path / "rt2.mtx")
    write_mtx(e, p2, n=10)
    e2, v2, _ = read_mtx(spark, p2)
    assert {tuple(r) for r in e.collect()} == {tuple(r) for r in e2.collect()}

    g = build_graph(e, vertices=v)
    try:
        golden, _ = pagerank_oracle(
            10, [(s - 1, d - 1) for s, d in edges1], tol=1e-14)
        res = pagerank(g, PageRankOptions(tolerance=1e-8, metrics_level="none"))
        pdf = res.ranks.toPandas().sort_values("id")
        assert list(pdf["id"]) == list(range(1, 11))
        assert np.allclose(pdf["rank"].to_numpy(), golden, atol=1e-6)
    finally:
        g.unpersist()


def test_header(spark, tmp_path):
    p = str(tmp_path / "h.mtx")
    _write(p, "real skew-symmetric", 7, [(1, 2)])
    hdr = read_mtx_header(spark, p)
    assert hdr["skew_symmetric"] and not hdr["symmetric"]
    assert hdr["n"] == 7 and hdr["nnz"] == 1


def test_read_skew_symmetric_negates_weight(spark, tmp_path):
    """MatrixMarket skew-symmetric: A[j,i] = -A[i,j] — the implied reverse
    edge carries the NEGATED weight. (The reference folds skew into plain
    symmetric and copies the weight unchanged, mtx.hxx:42,70-71;
    negate_skew=False mirrors that.)"""
    p = str(tmp_path / "sk.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("3 3 2\n")
        f.write("2 1 1.5\n")
        f.write("3 1 -2.0\n")
    e, v, hdr = read_mtx(spark, p, weighted=True)
    assert hdr["skew_symmetric"] and not hdr["symmetric"]
    got = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    assert got == {(2, 1): 1.5, (1, 2): -1.5, (3, 1): -2.0, (1, 3): 2.0}
    assert v.count() == 3

    # reference-compat mode: reverse edge keeps the original weight
    e2, _, _ = read_mtx(spark, p, weighted=True, negate_skew=False)
    got2 = {(r["src"], r["dst"]): r["weight"] for r in e2.collect()}
    assert got2 == {(2, 1): 1.5, (1, 2): 1.5, (3, 1): -2.0, (1, 3): -2.0}
