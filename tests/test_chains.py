"""Redirect/alias chain resolution (plans/chains.py): pointer doubling vs
a pure-Python chain follower, cycle handling, edge rewriting, and the
O(log L) round count."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark.plans.chains import (
    resolve_chains,
    rewrite_edges,
)


def _follow(mapping: dict, src: int):
    cur, hops = mapping[src], 1
    while cur in mapping:
        cur = mapping[cur]
        hops += 1
    return cur, hops


def _df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]), "src long, dst long")


def test_chain_resolution_matches_follower(spark):
    # a long chain (1000->999->...->0), a star (all -> 5000), a tree of
    # chains merging, and isolated one-hop aliases
    pairs = [(i, i - 1) for i in range(1, 1001)]
    pairs += [(i, 5000) for i in range(6000, 6050)]
    pairs += [(7000, 7001), (7001, 7002), (7003, 7002)]
    mapping = dict(pairs)
    out = resolve_chains(_df(spark, pairs)).toPandas()
    assert len(out) == len(pairs)
    assert out["resolved"].all()
    got = {r.src: (r.target, r.hops) for r in out.itertuples()}
    for s in mapping:
        assert got[s] == _follow(mapping, s), s


def test_doubling_round_count(spark):
    # chain of length 64 resolves within ceil(log2 64) + 1 = 7 rounds;
    # assert the doubling actually compresses by giving it only 8 rounds
    pairs = [(i, i - 1) for i in range(1, 65)]
    out = resolve_chains(_df(spark, pairs), max_rounds=8).toPandas()
    assert out["resolved"].all()
    assert out.set_index("src")["target"].eq(0).all()


def test_cycle_marked_unresolved(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (10, 1), (20, 21)]
    out = resolve_chains(_df(spark, pairs), max_rounds=6).toPandas()
    got = out.set_index("src")
    # pure-cycle members never resolve
    assert not got.loc[1, "resolved"]
    assert not got.loc[2, "resolved"]
    assert not got.loc[3, "resolved"]
    # a chain INTO a cycle is also unresolvable (terminal never leaves the
    # domain); the acyclic alias resolves
    assert not got.loc[10, "resolved"]
    assert got.loc[20, "resolved"] and got.loc[20, "target"] == 21
    # contract: hops is NULL exactly where resolved=false (a doubling
    # counter would otherwise leak a ~2^rounds artifact), and a real
    # count where resolved=true
    assert got.loc[[1, 2, 3, 10], "hops"].isna().all()
    assert got.loc[20, "hops"] == 1


def test_rewrite_edges_canonicalizes(spark):
    # aliases 10->1, 11->10 (2-hop), canonical vertices 1,2,3
    mapping = _df(spark, [(10, 1), (11, 10)])
    resolved = resolve_chains(mapping)
    edges = _df(spark, [(10, 2), (11, 2), (2, 11), (3, 10), (1, 2), (10, 1)])
    out = rewrite_edges(edges, resolved).toPandas()
    got = set(map(tuple, out[["src", "dst"]].itertuples(index=False)))
    # 10,11 -> 1; (10,1) collapses to a self-loop and is dropped
    assert got == {(1, 2), (2, 1), (3, 1)}


def test_canonicalize_then_pagerank_end_to_end(spark):
    # redirect collapse composes with the ranking pipeline: rewritten
    # edges build a valid normalized graph and ranks still sum to 1
    from pyspark.sql import functions as F

    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        PageRankOptions,
        pagerank,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") % 100).cast("long").alias("dst")).distinct()
    mapping = (edges.filter(F.col("dst") < F.col("src"))
               .groupBy("src").agg(F.max("dst").alias("dst")))
    resolved = resolve_chains(mapping)
    canon = rewrite_edges(edges, resolved)
    # every alias source vanished from the edge table
    aliases = {r.src for r in resolved.collect()}
    remaining = canon.select(F.col("src").alias("v")).unionByName(
        canon.select(F.col("dst").alias("v"))).distinct()
    assert not aliases & {r.v for r in remaining.collect()}
    g = build_graph(canon)
    res = pagerank(g, PageRankOptions(tolerance=0.0, max_iterations=5))
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-12
    g.unpersist()
