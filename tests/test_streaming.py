"""Structured Streaming skin: a stream of edge-batch files drives
incremental re-ranking; final ranks equal golden static ranks on the final
edge set."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions
from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
    IncrementalPageRank,
    stream_batches,
)

from oracle import pagerank_oracle


def test_streamed_batches_converge_to_golden(spark, tmp_path):
    n = 150
    edges_pdf = datagen.synth_edges(n, seed=17)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    engine = IncrementalPageRank(
        g, PageRankOptions(tolerance=1e-9, metrics_level="none"))

    # three sequential batches: delete some edges, insert some new ones
    rng = np.random.default_rng(8)
    es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
    batch_dir = tmp_path / "batches"
    batch_dir.mkdir()
    for b in range(3):
        cur = sorted(es)
        idx = rng.choice(len(cur), size=5, replace=False)
        dels = [cur[i] for i in idx]
        ins = []
        for _ in range(5):
            s = int(rng.integers(0, n))
            t = (s + 1 + int(rng.integers(0, n - 1))) % n
            ins.append((s, t))
        pdf = pd.DataFrame(
            [(s, t, "del") for s, t in dels] + [(s, t, "ins") for s, t in ins],
            columns=["src", "dst", "op"],
        )
        pdf.to_parquet(batch_dir / f"batch_{b}.parquet")
        es -= set(dels)
        es |= set(ins)

    q = stream_batches(
        spark, str(batch_dir), engine, str(tmp_path / "ckpt"),
        available_now=True)
    q.awaitTermination(300)

    golden, _ = pagerank_oracle(n, sorted(es), tol=1e-14)
    pdf = engine.ranks.toPandas().sort_values("id")
    assert np.allclose(pdf["rank"].to_numpy(), golden, atol=1e-6)
    # one incremental result per micro-batch + the initial static run.
    # availableNow may coalesce the three files into fewer micro-batches;
    # at least one incremental update must have happened.
    assert len(engine.history) >= 2
    try:
        g.unpersist()
    except Exception:
        pass
