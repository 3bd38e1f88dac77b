"""Fault injection (reference ``runSleepFailures``/``runCrashFailures``,
``/root/reference/main.cxx:137-170``): crash faults are recovered by Spark
task retry with bit-identical ranks; sleep faults delay tasks without
changing results. The crash path needs a retry-enabled master
(``local[N,F]``), which cannot coexist with the session-scoped fixture's
``local[32]`` JVM — so the full experiment runs in a subprocess via
``scripts/fault_experiment.py`` (also the recorded-evidence entrypoint)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fault_draw_is_deterministic_and_uniformish():
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        fault_draw,
    )

    a = [fault_draw(7, it, s) for it in range(1, 11) for s in range(32)]
    b = [fault_draw(7, it, s) for it in range(1, 11) for s in range(32)]
    assert a == b
    assert all(0.0 <= u < 1.0 for u in a)
    # distinct (seed, it, s) draws are distinct in practice
    assert len(set(a)) == len(a)
    # a different seed gives a different sequence
    c = [fault_draw(8, it, s) for it in range(1, 11) for s in range(32)]
    assert c != a
    # roughly uniform: mean within [0.4, 0.6] over 320 draws
    assert 0.4 < float(np.mean(a)) < 0.6


def test_sleep_faults_do_not_change_ranks(spark):
    """Sleep injection in the shared session (no retries needed): faulted
    run is slower but rank-identical."""
    from pagerank_barrierfree_openmp_dynamic_spark import (
        PageRankOptions,
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark import datagen
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        DenseGraph,
        pagerank_arrow,
    )

    n = 200
    g = build_graph(
        spark.createDataFrame(datagen.synth_edges(n, seed=3),
                              schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    try:
        o0 = PageRankOptions(tolerance=0.0, max_iterations=5,
                             metrics_level="none")
        oS = PageRankOptions(tolerance=0.0, max_iterations=5,
                             metrics_level="none", fault_sleep_prob=0.5,
                             fault_sleep_ms=20, fault_seed=11)
        r0 = pagerank_arrow(g, o0, dense=dense, resident=True)
        rS = pagerank_arrow(g, oS, dense=dense, resident=True)
        p0 = r0.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        pS = rS.ranks.toPandas().sort_values("id")["rank"].to_numpy()
        assert np.array_equal(p0, pS)
    finally:
        dense.unpersist()
        g.unpersist()


def test_crash_faults_need_retries_error(spark):
    """With the session's local[32] master (maxFailures=1) a crash-fault
    run is misconfiguration — the engine refuses upfront instead of dying
    mid-job with a task-failure stack."""
    from pagerank_barrierfree_openmp_dynamic_spark import (
        PageRankOptions,
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark import datagen
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        DenseGraph,
        pagerank_arrow,
    )

    n = 50
    g = build_graph(
        spark.createDataFrame(datagen.synth_edges(n, seed=4),
                              schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    dense = DenseGraph(g).materialize()
    try:
        o = PageRankOptions(tolerance=0.0, max_iterations=2,
                            metrics_level="none", fault_crash_prob=0.5)
        with pytest.raises(ValueError, match="task retries"):
            pagerank_arrow(g, o, dense=dense, resident=True)
    finally:
        dense.unpersist()
        g.unpersist()


def test_crash_retry_recovers_bit_identical():
    """End-to-end crash experiment in a retry-enabled subprocess JVM:
    injected task crashes are retried and ranks match the fault-free run
    FP-exactly (the script asserts Linf == 0.0 internally)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fault_experiment.py"),
         "4", "300000", "5", "7"],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    summary = [r for r in lines if r.get("metric") == "fault_experiment"]
    assert summary, out.stdout[-2000:]
    s = summary[0]
    assert s["crash"]["injected"] > 0
    assert s["crash"]["linf"] == 0.0
