#!/usr/bin/env python
"""Fault-injection experiment — the reference's ``runSleepFailures`` /
``runCrashFailures`` protocols (``/root/reference/main.cxx:137-170``,
README.md:78-123) re-expressed in Spark's failure model.

The reference injects faults into OpenMP threads: sleeping threads make
every other thread wait at the iteration barrier (the motivation for
barrier-free), and crashed threads stop processing while survivors absorb
their work — ranks survive with "almost no drop in result quality"
(README.md:110-123). Spark's unit of failure is the TASK, and the engine
inherits Spark's remedies, which are *exact* rather than best-effort:

- **crash** → task retry (``master local[N,F]`` here, ``spark.task.
  maxFailures`` on a cluster): superstep kernels are pure functions of
  (broadcast ranks, immutable mmap slice files), so a retried task
  recomputes bit-identical output. Ranks match the fault-free run
  exactly — stronger than the reference's survivors-absorb-work model,
  which degrades quality slightly.
- **sleep** → straggler tasks extend the superstep barrier. Barrier-free
  (``async_updates="slice"``, ``async_sweeps=2``) converges in ~40%
  fewer supersteps, so it exposes ~40% fewer barriers to straggle —
  the reference's "barrier-free wins under sleeps" claim, in Spark
  currency. (On a real cluster ``spark.speculation=true`` additionally
  duplicates slow tasks; see ``jobs/run_pagerank.py``.)

Faults are injected deterministically per (seed, iteration, slice) via
``PageRankOptions(fault_*)`` — the driver can predict exactly which task
attempts crash or sleep (``fault_draw``), so the experiment reports the
injected-fault count next to the measured overhead.

Usage: python scripts/fault_experiment.py [CPUS=8] [N_EDGES=2000000]
                                          [ITERS=10] [SEED=7]
Prints one JSON line per run plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    DenseGraph,
    fault_draw,
    pagerank_arrow,
)

CRASH_P = 0.15
SLEEP_P = 0.25
SLEEP_MS = 400


def _ranks(res) -> np.ndarray:
    pdf = res.ranks.toPandas().sort_values("id")
    return pdf["rank"].to_numpy()


def _run(g, dense, o_kwargs, **kw):
    t = time.monotonic()
    res = pagerank_arrow(g, PageRankOptions(metrics_level="none", **o_kwargs),
                         dense=dense, resident=True, **kw)
    return res, round(time.monotonic() - t, 3)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    # task_retries=4: three retries per task, the cluster default —
    # required for crash-fault runs (local[N] would fail the job on the
    # first injected crash)
    spark = get_spark(app_name="faults", cpus=cpus, task_retries=4)

    n_vertices = max(1, n_edges // 7)
    h1 = F.abs(F.xxhash64(F.col("id")))
    h2 = F.abs(F.xxhash64(F.col("id") + 1_000_000_007))
    dst = F.when(h1 % 10 == 0, h2 % max(1, n_vertices // 1000)).otherwise(
        h2 % n_vertices)
    raw = spark.range(n_edges).select(
        (h1 % n_vertices).alias("src"), dst.alias("dst"))
    g = build_graph(raw)
    dense = DenseGraph(g).materialize()
    P = dense.n_slices
    print(json.dumps({"graph": {"n": g.num_vertices, "m": g.num_edges,
                                "cpus": cpus, "slices": P}}), flush=True)
    rows = []

    def record(name, res, dt, extra=None):
        row = dict(run=name, iterations=res.iterations, seconds=dt,
                   **(extra or {}))
        rows.append((row, _ranks(res)))
        print(json.dumps(row), flush=True)
        return row

    # ---- crash tolerance (fixed supersteps, FP-exact comparison) ----
    fixed = dict(tolerance=0.0, max_iterations=iters)
    res0, dt0 = _run(g, dense, fixed)
    record("crash_baseline", res0, dt0)
    crashes = sum(
        1 for it in range(1, iters + 1) for s in range(P)
        if fault_draw(seed, it, s) < CRASH_P)
    resC, dtC = _run(g, dense, dict(
        **fixed, fault_crash_prob=CRASH_P, fault_seed=seed))
    linf = float(np.abs(_ranks(resC) - _ranks(res0)).max())
    record("crash_injected", resC, dtC,
           dict(injected_crashes=crashes, linf_vs_baseline=linf,
                overhead_s=round(dtC - dt0, 3)))
    assert linf == 0.0, f"crash-retried ranks differ: Linf={linf}"

    # ---- sleep faults: with-barrier vs barrier-free at tol 1e-9 ----
    conv = dict(tolerance=1e-9)
    async_kw = dict(async_updates="slice", async_sweeps=2)
    sleep_kw = dict(fault_sleep_prob=SLEEP_P, fault_sleep_ms=SLEEP_MS,
                    fault_seed=seed)
    resS0, dtS0 = _run(g, dense, conv)
    record("sleep_clean_withbarrier", resS0, dtS0)
    resS1, dtS1 = _run(g, dense, dict(**conv, **sleep_kw))
    record("sleep_faulted_withbarrier", resS1, dtS1,
           dict(overhead_s=round(dtS1 - dtS0, 3)))
    resA0, dtA0 = _run(g, dense, dict(**conv, **async_kw))
    record("sleep_clean_barrierfree", resA0, dtA0)
    resA1, dtA1 = _run(g, dense, dict(**conv, **async_kw, **sleep_kw))
    record("sleep_faulted_barrierfree", resA1, dtA1,
           dict(overhead_s=round(dtA1 - dtA0, 3)))
    # sleeps delay tasks, never change their output
    linf_s = float(np.abs(_ranks(resS1) - _ranks(resS0)).max())
    linf_a = float(np.abs(_ranks(resA1) - _ranks(resA0)).max())
    assert linf_s == 0.0 and linf_a == 0.0, (linf_s, linf_a)

    print(json.dumps({
        "metric": "fault_experiment",
        "crash": {"injected": crashes, "linf": 0.0,
                  "overhead_s": round(dtC - dt0, 3)},
        "sleep": {
            "withbarrier": {"supersteps": resS1.iterations,
                            "overhead_s": round(dtS1 - dtS0, 3)},
            "barrierfree": {"supersteps": resA1.iterations,
                            "overhead_s": round(dtA1 - dtA0, 3)},
        },
    }), flush=True)
    dense.unpersist()
    g.unpersist()


if __name__ == "__main__":
    main()
