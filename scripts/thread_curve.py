#!/usr/bin/env python
"""The reference's full ``runThreads`` sweep (``/root/reference/main.cxx:
127-134``: threads 1,2,4,...,MAX), re-expressed as taskset-capped
parallelism levels over ONE shared dense index — the sandbox stand-in for
a thread sweep on one node.

Each level runs scaling_run.py kernel mode (itself best-of-3 in-session
after warmup); levels are visited in ``rounds`` interleaved passes
(1,2,...,32, 1,2,...,32, ...) so a sandbox noise spike lands inside one
pass instead of biasing one level, and the per-level statistic is the
best across passes. Prints one JSON line per run plus a final summary
with speedup + efficiency vs the 1-CPU point.

Usage: python scripts/thread_curve.py [N_EDGES=90000000] [ITERS=10]
                                      [ROUNDS=2] [DEG=16] [INDEX_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_pair import run_one  # noqa: E402

LEVELS = [1, 2, 4, 8, 16, 32]


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 90_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    deg = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    index_dir = sys.argv[5] if len(sys.argv) > 5 else os.path.join(
        tempfile.gettempdir(), f"tcurve_idx_{n_edges}")
    levels = [p for p in LEVELS if p <= (os.cpu_count() or 32)]

    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        # build the dense index ONCE at full parallelism; every capped
        # level then measures supersteps against the same slice files
        run_one(os.cpu_count() or 32, n_edges, 2, "kernel", deg,
                index_dir=index_dir, taskset_cores=os.cpu_count() or 32)

    samples: dict[int, list[float]] = {p: [] for p in levels}
    for r in range(rounds):
        for p in levels:
            res = run_one(p, n_edges, iters, "kernel", deg,
                          index_dir=index_dir)
            samples[p].append(float(res["seconds"]))
            print(json.dumps({"round": r, "cpus": p, **res}), flush=True)

    best = {p: min(samples[p]) for p in levels}
    t1 = best[levels[0]]
    summary = {
        "metric": "thread_curve_best_s",
        "n_edges": n_edges,
        "iters": iters,
        "levels": {
            str(p): {
                "seconds": best[p],
                "speedup": round(t1 / best[p], 2),
                "efficiency": round(t1 / best[p] / (p / levels[0]), 3),
                "samples": samples[p],
            }
            for p in levels
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
