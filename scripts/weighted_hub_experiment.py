#!/usr/bin/env python
"""Scale evidence for the DISTRIBUTED weighted batch replay (VERDICT r4
weak #1 / task #1): a weighted dynamic batch that touches a web-scale hub
source (default 10^7 out-edges) must replay the hub's adjacency as a
distributed pass — the old implementation collected every touched source's
full adjacency to the driver (``toPandas``) and replayed it in Python,
which at hub degree 10^7-10^8 is a driver OOM, not a slowdown.

Protocol (one JSON line per step, BENCH/weighted_hub_r05.jsonl):
  1. Build a weighted graph: one hub vertex with HUB_DEG out-edges plus a
     seeded skewed background (JVM-generated, no driver data).
  2. Materialize the weighted dense index.
  3. Apply a small batch (K ins + K dels) TOUCHING THE HUB via
     ``apply_batch_dense`` — timed; the replay re-normalizes all HUB_DEG
     sibling transition weights worker-side (``DenseGraph.apply_delta_df``).
  4. Same-size batch touching only low-degree sources — timed (the
     control: replay cost tracks Σ degree(touched), not |V| or |E|).
  5. Parity: 3-iteration weighted PageRank on the delta-overlay index vs
     a from-scratch rebuild of the updated graph (fresh dense index) —
     L_inf must be FP-level (the reference's golden-check discipline,
     main.cxx:197-205, applied to the DML path).

Usage: python scripts/weighted_hub_experiment.py [CPUS] [HUB_DEG] [BG_EDGES]
Defaults: 32, 10_000_000, 40_000_000.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.operators.batch import (  # noqa: E402
    apply_batch_dense,
)
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (  # noqa: E402
    PageRankOptions,
)
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (  # noqa: E402
    DenseGraph,
    pagerank_arrow,
)

HUB = 0


def log(**kw):
    print(json.dumps(kw), flush=True)


def ranks_np(res) -> np.ndarray:
    pdf = res.ranks.toPandas().sort_values("id")
    return pdf["rank"].to_numpy()


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    bg_edges = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000_000
    spark = get_spark(app_name="weighted-hub", cpus=cpus)
    n = max(hub_deg + 1, bg_edges // 8)

    # hub: vertex 0 -> 1..hub_deg; background: skewed random, all weighted
    w_of = lambda c: (1.0 + (F.abs(F.xxhash64(c)) % 100) / 100.0)  # noqa: E731
    hub = spark.range(1, hub_deg + 1).select(
        F.lit(HUB).cast("long").alias("src"), F.col("id").alias("dst"),
        w_of(F.col("id") + 7).alias("weight"))
    h1 = F.abs(F.xxhash64(F.col("id")))
    h2 = F.abs(F.xxhash64(F.col("id") + 1_000_000_007))
    bg = spark.range(bg_edges).select(
        (h1 % (n - 1) + 1).alias("src"),  # background never re-sources the hub
        (h2 % n).alias("dst"), w_of(F.col("id")).alias("weight"))

    t = time.monotonic()
    g = build_graph(hub.unionByName(bg), weight_col="weight")
    dense = DenseGraph(g).materialize()
    log(step="build", n=g.num_vertices, m=g.num_edges, cpus=cpus,
        hub_deg=hub_deg, seconds=round(time.monotonic() - t, 3))

    rng = np.random.default_rng(7)
    k = 500

    def mk_batch(srcs: np.ndarray) -> "pd.DataFrame":
        # per source: one deletion of a (probably) existing edge and one
        # insertion of a fresh one — every src's Σ(out-weights) changes,
        # forcing the full-adjacency re-normalization replay
        dst_del = rng.integers(1, hub_deg + 1, size=len(srcs))
        dst_ins = rng.integers(0, n, size=len(srcs))
        return pd.DataFrame({
            "src": np.concatenate([srcs, srcs]),
            "dst": np.concatenate([dst_del, dst_ins]),
            "weight": np.full(2 * len(srcs), 2.5),
            "op": ["del"] * len(srcs) + ["ins"] * len(srcs),
        })

    # 4 (control first so the hub run can't warm caches for it):
    cold_srcs = rng.integers(1, n, size=k, dtype=np.int64)
    batch_lo = spark.createDataFrame(
        mk_batch(cold_srcs), schema="src long, dst long, weight double, op string")
    t = time.monotonic()
    g_lo, dense_lo = apply_batch_dense(g, dense, batch_lo)
    log(step="batch_low_degree", batch_rows=2 * k,
        touched_sources=int(np.unique(cold_srcs).size),
        seconds=round(time.monotonic() - t, 3))

    # 3: batch touching the hub (plus a few low-degree sources for realism)
    hub_srcs = np.concatenate([np.full(20, HUB, dtype=np.int64),
                               rng.integers(1, n, size=k - 20, dtype=np.int64)])
    batch_hi = spark.createDataFrame(
        mk_batch(hub_srcs), schema="src long, dst long, weight double, op string")
    t = time.monotonic()
    g2, dense2 = apply_batch_dense(g_lo, dense_lo, batch_hi)
    log(step="batch_touching_hub", batch_rows=2 * k,
        touched_sources=int(np.unique(hub_srcs).size),
        replayed_adjacency_edges=hub_deg,
        seconds=round(time.monotonic() - t, 3))

    # 5: parity vs from-scratch rebuild of the SAME final edge set
    opts = PageRankOptions(tolerance=0.0, max_iterations=3,
                           metrics_level="none")
    t = time.monotonic()
    r_overlay = pagerank_arrow(g2, opts, dense=dense2, resident=True)
    overlay_sec = round(time.monotonic() - t, 3)
    t = time.monotonic()
    g_fresh = build_graph(g2.edges, weight_col="weight")
    dense_fresh = DenseGraph(g_fresh).materialize()
    r_fresh = pagerank_arrow(g_fresh, opts, dense=dense_fresh, resident=True)
    fresh_sec = round(time.monotonic() - t, 3)
    linf = float(np.abs(ranks_np(r_overlay) - ranks_np(r_fresh)).max())
    log(step="parity_3iter", linf_overlay_vs_rebuild=linf,
        pagerank_overlay_seconds=overlay_sec,
        rebuild_plus_pagerank_seconds=fresh_sec)
    assert linf < 1e-12, f"overlay diverged from rebuild: {linf}"


if __name__ == "__main__":
    main()
