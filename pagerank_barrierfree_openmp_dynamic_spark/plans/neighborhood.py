"""Neighborhood function N(t) and effective diameter — the HyperBall /
HyperANF measurement (Boldi-Rosa-Vigna, "HyperANF: approximating the
neighbourhood function of very large graphs on a budget"; the metric behind
the web bowtie paper's "19 degrees of separation"). Not a reference
operator (the reference is PageRank-only) — part of this engine's web-graph
kernel shelf, like SCC/bowtie (``plans/scc.py``).

``N(t)`` = number of ordered pairs ``(v, u)`` with ``dist(v, u) <= t``
(self-pairs included, so ``N(0) = |V|``). The per-vertex ball sets satisfy
``ball_t(v) = ball_{t-1}(v) ∪ ⋃_{v→u} ball_{t-1}(u)`` — a monotone
union fixpoint, the same execution shape as the CC/LPA dense kernels, with
a per-vertex SET SUMMARY instead of an int64 label:

- ``mode="exact"``: packed uint64 bitsets, O(n²/8) state — the
  test/oracle tool (FP-free, driver-checked vs a recursive-CTE SQL oracle
  at sf0.01). Bounded to small graphs by construction.
- ``mode="hll"``: HyperLogLog registers, ``2**b`` bytes per vertex
  (b=6 → 64 B/vertex → 6.4 MB broadcast at 100k vertices, 6.4 GB at 1e8 —
  the same documented driver O(N) bound as the rank vectors). Union is
  elementwise register max; estimates carry HLL's ~1.04/√(2^b) relative
  error with linear-counting small-range correction.
- :func:`neighborhood_function_sharded`: the beyond-broadcast path — the
  SAME HLL registers kept as a sharded DataFrame column; each round is a
  co-partitionable edges⋈state join plus a map-side-combinable
  per-register max aggregation (2^b JVM ``max`` columns, no Python in the
  loop after init). Register-exact vs the dense HLL kernel, so the two
  paths cross-check each other bit-for-bit.

Both dense kernels run one narrow ``mapInPandas`` job per round over the
reverse (src-residue) resident slices (``_load_rslice`` — the hub-gather
slice pair of ``hits_arrow``); no edge bytes move after warmup.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..session import adaptive_execution, eager_state
from .pagerank_arrow import DenseGraph, _load_rslice, _load_slice

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of vertex ids (splitmix64 finalizer) —
    uint64 arithmetic wraps, which is the point."""
    x = x.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (numpy<2 has no bitwise_count /
    clz): 6 doubling rounds."""
    w = w.copy()
    bl = np.zeros(w.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (_U64(1) << _U64(s))
        bl[m] += s
        w[m] >>= _U64(s)
    bl[w > np.uint64(0)] += 1
    return bl


def hll_init(ids: np.ndarray, b: int) -> np.ndarray:
    """(n, 2^b) uint8 register matrix for singleton balls {id}: register
    ``hash & (2^b - 1)`` holds ``rank`` = leading-zero count of the
    remaining ``64-b`` hash bits, plus one. Depends only on the ORIGINAL
    vertex id, so the dense and sharded paths agree register-for-register
    regardless of index assignment."""
    if not 4 <= b <= 14:
        raise ValueError(f"b must be in [4, 14], got {b}")
    R = 1 << b
    h = _splitmix64(np.asarray(ids))
    idx = (h & _U64(R - 1)).astype(np.int64)
    w = h >> _U64(b)
    rank = (64 - b) - _bit_length_u64(w) + 1  # w==0 -> 64-b+1
    regs = np.zeros((len(ids), R), dtype=np.uint8)
    regs[np.arange(len(ids)), idx] = rank.astype(np.uint8)
    return regs


def hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Per-row HLL cardinality estimates with the standard small-range
    (linear counting) correction — same constants as the original paper
    (and as the JVM-side SQL replica in the sharded path)."""
    R = regs.shape[1]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(R, 0.7213 / (1 + 1.079 / R))
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    e = alpha * R * R / inv
    v = (regs == 0).sum(axis=1)
    lin = R * np.log(R / np.maximum(v, 1))
    return np.where((e <= 2.5 * R) & (v > 0), lin, e)


def _ball_union_fn(resident_dir: str, epoch: str, n_slices: int, state_bc,
                   exact: bool, direction: str = "out"):
    """One ball-expansion round for slice ``s``. ``direction="out"``:
    owned rows fold in the summaries of their OUT-neighbors (reverse
    src-residue slice) — balls grow along edges, ``ball_t(v) = {u :
    d(v,u) <= t}``. ``direction="in"``: owned rows fold their
    IN-neighbors' summaries (base dst-residue slice) — balls grow against
    edges, ``ball_t(v) = {u : d(u,v) <= t}`` (the orientation harmonic
    centrality needs). ``bitwise_or.at`` / ``maximum.at`` accumulate
    correctly under duplicate indices."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = state_bc.value
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                seg = state[s::P].copy()
                if direction == "out":
                    own_idx, nbr_idx = _load_rslice(resident_dir, epoch, s)
                else:
                    nbr_idx, own_idx, _w, _d = _load_slice(
                        resident_dir, epoch, s)
                if len(own_idx):
                    own = np.asarray(own_idx) // P
                    if exact:
                        np.bitwise_or.at(seg, own, state[np.asarray(nbr_idx)])
                    else:
                        np.maximum.at(seg, own, state[np.asarray(nbr_idx)])
                yield pd.DataFrame({"slice": [s], "seg": [seg.tobytes()]})

    return fn


def _popcount_rows(bits: np.ndarray) -> np.ndarray:
    return np.unpackbits(bits.view(np.uint8), axis=1).sum(
        axis=1, dtype=np.int64)


def _sweep_ball_summaries(graph, dense, max_t, mode, b, direction,
                          on_round) -> DenseGraph:
    """The monotone ball-summary fixpoint shared by the neighborhood /
    harmonic / closeness kernels: initialize singleton summaries (packed
    bitsets or HLL registers), then one narrow ``mapInPandas`` job per
    round until ``max_t`` or the summaries stop changing. Calls
    ``on_round(t, counts, converged)`` once per round — ``counts`` is the
    float64 per-vertex ball-size vector (exact popcounts in exact mode,
    which are integer-valued and FP-exact below 2^53; HLL estimates
    otherwise), ``converged=True`` marks the fixpoint round that added
    nothing. Returns the DenseGraph (caller reads ``.ids``); a locally
    constructed one is unpersisted before returning."""
    if mode not in ("exact", "hll"):
        raise ValueError(f"mode must be 'exact' or 'hll', got {mode!r}")
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    dg = dense or DenseGraph(graph)
    if dg.overlays:
        raise ValueError(
            "neighborhood kernels need gen-0 slices — rebuild the dense "
            "view via build_graph + DenseGraph after applying batches")
    dg.materialize()
    if direction == "out":
        dg.materialize_reverse()
    spark = graph.edges.sparkSession
    sc = spark.sparkContext
    n, P = dg.n, dg.n_slices
    slice_df = spark.range(0, P, 1, P)

    exact = mode == "exact"
    if exact:
        width = (n + 63) // 64
        state = np.zeros((n, width), dtype=np.uint64)
        state[np.arange(n), np.arange(n) >> 6] = (
            _U64(1) << (np.arange(n, dtype=np.uint64) & _U64(63)))
        dtype = np.uint64
        counts = _popcount_rows(state).astype(np.float64)
    else:
        width = 1 << b
        state = hll_init(dg.ids, b)
        dtype = np.uint8
        counts = hll_estimate(state)

    on_round(0, counts, False)
    t, limit = 0, max_t if max_t is not None else n
    try:
        with adaptive_execution(spark, False):
            while t < limit:
                state_bc = sc.broadcast(state)
                parts = slice_df.mapInPandas(
                    _ball_union_fn(dg.resident_dir, dg.epoch, P, state_bc,
                                   exact, direction),
                    "slice int, seg binary",
                ).toPandas()
                new = np.empty_like(state)
                for s, blob in zip(parts["slice"], parts["seg"]):
                    new[int(s)::P] = np.frombuffer(
                        blob, dtype=dtype).reshape(-1, width)
                state_bc.destroy()
                t += 1
                new_counts = (_popcount_rows(new).astype(np.float64)
                              if exact else hll_estimate(new))
                converged = np.array_equal(new, state)
                on_round(t, new_counts, converged)
                if converged:
                    break
                state = new
    finally:
        if dense is None:
            dg.unpersist()
    return dg


def neighborhood_function(
    graph,
    max_t: Optional[int] = None,
    mode: str = "exact",
    b: int = 6,
    *,
    dense: Optional[DenseGraph] = None,
) -> DataFrame:
    """DataFrame ``(t int, n_pairs)`` for ``t = 0..T``: ordered pairs
    within distance ``t``. ``T`` is ``max_t`` if given, else the fixpoint
    (summaries stop changing — for HLL that is the standard HyperANF stop,
    which may land one round early when new ball members happen not to
    raise any register). ``n_pairs`` is ``long`` (exact counts) in exact
    mode and ``double`` (HLL estimates) in hll mode."""
    exact = mode == "exact"
    rows: list[tuple[int, float | int]] = []

    def on_round(t: int, counts: np.ndarray, converged: bool) -> None:
        if converged:
            return  # fixpoint round added nothing: N(t) = N(t-1)
        total = counts.sum()
        rows.append((t, int(total) if exact else float(total)))

    _sweep_ball_summaries(graph, dense, max_t, mode, b, "out", on_round)
    if max_t is not None:
        # N(t) is constant past the fixpoint — pad so a fixed-t query has
        # a stable shape regardless of where the graph's diameter falls
        while len(rows) <= max_t:
            rows.append((len(rows), rows[-1][1]))
    kind = "long" if exact else "double"
    return graph.edges.sparkSession.createDataFrame(
        rows, f"t int, n_pairs {kind}")


def effective_diameter(
    graph,
    alpha: float = 0.9,
    mode: str = "exact",
    b: int = 6,
    *,
    dense: Optional[DenseGraph] = None,
) -> float:
    """Smallest (interpolated) ``t`` such that ``N(t) >= alpha * N(∞)`` —
    HyperANF's effective-diameter definition with linear interpolation
    between the straddling rounds."""
    nf = neighborhood_function(graph, None, mode, b, dense=dense).toPandas()
    nf = nf.sort_values("t").reset_index(drop=True)
    target = alpha * float(nf["n_pairs"].iloc[-1])
    vals = nf["n_pairs"].to_numpy(dtype=np.float64)
    if vals[0] >= target:
        return 0.0
    i = int(np.argmax(vals >= target))
    lo, hi = vals[i - 1], vals[i]
    return float(i - 1 + (target - lo) / (hi - lo)) if hi > lo else float(i)


def harmonic_centrality(
    graph,
    max_t: Optional[int] = None,
    mode: str = "exact",
    b: int = 6,
    direction: str = "in",
    *,
    dense: Optional[DenseGraph] = None,
) -> DataFrame:
    """Harmonic centrality ``H(v) = Σ_{u≠v, d finite} 1/d(u,v)`` — the
    centrality Boldi & Vigna's "Axioms for centrality" singles out as the
    one ranking that satisfies all three axioms on arbitrary directed
    graphs (their web-graph runs rank pages with exactly this), computed
    from the SAME per-vertex ball summaries as :func:`neighborhood_function`:

        H(v) = Σ_t (|B_t(v)| - |B_{t-1}(v)|) · (1/t)

    since the ball delta at round t counts the vertices at distance
    exactly t. ``direction="in"`` (default) grows balls AGAINST edges
    (base dst-residue slices), giving the standard incoming-distance
    centrality; ``direction="out"`` grows along edges (reverse slices),
    giving the outward variant Σ 1/d(v,u).

    ``mode="exact"`` (packed bitsets, O(n²/8) state) is the test/oracle
    tool — FP-reproducible because each round contributes the INTEGER
    count times ``1.0/t``, matching the driver SQL oracle's
    ``COUNT(*) * (1.0/d)`` bit-for-bit. ``mode="hll"`` scales with
    2^b bytes/vertex; per-round deltas are clamped at 0 (the
    linear-counting switch can wiggle estimates) and carry HLL's
    ~1.04/√(2^b) relative error. Runs to ``max_t`` if given, else the
    ball fixpoint. Returns ``(id long, harmonic double)``."""
    return ball_centralities(graph, max_t, mode, b, direction,
                             dense=dense).select("id", "harmonic")


def ball_centralities(
    graph,
    max_t: Optional[int] = None,
    mode: str = "exact",
    b: int = 6,
    direction: str = "in",
    *,
    dense: Optional[DenseGraph] = None,
) -> DataFrame:
    """Every per-vertex distance-distribution centrality the ball
    summaries support, from ONE sweep — the ball delta at round t counts
    the vertices at distance exactly t, so

        harmonic   H(v) = Σ_t Δ|B_t(v)| · (1/t)
        total_dist S(v) = Σ_t Δ|B_t(v)| · t
        reachable  r(v) = |B_T(v)|                (includes v itself)
        closeness  (r-1)/S  — per-component (disconnected-safe) form;
                   0 when S = 0 (nothing (co)reachable)
        lin        r²/S — Lin's index (Lin 1976; the variant Boldi &
                   Vigna's "Axioms for centrality" recommends over raw
                   closeness because it weights by reachable-set size),
                   with their convention lin = 1 when S = 0

    ``direction="in"`` (default) uses incoming distances d(u,v) — the
    standard centrality-of-a-target; ``"out"`` uses d(v,u). Exact mode is
    FP-reproducible (integer counts; one double division per vertex at
    the end — mirrored by the driver SQL oracle); hll mode clamps
    per-round deltas at 0 and carries HLL's ~1.04/√(2^b) relative error.
    Runs to ``max_t`` if given, else the ball fixpoint. Returns
    ``(id long, harmonic, reachable, total_dist, closeness, lin)`` — all
    value columns double, so exact and hll modes share a schema."""
    prev: list[np.ndarray] = []
    h: list[np.ndarray] = []
    dist_sum: list[np.ndarray] = []
    final: list[np.ndarray] = []

    def on_round(t: int, counts: np.ndarray, converged: bool) -> None:
        if t == 0:
            prev.append(counts)
            h.append(np.zeros(len(counts)))
            dist_sum.append(np.zeros(len(counts)))
            final.append(counts)
            return
        delta = np.maximum(counts - prev[0], 0.0)
        h[0] += delta * (1.0 / t)
        dist_sum[0] += delta * float(t)
        prev[0] = counts
        final[0] = counts

    dg = _sweep_ball_summaries(graph, dense, max_t, mode, b, direction,
                               on_round)
    r, s = final[0], dist_sum[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        closeness = np.where(s > 0, (r - 1.0) / s, 0.0)
        lin = np.where(s > 0, r * r / s, 1.0)
    return graph.edges.sparkSession.createDataFrame(
        pd.DataFrame({"id": dg.ids, "harmonic": h[0], "reachable": r,
                      "total_dist": s, "closeness": closeness, "lin": lin}))


def closeness_centrality(
    graph,
    max_t: Optional[int] = None,
    mode: str = "exact",
    b: int = 6,
    direction: str = "in",
    *,
    dense: Optional[DenseGraph] = None,
) -> DataFrame:
    """Closeness and Lin centrality from the same per-vertex ball
    summaries as :func:`harmonic_centrality` — the ball delta at round t
    counts the vertices at distance exactly t, so

        S(v) = Σ_t t · (|B_t(v)| - |B_{t-1}(v)|)   (total distance)
        r(v) = |B_T(v)|                             (reachable, incl. v)

    Per-vertex output columns (all double so exact and hll modes share a
    schema):

    - ``reachable`` = r(v), ``total_dist`` = S(v);
    - ``closeness`` = (r-1)/S — the per-component (disconnected-safe)
      closeness; 0 when S = 0 (nothing (co)reachable);
    - ``lin`` = r²/S — Lin's index (Lin 1976; the variant Boldi & Vigna's
      "Axioms for centrality" recommends over raw closeness on the web
      graph because it weights by the reachable-set size), with their
      convention lin = 1 when S = 0.

    ``direction="in"`` (default) uses incoming distances d(u,v) — the
    standard centrality-of-a-target; ``"out"`` uses d(v,u). Exact mode is
    FP-reproducible (integer counts, one double division at the end —
    mirrored by the driver SQL oracle); hll mode clamps per-round deltas
    at 0 and carries HLL's ~1.04/√(2^b) relative error. Runs to ``max_t``
    if given, else the ball fixpoint."""
    return ball_centralities(graph, max_t, mode, b, direction, dense=dense) \
        .select("id", "reachable", "total_dist", "closeness", "lin")


def neighborhood_function_sharded(
    graph,
    max_t: int,
    b: int = 6,
) -> DataFrame:
    """The beyond-broadcast N(t): HLL registers as a sharded DataFrame
    column, never collected.

    Per round: one edges⋈state join shuffled on the state key (adj keeps
    its persisted src-partitioning — on a real cluster this co-partitions
    like the join-agg PageRank scatter) and one hash aggregation of 2^b
    JVM ``max`` columns (map-side combinable, no Python). The per-round
    estimate total is a JVM higher-order-function fold over the register
    array — same constants as :func:`hll_estimate`, so the sharded path is
    register-exact vs the dense kernel and estimate-equal up to summation
    order. State frames are pinned via ``eager_state`` (real statistics +
    truncated lineage — see that docstring for the Spark 4 size-estimate
    blowup this avoids in iterative joins)."""
    R = 1 << b
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst")

    def _init_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            regs = hll_init(ids, b)
            yield pd.DataFrame(
                {"id": ids, "regs": [r.astype(np.int32).tolist()
                                     for r in regs]})

    state = eager_state(graph.vertices.select("id").mapInPandas(
        _init_fn, "id long, regs array<int>"))

    def _estimate_total(df: DataFrame) -> float:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
            R, 0.7213 / (1 + 1.079 / R))
        inv = F.aggregate(
            "regs", F.lit(0.0),
            lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")))
        zeros = F.aggregate(
            "regs", F.lit(0),
            lambda acc, r: acc + F.when(r == 0, 1).otherwise(0))
        per = df.select(inv.alias("inv"), zeros.alias("v"))
        e_raw = F.lit(alpha * R * R) / F.col("inv")
        e_lin = F.lit(float(R)) * F.log(F.lit(float(R)) /
                                        F.greatest(F.col("v"), F.lit(1)))
        est = F.when((e_raw <= 2.5 * R) & (F.col("v") > 0), e_lin) \
            .otherwise(e_raw)
        return float(per.agg(F.sum(est)).collect()[0][0])

    rows = [(0, _estimate_total(state))]
    with adaptive_execution(spark, False):
        for t in range(1, max_t + 1):
            contrib = (
                edges.join(state, edges.dst == state.id)
                .select(edges.src.alias("id"), "regs")
            )
            merged = (
                state.select("id", "regs").unionByName(contrib)
                .groupBy("id")
                .agg(F.array(*[F.max(F.col("regs")[i]) for i in range(R)])
                     .alias("regs"))
            )
            state = eager_state(merged)
            rows.append((t, _estimate_total(state)))
    return spark.createDataFrame(rows, "t int, n_pairs double")
