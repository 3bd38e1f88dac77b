"""Independent NumPy/pure-Python oracles (FIXTURES.md §6).

The PageRank oracle implements the reference recurrence exactly
(``/root/reference/src/pagerank.hxx:203-213`` with self-loops and
C0=(1-d)/N, L∞ stop, ``main.cxx:191`` tol-1e-100-style golden run);
CC/label-propagation/triangle oracles are brute force and exact.
"""

from __future__ import annotations

import numpy as np


def with_self_loops(n: int, edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    es = set((int(a), int(b)) for a, b in edges)
    es |= {(i, i) for i in range(n)}
    return sorted(es)


def pagerank_oracle(
    n: int,
    edges: list[tuple[int, int]],
    d: float = 0.85,
    tol: float = 1e-14,
    max_iter: int = 500,
    init: np.ndarray | None = None,
    add_self_loops: bool = True,
) -> tuple[np.ndarray, int]:
    """Golden ranks via the reference recurrence. Returns (ranks, iterations)."""
    es = with_self_loops(n, edges) if add_self_loops else sorted(set(edges))
    src = np.array([a for a, _ in es], dtype=np.int64)
    dst = np.array([b for _, b in es], dtype=np.int64)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n) if init is None else init.astype(np.float64).copy()
    c0 = (1.0 - d) / n
    it = 0
    safe_deg = np.where(deg > 0, deg, 1.0)
    while it < max_iter:
        contrib = np.where(deg[src] > 0, r[src] / safe_deg[src], 0.0)
        acc = np.zeros(n)
        np.add.at(acc, dst, contrib)
        a = c0 + d * acc
        err = np.max(np.abs(a - r))
        r = a
        it += 1
        if err < tol:
            break
    return r, it


def pagerank_general_oracle(
    n: int,
    edges: list[tuple[int, int]] | list[tuple[int, int, float]],
    d: float = 0.85,
    tol: float = 1e-14,
    max_iter: int = 500,
    init: np.ndarray | None = None,
    add_self_loops: bool = True,
    personalization: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Weighted / personalized golden ranks.

    ``edges`` tuples may carry a third weight element (default 1.0);
    duplicate (src,dst) weights SUM (the engine's parallel-edge merge rule);
    added self-loops get weight 1.0. ``personalization`` is an n-vector
    (normalized here); None = uniform 1/n. Recurrence:
    a[v] = (1-d)·p[v] + d·Σ r[u]·w(u,v)/W(u), dead-end mass ∝ p.
    """
    agg: dict[tuple[int, int], float] = {}
    for e in edges:
        a, b = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        agg[(a, b)] = agg.get((a, b), 0.0) + w
    if add_self_loops:
        for i in range(n):
            agg.setdefault((i, i), 1.0)
    items = sorted(agg.items())
    src = np.array([k[0] for k, _ in items], dtype=np.int64)
    dst = np.array([k[1] for k, _ in items], dtype=np.int64)
    wts = np.array([v for _, v in items], dtype=np.float64)
    wsum = np.zeros(n)
    np.add.at(wsum, src, wts)
    p = (np.full(n, 1.0 / n) if personalization is None
         else personalization.astype(np.float64) / personalization.sum())
    # init matches the engine's _init_ranks: uniform 1/n unless supplied
    r = np.full(n, 1.0 / n) if init is None else init.astype(np.float64).copy()
    safe = np.where(wsum > 0, wsum, 1.0)
    trans = wts / safe[src]
    dead = wsum == 0
    it = 0
    while it < max_iter:
        acc = np.zeros(n)
        np.add.at(acc, dst, r[src] * trans)
        s_dead = float(r[dead].sum())
        a = ((1.0 - d) + d * s_dead) * p + d * acc
        err = np.max(np.abs(a - r))
        r = a
        it += 1
        if err < tol:
            break
    return r, it


def cc_oracle(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Union-find; component label = min vertex id in the component."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        out[i] = find(i)
    # path compression leaves roots = min id because we always attach max->min
    return out


def lpa_oracle(n: int, edges: list[tuple[int, int]], iterations: int = 5) -> np.ndarray:
    """Synchronous LPA, tie-break = smallest label; no-neighbor keeps own."""
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        nxt = labels.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


def triangle_oracle(n: int, edges: list[tuple[int, int]]) -> tuple[int, np.ndarray]:
    """Brute force: total count + per-vertex participation counts."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, per
