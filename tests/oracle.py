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


def hits_oracle(
    n: int,
    edges: list[tuple[int, int]],
    tol: float = 1e-10,
    max_iter: int = 500,
) -> tuple[np.ndarray, np.ndarray, int]:
    """L1-normalized HITS (matches plans/hits.py's recurrence exactly).
    Returns (hub, auth, iterations)."""
    es = sorted(set((int(a), int(b)) for a, b in edges))
    src = np.array([a for a, _ in es], dtype=np.int64)
    dst = np.array([b for _, b in es], dtype=np.int64)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    it = 0
    while it < max_iter:
        a_new = np.zeros(n)
        np.add.at(a_new, dst, h[src])
        s = a_new.sum()
        if s > 0:
            a_new /= s
        h_new = np.zeros(n)
        np.add.at(h_new, src, a_new[dst])
        s = h_new.sum()
        if s > 0:
            h_new /= s
        err = max(np.abs(h_new - h).max(), np.abs(a_new - a).max())
        h, a = h_new, a_new
        it += 1
        if tol > 0.0 and err <= tol:
            break
    return h, a, it


def scc_oracle(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Strongly connected components via iterative Tarjan; comp = min
    vertex id in the SCC (canonical labels, exactly comparable)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in set((int(a), int(b)) for a, b in edges):
        if a != b:
            adj[a].append(b)
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                label = min(members)
                for w in members:
                    comp[w] = label
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return comp


def coreness_oracle(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Exact k-core decomposition by iterative peeling over the undirected
    simple view (self-loops dropped, symmetrized, deduplicated)."""
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    deg = np.array([len(s) for s in nbrs], dtype=np.int64)
    core = np.zeros(n, dtype=np.int64)
    removed = np.zeros(n, dtype=bool)
    for _ in range(n):
        alive = np.where(~removed)[0]
        if len(alive) == 0:
            break
        k = deg[alive].min()
        # peel everything of minimum degree at once (standard peeling)
        while True:
            peel = [v for v in alive if not removed[v] and deg[v] <= k]
            peel = [v for v in peel if not removed[v]]
            if not peel:
                break
            for v in peel:
                removed[v] = True
                core[v] = k
                for u in nbrs[v]:
                    if not removed[u]:
                        deg[u] -= 1
            alive = np.where(~removed)[0]
            if len(alive) == 0 or deg[alive].min() > k:
                break
    return core


def bowtie_oracle(n: int, edges: list[tuple[int, int]]) -> list[str]:
    """Bowtie regions vs the largest SCC (ties: smaller canonical label):
    CORE / IN (reaches core) / OUT (reached from core) / OTHER."""
    comp = scc_oracle(n, edges)
    labs, counts = np.unique(comp, return_counts=True)
    core_lab = labs[counts == counts.max()].min()
    core = set(np.where(comp == core_lab)[0].tolist())
    fwd_adj: list[list[int]] = [[] for _ in range(n)]
    bwd_adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in set((int(a), int(b)) for a, b in edges):
        if a != b:
            fwd_adj[a].append(b)
            bwd_adj[b].append(a)

    def closure(seeds, adj):
        seen = set(seeds)
        stack = list(seeds)
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen

    fwd = closure(core, fwd_adj)
    bwd = closure(core, bwd_adj)
    out = []
    for v in range(n):
        if v in core:
            out.append("CORE")
        elif v in bwd:
            out.append("IN")
        elif v in fwd:
            out.append("OUT")
        else:
            out.append("OTHER")
    return out


def salsa_oracle(
    n: int,
    edges: list[tuple[int, int]],
    weights: list[float] | None = None,
    tol: float = 1e-10,
    max_iter: int = 500,
) -> tuple[np.ndarray, np.ndarray, int]:
    """L1-normalized SALSA (matches plans/salsa.py's recurrence exactly):
    HITS with column-stochastic walk steps — each gathered contribution is
    scaled by w(u,v)/W_out(u) (auth) resp. w(u,v)/W_in(v) (hub). Returns
    (hub, auth, iterations)."""
    if weights is None:
        es = sorted(set((int(a), int(b)) for a, b in edges))
        src = np.array([a for a, _ in es], dtype=np.int64)
        dst = np.array([b for _, b in es], dtype=np.int64)
        w = np.ones(len(es))
    else:
        agg: dict[tuple[int, int], float] = {}
        for (a, b), ww in zip(edges, weights):
            agg[(int(a), int(b))] = agg.get((int(a), int(b)), 0.0) + float(ww)
        es = sorted(agg)
        src = np.array([a for a, _ in es], dtype=np.int64)
        dst = np.array([b for _, b in es], dtype=np.int64)
        w = np.array([agg[e] for e in es])
    wout = np.zeros(n)
    np.add.at(wout, src, w)
    win = np.zeros(n)
    np.add.at(win, dst, w)
    fwd = w / wout[src]          # w(u,v)/W_out(u)
    bwd = w / win[dst]           # w(u,v)/W_in(v)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    it = 0
    while it < max_iter:
        a_new = np.zeros(n)
        np.add.at(a_new, dst, h[src] * fwd)
        s = a_new.sum()
        if s > 0:
            a_new /= s
        h_new = np.zeros(n)
        np.add.at(h_new, src, a_new[dst] * bwd)
        s = h_new.sum()
        if s > 0:
            h_new /= s
        err = max(np.abs(h_new - h).max(), np.abs(a_new - a).max())
        h, a = h_new, a_new
        it += 1
        if tol > 0.0 and err <= tol:
            break
    return h, a, it


def closeness_oracle(n: int, edges: list[tuple[int, int]],
                     max_t: int | None = None,
                     direction: str = "in"):
    """Exact closeness/Lin centrality by per-source BFS (matches
    plans/neighborhood.closeness_centrality's exact mode). Returns
    (reachable, total_dist, closeness, lin) float64 arrays: reachable
    includes the vertex itself; closeness = (r-1)/S (0 when S=0);
    lin = r^2/S (1 when S=0, Boldi-Vigna convention)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in set((int(a), int(b)) for a, b in edges):
        if a != b:
            adj[a].append(b)
    T = max_t if max_t is not None else n
    INF = n + 1
    dmat = np.full((n, n), INF, dtype=np.int64)
    for s in range(n):
        dmat[s, s] = 0
        frontier = [s]
        d = 0
        while frontier and d < T:
            d += 1
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if dmat[s, y] == INF:
                        dmat[s, y] = d
                        nxt.append(y)
            frontier = nxt
    dv = dmat.T if direction == "in" else dmat
    fin = dv <= T
    r = fin.sum(axis=1).astype(np.float64)
    s_tot = np.where(fin, dv, 0).sum(axis=1).astype(np.float64)
    closeness = np.where(s_tot > 0, (r - 1.0) / np.maximum(s_tot, 1.0), 0.0)
    lin = np.where(s_tot > 0, r * r / np.maximum(s_tot, 1.0), 1.0)
    return r, s_tot, closeness, lin


def harmonic_oracle(n: int, edges: list[tuple[int, int]],
                    max_t: int | None = None,
                    direction: str = "in") -> np.ndarray:
    """Exact harmonic centrality by per-source BFS (matches
    plans/neighborhood.harmonic_centrality's exact mode): H(v) =
    Σ_{u≠v, 0<d<=T} 1/d where d = d(u,v) for direction='in'
    (incoming distances, the standard definition), d(v,u) for 'out'.
    Accumulated as count-at-distance-t × (1.0/t), the engine's FP
    order."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in set((int(a), int(b)) for a, b in edges):
        if a != b:
            adj[a].append(b)
    T = max_t if max_t is not None else n
    # full forward-distance matrix d(s, u) by BFS from every source
    INF = n + 1
    dmat = np.full((n, n), INF, dtype=np.int64)
    for s in range(n):
        dmat[s, s] = 0
        frontier = [s]
        d = 0
        while frontier and d < T:
            d += 1
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if dmat[s, y] == INF:
                        dmat[s, y] = d
                        nxt.append(y)
            frontier = nxt
    # 'in': H(v) = Σ over u of 1/d(u,v); 'out': H(v) = Σ over u of 1/d(v,u)
    dv = dmat.T if direction == "in" else dmat
    h = np.zeros(n)
    for t in range(1, T + 1):
        h += (dv == t).sum(axis=1).astype(np.float64) * (1.0 / t)
    return h


def brandes_oracle(n: int, edges: list[tuple[int, int]],
                   sources: list[int] | None = None,
                   max_depth: int | None = None) -> np.ndarray:
    """Exact directed unweighted Brandes betweenness (Brandes 2001),
    restricted to the given sources (default: all) — raw dependency
    sums, endpoints excluded. ``max_depth`` truncates the BFS like
    plans/betweenness.betweenness_sampled."""
    from collections import deque

    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in sorted(set((int(a), int(b)) for a, b in edges)):
        if a != b:
            adj[a].append(b)
    bc = np.zeros(n)
    T = max_depth if max_depth is not None else n
    for s in (sources if sources is not None else range(n)):
        sigma = np.zeros(n)
        dist = np.full(n, -1)
        preds: list[list[int]] = [[] for _ in range(n)]
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)  # dequeue order is nondecreasing in dist
            if dist[v] >= T:
                continue  # horizon vertices are reached but not expanded
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = np.zeros(n)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        delta[s] = 0.0
        bc += delta
        bc[s] -= delta[s]
    return bc


def neighborhood_oracle(n: int, edges: list[tuple[int, int]],
                        max_t: int | None = None) -> list[tuple[int, int]]:
    """Exact neighborhood function by per-source BFS: [(t, N(t))] with
    N(t) = ordered pairs (v, u) at distance <= t, self-pairs included,
    up to max_t (or the largest finite distance)."""
    adj = [[] for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    from collections import deque

    dist_counts: dict[int, int] = {0: n}
    diam = 0
    for v in range(n):
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            for w in adj[x]:
                if w not in dist:
                    dist[w] = dist[x] + 1
                    q.append(w)
        for u, d in dist.items():
            if u != v:
                dist_counts[d] = dist_counts.get(d, 0) + 1
                diam = max(diam, d)
    limit = diam if max_t is None else max_t
    out, cum = [], 0
    for t in range(limit + 1):
        cum += dist_counts.get(t, 0)
        out.append((t, cum))
    return out


def louvain_oracle(
    n: int,
    edges: list[tuple[int, int]],
    max_passes: int = 3,
    max_sweeps: int = 10,
    gamma: float = 1.0,
    precision: int = 12,
    weights: list[float] | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Exact mirror of ``plans/louvain.py``: parity-gated synchronous
    local-move sweeps (score rounded to ``precision``, ties to the
    smallest community id, ``id % 2 == sweep % 2`` may move) + graph
    contraction. Returns (community per original vertex, per-pass
    modularity history). Must match the Spark implementation
    label-for-label. ``weights`` (aligned with ``edges``) mirrors
    ``use_weights=True``: undirected weight = sum of directed weights."""
    und: dict[tuple[int, int], float] = {}
    for i, (a, b) in enumerate(edges):
        a, b = int(a), int(b)
        if a != b:
            key = (min(a, b), max(a, b))
            if weights is None:
                und[key] = 1.0
            else:
                und[key] = und.get(key, 0.0) + float(weights[i])
    # symmetric weighted rows keyed by src: {src: {dst: w}}
    sym: dict[int, dict[int, float]] = {}
    for (a, b), w in und.items():
        sym.setdefault(a, {})[b] = sym.setdefault(a, {}).get(b, 0.0) + w
        sym.setdefault(b, {})[a] = sym.setdefault(b, {}).get(a, 0.0) + w
    two_m = sum(w for nb in sym.values() for w in nb.values())
    mapping = {i: i for i in range(n)}
    if two_m == 0.0:
        return np.arange(n, dtype=np.int64), []

    def _q(sym, lab, deg, vertices):
        intra: dict[int, float] = {}
        tot: dict[int, float] = {}
        for v in vertices:
            tot[lab[v]] = tot.get(lab[v], 0.0) + deg[v]
            for u, w in sym.get(v, {}).items():
                if lab[u] == lab[v]:
                    intra[lab[v]] = intra.get(lab[v], 0.0) + w
        return sum(intra.get(c, 0.0) / two_m - gamma * (tc / two_m) ** 2
                   for c, tc in tot.items())

    vertices = sorted(range(n))
    history: list[float] = []
    for _p in range(max_passes):
        deg = {v: sum(sym.get(v, {}).values()) for v in vertices}
        lab = {v: v for v in vertices}
        q_prev = round(_q(sym, lab, deg, vertices), precision)
        moved_total = 0
        quiet = 0
        s = 0
        while s < max_sweeps and quiet < 2:
            tot: dict[int, float] = {}
            for v in vertices:
                tot[lab[v]] = tot.get(lab[v], 0.0) + deg[v]
            new_lab = dict(lab)
            moved = 0
            for v in vertices:
                k_in: dict[int, float] = {lab[v]: 0.0}
                for u, w in sym.get(v, {}).items():
                    if u == v:
                        continue
                    c = lab[u]
                    k_in[c] = k_in.get(c, 0.0) + w
                best_c, best_s = None, None
                for c in sorted(k_in):
                    t = tot[c] - (deg[v] if c == lab[v] else 0.0)
                    score = round(k_in[c] - gamma * deg[v] * t / two_m,
                                  precision)
                    if best_s is None or score > best_s or (
                            score == best_s and c < best_c):
                        best_c, best_s = c, score
                if best_c != lab[v] and v % 2 == s % 2:
                    new_lab[v] = best_c
                    moved += 1
            s += 1
            if moved == 0:
                quiet += 1
                continue
            q_new = round(_q(sym, new_lab, deg, vertices), precision)
            if q_new < q_prev:
                # synchronous overshoot: revert the sweep, end the pass
                break
            lab, q_prev = new_lab, q_new
            moved_total += moved
            quiet = 0
        history.append(q_prev)
        if moved_total == 0:
            break
        mapping = {i: lab[c] for i, c in mapping.items()}
        new_sym: dict[int, dict[int, float]] = {}
        for v, nb in sym.items():
            cv = lab[v]
            d = new_sym.setdefault(cv, {})
            for u, w in nb.items():
                cu = lab[u]
                d[cu] = d.get(cu, 0.0) + w
        sym = new_sym
        vertices = sorted(set(lab.values()))
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        out[i] = mapping[i]
    return out, history
