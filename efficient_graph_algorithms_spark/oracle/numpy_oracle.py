"""Pure NumPy semantic oracles (no Spark).

Each function re-derives an algorithm's semantics at small N in the
reference's style, with the reference's tolerance discipline
(``np.allclose`` / exact match — see
``reference scripts/experiments/test_spanning_trees.py:70-76``):

- ``pagerank``: power iteration over the column-normalized adjacency,
  the reference's ``random_walk_kernel`` / ``random_walk_with_restart``
  semantics (``reference src/ega/algorithms/graph_kernels.py:66-79``)
  extended with the standard dangling-mass redistribution the reference
  leaves undefined (its column normalization divides by zero on
  dangling nodes).
- ``connected_components``: min-reachable-id, union-find à la
  ``DisjointSetADT`` (``reference src/ega/algorithms/spanning_trees.py:11-47``)
  and BFS coloring (``reference src/planar_separators/lipton_tarjan/utils.py:62-77``).
- ``label_propagation``: synchronous argmax with min-label tie-break
  (argmax cluster assignment semantics:
  ``reference src/ega/algorithms/gromov_wasserstein_graphs.py:867-919``).
- ``triangle_counts``: A² common-neighbor wedge counts
  (``reference src/ega/algorithms/graph_kernels.py:109-112``).
- ``integrate_graph_field``: dense kernel matvec, the reference's core
  primitive (``reference src/ega/algorithms/brute_force.py:32-33``).
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_ALPHA = 0.85
DEFAULT_TOL = 1e-6
DEFAULT_MAX_ITER = 200


def _edge_arrays(edges: list[tuple[int, int]] | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    return e[:, 0], e[:, 1]


def pagerank(
    edges,
    n: int,
    alpha: float = DEFAULT_ALPHA,
    tol: float = DEFAULT_TOL,
    max_iter: int = DEFAULT_MAX_ITER,
    personalization: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Directed-graph PageRank.

    r_{t+1} = (1-alpha)*p + alpha*(P^T r_t + dangling_mass * p)
    stop when L1(r_{t+1} - r_t) < tol. Returns (ranks, iterations).
    ``p`` is uniform 1/N or the personalization vector (PPR).
    """
    src, dst = _edge_arrays(edges)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    p = (
        np.full(n, 1.0 / n)
        if personalization is None
        else np.asarray(personalization, dtype=np.float64) / np.sum(personalization)
    )
    r = p.copy()
    dangling = deg == 0
    inv_deg = np.where(dangling, 0.0, 1.0 / np.maximum(deg, 1.0))
    it = 0
    for it in range(1, max_iter + 1):
        contrib = np.bincount(dst, weights=r[src] * inv_deg[src], minlength=n)
        dm = float(r[dangling].sum())
        r_new = (1.0 - alpha) * p + alpha * (contrib + dm * p)
        delta = float(np.abs(r_new - r).sum())
        r = r_new
        if delta < tol:
            break
    return r, it


def hits(
    edges,
    n: int,
    tol: float = 1e-8,
    max_iter: int = 30,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Kleinberg HITS, synchronous, L2-normalized per half-step.

    a_{t} = normalize2(A^T h_{t-1}); h_t = normalize2(A a_t).
    Stops when L1(h_t - h_{t-1}) < tol. Returns (hub, authority, iters).
    """
    src, dst = _edge_arrays(edges)
    h = np.ones(n, dtype=np.float64)
    a = np.ones(n, dtype=np.float64)
    it = 0
    for it in range(1, max_iter + 1):
        a = np.bincount(dst, weights=h[src], minlength=n)
        za = float(np.sqrt((a * a).sum()))
        if za > 0:
            a /= za
        h_new = np.bincount(src, weights=a[dst], minlength=n)
        zh = float(np.sqrt((h_new * h_new).sum()))
        if zh > 0:
            h_new /= zh
        delta = float(np.abs(h_new - h).sum())
        h = h_new
        if delta < tol:
            break
    return h, a, it


def salsa(
    edges,
    n: int,
    tol: float = 1e-8,
    max_iter: int = 30,
) -> tuple[np.ndarray, np.ndarray, int]:
    """SALSA (Lempel & Moran 2000): HITS over the row/column-stochastic
    adjacency, L1-normalized per half-step.

    a_t = normalize1(L_c^T h_{t-1}) with L_c weight 1/out(src);
    h_t = normalize1(L_r a_t) with L_r weight 1/in(dst).
    Stops when L1(h_t - h_{t-1}) < tol. Returns (hub, authority, iters).
    """
    src, dst = _edge_arrays(edges)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    in_deg = np.bincount(dst, minlength=n).astype(np.float64)
    h = np.ones(n, dtype=np.float64)
    a = np.ones(n, dtype=np.float64)
    it = 0
    for it in range(1, max_iter + 1):
        a = np.bincount(dst, weights=h[src] / out_deg[src], minlength=n)
        za = float(np.abs(a).sum())
        if za > 0:
            a /= za
        h_new = np.bincount(src, weights=a[dst] / in_deg[dst], minlength=n)
        zh = float(np.abs(h_new).sum())
        if zh > 0:
            h_new /= zh
        delta = float(np.abs(h_new - h).sum())
        h = h_new
        if delta < tol:
            break
    return h, a, it


def k_core(
    edges, k: int, max_rounds: int | None = None
) -> tuple[dict[int, int], int, bool]:
    """Synchronous k-core peel on the undirected simple graph: each
    round removes EVERY vertex whose current degree is < k, at once.
    Returns ({survivor: degree-in-survivor-subgraph}, rounds,
    converged). With max_rounds=None runs to the fixpoint (the k-core);
    a bounded run mirrors the engine's max_iter contract exactly."""
    src, dst = _edge_arrays(edges)
    adj: dict[int, set[int]] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rounds, converged = 0, False
    while max_rounds is None or rounds < max_rounds:
        doomed = [v for v, nbrs in adj.items() if len(nbrs) < k]
        rounds += 1
        if not doomed:
            converged = True
            break
        for v in doomed:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
        adj = {v: nbrs for v, nbrs in adj.items() if nbrs}
        if not adj:
            converged = True
            break
    return {v: len(nbrs) for v, nbrs in adj.items()}, rounds, converged


def connected_components(edges, n: int) -> np.ndarray:
    """component[v] = min vertex id reachable from v (undirected)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    src, dst = _edge_arrays(edges)
    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(v) for v in range(n)], dtype=np.int64)


def label_propagation(edges, n: int, max_iter: int = 50) -> tuple[np.ndarray, int]:
    """Synchronous LPA; deterministic min-label tie-break.

    new_label(v) = min over labels with max neighbor count; isolated
    vertices keep their label. Stops when no label changes (or max_iter).
    Returns (labels, rounds_run).
    """
    src, dst = _edge_arrays(edges)
    # simple undirected neighbor lists (dedup both directions — same
    # semantics as the engine's symmetrize().distinct())
    pairs = np.unique(
        np.stack(
            [np.concatenate([src, dst]), np.concatenate([dst, src])], axis=1
        ),
        axis=0,
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    s, d = pairs[:, 0], pairs[:, 1]
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    starts = np.searchsorted(s, np.arange(n))
    ends = np.searchsorted(s, np.arange(n) + 1)
    labels = np.arange(n, dtype=np.int64)
    rounds = 0
    for rounds in range(1, max_iter + 1):
        new_labels = labels.copy()
        for v in range(n):
            nb = d[starts[v] : ends[v]]
            if nb.size == 0:
                continue
            lab = labels[nb]
            uniq, cnt = np.unique(lab, return_counts=True)
            best = uniq[cnt == cnt.max()].min()
            new_labels[v] = best
        if np.array_equal(new_labels, labels):
            rounds -= 1
            break
        labels = new_labels
    return labels, rounds


def triangle_counts(edges, n: int) -> tuple[np.ndarray, int]:
    """Per-vertex and global triangle counts on the simple undirected
    graph (A² wedge semantics). Returns (per_vertex, global_count)."""
    src, dst = _edge_arrays(edges)
    und = set()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for a, b in und:  # a < b; close with c > b so each triangle counts once
        common = adj[a] & adj[b]
        for c in common:
            if c > b:
                per[a] += 1
                per[b] += 1
                per[c] += 1
                total += 1
    return per, total


def integrate_graph_field(edges, weights, field: np.ndarray, n: int) -> np.ndarray:
    """Dense gather-scatter: out[v] = sum_{(u,v)} w(u,v) * field[u]."""
    src, dst = _edge_arrays(edges)
    w = np.asarray(weights, dtype=np.float64)
    out = np.zeros((n,) + field.shape[1:], dtype=np.float64)
    np.add.at(out, dst, (w.reshape(-1, *([1] * (field.ndim - 1))) * field[src]))
    return out


def k_step_random_walk(edges, n: int, field: np.ndarray, k: int = 2) -> np.ndarray:
    """k rounds of x ← Pᵀx with P column-normalized by out-degree
    (reference random_walk_kernel semantics, graph_kernels.py:66-68)."""
    src, dst = _edge_arrays(edges)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
    x = np.asarray(field, dtype=np.float64).copy()
    for _ in range(k):
        x = np.bincount(dst, weights=x[src] * inv[src], minlength=n)
    return x


def heat_kernel_diffusion(
    edges, n: int, field: np.ndarray, t: float = 0.5, k: int = 4, weights=None
) -> np.ndarray:
    """Truncated-Taylor exp(-tL)·x on the simple undirected graph
    (reference heat_kernel semantics, graph_kernels.py:101-105).
    weights: per-input-edge weight array → weighted Laplacian
    (symmetrized by max over parallel/reversed duplicates)."""
    import math

    src, dst = _edge_arrays(edges)
    wv = np.ones(len(src)) if weights is None else np.asarray(weights, dtype=np.float64)
    und: dict[tuple[int, int], float] = {}
    for a, b, w in zip(src.tolist(), dst.tolist(), wv.tolist()):
        if a == b:
            continue
        for key in ((a, b), (b, a)):
            und[key] = max(und.get(key, 0.0), w)
    s = np.array([a for a, _ in und], dtype=np.int64)
    d = np.array([b for _, b in und], dtype=np.int64)
    w = np.array(list(und.values()), dtype=np.float64)
    deg = np.bincount(s, weights=w, minlength=n)
    x = np.asarray(field, dtype=np.float64)
    term = x.copy()
    acc = x.copy()
    for j in range(1, k + 1):
        a_term = np.bincount(d, weights=w * term[s], minlength=n)
        term = deg * term - a_term
        acc = acc + ((-t) ** j / math.factorial(j)) * term
    return acc


def diffusion_state_distance(edges, n: int, seeds: list[int], k: int = 3) -> dict[tuple[int, int], float]:
    """Pairwise DSD among seeds: L1 between rows of Σ_{j=0..k} P^j
    (reference diffusion_state_distance, graph_kernels.py:84-97)."""
    src, dst = _edge_arrays(edges)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
    rows = {}
    for s in seeds:
        x = np.zeros(n)
        x[s] = 1.0
        acc = x.copy()
        for _ in range(k):
            x = np.bincount(dst, weights=x[src] * inv[src], minlength=n)
            acc += x
        rows[s] = acc
    out = {}
    ss = sorted(seeds)
    for i, a in enumerate(ss):
        for b in ss[i + 1 :]:
            out[(a, b)] = float(np.abs(rows[a] - rows[b]).sum())
    return out


def sinkhorn_distance(
    edges, n: int, mu: np.ndarray, nu: np.ndarray,
    gamma: float = 1.0, kernel_weight: float = 0.5,
    n_iter: int = 20, tol: float = 1e-6,
) -> tuple[float, int]:
    """Entropic OT with K = I + w·A_sym; mirrors operators.transport
    semantics (reference loop skeleton: convolutional_distance.py:12-89,
    sinkhorn_knopp_iteration gromov_wasserstein_graphs.py:108-166)."""
    src, dst = _edge_arrays(edges)
    und = {(a, b) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    und |= {(b, a) for a, b in und}
    s = np.array([a for a, _ in und], dtype=np.int64)
    d = np.array([b for _, b in und], dtype=np.int64)

    def kmul(x):
        nbr = np.bincount(d, weights=x[s], minlength=n)
        return x + kernel_weight * nbr

    eps = 1e-300
    u = np.ones(n)
    v_prev = None
    v = None
    iters = 0
    for iters in range(1, n_iter + 1):
        v = mu / np.maximum(kmul(u), eps)
        u = nu / np.maximum(kmul(v), eps)
        if v_prev is not None:
            if float(np.abs(v - v_prev).sum()) < tol:
                break
        v_prev = v
    mu_term = float((mu[mu > 0] * np.log(np.maximum(v[mu > 0], eps))).sum())
    nu_term = float((nu[nu > 0] * np.log(np.maximum(u[nu > 0], eps))).sum())
    return gamma * (mu_term + nu_term), iters


def wasserstein_barycenter(
    edges, n: int, dists: np.ndarray, alpha: np.ndarray | None = None,
    area: np.ndarray | None = None, kernel_weight: float = 0.5,
    n_iter: int = 100, tol: float = 1e-6, normalization: bool = False,
) -> tuple[np.ndarray, int]:
    """Iterated-Bregman Wasserstein barycenter with K = I + w·A_sym;
    vectorized mirror of the reference loop
    (convolutional_barycenter.py:13-81, Solomon et al. 2015 Alg. 2).
    dists: (K, n) rows are distributions. Returns (barycenter, iters)."""
    src, dst = _edge_arrays(edges)
    und = {(a, b) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    und |= {(b, a) for a, b in und}
    s = np.array([a for a, _ in und], dtype=np.int64)
    d_arr = np.array([b for _, b in und], dtype=np.int64)

    def kmul(x):  # x: (K, n) — kernel applied per row
        out = np.empty_like(x)
        for i in range(x.shape[0]):
            out[i] = x[i] + kernel_weight * np.bincount(d_arr, weights=x[i][s], minlength=n)
        return out

    K = dists.shape[0]
    alpha = np.full(K, 1.0 / K) if alpha is None else np.asarray(alpha, float) / np.sum(alpha)
    area = np.ones(n) if area is None else np.asarray(area, float)
    eps = 1e-300
    v = np.ones((K, n))
    b = np.ones(n)
    it = 0
    for it in range(1, n_iter + 1):
        b_old = b
        kv = kmul(v * area)
        if normalization:
            kv = kv / kmul(np.ones_like(v))
        w = dists / np.maximum(kv, eps)
        kw = kmul(w * area)
        if normalization:
            kw = kw / kmul(np.ones_like(w))
        d = np.maximum(v * kw, eps)
        b = np.exp((alpha[:, None] * np.log(d)).sum(axis=0))
        v = v * b[None, :] / d
        change = float((area * np.abs(b - b_old)).sum())
        if it > 2 and change < tol:
            break
    return b, it


def tree_gfi_matvec(
    parents: dict[int, tuple[int, float]], n: int, field: np.ndarray, a: float = -1.0
) -> np.ndarray:
    """2-pass tree DP oracle — the reference's exact semantics
    (trees.py:93-125): out[i] = Σ_j exp(a·dist_T(i,j))·field[j].
    parents: child -> (parent, w) for every non-root vertex."""
    import math

    children: dict[int, list[tuple[int, float]]] = {}
    roots = set(range(n)) - set(parents)
    for c, (p, w) in parents.items():
        children.setdefault(p, []).append((c, w))
    # levels by BFS from the roots
    levels = [sorted(roots)]
    while levels[-1]:
        nxt = [c for v in levels[-1] for c, _ in children.get(v, [])]
        levels.append(sorted(nxt))
    levels = levels[:-1]

    f = lambda x: math.exp(a * x)  # noqa: E731
    partial = np.asarray(field, dtype=np.float64).copy()
    for level in reversed(levels):
        for v in level:
            for c, w in children.get(v, []):
                partial[v] += f(w) * partial[c]
    sums = np.zeros(n)
    for r in roots:
        sums[r] = partial[r]
    for level in levels:
        for v in level:
            for c, w in children.get(v, []):
                sums[c] = f(w) * sums[v] + (1.0 - f(2.0 * w)) * partial[c]
    return sums


def bartal_tree(
    edges_w: list[tuple[int, int, float]], n: int, seed: int = 42
) -> tuple[dict[int, tuple[int, float]], int]:
    """Sequential mirror of the ENGINE's deterministic parallel-LDD
    Bartal sampler (operators/trees.py bartal_tree; reference semantics
    bartal_trees.py:15-122 with the two documented divergences).
    Returns ({child: (parent, w)}, root)."""
    import heapq

    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit

    adj: dict[int, list[tuple[int, float]]] = {}
    canon: dict[tuple[int, int], float] = {}
    for a, b, w in edges_w:
        if a == b:
            continue
        for s, t in ((a, b), (b, a)):
            canon[(s, t)] = min(canon.get((s, t), float("inf")), w)
    for (s, t), w in canon.items():
        adj.setdefault(s, []).append((t, w))
    verts = sorted(adj)
    wmin = min(w for w in canon.values())

    def dijkstra(src: int, members: set[int] | None = None) -> dict[int, float]:
        dist = {src: 0.0}
        pq = [(0.0, src)]
        while pq:
            dv, v = heapq.heappop(pq)
            if dv > dist.get(v, float("inf")):
                continue
            for u, w in adj.get(v, []):
                if members is not None and u not in members:
                    continue
                nd = dv + w
                if nd < dist.get(u, float("inf")):
                    dist[u] = nd
                    heapq.heappush(pq, (nd, u))
        return dist

    v0 = verts[0]
    d0 = dijkstra(v0)
    assert len(d0) == len(verts), "bartal_tree requires a connected graph"
    diam = 2.0 * max(d0.values()) + 1e-6
    if len(verts) == 1:
        return {}, v0

    parent: dict[int, tuple[int, float]] = {}

    def decompose(cluster: list[int], cur_diam: float, level: int) -> int:
        """Returns the root of the subtree over `cluster`."""
        if len(cluster) == 1:
            return cluster[0]
        ldd_diam = cur_diam / 2.0
        p = min(1.0, (4.0 * math.log2(len(verts))) / (ldd_diam / wmin))
        members = set(cluster)
        pi = {v: md5_60bit(f"bartal{seed}:l{level}:{v}") for v in cluster}
        if p >= 1.0:
            rad = {v: wmin for v in cluster}
        else:
            rad = {}
            for v in cluster:
                u = (md5_60bit(f"bartalr{seed}:l{level}:{v}") % (1 << 20) + 1) / float(1 << 20)
                rad[v] = (math.floor(math.log(u) / math.log(1.0 - p)) + 1) * wmin
        # winner per vertex: min-π center whose ball (cluster-induced
        # shortest paths, dist < R strictly) covers it
        win: dict[int, tuple[int, int]] = {}  # v -> (pi_c, c)
        for c in cluster:
            dist = dijkstra(c, members)
            for v, dv in dist.items():
                if dv < rad[c]:
                    cand = (pi[c], c)
                    if v not in win or cand < win[v]:
                        win[v] = cand
        groups: dict[int, list[int]] = {}
        for v in cluster:
            groups.setdefault(win[v][1], []).append(v)
        subroots = []
        for c in sorted(groups, key=lambda c: pi[c]):
            subroots.append((pi[c], decompose(groups[c], ldd_diam, level + 1)))
        first_root = subroots[0][1]
        for _, r in subroots[1:]:
            parent[r] = (first_root, cur_diam)
        return first_root

    root = decompose(verts, diam, 0)
    return parent, root


def kruskal_mst(edges_w: list[tuple[int, int, float]], n: int) -> set[tuple[int, int, float]]:
    """Sequential Kruskal with (w, src, dst) lexicographic tie-break —
    the reference's construction (spanning_trees.py:98-124) under the
    deterministic edge ordering boruvka_mst uses."""
    canon = {}
    for a, b, w in edges_w:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, float("inf")), w)
    items = sorted(((w, s, d) for (s, d), w in canon.items()))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, s, d in items:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            out.add((s, d, w))
    return out


def gromov_wasserstein_discrepancy(
    cost_s: np.ndarray,
    cost_t: np.ndarray,
    p_s: np.ndarray,
    p_t: np.ndarray,
    beta: float = 0.1,
    outer_iter: int = 20,
    inner_iter: int = 50,
    sk_bound: float = 1e-3,
    iter_bound: float = 1e-3,
    feature_cost: np.ndarray | None = None,
    alpha: float = 1.0,
    trans0: np.ndarray | None = None,
    update_p: bool = False,
    lr: float = 0.1,
    p_reg_weight: float = 0.0,
    extras: dict | None = None,
) -> tuple[np.ndarray, float, int]:
    """Dense mirror of the reference's L2/proximal GW loop
    (gromov_wasserstein_graphs.py:108-166, 169-214, 258-321, 324-595).
    update_p mirrors the reference's outer-loop source-distribution
    softmax update (``update_distribution``, ibid. 72-105, applied at
    563-572): θ ← θ − lr·normalize(center(softmax_grad(p)·∇p)),
    p ← softmax(θ); cost_st (f1/f2) stays stale, as in the reference.
    If ``extras`` is a dict the final p_s lands in extras["p_s"].
    Returns (trans, d_gw, outer_iterations)."""
    ps = p_s.reshape(-1, 1).astype(float).copy()
    pt = p_t.reshape(-1, 1)
    n_s = ps.shape[0]
    f1 = (cost_s**2) @ ps  # (n_s, 1)
    f2 = ((cost_t**2) @ pt).T  # (1, n_t)
    trans = (ps @ pt.T) if trans0 is None else trans0.copy()
    a = np.ones((n_s, 1)) / n_s
    theta = np.zeros((n_s, 1))
    outer_used = 0
    m = 0.0 if feature_cost is None else (1.0 - alpha) * feature_cost
    for outer in range(1, outer_iter + 1):
        cost = alpha * (f1 + f2 - 2.0 * (cost_s @ trans @ cost_t.T)) + m
        kernel = np.exp(-cost / beta) * trans
        rel = np.inf
        i = 0
        b = None
        while rel > sk_bound and i < inner_iter:
            b = pt / (kernel.T @ a)
            a_new = ps / (kernel @ b)
            rel = float(np.abs(a_new - a).sum()) / float(np.abs(a).sum())
            a = a_new
            i += 1
        new_trans = (a @ b.T) * kernel
        rel_outer = float(np.abs(new_trans - trans).sum()) / float(np.abs(trans).sum())
        trans = new_trans
        outer_used = outer
        if update_p:
            grad_ps = beta * np.log(a)
            if p_reg_weight > 0:
                grad_ps = grad_ps - p_reg_weight * (np.log(ps) + 1.0)
            # softmax_grad(p) @ g  =  p ⊙ (g − ⟨p, g⟩)
            gt = ps * (grad_ps - float((ps * grad_ps).sum()))
            gt = gt - gt.mean()
            gt = gt / (1e-10 + float((gt**2).sum()) ** 0.5)
            theta = theta - lr * gt
            e = np.exp(theta - theta.max())  # scipy.special.softmax form
            ps = e / e.sum()
        if rel_outer <= iter_bound:
            break
    if extras is not None:
        extras["p_s"] = ps.ravel()
    cost = alpha * (f1 + f2 - 2.0 * (cost_s @ trans @ cost_t.T)) + m
    d_gw = float((cost * trans).sum())
    return trans, d_gw, outer_used


def kernel_projection(
    edges,
    n: int,
    seed_sets: dict[int, list[int]],
    steps: int = 2,
    correction: str | None = None,
    norm: bool = False,
) -> np.ndarray:
    """Reference get_projection semantics (graph_kernels.py:387-519):
    k-step random-walk kernel scores from one-hot seeds + correction.
    seed_sets[0] is THE seed set; samples >= 1 feed rdm_seed's z-score
    ((x - mean)/population-std over dense per-sample projections)."""
    src, dst = _edge_arrays(edges)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)

    def proj(seeds):
        x = np.zeros(n)
        x[list(seeds)] = 1.0
        for _ in range(steps):
            x = np.bincount(dst, weights=x[src] * inv[src], minlength=n)
        return x

    score = proj(seed_sets[0])
    if correction is None:
        out = score
    elif correction == "seedset_size":
        out = score / len(seed_sets[0])
    elif correction == "degree":
        und = {(a, b) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        und |= {(b, a) for a, b in und}
        d = np.bincount(np.array([a for a, _ in und], dtype=np.int64), minlength=n)
        out = score / np.maximum(d, 1)
    elif correction == "rdm_seed":
        samples = np.stack([proj(seed_sets[s]) for s in sorted(seed_sets) if s >= 1])
        mu = samples.mean(axis=0)
        sd = samples.std(axis=0)
        out = (score - mu) / np.where(sd > 0, sd, 1.0)
    else:
        raise ValueError(correction)
    if norm and out.sum() != 0:
        out = out / out.sum()
    return out


def gromov_wasserstein_barycenter(
    costs: dict,
    p_s: dict,
    p_center: np.ndarray,
    weights: dict | None = None,
    max_iter: int = 4,
    cost_bound: float = 1e-3,
    **gw_kwargs,
) -> tuple[np.ndarray, dict, list]:
    """Dense mirror of the reference barycenter loop
    (gromov_wasserstein_graphs.py:598-715, L2 loss)."""
    ids = list(costs.keys())
    w = weights or {k: 1.0 / len(ids) for k in ids}
    pc = p_center.reshape(-1, 1)
    bary = np.diag(pc[:, 0])
    transports = {k: p_s[k].reshape(-1, 1) @ pc.T for k in ids}
    denom = pc @ pc.T
    rounds = []
    bary_abs = float(np.abs(bary).sum())
    for _ in range(max_iter):
        d_gw = {}
        for k in ids:
            transports[k], d_gw[k], _ = gromov_wasserstein_discrepancy(
                costs[k], bary, p_s[k], pc[:, 0], trans0=transports[k], **gw_kwargs
            )
        rounds.append(d_gw)
        new_bary = sum(
            w[k] * (transports[k].T @ (costs[k] @ transports[k])) for k in ids
        ) / denom
        rel = float(np.abs(new_bary - bary).sum()) / bary_abs if bary_abs > 0 else 0.0
        bary = new_bary
        bary_abs = float(np.abs(bary).sum())
        if rel <= cost_bound:
            break
    return bary, transports, rounds


def frt_tree(
    edges_w: list[tuple[int, int, float]], n: int, seed: int = 42
) -> tuple[set[tuple[int, int, float, int]], int]:
    """Independent mirror of operators/trees.frt_tree (reference
    semantics frt_trees.py:47-115) using exact Dijkstra distances and
    the direct per-level assignment rule: at level i, vertex v belongs
    to the first center in π order whose R_i-ball contains v. Returns
    ({(id, parent, w, depth)}, root_id)."""
    import heapq
    import math as _math

    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit

    adj: dict[int, list[tuple[int, float]]] = {v: [] for v in range(n)}
    for s, t, w in edges_w:
        if s == t:
            continue
        adj[s].append((t, float(w)))
        adj[t].append((s, float(w)))
    wmin = min(w for _, _, w in edges_w)

    def dijkstra(s: int) -> list[float]:
        dist = [float("inf")] * n
        dist[s] = 0.0
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            for v, w in adj[u]:
                nd = d + w
                if nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return dist

    dmat = [dijkstra(s) for s in range(n)]
    ecc = max(dmat[0])
    assert ecc < float("inf"), "frt oracle requires a connected graph"
    beta = 0.5 + 0.5 * (md5_60bit(f"frtbeta{seed}") % (1 << 30)) / float(1 << 30)
    delta = max(0, _math.ceil(_math.log2(max(2.0 * ecc, wmin) / wmin)))
    pri = {v: md5_60bit(f"frt{seed}:{v}") for v in range(n)}

    centers: dict[int, list[int]] = {}  # v -> [c_delta, ..., c_0]
    for v in range(n):
        cs = []
        for i in range(delta, -1, -1):
            r = beta * (2.0**i) * wmin
            cands = [c for c in range(n) if dmat[c][v] <= r]
            cs.append(min(cands, key=lambda c: pri[c]))
        centers[v] = cs

    def path(v: int, i: int) -> str:
        return "/".join(str(c) for c in centers[v][: delta - i + 1])

    root = -md5_60bit(f"frtroot{seed}") - 1

    def node(p: str) -> int:
        return -md5_60bit(f"frtnode{seed}:{p}") - 1

    rows: set[tuple[int, int, float, int]] = set()
    attached: set[int] = set()
    for i in range(delta, -1, -1):
        groups: dict[str, list[int]] = {}
        for v in range(n):
            if v in attached:
                continue
            groups.setdefault(path(v, i), []).append(v)
        w = wmin * (2.0**i)
        depth = delta - i + 1
        for p, members in groups.items():
            parent = root if i == delta else node(p.rsplit("/", 1)[0])
            if len(members) >= 2:
                rows.add((node(p), parent, w, depth))
            else:
                rows.add((members[0], parent, w, depth))
                attached.add(members[0])
    return rows, root


def gw_lp(
    cost_s: np.ndarray,
    cost_t: np.ndarray,
    p_s: np.ndarray,
    p_t: np.ndarray,
    reg: float = 1.0,
    feature_cost: np.ndarray | None = None,
    feature_weight: float = 0.0,
    max_iter: int = 20,
    stop_thr: float = 1e-9,
    stop_thr2: float = 1e-9,
    trans0: np.ndarray | None = None,
) -> tuple[np.ndarray, float, int, list[float]]:
    """Dense mirror of the reference's conditional-gradient GW solver
    (optimization.py:245-416 ``cg`` with the closed-form quadratic line
    search at :170-185 and the exact EMD LP at :358;
    fused_gromov_wasserstein.py:362-676 ``gw_lp``, :677-974 ``fgw_lp``
    with M=(1-alpha)*feature_cost, reg=alpha; init_matrix/
    tensor_product/gwloss per :32-360, square loss). The LP step uses
    operators/emd.py, whose optimality is independently certified by
    LP duality in tests/test_gw_fw.py. Unlike the Spark engine (which
    evaluates the exact quadratic), this mirror re-evaluates the cost
    in full after the line search, exactly as the reference does —
    parity between the two therefore also validates that identity.
    Returns (trans, gw_dist, iterations, loss_trace)."""
    from efficient_graph_algorithms_spark.operators.emd import emd as _emd

    p = p_s.ravel().astype(float)
    q = p_t.ravel().astype(float)
    f1c = (cost_s**2) @ p
    f2c = (cost_t**2) @ q
    const_c = f1c[:, None] + f2c[None, :]
    m = np.zeros((p.size, q.size))
    if feature_cost is not None and feature_weight != 0.0:
        m = feature_weight * feature_cost

    def tens(g: np.ndarray) -> np.ndarray:
        return const_c - cost_s @ g @ (2.0 * cost_t).T

    def cost(g: np.ndarray) -> float:
        return float((m * g).sum() + reg * (tens(g) * g).sum())

    g = np.outer(p, q) if trans0 is None else trans0.copy()
    f_val = cost(g)
    losses = [f_val]
    used = 0
    for it in range(1, max_iter + 1):
        old_fval = f_val
        mi = m + reg * 2.0 * tens(g)
        mi = mi + mi.min()
        # determinism snap, shared with operators/gw_fw.py: the LP
        # argmin is discontinuous, so both sides snap its input (and
        # the line-search scalars) to a fixed grid — exact-arithmetic
        # ties stay ties under any float summation order, and the
        # simplex's deterministic pivot is the common tie-break
        mi = np.round(mi, 9)
        gc, _, _, _ = _emd(p, q, mi)
        dg = gc - g
        dot = cost_s @ dg @ cost_t
        a = round(-2.0 * reg * float((dot * dg).sum()), 12)
        b = round(
            float(((m + reg * const_c) * dg).sum())
            - 2.0 * reg * (
                float((dot * g).sum())
                + float((cost_s @ g @ cost_t * dg).sum())
            ),
            12,
        )
        if a > 0:
            alpha = min(1.0, max(0.0, -b / (2.0 * a)))
        else:
            alpha = 1.0 if f_val > a + f_val + b else 0.0
        g = g + alpha * dg
        f_val = cost(g)  # full re-evaluation, reference optimization.py:242
        used = it
        losses.append(f_val)
        abs_delta = abs(f_val - old_fval)
        if abs_delta / max(abs(f_val), 1e-300) < stop_thr or abs_delta < stop_thr2:
            break
    return g, float((tens(g) * g).sum()), used, losses


def estimate_target_distribution(
    probs: list[np.ndarray], dim_t: int = 2
) -> np.ndarray:
    """Mirror of reference gromov_wasserstein_graphs.py:731-750: average
    of each graph's descending-sorted node distribution linearly
    resampled at dim_t points on [0, 1], then normalized."""
    p_t = np.zeros(dim_t)
    x_t = np.linspace(0, 1, dim_t)
    for ps in probs:
        srt = np.sort(ps.ravel())[::-1]
        x_s = np.linspace(0, 1, srt.size)
        p_t += np.interp(x_t, x_s, srt)
    return p_t / p_t.sum()


def node_cluster_assignment(
    trans: np.ndarray, p_c: np.ndarray
) -> np.ndarray:
    """Mirror of reference gromov_wasserstein_graphs.py:866-920: node r
    joins cluster argmax_j trans[r, j] / p_c[j] (np.argmax = first max
    on ties). Returns the cluster id per row."""
    return np.argmax(trans / p_c.ravel()[None, :], axis=1)


def recursive_graph_partition(
    cost_s: np.ndarray,
    p_s: np.ndarray,
    beta: float = 0.1,
    outer_iter: int = 20,
    inner_iter: int = 50,
    sk_bound: float = 1e-3,
    iter_bound: float = 1e-3,
    max_node_num: int = 200,
    dim_t: int = 2,
    max_levels: int = 64,
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Mirror of reference gromov_wasserstein_graphs.py:960-1029
    (``recursive_graph_partition`` composing ``graph_partition``
    :922-957 and ``node_cluster_assignment`` :866-920): binary-ish GW
    partition against diag(p_t) repeated until every leaf has at most
    max_node_num nodes. One deliberate deviation, shared with the Spark
    engine: the reference sets outer_iteration = n_s per leaf; here the
    caller-pinned outer_iter is used so tests can fix iteration counts.
    Returns leaves as (node_ids, sub_cost, sub_prob) with node ids in
    the ORIGINAL indexing, sorted ascending within a leaf (the
    reference re-indexes rows by the same sorted order)."""
    leaves_done: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    active = [(np.arange(p_s.size), cost_s, p_s.ravel().astype(float))]
    level = 0
    while active and level < max_levels:
        nxt = []
        for ids, sub_c, sub_p in active:
            p_t = estimate_target_distribution([sub_p], dim_t)
            cost_t = np.diag(p_t)
            trans, _, _ = gromov_wasserstein_discrepancy(
                sub_c, cost_t, sub_p, p_t, beta=beta, outer_iter=outer_iter,
                inner_iter=inner_iter, sk_bound=sk_bound, iter_bound=iter_bound,
            )
            cl = node_cluster_assignment(trans, p_t)
            for key in sorted(set(cl.tolist())):
                idx = np.where(cl == key)[0]
                leaf_ids = ids[idx]
                leaf_c = sub_c[np.ix_(idx, idx)]
                leaf_p = sub_p[idx] / sub_p[idx].sum()
                if leaf_ids.size > max_node_num:
                    nxt.append((leaf_ids, leaf_c, leaf_p))
                else:
                    leaves_done.append((leaf_ids, leaf_c, leaf_p))
        active = nxt
        level += 1
    leaves_done.extend(active)
    return leaves_done


def fgw_barycenter(
    feats: list[np.ndarray],
    costs: list[np.ndarray],
    ps: list[np.ndarray],
    p_c: np.ndarray,
    lambdas: list[float],
    alpha: float,
    init_c: np.ndarray,
    init_x: np.ndarray,
    max_iter: int = 5,
    tol: float = 1e-9,
    fw_iter: int = 10,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Dense mirror of the reference's FGW barycenter with the feature
    update (fused_gromov_wasserstein.py:1233-1481 ``fgw_barycenters``,
    square loss, sqeuclidean feature metric, explicit inits):
    alternate (a) X <- sum_s lambda_s Y_s^T T_s^T / p_c  (feature BCD
    step, ``update_feature_matrix`` :1082-1115), (b) M_s = sqdist(X,
    Y_s) (``update_Ms`` :1072-1080), (c) C <- sum_s lambda_s T_s^T C_s
    T_s / p_c p_c^T (``update_square_loss`` :984-1017; T_s here is the
    (n_s, N) source->barycenter coupling), (d) T_s <- fgw_lp(M_s, C,
    C_s, ...) solved by the conditional-gradient mirror above. Note the
    reference's T is (N, ns) barycenter->source; this mirror and the
    engine carry the transpose (n_s, N) to match the engine's
    barycenter convention — the same matrices, same updates.
    Returns (X (N, d), C (N, N), transports)."""
    n = p_c.size
    c = init_c.copy()
    x = init_x.copy()
    trans = [np.outer(p.ravel(), p_c.ravel()) for p in ps]
    for _ in range(max_iter):
        c_prev, x_prev = c, x
        # feature update: X(j, d) = sum_s l_s sum_i T_s[i, j] Y_s[i, d] / p_c[j]
        x = sum(
            lam * (t.T @ y) for lam, t, y in zip(lambdas, trans, feats)
        ) / p_c.ravel()[:, None]
        # structure update
        c = sum(
            lam * (t.T @ cs @ t) for lam, t, cs in zip(lambdas, trans, costs)
        ) / np.outer(p_c, p_c)
        # coupling updates via conditional gradient on the fused objective
        new_trans = []
        for y, cs, p, lam, t0 in zip(feats, costs, ps, lambdas, trans):
            m = ((y[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)  # sqeuclidean
            g, _, _, _ = gw_lp(
                cs, c, p, p_c, reg=alpha, feature_cost=m,
                feature_weight=(1.0 - alpha), max_iter=fw_iter, trans0=t0,
            )
            new_trans.append(g)
        trans = new_trans
        if (
            np.linalg.norm(c - c_prev) < tol
            and np.linalg.norm(x - x_prev) < tol
        ):
            break
    return x, c, trans
