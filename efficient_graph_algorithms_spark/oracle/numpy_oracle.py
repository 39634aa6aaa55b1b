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
