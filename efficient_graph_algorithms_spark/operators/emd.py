"""Exact earth-mover's distance (transportation LP) via the
transportation simplex (MODI / u-v method), pure NumPy.

This is the LP kernel behind the Frank-Wolfe / conditional-gradient
face of Gromov-Wasserstein (``operators/gw_fw.py``): the reference
calls POT's ``ot.lp.emd`` network simplex inside its ``cg`` loop
(``reference src/ega/algorithms/optimization.py:358``). POT/scipy are
not available here, so the solver is re-derived from the textbook
algorithm. It runs DRIVER-SIDE by contract: couplings in the GW
operator family are small (graph summaries / barycenter targets), the
same memory shape the reference carries through NumPy — the
distributed work is the gradient assembly around it, never the LP.

Optimality is certifiable: the returned dual potentials (u, v) satisfy
u_i + v_j <= M_ij with equality on the support, which together with
feasibility proves the plan optimal (LP complementary slackness) —
tests/test_gw_fw.py asserts exactly that certificate.
"""

from __future__ import annotations

import numpy as np

_TOL = 1e-11


def emd(
    p: np.ndarray,
    q: np.ndarray,
    m_cost: np.ndarray,
    max_iter: int = 100_000,
) -> tuple[np.ndarray, float, np.ndarray, np.ndarray]:
    """Solve min <T, M> s.t. T 1 = p, T^T 1 = q, T >= 0 exactly.

    Returns (T, cost, u, v) where (u, v) are optimal dual potentials
    (u_0 = 0 normalization). p and q must sum to the same mass (they
    are rescaled to q's mass if they differ by float noise, matching
    POT's behavior of trusting the caller's marginals).
    """
    p = np.asarray(p, dtype=np.float64).ravel().copy()
    q = np.asarray(q, dtype=np.float64).ravel().copy()
    m_cost = np.asarray(m_cost, dtype=np.float64)
    ns, nt = p.shape[0], q.shape[0]
    if m_cost.shape != (ns, nt):
        raise ValueError(f"cost shape {m_cost.shape} != ({ns}, {nt})")
    if np.any(p < -_TOL) or np.any(q < -_TOL):
        raise ValueError("negative mass in a marginal")
    sp_, sq_ = p.sum(), q.sum()
    if sq_ <= 0:
        raise ValueError("target marginal has zero mass")
    if abs(sp_ - sq_) > 1e-9 * max(sp_, sq_):
        raise ValueError(f"unbalanced marginals: {sp_} vs {sq_}")
    p *= sq_ / sp_  # kill float-noise imbalance so NW corner closes exactly

    # --- initial basic feasible solution: northwest-corner rule -----
    # basis kept as a list of (i, j) cells; NW corner yields exactly
    # ns + nt - 1 of them (degenerate zero entries included)
    trans = np.zeros((ns, nt))
    basis: list[tuple[int, int]] = []
    i = j = 0
    pi, qj = p[0], q[0]
    while True:
        amt = min(pi, qj)
        trans[i, j] = amt
        basis.append((i, j))
        pi -= amt
        qj -= amt
        if i == ns - 1 and j == nt - 1:
            break
        # advance along the exhausted marginal; when both close at once
        # (degenerate), step the row and keep a zero basis cell so the
        # basis stays a spanning tree of size ns + nt - 1. The j == nt-1
        # guard forces row steps once the last column is reached:
        # subtraction noise can leave pi a few ulp ABOVE qj there, and
        # an else-branch j += 1 would walk off the marginal.
        if (pi <= qj or j == nt - 1) and i < ns - 1:
            i += 1
            pi = p[i]
        else:
            j += 1
            qj = q[j]

    # adjacency of the basis tree: row i <-> col j for each basis cell
    row_adj: list[set[int]] = [set() for _ in range(ns)]
    col_adj: list[set[int]] = [set() for _ in range(nt)]
    for bi, bj in basis:
        row_adj[bi].add(bj)
        col_adj[bj].add(bi)

    u = np.zeros(ns)
    v = np.zeros(nt)
    for _ in range(max_iter):
        # --- duals from the basis tree (u_i + v_j = M_ij on basis) ---
        u.fill(np.nan)
        v.fill(np.nan)
        u[0] = 0.0
        stack: list[tuple[str, int]] = [("r", 0)]
        while stack:
            kind, idx = stack.pop()
            if kind == "r":
                for jj in row_adj[idx]:
                    if np.isnan(v[jj]):
                        v[jj] = m_cost[idx, jj] - u[idx]
                        stack.append(("c", jj))
            else:
                for ii in col_adj[idx]:
                    if np.isnan(u[ii]):
                        u[ii] = m_cost[ii, idx] - v[idx]
                        stack.append(("r", ii))
        # a proper basis is a spanning tree, so every dual is reached

        # --- entering cell: most negative reduced cost ---------------
        red = m_cost - u[:, None] - v[None, :]
        enter_flat = int(np.argmin(red))
        ei, ej = divmod(enter_flat, nt)
        # tolerance scales with the cost magnitude: duals are chained
        # subtractions of m_cost entries, so their float noise is
        # ~ulp(max|M|); a fixed 1e-11 would keep noise-pivoting past
        # the optimum on large-valued cost matrices (squared distances
        # easily reach 1e8) until max_iter. max(1, .) preserves the
        # original absolute tolerance for small costs bit-for-bit.
        pivot_tol = _TOL * max(1.0, float(np.abs(m_cost).max()))
        if red[ei, ej] >= -pivot_tol:
            break  # optimal: all reduced costs nonnegative

        # --- cycle: unique path ei ~> ej through the basis tree ------
        # BFS over the bipartite tree from row ei to col ej
        parent: dict[tuple[str, int], tuple[str, int]] = {}
        frontier: list[tuple[str, int]] = [("r", ei)]
        seen = {("r", ei)}
        found = False
        while frontier and not found:
            nxt: list[tuple[str, int]] = []
            for kind, idx in frontier:
                if kind == "r":
                    for jj in row_adj[idx]:
                        node = ("c", jj)
                        if node not in seen:
                            seen.add(node)
                            parent[node] = (kind, idx)
                            if jj == ej:
                                found = True
                                break
                            nxt.append(node)
                else:
                    for ii in col_adj[idx]:
                        node = ("r", ii)
                        if node not in seen:
                            seen.add(node)
                            parent[node] = (kind, idx)
                            nxt.append(node)
                if found:
                    break
            frontier = nxt
        if not found:  # can't happen with a spanning-tree basis
            raise RuntimeError("basis lost spanning-tree structure")

        # walk back col ej -> row ei; path alternates col/row, and the
        # cycle is entering cell (+) then alternating - / + around it
        path: list[tuple[str, int]] = [("c", ej)]
        while path[-1] != ("r", ei):
            path.append(parent[path[-1]])
        # cells along the path: (row, col) pairs between consecutive nodes
        cycle: list[tuple[int, int]] = []  # basis cells, alternating -,+,-,..
        for a, b in zip(path, path[1:]):
            cell = (b[1], a[1]) if a[0] == "c" else (a[1], b[1])
            cycle.append(cell)
        minus = cycle[0::2]  # cells losing mass
        theta_idx = min(range(len(minus)), key=lambda k: (trans[minus[k]], k))
        theta = trans[minus[theta_idx]]
        leave = minus[theta_idx]

        trans[ei, ej] += theta
        for k_, cell in enumerate(cycle):
            trans[cell] += theta if k_ % 2 == 1 else -theta
        trans[leave] = 0.0  # exact zero despite float subtraction

        row_adj[leave[0]].discard(leave[1])
        col_adj[leave[1]].discard(leave[0])
        row_adj[ei].add(ej)
        col_adj[ej].add(ei)
    else:
        raise RuntimeError(f"transportation simplex hit max_iter={max_iter}")

    return trans, float((trans * m_cost).sum()), u, v
