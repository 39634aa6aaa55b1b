"""Strongly connected components: trim + forward-coloring + backward
marking vs an iterative Tarjan oracle; structured and degenerate cases."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.scc import (
    strongly_connected_components,
)


def _tarjan(pairs):
    """Iterative Tarjan; returns {v: min id of its SCC}."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.add(a)
        verts.add(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for s in verts:
        if s in index:
            continue
        work = [(s, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def _run(spark, pairs):
    pairs = [p for p in pairs if p[0] != p[1]]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    labels, info = strongly_connected_components(spark, edges)
    return {r.id: r.scc for r in labels.collect()}, info, pairs


@pytest.mark.parametrize("n,m,seed", [(60, 90, 1), (60, 150, 2), (100, 120, 3)])
def test_random_matches_tarjan(spark, n, m, seed):
    rng = np.random.default_rng(seed)
    pairs = list(zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()))
    got, info, pairs = _run(spark, pairs)
    assert got == _tarjan(pairs)
    assert info["converged"]


def test_dense_single_scc(spark):
    # dense random graph: one giant SCC — colors collapse in few hops
    rng = np.random.default_rng(4)
    pairs = list(zip(rng.integers(0, 40, 400).tolist(), rng.integers(0, 40, 400).tolist()))
    got, info, pairs = _run(spark, pairs)
    assert got == _tarjan(pairs)


def test_structured_graphs(spark):
    # cycle with a tail: trim peels the tail, cycle is one SCC
    got, info, _ = _run(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}
    # two 2-cycles bridged one-way: separate SCCs despite the bridge
    got, _, _ = _run(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)])
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}
    # bowtie: 5-cycle core, OUT 3-cycle, IN pendant
    pairs = [(i, (i + 1) % 5) for i in range(5)] + [(4, 5), (5, 6), (6, 7), (7, 5), (9, 0)]
    got, _, pairs = _run(spark, pairs)
    assert got == _tarjan(pairs)
    assert got[9] == 9 and got[0] == 0 and got[5] == 5 and got[7] == 5


def test_dag_is_all_singletons(spark):
    pairs = [(i, j) for i in range(8) for j in range(i + 1, 8) if (i + j) % 3 == 0]
    got, info, pairs = _run(spark, pairs)
    assert got == {v: v for v in got}
    # a DAG dies entirely in the trim phase: no coloring hops needed
    assert info["outer_rounds"] == 1 and info["trim_assigned"] == len(got)


def test_self_loops_are_singleton_sccs(spark):
    # self-loop edges are ignored for connectivity, but a vertex whose
    # only edges are self-loops still gets its singleton-SCC row (the
    # operator docstring's contract — it enters degree-0 and trims out).
    # Raw edges straight to the operator: _run pre-filters self-loops.
    edges = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (2, 2)], "src long, dst long"
    )
    labels, info = strongly_connected_components(spark, edges)
    got = {r.id: r.scc for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 2}
    assert info["converged"]


def _bowtie_oracle(pairs):
    """Pure-Python Broder classification via closures."""
    verts = {v for e in pairs for v in e}
    adj, radj, uadj = {}, {}, {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        radj.setdefault(b, set()).add(a)
        uadj.setdefault(a, set()).add(b)
        uadj.setdefault(b, set()).add(a)

    def reach(seeds, g):
        seen, frontier = set(seeds), list(seeds)
        while frontier:
            nxt = [w for u in frontier for w in g.get(u, ()) if w not in seen]
            seen.update(nxt)
            frontier = nxt
        return seen

    sccs = {}
    for v in verts:
        fwd, bwd = reach({v}, adj), reach({v}, radj)
        sccs[v] = min(fwd & bwd)
    from collections import Counter

    cnt = Counter(sccs.values())
    core_label = min(
        (lbl for lbl in cnt if cnt[lbl] == max(cnt.values()))
    )
    core = {v for v, l in sccs.items() if l == core_label}
    fwd, bwd = reach(core, adj), reach(core, radj)
    weak = reach(core, uadj)
    out = {}
    for v in verts:
        if v in core:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        elif v in weak:
            out[v] = "TEND"
        else:
            out[v] = "DISC"
    return sccs, out


def test_bowtie_hand_built(spark):
    """Core 3-cycle, IN chain, OUT chain, tendril off IN, island."""
    from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

    pairs = [
        (10, 11), (11, 12), (12, 10),   # CORE
        (1, 2), (2, 10),                # IN chain
        (12, 20), (20, 21),             # OUT chain
        (2, 30),                        # tendril hanging off IN
        (40, 41),                       # disconnected island
    ]
    edf = spark.createDataFrame(pairs, "src long, dst long")
    labels, info = bowtie_classes(spark, edf)
    got = {r["id"]: r["cls"] for r in labels.collect()}
    assert got == {
        10: "CORE", 11: "CORE", 12: "CORE",
        1: "IN", 2: "IN",
        20: "OUT", 21: "OUT",
        30: "TEND",
        40: "DISC", 41: "DISC",
    }
    assert info["core_scc"] == 10
    assert info["class_counts"] == {"CORE": 3, "IN": 2, "OUT": 2,
                                    "TEND": 1, "DISC": 2}


def test_bowtie_random_matches_closure_oracle(spark):
    import numpy as np

    from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

    rng = np.random.default_rng(29)
    n, m = 60, 140
    pairs = sorted(
        {(int(a), int(b)) for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m)) if a != b}
    )
    edf = spark.createDataFrame(pairs, "src long, dst long")
    labels, _ = bowtie_classes(spark, edf)
    got = {r["id"]: (r["scc"], r["cls"]) for r in labels.collect()}
    sccs, cls = _bowtie_oracle(pairs)
    assert got == {v: (sccs[v], cls[v]) for v in sccs}


def test_bowtie_edgeless_info_shape(spark):
    # the early return must carry the same info keys the normal path
    # does — the CLI reads class_counts unconditionally
    from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

    edges = spark.createDataFrame([], "src long, dst long")
    out, info = bowtie_classes(spark, edges)
    assert out.count() == 0
    assert info["core_scc"] is None and info["class_counts"] == {}
