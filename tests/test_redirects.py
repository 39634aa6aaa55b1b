"""Redirect-chain resolution: exact parity vs a pure-Python pointer-
doubling mirror, on a map with chains, a cycle, a feeder into the
cycle, and a self-loop."""

from __future__ import annotations

import pytest

from efficient_graph_algorithms_spark.operators.redirects import resolve_redirects

# chain: 1 -> 2 -> 3 -> 100 (terminal), cycle: 10 -> 11 -> 12 -> 10,
# feeder into cycle: 20 -> 10, self-loop: 30 -> 30, trivial: 40 -> 200
REDIR = {1: 2, 2: 3, 3: 100, 10: 11, 11: 12, 12: 10, 20: 10, 30: 30, 40: 200}


def mirror_doubling(redir: dict[int, int], rounds: int):
    """The operator's exact arithmetic, sequentially."""
    state = {
        v: (t, 1, 1 if t not in redir else 0) for v, t in redir.items()
    }  # id -> (ptr, hops, done)
    for _ in range(rounds):
        if all(d for _, _, d in state.values()):
            break
        nxt = {}
        for v, (p, h, d) in state.items():
            if d:
                nxt[v] = (p, h, 1)
            else:  # done=0 implies p is a key
                tp, th, td = state[p]
                nxt[v] = (tp, h + th, td)
        state = nxt
    return state


@pytest.mark.parametrize("rounds", [2, 4])
def test_redirects_match_mirror(spark, rounds):
    red = spark.createDataFrame(list(REDIR.items()), "id long, target long")
    out, info = resolve_redirects(spark, red, rounds=rounds)
    got = {r["id"]: (r["terminal"], r["hops"], r["resolved"]) for r in out.collect()}
    want = mirror_doubling(REDIR, rounds)
    assert got == want
    assert info["n_unresolved"] == sum(1 for _, _, d in want.values() if not d)


def test_redirects_chain_semantics(spark):
    red = spark.createDataFrame(list(REDIR.items()), "id long, target long")
    out, info = resolve_redirects(spark, red)  # default rounds: full resolution
    rows = {r["id"]: r for r in out.collect()}
    # acyclic rows resolve to the true terminal with the exact chain length
    for v, (term, hops) in {
        1: (100, 3),
        2: (100, 2),
        3: (100, 1),
        40: (200, 1),
    }.items():
        assert rows[v]["resolved"] == 1
        assert rows[v]["terminal"] == term
        assert rows[v]["hops"] == hops
    # cycle members (and the self-loop, a 1-cycle) never resolve
    for v in (10, 11, 12, 20, 30):
        assert rows[v]["resolved"] == 0
    assert info["n_unresolved"] == 5


def test_redirects_rejects_nonfunctional(spark):
    bad = spark.createDataFrame([(1, 2), (1, 3)], "id long, target long")
    with pytest.raises(ValueError, match="not functional"):
        resolve_redirects(spark, bad)
