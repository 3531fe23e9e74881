"""Pivot-sampled Brandes betweenness vs exact fixtures and a Python
replay of the SAME quantized integer accumulation (SURVEY.md §5
strategy: constructed graphs with known answers + replicated
deterministic arithmetic)."""

from __future__ import annotations

import random

from conftest import edges_df
from pagerank_spark.operators.betweenness import SCALE, betweenness


def _brandes_q(edges, sources, directed=False, max_depth=30):
    """Exact replay of the operator's quantized Brandes: BIGINT sigma,
    per-term split floor division at SCALE resolution."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    bet: dict[int, int] = {}
    for src in sources:
        depth = {src: 0}
        sigma = {src: 1}
        levels = [[src]]
        while len(levels) - 1 < max_depth:
            nxt: dict[int, int] = {}
            for v in levels[-1]:
                for w in adj.get(v, ()):
                    if w in depth and depth[w] < len(levels):
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            if not nxt:
                break
            for w, sg in nxt.items():
                depth[w] = len(levels)
                sigma[w] = sg
            levels.append(sorted(nxt))
        dq = {v: 0 for v in depth}
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                acc = 0
                for w in adj.get(v, ()):
                    if depth.get(w) != d + 1:
                        continue
                    a, b, c = SCALE + dq[w], sigma[v], sigma[w]
                    acc += (a // c) * b + ((a % c) * b) // c
                dq[v] = acc
        for v, q in dq.items():
            if v != src:
                bet[v] = bet.get(v, 0) + q
    return bet


def _q(df):
    return {r["id"]: r["bet_q9"] for r in df.collect()}


def test_path_all_pivots(spark):
    # path 1-2-3-4, all vertices as pivots: interior vertices carry 4
    # directed pairs each, endpoints 0.
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    got = _q(betweenness(e, [1, 2, 3, 4]))
    assert got == {1: 0, 2: 4 * SCALE, 3: 4 * SCALE, 4: 0}


def test_diamond_splits_dependency(spark):
    # 1-2-4 and 1-3-4: two shortest 1→4 paths, each middle vertex
    # carries exactly half a dependency from pivot 1.
    e = edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    got = _q(betweenness(e, [1]))
    assert got == {2: SCALE // 2, 3: SCALE // 2, 4: 0}


def test_reciprocal_edges_do_not_double_count(spark):
    # (1,2) and (2,1) both present: the symmetrize must dedupe or
    # sigma doubles and the dependency halves.
    base = _q(betweenness(edges_df(spark, [(1, 2), (2, 3)]), [1]))
    recip = _q(betweenness(
        edges_df(spark, [(1, 2), (2, 1), (2, 3)]), [1]))
    assert base == recip == {2: SCALE, 3: 0}


def test_directed_face(spark):
    # chain 1→2→3 plus back-edge 3→1: directed pivot 1 sees only the
    # forward chain (dependency 1 on vertex 2).
    e = edges_df(spark, [(1, 2), (2, 3), (3, 1)])
    got = _q(betweenness(e, [1], directed=True))
    assert got == {2: SCALE, 3: 0}


def test_matches_python_replay_random_graph(spark):
    rng = random.Random(11)
    n = 40
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(160)})
    pivots = [0, 3, 7, 11]
    e = edges_df(spark, edges)
    got = _q(betweenness(e, pivots))
    want = _brandes_q(edges, pivots)
    assert got == want


def test_matches_python_replay_directed(spark):
    rng = random.Random(23)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(120)})
    pivots = [1, 2, 5]
    e = edges_df(spark, edges)
    got = _q(betweenness(e, pivots, directed=True))
    want = _brandes_q(edges, pivots, directed=True)
    assert got == want


def test_betweenness_column_derivation(spark):
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    for r in betweenness(e, [1, 4]).collect():
        assert r["betweenness"] == r["bet_q9"] / SCALE
