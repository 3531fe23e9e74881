"""Iterated-MIS greedy coloring: properness, the Delta+1 bound,
determinism, simple-graph conventions, and exact equality with a
Python replay of the md5-priority rounds."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from conftest import edges_df
from pagerank_spark.operators.coloring import greedy_coloring


def _coloring(spark, edges):
    return {r["id"]: r["color"]
            for r in greedy_coloring(edges_df(spark, edges)).collect()}


def _assert_proper(colors, edges):
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d], (s, d)


def test_triangle_needs_three_colors(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    c = _coloring(spark, edges)
    _assert_proper(c, edges)
    assert sorted(c.values()) == [0, 1, 2]


def test_star_two_colors(spark):
    edges = [(0, i) for i in range(1, 8)]
    c = _coloring(spark, edges)
    _assert_proper(c, edges)
    # star is bipartite: center one color, leaves another
    assert len({c[i] for i in range(1, 8)}) == 1
    assert c[0] != c[1]
    assert max(c.values()) <= 1


def test_path_and_even_cycle_proper(spark):
    path = [(i, i + 1) for i in range(9)]
    c = _coloring(spark, path)
    _assert_proper(c, path)
    assert max(c.values()) + 1 <= 3  # Delta+1 = 3 on a path
    cycle = [(i, (i + 1) % 8) for i in range(8)]
    c = _coloring(spark, cycle)
    _assert_proper(c, cycle)
    assert max(c.values()) + 1 <= 3


def test_clique_uses_exactly_k_colors(spark):
    k = 5
    edges = [(i, j) for i in range(k) for j in range(i + 1, k)]
    c = _coloring(spark, edges)
    _assert_proper(c, edges)
    assert sorted(c.values()) == list(range(k))


def test_dup_reversed_selfloop_insensitive(spark):
    base = [(0, 1), (1, 2), (2, 0), (2, 3)]
    messy = base + [(1, 0), (2, 1), (0, 1), (3, 3)]
    assert _coloring(spark, base) == _coloring(spark, messy)


def test_deterministic_and_seed_sensitive(spark):
    edges = [(i, (i * 7 + 1) % 20) for i in range(40)]
    e = edges_df(spark, edges)
    a = {r["id"]: r["color"] for r in greedy_coloring(e, seed=1).collect()}
    b = {r["id"]: r["color"] for r in greedy_coloring(e, seed=1).collect()}
    assert a == b
    _assert_proper(a, edges)


def test_empty(spark):
    out = greedy_coloring(edges_df(spark, []))
    assert out.count() == 0
    assert out.columns == ["id", "color"]


def _replay(edges, seed=42):
    adj = defaultdict(set)
    vs = set()
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
        vs.add(s)
        vs.add(d)

    def pri(c, r, v):
        return int(hashlib.md5(
            f"color:{seed}:{c}:{r}:{v}".encode()).hexdigest()[:15], 16)

    active = set(vs)
    color = 0
    out = {}
    while active:
        cand = set(active)
        mis = set()
        rnd = 0
        while cand:
            rnd += 1
            p = {v: pri(color, rnd, v) for v in cand}
            win = {v for v in cand
                   if all(p[v] < p[u] for u in adj[v] if u in cand)}
            mis |= win
            rm = set(win)
            for w in win:
                rm |= adj[w] & cand
            cand -= rm
        for v in mis:
            out[v] = color
        active -= mis
        color += 1
    return out


def test_matches_python_replay_and_degree_bound(spark):
    # deterministic pseudo-random graph with hubs
    edges = []
    for i in range(60):
        edges.append((i % 17, (i * 13 + 5) % 23))
        edges.append((i % 5, (i * 7 + 2) % 23))
    got = _coloring(spark, edges)
    assert got == _replay(edges)
    _assert_proper(got, edges)
    deg = defaultdict(set)
    for s, d in edges:
        if s != d:
            deg[s].add(d)
            deg[d].add(s)
    max_deg = max(len(v) for v in deg.values())
    assert max(got.values()) + 1 <= max_deg + 1
    # the Delta+1 witness: a vertex colored c has a neighbor in every
    # earlier color class
    for v, c in got.items():
        nbr_colors = {got[u] for u in deg[v]}
        assert set(range(c)) <= nbr_colors
