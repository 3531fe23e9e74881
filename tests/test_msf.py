"""Minimum spanning forest vs a sequential Kruskal/union-find oracle
(SURVEY.md §5 strategy: constructed fixtures + seeded random
cross-checks).  The (weight, lo, hi) order is strict, so the forest is
unique and set equality is the full correctness check."""

from __future__ import annotations

import random

from conftest import edges_df
from pagerank_spark.operators.msf import minimum_spanning_forest


def _kruskal(edges):
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        lo, hi = min(s, d), max(s, d)
        canon[(lo, hi)] = min(canon.get((lo, hi), float("inf")), w)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, lo, hi in sorted((w, lo, hi) for (lo, hi), w in canon.items()):
        a, b = find(lo), find(hi)
        if a != b:
            parent[a] = b
            out.add((lo, hi, w))
    return out


def _run(spark, weighted):
    df = spark.createDataFrame(
        weighted, "src BIGINT, dst BIGINT, weight DOUBLE")
    return {(r["src"], r["dst"], r["weight"])
            for r in minimum_spanning_forest(df).collect()}


def test_msf_two_triangles_and_bridge(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0),
             (10, 11, 1.0), (11, 12, 1.0), (12, 10, 5.0),
             (2, 10, 4.0)]
    got = _run(spark, edges)
    assert got == _kruskal(edges)
    # the heaviest edge of each cycle is excluded, the bridge kept
    assert (2, 0, 3.0) not in got and (10, 12, 5.0) not in got
    assert (2, 10, 4.0) in got and len(got) == 5


def test_msf_random_matches_kruskal(spark):
    rng = random.Random(17)
    for _ in range(3):
        raw = list({(rng.randrange(45), rng.randrange(45))
                    for _ in range(160)})
        edges = [(s, d, float((s + d) % 7 + 1)) for s, d in raw]
        assert _run(spark, edges) == _kruskal(edges)


def test_msf_duplicates_reversals_self_loops(spark):
    edges = [(1, 2, 5.0), (2, 1, 3.0), (1, 2, 7.0), (3, 3, 1.0),
             (2, 3, 4.0)]
    assert _run(spark, edges) == {(1, 2, 3.0), (2, 3, 4.0)}


def test_msf_forest_input_is_identity(spark):
    # an input that is already a forest comes back verbatim
    edges = [(0, 1, 9.0), (1, 2, 1.0), (5, 6, 2.0)]
    assert _run(spark, edges) == {(0, 1, 9.0), (1, 2, 1.0), (5, 6, 2.0)}


def test_msf_size_is_v_minus_components(spark):
    rng = random.Random(29)
    raw = list({(rng.randrange(30), rng.randrange(30))
                for _ in range(70)})
    edges = [(s, d, float((s + d) % 7 + 1)) for s, d in raw]
    got = _run(spark, edges)
    verts = {v for s, d, _ in edges for v in (s, d) if s != d}
    adj: dict[int, set[int]] = {}
    for s, d, _ in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seen: set[int] = set()
    ncomp = 0
    for v in verts:
        if v in seen:
            continue
        ncomp += 1
        stack = [v]
        seen.add(v)
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
    assert len(got) == len(verts) - ncomp
