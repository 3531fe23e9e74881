"""Maximal matching / coarsening vs exact invariants and a
plain-Python round replay (SURVEY.md §5 strategy); the sf0.01
unrolled-CTE parity runs in tests/test_entry_contract.py."""

from __future__ import annotations

import hashlib
import random

import pytest

from conftest import edges_df
from pagerank_spark.operators.matching import (
    coarsen_graph,
    matching_vertex_map,
    maximal_matching,
)


def _key(lo, hi, seed, rnd):
    h = hashlib.md5(f"match:{seed}:{rnd}:{lo}:{hi}".encode()).hexdigest()
    return f"{h}:{lo}:{hi}"


def matching_oracle(edges, seed, max_rounds=200):
    """Plain-Python mirror of operators/matching.py."""
    cur = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    out = []
    rnd = 0
    while cur:
        rnd += 1
        assert rnd <= max_rounds
        keys = {e: _key(e[0], e[1], seed, rnd) for e in cur}
        vmin: dict[int, str] = {}
        for (lo, hi), k in keys.items():
            for v in (lo, hi):
                if v not in vmin or k < vmin[v]:
                    vmin[v] = k
        won = [e for e, k in keys.items()
               if vmin[e[0]] == k and vmin[e[1]] == k]
        gone = {v for e in won for v in e}
        out.extend((lo, hi, rnd) for lo, hi in won)
        cur = {e for e in cur if e[0] not in gone and e[1] not in gone}
    return sorted(out)


def _rand_edges(seed, n=40, m=160):
    rng = random.Random(seed)
    es = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    return [(s, d) for s, d in es if s != d]


def test_matching_is_matching_and_maximal(spark):
    edges = _rand_edges(3)
    got = maximal_matching(edges_df(spark, edges), seed=7).collect()
    pairs = [(r["lo"], r["hi"]) for r in got]
    used = [v for p in pairs for v in p]
    assert len(used) == len(set(used))          # vertex-disjoint
    matched = set(used)
    for s, d in edges:                          # maximality
        if s != d:
            assert s in matched or d in matched


def test_matching_replays_python_oracle(spark):
    edges = _rand_edges(11)
    got = sorted(
        (r["lo"], r["hi"], r["match_round"])
        for r in maximal_matching(edges_df(spark, edges), seed=5).collect())
    assert got == matching_oracle(edges, 5)


def test_matching_deterministic_and_multiplicity_blind(spark):
    edges = _rand_edges(4)
    a = sorted(map(tuple, maximal_matching(
        edges_df(spark, edges), seed=9).collect()))
    b = sorted(map(tuple, maximal_matching(
        edges_df(spark, edges + edges[:13] + [(d, s) for s, d in edges[:7]]),
        seed=9).collect()))
    assert a == b


def test_matching_triangle_single_pair(spark):
    got = maximal_matching(edges_df(spark, [(0, 1), (1, 2), (0, 2)]),
                           seed=1).collect()
    assert len(got) == 1   # any one edge of a triangle is maximal


def test_matching_empty_and_selfloop(spark):
    assert maximal_matching(edges_df(spark, []), seed=1).count() == 0
    assert maximal_matching(edges_df(spark, [(3, 3)]), seed=1).count() == 0


def test_vertex_map_covers_domain(spark):
    edges = _rand_edges(8)
    e = edges_df(spark, edges)
    m = maximal_matching(e, seed=2)
    vm = {r["id"]: r["rep"] for r in matching_vertex_map(e, m).collect()}
    dom = {v for p in edges for v in p}
    assert set(vm) == dom
    for r in m.collect():
        assert vm[r["lo"]] == r["lo"] and vm[r["hi"]] == r["lo"]
    reps = set(vm.values())
    for v in dom - {r2 for row in m.collect() for r2 in (row["lo"], row["hi"])}:
        assert vm[v] == v and v in reps


def test_coarsen_invariants(spark):
    edges = _rand_edges(6)
    e = edges_df(spark, edges)
    m = maximal_matching(e, seed=3)
    c = coarsen_graph(e, m).collect()
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    # total weight = deduped input edges minus those contracted into a
    # pair's self-loop (exactly the matched edges, since winners are
    # the only (lo, hi) pairs mapping to one rep on a simple graph).
    assert sum(r["weight"] for r in c) == len(und) - m.count()
    for r in c:
        assert r["src"] < r["dst"] and r["weight"] >= 1
    # contracted vertex count shrinks by exactly one per matched pair
    vm = {r["id"]: r["rep"]
          for r in matching_vertex_map(e, m).collect()}
    dom = {v for p in edges for v in p}
    assert len(set(vm.values())) == len(dom) - m.count()
