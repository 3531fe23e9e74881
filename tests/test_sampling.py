"""Fixed-fanout neighbor sampling vs a brute-force Python replay
(SURVEY.md §5 strategy: constructed graphs + replicated deterministic
hashes)."""

from __future__ import annotations

import hashlib
import random

from conftest import edges_df
from pagerank_spark.operators.sampling import neighbor_sample


def _key(s: int, d: int) -> str:
    return (hashlib.md5(f"{s}:{d}".encode()).hexdigest()
            + str(d).zfill(12))


def _brute(edges, seeds, fanout, hops, directed):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        if not directed:
            nbrs.setdefault(d, set()).add(s)
    expanded = set(seeds)
    frontier = sorted(set(seeds))
    out = set()
    for h in range(1, hops + 1):
        nxt = set()
        for u in frontier:
            picked = sorted(nbrs.get(u, ()), key=lambda v: _key(u, v))
            for v in picked[:fanout]:
                out.add((u, v, h))
                if v not in expanded:
                    nxt.add(v)
        expanded |= nxt
        frontier = sorted(nxt)
        if not frontier:
            break
    return out


def _rows(df):
    return {(r["src"], r["dst"], r["hop"]) for r in df.collect()}


def test_matches_brute_force_random_graph(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(150)})
    for directed in (True, False):
        got = _rows(neighbor_sample(
            edges_df(spark, edges), seeds=[0, 1], fanout=3, hops=3,
            directed=directed))
        assert got == _brute(edges, [0, 1], 3, 3, directed)


def test_fanout_bound_and_expanded_once(spark):
    # star: hub 0 with 20 spokes, spokes chained 1->2->...->20
    edges = [(0, i) for i in range(1, 21)] + [
        (i, i + 1) for i in range(1, 20)]
    rows = _rows(neighbor_sample(
        edges_df(spark, edges), seeds=[0], fanout=4, hops=2,
        directed=True))
    hop1 = {r for r in rows if r[2] == 1}
    assert len(hop1) == 4                       # fanout binds at the hub
    srcs_by_hop: dict[int, set[int]] = {}
    for s, _d, h in rows:
        srcs_by_hop.setdefault(s, set()).add(h)
    # expanded-once: every src is expanded at exactly one hop
    assert all(len(hs) == 1 for hs in srcs_by_hop.values())
    # brute-force replay agrees exactly
    assert rows == _brute(edges, [0], 4, 2, True)


def test_bipartite_directed_hop2_empty(spark):
    # src domain and dst domain disjoint: hop 2 must be empty directed
    edges = [(i, 100 + i * 3 + j) for i in range(3) for j in range(3)]
    rows = _rows(neighbor_sample(
        edges_df(spark, edges), seeds=[0, 1, 2], fanout=2, hops=2,
        directed=True))
    assert rows and all(h == 1 for _s, _d, h in rows)


def test_absent_seeds_and_determinism(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    df = edges_df(spark, edges)
    assert _rows(neighbor_sample(df, seeds=[99], fanout=2, hops=2)) == set()
    a = _rows(neighbor_sample(df, seeds=[0], fanout=1, hops=2,
                              directed=False))
    b = _rows(neighbor_sample(df, seeds=[0], fanout=1, hops=2,
                              directed=False))
    assert a == b == _brute(edges, [0], 1, 2, False)
