"""ACL sweep-cut local clustering: hand fixtures + a brute-force
check of the cut/vol event trick against direct recomputation from
the returned prefix (SURVEY.md §5 strategy)."""

from __future__ import annotations

import random

import pytest

from conftest import edges_df
from pagerank_spark import graph as G
from pagerank_spark.operators.localcluster import best_local_cluster, sweep_cut


def _sweep(spark, edges, source, **kw):
    g = G.prepare(edges_df(spark, edges))
    return sweep_cut(g, source, **kw).collect()


def _und(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((min(a, b), max(a, b)))
    return s


def _check_cut_vol(edges, rows):
    """Recompute cut/vol of every returned prefix directly."""
    und = _und(edges)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    two_m = 2 * len(und)
    pref: set[int] = set()
    for r in sorted(rows, key=lambda r: r["k"]):
        pref.add(r["id"])
        cut = sum(1 for a, b in und if (a in pref) != (b in pref))
        vol = sum(deg[v] for v in pref)
        assert r["cut"] == cut, (r, cut)
        assert r["vol"] == vol, (r, vol)
        denom = min(vol, two_m - vol)
        if denom > 0:
            assert r["phi_q6"] == cut * 1_000_000 // denom
        else:
            assert r["phi_q6"] is None


def test_sweep_two_cliques_finds_the_clique(spark):
    # PPR runs on the DIRECTED graph, so feed both directions — with
    # only a<b edges vertex 0 has no in-edge and pr(0) stays 0.
    k5a = [(a, b) for a in range(5) for b in range(5) if a != b]
    k5b = [(a, b) for a in range(5, 10) for b in range(5, 10) if a != b]
    edges = k5a + k5b + [(0, 5), (5, 0)]
    rows = _sweep(spark, edges, source=1, max_iter=3, max_prefix=8)
    _check_cut_vol(edges, rows)
    best = best_local_cluster(
        sweep_cut(G.prepare(edges_df(spark, edges)), 1, max_iter=3,
                  max_prefix=8)).first()
    assert best["k"] == 5           # the seed's K5
    assert best["cut"] == 1         # only the bridge leaves it
    assert best["vol"] == 21        # 4*4 + 5 (bridge endpoint)
    assert best["phi_q6"] == 1_000_000 // 21


def test_sweep_event_trick_on_random_graphs(spark):
    rng = random.Random(41)
    for trial in range(2):
        edges = list({(rng.randrange(15), rng.randrange(15))
                      for _ in range(40)})
        rows = _sweep(spark, edges, source=edges[0][0], max_iter=3,
                      max_prefix=10)
        assert rows, edges
        _check_cut_vol(edges, rows)
        ks = sorted(r["k"] for r in rows)
        assert ks == list(range(1, len(ks) + 1))   # dense prefix ranks


def test_sweep_salted_equals_unsalted(spark):
    edges = [(a, b) for a in range(6) for b in range(6) if a < b]
    edges += [(5, 9), (9, 10), (10, 11)]
    g = G.prepare(edges_df(spark, edges))
    a = sorted(map(tuple, sweep_cut(g, 0, max_prefix=8,
                                    salt_buckets=1).collect()))
    b = sorted(map(tuple, sweep_cut(g, 0, max_prefix=8,
                                    salt_buckets=16).collect()))
    assert a == b


def test_sweep_rejects_bad_params(spark):
    g = G.prepare(edges_df(spark, [(0, 1)]))
    with pytest.raises(ValueError):
        sweep_cut(g, 0, max_prefix=0)
    with pytest.raises(ValueError):
        sweep_cut(g, 0, salt_buckets=0)
