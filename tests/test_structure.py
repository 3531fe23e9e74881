"""HITS / clustering coefficient / k-core / degree distribution vs
exact fixtures and brute-force NumPy oracles (SURVEY.md §5 strategy:
constructed graphs with known answers + seeded random cross-checks)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from conftest import edges_df
from pagerank_spark.operators import (
    clustering_coefficients,
    degree_distribution,
    hits,
    k_core,
)


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def hits_oracle(edges, n, k):
    A = np.zeros((n, n))
    for s, d in set(edges):
        A[s, d] = 1.0
    h, a = np.ones(n), np.zeros(n)
    for _ in range(k):
        a_un = A.T @ h
        h_un = A @ a_un
        a = a_un / np.linalg.norm(a_un)
        h = h_un / np.linalg.norm(h_un)
    return h, a


def lcc_oracle(edges):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    for v, ns in nbrs.items():
        deg = len(ns)
        if deg < 2:
            continue
        tri = sum(1 for a in ns for b in ns if a < b and b in nbrs.get(a, ()))
        out[v] = (deg, tri, 2.0 * tri / (deg * (deg - 1)))
    return out


def kcore_oracle(edges, k):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    alive = set(nbrs)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if sum(1 for u in nbrs[v] if u in alive) < k:
                alive.discard(v)
                changed = True
    return alive


# ---------------------------------------------------------------- HITS

def test_hits_two_hub_fixture(spark):
    # 0 and 1 both point at {2, 3}; 4 points only at 2.  2 is the top
    # authority; 0/1 are the (equal) top hubs.
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2)]
    res = {r["id"]: (r["hub"], r["auth"])
           for r in hits(edges_df(spark, edges), max_iter=30).collect()}
    h, a = hits_oracle(edges, 5, 30)
    for v in range(5):
        assert res[v][0] == pytest.approx(h[v], abs=1e-9)
        assert res[v][1] == pytest.approx(a[v], abs=1e-9)
    assert max(res, key=lambda v: res[v][1]) == 2
    assert res[0][0] == pytest.approx(res[1][0])


def test_hits_random_graph_matches_oracle(spark):
    rng = random.Random(7)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    k = 12
    res = {r["id"]: (r["hub"], r["auth"])
           for r in hits(edges_df(spark, edges), n=n, max_iter=k).collect()}
    h, a = hits_oracle(edges, n, k)
    assert len(res) == n
    for v in range(n):
        assert res[v][0] == pytest.approx(h[v], abs=1e-8)
        assert res[v][1] == pytest.approx(a[v], abs=1e-8)


def test_hits_duplicate_edges_ignored(spark):
    edges = [(0, 1), (0, 1), (0, 1), (2, 1)]
    res = {r["id"]: r["hub"]
           for r in hits(edges_df(spark, edges), max_iter=10).collect()}
    # Multiplicity deduped: 0 and 2 are equal hubs.
    assert res[0] == pytest.approx(res[2])


def test_hits_empty(spark):
    assert hits(edges_df(spark, []).limit(0), max_iter=3).count() == 0


# ----------------------------------------------- clustering coefficient

def test_lcc_clique_is_one(spark):
    res = {r["id"]: r["lcc"]
           for r in clustering_coefficients(
               edges_df(spark, _clique(range(4)))).collect()}
    assert res == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}


def test_lcc_triangle_with_pendant(spark):
    # Triangle {0,1,2} + pendant 3 hanging off 0: lcc(0) = 1/3 (deg 3,
    # one triangle), lcc(1) = lcc(2) = 1, 3 omitted (degree 1).
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    rows = {r["id"]: (r["deg"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(edges_df(spark, edges)).collect()}
    assert rows[0] == (3, 1, pytest.approx(1 / 3))
    assert rows[1] == (2, 1, pytest.approx(1.0))
    assert rows[2] == (2, 1, pytest.approx(1.0))
    assert 3 not in rows


def test_lcc_star_is_zero(spark):
    rows = {r["id"]: r["lcc"]
            for r in clustering_coefficients(
                edges_df(spark, [(0, i) for i in range(1, 6)])).collect()}
    assert rows == {0: 0.0}


def test_lcc_random_graph_matches_oracle(spark):
    rng = random.Random(11)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    rows = {r["id"]: (r["deg"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(edges_df(spark, edges)).collect()}
    oracle = lcc_oracle(edges)
    assert rows.keys() == oracle.keys()
    for v, (deg, tri, lcc) in oracle.items():
        assert rows[v][0] == deg
        assert rows[v][1] == tri
        assert rows[v][2] == pytest.approx(lcc)


# ---------------------------------------------------------------- k-core

def test_kcore_two_cliques_and_chain(spark):
    # 5-clique + 4-clique joined by a chain through 20: chain vertices
    # have degree 2, so the 3-core is both cliques; the 4-core is the
    # 5-clique alone.
    edges = (_clique(range(5)) + _clique(range(10, 14))
             + [(4, 20), (20, 10)])
    df = edges_df(spark, edges)
    assert {r["id"] for r in k_core(df, 3).collect()} == set(range(5)) | set(range(10, 14))
    assert {r["id"] for r in k_core(df, 4).collect()} == set(range(5))
    assert k_core(df, 5).count() == 0


def test_kcore_peel_cascade(spark):
    # Path 0-1-2-3 + triangle {3,4,5}: 2-core must cascade the whole
    # path away (0 goes, then 1, then 2), leaving only the triangle.
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    got = {r["id"] for r in k_core(edges_df(spark, edges), 2).collect()}
    assert got == {3, 4, 5}


def test_kcore_k1_and_random_matches_oracle(spark):
    rng = random.Random(13)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    df = edges_df(spark, edges)
    for k in (1, 2, 3, 4):
        got = {r["id"] for r in k_core(df, k).collect()}
        assert got == kcore_oracle(edges, k), f"k={k}"


# ------------------------------------------------- degree distribution

def test_degree_distribution_star(spark):
    # Star 0→{1..5}: one vertex of out-degree 5, five dangling.
    rows = {r["out_deg"]: r["n_vertices"]
            for r in degree_distribution(
                edges_df(spark, [(0, i) for i in range(1, 6)])).collect()}
    assert rows == {5: 1, 0: 5}


def test_degree_distribution_counts_sum_to_domain(spark):
    rng = random.Random(17)
    edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(200)})
    rows = degree_distribution(edges_df(spark, edges)).collect()
    n = max(max(s, d) for s, d in edges) + 1
    assert sum(r["n_vertices"] for r in rows) == n
    assert sum(r["out_deg"] * r["n_vertices"] for r in rows) == len(set(edges))
