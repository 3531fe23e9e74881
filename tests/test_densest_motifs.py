"""Densest-subgraph greedy peel and rectangle (4-cycle) count vs
hand-computable fixtures and brute-force oracles (SURVEY.md §5
strategy: constructed fixtures + seeded random cross-checks)."""

from __future__ import annotations

import itertools
import random

from conftest import edges_df
from pagerank_spark.operators.densest import densest_subgraph
from pagerank_spark.operators.motifs import rectangle_count


# ---------------------------------------------------------------- oracles

def _peel_oracle(edges, eps=0.5):
    """Pure-python replay of the Bahmani peel on the simple undirected
    graph: returns (best_vertex_set, best_density, best_round)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    factor = 2.0 * (1.0 + eps)
    best = (-1.0, 0, frozenset())
    rnd = 0
    verts = set(adj)
    while verts:
        rnd += 1
        deg = {v: sum(1 for w in adj[v] if w in verts) for v in verts}
        m = sum(deg.values()) // 2
        n = len(verts)
        density = m / n
        if density > best[0]:
            best = (density, rnd, frozenset(verts))
        thr = factor * density
        verts = {v for v in verts if deg[v] > thr}
    return set(best[2]), best[0], best[1]


def _rect_oracle(edges, max_degree=10_000):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    keep = {v for v in adj if len(adj[v]) <= max_degree}
    n_rect = 0
    n_pairs = 0
    for u, w in itertools.combinations(sorted(keep), 2):
        cn = sum(1 for c in adj[u] & adj[w] if c in keep)
        if cn >= 2:
            n_pairs += 1
            n_rect += cn * (cn - 1) // 2
    assert n_rect % 2 == 0
    return n_rect // 2, n_pairs, len(keep)


def _run_densest(spark, edges, **kw):
    r = densest_subgraph(edges_df(spark, edges), **kw)
    got = {row["id"] for row in r.vertices.collect()}
    return got, r


def _run_rect(spark, edges, **kw):
    row = rectangle_count(edges_df(spark, edges), **kw).collect()[0]
    return (row["n_rectangles"], row["n_wedge_pairs"],
            row["n_vertices_counted"])


# ---------------------------------------------------------------- densest

def test_densest_clique_plus_path(spark):
    # 5-clique (density 2.0) + pendant path.  At eps=0.1 the round-1
    # threshold 2.2 * 13/8 = 3.575 drops exactly the path (deg <= 2),
    # so round 2 is the bare clique and must win with density 2.0.
    # (At the default eps=0.5 the threshold 4.875 also peels the
    # clique's own deg-4 vertices, so round 1 — the whole graph at
    # density 1.625 — is correctly the best round; the python-replay
    # random test covers that regime.)
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    got, r = _run_densest(spark, clique + path, eps=0.1)
    assert got == {0, 1, 2, 3, 4}
    assert r.density == 2.0
    assert r.n_vertices == 5 and r.n_edges == 10
    want, wdensity, wround = _peel_oracle(clique + path, eps=0.1)
    assert (got, r.density, r.best_round) == (want, wdensity, wround)


def test_densest_matches_python_peel_random(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    # embed a near-clique so the answer is non-trivial
    edges += [(a, b) for a in range(50, 58) for b in range(50, 58)
              if a < b and (a + b) % 7 != 0]
    want, wdensity, wround = _peel_oracle(edges)
    got, r = _run_densest(spark, edges)
    assert got == want
    assert r.density == wdensity
    assert r.best_round == wround


def test_densest_direction_and_dups_ignored(spark):
    base = [(0, 1), (1, 2), (2, 0)]
    noisy = base + [(1, 0), (2, 1), (0, 2), (0, 0), (1, 1), (2, 0)]
    got_a, ra = _run_densest(spark, base)
    got_b, rb = _run_densest(spark, noisy)
    assert got_a == got_b == {0, 1, 2}
    assert ra.density == rb.density == 1.0


def test_densest_empty_graph(spark):
    got, r = _run_densest(spark, [(3, 3)])  # self-loop only -> empty
    assert got == set()
    assert r.density == 0.0 and r.best_round == 0 and r.rounds == 1


def test_densest_checkpoint_cadence(spark, tmp_ckpt):
    from pagerank_spark.checkpoint import CheckpointManager

    edges = [(a, b) for a in range(6) for b in range(6) if a < b]
    edges += [(5, 6), (6, 7)]
    ck = CheckpointManager(spark, tmp_ckpt, interval=1)
    got, r = _run_densest(spark, edges, checkpoint=ck)
    want, wdensity, _ = _peel_oracle(edges)
    assert got == want and r.density == wdensity


# -------------------------------------------------------------- rectangles

def test_rect_single_square(spark):
    assert _run_rect(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]) == (1, 2, 4)


def test_rect_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    # K4 holds 3 distinct 4-cycles; all 6 vertex pairs have 2 common
    # neighbors.
    assert _run_rect(spark, k4) == (3, 6, 4)


def test_rect_triangle_free_and_none(spark):
    # a path has no 4-cycles and no pair with >= 2 common neighbors
    assert _run_rect(spark, [(0, 1), (1, 2), (2, 3)]) == (0, 0, 4)


def test_rect_degree_cap_induces_subgraph(spark):
    # C4 plus a hub adjacent to everything: cap 2 drops the hub (deg 4)
    # and counts exactly the C4; the cap also drops nothing else.
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    hub = [(9, v) for v in range(4)]
    assert _run_rect(spark, c4 + hub, max_degree=3)[0] == 1
    n_rect, _, n_kept = _run_rect(spark, c4 + hub, max_degree=3)
    assert n_kept == 4  # hub excluded, C4 vertices have deg 3


def test_rect_matches_brute_force_random(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(18), rng.randrange(18)) for _ in range(70)]
    assert _run_rect(spark, edges) == _rect_oracle(edges)
