"""SCAN structural clustering vs hand fixtures and a brute-force
Python oracle (SURVEY.md §5 strategy; sf0.01 cross-engine parity runs
in tests/test_entry_contract.py)."""

from __future__ import annotations

import math
import random

import pytest

from conftest import edges_df
from pagerank_spark.operators.scan import edge_similarity, scan_clusters


def scan_oracle(edges, eps, mu):
    """Brute-force SCAN: closed-neighborhood σ, cores, min-id cluster
    labels over core-core ε-edges, borders take min adjacent label."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    closed = {v: ns | {v} for v, ns in adj.items()}

    def sigma(u, v):
        return (len(closed[u] & closed[v])
                / math.sqrt(len(closed[u]) * len(closed[v])))

    eps_nbrs = {v: {u for u in adj[v] if sigma(u, v) >= eps - 1e-12}
                for v in adj}
    cores = {v for v in adj if len(eps_nbrs[v]) + 1 >= mu}
    # min-id components over core-core eps edges
    label = {v: v for v in cores}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for u in cores:
        for v in eps_nbrs[u]:
            if v in cores:
                a, b = find(u), find(v)
                if a != b:
                    lo, hi = min(a, b), max(a, b)
                    label[hi] = lo
    out = {v: (find(v), True) for v in cores}
    for u in cores:
        for v in eps_nbrs[u]:
            if v not in cores:
                cur = out.get(v)
                lbl = find(u)
                if cur is None or lbl < cur[0]:
                    out[v] = (lbl, False)
    return {v: (c, ic) for v, (c, ic) in out.items()}


def _got(spark, edges, eps_num, eps_den, mu):
    return {r["id"]: (r["cluster"], r["is_core"])
            for r in scan_clusters(edges_df(spark, edges), eps_num,
                                   eps_den, mu).collect()}


def test_scan_two_cliques_with_bridge_hub(spark):
    # Two K4s {0..3} and {10..13} joined through hub 5: the cliques
    # cluster separately, the hub (σ low to both sides) is absent.
    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = k4a + k4b + [(3, 5), (5, 10)]
    got = _got(spark, edges, 7, 10, 3)
    assert got == scan_oracle(edges, 0.7, 3)
    clusters = {c for c, _ in got.values()}
    assert clusters == {0, 10}
    assert 5 not in got                  # hub: no cluster
    assert all(ic for v, (c, ic) in got.items() if v in (0, 1, 2, 10))


def test_scan_border_attachment(spark):
    # K4 core {0..3} plus a pendant 7 attached to 0 twice (0-7, 1-7):
    # 7's σ to 0/1 is high enough at a loose ε to border-join, but 7
    # itself (μ=3) is not a core.
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(0, 7), (1, 7)]
    got = _got(spark, edges, 1, 2, 4)
    oracle = scan_oracle(edges, 0.5, 4)
    assert got == oracle
    assert got[7] == (0, False)          # border of the K4 cluster
    assert got[0][1] and got[3][1]       # clique vertices are cores


def test_scan_matches_oracle_on_random_graphs(spark):
    rng = random.Random(17)
    for trial in range(3):
        edges = list({(rng.randrange(14), rng.randrange(14))
                      for _ in range(30 + 10 * trial)})
        got = _got(spark, edges, 1, 2, 3)
        assert got == scan_oracle(edges, 0.5, 3), (trial, edges)


def test_scan_similarity_values(spark):
    # Triangle 0-1-2: every edge has common = 3, n = 3 ⇒ σ = 1.
    sim = {(r["lo"], r["hi"]): (r["common"], r["n_lo"], r["n_hi"])
           for r in edge_similarity(
               edges_df(spark, [(0, 1), (1, 2), (2, 0)])).collect()}
    assert sim == {(0, 1): (3, 3, 3), (1, 2): (3, 3, 3),
                   (0, 2): (3, 3, 3)}


def test_scan_rejects_bad_params(spark):
    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        scan_clusters(df, eps_num=3, eps_den=2)   # eps > 1
    with pytest.raises(ValueError):
        scan_clusters(df, eps_num=1, eps_den=0)
    with pytest.raises(ValueError):
        scan_clusters(df, mu=0)


def test_scan_mu_one_isolated_cores(spark):
    # μ=1: every edge-incident vertex is a core by the closed-
    # neighborhood rule, even with zero ε-similar neighbors (a path
    # graph at ε=1 has no ε-edges at all — all singleton cores).
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _got(spark, edges, 1, 1, 1)
    assert got == scan_oracle(edges, 1.0, 1)
    assert got == {v: (v, True) for v in range(4)}
