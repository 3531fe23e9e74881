"""Seeded label spreading vs exact fixtures and a plain-Python replay
(SURVEY.md §5 strategy); the sf0.01 unrolled-CTE parity runs in
tests/test_entry_contract.py."""

from __future__ import annotations

import random

import pytest

from conftest import edges_df
from pagerank_spark.operators.labelspread import (
    QUANT,
    label_spreading,
    modular_seeds,
)


def spread_oracle(edges, seeds, alpha, k):
    """Plain-Python mirror of operators/labelspread.py."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    deg: dict[int, int] = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    y = {(v, c): 1.0 for v, c in seeds}
    for _ in range(k):
        acc: dict[tuple[int, int], float] = {}
        for s, d in sym:
            for (v, c), yv in list(y.items()):
                if v == s:
                    acc[(d, c)] = acc.get((d, c), 0.0) + yv * (1.0 / deg[s])
        nxt: dict[tuple[int, int], float] = {}
        for key, g in acc.items():
            nxt[key] = alpha * g
        for v, c in seeds:
            nxt[(v, c)] = nxt.get((v, c), 0.0) + (1.0 - alpha)
        y = {key: round(val, QUANT) for key, val in nxt.items()
             if round(val, QUANT) != 0.0}
    best: dict[int, tuple[float, int]] = {}
    for (v, c), yv in y.items():
        cur = best.get(v)
        if cur is None or (-yv, c) < (-cur[0], cur[1]):
            best[v] = (yv, c)
    return {v: c for v, (yv, c) in best.items()}


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in seeds], "id LONG, label LONG")


def test_spreading_two_cliques(spark):
    # Two disjoint triangles; one seed each — every vertex adopts its
    # own clique's class.
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    out = label_spreading(edges_df(spark, edges),
                          _seeds_df(spark, [(0, 7), (10, 9)]),
                          alpha=0.8, iterations=8)
    lbl = {r["id"]: r["label"] for r in out.collect()}
    assert {lbl[v] for v in (0, 1, 2)} == {7}
    assert {lbl[v] for v in (10, 11, 12)} == {9}


def test_spreading_matches_python_oracle(spark):
    rng = random.Random(13)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    edges = [(s, d) for s, d in edges if s != d]
    seeds = [(v, v % 3) for v in range(0, n, 5)]
    out = label_spreading(edges_df(spark, edges), _seeds_df(spark, seeds),
                          alpha=0.85, iterations=5)
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == spread_oracle(edges, seeds, 0.85, 5)


def test_spreading_unreached_absent(spark):
    # 3 -> 4 is a separate component with no seed: absent from output.
    out = label_spreading(edges_df(spark, [(0, 1), (3, 4)]),
                          _seeds_df(spark, [(0, 1)]),
                          alpha=0.5, iterations=4)
    ids = {r["id"] for r in out.collect()}
    assert ids == {0, 1}


def test_spreading_alpha_bounds(spark):
    e = edges_df(spark, [(0, 1)])
    s = _seeds_df(spark, [(0, 0)])
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            label_spreading(e, s, alpha=bad, iterations=1)


def test_modular_seeds_rule(spark):
    # class = (id DIV mod) % n_classes: distinct classes even though
    # mod is a multiple of n_classes
    e = edges_df(spark, [(0, 16), (16, 33), (32, 5), (48, 7)])
    rows = {(r["id"], r["label"])
            for r in modular_seeds(e, 16, 4).collect()}
    assert rows == {(0, 0), (16, 1), (32, 2), (48, 3)}
