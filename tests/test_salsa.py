"""SALSA vs hand-computed fixtures and a brute-force Python oracle
(SURVEY.md §5 strategy: constructed graphs with known answers + seeded
random cross-checks); the sf0.01 unrolled-CTE parity runs in
tests/test_entry_contract.py."""

from __future__ import annotations

import random

import pytest

from conftest import edges_df
from pagerank_spark.operators.salsa import salsa


def salsa_oracle(edges, n, k):
    """Plain-Python mirror of operators/salsa.py: k steps of the
    degree-normalized mutual recursion, hub L1-normalized per step,
    authority normalized once at the end (the cancellation face)."""
    es = sorted(set(edges))
    odeg: dict[int, int] = {}
    ideg: dict[int, int] = {}
    for s, d in es:
        odeg[s] = odeg.get(s, 0) + 1
        ideg[d] = ideg.get(d, 0) + 1
    h = [1.0] * n
    a_un = [0.0] * n
    for _ in range(k):
        a_un = [0.0] * n
        for s, d in es:
            a_un[d] += h[s] * (1.0 / odeg[s])
        h_un = [0.0] * n
        for s, d in es:
            h_un[s] += a_un[d] * (1.0 / ideg[d])
        nh = sum(h_un)
        if nh == 0.0:
            return [0.0] * n, [0.0] * n
        h = [x / nh for x in h_un]
    na = sum(a_un)
    a = [x / na if na else 0.0 for x in a_un]
    return h, a


def _run(spark, edges, k=4, **kw):
    out = salsa(edges_df(spark, edges), max_iter=k, tol=0.0, **kw)
    rows = out.collect()
    return ({r["id"]: r["hub"] for r in rows},
            {r["id"]: r["auth"] for r in rows})


def test_salsa_star(spark):
    # Star 0 -> {1, 2, 3}: the only hub is 0 (hub = 1), every leaf is
    # an equal authority (auth = 1/3) — exact at every k.
    hub, auth = _run(spark, [(0, 1), (0, 2), (0, 3)], k=3)
    assert hub[0] == pytest.approx(1.0)
    for v in (1, 2, 3):
        assert hub[v] == 0.0
        assert auth[v] == pytest.approx(1.0 / 3.0)
    assert auth[0] == 0.0


def test_salsa_distributions_sum_to_one(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (1, 4)]
    hub, auth = _run(spark, edges, k=5)
    assert sum(hub.values()) == pytest.approx(1.0)
    assert sum(auth.values()) == pytest.approx(1.0)


def test_salsa_matches_python_oracle(spark):
    rng = random.Random(7)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(140)})
    edges = [(s, d) for s, d in edges if s != d]
    hub, auth = _run(spark, edges, k=4)
    oh, oa = salsa_oracle(edges, n, 4)
    for v in range(n):
        assert hub.get(v, 0.0) == pytest.approx(oh[v], abs=1e-12)
        assert auth.get(v, 0.0) == pytest.approx(oa[v], abs=1e-12)


def test_salsa_duplicate_edges_ignored(spark):
    base = [(0, 1), (0, 2), (1, 2)]
    h1, a1 = _run(spark, base, k=3)
    h2, a2 = _run(spark, base + base + [(0, 1)], k=3)
    assert h1 == h2 and a1 == a2


def test_salsa_convergence_mode(spark):
    # tol > 0 runs the convergence aggregate; on a 2-cycle the walk is
    # periodic but scores are stationary after one step, so it stops
    # early and both vectors stay uniform over {0, 1}.
    out = salsa(edges_df(spark, [(0, 1), (1, 0)]), tol=1e-12, max_iter=50)
    rows = {r["id"]: (r["hub"], r["auth"]) for r in out.collect()}
    assert rows[0] == (pytest.approx(0.5), pytest.approx(0.5))
    assert rows[1] == (pytest.approx(0.5), pytest.approx(0.5))


def test_salsa_empty(spark):
    out = salsa(edges_df(spark, []), max_iter=3)
    assert out.count() == 0
