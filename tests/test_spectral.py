"""Fiedler vector vs numpy Laplacian eigendecomposition and the
barbell bisection fixture (SURVEY.md §5 strategy); the sf0.01
unrolled-CTE parity runs in tests/test_entry_contract.py."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from pagerank_spark.operators.spectral import fiedler_vector


def _laplacian(edges, n):
    L = np.zeros((n, n))
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    for a, b in und:
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    return L


def _vec(df, n):
    v = np.zeros(n)
    for r in df.collect():
        v[r["id"]] = r["fiedler"]
    return v


BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    + [(4, 5)]
)


def test_fiedler_bisects_barbell(spark):
    v = _vec(fiedler_vector(edges_df(spark, BARBELL), iterations=60), 10)
    assert len({np.sign(x) for x in v[:5]}) == 1
    assert len({np.sign(x) for x in v[5:]}) == 1
    assert np.sign(v[0]) == -np.sign(v[9])
    assert abs(v.sum()) < 1e-9                       # deflated
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)


def test_fiedler_matches_numpy_eigenvector(spark):
    n = 10
    v = _vec(fiedler_vector(edges_df(spark, BARBELL), iterations=150), n)
    L = _laplacian(BARBELL, n)
    evals, evecs = np.linalg.eigh(L)
    top = evecs[:, 1]                                # second-smallest
    assert evals[1] > 1e-9                           # connected
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-3
    # Rayleigh quotient sits at algebraic connectivity
    assert v @ L @ v == pytest.approx(evals[1], abs=1e-3)


def test_fiedler_edgeless_and_empty(spark):
    assert fiedler_vector(edges_df(spark, []), iterations=3).count() == 0
    out = fiedler_vector(edges_df(spark, [(2, 2)]), n=3,
                         iterations=3).collect()
    assert {r["fiedler"] for r in out} == {0.0}
    assert len(out) == 3
