"""Covariance power iteration vs numpy eigendecomposition
(SURVEY.md §5 strategy: seeded random cross-checks + constructed
fixtures); the sf0.01 unrolled-CTE parity runs in
tests/test_entry_contract.py."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.pipeline.pca import pca_top_direction


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id LONG, embedding ARRAY<FLOAT>")


def _loadings(df):
    rows = df.collect()
    v = np.zeros(len(rows))
    for r in rows:
        v[r["dim"]] = r["loading"]
    return v


def test_pca_recovers_dominant_axis(spark):
    rng = np.random.default_rng(5)
    n, d = 200, 8
    # variance 25 along a fixed unit axis, ~0.01 isotropic noise
    axis = np.zeros(d)
    axis[3] = 1.0
    mat = (rng.normal(size=(n, 1)) * 5.0) @ axis[None, :] \
        + rng.normal(scale=0.1, size=(n, d))
    v = _loadings(pca_top_direction(_df(spark, mat), iterations=30))
    assert abs(abs(v[3]) - 1.0) < 1e-2
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)


def test_pca_matches_numpy_eigenvector(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 6)) @ np.diag([4.0, 2.0, 1, 1, 1, 1])
    v = _loadings(pca_top_direction(_df(spark, mat), iterations=60))
    c = np.cov((mat - mat.mean(0)).astype(np.float32).astype(float),
               rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    # sign-invariant comparison; float32 ingest bounds the agreement
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-3


def test_pca_uncentered_gram_direction(spark):
    # Constant offset dominates the UNcentered second moment: the
    # Gram direction is the mean direction, while centered PCA finds
    # the noise axis instead.
    rng = np.random.default_rng(3)
    mat = np.tile([10.0, 0.0, 0.0], (80, 1))
    mat[:, 1] += rng.normal(scale=0.5, size=80)
    g = _loadings(pca_top_direction(_df(spark, mat), iterations=25,
                                    center=False))
    assert abs(abs(g[0]) - 1.0) < 1e-3
    c = _loadings(pca_top_direction(_df(spark, mat), iterations=25))
    assert abs(abs(c[1]) - 1.0) < 1e-3


def test_pca_empty(spark):
    out = pca_top_direction(
        spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>"))
    assert out.count() == 0


def test_pca_zero_matrix_converges_to_zero(spark):
    out = _loadings(pca_top_direction(
        _df(spark, np.zeros((10, 4))), iterations=3))
    assert np.all(out == 0.0)
