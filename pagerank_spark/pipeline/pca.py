"""Top principal direction of an embedding corpus via covariance
power iteration.

Beyond-reference pipeline operator: the leading PCA direction of an
embedding table is the standard diagnostic/preprocessing primitive of
embedding pipelines — all-but-the-top (ABTT) post-processing,
anisotropy measurement, drift monitoring across ingestion batches —
and at corpus scale the covariance matrix itself (d×d) is cheap but
the N×d pass to build it is not, so the operator must be a
distributed matvec, not a local SVD.

Power iteration without materializing the covariance: per step, with
rows x_i (mean-centered) and the current direction v,

    s_i = (x_i − μ) · v          (per-row fold, fixed in-order)
    w   = Σ_i s_i (x_i − μ)      (map-side-combined d-key aggregation)
    v'  = w / ||w||₂

The per-iteration shuffle is d partial sums per partition (d ≈ 64–4k:
constant-size), the only driver-side state is the d-vector itself —
the same O(1)-per-iteration collect budget as the PageRank loop's
scalar aggregates.  N×d explode rows never leave their partition
before the 64-key partial agg.

Cross-engine determinism: μ and each step's w are quantized to
``QUANT`` decimal digits, then the normalize runs on the quantized
values (engine: driver-side Python over the d collected sums; oracle:
the same round/sqrt/divide CTE chain) — the summation-order ulp
between Spark partial aggs and DuckDB can never reach the next
iterate.  v₀ = 1/√d uniform (exact when d is a power of two); the
iterate from a fixed v₀ is fully deterministic, so there is no sign
ambiguity.
"""

from __future__ import annotations

import decimal
import math

from pyspark.sql import DataFrame, functions as F

# Per-step quantization (decimal digits) of μ and w — module docstring.
QUANT = 12
_Q = decimal.Decimal(1).scaleb(-QUANT)


def _rq(x: float) -> float:
    """Spark/DuckDB ``round()`` semantics (HALF_UP on the exact
    double) for the driver-side normalize — Python's built-in round
    is banker's and would diverge on half-way digits."""
    return float(decimal.Decimal(x).quantize(_Q, decimal.ROUND_HALF_UP))


def _dim_count(embeds: DataFrame, col: str) -> int:
    row = embeds.select(F.size(F.col(col)).alias("d")).first()
    if row is None:
        return 0
    return int(row["d"])


def pca_top_direction(
    embeds: DataFrame,
    col: str = "embedding",
    iterations: int = 3,
    center: bool = True,
) -> DataFrame:
    """(dim, loading) — the leading principal direction after
    ``iterations`` covariance power-iteration steps from the uniform
    start, one row per dimension (0-based), ||loading||₂ = 1 up to the
    per-step quantization.

    ``center=False`` iterates on the uncentered second-moment matrix
    (the Gram direction) instead.  All embeddings must share one
    dimensionality (enforced by the fold, not re-checked).
    """
    spark = embeds.sparkSession
    d = _dim_count(embeds, col)
    if d == 0:
        return spark.createDataFrame([], "dim BIGINT, loading DOUBLE")
    xd = F.transform(F.col(col), lambda e: e.cast("double"))
    X = embeds.select(xd.alias("x")).persist()
    try:
        if center:
            mu_rows = (
                X.select(F.posexplode("x").alias("dim", "v"))
                .groupBy("dim").agg(F.round(F.avg("v"), QUANT).alias("mu"))
                .collect()
            )
            mu = [0.0] * d
            for r in mu_rows:
                mu[int(r["dim"])] = float(r["mu"])
        else:
            mu = [0.0] * d
        v = [_rq(1.0 / math.sqrt(d))] * d
        for _ in range(iterations):
            mu_arr = F.array(*[F.lit(m) for m in mu])
            v_arr = F.array(*[F.lit(x) for x in v])
            xc = F.zip_with("x", mu_arr, lambda a, b: a - b)
            # In-order left fold: deterministic per-row dot product.
            s = F.aggregate(
                F.zip_with(xc, v_arr, lambda a, b: a * b),
                F.lit(0.0), lambda acc, y: acc + y)
            w_rows = (
                X.select(s.alias("s"), F.posexplode(xc).alias("dim", "xv"))
                .groupBy("dim")
                .agg(F.round(F.sum(F.col("s") * F.col("xv")), QUANT)
                     .alias("w"))
                .collect()
            )
            w = [0.0] * d
            for r in w_rows:
                w[int(r["dim"])] = float(r["w"])
            nrm = math.sqrt(sum(x * x for x in w))
            if nrm == 0.0:
                v = [0.0] * d
                break
            v = [_rq(x / nrm) for x in w]
        return spark.createDataFrame(
            [(j, v[j]) for j in range(d)], "dim BIGINT, loading DOUBLE")
    finally:
        X.unpersist()
