"""Similarity search over an embedding column (array<float>).

Two paths:

- ``cosine_topk``: exact brute-force top-k neighbors for a query set —
  the baseline and the oracle-checkable variant.  The dot product is a
  JVM-side ``aggregate(zip_with(...))`` fold, whole-stage codegen'd;
  no Python.  Cost is |Q| × |N| — fine for |Q| small, and the
  reference answer generator for recall testing.
- ``lsh_topk``: random-hyperplane LSH-bucketed ANN — the scale path.
  Hyperplane signs come from a deterministic portable hash of
  (dimension, plane) so bucketing is reproducible across engines and
  cluster sizes.  Probing compares only vectors sharing a bucket
  (multi-probe over ``n_tables`` independent tables), turning the
  |Q| × |N| scan into equi-joins on bucket keys.

At 1e9 vectors: n_tables × |N| bucket rows shuffle once at index build;
each query touches ~|N| / 2^n_planes × n_tables candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors.

    ``embeddings``: (vec_id, embedding); ``queries``: (query_id,
    embedding).  Returns (query_id, neighbor_id, cosine, rank) with
    rank 1..k, self-matches excluded, ties broken by neighbor_id.
    """
    q = queries.select(F.col("query_id"), F.col("embedding").alias("q_emb"))
    n = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q).crossJoin(n)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_cosine(F.col("q_emb"), F.col("n_emb")), 6)
                .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# Projections are quantized to this many digits BEFORE the >=0 sign
# compare, in every face (JVM fold, numpy matmul, DuckDB oracle).  The
# three faces sum the same per-dimension terms in different orders, so
# raw sums differ by ~1e-15; a projection that close to exactly 0 would
# otherwise flip a bucket bit between engines.  Same quantize-before-
# compare contract as IVF_DIST_ROUND in ivf_topk.
PROJ_ROUND = 9


def _plane_signs(plane: int, seed: int, dims: int) -> list[float]:
    """Deterministic portable ±1 sign vector for one hyperplane:
    sign(d) = +1 iff the first hex digit of md5("<d>:<plane>:<seed>")
    is odd (1-based d).  Computed ONCE on the driver and embedded as a
    constant array literal — the executor-side cost is a pure
    zip_with/aggregate fold, no hashing in the hot path."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{d}:{plane}:{seed}".encode())
                   .hexdigest()[0], 16) % 2 == 1 else -1.0
        for d in range(1, dims + 1)
    ]


def _hyperplane_sign(emb, plane: int, seed: int, dims: int):
    signs = F.array(*[F.lit(s) for s in _plane_signs(plane, seed, dims)])
    proj = F.aggregate(F.zip_with(emb, signs, lambda x, s: x * s),
                       F.lit(0.0), lambda acc, v: acc + v)
    return F.when(F.round(proj, PROJ_ROUND) >= 0,
                  F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_column(emb, n_planes: int = 8, seed: int = 42, dims: int = 64):
    """Bucket id in [0, 2^n_planes) from random-hyperplane signs."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * F.lit(2) + _hyperplane_sign(emb, p, seed, dims)
    return bucket


def lsh_index(embeddings: DataFrame, n_planes: int = 8,
              n_tables: int = 2, seed: int = 42,
              vectorized: bool = False) -> DataFrame:
    """(vec_id, embedding, table, bucket) — one row per table.

    Two physical paths with identical bucket assignments:

    - JVM expression path (default): per-plane ``aggregate(zip_with)``
      folds — no Python, oracle-reproducible term by term.  Interpreted
      higher-order functions cost ~O(n_tables × n_planes × dims) slow
      per-element steps per row, which adds up at 1e9 vectors.
    - ``vectorized=True``: ONE Arrow-batched mapInPandas pass; all
      tables' projections are a single numpy matmul per batch
      (batch × dims @ dims × (tables·planes)), ~100x less per-row
      overhead.  Same md5-derived sign matrix; equivalence is asserted
      in tests, and both faces quantize the projection to PROJ_ROUND
      digits before the sign compare so summation-order drift near 0
      cannot flip a bucket bit.
    """
    first = embeddings.select("embedding").first()
    dims = len(first["embedding"]) if first else 1
    if vectorized:
        return _lsh_index_vectorized(embeddings, n_planes, n_tables, seed, dims)
    tables = [
        embeddings.select(
            "vec_id", "embedding", F.lit(t).alias("table"),
            lsh_bucket_column(F.col("embedding"), n_planes, seed + 1000 * t,
                              dims).alias("bucket"))
        for t in range(n_tables)
    ]
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out


def _lsh_index_vectorized(embeddings: DataFrame, n_planes: int,
                          n_tables: int, seed: int, dims: int) -> DataFrame:
    """Arrow/numpy bucket computation: one matmul per batch for ALL
    tables; signs computed once on the driver and closed over."""
    import numpy as np

    # dims × (n_tables · n_planes), same column order as the fold:
    # plane 0 is the most significant bit.
    signs = np.column_stack([
        _plane_signs(p, seed + 1000 * t, dims)
        for t in range(n_tables) for p in range(n_planes)
    ])
    weights = (2 ** np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    id_field = embeddings.schema["vec_id"].dataType.simpleString()
    emb_field = embeddings.schema["embedding"].dataType.simpleString()
    schema = (f"vec_id {id_field}, embedding {emb_field}, "
              "table int, bucket int")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            e = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["embedding"]])
            proj = e @ signs                      # n × (tables·planes)
            bits = (np.round(proj, PROJ_ROUND) >= 0).astype(np.int64)
            frames = []
            for t in range(n_tables):
                b = bits[:, t * n_planes:(t + 1) * n_planes] @ weights
                frames.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"], "embedding": pdf["embedding"],
                    "table": t, "bucket": b.astype("int32")}))
            yield pd.concat(frames, ignore_index=True)

    return embeddings.mapInPandas(run, schema=schema)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, n_tables: int = 2, seed: int = 42,
             vectorized: bool = False,
             max_bucket: int | None = None) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Same output shape as ``cosine_topk``; recall measured in tests
    against the exact answer.  Queries hash with the same planes, then
    only same-bucket candidates are scored.  ``vectorized`` selects the
    Arrow/numpy bucket path (see :func:`lsh_index`).

    ``max_bucket`` caps the index-side bucket population, mirroring
    ``dedup.minhash_candidate_pairs``: a degenerate bucket holding m
    near-identical vectors contributes m candidate rows to EVERY query
    hashing there — with all |N| embeddings as queries the bucket
    equi-join goes quadratic.  Buckets above the cap are dropped from
    candidate generation (their members are still reachable through
    the other ``n_tables - 1`` independent tables unless over-dense in
    all of them — at which point they are near-duplicates, which is
    the dedup family's job, not ANN's).
    """
    idx = lsh_index(embeddings, n_planes, n_tables, seed,
                    vectorized=vectorized)
    if max_bucket is not None:
        small = (
            idx.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket)
            .select("table", "bucket")
        )
        idx = idx.join(small, ["table", "bucket"])
    qidx = lsh_index(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        n_planes, n_tables, seed, vectorized=vectorized,
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_emb"), "table", "bucket")
    cand = (
        qidx.join(idx, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                "q_emb", F.col("embedding").alias("n_emb"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ------------------------------------------------------------------ IVF

# Cross-engine drift control for the Lloyd iterations: assignment
# distances and centroid components are quantized so last-ulp
# summation-order differences between Spark and the SQL oracle cannot
# flip an argmin or compound across rounds.
IVF_DIST_ROUND = 6
IVF_CENTROID_ROUND = 9


def _dist2(emb, centroid: list[float]):
    arr = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(F.zip_with(emb, arr, lambda x, c: (x - c) * (x - c)),
                       F.lit(0.0), lambda acc, v: acc + v)


def _dist_structs(emb, centroids: list[list[float]]):
    return [F.struct(F.round(_dist2(emb, c), IVF_DIST_ROUND).alias("d"),
                     F.lit(i).alias("c"))
            for i, c in enumerate(centroids)]


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 8,
                  n_iters: int = 3) -> list[list[float]]:
    """Deterministic Lloyd k-means coarse quantizer for the IVF index.

    Init: the embeddings of the ``n_centroids`` SMALLEST vec_ids
    (cluster i = i-th smallest) — seed-free and oracle-reproducible.
    Per round: argmin-assign on quantized L2² (ties → smallest
    cluster), element-wise mean per cluster quantized to
    IVF_CENTROID_ROUND; a cluster that loses every member keeps its
    previous centroid.  Assignment is a pure JVM expression over the
    broadcast-as-literals centroids (no shuffle); the mean is one
    posexplode + hash aggregation per round.  The only driver collects
    are the k seed rows and the k×dims mean cells — constant-size.
    """
    seed_rows = (embeddings.orderBy("vec_id").limit(n_centroids)
                 .select("embedding").collect())
    cents = [[float(v) for v in r["embedding"]] for r in seed_rows]
    if not cents:
        return []
    for _ in range(n_iters):
        # two selects: a posexplode with a multi-alias in the SAME
        # projection clobbers sibling struct field names (Spark 4),
        # breaking the ["c"] extraction inside the argmin
        assigned = embeddings.select(
            "embedding",
            F.least(*_dist_structs(F.col("embedding"), cents))["c"]
            .alias("cluster"))
        assigned = assigned.select(
            "cluster", F.posexplode("embedding").alias("pos", "v"))
        mean_rows = (assigned.groupBy("cluster", "pos")
                     .agg(F.round(F.avg("v"), IVF_CENTROID_ROUND)
                          .alias("v")).collect())
        nxt = [list(c) for c in cents]
        for r in mean_rows:
            nxt[r["cluster"]][r["pos"]] = float(r["v"])
        cents = nxt
    return cents


def ivf_assignments(embeddings: DataFrame, n_centroids: int = 8,
                    n_iters: int = 3) -> DataFrame:
    """(vec_id, cluster, dist2) — the document-clustering face of the
    IVF index: every vector labeled with its converged Lloyd cell and
    the quantized squared distance to that centroid.

    This is exactly the index side of :func:`ivf_topk` exposed as an
    operator (k-means document clustering over the embedding column —
    topic bucketing, mixture analysis, per-cluster sampling).  The
    assignment is one narrow JVM expression over the
    broadcast-as-literals centroids: at 1e9 vectors it is an
    embarrassingly parallel scan with NO shuffle; only the Lloyd
    training loop aggregates (k x dims cells per round, constant
    size).  Same determinism contract as the index (IVF_DIST_ROUND
    quantized argmin, ties to the smallest cluster id) so the DuckDB
    oracle reproduces every label.
    """
    cents = ivf_centroids(embeddings, n_centroids, n_iters)
    if not cents:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id BIGINT, cluster BIGINT, dist2 DOUBLE")
    best = F.least(*_dist_structs(F.col("embedding"), cents))
    return embeddings.select(
        "vec_id",
        best["c"].cast("long").alias("cluster"),
        best["d"].alias("dist2"))


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, n_iters: int = 3,
             n_probes: int = 2) -> DataFrame:
    """IVF approximate top-k cosine neighbors — the second scale path
    next to ``lsh_topk`` (inverted-file coarse quantization, the
    IVFFlat scheme: Jégou et al., "Product Quantization for Nearest
    Neighbor Search", PAMI'11, minus the PQ refinement).

    Index: every vector is assigned to its nearest Lloyd centroid
    (one narrow JVM pass — at 1e9 vectors nothing shuffles until the
    candidate join).  Query: each query probes its ``n_probes``
    nearest centroids and scores ONLY vectors in those cells —
    |Q| × |N| × n_probes / n_centroids candidate pairs instead of the
    brute-force |Q| × |N|, via a plain equi-join on the cell id.
    Returns (query_id, neighbor_id, cosine, rank) with the same
    rounding/tie contract as ``cosine_topk``; recall is governed by
    n_probes/n_centroids (asserted against brute force in tests).
    """
    cents = ivf_centroids(embeddings, n_centroids, n_iters)
    if not cents:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE, "
                "rank BIGINT")
    data = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.least(*_dist_structs(F.col("embedding"), cents))["c"]
        .alias("cluster"))
    probes = queries.select(
        "query_id", F.col("embedding").alias("q_emb"),
        F.explode(F.slice(F.array_sort(F.array(
            *_dist_structs(F.col("embedding"), cents))), 1, n_probes))
        .alias("p")).select("query_id", "q_emb", F.col("p")["c"]
                            .alias("cluster"))
    scored = (
        probes.join(data, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_cosine(F.col("q_emb"), F.col("n_emb")), 6)
                .alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
