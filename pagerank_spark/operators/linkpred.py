"""Neighborhood-overlap link prediction: common neighbors, Jaccard,
Adamic-Adar, preferential attachment.

Not in the reference engine (fixed-function PageRank,
``/root/reference/pagerank/src/lib/pagerank.cpp``); this is the
standard "which edges are missing" query a link-graph analyst runs
next to centralities, and — as a scored candidate-pair generator — the
same shape a training-data pipeline uses to mine hard negatives.

Candidate generation is the wedge join (two neighbors of a shared
center), the one all-pairs-free formulation:

    (u, v) candidate  ⇐  ∃ w : u—w—v,  u < v,  (u,v) ∉ E

Scale design — the wedge fan-out of a center w is C(deg w, 2), so a
single hub center (deg 10^6) would alone emit 5·10^11 rows.  The
``max_center_degree`` cap drops hub centers from candidate generation
BEFORE the self-join (the same guard class as the dedup family's
``max_df`` shingle cap, pipeline/dedup.py): per-key fan-out is then
bounded by ``max_center_degree**2`` and the join stays a plain
shuffle-hash self-join with no skew tail.  Semantically the cap is the
standard practical reading of these scores — a hub common neighbor
carries ~zero evidence (that is WHY Adamic-Adar down-weights by
1/ln(deg)) — and it is applied identically in the DuckDB oracle.

Cross-engine float discipline: the Adamic-Adar sum is quantized
per-term to an INTEGER (floor(1e6 / ln deg)) before aggregation, so
the sum is exact integer arithmetic — partial-sum order can never
flip a rounded digit between engines (same rationale as the tf-idf
weight quantization, pipeline/tfidf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.graph import symmetrize

# 1e6 quantization of the per-common-neighbor Adamic-Adar term; the
# reported score is aa_q6 / 1e6 (identical derivation both engines).
AA_SCALE = 1_000_000


def link_prediction(edges: DataFrame, max_center_degree: int = 10_000,
                    top_k: int | None = None) -> DataFrame:
    """Score non-adjacent vertex pairs (u < v) of the simple undirected
    graph by neighborhood overlap.

    Returns (u, v, common_neighbors, deg_u, deg_v, jaccard, aa_q6,
    adamic_adar, pref_attach) where

    - ``common_neighbors``: shared neighbors with degree
      ≤ ``max_center_degree`` (hub commons are excluded — docstring),
    - ``jaccard``: cn / (deg u + deg v − cn)  (full degrees),
    - ``aa_q6``: Σ_w floor(1e6 / ln deg w) — the integer-quantized
      Adamic-Adar sum; ``adamic_adar`` = aa_q6 / 1e6,
    - ``pref_attach``: deg u · deg v.

    ``top_k`` (optional) keeps the k best pairs by
    (aa_q6 DESC, u, v) — a total deterministic order.
    """
    und = symmetrize(edges).persist()
    try:
        deg = und.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg"))
        # Adjacency rows whose CENTER (src) is cap-eligible, carrying
        # the center's integer-quantized Adamic-Adar term.
        adj = (
            und.join(
                # deg >= 2: a degree-1 center can form no wedge, and
                # excluding it keeps ln(deg) > 0 in both engines.
                deg.where((F.col("deg") >= 2)
                          & (F.col("deg") <= max_center_degree))
                .select(F.col("id").alias("src"),
                        F.floor(F.lit(float(AA_SCALE)) / F.log(F.col("deg")))
                        .alias("aa_term")),
                "src")
        )
        a, b = adj.alias("a"), adj.alias("b")
        wedges = (
            a.join(b, (F.col("a.src") == F.col("b.src"))
                   & (F.col("a.dst") < F.col("b.dst")))
            .select(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"),
                    F.col("a.aa_term").alias("aa_term"))
        )
        scores = wedges.groupBy("u", "v").agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("aa_term").alias("aa_q6"),
        )
        # Drop existing edges: und holds both directions, so the (u<v)
        # direction alone decides adjacency.
        cand = scores.join(
            und.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"], "left_anti")
        out = (
            cand
            .join(deg.select(F.col("id").alias("u"),
                             F.col("deg").alias("deg_u")), "u")
            .join(deg.select(F.col("id").alias("v"),
                             F.col("deg").alias("deg_v")), "v")
            .select(
                "u", "v", "common_neighbors", "deg_u", "deg_v",
                (F.col("common_neighbors")
                 / (F.col("deg_u") + F.col("deg_v")
                    - F.col("common_neighbors"))).alias("jaccard"),
                "aa_q6",
                (F.col("aa_q6") / F.lit(float(AA_SCALE)))
                .alias("adamic_adar"),
                (F.col("deg_u") * F.col("deg_v")).alias("pref_attach"),
            )
        )
        if top_k is not None:
            out = out.orderBy(F.desc("aa_q6"), F.asc("u"),
                              F.asc("v")).limit(top_k)
        # Materialize before releasing the symmetrize cache (top_k) or
        # hand back the lazy plan with its own symmetrize (full set).
        if top_k is not None:
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        und.unpersist()
