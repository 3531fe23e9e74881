"""Rectangle (4-cycle) counting via wedge aggregation.

Beyond-reference motif operator (the reference ships no motif counts;
its graph surface is PageRank only, `pagerank/src/lib/pagerank.cpp`):
the 4-cycle count is the next motif up from the triangle count
(`operators/triangles.py`) — the quadrilateral census used for
clustering-by-squares, bipartite cohesion (where triangles cannot
exist) and spam/link-farm signatures.

Identity: every 4-cycle a-b-c-d has exactly two opposite-corner pairs
({a,c} and {b,d}), and a pair {u,w} with c = |N(u) ∩ N(w)| common
neighbors closes C(c,2) distinct 4-cycles through u,w as opposite
corners.  Hence

    #C4 = (1/2) · Σ_{unordered u<w} C(common(u,w), 2).

Plan: generate wedges (u, w) with u < w per center vertex — one
self-join of the adjacency on the center — then one
map-side-combinable count per (u,w) and one global sum.  Wedge volume
is Σ_v C(deg(v), 2); on power-law graphs the hubs own almost all of
it, so the operator counts over the ``max_degree``-induced subgraph
(drop vertices above the cap, then count EXACTLY on what remains —
the same bounded-degeneracy guard as link_prediction, but applied to
the graph rather than per-wedge so the /2 halving stays integral and
the semantics stay a clean "4-cycles among ≤cap-degree vertices").
With the cap at or above the max degree the count is exact for the
whole graph.  Wedge volume after the cap is ≤ cap · |E| — linear in
the edge count, shuffle-safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.graph import symmetrize

DEFAULT_MAX_DEGREE = 10_000


def rectangle_count(edges: DataFrame,
                    max_degree: int = DEFAULT_MAX_DEGREE) -> DataFrame:
    """One row: (n_rectangles BIGINT, n_wedge_pairs BIGINT,
    n_vertices_counted BIGINT) — the exact 4-cycle count of the
    simple undirected graph induced on vertices of degree ≤
    ``max_degree`` (direction, self-loops, multiplicity discarded),
    plus the number of distinct opposite-corner pairs with ≥ 2 common
    neighbors and the induced vertex count."""
    und = symmetrize(edges)   # (src, dst) both directions, simple
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    keep = deg.where(F.col("deg") <= max_degree).select("id")
    e = (
        und.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    a = e.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("c"), F.col("dst").alias("w"))
    pairs = (
        a.join(b, "c")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    # Integer arithmetic end-to-end: Σ cn·(cn−1) counts each 4-cycle
    # exactly 4 times (2 opposite-corner pairs × the 2 orderings inside
    # C(cn,2)·2), so the sum is divisible by 4 and `div` is exact —
    # and, unlike a double divide + cast, it cannot diverge from the
    # DuckDB oracle (Spark's double→bigint cast truncates, DuckDB's
    # rounds half-away-from-zero).
    return (
        pairs.where(F.col("cn") >= 2)
        .agg(
            F.expr("coalesce(sum(cn * (cn - 1)), 0) div 4")
            .cast("bigint").alias("n_rectangles"),
            F.count(F.lit(1)).alias("n_wedge_pairs"))
        .crossJoin(keep.agg(
            F.count(F.lit(1)).alias("n_vertices_counted")))
    )
