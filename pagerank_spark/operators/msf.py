"""Minimum spanning forest via distributed Borůvka.

Not in the reference engine (fixed-function PageRank,
``/root/reference/pagerank/src/lib/pagerank.cpp``); MSF is the
canonical "contract in O(log V) rounds" graph primitive (Borůvka 1926;
the MapReduce/Pregel formulation of Lattanzi et al.'s filtering and
GraphX's minSpanningTree lineage), and the natural weighted sibling of
the large-star/small-star components operator this module contracts
with.

Algorithm (per round, all DataFrame ops):

1. label every canonical edge with its endpoints' current component
   ids and keep the CROSS edges (clo != chi) — one |E| join against
   the |V| component table per endpoint;
2. every component picks its lightest incident cross edge under the
   STRICT total order (weight, lo, hi) — ``min_by`` over a struct, a
   hash aggregation with map-side partial combine (no per-component
   sort);
3. the selected edges join the forest, and the components they
   connect are contracted by running the proven large-star/small-star
   ``connected_components`` on the component-level multigraph (at
   most one selected edge per component, so the contraction input is
   <= #components rows — tiny next to |E|);
4. vertex labels re-map through the contraction and the loop repeats
   until no cross edge remains.  Components at least halve per round,
   so the loop runs <= log2(V) rounds.

Determinism / oracle parity: the (weight, lo, hi) order is strict
(lo/hi break weight ties), so the MSF is UNIQUE — any engine that
respects the same order produces the identical edge set, which is
what lets a declarative SQL oracle (the unrolled Borůvka chain in
``__spark_entry__._msf_unrolled_sql``) match row for row without
mirroring this implementation's physical choices.

Scale shape: the per-round cost is dominated by the two |E|-vs-|V|
label joins and one map-side-combined aggregation — the same class as
a connected-components round; the contraction CC runs on a table
bounded by the (halving) component count.  Vertex labels are
localCheckpoint'ed per round (|V| rows), selected edges per round are
materialized once and unioned at the end, and the canonical edge
table is cached once for all rounds.

Self-loops are dropped; parallel/reversed duplicates collapse to the
minimum-weight canonical (lo, hi) edge before the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.operators.components import connected_components


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 64,
) -> DataFrame:
    """(src, dst, weight) — the edges of the minimum spanning forest
    of the undirected weighted graph, canonically oriented src < dst.

    The forest is unique under the strict (weight, src, dst) edge
    order; duplicate {src, dst} pairs contribute their minimum
    weight.  Output has |V| - #components rows.
    """
    spark = edges.sparkSession
    canon = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("lo", "hi")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    comp = (
        canon.select(F.col("lo").alias("id"))
        .unionByName(canon.select(F.col("hi").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    parts: list[DataFrame] = []
    for _ in range(max_rounds):
        lab = (
            canon
            .join(comp.select(F.col("id").alias("lo"),
                              F.col("comp").alias("clo")), "lo")
            .join(comp.select(F.col("id").alias("hi"),
                              F.col("comp").alias("chi")), "hi")
            .where(F.col("clo") != F.col("chi"))
            .persist()
        )
        if lab.isEmpty():
            lab.unpersist()
            break
        # Both endpoint components bid for the edge; the strict
        # (w, lo, hi) order makes min_by deterministic.
        cols = ["lo", "hi", "w", "clo", "chi"]
        both = (
            lab.select(F.col("clo").alias("comp"), *cols)
            .unionByName(lab.select(F.col("chi").alias("comp"), *cols))
        )
        sel = (
            both.groupBy("comp")
            .agg(F.min_by(F.struct(*cols), F.struct("w", "lo", "hi"))
                 .alias("e"))
            .select("e.*")
            .distinct()  # an edge may win both of its components
            .localCheckpoint(eager=True)  # <= #components rows
        )
        parts.append(sel.select("lo", "hi", "w"))
        # Contract the component multigraph with the proven CC
        # operator (input <= #components rows; labels = min comp id).
        mapping = connected_components(
            sel.select(F.col("clo").alias("src"),
                       F.col("chi").alias("dst")))
        comp_next = (
            comp.join(mapping.withColumnRenamed("id", "comp"),
                      "comp", "left")
            .select("id",
                    F.coalesce("component", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        lab.unpersist()
        comp = comp_next
    canon.unpersist()
    if not parts:
        return spark.createDataFrame(
            [], "src BIGINT, dst BIGINT, weight DOUBLE")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(F.col("lo").alias("src"), F.col("hi").alias("dst"),
                      F.col("w").alias("weight"))
