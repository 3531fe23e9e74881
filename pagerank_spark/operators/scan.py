"""SCAN structural graph clustering (Xu-Yuruk-Feng-Schweiger KDD'07).

Beyond-reference operator (the reference is fixed-function PageRank,
``pagerank/src/lib/pagerank.cpp:28-293``); SCAN is the standard
density-based community detector that — unlike LPA/modularity methods
— also NAMES the non-community structure: vertices that bridge
clusters (hubs) or belong to none (outliers) simply don't cluster.
Semantics implemented (the common core/border variant):

  * structural similarity of an ADJACENT pair,
        σ(u,v) = |N[u] ∩ N[v]| / sqrt(|N[u]|·|N[v]|)
    over closed neighborhoods; for an edge (u,v):
    |N[u]∩N[v]| = triangles through the edge + 2, |N[u]| = deg(u)+1.
  * an edge is ε-SIMILAR iff σ ≥ ε.
  * a vertex is a CORE iff its closed ε-neighborhood has ≥ μ members
    (itself + its ε-similar neighbors).
  * clusters = connected components of cores over ε-similar
    core-core edges; a non-core endpoint of a core's ε-edge joins as
    a BORDER of that core's cluster (smallest adjacent label).
    Everything else — hubs and outliers — is absent from the output.

Exact cross-engine arithmetic: ε is a RATIONAL ``eps_num/eps_den``
and σ ≥ ε is evaluated as

    (common² · eps_den²) ≥ (eps_num² · n_u · n_v)

over DECIMAL(38,0), so there is no sqrt, no float, and no ulp drift
anywhere — any SQL engine reproduces the exact ε-edge set, and the
component labels are the canonical min-id of the proven CC operator.

Scale shape: per-edge common-neighbor counts reuse the
degree-oriented wedge join of ``operators/triangles.py`` (O(E^{3/2})
wedge volume, hub-proof — the same machinery the truss peel runs at
578M edges); everything after is degree-class aggregation plus a CC
run over the ε-edge subgraph, which only ever SHRINKS the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.graph import symmetrize
from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.triangles import triangles

DEC = "decimal(38,0)"


def edge_similarity(edges: DataFrame) -> DataFrame:
    """(lo, hi, common, n_lo, n_hi): closed-neighborhood intersection
    size and closed degrees for every undirected simple edge —
    SCAN's σ numerator/denominator parts, all integers."""
    sym = (symmetrize(edges)     # simple undirected: deduped, no loops
           .persist())
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    canon = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("lo"), F.col("dst").alias("hi"))
    caches: list = []
    t = triangles(sym, symmetrized=True, caches=caches)
    supp = (
        t.select(F.least("a", "b").alias("lo"),
                 F.greatest("a", "b").alias("hi"))
        .unionByName(t.select(F.least("a", "c").alias("lo"),
                              F.greatest("a", "c").alias("hi")))
        .unionByName(t.select(F.least("b", "c").alias("lo"),
                              F.greatest("b", "c").alias("hi")))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    out = (
        canon
        .join(supp, ["lo", "hi"], "left")
        .join(deg.select(F.col("id").alias("lo"),
                         F.col("deg").alias("dlo")), "lo")
        .join(deg.select(F.col("id").alias("hi"),
                         F.col("deg").alias("dhi")), "hi")
        .select(
            "lo", "hi",
            (F.coalesce(F.col("tri"), F.lit(0)) + 2).alias("common"),
            (F.col("dlo") + 1).alias("n_lo"),
            (F.col("dhi") + 1).alias("n_hi"))
        .localCheckpoint(eager=True)
    )
    while caches:
        caches.pop().unpersist()
    sym.unpersist()
    return out


def scan_clusters(edges: DataFrame, eps_num: int = 6, eps_den: int = 10,
                  mu: int = 2) -> DataFrame:
    """(id, cluster, is_core) — SCAN clustering at ε = eps_num/eps_den
    and μ; hubs/outliers are absent (module docstring)."""
    if eps_den <= 0 or eps_num < 0 or eps_num > eps_den:
        raise ValueError("need 0 <= eps_num/eps_den <= 1 with eps_den > 0")
    if mu < 1:
        raise ValueError(f"mu must be >= 1, got {mu}")
    sim = edge_similarity(edges)
    lhs = ((F.col("common").cast(DEC) * F.col("common").cast(DEC))
           * F.lit(eps_den * eps_den).cast(DEC))
    rhs = (F.lit(eps_num * eps_num).cast(DEC)
           * F.col("n_lo").cast(DEC) * F.col("n_hi").cast(DEC))
    eps_edges = sim.where(lhs >= rhs).select("lo", "hi").persist()
    eps_deg = (
        eps_edges.select(F.col("lo").alias("id"))
        .unionByName(eps_edges.select(F.col("hi").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("eps_deg"))
    )
    # closed ε-neighborhood: the vertex itself counts toward μ.  The
    # count starts from EVERY vertex of the graph (not just ε-edge
    # endpoints), so at μ = 1 an ε-isolated vertex is still the
    # singleton core the documented rule makes it.
    verts = (sim.select(F.col("lo").alias("id"))
             .unionByName(sim.select(F.col("hi").alias("id")))
             .distinct())
    cores = (
        verts.join(eps_deg, "id", "left")
        .where(F.coalesce(F.col("eps_deg"), F.lit(0)) + 1 >= mu)
        .select("id")
    )
    cores = cores.localCheckpoint(eager=True)
    cc_edges = (
        eps_edges
        .join(cores.withColumnRenamed("id", "lo"), "lo", "left_semi")
        .join(cores.withColumnRenamed("id", "hi"), "hi", "left_semi")
    )
    linked = connected_components(
        cc_edges.select(F.col("lo").alias("src"),
                        F.col("hi").alias("dst")))
    core_lbl = (
        cores.join(linked, "id", "left")
        .select("id", F.coalesce("component", "id").alias("cluster"))
        .localCheckpoint(eager=True)    # cut the CC union lineage
    )
    # borders: non-core endpoints of a core's ε-edge, smallest
    # adjacent core label (deterministic)
    halves = (
        eps_edges.select(F.col("lo").alias("cid"), F.col("hi").alias("oid"))
        .unionByName(eps_edges.select(F.col("hi").alias("cid"),
                                      F.col("lo").alias("oid")))
    )
    border_lbl = (
        halves
        .join(core_lbl.select(F.col("id").alias("cid"), "cluster"), "cid")
        .join(core_lbl.select(F.col("id").alias("oid")), "oid", "left_anti")
        .groupBy(F.col("oid").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        core_lbl.select("id", "cluster", F.lit(True).alias("is_core"))
        .unionByName(border_lbl.select(
            "id", "cluster", F.lit(False).alias("is_core")))
        .localCheckpoint(eager=True)
    )
    eps_edges.unpersist()
    return out
