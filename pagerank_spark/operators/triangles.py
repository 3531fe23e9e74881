"""Triangle counting via degree-ordered edge orientation.

Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer" (WWW'11): orient every undirected edge from the
lower-(degree, id) endpoint to the higher one, self-join the oriented
edge set on its source to enumerate wedges, then semi-join the wedges
against the oriented edges.  Orientation caps every vertex's oriented
out-degree at O(sqrt(E)) on any graph, so the wedge set — the shuffle
that dominates at 100 TB — is O(E^{3/2}) worst case instead of
Σ deg² (which the hub vertices of a power-law graph would blow up).

Each triangle {a,b,c} is counted exactly once (the wedge is rooted at
its min-order vertex).  Mandated beyond the reference
(BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.graph import symmetrize


def _oriented(edges: DataFrame, symmetrized: bool = False) -> DataFrame:
    """Undirected edge set oriented by (degree, id): (lo, hi) with
    rank(lo) < rank(hi).  ``symmetrized=True`` asserts the input is
    already the symmetric simple set, skipping a redundant |2E|
    union+dedupe exchange (e.g. the clustering-coefficient caller,
    which owns the symmetrized cache)."""
    und = edges if symmetrized else symmetrize(edges)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    canon = und.where(F.col("src") < F.col("dst"))  # one row per undirected edge
    e = (
        canon
        .join(deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    return e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangles(edges: DataFrame, symmetrized: bool = False,
              caches: list | None = None) -> DataFrame:
    """(a, b, c) — one row per triangle, a = min-order apex.

    The oriented edge set is persisted (it feeds both the wedge join
    and the closing semi-join).  Loop callers (operators/truss.py)
    pass ``caches`` to collect that persisted frame and release it
    once the round's result is materialized — otherwise one cache per
    call survives until the session drops it.
    """
    o = _oriented(edges, symmetrized).persist()
    if caches is not None:
        caches.append(o)
    e1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "a").where(F.col("b") < F.col("c"))
    closing = o.select(F.col("lo").alias("b"), F.col("hi").alias("c")).unionByName(
        o.select(F.col("lo").alias("c"), F.col("hi").alias("b")))
    return wedges.join(closing, ["b", "c"], "left_semi").select("a", "b", "c")


def triangle_count(edges: DataFrame) -> int:
    return triangles(edges).count()


def triangles_per_vertex(edges: DataFrame,
                         symmetrized: bool = False) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates
    in; vertices in no triangle are omitted (join with the vertex set
    and coalesce(0) if a dense result is needed)."""
    t = triangles(edges, symmetrized)
    ids = (
        t.select(F.col("a").alias("id"))
        .unionByName(t.select(F.col("b").alias("id")))
        .unionByName(t.select(F.col("c").alias("id")))
    )
    return ids.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
