"""Breadth-first hop distances from a source set.

A natural member of the link-graph suite (the reference engine has no
traversal operator; PageRank/CC/LPA/triangles are mandated — BFS
rounds out reachability queries over the same prepared edge table).

Frontier formulation — per round d:

    frontier_d+1 = Γ(frontier_d) \\ visited
    depth(v)     = first round that reached v

Physical strategy (mirrors operators/labelprop.py): the edge table is
hash-partitioned by ``src`` — the per-round join key — in ONE fused
exchange (the symmetrize dedupe runs partition-local on that same
layout) and cached, so each round moves only the frontier and the
visited set, never the |E| side.  The frontier is the *small* side by
construction (≤ |V| rows, usually ≪), so Catalyst/AQE broadcasts it
into the cached edge partitions; the visited set stays bounded by
|V| rows.  Per-round shuffle volume therefore tracks the frontier
expansion, which peaks once and collapses — the same geometric-decay
property that makes large-star/small-star viable at 100 TB.

Convergence is the natural one: an empty frontier (one constant-size
aggregate per round, fused into the round's only job).  Lineage is
truncated per round; a durable checkpoint cadence makes long
traversals resumable like every other iterative operator here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager


def bfs_depths(
    edges: DataFrame,
    sources: DataFrame | Sequence[int],
    max_depth: int = 50,
    directed: bool = False,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, depth) for every vertex reachable from ``sources`` within
    ``max_depth`` hops; ``depth`` is the minimum hop count.

    ``sources`` is a one-column ``(id)`` DataFrame or a sequence of
    vertex ids.  ``directed=False`` (default) traverses the
    symmetrized edge set; ``directed=True`` follows edges src→dst
    only.  Unreachable vertices are absent from the output (callers
    wanting the dense domain left-join against ``spark.range``).
    """
    spark = edges.sparkSession
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "id BIGINT")
    if checkpoint is None:
        # Durable truncation cadence — see operators/pagerank.py for
        # why localCheckpoint alone is insufficient on long loops.
        import tempfile

        checkpoint = CheckpointManager(
            spark, tempfile.mkdtemp(prefix="bfs_ckpt_"), interval=8)

    # One fused exchange: hash(src) partitioning satisfies the
    # dedupe's clustering requirement, so dropDuplicates runs
    # partition-local after the single repartition (same trick as
    # labelprop).  Self-loops never change a depth; drop them.
    fwd = edges.select("src", "dst")
    halves = [fwd]
    if not directed:
        halves.append(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    und = (
        halves[0] if len(halves) == 1 else halves[0].unionByName(halves[1])
    )
    und = (
        und.where(F.col("src") != F.col("dst"))
        .repartition(edges.rdd.getNumPartitions(), "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    try:
        return _bfs_loop(und, sources, max_depth, checkpoint)
    finally:
        und.unpersist()


def _bfs_loop(und: DataFrame, sources: DataFrame, max_depth: int,
              checkpoint: CheckpointManager | None) -> DataFrame:
    depths = (
        sources.select(F.col("id").cast("bigint").alias("id"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("int"))
        .persist()
    )
    frontier = depths.select("id").persist()
    d = 0
    while d < max_depth:
        d += 1
        # Γ(frontier) \ visited — the join's small side is the
        # frontier, the anti-join's small side is the (≤|V|-row)
        # visited set.
        new = (
            und.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(depths, "id", "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
        )
        merged = depths.unionByName(new)
        if checkpoint is not None and checkpoint.should_checkpoint(d):
            merged = checkpoint.write_state(merged, d).persist()
        else:
            # Truncate the union chain each round; LAZY so the
            # truncated RDD materializes inside the convergence
            # aggregate below — one job per round.
            merged = merged.localCheckpoint(eager=False)
        row = merged.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("depth") == d).cast("long")).alias("grew"),
        ).first()
        grew = int(row["grew"] or 0)
        if checkpoint is not None and checkpoint.should_checkpoint(d):
            checkpoint.write_metrics(d, {"reached": float(int(row["n"] or 0)),
                                         "frontier": float(grew)})
        frontier.unpersist()
        depths.unpersist()
        depths = merged
        frontier = merged.where(F.col("depth") == d).select("id").persist()
        if grew == 0:
            break
    frontier.unpersist()
    return depths.select("id", "depth")
