"""Fixed-fanout L-hop neighbor sampling (GraphSAGE-style).

Training-data-pipeline member of the graph suite (the reference
engine has no sampling operator; its inventory stops at full-graph
power iteration — `pagerank/src/lib/pagerank.cpp:28-293`): GNN
training over a web-scale link graph never materializes full
neighborhoods — it samples a bounded fan-out per vertex per layer
(Hamilton et al. 2017, GraphSAGE §3.1; the same minibatch shape
PinSAGE runs at Pinterest scale).  This operator produces that
sampled L-hop subgraph as a DataFrame, deterministically, so a
training epoch is reproducible across runs AND across engines.

Semantics — expanded-once frontier sampling:

    expanded_0 = seeds
    hop h edge set = for every u in frontier_{h-1}, the ``fanout``
        out-neighbors of u ranked FIRST by md5(u ':' v) (a keyed,
        engine-portable uniform draw — the same family as
        operators/walks.py), tie-broken by v
    frontier_h = sampled dsts not yet expanded (each vertex's sample
        set is computed exactly once, at its first discovery depth)

Output rows are (src, dst, hop) with hop = the round that expanded
``src``; a (src, dst) pair therefore appears at most once.  Sampling
uses the graph AS DIRECTED by default (out-neighbors — the natural
"pages I link to" expansion); ``directed=False`` samples over the
symmetrized neighbor set like the traversal operators.

Physical strategy (the 100 TB story): the edge table is cached once,
narrow, with self-loops dropped; each hop joins the exact-counted
frontier (broadcast under the same bound class as bfs/pagerank, with
the same one-time src re-layout fallback above it), dedupes the
candidate subset, and ranks per-src with a sort-based window — every
per-hop shuffle is CANDIDATE-sized (≤ |frontier| x avg-degree), never
|E|-sized, and hub candidate lists sort/spill rather than buffer.
The loop's per-hop work tracks the sampled expansion (bounded by
fanout^h x |seeds|), which is the entire point of sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

# Same bound class as bfs/pagerank: frontiers at or below this exact
# row count are broadcast into the cached edge partitions; the first
# larger one triggers the one-time src re-layout.
BROADCAST_MAX_FRONTIER = 5_000_000


def _pick_key(src_col, dst_col):
    """Engine-portable deterministic ordering key for one candidate
    neighbor: md5 over "src:dst" (uniform draw) + zero-padded dst
    (total tie-break) — DuckDB's md5/lpad reproduce it byte-for-byte,
    so the oracle replays the identical sample."""
    return F.concat(
        F.md5(F.concat(src_col.cast("string"), F.lit(":"),
                       dst_col.cast("string"))),
        F.lpad(dst_col.cast("string"), 12, "0"))


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame | Sequence[int],
    fanout: int = 5,
    hops: int = 2,
    directed: bool = True,
) -> DataFrame:
    """(src, dst, hop) — the deterministic fixed-fanout ``hops``-hop
    sampled subgraph rooted at ``seeds`` (module docstring).

    ``seeds`` is a one-column ``(id)`` DataFrame or a sequence of
    vertex ids.  Seeds absent from the graph contribute nothing.
    """
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = spark.createDataFrame(
            [(int(s),) for s in seeds], "id BIGINT")
    if fanout < 1 or hops < 1:
        raise ValueError("fanout and hops must be >= 1")

    fwd = edges.select("src", "dst")
    halves = [fwd]
    if not directed:
        halves.append(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    und = (
        halves[0] if len(halves) == 1 else halves[0].unionByName(halves[1])
    )
    # Narrow cache, no upfront dedupe: duplicates are collapsed per
    # hop on the candidate SUBSET (frontier-expansion-sized), which
    # is far cheaper than deduping |E| once for a sampled traversal
    # that touches a sliver of it.
    und = und.where(F.col("src") != F.col("dst")).persist()

    expanded = (
        seeds.select(F.col("id").cast("bigint").alias("id"))
        .distinct().persist()
    )
    frontier = expanded
    frontier_rows = expanded.count()
    out: DataFrame | None = None
    laid_out = False
    w = Window.partitionBy("src").orderBy(
        _pick_key(F.col("src"), F.col("dst")))
    try:
        for h in range(1, hops + 1):
            if frontier_rows == 0:
                break
            small = frontier_rows <= BROADCAST_MAX_FRONTIER
            if not small and not laid_out:
                relaid = und.repartition(
                    und.rdd.getNumPartitions(), "src").persist()
                relaid.count()
                und.unpersist()
                und = relaid
                laid_out = True
            f_side = frontier.withColumnRenamed("id", "src")
            sampled = (
                und.join(F.broadcast(f_side) if small else f_side, "src")
                .select("src", "dst")
                .distinct()
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= fanout)
                .select("src", "dst", F.lit(h).cast("int").alias("hop"))
                # Materialize the hop: the next frontier and the union
                # below both consume it, and the window must not rerun.
                .localCheckpoint(eager=True)
            )
            out = sampled if out is None else out.unionByName(sampled)
            nxt = (
                sampled.select(F.col("dst").alias("id")).distinct()
                .join(expanded, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            frontier_rows = nxt.count()
            merged = expanded.unionByName(nxt).localCheckpoint(eager=True)
            expanded.unpersist()
            expanded = merged
            frontier = nxt
        if out is None:
            return spark.createDataFrame(
                [], "src BIGINT, dst BIGINT, hop INT")
        return out
    finally:
        und.unpersist()
        expanded.unpersist()
