"""Approximate betweenness centrality via pivot-sampled Brandes.

Not in the reference engine (fixed-function PageRank,
``/root/reference/pagerank/src/lib/pagerank.cpp``); exact betweenness
is all-pairs Brandes — O(|V|·|E|), hopeless at web scale — so the
standard scalable estimator (Brandes-Pich / KADABRA family) runs the
two Brandes phases from a SMALL pivot set S and reports

    bet(v) = Σ_{s ∈ S} δ_s(v)        (v ∉ endpoints of its own pivot)

**Forward phase** — one multi-source BFS keyed by (source, vertex)
that carries the exact BIGINT shortest-path count σ alongside the
depth (physical strategy inherited from ``centrality.multi_source_bfs``:
frontier broadcast under an exact driver-known row count, one-time
src re-layout fallback above it, per-round lineage truncation).

**Backward phase** — dependency accumulation by decreasing depth.
Every vertex w in the shortest-path DAG sits exactly one level above
all its predecessors, so ONE join per level fully accumulates

    δ(v) = Σ_{w : succ(v)} σ_v / σ_w · (1 + δ(w)).

Cross-engine float discipline (same rationale as operators/linkpred.py
and centrality.py): δ is carried as the integer quantization
dq = round-down of 1e9·δ, and each term is evaluated with the EXACT
integer split-division identity

    (a·b) div c  =  (a div c)·b + ((a mod c)·b) div c,
    a = SCALE + dq_w,  b = σ_v,  c = σ_w   (σ_v ≤ σ_w always),

so no intermediate exceeds ~σ_max² + SCALE·(|V|) and the whole
accumulation is bit-identical integer arithmetic in Spark and DuckDB —
partial-sum order cannot flip a digit.  Reported ``betweenness`` =
bet_q9 / 1e9 (directed-pair convention: halve it for the classical
undirected statistic).

Scale notes: the undirected face symmetrizes + DISTINCTs the edge set
once (reciprocal source edges would double-count σ), an O(|E|)
one-time shuffle like graph.prepare(); each level's frontier/delta is
O(|S|·level width); the backward big-side join re-layouts the edge
table on dst once, only if some level exceeds the broadcast bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager
from pagerank_spark.operators.bfs import BROADCAST_MAX_FRONTIER

# dq = floor-quantized 1e9·delta; reported betweenness = bet_q9 / 1e9.
SCALE = 1_000_000_000

# term = floor(sigma_v * (SCALE + dq_w) / sigma_w) via the split
# identity — overflow-safe and identical in Spark (DIV/%) and DuckDB
# (///%) for the all-positive operands here.
_TERM = (
    f"((dq + {SCALE}) DIV sigma_w) * sigma_v"
    f" + (((dq + {SCALE}) % sigma_w) * sigma_v) DIV sigma_w"
)


def _symmetrize(edges: DataFrame, directed: bool) -> DataFrame:
    fwd = edges.select("src", "dst")
    if directed:
        return fwd.where(F.col("src") != F.col("dst")).distinct()
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # DISTINCT is load-bearing: a reciprocal pair (a,b)/(b,a) in the
    # input would otherwise appear twice after the union and
    # double-count sigma (min-depth BFS tolerates duplicates; path
    # counting does not).
    return (fwd.unionByName(rev)
            .where(F.col("src") != F.col("dst")).distinct())


def _forward(und: DataFrame, sources: DataFrame, max_depth: int,
             checkpoint: CheckpointManager | None):
    """(depths, level_rows): depths = (source, id, depth, sigma) with
    sigma the exact number of shortest s→id paths; level_rows[d] the
    driver-known row count at each depth."""
    depths = (
        sources.select(F.col("source").cast("bigint").alias("source"))
        .distinct()
        .select("source", F.col("source").alias("id"),
                F.lit(0).cast("int").alias("depth"),
                F.lit(1).cast("bigint").alias("sigma"))
        .persist()
    )
    frontier = depths.select("source", "id", "sigma").persist()
    level_rows = [depths.count()]
    laid_out = False
    d = 0
    while d < max_depth:
        d += 1
        small = level_rows[-1] <= BROADCAST_MAX_FRONTIER
        if not small and not laid_out:
            relaid = und.repartition(
                und.rdd.getNumPartitions(), "src").persist()
            relaid.count()
            und.unpersist()
            und = relaid
            laid_out = True
        f_side = frontier.withColumnRenamed("id", "src")
        new = (
            und.join(F.broadcast(f_side) if small else f_side, "src")
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(depths.select("source", "id"),
                  ["source", "id"], "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
            .select("source", "id", "depth", "sigma")
        )
        merged = depths.unionByName(new)
        # Lineage truncation is load-bearing: each level references the
        # previous table three times (frontier, anti-join, union), so a
        # persist-only chain grows the analyzed plan ~3^depth (OOMs the
        # driver on plan STRINGS long before data does).
        if checkpoint is not None and checkpoint.should_checkpoint(d):
            merged = checkpoint.write_state(merged, d).persist()
        else:
            merged = merged.localCheckpoint(eager=False)
        grew = int(merged.where(F.col("depth") == d).count())
        frontier.unpersist()
        depths.unpersist()
        depths = merged
        if grew == 0:
            level_rows.append(0)
            frontier = depths.limit(0).select("source", "id", "sigma")
            break
        level_rows.append(grew)
        frontier = (depths.where(F.col("depth") == d)
                    .select("source", "id", "sigma").persist())
    frontier.unpersist()
    while level_rows and level_rows[-1] == 0:
        level_rows.pop()
    return depths, level_rows, und, laid_out


def betweenness(
    edges: DataFrame,
    sources: DataFrame | Sequence[int],
    max_depth: int = 30,
    directed: bool = False,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, bet_q9, betweenness): pivot-sampled Brandes betweenness —
    for every vertex reached by ≥1 pivot, the integer-quantized sum
    of shortest-path dependencies Σ_s floor-accumulated at 1e-9
    resolution (each pivot's own row is excluded, per Brandes'
    endpoint convention).  ``betweenness`` = bet_q9 / 1e9.
    """
    spark = edges.sparkSession
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "source BIGINT")
    else:
        sources = sources.select(F.col(sources.columns[0]).alias("source"))

    und = _symmetrize(edges, directed).persist()
    depths, level_rows, und, laid_out = _forward(
        und, sources, max_depth, checkpoint)
    deepest = len(level_rows) - 1

    # Backward sweep: cur = (source, id, sigma_w, dq) at level d+1.
    cur = (depths.where(F.col("depth") == deepest)
           .select("source", "id", F.col("sigma").alias("sigma_w"),
                   F.lit(0).cast("bigint").alias("dq"))
           .persist())
    parts = [cur.select("source", "id", "dq")]
    caches = [cur]
    relaid_dst = False
    for d in range(deepest - 1, -1, -1):
        small = level_rows[d + 1] <= BROADCAST_MAX_FRONTIER
        if not small and not relaid_dst:
            relaid = und.repartition(
                und.rdd.getNumPartitions(), "dst").persist()
            relaid.count()
            und.unpersist()
            und = relaid
            relaid_dst = True
        succ = cur.withColumnRenamed("id", "dst")
        lev = depths.where(F.col("depth") == d).select(
            "source", "id", "sigma")
        agg = (
            und.join(F.broadcast(succ) if small else succ, "dst")
            .select("source", F.col("src").alias("id"), "sigma_w", "dq")
            .join(lev.withColumnRenamed("sigma", "sigma_v"),
                  ["source", "id"])
            .groupBy("source", "id")
            .agg(F.sum(F.expr(_TERM)).cast("bigint").alias("dq"))
        )
        nxt = (
            lev.join(agg, ["source", "id"], "left")
            .select("source", "id", F.col("sigma").alias("sigma_w"),
                    F.coalesce(F.col("dq"), F.lit(0)).cast("bigint")
                    .alias("dq"))
            # eager truncation: the level expression references depths
            # and the previous delta — without it the final union's
            # plan compounds across levels (see forward-phase note).
            .localCheckpoint(eager=True)
        )
        parts.append(nxt.select("source", "id", "dq"))
        cur = nxt

    alld = parts[0]
    for p in parts[1:]:
        alld = alld.unionByName(p)
    out = (
        alld.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("dq").cast("bigint").alias("bet_q9"))
        .select("id", "bet_q9",
                (F.col("bet_q9") / F.lit(float(SCALE))).alias("betweenness"))
        .localCheckpoint(eager=True)
    )
    for c in caches:
        c.unpersist()
    depths.unpersist()
    und.unpersist()
    return out
