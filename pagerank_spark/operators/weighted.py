"""Weighted PageRank: power iteration over a weighted edge table.

Generalizes the reference's uniform-split update (every out-edge gets
``pr/out_deg``, reference ``pagerank/src/lib/pagerank.cpp:123-128``)
to arbitrary non-negative edge weights: a vertex splits its rank in
proportion to outgoing weight,

    contrib(v) = Σ_{(u,v) ∈ E} pr(u) * w(u,v) / strength(u)
    p_t(v)     = d * (contrib(v) + dangling_t / N) + (1 - d) / N

with ``strength(u) = Σ_w out-weights`` and the same zero init /
dangling handling / L1 stop as the global operator, so uniform
weights reproduce it exactly (tested).

Physical strategy: the per-edge split fraction ``w/strength`` is
precomputed ONCE into the prepared edge table (one broadcast-sized
join against the |V|-row strength side), so each iteration is the
same join + groupBy-sum matvec as the global operator — the weight
never re-normalizes in the loop.  Parallel edges are combined by
summing weights at prepare time (the weighted analogue of the
dedupe: multiplicity becomes weight instead of being dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager
from pagerank_spark.operators.pagerank import DAMPING


def prepare_weighted(edges_w: DataFrame,
                     weight_col: str = "weight") -> tuple[DataFrame, DataFrame, int]:
    """Normalize a raw weighted edge table into the loop's inputs.

    Returns ``(norm_edges(src, dst, f), strength(id, strength), n)``
    where ``f = w / strength(src)`` is the precomputed split fraction.
    Parallel (src, dst) rows are combined by summing their weights.
    """
    edges = (
        edges_w.groupBy("src", "dst")
        .agg(F.sum(weight_col).alias("w"))
    )
    strength = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("strength"))
    row = edges.agg(F.max(F.greatest("src", "dst")).alias("m")).first()
    n = int(row["m"]) + 1 if row and row["m"] is not None else 0
    # Columnar SQL cache, NOT an RDD localCheckpoint: at 1e8+ rows the
    # compressed columnar blocks are several times smaller than raw
    # UnsafeRow checkpoint blocks (an eager localCheckpoint of a
    # 578M-row norm table blew the heap where this cache fits — same
    # rationale as graph.prepare_prebuilt).  The plan above it is
    # static, so per-iteration re-analysis stays constant-size.
    norm = (
        edges.join(strength.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("w") / F.col("strength")).alias("f"))
        .persist()
    )
    norm.count()
    return norm, strength.persist(), n


def weighted_pagerank(
    edges_w: DataFrame,
    weight_col: str = "weight",
    damping: float = DAMPING,
    tol: float = 1e-10,
    max_iter: int = 500,
    checkpoint: CheckpointManager | None = None,
    checkpoint_interval: int = 8,
    static_planning: bool = True,
) -> DataFrame:
    """(id, pr) after weighted power iteration to L1 < ``tol`` (or
    ``max_iter``).  ``edges_w`` carries (src, dst, ``weight_col``)."""
    from pagerank_spark.session import sized_shuffle, static_plan

    spark = edges_w.sparkSession
    norm, strength, n = prepare_weighted(edges_w, weight_col)
    if n == 0:
        return spark.createDataFrame([], "id BIGINT, pr DOUBLE")
    if checkpoint is None:
        import tempfile

        checkpoint = CheckpointManager(
            spark, tempfile.mkdtemp(prefix="wpr_ckpt_"),
            interval=checkpoint_interval)

    loop_width = norm.rdd.getNumPartitions()
    try:
        with static_plan(spark, enabled=static_planning), \
                sized_shuffle(spark, loop_width):
            return _wpr_loop(spark, norm, strength, n, damping, tol,
                             max_iter, checkpoint)
    finally:
        strength.unpersist()
        norm.unpersist()


def _wpr_loop(spark, norm: DataFrame, strength: DataFrame, n: int,
              damping: float, tol: float, max_iter: int,
              checkpoint: CheckpointManager) -> DataFrame:
    state = (
        spark.range(0, n)
        .join(strength, "id", "left")
        .select("id", F.lit(0.0).alias("pr"), F.lit(0.0).alias("prev_pr"),
                "strength")
        .persist()
    )
    inv_n = 1.0 / n
    it = 0
    dangling = 0.0
    while it < max_iter:
        it += 1
        ranks = state.select(F.col("id").alias("src"), "pr")
        contribs = (
            norm.join(F.broadcast(ranks) if n <= 5_000_000 else ranks, "src")
            .groupBy("dst").agg(F.sum(F.col("pr") * F.col("f")).alias("contrib"))
        )
        new_pr = (
            (F.coalesce(F.col("contrib"), F.lit(0.0))
             + F.lit(dangling * inv_n)) * F.lit(damping)
            + F.lit((1.0 - damping) * inv_n)
        )
        new_state = (
            state.join(contribs, state["id"] == contribs["dst"], "left")
            .select(state["id"], new_pr.alias("pr"),
                    state["pr"].alias("prev_pr"), state["strength"])
        )
        if checkpoint.should_checkpoint(it):
            new_state = checkpoint.write_state(new_state, it).persist()
        else:
            new_state = new_state.localCheckpoint(eager=False)
        row = new_state.agg(
            F.sum(F.abs(F.col("pr") - F.col("prev_pr"))).alias("l1"),
            F.sum(F.when(F.col("strength").isNull(), F.col("pr"))
                  .otherwise(F.lit(0.0))).alias("dangling"),
        ).first()
        l1 = float(row["l1"] or 0.0)
        dangling = float(row["dangling"] or 0.0)
        if checkpoint.should_checkpoint(it):
            checkpoint.write_metrics(it, {"l1": l1, "dangling_mass": dangling})
        state.unpersist()
        state = new_state
        if l1 < tol:
            break
    return state.select("id", "pr")
