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
never re-normalizes in the loop.  The matvec runs through the SHARED
``pagerank.plan_gather`` (broadcast under the module bound; above it
the degree probe picks the one-time src re-layout or the hub-salted
join — the loop runs with AQE suspended, so salting is its only skew
defence), and the loop shares the global operator's checkpoint/
metrics/resume contract (:class:`PageRankResult`).  Parallel edges
are combined by summing weights at prepare time (the weighted
analogue of the dedupe: multiplicity becomes weight instead of being
dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager
from pagerank_spark.operators.pagerank import (
    BROADCAST_MAX_VERTICES,
    DAMPING,
    STATE_ROWS_PER_PARTITION,
    GatherPlan,
    PageRankResult,
    _state_agg,
    plan_gather,
)


def prepare_weighted(edges_w: DataFrame,
                     weight_col: str = "weight") -> tuple[DataFrame, DataFrame, int]:
    """Normalize a raw weighted edge table into the loop's inputs.

    Returns ``(norm_edges(src, dst, f), strength(id, strength,
    out_deg), n)`` where ``f = w / strength(src)`` is the precomputed
    split fraction and ``out_deg`` is the per-src EDGE-ROW count of
    the combined table — the skew diagnostic plan_gather probes
    (straggling tracks row count behind a join key, not weight mass).
    Parallel (src, dst) rows are combined by summing their weights.
    """
    edges = (
        edges_w.groupBy("src", "dst")
        .agg(F.sum(weight_col).alias("w"))
    )
    strength = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("strength"),
        F.count(F.lit(1)).alias("out_deg"))
    row = edges.agg(F.max(F.greatest("src", "dst")).alias("m")).first()
    n = int(row["m"]) + 1 if row and row["m"] is not None else 0
    # Columnar SQL cache, NOT an RDD localCheckpoint: at 1e8+ rows the
    # compressed columnar blocks are several times smaller than raw
    # UnsafeRow checkpoint blocks (an eager localCheckpoint of a
    # 578M-row norm table blew the heap where this cache fits — same
    # rationale as graph.prepare_prebuilt).  The plan above it is
    # static, so per-iteration re-analysis stays constant-size.
    norm = (
        edges.join(strength.select(F.col("id").alias("src"), "strength"),
                   "src")
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
    gather_mode: str = "auto",
    salt_threshold: int | None = None,
    num_salts: int = 8,
    resume: bool = False,
    static_planning: bool = True,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> PageRankResult:
    """Weighted power iteration to L1 < ``tol`` (or ``max_iter``).

    ``edges_w`` carries (src, dst, ``weight_col``).  Returns the same
    :class:`PageRankResult` as the global operator; like PPR, both
    ``ranks``/``converged_ranks`` hold the last computed iterate (the
    reference's pre-swap quirk Q4 is a global-PageRank parity detail).
    ``gather_mode``/``salt_threshold``/``num_salts``/``resume`` have
    the global operator's semantics.
    """
    from pagerank_spark.session import sized_shuffle, static_plan

    spark = edges_w.sparkSession
    norm, strength, n = prepare_weighted(edges_w, weight_col)
    if n == 0:
        # Release what prepare_weighted persisted before the early
        # return (norm was also eagerly counted).
        norm.unpersist()
        strength.unpersist()
        empty = spark.createDataFrame([], "id BIGINT, pr DOUBLE")
        return PageRankResult(empty, empty, 0, 0.0)
    if checkpoint is None:
        import tempfile

        checkpoint = CheckpointManager(
            spark, tempfile.mkdtemp(prefix="wpr_ckpt_"),
            interval=checkpoint_interval)

    plan = plan_gather(norm, strength.select("id", "out_deg"), n,
                       mode=gather_mode, salt_threshold=salt_threshold,
                       num_salts=num_salts,
                       broadcast_max_vertices=broadcast_max_vertices)
    loop_width = max(plan.edges.rdd.getNumPartitions(),
                     n // STATE_ROWS_PER_PARTITION + 1)
    try:
        with static_plan(spark, enabled=static_planning), \
                sized_shuffle(spark, loop_width):
            return _wpr_loop(spark, strength, n, damping, tol,
                             max_iter, checkpoint, resume, plan)
    finally:
        plan.release()
        strength.unpersist()
        norm.unpersist()


def _wpr_loop(spark, strength: DataFrame, n: int,
              damping: float, tol: float, max_iter: int,
              checkpoint: CheckpointManager, resume: bool,
              plan: GatherPlan) -> PageRankResult:
    it = 0
    dangling = 0.0
    metrics: list[dict] = []
    # Resume-time L1: reported as final_l1 when the loop below runs
    # zero iterations (resumed it >= max_iter with l1 >= tol).
    resume_l1: float | None = None

    if resume and checkpoint.latest_iteration() is not None:
        it = checkpoint.latest_iteration()
        state = checkpoint.read_state(it).persist()
        agg = _state_agg(state, dangling_col="strength")
        dangling = agg["dangling"]
        resume_l1 = agg["l1"]
        if agg["l1"] < tol:
            ranks = state.select("id", "pr")
            return PageRankResult(ranks=ranks, converged_ranks=ranks,
                                  iterations=it, final_l1=agg["l1"],
                                  metrics=metrics)
    else:
        # State: (id, pr, prev_pr, strength); strength NULL ⇔ dangling.
        state = (
            spark.range(0, n)
            .join(strength.select("id", "strength"), "id", "left")
            .select("id", F.lit(0.0).alias("pr"),
                    F.lit(0.0).alias("prev_pr"), "strength")
            .persist()
        )

    inv_n = 1.0 / n
    while it < max_iter:
        it += 1
        # Rank side (src, w=pr); the per-edge value is w * f with f
        # the precomputed split fraction riding on the edge table.
        ranks_w = state.select(F.col("id").alias("src"),
                               F.col("pr").alias("w"))
        contribs = plan.gather(ranks_w, value=F.col("w") * F.col("f"))
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
            new_state = checkpoint.write_state(
                new_state, it,
                target_partitions=min(max(n // 500_000, 1), 2000)).persist()
        else:
            new_state = new_state.localCheckpoint(eager=False)

        agg = _state_agg(new_state, dangling_col="strength")
        l1, dangling = agg["l1"], agg["dangling"]
        m = {"l1": l1, "dangling_mass": dangling, "sum_pr": agg["sum_pr"],
             "rows": float(n)}
        metrics.append({"iteration": it, **m})
        if checkpoint.should_checkpoint(it):
            checkpoint.write_metrics(it, m)
        state.unpersist()
        state = new_state
        if l1 < tol:
            break

    ranks = state.select("id", "pr")
    final_l1 = (metrics[-1]["l1"] if metrics
                else (resume_l1 if resume_l1 is not None else 0.0))
    return PageRankResult(ranks=ranks, converged_ranks=ranks,
                          iterations=it, final_l1=final_l1,
                          metrics=metrics)
