"""Power-iteration PageRank with reference-matching semantics.

Re-expresses the reference's hard-wired dataflow
(``/root/reference/pagerank/src/lib/pagerank.cpp:94-242``) as one
Spark job per iteration:

    gather:   edges ⋈ ranks on src  →  groupBy(dst).sum(pr/out_deg)
              (ref: the in-edge gather loop, pagerank.cpp:123-128)
    update:   (contrib + dangling/N)·d + (1-d)/N
              (ref: pagerank.cpp:131,142; damping 0.85, pagerank.hpp:14)
    dangling: Σ pr over vertices with no out-edges, from the CURRENT
              vector, skipped at step 0 (ref: pagerank.cpp:210-219)
    stop:     L1(new, old) < tol, checked after the update and before
              the swap (ref: pagerank.cpp:229-238)

Replicated quirks (SURVEY.md §7, all required for iteration-count
parity):
    Q1  zero initialization (integer-division bug, pagerank.cpp:97) —
        the facebook graph needs 132 iterations from zero at 1e-10 vs
        117 from 1/N.
    Q2  exact per-step order as above.
    Q3  vertex domain [0, max_id] including never-mentioned ids.
    Q4  the reported vector is the pre-swap iterate x_{k-1}
        (pagerank.cpp:234-238); we carry (pr, prev_pr) in the state
        table so both are available.
    Q5  NOT replicated: the ×1e11 lossy wire codec and the 64 MB
        buffer truncation — Spark's shuffle is lossless.

Physical strategy (the 100 TB story):
    - The edge table is deduped, degree-joined and persisted ONCE,
      hash-partitioned by ``dst`` (the aggregation key).  Per
      iteration only the |V|-row rank table moves.
    - gather_mode="broadcast": ranks broadcast to the persisted edge
      partitions → zero shuffle of edge rows, and the groupBy(dst)
      reuses the persisted partitioning (no exchange at all on the
      edge side).  Right up to ~5e6 vertices per the default
      threshold.
    - gather_mode="shuffle": shuffled hash join on ``src`` for larger
      vertex sets; map-side partial aggregation keeps the
      groupBy(dst) traffic at |distinct dst per partition|, not |E|.
    - gather_mode="salted": hub-salted join (skew.py) — mandated for
      power-law graphs; equivalence-tested.
    - One driver-side collect per iteration: a single aggregate over
      the new state computes L1 delta, next dangling mass, and Σpr
      together (the reference needs two passes + an all-gather,
      myRDMA.cpp:157-162; we need one partial-agg collect).
    - Lineage is truncated by iteration-stamped checkpoints
      (checkpoint.py); non-checkpointed iterations persist in memory
      and unpersist their predecessor.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager
from pagerank_spark.graph import Graph
from pagerank_spark import skew

DAMPING = 0.85           # ref pagerank.hpp:14
MAX_ITER = 100_000       # ref main.cpp:7
BROADCAST_MAX_VERTICES = 5_000_000
# auto-salting: a src whose out-degree exceeds this fraction of the
# average per-partition edge share would, under the shuffle gather,
# concentrate more than half an average partition's rows behind one
# join key — a guaranteed straggler on a power-law graph.
AUTO_SALT_PARTITION_FRACTION = 0.5
# loop-scoped shuffle width: enough partitions that no per-iteration
# exchange task holds more than this many |V|-side rows.
STATE_ROWS_PER_PARTITION = 500_000


@dataclass
class PageRankResult:
    ranks: DataFrame            # (id, pr) — reference-reported vector: x_{k-1}
                                # on a stop-rule exit (Q4), x_k on max-iter exit
    converged_ranks: DataFrame  # (id, pr) — the last computed iterate x_k
    iterations: int
    final_l1: float
    metrics: list[dict] = field(default_factory=list)

    def top(self, k: int = 1) -> DataFrame:
        """Argmax vertex (ref max_pr, pagerank.cpp:244-262) generalized
        to top-k; deterministic tie-break on smallest id."""
        return self.ranks.orderBy(F.desc("pr"), F.asc("id")).limit(k)


def _rank_weights(state: DataFrame) -> DataFrame:
    """(src, w = pr/out_deg) for vertices WITH out-edges — the only rows
    that contribute to the gather.  Computed on the |V|-row side before
    the join so the per-edge work is a plain lookup."""
    return (
        state.where(F.col("out_deg").isNotNull())
        .select(F.col("id").alias("src"),
                (F.col("pr") / F.col("out_deg")).alias("w"))
    )


def _gather(graph_edges: DataFrame, ranks_w: DataFrame, mode: str,
            salted_ctx: tuple | None) -> DataFrame:
    """(dst, contrib = Σ w[src]) over in-edges."""
    if mode == "salted" and salted_ctx is not None:
        salted_edges, hot, num_salts = salted_ctx
        return skew.salted_gather(salted_edges, ranks_w, hot, num_salts)
    joined = (
        graph_edges.join(F.broadcast(ranks_w), "src")
        if mode == "broadcast"
        else graph_edges.join(ranks_w, "src")
    )
    return joined.groupBy("dst").agg(F.sum("w").alias("contrib"))


def pagerank(
    graph: Graph,
    damping: float = DAMPING,
    tol: float = 1e-10,
    max_iter: int = MAX_ITER,
    stop_rule: str = "l1",
    checkpoint: CheckpointManager | None = None,
    checkpoint_interval: int = 8,
    gather_mode: str = "auto",
    salt_threshold: int | None = None,
    num_salts: int = 8,
    resume: bool = False,
    static_planning: bool = True,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> PageRankResult:
    """Run PageRank to convergence.

    stop_rule:
      "l1"        — stop when L1 delta < ``tol`` (north-star rule).
      "reference" — the reference's own rule: L1 < 1e-5 OR plateau
                    |L1 - prev_L1| < 1e-7 (ref pagerank.cpp:229-236).

    gather_mode="auto" picks the physical gather from the DATA:
    broadcast while the rank table fits (``broadcast_max_vertices``),
    otherwise shuffle — upgraded to salted when the out-degree
    distribution shows hubs that would straggle the shuffled join
    (degree > AUTO_SALT_PARTITION_FRACTION × |E|/partitions, one
    constant-size aggregate over the persisted degree table).  An
    explicit ``salt_threshold`` forces salted mode regardless.

    ``static_planning`` runs the loop with AQE suspended (see
    ``session.static_plan``): every iteration executes the identical
    hand-sized plan, so runtime re-planning only adds per-iteration
    overhead; the session setting is restored on exit.
    """
    from pagerank_spark.session import static_plan

    with static_plan(graph.spark, enabled=static_planning):
        return _pagerank_loop(
            graph, damping, tol, max_iter, stop_rule, checkpoint,
            checkpoint_interval, gather_mode, salt_threshold, num_salts,
            resume, broadcast_max_vertices)


def _pagerank_loop(
    graph: Graph,
    damping: float,
    tol: float,
    max_iter: int,
    stop_rule: str,
    checkpoint: CheckpointManager | None,
    checkpoint_interval: int,
    gather_mode: str,
    salt_threshold: int | None,
    num_salts: int,
    resume: bool,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> PageRankResult:
    spark = graph.spark
    n = graph.n
    if n == 0:
        empty = spark.createDataFrame([], "id BIGINT, pr DOUBLE")
        return PageRankResult(empty, empty, 0, 0.0)

    # A durable checkpoint cadence is mandatory, not just for resume:
    # localCheckpoint's LogicalRDD inherits the *estimated* stats of the
    # plan it truncates, and each iteration's plan multiplies two copies
    # of the previous state's estimate — the BigInt sizeInBytes doubles
    # in bit-length per iteration and stats computation itself becomes
    # the bottleneck (observed: million-digit multiplications by ~iter
    # 25 over a UDF-derived edge table).  A parquet write+read resets
    # stats to real file sizes every `interval` iterations, bounding the
    # blowup at 2^interval × base.
    if checkpoint is None:
        import tempfile

        checkpoint = CheckpointManager(
            spark, tempfile.mkdtemp(prefix="pagerank_ckpt_"),
            interval=checkpoint_interval)

    if gather_mode == "auto":
        if salt_threshold is not None:
            gather_mode = "salted"  # explicit threshold wins
        elif n <= broadcast_max_vertices:
            # Broadcast gather is skew-immune: edge rows never move,
            # so a hub's out-edges stay spread across partitions.
            gather_mode = "broadcast"
        else:
            gather_mode, salt_threshold = _auto_shuffle_or_salted(graph)

    # Mode-aware edge layout (one-time cost, amortized over O(100)
    # iterations).  The persisted graph is dst-partitioned — optimal for
    # the BROADCAST gather (join needs no exchange, groupBy(dst) reuses
    # the layout: a zero-shuffle iteration).  The SHUFFLE gather joins
    # on ``src``: with dst-partitioned edges the whole |E| table would
    # re-exchange EVERY iteration.  Re-layout by the join key once into
    # the SQL cache — InMemoryRelation preserves outputPartitioning
    # even under AQE (localCheckpoint does NOT: an adaptive plan
    # reports UnknownPartitioning at checkpoint time), so per iteration
    # only the |V|-row rank side shuffles to match, plus the partial
    # aggregates (bounded by |distinct dst| per partition, not |E|).
    # Plan shape asserted in tests/test_plans.py.  The salted override
    # is resolved FIRST so a salted run never builds (and caches) a
    # shuffle layout it will not use; all loop-scoped caches are
    # released in _release_gather_caches before returning.
    salted_ctx = None
    if salt_threshold is not None:
        gather_mode = "salted"
        hot = skew.hot_vertices(graph.out_deg, salt_threshold).persist()
        salted_edges = (
            skew.salt_edges(graph.edges, hot, num_salts)
            .repartition(graph.edges.rdd.getNumPartitions(), "src", "salt")
            .persist()
        )
        salted_edges.count()
        salted_ctx = (salted_edges, hot, num_salts)

    gather_edges = graph.edges
    if gather_mode == "shuffle":
        gather_edges = graph.edges.repartition(
            graph.edges.rdd.getNumPartitions(), "src").persist()
        gather_edges.count()

    # Per-iteration exchanges (the |V|-row state join + the scalar
    # aggregate) are sized to the LOOP's tables, not the session's
    # worst case: the edge table is already data-sized by
    # graph.prepare, and the state side needs at most
    # ceil(n / STATE_ROWS_PER_PARTITION) useful tasks.  At web scale
    # the session width is smaller than either bound and sized_shuffle
    # is a no-op (see session.sized_shuffle for the measurements).
    loop_width = max(gather_edges.rdd.getNumPartitions(),
                     n // STATE_ROWS_PER_PARTITION + 1)

    # Everything from here runs under try/finally: the |E|-sized
    # loop-scoped caches must be released on EVERY exit path —
    # including job failures and interrupts mid-loop — or retries
    # accumulate edge-table copies in executor storage.
    from pagerank_spark.session import sized_shuffle

    try:
        with sized_shuffle(spark, loop_width):
            return _run_iterations(
                graph, spark, n, damping, tol, max_iter, stop_rule,
                checkpoint, gather_mode, resume, gather_edges, salted_ctx)
    finally:
        _release_gather_caches(gather_mode, gather_edges, salted_ctx)


def _auto_shuffle_or_salted(graph: Graph) -> tuple[str, int | None]:
    """Pick shuffle vs salted for the non-broadcast gather from the
    out-degree distribution: one constant-size aggregate over the
    persisted |V|-row degree table (same cost class as a per-iteration
    scalar collect).  A hub src whose out-degree exceeds
    AUTO_SALT_PARTITION_FRACTION of the average per-partition edge
    share concentrates that many co-keyed rows in ONE task of the
    shuffled join — the power-law straggler salting exists to kill.
    Returns (mode, salt_threshold)."""
    row = graph.out_deg.agg(
        F.max("out_deg").alias("max_deg"),
        F.sum("out_deg").alias("n_edges")).first()
    if row is None or row["max_deg"] is None:
        return "shuffle", None
    parts = max(graph.edges.rdd.getNumPartitions(), 1)
    hub_threshold = max(
        int(AUTO_SALT_PARTITION_FRACTION * int(row["n_edges"]) / parts), 1)
    if int(row["max_deg"]) > hub_threshold:
        return "salted", hub_threshold
    return "shuffle", None


def _run_iterations(
    graph: Graph,
    spark,
    n: int,
    damping: float,
    tol: float,
    max_iter: int,
    stop_rule: str,
    checkpoint: CheckpointManager | None,
    gather_mode: str,
    resume: bool,
    gather_edges: DataFrame,
    salted_ctx: tuple | None,
) -> PageRankResult:
    # State: (id, pr, prev_pr, out_deg NULL⇔dangling).  Carrying out_deg
    # in the state avoids a per-iteration anti-join for the dangling
    # mass (ref recomputes it with a full filter pass each step,
    # pagerank.cpp:210-219).
    it = 0
    dangling = 0.0
    prev_l1 = 1.0  # ref inits diff=1 (pagerank.cpp:268)
    metrics: list[dict] = []

    if resume and checkpoint is not None and checkpoint.latest_iteration() is not None:
        it = checkpoint.latest_iteration()
        state = checkpoint.read_state(it).persist()
        agg = _state_agg(state)
        dangling, prev_l1 = agg["dangling"], agg["l1"]
        # The resume-time stop check must see the SAME (l1, prev_l1)
        # pair the original run saw at iteration ``it``.  The metrics
        # row written AT ``it`` carries prev_l1 directly, so this
        # works at ANY checkpoint cadence; the it-1 lookup is kept as
        # a fallback for metrics logs written before prev_l1 existed
        # (it only resolves when iteration it-1 was on the cadence).
        prior_l1 = checkpoint.read_metric(it, "prev_l1")
        if prior_l1 is None:
            prior_l1 = checkpoint.read_metric(it - 1, "l1")
        if _stopped(prev_l1, prior_l1, stop_rule, tol):
            return _finish(state, it, prev_l1, metrics, stopped=True)
    else:
        # Q1: zero init.
        state = (
            spark.range(0, n).withColumnRenamed("id", "id")
            .join(graph.out_deg, "id", "left")
            .select("id", F.lit(0.0).alias("pr"),
                    F.lit(0.0).alias("prev_pr"), "out_deg")
            .persist()
        )

    inv_n = 1.0 / n
    stopped = False
    while it < max_iter:
        it += 1
        t0 = time.monotonic()

        contribs = _gather(gather_edges, _rank_weights(state), gather_mode, salted_ctx)
        new_pr = (
            (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling * inv_n))
            * F.lit(damping) + F.lit((1.0 - damping) * inv_n)
        )
        new_state = (
            state.join(contribs, state["id"] == contribs["dst"], "left")
            .select(state["id"], new_pr.alias("pr"),
                    state["pr"].alias("prev_pr"), state["out_deg"])
        )

        # Lineage truncation is NOT optional: the new state references
        # the old one twice (directly + via the gather), so the logical
        # plan doubles per iteration — by ~iter 30 plan analysis alone
        # OOMs the JVM.  Durable checkpoint (write+read parquet) when a
        # manager says so; eager localCheckpoint (in-memory RDD with a
        # fresh LogicalRDD plan) otherwise.
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            new_state = checkpoint.write_state(
                new_state, it,
                target_partitions=min(max(n // 500_000, 1), 2000)).persist()
        else:
            # lazy: the truncated RDD materializes inside the agg job
            # below — one Spark job per iteration instead of two.
            new_state = new_state.localCheckpoint(eager=False)

        agg = _state_agg(new_state)
        l1, next_dangling, sum_pr = agg["l1"], agg["dangling"], agg["sum_pr"]
        wall_ms = (time.monotonic() - t0) * 1000.0
        m = {"l1": l1, "prev_l1": prev_l1, "dangling_mass": next_dangling,
             "sum_pr": sum_pr, "wall_ms": wall_ms, "rows": float(n),
             "num_partitions": float(new_state.rdd.getNumPartitions())}
        metrics.append({"iteration": it, **m})
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            checkpoint.write_metrics(it, m)

        state.unpersist()
        state = new_state

        if _stopped(l1, prev_l1, stop_rule, tol):
            stopped = True
            break
        prev_l1 = l1
        dangling = next_dangling

    return _finish(state, it, metrics[-1]["l1"] if metrics else prev_l1,
                   metrics, stopped)


def _release_gather_caches(gather_mode: str, gather_edges: DataFrame,
                           salted_ctx: tuple | None) -> None:
    """Release the loop-scoped |E|-sized caches (shuffle relaid edges,
    salted edges, hot set) — the result frames derive only from the
    state table, so repeated pagerank() calls must not accumulate
    edge-table copies in executor storage."""
    if gather_mode == "shuffle":
        gather_edges.unpersist()
    if salted_ctx is not None:
        salted_edges, hot, _ = salted_ctx
        salted_edges.unpersist()
        hot.unpersist()


def _state_agg(state: DataFrame) -> dict:
    """One collect: L1 delta, dangling mass of the new vector, Σpr."""
    row = state.agg(
        F.sum(F.abs(F.col("pr") - F.col("prev_pr"))).alias("l1"),
        F.sum(F.when(F.col("out_deg").isNull(), F.col("pr"))
              .otherwise(F.lit(0.0))).alias("dangling"),
        F.sum("pr").alias("sum_pr"),
    ).first()
    return {"l1": float(row["l1"] or 0.0),
            "dangling": float(row["dangling"] or 0.0),
            "sum_pr": float(row["sum_pr"] or 0.0)}


def _stopped(l1: float, prev_l1: float | None, stop_rule: str, tol: float) -> bool:
    if stop_rule == "reference":
        # ref pagerank.cpp:229-236: L1 < 1e-5 OR plateau < 1e-7.
        if l1 < 1e-5:
            return True
        return prev_l1 is not None and abs(l1 - prev_l1) < 1e-7
    return l1 < tol


def _finish(state: DataFrame, it: int, l1: float, metrics: list[dict],
            stopped: bool) -> PageRankResult:
    """Build the result, matching the reference's reporting on BOTH exit
    paths: on a stop-rule exit the loop breaks *before* the swap, so the
    reported vector is x_{k-1} (quirk Q4, ref pagerank.cpp:234-238); on
    a max-iter exit every iteration completed its swap (``pr = new_pr``
    runs on every non-break iteration, ref pagerank.cpp:238), so the
    reference reports the last computed iterate x_k."""
    pre_swap = state.select("id", F.col("prev_pr").alias("pr"))
    converged = state.select("id", "pr")
    reported = pre_swap if stopped else converged
    return PageRankResult(ranks=reported, converged_ranks=converged,
                          iterations=it, final_l1=l1, metrics=metrics)
