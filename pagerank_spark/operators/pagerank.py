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
            salted_ctx: tuple | None, value=None) -> DataFrame:
    """(dst, contrib = Σ value over in-edges); ``value`` defaults to
    the rank side's ``w`` column (weighted gathers pass ``w * f``)."""
    if mode == "salted" and salted_ctx is not None:
        salted_edges, hot, num_salts = salted_ctx
        return skew.salted_gather(salted_edges, ranks_w, hot, num_salts,
                                  value)
    joined = (
        graph_edges.join(F.broadcast(ranks_w), "src")
        if mode == "broadcast"
        else graph_edges.join(ranks_w, "src")
    )
    value = F.col("w") if value is None else value
    return joined.groupBy("dst").agg(F.sum(value).alias("contrib"))


@dataclass
class GatherPlan:
    """A resolved physical gather strategy, shared by EVERY iterative
    matvec loop in the suite (global/personalized/weighted PageRank,
    both HITS gathers).

    Resolving once and reusing per iteration is what makes the loops
    scale: the |E|-side layout (src re-partition in shuffle mode,
    (src, salt) re-partition + hot-set in salted mode) is built ONE
    time and amortized over O(100) iterations, and because the loops
    run under ``session.static_plan`` (AQE suspended), the degree-probe
    salting here is the ONLY skew defence they get — a plain shuffled
    join would straggle every iteration on a power-law hub with no
    runtime backstop (VERDICT r3 item 1).
    """

    mode: str                   # broadcast | shuffle | salted
    edges: DataFrame            # the layout _gather consumes
    salted_ctx: tuple | None = None   # (salted_edges, hot, num_salts)
    salt_threshold: int | None = None
    _caches: list = field(default_factory=list)

    def gather(self, ranks_w: DataFrame, value=None) -> DataFrame:
        """(dst, contrib = Σ value) — ranks_w carries (src, w, ...)."""
        return _gather(self.edges, ranks_w, self.mode, self.salted_ctx,
                       value)

    def release(self) -> None:
        """Release the loop-scoped |E|-sized caches (shuffle-relaid
        edges, salted edges, hot set) — results derive only from the
        |V|-row state table, so repeated operator calls must not
        accumulate edge-table copies in executor storage."""
        for df in self._caches:
            df.unpersist()
        self._caches.clear()


def plan_gather(
    edges: DataFrame,
    out_deg: DataFrame,
    n: int,
    mode: str = "auto",
    salt_threshold: int | None = None,
    num_salts: int = 8,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> GatherPlan:
    """Resolve the physical gather from the DATA (mode="auto"):
    broadcast while the |V|-row rank side fits (skew-immune — edge
    rows never move), else probe the degree distribution and pick
    shuffled vs hub-salted join (``_probe_salting``).  An explicit
    ``salt_threshold`` forces salted mode regardless.

    ``out_deg`` is the (id, out_deg) table of the gather's JOIN KEY
    side — pass in-degrees when gathering over a reversed edge table
    (HITS' hub gather).

    Layout cost (one-time, amortized over the loop):
      broadcast — none: the caller's layout already serves the
        groupBy(dst) and the join needs no exchange at all.
      shuffle   — one |E| re-partition by ``src`` so per iteration
        only the |V|-row rank side moves.
      salted    — one |E| salt + re-partition by (src, salt), plus the
        broadcast-sized hot set.
    """
    caches: list[DataFrame] = []
    if mode == "auto":
        if salt_threshold is not None:
            mode = "salted"      # explicit threshold wins
        elif n <= broadcast_max_vertices:
            mode = "broadcast"
        else:
            mode, salt_threshold = _probe_salting(edges, out_deg)

    salted_ctx = None
    if salt_threshold is not None:
        mode = "salted"
        hot = skew.hot_vertices(out_deg, salt_threshold).persist()
        salted_edges = (
            skew.salt_edges(edges, hot, num_salts)
            .repartition(edges.rdd.getNumPartitions(), "src", "salt")
            .persist()
        )
        salted_edges.count()
        caches += [salted_edges, hot]
        salted_ctx = (salted_edges, hot, num_salts)

    gather_edges = edges
    if mode == "shuffle":
        gather_edges = edges.repartition(
            edges.rdd.getNumPartitions(), "src").persist()
        gather_edges.count()
        caches.append(gather_edges)

    return GatherPlan(mode=mode, edges=gather_edges, salted_ctx=salted_ctx,
                      salt_threshold=salt_threshold, _caches=caches)


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

    # Mode-aware edge layout (one-time cost, amortized over O(100)
    # iterations) — resolved by the shared plan_gather: the persisted
    # graph is dst-partitioned, optimal for the BROADCAST gather (join
    # needs no exchange, groupBy(dst) reuses the layout: a zero-shuffle
    # iteration); the SHUFFLE gather re-lays by ``src`` once into the
    # SQL cache — InMemoryRelation preserves outputPartitioning even
    # under AQE (localCheckpoint does NOT: an adaptive plan reports
    # UnknownPartitioning at checkpoint time), so per iteration only
    # the |V|-row rank side shuffles to match, plus the partial
    # aggregates (bounded by |distinct dst| per partition, not |E|).
    # Plan shape asserted in tests/test_plans.py.
    plan = plan_gather(graph.edges, graph.out_deg, n, mode=gather_mode,
                       salt_threshold=salt_threshold, num_salts=num_salts,
                       broadcast_max_vertices=broadcast_max_vertices)

    # Per-iteration exchanges (the |V|-row state join + the scalar
    # aggregate) are sized to the LOOP's tables, not the session's
    # worst case: the edge table is already data-sized by
    # graph.prepare, and the state side needs at most
    # ceil(n / STATE_ROWS_PER_PARTITION) useful tasks.  At web scale
    # the session width is smaller than either bound and sized_shuffle
    # is a no-op (see session.sized_shuffle for the measurements).
    loop_width = max(plan.edges.rdd.getNumPartitions(),
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
                checkpoint, resume, plan)
    finally:
        plan.release()


def _probe_salting(edges: DataFrame, out_deg: DataFrame) -> tuple[str, int | None]:
    """Pick shuffle vs salted for a non-broadcast gather from the
    degree distribution: one constant-size aggregate over the
    persisted |V|-row degree table (same cost class as a per-iteration
    scalar collect).  A hub key whose degree exceeds
    AUTO_SALT_PARTITION_FRACTION of the average per-partition edge
    share concentrates that many co-keyed rows in ONE task of the
    shuffled join — the power-law straggler salting exists to kill.
    Returns (mode, salt_threshold)."""
    row = out_deg.agg(
        F.max("out_deg").alias("max_deg"),
        F.sum("out_deg").alias("n_edges")).first()
    if row is None or row["max_deg"] is None:
        return "shuffle", None
    parts = max(edges.rdd.getNumPartitions(), 1)
    hub_threshold = max(
        int(AUTO_SALT_PARTITION_FRACTION * int(row["n_edges"]) / parts), 1)
    if int(row["max_deg"]) > hub_threshold:
        return "salted", hub_threshold
    return "shuffle", None


def _auto_shuffle_or_salted(graph: Graph) -> tuple[str, int | None]:
    """Graph-object face of :func:`_probe_salting` (kept for tests and
    callers holding a prepared Graph)."""
    return _probe_salting(graph.edges, graph.out_deg)


def _run_iterations(
    graph: Graph,
    spark,
    n: int,
    damping: float,
    tol: float,
    max_iter: int,
    stop_rule: str,
    checkpoint: CheckpointManager | None,
    resume: bool,
    plan: GatherPlan,
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

        contribs = plan.gather(_rank_weights(state))
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


def _state_agg(state: DataFrame, dangling_col: str = "out_deg") -> dict:
    """One collect: L1 delta, dangling mass of the new vector, Σpr.
    ``dangling_col`` is whichever state column is NULL exactly on the
    vertices with no out-edges (``out_deg`` for the unweighted loops,
    ``strength`` for the weighted one)."""
    row = state.agg(
        F.sum(F.abs(F.col("pr") - F.col("prev_pr"))).alias("l1"),
        F.sum(F.when(F.col(dangling_col).isNull(), F.col("pr"))
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
