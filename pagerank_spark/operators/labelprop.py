"""Synchronous label propagation with deterministic min tie-break.

Mandated beyond the reference (BASELINE.json north star).  Semantics
(community-detection LPA, Raghavan et al. 2007, synchronous variant
made deterministic):

  label_0(u)   = u
  label_t+1(u) = argmax_count over {label_t(v) : v ∈ Γ(u)}, ties
                 broken by SMALLEST label; vertices with no neighbors
                 keep their label.

Each round is: edges ⋈ labels (|V|-row side) → groupBy(dst, label)
count → per-dst argmax via max_by on a (count, -label) ordering —
partial-aggregatable, no window sort needed, one shuffle on dst.
Convergence: count of changed labels (single aggregate collect).

Physical strategy (mirrors operators/pagerank.py shuffle mode): the
symmetrized edge table is hash-partitioned by ``src`` — the
per-round join key — and cached ONCE in a single fused exchange, so
each round re-exchanges only the |V|-row label side, never the |E|
edge side; lineage is truncated with a LAZY localCheckpoint that
materializes inside the round's convergence aggregate — one Spark job
per round, not two.  AQE stays ON by default: unlike PageRank's
byte-identical iterations, LPA's per-round histogram shrinks as
labels converge, and runtime coalescing measured faster (sf0.1
medians 1.7s AQE vs 2.1s static; both ~3x the unfused round-2
build) — ``static_planning=True`` is available for clusters where
the re-planning overhead dominates.

Determinism note: synchronous LPA can 2-cycle on bipartite structures;
``max_iter`` bounds the loop and the changed-count history detects the
oscillation (we stop when changed == 0 or the (changed, checksum)
signature repeats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    static_planning: bool = False,
) -> DataFrame:
    """(id, label) for every vertex incident to an edge."""
    from pagerank_spark.session import static_plan

    if checkpoint is None:
        # Durable truncation cadence — see operators/pagerank.py for why
        # localCheckpoint alone is insufficient (stats-estimate blowup).
        import tempfile

        checkpoint = CheckpointManager(
            edges.sparkSession, tempfile.mkdtemp(prefix="lpa_ckpt_"), interval=8)
    # src-layout once: InMemoryRelation preserves outputPartitioning,
    # so every round's join on ``src`` reuses it and exchanges only
    # the label side.  The layout is FUSED with the symmetrize dedupe
    # in a single exchange: hash(src) partitioning satisfies the
    # dropDuplicates' ClusteredDistribution([src, dst]) — equal
    # (src, dst) pairs land in one partition — so the dedupe
    # aggregation runs partition-local after the one repartition,
    # instead of shuffling once on (src, dst) and again on src.
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = (
        fwd.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .repartition(edges.rdd.getNumPartitions(), "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    # try/finally: the |E|-sized cache must be released on every exit
    # path, including job failures mid-loop.
    try:
        with static_plan(edges.sparkSession, enabled=static_planning):
            return _lpa_loop(und, max_iter, checkpoint, resume)
    finally:
        und.unpersist()


def _lpa_loop(
    und: DataFrame,
    max_iter: int,
    checkpoint: CheckpointManager | None,
    resume: bool,
) -> DataFrame:
    if resume and checkpoint.latest_iteration() is not None:
        it = checkpoint.latest_iteration()
        labels = checkpoint.read_state(it).select("id", "label").persist()
    else:
        it = 0
        labels = (
            und.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .persist()
        )

    seen_sigs: set[tuple[int, int]] = set()
    prev_cached = labels
    while it < max_iter:
        it += 1
        lab_src = labels.select(F.col("id").alias("src"), "label")
        # Per-dst neighbor-label histogram → argmax count, min-label ties.
        # Encode the argmax ordering as a single min-struct key so the
        # whole round is two hash aggregations (both partially
        # aggregatable) — no window sort.
        hist = (
            und.join(lab_src, "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new_labels = hist.groupBy("id").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg_cnt"),
                           F.col("label").alias("label"))).alias("best")
        ).select("id", F.col("best.label").alias("label"))

        merged = (
            labels.select("id", F.col("label").alias("old_label"))
            .join(new_labels, "id", "left")
            .select("id",
                    F.coalesce("label", "old_label").alias("label"),
                    "old_label")
        )
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            merged = checkpoint.write_state(merged, it).persist()
        else:
            # Truncate lineage each round (plan would double per
            # round); LAZY so the truncated RDD materializes inside
            # the convergence aggregate below — one job per round.
            merged = merged.localCheckpoint(eager=False)
        row = merged.agg(
            F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("chg"),
            F.expr("bit_xor(xxhash64(id, label))").alias("h"),
        ).first()
        changed, sig = int(row["chg"] or 0), (int(row["chg"] or 0), int(row["h"] or 0))
        if checkpoint is not None and checkpoint.should_checkpoint(it):
            checkpoint.write_metrics(it, {"changed": float(changed)})
        prev_cached.unpersist()
        prev_cached = merged
        labels = merged.select("id", "label")
        if changed == 0 or sig in seen_sigs:
            break
        seen_sigs.add(sig)

    return labels
