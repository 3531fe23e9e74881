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

Determinism note: synchronous LPA can 2-cycle on bipartite structures;
``max_iter`` bounds the loop and the changed-count history detects the
oscillation (we stop when changed == 0 or the (changed, checksum)
signature repeats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.checkpoint import CheckpointManager
from pagerank_spark.graph import symmetrize


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> DataFrame:
    """(id, label) for every vertex incident to an edge."""
    if checkpoint is None:
        # Durable truncation cadence — see operators/pagerank.py for why
        # localCheckpoint alone is insufficient (stats-estimate blowup).
        import tempfile

        checkpoint = CheckpointManager(
            edges.sparkSession, tempfile.mkdtemp(prefix="lpa_ckpt_"), interval=8)
    und = symmetrize(edges).persist()
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
            # Truncate lineage each round (plan would double per round).
            merged = merged.localCheckpoint(eager=True)
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

    und.unpersist()
    return labels
