"""Local clustering: PPR sweep cut (Andersen-Chung-Lang FOCS'06).

Beyond-reference operator (the reference is fixed-function global
PageRank, ``pagerank/src/lib/pagerank.cpp:28-293``); the sweep cut is
the standard SECOND act of personalized PageRank — "given a seed
vertex, find a good community around it": rank vertices by
degree-normalized PPR score pr(v)/deg(v), and over the score-ordered
prefixes S_1 ⊂ S_2 ⊂ … report conductance

    φ(S_k) = cut(S_k) / min(vol(S_k), 2m − vol(S_k)),

whose minimizing prefix is the local cluster (ACL prove it is within
a quadratic factor of the best conductance cut the PPR vector can
see).  Conductance/volume follow the undirected simple graph —
the standard sweep setting; PPR itself runs on the directed graph
via the shared ``personalized_pagerank`` operator.

Exact cross-engine arithmetic: scores order by ``round(pr/deg, 12)``
with vertex-id tiebreak (PPR iterates are bit-identical cross-engine
— proven by the ppr_k3 hash face — and the one division is a single
IEEE op on identical operands); cut and volume are pure integers via
the event trick below; φ is emitted as ``phi_q6 = cut·10⁶ DIV
min(vol, 2m−vol)`` — integer division, no float anywhere in the
sweep itself.

Scale shape: the only |E|-sized work is (a) the PPR iterations
(PageRank-class, shared auto-salted gather) and (b) ONE pass of the
canonical undirected edge set against the BROADCAST ≤ max_prefix
rank table to build the sweep events.  Top-prefix selection is
two-level (per-salt top-P, then top-P of ≤ P·salts survivors — the
``weighted_sample_topk`` pattern), so no global sort and no
single-task window ever touches |V| rows.  The sweep itself —
cumulative cut/volume over k = 1..P — runs on P rows.

The cut(S_k) event trick: a canonical undirected edge whose
endpoint ranks are r_lo < r_hi (rank ∞ if outside the prefix) is cut
exactly for k ∈ [r_lo, r_hi); emit +1 at r_lo and −1 at r_hi (when
r_hi ≤ P), and cut(k) is the running sum — one |E|∩prefix-incident
aggregation instead of P separate cut evaluations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pagerank_spark.graph import Graph, symmetrize
from pagerank_spark.operators.ppr import personalized_pagerank

SCORE_ROUND = 12


def sweep_cut(
    graph: Graph,
    source: int,
    max_iter: int = 3,
    max_prefix: int = 32,
    salt_buckets: int = 32,
    ranks: DataFrame | None = None,
) -> DataFrame:
    """(k, id, score_q12, cut, vol, phi_q6): the conductance sweep
    over the top-``max_prefix`` degree-normalized PPR prefix around
    ``source``.  Row k describes prefix S_k = the k best-scored
    vertices; ``id`` is the vertex ADDED at position k.  ``phi_q6``
    is NULL when min(vol, 2m−vol) = 0 (prefix swallowed the whole
    graph).  Pass ``ranks`` (id, pr) to reuse an existing PPR run.
    """
    if max_prefix < 1 or salt_buckets < 1:
        raise ValueError("max_prefix and salt_buckets must be >= 1")
    if ranks is None:
        ranks = personalized_pagerank(
            graph, [source], max_iter=max_iter).ranks
    und = symmetrize(graph.edges).persist()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    two_m = und.count()  # Σ deg = 2·|undirected edges|

    scored = (
        ranks.where(F.col("pr") > 0)
        .join(deg, "id")
        .select("id", "deg",
                F.round(F.col("pr") / F.col("deg"), SCORE_ROUND)
                .alias("score_q12"))
    )
    # two-level top-P: per-salt prefix, then the survivors
    w1 = Window.partitionBy("salt").orderBy(F.desc("score_q12"), "id")
    w2 = Window.orderBy(F.desc("score_q12"), "id")
    prefix = (
        scored.withColumn("salt", F.col("id") % salt_buckets)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= max_prefix)
        .withColumn("k", F.row_number().over(w2))
        .where(F.col("k") <= max_prefix)
        .select("k", "id", "deg", "score_q12")
        .localCheckpoint(eager=True)
    )
    rk = prefix.select(F.col("id").alias("rid"),
                       F.col("k").alias("rk"))
    canon = und.where(F.col("src") < F.col("dst"))
    touched = (
        canon
        .join(F.broadcast(rk.withColumnRenamed("rid", "src")
                          .withColumnRenamed("rk", "k_src")), "src", "left")
        .join(F.broadcast(rk.withColumnRenamed("rid", "dst")
                          .withColumnRenamed("rk", "k_dst")), "dst", "left")
        .where(F.col("k_src").isNotNull() | F.col("k_dst").isNotNull())
        .select(
            F.least(F.coalesce("k_src", F.lit(1 << 40)),
                    F.coalesce("k_dst", F.lit(1 << 40))).alias("r_lo"),
            F.greatest(F.coalesce("k_src", F.lit(1 << 40)),
                       F.coalesce("k_dst", F.lit(1 << 40))).alias("r_hi"))
    )
    # Both events of an edge emit from ONE row (conditional-array
    # explode), so the canon-vs-rank-table pass genuinely runs once —
    # a unionByName over `touched` would re-execute the edge scan and
    # both broadcast joins for each branch.
    ev_arr = F.array(
        F.struct(F.col("r_lo").alias("k"), F.lit(1).alias("ev")),
        F.when(F.col("r_hi") <= max_prefix,
               F.struct(F.col("r_hi").alias("k"),
                        F.lit(-1).alias("ev"))))
    events = (
        touched.select(F.explode(ev_arr).alias("e"))
        .where(F.col("e").isNotNull())
        .select(F.col("e.k").alias("k"), F.col("e.ev").alias("ev"))
        .groupBy("k").agg(F.sum("ev").alias("dcut"))
    )
    wk = Window.orderBy("k")   # P rows — driver-trivial at any scale
    out = (
        prefix.join(events, "k", "left")
        .select("k", "id", "score_q12", "deg",
                F.coalesce("dcut", F.lit(0)).alias("dcut"))
        .withColumn("cut", F.sum("dcut").over(wk).cast("bigint"))
        .withColumn("vol", F.sum("deg").over(wk).cast("bigint"))
        .withColumn(
            "phi_q6",
            F.when(
                F.least(F.col("vol"), F.lit(two_m) - F.col("vol")) > 0,
                F.expr(f"CAST(cut * 1000000 AS BIGINT) DIV "
                       f"least(vol, {two_m} - vol)"))
            .cast("bigint"))
        .select("k", "id", "score_q12", "cut", "vol", "phi_q6")
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out


def best_local_cluster(sweep: DataFrame) -> DataFrame:
    """One row: the argmin-conductance prefix of a sweep_cut result
    (ties broken toward the SMALLER prefix — the ACL convention of
    reporting the first minimum)."""
    w = Window.orderBy(F.asc_nulls_last("phi_q6"), "k")
    return (sweep.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("k", "cut", "vol", "phi_q6"))
