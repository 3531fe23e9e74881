"""Mergeable Flajolet-Martin vocabulary sketches — approximate
per-group distinct n-gram counting at corpus scale.

Beyond-reference pipeline operator: exact per-language vocabulary
size (`COUNT(DISTINCT gram)`) needs a full shuffle of every gram
occurrence — at 100 TB that is the single most expensive profiling
query a corpus team runs.  The sketch route keeps K 60-bit FM bitmaps
per group: ONE pass over the gram stream, per-partition ``bit_or``
partial aggregation (constant-size state per group per partition),
and sketches from different corpus shards / ingestion days MERGE by
OR — the property that makes the statistic maintainable incrementally
without ever re-reading old data.

This reuses the exact FM machinery of the HyperBall neighborhood
operator (``operators/neighborhood.py`` — same md5 hash family, same
``bit_count`` trailing-zero identities, same shared mantissa
constants), pointed at text instead of vertex ids.  Everything up to
the final estimate is exact integer arithmetic, so any engine with
md5 and integer bit ops reproduces the sketch bit-for-bit; the
estimate itself is ONE multiply of identical double literals
(``est_constants``) — no log2 ulp drift.

Estimator (Flajolet-Martin 1985): with sum_rho the sum over the K
sketches of the lowest-unset-bit index,

    distinct_est = C[sum_rho mod K] · 2^(sum_rho div K),
    C[i] = 2^(i/K) / 0.77351.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.operators.neighborhood import (
    FM_PHI,
    MAX_RHO,
    est_constants,
)
from pagerank_spark.pipeline.curation import _grams, _tokens

N_SKETCHES = 8


def _gram_hash60(col, k: int):
    """Portable 60-bit md5 hash of 'fmg:{k}:{gram}' (DuckDB:
    ('0x' || substr(md5('fmg:{k}:' || gram), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"fmg:{k}:"), col)), 1, 15),
        16, 10,
    ).cast("bigint")


def _fm_mask(h):
    """2^min(trailing_zeros(h), MAX_RHO) with the h == 0 guard —
    identical to the neighborhood sketch init."""
    p = F.when(h == 0, F.lit(MAX_RHO)).otherwise(
        F.least(F.bit_count(h.bitwiseAND(-h) - F.lit(1)).cast("int"),
                F.lit(MAX_RHO)))
    return F.pow(F.lit(2.0), p).cast("bigint")


def ngram_fm_sketches(docs: DataFrame, n: int = 2,
                      n_sketches: int = N_SKETCHES,
                      group_col: str = "lang") -> DataFrame:
    """(group, s0..s{K-1}): per-group FM sketches over the corpus's
    n-gram stream (empty grams excluded, matching corpus_ngrams).
    Sketches of disjoint shards combine with ``bit_or`` — merge
    tables from incremental runs before :func:`finalize_sketches`."""
    grams = (
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(_grams(_tokens(F.col("text")), n))
                    .alias("gram"))
        .where(F.col("gram") != "")
    )
    aggs = [
        F.bit_or(_fm_mask(_gram_hash60(F.col("gram"), k))).alias(f"s{k}")
        for k in range(n_sketches)
    ]
    return grams.groupBy("grp").agg(*aggs)


def finalize_sketches(sketches: DataFrame,
                      n_sketches: int = N_SKETCHES) -> DataFrame:
    """(grp, sum_rho, distinct_est) from a (merged) sketch table."""
    rhos = []
    for k in range(n_sketches):
        s = F.col(f"s{k}")
        mask = F.bitwise_not(s).bitwiseAND(s + F.lit(1))
        rhos.append(F.bit_count(mask - F.lit(1)).cast("bigint"))
    sum_rho = rhos[0]
    for r in rhos[1:]:
        sum_rho = sum_rho + r
    consts = est_constants(n_sketches)
    cexpr = None
    for i, c in enumerate(consts):
        cond = (F.col("sum_rho") % n_sketches) == i
        cexpr = (F.when(cond, F.lit(c)) if cexpr is None
                 else cexpr.when(cond, F.lit(c)))
    return (
        sketches.withColumn("sum_rho", sum_rho)
        .select(
            "grp", "sum_rho",
            F.round(
                cexpr * F.pow(F.lit(2.0),
                              F.expr(f"sum_rho DIV {n_sketches}")
                              .cast("double")), 6).alias("distinct_est"))
    )


def approx_distinct_ngrams(docs: DataFrame, n: int = 2,
                           n_sketches: int = N_SKETCHES,
                           group_col: str = "lang") -> DataFrame:
    """(grp, sum_rho, distinct_est) — one-pass approximate vocabulary
    size per group (module docstring)."""
    return finalize_sketches(
        ngram_fm_sketches(docs, n=n, n_sketches=n_sketches,
                          group_col=group_col),
        n_sketches=n_sketches)


# ------------------------------------------------------- histogram quantiles

def length_histogram(docs: DataFrame, bucket_width: int = 64,
                     group_col: str = "lang") -> DataFrame:
    """(grp, bucket, cnt) — fixed-width histogram sketch of document
    length per group: bucket = length(text) DIV bucket_width.

    The mergeable face of ``corpus_length_profile``'s exact
    percentiles: the exact path shuffles every row's length to a
    per-group sort (percentile_disc); this keeps one bounded counter
    row per (group, bucket) — map-side-combined, one pass — and
    histograms from disjoint corpus shards / ingestion days merge by
    adding counts, so the statistic is maintainable incrementally
    without re-reading old data (the same merge contract as the FM
    and count-min sketches above).  Pure integer arithmetic
    end-to-end: any engine reproduces every cell exactly.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    return (
        docs.select(F.col(group_col).alias("grp"),
                    F.expr(f"CAST(length(text) AS BIGINT) DIV {bucket_width}")
                    .alias("bucket"))
        # NULL text has no length: excluded from the sketch (a NULL
        # bucket would also sort NULLS-FIRST in Spark's cumulative
        # window vs NULLS-LAST in most SQL engines — a parity trap).
        .where(F.col("bucket").isNotNull())
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(hist: DataFrame,
                        quantiles_permille: tuple[int, ...] = (500, 900, 990),
                        bucket_width: int = 64,
                        group_cols: tuple[str, ...] = ("grp",),
                        edge_offset: int = -1) -> DataFrame:
    """(*group_cols, q_permille, quantile_est) from a (merged)
    histogram: the estimate for quantile q is the upper edge
    ``(b+1)·width + edge_offset`` of the smallest bucket b whose
    cumulative count reaches ⌈q·total⌉ — biased high by at most one
    bucket width, the textbook equi-width histogram bound.  The
    default ``edge_offset = -1`` is the INCLUSIVE upper edge of an
    integer-valued domain (document lengths); pass ``0`` for the
    exclusive edge of a continuous domain (event values).  Quantiles
    are integer per-mille so the rank comparison ``cum·1000 ≥
    q·total`` is exact integer arithmetic (no float rank, no ulp
    drift).

    The cumulative window runs over the SKETCH (≤ range/width rows
    per group), not the corpus — driver-trivial at any corpus size.
    This one extractor serves every histogram face: the corpus-length
    sketch here and the streaming value histogram
    (streaming.windowed_value_histogram → q_events_value_quantiles).
    """
    spark = hist.sparkSession
    qs = spark.createDataFrame([(int(q),) for q in quantiles_permille],
                               "q_permille BIGINT")
    from pyspark.sql import Window

    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bucket")
    cum = hist.select(
        *gcols, "bucket",
        F.sum("cnt").over(w).alias("c"),
        F.sum("cnt").over(Window.partitionBy(*gcols)).alias("total"))
    return (
        cum.crossJoin(F.broadcast(qs))
        .where(F.col("c") * 1000 >= F.col("q_permille") * F.col("total"))
        .groupBy(*gcols, "q_permille")
        .agg(F.min((F.col("bucket") + 1) * bucket_width + edge_offset)
             .alias("quantile_est"))
    )


def approx_length_quantiles(docs: DataFrame, bucket_width: int = 64,
                            quantiles_permille: tuple[int, ...] =
                            (500, 900, 990),
                            group_col: str = "lang") -> DataFrame:
    """(grp, q_permille, quantile_est) — one-pass mergeable
    approximate length quantiles per group (see length_histogram)."""
    return histogram_quantiles(
        length_histogram(docs, bucket_width, group_col),
        quantiles_permille, bucket_width)


# ------------------------------------------------------------ count-min

def _cms_hash(col, k: int):
    """Portable 60-bit md5 hash of 'cms:{k}:{gram}'."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cms:{k}:"), col)), 1, 15),
        16, 10,
    ).cast("bigint")


def count_min_sketch(docs: DataFrame, n: int = 1, width: int = 1024,
                     depth: int = 4) -> DataFrame:
    """(k, bucket, cnt) — a depth×width count-min sketch of the
    corpus n-gram frequency stream (Cormode-Muthukrishnan 2005).

    The sketch is depth·width integers REGARDLESS of vocabulary size
    — the bounded-memory answer to "how often does gram g occur?" at
    100 TB, where the exact gram→count table is itself corpus-sized.
    One pass, map-side-combined integer sums; sketches of disjoint
    shards merge by adding counts cell-wise.  Deterministic md5 row
    hashes: any engine reproduces every cell exactly.
    """
    grams = (
        docs.select(F.explode(_grams(_tokens(F.col("text")), n))
                    .alias("gram"))
        .where(F.col("gram") != "")
    )
    rows = [
        grams.select(F.lit(k).alias("k"),
                     (_cms_hash(F.col("gram"), k) % width).alias("bucket"))
        for k in range(depth)
    ]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return allrows.groupBy("k", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 width: int = 1024, depth: int = 4) -> DataFrame:
    """(gram, cms_est) — the count-min upper-bound estimate
    min_k sketch[k][h_k(gram) % width] for every probe gram; never
    under-counts (est >= true frequency), over-counts only by
    collision mass.  The |probes|-side is broadcast-joined against
    the constant-size sketch."""
    lookups = None
    for k in range(depth):
        l = probes.select(
            "gram", F.lit(k).alias("k"),
            (_cms_hash(F.col("gram"), k) % width).alias("bucket"))
        lookups = l if lookups is None else lookups.unionByName(l)
    return (
        lookups.join(F.broadcast(sketch), ["k", "bucket"], "left")
        .groupBy("gram")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
