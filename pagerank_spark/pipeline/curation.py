"""Corpus-curation operators for training-data pipelines:
repetition quality rules, fixed-window token chunking, and
deterministic stratified sampling.

These extend the reference's fixed-function graph engine
(``/root/reference/pagerank/src/lib/pagerank.cpp:195-242`` computes
only PageRank) with the document-curation steps a 100 TB pretraining
pipeline runs before/after dedup (``pipeline/dedup.py``): drop
machine-repeated boilerplate (Gopher-style repetition signals, Rae et
al. 2021 §A1.1), slice what survives into training windows, and
down/up-sample strata to a target mixture.

Scale notes
-----------
- ``repetition_stats``: one Arrow-batched ``mapInPandas`` pass —
  ZERO shuffle, embarrassingly parallel; 20 s vs 479 s (~24x) over
  the pure-JVM explode+double-agg face at 6M docs, which is kept as
  ``impl="sql"`` — see the function docstring for the measured
  three-way comparison, including the discarded HOF formulation.
- ``chunk_documents``: pure per-row ``explode(sequence(...))`` +
  ``slice`` — zero shuffle, embarrassingly parallel, whole-stage
  codegen.
- ``stratified_sample``: a filter on a 60-bit md5-derived uniform
  deviate — zero shuffle, pushdown-friendly, and reproducible across
  engines (the DuckDB oracle computes the identical integer
  threshold compare; no float rounding in the keep/drop decision).

Every operator is expressible in ANSI SQL; ``__spark_entry__`` keeps
the DuckDB oracles in lockstep.
"""

from __future__ import annotations

import decimal
import re

from pyspark.sql import DataFrame, Window, functions as F

# Fixed-point denominator for the sampling deviate: md5's leading 15
# hex chars as a non-negative 60-bit integer (same family as
# dedup.simhash hash_family="md5").
_HASH_SPACE = 1 << 60


def _tokens(col):
    # identical tokenization to textstats._tokens / dedup
    return F.split(F.trim(F.lower(col)), r"\s+")


def _grams(toks, k: int):
    """Array of space-joined k-grams of ``toks`` (empty when the doc
    has fewer than k tokens)."""
    if k == 1:
        return toks
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


_REP_SCHEMA = ("doc_id bigint, n_tokens bigint, dup_word_frac double, "
               "dup_line_frac double, top_bigram_frac double, "
               "top_trigram_frac double")

# Java-regex \s (ASCII-only: [ \t\n\x0B\f\r]) — the Python tokenizer
# below must split on EXACTLY the class Spark's split / DuckDB's
# string_split_regex use, or token counts drift on exotic whitespace.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_SIX = decimal.Decimal("0.000001")


def _round6(x: float) -> float:
    # Spark's round() is BigDecimal HALF_UP on the exact double;
    # Python's built-in round is banker's — replicate Spark/DuckDB.
    return float(decimal.Decimal(x).quantize(_SIX, decimal.ROUND_HALF_UP))


def repetition_stats(docs: DataFrame, max_gram: int = 3,
                     impl: str = "arrow") -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, dup_line_frac,
    top_bigram_frac, top_trigram_frac) — Gopher-style repetition
    signals (Rae et al. 2021, §A1.1 "repetition removal").

    - ``dup_word_frac``  = 1 − distinct_tokens / n_tokens
    - ``dup_line_frac``  = 1 − distinct_lines / n_lines (text split
      on ``\\n``; single-line docs score 0)
    - ``top_bigram_frac``/``top_trigram_frac`` = occurrences of the
      most frequent 2-/3-gram ÷ total 2-/3-grams (0 when the doc is
      shorter than the gram).

    A curation pass typically drops docs with dup_line_frac > 0.3 or
    top_bigram_frac > 0.18 (the published Gopher thresholds); this
    operator reports the signals and leaves the cut to the caller.

    ``impl`` picks the execution strategy (identical results,
    asserted in tests):

    - ``"arrow"`` (default): one ``mapInPandas`` pass — a Counter
      over adjacent token tuples per doc, Arrow-batched.  Measured
      20 s for 6M docs at local[32] (the sql face: 479 s).  Per-object Python is the
      RIGHT tool here: the pure-JVM alternatives both lose by an
      order of magnitude (below), because gram construction forces
      interpreted higher-order functions either way.
    - ``"sql"``: pure-JVM explode of (doc, k, gram) instances into
      two partial-aggregated shuffles.  Measured 479 s at 6M docs
      (the instance shuffle is |corpus|·~2L rows) — but zero Python
      workers, so it remains the face for SQL-only surfaces and the
      shape the DuckDB oracle mirrors.  (A third formulation — fully
      per-row via array HOFs — measured 61 s for just 300k docs and
      was discarded: Spark evaluates HOF lambdas interpreted,
      per-element.)
    """
    if impl == "sql":
        return _repetition_stats_sql(docs, max_gram)
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r}")
    count_tri = max_gram >= 3

    def _batch(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_tokens", "dup_word_frac",
                                   "dup_line_frac", "top_bigram_frac",
                                   "top_trigram_frac")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _JAVA_WS.split(text.lower().strip(" "))
                lines = text.split("\n")
                n = len(toks)
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["dup_word_frac"].append(_round6(1.0 - len(set(toks)) / n))
                out["dup_line_frac"].append(
                    _round6(1.0 - len(set(lines)) / len(lines)))
                big = Counter(zip(toks, toks[1:]))
                out["top_bigram_frac"].append(
                    _round6(max(big.values()) / (n - 1)) if big else 0.0)
                tri = Counter(zip(toks, toks[1:], toks[2:])) \
                    if count_tri else None
                out["top_trigram_frac"].append(
                    _round6(max(tri.values()) / (n - 2)) if tri else 0.0)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _batch, schema=_REP_SCHEMA)


def _repetition_stats_sql(docs: DataFrame, max_gram: int) -> DataFrame:
    """Pure-JVM face of ``repetition_stats`` (see its docstring for
    the measured trade): explode every (k, gram) instance, aggregate
    (doc,k,gram) → (doc,k) → doc.  Both shuffles partial-aggregate
    map-side; a doc's grams spread across partitions in the first
    agg, so a single pathological doc is not a straggler key."""
    toks = _tokens(F.col("text"))
    lines = F.split(F.col("text"), r"\n")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            1.0 - F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("dup_word_frac"),
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6
        ).alias("dup_line_frac"),
    )

    def _tag(k: int):
        # single-arg lambda: F.transform treats a second parameter as
        # the element INDEX, which would shadow a k=k closure default
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("gram"))

    gram_structs = F.flatten(F.array(*[
        F.transform(_grams(toks, k), _tag(k))
        for k in range(2, max_gram + 1)
    ]))
    inst = docs.select(
        "doc_id", F.explode(gram_structs).alias("kg")
    ).select("doc_id", F.col("kg.k").alias("k"),
             F.col("kg.gram").alias("gram"))
    per_gram = inst.groupBy("doc_id", "k", "gram").agg(
        F.count(F.lit(1)).alias("c"))
    per_k = per_gram.groupBy("doc_id", "k").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total"))
    tops = per_k.groupBy("doc_id").agg(*[
        F.round(
            F.max(F.when(F.col("k") == k, F.col("top_c") / F.col("total"))),
            6,
        ).alias(f"top_{name}_frac")
        for k, name in ((2, "bigram"), (3, "trigram"))
    ])
    return (
        base.join(tops, "doc_id", "left")
        .select(
            "doc_id", "n_tokens", "dup_word_frac", "dup_line_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("top_trigram_frac", F.lit(0.0))
            .alias("top_trigram_frac"),
        )
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    stride: int = 24) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tok, chunk_text) — overlapping
    fixed-size token windows for training-example packing.

    Window i starts at token ``1 + i*stride`` (1-based) and spans up
    to ``chunk_tokens`` tokens; starts run while they ≤
    ``max(n − chunk_tokens + 1, 1)``, so with ``stride <
    chunk_tokens`` every token is covered and only the final window
    may be short.  Pure per-row expressions (explode of an arithmetic
    sequence + ``slice``): zero shuffle at any scale.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - (chunk_tokens - 1), F.lit(1)), F.lit(stride))
    out = docs.select(
        "doc_id", toks.alias("_toks"), F.explode(starts).alias("start_tok"))
    piece = F.slice("_toks", F.col("start_tok"), chunk_tokens)
    return out.select(
        "doc_id",
        ((F.col("start_tok") - 1) / stride).cast("bigint").alias("chunk_id"),
        F.col("start_tok").cast("bigint"),
        F.size(piece).cast("bigint").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def sample_deviate(doc_id_col, seed: int):
    """60-bit uniform integer deviate for ``doc_id``: the leading 15
    hex chars of md5('sample:<seed>:<doc_id>').  Portable — any
    engine with md5 reproduces it bit-for-bit."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("sample"), F.lit(str(seed)),
                              doc_id_col.cast("string"))),
            1, 15),
        16, 10,
    ).cast("bigint")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", seed: int = 42,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    md5 deviate < floor(rate(stratum) · 2^60).

    The keep/drop decision is an exact integer compare — no float in
    the predicate — so resampling with the same seed is idempotent
    and identical on every engine/cluster size (the property that
    makes mixture reweighting reproducible across pipeline reruns).
    Unlisted strata fall back to ``default_rate``.  Zero shuffle.
    """
    dev = sample_deviate(F.col("doc_id"), seed)
    thr = F.lit(int(default_rate * _HASH_SPACE)).cast("bigint")
    for stratum, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} out of [0,1]: {rate}")
        thr = F.when(
            F.col(stratum_col) == stratum,
            F.lit(int(rate * _HASH_SPACE)).cast("bigint")).otherwise(thr)
    return docs.where(dev < thr)


def _budget_rates(base: DataFrame, budgets: dict[str, int]) -> DataFrame:
    """Per-stratum keep thresholds for a token budget: one small agg
    (map-side combined, ≤ |strata| rows) joined broadcast back to the
    corpus.  rate = min(1, budget / total_tokens); the row-level
    keep decision compares the 60-bit md5 deviate against
    floor(rate · 2^60) — both factors are single IEEE-double ops over
    exact integers, so every engine computes the identical BIGINT
    threshold (no accumulation-order drift)."""
    totals = base.groupBy("stratum").agg(
        F.sum("n_tok").alias("total_tok"))
    bud = F.lit(None).cast("bigint")
    for stratum, budget in sorted(budgets.items()):
        if budget < 0:
            raise ValueError(f"budget for {stratum!r} negative: {budget}")
        bud = F.when(F.col("stratum") == stratum,
                     F.lit(int(budget)).cast("bigint")).otherwise(bud)
    return (
        totals.select("stratum", "total_tok", bud.alias("budget_tok"))
        # Strata without a budget line are dropped entirely (a mixture
        # spec lists every source it wants; silence means weight 0).
        .where(F.col("budget_tok").isNotNull())
        .select(
            "stratum", "total_tok", "budget_tok",
            F.least(F.lit(1.0),
                    F.col("budget_tok") / F.col("total_tok")).alias("rate"))
        .select(
            "stratum", "total_tok", "budget_tok", "rate",
            F.floor(F.col("rate") * F.lit(float(_HASH_SPACE)))
            .cast("bigint").alias("thr"))
    )


def token_budget_sample(docs: DataFrame, budgets: dict[str, int],
                        stratum_col: str = "lang",
                        seed: int = 42) -> DataFrame:
    """(doc_id, stratum, n_tok): token-budget data mixing — keep a
    deterministic Bernoulli sample of each stratum sized so the KEPT
    token mass ≈ ``budgets[stratum]`` in expectation (rate =
    min(1, budget / total_tokens)).

    This is the mixture primitive a training-data pipeline runs last:
    "2B tokens of code, 500M of forum text" becomes one agg + one
    broadcast join + a stateless integer-compare filter — no sort, no
    window, no driver loop, so the plan is identical at 100 TB (a
    per-stratum running-sum cutoff would serialize each stratum
    through one window task; the Bernoulli form trades exact cutoff
    for expectation-exact mass and full parallelism).  The deviate is
    the same md5 family as :func:`stratified_sample`, so reruns and
    engines agree row-for-row.
    """
    base = docs.select(
        "doc_id", F.col(stratum_col).alias("stratum"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    rates = _budget_rates(base, budgets)
    dev = sample_deviate(F.col("doc_id"), seed)
    return (
        base.join(F.broadcast(rates.select("stratum", "thr")), "stratum")
        .where(dev < F.col("thr"))
        .select("doc_id", "stratum", "n_tok")
    )


def token_budget_stats(docs: DataFrame, budgets: dict[str, int],
                       stratum_col: str = "lang",
                       seed: int = 42) -> DataFrame:
    """(stratum, total_tok, budget_tok, rate, kept_docs, kept_tok) —
    audit table for a :func:`token_budget_sample` configuration: how
    close the expectation-exact sample landed to the requested token
    budget (same deviate, same thresholds)."""
    base = docs.select(
        "doc_id", F.col(stratum_col).alias("stratum"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    rates = _budget_rates(base, budgets)
    dev = sample_deviate(F.col("doc_id"), seed)
    kept = (
        base.join(F.broadcast(rates.select("stratum", "thr")), "stratum")
        .where(dev < F.col("thr"))
        .groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("kept_docs"),
             F.sum("n_tok").alias("kept_tok"))
    )
    return (
        rates.join(kept, "stratum", "left")
        .select(
            "stratum", "total_tok", "budget_tok",
            F.round("rate", 6).alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).cast("bigint")
            .alias("kept_docs"),
            F.coalesce("kept_tok", F.lit(0)).cast("bigint")
            .alias("kept_tok"))
    )


def sample_stats(docs: DataFrame, rates: dict[str, float],
                 stratum_col: str = "lang", seed: int = 42,
                 default_rate: float = 0.0) -> DataFrame:
    """(stratum, total, kept, kept_frac) — audit table for a
    ``stratified_sample`` configuration (same deviate, same
    thresholds), aggregated map-side then by stratum."""
    kept = stratified_sample(docs, rates, stratum_col, seed, default_rate)
    tot = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("total"))
    k = kept.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("kept"))
    return (
        tot.join(k, "stratum", "left")
        .select(
            "stratum", "total",
            F.coalesce("kept", F.lit(0)).cast("bigint").alias("kept"),
            F.round(F.coalesce("kept", F.lit(0)) / F.col("total"), 6)
            .alias("kept_frac"),
        )
    )


def dataset_split(docs: DataFrame, fractions: dict[str, float] | None = None,
                  seed: int = 7) -> DataFrame:
    """(doc_id, split) — deterministic train/val/test assignment by
    hash bucket: the 60-bit md5 deviate falls into cumulative integer
    cut points (one per split, in the dict's listed order); the LAST
    split absorbs the hash-space remainder.

    The assignment is a pure per-row expression over exact integer
    compares — zero shuffle at any scale, idempotent across reruns,
    engines and cluster sizes, and STABLE UNDER APPENDS: a document's
    split never changes when the corpus grows (the property a random
    split lacks and a training pipeline needs for leak-free
    incremental ingestion).  ``fractions`` must sum to 1 (±1e-9).
    """
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    dev = sample_deviate(F.col("doc_id"), seed)
    acc = 0.0
    expr = None
    for nm in names[:-1]:
        acc += fractions[nm]
        cut = F.lit(int(acc * _HASH_SPACE)).cast("bigint")
        expr = (F.when(dev < cut, F.lit(nm)) if expr is None
                else expr.when(dev < cut, F.lit(nm)))
    expr = expr.otherwise(F.lit(names[-1]))
    return docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       expr.alias("split"))


def pack_bins(docs: DataFrame, max_tokens: int = 256,
              n_buckets: int = 8, seed: int = 11) -> DataFrame:
    """(doc_id, bucket, bin_id, n_tokens) — deterministic distributed
    sequence packing for training-batch assembly: documents are
    hashed into ``n_buckets`` independent streams (bucket = deviate %
    n_buckets), ordered by doc_id within a stream, and packed
    front-to-back — bin_id = exclusive-running-token-count DIV
    max_tokens (exact integer arithmetic in both engines).

    Every bin therefore holds at least one document and CLOSES at the
    first document that carries its running count past ``max_tokens``
    (bounded overflow: one document's tokens); a document longer than
    ``max_tokens`` advances the counter past several bin indices,
    occupying one bin alone.  Scale: one shuffle of (doc_id, bucket,
    n_tokens) rows — the window sorts WITHIN a bucket, so
    ``n_buckets`` is the parallelism knob (set it ~ the cluster's
    partition count at 100 TB; streams are independent by
    construction, which is what makes hash-bucketed packing scale
    where a single global first-fit order cannot).
    """
    if max_tokens <= 0 or n_buckets <= 0:
        raise ValueError("max_tokens and n_buckets must be positive")
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        (sample_deviate(F.col("doc_id"), seed) % n_buckets).alias("bucket"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        base.withColumn(
            "cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select("doc_id", "bucket",
                F.expr(f"cum DIV {int(max_tokens)}").alias("bin_id"),
                "n_tokens")
    )


def weighted_sample_topk(docs: DataFrame, k: int = 20,
                         stratum_col: str = "lang", seed: int = 42,
                         salt_buckets: int = 32) -> DataFrame:
    """(stratum, doc_id, n_tok, es_key): per-stratum weighted sample
    WITHOUT replacement, weight ∝ token count — Efraimidis-Spirakis
    A-ES (IPL 2006): doc i gets key −ln(uᵢ)/wᵢ with uᵢ its 60-bit md5
    deviate mapped into (0, 1]; the k SMALLEST keys per stratum are
    exactly a weighted draw without replacement (the exponential-race
    argument).  Complements the Bernoulli samplers above: those hit a
    token BUDGET in expectation; this returns an exact-k draw where a
    long document is proportionally more likely to be picked.

    Determinism & portability: uᵢ = (dev+1)/2^60 — the int64→double
    conversion is IEEE round-to-nearest and the division a power-of-two
    scaling, both bit-identical on any engine, so ln() sees the same
    double everywhere; the key is quantized
    to 9 decimal digits (the tfidf.W_ROUND convention) with doc_id as
    total tiebreak, so the selection boundary is engine-stable.

    Scale shape: a naive per-stratum window sorts each stratum through
    ONE task — the classic 100 TB faceplant.  Selection here is
    two-level: top-k within (stratum, salt) over ``salt_buckets``
    deviate-derived salts in parallel, then top-k of the ≤ k·salts
    survivors per stratum (a tiny second window).  The global top-k is
    a subset of the union of per-salt top-k's, so the result is
    identical to the single-window answer.
    """
    if k <= 0 or salt_buckets <= 0:
        raise ValueError("k and salt_buckets must be positive")
    dev = sample_deviate(F.col("doc_id"), seed)
    u = (dev + F.lit(1)).cast("double") / F.lit(float(_HASH_SPACE))
    base = docs.select(
        F.col(stratum_col).alias("stratum"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.greatest(F.size(_tokens(F.col("text"))).cast("bigint"),
                   F.lit(1)).alias("n_tok"),
        (dev % salt_buckets).alias("salt"),
        F.round(-F.log(u), 12).alias("_e"))
    base = base.withColumn(
        "es_key", F.round(F.col("_e") / F.col("n_tok"), 9))
    w1 = Window.partitionBy("stratum", "salt").orderBy("es_key", "doc_id")
    w2 = Window.partitionBy("stratum").orderBy("es_key", "doc_id")
    return (
        base.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= k)
        .select("stratum", "doc_id", "n_tok", "es_key")
    )
