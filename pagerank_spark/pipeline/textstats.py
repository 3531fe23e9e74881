"""Text analysis operators over a documents table (doc_id, text, ...).

All JVM-side ``pyspark.sql.functions`` expressions — whole-stage
codegen'd, no Python in the hot path.  Every operator is expressible
in ANSI SQL so the driver's DuckDB oracle can check it 1:1
(__spark_entry__.py keeps the two in lockstep).

At 100 TB these are embarrassingly parallel scans: no shuffle at all
except the optional aggregations; filters/projections push down to
the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Deterministic marker-word lists for the language-id heuristic.  A
# real pipeline would use fastText/CLD3; the contract here is a
# deterministic, SQL-expressible heuristic (same logic in the DuckDB
# oracle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

TOKEN_SPLIT = r"\s+"
# BPE-ish word/number/punct segmentation used by token_count_bpe.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), TOKEN_SPLIT)


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, n_chars_m)."""
    toks = _tokens(F.col("text"))
    bpe = F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(bpe).alias("bpe_tokens"),
        F.length("text").alias("n_chars_m"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars_m, alpha_ratio, punct_ratio, stop_ratio,
    mean_word_len, quality) — length/punct/stopword heuristics.

    quality = clamp(0,1) of a linear blend; deterministic and
    SQL-portable (same formula in the oracle).
    """
    length = F.length("text")
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    stop_list = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop_list))
    alpha_ratio = alpha / F.greatest(length, F.lit(1))
    punct_ratio = punct / F.greatest(length, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1))
    mean_word_len = (length - n_tok + 1) / F.greatest(n_tok, F.lit(1))
    quality = F.least(
        F.greatest(
            F.lit(0.0),
            alpha_ratio * F.lit(0.6) + stop_ratio * F.lit(0.3)
            - punct_ratio * F.lit(0.5)
            + F.when((length >= 100) & (length <= 10000), F.lit(0.3))
               .otherwise(F.lit(0.0)),
        ),
        F.lit(1.0),
    )
    return docs.select(
        "doc_id",
        length.alias("n_chars_m"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, marker_hits) — argmax marker-word hits with
    deterministic alphabetical tie-break ('und' when zero hits)."""
    toks = _tokens(F.col("text"))
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        # count tokens (with multiplicity) that are marker words
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        hit_cols.append(F.struct((-hits).alias("neg"), F.lit(lang).alias("lang"),
                                 hits.alias("hits")))
    best = F.array_min(F.array(*hit_cols))
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
         .alias("pred_lang"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint_col(col):
    """md5 of the normalized text (lowercase, non-alphanumerics
    collapsed to single spaces, trimmed) as a column expression —
    whitespace/punctuation/case variants collide, genuinely different
    text does not.  Shared by the batch fingerprint table and the
    streaming dedup face (streaming.drop_duplicate_docs)."""
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "),
                         r" +", " "))
    return F.md5(normalized)


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — deterministic document fingerprint
    (:func:`fingerprint_col`) per document."""
    return docs.select("doc_id",
                       fingerprint_col(F.col("text")).alias("fingerprint"))


# ln p quantized to integer micro-nats BEFORE the per-document sum:
# integer addition is exact and order-independent, so Spark and the
# DuckDB oracle cannot drift however their partial sums associate
# (a strictly stronger contract than tfidf.W_ROUND's double rounding;
# the residual risk is only the shared libm-ulp-at-a-rounding-boundary
# caveat documented there).
LP_SCALE = 1_000_000


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — corpus-trained unigram
    language-model score, the classic cheap perplexity proxy used to
    quality-rank web text for LLM corpora (CCNet-style: Wenzek et al.,
    LREC'20, with the KenLM swapped for the corpus's own unigram MLE
    so the operator stays deterministic and SQL-expressible).

    Train: one explode + hash aggregation builds token -> count over
    the WHOLE corpus (the model).  Score: every token joins its corpus
    probability p(t) = count/total, ln p(t) is quantized to integer
    micro-nats, and the per-document mean is the score (higher =
    more typical text; rare-token-heavy documents rank low).

    Scale: the vocabulary table is Zipf-bounded (tens of millions of
    rows at 100 TB, far below the corpus itself) and the score join is
    a shuffle hash join keyed on the token with map-side partial sums;
    nothing is quadratic.  Documents with no tokens keep n_tokens = 0
    and a NULL score via the final left join, so the output domain is
    always the full doc_id set.
    """
    toks = (docs.select("doc_id", F.explode(_tokens(F.col("text")))
                        .alias("tok"))
            .where(F.col("tok") != ""))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    lp = (F.round(F.log(F.col("c") / F.col("n")) * F.lit(LP_SCALE))
          .cast("long"))
    scored = (toks.join(vocab, "tok")
              .crossJoin(F.broadcast(total))
              .select("doc_id", lp.alias("lp")))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lp").alias("s"))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                F.round(F.col("s") / F.lit(float(LP_SCALE))
                        / F.col("n_tokens"), 6).alias("avg_logprob")))


def top_ngrams(docs: DataFrame, ns=(1, 2), k: int = 20) -> DataFrame:
    """(n, gram, occurrences, doc_freq, rank) — the corpus-wide ``k``
    most frequent n-grams for each n in ``ns``, with document
    frequency; rank 1..k per n ordered by (occurrences desc, gram).

    The vocabulary/top-phrase profile is a standard curation artifact
    (boilerplate detection, stop-list construction, corpus drift
    monitoring between crawl snapshots).  Scale shape: per n, one
    map-side-combinable count aggregation over the exploded grams
    (the only |corpus|-sized shuffle), a two-phase distinct for
    doc_freq, then a DISTRIBUTED top-k — ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject (per-partition heaps merged on
    the driver), never a global sort of the vocabulary.  The final
    rank window runs on <= len(ns)*k rows.  Empty-text docs tokenize
    to [''] and are excluded by the gram <> '' filter, identically in
    the DuckDB oracle.
    """
    from pyspark.sql import Window

    from pagerank_spark.pipeline.curation import _grams

    parts = []
    for n in ns:
        parts.append(
            docs.select(
                "doc_id",
                F.explode(_grams(_tokens(F.col("text")), int(n)))
                .alias("gram"))
            .where(F.col("gram") != "")
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("occurrences"),
                 F.countDistinct("doc_id").alias("doc_freq"))
            .orderBy(F.desc("occurrences"), F.asc("gram"))
            .limit(k)
            .select(F.lit(int(n)).cast("int").alias("n"), "gram",
                    "occurrences", "doc_freq"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("n").orderBy(
        F.desc("occurrences"), F.asc("gram"))
    return out.withColumn("rank", F.row_number().over(w))
