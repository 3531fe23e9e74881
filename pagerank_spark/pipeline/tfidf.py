"""TF-IDF document vectors + sparse top-k cosine similarity.

Ranked-retrieval face of the dedup family (reference ships no text
pipeline at all; mandated beyond it like the rest of ``pipeline/``):
the MinHash/Jaccard/SimHash operators answer "near-duplicate?", this
one answers "which documents are most SIMILAR" with a real relevance
weighting.

Weighting is the standard smooth tf-idf (sklearn convention):

    idf(t)  = ln((1 + N) / (1 + df(t))) + 1
    w(d, t) = tf(d, t) * idf(t),   then L2-normalized per document

so pairwise cosine is a plain sparse inner product: self-join the
(doc, term, w) table on term and sum w_a * w_b per pair.

Scale: the self-join is quadratic PER TERM in the term's document
frequency, so high-df terms (stop words) dominate cost while carrying
the LEAST signal (lowest idf) — ``max_df`` drops them from the
vocabulary before weighting, the same df-cap strategy as
``dedup.ngram_jaccard_pairs`` (and classic prefix-filter reasoning:
PPJoin, Xiao et al., WWW'08).  Everything is JVM expressions — one
explode, three hash aggregations, one equi-join; no Python.

Determinism: per-term normalized weights are quantized to ``W_ROUND``
digits BEFORE the pairwise sum (idf goes through ``ln`` whose libm
differs by ~1 ulp between the JVM and DuckDB; quantizing the inputs
collapses both engines onto identical doubles, same contract as
``similarity.PROJ_ROUND``), then similarities are rounded (6 digits)
BEFORE ranking with a doc-id tie-break, the same contract as
``similarity.cosine_topk``, so the DuckDB oracle reproduces the exact
row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pagerank_spark.pipeline.textstats import _tokens

SIM_ROUND = 6
W_ROUND = 12   # per-term weight quantization before any cross-doc sum


def tfidf_terms(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """(doc_id, term, w) — L2-normalized smooth tf-idf weights over
    the whitespace tokenization shared with ``textstats`` (and its
    DuckDB oracle).  ``max_df`` drops terms appearing in more than
    that many documents (stop-word pruning + join-cost cap)."""
    n_docs = docs.count()
    toks = (
        docs.select("doc_id", F.explode(_tokens(F.col("text")))
                    .alias("term"))
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        df = df.where(F.col("df") <= max_df)
    idf = df.select(
        "term",
        (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0).alias("idf"))
    w_raw = (
        tf.join(idf, "term")     # inner join applies the max_df prune
        .select("doc_id", "term", (F.col("tf") * F.col("idf")).alias("w"))
    )
    norm = w_raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return (
        w_raw.join(norm, "doc_id")
        .select("doc_id", "term",
                F.round(F.col("w") / F.col("nrm"), W_ROUND).alias("w"))
    )


def tfidf_topk(docs: DataFrame, k: int = 5,
               max_df: int | None = None) -> DataFrame:
    """(doc_id, neighbor_id, sim, rank) — for every document, its k
    most tf-idf-cosine-similar OTHER documents (rank 1..k, ties broken
    by neighbor_id; documents sharing no surviving term have sim 0 and
    are absent)."""
    t = tfidf_terms(docs, max_df=max_df).persist()
    try:
        a = t.select(F.col("doc_id").alias("a"), "term",
                     F.col("w").alias("wa"))
        b = t.select(F.col("doc_id").alias("b"), "term",
                     F.col("w").alias("wb"))
        # one direction, then mirror: halves the join output
        pairs = (
            a.join(b, "term")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.round(F.sum(F.col("wa") * F.col("wb")), SIM_ROUND)
                 .alias("sim"))
        )
        both = pairs.select(F.col("a").alias("doc_id"),
                            F.col("b").alias("neighbor_id"), "sim") \
            .unionByName(pairs.select(F.col("b").alias("doc_id"),
                                      F.col("a").alias("neighbor_id"),
                                      "sim"))
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        out = (
            both.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        # materialize before releasing the term cache
        return out.localCheckpoint(eager=True)
    finally:
        t.unpersist()
