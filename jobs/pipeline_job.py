#!/usr/bin/env python
"""Training-data pipeline job — the spark-submit entry point for the
dedup / text-analysis / similarity stages over a documents table.

    spark-submit --py-files engine.zip jobs/pipeline_job.py \
        --docs /path/to/documents.parquet --out-dir /path/out \
        --stages exact,minhash,simhash,textstats [--embeddings emb.parquet]

Each requested stage writes one parquet output under --out-dir and
appends a timing row to the emitted JSON summary.  Stage set:

    exact      exact_duplicate_stats + the keep-first dedup filter
    minhash    MinHash/LSH candidate pairs (df-capped, bucket-capped)
    jaccard    exact shingle-jaccard over shared-shingle candidates
    simhash    simhash near-pairs (fast xxhash64 family)
    textstats  token counts, quality, language id, fingerprints
    ann        LSH top-k over --embeddings (Arrow-vectorized buckets)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_STAGES = ("exact", "minhash", "jaccard", "simhash", "textstats",
              "lmscore", "ann", "cluster")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True,
                   help="parquet documents table (doc_id, text)")
    p.add_argument("--embeddings", default=None,
                   help="parquet embeddings table (vec_id, embedding) "
                        "for the ann stage")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--stages", default="exact,minhash,textstats")
    p.add_argument("--master", default=None)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--max-df", type=int, default=10_000,
                   help="frequent-shingle cap for the jaccard join")
    p.add_argument("--max-bucket", type=int, default=10_000,
                   help="degenerate-LSH-bucket cap for minhash pairing")
    p.add_argument("--ann-max-bucket", type=int, default=10_000,
                   help="degenerate-bucket cap for the ann stage's LSH "
                        "index (every embedding is a query here, so an "
                        "uncapped dense bucket goes quadratic)")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--n-clusters", type=int, default=8,
                   help="Lloyd cells for the cluster stage")
    p.add_argument("--out", default=None, help="write summary JSON here")
    args = p.parse_args()
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(ALL_STAGES)
    if unknown:
        raise SystemExit(f"unknown stages: {sorted(unknown)}")

    from pyspark.sql import functions as F

    from pagerank_spark.session import get_spark
    from pagerank_spark.pipeline import dedup, similarity, textstats

    spark = get_spark(app_name="pipeline_job", master=args.master)
    docs = spark.read.parquet(args.docs).select("doc_id", "text").persist()
    docs.count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def run(name: str, df):
        t0 = time.monotonic()
        out_path = os.path.join(args.out_dir, name)
        df.write.mode("overwrite").parquet(out_path)
        rows[name] = spark.read.parquet(out_path).count()
        timings[name] = round(time.monotonic() - t0, 3)

    if "exact" in stages:
        run("exact_dup_stats", dedup.exact_duplicate_stats(docs))
        run("docs_deduped", dedup.drop_exact_duplicates(docs))
    if "minhash" in stages:
        run("minhash_pairs", dedup.minhash_candidate_pairs(
            docs, max_bucket=args.max_bucket))
    if "jaccard" in stages:
        run("jaccard_pairs", dedup.ngram_jaccard_pairs(
            docs, threshold=args.jaccard_threshold, max_df=args.max_df))
    if "simhash" in stages:
        run("simhash_pairs", dedup.simhash_near_pairs(docs))
    if "textstats" in stages:
        run("token_stats", textstats.token_counts(docs))
        run("quality", textstats.quality_scores(docs))
        run("language", textstats.language_id(docs))
        run("fingerprints", textstats.fingerprints(docs))
    if "lmscore" in stages:
        run("unigram_logprob", textstats.unigram_logprob(docs))
    emb = None
    if "ann" in stages or "cluster" in stages:
        if not args.embeddings:
            raise SystemExit("--embeddings required for the ann/cluster "
                             "stages")
        emb = spark.read.parquet(args.embeddings).select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"))
    if "ann" in stages:
        queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
        run("ann_topk", similarity.lsh_topk(
            emb, queries, k=args.topk, vectorized=True,
            max_bucket=args.ann_max_bucket))
    if "cluster" in stages:
        run("embedding_clusters", similarity.ivf_assignments(
            emb, n_centroids=args.n_clusters))

    summary = {"metric": "pipeline_job", "stages": timings, "rows": rows,
               "total_sec": round(sum(timings.values()), 3)}
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
