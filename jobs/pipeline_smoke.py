#!/usr/bin/env python
"""Dedup-family scale smoke (VERDICT r2 item 6 — mirrors
BENCH/SCALE_SMOKE.md for the training-data pipeline).

Synthesizes a multi-GB ``documents`` corpus DISTRIBUTED
(``datagen.documents_corpus``) with two deliberate degeneracies —
one ubiquitous shingle present in every doc and one byte-identical
boilerplate group of N/100 docs (which is simultaneously a degenerate
exact-dup group and a degenerate MinHash/LSH bucket) — then runs the
real spark-submit entry point (``jobs/pipeline_job.py``) stages
exact+minhash+jaccard at local[N] and PROVES the scale caps bind:

- ``max_bucket``: no boilerplate×boilerplate pair may appear in
  minhash_pairs (an unbound bucket would emit (N/100)² of them);
- ``max_df``: no jaccard pair may owe its intersection to the
  ubiquitous shingle (unbound, that join alone is N² candidates);
- the degenerate group must still be FULLY accounted for by the
  scale-safe exact path (exact_dup_stats: one constant-size row with
  the exact member count).

Prints one JSON line and exits non-zero if any cap failed to bind.

    python jobs/pipeline_smoke.py --n-docs 6000000 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DUP_STRIDE = 100


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=6_000_000)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--workdir", default="/tmp/pipeline_smoke")
    p.add_argument("--max-df", type=int, default=1000)
    p.add_argument("--max-bucket", type=int, default=2000)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    docs_path = os.path.join(args.workdir, "documents.parquet")
    out_dir = os.path.join(args.workdir, "out")
    summary_path = os.path.join(args.workdir, "summary.json")
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)

    # -- 1. synthesize the corpus (own session, stopped before the job
    # subprocess brings up its JVM) --------------------------------------
    from pagerank_spark.session import get_spark
    from pagerank_spark import datagen
    from pyspark.sql import functions as F

    spark = get_spark(app_name="pipeline_smoke_datagen",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 16))
    t0 = time.monotonic()
    docs = datagen.documents_corpus(
        spark, args.n_docs, dup_stride=DUP_STRIDE,
        partitions=args.cpus * 4)
    docs.write.mode("overwrite").parquet(docs_path)
    text_bytes = (spark.read.parquet(docs_path)
                  .agg(F.sum(F.length("text"))).collect()[0][0])
    datagen_sec = round(time.monotonic() - t0, 3)
    spark.stop()
    parquet_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(docs_path) for f in fs)

    # -- 2. the real pipeline entry point --------------------------------
    t0 = time.monotonic()
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "pipeline_job.py"),
         "--docs", docs_path, "--out-dir", out_dir,
         "--stages", "exact,minhash,jaccard",
         "--master", f"local[{args.cpus}]",
         "--max-df", str(args.max_df),
         "--max-bucket", str(args.max_bucket),
         "--jaccard-threshold", "0.8",
         "--out", summary_path],
        check=True,
        env={**os.environ,
             "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "48g")})
    job_sec = round(time.monotonic() - t0, 3)
    with open(summary_path) as f:
        job = json.load(f)

    # -- 3. cap-binding evidence (DuckDB over the stage outputs) ---------
    import duckdb

    con = duckdb.connect()
    q = lambda sql: con.execute(sql).fetchone()[0]  # noqa: E731
    o = lambda name: os.path.join(out_dir, name, "*.parquet")  # noqa: E731

    n_boiler = (args.n_docs + DUP_STRIDE - 1) // DUP_STRIDE
    # exact path: the degenerate group is fully counted, constant-size row
    boiler_group = q(f"SELECT max(n_docs) FROM '{o('exact_dup_stats')}'")
    survivors = q(f"SELECT count(*) FROM '{o('docs_deduped')}'")
    # max_bucket bound: zero boilerplate×boilerplate candidate pairs
    boiler_pairs = q(f"""
        SELECT count(*) FROM '{o('minhash_pairs')}'
        WHERE doc_a % {DUP_STRIDE} = 0 AND doc_b % {DUP_STRIDE} = 0""")
    minhash_rows = q(f"SELECT count(*) FROM '{o('minhash_pairs')}'")
    # max_df bound: no jaccard pair from the ubiquitous shingle either
    jaccard_rows = q(f"SELECT count(*) FROM '{o('jaccard_pairs')}'")
    boiler_jaccard = q(f"""
        SELECT count(*) FROM '{o('jaccard_pairs')}'
        WHERE doc_a % {DUP_STRIDE} = 0 AND doc_b % {DUP_STRIDE} = 0""")

    uncapped_bucket_pairs = n_boiler * (n_boiler - 1) // 2
    checks = {
        "exact_group_counted": boiler_group == n_boiler,
        "exact_survivors": survivors == args.n_docs - n_boiler + 1,
        "max_bucket_bound": boiler_pairs == 0,
        "max_df_bound": boiler_jaccard == 0,
        "no_pair_explosion": (minhash_rows + jaccard_rows)
        < 100 * args.n_docs // DUP_STRIDE,
    }
    result = {
        "metric": "pipeline_scale_smoke",
        "n_docs": args.n_docs,
        "text_gb": round(text_bytes / 2**30, 2),
        "parquet_gb": round(parquet_bytes / 2**30, 2),
        "datagen_sec": datagen_sec,
        "job_sec": job_sec,
        "stages": job["stages"],
        "rows": job["rows"],
        "degenerate_group_size": boiler_group,
        "uncapped_bucket_pairs_avoided": uncapped_bucket_pairs,
        "minhash_pairs": minhash_rows,
        "jaccard_pairs": jaccard_rows,
        "checks": checks,
        "caps": {"max_df": args.max_df, "max_bucket": args.max_bucket},
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    if not all(checks.values()):
        raise SystemExit(f"cap-binding checks FAILED: {checks}")


if __name__ == "__main__":
    main()
