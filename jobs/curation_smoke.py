#!/usr/bin/env python
"""Curation/filtering-family scale smoke — mirrors
BENCH/PIPELINE_SMOKE.md's dedup smoke for the round-5 operators
(pipeline/curation.py, pipeline/filtering.py).

Synthesizes the same multi-GB seeded corpus DISTRIBUTED
(``datagen.documents_corpus`` — 63 tokens/doc, one byte-identical
boilerplate group every ``dup_stride`` docs) and runs the five new
operators at local[N], asserting the structural invariants that prove
each plan is doing distributed work, not getting lucky:

- ``chunk_documents``: exactly 2 windows per 63-token doc (starts 1
  and 25 at width 32 / stride 24) — 2N rows, zero shuffle;
- ``repetition_stats``: one row per doc; the boilerplate docs (all
  tokens distinct) score dup_word_frac == 0 while carrying the same
  top-gram mass as each other;
- ``stratified_sample``: per-stratum keep fraction within 1% of the
  configured rate (60-bit deviate, exact integer thresholds);
- ``redact_pii``: row-preserving; the synthetic corpus carries no
  PII so total has_pii hits must be 0 (an over-matching pattern
  would light up here);
- ``contamination_matches``: a ~1.5k-doc benchmark slice must flag
  EVERY boilerplate doc (they share all grams with the slice's
  boilerplate members) through a broadcast join — the plan is
  asserted CartesianProduct-free.

Prints one JSON line; exits non-zero on any failed invariant.

    python jobs/curation_smoke.py --n-docs 6000000 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DUP_STRIDE = 100
BENCH_MOD = 4001  # benchmark slice: doc_id % BENCH_MOD == 3 (~N/4001 docs)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=6_000_000)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from pagerank_spark.session import get_spark
    from pagerank_spark import datagen
    from pagerank_spark.pipeline import curation, filtering

    spark = get_spark(
        app_name="curation_smoke",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 4, 64),
        extra_conf={"spark.driver.memory": "24g"},
    )

    docs = datagen.documents_corpus(
        spark, args.n_docs, dup_stride=DUP_STRIDE,
        partitions=args.cpus * 4).persist()
    n = docs.count()

    timings: dict[str, float] = {}
    failures: list[str] = []

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    def check(cond, msg):
        if not cond:
            failures.append(msg)

    # -- chunking: zero-shuffle, exact row arithmetic (agg forces the
    # slice+join columns; count() alone would prune them) -----------------
    ch = timed("chunk_documents", lambda: curation.chunk_documents(
        docs, chunk_tokens=32, stride=24).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("chunk_text")).alias("bytes")).first())
    check(ch["rows"] == 2 * n, f"chunks {ch['rows']} != 2N {2 * n}")
    check(ch["bytes"] > 0, "chunk texts empty")

    # -- repetition signals: the heavy generator-explode double-agg -------
    rep = curation.repetition_stats(docs)
    rep_row = timed("repetition_stats", lambda: rep.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(
            (F.col("doc_id") % DUP_STRIDE == 0)
            & (F.col("dup_word_frac") != 0.0), 1).otherwise(0)
        ).alias("bad_boiler"),
        F.max("top_bigram_frac").alias("max_bigram")).first())
    check(rep_row["rows"] == n, f"repetition rows {rep_row['rows']} != {n}")
    check(rep_row["bad_boiler"] == 0,
          f"{rep_row['bad_boiler']} boilerplate docs with dup words")
    check(rep_row["max_bigram"] <= 1.0, "bigram frac > 1")

    # -- stratified sample: exact-integer determinism at scale ------------
    strat = docs.withColumn(
        "lang", F.concat(F.lit("l"), (F.col("doc_id") % 4).cast("string")))
    rates = {"l0": 0.5, "l1": 0.25, "l2": 0.1}
    stats = timed("sample_stats", lambda: {
        r["stratum"]: r for r in curation.sample_stats(
            strat, rates, seed=7, default_rate=0.02).collect()})
    for s, want in list(rates.items()) + [("l3", 0.02)]:
        got = stats[s]["kept_frac"]
        check(abs(got - want) < 0.01, f"{s} kept_frac {got} vs {want}")

    # -- PII: row-preserving redaction, zero hits on the clean corpus -----
    # agg over text length FORCES the regex projection (a bare count()
    # prunes the text column and measures nothing)
    red = timed("redact_pii", lambda: filtering.redact_pii(docs).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("text")).alias("bytes")).first())
    check(red["rows"] == n, f"redacted rows {red['rows']} != {n}")
    check(red["bytes"] > 0, "redacted corpus is empty")
    hits = timed("pii_stats", lambda: filtering.pii_stats(docs).agg(
        F.sum(F.col("has_pii").cast("int"))).first()[0])
    check(hits == 0, f"{hits} spurious PII hits on the clean corpus")

    # -- decontamination: broadcast gram join flags ALL boilerplate -------
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 3).select(
        F.col("doc_id").alias("bench_id"), "text")
    n_bench = bench.count()
    flags = filtering.contamination_matches(docs, bench, n=8)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    check("CartesianProduct" not in plan, "contamination plan is cartesian")
    check("BroadcastHashJoin" in plan, "contamination join not broadcast")
    n_boiler = n // DUP_STRIDE  # doc_ids 0, 100, ... (0 % 100 == 0)
    flagged_boiler = timed("contamination_matches", lambda: flags.where(
        F.col("doc_id") % DUP_STRIDE == 0).count())
    check(flagged_boiler == n_boiler,
          f"flagged boilerplate {flagged_boiler} != {n_boiler}")

    # -- dataset_split: zero-shuffle projection, fractions land ----------
    splits = curation.dataset_split(docs)
    plan = splits._jdf.queryExecution().executedPlan().toString()
    check("Exchange" not in plan, "dataset_split plan shuffles")
    split_counts = timed("dataset_split", lambda: {
        r["split"]: r["c"]
        for r in splits.groupBy("split").agg(
            F.count(F.lit(1)).alias("c")).collect()})
    for nm, frac in (("train", 0.9), ("val", 0.05), ("test", 0.05)):
        got = split_counts.get(nm, 0) / n
        check(abs(got - frac) < 0.005,
              f"split {nm}: {got:.4f} vs {frac}")

    # -- pack_bins: every closed bin reaches max_tokens ------------------
    PACK_MAX = 1024
    packed = curation.pack_bins(docs, max_tokens=PACK_MAX, n_buckets=64)
    bins = packed.groupBy("bucket", "bin_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.count(F.lit(1)).alias("docs"))
    last = packed.groupBy("bucket").agg(F.max("bin_id").alias("bin_id"))
    # DIV-packing bound: a non-final bin's token sum sits within one
    # document of the target — >= max_tokens - (longest doc - 1).
    max_doc = packed.agg(F.max("n_tokens")).first()[0]
    floor_tok = PACK_MAX - (max_doc - 1)
    short = timed("pack_bins", lambda: bins.join(
        last, ["bucket", "bin_id"], "left_anti")
        .where(F.col("tok") < floor_tok).count())
    check(short == 0,
          f"{short} non-final bins under the {floor_tok}-token floor")
    n_packed = packed.count()
    check(n_packed == n, f"pack_bins dropped rows: {n_packed} != {n}")

    # -- embedding_pca: 3 power steps over n synthetic 64-dim vectors ----
    from pagerank_spark.pipeline.pca import pca_top_direction
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((F.xxhash64(F.col("id"), j) % 1000) / 1000.0)
            .cast("float")).alias("embedding"))
    pca_v = timed("embedding_pca", lambda: {
        r["dim"]: r["loading"]
        for r in pca_top_direction(emb, iterations=3).collect()})
    nrm2 = sum(v * v for v in pca_v.values())
    check(abs(nrm2 - 1.0) < 1e-6, f"PCA direction not unit: {nrm2}")
    check(len(pca_v) == 64, f"PCA dims {len(pca_v)} != 64")

    summary = {
        "metric": "curation_smoke",
        "n_docs": n,
        "n_bench": n_bench,
        "cpus": args.cpus,
        "timings_sec": timings,
        "failures": failures,
        "ok": not failures,
    }
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
