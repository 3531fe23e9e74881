"""Safety/compliance filters for training-data curation: PII
detection + redaction, and benchmark decontamination.

The reference engine (``/root/reference/pagerank/src/lib/pagerank.cpp``)
has no document pipeline at all; these extend the mandated
training-data operators (dedup, quality, curation) with the two
filters every 100 TB pretraining corpus runs before packing:

- **PII**: count and mask emails / phone numbers / IPv4 addresses.
  Pure JVM ``regexp_*`` expressions — zero shuffle, whole-stage
  codegen, trivially partition-parallel.  The patterns are written in
  the common Java-regex ∩ RE2 subset (no backrefs, no lookaround) so
  the DuckDB oracle evaluates the *identical* pattern strings.
- **Decontamination**: flag training docs that share any ``n``-gram
  with a held-out benchmark set (the Brown et al. 2020 GPT-3 App. C
  procedure: 13-gram collision ⇒ contaminated; ``n`` configurable).
  Shapewise this is dedup's shingle join: explode docs and benchmark
  to distinct n-grams, inner-join on the gram, count per doc.  At
  scale the benchmark side is tiny (thousands of eval documents ⇒
  ~1e6 grams) so Spark broadcasts it and the training side never
  shuffles — the plan is a broadcast semi/inner join under the scan.

Scale notes: both operators are single-pass over the corpus.  The
contamination gram join keys on the gram string; benchmark grams are
near-unique so there is no skew side to salt.  ``decontaminate``
uses a left-anti join (broadcast for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java-regex ∩ RE2 portable patterns (same string runs in DuckDB).
PII_PATTERNS = {
    # local@domain.tld — conservative, no quoted local parts
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 1-555-010-0100 / (555) 010-0100 / 555.010.0100 — 3-3-4 digit
    # groups with separators, optional +cc prefix
    "phone": (r"(\+?[0-9]{1,3}[-. ]{1,2})?"
              r"\(?[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}"),
    # dotted-quad IPv4 (octet range not enforced; collection-side rule)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
_REDACT_ORDER = ("email", "phone", "ipv4")  # fixed pass order


def pii_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, has_pii) — per-document PII
    hit counts.  One projection, no shuffle."""
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("bigint").alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    out = docs.select("doc_id", *counts)
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0))
    return out.withColumn("has_pii", (total > 0).cast("boolean"))


def redact_pii(docs: DataFrame, token: str = "<PII>") -> DataFrame:
    """(doc_id, text) with every PII match replaced by ``token``,
    applying the patterns in the fixed ``_REDACT_ORDER`` (email
    before phone before ipv4, so an address inside an email-like
    string is consumed by the earlier pass — deterministic on every
    engine)."""
    col = F.col("text")
    for kind in _REDACT_ORDER:
        col = F.regexp_replace(col, PII_PATTERNS[kind], token)
    return docs.select("doc_id", col.alias("text"))


def _gram_set(docs: DataFrame, n: int, id_col: str = "doc_id"):
    """(id_col, gram): DISTINCT whitespace n-grams per document."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    cnt = F.size(toks)
    grams = F.when(
        cnt >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), cnt - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "))),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(grams).alias("gram"))


def contamination_matches(docs: DataFrame, benchmark: DataFrame,
                          n: int = 8) -> DataFrame:
    """(doc_id, n_hit_grams, n_bench_docs) — training docs sharing at
    least one ``n``-gram with any benchmark doc.

    ``benchmark`` needs (bench_id, text).  The benchmark gram set is
    broadcast (eval suites are tiny next to the corpus), so the
    training side is a single scan + broadcast hash join: no shuffle
    of corpus data at any scale.
    """
    doc_grams = _gram_set(docs, n)
    bench_grams = F.broadcast(
        _gram_set(benchmark, n, id_col="bench_id").distinct())
    hits = doc_grams.join(bench_grams, "gram")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gram").cast("bigint").alias("n_hit_grams"),
        F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8) -> DataFrame:
    """Docs with NO ``n``-gram overlap with the benchmark set (the
    keep-side of ``contamination_matches``) — broadcast left-anti
    join on the flagged id set."""
    flagged = contamination_matches(docs, benchmark, n).select("doc_id")
    return docs.join(F.broadcast(flagged), "doc_id", "left_anti")
