"""Unit tests for pipeline/filtering.py: PII detection/redaction and
benchmark decontamination.  Cross-engine parity is covered by
test_entry_contract.py (pii_stats / pii_redacted /
contamination_flags / docs_decontaminated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.pipeline import filtering


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ------------------------------------------------------------------ PII

def test_pii_stats_counts(spark):
    rows = _docs(spark, [
        (1, "mail a@b.io and c.d+x@e-f.org please"),
        (2, "call 1-555-010-0100 or (555) 010-0100"),
        (3, "hosts 10.0.0.1 and 192.168.1.255"),
        (4, "clean text with no identifiers"),
        (5, "mixed a@b.io at 10.0.0.1"),
    ]).transform(filtering.pii_stats).collect()
    by = {r.doc_id: r for r in rows}
    assert (by[1].n_email, by[1].n_phone, by[1].n_ipv4) == (2, 0, 0)
    assert by[2].n_phone == 2  # both the cc'd and the (area) format
    assert by[3].n_ipv4 == 2
    assert by[4].has_pii is False
    assert (by[5].n_email, by[5].n_ipv4, by[5].has_pii) == (1, 1, True)


def test_redact_pii_masks_everything(spark):
    out = filtering.redact_pii(_docs(spark, [
        (1, "reach a@b.io or 1-555-010-0100 at 10.0.0.1 ok"),
    ])).collect()[0]
    assert out.text == "reach <PII> or <PII> at <PII> ok"
    # redacted text carries no residual hits
    re_stats = filtering.pii_stats(filtering.redact_pii(_docs(spark, [
        (1, "reach a@b.io or 1-555-010-0100 at 10.0.0.1 ok"),
    ]))).collect()[0]
    assert re_stats.has_pii is False


def test_redact_order_email_wins_over_ipv4(spark):
    # the dotted-quad inside an email-shaped string is consumed by the
    # earlier email pass — one mask, not a partial double-mask
    out = filtering.redact_pii(
        _docs(spark, [(1, "x@1.2.3.4.net end")])).collect()[0]
    assert out.text == "<PII> end"


# -------------------------------------------------------- decontamination

def _bench(spark, rows):
    return spark.createDataFrame(rows, "bench_id BIGINT, text STRING")


def test_contamination_matches_flags_shared_ngram(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    docs = _docs(spark, [
        (1, "prefix " + shared + " suffix"),
        (2, "totally different text " + " ".join("x" + str(i)
                                                 for i in range(10))),
        (3, "short doc"),  # < n tokens: no grams, never flagged
    ])
    bench = _bench(spark, [(100, shared + " tail tokens here")])
    got = {r.doc_id: r for r in
           filtering.contamination_matches(docs, bench, n=8).collect()}
    assert set(got) == {1}
    assert got[1].n_bench_docs == 1
    assert got[1].n_hit_grams == 1  # only the aligned 8-gram collides


def test_decontaminate_keeps_complement(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    docs = _docs(spark, [
        (1, "prefix " + shared),
        (2, " ".join("y" + str(i) for i in range(12))),
    ])
    bench = _bench(spark, [(100, shared)])
    kept = [r.doc_id for r in
            filtering.decontaminate(docs, bench, n=8).collect()]
    assert kept == [2]


def test_contamination_join_is_broadcast(spark):
    docs = _docs(spark, [(i, f"doc {i} " + " ".join(
        f"t{i}_{j}" for j in range(10))) for i in range(20)])
    bench = _bench(spark, [(1, "a b c d e f g h")])
    out = filtering.contamination_matches(docs, bench, n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
