"""FM vocabulary sketches: merge law, estimator sanity, determinism
(SURVEY.md §5 strategy); the sf0.01 cross-engine parity runs in
tests/test_entry_contract.py."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pagerank_spark.pipeline.sketches import (
    N_SKETCHES,
    approx_distinct_ngrams,
    finalize_sketches,
    ngram_fm_sketches,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING")


def _corpus(seed, n_docs, vocab):
    rng = random.Random(seed)
    return [(i, "en", " ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(n_docs)]


def test_sketch_merge_law(spark):
    vocab = [f"w{i}" for i in range(200)]
    rows = _corpus(1, 60, vocab)
    whole = ngram_fm_sketches(_docs(spark, rows)).collect()[0]
    a = ngram_fm_sketches(_docs(spark, rows[:30]))
    b = ngram_fm_sketches(_docs(spark, rows[30:]))
    merged = (
        a.unionByName(b).groupBy("grp")
        .agg(*[F.bit_or(f"s{k}").alias(f"s{k}")
               for k in range(N_SKETCHES)])
        .collect()[0]
    )
    for k in range(N_SKETCHES):
        assert whole[f"s{k}"] == merged[f"s{k}"]
    # finalize over the merged table equals the whole-corpus estimate
    w = finalize_sketches(ngram_fm_sketches(_docs(spark, rows))).collect()
    m = finalize_sketches(
        a.unionByName(b).groupBy("grp").agg(
            *[F.bit_or(f"s{k}").alias(f"s{k}")
              for k in range(N_SKETCHES)])).collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, m))


def test_sketch_estimate_in_range(spark):
    # ~2000 distinct bigrams; FM with K=8 has ~39% stderr — assert a
    # generous factor-2.5 band, which a broken sketch cannot hit.
    vocab = [f"w{i}" for i in range(80)]
    rows = _corpus(7, 400, vocab)
    out = approx_distinct_ngrams(_docs(spark, rows)).collect()
    assert len(out) == 1
    true_distinct = len({
        f"{a} {b}"
        for _, _, t in rows
        for a, b in zip(t.split(), t.split()[1:])})
    est = out[0]["distinct_est"]
    assert true_distinct / 2.5 <= est <= true_distinct * 2.5


def test_sketch_deterministic_and_order_blind(spark):
    vocab = [f"w{i}" for i in range(50)]
    rows = _corpus(3, 40, vocab)
    a = approx_distinct_ngrams(_docs(spark, rows)).collect()
    b = approx_distinct_ngrams(
        _docs(spark, list(reversed(rows)))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sketch_groups_independent(spark):
    rows = [(0, "en", "a b c d"), (1, "de", "x y z w q r s t u v")]
    out = {r["grp"]: r["distinct_est"]
           for r in approx_distinct_ngrams(_docs(spark, rows)).collect()}
    assert set(out) == {"en", "de"}
    assert out["de"] > out["en"] * 0.5  # more bigrams -> not collapsed


def test_sketch_unigram_face(spark):
    rows = [(0, "en", "alpha beta alpha")]
    out = approx_distinct_ngrams(_docs(spark, rows), n=1).collect()
    assert len(out) == 1 and out[0]["sum_rho"] >= 0


# ------------------------------------------------------------ count-min

def test_cms_never_undercounts_and_exact_when_sparse(spark):
    from pagerank_spark.pipeline.sketches import (
        cms_estimate, count_min_sketch)

    rows = [(0, "en", "apple banana apple"), (1, "en", "banana cherry")]
    docs = _docs(spark, rows)
    sk = count_min_sketch(docs, n=1)
    probes = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("durian",)],
        "gram STRING")
    est = {r["gram"]: r["cms_est"]
           for r in cms_estimate(sk, probes).collect()}
    exact = {"apple": 2, "banana": 2, "cherry": 1, "durian": 0}
    for g, c in exact.items():
        assert est[g] >= c
    # 3 distinct grams in a 4x1024 sketch: no collisions, so exact
    assert est["apple"] == 2 and est["banana"] == 2
    assert est["cherry"] == 1 and est["durian"] == 0


def test_cms_shard_merge_by_cell_addition(spark):
    from pagerank_spark.pipeline.sketches import (
        cms_estimate, count_min_sketch)

    vocab = [f"w{i}" for i in range(30)]
    rows = _corpus(9, 40, vocab)
    whole = count_min_sketch(_docs(spark, rows), n=1)
    a = count_min_sketch(_docs(spark, rows[:20]), n=1)
    b = count_min_sketch(_docs(spark, rows[20:]), n=1)
    merged = (a.unionByName(b).groupBy("k", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    probes = spark.createDataFrame([(w,) for w in vocab], "gram STRING")
    e1 = sorted(map(tuple, cms_estimate(whole, probes).collect()))
    e2 = sorted(map(tuple, cms_estimate(merged, probes).collect()))
    assert e1 == e2


# ------------------------------------------------------- histogram quantiles

def test_length_histogram_quantile_error_bound(spark):
    from pagerank_spark.pipeline.sketches import approx_length_quantiles

    rng = random.Random(11)
    lens = [rng.randrange(1, 2000) for _ in range(300)]
    rows = [(i, "en", "x" * ln) for i, ln in enumerate(lens)]
    width = 64
    got = {r["q_permille"]: r["quantile_est"]
           for r in approx_length_quantiles(
               _docs(spark, rows), bucket_width=width).collect()}
    s = sorted(lens)
    import math

    for q in (500, 900, 990):
        exact = s[math.ceil(q / 1000 * len(s)) - 1]  # rank-q order stat
        est = got[q]
        assert est >= exact, (q, est, exact)      # upper-edge estimate
        assert est - exact < width, (q, est, exact)  # one-bucket bound


def test_length_histogram_shard_merge(spark):
    from pagerank_spark.pipeline.sketches import (
        histogram_quantiles, length_histogram)

    rng = random.Random(13)
    rows = [(i, rng.choice(["en", "fr"]), "y" * rng.randrange(1, 500))
            for i in range(200)]
    whole = length_histogram(_docs(spark, rows))
    a = length_histogram(_docs(spark, rows[:100]))
    b = length_histogram(_docs(spark, rows[100:]))
    merged = (a.unionByName(b).groupBy("grp", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    q1 = sorted(map(tuple, histogram_quantiles(whole).collect()))
    q2 = sorted(map(tuple, histogram_quantiles(merged).collect()))
    assert q1 == q2 and len(q1) == 6  # 2 langs x 3 quantiles


def test_length_histogram_rejects_bad_width(spark):
    import pytest

    from pagerank_spark.pipeline.sketches import length_histogram

    with pytest.raises(ValueError):
        length_histogram(_docs(spark, [(0, "en", "abc")]), bucket_width=0)
