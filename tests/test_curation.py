"""Unit tests for pipeline/curation.py: Gopher-style repetition
signals, fixed-window token chunking, deterministic stratified
sampling.  Hand-computed fixtures — the cross-engine face is covered
by test_entry_contract.py (doc_repetition / doc_chunks /
doc_sample_stats / docs_curated)."""

from __future__ import annotations

import pytest

from pagerank_spark.pipeline import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


# ------------------------------------------------------------ repetition

def test_repetition_stats_hand_computed(spark):
    # "a b a b a" : 5 tokens, 2 distinct -> dup_word 0.6;
    # bigrams: "a b" x2, "b a" x2 -> top 2/4 = 0.5;
    # trigrams: "a b a" x2, "b a b" x1 -> top 2/3.
    rows = _docs(spark, [(1, "a b a b a")]).transform(
        curation.repetition_stats).collect()
    r = rows[0]
    assert r.n_tokens == 5
    assert r.dup_word_frac == pytest.approx(0.6)
    assert r.dup_line_frac == 0.0  # single line
    assert r.top_bigram_frac == pytest.approx(0.5)
    assert r.top_trigram_frac == pytest.approx(round(2 / 3, 6))


def test_repetition_stats_duplicate_lines(spark):
    text = "x y\nx y\nz w"  # 3 lines, 2 distinct -> dup_line 1/3
    r = _docs(spark, [(1, text)]).transform(
        curation.repetition_stats).collect()[0]
    assert r.dup_line_frac == pytest.approx(round(1 - 2 / 3, 6))


def test_repetition_stats_short_doc_zero_grams(spark):
    # 1 token: no bigrams/trigrams -> both fracs 0, no null leakage
    r = _docs(spark, [(1, "solo")]).transform(
        curation.repetition_stats).collect()[0]
    assert r.n_tokens == 1
    assert r.top_bigram_frac == 0.0
    assert r.top_trigram_frac == 0.0


def test_repetition_arrow_equals_sql_face(spark):
    # the Arrow default and the pure-JVM explode face must agree
    # bit-for-bit, including the HALF_UP rounding at 6 digits
    rows = [(i, f"tok{i % 7} " * (i % 5 + 1) + f"x{i} y{i}\nline{i % 3}")
            for i in range(60)] + [(100, "solo"), (101, "a b a b a")]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, curation.repetition_stats(
        docs, impl="arrow").collect()))
    s = sorted(map(tuple, curation.repetition_stats(
        docs, impl="sql").collect()))
    assert a == s


def test_repetition_rejects_unknown_impl(spark):
    with pytest.raises(ValueError):
        curation.repetition_stats(_docs(spark, [(1, "a")]), impl="nope")


# ------------------------------------------------------------- chunking

def test_chunk_documents_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(100))
    out = curation.chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=32, stride=24).collect()
    # starts: 1, 25, 49, 69? no: while start <= 100-32+1=69 -> 1,25,49
    # then next would be 73 > 69, so 3 full windows... but 49+31=80 <100:
    # sequence(1, greatest(69,1), 24) = [1, 25, 49] -> last covers 49..80.
    # Coverage property: union of [start, start+n_tok) must reach token
    # index max(start)+n_tok and start at 1 with no gaps (stride<width).
    starts = sorted(r.start_tok for r in out)
    assert starts[0] == 1
    assert all(b - a == 24 for a, b in zip(starts, starts[1:]))
    for r in out:
        assert r.n_tok == 32
        assert len(r.chunk_text.split(" ")) == r.n_tok
        assert r.chunk_id == (r.start_tok - 1) // 24


def test_chunk_documents_short_doc_single_window(spark):
    out = curation.chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=32, stride=24).collect()
    assert len(out) == 1
    assert out[0].start_tok == 1 and out[0].n_tok == 3
    assert out[0].chunk_text == "a b c"


def test_chunk_documents_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        curation.chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=0)
    with pytest.raises(ValueError):
        curation.chunk_documents(_docs(spark, [(1, "a")]), stride=-1)


# ------------------------------------------------------------- sampling

def _strat_docs(spark, n=400):
    rows = [(i, f"doc {i}", ["en", "de", "zh", "fr"][i % 4])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING")


def test_stratified_sample_deterministic_and_idempotent(spark):
    docs = _strat_docs(spark)
    rates = {"en": 0.5, "de": 0.25}
    a = sorted(r.doc_id for r in
               curation.stratified_sample(docs, rates, seed=7).collect())
    b = sorted(r.doc_id for r in
               curation.stratified_sample(docs, rates, seed=7).collect())
    assert a == b
    # resampling the sample with the same seed keeps every row
    kept = curation.stratified_sample(docs, rates, seed=7)
    again = sorted(r.doc_id for r in
                   curation.stratified_sample(kept, rates, seed=7).collect())
    assert again == a
    # a different seed draws a different subset
    c = sorted(r.doc_id for r in
               curation.stratified_sample(docs, rates, seed=8).collect())
    assert a != c


def test_stratified_sample_rates_apply_per_stratum(spark):
    docs = _strat_docs(spark, n=2000)
    stats = {r.stratum: r for r in curation.sample_stats(
        docs, {"en": 0.5, "de": 0.0, "zh": 1.0}, seed=3,
        default_rate=0.1).collect()}
    assert stats["de"].kept == 0
    assert stats["zh"].kept == stats["zh"].total
    # en ~ 0.5 of 500, fr (default) ~ 0.1 of 500 — loose 5-sigma bounds
    assert 175 <= stats["en"].kept <= 325
    assert 15 <= stats["fr"].kept <= 90
    for r in stats.values():
        assert r.kept_frac == pytest.approx(
            round(r.kept / r.total, 6), abs=1e-9)


def test_stratified_sample_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        curation.stratified_sample(_strat_docs(spark), {"en": 1.5})


def test_sample_is_subset_invariant_to_other_rows(spark):
    # per-row decision: dropping other rows never changes a row's fate
    docs = _strat_docs(spark)
    full = {r.doc_id for r in curation.stratified_sample(
        docs, {"en": 0.4}, seed=11).collect()}
    half = {r.doc_id for r in curation.stratified_sample(
        docs.where("doc_id < 200"), {"en": 0.4}, seed=11).collect()}
    assert half == {d for d in full if d < 200}


# ------------------------------------------------------------ splits

def test_dataset_split_partitions_and_is_append_stable(spark):
    docs = _docs(spark, [(i, "x") for i in range(200)])
    out = {r["doc_id"]: r["split"]
           for r in curation.dataset_split(docs).collect()}
    assert set(out) == set(range(200))
    assert set(out.values()) <= {"train", "val", "test"}
    # majority lands in train at 0.9
    assert sum(1 for s in out.values() if s == "train") > 150
    # append stability: the first 50 docs keep their split verbatim
    sub = {r["doc_id"]: r["split"] for r in curation.dataset_split(
        _docs(spark, [(i, "x") for i in range(50)])).collect()}
    assert all(out[i] == sub[i] for i in range(50))


def test_dataset_split_validation(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        curation.dataset_split(docs, {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        curation.dataset_split(docs, {"all": 1.0})
    with pytest.raises(ValueError):
        curation.dataset_split(docs, {"a": 1.5, "b": -0.5})


# ------------------------------------------------------------ packing

def test_pack_bins_single_bucket_sequential(spark):
    # One bucket: docs in id order with 3 tokens each, max 6 -> two
    # docs per bin (exclusive cumsum 0,3,6,9,... DIV 6 = 0,0,1,1,...).
    docs = _docs(spark, [(i, "a b c") for i in range(6)])
    out = sorted(
        (r["doc_id"], r["bin_id"], r["n_tokens"])
        for r in curation.pack_bins(docs, max_tokens=6,
                                    n_buckets=1).collect())
    assert [r[2] for r in out] == [3] * 6
    assert [r[1] for r in out] == [0, 0, 1, 1, 2, 2]


def test_pack_bins_long_doc_owns_its_bin(spark):
    # doc 1 has 7 tokens (> max 4): it fills bins alone; doc 0 and 2
    # land before/after it at the DIV boundaries.
    docs = _docs(spark, [(0, "a b"), (1, "a b c d e f g"), (2, "a b")])
    got = {r["doc_id"]: r["bin_id"]
           for r in curation.pack_bins(docs, max_tokens=4,
                                       n_buckets=1).collect()}
    assert got[0] == 0          # cum 0
    assert got[1] == 0          # cum 2 -> bin 0 (bounded overflow)
    assert got[2] == 2          # cum 9 -> bin 2: the long doc consumed bin 1
    assert curation.pack_bins(docs, max_tokens=4, n_buckets=1) \
        .select("bucket").distinct().count() == 1


def test_pack_bins_buckets_independent(spark):
    docs = _docs(spark, [(i, "a b c d") for i in range(40)])
    out = curation.pack_bins(docs, max_tokens=8, n_buckets=4).collect()
    assert {r["bucket"] for r in out} <= set(range(4))
    # within every bucket, bin_id is nondecreasing in doc_id order and
    # each bin holds exactly two 4-token docs
    by_bucket: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r["bin_id"])
    for bins in by_bucket.values():
        assert bins == sorted(bins)
        for b in set(bins):
            assert bins.count(b) == 2 or b == bins[-1]


def test_pack_bins_validation(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        curation.pack_bins(docs, max_tokens=0)
    with pytest.raises(ValueError):
        curation.pack_bins(docs, n_buckets=0)


# ------------------------------------------------------ weighted sampling

def _lang_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING")


def test_weighted_sample_two_level_equals_single_window(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.choice(["en", "fr"]),
             " ".join("t" for _ in range(rng.randrange(1, 40))))
            for i in range(120)]
    docs = _lang_docs(spark, rows)
    a = sorted(map(tuple, curation.weighted_sample_topk(
        docs, k=7, salt_buckets=1).collect()))
    b = sorted(map(tuple, curation.weighted_sample_topk(
        docs, k=7, salt_buckets=32).collect()))
    assert a == b and len(a) == 14  # 2 strata x k


def test_weighted_sample_exact_k_without_replacement(spark):
    rows = [(i, "en", "w " * (i + 1)) for i in range(30)]
    got = curation.weighted_sample_topk(
        _lang_docs(spark, rows), k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 10 and len(set(ids)) == 10
    # small stratum: returns everything
    short = curation.weighted_sample_topk(
        _lang_docs(spark, rows[:4]), k=10).collect()
    assert len(short) == 4


def test_weighted_sample_biases_toward_heavy_docs(spark):
    # one 400-token doc among 40 single-token docs: E-S picks it for
    # k=1 with prob 400/440 per seed; over 30 seeds it must dominate.
    rows = [(0, "en", "h " * 400)] + [
        (i, "en", "x") for i in range(1, 41)]
    docs = _lang_docs(spark, rows)
    wins = sum(
        curation.weighted_sample_topk(docs, k=1, seed=s).first()["doc_id"]
        == 0
        for s in range(30))
    assert wins >= 22, wins


def test_weighted_sample_rejects_bad_params(spark):
    docs = _lang_docs(spark, [(0, "en", "a")])
    with pytest.raises(ValueError):
        curation.weighted_sample_topk(docs, k=0)
    with pytest.raises(ValueError):
        curation.weighted_sample_topk(docs, salt_buckets=0)
