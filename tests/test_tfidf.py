from __future__ import annotations

import math

import numpy as np
import pytest

from pagerank_spark.pipeline.tfidf import tfidf_terms, tfidf_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING")


def _numpy_tfidf(texts, max_df=None):
    """sklearn-convention smooth tf-idf, L2-normalized, dict-of-dicts."""
    toks = [t.strip().lower().split() for t in texts]
    n = len(texts)
    df = {}
    for ts in toks:
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    vocab = {t for t, d in df.items()
             if t and (max_df is None or d <= max_df)}
    out = []
    for ts in toks:
        w = {}
        for term in ts:
            if term in vocab:
                w[term] = w.get(term, 0) + 1
        w = {t: c * (math.log((1 + n) / (1 + df[t])) + 1)
             for t, c in w.items()}
        nrm = math.sqrt(sum(v * v for v in w.values())) or 1.0
        out.append({t: v / nrm for t, v in w.items()})
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps",
    "a completely different document about spark",
    "spark document processing with spark",
    "the lazy dog sleeps",
]


def test_tfidf_terms_match_numpy(spark):
    want = _numpy_tfidf(TEXTS)
    got = {}
    for r in tfidf_terms(_docs(spark, TEXTS)).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = r["w"]
    assert set(got) == set(range(len(TEXTS)))
    for i, vec in enumerate(want):
        assert got[i].keys() == vec.keys()
        for t, v in vec.items():
            assert got[i][t] == pytest.approx(v, rel=1e-12)


def test_tfidf_max_df_prunes(spark):
    # 'the' appears in 3 of 5 docs; max_df=2 must drop it.
    terms = {r["term"] for r in
             tfidf_terms(_docs(spark, TEXTS), max_df=2).collect()}
    assert "the" not in terms
    assert "spark" in terms        # df == 2 survives


def test_tfidf_topk_matches_numpy(spark):
    vecs = _numpy_tfidf(TEXTS)
    n = len(TEXTS)
    sims = {}
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            s = round(sum(vecs[a][t] * vecs[b].get(t, 0.0)
                          for t in vecs[a]), 6)
            if s != 0:
                sims.setdefault(a, []).append((-s, b))
    want = {}
    for a, lst in sims.items():
        want[a] = [(b, -ms) for ms, b in sorted(lst)[:2]]

    got = {}
    for r in tfidf_topk(_docs(spark, TEXTS), k=2).orderBy(
            "doc_id", "rank").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["neighbor_id"], r["sim"]))
    assert got == {a: [(b, pytest.approx(s, abs=2e-6)) for b, s in lst]
                   for a, lst in want.items()}


def test_tfidf_topk_excludes_self_and_ranks(spark):
    out = tfidf_topk(_docs(spark, TEXTS), k=3).collect()
    for r in out:
        assert r["neighbor_id"] != r["doc_id"]
        assert 1 <= r["rank"] <= 3
    # ranks are dense per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_tfidf_identical_docs_sim_one(spark):
    texts = ["alpha beta gamma", "alpha beta gamma", "delta epsilon"]
    top = {(r["doc_id"], r["neighbor_id"]): r["sim"]
           for r in tfidf_topk(_docs(spark, texts), k=1).collect()}
    assert top[(0, 1)] == pytest.approx(1.0)
    assert top[(1, 0)] == pytest.approx(1.0)
    assert (2, 0) not in top and (2, 1) not in top
