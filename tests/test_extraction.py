"""Extraction stage (FIXTURES.md F1): ground-truth edge recovery,
sha256 pass-through invariant, self-edge drop, dedupe."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pagerank_spark import datagen, extraction


def test_extracted_edges_match_ground_truth(spark):
    files, truth = datagen.repo_files_corpus(spark, n_repos=5,
                                             files_per_repo=4, seed=42)
    got = {(r["src_repo"], r["dst_repo"])
           for r in extraction.derive_edges(files).collect()}
    want = {(r["src_repo"], r["dst_repo"]) for r in truth.collect()}
    assert got == want
    # self-edges dropped
    assert all(s != d for s, d in got)


def test_shuffle_join_owners_equivalent(spark):
    # the 1e12-file path: shuffled resolution join must produce the
    # exact same edge set as the broadcast join.
    files, _ = datagen.repo_files_corpus(spark, n_repos=8,
                                         files_per_repo=5, seed=11)
    bc = {(r["src_repo"], r["dst_repo"])
          for r in extraction.derive_edges(files).collect()}
    sh = {(r["src_repo"], r["dst_repo"])
          for r in extraction.derive_edges(
              files, broadcast_owners=False).collect()}
    assert bc == sh


def test_sha256_invariant_preserved(spark):
    files, _ = datagen.repo_files_corpus(spark, seed=7)
    # Hash every row's content locally — the stage's sha column must
    # match python hashlib exactly, per (repo, path).
    local = {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in files.collect()
    }
    refs = extraction.extract_references(files)
    through = {(r["repo"], r["path"]): r["content_sha"]
               for r in refs.select("repo", "path", "content_sha")
                            .dropDuplicates(["repo", "path"]).collect()}
    for k, sha in through.items():
        assert sha == local[k]
    hashes = extraction.file_hashes(files)
    for r in hashes.collect():
        assert r["content_sha"] == local[(r["repo"], r["path"])]


def test_duplicate_imports_deduped(spark):
    files = spark.createDataFrame(
        [("org/a", "src/a_m.py", "c" * 40, "python",
          "import b_m\nimport b_m\nfrom b_m import x"),
         ("org/b", "src/b_m.py", "d" * 40, "python", "# nothing")],
        "repo STRING, path STRING, commit STRING, lang STRING, content STRING",
    )
    edges = extraction.derive_edges(files).collect()
    assert [(r["src_repo"], r["dst_repo"]) for r in edges] == [("org/a", "org/b")]


def test_per_language_syntax(spark):
    rows = [
        ("org/py", "src/py_m.py", "a" * 40, "python",
         "import c_m\nfrom js_m import y\nx = 1"),
        ("org/c", "src/c_m.c", "b" * 40, "c",
         '#include "py_m.h"\n#include <js_m.h>\nint v;'),
        ("org/js", "src/js_m.js", "c" * 40, "javascript",
         "const a = require('c_m');\nimport { z } from 'py_m';"),
    ]
    files = spark.createDataFrame(
        rows, "repo STRING, path STRING, commit STRING, lang STRING, content STRING")
    got = {(r["src_repo"], r["dst_repo"])
           for r in extraction.derive_edges(files).collect()}
    assert got == {
        ("org/py", "org/c"), ("org/py", "org/js"),
        ("org/c", "org/py"), ("org/c", "org/js"),
        ("org/js", "org/c"), ("org/js", "org/py"),
    }


def test_end_to_end_extraction_to_pagerank(spark):
    # corpus → edges → dense ids → PageRank runs and sums to ~1.
    from pagerank_spark import graph
    from pagerank_spark.operators import pagerank

    files, _ = datagen.repo_files_corpus(spark, n_repos=6,
                                         files_per_repo=3, seed=11)
    edges, dictionary, edges_str = extraction.edge_table_with_ids(files)
    g = graph.prepare(edges)
    res = pagerank(g, tol=1e-8)
    total = res.converged_ranks.agg(F.sum("pr")).first()[0]
    assert abs(total - 1.0) < 1e-6
    # dictionary covers every vertex in the encoded edge domain
    assert dictionary.count() >= g.n


def test_content_pruned_from_downstream_plan(spark, tmp_path):
    # The ownership map must not read `content`: column-pruning must
    # reach the parquet scan (ReadSchema excludes content).
    files, _ = datagen.repo_files_corpus(spark, seed=42)
    path = str(tmp_path / "files.parquet")
    files.write.parquet(path)
    on_disk = spark.read.parquet(path)
    import re

    def read_schemas(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)

    owner_schemas = read_schemas(extraction.module_ownership(on_disk))
    assert owner_schemas and all("content" not in s for s in owner_schemas)
    # the extraction stage itself of course does read content
    refs_schemas = read_schemas(extraction.extract_references(on_disk))
    assert any("content" in s for s in refs_schemas)
