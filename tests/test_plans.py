"""Physical-plan shape assertions — the "is this the plan you'd want
at 100 TB" checks (broadcast where intended, pruning reaching scans,
no cartesian products in the candidate-pair joins)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from conftest import edges_df
from oracles import F2_EDGES
from pagerank_spark import graph


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gather_broadcast_join_shape(spark):
    g = graph.prepare(edges_df(spark, F2_EDGES))
    ranks_w = g.out_deg.select(
        F.col("id").alias("src"), (F.lit(1.0) / F.col("out_deg")).alias("w"))
    gathered = (g.edges.join(F.broadcast(ranks_w), "src")
                .groupBy("dst").agg(F.sum("w").alias("contrib")))
    plan = _physical(gathered)
    assert "BroadcastHashJoin" in plan
    # partial aggregation (map-side combine) before the exchange
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_shuffle_gather_edge_side_stays_put(spark):
    # The shuffle-mode gather joins on src: with the edge table laid
    # out by src (what operators/pagerank.py does once per run), the
    # per-iteration plan must NOT re-exchange the |E|-row edge side —
    # only the |V|-row rank side and the partial aggregates move.
    edges = [(i % 40, (i * 7) % 40) for i in range(400)]
    g = graph.prepare(edges_df(spark, edges))
    parts = g.edges.rdd.getNumPartitions()
    ranks_w = g.out_deg.select(
        F.col("id").alias("src"), (F.lit(1.0) / F.col("out_deg")).alias("w"))

    def edge_subtree(edge_side):
        # the join's edge-side subtree, up to the cached-relation
        # internals (whose stored plan text contains its own Exchange)
        plan = _physical(
            edge_side.join(ranks_w, "src")
            .groupBy("dst").agg(F.sum("w").alias("contrib")))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        return plan.split("InMemoryRelation")[0]

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        relaid = g.edges.repartition(parts, "src").persist()
        relaid.count()
        # src-partitioned cache: the InMemoryTableScan feeds the join
        # directly — no Exchange between the scan and the join; the
        # only exchange above it is the final dst aggregation.
        assert edge_subtree(relaid).count("Exchange") == 1
        relaid.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_minhash_pairs_no_cartesian(spark):
    from pagerank_spark.pipeline import dedup

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e")], "doc_id BIGINT, text STRING")
    plan = _physical(dedup.minhash_candidate_pairs(docs))
    assert "CartesianProduct" not in plan
    plan2 = _physical(dedup.ngram_jaccard_pairs(docs, 0.1))
    assert "CartesianProduct" not in plan2


def test_parquet_filter_pushdown(spark, tmp_path):
    path = str(tmp_path / "edges.parquet")
    edges_df(spark, F2_EDGES).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("src") > 1).select("src")
    plan = _physical(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(src,1)" in m.group(1)
    m2 = re.search(r"ReadSchema: (struct<[^>]*>)", plan)
    assert m2 and "dst" not in m2.group(1)


def test_extraction_ownership_broadcast(spark):
    from pagerank_spark import datagen, extraction

    files, _ = datagen.repo_files_corpus(spark, seed=42)
    plan = _physical(extraction.derive_edges(files))
    assert "BroadcastHashJoin" in plan


def test_clustering_coeff_no_cartesian(spark):
    from pagerank_spark.operators import clustering_coefficients

    df = clustering_coefficients(edges_df(spark, F2_EDGES))
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan  # degree + triangle aggs partial-combined


def test_hits_double_gather_edge_side_stays_put(spark):
    # The HITS round (operators/hits.py): two gathers over the SAME
    # cached edge table with the |V|-row score sides broadcast — the
    # |E| side must never exchange.  Reconstructs the round expression
    # exactly as the loop builds it.
    edges = [(i % 40, (i * 7) % 40) for i in range(400)]
    e = edges_df(spark, edges).dropDuplicates(["src", "dst"]).persist()
    e.count()
    hubs = e.select(F.col("src").alias("id")).distinct().select(
        "id", F.lit(1.0).alias("hub"))
    a_un = (
        e.join(F.broadcast(hubs.withColumnRenamed("id", "src")), "src")
        .groupBy(F.col("dst").alias("id")).agg(F.sum("hub").alias("a_un"))
    )
    h_un = (
        e.join(F.broadcast(a_un.select(F.col("id").alias("dst"),
                                       F.col("a_un").alias("a_dst"))), "dst")
        .groupBy(F.col("src").alias("id")).agg(F.sum("a_dst").alias("h_un"))
    )
    plan = _physical(h_un)
    assert plan.count("BroadcastHashJoin") == 2
    # No shuffle of the edge side before the cached relation internals:
    # the only exchanges are the two partial-agg combines.
    head = plan.split("InMemoryRelation")[0]
    assert head.count("Exchange") <= 2
    e.unpersist()


def test_bfs_frontier_round_broadcasts(spark):
    # The BFS/SSSP round (operators/bfs.py, sssp.py): narrow persisted
    # symmetrized union + explicitly broadcast frontier.  The hint must
    # hold even with auto-broadcast disabled (the loop decides from
    # exact counts, not stats), and the |E| side must not exchange.
    edges = edges_df(spark, F2_EDGES)
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst")).persist()
    und.count()
    frontier = spark.createDataFrame([(1,)], "src BIGINT")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new = (und.join(F.broadcast(frontier), "src")
               .select(F.col("dst").alias("id")).distinct())
        plan = _physical(new)
        assert "BroadcastHashJoin" in plan
        head = plan.split("InMemoryRelation")[0]
        assert head.count("Exchange") <= 1  # only the distinct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        und.unpersist()


def test_embedding_near_dups_shipped_path_no_cartesian(spark):
    # The DEFAULT embedding near-dup path must be the LSH bucket
    # equi-join (VERDICT r3 item 2); only the explicit brute face —
    # the pytest recall oracle — may cross-join.
    from pagerank_spark.pipeline import dedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 1.0]) for i in range(6)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    plan = _physical(dedup.embedding_near_dup_pairs(emb, threshold=0.9))
    assert "CartesianProduct" not in plan
    brute = _physical(dedup.embedding_near_dup_pairs(
        emb, threshold=0.9, method="brute"))
    assert "CartesianProduct" in brute  # the assertion above is sensitive


def test_tfidf_topk_no_cartesian(spark):
    # The pairwise similarity is a term equi-join (sort-merge/hash),
    # never an all-pairs product.
    from pagerank_spark.pipeline import tfidf

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y z")],
        "doc_id BIGINT, text STRING")
    t = tfidf.tfidf_terms(docs)
    a = t.selectExpr("doc_id AS a", "term", "w AS wa")
    b = t.selectExpr("doc_id AS b", "term", "w AS wb")
    from pyspark.sql import functions as F

    pairs = (a.join(b, "term").where(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.sum(F.col("wa") * F.col("wb"))))
    assert "CartesianProduct" not in _physical(pairs)


def test_neighborhood_gather_broadcasts_sketches(spark):
    # At small |V| the sketch side must broadcast (edge rows never
    # move); never a cartesian product.  The returned DF itself reads
    # the round checkpoint, so assert on the per-radius gather stage.
    from pagerank_spark.operators import neighborhood as nf
    from pagerank_spark.operators.pagerank import plan_gather

    edges = edges_df(spark, F2_EDGES)
    verts = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))).distinct()
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    plan_obj = plan_gather(edges, deg, verts.count(), mode="auto")
    try:
        gathered = nf._gather_or(
            plan_obj, nf._init_sketches(verts, 4), 4)
        plan = _physical(gathered)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
    finally:
        plan_obj.release()


def test_salsa_weighted_gather_broadcasts(spark):
    # Below the broadcast bound both SALSA gathers must be broadcast
    # hash joins over the cached split-fraction layouts — the |E| side
    # never exchanges inside the loop.
    from pagerank_spark.operators.salsa import salsa

    out = salsa(edges_df(spark, F2_EDGES), max_iter=2, tol=0.0)
    plan = _physical(out)
    assert "CartesianProduct" not in plan


def test_matching_and_coarsen_no_cartesian(spark):
    from pagerank_spark.operators.matching import (
        coarsen_graph, maximal_matching)

    e = edges_df(spark, F2_EDGES)
    m = maximal_matching(e, seed=1)
    c = coarsen_graph(e, m)
    plan = _physical(c)
    assert "CartesianProduct" not in plan
    # the |V|-row vertex map broadcasts under the bound
    assert "BroadcastHashJoin" in plan


def test_label_spreading_gather_shape(spark):
    from pagerank_spark.operators.labelspread import (
        label_spreading, modular_seeds)

    e = edges_df(spark, F2_EDGES)
    out = label_spreading(e, modular_seeds(e, 2, 2), iterations=2)
    plan = _physical(out)
    assert "CartesianProduct" not in plan
    # the per-iteration gathers are truncated behind localCheckpoint
    # (by design); the visible argmax must use the rank<=1 group-limit
    # rewrite, not a full sort-then-filter
    assert "WindowGroupLimit" in plan


def test_pack_bins_single_shuffle(spark):
    # One exchange total: the window's hash partition on bucket
    # (token counting and bin arithmetic are per-row expressions).
    from pagerank_spark.pipeline.curation import pack_bins

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id LONG, text STRING")
    plan = _physical(pack_bins(docs, max_tokens=4, n_buckets=4))
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_dataset_split_zero_shuffle(spark):
    from pagerank_spark.pipeline.curation import dataset_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id LONG, text STRING")
    plan = _physical(dataset_split(docs))
    assert "Exchange" not in plan


def test_node2vec_no_cartesian_and_broadcast_frontier(spark):
    # The α-class pair probe and candidate probe are equi-joins; with
    # a small frontier both broadcast — never a CartesianProduct, and
    # the replicated copies stay map-side (explode before the min agg).
    from pagerank_spark.operators.walks import node2vec_walks

    out = node2vec_walks(edges_df(spark, F2_EDGES), num_steps=2)
    plan = _physical(out)
    assert "CartesianProduct" not in plan


def test_weighted_sample_two_level_windows(spark):
    # Selection must run as two window passes (salted then survivor),
    # never a global sort of the corpus.
    from pagerank_spark.pipeline.curation import weighted_sample_topk

    docs = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(50)],
        "doc_id BIGINT, lang STRING, text STRING")
    out = weighted_sample_topk(docs, k=3)
    plan = _physical(out)
    assert "CartesianProduct" not in plan
    assert plan.count("RunningWindowFunction") >= 1 or "Window" in plan
