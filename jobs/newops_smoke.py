#!/usr/bin/env python
"""Scale smoke for the round-5 operators (BENCH/SCALE_SMOKE.md):

- dense face: the standard 578M-edge / 50k-vertex power-law graph
  (same synthesis as bench_scaling.py) — harmonic centrality from 4
  landmarks, 4-step deterministic walks, SCC condensation;
- sparse face: a 5M-vertex / 50M-edge power-law graph (avg degree 20,
  the web-like shape where the wedge cap binds) — link prediction
  with max_center_degree=64.

Writes one JSON line per op to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DENSE = (50_000, 700_000_000)   # dedupes to ~578M, bench_scaling shape
SPARSE = (5_000_000, 50_000_000)


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.session import get_spark
    from pagerank_spark import datagen
    from pagerank_spark.operators.betweenness import betweenness
    from pagerank_spark.operators.centrality import harmonic_centrality
    from pagerank_spark.operators.neighborhood import neighborhood_function
    from pagerank_spark.operators.linkpred import link_prediction
    from pagerank_spark.operators.scc import scc_condensation
    from pagerank_spark.operators.walks import random_walks

    # NEWOPS_ONLY=op1,op2 runs a subset; NEWOPS_DENSE_PATH reuses an
    # existing synthesis (e.g. the bench_scaling workdir) instead of
    # regenerating the 700M-edge table.
    only = {o.strip() for o in os.environ.get("NEWOPS_ONLY", "").split(",")
            if o.strip()}

    spark = get_spark(
        app_name="newops_smoke", master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g",
                    "spark.ui.showConsoleProgress": "false"})

    def timed(name, fn):
        if only and name not in only:
            return
        t0 = time.monotonic()
        out = fn()
        print(json.dumps({"op": name,
                          "wall_s": round(time.monotonic() - t0, 1),
                          "result": out}), flush=True)

    def wants(face: str) -> bool:
        return not only or any(o.endswith(face) for o in only)

    if wants("_dense"):
        dense_path = os.environ.get("NEWOPS_DENSE_PATH",
                                    "/tmp/newops_dense.parquet")
        if not os.path.exists(dense_path):
            datagen.power_law_graph(
                spark, n_vertices=DENSE[0], n_edges=DENSE[1], seed=42,
                zipf_exponent=1.9, hub_fraction=0.05, partitions=64,
            ).dropDuplicates(["src", "dst"]).write.mode(
                "overwrite").parquet(dense_path)
        dense = spark.read.parquet(dense_path)
        print(json.dumps({"op": "dense_edges", "rows": dense.count()}),
              flush=True)

        timed("harmonic_k4_dense", lambda: harmonic_centrality(
            dense, [1, 2, 3, 5]).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("harmonic_q6").alias("sum_q6")).first().asDict())
        timed("random_walks_k4_dense", lambda: {
            "rows": random_walks(dense, num_steps=4).count()})

        def _n2v():
            from pagerank_spark.operators.walks import node2vec_walks

            return {"rows": node2vec_walks(dense, num_steps=2).count()}

        timed("node2vec_k2_dense", _n2v)
        timed("scc_condensation_dense", lambda: {
            "cross_edges": scc_condensation(dense, n=DENSE[0]).count()})
        timed("betweenness_p4_dense", lambda: betweenness(
            dense, [1, 2, 3, 5]).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("bet_q9").alias("sum_q9")).first().asDict())
        timed("neighborhood_r3_dense", lambda: neighborhood_function(
            dense, 3).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("sum_rho").alias("sum_rho")).first().asDict())
        from pagerank_spark.operators.structure import core_decomposition
        timed("core_decomposition_dense", lambda: core_decomposition(
            dense).agg(
                F.count(F.lit(1)).alias("n"),
                F.max("coreness").alias("degeneracy")).first().asDict())
        from pagerank_spark.operators.msf import minimum_spanning_forest
        timed("msf_dense", lambda: minimum_spanning_forest(
            dense.withColumn(
                "weight",
                ((F.col("src") + F.col("dst")) % 7 + 1).cast("double"))
        ).agg(F.count(F.lit(1)).alias("forest_edges"),
              F.sum("weight").alias("total_w")).first().asDict())

        # ---- round-5b additions ----
        from pagerank_spark.operators.salsa import salsa
        timed("salsa_k2_dense", lambda: salsa(
            dense, n=DENSE[0], max_iter=2, tol=0.0).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("auth").alias("sum_auth")).first().asDict())
        from pagerank_spark.operators.densest import densest_subgraph

        def _densest():
            r = densest_subgraph(dense)
            return {"density": round(r.density, 1),
                    "vertices": r.n_vertices, "rounds": r.rounds}
        timed("densest_dense", _densest)
        from pagerank_spark.operators.matching import (
            coarsen_graph, maximal_matching)

        def _match_coarsen():
            m = maximal_matching(dense).localCheckpoint(eager=True)
            pairs = m.count()
            rounds = m.agg(F.max("match_round").alias("r")).first()["r"]
            c = coarsen_graph(dense, m)
            row = c.agg(F.count(F.lit(1)).alias("edges"),
                        F.sum("weight").alias("wsum")).first()
            return {"pairs": pairs, "rounds": rounds,
                    "coarse_edges": row["edges"],
                    "weight_sum": int(row["wsum"] or 0)}
        timed("matching_coarsen_dense", _match_coarsen)
        from pagerank_spark.operators.labelspread import (
            label_spreading, modular_seeds)
        timed("spread_k2_dense", lambda: label_spreading(
            dense, modular_seeds(dense, 16, 4), alpha=0.85,
            iterations=2).agg(
                F.count(F.lit(1)).alias("labeled"),
                F.countDistinct("label").alias("classes"))
            .first().asDict())

    if wants("_sparse"):
        sparse_path = "/tmp/newops_sparse.parquet"
        if not os.path.exists(sparse_path):
            datagen.power_law_graph(
                spark, n_vertices=SPARSE[0], n_edges=SPARSE[1], seed=43,
                zipf_exponent=1.9, partitions=64,
            ).dropDuplicates(["src", "dst"]).write.mode(
                "overwrite").parquet(sparse_path)
        sparse = spark.read.parquet(sparse_path)
        print(json.dumps({"op": "sparse_edges", "rows": sparse.count()}),
              flush=True)

        timed("link_prediction_sparse", lambda: {
            "top_rows": link_prediction(
                sparse, max_center_degree=64, top_k=1000).count()})
        timed("harmonic_k4_sparse", lambda: harmonic_centrality(
            sparse, [1, 2, 3, 5]).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("harmonic_q6").alias("sum_q6")).first().asDict())
        timed("random_walks_k4_sparse", lambda: {
            "rows": random_walks(sparse, num_steps=4).count()})

        def _scan_sparse():
            from pagerank_spark.operators.scan import scan_clusters

            out = scan_clusters(sparse, eps_num=2, eps_den=5, mu=3)
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_core").cast("long")).alias("cores"),
            ).first()
            return {"clustered": row["n"], "cores": int(row["cores"] or 0)}

        timed("scan_sparse", _scan_sparse)

        def _scan_planted():
            # Planted-partition face: the zipf-random sparse graph has
            # near-zero structural similarity (scan_sparse returns an
            # honest empty census), so recovery is evidenced on 250k
            # planted 8-cliques (2M vertices, 7M clique edges) plus 2M
            # deterministic noise edges — SCAN must label essentially
            # every vertex with its block.
            from pagerank_spark.operators.scan import scan_clusters

            N, C = 2_000_000, 8
            v = spark.range(N).select(
                "id", F.expr(f"id DIV {C}").alias("b"))
            clique = (
                v.select(F.col("id").alias("src"), "b")
                .join(v.select(F.col("id").alias("dst"), "b"), "b")
                .where(F.col("src") < F.col("dst"))
                .select("src", "dst"))
            noise = spark.range(N).select(
                F.pmod(F.xxhash64(F.col("id"), F.lit("a")), F.lit(N))
                .alias("src"),
                F.pmod(F.xxhash64(F.col("id"), F.lit("b")), F.lit(N))
                .alias("dst"))
            out = scan_clusters(clique.unionByName(noise),
                                eps_num=2, eps_den=5, mu=3)
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("cluster").alias("clusters"),
                F.sum(F.col("is_core").cast("long")).alias("cores"),
            ).first()
            return {"clustered": row["n"], "clusters": row["clusters"],
                    "cores": int(row["cores"] or 0)}

        timed("scan_planted_sparse", _scan_planted)

        def _hyperball_sparse():
            from pagerank_spark.operators.neighborhood import (
                hyperball_harmonic)

            row = hyperball_harmonic(sparse, 3).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("harmonic_q").alias("sum_q")).first()
            return {"n": row["n"], "sum_q": row["sum_q"]}

        timed("hyperball_sparse", _hyperball_sparse)
        timed("betweenness_p4_sparse", lambda: betweenness(
            sparse, [1, 2, 3, 5]).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("bet_q9").alias("sum_q9")).first().asDict())
        timed("neighborhood_r3_sparse", lambda: neighborhood_function(
            sparse, 3).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("sum_rho").alias("sum_rho")).first().asDict())

        def _modularity_cc():
            from pagerank_spark.operators.components import (
                connected_components)
            from pagerank_spark.operators.labelprop import modularity_score
            labels = connected_components(sparse).select(
                "id", F.col("component").alias("label"))
            return modularity_score(sparse, labels).first().asDict()

        timed("modularity_cc_sparse", _modularity_cc)

    if wants("_er"):
        # ---- round-5b additions ----
        # The zipf "sparse" face has min degree 57 (every cap below
        # that excludes the whole graph), so the rectangle census gets
        # its own Erdős–Rényi-ish face: 10M vertices / 30M random
        # edges (avg deg ~6), where a cap of 64 is binding for the
        # hub tail while covering ~every vertex — the realistic
        # web-fringe shape the degree cap is designed for.
        from pagerank_spark.operators.motifs import rectangle_count
        er = spark.range(30_000_000).select(
            (F.xxhash64(F.col("id"), F.lit(1)) % 10_000_000)
            .alias("src"),
            (F.xxhash64(F.col("id"), F.lit(2)) % 10_000_000)
            .alias("dst"))
        er = er.select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
        timed("rectangles_cap64_er", lambda: rectangle_count(
            er, max_degree=64).first().asDict())

    spark.stop()


if __name__ == "__main__":
    main()
