#!/usr/bin/env python
"""Multi-algorithm link-graph job — the spark-submit entry point for
everything beyond plain PageRank (which has its own tuned job,
jobs/pagerank_job.py).

    spark-submit --py-files engine.zip jobs/graph_job.py \
        --edges /path/to/edges.parquet \
        --algos cc,lpa,triangles,bfs,sssp,hits,katz,kcore,ppr,scc,wpr,lcc,degdist \
        [--algos ...,linkpred,harmonic,walks,condense,ktruss,diameter] \
        [--algos ...,eigen,closeness,bipartite,mis,levels,betweenness] \
        [--algos ...,neighborhood,node2vec,scan,bowtie,sweepcut,hyperharmonic] \
        [--source 0] [--k 3] [--max-iter 20] [--out result.json]

Every algorithm prints its summary into ONE JSON line, so the job is
scriptable the same way bench_scaling drives pagerank_job.  Edge
weights for sssp/wpr default to the deterministic (src+dst)%7+1 used
by the driver oracle; pass --weight-col if the input carries one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--edges", required=True, help="parquet edge table (src,dst)")
    p.add_argument("--algos", default="cc,lpa,triangles",
                   help="comma list: cc,lpa,triangles,bfs,sssp,hits,"
                        "katz,kcore,coreness,ppr,scc,wpr,lcc,degdist,linkpred,"
                        "harmonic,walks,condense,ktruss,diameter,"
                        "eigen,closeness,bipartite,mis,levels,"
                        "betweenness")
    p.add_argument("--master", default=None)
    p.add_argument("--source", type=int, default=0,
                   help="bfs/sssp/ppr source vertex")
    p.add_argument("--k", type=int, default=3,
                   help="k-core / k-truss threshold")
    p.add_argument("--max-center", type=int, default=10_000,
                   help="linkpred wedge-center degree cap")
    p.add_argument("--walk-steps", type=int, default=4,
                   help="random-walk hop count")
    p.add_argument("--katz-alpha", type=float, default=0.001,
                   help="katz attenuation (must be < 1/spectral radius)")
    p.add_argument("--max-iter", type=int, default=20,
                   help="iteration cap for lpa/hits/ppr/wpr")
    p.add_argument("--weight-col", default=None,
                   help="weight column for sssp/wpr; defaults to the "
                        "deterministic (src+dst)%%7+1 expression")
    p.add_argument("--seed", type=int, default=42,
                   help="seed for the randomized-round operators "
                        "(matching/coarsen); runs are pure functions "
                        "of it")
    p.add_argument("--rect-max-degree", type=int, default=10_000,
                   help="rectangles: degree cap bounding wedge volume "
                        "to cap*|E| (exact census below the cap)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from pagerank_spark.session import get_spark
    from pagerank_spark import graph
    from pagerank_spark.operators import (
        bfs_depths, clustering_coefficients, connected_components,
        core_decomposition, degree_distribution, hits, k_core,
        katz_centrality,
        label_propagation, personalized_pagerank, shortest_paths,
        strongly_connected_components)
    from pagerank_spark.operators.triangles import triangles
    from pagerank_spark.operators.weighted import weighted_pagerank

    spark = get_spark(app_name="graph_job", master=args.master)
    edges = spark.read.parquet(args.edges)
    g = graph.prepare(edges)

    def weighted_edges():
        if args.weight_col:
            return edges.select("src", "dst",
                                F.col(args.weight_col).alias("weight"))
        return g.edges.select(
            "src", "dst",
            ((F.col("src") + F.col("dst")) % 7 + 1)
            .cast("double").alias("weight"))

    results: dict[str, dict] = {}

    def run(name, fn):
        t0 = time.monotonic()
        results[name] = fn()
        results[name]["sec"] = round(time.monotonic() - t0, 3)

    algos = {a.strip() for a in args.algos.split(",") if a.strip()}
    unknown = algos - {"cc", "lpa", "triangles", "bfs", "sssp", "hits",
                       "katz", "kcore", "coreness", "ppr", "scc", "wpr", "lcc",
                       "degdist",
                       "linkpred", "harmonic", "walks", "condense", "ktruss",
                       "diameter", "eigen", "closeness", "bipartite", "mis",
                       "levels", "betweenness", "neighborhood", "coreness",
                       "msf", "coloring", "densest", "rectangles",
                       "salsa", "matching", "coarsen", "spread",
                       "fiedler", "node2vec", "scan", "bowtie", "sweepcut",
                       "hyperharmonic"}
    if unknown:
        raise SystemExit(f"unknown algos: {sorted(unknown)}")

    if "cc" in algos:
        run("cc", lambda: {"components": connected_components(g.edges)
                           .select(F.countDistinct("component")).first()[0]})
    if "lpa" in algos:
        run("lpa", lambda: {"labels": label_propagation(
            g.edges, max_iter=args.max_iter)
            .select(F.countDistinct("label")).first()[0]})
    if "triangles" in algos:
        run("triangles", lambda: {"count": triangles(g.edges).count()})
    if "bfs" in algos:
        def _bfs():
            d = bfs_depths(g.edges, [args.source])
            row = d.agg(F.count(F.lit(1)).alias("n"),
                        F.max("depth").alias("m")).first()
            return {"reached": row["n"], "max_depth": row["m"]}
        run("bfs", _bfs)
    if "sssp" in algos:
        def _sssp():
            d = shortest_paths(weighted_edges(), [args.source])
            row = d.agg(F.count(F.lit(1)).alias("n"),
                        F.max("dist").alias("m")).first()
            return {"reached": row["n"], "max_dist": row["m"]}
        run("sssp", _sssp)
    if "hits" in algos:
        def _hits():
            h = hits(g.edges, n=g.n, max_iter=args.max_iter)
            top = h.orderBy(F.desc("auth"), F.asc("id")).first()
            return {"top_auth_id": top["id"], "top_auth": top["auth"]}
        run("hits", _hits)
    if "salsa" in algos:
        from pagerank_spark.operators.salsa import salsa

        def _salsa():
            s = salsa(g.edges, n=g.n, max_iter=args.max_iter, tol=0.0)
            top = s.orderBy(F.desc("auth"), F.asc("id")).first()
            return {"top_auth_id": top["id"], "top_auth": top["auth"]}
        run("salsa", _salsa)
    if "katz" in algos:
        def _katz():
            r = katz_centrality(g, alpha=args.katz_alpha,
                                max_iter=args.max_iter, tol=0.0)
            top = r.ranks.orderBy(F.desc("katz"), F.asc("id")).first()
            return {"iterations": r.iterations,
                    "top_id": top["id"], "top_katz": top["katz"]}
        run("katz", _katz)
    if "kcore" in algos:
        run("kcore", lambda: {"k": args.k,
                              "survivors": k_core(g.edges, args.k).count()})
    if "msf" in algos:
        def _msf():
            from pagerank_spark.operators.msf import minimum_spanning_forest
            f = minimum_spanning_forest(weighted_edges())
            agg = f.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("weight").alias("total")).first()
            return {"forest_edges": agg["n"], "total_weight": agg["total"]}
        run("msf", _msf)
    if "coreness" in algos:
        def _coreness():
            cd = core_decomposition(g.edges)
            agg = cd.agg(F.max("coreness").alias("degeneracy"),
                         F.count(F.lit(1)).alias("n")).first()
            return {"degeneracy": agg["degeneracy"], "vertices": agg["n"]}
        run("coreness", _coreness)
    if "ppr" in algos:
        def _ppr():
            r = personalized_pagerank(g, [args.source],
                                      max_iter=args.max_iter)
            top = r.ranks.orderBy(F.desc("pr"), F.asc("id")).first()
            return {"iterations": r.iterations,
                    "top_id": top["id"], "top_pr": top["pr"]}
        run("ppr", _ppr)
    if "scc" in algos:
        run("scc", lambda: {"components": strongly_connected_components(
            g.edges, n=g.n).select(F.countDistinct("scc")).first()[0]})
    if "wpr" in algos:
        def _wpr():
            r = weighted_pagerank(weighted_edges(), max_iter=args.max_iter)
            top = r.ranks.orderBy(F.desc("pr"), F.asc("id")).first()
            return {"top_id": top["id"], "top_pr": top["pr"]}
        run("wpr", _wpr)
    if "lcc" in algos:
        def _lcc():
            c = clustering_coefficients(g.edges)
            row = c.agg(F.count(F.lit(1)).alias("n"),
                        F.avg("lcc").alias("avg")).first()
            return {"vertices": row["n"], "avg_lcc": row["avg"]}
        run("lcc", _lcc)
    if "degdist" in algos:
        def _dd():
            d = degree_distribution(g.edges)
            row = d.agg(F.max("out_deg").alias("mx"),
                        F.count(F.lit(1)).alias("buckets")).first()
            return {"max_out_deg": row["mx"], "buckets": row["buckets"]}
        run("degdist", _dd)

    if "linkpred" in algos:
        from pagerank_spark.operators.linkpred import link_prediction

        def _lp():
            top = link_prediction(g.edges, max_center_degree=args.max_center,
                                  top_k=1).first()
            return ({"top_pair": [top["u"], top["v"]],
                     "aa_q6": top["aa_q6"]} if top else {"top_pair": None})
        run("linkpred", _lp)
    if "harmonic" in algos:
        from pagerank_spark.operators.centrality import harmonic_centrality

        def _harm():
            h = harmonic_centrality(g.edges, [args.source])
            row = h.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("harmonic_q6").alias("s")).first()
            return {"scored": row["n"], "sum_q6": row["s"]}
        run("harmonic", _harm)
    if "betweenness" in algos:
        from pagerank_spark.operators.betweenness import betweenness

        def _bet():
            b = betweenness(g.edges, [args.source])
            row = b.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("bet_q9").alias("s")).first()
            return {"scored": row["n"], "sum_q9": row["s"]}
        run("betweenness", _bet)
    if "walks" in algos:
        from pagerank_spark.operators.walks import random_walks

        run("walks", lambda: {"rows": random_walks(
            g.edges, num_steps=args.walk_steps).count()})
    if "node2vec" in algos:
        from pagerank_spark.operators.walks import node2vec_walks

        run("node2vec", lambda: {"rows": node2vec_walks(
            g.edges, num_steps=args.walk_steps).count()})
    if "scan" in algos:
        from pagerank_spark.operators.scan import scan_clusters

        def _scan():
            out = scan_clusters(g.edges, eps_num=2, eps_den=5, mu=3)
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("cluster").alias("clusters"),
                F.sum(F.col("is_core").cast("long")).alias("cores"),
            ).first()
            return {"clustered": row["n"], "clusters": row["clusters"],
                    "cores": int(row["cores"] or 0)}

        run("scan", _scan)
    if "bowtie" in algos:
        from pagerank_spark.operators.scc import bowtie_regions

        def _bowtie():
            rows = bowtie_regions(g.edges, n=g.n).groupBy(
                "region").count().collect()
            return {r["region"]: r["count"] for r in rows}

        run("bowtie", _bowtie)
    if "sweepcut" in algos:
        from pagerank_spark.operators.localcluster import (
            best_local_cluster, sweep_cut)

        def _sweep():
            best = best_local_cluster(
                sweep_cut(g, args.source, max_iter=args.max_iter,
                          max_prefix=32)).first()
            if best is None:          # seed unreachable / empty prefix
                return {"k": 0, "cut": 0, "vol": 0, "phi_q6": None}
            return {"k": best["k"], "cut": best["cut"],
                    "vol": best["vol"], "phi_q6": best["phi_q6"]}

        run("sweepcut", _sweep)
    if "hyperharmonic" in algos:
        from pagerank_spark.operators.neighborhood import hyperball_harmonic

        def _hh():
            row = hyperball_harmonic(g.edges, 3).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("harmonic_q").alias("sum_q")).first()
            return {"scored": row["n"], "sum_q": int(row["sum_q"] or 0)}

        run("hyperharmonic", _hh)
    if "condense" in algos:
        from pagerank_spark.operators.scc import scc_condensation

        run("condense", lambda: {"cross_edges": scc_condensation(
            g.edges, n=g.n).count()})
    if "ktruss" in algos:
        from pagerank_spark.operators.truss import k_truss

        run("ktruss", lambda: {"k": args.k,
                               "edges": k_truss(g.edges, args.k).count()})
    if "eigen" in algos:
        from pagerank_spark.operators.eigencentrality import (
            eigenvector_centrality)

        def _eigen():
            r = eigenvector_centrality(g, max_iter=args.max_iter, tol=0.0)
            top = r.ranks.orderBy(F.desc("eigen"), F.asc("id")).first()
            return {"iterations": r.iterations,
                    "top_id": top["id"], "top_eigen": top["eigen"]}
        run("eigen", _eigen)
    if "closeness" in algos:
        from pagerank_spark.operators.centrality import closeness_centrality

        def _close():
            c = closeness_centrality(g.edges, [args.source])
            row = c.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("closeness_q6").alias("s")).first()
            return {"scored": row["n"], "sum_q6": row["s"]}
        run("closeness", _close)
    if "bipartite" in algos:
        from pagerank_spark.operators.structure import bipartite_check

        def _bip():
            b = bipartite_check(g.edges)
            row = b.agg(
                F.count(F.lit(1)).alias("comps"),
                F.sum(F.col("is_bipartite").cast("int")).alias("bip"),
                F.sum("odd_edges").alias("odd")).first()
            return {"components": row["comps"],
                    "bipartite": row["bip"], "odd_edges": row["odd"]}
        run("bipartite", _bip)
    if "mis" in algos:
        from pagerank_spark.operators.mis import maximal_independent_set

        def _mis():
            m = maximal_independent_set(g.edges)
            row = m.agg(F.count(F.lit(1)).alias("n"),
                        F.max("mis_round").alias("r")).first()
            return {"size": row["n"], "rounds": row["r"]}
        run("mis", _mis)
    if "coloring" in algos:
        from pagerank_spark.operators.coloring import greedy_coloring

        def _coloring():
            c = greedy_coloring(g.edges)
            row = c.agg(F.count(F.lit(1)).alias("n"),
                        F.max("color").alias("cmax")).first()
            return {"vertices": row["n"], "colors": row["cmax"] + 1}
        run("coloring", _coloring)
    if "fiedler" in algos:
        from pagerank_spark.operators.spectral import fiedler_vector

        def _fiedler():
            v = fiedler_vector(g.edges, n=g.n, iterations=args.max_iter)
            row = v.agg(
                F.sum(F.when(F.col("fiedler") > 0, 1).otherwise(0))
                .alias("pos"),
                F.round(F.sum(F.col("fiedler") * F.col("fiedler")), 6)
                .alias("nrm2")).first()
            return {"positive_side": int(row["pos"] or 0),
                    "norm2": row["nrm2"]}
        run("fiedler", _fiedler)
    if "spread" in algos:
        from pagerank_spark.operators.labelspread import (
            label_spreading, modular_seeds)

        def _spread():
            out = label_spreading(
                g.edges, modular_seeds(g.edges, 16, 4),
                alpha=0.85, iterations=args.max_iter)
            row = out.agg(F.count(F.lit(1)).alias("labeled"),
                          F.countDistinct("label").alias("classes")).first()
            return {"labeled": row["labeled"], "classes": row["classes"]}
        run("spread", _spread)
    if "matching" in algos or "coarsen" in algos:
        from pagerank_spark.operators.matching import (
            coarsen_graph, maximal_matching)

        matching = maximal_matching(g.edges, seed=args.seed)
        if "matching" in algos:
            def _matching():
                row = matching.agg(
                    F.count(F.lit(1)).alias("pairs"),
                    F.max("match_round").alias("rounds")).first()
                return {"pairs": row["pairs"],
                        "rounds": row["rounds"] or 0}
            run("matching", _matching)
        if "coarsen" in algos:
            def _coarsen():
                c = coarsen_graph(g.edges, matching)
                row = c.agg(F.count(F.lit(1)).alias("edges"),
                            F.sum("weight").alias("wsum")).first()
                return {"edges": row["edges"],
                        "weight_sum": int(row["wsum"] or 0)}
            run("coarsen", _coarsen)
    if "densest" in algos:
        from pagerank_spark.operators.densest import densest_subgraph

        def _densest():
            r = densest_subgraph(g.edges)
            return {"density": round(r.density, 6),
                    "vertices": r.n_vertices, "edges": r.n_edges,
                    "best_round": r.best_round, "rounds": r.rounds}
        run("densest", _densest)
    if "rectangles" in algos:
        from pagerank_spark.operators.motifs import rectangle_count

        def _rectangles():
            row = rectangle_count(
                g.edges, max_degree=args.rect_max_degree).first()
            return {"rectangles": row["n_rectangles"],
                    "wedge_pairs": row["n_wedge_pairs"],
                    "vertices_counted": row["n_vertices_counted"],
                    "max_degree": args.rect_max_degree}
        run("rectangles", _rectangles)
    if "levels" in algos:
        from pagerank_spark.operators.scc import condensation_levels

        def _levels():
            lv = condensation_levels(g.edges, n=g.n)
            row = lv.agg(F.count(F.lit(1)).alias("sccs"),
                         F.max("level").alias("depth")).first()
            return {"sccs": row["sccs"], "dag_depth": row["depth"]}
        run("levels", _levels)
    if "neighborhood" in algos:
        from pagerank_spark.operators.neighborhood import (
            neighborhood_function)

        def _nf():
            nf = neighborhood_function(g.edges, 3)
            row = nf.agg(F.count(F.lit(1)).alias("n"),
                         F.sum("sum_rho").alias("sr"),
                         F.max("ball_est").alias("mb")).first()
            return {"vertices": row["n"], "sum_rho": row["sr"],
                    "max_ball_est": row["mb"]}
        run("neighborhood", _nf)
    if "diameter" in algos:
        def _diam():
            d1 = bfs_depths(g.edges, [args.source])
            far = d1.orderBy(F.desc("depth"), F.asc("id")).first()
            d2 = bfs_depths(g.edges, [int(far["id"])])
            return {"far_id": far["id"],
                    "diameter_lb": d2.agg(F.max("depth")).first()[0]}
        run("diameter", _diam)

    out = {"n_edges": g.edges.count(), "n_vertices": g.n, "algos": results}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
