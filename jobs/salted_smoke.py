#!/usr/bin/env python
"""Salted-gather scale smoke (VERDICT r3 item 1 at scale): run the
PPR / weighted-PR / HITS loops on the 578M-edge power-law graph with
the broadcast bound forced to 0, so the shared ``plan_gather`` degree
probe must pick the hub-salted join, and compare the top-k rows
bit-for-bit against the broadcast-mode run of the same operator.

Also peels k_core with a forced durable checkpoint cadence to verify
the round-4 plan-growth fix holds at the |2E| = 1.16B-row scale.

    python jobs/salted_smoke.py --edges /path/edges.parquet --cpus 32

Results recorded in BENCH/SCALE_SMOKE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--edges", required=True,
                   help="prepared (deduped) edge parquet, e.g. the "
                        "bench_scaling synthesis output")
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--max-iter", type=int, default=8)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--algos", default="ppr,wpr,hits,kcore")
    p.add_argument("--kcore-k", type=int, default=20000)
    args = p.parse_args()
    algos = set(args.algos.split(","))

    from pyspark.sql import functions as F

    from pagerank_spark import graph as G
    from pagerank_spark.operators.ppr import personalized_pagerank
    from pagerank_spark.operators.structure import k_core
    from pagerank_spark.operators.weighted import weighted_pagerank
    from pagerank_spark.checkpoint import CheckpointManager
    from pagerank_spark.session import get_spark
    import importlib

    # the operators package re-exports the hits FUNCTION, shadowing
    # the submodule attribute — resolve the module explicitly
    hits_mod = importlib.import_module("pagerank_spark.operators.hits")

    spark = get_spark(app_name="salted_smoke",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    edges = spark.read.parquet(args.edges)
    g = G.prepare_prebuilt(edges)
    out: dict = {"metric": "salted_smoke", "n_edges": g.edges.count(),
                 "n_vertices": g.n, "results": {}}

    def timed(name, fn):
        t0 = time.monotonic()
        rows = fn()
        dt = round(time.monotonic() - t0, 1)
        out["results"][name] = {"sec": dt, "top": rows}
        print(f"{name}: {dt}s top={rows}", file=sys.stderr)
        return rows

    def top_rows(df, cols):
        return [tuple(r) for r in
                df.orderBy(*[F.desc(c) for c in cols], F.asc("id"))
                  .limit(args.topk).collect()]

    def same(a, b):
        """Same ids; values equal to last-ulp noise (the different
        physical plan changes the partial-sum order — the honest
        float contract, same as the pytest equivalence tests)."""
        if len(a) != len(b):
            return False
        for ra, rb in zip(a, b):
            if ra[0] != rb[0]:
                return False
            for va, vb in zip(ra[1:], rb[1:]):
                if abs(va - vb) > 1e-12 * max(abs(va), abs(vb), 1e-300):
                    return False
        return True

    if "ppr" in algos:
        b = timed("ppr_broadcast", lambda: top_rows(
            personalized_pagerank(g, [0], max_iter=args.max_iter).ranks,
            ["pr"]))
        s = timed("ppr_salted", lambda: top_rows(
            personalized_pagerank(g, [0], max_iter=args.max_iter,
                                  broadcast_max_vertices=0).ranks, ["pr"]))
        assert same(b, s), ("ppr salted != broadcast", b, s)
    if "wpr" in algos:
        ew = g.edges.select(
            "src", "dst", ((F.col("src") % 7) + 1).cast("double")
            .alias("weight"))
        b = timed("wpr_broadcast", lambda: top_rows(
            weighted_pagerank(ew, max_iter=args.max_iter).ranks, ["pr"]))
        s = timed("wpr_salted", lambda: top_rows(
            weighted_pagerank(ew, max_iter=args.max_iter,
                              broadcast_max_vertices=0).ranks, ["pr"]))
        assert same(b, s), ("wpr salted != broadcast", b, s)
    if "hits" in algos:
        b = timed("hits_broadcast", lambda: top_rows(
            hits_mod.hits(g.edges, n=g.n, max_iter=args.max_iter, tol=0.0),
            ["auth", "hub"]))
        hits_mod.BROADCAST_MAX_VERTICES = 0
        s = timed("hits_salted", lambda: top_rows(
            hits_mod.hits(g.edges, n=g.n, max_iter=args.max_iter, tol=0.0),
            ["auth", "hub"]))
        assert same(b, s), ("hits salted != broadcast", b, s)
    if "kcore" in algos:
        import tempfile

        ck = CheckpointManager(
            spark, tempfile.mkdtemp(prefix="kcore_smoke_"), interval=2)
        timed(f"kcore_{args.kcore_k}_durable", lambda: [
            k_core(g.edges, args.kcore_k, checkpoint=ck).count(),
            len(ck.committed_iterations())])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
