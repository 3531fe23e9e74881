from __future__ import annotations

from pyspark.sql import functions as F

from conftest import edges_df
from oracles import F2_EDGES
from pagerank_spark import graph


def test_dedupe_and_out_degrees(spark):
    g = graph.prepare(edges_df(spark, F2_EDGES))
    assert g.edges.count() == 6  # duplicate (0,1) dropped
    deg = {r["id"]: r["out_deg"] for r in g.out_deg.collect()}
    # vertex 0: out-degree 2 NOT 3 (duplicate line must not inflate it)
    assert deg == {0: 2, 1: 1, 2: 2, 3: 1}


def test_vertex_domain_includes_gaps(spark):
    # FIXTURES.md F4 "isolated-id gap": edges {0→2} ⇒ N=3, vertex 1
    # in-domain despite never appearing (reference quirk Q3).
    g = graph.prepare(edges_df(spark, [(0, 2)]))
    assert g.n == 3


def test_in_adjacency_sorted(spark):
    g = graph.prepare(edges_df(spark, F2_EDGES))
    adj = {r["dst"]: r["srcs"] for r in graph.in_adjacency(g.edges).collect()}
    assert adj[2] == [0, 1, 3]
    assert adj[1] == [0]
    assert adj[0] == [2]
    assert adj[4] == [2]


def test_symmetrize(spark):
    und = graph.symmetrize(edges_df(spark, [(0, 1), (1, 0), (2, 2), (1, 2)]))
    rows = {(r["src"], r["dst"]) for r in und.collect()}
    assert rows == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_in_adjacency_salted_bounds_hub_rows(spark):
    # Mega-hub dst 0 with 1000 in-neighbors; cold dst 2000 with 2.
    edges = [(i, 0) for i in range(1, 1001)] + [(1, 2000), (2, 2000)]
    adj = graph.in_adjacency_salted(edges_df(spark, edges),
                                    hot_threshold=100, num_salts=8)
    rows = adj.collect()
    hub = [r for r in rows if r["dst"] == 0]
    cold = [r for r in rows if r["dst"] == 2000]
    # Hub split into 8 chunks of 125 (salt = src % 8 over 1..1000):
    assert len(hub) == 8
    assert max(len(r["srcs"]) for r in hub) == 125
    # Cold dst keeps one salt-0 row, identical to the unsalted layout:
    assert len(cold) == 1 and cold[0]["salt"] == 0
    assert cold[0]["srcs"] == [1, 2]
    # Flattened union reproduces the unsalted adjacency exactly:
    merged = sorted(s for r in hub for s in r["srcs"])
    assert merged == list(range(1, 1001))
    # Every chunk is internally sorted:
    for r in hub:
        assert r["srcs"] == sorted(r["srcs"])


def test_encode_dense_ids_two_level_matches_global_sort(spark):
    # 5000 names through the two-level encode must reproduce the global
    # sorted row_number()-1 mapping bit-for-bit, with NO single-partition
    # exchange/window in the plan.
    import random

    rng = random.Random(7)
    names = [f"repo-{rng.randrange(10**9):09d}" for _ in range(5000)]
    names = list(dict.fromkeys(names))
    rows = [(names[i], names[(i * 17 + 1) % len(names)])
            for i in range(len(names))]
    df = spark.createDataFrame(rows, "src_repo STRING, dst_repo STRING")
    enc, dictionary = graph.encode_dense_ids(df, partitions=8)
    got = {r["name"]: r["id"] for r in dictionary.collect()}
    want = {n: i for i, n in enumerate(sorted(got))}
    assert got == want
    plan = dictionary._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # Round-trip: decoding the encoded edges recovers the name pairs.
    back = {(r["src"], r["dst"]) for r in enc.collect()}
    assert back == {(want[a], want[b]) for a, b in rows}


def test_encode_dense_ids_deterministic(spark):
    df = spark.createDataFrame(
        [("r/b", "r/a"), ("r/c", "r/b"), ("r/a", "r/c")],
        "src_repo STRING, dst_repo STRING",
    )
    enc, dictionary = graph.encode_dense_ids(df)
    d = {r["name"]: r["id"] for r in dictionary.collect()}
    assert d == {"r/a": 0, "r/b": 1, "r/c": 2}  # sorted row_number()-1
    edges = {(r["src"], r["dst"]) for r in enc.collect()}
    assert edges == {(1, 0), (2, 1), (0, 2)}


def test_sized_shuffle_scopes_and_restores(spark):
    from pagerank_spark.session import sized_shuffle

    key = "spark.sql.shuffle.partitions"
    base = spark.conf.get(key)
    with sized_shuffle(spark, 2):
        assert spark.conf.get(key) == "2"
    assert spark.conf.get(key) == base
    # >= the session width (and None) are no-ops:
    with sized_shuffle(spark, int(base) + 100):
        assert spark.conf.get(key) == base
    with sized_shuffle(spark, None):
        assert spark.conf.get(key) == base
    # restored even when the loop body raises:
    try:
        with sized_shuffle(spark, 2):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == base
