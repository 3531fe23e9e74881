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
