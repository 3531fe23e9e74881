"""HITS / clustering coefficient / k-core / degree distribution vs
exact fixtures and brute-force NumPy oracles (SURVEY.md §5 strategy:
constructed graphs with known answers + seeded random cross-checks)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from conftest import edges_df
from pagerank_spark.operators import (
    clustering_coefficients,
    degree_distribution,
    hits,
    k_core,
)


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def hits_oracle(edges, n, k):
    A = np.zeros((n, n))
    for s, d in set(edges):
        A[s, d] = 1.0
    h, a = np.ones(n), np.zeros(n)
    for _ in range(k):
        a_un = A.T @ h
        h_un = A @ a_un
        a = a_un / np.linalg.norm(a_un)
        h = h_un / np.linalg.norm(h_un)
    return h, a


def lcc_oracle(edges):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    for v, ns in nbrs.items():
        deg = len(ns)
        if deg < 2:
            continue
        tri = sum(1 for a in ns for b in ns if a < b and b in nbrs.get(a, ()))
        out[v] = (deg, tri, 2.0 * tri / (deg * (deg - 1)))
    return out


def kcore_oracle(edges, k):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    alive = set(nbrs)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if sum(1 for u in nbrs[v] if u in alive) < k:
                alive.discard(v)
                changed = True
    return alive


# ---------------------------------------------------------------- HITS

def test_hits_two_hub_fixture(spark):
    # 0 and 1 both point at {2, 3}; 4 points only at 2.  2 is the top
    # authority; 0/1 are the (equal) top hubs.
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2)]
    res = {r["id"]: (r["hub"], r["auth"])
           for r in hits(edges_df(spark, edges), max_iter=30).collect()}
    h, a = hits_oracle(edges, 5, 30)
    for v in range(5):
        assert res[v][0] == pytest.approx(h[v], abs=1e-9)
        assert res[v][1] == pytest.approx(a[v], abs=1e-9)
    assert max(res, key=lambda v: res[v][1]) == 2
    assert res[0][0] == pytest.approx(res[1][0])


def test_hits_random_graph_matches_oracle(spark):
    rng = random.Random(7)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    k = 12
    res = {r["id"]: (r["hub"], r["auth"])
           for r in hits(edges_df(spark, edges), n=n, max_iter=k).collect()}
    h, a = hits_oracle(edges, n, k)
    assert len(res) == n
    for v in range(n):
        assert res[v][0] == pytest.approx(h[v], abs=1e-8)
        assert res[v][1] == pytest.approx(a[v], abs=1e-8)


def test_hits_duplicate_edges_ignored(spark):
    edges = [(0, 1), (0, 1), (0, 1), (2, 1)]
    res = {r["id"]: r["hub"]
           for r in hits(edges_df(spark, edges), max_iter=10).collect()}
    # Multiplicity deduped: 0 and 2 are equal hubs.
    assert res[0] == pytest.approx(res[2])


def test_hits_empty(spark):
    assert hits(edges_df(spark, []).limit(0), max_iter=3).count() == 0


# ----------------------------------------------- clustering coefficient

def test_lcc_clique_is_one(spark):
    res = {r["id"]: r["lcc"]
           for r in clustering_coefficients(
               edges_df(spark, _clique(range(4)))).collect()}
    assert res == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}


def test_lcc_triangle_with_pendant(spark):
    # Triangle {0,1,2} + pendant 3 hanging off 0: lcc(0) = 1/3 (deg 3,
    # one triangle), lcc(1) = lcc(2) = 1, 3 omitted (degree 1).
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    rows = {r["id"]: (r["deg"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(edges_df(spark, edges)).collect()}
    assert rows[0] == (3, 1, pytest.approx(1 / 3))
    assert rows[1] == (2, 1, pytest.approx(1.0))
    assert rows[2] == (2, 1, pytest.approx(1.0))
    assert 3 not in rows


def test_lcc_star_is_zero(spark):
    rows = {r["id"]: r["lcc"]
            for r in clustering_coefficients(
                edges_df(spark, [(0, i) for i in range(1, 6)])).collect()}
    assert rows == {0: 0.0}


def test_lcc_random_graph_matches_oracle(spark):
    rng = random.Random(11)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    rows = {r["id"]: (r["deg"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(edges_df(spark, edges)).collect()}
    oracle = lcc_oracle(edges)
    assert rows.keys() == oracle.keys()
    for v, (deg, tri, lcc) in oracle.items():
        assert rows[v][0] == deg
        assert rows[v][1] == tri
        assert rows[v][2] == pytest.approx(lcc)


# ---------------------------------------------------------------- k-core

def test_kcore_two_cliques_and_chain(spark):
    # 5-clique + 4-clique joined by a chain through 20: chain vertices
    # have degree 2, so the 3-core is both cliques; the 4-core is the
    # 5-clique alone.
    edges = (_clique(range(5)) + _clique(range(10, 14))
             + [(4, 20), (20, 10)])
    df = edges_df(spark, edges)
    assert {r["id"] for r in k_core(df, 3).collect()} == set(range(5)) | set(range(10, 14))
    assert {r["id"] for r in k_core(df, 4).collect()} == set(range(5))
    assert k_core(df, 5).count() == 0


def test_kcore_peel_cascade(spark):
    # Path 0-1-2-3 + triangle {3,4,5}: 2-core must cascade the whole
    # path away (0 goes, then 1, then 2), leaving only the triangle.
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    got = {r["id"] for r in k_core(edges_df(spark, edges), 2).collect()}
    assert got == {3, 4, 5}


def test_kcore_k1_and_random_matches_oracle(spark):
    rng = random.Random(13)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    df = edges_df(spark, edges)
    for k in (1, 2, 3, 4):
        got = {r["id"] for r in k_core(df, k).collect()}
        assert got == kcore_oracle(edges, k), f"k={k}"


# ------------------------------------------------- degree distribution

def test_degree_distribution_star(spark):
    # Star 0→{1..5}: one vertex of out-degree 5, five dangling.
    rows = {r["out_deg"]: r["n_vertices"]
            for r in degree_distribution(
                edges_df(spark, [(0, i) for i in range(1, 6)])).collect()}
    assert rows == {5: 1, 0: 5}


def test_degree_distribution_counts_sum_to_domain(spark):
    rng = random.Random(17)
    edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(200)})
    rows = degree_distribution(edges_df(spark, edges)).collect()
    n = max(max(s, d) for s, d in edges) + 1
    assert sum(r["n_vertices"] for r in rows) == n
    assert sum(r["out_deg"] * r["n_vertices"] for r in rows) == len(set(edges))


# ------------------------------------------------------------------ sssp

from pagerank_spark.operators.sssp import shortest_paths  # noqa: E402


def _wdf(spark, edges):
    return spark.createDataFrame(
        edges, "src BIGINT, dst BIGINT, weight DOUBLE")


def sssp_oracle(edges, source, directed=False):
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = dd + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_prefers_light_detour(spark):
    # Direct hop 0->2 costs 10; the detour through 1 costs 3.
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 10.0)]
    rows = {r["id"]: r["dist"]
            for r in shortest_paths(_wdf(spark, edges), [0]).collect()}
    assert rows == {0: 0.0, 1: 1.0, 2: 3.0}


def test_sssp_directed_unreachable(spark):
    edges = [(0, 1, 5.0), (2, 1, 1.0)]
    rows = {r["id"]: r["dist"]
            for r in shortest_paths(
                _wdf(spark, edges), [0], directed=True).collect()}
    assert rows == {0: 0.0, 1: 5.0}  # 2 unreachable following direction


def test_sssp_uniform_weights_match_bfs(spark):
    import random

    from pagerank_spark.operators import bfs_depths

    rng = random.Random(23)
    n = 40
    raw = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    ew = _wdf(spark, [(s, d, 1.0) for s, d in raw])
    got = {r["id"]: r["dist"] for r in shortest_paths(ew, [0]).collect()}
    depths = {r["id"]: r["depth"] for r in bfs_depths(
        spark.createDataFrame(raw, "src BIGINT, dst BIGINT"), [0]).collect()}
    assert got == {k: float(v) for k, v in depths.items()}


def test_sssp_random_matches_dijkstra(spark):
    import random

    rng = random.Random(29)
    n = 30
    raw = list({(rng.randrange(n), rng.randrange(n)) for _ in range(100)})
    edges = [(s, d, float((s + d) % 7 + 1)) for s, d in raw if s != d]
    rows = {r["id"]: r["dist"]
            for r in shortest_paths(_wdf(spark, edges), [0]).collect()}
    oracle = sssp_oracle(edges, 0)
    assert rows.keys() == oracle.keys()
    for v, dd in oracle.items():
        assert rows[v] == pytest.approx(dd)


# ----------------------------------------------------- assortativity

from pagerank_spark.operators.structure import degree_assortativity  # noqa: E402


def test_assortativity_star_is_minus_one(spark):
    # Star: every pair couples degree 1 with degree n-1 — perfect
    # disassortativity.
    row = degree_assortativity(
        edges_df(spark, [(0, i) for i in range(1, 8)])).first()
    assert row["n_directed_pairs"] == 14
    assert row["assortativity"] == pytest.approx(-1.0)


def test_assortativity_matches_numpy(spark):
    rng = random.Random(31)
    n = 30
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    row = degree_assortativity(edges_df(spark, edges)).first()
    # NumPy oracle over the same symmetric pair list
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    xs, ys = [], []
    for u, ns in nbrs.items():
        for v in ns:
            xs.append(len(nbrs[u]))
            ys.append(len(nbrs[v]))
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert row["n_directed_pairs"] == len(xs)
    assert row["assortativity"] == pytest.approx(want, abs=1e-9)


def test_hits_shuffle_mode_equals_broadcast(spark, monkeypatch):
    # Force the dual-layout shuffle path (as if |V| exceeded the
    # broadcast bound) and require bit-equal scores.
    import importlib

    # the package re-exports the hits FUNCTION, shadowing the
    # submodule attribute — resolve the module explicitly
    hits_mod = importlib.import_module("pagerank_spark.operators.hits")

    rng = random.Random(41)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    df = edges_df(spark, edges)
    want = {r["id"]: (r["hub"], r["auth"])
            for r in hits_mod.hits(df, n=n, max_iter=6).collect()}
    monkeypatch.setattr(hits_mod, "BROADCAST_MAX_VERTICES", 1)
    got = {r["id"]: (r["hub"], r["auth"])
           for r in hits_mod.hits(df, n=n, max_iter=6).collect()}
    assert got.keys() == want.keys()
    for v in want:
        # different physical plan => different partial-sum order;
        # agreement to last-ulp noise is the honest float contract
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-12)


def test_bfs_and_sssp_relayout_path_equals_broadcast(spark, monkeypatch):
    # Force the on-demand src re-layout (as if a frontier outgrew the
    # broadcast bound) in BOTH traversals and require identical
    # results — depths/dists are min-aggregates of exact values, so
    # equality is exact, not approximate.
    import importlib

    import pagerank_spark.operators.bfs as bfs_mod
    sssp_mod = importlib.import_module("pagerank_spark.operators.sssp")

    rng = random.Random(43)
    n = 30
    raw = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    df = edges_df(spark, raw)
    wdf = _wdf(spark, [(s, d, float((s + d) % 5 + 1)) for s, d in raw])

    want_d = {r["id"]: r["depth"] for r in bfs_mod.bfs_depths(df, [0]).collect()}
    want_s = {r["id"]: r["dist"]
              for r in sssp_mod.shortest_paths(wdf, [0]).collect()}

    monkeypatch.setattr(bfs_mod, "BROADCAST_MAX_FRONTIER", 0)
    monkeypatch.setattr(sssp_mod, "BROADCAST_MAX_FRONTIER", 0)
    got_d = {r["id"]: r["depth"] for r in bfs_mod.bfs_depths(df, [0]).collect()}
    got_s = {r["id"]: r["dist"]
             for r in sssp_mod.shortest_paths(wdf, [0]).collect()}
    assert got_d == want_d
    assert got_s == want_s


def test_kcore_deep_cascade_durable_cadence(spark, tmp_path):
    # A 60-vertex chain hanging off a triangle: k=2 peeling consumes
    # the chain ONE vertex per round (cascade depth >= 59 — the
    # worst-case shape for per-round plan growth), so the durable
    # checkpoint cadence must be what keeps the surviving plan
    # constant-size.  Survivors are exactly the triangle.
    from pagerank_spark.checkpoint import CheckpointManager
    from pagerank_spark.operators.structure import k_core

    chain = [(i, i + 1) for i in range(59)]          # 0-1-...-59
    tri = [(59, 200), (200, 201), (201, 202), (202, 200)]
    df = edges_df(spark, chain + tri)
    ck = CheckpointManager(spark, str(tmp_path / "kck"), interval=8)
    got = sorted(r["id"] for r in k_core(df, 2, checkpoint=ck).collect())
    assert got == [200, 201, 202]
    # the cascade ran long enough to hit the durable cadence many
    # times, and each hit committed a state + metrics row
    committed = ck.committed_iterations()
    assert len(committed) >= 6 and committed[0] == 8
    assert ck.read_metric(committed[-1], "survivors") is not None


# ------------------------------------------------- core decomposition

def _brute_coreness(edges):
    """Classic sequential min-degree peel (Batagelj-Zaversnik order)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = {v: set(ns) for v, ns in adj.items()}
    deg = {v: len(ns) for v, ns in alive.items()}
    out: dict[int, int] = {}
    k = 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        out[v] = k
        for u in alive[v]:
            alive[u].discard(v)
            deg[u] -= 1
        del alive[v], deg[v]
    allv = {s for s, _ in edges} | {d for _, d in edges}
    return {v: out.get(v, 0) for v in allv}


def test_coreness_two_cliques_and_chain(spark):
    from pagerank_spark.operators.structure import core_decomposition

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k3 = [(10, 11), (11, 12), (12, 10)]
    pendant = [(3, 20), (20, 21)]  # dangling path off K4
    edges = k4 + k3 + pendant
    got = {r["id"]: r["coreness"]
           for r in core_decomposition(edges_df(spark, edges)).collect()}
    assert got == _brute_coreness(edges)
    assert all(got[v] == 3 for v in range(4))      # K4 coreness 3
    assert all(got[v] == 2 for v in (10, 11, 12))  # K3 coreness 2
    assert got[20] == got[21] == 1                 # pendant path peels at 1


def test_coreness_random_matches_brute_peel(spark):
    from pagerank_spark.operators.structure import core_decomposition

    rng = random.Random(19)
    edges = list({(rng.randrange(50), rng.randrange(50))
                  for _ in range(170)})
    got = {r["id"]: r["coreness"]
           for r in core_decomposition(edges_df(spark, edges)).collect()}
    assert got == _brute_coreness(edges)


def test_coreness_slice_equals_k_core(spark):
    from pagerank_spark.operators.structure import core_decomposition, k_core

    rng = random.Random(23)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(140)})
    df = edges_df(spark, edges)
    cd = {r["id"]: r["coreness"] for r in core_decomposition(df).collect()}
    for k in (2, 3, max(cd.values())):
        want = sorted(v for v, c in cd.items() if c >= k)
        got = sorted(r["id"] for r in k_core(df, k).collect())
        assert got == want, k


def test_coreness_self_loop_only_vertex_is_zero(spark):
    from pagerank_spark.operators.structure import core_decomposition

    edges = [(0, 1), (1, 2), (2, 0), (9, 9)]
    got = {r["id"]: r["coreness"]
           for r in core_decomposition(edges_df(spark, edges)).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 9: 0}
