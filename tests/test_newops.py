"""Link prediction / multi-source BFS + harmonic centrality /
deterministic random walks / SCC condensation vs exact fixtures and
brute-force Python oracles (SURVEY.md §5 strategy: constructed graphs
with known answers + seeded random cross-checks)."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from conftest import edges_df
from pagerank_spark.operators.centrality import (
    HARMONIC_SCALE,
    harmonic_centrality,
    multi_source_bfs,
)
from pagerank_spark.operators.linkpred import AA_SCALE, link_prediction
from pagerank_spark.operators.scc import (
    scc_condensation,
    strongly_connected_components,
)
from pagerank_spark.operators.walks import random_walks


def _und_nbrs(edges):
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    return nbrs


# ------------------------------------------------------------ linkpred

def linkpred_oracle(edges, max_center_degree):
    nbrs = _und_nbrs(edges)
    scores: dict[tuple[int, int], list[int]] = {}
    for w, ns in nbrs.items():
        deg_w = len(ns)
        if deg_w < 2 or deg_w > max_center_degree:
            continue
        term = math.floor(AA_SCALE / math.log(deg_w))
        for u in ns:
            for v in ns:
                if u < v:
                    cn, aa = scores.get((u, v), (0, 0))
                    scores[(u, v)] = [cn + 1, aa + term]
    out = {}
    for (u, v), (cn, aa) in scores.items():
        if v in nbrs[u]:
            continue  # existing edge
        du, dv = len(nbrs[u]), len(nbrs[v])
        out[(u, v)] = (cn, du, dv, cn / (du + dv - cn), aa, du * dv)
    return out


def test_linkpred_path_fixture(spark):
    # Path 0-1-2-3: candidates (0,2) and (1,3), each via one center of
    # degree 2; for (0,2): deg 1 and 2, jaccard = 1/(1+2-1) = 0.5.
    edges = [(0, 1), (1, 2), (2, 3)]
    rows = {(r["u"], r["v"]): r
            for r in link_prediction(edges_df(spark, edges)).collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    r = rows[(0, 2)]
    assert r["common_neighbors"] == 1
    assert (r["deg_u"], r["deg_v"]) == (1, 2)
    assert r["jaccard"] == pytest.approx(1 / 2)
    assert r["aa_q6"] == math.floor(AA_SCALE / math.log(2))
    assert r["pref_attach"] == 2


def test_linkpred_center_cap_drops_hub(spark):
    # Star center 9 with 5 leaves: all C(5,2) leaf pairs are candidates
    # uncapped; capping the center degree below 5 leaves none.
    edges = [(9, i) for i in range(5)]
    full = link_prediction(edges_df(spark, edges)).collect()
    assert len(full) == 10
    capped = link_prediction(edges_df(spark, edges),
                             max_center_degree=4).collect()
    assert capped == []


def test_linkpred_random_vs_oracle(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    want = linkpred_oracle(edges, max_center_degree=8)
    got = {(r["u"], r["v"]):
           (r["common_neighbors"], r["deg_u"], r["deg_v"], r["jaccard"],
            r["aa_q6"], r["pref_attach"])
           for r in link_prediction(edges_df(spark, edges),
                                    max_center_degree=8).collect()}
    assert set(got) == set(want)
    for k, (cn, du, dv, jac, aa, pa) in want.items():
        gcn, gdu, gdv, gjac, gaa, gpa = got[k]
        assert (gcn, gdu, gdv, gaa, gpa) == (cn, du, dv, aa, pa)
        assert gjac == pytest.approx(jac)


def test_linkpred_topk_order(spark):
    rng = random.Random(3)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(80)})
    allrows = link_prediction(edges_df(spark, edges)).collect()
    top3 = link_prediction(edges_df(spark, edges), top_k=3).collect()
    want = sorted(allrows, key=lambda r: (-r["aa_q6"], r["u"], r["v"]))[:3]
    assert [(r["u"], r["v"]) for r in top3] == [
        (r["u"], r["v"]) for r in want]


# -------------------------------------------- multi-source BFS / harmonic

def bfs_oracle(edges, src, directed=False):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    depth = {src: 0}
    frontier = [src]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.append(v)
        frontier = nxt
    return depth


def test_msbfs_matches_per_source_bfs(spark):
    rng = random.Random(5)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(90)})
    sources = [0, 7, 13]
    got = {(r["source"], r["id"]): r["depth"]
           for r in multi_source_bfs(edges_df(spark, edges),
                                     sources).collect()}
    want = {(s, v): d for s in sources
            for v, d in bfs_oracle(edges, s).items()}
    assert got == want


def test_msbfs_directed_face(spark):
    edges = [(0, 1), (1, 2), (2, 3), (5, 2)]
    got = {(r["source"], r["id"]): r["depth"]
           for r in multi_source_bfs(edges_df(spark, edges), [0, 5],
                                     directed=True).collect()}
    want = {(s, v): d for s in (0, 5)
            for v, d in bfs_oracle(edges, s, directed=True).items()}
    assert got == want


def test_harmonic_fixture_and_quantization(spark):
    # Path 0-1-2-3 with landmarks {0, 3}: harmonic(1) = 1/1 + 1/2.
    edges = [(0, 1), (1, 2), (2, 3)]
    rows = {r["id"]: r for r in harmonic_centrality(
        edges_df(spark, edges), [0, 3]).collect()}
    assert rows[1]["n_reached"] == 2
    assert rows[1]["harmonic_q6"] == HARMONIC_SCALE + HARMONIC_SCALE // 2
    assert rows[1]["harmonic"] == pytest.approx(1.5)
    # A landmark sees the OTHER landmark at depth 3, never itself (d=0).
    assert rows[0]["n_reached"] == 1
    assert rows[0]["harmonic_q6"] == math.floor(HARMONIC_SCALE / 3)


def test_harmonic_random_vs_oracle(spark):
    rng = random.Random(17)
    edges = list({(rng.randrange(35), rng.randrange(35))
                  for _ in range(70)})
    landmarks = [1, 4, 9, 16]
    want: dict[int, list[int]] = {}
    for s in landmarks:
        for v, d in bfs_oracle(edges, s).items():
            if d > 0:
                want.setdefault(v, []).append(d)
    got = {r["id"]: (r["n_reached"], r["harmonic_q6"])
           for r in harmonic_centrality(edges_df(spark, edges),
                                        landmarks).collect()}
    assert got == {
        v: (len(ds), sum(math.floor(HARMONIC_SCALE / d) for d in ds))
        for v, ds in want.items()}


# ---------------------------------------------------------------- walks

def walk_oracle(edges, num_steps, directed=False):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for w in sorted(adj):
        cur = w
        out[(w, 0)] = w
        for t in range(1, num_steps + 1):
            ns = adj.get(cur)
            if not ns:
                break
            cur = min(ns, key=lambda v: (
                hashlib.md5(f"{w}:{t}:{v}".encode()).hexdigest()
                + str(v).zfill(12)))
            out[(w, t)] = cur
    return out


def test_walks_random_vs_oracle(spark):
    rng = random.Random(23)
    edges = list({(rng.randrange(25), rng.randrange(25))
                  for _ in range(60)})
    got = {(r["walk_id"], r["step"]): r["id"]
           for r in random_walks(edges_df(spark, edges),
                                 num_steps=4).collect()}
    assert got == walk_oracle(edges, 4)


def test_walks_deterministic_across_runs(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    a = sorted(map(tuple, random_walks(
        edges_df(spark, edges), num_steps=6).collect()))
    b = sorted(map(tuple, random_walks(
        edges_df(spark, edges), num_steps=6).collect()))
    assert a == b


def test_walks_directed_stops_on_sink(spark):
    # 0 -> 1 -> 2, directed: the walk from 2 has no step > 0; the walk
    # from 0 ends at 2 after two steps (single choice each hop).
    edges = [(0, 1), (1, 2)]
    got = {(r["walk_id"], r["step"]): r["id"]
           for r in random_walks(edges_df(spark, edges), num_steps=5,
                                 directed=True).collect()}
    assert got == walk_oracle(edges, 5, directed=True)
    assert (2, 1) not in got
    assert got[(0, 2)] == 2


def test_walks_explicit_starts(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    got = random_walks(edges_df(spark, edges), starts=[1],
                       num_steps=3).collect()
    assert {r["walk_id"] for r in got} == {1}
    assert len(got) == 4  # steps 0..3


# ------------------------------------------------------------ node2vec

def n2v_oracle(edges, num_steps, wr, wc, wf, directed=False):
    """Brute-force Python replay of operators/walks.py::node2vec_walks:
    step 1 uniform md5 pick, later steps the md5-keyed minimum over w
    integer copies per candidate, w by α class."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for w0 in sorted(adj):
        prev, cur = None, w0
        out[(w0, 0)] = w0
        for t in range(1, num_steps + 1):
            ns = adj.get(cur)
            if not ns:
                break
            if t == 1:
                cur, prev = min(ns, key=lambda v: (
                    hashlib.md5(f"{w0}:{t}:{v}".encode()).hexdigest()
                    + str(v).zfill(12))), cur
            else:
                best = None
                for v in ns:
                    wgt = (wr if v == prev
                           else wc if v in adj.get(prev, set())
                           else wf)
                    for c in range(1, wgt + 1):
                        key = (hashlib.md5(
                            f"{w0}:{t}:{v}#{c}".encode()).hexdigest()
                            + str(v).zfill(12))
                        if best is None or key < best[0]:
                            best = (key, v)
                if best is None:
                    break
                cur, prev = best[1], cur
            out[(w0, t)] = cur
    return out


def test_node2vec_vs_oracle(spark):
    from pagerank_spark.operators.walks import node2vec_walks

    rng = random.Random(31)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(50)})
    got = {(r["walk_id"], r["step"]): r["id"]
           for r in node2vec_walks(edges_df(spark, edges), num_steps=4,
                                   return_weight=1, common_weight=4,
                                   forward_weight=2).collect()}
    assert got == n2v_oracle(edges, 4, 1, 4, 2)


def test_node2vec_directed_vs_oracle(spark):
    from pagerank_spark.operators.walks import node2vec_walks

    rng = random.Random(37)
    edges = list({(rng.randrange(15), rng.randrange(15))
                  for _ in range(35)})
    got = {(r["walk_id"], r["step"]): r["id"]
           for r in node2vec_walks(edges_df(spark, edges), num_steps=5,
                                   return_weight=2, common_weight=3,
                                   forward_weight=1,
                                   directed=True).collect()}
    assert got == n2v_oracle(edges, 5, 2, 3, 1, directed=True)


def test_node2vec_zero_return_weight_never_backtracks_on_path(spark):
    from pagerank_spark.operators.walks import node2vec_walks

    # Path graph 0-1-2-3-4: from any interior vertex the only
    # non-backtracking hop is forward, so with return_weight=0 every
    # walk marches monotonically until it hits an endpoint, where the
    # ONLY candidate is the back-edge (weight 0 -> walker stops).
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    rows = node2vec_walks(edges_df(spark, edges), num_steps=6,
                          return_weight=0, common_weight=4,
                          forward_weight=2).collect()
    walks: dict[int, dict[int, int]] = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["id"]
    for w0, steps in walks.items():
        seq = [steps[t] for t in sorted(steps)]
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            assert c != a, f"walk {w0} backtracked: {seq}"
    assert got_matches_oracle_domain(walks, edges)


def got_matches_oracle_domain(walks, edges):
    verts = {v for e in edges for v in e}
    return set(walks) == verts


def test_node2vec_rejects_bad_weights(spark):
    from pagerank_spark.operators.walks import node2vec_walks

    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        node2vec_walks(df, return_weight=-1)
    with pytest.raises(ValueError):
        node2vec_walks(df, return_weight=0, common_weight=0,
                       forward_weight=0)
    with pytest.raises(ValueError):
        node2vec_walks(df, common_weight=1.5)  # type: ignore[arg-type]


def test_node2vec_deterministic_across_runs(spark):
    from pagerank_spark.operators.walks import node2vec_walks

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0)]
    a = sorted(map(tuple, node2vec_walks(
        edges_df(spark, edges), num_steps=5).collect()))
    b = sorted(map(tuple, node2vec_walks(
        edges_df(spark, edges), num_steps=5).collect()))
    assert a == b


# ---------------------------------------------------------- condensation

def test_scc_condensation_two_cycles(spark):
    # Cycle {0,1,2} -> cycle {3,4} via 2->3 (x2 parallel-ish via 1->4),
    # plus a DAG tail 4 -> 5.
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3),
             (2, 3), (1, 4), (4, 5)]
    out = {(r["scc_src"], r["scc_dst"]): r["n_edges"]
           for r in scc_condensation(edges_df(spark, edges), n=6).collect()}
    assert out == {(0, 3): 2, (3, 5): 1}


def test_scc_condensation_reuses_labels_and_is_acyclic(spark):
    rng = random.Random(29)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(50)})
    e = edges_df(spark, edges)
    labels = strongly_connected_components(e, n=20)
    cond = scc_condensation(e, labels=labels).collect()
    pairs = {(r["scc_src"], r["scc_dst"]) for r in cond}
    # No self-pairs, and the multiplicity sums to the cross-SCC edges.
    lbl = {r["id"]: r["scc"] for r in labels.collect()}
    want: dict[tuple[int, int], int] = {}
    for s, d in edges:
        if s != d and lbl[s] != lbl[d]:
            k = (lbl[s], lbl[d])
            want[k] = want.get(k, 0) + 1
    assert {(r["scc_src"], r["scc_dst"]): r["n_edges"]
            for r in cond} == want
    assert all(a != b for a, b in pairs)
    # Acyclic: no pair appears in both directions, and Kahn's peel
    # consumes every node of the condensation.
    assert not any((b, a) in pairs for a, b in pairs)
    nodes = {x for p in pairs for x in p}
    indeg = {v: 0 for v in nodes}
    for _, b in pairs:
        indeg[b] += 1
    order = [v for v in nodes if indeg[v] == 0]
    seen = 0
    while order:
        v = order.pop()
        seen += 1
        for a, b in pairs:
            if a == v:
                indeg[b] -= 1
                if indeg[b] == 0:
                    order.append(b)
    assert seen == len(nodes)


# ---------------------------------------------------------------- k-truss

def truss_oracle(edges, k):
    cur = {tuple(sorted((s, d))) for s, d in edges if s != d}
    if k <= 2:
        return cur
    while True:
        nbrs: dict[int, set[int]] = {}
        for a, b in cur:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        nxt = {e for e in cur
               if len(nbrs[e[0]] & nbrs[e[1]]) >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


def test_truss_clique_fixture(spark):
    from pagerank_spark.operators.truss import k_truss

    clique = _clique5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    got5 = {(r["lo"], r["hi"])
            for r in k_truss(edges_df(spark, clique), 5).collect()}
    assert got5 == set(clique)  # every edge has support 3
    assert k_truss(edges_df(spark, clique), 6).collect() == []
    # A pendant edge (support 0) peels off at k=3; its removal does
    # not disturb the clique core.
    got3 = {(r["lo"], r["hi"])
            for r in k_truss(edges_df(spark, clique + [(4, 9)]), 3).collect()}
    assert got3 == set(clique)


def test_truss_cascade_chain(spark):
    # Triangle strip (i, i+1) + (i, i+2): chords have support 1, spine
    # edges 2.  k=4 peels the chords in round 1, which starves the
    # spine (its triangles died with the chords) — a 2-round cascade
    # to empty.  A K4 welded on at the far end has support 2 on every
    # edge even after the strip dies, so it alone survives.
    from pagerank_spark.operators.truss import k_truss

    strip = [(i, i + 1) for i in range(6)] + [(i, i + 2) for i in range(5)]
    k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    edges = strip + k4 + [(6, 10)]  # bridge from strip end into K4
    got = {(r["lo"], r["hi"])
           for r in k_truss(edges_df(spark, edges), 4).collect()}
    assert got == truss_oracle(edges, 4)
    assert got == set(k4)


def test_truss_random_vs_oracle(spark):
    from pagerank_spark.operators.truss import k_truss

    rng = random.Random(31)
    edges = list({(rng.randrange(15), rng.randrange(15))
                  for _ in range(80)})
    for k in (3, 4):
        got = {(r["lo"], r["hi"])
               for r in k_truss(edges_df(spark, edges), k).collect()}
        assert got == truss_oracle(edges, k), k


def test_truss_k2_returns_all(spark):
    from pagerank_spark.operators.truss import k_truss

    edges = [(0, 1), (1, 0), (1, 2), (2, 2)]
    got = {(r["lo"], r["hi"])
           for r in k_truss(edges_df(spark, edges), 2).collect()}
    assert got == {(0, 1), (1, 2)}
