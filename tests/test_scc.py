from __future__ import annotations

import random
from collections import defaultdict

import pytest

from conftest import edges_df
from pagerank_spark.operators.scc import strongly_connected_components


def _kosaraju(edges, n):
    """Reference oracle: two-pass Kosaraju, iterative (no recursion
    limit), min-id component labels."""
    g, gr = defaultdict(list), defaultdict(list)
    for s, d in edges:
        g[s].append(d)
        gr[d].append(s)
    seen, order = set(), []
    for v in range(n):
        if v in seen:
            continue
        stack = [(v, iter(g[v]))]
        seen.add(v)
        while stack:
            u, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(g[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(u)
                stack.pop()
    comp = {}
    for v in reversed(order):
        if v in comp:
            continue
        stk, members = [v], []
        while stk:
            u = stk.pop()
            if u in comp:
                continue
            comp[u] = None
            members.append(u)
            stk.extend(w for w in gr[u] if w not in comp)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


def _run(spark, edges, n):
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    return {r["id"]: r["scc"]
            for r in strongly_connected_components(df, n=n).collect()}


def test_scc_cycle_plus_tail(spark):
    # 0→1→2→0 is one SCC; 2→3→4 is a trimmed tail of singletons.
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got = _run(spark, edges, 5)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}


def test_scc_dag_is_all_singletons(spark):
    # Pure DAG: TRIM alone must resolve everything.
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, edges, 5)
    assert got == {v: v for v in range(5)}


def test_scc_two_components_bridged(spark):
    # Two 3-cycles joined by a one-way bridge stay separate SCCs.
    edges = [(0, 1), (1, 2), (2, 0),
             (3, 4), (4, 5), (5, 3),
             (2, 3)]
    got = _run(spark, edges, 6)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_scc_dense_domain_includes_isolated(spark):
    # Domain quirk Q3: ids in [0, n) never mentioned in edges are
    # their own singletons.
    edges = [(1, 2), (2, 1)]
    got = _run(spark, edges, 6)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_scc_parallel_edges_and_self_loops(spark):
    # Duplicate edges and self-loops change nothing (no dedupe path).
    edges = [(0, 1), (0, 1), (1, 0), (1, 1), (2, 2)]
    got = _run(spark, edges, 3)
    assert got == {0: 0, 1: 0, 2: 2}


def test_scc_empty(spark):
    df = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert strongly_connected_components(df).count() == 0


@pytest.mark.parametrize("seed,n,m", [(7, 30, 60), (11, 50, 70),
                                      (13, 40, 160)])
def test_scc_matches_kosaraju_random(spark, seed, n, m):
    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    assert _run(spark, edges, n) == _kosaraju(edges, n)


def test_scc_forward_chain_worst_case(spark, tmp_path):
    # Chain of 2-cycles linked DOWN the id order: the min id (0)
    # reaches everything, so every outer round resolves exactly one
    # SCC and re-colors the remainder — the coloring algorithm's known
    # quadratic worst case (module docstring).  Kept SMALL; the point
    # is correctness under many outer rounds plus a live durable
    # cadence, not speed.
    from pagerank_spark.checkpoint import CheckpointManager

    k = 5
    edges = []
    for i in range(k):
        a, b = 2 * i, 2 * i + 1
        edges += [(a, b), (b, a)]
        if i + 1 < k:
            edges.append((b, 2 * (i + 1)))
    ck = CheckpointManager(spark, str(tmp_path / "scc"), interval=4)
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["id"]: r["scc"] for r in
           strongly_connected_components(df, n=2 * k,
                                         checkpoint=ck).collect()}
    want = {v: v - v % 2 for v in range(2 * k)}
    assert got == want
    assert len(ck.committed_iterations()) >= 1


def test_scc_backward_chain_single_round(spark):
    # Same chain linked UP the id order: every cycle keeps its own min
    # id as color (no smaller id reaches it), so ONE outer round
    # resolves all k SCCs in parallel — the shape real graphs take
    # once TRIM has eaten the DAG fringe.
    k = 20
    edges = []
    for i in range(k):
        a, b = 2 * i, 2 * i + 1
        edges += [(a, b), (b, a)]
        if i + 1 < k:
            edges.append((2 * (i + 1) + 1, a))
    got = _run(spark, edges, 2 * k)
    assert got == {v: v - v % 2 for v in range(2 * k)}


def test_scc_max_rounds_exhaustion_warns_and_completes_domain(spark):
    # Exhausting max_rounds mid-phase must NOT silently drop vertices:
    # the remaining active vertices are labeled as provisional
    # singletons and a RuntimeWarning says the run did not converge.
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]  # one 5-cycle
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    with pytest.warns(RuntimeWarning, match="max_rounds=1 exhausted"):
        got = {r["id"]: r["scc"] for r in
               strongly_connected_components(df, n=5,
                                             max_rounds=1).collect()}
    # domain complete; labels are provisional singletons, not converged
    assert set(got) == set(range(5))


# ------------------------------------------------------------ bow-tie

def bowtie_oracle(edges, n):
    """Brute-force Broder regions via transitive closure."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)

    def closure(starts, graph):
        seen = set(starts)
        frontier = list(starts)
        while frontier:
            nxt = []
            for v in frontier:
                for u in graph.get(v, ()):
                    if u not in seen:
                        seen.add(u)
                        nxt.append(u)
            frontier = nxt
        return seen

    reach = {v: closure({v}, adj) for v in range(n)}
    sccs: dict[int, int] = {}
    for v in range(n):
        members = {u for u in reach[v] if v in reach[u]} | {v}
        sccs[v] = min(members)
    sizes: dict[int, int] = {}
    for v, l in sccs.items():
        sizes[l] = sizes.get(l, 0) + 1
    giant = min(l for l in sizes if sizes[l] == max(sizes.values()))
    out = {}
    for v in range(n):
        if sccs[v] == giant:
            out[v] = "scc"
        elif giant in reach[v]:
            out[v] = "in"
        elif v in reach[giant]:
            out[v] = "out"
        else:
            out[v] = "other"
    return out


def test_bowtie_hand_fixture(spark):
    from pagerank_spark.operators.scc import bowtie_regions

    # giant SCC {2,3,4}; IN: 0 -> 1 -> 2; OUT: 4 -> 5 -> 6;
    # tendril off IN: 1 -> 7 (reaches nothing in giant -> 'out'? no:
    # 7 unreachable from giant and cannot reach it -> 'other');
    # disconnected: 8 <-> 9 (smaller SCC -> 'other').
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 2),
             (4, 5), (5, 6), (1, 7), (8, 9), (9, 8)]
    got = {r["id"]: r["region"]
           for r in bowtie_regions(edges_df(spark, edges), n=10).collect()}
    assert got == {0: "in", 1: "in", 2: "scc", 3: "scc", 4: "scc",
                   5: "out", 6: "out", 7: "other", 8: "other",
                   9: "other"}
    assert got == bowtie_oracle(edges, 10)


def test_bowtie_random_digraphs(spark):
    import random

    from pagerank_spark.operators.scc import bowtie_regions

    rng = random.Random(47)
    for trial in range(2):
        edges = list({(rng.randrange(12), rng.randrange(12))
                      for _ in range(25)})
        got = {r["id"]: r["region"]
               for r in bowtie_regions(edges_df(spark, edges),
                                       n=12).collect()}
        assert got == bowtie_oracle(edges, 12), (trial, edges)
