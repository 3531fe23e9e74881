"""HyperBall-style neighborhood function vs a brute-force Python
oracle computing the SAME deterministic FM sketch over exact balls
(SURVEY.md §5 strategy: constructed graphs + seeded random
cross-checks), plus salted-layout equivalence."""

from __future__ import annotations

import hashlib
import random

from conftest import edges_df
from pagerank_spark.operators.neighborhood import (
    MAX_RHO,
    N_SKETCHES,
    est_constants,
    neighborhood_function,
)


def _h60(k: int, v: int) -> int:
    return int(hashlib.md5(f"nf:{k}:{v}".encode()).hexdigest()[:15], 16)


def _tz(x: int) -> int:
    if x == 0:
        return MAX_RHO
    return min((x & -x).bit_length() - 1, MAX_RHO)


def _balls(edges, radius: int, directed: bool):
    adj: dict[int, set[int]] = {}
    verts = set()
    for s, d in edges:
        verts.add(s)
        verts.add(d)
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    ball = {v: {v} for v in verts}
    for _ in range(radius):
        ball = {
            v: ball[v].union(*(ball[u] for u in adj.get(v, ())))
            for v in verts
        }
    return ball


def _oracle(edges, radius: int, directed: bool = False,
            n_sketches: int = N_SKETCHES):
    consts = est_constants(n_sketches)
    out = {}
    for v, members in _balls(edges, radius, directed).items():
        sum_rho = 0
        for k in range(n_sketches):
            s = 0
            for u in members:
                s |= 1 << _tz(_h60(k, u))
            mask = (~s) & (s + 1)
            sum_rho += mask.bit_length() - 1
        est = round(consts[sum_rho % n_sketches]
                    * 2.0 ** (sum_rho // n_sketches), 6)
        out[v] = (sum_rho, est)
    return out


def _run(spark, edges, radius: int, **kw):
    df = neighborhood_function(edges_df(spark, edges), radius, **kw)
    return {r["id"]: (r["sum_rho"], r["ball_est"]) for r in df.collect()}


def test_chain_plus_island(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    for radius in (1, 2, 4):
        assert _run(spark, edges, radius) == _oracle(edges, radius)


def test_directed_out_ball(spark):
    # 0 -> 1 -> 2, plus 3 -> 0: out-balls differ per vertex.
    edges = [(0, 1), (1, 2), (3, 0)]
    got = _run(spark, edges, 2, directed=True)
    assert got == _oracle(edges, 2, directed=True)
    # radius-2 out-ball of 3 is {3,0,1}; of 2 is just {2}.
    exact = _balls(edges, 2, directed=True)
    assert exact[3] == {3, 0, 1} and exact[2] == {2}


def test_random_graph_matches_oracle(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(60), rng.randrange(60))
                  for _ in range(220)})
    assert _run(spark, edges, 3) == _oracle(edges, 3)


def test_duplicate_and_self_loop_insensitive(spark):
    base = [(0, 1), (1, 2), (2, 0), (2, 3)]
    noisy = base + base + [(1, 1), (3, 3)]
    assert _run(spark, base, 2) == _run(spark, noisy, 2)


def test_salted_layout_equivalent(spark):
    # Hub star: force the salted gather and check bit-equality with
    # the broadcast layout (OR is idempotent, so replication is safe).
    edges = [(0, i) for i in range(1, 40)] + [(1, 2), (2, 3)]
    plain = _run(spark, edges, 2)
    forced = _run(spark, edges, 2, salt_threshold=5, num_salts=4)
    assert plain == forced == _oracle(edges, 2)


def test_distance_distribution_matches_oracle(spark):
    from pagerank_spark.operators.neighborhood import distance_distribution

    rng = random.Random(11)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(90)})
    got = {
        r["radius"]: (r["sum_rho_total"], r["n_pairs_q6"])
        for r in distance_distribution(
            edges_df(spark, edges), 3).collect()
    }
    assert sorted(got) == [0, 1, 2, 3]
    for radius in range(4):
        o = _oracle(edges, radius)
        want_sr = sum(sr for sr, _ in o.values())
        want_np = sum(int(est * 1_000_000.0) for _, est in o.values())
        assert got[radius][0] == want_sr
        # per-vertex floor quantization: allow each term's floor to
        # shave <1 quantum vs the float-derived expectation
        assert 0 <= want_np - got[radius][1] <= len(o)
    # N(r) is monotone nondecreasing in r
    pairs = [got[r][1] for r in range(4)]
    assert pairs == sorted(pairs)


def test_effective_diameter_interpolates_crossing(spark):
    from pagerank_spark.operators.neighborhood import (
        distance_distribution,
        effective_diameter,
    )

    rng = random.Random(13)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(90)})
    row = effective_diameter(
        edges_df(spark, edges), 3, alpha=0.9).collect()[0]
    # Recompute the crossing from the distribution the estimate is
    # defined over: N(r) is monotone, so there is exactly one.
    np = {r["radius"]: r["n_pairs_q6"]
          for r in distance_distribution(edges_df(spark, edges), 3)
          .collect()}
    target = 0.9 * np[3]
    assert row["n_pairs_max"] == np[3]
    r = min(x for x in np if np[x] >= target)
    if r == 0:
        want = 0.0
    else:
        want = r - 1 + (target - np[r - 1]) / (np[r] - np[r - 1])
    assert abs(row["effective_diameter"] - want) < 1e-6
    assert 0.0 <= row["effective_diameter"] <= 3.0


def test_effective_diameter_alpha_one_is_max_radius_crossing(spark):
    # On a 3-chain, N(r) strictly grows to saturation at r=2, so
    # alpha=1.0 must land exactly on the first saturated radius.
    from pagerank_spark.operators.neighborhood import effective_diameter

    edges = [(0, 1), (1, 2)]
    row = effective_diameter(
        edges_df(spark, edges), 3, alpha=1.0).collect()[0]
    assert row["effective_diameter"] == 2.0


def test_saturation_radius_is_fixpoint(spark):
    # Past the diameter the sketches stop changing (monotone + OR).
    edges = [(0, 1), (1, 2)]
    assert _run(spark, edges, 2) == _run(spark, edges, 9)


# ------------------------------------------------------ hyperball harmonic

def _harmonic_oracle(edges, radius: int, directed: bool = False,
                     n_sketches: int = N_SKETCHES):
    """Python replay of hyperball_harmonic: q6-BIGINT ball estimates
    per radius, lcm-weighted integer ring differences, one division."""
    import math

    L = 1
    for r in range(1, radius + 1):
        L = L * r // math.gcd(L, r)
    per_radius = [
        {v: int(round(est * 1_000_000.0))
         for v, (_, est) in _oracle(edges, r, directed,
                                    n_sketches).items()}
        for r in range(radius + 1)
    ]
    out = {}
    for v in per_radius[0]:
        hq = sum((per_radius[r][v] - per_radius[r - 1][v]) * (L // r)
                 for r in range(1, radius + 1))
        out[v] = (hq, round(hq / (1_000_000.0 * L), 6))
    return out


def test_hyperball_harmonic_vs_python_replay(spark):
    from pagerank_spark.operators.neighborhood import hyperball_harmonic

    rng = random.Random(29)
    edges = list({(rng.randrange(18), rng.randrange(18))
                  for _ in range(45)})
    got = {r["id"]: (r["harmonic_q"], r["harmonic_est"])
           for r in hyperball_harmonic(
               edges_df(spark, edges), 3).collect()}
    assert got == _harmonic_oracle(edges, 3)


def test_hyperball_harmonic_star_ranks_center_highest(spark):
    from pagerank_spark.operators.neighborhood import hyperball_harmonic

    # Star K1,8: the center sees 8 vertices at distance 1; leaves see
    # 1 at distance 1 and 7 at distance 2 — the estimate must rank the
    # center strictly highest even through FM noise at K=8 sketches.
    edges = [(0, i) for i in range(1, 9)]
    got = {r["id"]: r["harmonic_est"]
           for r in hyperball_harmonic(
               edges_df(spark, edges), 2).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, 9))


def test_hyperball_harmonic_rejects_bad_radius(spark):
    import pytest

    from pagerank_spark.operators.neighborhood import hyperball_harmonic

    with pytest.raises(ValueError):
        hyperball_harmonic(edges_df(spark, [(0, 1)]), 0)
