"""FIXTURES.md F3 — the reference's own dataset (SNAP ego-Facebook),
read read-only from the reference checkout.  This is the flagship
reference-parity contract: 132 iterations at L1 < 1e-10 (zero-init
quirk), top vertex 1911, allclose on spot values."""

from __future__ import annotations

import os

import pytest

from pagerank_spark import graph
from pagerank_spark.operators import pagerank

FB_PATH = "/root/reference/pagerank/facebook_data.txt"


@pytest.mark.skipif(not os.path.exists(FB_PATH), reason="reference data absent")
def test_facebook_reference_parity(spark):
    edges = graph.read_edge_list_text(spark, FB_PATH)
    g = graph.prepare(edges)
    assert g.n == 4039
    assert g.edges.count() == 88234
    # 376 dangling vertices under the directed reading.
    dangling = g.n - g.out_deg.count()
    assert dangling == 376

    res = pagerank(g, tol=1e-10)
    assert res.iterations == 132
    assert res.final_l1 < 1e-10

    top = res.top(1).first()
    assert top["id"] == 1911
    assert top["pr"] == pytest.approx(0.00941848085603779, abs=1e-9)

    spot = {r["id"]: r["pr"] for r in res.ranks.where("id in (0)").collect()}
    assert spot[0] == pytest.approx(7.73036671364887e-05, abs=1e-9)

    total = res.ranks.groupBy().sum("pr").first()[0]
    assert total == pytest.approx(0.999999999432615, abs=1e-8)
