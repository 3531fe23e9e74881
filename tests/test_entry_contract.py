"""Driver-contract conformance: every queries() entry runs, and every
oracle_sql() entry matches DuckDB on the same tables (sf0.001 here to
keep the suite fast; the driver runs sf0.01 — entry_compare.py is
runnable standalone at any sf)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod
from entry_compare import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert set(df.columns) == {"id", "pr"}
    # top-1 has the highest rank
    assert rows[0]["pr"] == max(r["pr"] for r in rows)


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every query is oracle-checked (pagerank_converged gained a
    # generated unrolled-CTE oracle, so the rows-only set is empty)
    rows_only = set(qs) - set(os_)
    assert rows_only == set()


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, con, name):
    df = entry_mod.queries()[name](spark, SF)
    ok, msg = compare(df, con, entry_mod.oracle_sql()[name], name)
    assert ok, msg
