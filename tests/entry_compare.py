"""Driver-mimicking comparison: run every __spark_entry__ query on
Spark AND its DuckDB oracle on the same parquet tables; compare row
count, column names, and order-insensitive values.  Used by
test_entry_contract.py and runnable standalone:

    python tests/entry_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if False else v
    return v


def compare(spark_df, con, sql, name="query"):
    """Returns (ok, message)."""
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    ddf = con.execute(sql)
    dcols_raw = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    dcols = sorted(dcols_raw)
    if scols != dcols:
        return False, f"{name}: schema mismatch spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return False, (f"{name}: rowcount mismatch "
                       f"spark={len(srows)} duck={len(drows)}")
    sset = sorted(
        tuple(_norm(r[c]) for c in scols) for r in srows)
    dmap = {c: i for i, c in enumerate(dcols_raw)}
    dset = sorted(
        tuple(_norm(r[dmap[c]]) for c in scols) for r in drows)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return False, f"{name}: value mismatch, first diffs: {diffs}"
    return True, f"{name}: OK ({len(srows)} rows)"


def main():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from pagerank_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "8g"})
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                print(f"{name}: rows-only ({df.count()} rows)", flush=True)
                continue
            ok, msg = compare(df, con, oracles[name], name)
            print(msg, flush=True)
            failures += 0 if ok else 1
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:400]}", flush=True)
            failures += 1
    print(f"FAILURES: {failures}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
