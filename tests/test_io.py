"""TableIO contract tests.

The sandbox has no Iceberg runtime jar, so the iceberg branch cannot
run end-to-end here; these tests still EXECUTE every iceberg code path
in io.py against recorder fakes, pinning the calls a real cluster
would see (writeTo/partitionedBy/append/createOrReplace, read.table,
catalog.tableExists), and assert the exact spark-submit conf set the
production entry points ship (jobs/*.py).  The parquet branch is
exercised for real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.io import TableIO, iceberg_available, iceberg_session_conf


class _Recorder:
    def __init__(self, log, name):
        self._log = log
        self._name = name

    def __call__(self, *args, **kwargs):
        self._log.append((self._name, args))
        return self

    def __getattr__(self, attr):
        return _Recorder(self._log, f"{self._name}.{attr}" if self._name else attr)


class _FakeDF:
    def __init__(self):
        self.log = []

    def writeTo(self, table):
        self.log.append(("writeTo", (table,)))
        return _Recorder(self.log, "writeTo")


class _FakeCatalog:
    def __init__(self, tables):
        self._tables = tables

    def tableExists(self, name):
        return name in self._tables


class _FakeSpark:
    def __init__(self, tables=()):
        self.log = []
        self.catalog = _FakeCatalog(set(tables))
        self.read = _Recorder(self.log, "read")


def test_iceberg_session_conf_complete():
    conf = iceberg_session_conf(catalog="graph", warehouse="/wh")
    assert conf["spark.sql.catalog.graph"] == \
        "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.graph.type"] == "hadoop"
    assert conf["spark.sql.catalog.graph.warehouse"] == "/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_write_append_and_replace():
    io = TableIO("iceberg", catalog="g")
    df = _FakeDF()
    io.write(df, "ranks.iter8", mode="append")
    assert df.log[0] == ("writeTo", ("g.ranks.iter8",))
    assert df.log[-1][0].endswith("append")

    df2 = _FakeDF()
    io.write(df2, "ranks.latest", mode="overwrite")
    assert df2.log[0] == ("writeTo", ("g.ranks.latest",))
    assert df2.log[-1][0].endswith("createOrReplace")


def test_iceberg_write_partitioned(spark):
    # needs an active SparkContext: partitionedBy columns are F.col(...)
    io = TableIO("iceberg", catalog="g")
    df = _FakeDF()
    io.write(df, "state", mode="append", partition_by=["iteration"])
    names = [n for n, _ in df.log]
    assert names[0] == "writeTo"
    assert any(n.endswith("partitionedBy") for n in names)
    assert names[-1].endswith("append")


def test_iceberg_append_create_fallback():
    io = TableIO("iceberg", catalog="g")

    class _FailingAppendDF(_FakeDF):
        def writeTo(self, table):
            self.log.append(("writeTo", (table,)))
            outer = self

            class _W:
                def append(self):
                    outer.log.append(("append_failed", ()))
                    raise RuntimeError("table missing")

                def create(self):
                    outer.log.append(("create", ()))

            return _W()

    df = _FailingAppendDF()
    io.append(df, "metrics")
    assert ("create", ()) in df.log  # fell back to create on first append


def test_iceberg_read_and_exists():
    io = TableIO("iceberg", catalog="g")
    spark = _FakeSpark(tables={"g.edges"})
    io.read(spark, "edges")
    assert spark.log[0] == ("read.table", ("g.edges",))
    assert io.exists(spark, "edges") is True
    assert io.exists(spark, "missing") is False


def test_auto_falls_back_to_parquet(spark):
    # the sandbox has no Iceberg jar: auto() must select parquet.
    assert iceberg_available(spark) is False
    assert TableIO.auto(spark).backend == "parquet"


def test_parquet_roundtrip(spark, tmp_path):
    io = TableIO("parquet", root=str(tmp_path))
    from pyspark.sql import functions as F

    df = spark.range(0, 10).withColumnRenamed("id", "v") \
        .withColumn("bucket", F.col("v") % 2)
    io.write(df, "t.one")
    assert io.exists(spark, "t.one")
    assert io.read(spark, "t.one").count() == 10
    io.append(df, "t.one")
    assert io.read(spark, "t.one").count() == 20
    # partitioned layout on a separate table (hive-style dirs)
    io.write(df, "t.part", partition_by=["bucket"])
    assert sorted(io.read(spark, "t.part").columns) == ["bucket", "v"]
    assert io.read(spark, "t.part").count() == 10


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        TableIO("csv")


# ------------------------------------------------- TableCheckpointManager
class _FakeStateDF(_FakeDF):
    """writeTo-recording fake that also absorbs the lineage/coalesce
    projections the manager applies before writing."""

    def withColumn(self, name, col):
        self.log.append(("withColumn", (name,)))
        return self

    def coalesce(self, n):
        self.log.append(("coalesce", (n,)))
        return self


def test_table_checkpoint_iceberg_ddl_create(spark):
    # First write: the table does not exist — the manager must declare
    # the mandate's iteration partitioning in the DDL
    # (writeTo ... partitionedBy(iteration) ... createOrReplace).
    from pagerank_spark.checkpoint import TableCheckpointManager

    io = TableIO("iceberg", catalog="g")
    fake_spark = _FakeSpark(tables=set())
    mgr = TableCheckpointManager(fake_spark, io, prefix="ranks", interval=2)
    df = _FakeStateDF()
    mgr.write_state(df, 2, target_partitions=4)
    names = [n for n, _ in df.log]
    assert ("withColumn", ("part_id",)) in df.log      # lineage column
    assert ("withColumn", ("iteration",)) in df.log    # partition column
    assert df.log[names.index("writeTo")] == ("writeTo", ("g.ranks_state",))
    assert any(n.endswith("partitionedBy") for n in names)
    assert names[-1].endswith("createOrReplace")
    # the re-read goes through the catalog
    assert fake_spark.log[0] == ("read.table", ("g.ranks_state",))


def test_table_checkpoint_iceberg_ddl_append(spark):
    # Table exists: append only — an Iceberg table carries its
    # partition spec in metadata, so the DDL must NOT restate it.
    from pagerank_spark.checkpoint import TableCheckpointManager

    io = TableIO("iceberg", catalog="g")
    fake_spark = _FakeSpark(tables={"g.ranks_state"})
    mgr = TableCheckpointManager(fake_spark, io, prefix="ranks")
    df = _FakeStateDF()
    mgr.write_state(df, 3)
    names = [n for n, _ in df.log]
    assert df.log[names.index("writeTo")] == ("writeTo", ("g.ranks_state",))
    assert not any(n.endswith("partitionedBy") for n in names)
    assert names[-1].endswith("append")


def test_table_checkpoint_parquet_end_to_end(spark, tmp_path):
    # The identical manager code runs for real on the parquet backend:
    # iteration-partitioned state + metrics rows + resume parity.
    from pagerank_spark import graph
    from pagerank_spark.checkpoint import TableCheckpointManager
    from pagerank_spark.operators import pagerank

    io = TableIO("parquet", root=str(tmp_path))
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src BIGINT, dst BIGINT")
    g = graph.prepare(edges)

    mgr = TableCheckpointManager(spark, io, prefix="pr", interval=2)
    full = pagerank(g, max_iter=6, checkpoint=mgr)
    assert mgr.committed_iterations() == [2, 4, 6]
    state = io.read(spark, "pr_state")
    assert {"iteration", "part_id"} <= set(state.columns)  # lineage
    # hive-style iteration partitions on disk
    import os

    dirs = os.listdir(tmp_path / "pr_state")
    assert any(d.startswith("iteration=") for d in dirs)
    # metrics audit rows carry the stop-rule state (prev_l1 included)
    metrics = io.read(spark, "pr_metrics")
    assert {"iteration", "l1", "prev_l1"} <= set(metrics.columns)
    assert mgr.read_metric(4, "l1") is not None

    # resume from the table checkpoint: bit-identical continuation
    mgr2 = TableCheckpointManager(spark, io, prefix="pr", interval=2)
    resumed = pagerank(g, max_iter=6, checkpoint=mgr2, resume=True)
    assert resumed.iterations == 6
    a = {r["id"]: r["pr"] for r in full.converged_ranks.collect()}
    b = {r["id"]: r["pr"] for r in resumed.converged_ranks.collect()}
    assert a == b


# ------------------------------------------------------------ bucketed layout

def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with ZERO Exchange on either side — the
    durable co-located layout contract write_bucketed documents."""
    import pytest

    from pagerank_spark.io import read_table, write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}'")
    try:
        edges = spark.range(0, 400).select(
            (F.col("id") % 50).alias("src"), (F.col("id") % 37).alias("dst"))
        ranks = spark.range(0, 50).select(
            F.col("id").alias("src"), (F.col("id") * 2.0).alias("pr"))
        write_bucketed(edges, "bkt.edges", "src", n_buckets=8)
        write_bucketed(ranks, "bkt.ranks", "src", n_buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_table(spark, "bkt.edges").join(
                read_table(spark, "bkt.ranks"), "src")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            # same join over plain parquet MUST shuffle — the bucketed
            # layout is what removed it
            pe, pr = str(tmp_path / "pe"), str(tmp_path / "pr")
            edges.write.mode("overwrite").parquet(pe)
            ranks.write.mode("overwrite").parquet(pr)
            plain = spark.read.parquet(pe).join(spark.read.parquet(pr), "src")
            pplan = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in pplan
            # identical results either way
            a = sorted(map(tuple, joined.collect()))
            b = sorted(map(tuple, plain.collect()))
            assert a == b and len(a) == 400
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        with pytest.raises(ValueError):
            write_bucketed(edges, "bkt.bad", "src", n_buckets=0)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_bucketed_sorted_scan_skips_sort(spark, tmp_path):
    """sortBy in the bucketed layout lets the merge join skip the
    per-task sort of the bucketed side entirely."""
    from pagerank_spark.io import read_table, write_bucketed

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt2 LOCATION '{tmp_path}'")
    try:
        df = spark.range(0, 200).select(
            (F.col("id") % 20).alias("k"), F.col("id").alias("v"))
        write_bucketed(df, "bkt2.a", "k", n_buckets=4)
        write_bucketed(df, "bkt2.b", "k", n_buckets=4)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "bkt2.a").join(
                read_table(spark, "bkt2.b"), "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == 2000  # 20 keys x 10 x 10
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt2 CASCADE")
