"""Table IO layer: Iceberg on a real cluster, plain Parquet here.

The mandate targets Iceberg tables (BASELINE.json: "Iceberg table of
source-code repositories", per-iteration rank checkpoints "to Iceberg
with per-partition lineage").  The sandbox has no Iceberg runtime jar,
so every call goes through this thin layer:

- ``TableIO("iceberg", catalog=...)`` — ``spark.read.table`` /
  ``writeTo(...).append()`` against a configured
  ``org.apache.iceberg.spark.SparkCatalog`` (requires the runtime jar
  on the cluster; see ``iceberg_session_conf`` for the spark-submit
  flags).
- ``TableIO("parquet", root=...)`` — path-based parquet with the same
  method surface, used by tests and the sandbox driver.

Nothing else in the engine knows which backend is active.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def iceberg_session_conf(catalog: str = "graph",
                         warehouse: str = "/tmp/iceberg_warehouse") -> dict[str, str]:
    """The spark-submit --conf set for an Iceberg-backed run."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }


class TableIO:
    def __init__(self, backend: str = "parquet", root: str = "/tmp/tables",
                 catalog: str = "graph"):
        if backend not in ("parquet", "iceberg"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.root = root
        self.catalog = catalog

    @classmethod
    def auto(cls, spark: SparkSession, root: str = "/tmp/tables") -> "TableIO":
        return cls("iceberg" if iceberg_available(spark) else "parquet",
                   root=root)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, *name.split("."))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.backend == "iceberg":
            return spark.read.table(f"{self.catalog}.{name}")
        return spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.backend == "iceberg":
            w = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str,
               partition_by: list[str] | None = None) -> None:
        """Append rows.  ``partition_by`` matters only on the parquet
        branch (hive-style layout must be repeated per write); an
        Iceberg table carries its partition spec in table metadata, so
        appends never restate it."""
        if self.backend == "iceberg":
            try:
                df.writeTo(f"{self.catalog}.{name}").append()
            except Exception:  # table may not exist yet
                df.writeTo(f"{self.catalog}.{name}").create()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        if self.backend == "iceberg":
            return spark.catalog.tableExists(f"{self.catalog}.{name}")
        p = self._path(name)
        return os.path.isdir(p) and bool(os.listdir(p))


# ------------------------------------------------------------ bucketed layout

def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, mode: str = "overwrite",
                   sort: bool = True) -> None:
    """Persist ``df`` as a catalog table hash-BUCKETED (and by default
    sorted) on ``bucket_col`` — the durable co-located-join layout.

    Why this exists at 100 TB: every PageRank-class iteration joins the
    edge table on its key.  A cached in-session re-layout (what
    ``plan_gather`` does) dies with the job; bucketing persists the
    layout IN THE TABLE, so any later job — a resumed run, tomorrow's
    incremental update, a different operator over the same graph —
    joins two tables bucketed on the same key with the same bucket
    count with ZERO Exchange on either side (verified by plan assert in
    tests/test_io.py).  On Iceberg the same contract is the
    ``bucket(N, col)`` partition transform + storage-partitioned joins;
    this is the Spark-catalog face the sandbox can execute.

    ``sort=True`` additionally sorts within buckets, so downstream
    merge joins skip their per-task sort too.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = (df.write.mode(mode)
         .format("parquet")
         .bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table written by :func:`write_bucketed`; Spark
    plans bucketed scans automatically from the table metadata."""
    return spark.read.table(table)
