"""Edge-table normalization and graph-shape aggregations.

Re-expresses, Spark-first, the reference engine's graph-construction
path (reference ``pagerank/src/lib/pagerank.cpp:28-92``):

- edge dedupe          (ref: sorted-vector binary-search insert, :28-37)
- out-degree count     (ref: ``num_outgoing[from]++`` per unique edge, :55-56)
- vertex domain        (ref: ``[0, max_id]`` incl. never-mentioned ids, :43-51,86)
- in-adjacency build   (ref: ``graph[to]`` sorted in-neighbor vectors, :38-59)

All of these are single declarative DataFrame expressions; Catalyst
turns them into partial-aggregate + exchange plans with map-side
combine, which is exactly the right physical shape at 1e9+ edges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_SCHEMA = "src BIGINT, dst BIGINT"


def read_edge_list_text(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-delimited ``"src dst"`` text scan (ref pagerank.cpp:60-92).

    The reference splits on the first space with ``strtol``; Spark's CSV
    reader with a single-space separator matches that for well-formed
    SNAP-style files.
    """
    return (
        spark.read.csv(path, sep=" ", schema=EDGE_SCHEMA, comment="#")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def dedupe_edges(edges: DataFrame) -> DataFrame:
    """Drop duplicate (src, dst) pairs (ref pagerank.cpp:28-37,53-57).

    Duplicate input lines must not inflate out-degree — this is part of
    the reference-matching contract (FIXTURES.md F2).
    """
    return edges.dropDuplicates(["src", "dst"])


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_deg) over unique edges (ref pagerank.cpp:55-56)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def num_vertices(edges: DataFrame) -> int:
    """``max(id) + 1`` — the reference's implicit dense domain
    (ref pagerank.cpp:43-51,86).  Ids below the max that never appear
    in any edge are still in-domain (isolated, dangling)."""
    row = edges.agg(F.max(F.greatest("src", "dst")).alias("m")).first()
    if row is None or row["m"] is None:
        return 0
    return int(row["m"]) + 1


def vertex_domain(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Dense vertex domain [0, n) as a DataFrame (id BIGINT)."""
    return spark.range(0, n, numPartitions=partitions).withColumnRenamed("id", "id")


def in_adjacency(edges: DataFrame) -> DataFrame:
    """CSR-style grouped in-neighbor lists: (dst, srcs ARRAY<BIGINT> sorted).

    Ref: ``graph[to]`` sorted vectors (pagerank.cpp:38-59).  The gather
    join does NOT need this materialization (flat edges shuffle-join
    better); it exists for operators that want per-vertex neighbor
    arrays and for parity with the reference's data model.

    .. warning:: REFERENCE-PARITY FACE, not the scale path: the
       per-dst ``collect_list`` is unbounded, so one web-scale hub
       (millions of in-edges) concentrates its whole neighbor set in a
       single aggregation buffer.  Anything running at real scale must
       use :func:`in_adjacency_salted`, which bounds every array at
       ~in_deg/num_salts; nothing in the engine's hot paths consumes
       this unsalted form.
    """
    return edges.groupBy("dst").agg(
        F.sort_array(F.collect_list("src")).alias("srcs")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    """(dst, in_deg) over unique edges — the skew statistic for the
    grouped-adjacency build (hubs are high IN-degree there)."""
    return edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))


def in_adjacency_salted(edges: DataFrame, hot_threshold: int = 100_000,
                        num_salts: int = 8) -> DataFrame:
    """Hub-salted CSR-style grouped in-neighbor lists:
    (dst, salt, srcs ARRAY<BIGINT> sorted per chunk).

    BASELINE.json mandates "per-partition CSR-style grouped edge lists
    (salted on hub vertices)": a mega-hub's single ``collect_list`` row
    in :func:`in_adjacency` would concentrate its entire in-neighbor
    set in one aggregation task (OOM at web scale).  Here hot dsts
    (in-degree > ``hot_threshold``) are split into ``num_salts``
    deterministic chunks — ``salt = src % num_salts`` (portable, so the
    DuckDB oracle reproduces it exactly) — bounding every array at
    ~in_deg/num_salts while cold dsts keep a single salt-0 row, so the
    common case is identical to the unsalted layout.  Consumers
    re-merge chunks with ``groupBy(dst) + flatten(collect_list(srcs))``
    or, better, iterate chunk-parallel.
    """
    hot = (
        in_degrees(edges)
        .where(F.col("in_deg") > hot_threshold)
        .select("dst", F.lit(True).alias("is_hot"))
    )
    return (
        edges.join(F.broadcast(hot), "dst", "left")
        .withColumn(
            "salt",
            F.when(F.col("is_hot"),
                   F.pmod(F.col("src"), F.lit(num_salts)))
            .otherwise(F.lit(0)).cast("int"),
        )
        .groupBy("dst", "salt")
        .agg(F.sort_array(F.collect_list("src")).alias("srcs"))
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: edges ∪ reversed, self-loops dropped, deduped.

    Used by connected components / label propagation / triangles, which
    are defined on the undirected graph (FIXTURES.md F2/F4 semantics).
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def encode_dense_ids(edges_str: DataFrame, src_col: str = "src_repo",
                     dst_col: str = "dst_repo",
                     partitions: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Deterministic dictionary encoding of string vertex names to dense
    BIGINT ids in [0, N).

    Sorted ``row_number() - 1`` over the distinct name set, so the
    mapping is stable across runs and cluster sizes (SURVEY.md §1:
    preserves reference semantics over ``[0, N)``).

    Returns (encoded_edges(src,dst), dictionary(name, id)).

    Scale design (two-level encode — no global window): a plain
    ``row_number() OVER (ORDER BY name)`` funnels ALL distinct names
    through ONE task, a single-task bottleneck on the graph-build
    critical path at 1e8+ vertices.  Instead:

      1. range-partition the distinct name set on ``name`` (parallel
         sort; ranges are contiguous and non-overlapping, so partition
         order == global order regardless of sampled boundaries);
      2. per-partition ``row_number`` (window PARTITIONED by the range
         partition id — a parallel hash exchange, never a single task);
      3. per-partition base offsets = exclusive prefix sum of the
         partition counts — P scalar rows collected to the driver
         (same cost class as the per-iteration L1 collect) and
         broadcast-joined back.

    ``id = offset[part] + local_rank - 1`` reproduces the global
    sorted ``row_number() - 1`` bit-for-bit (names are distinct, so
    the order is total).  The intermediate is persisted so the range
    partition assignment is frozen between the counts job and the
    final job.
    """
    from pyspark.sql import Window

    spark = edges_str.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    names = (
        edges_str.select(F.col(src_col).alias("name"))
        .unionByName(edges_str.select(F.col(dst_col).alias("name")))
        .distinct()
    )
    parted = (
        names.repartitionByRange(partitions, "name")
        .withColumn("part", F.spark_partition_id())
        .persist()
    )
    counts = parted.groupBy("part").agg(F.count(F.lit(1)).alias("cnt")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["part"]):
        offsets.append((int(row["part"]), acc))
        acc += int(row["cnt"])
    off_df = spark.createDataFrame(offsets or [(0, 0)], "part INT, offset BIGINT")

    w = Window.partitionBy("part").orderBy("name")
    dictionary = (
        parted.join(F.broadcast(off_df), "part")
        .withColumn("id", (F.row_number().over(w) - F.lit(1)
                           + F.col("offset")).cast("bigint"))
        .select("name", "id")
        # Materialize the dictionary once: it is consumed TWICE below
        # (src and dst joins), and checkpointing it here both freezes
        # the mapping and lets the range-partitioned intermediate be
        # released instead of staying cached for the session.
        .localCheckpoint(eager=True)
    )
    parted.unpersist()
    enc = (
        edges_str
        .join(dictionary.withColumnRenamed("name", src_col)
              .withColumnRenamed("id", "src"), src_col)
        .join(dictionary.withColumnRenamed("name", dst_col)
              .withColumnRenamed("id", "dst"), dst_col)
        .select("src", "dst")
    )
    return enc, dictionary


@dataclass
class Graph:
    """A prepared graph: deduped edges + degree table + vertex count.

    ``edges`` and ``out_deg`` are persisted by ``prepare`` — they are
    reused every iteration by all iterative operators, which is the
    single most important physical decision (the reference builds its
    adjacency exactly once too, pagerank.cpp:60-92).
    """

    edges: DataFrame        # (src, dst) unique
    out_deg: DataFrame      # (id, out_deg)
    n: int                  # vertex domain size

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession


EDGES_PER_PARTITION = 75_000


def prepare(edges_raw: DataFrame, partitions: int | None = None,
            persist: bool = True) -> Graph:
    """Normalize a raw edge DataFrame into a reusable :class:`Graph`.

    ``partitions``: explicit shuffle width for the persisted edge table.
    When None, it is sized from the DATA: the deduped edge table is
    materialized once, counted, and partitioned to
    ``clamp(|E| / EDGES_PER_PARTITION, min(8, shuffle_partitions),
    shuffle_partitions)``.  The persisted partition count is the task
    count of EVERY iteration's gather stage, and on small-to-medium
    graphs per-task scheduling overhead dominates compute — measured at
    sf0.1 (587k edges, 32 cores): 32 partitions = 336 ms/iter, 8
    partitions = 249 ms/iter, same results.  At web scale the
    ``shuffle_partitions`` cap binds, so the operator-tuned cluster
    width always wins; the sizing pass costs one extra (one-time)
    materialization of the deduped edges, amortized over O(100)
    iterations.

    Edges are hash partitioned by ``dst`` — the gather's groupBy key —
    but the table is deliberately checkpointed with a NEUTRAL
    (unrecorded) layout: the per-iteration groupBy(dst) pays one small
    partial-agg exchange, and every other consumer keeps the full
    cluster width (see the in-code comment below for the measured
    trade-off).  Operators that want a recorded layout build their own
    copy (operators/pagerank.py shuffle mode, labelprop's fused src
    layout).
    """
    spark = edges_raw.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = dedupe_edges(edges_raw)
    sized = None
    if partitions is None:
        if not persist:
            # No cache to amortize the sizing count — a data-driven
            # size would re-run the dedupe shuffle twice.  Fall back
            # to the session shuffle width.
            partitions = shuffle_parts
        else:
            # Sizing pass: cache (NOT checkpoint) the deduped edges for
            # the count so the same blocks feed the repartition below
            # and can be RELEASED afterwards — a second eager
            # checkpoint here would leave an unreachable |E|-sized RDD
            # pinned for the session.
            sized = edges.persist()
            edges = sized
            n_edges = edges.count()
            partitions = max(
                min(shuffle_parts, n_edges // EDGES_PER_PARTITION + 1),
                min(8, shuffle_parts),
            )
    edges = edges.repartition(partitions, "dst")
    if persist:
        # Eager truncation: iterative operators re-analyze the edge
        # plan EVERY iteration; materializing it once behind a
        # LogicalRDD keeps per-iteration planning O(iteration plan),
        # independent of how deep the upstream (e.g. extraction)
        # pipeline was.
        #
        # Deliberately checkpointed WITHOUT a recorded output
        # partitioning (AQE is active here, so the LogicalRDD reports
        # UnknownPartitioning): recording hash(dst) lets PageRank's
        # groupBy(dst) aggregate in place (saving one small partial-agg
        # exchange per iteration, ~5%), but pessimizes every OTHER
        # consumer whose clustering keys are supersets — measured 3.4x
        # slower triangle counting (interleaved minima), because
        # downstream dedupes/aggregations stay pinned to the narrow
        # recorded layout instead of re-spreading to the cluster
        # width.  The shared graph keeps the neutral layout; operators
        # that want a recorded layout build their own copy (see
        # operators/pagerank.py shuffle mode).
        edges = edges.localCheckpoint(eager=True)
        if sized is not None:
            sized.unpersist()
    deg = out_degrees(edges)
    if persist:
        deg = deg.persist()
    n = num_vertices(edges)
    return Graph(edges=edges, out_deg=deg, n=n)


def prepare_prebuilt(edges_unique: DataFrame, persist: bool = True,
                     partitions: int | None = None) -> Graph:
    """Build a :class:`Graph` from an ALREADY-DEDUPED edge table (e.g.
    one written by a previous ``prepare`` run, or a curated Iceberg
    table).  Skips the dedupe shuffle and the repartition: the
    broadcast-gather path only needs the groupBy(dst) partial-agg
    exchange, whose input is bounded by |distinct dst per partition|,
    so the file partitioning is good enough.  Uses the columnar SQL
    cache (compressed) rather than an RDD localCheckpoint — at 1e8+
    rows the columnar cache is several times smaller."""
    edges = edges_unique
    if partitions is not None:
        # The cached edge table's partition count caps the gather
        # stage's parallelism every iteration — size it to the
        # cluster (2-4x total cores), not to the input file splits.
        edges = edges.repartition(partitions)
    if persist:
        edges = edges.persist()
        edges.count()
    deg = out_degrees(edges)
    if persist:
        deg = deg.persist()
    return Graph(edges=edges, out_deg=deg, n=num_vertices(edges))
