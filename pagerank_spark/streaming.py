"""Structured Streaming operators.

The reference engine is batch-only (SURVEY.md §2: "no streaming of
any kind"), so nothing here replicates reference behavior — these are
the streaming faces of the engine's own tables for pipelines that
tail an events feed or an edge log.

Design rule: every transformation is expressed once and works on BOTH
a batch DataFrame and a streaming DataFrame (the Structured Streaming
contract), so the batch tests in pytest double as the semantic oracle
for the streaming path (run the same function over readStream +
``trigger(availableNow)`` and compare with the batch answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                 "event_type STRING, value DOUBLE, props STRING")
EDGES_SCHEMA = "src BIGINT, dst BIGINT"


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Tail a directory of events parquet files as a stream."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on batch and streaming inputs; on streams the watermark
    bounds state and admits late rows up to ``watermark``.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "sum_value")
    )


def windowed_value_histogram(events: DataFrame, window: str = "1 hour",
                             watermark: str = "2 hours",
                             bucket_width: int = 16) -> DataFrame:
    """Tumbling-window fixed-width histogram of ``value`` per
    event_type — the STREAMING face of the mergeable quantile sketch
    (pipeline/sketches.py): bucket = floor(value / width), one
    bounded counter row per (window, type, bucket), and counts from
    any two shards/batches merge by addition, so the sketch is a
    plain windowed aggregation Structured Streaming maintains
    incrementally (watermark bounds state; late rows fold in
    exactly).  Quantile EXTRACTION (histogram_quantiles) runs on the
    materialized sink — the standard split for sketches on streams:
    the stream maintains the mergeable state, readers derive the
    statistic.

    Works on batch and streaming inputs; batch≡stream equality is
    pinned in tests/test_streaming.py.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        # NULL values carry no bucket; excluding them keeps the
        # cumulative quantile window's ordering engine-agnostic
        # (Spark sorts NULLS first, most SQL engines last).
        src.where(F.col("value").isNotNull())
        .groupBy(
            F.window("ts", window).alias("w"), "event_type",
            F.floor(F.col("value") / F.lit(float(bucket_width)))
            .cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "bucket", "cnt")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Per-user session aggregates via ``session_window`` — Spark's
    native stateful session operator; works on batch AND streaming
    inputs (on streams the watermark bounds session state and closes
    sessions whose gap has passed).

    Semantics match the batch gaps-and-islands query
    (``__spark_entry__.q_events_sessions``): a session is a maximal run
    of events per user with inter-event gaps <= ``gap``; equality of
    the two faces is asserted in tests.  Output: (user_id,
    session_start, session_end, n_events, sum_value).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select("user_id", "session_start", "session_end",
                "n_events", "sum_value")
    )


DECAY_HALF_LIFE_MS = 3_600_000.0  # 1 hour


def decayed_activity(events: DataFrame,
                     half_life_ms: float = DECAY_HALF_LIFE_MS) -> DataFrame:
    """Per-user exponentially-decayed activity score — the CUSTOM
    stateful operator of the suite (nothing built-in expresses it):

        score(user) = sum_i 2^(-(t_max - t_i) / half_life)

    anchored at the user's latest event, so every event contributes a
    half-life-decayed unit of activity.  The sum is a commutative
    monoid under the merge

        t' = max(t_a, t_b);  s' = s_a * 2^(-(t'-t_a)/h) + s_b * 2^(-(t'-t_b)/h)

    which makes the score independent of event order AND batch
    boundaries — late/out-of-order arrival folds in exactly.

    This is the BATCH face (pure JVM expressions: one max-agg, one
    broadcast-back join, one sum-agg — no Python).  The streaming face
    with identical semantics is :func:`decayed_activity_stream`
    (``applyInPandasWithState``); their equality is pinned in
    tests/test_streaming.py.  Output: (user_id, last_ts, n_events,
    score).
    """
    # events carry TIMESTAMP_NTZ; the score depends only on time
    # DIFFERENCES, so the tz applied by the cast cancels out.
    e = events.select(
        "user_id", "ts",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))
    mx = e.groupBy("user_id").agg(F.max("ms").alias("mxms"))
    lam = 0.6931471805599453 / half_life_ms          # ln 2 / h
    return (
        e.join(mx, "user_id")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(F.exp(-lam * (F.col("mxms") - F.col("ms"))))
             .alias("score"))
    )


def decayed_activity_stream(events: DataFrame,
                            half_life_ms: float = DECAY_HALF_LIFE_MS,
                            watermark: str = "2 hours") -> DataFrame:
    """Streaming face of :func:`decayed_activity` via
    ``applyInPandasWithState``: per user the state is the pair
    (t_max_ms, score) plus the event count, merged per micro-batch
    with the commutative formula above — so the emitted score after
    draining a stream equals the batch answer regardless of how events
    were split into batches (asserted in tests).  Update output mode:
    each batch emits one refreshed row per user seen in that batch.

    State is two doubles + a long per user — bounded by |users|, the
    smallest state class a per-key stateful operator can have (no
    per-event retention; a watermark is unnecessary for correctness
    because the merge is total, but one is applied to bound the
    no-data timeout semantics on real feeds).
    """
    import math

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    lam = math.log(2.0) / half_life_ms

    def merge(key, pdf_iter, state: GroupState):
        t_max, score, n = (state.get if state.exists
                           else (float("-inf"), 0.0, 0))
        for pdf in pdf_iter:
            ms = pdf["ms"].to_numpy(dtype="float64")
            if len(ms) == 0:
                continue
            b_max = float(ms.max())
            import numpy as np

            b_score = float(np.exp(-lam * (b_max - ms)).sum())
            t = max(t_max, b_max)
            score = (score * math.exp(-lam * (t - t_max))
                     if t_max != float("-inf") else 0.0) \
                + b_score * math.exp(-lam * (t - b_max))
            t_max = t
            n += len(ms)
        state.update((t_max, score, n))
        yield pd.DataFrame({"user_id": [key[0]],
                            "last_ts_ms": [int(t_max)],
                            "n_events": [n],
                            "score": [score]})

    src = events.withWatermark("ts", watermark)
    return (
        src.select("user_id",
                   F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))
        .groupBy("user_id")
        .applyInPandasWithState(
            merge,
            outputStructType=("user_id BIGINT, last_ts_ms BIGINT, "
                              "n_events BIGINT, score DOUBLE"),
            stateStructType="t_max DOUBLE, score DOUBLE, n BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def enriched_event_counts(events: DataFrame, user_dims: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Stream-static enrichment: join the (streaming or batch) events
    against a static user-dimension table, then the per-(window,
    segment) rollup — the classic fact-stream x dimension pattern.

    The static side is broadcast (it re-resolves per micro-batch on a
    stream, so a dimension refresh between batches is picked up); the
    stream side never shuffles for the join, only for the windowed
    aggregate.  A left join keeps events with no dimension row
    (segment NULL → 'unknown'), so the stream's row set is preserved.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    dims = user_dims.select("user_id", "segment")
    return (
        src.join(F.broadcast(dims), "user_id", "left")
        .withColumn("segment",
                    F.coalesce(F.col("segment"), F.lit("unknown")))
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "segment",
                "n", "sum_value")
    )


DOCS_STREAM_SCHEMA = "doc_id BIGINT, ts TIMESTAMP, text STRING"


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Tail a directory of (doc_id, ts, text) parquet files — an
    ingest feed where ``ts`` is the arrival/crawl time."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def drop_duplicate_docs(docs: DataFrame, watermark: str = "1 hour",
                        ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup — the ingest-time face of
    ``pipeline.dedup.drop_exact_duplicates``: fingerprint the
    normalized text (``textstats.fingerprint_col``, the same digest as
    the batch fingerprint table) and keep ONE row per fingerprint.

    On a stream this is ``dropDuplicatesWithinWatermark``: state holds
    one entry per fingerprint seen within the watermark horizon, so
    memory is bounded by the dedup window, not the stream length —
    the standard at-ingest dedup for a crawl pipeline (re-crawls of
    the same page arrive within hours; cross-epoch dedup stays a
    batch job over the fingerprint table).  On a batch DataFrame it
    degrades to a plain ``dropDuplicates`` on the fingerprint.

    Which duplicate survives is engine-chosen in both modes (first
    arrival per micro-batch on streams, arbitrary in batch), so
    equality tests compare the kept fingerprint SET, not row ids.
    """
    from pagerank_spark.pipeline.textstats import fingerprint_col

    out = docs.withColumn("fingerprint", fingerprint_col(F.col("text")))
    if out.isStreaming:
        return (out.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["fingerprint"]))
    return out.dropDuplicates(["fingerprint"])


def read_edges_stream(spark: SparkSession, path: str) -> DataFrame:
    """Tail a directory of edge parquet files (an edge log)."""
    return spark.readStream.schema(EDGES_SCHEMA).parquet(path)


def streaming_out_degrees(edges: DataFrame) -> DataFrame:
    """Running out-degree per vertex over an edge stream (or batch).

    Streaming: an unbounded keyed count (update/complete mode) — the
    incremental face of ``graph.out_degrees``.
    """
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg"))


def run_stream_to_memory(stream_df: DataFrame, table_name: str,
                         output_mode: str = "complete"):
    """Drain a stream with availableNow into an in-memory sink and
    return the finished query (caller reads
    ``spark.table(table_name)``)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(table_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
