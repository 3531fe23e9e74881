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
