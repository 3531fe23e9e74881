"""Structured Streaming faces: the same transformation over a file
stream (availableNow) must equal its batch answer."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pagerank_spark import streaming

SF = "/root/testdata/sf0.001"


def _stage_event_chunks(spark, tmp_path, n_chunks=3):
    src = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "events_stream")
    (src.withColumn("chunk", F.pmod(F.col("event_id"), F.lit(n_chunks)))
        .repartition("chunk")
        .write.partitionBy("chunk").mode("overwrite").parquet(out))
    # partitioned dirs act as the arriving files
    return src, out + "/chunk=*"


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    batch_src, glob = _stage_event_chunks(spark, tmp_path)
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in streaming.windowed_event_counts(batch_src).collect()
    }

    stream = streaming.read_events_stream(spark, glob)
    assert stream.isStreaming
    agg = streaming.windowed_event_counts(stream)
    streaming.run_stream_to_memory(agg, "win_counts", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.table("win_counts").collect()
    }
    assert got == want


def test_sessionized_stream_equals_batch_and_islands(spark, tmp_path):
    batch_src, glob = _stage_event_chunks(spark, tmp_path)

    def key(rows):
        return sorted((r["user_id"], r["session_start"], r["session_end"],
                       r["n_events"], round(r["sum_value"], 6)) for r in rows)

    want = key(streaming.sessionized(batch_src).collect())

    stream = streaming.read_events_stream(spark, glob)
    agg = streaming.sessionized(stream)
    streaming.run_stream_to_memory(agg, "sessions_tbl", "complete")
    got = key(spark.table("sessions_tbl").collect())
    assert got == want

    # cross-check the native session_window semantics against the
    # gaps-and-islands formulation used by the driver query
    import __spark_entry__ as e

    islands = e.q_events_sessions(spark, SF)
    n_sessions = islands.count()
    assert len(want) == n_sessions


def test_streaming_out_degrees_equals_batch(spark, tmp_path):
    edges = spark.createDataFrame(
        [(i % 5, (i * 7) % 11) for i in range(200)], "src BIGINT, dst BIGINT")
    out = str(tmp_path / "edge_log")
    edges.repartition(4).write.mode("overwrite").parquet(out)

    want = {r["id"]: r["out_deg"]
            for r in streaming.streaming_out_degrees(edges).collect()}
    stream = streaming.read_edges_stream(spark, out)
    deg = streaming.streaming_out_degrees(stream)
    streaming.run_stream_to_memory(deg, "deg_counts", "complete")
    got = {r["id"]: r["out_deg"] for r in spark.table("deg_counts").collect()}
    assert got == want


def test_decayed_activity_stream_equals_batch(spark, tmp_path):
    # The custom applyInPandasWithState operator: draining the chunked
    # stream (3 micro-batches, NOT time-ordered — chunks split by
    # event_id) must reproduce the batch face exactly, because the
    # decayed-score merge is commutative across batches.
    import math

    batch_src, glob = _stage_event_chunks(spark, tmp_path)
    want = {r["user_id"]: (r["ms"], r["n_events"], r["score"])
            for r in streaming.decayed_activity(batch_src)
            .withColumn("ms", F.unix_millis(
                F.col("last_ts").cast("timestamp"))).collect()}

    stream = streaming.read_events_stream(spark, glob,
                                          max_files_per_trigger=1)
    act = streaming.decayed_activity_stream(stream)
    streaming.run_stream_to_memory(act, "decayed_tbl", "update")
    rows = spark.table("decayed_tbl").collect()
    # update mode appends one refreshed row per user per batch; the
    # final state is the row with the largest cumulative n_events.
    got = {}
    for r in rows:
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            got[r["user_id"]] = (r["last_ts_ms"], r["n_events"], r["score"])
    assert got.keys() == want.keys()
    for u, (ms, n, score) in want.items():
        g_ts, g_n, g_score = got[u]
        assert g_n == n
        assert g_ts == ms
        assert math.isclose(g_score, score, rel_tol=1e-9)

    # sanity bounds: every event contributes (0, 1] to its user's score
    for u, (_, n, score) in want.items():
        assert 0.0 < score <= n + 1e-9


def test_drop_duplicate_docs_stream_equals_batch(spark, tmp_path):
    # docs feed with duplicated texts spread across micro-batches:
    # 30 docs cycling over 7 distinct texts (case/punct variants of
    # the same text must also collide via the normalized fingerprint)
    rows = []
    for i in range(30):
        base = f"document body number {i % 7}"
        text = base.upper() + "!!!" if i % 3 == 0 else base
        rows.append((i, f"2024-01-01 00:{i:02d}:00", text))
    src = spark.createDataFrame(
        rows, "doc_id BIGINT, ts_s STRING, text STRING").select(
        "doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    out = str(tmp_path / "docs_stream")
    (src.withColumn("chunk", F.pmod(F.col("doc_id"), F.lit(3)))
        .repartition("chunk")
        .write.partitionBy("chunk").mode("overwrite").parquet(out))

    batch = streaming.drop_duplicate_docs(src)
    want = {r["fingerprint"] for r in batch.collect()}
    assert len(want) == 7 and batch.count() == 7

    stream = streaming.read_docs_stream(spark, out + "/chunk=*",
                                        max_files_per_trigger=1)
    assert stream.isStreaming
    deduped = streaming.drop_duplicate_docs(stream)
    streaming.run_stream_to_memory(deduped, "docs_deduped_stream", "append")
    got = spark.table("docs_deduped_stream").collect()
    assert {r["fingerprint"] for r in got} == want
    assert len(got) == 7  # ONE survivor per fingerprint across batches


def test_enriched_event_counts_stream_equals_batch(spark, tmp_path):
    batch_src, glob = _stage_event_chunks(spark, tmp_path)
    # static dimension covering only half the users → the left-join
    # 'unknown' branch is exercised
    dims = batch_src.select("user_id").distinct().where(
        F.col("user_id") % 2 == 0).withColumn(
        "segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    want = {
        (r["window_start"], r["segment"]): (r["n"], round(r["sum_value"], 6))
        for r in streaming.enriched_event_counts(batch_src, dims).collect()
    }
    assert any(k[1] == "unknown" for k in want)

    stream = streaming.read_events_stream(spark, glob)
    agg = streaming.enriched_event_counts(stream, dims)
    streaming.run_stream_to_memory(agg, "enriched_counts", "complete")
    got = {
        (r["window_start"], r["segment"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.table("enriched_counts").collect()
    }
    assert got == want


def test_value_histogram_stream_equals_batch_and_merges(spark, tmp_path):
    batch_src, glob = _stage_event_chunks(spark, tmp_path)
    want = {
        (r["window_start"], r["event_type"], r["bucket"]): r["cnt"]
        for r in streaming.windowed_value_histogram(batch_src).collect()
    }
    assert want  # non-trivial histogram

    stream = streaming.read_events_stream(spark, glob)
    hist = streaming.windowed_value_histogram(stream)
    streaming.run_stream_to_memory(hist, "value_hist", "complete")
    got = {
        (r["window_start"], r["event_type"], r["bucket"]): r["cnt"]
        for r in spark.table("value_hist").collect()
    }
    assert got == want

    # shard-merge law: per-chunk batch histograms sum to the whole
    chunks = spark.read.parquet(glob.replace("chunk=*", "chunk=0"))
    rest_keys = {}
    for c in (0, 1, 2):
        part = spark.read.parquet(glob.replace("chunk=*", f"chunk={c}"))
        for r in streaming.windowed_value_histogram(part).collect():
            k = (r["window_start"], r["event_type"], r["bucket"])
            rest_keys[k] = rest_keys.get(k, 0) + r["cnt"]
    assert rest_keys == want
    del chunks


def test_value_histogram_rejects_bad_width(spark):
    import pytest

    src = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError):
        streaming.windowed_value_histogram(src, bucket_width=0)
