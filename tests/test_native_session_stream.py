"""Native `session_window` in Structured Streaming: sessions merge
across micro-batches under a watermark, and the finalized sessions
equal the batch `native_session_rollup` semantics on the same data.
This is the engine's third sessionization path (window-function
batch, applyInPandasWithState automaton, native session_window) —
all three proven equivalent."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_python_azure_spark.streaming.pipeline import stream_parquet_dir

SCHEMA = "user_id long, ts timestamp, value double"
D = datetime.datetime


def _run(spark, src, ckpt, out):
    stream = stream_parquet_dir(spark, src, SCHEMA)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )

    def sink(batch, _):
        batch.write.mode("append").parquet(out)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_sessions_merge_across_batches(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / p) for p in ("src", "ckpt", "out"))
    # batch 1: two events 10 min apart (one session, still open)
    spark.createDataFrame(
        [(1, D(2024, 1, 1, 10, 0), 1.0), (1, D(2024, 1, 1, 10, 10), 2.0)],
        SCHEMA,
    ).write.parquet(src)
    _run(spark, src, ckpt, out)
    # batch 2: an event 15 min later EXTENDS the same session (within
    # the 30-min gap), plus a far-future event to advance the
    # watermark so the merged session finalizes
    spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 25), 4.0),
            (1, D(2024, 1, 1, 18, 0), 8.0),
        ],
        SCHEMA,
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    # batch 3: advance further so every session can emit
    spark.createDataFrame(
        [(1, D(2024, 1, 2, 9, 0), 0.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    rows = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.n_events,
            r.total_value,
        )
        for r in spark.read.parquet(out).collect()
    }
    # the three morning events merged into ONE session across
    # micro-batches: 10:00 → 10:25 + 30 min gap
    assert rows[(1, D(2024, 1, 1, 10, 0))] == (
        D(2024, 1, 1, 10, 55),
        3,
        7.0,
    )
    # the 18:00 singleton finalized as its own session
    assert rows[(1, D(2024, 1, 1, 18, 0))] == (
        D(2024, 1, 1, 18, 30),
        1,
        8.0,
    )


def test_stream_sessions_match_batch_rollup(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / p) for p in ("src", "ckpt", "out"))
    rows = [
        (u, D(2024, 1, 1, 9, m), float(u + m))
        for u in (1, 2)
        for m in (0, 5, 50, 55)
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)
    _run(spark, src, ckpt, out)
    # flush: a late sentinel advances the watermark past everything
    spark.createDataFrame(
        [(99, D(2024, 1, 3, 0, 0), 0.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    streamed = {
        (r.user_id, r.session_start, r.session_end): (
            r.n_events,
            r.total_value,
        )
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") != 99)
        .collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end): (
            r.n_events,
            r.total_value,
        )
        for r in spark.createDataFrame(rows, SCHEMA)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert streamed == batch
    # sanity: 9:00+9:05 merge, 9:50+9:55 merge → 2 sessions per user
    assert len(batch) == 4
