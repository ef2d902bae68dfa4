"""Watermark semantics: events later than the watermark are dropped
from finalized windows; events within it amend their window."""

from __future__ import annotations

import datetime

from etl_python_azure_spark.streaming.pipeline import (
    stream_parquet_dir,
    windowed_stream_agg,
)

SCHEMA = "user_id long, ts timestamp, value double"
D = datetime.datetime


def _run(spark, src, ckpt, out):
    stream = stream_parquet_dir(spark, src, SCHEMA)
    agg = windowed_stream_agg(stream, "ts", ["user_id"], "1 hour", "30 minutes")

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


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / p) for p in ("src", "ckpt", "out"))
    # batch 1: events at 10:00–10:10, plus one at 14:00 advancing
    # event time far past the 10:00 window + 30min watermark
    spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 0), 1.0),
            (1, D(2024, 1, 1, 10, 10), 2.0),
            (1, D(2024, 1, 1, 14, 0), 9.0),
        ],
        SCHEMA,
    ).write.parquet(src)
    _run(spark, src, ckpt, out)

    # batch 2: a late event for the (already finalized) 10:00 window
    spark.createDataFrame(
        [(1, D(2024, 1, 1, 10, 20), 100.0)], SCHEMA
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    # batch 3: advance watermark further so all closable windows emit
    spark.createDataFrame(
        [(1, D(2024, 1, 1, 18, 0), 0.5)], SCHEMA
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    rows = {
        (r.user_id, r.window_start): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window finalized with the two on-time events only —
    # the late 10:20 event (beyond watermark) was dropped
    assert rows[(1, D(2024, 1, 1, 10, 0))] == (2, 3.0)
    # the 14:00 window emitted once closable
    assert rows[(1, D(2024, 1, 1, 14, 0))] == (1, 9.0)
