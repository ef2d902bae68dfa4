"""applyInPandasWithState: state persists across micro-batches.

Sink is foreachBatch→parquet append (the memory sink can't resume
from a checkpoint, and resuming is exactly what's under test).
"""

from __future__ import annotations

from etl_python_azure_spark.streaming.pipeline import stream_parquet_dir
from etl_python_azure_spark.streaming.stateful import running_totals

SCHEMA = "user_id long, value double"


def _run_batch(spark, src, ckpt, out):
    stream = stream_parquet_dir(spark, src, SCHEMA)

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(out)

    q = (
        running_totals(stream, "user_id", "value")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], SCHEMA
    ).write.parquet(src)
    _run_batch(spark, src, ckpt, out)
    first = {
        r.user_id: (r.n_events_total, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    # second micro-batch (restarted query, same checkpoint): state for
    # user 1 carries over; user 3 is new; user 2 emits nothing
    spark.createDataFrame([(1, 2.0), (3, 7.0)], SCHEMA).write.mode(
        "append"
    ).parquet(src)
    _run_batch(spark, src, ckpt, out)
    rows = {
        (r.user_id, r.n_events_total, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 3, 17.0) in rows  # 2+1 events, 15+2 value — state kept
    assert (3, 1, 7.0) in rows
    assert not any(u == 2 and n > 1 for (u, n, _) in rows)


SESS_SCHEMA = "user_id long, ts timestamp, value double"


def _run_sessions(spark, src, ckpt, out):
    from etl_python_azure_spark.streaming.stateful import stateful_sessions

    stream = stream_parquet_dir(spark, src, SESS_SCHEMA).withWatermark(
        "ts", "10 seconds"
    )

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(out)

    q = (
        stateful_sessions(stream, "user_id", "ts", "value", gap_seconds=30)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stateful_sessions_inbatch_and_timeout_close(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = lambda s: datetime(2024, 1, 1, 0, 0, 0).replace(second=s % 60, minute=s // 60)

    # user 1: two events 10s apart, then one 90s later (> gap=30s) —
    # the first session must close in-batch
    spark.createDataFrame(
        [(1, t(0), 1.0), (1, t(10), 2.0), (1, t(100), 4.0)], SESS_SCHEMA
    ).write.parquet(src)
    _run_sessions(spark, src, ckpt, out)
    rows = spark.read.parquet(out).collect()
    assert [(r.user_id, r.n_events, r.total_value, r.session_start, r.session_end)
            for r in rows] == [(1, 2, 3.0, t(0), t(10))]

    # a much later event advances the watermark past 100s+gap → the
    # parked session for user 1 times out and is emitted final
    spark.createDataFrame(
        [(2, datetime(2024, 1, 1, 1, 0, 0), 9.0)], SESS_SCHEMA
    ).write.mode("append").parquet(src)
    _run_sessions(spark, src, ckpt, out)
    got = {
        (r.user_id, r.n_events, r.total_value, r.session_start, r.session_end)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 1, 4.0, t(100), t(100)) in got  # timeout-closed session
    assert (1, 2, 3.0, t(0), t(10)) in got
    assert not any(u == 2 for (u, *_ ) in got)  # user 2 still open


def test_stateful_sessions_batching_invariant(spark, tmp_path):
    """Closed sessions must not depend on how events split into
    micro-batches (1 batch vs 3 restarts over the same data)."""
    from datetime import datetime

    t0 = datetime(2024, 1, 1)

    def ts(s):
        return datetime(2024, 1, 1, 0, s // 60, s % 60)

    # in global ts order: batch splits must respect the watermark
    # contract (events older than wm are dropped as late by design)
    rows = [
        (1, ts(0), 1.0), (2, ts(5), 1.0), (1, ts(10), 2.0),
        (2, ts(50), 1.0), (1, ts(100), 4.0), (2, ts(200), 8.0),
    ]
    late = (9, datetime(2024, 1, 1, 2, 0, 0), 0.0)  # advances watermark

    def run(groups, tag):
        src = str(tmp_path / f"src_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        out = str(tmp_path / f"out_{tag}")
        for g in groups:
            spark.createDataFrame(g, SESS_SCHEMA).write.mode("append").parquet(src)
            _run_sessions(spark, src, ckpt, out)
        return {
            (r.user_id, r.n_events, r.total_value, r.session_start, r.session_end)
            for r in spark.read.parquet(out).collect()
        }

    one = run([rows + [late]], "one")
    three = run([rows[:3], rows[3:5], rows[5:] + [late]], "three")
    assert one == three
    # all six real events land in closed sessions (user 9 still open)
    assert sum(n for (_, n, *_rest) in one) == 6


def test_stateful_sessions_out_of_order_within_watermark(spark, tmp_path):
    """A cross-batch out-of-order event inside the watermark horizon
    must not regress the session's end: the reviewer scenario — t=5
    arriving after (0, 10) — then t=38 (38-10=28 < gap) extends the
    SAME session instead of splitting."""
    from datetime import datetime

    def ts(s):
        return datetime(2024, 1, 1, 0, s // 60, s % 60)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(10), 1.0)], SESS_SCHEMA
    ).write.parquet(src)
    _run_sessions(spark, src, ckpt, out)  # state: last=10, wm ~ 0
    spark.createDataFrame(
        [(1, ts(5), 1.0), (1, ts(38), 1.0)], SESS_SCHEMA
    ).write.mode("append").parquet(src)
    _run_sessions(spark, src, ckpt, out)
    spark.createDataFrame(
        [(9, datetime(2024, 1, 1, 2, 0, 0), 0.0)], SESS_SCHEMA
    ).write.mode("append").parquet(src)
    _run_sessions(spark, src, ckpt, out)  # timeout-close user 1
    got = {
        (r.user_id, r.n_events, r.total_value, r.session_start, r.session_end)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 4, 4.0, ts(0), ts(38))}
