"""Streaming semantics (memory-sink smoke over real testdata) and
multimodal column plumbing."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_content_stats,
    decode_features,
    deterministic_fake_decoder,
    sample_frames,
)
from etl_python_azure_spark.session import load_tables
from etl_python_azure_spark.streaming.pipeline import (
    micro_batch_upsert,
    sessionized_stream,
    stream_parquet_dir,
    windowed_stream_agg,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write the events table as a clean parquet dir (the testdata
    file is a single .parquet file; streaming wants a directory, and
    the ns-timestamp needs the µs conversion first)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_tables(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def test_windowed_stream_agg_matches_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = stream_parquet_dir(spark, events_dir, schema)
    agg = windowed_stream_agg(stream, "ts", ["event_type"], "1 hour", "30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM win_out")
        batch = (
            spark.read.parquet(events_dir)
            .groupBy("event_type", F.date_trunc("hour", "ts").alias("window_start"))
            .agg(F.count("*").alias("n_events"))
        )
        assert got.count() == batch.count()
        # spot-check one window's count
        g = {(r.event_type, r.window_start): r.n_events for r in got.collect()}
        b = {(r.event_type, r.window_start): r.n_events for r in batch.collect()}
        assert g == b
    finally:
        q.stop()


def test_sessionized_stream_runs(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = stream_parquet_dir(spark, events_dir, schema)
    sess = sessionized_stream(stream, "ts", ["user_id"], "30 minutes", "1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM sess_out").first().n
        assert n > 0
    finally:
        q.stop()


def test_micro_batch_upsert(spark, tmp_path):
    src = str(tmp_path / "in")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    d = datetime.datetime
    spark.createDataFrame(
        [(1, d(2024, 1, 1), "a"), (2, d(2024, 1, 1), "b")],
        "id long, updated_at timestamp, v string",
    ).write.parquet(src)
    stream = stream_parquet_dir(spark, src, "id long, updated_at timestamp, v string")
    q = micro_batch_upsert(stream, tgt, "id", "updated_at", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # second batch: update id=2 (newer), stale id=1 (older is absent —
    # equal version is dropped per strict-> semantics), insert id=3
    spark.createDataFrame(
        [(2, d(2024, 2, 1), "b2"), (3, d(2024, 1, 1), "c"), (1, d(2024, 1, 1), "stale")],
        "id long, updated_at timestamp, v string",
    ).write.mode("append").parquet(src)
    stream = stream_parquet_dir(spark, src, "id long, updated_at timestamp, v string")
    q = micro_batch_upsert(stream, tgt, "id", "updated_at", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from etl_python_azure_spark.sinks.files import read_snapshot

    got = {r.id: r.v for r in read_snapshot(spark, tgt).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}


def test_upsert_epoch_dedupes_within_batch_and_replays(spark, tmp_path):
    from etl_python_azure_spark.sinks.files import read_snapshot
    from etl_python_azure_spark.streaming.pipeline import _upsert_epoch

    d = datetime.datetime
    tgt = str(tmp_path / "tgt2")
    schema = "id long, updated_at timestamp, v string"
    # epoch 0 seeds the snapshot
    b0 = spark.createDataFrame([(1, d(2024, 1, 1), "a")], schema)
    _upsert_epoch(b0, tgt, "id", "updated_at", epoch_id=0)
    # epoch 1 carries TWO events for id=2 (both newer than nothing) and
    # two for id=1 (one newer, one older) — one row per key must win
    b1 = spark.createDataFrame(
        [
            (2, d(2024, 1, 5), "b_old"),
            (2, d(2024, 1, 6), "b_new"),
            (1, d(2023, 1, 1), "stale"),
            (1, d(2024, 2, 1), "a2"),
        ],
        schema,
    )
    _upsert_epoch(b1, tgt, "id", "updated_at", epoch_id=1)
    _upsert_epoch(b1, tgt, "id", "updated_at", epoch_id=1)  # replay

    rows = read_snapshot(spark, tgt).collect()
    assert len(rows) == 2  # no duplicate keys in the keyed snapshot
    got = {r.id: r.v for r in rows}
    assert got == {1: "a2", 2: "b_new"}


def _media_df(spark):
    rows = [
        (1, b"fake-image-bytes-1", {"mime": "image/png", "width": 4, "height": 4, "duration_ms": None}),
        (2, b"fake-video-bytes", {"mime": "video/mp4", "width": 16, "height": 9, "duration_ms": 3500}),
        (3, None, {"mime": "image/png", "width": 1, "height": 1, "duration_ms": None}),
        (4, b"fake-image-bytes-1", {"mime": "image/png", "width": 4, "height": 4, "duration_ms": None}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_content_stats_and_exact_dedup(spark):
    from etl_python_azure_spark.operators.dedup import exact_dedup

    df = attach_content_stats(_media_df(spark))
    stats = {r.media_id: (r.content_bytes, r.content_md5) for r in df.collect()}
    assert stats[1][0] == len(b"fake-image-bytes-1")
    assert stats[3] == (None, None)
    assert stats[1][1] == stats[4][1]  # identical bytes → same hash
    deduped = exact_dedup(df.filter(F.col("content").isNotNull()), "content_md5", "media_id")
    assert {r.media_id: r.n_copies for r in deduped.collect()}[1] == 2


def test_decode_features_fake_decoder(spark):
    out = decode_features(_media_df(spark), decoder=deterministic_fake_decoder)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows[1].features) == 8
    assert rows[1].features == rows[4].features  # deterministic
    assert rows[1].features != rows[2].features
    assert rows[2].decoded_width >= 1


def test_decode_without_decoder_raises(spark):
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_features(_media_df(spark))


def test_sample_frames(spark):
    out = sample_frames(_media_df(spark), every_ms=1000)
    got = {}
    for r in out.collect():
        got.setdefault(r.media_id, []).append(r.frame_ms)
    assert got == {2: [0, 1000, 2000, 3000]}  # only the video row
