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
    decode_media_headers,
    deterministic_fake_decoder,
    parse_media_header,
    sample_frames,
    synthesize_media_bytes,
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


def test_decode_default_is_header_parser(spark):
    """r14: the default decoder reads real container headers instead
    of raising — non-container bytes yield NULL dims, real PNG bytes
    yield the encoded dims, features stay NULL (no pixel codecs)."""
    png = synthesize_media_bytes("png", width=320, height=200)
    rows = [
        (1, png, None),
        (2, b"fake-video-bytes", None),
    ]
    out = decode_features(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r.media_id: r for r in out.collect()}
    assert (got[1].decoded_width, got[1].decoded_height) == (320, 200)
    assert got[1].features is None
    assert (got[2].decoded_width, got[2].decoded_height) == (None, None)


# ---- parse_media_header: pure-Python, no Spark ------------------

_ROUND_TRIPS = [
    ("png", 1, 1, None),
    ("png", 65535, 4096, None),
    ("jpeg", 320, 200, None),
    ("jpeg", 1, 65535, None),
    ("gif", 640, 480, None),
    ("bmp", 800, 600, None),
    ("webp", 1, 1, None),
    ("webp", 16383, 10000, None),
    ("wav", None, None, 0),
    ("wav", None, None, 12345),
    ("mp4", None, None, 0),
    ("mp4", None, None, 654321),
]


@pytest.mark.parametrize("fmt,w,h,d", _ROUND_TRIPS)
def test_header_round_trip(fmt, w, h, d):
    raw = synthesize_media_bytes(fmt, width=w or 0, height=h or 0, duration_ms=d or 0)
    got = parse_media_header(raw)
    assert got == {"format": fmt, "width": w, "height": h, "duration_ms": d}


def test_header_parser_jpeg_variants():
    # SOF2 (progressive) after a COM segment and an RST fill: the
    # segment walk must skip non-frame segments and bare markers
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    sof2 = (
        b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
        + (99).to_bytes(2, "big") + (77).to_bytes(2, "big") + b"\x01\x11\x00"
    )
    raw = b"\xff\xd8" + com + b"\xff\xff" + b"\xff\x01" + sof2
    got = parse_media_header(raw)
    assert (got["format"], got["width"], got["height"]) == ("jpeg", 77, 99)
    # DHT (C4) must NOT be mistaken for a frame
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x00\x00"
    assert parse_media_header(b"\xff\xd8" + dht)["format"] is None


def test_header_parser_webp_vp8_and_vp8l():
    """The synthesizer emits VP8X; the lossy (VP8 sync code) and
    lossless (VP8L packed 14-bit) first-chunk layouts parse too."""
    vp8 = (
        b"VP8 " + (10).to_bytes(4, "little")
        + b"\x00\x00\x00"  # frame tag
        + b"\x9d\x01\x2a"  # sync code
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
    )
    raw = b"RIFF" + (4 + len(vp8)).to_bytes(4, "little") + b"WEBP" + vp8
    got = parse_media_header(raw)
    assert (got["format"], got["width"], got["height"]) == ("webp", 320, 240)

    packed = (100 - 1) | ((75 - 1) << 14)
    vp8l = (
        b"VP8L" + (5).to_bytes(4, "little")
        + b"\x2f" + packed.to_bytes(4, "little")
    )
    raw = b"RIFF" + (4 + len(vp8l)).to_bytes(4, "little") + b"WEBP" + vp8l
    got = parse_media_header(raw)
    assert (got["format"], got["width"], got["height"]) == ("webp", 100, 75)


def test_header_parser_mp4_v1_and_preceding_boxes():
    """mvhd version 1 (64-bit times) and a moov that is NOT the
    first top-level box both parse via the box walks."""
    mvhd = (
        (120).to_bytes(4, "big") + b"mvhd"
        + b"\x01\x00\x00\x00"  # version 1
        + b"\x00" * 16  # 64-bit creation + modification
        + (90000).to_bytes(4, "big")  # timescale
        + (90000 * 7).to_bytes(8, "big")  # duration: 7 s
        + b"\x00" * 80
    )
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    free = (16).to_bytes(4, "big") + b"free" + b"\x00" * 8
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (512).to_bytes(4, "big")
    got = parse_media_header(ftyp + free + moov)
    assert (got["format"], got["duration_ms"]) == ("mp4", 7000)


def test_header_parser_bmp_core_and_topdown():
    # 12-byte BITMAPCOREHEADER (u16 dims)
    core = (
        b"BM" + (26).to_bytes(4, "little") + b"\x00" * 4
        + (26).to_bytes(4, "little") + (12).to_bytes(4, "little")
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
    )
    got = parse_media_header(core)
    assert (got["format"], got["width"], got["height"]) == ("bmp", 320, 240)
    # top-down BMP stores negative height → abs
    v3 = bytearray(synthesize_media_bytes("bmp", width=64, height=48))
    v3[22:26] = (-48).to_bytes(4, "little", signed=True)
    got = parse_media_header(bytes(v3))
    assert (got["width"], got["height"]) == (64, 48)


_NONE = {"format": None, "width": None, "height": None, "duration_ms": None}


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        b"\x00" * 64,  # unknown magic
        b"not media at all",
        synthesize_media_bytes("png", 9, 9)[:5],  # truncated sig
        synthesize_media_bytes("png", 9, 9)[:20],  # sig ok, IHDR cut
        synthesize_media_bytes("jpeg", 9, 9)[:5],  # SOI + partial APP0
        synthesize_media_bytes("jpeg", 9, 9)[:27],  # SOF cut mid-dims
        b"\xff\xd8\x00\x00",  # JPEG with corrupt marker stream
        b"\xff\xd8\xff\xd9",  # EOI before any SOF
        synthesize_media_bytes("gif", 9, 9)[:5],
        synthesize_media_bytes("bmp", 9, 9)[:10],
        synthesize_media_bytes("wav", duration_ms=100)[:5],
        synthesize_media_bytes("wav", duration_ms=100)[:11],  # no WAVE tag
        synthesize_media_bytes("webp", 9, 9)[:5],
        synthesize_media_bytes("webp", 9, 9)[:25],  # VP8X cut mid-dims
        b"RIFF\x08\x00\x00\x00WEBPXXXX",  # unknown first chunk
        synthesize_media_bytes("mp4", duration_ms=100)[:5],
        synthesize_media_bytes("mp4", duration_ms=100)[:20],  # no moov
        # moov present but mvhd truncated before the duration field
        synthesize_media_bytes("mp4", duration_ms=100)[:40],
        # mvhd with zero timescale must not divide by zero
        # (timescale bytes sit at 44:48 of the synthesized file:
        # 16-byte ftyp + moov hdr 8 + mvhd hdr 8 + ver/flags 4 +
        # creation/modification 8)
        bytes(
            bytearray(synthesize_media_bytes("mp4", duration_ms=100))[:44]
            + b"\x00\x00\x00\x00"
            + bytearray(synthesize_media_bytes("mp4", duration_ms=100))[48:]
        ),
        # WAV with zero byte_rate must not divide by zero
        bytes(
            bytearray(synthesize_media_bytes("wav", duration_ms=100))[:28]
            + b"\x00\x00\x00\x00"
            + bytearray(synthesize_media_bytes("wav", duration_ms=100))[32:]
        ),
    ],
)
def test_header_parser_corrupt_never_raises(blob):
    assert parse_media_header(blob) == _NONE


def test_synthesize_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown media format"):
        synthesize_media_bytes("tiff", 1, 1)


def test_decode_media_headers_spark(spark):
    rows = [
        (1, synthesize_media_bytes("gif", width=12, height=34), None),
        (2, synthesize_media_bytes("wav", duration_ms=2500), None),
        (3, b"\x00garbage", None),
        (4, None, None),
    ]
    out = decode_media_headers(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r.media_id: r for r in out.collect()}
    assert (got[1].media_format, got[1].media_width, got[1].media_height) == ("gif", 12, 34)
    assert (got[2].media_format, got[2].media_duration_ms) == ("wav", 2500)
    assert got[3].media_format is None
    assert got[4].media_format is None
    assert len(got) == 4  # unparseable rows kept, not dropped


def test_sample_frames(spark):
    out = sample_frames(_media_df(spark), every_ms=1000)
    got = {}
    for r in out.collect():
        got.setdefault(r.media_id, []).append(r.frame_ms)
    assert got == {2: [0, 1000, 2000, 3000]}  # only the video row
