"""Multimodal-column queries with DuckDB oracles.

Media bytes are synthesized from `documents.text` (UTF-8 → binary) —
the real corpus has no binary table, and this keeps both engines on
identical bytes. Two paths are checked:

- the pure-JVM stats path (`attach_content_stats`): size + md5;
- the `mapInPandas` decode path (`decode_features` with the
  deterministic fake decoder): its pseudo-outputs are md5-derived,
  so DuckDB reproduces them byte-for-byte — which makes the whole
  Arrow-batched Pandas-UDF plumbing (schema, batching, row order
  independence) oracle-checkable, a rare thing for a UDF path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collections.abc import Iterator

from pyspark.sql import types as T

from ..operators.multimodal import (
    attach_content_stats,
    decode_features,
    decode_media_headers,
    deterministic_fake_decoder,
    synthesize_media_bytes,
)
from ..session import load_tables
from . import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )


@register(
    "media_content_stats",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS content_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def media_content_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_content_stats(_media(spark, sf_dir)).select(
        "media_id", "content_bytes", "content_md5"
    )


# byte i of the md5 digest as an integer, in DuckDB
_MD5_BYTE = (
    "CAST(from_hex(substr(md5(text), {pos}, 2))::BIT::UBIGINT AS INT)"
)


@register(
    "media_decode_dimensions",
    f"""
    SELECT doc_id AS media_id,
           1 + {_MD5_BYTE.format(pos=17)} AS decoded_width,
           1 + {_MD5_BYTE.format(pos=19)} AS decoded_height
    FROM documents
    """,
)
def media_decode_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_features(
        _media(spark, sf_dir), decoder=deterministic_fake_decoder
    )
    return decoded.select("media_id", "decoded_width", "decoded_height")


# media_dimensions_report fixture arithmetic (shared by the Spark
# synth step, in Python, and the DuckDB oracle, in SQL — doc_id is
# 0-based so `%` agrees between the two):
#   fmt         = doc_id % 7  -> png jpeg gif bmp wav webp mp4
#   width       = 16 + doc_id % 1009   (image formats)
#   height      = 16 + doc_id % 757    (image formats)
#   duration_ms = 100 * (1 + doc_id % 50)  (wav + mp4)
#   corrupt     = doc_id % 17 == 0  -> bytes truncated to 5; the
#                 parser must yield all-NULL fields (never raise)
_FMT_NAMES = ["png", "jpeg", "gif", "bmp", "wav", "webp", "mp4"]


def _synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.doc_id → real container bytes (executor-side)."""
    ids = load_tables(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator) -> Iterator:
        for pdf in batches:
            blobs = []
            for media_id in pdf["media_id"]:
                i = int(media_id)
                fmt = _FMT_NAMES[i % 7]
                raw = synthesize_media_bytes(
                    fmt,
                    width=16 + i % 1009,
                    height=16 + i % 757,
                    duration_ms=100 * (1 + i % 50),
                )
                blobs.append(raw[:5] if i % 17 == 0 else raw)
            pdf = pdf.copy()
            pdf["content"] = blobs
            yield pdf[["media_id", "content"]]

    return ids.mapInPandas(synth, schema=out_schema)


@register(
    "media_dimensions_report",
    """
    WITH m AS (
        SELECT CASE WHEN doc_id % 17 = 0 THEN NULL
                    ELSE CASE doc_id % 7
                         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                         WHEN 2 THEN 'gif' WHEN 3 THEN 'bmp'
                         WHEN 4 THEN 'wav' WHEN 5 THEN 'webp'
                         ELSE 'mp4' END END AS media_format,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 7 IN (4, 6)
                    THEN NULL ELSE 16 + doc_id % 1009 END AS w,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 7 IN (4, 6)
                    THEN NULL ELSE 16 + doc_id % 757 END AS h,
               CASE WHEN doc_id % 17 <> 0 AND doc_id % 7 IN (4, 6)
                    THEN 100 * (1 + doc_id % 50) ELSE NULL END AS d
        FROM documents)
    SELECT media_format,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(COALESCE(SUM(w), 0) AS BIGINT) AS total_width,
           CAST(COALESCE(SUM(h), 0) AS BIGINT) AS total_height,
           CAST(COALESCE(SUM(d), 0) AS BIGINT) AS total_duration_ms
    FROM m
    GROUP BY media_format
    """,
)
def media_dimensions_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→parse round trip over REAL container bytes.

    The Spark side synthesizes valid PNG/JPEG/GIF/BMP/WAV/WEBP/MP4
    headers from ``doc_id`` arithmetic (every 17th payload truncated
    to 5 bytes), then recovers format/width/height/duration with
    :func:`..operators.multimodal.parse_media_header` — the r14
    default decoder. The oracle recomputes the fields from the same
    arithmetic directly, so any endianness/offset/segment-walk/box-
    walk bug in the parser (or a crash on the corrupt rows) breaks
    the value hash. Corrupt rows land in the NULL-format group.
    """
    parsed = decode_media_headers(_synth_media(spark, sf_dir))
    return parsed.groupBy("media_format").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.coalesce(F.sum("media_width"), F.lit(0)).cast("long").alias("total_width"),
        F.coalesce(F.sum("media_height"), F.lit(0)).cast("long").alias("total_height"),
        F.coalesce(F.sum("media_duration_ms"), F.lit(0))
        .cast("long")
        .alias("total_duration_ms"),
    )
