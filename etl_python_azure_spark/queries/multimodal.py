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

from ..operators.multimodal import (
    attach_content_stats,
    decode_features,
    deterministic_fake_decoder,
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
