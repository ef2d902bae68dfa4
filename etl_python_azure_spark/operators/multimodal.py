"""Multimodal (image/audio/video) column plumbing.

North-star extension (BASELINE.json): media travel as opaque
``binary`` columns with a typed metadata struct; decode / resize /
frame-sample / feature-extract run as Arrow-batched Pandas
transforms (``mapInPandas``) so bytes stream executor-side in
columnar batches — the driver never sees payloads.

The decode step itself needs codec libraries (PIL/ffmpeg/…) that are
NOT in this container, so the actual pixel/sample decoding is
**stubbed**: ``decoder=None`` raises ``NotImplementedError`` at plan
build time, and tests inject :func:`deterministic_fake_decoder`,
which derives stable pseudo-features from the md5 of the bytes. The
Spark-side contract — schemas, batch iteration, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata contract for a media column
MEDIA_METADATA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_METADATA),
    ]
)

FEATURE_DIM = 8


def attach_content_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Size + content hash — pure JVM expressions, no decode needed.

    The dedup entry point for media: ``content_md5`` feeds
    :func:`.dedup.exact_dedup` unchanged.
    """
    return df.withColumns(
        {
            "content_bytes": F.length(F.col(content_col)).cast("long"),
            "content_md5": F.md5(F.col(content_col)),
        }
    )


# Decoder contract: bytes -> dict of decoded fields
Decoder = Callable[[bytes], dict]


def deterministic_fake_decoder(content: bytes) -> dict:
    """Stand-in for a real image/audio decoder (codec libs absent).

    Produces stable pseudo-outputs from the content hash so tests
    are deterministic: FEATURE_DIM floats in [0, 1) + a fake
    (width, height).
    """
    h = hashlib.md5(content or b"").digest()
    feats = [b / 255.0 for b in h[:FEATURE_DIM]]
    return {
        "features": feats,
        "decoded_width": 1 + h[FEATURE_DIM],
        "decoded_height": 1 + h[FEATURE_DIM + 1],
    }


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    decoder: Decoder | None = None,
    batch_note: str = "image",
) -> DataFrame:
    """Decode + feature-extract media bytes via ``mapInPandas``.

    Output: input columns + ``features array<float>`` +
    ``decoded_width``/``decoded_height``. Arrow moves each partition
    as pandas batches; one decoder call per row inside the batch
    loop (vectorize inside *decoder* when the codec allows).

    Raises ``NotImplementedError`` without an injected *decoder* —
    real codecs are not available in this environment.
    """
    if decoder is None:
        raise NotImplementedError(
            f"no {batch_note} decoder available in this environment; "
            "inject decoder= (tests use deterministic_fake_decoder)"
        )

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("decoded_width", T.IntegerType()),
            T.StructField("decoded_height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats, ws, hs = [], [], []
            for content in pdf[content_col]:
                d = decoder(bytes(content) if content is not None else b"")
                feats.append(d["features"])
                ws.append(d["decoded_width"])
                hs.append(d["decoded_height"])
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["decoded_width"] = ws
            pdf["decoded_height"] = hs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Explode one row per sampled frame timestamp (video path).

    Pure expressions: frame times are a ``sequence`` over the
    duration metadata; actual frame *decoding* then goes through
    :func:`decode_features` per frame-row. NULL/zero durations yield
    no frames.
    """
    frame_ts = F.when(
        F.col(duration_col).isNotNull() & (F.col(duration_col) > 0),
        F.sequence(F.lit(0), F.col(duration_col) - 1, F.lit(every_ms)),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn("frame_ms", F.explode(frame_ts))
