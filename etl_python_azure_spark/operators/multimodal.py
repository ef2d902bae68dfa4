"""Multimodal (image/audio/video) column plumbing.

North-star extension (BASELINE.json): media travel as opaque
``binary`` columns with a typed metadata struct; decode / resize /
frame-sample / feature-extract run as Arrow-batched Pandas
transforms (``mapInPandas``) so bytes stream executor-side in
columnar batches — the driver never sees payloads.

PIXEL/SAMPLE decoding needs codec libraries (PIL/ffmpeg/…) that are
NOT in this container, so feature extraction stays injectable:
tests use :func:`deterministic_fake_decoder`, which derives stable
pseudo-features from the md5 of the bytes. But CONTAINER HEADERS are
public, fixed byte layouts — no codec needed — so the default
decode path is real since r14: :func:`parse_media_header` reads PNG
IHDR / JPEG SOFn / GIF / BMP (v3 + core) dimensions and WAV RIFF
duration with pure Python ``struct`` parsing, returning all-``None``
fields (never raising) on truncated/corrupt/unknown bytes.
:func:`synthesize_media_bytes` is the inverse used by fixtures and
the ``media_dimensions_report`` oracle query: it emits real
container bytes for chosen dimensions, so the encode→parse round
trip is DuckDB-checkable (an endianness or offset bug in the parser
breaks the value hash).
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


# JPEG start-of-frame markers that carry dimensions (baseline,
# progressive, lossless, arithmetic variants); C4/C8/CC are
# DHT/JPG/DAC — tables, not frames
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)
# markers with NO length field: TEM, RSTn, SOI, EOI
_JPEG_BARE = frozenset([0x01, *range(0xD0, 0xDA)])


def parse_media_header(content: bytes | None) -> dict:
    """Sniff container format + dimensions/duration from raw bytes.

    Pure-Python ``struct``-level parsing of public, fixed header
    layouts — no codec libraries:

    - PNG: 8-byte signature, IHDR width/height (big-endian u32).
    - JPEG: segment walk from SOI to the first SOFn marker
      (height/width big-endian u16 at offsets 3/5 of the frame
      segment); bare markers (RSTn/TEM) and entropy padding ``FF``
      fill are skipped per the JFIF spec.
    - GIF: ``GIF87a``/``GIF89a`` logical-screen width/height
      (little-endian u16).
    - BMP: ``BM`` + BITMAPINFOHEADER (v3+: i32 LE, top-down bitmaps
      store negative height → abs) or the 12-byte BITMAPCOREHEADER
      (u16 LE).
    - WEBP: RIFF/WEBP first chunk — VP8X (24-bit canvas dims − 1),
      VP8L (0x2F signature, packed 14-bit dims − 1) or VP8 lossy
      (0x9D012A sync code, 14-bit dims).
    - MP4/ISO-BMFF: top-level box walk to ``moov``, child walk to
      ``mvhd`` (version 0 and 1 layouts); ``duration_ms =
      duration * 1000 // timescale``.
    - WAV: RIFF/WAVE chunk walk; ``duration_ms = data_size * 1000
      // byte_rate`` from the fmt chunk (header-declared sizes, the
      same contract ffprobe-style sniffers use).

    Returns ``{"format", "width", "height", "duration_ms"}`` with
    ``None`` fields (never raises) for truncated, corrupt, or
    unrecognized bytes — the caller decides whether unparseable is
    an error.
    """
    none = {"format": None, "width": None, "height": None, "duration_ms": None}
    if not content:
        return none
    b = bytes(content)
    n = len(b)
    # --- PNG ---------------------------------------------------
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if n >= 24 and b[12:16] == b"IHDR":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return {"format": "png", "width": w, "height": h, "duration_ms": None}
        return none
    # --- JPEG --------------------------------------------------
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < n:
            if b[i] != 0xFF:  # not a marker: corrupt stream
                return none
            while i < n and b[i] == 0xFF:  # FF fill bytes are legal
                i += 1
            if i >= n:
                return none
            marker = b[i]
            i += 1
            if marker in _JPEG_BARE:
                continue
            if marker == 0xD9:  # EOI before any SOF
                return none
            if i + 1 >= n:
                return none
            seg_len = int.from_bytes(b[i : i + 2], "big")
            if seg_len < 2:
                return none
            if marker in _JPEG_SOF:
                if i + 7 > n:
                    return none
                h = int.from_bytes(b[i + 3 : i + 5], "big")
                w = int.from_bytes(b[i + 5 : i + 7], "big")
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
            i += seg_len
        return none
    # --- GIF ---------------------------------------------------
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if n >= 10:
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return {"format": "gif", "width": w, "height": h, "duration_ms": None}
        return none
    # --- BMP ---------------------------------------------------
    if b[:2] == b"BM":
        if n >= 18:
            hdr_size = int.from_bytes(b[14:18], "little")
            if hdr_size >= 40 and n >= 26:  # BITMAPINFOHEADER+
                w = int.from_bytes(b[18:22], "little", signed=True)
                h = int.from_bytes(b[22:26], "little", signed=True)
                return {
                    "format": "bmp",
                    "width": abs(w),
                    "height": abs(h),
                    "duration_ms": None,
                }
            if hdr_size == 12 and n >= 22:  # BITMAPCOREHEADER
                w = int.from_bytes(b[18:20], "little")
                h = int.from_bytes(b[20:22], "little")
                return {
                    "format": "bmp",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
        return none
    # --- WEBP --------------------------------------------------
    if b[:4] == b"RIFF" and n >= 12 and b[8:12] == b"WEBP":
        if n < 20:
            return none
        chunk = b[12:16]
        if chunk == b"VP8X":  # extended: 24-bit canvas dims - 1
            if n >= 30:
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return {
                    "format": "webp",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
            return none
        if chunk == b"VP8L":  # lossless: 14-bit dims - 1, packed
            if n >= 25 and b[20] == 0x2F:
                packed = int.from_bytes(b[21:25], "little")
                return {
                    "format": "webp",
                    "width": (packed & 0x3FFF) + 1,
                    "height": ((packed >> 14) & 0x3FFF) + 1,
                    "duration_ms": None,
                }
            return none
        if chunk == b"VP8 ":  # lossy: sync code then 14-bit dims
            if n >= 30 and b[23:26] == b"\x9d\x01\x2a":
                w = int.from_bytes(b[26:28], "little") & 0x3FFF
                h = int.from_bytes(b[28:30], "little") & 0x3FFF
                return {
                    "format": "webp",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
            return none
        return none
    # --- MP4 / ISO-BMFF ---------------------------------------
    if n >= 8 and b[4:8] == b"ftyp":
        i = 0
        while i + 8 <= n:  # top-level box walk to moov
            size = int.from_bytes(b[i : i + 4], "big")
            btype = b[i + 4 : i + 8]
            if size < 8:  # size 0/1 (to-EOF / 64-bit) unsupported here
                return none
            if btype == b"moov":
                j = i + 8
                end = min(i + size, n)
                while j + 8 <= end:  # moov children to mvhd
                    csize = int.from_bytes(b[j : j + 4], "big")
                    ctype = b[j + 4 : j + 8]
                    if csize < 8:
                        return none
                    if ctype == b"mvhd":
                        v = b[j + 8] if j + 8 < n else None
                        if v == 0 and j + 28 <= n:
                            ts = int.from_bytes(b[j + 20 : j + 24], "big")
                            dur = int.from_bytes(b[j + 24 : j + 28], "big")
                        elif v == 1 and j + 40 <= n:
                            ts = int.from_bytes(b[j + 28 : j + 32], "big")
                            dur = int.from_bytes(b[j + 32 : j + 40], "big")
                        else:
                            return none
                        if not ts:
                            return none
                        return {
                            "format": "mp4",
                            "width": None,
                            "height": None,
                            "duration_ms": dur * 1000 // ts,
                        }
                    j += csize
                return none
            i += size
        return none
    # --- WAV ---------------------------------------------------
    if b[:4] == b"RIFF" and n >= 12 and b[8:12] == b"WAVE":
        i = 12
        byte_rate = None
        data_size = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 16 + 12 <= n:
                byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = csize
            # chunks are word-aligned (odd sizes get a pad byte);
            # the data payload itself may be absent (header-only
            # fixture) — stop the walk rather than misread past it
            if cid == b"data":
                break
            i += 8 + csize + (csize & 1)
        if byte_rate and data_size is not None:
            return {
                "format": "wav",
                "width": None,
                "height": None,
                "duration_ms": data_size * 1000 // byte_rate,
            }
        return none
    return none


def synthesize_media_bytes(
    fmt: str, width: int = 0, height: int = 0, duration_ms: int = 0
) -> bytes:
    """Emit real container-header bytes for the chosen fields.

    The inverse of :func:`parse_media_header` for fixture/oracle
    use: output is a VALID header (signatures, segment lengths,
    chunk sizes all well-formed) with the payload omitted — enough
    for any header sniffer, deterministic for DuckDB oracles. WAV
    uses a fixed 16 kB/s byte rate (8 kHz · 16-bit mono) so
    ``duration_ms`` round-trips exactly for any integer input.
    """
    if fmt == "png":
        ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big")
        ihdr += b"\x08\x02\x00\x00\x00"  # bit depth 8, truecolor RGB
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC placeholder (not verified)
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
        sof0 = (
            b"\xff\xc0"
            + (17).to_bytes(2, "big")
            + b"\x08"  # precision
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # 3 components
        )
        return b"\xff\xd8" + app0 + sof0
    if fmt == "gif":
        return (
            b"GIF89a"
            + width.to_bytes(2, "little")
            + height.to_bytes(2, "little")
            + b"\xf7\x00\x00"  # GCT flags, background, aspect
        )
    if fmt == "bmp":
        info = (
            (40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")  # planes
            + (24).to_bytes(2, "little")  # bpp
            + b"\x00" * 24
        )
        return b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little") + info
    if fmt == "webp":  # VP8X extended header (canvas dims - 1)
        vp8x = (
            b"VP8X"
            + (10).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"  # feature flags + reserved
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        return b"RIFF" + (4 + len(vp8x)).to_bytes(4, "little") + b"WEBP" + vp8x
    if fmt == "mp4":  # ftyp + moov/mvhd v0, timescale 1000
        ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (512).to_bytes(4, "big")
        mvhd = (
            (108).to_bytes(4, "big")
            + b"mvhd"
            + b"\x00" * 4  # version 0 + flags
            + b"\x00" * 8  # creation + modification time
            + (1000).to_bytes(4, "big")  # timescale: 1 tick = 1 ms
            + duration_ms.to_bytes(4, "big")
            + b"\x00" * 80  # rate/volume/matrix/next_track_id
        )
        moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
        return ftyp + moov
    if fmt == "wav":
        byte_rate = 16000  # 8 kHz * 16-bit * mono
        data_size = byte_rate * duration_ms // 1000
        fmt_chunk = (
            b"fmt "
            + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little")  # PCM
            + (1).to_bytes(2, "little")  # mono
            + (8000).to_bytes(4, "little")
            + byte_rate.to_bytes(4, "little")
            + (2).to_bytes(2, "little")  # block align
            + (16).to_bytes(2, "little")  # bits/sample
        )
        data_hdr = b"data" + data_size.to_bytes(4, "little")
        riff_size = 4 + len(fmt_chunk) + len(data_hdr) + data_size
        return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt_chunk + data_hdr
    raise ValueError(f"unknown media format: {fmt!r}")


HEADER_SCHEMA_FIELDS = [
    T.StructField("media_format", T.StringType()),
    T.StructField("media_width", T.IntegerType()),
    T.StructField("media_height", T.IntegerType()),
    T.StructField("media_duration_ms", T.LongType()),
]


def decode_media_headers(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach real header-sniffed metadata columns via ``mapInPandas``.

    Output: input columns + ``media_format``/``media_width``/
    ``media_height``/``media_duration_ms`` (all NULL for
    unparseable bytes — rows are never dropped, so a downstream
    filter decides quarantine policy). Arrow-batched; the per-row
    parse touches only the first few hundred bytes of each payload.
    """
    out_schema = T.StructType(list(df.schema.fields) + HEADER_SCHEMA_FIELDS)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            parsed = [
                parse_media_header(bytes(c) if c is not None else None)
                for c in pdf[content_col]
            ]
            pdf = pdf.copy()
            pdf["media_format"] = [p["format"] for p in parsed]
            pdf["media_width"] = [p["width"] for p in parsed]
            pdf["media_height"] = [p["height"] for p in parsed]
            pdf["media_duration_ms"] = [p["duration_ms"] for p in parsed]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def builtin_header_decoder(content: bytes) -> dict:
    """Default :data:`Decoder`: real container-header parsing.

    Pixel features stay ``None`` (no codec libraries here — inject a
    real decoder for pixels); width/height come from
    :func:`parse_media_header`, so the default decode path works on
    real PNG/JPEG/GIF/BMP bytes instead of raising.
    """
    parsed = parse_media_header(content)
    return {
        "features": None,
        "decoded_width": parsed["width"],
        "decoded_height": parsed["height"],
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

    Without an injected *decoder* the default is
    :func:`builtin_header_decoder` — real header-level width/height,
    NULL features (pixel codecs are not available in this
    environment; inject one for real feature extraction).
    """
    if decoder is None:
        decoder = builtin_header_decoder

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
