"""Physical-layout helpers: Z-order keys for multi-dimensional skipping.

Sorting a table by one column gives parquet min/max pruning on that
column only. Interleaving the bits of several normalized columns
(Morton / Z-order curve) yields ONE sort key whose ordering keeps
rows close in every interleaved dimension — after a
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` write, a
filter on any of the dimensions skips most row groups. This is the
layout transform behind lakehouse ``OPTIMIZE ZORDER BY``, expressed
as a plain Column so it works on vanilla parquet.

Everything is JVM bit-arithmetic (shiftright/shiftleft/bitwise-or
folded over the bit positions) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rescale a numeric column to an integer in [0, 2^bits).

    *lo*/*hi* are the column's (min, max) — pass literals from a
    stats pass or known domain bounds. Values at *hi* map to the top
    bucket; a degenerate domain (hi == lo) maps everything to 0.
    """
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(span <= 0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo.cast("double")) / span * ((1 << bits) - 1)
    )
    return F.floor(scaled + 0.5).cast("bigint")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave pre-normalized integer columns into one key.

    Each input must already be an integer in [0, 2^bits) (use
    :func:`normalize_to_bits`). Bit *i* of column *j* lands at
    position ``i * len(cols) + j`` of the key; total bits must fit a
    signed 64-bit long (``bits * len(cols) <= 62``).
    """
    n = len(cols)
    if bits * n > 62:
        raise ValueError("bits * len(cols) must be <= 62 to fit a long")
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_zordered(
    df: DataFrame,
    dims: list[str],
    path: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write *df* parquet, Z-ordered on *dims* (numeric columns).

    One stats pass collects per-dim (min, max); the write range-
    partitions + sorts on the interleaved key, so each output file
    covers a compact tile of the dim space and min/max skipping
    works for filters on any dim.
    """
    stats = df.agg(
        *[F.min(d).alias(f"__lo_{d}") for d in dims],
        *[F.max(d).alias(f"__hi_{d}") for d in dims],
    ).first()
    norm = [
        normalize_to_bits(
            F.col(d),
            F.lit(stats[f"__lo_{d}"]),
            F.lit(stats[f"__hi_{d}"]),
            bits,
        )
        for d in dims
    ]
    keyed = df.withColumn("__z", zorder_key(norm, bits))
    out = (
        keyed.repartitionByRange(num_files, "__z")
        if num_files
        else keyed.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
