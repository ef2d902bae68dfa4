"""Deterministic sampling / splitting for training-data pipelines.

`df.sample()` is seed-dependent across partitionings and engines —
useless for reproducible corpus construction. These use content
hashing instead: a row's fate depends only on its key, so samples
are stable under re-partitioning, re-runs, engine changes, and
incremental appends (a re-ingested row lands in the same split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key.

    Uses the first 8 hex chars as an integer — uniform, reproducible
    in any engine with md5 (DuckDB oracle: same expression).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < *percent* — a stable ~percent%
    sample keyed on *key_col*."""
    return df.filter(hash_bucket(key_col, buckets) < percent)


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, int], buckets: int = 100
) -> dict[str, DataFrame]:
    """Disjoint named splits (e.g. ``{"train": 90, "val": 5,
    "test": 5}``; values sum to ≤ *buckets*). Same key → same split,
    forever — the property train/test hygiene actually requires.
    """
    out: dict[str, DataFrame] = {}
    lo = 0
    b = hash_bucket(key_col, buckets)
    for name, width in fractions.items():
        out[name] = df.filter((b >= lo) & (b < lo + width))
        lo += width
    return out
