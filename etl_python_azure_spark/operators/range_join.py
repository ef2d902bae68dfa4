"""Range (interval) join — bucketized so it scales.

The reference never joins on a range, but its windowed-reprocess
semantics (`L:146–147`: facts within [now−25d, now+2d]) and the
band-style "events near a purchase" analytics the engine adds both
need a point-in-interval join:

    left.point ∈ [right.start, right.end)      (per optional equi-key)

Spark turns a bare θ-predicate join into BroadcastNestedLoopJoin —
O(|L|·|R|) and a broadcast of a whole side, which does not survive
100 TB. The standard distributed form (the same binning trick
Databricks' range-join optimization and every interval-join engine
use) is:

1. pick a bucket width ``w`` (≈ the typical interval length),
2. each left point lands in ONE bucket ``floor(point/w)``,
3. each right interval EXPLODES to every bucket it overlaps
   (``sequence(floor(start/w), floor(end/w))``),
4. equi-join on (keys…, bucket) — hash/sort-merge, shuffles on the
   bucket key, AQE handles skew —
5. re-check the exact predicate to discard same-bucket misses.

Each left point is in exactly one bucket, so no dedup is needed.
Cost is |R| × (interval_len/w + 1) exploded rows: choose ``w`` near
the typical interval length so the blow-up is ~2×. A band join
(|l.t − r.t| ≤ δ) is the special case start=t−δ, end=t+δ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seconds(col: Column) -> Column:
    """Numeric (seconds for timestamps) view of a point/bound column."""
    return col.cast("double")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner join on ``start <= point < end`` (+ optional equi-keys).

    Parameters
    ----------
    left_point / right_start / right_end:
        Timestamp or numeric columns. Timestamps bucket on epoch
        seconds; the exact predicate still compares full precision.
    on:
        Extra equi-join keys (e.g. ``["user_id"]``); they join by
        name so each appears once in the output.
    bucket_width:
        Bucket size in seconds (or numeric units). Set it near the
        typical interval length: too small explodes the right side,
        too large degrades the post-filter selectivity.

    Output: all *left* columns + all non-key *right* columns (names
    must not collide — pre-alias if they do).
    """
    keys = list(on or [])
    w = float(bucket_width)

    l = left.withColumn(
        "__bucket", F.floor(_seconds(F.col(left_point)) / w).cast("long")
    )
    # degenerate (empty/negative) intervals match nothing; drop them
    # before sequence(), which would otherwise count downward
    r = right.filter(F.col(right_end) >= F.col(right_start)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_seconds(F.col(right_start)) / w).cast("long"),
                F.floor(_seconds(F.col(right_end)) / w).cast("long"),
            )
        ),
    )
    joined = l.join(r, on=keys + ["__bucket"], how="inner")
    return joined.filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    ).drop("__bucket")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower,
    upper,
    on: list[str] | None = None,
) -> DataFrame:
    """Inner join on ``right_ts + lower <= left_ts < right_ts + upper``.

    *lower*/*upper* are SQL interval literals (e.g. ``"INTERVAL 30
    MINUTES"``) or numeric offsets, matching the column types. Width
    of the band picks the bucket size.
    """
    low = F.expr(lower) if isinstance(lower, str) else F.lit(lower)
    up = F.expr(upper) if isinstance(upper, str) else F.lit(upper)
    r = right.withColumn("__start", F.col(right_ts) + low).withColumn(
        "__end", F.col(right_ts) + up
    )
    # bucket ≈ band width; evaluate the offset literals on a 1-row
    # frame (constant — no scan of *right*)
    anchor = F.to_timestamp(F.lit("2000-01-01"))
    probe = (
        right.sparkSession.range(1)
        .select(
            (_seconds(anchor + up) - _seconds(anchor + low)).alias("__w")
            if isinstance(lower, str) or isinstance(upper, str)
            else (up - low).cast("double").alias("__w")
        )
        .first()
    )
    width = max(float(probe["__w"]), 1.0)
    out = bucketed_range_join(
        left, r, left_ts, "__start", "__end", on=on, bucket_width=width
    )
    return out.drop("__start", "__end")
