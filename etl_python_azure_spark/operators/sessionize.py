"""Sessionization + time-window aggregation (SURVEY §2.9 gap-fill).

The reference has no event-time operators (its daily grain comes
pre-bucketed from the API, `L:154`); these fill that gap Spark-first:
``session_window`` / ``window`` work identically over batch
DataFrames and Structured Streams, so the same operator serves the
timer-driven micro-batch restatement (T1–T3) and a true stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    gap: str = "30 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Group events into gap-based sessions per key.

    Semantics (same as streaming ``session_window``): a session is a
    maximal run of events where each is < *gap* after the previous;
    ``session_end = last_ts + gap`` (end-exclusive — an event at
    exactly ``last_ts + gap`` starts a new session).

    *aggs* maps OUTPUT NAME → aggregate expression (explicit names,
    not parsed from the expression — alias introspection relies on a
    private JVM API that breaks under Spark Connect).

    Batch plan: one shuffle on the keys, then window merge — Catalyst
    compiles session_window to a sort-based merge within partitions,
    so it scales linearly with events per key (no per-key collect).
    """
    keys = key_cols or []
    aggs = aggs or {"n_events": F.count("*")}
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            *[F.col(n) for n in aggs],
        )
    )


def touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First/last-touch attribution: for every conversion event,
    which touch (non-conversion event) opened and which closed the
    path since the user's previous conversion?

    Marketing-analytics staple the reference's daily-grain tables
    can't express (`L:154` pre-buckets away the ordering). Each
    conversion row comes back as::

        (key, conversion_id, conversion_ts, conversion_value,
         first_touch_type, last_touch_type, n_touches)

    with NULL touch columns for conversions with no preceding touch
    in their segment (back-to-back conversions).

    Semantics: a user's events are segmented at conversions — each
    conversion claims the touches strictly after the previous
    conversion and strictly before itself (ties broken by *id_col*).

    Scale shape: ONE shuffle on *key_col* feeds all three window
    passes (running segment id, running first/last/count) — Catalyst
    collapses same-partitioning windows into a single sort. No
    self-join, no per-user collect.
    """
    is_conv = F.col(type_col) == conversion_type
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # segment id = number of conversions strictly BEFORE this row:
    # running count including self, minus self for conversion rows —
    # so a conversion lands in the segment of the touches it claims
    seg = (
        F.sum(is_conv.cast("int")).over(run)
        - is_conv.cast("int")
    ).alias("__seg")
    touch_type = F.when(~is_conv, F.col(type_col))
    segmented = df.select(
        key_col, ts_col, id_col, type_col, value_col, seg
    )
    w_seg = (
        Window.partitionBy(key_col, "__seg")
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = segmented.select(
        key_col,
        ts_col,
        id_col,
        type_col,
        value_col,
        F.first(touch_type, ignorenulls=True).over(w_seg).alias(
            "first_touch_type"
        ),
        F.last(touch_type, ignorenulls=True).over(w_seg).alias(
            "last_touch_type"
        ),
        (
            F.count(touch_type).over(w_seg)
        ).alias("n_touches"),
    )
    return enriched.filter(F.col(type_col) == conversion_type).select(
        key_col,
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
        F.col(value_col).alias("conversion_value"),
        "first_touch_type",
        "last_touch_type",
        F.col("n_touches").cast("long").alias("n_touches"),
    )


def tumbling_window(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    width: str = "1 hour",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Fixed (tumbling) event-time windows; same API batch or stream.
    *aggs* maps output name → aggregate expression."""
    keys = key_cols or []
    aggs = aggs or {"n_events": F.count("*")}
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            *[F.col(n) for n in aggs],
        )
    )
