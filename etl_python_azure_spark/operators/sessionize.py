"""Sessionization + time-window aggregation (SURVEY §2.9 gap-fill).

The reference has no event-time operators (its daily grain comes
pre-bucketed from the API, `L:154`); these fill that gap Spark-first:
``session_window`` / ``window`` work identically over batch
DataFrames and Structured Streams, so the same operator serves the
timer-driven micro-batch restatement (T1–T3) and a true stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
