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
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Group events into gap-based sessions per key.

    Semantics (same as streaming ``session_window``): a session is a
    maximal run of events where each is < *gap* after the previous;
    ``session_end = last_ts + gap`` (end-exclusive — an event at
    exactly ``last_ts + gap`` starts a new session).

    Batch plan: one shuffle on the keys, then window merge — Catalyst
    compiles session_window to a sort-based merge within partitions,
    so it scales linearly with events per key (no per-key collect).
    """
    keys = key_cols or []
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    # Column alias introspection: last part of the expression name
    names = []
    for c in aggs:
        s = c._jc.toString()
        names.append(s.split(" AS ")[-1].strip("`"))
    return names


def tumbling_window(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    width: str = "1 hour",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Fixed (tumbling) event-time windows; same API batch or stream."""
    keys = key_cols or []
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"), *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )
