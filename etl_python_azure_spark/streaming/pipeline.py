"""Structured Streaming restatement of the reference's timer-driven
micro-batch model (T1–T5).

The reference re-runs batch pipelines on cron timers (`L:24`,
`S:25`) and absorbs late data by recomputing a 27-day window (T3).
Spark-first equivalents:

- a file-source stream with ``Trigger.AvailableNow`` IS the
  timer-driven rerun: each scheduler tick processes exactly the new
  files, with checkpointed exactly-once bookkeeping replacing the
  reference's at-least-once full refresh;
- watermarks + windowed aggregation absorb late events without
  recomputation (the T3 analog — `withWatermark(ts, "25 days")`);
- ``foreachBatch`` + :func:`..operators.joins.merge_upsert` gives
  the incremental CDC load (T4) on any sink.

These wrappers keep the same operator expressions as the batch
queries (sessionize/tumbling in :mod:`..operators.sessionize` use
``session_window``/``window``, valid in both modes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (micro-batch
    ingestion; schema explicit — streaming sources don't infer)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_stream_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    width: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums — late events inside
    the watermark amend their window; older ones are dropped
    (bounded state — the 100 TB-safe version of T3's recompute)."""
    keys = key_cols or []
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked session windows (merging state per key)."""
    keys = key_cols or []
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def micro_batch_upsert(
    stream: DataFrame,
    target_path: str,
    key: str,
    version_col: str,
    checkpoint: str,
) -> DataStreamWriter:
    """T4 as a stream: each micro-batch MERGEs into a parquet
    snapshot via ``foreachBatch`` (new snapshot dir + swap, since
    plain parquet can't be read and overwritten in place — with a
    Delta/Iceberg sink this becomes ``MERGE INTO`` directly).
    """
    from ..operators.joins import merge_upsert
    from ..sinks.files import full_refresh

    def do_merge(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        import os

        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path)
            merged = merge_upsert(batch, existing, key, version_col)
            tmp = f"{target_path}._new"
            full_refresh(merged, tmp)
            old = f"{target_path}._old"
            os.rename(target_path, old)
            os.rename(tmp, target_path)
            import shutil

            shutil.rmtree(old)
        else:
            # dedupe within the first batch by (key, version desc)
            from pyspark.sql import Window

            w = Window.partitionBy(key).orderBy(F.desc(version_col))
            first = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            full_refresh(first, target_path)

    return (
        stream.writeStream.foreachBatch(do_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL -30 MINUTES",
    upper: str = "INTERVAL 0 SECONDS",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with a time-bound join condition:

        l.on = r.on AND r_ts + lower <= l_ts < r_ts + upper

    the streaming analog of :func:`..operators.range_join.band_join`
    (e.g. views within the 30 min before each purchase, as the
    events arrive). The interval bound is not just semantics — it is
    what lets Spark EVICT buffered state: with both sides
    watermarked and the join time-constrained, rows older than
    (watermark + band) are dropped from the state store, so state
    stays bounded on an unbounded stream. An unconstrained
    stream-stream equi-join would buffer forever.

    Column names must be disjoint apart from *on* (pre-alias like
    the batch operator).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} "
        f"AND l.{left_ts} >= r.{right_ts} + {lower} "
        f"AND l.{left_ts} < r.{right_ts} + {upper}"
    )
    dup = [c for c in right.columns if c == on]
    out = l.join(r, cond, "inner")
    # keep one copy of the equi-key
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != on
    ]
    return out.select(*keep) if dup else out


def deduped_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once ingest → effectively-once rows: drop re-deliveries
    of the same *keys* arriving within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key
    only until the watermark passes it — bounded state, unlike plain
    ``dropDuplicates`` on a stream (which retains every key forever).
    This is the streaming form of the reference's at-least-once
    retry posture (T5): replays inside the horizon deduplicate; the
    sink's CDC merge (T4) makes anything later idempotent anyway.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def maintained_rollup(
    stream: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    target_path: str,
    checkpoint: str,
) -> DataStreamWriter:
    """Incrementally-maintained rollup: each micro-batch is reduced
    to per-key DECIMAL partials and folded into the stored partial
    table (``merge_partial_aggregates``) — history is never re-read,
    and the decimal algebra keeps the maintained table EXACTLY equal
    to a from-scratch aggregate, with no float drift across
    arbitrarily many batches. Same snapshot-swap sink as
    :func:`micro_batch_upsert`.
    """
    import os
    import shutil

    from ..operators.aggregates import (
        merge_partial_aggregates,
        partial_aggregate,
    )
    from ..sinks.files import full_refresh

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        parts = [partial_aggregate(batch, keys, sum_cols)]
        if os.path.exists(target_path):
            parts.append(spark.read.parquet(target_path))
            merged = merge_partial_aggregates(parts, keys)
            tmp = f"{target_path}._new"
            full_refresh(merged, tmp)
            old = f"{target_path}._old"
            os.rename(target_path, old)
            os.rename(tmp, target_path)
            shutil.rmtree(old)
        else:
            full_refresh(parts[0], target_path)

    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
