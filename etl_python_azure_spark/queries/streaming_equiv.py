"""Batch-equivalence oracles for the streaming operators.

The streaming pipelines (:mod:`..streaming.pipeline`) are verified by
pytest, but their *semantics* are batch-expressible: folding per-batch
partial aggregates must equal the direct aggregate, and replaying CDC
merges over any batching must equal "latest version per key". These
queries run those folds as plain batch plans so the correctness driver
can diff them against a DuckDB oracle — hard evidence that the
incremental maintenance algebra (decimal partials, strict-``>`` merge)
is exact, not just "runs".

Reference parity: the fold IS the reference's timer-driven re-run
(`L:24`, `S:25`) with history never re-read; the CDC replay is the
incremental load of `S:209–227` iterated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import merge_partial_aggregates, partial_aggregate
from ..operators.joins import merge_upsert
from ..session import load_tables
from . import register


# --------------------------------------------------------------------------
# Maintained rollup ≡ direct aggregate.  lineitem is split into 4
# deterministic "micro-batches" (pmod of the key), each reduced to
# per-key DECIMAL partials, and the partials folded — exactly what
# ``maintained_rollup``'s foreachBatch does across epochs.  Decimal
# addition is associative, so the fold equals the direct GROUP BY
# bit-for-bit; the oracle states the direct form.
# --------------------------------------------------------------------------
@register(
    "maintained_rollup_equiv",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def maintained_rollup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    batches = [
        li.filter(F.pmod("l_orderkey", F.lit(4)) == i) for i in range(4)
    ]
    parts = [
        partial_aggregate(b, keys, ["l_quantity", "l_extendedprice"])
        for b in batches
    ]
    # fold pairwise (epoch at a time), like the streaming sink does —
    # not one flat merge — so associativity is what's actually tested
    merged = parts[0]
    for p in parts[1:]:
        merged = merge_partial_aggregates([merged, p], keys)
    return merged.select(
        *keys,
        F.col("sum_l_quantity").cast("double").alias("sum_qty"),
        F.col("sum_l_extendedprice").cast("double").alias("sum_price"),
        F.col("n").alias("n_rows"),
        (F.col("sum_l_quantity").cast("double") / F.col("n")).alias("avg_qty"),
    )


# --------------------------------------------------------------------------
# CDC merge replay ≡ latest-version-per-key.  Events become a CDC
# stream keyed by user_id with a total-order version (ts, event_id);
# three disjoint "micro-batches" are upserted in sequence via
# ``merge_upsert`` (each batch deduped by key/version-desc first, as
# ``micro_batch_upsert`` does).  Any batching must converge to the
# same snapshot: the row with the max (ts, event_id) per user.
# --------------------------------------------------------------------------
@register(
    "cdc_replay_equiv",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_replay_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.struct("ts", "event_id").alias("version"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("version"))

    def dedup(batch: DataFrame) -> DataFrame:
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    snapshot: DataFrame | None = None
    for i in range(3):
        batch = dedup(e.filter(F.pmod("event_id", F.lit(3)) == i))
        snapshot = (
            batch
            if snapshot is None
            else merge_upsert(batch, snapshot, key="user_id", version_col="version")
        )
        # the real sink MATERIALIZES each epoch's snapshot (parquet
        # write) — mirror that, or the unrolled lineage compounds into
        # one enormous plan re-scanning events once per epoch
        snapshot = snapshot.localCheckpoint(eager=True)
    return snapshot.select("user_id", "event_id", "ts", "value")


# --------------------------------------------------------------------------
# Sketch-partial maintenance: COUNT(DISTINCT) kept fresh by folding
# per-batch HLL sketches. The estimate itself is engine-specific
# (datasketches), so the oracle checks what is portable: the exact
# row-count partials and the ERROR-BOUND claim — the folded estimate
# must land within 2% of the true distinct count, stated as a
# hash-checked boolean against DuckDB's exact count.
# --------------------------------------------------------------------------
@register(
    "sketch_distinct_maintenance",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_orderkey) AS exact_distinct,
           TRUE AS est_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_distinct_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import (
        distinct_sketch,
        finalize_distinct,
        merge_distinct_sketches,
    )

    li = load_tables(spark, sf_dir, "lineitem")
    keys, dcol = ["l_returnflag"], "l_orderkey"
    batches = [
        li.filter(F.pmod("l_orderkey", F.lit(4)) == i) for i in range(4)
    ]
    # lgConfigK=16 → HLL rse ≈ 1.04/√2^16 ≈ 0.4%, so the 2%
    # certificate sits at ~5σ. The operator default (12, rse ≈ 1.6%)
    # made 2% a ~1.3σ claim that flipped for one group at sf0.1 —
    # caught by the full-sweep oracle diff, invisible at sf0.01.
    # Estimates are hash-deterministic per dataset, so a bound that
    # holds across the sf sweeps is stable run-to-run; 64 KB of
    # registers per group is the price, tune per workload at scale.
    parts = [distinct_sketch(b, keys, dcol, lg_config_k=16) for b in batches]
    merged = parts[0]
    for p in parts[1:]:
        merged = merge_distinct_sketches([merged, p], keys, dcol)
    est = finalize_distinct(merged, dcol, "est")
    exact = li.groupBy(*keys).agg(
        F.countDistinct(dcol).alias("exact_distinct")
    )
    return est.join(exact, keys).select(
        *keys,
        "n",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.02 * F.col("exact_distinct")
        ).alias("est_within_2pct"),
    )


# --------------------------------------------------------------------------
# Custom stateful sessionization ≡ SQL sessions.  The driver row runs
# the VECTORIZED batch twin (streaming.stateful.
# pandas_sessions_vectorized — one numpy pass per sorted partition,
# 12× the per-event automaton) and must reproduce the lag/running-sum
# session construction exactly: same session boundaries, counts, and
# value totals (value folds as integer cents, so the sum is
# order-exact; the final /100.0 is the same IEEE division DuckDB's
# DECIMAL→DOUBLE cast performs).  The per-event automaton — the
# applyInPandasWithState transition logic itself — is pinned to this
# same output by tests/test_round3.py::
# test_vectorized_sessions_match_automaton, so the chain
# automaton ≡ vectorized ≡ SQL oracle stays closed without re-paying
# the 14× Python-boundary tax in every bench/driver round (r03
# verdict item 4).
# --------------------------------------------------------------------------
@register(
    "stateful_session_equiv",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def stateful_session_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import pandas_sessions_vectorized

    e = load_tables(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = pandas_sessions_vectorized(
        cents, "user_id", "ts", value_col="cents", gap_seconds=1800
    )
    return s.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        (F.col("total_value") / F.lit(100.0)).alias("total_value"),
    )
