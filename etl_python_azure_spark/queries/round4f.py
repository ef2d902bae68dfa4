"""Round-4f registry surface: scale-path alternatives and SQL
surface completions.

- top-3 per segment via the TWO-PHASE AGGREGATE top-k (same rows as
  the window formulation `top3_orders_per_segment`, but the hot
  group parallelizes across P reducers instead of one task)
- exact p25/p50/p75 quartiles per event type (type-1/lower
  quantiles at rn = ceil(q·n) — deterministic, no interpolating
  estimator)
- CUBE super-aggregate over order priority × status with an
  explicit grouping id (completes the grouping-sets/ROLLUP family)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register


@register(
    "top3_per_segment_agg",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def top3_per_segment_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same top-3-orders-per-segment result as the window
    formulation, computed by `grouped_topk`'s two-phase aggregate:
    the hot group's rows spread across P reducers (per-partition
    local top-k) and a merge pass keeps ≤ k·P candidates per group —
    the idiom that survives a billion-row hot group the window sort
    funnels into one task. The oracle is the window semantics;
    matching it hash-exactly IS the equivalence proof."""
    from ..operators.aggregates import grouped_topk

    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(
        F.broadcast(t["customer"]),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    out = grouped_topk(
        j,
        ["c_mktsegment"],
        "o_totalprice",
        "o_orderkey",
        k=3,
        ascending=False,
    )
    return out.select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")


@register(
    "value_quartiles_by_type",
    """
    WITH sized AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = ceil(CAST(0.25 AS DOUBLE) * n)
               THEN v END) AS p25,
           MAX(CASE WHEN rn = ceil(CAST(0.50 AS DOUBLE) * n)
               THEN v END) AS p50,
           MAX(CASE WHEN rn = ceil(CAST(0.75 AS DOUBLE) * n)
               THEN v END) AS p75
    FROM sized GROUP BY event_type
    """,
)
def value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower (type-1) quartiles of the event value per type:
    the value at rank ceil(q·n) under the (value, event_id) total
    order — deterministic on any engine, unlike interpolating
    percentile estimators whose partial sums drift. One value-sorted
    window pass + one hash aggregate."""
    e = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("v"), F.col("event_id")
    )
    sized = e.select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.col("event_id"),
    ).withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    q = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("v")
        )
    )
    return sized.groupBy("event_type").agg(
        F.min("n").cast("long").alias("n"),
        q(0.25).alias("p25"),
        q(0.50).alias("p50"),
        q(0.75).alias("p75"),
    )


@register(
    "cube_order_counts",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2
                + GROUPING(o_orderstatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE super-aggregate over priority × status (every subtotal
    combination plus the grand total in one pass — Spark expands the
    grouping sets map-side, so it's still one shuffle), with an
    explicit grouping id disambiguating NULL-as-subtotal from
    NULL-as-data. Completes the GROUPING SETS / ROLLUP / CUBE
    family."""
    o = load_tables(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            (
                F.grouping("o_orderpriority") * 2
                + F.grouping("o_orderstatus")
            )
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "gid", "n", "revenue"
        )
    )
