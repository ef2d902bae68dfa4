"""Event-table queries: filters (P5/P6), sessionization and
event-time windows (SURVEY §2.9 gap-fill), array ops (N3/A-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.arrays import array_head, positional_unnest
from ..operators.asof import asof_join
from ..operators.sessionize import sessionize, tumbling_window
from ..session import load_tables
from . import register


# --------------------------------------------------------------------------
# P5/P6 — non-empty-string + numeric predicates
# --------------------------------------------------------------------------
@register(
    "filter_events",
    """
    SELECT event_id, event_type, value FROM events
    WHERE event_type != '' AND value > 50
    """,
)
def filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    return e.filter((F.col("event_type") != "") & (F.col("value") > 50)).select(
        "event_id", "event_type", "value"
    )


# --------------------------------------------------------------------------
# Sessionization — gap-based sessions per user (session_window)
# Oracle: gaps-and-islands. NB `>=` on the gap: Spark sessions are
# end-exclusive, an event at exactly last_ts+gap starts a new one.
# --------------------------------------------------------------------------
@register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    return sessionize(e, "ts", ["user_id"], gap="30 minutes")


# --------------------------------------------------------------------------
# Tumbling event-time window — hourly counts/sums per event type
# --------------------------------------------------------------------------
@register(
    "hourly_event_rollup",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    return tumbling_window(
        e,
        "ts",
        ["event_type"],
        width="1 hour",
        aggs=[
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        ],
    )


# --------------------------------------------------------------------------
# As-of join — last view value before each purchase, per user
# (right side deduped on (user, ts) for determinism)
# --------------------------------------------------------------------------
@register(
    "asof_last_view_before_purchase",
    """
    WITH v AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.value AS asof_value, v.ts AS asof_vts
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select("user_id", F.col("ts").alias("vts"), "value")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="vts"
    )


# --------------------------------------------------------------------------
# N3/A-6 — positional array unnest + head slice on embeddings
# --------------------------------------------------------------------------
@register(
    "positional_unnest_embeddings",
    """
    SELECT vec_id,
           embedding[1] AS embedding_1,
           embedding[2] AS embedding_2,
           embedding[3] AS embedding_3,
           embedding[4] AS embedding_4,
           embedding[1:4] AS embedding_head
    FROM embeddings
    """,
)
def positional_unnest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_tables(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = positional_unnest(
        em, "embedding", 4, name_template="{array}_{i}", drop_source=False
    )
    return out.select(
        "vec_id",
        "embedding_1",
        "embedding_2",
        "embedding_3",
        "embedding_4",
        array_head("embedding", 4).alias("embedding_head"),
    )
