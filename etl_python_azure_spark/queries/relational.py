"""Relational operator queries (SURVEY §2.3–§2.8) with DuckDB oracles.

Each query exercises a library operator end-to-end on the synthetic
TPC-H-ish tables (FIXTURES.md §A) and has an exactly-equivalent ANSI
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bounded_string_gate, drop_all_null_columns, surrogate_key
from ..functions.dates import iso_date_part, parse_timestamp_naive
from ..operators.joins import anti_join, cdc_split, left_join, semi_join
from ..schema import select_existing
from ..session import load_tables
from . import register


def _dsum(col: Column, alias: str, dec: str = "decimal(18,2)") -> Column:
    """Exact decimal-accumulated sum, surfaced as double.

    Summation over doubles is order-dependent; casting each element to
    DECIMAL first makes the aggregate exact and bit-identical across
    engines (Spark vs DuckDB), so oracle value-hashes match.
    """
    return F.sum(col.cast(dec)).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Flagship: the "implied reports aggregate" (SURVEY §2.6) — the
# aggregation the reference delegates to its API, restated as a
# Catalyst hash-aggregate over the fact table. TPC-H-Q1 shaped.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price", "decimal(24,6)"),
            _dsum(charge, "sum_charge", "decimal(24,6)"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# P1/P4/F12 — projection + scalar-inequality filter + arithmetic scale
# --------------------------------------------------------------------------
@register(
    "filter_project_scale",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice / 100 AS price_scaled
    FROM lineitem
    WHERE l_quantity < 25 AND l_orderkey != 40660
    """,
)
def filter_project_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    # P4 scalar-inequality filter (`L:49`) + F12 scale (`L:256`)
    return (
        li.filter((F.col("l_quantity") < 25) & (F.col("l_orderkey") != 40660))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") / 100).alias("price_scaled"),
        )
    )


# --------------------------------------------------------------------------
# P2 — drift-tolerant projection (select only existing columns)
# --------------------------------------------------------------------------
@register(
    "drift_tolerant_select",
    "SELECT o_orderkey, o_totalprice FROM orders",
)
def drift_tolerant_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    # ask for two real columns and two that don't exist (`L:113`)
    return select_existing(o, ["o_orderkey", "no_such_col", "o_totalprice", "ghost"])


# --------------------------------------------------------------------------
# J1 — left equi-join (composite-key form tested in unit tests)
# --------------------------------------------------------------------------
@register(
    "left_join_enrich",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    out = left_join(
        t["orders"].withColumnRenamed("o_custkey", "c_custkey"),
        t["customer"],
        on="c_custkey",
        broadcast_right=True,  # customer is dimension-sized
    )
    return out.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# J3 — anti join (customers with no orders)
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return anti_join(
        t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        big,
        on="o_custkey",
    ).select(F.col("o_custkey").alias("c_custkey"), "c_name")


# --------------------------------------------------------------------------
# semi join — customers having a big order
# --------------------------------------------------------------------------
@register(
    "customers_with_big_order",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def customers_with_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    return semi_join(
        t["customer"].withColumnRenamed("c_custkey", "o_custkey"), big, on="o_custkey"
    ).select(F.col("o_custkey").alias("c_custkey"), "c_name")


# --------------------------------------------------------------------------
# J2/J3/J4 + T4 — the CDC split, on a deterministic synthetic probe:
#   existing  = orders with orderkey % 3 == 0 (at their stored date)
#   incoming  = all orders, with updated_at advanced by (orderkey % 2) days
# --------------------------------------------------------------------------
_CDC_EXISTING_SQL = """
  SELECT o_orderkey AS id, o_orderdate AS updated_at
  FROM orders WHERE o_orderkey % 3 = 0
"""
_CDC_INCOMING_SQL = """
  SELECT o_orderkey AS id,
         o_orderdate + INTERVAL (o_orderkey % 2) DAY AS updated_at,
         o_totalprice AS payload
  FROM orders
"""


def _cdc_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_tables(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("id"), F.col("o_orderdate").alias("updated_at")
    )
    incoming = o.select(
        F.col("o_orderkey").alias("id"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0, cast(o_orderkey % 2 AS INT))"
        ).alias("updated_at"),
        F.col("o_totalprice").alias("payload"),
    )
    return incoming, existing


@register(
    "cdc_split_new",
    f"""
    WITH existing AS ({_CDC_EXISTING_SQL}), incoming AS ({_CDC_INCOMING_SQL})
    SELECT i.id, i.updated_at, i.payload
    FROM incoming i LEFT JOIN existing e ON i.id = e.id
    WHERE e.updated_at IS NULL
    """,
)
def cdc_split_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming, existing = _cdc_frames(spark, sf_dir)
    return cdc_split(incoming, existing).new


@register(
    "cdc_split_updated",
    f"""
    WITH existing AS ({_CDC_EXISTING_SQL}), incoming AS ({_CDC_INCOMING_SQL})
    SELECT i.id, i.updated_at, i.payload
    FROM incoming i JOIN existing e ON i.id = e.id
    WHERE i.updated_at > e.updated_at
    """,
)
def cdc_split_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming, existing = _cdc_frames(spark, sf_dir)
    return cdc_split(incoming, existing).updated


# --------------------------------------------------------------------------
# U1 — drift-tolerant union (one side missing a column → NULL fill)
# --------------------------------------------------------------------------
@register(
    "union_with_drift",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_with_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b, allowMissingColumns=True)


# --------------------------------------------------------------------------
# set ops beyond union: INTERSECT / EXCEPT (distinct semantics) —
# customers active in both halves of the date range vs only the first
# --------------------------------------------------------------------------
@register(
    "customer_set_ops",
    """
    WITH early AS (
      SELECT o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ),
    late AS (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_custkey, 'both' AS cohort FROM (
      SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late
    )
    UNION ALL
    SELECT o_custkey, 'early_only' AS cohort FROM (
      SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late
    )
    """,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cutoff).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cutoff).select("o_custkey")
    both = early.intersect(late).withColumn("cohort", F.lit("both"))
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity)
    early_only = early.subtract(late).withColumn("cohort", F.lit("early_only"))
    return both.unionByName(early_only)


# --------------------------------------------------------------------------
# A-4/A-5 — sort + limit (deterministic tiebreak on the unique key)
# --------------------------------------------------------------------------
@register(
    "top100_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


# --------------------------------------------------------------------------
# F5 — derived surrogate key (row-wise concat restated as concat_ws)
# --------------------------------------------------------------------------
@register(
    "derived_surrogate_key",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey AS VARCHAR) || CAST(l_partkey AS VARCHAR)
             || strftime(l_shipdate, '%Y-%m-%d') AS surrogate
    FROM lineitem
    """,
)
def derived_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        surrogate_key(
            "l_orderkey", "l_partkey", F.date_format("l_shipdate", "yyyy-MM-dd")
        ).alias("surrogate"),
    )


# --------------------------------------------------------------------------
# P7 — drop rows null in any of N columns (left join makes the nulls)
# --------------------------------------------------------------------------
@register(
    "dropna_after_left_join",
    """
    SELECT o.o_orderkey, c.c_name
    FROM orders o LEFT JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
    WHERE c.c_name IS NOT NULL
    """,
)
def dropna_after_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    pos = t["customer"].filter(F.col("c_acctbal") > 0)
    joined = left_join(
        t["orders"].withColumnRenamed("o_custkey", "c_custkey"),
        pos,
        on="c_custkey",
        broadcast_right=True,
    ).select("o_orderkey", "c_name")
    return joined.na.drop(how="any", subset=["c_name"])


# --------------------------------------------------------------------------
# F9/F10 — null fill + cast (floor both sides: DuckDB CAST rounds,
# Spark truncates — floor() removes the dialect divergence)
# --------------------------------------------------------------------------
@register(
    "null_fill_cast",
    """
    SELECT o_orderkey,
           CAST(floor(coalesce(
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END, 0
           )) AS BIGINT) AS price_filled
    FROM orders
    """,
)
def null_fill_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    nulled = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        F.floor(F.coalesce(nulled, F.lit(0))).cast("bigint").alias("price_filled"),
    )


# --------------------------------------------------------------------------
# P8 — all-null column drop as a query (dead column disappears)
# --------------------------------------------------------------------------
@register(
    "drop_all_null_columns_q",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END AS half_null
    FROM orders
    """,
)
def drop_all_null_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        F.lit(None).cast("string").alias("dead"),
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderpriority")).alias(
            "half_null"
        ),
    )
    return drop_all_null_columns(df)


# --------------------------------------------------------------------------
# F3 — bounded string gate (null→'' and len>N→'')
# --------------------------------------------------------------------------
@register(
    "string_length_gate",
    """
    SELECT p_partkey,
           CASE WHEN p_type IS NULL THEN ''
                WHEN length(p_type) <= 20 THEN p_type
                ELSE '' END AS p_type_gated
    FROM part
    """,
)
def string_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")
    return p.select(
        "p_partkey", bounded_string_gate("p_type", 20).alias("p_type_gated")
    )


# --------------------------------------------------------------------------
# string toolbox: regex extract, case, replace, trim, pad
# --------------------------------------------------------------------------
@register(
    "string_toolbox",
    """
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           upper(p_type) AS type_upper,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
           trim(concat(' ', p_brand, ' ')) AS brand_trimmed
    FROM part
    """,
)
def string_toolbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "([0-9]+)", 1).cast("bigint").alias("brand_num"),
        F.upper("p_type").alias("type_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trimmed"
        ),
    )


# --------------------------------------------------------------------------
# F4 + F7 — ISO split and timestamp round-trip parse
# --------------------------------------------------------------------------
@register(
    "iso_split_and_parse",
    """
    SELECT o_orderkey,
           split_part(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), 'T', 1) AS fecha,
           strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'),
                    '%Y-%m-%dT%H:%M:%S') AS parsed_ts
    FROM orders
    """,
)
def iso_split_and_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    iso = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss")
    df = o.select("o_orderkey", iso.alias("__iso"))
    return df.select(
        "o_orderkey",
        iso_date_part("__iso").alias("fecha"),
        F.to_timestamp("__iso", "yyyy-MM-dd'T'HH:mm:ss").alias("parsed_ts"),
    )


# --------------------------------------------------------------------------
# N1/N2 — JSON flatten (events.props is a JSON string column)
# --------------------------------------------------------------------------
@register(
    "json_flatten_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def json_flatten_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# Q5-shaped join tree — revenue by nation (dimension broadcast chain)
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            _dsum(rev, "revenue", "decimal(24,6)"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# window function — top-3 orders per market segment
# --------------------------------------------------------------------------
@register(
    "top3_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# rollup — hierarchical super-aggregates (returnflag → linestatus)
# --------------------------------------------------------------------------
@register(
    "rollup_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# pivot — wide quantity matrix by line status
# --------------------------------------------------------------------------
@register(
    "pivot_qty_by_status",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


# --------------------------------------------------------------------------
# distinct aggregates (A-3 / implied cardinality stats)
# --------------------------------------------------------------------------
@register(
    "distinct_cardinalities",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def distinct_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# running windowed aggregation — cumulative spend per customer.
# NB the windowed SUM accumulates in DECIMAL: DuckDB evaluates window
# sums with segment trees (pairwise float adds) while Spark runs
# left-to-right, so double accumulation diverges in ulps — decimal is
# order-free and exact in both.
# --------------------------------------------------------------------------
@register(
    "running_customer_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE) AS running_spend,
           LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_order_price
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_order_price"),
    )


# --------------------------------------------------------------------------
# cube — full cross-dimensional super-aggregates
# --------------------------------------------------------------------------
@register(
    "cube_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


# --------------------------------------------------------------------------
# per-group quantile outlier filter — orders above their status's p95
# --------------------------------------------------------------------------
@register(
    "outlier_orders_p95",
    """
    WITH q AS (
      SELECT o_orderstatus, quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, q.p95
    FROM orders o JOIN q USING (o_orderstatus)
    WHERE o.o_totalprice > q.p95
    """,
)
def outlier_orders_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    q = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.95)").alias("p95")
    )
    return (
        o.join(F.broadcast(q), "o_orderstatus")
        .filter(F.col("o_totalprice") > F.col("p95"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "p95")
    )


# --------------------------------------------------------------------------
# filter variety: LIKE / BETWEEN / IN-list in one predicate
# --------------------------------------------------------------------------
@register(
    "filter_variety",
    """
    SELECT p_partkey, p_type, p_size, p_brand
    FROM part
    WHERE p_type LIKE 'PRO%'
      AND p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
    """,
)
def filter_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PRO%")
        & F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
    ).select("p_partkey", "p_type", "p_size", "p_brand")


# --------------------------------------------------------------------------
# θ-join (inequality join) — balance dominance counts per nation
# --------------------------------------------------------------------------
@register(
    "acctbal_dominance",
    """
    SELECT s.s_nationkey,
           COUNT(*) AS n_dominated_pairs
    FROM supplier s JOIN customer c ON s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
)
def acctbal_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "customer")
    return (
        t["supplier"]
        .join(t["customer"], F.col("s_acctbal") > F.col("c_acctbal"))
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_dominated_pairs"))
    )


# --------------------------------------------------------------------------
# null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
@register(
    "null_safe_join",
    """
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderkey % 7 END AS k
      FROM orders WHERE o_orderkey <= 2000
    ),
    b AS (
      SELECT CASE WHEN g % 3 = 0 THEN NULL ELSE g END AS k,
             g AS tag
      FROM (SELECT UNNEST(range(0, 7)) AS g)
    )
    SELECT a.o_orderkey, a.k, b.tag
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("k"),
    )
    spark_b = o.sparkSession.range(0, 7).select(
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("tag"),
    )
    return a.join(
        F.broadcast(spark_b), a.k.eqNullSafe(spark_b.k)
    ).select("o_orderkey", a.k.alias("k"), "tag")


# --------------------------------------------------------------------------
# scalar null toolbox: NULLIF / GREATEST / LEAST / COALESCE chain
# --------------------------------------------------------------------------
@register(
    "scalar_null_toolbox",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           GREATEST(o_totalprice, 100000.0) AS price_floor,
           LEAST(o_totalprice, 400000.0) AS price_cap,
           COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority, 'x')
             AS fallback_chain
    FROM orders
    """,
)
def scalar_null_toolbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.col("o_orderpriority"),
            F.lit("x"),
        ).alias("fallback_chain"),
    )


# --------------------------------------------------------------------------
# correlated EXISTS — orders containing a max-quantity line item
# --------------------------------------------------------------------------
@register(
    "orders_with_large_items",
    """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50
    )
    """,
)
def orders_with_large_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    big = t["lineitem"].filter(F.col("l_quantity") >= 50).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return semi_join(t["orders"], big, on="o_orderkey").select(
        "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# first/last values over full-partition frames per customer
# --------------------------------------------------------------------------
@register(
    "first_last_order_price",
    """
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def first_last_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_tables(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    ).distinct()


# --------------------------------------------------------------------------
# month-grain truncation rollup
# --------------------------------------------------------------------------
@register(
    "monthly_order_volume",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM orders GROUP BY 1
    """,
)
def monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("volume"),
    )


# --------------------------------------------------------------------------
# argmax aggregation — top order per status WITHOUT a window sort
# (max_by: one hash-agg pass; the at-scale idiom for top-1-per-group)
# --------------------------------------------------------------------------
@register(
    "argmax_order_per_status",
    """
    WITH m AS (
      SELECT o_orderstatus, MAX(o_totalprice) AS top_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT m.o_orderstatus,
           (SELECT MAX(o.o_orderkey) FROM orders o
            WHERE o.o_orderstatus = m.o_orderstatus
              AND o.o_totalprice = m.top_price) AS top_orderkey,
           m.top_price
    FROM m
    """,
)
def argmax_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    # tiebreak embedded in the ordering struct → deterministic argmax
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


# --------------------------------------------------------------------------
# exact second moments: mean/variance from explicit decimal sums
# (built-in stddev/var aggregates use engine-specific streaming
# algorithms whose float order diverges — the explicit formula over
# exact sums is reproducible anywhere)
# --------------------------------------------------------------------------
@register(
    "brand_price_stats",
    """
    WITH s AS (
      SELECT p_brand,
             COUNT(*) AS n,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(p_retailprice * p_retailprice AS DECIMAL(28,6)))
                  AS DOUBLE) AS sxx
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, n,
           sx / n AS mean_price,
           (sxx - sx * sx / n) / (n - 1) AS var_price
    FROM s WHERE n > 1
    """,
)
def brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")
    s = p.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sx"),
        F.sum(
            (F.col("p_retailprice") * F.col("p_retailprice")).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("sxx"),
    )
    return s.filter(F.col("n") > 1).select(
        "p_brand",
        "n",
        (F.col("sx") / F.col("n")).alias("mean_price"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var_price"),
    )


# --------------------------------------------------------------------------
# time-range window frame — trailing 7-day revenue per order day
# --------------------------------------------------------------------------
@register(
    "trailing_week_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day,
           CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER (
             ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_revenue
    FROM daily
    """,
)
def trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    daily.createOrReplaceTempView("__daily_rev")
    return spark.sql(
        """
        SELECT day,
               CAST(rev AS DOUBLE) AS day_revenue,
               CAST(SUM(rev) OVER (
                 ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_7d_revenue
        FROM __daily_rev
        """
    )


# --------------------------------------------------------------------------
# rank-family windows: dense_rank, percent_rank, ntile deciles
# --------------------------------------------------------------------------
@register(
    "order_rank_stats",
    """
    SELECT o_orderkey, o_orderstatus,
           DENSE_RANK() OVER w AS price_dense_rank,
           PERCENT_RANK() OVER w AS price_pct_rank,
           NTILE(10) OVER w AS price_decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def order_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.ntile(10).over(w).alias("price_decile"),
    )


# --------------------------------------------------------------------------
# exact quantiles per group (continuous interpolation)
# --------------------------------------------------------------------------
@register(
    "order_value_quantiles",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.5) AS median,
           quantile_cont(o_totalprice, 0.75) AS q3,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# Q3-shaped: shipping priority — fact-fact join under dimension filter
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t["lineitem"].filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(rev, "revenue", "decimal(24,6)"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5-shaped supplier-side: part-type revenue share per supplier nation
# --------------------------------------------------------------------------
@register(
    "promo_revenue_by_supp_nation",
    """
    SELECT n.n_name,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(24,6)) ELSE 0 END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def promo_revenue_by_supp_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(
        F.lit(0).cast("decimal(24,6)")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev_dec).cast("double").alias("total_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# T3 — sliding reprocess window (−25d…+2d around the data's max date)
# --------------------------------------------------------------------------
@register(
    "sliding_window_refresh",
    """
    WITH b AS (SELECT max(l_shipdate) AS mx FROM lineitem)
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS fecha,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem, b
    WHERE l_shipdate >= b.mx - INTERVAL 25 DAY
      AND l_shipdate <= b.mx + INTERVAL 2 DAY
    GROUP BY 1
    """,
)
def sliding_window_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    bounds = li.agg(F.max("l_shipdate").alias("mx"))
    return (
        li.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("l_shipdate") >= F.expr("mx - make_interval(0,0,0,25)"))
            & (F.col("l_shipdate") <= F.expr("mx + make_interval(0,0,0,2)"))
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("fecha"))
        .agg(F.count("*").alias("n"), _dsum(F.col("l_quantity"), "qty"))
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping flags — the generalized form of the
# rollup/cube queries above; gid disambiguates subtotal rows from
# genuine NULL group keys.
# --------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("int")
        .alias("gid"),
        F.count("*").alias("n"),
        _dsum(F.col("o_totalprice"), "total"),
    )


# --------------------------------------------------------------------------
# Correlation / least-squares regression per group, decimal-exact.
# Native corr()/regr_slope() accumulate doubles in partition order —
# non-deterministic across engines — so the moments are accumulated
# as exact decimals and the float math happens once, in an identical
# expression order in both dialects (bit-exact per IEEE 754).
# NB the decimal→double cast goes through an exact decimal STRING:
# engines' direct decimal→double casts disagree by 1 ulp on wide
# decimals (observed on a decimal(38,4) sum at sf0.001 — Spark's
# Decimal.toDouble vs DuckDB's int128 scaling), while string→double
# parsing is correctly rounded everywhere.
# --------------------------------------------------------------------------
_MOMENT_EXPRS = {
    "corr_qp": "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)"
    " * sqrt(n * syy - sy * sy))",
    "slope_qp": "(n * sxy - sx * sy) / (n * sxx - sx * sx)",
    "intercept_qp": "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n",
}


@register(
    "corr_regression_qty_price",
    f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           {_MOMENT_EXPRS["corr_qp"]} AS corr_qp,
           {_MOMENT_EXPRS["slope_qp"]} AS slope_qp,
           {_MOMENT_EXPRS["intercept_qp"]} AS intercept_qp
    FROM s
    """,
)
def corr_regression_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    def _d(c):  # decimal → exact string → correctly-rounded double
        return c.cast("string").cast("double")

    moments = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        _d(F.sum(x)).alias("sx"),
        _d(F.sum(y)).alias("sy"),
        _d(F.sum(x * y)).alias("sxy"),
        _d(F.sum(x * x)).alias("sxx"),
        _d(F.sum(y * y)).alias("syy"),
    )
    return moments.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        *[F.expr(e).alias(a) for a, e in _MOMENT_EXPRS.items()],
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: two-level aggregation — per-customer order count
# (left join keeps zero-order customers) then the count distribution.
# --------------------------------------------------------------------------
@register(
    "custdist_order_counts",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def custdist_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    per = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING on a grouped decimal sum, then enrich the
# qualifying keys and take a deterministic top-100.
# --------------------------------------------------------------------------
@register(
    "large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__tq"))
        .filter(F.col("__tq") > 150)
        .select("l_orderkey", F.col("__tq").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: scalar subquery (decimal-exact global average) +
# NOT EXISTS — customers above the average balance with no 'F' order.
# --------------------------------------------------------------------------
@register(
    "rich_inactive_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS a
      FROM customer
    )
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
    """,
)
def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    stats = c.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(rich, f_orders, "c_custkey").select(
        "c_custkey", "c_acctbal"
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape: grouped revenue kept only when it exceeds a
# fraction of the global total (scalar-subquery threshold).
# --------------------------------------------------------------------------
@register(
    "nation_revenue_share",
    """
    WITH nr AS (
      SELECT n.n_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(24,6))) AS rev_d
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT sum(rev_d) AS tot_d FROM nr)
    SELECT n_name, CAST(rev_d AS DOUBLE) AS revenue
    FROM nr, tot
    WHERE CAST(rev_d AS DOUBLE) > CAST(tot_d AS DOUBLE) * 0.05
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    li, s, n = t["lineitem"], t["supplier"], t["nation"]
    disc_price = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(24,6)")
    nr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).alias("rev_d"))
    )
    tot = nr.agg(F.sum("rev_d").alias("tot_d"))
    return (
        nr.crossJoin(F.broadcast(tot))
        .filter(
            F.col("rev_d").cast("double")
            > F.col("tot_d").cast("double") * 0.05
        )
        .select("n_name", F.col("rev_d").cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Sketch-accuracy certificates. Approximate aggregates (HLL distinct,
# quantile sketches) are engine-specific, so their raw values can't
# be oracle-diffed — instead the query emits the EXACT value plus a
# boolean certifying the sketch landed within tolerance; the oracle
# asserts the exact value and `TRUE`. At 100 TB the approx forms are
# the ones you run (no exact distinct over billions of keys); this
# query is the accuracy gate you'd run on a sample first.
# --------------------------------------------------------------------------
@register(
    "approx_distinct_certificate",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_distinct,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__approx"),
    )
    return agg.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("__approx") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * 0.05
        ).alias("sketch_within_5pct"),
    )


@register(
    "approx_quantile_certificate",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS exact_median,
           TRUE AS sketch_within_2pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_quantile_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("__approx"),
    )
    return agg.select(
        "o_orderstatus",
        "exact_median",
        (
            F.abs(F.col("__approx") - F.col("exact_median"))
            <= F.abs(F.col("exact_median")) * 0.02
        ).alias("sketch_within_2pct"),
    )


# --------------------------------------------------------------------------
# Window-function toolbox: ranking/navigation/distribution functions
# in one pass (orders per status, price order, orderkey tiebreak).
# percent_rank/cume_dist are int-ratio floats — exact both engines.
# --------------------------------------------------------------------------
@register(
    "window_function_toolbox",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           lag(o_orderkey) OVER w AS prev_key,
           lead(o_orderkey) OVER w AS next_key,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_function_toolbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# Moving average over an explicit row frame (last 4 rows) — the
# decimal-sum / count division keeps it bit-exact cross-engine.
# --------------------------------------------------------------------------
@register(
    "moving_avg_order_price",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("moving_avg"),
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape: distinct-count aggregation behind NOT-predicates —
# how many distinct suppliers serve each surviving (brand, type,
# size) bucket.
# --------------------------------------------------------------------------
@register(
    "supplier_variety_by_part",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_variety_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    pf = p.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade — revenue between two fixed nation
# pairs by order year (two independent dimension paths onto the same
# fact row, then a pair predicate).
# --------------------------------------------------------------------------
@register(
    "bilateral_trade_volume",
    """
    SELECT supp_nation, cust_nation, o_year,
           CAST(sum(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT sn.n_name AS supp_nation,
             cn.n_name AS cust_nation,
             year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, o_year
    """,
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    li, o, c, s, n = (
        t["lineitem"],
        t["orders"],
        t["customer"],
        t["supplier"],
        t["nation"],
    )
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "o_year")
        .agg(_dsum(F.col("volume"), "revenue", "decimal(24,6)"))
    )


# --------------------------------------------------------------------------
# VariantType rollup (Spark 4): parse the JSON props column ONCE into
# the binary Variant encoding, then extract typed fields — at scale
# this replaces per-access string re-parsing (get_json_object) with
# a single parse + cheap binary reads. Oracle reads the same JSON
# with DuckDB's json extraction.
# --------------------------------------------------------------------------
@register(
    "variant_props_rollup",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.try_variant_get(v, "$.k", "bigint").alias("__k"),
        )
        .groupBy("event_type")
        .agg(F.sum("__k").alias("sum_k"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# UNPIVOT (wide → long): per-status metric columns melted to
# (status, metric, value) rows — Spark's unpivot/melt; the oracle
# states the equivalent UNION ALL (engine-neutral form).
# (Renamed from `unpivot_order_metrics` in r13: round5.py had
# re-registered that name with different lineitem-profile semantics,
# leaving the registry content dependent on module import order —
# whichever module a test process imported LAST won. register()
# now raises on duplicates.)
# --------------------------------------------------------------------------
@register(
    "unpivot_status_metrics",
    """
    WITH m AS (
      SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             CAST(min(o_totalprice) AS DOUBLE) AS min_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderstatus, 'total_price', total_price FROM m
    UNION ALL
    SELECT o_orderstatus, 'min_price', min_price FROM m
    """,
)
def unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    m = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        _dsum(F.col("o_totalprice"), "total_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
    )
    return m.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_price", "min_price"],
        "metric",
        "value",
    )


# --------------------------------------------------------------------------
# Array-function toolbox over the embedding column: slice, sort,
# reverse, distinct-size, containment — structural ops only (element
# values are copied, never recomputed → exact cross-engine).
# --------------------------------------------------------------------------
@register(
    "array_toolbox_embeddings",
    """
    SELECT vec_id,
           CAST(0 AS DOUBLE) + embedding[1] + embedding[2] + embedding[3]
             AS head3_sum,
           list_sort(embedding[1:5])[1] AS sorted_head5_min,
           list_sort(embedding[1:5])[5] AS sorted_head5_max,
           list_reverse(embedding[1:3])[1] AS rev_head3_first,
           CAST(len(list_distinct(embedding)) AS BIGINT) AS n_distinct_vals,
           list_contains(embedding, embedding[1]) AS has_first
    FROM embeddings
    """,
)
def array_toolbox_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-6 driver row. Registry rule: no array/map/struct output
    columns — slice/sort/reverse are proven through scalar probes
    (fold sum of the slice; first/last of the sorted head; first of
    the reversed head). Probe values are element COPIES or a fixed-
    order double fold, never recomputed floats → exact cross-engine.
    The raw-array form stays under pytest (tests/test_array_queries).
    """
    em = load_tables(spark, sf_dir, "embeddings")
    head = lambda k: F.slice("embedding", 1, k)  # noqa: E731
    return em.select(
        "vec_id",
        F.aggregate(head(3), F.lit(0.0), lambda a, x: a + x).alias(
            "head3_sum"
        ),
        F.element_at(F.sort_array(head(5)), 1).alias("sorted_head5_min"),
        F.element_at(F.sort_array(head(5)), 5).alias("sorted_head5_max"),
        F.element_at(F.reverse(head(3)), 1).alias("rev_head3_first"),
        F.size(F.array_distinct("embedding")).cast("long").alias(
            "n_distinct_vals"
        ),
        F.array_contains("embedding", F.element_at("embedding", 1)).alias(
            "has_first"
        ),
    )


# --------------------------------------------------------------------------
# Conditional aggregation (FILTER clause): several differently-
# filtered aggregates in ONE pass over the fact table — the pattern
# that replaces N self-joins of filtered subsets.
# --------------------------------------------------------------------------
@register(
    "filtered_aggregates",
    """
    SELECT o_orderstatus,
           count(*) AS n,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           count(DISTINCT o_custkey)
             FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent_custs,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE year(o_orderdate) = 1997) AS DOUBLE)
             AS total_1997
    FROM orders GROUP BY o_orderstatus
    """,
)
def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.expr("count(*) FILTER (WHERE o_totalprice > 100000)").alias("n_big"),
        F.expr(
            "count(DISTINCT o_custkey)"
            " FILTER (WHERE o_orderpriority = '1-URGENT')"
        ).alias("n_urgent_custs"),
        F.expr(
            "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))"
            " FILTER (WHERE year(o_orderdate) = 1997) AS DOUBLE)"
        ).alias("total_1997"),
    )


# --------------------------------------------------------------------------
# Skew-salted aggregation under the exactness gate: identical result
# to a plain groupBy (the salt is internal), via explicit two-phase
# (key, salt) → key aggregation. Decimal partials make the result
# independent of how rows spread over salts — the same property that
# makes the plain query engine-exact makes the salted one salt-exact.
# --------------------------------------------------------------------------
@register(
    "salted_quantity_by_flag",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    li = load_tables(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        keys=["l_returnflag"],
        partial_aggs=[
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__s"),
            F.count("*").alias("__n"),
        ],
        final_aggs=[
            F.sum("__s").cast("double").alias("sum_qty"),
            F.sum("__n").alias("n"),
        ],
        buckets=8,
    )
    return out.select("l_returnflag", "sum_qty", "n")


# --------------------------------------------------------------------------
# Data profiling: per-column null/distinct counters for a new source,
# one aggregate pass, long-format output.
# --------------------------------------------------------------------------
@register(
    "profile_orders_columns",
    """
    SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import profile_columns

    o = load_tables(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_custkey", "o_orderstatus", "o_orderpriority"]
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape — EXISTS-driven priority report: orders in a date
# window having at least one big line item, counted per priority.
# --------------------------------------------------------------------------
@register(
    "priority_orders_with_big_items",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate < DATE '1996-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    """,
)
def priority_orders_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    big = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        semi_join(o, big, on="o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape — nested correlated-aggregate IN: suppliers that
# ship more than 30% of some part's total volume. The >30% test is
# written multiplicatively (supp*10 > total*3) on DECIMAL sums — no
# division, so the comparison is exact in both engines.
# --------------------------------------------------------------------------
@register(
    "dominant_part_suppliers",
    """
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT per.l_suppkey
      FROM per JOIN tot ON per.l_partkey = tot.l_partkey
      WHERE per.supp_qty * 5 > tot.total_qty
    )
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    li = t["lineitem"]
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty")
    )
    tot = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty")
    )
    dominant = (
        per.join(tot, "l_partkey")
        .filter(F.col("supp_qty") * 5 > F.col("total_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return semi_join(
        t["supplier"].select("s_suppkey", "s_name", "s_acctbal"),
        dominant,
        on="s_suppkey",
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape — EXISTS + NOT EXISTS on the same probe: suppliers
# whose line shipped late (> o_orderdate + 80 days) in multi-supplier
# orders where NO other supplier shipped late.
# --------------------------------------------------------------------------
@register(
    "sole_late_suppliers",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    late AS (
      SELECT * FROM li WHERE l_shipdate > o_orderdate + INTERVAL 80 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM li l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM late l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
    )
    GROUP BY s.s_name
    """,
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    li = t["lineitem"].join(
        t["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        ),
        "l_orderkey",
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    late = li.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", F.col("l_suppkey").alias("s2")).alias("l2")
    l3 = late.select("l_orderkey", F.col("l_suppkey").alias("s3")).alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.s2")),
        "left_semi",
    )
    sole = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.s3")),
        "left_anti",
    )
    return (
        sole.join(
            t["supplier"].select(
                F.col("s_suppkey").alias("l_suppkey"), "s_name"
            ),
            "l_suppkey",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape — correlated scalar-subquery minimum: for each small
# part, the supplier with the lowest unit price (unit price =
# extendedprice/quantity, same fp op order both engines; ties break
# on s_suppkey via row_number in both dialects).
# --------------------------------------------------------------------------
@register(
    "min_cost_supplier_per_part",
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS min_unit
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_name, u.l_suppkey, u.min_unit,
             ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY u.min_unit, u.l_suppkey
             ) AS rn
      FROM part p JOIN unit u ON u.l_partkey = p.p_partkey
      WHERE p.p_size < 10
    )
    SELECT p_partkey, p_name,
           l_suppkey AS s_suppkey, s.s_name, ranked.min_unit
    FROM ranked JOIN supplier s ON s.s_suppkey = ranked.l_suppkey
    WHERE rn = 1
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem")
    unit = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit")
    )
    small = t["part"].filter(F.col("p_size") < 10).select("p_partkey", "p_name")
    joined = small.join(
        unit, small.p_partkey == unit.l_partkey
    )
    w = W.partitionBy("p_partkey").orderBy(F.asc("min_unit"), F.asc("l_suppkey"))
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.join(
        t["supplier"].select(
            F.col("s_suppkey"), "s_name"
        ),
        best.l_suppkey == F.col("s_suppkey"),
    ).select("p_partkey", "p_name", "s_suppkey", "s_name", "min_unit")
