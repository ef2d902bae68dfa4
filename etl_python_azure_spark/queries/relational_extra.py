"""Remaining classic TPC-H query shapes (Q8/Q9/Q10/Q15/Q17/Q19),
adapted to the TPC-H-lite synthetic schema (no partsupp, no
commit/receipt dates — see FIXTURES.md §A).

Same determinism discipline as :mod:`.relational`: decimal-exact
accumulation surfaced as double, identical fp op order in both
dialects, a unique tiebreaker under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .relational import _dsum


# --------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: top-20 customers by
# revenue lost to returns in one quarter, enriched with nation.
# --------------------------------------------------------------------------
@register(
    "returned_item_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_dsum(rev, "revenue", "decimal(24,6)"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier: quarterly revenue per supplier as a
# derived view, then a scalar-subquery MAX picks the best (ties kept,
# like the spec; revenue doubles come from the same decimal sum in
# both engines, so equality-on-double is exact).
# --------------------------------------------------------------------------
@register(
    "top_revenue_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                "decimal(24,6)",
            )
        )
    )
    # scalar max via a 1-row broadcast cross join — no driver collect,
    # no global window; Catalyst plans a BroadcastNestedLoopJoin over
    # exactly one row, the distributed analogue of a scalar subquery
    best = rev.agg(F.max("total_revenue").alias("__best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("__best"))
        .join(
            t["supplier"],
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape — small-quantity revenue loss: correlated aggregate
# (per-part average quantity) gating the fact scan; one output row.
# --------------------------------------------------------------------------
@register(
    "small_quantity_revenue_loss",
    """
    WITH pavg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def small_quantity_revenue_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"]
    pavg = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(pavg, F.col("__pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(24,6)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive multi-attribute predicate: three
# brand/size/quantity bands OR'ed together, pushed into one scan.
# --------------------------------------------------------------------------
@register(
    "disjunctive_band_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(band)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                "decimal(24,6)",
            )
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: NATION_7's slice of ASIA's
# STANDARD-part revenue per order year. Conditional decimal sums,
# share divided double/double in the same order both engines.
# --------------------------------------------------------------------------
@register(
    "nation_market_share",
    """
    WITH vol AS (
      SELECT YEAR(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(24,6)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      WHERE p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark,
        sf_dir,
        "lineitem",
        "orders",
        "part",
        "supplier",
        "nation",
        "customer",
        "region",
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    vol = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("cn_rkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(24,6)")
            .alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(24,6)")
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# TPC-H Q9 shape — product-line profit by supplier nation and year
# (no partsupp in the lite schema, so profit = discounted revenue for
# the matching part family).
# --------------------------------------------------------------------------
@register(
    "profit_by_nation_year",
    """
    SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(24,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").like("%red%"))
                .select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_profit",
                "decimal(24,6)",
            )
        )
    )


# --------------------------------------------------------------------------
# Data-quality expectations report (deequ-lite): row predicates in
# one scan + key uniqueness + FK containment, one unioned report.
# The quality gate the reference leaves implicit (throwing casts,
# dropna), stated declaratively and oracle-checked.
# --------------------------------------------------------------------------
@register(
    "data_quality_report",
    """
    SELECT 'o_totalprice_positive' AS check_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
               THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
           SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
               THEN 0 ELSE 1 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_in_range', COUNT(*),
           CAST(SUM(CASE WHEN COALESCE(
                 o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '2005-01-01 00:00:00', FALSE)
               THEN 0 ELSE 1 END) AS BIGINT),
           SUM(CASE WHEN COALESCE(
                 o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '2005-01-01 00:00:00', FALSE)
               THEN 0 ELSE 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)', COUNT(*),
           COUNT(*) - (SELECT COUNT(*) FROM
             (SELECT o_orderkey FROM orders GROUP BY o_orderkey
              HAVING COUNT(*) = 1)),
           COUNT(*) - (SELECT COUNT(*) FROM
             (SELECT o_orderkey FROM orders GROUP BY o_orderkey
              HAVING COUNT(*) = 1)) = 0
    FROM orders
    UNION ALL
    SELECT 'fk(l_orderkey->o_orderkey)', COUNT(*),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON o.o_orderkey = l.l_orderkey
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import (
        combine_reports,
        referential_check,
        row_checks,
        unique_check,
    )

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"]
    return combine_reports(
        [
            row_checks(
                o,
                {
                    "o_totalprice_positive": F.col("o_totalprice") > 0,
                    "o_orderdate_in_range": (
                        F.col("o_orderdate")
                        >= F.lit("1990-01-01").cast("timestamp")
                    )
                    & (
                        F.col("o_orderdate")
                        < F.lit("2005-01-01").cast("timestamp")
                    ),
                },
            ),
            unique_check(o, ["o_orderkey"]),
            referential_check(
                t["lineitem"], o, "l_orderkey", "o_orderkey"
            ),
        ]
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue change: pure filter + sum, the
# canonical predicate-pushdown probe (no join, no group).
# --------------------------------------------------------------------------
@register(
    "forecast_revenue_change",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                         AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * F.col("l_discount"),
                "revenue",
                "decimal(24,6)",
            )
        )
    )


# --------------------------------------------------------------------------
# Winsorized order statistics — robust mean with tails clipped at
# p05/p95. Percentile cuts are interpolated BY HAND (floor/ceil rank
# + identical lerp order in both dialects): engine-native
# quantile_cont/percentile internals are free to round differently,
# hand-rolled interpolation is bit-reproducible anywhere.
# Scale note: the per-status rank is the exactness gate's cost (3
# sort groups); at 100 TB compute the cuts with approx_percentile
# instead and keep the clip + decimal mean — see SCALING.md.
# --------------------------------------------------------------------------
@register(
    "winsorized_order_stats",
    """
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    ),
    cuts AS (
      SELECT o_orderstatus,
             MAX(CASE WHEN rn = CAST(floor((n - 1) * CAST(0.05 AS DOUBLE)) AS BIGINT) + 1
                 THEN o_totalprice END) AS lo_a,
             MAX(CASE WHEN rn = CAST(floor((n - 1) * CAST(0.05 AS DOUBLE)) AS BIGINT) + 2
                 THEN o_totalprice END) AS lo_b,
             MAX((n - 1) * CAST(0.05 AS DOUBLE) - floor((n - 1) * CAST(0.05 AS DOUBLE))) AS lo_f,
             MAX(CASE WHEN rn = CAST(floor((n - 1) * CAST(0.95 AS DOUBLE)) AS BIGINT) + 1
                 THEN o_totalprice END) AS hi_a,
             MAX(CASE WHEN rn = CAST(floor((n - 1) * CAST(0.95 AS DOUBLE)) AS BIGINT) + 2
                 THEN o_totalprice END) AS hi_b,
             MAX((n - 1) * CAST(0.95 AS DOUBLE) - floor((n - 1) * CAST(0.95 AS DOUBLE))) AS hi_f
      FROM ranked GROUP BY o_orderstatus
    ),
    c2 AS (
      SELECT o_orderstatus,
             lo_a + (COALESCE(lo_b, lo_a) - lo_a) * lo_f AS lo_cut,
             hi_a + (COALESCE(hi_b, hi_a) - hi_a) * hi_f AS hi_cut
      FROM cuts
    )
    SELECT r.o_orderstatus,
           COUNT(*) AS n,
           c2.lo_cut, c2.hi_cut,
           CAST(SUM(CAST(
             CASE WHEN r.o_totalprice < c2.lo_cut THEN c2.lo_cut
                  WHEN r.o_totalprice > c2.hi_cut THEN c2.hi_cut
                  ELSE r.o_totalprice END AS DECIMAL(24,6))) AS DOUBLE)
             / COUNT(*) AS winsorized_mean
    FROM ranked r JOIN c2 USING (o_orderstatus)
    GROUP BY r.o_orderstatus, c2.lo_cut, c2.hi_cut
    """,
)
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def cut(p, a, b, f):
        idx = F.floor((F.col("n") - 1) * p).cast("bigint")
        frac = (F.col("n") - 1) * p - F.floor((F.col("n") - 1) * p)
        return [
            F.max(
                F.when(F.col("rn") == idx + 1, F.col("o_totalprice"))
            ).alias(a),
            F.max(
                F.when(F.col("rn") == idx + 2, F.col("o_totalprice"))
            ).alias(b),
            F.max(frac).alias(f),
        ]

    cuts = ranked.groupBy("o_orderstatus").agg(
        *cut(0.05, "lo_a", "lo_b", "lo_f"), *cut(0.95, "hi_a", "hi_b", "hi_f")
    )
    c2 = cuts.select(
        "o_orderstatus",
        (
            F.col("lo_a")
            + (F.coalesce("lo_b", "lo_a") - F.col("lo_a")) * F.col("lo_f")
        ).alias("lo_cut"),
        (
            F.col("hi_a")
            + (F.coalesce("hi_b", "hi_a") - F.col("hi_a")) * F.col("hi_f")
        ).alias("hi_cut"),
    )
    clipped = (
        ranked.join(F.broadcast(c2), "o_orderstatus")
        .withColumn(
            "__w",
            F.when(F.col("o_totalprice") < F.col("lo_cut"), F.col("lo_cut"))
            .when(F.col("o_totalprice") > F.col("hi_cut"), F.col("hi_cut"))
            .otherwise(F.col("o_totalprice")),
        )
    )
    return clipped.groupBy("o_orderstatus", "lo_cut", "hi_cut").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("__w").cast("decimal(24,6)")).cast("double")
            / F.count("*")
        ).alias("winsorized_mean"),
    ).select(
        "o_orderstatus", "n", "lo_cut", "hi_cut", "winsorized_mean"
    )
