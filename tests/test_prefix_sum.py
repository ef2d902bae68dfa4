"""distributed_prefix_sum: exact equality with the naive global
window, at several bucket counts and with non-contiguous keys."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.prefix import distributed_prefix_sum


def _naive(df, order_col, value_col, exclusive):
    upper = -1 if exclusive else 0
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, upper)
    return df.withColumn(
        "cum_before", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )


def _rows(df):
    return sorted((r["k"], r["v"], r["cum_before"]) for r in df.collect())


def test_matches_global_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 7 % 997).alias("k"),  # non-contiguous, unique mod order
        (F.col("id") % 13 + 1).alias("v"),
    ).distinct()
    for exclusive in (True, False):
        for n in (1, 4, 32):
            got = distributed_prefix_sum(
                df, "k", "v", exclusive=exclusive, num_buckets=n
            )
            want = _naive(df, "k", "v", exclusive)
            assert _rows(got) == _rows(want), (exclusive, n)


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert distributed_prefix_sum(empty, "k", "v").count() == 0
    one = spark.createDataFrame([(5, 9)], "k long, v long")
    got = distributed_prefix_sum(one, "k", "v").collect()[0]
    assert got["cum_before"] == 0
    inc = distributed_prefix_sum(one, "k", "v", exclusive=False).collect()[0]
    assert inc["cum_before"] == 9


def test_plan_has_no_single_partition(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    out = distributed_prefix_sum(df, "k", "v", num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
