"""As-of join edge semantics + small helper coverage."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_python_azure_spark.functions.dates import sliding_window_bounds
from etl_python_azure_spark.functions.keys import csv_id_list
from etl_python_azure_spark.operators.asof import asof_join
from etl_python_azure_spark.schema import vertical_split

D = datetime.datetime


def test_asof_backward_equal_and_missing(spark):
    left = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10), "p1"),   # right at exactly 10:00 → matches (>=)
            (1, D(2024, 1, 1, 9), "p0"),    # before any right → NULL
            (2, D(2024, 1, 2, 0), "p2"),    # latest of two earlier rights wins
            (3, D(2024, 1, 1, 0), "p3"),    # key with no rights at all → NULL
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10), 100.0),
            (2, D(2024, 1, 1, 0), 1.0),
            (2, D(2024, 1, 1, 12), 2.0),
            (2, D(2024, 1, 3, 0), 3.0),     # after left → ignored
        ],
        "k int, rts timestamp, price double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    got = {r.tag: (r.asof_price, r.asof_rts) for r in out.collect()}
    assert got["p1"] == (100.0, D(2024, 1, 1, 10))
    assert got["p0"] == (None, None)
    assert got["p2"] == (2.0, D(2024, 1, 1, 12))
    assert got["p3"] == (None, None)
    # all left rows preserved (left-join semantics)
    assert out.count() == 4


def test_vertical_split(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, s string, v double")
    l, r = vertical_split(df, ["id", "s"], ["id", "v"])
    assert l.columns == ["id", "s"] and r.columns == ["id", "v"]


def test_csv_id_list(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "id int")
    csv = csv_id_list(df.orderBy("id"), "id")
    assert csv == "1,2,3"


def test_sliding_window_bounds(spark):
    df = spark.createDataFrame([("2024-02-10",)], "d string").select(
        F.col("d").cast("date").alias("d")
    )
    lo, hi = sliding_window_bounds(25, 2, anchor=F.col("d"))
    row = df.select(lo.alias("lo"), hi.alias("hi")).first()
    assert str(row.lo) == "2024-01-16" and str(row.hi) == "2024-02-12"


def test_asof_forward_direction(spark):
    import datetime

    D = datetime.datetime
    trades = spark.createDataFrame(
        [("A", 1, D(2024, 1, 1, 10, 0)), ("A", 2, D(2024, 1, 1, 11, 0))],
        "sym string, tid long, tts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", 100.0, D(2024, 1, 1, 10, 30)), ("A", 101.0, D(2024, 1, 1, 12, 0))],
        "sym string, px double, qts timestamp",
    )
    from etl_python_azure_spark.operators.asof import asof_join

    out = {
        r.tid: r.asof_px
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            direction="forward",
        ).collect()
    }
    # next quote at-or-after each trade
    assert out == {1: 100.0, 2: 101.0}


def test_asof_tolerance_nullifies_stale_match(spark):
    import datetime

    D = datetime.datetime
    trades = spark.createDataFrame(
        [("A", 1, D(2024, 1, 1, 10, 0)), ("A", 2, D(2024, 1, 1, 18, 0))],
        "sym string, tid long, tts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", 100.0, D(2024, 1, 1, 9, 50))],
        "sym string, px double, qts timestamp",
    )
    from etl_python_azure_spark.operators.asof import asof_join

    out = {
        r.tid: r.asof_px
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            tolerance="INTERVAL 30 MINUTES",
        ).collect()
    }
    # trade 1 is 10 min after the quote (inside tolerance);
    # trade 2 is 8h10m after (stale → NULL)
    assert out == {1: 100.0, 2: None}
