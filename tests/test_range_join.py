"""Bucketized range/band join: exactness vs a naive θ-join."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.range_join import (
    band_join,
    bucketed_range_join,
)


def test_numeric_point_in_interval(spark):
    left = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, p double"
    )
    right = spark.createDataFrame(
        [(100, 2.0, 5.0), (200, 4.5, 4.6), (300, 18.0, 30.0)],
        "rid long, s double, e double",
    )
    out = bucketed_range_join(left, right, "p", "s", "e", bucket_width=3.0)
    got = {(r.id, r.rid) for r in out.collect()}
    # closed-open: s <= p < e; interval 300 spans many buckets
    assert got == {(2, 100), (3, 100), (4, 100), (18, 300), (19, 300)}


def test_bounds_are_closed_open(spark):
    left = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, p double")
    right = spark.createDataFrame([(9, 10.0, 20.0)], "rid long, s double, e double")
    got = {r.id for r in bucketed_range_join(left, right, "p", "s", "e", bucket_width=5.0).collect()}
    assert got == {1}  # start inclusive, end exclusive


def test_degenerate_interval_matches_nothing(spark):
    left = spark.createDataFrame([(1, 10.0)], "id long, p double")
    right = spark.createDataFrame(
        [(9, 12.0, 8.0), (8, 10.0, 10.0)], "rid long, s double, e double"
    )
    out = bucketed_range_join(left, right, "p", "s", "e", bucket_width=5.0)
    assert out.count() == 0


def test_equi_keys_and_bucket_boundary(spark):
    # points sit exactly on bucket edges; key separates matches
    left = spark.createDataFrame(
        [("a", 1, 0.0), ("a", 2, 10.0), ("b", 3, 10.0)], "k string, id long, p double"
    )
    right = spark.createDataFrame(
        [("a", 7, 10.0, 11.0), ("b", 8, 9.0, 10.5)], "k string, rid long, s double, e double"
    )
    out = bucketed_range_join(left, right, "p", "s", "e", on=["k"], bucket_width=10.0)
    got = {(r.k, r.id, r.rid) for r in out.collect()}
    assert got == {("a", 2, 7), ("b", 3, 8)}


def test_band_join_matches_theta_join(spark):
    base = datetime(2024, 1, 1)
    ev = [(i, base + timedelta(minutes=7 * i)) for i in range(40)]
    left = spark.createDataFrame(ev, "lid long, lts timestamp")
    right = spark.createDataFrame(
        [(100 + i, t) for i, t in ev], "rid long, rts timestamp"
    )
    out = band_join(
        left, right, "lts", "rts",
        lower="-INTERVAL 15 MINUTES", upper="INTERVAL 0 SECONDS",
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    expect = {
        (l, 100 + r)
        for l, lt in ev
        for r, (rr, rt) in enumerate(ev)
        if rt - timedelta(minutes=15) <= lt < rt
    }
    assert got == expect and len(got) > 0


def test_band_join_numeric_offsets(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 11.0)], "lid long, lp double")
    right = spark.createDataFrame([(9, 8.0)], "rid long, rp double")
    # band [rp-4, rp+4): 5.0 in [4,12) and 11.0 in [4,12)
    out = band_join(left, right, "lp", "rp", lower=-4.0, upper=4.0)
    assert {r.lid for r in out.collect()} == {1, 2}


def test_plan_is_equi_join_not_nested_loop(spark):
    left = spark.createDataFrame([(1, 10.0)], "id long, p double")
    right = spark.createDataFrame([(9, 8.0, 12.0)], "rid long, s double, e double")
    plan = bucketed_range_join(
        left, right, "p", "s", "e", bucket_width=5.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
